"""Mergeable sketches for telemetry at 10^12-row scale (SURVEY.md §2.6 A5).

HyperLogLog approximate distinct count: per-batch register arrays emitted by
``map_batches`` (one 2^p-byte row per batch), merged by elementwise max — the
classic mergeable-sketch pattern; exact ops remain the correctness contract,
sketches are the telemetry path."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

_P = 12          # 4096 registers
_M = 1 << _P
_ALPHA = 0.7213 / (1.0 + 1.079 / _M)


def _hash64(values) -> np.ndarray:
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        d = hashlib.blake2b(str(v).encode(), digest_size=8).digest()
        out[i] = int.from_bytes(d, "big")
    return out


def hll_accumulate(values, registers: np.ndarray | None = None) -> np.ndarray:
    """Fold values into a 2^p register array (uint8)."""
    if registers is None:
        registers = np.zeros(_M, dtype=np.uint8)
    h = _hash64(values)
    idx = (h >> np.uint64(64 - _P)).astype(np.int64)
    rest = h << np.uint64(_P)
    # rank = leading zeros of the remaining 64-p bits, +1
    rank = np.ones(len(h), dtype=np.uint8)
    mask = np.uint64(1) << np.uint64(63)
    cur = rest.copy()
    for _ in range(64 - _P):
        zero = (cur & mask) == 0
        live = zero & (rank < 64)
        if not live.any():
            break
        rank[live] += 1
        cur = cur << np.uint64(1)
    np.maximum.at(registers, idx, rank)
    return registers


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(registers: np.ndarray) -> float:
    est = _ALPHA * _M * _M / np.sum(np.power(2.0, -registers.astype(np.float64)))
    zeros = int((registers == 0).sum())
    if est <= 2.5 * _M and zeros:
        est = _M * np.log(_M / zeros)  # small-range correction
    return float(est)


def approx_distinct(ds: ray.data.Dataset, col: str) -> float:
    """Distributed approximate distinct count: per-batch HLL registers →
    elementwise-max merge on the driver (one 4 KiB row per batch)."""

    def partial(t: pa.Table) -> pa.Table:
        regs = hll_accumulate(t[col].to_pylist())
        return pa.table({"regs": pa.array([regs.tobytes()], type=pa.binary())})

    parts = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow"
    ).to_pandas()
    merged = np.zeros(_M, dtype=np.uint8)
    for blob in parts["regs"]:
        merged = hll_merge(merged, np.frombuffer(blob, dtype=np.uint8))
    return hll_estimate(merged)


# ---------------------------------------------------------------------------
# Mergeable histogram quantile sketch (the at-scale quantile path —
# order_price_quantiles' exact per-group math holds while groups fit memory;
# this holds at any size)
# ---------------------------------------------------------------------------

_QBUCKETS = 4096


def quantile_sketch(ds: ray.data.Dataset, col: str,
                    qs=(0.5, 0.9, 0.99)) -> dict:
    """Two-pass deterministic mergeable quantile estimate:

    pass 1 — global min/max (native aggregate);
    pass 2 — per-batch fixed-boundary histogram (one _QBUCKETS-int row per
             batch), summed on the driver; quantiles interpolate linearly
             within the hit bucket, so error ≤ one bucket width
             ((max−min)/4096) regardless of data order or partitioning —
             fully deterministic, unlike greedy compaction sketches."""
    from ray.data.aggregate import Count, Max, Min

    # pin the single needed column once: both passes (min/max aggregate,
    # histogram) read it from the object store instead of re-executing the
    # upstream read/transform lineage twice (round-2 advice)
    ds = ds.select_columns([col]).materialize()
    stats = ds.aggregate(Min(col, alias_name="lo"), Max(col, alias_name="hi"),
                         Count(alias_name="n"))
    lo, hi, n = float(stats["lo"]), float(stats["hi"]), int(stats["n"])
    if n == 0:
        return {"n": 0, "quantiles": {q: float("nan") for q in qs}}
    width = max((hi - lo) / _QBUCKETS, 1e-300)

    def partial(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy().astype(np.float64)
        b = np.clip(((v - lo) / width).astype(np.int64), 0, _QBUCKETS - 1)
        hist = np.bincount(b, minlength=_QBUCKETS).astype(np.int64)
        return pa.table({"hist": pa.array([hist.tobytes()], type=pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    hist = np.zeros(_QBUCKETS, dtype=np.int64)
    for blob in parts["hist"]:
        hist += np.frombuffer(blob, dtype=np.int64)
    cum = np.cumsum(hist)
    out = {}
    for q in qs:
        target = q * n
        b = int(np.searchsorted(cum, target, side="left"))
        b = min(b, _QBUCKETS - 1)
        prev = cum[b - 1] if b > 0 else 0
        frac = (target - prev) / max(hist[b], 1)
        out[q] = lo + (b + min(frac, 1.0)) * width
    return {"n": n, "quantiles": out}


def quantile_sketch_query(sf_dir: str) -> pd.DataFrame:
    """Sketch quantiles of lineitem extended price (rows-only; accuracy vs
    exact asserted in tests/test_ops.py)."""
    from .stages import read_table

    ds = read_table(sf_dir, "lineitem", columns=["l_extendedprice"])
    r = quantile_sketch(ds, "l_extendedprice")
    return pd.DataFrame({
        "q": [0.5, 0.9, 0.99],
        "est": [round(r["quantiles"][q], 2) for q in (0.5, 0.9, 0.99)],
        "n": np.array([r["n"]] * 3, dtype=np.int64),
    })


def approx_distinct_query(sf_dir: str) -> pd.DataFrame:
    """A5 as a queries() entry: HLL estimates vs the columns' true scale
    (rows-only check; accuracy asserted in tests/test_ops.py)."""
    from .stages import read_table

    ev = read_table(sf_dir, "events", columns=["user_id"])
    docs = read_table(sf_dir, "documents", columns=["text"])
    return pd.DataFrame(
        {
            "col": ["events.user_id", "documents.text"],
            "approx_distinct": [
                round(approx_distinct(ev, "user_id"), 0),
                round(approx_distinct(docs, "text"), 0),
            ],
        }
    )
