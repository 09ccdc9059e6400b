"""Similarity search over the ``embeddings`` table (list<float32>, unit-norm).

* brute-force cosine top-k: numpy matmul per batch against a broadcast query
  matrix (the scale baseline — queries are ray.put once, read per actor)
* LSH-bucketed ANN: seeded random-hyperplane signs → bucket groupby → search
  own + Hamming-1 buckets (recall vs brute force is tested)
* IVF ANN: coarse k-means centroids trained on a seeded sample (driver-side
  numpy over the SAMPLE only), broadcast; queries probe the nprobe nearest
  cells; each batch scores only its rows landing in probed cells — the
  classic inverted-file scale path (scan work drops by ~nprobe/nlist)
* embedding-cosine near-dup: all pairs with cosine ≥ τ via bucket-join

Float discipline: element products are computed in float32 then accumulated
in float64 — mirrors DuckDB's FLOAT list arithmetic so the oracle hash lines
up after round(4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from . import graph
from .stages import read_table
from .util import round_half_away


def _emb_matrix(t: pa.Table) -> np.ndarray:
    """(n, dim) float32 matrix straight off the Arrow list buffers — the
    child values reshape by the (uniform) list width with no per-row
    Python list materialization (ragged input falls back)."""
    col = t["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.empty((0, 0), dtype=np.float32)
    offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    widths = np.diff(offs)
    if (widths != widths[0]).any():
        return np.asarray(col.to_pylist(), dtype=np.float32)
    vals = np.asarray(col.values.to_numpy(zero_copy_only=False),
                      dtype=np.float32)
    n, d = len(widths), int(widths[0])
    return vals[offs[0]:offs[0] + n * d].reshape(n, d)


def head_by_vec_id(ds, n: int) -> pd.DataFrame:
    """Deterministic head: the first ``n`` rows by vec_id (unique ids),
    WITHOUT a global sort — replaces ``ds.sort("vec_id").limit(n)``, which
    range-shuffles the entire table for a constant-size head (round-2
    review item 3).  Round-3 review: the first cut merged ≤ n FULL rows per
    block on the driver, i.e. O(n × num_blocks) embedding payloads — at
    10^5 blocks that is a corpus-proportional driver frame.  Now the
    partial min-n carries THIN vec_id rows only, a repartition level caps
    the driver merge at ≤ 32·n ids, and the ≤ n winning payload rows come
    back through one broadcast ``is_in`` fetch (the q3 key-fetch pattern).
    Input should be a cheap re-readable source (the id pass is
    column-pruned; the fetch pass streams)."""

    def partial_ids(t: pa.Table) -> pa.Table:
        vid = t["vec_id"].to_numpy()
        k = min(n, len(vid))
        order = np.argsort(vid, kind="stable")[:k]
        return pa.table({"vec_id": pa.array(vid[order], type=pa.int64())})

    ids = (ds.select_columns(["vec_id"])
           .map_batches(partial_ids, batch_format="pyarrow")
           .repartition(32)
           .map_batches(partial_ids, batch_format="pyarrow")
           .to_pandas())
    head_ids = ids.sort_values("vec_id", kind="stable").head(n)
    keep_ref = ray.put(pa.array(sorted(int(v) for v in head_ids["vec_id"]),
                                type=pa.int64()))
    rows = ds.map_batches(
        lambda t: t.filter(pc.is_in(t["vec_id"],
                                    value_set=ray.get(keep_ref))),
        batch_format="pyarrow").to_pandas()
    return (rows.sort_values("vec_id", kind="stable").head(n)
            .reset_index(drop=True))


def embedding_sums(sf_dir: str) -> pd.DataFrame:
    """Cosine of every vector against the all-ones direction — SQL-mirrorable
    (list_sum / (l2 * sqrt(dim))); the brute-force scoring kernel's oracle."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def f(t: pa.Table) -> pa.Table:
        m = _emb_matrix(t)
        s = m.astype(np.float64).sum(axis=1)
        sq = (m * m).astype(np.float64).sum(axis=1)  # float32 squares, f64 sum
        cos = s / (np.sqrt(sq) * np.sqrt(m.shape[1]))
        return pa.table({
            "vec_id": t["vec_id"],
            "cos_ones": pa.array(round_half_away(cos, 4)),
        })

    return (ds.map_batches(f, batch_format="pyarrow").to_pandas()
            .sort_values("vec_id").reset_index(drop=True))


def ann_topk_ones(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Brute-force cosine top-k for the all-ones query: per-batch partial
    top-k (numpy) → tiny global merge.  Only (vec_id, cos) partials leave the
    tasks — the pattern that holds at 10^9 vectors."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        m = _emb_matrix(t)
        s = m.astype(np.float64).sum(axis=1)
        sq = (m * m).astype(np.float64).sum(axis=1)
        cos = s / (np.sqrt(sq) * np.sqrt(m.shape[1]))
        vid = t["vec_id"].to_numpy()
        order = np.lexsort((vid, -cos))[:k]
        return pa.table({
            "vec_id": pa.array(vid[order], type=pa.int64()),
            "cos_ones": pa.array(cos[order]),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["cos_ones", "vec_id"],
                              ascending=[False, True]).head(k)
    parts["cos_ones"] = round_half_away(parts["cos_ones"], 4)
    parts["rank"] = np.arange(len(parts), dtype=np.int64)
    return parts[["rank", "vec_id", "cos_ones"]].reset_index(drop=True)


def knn_brute_force(sf_dir: str, n_queries: int = 5, k: int = 5) -> pd.DataFrame:
    """Brute-force cosine top-k against a broadcast query matrix (the first
    ``n_queries`` vectors by vec_id).  Self-match excluded.  Rows-only check;
    exact values verified in tests against a numpy reference."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qdf = head_by_vec_id(ds, n_queries)
    Q = np.asarray(qdf["embedding"].tolist(), dtype=np.float32)
    qids = qdf["vec_id"].to_numpy()
    q_ref = ray.put((qids, Q))

    def partial(t: pa.Table) -> pa.Table:
        qids_, Q_ = ray.get(q_ref)
        m = _emb_matrix(t)
        vid = t["vec_id"].to_numpy()
        # f64 matmul: every f32·f32 product is exact in f64, so the cosine
        # agrees with the DuckDB list-op oracle to well past round(4)
        dots = m.astype(np.float64) @ Q_.astype(np.float64).T
        nm = np.sqrt((m * m).astype(np.float64).sum(axis=1))[:, None]
        nq = np.sqrt((Q_ * Q_).astype(np.float64).sum(axis=1))[None, :]
        cos = dots / (nm * nq)
        rows = {"query_id": [], "vec_id": [], "cos": []}
        for qi in range(len(qids_)):
            c = cos[:, qi].copy()
            c[vid == qids_[qi]] = -np.inf
            order = np.lexsort((vid, -c))[:k]
            rows["query_id"] += [int(qids_[qi])] * len(order)
            rows["vec_id"] += [int(v) for v in vid[order]]
            rows["cos"] += [float(x) for x in c[order]]
        return pa.table({
            "query_id": pa.array(rows["query_id"], type=pa.int64()),
            "vec_id": pa.array(rows["vec_id"], type=pa.int64()),
            "cos": pa.array(rows["cos"]),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = []
    for qid, g in parts.groupby("query_id"):
        g = g.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype=np.int64)
        out.append(g)
    res = pd.concat(out, ignore_index=True)
    res["cos"] = round_half_away(res["cos"], 4)
    return res[["query_id", "rank", "vec_id", "cos"]].sort_values(
        ["query_id", "rank"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (the scale path)
# ---------------------------------------------------------------------------

_N_PLANES = 12


def _planes(dim: int, seed: int = 42) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.normal(0, 1, (dim, _N_PLANES)).astype(np.float32)


_N_TABLES = 6
_T_PLANES = 6  # planes per table → 64 buckets per table


def _table_planes(dim: int, seed: int = 42) -> np.ndarray:
    """(dim, tables·planes) hyperplanes — one block of _T_PLANES per table."""
    rng = np.random.Generator(np.random.PCG64(seed + 1))
    return rng.normal(0, 1, (dim, _N_TABLES * _T_PLANES)).astype(np.float32)


def _table_buckets(m: np.ndarray, P: np.ndarray) -> np.ndarray:
    """(n, tables) bucket id per table: table_id << _T_PLANES | sign bits."""
    signs = (m @ P) >= 0
    out = np.zeros((len(m), _N_TABLES), dtype=np.int64)
    for t in range(_N_TABLES):
        b = np.zeros(len(m), dtype=np.int64)
        for p in range(_T_PLANES):
            b |= signs[:, t * _T_PLANES + p].astype(np.int64) << p
        out[:, t] = (t << _T_PLANES) | b
    return out


class LshBucketer:
    """Actor-pool stage: multi-table hyperplane matrix built once per actor;
    emits one row per (vector, table) with that table's bucket id — the
    standard L-tables-of-k-planes LSH layout (random data needs table
    diversity; a single wide code has near-zero recall)."""

    def __init__(self, dim: int, seed: int = 42):
        self.P = _table_planes(dim, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch)
        buckets = _table_buckets(m, self.P)
        n = len(m)
        vid = batch["vec_id"].to_numpy()
        emb = batch["embedding"].to_pylist()
        rep = np.repeat(np.arange(n), _N_TABLES)
        return pa.table({
            "vec_id": pa.array(vid[rep], type=pa.int64()),
            "bucket": pa.array(buckets.reshape(-1), type=pa.int64()),
            "embedding": pa.array([emb[i] for i in rep],
                                  type=pa.list_(pa.float32())),
        })


def ann_lsh(sf_dir: str, n_queries: int = 5, k: int = 5) -> pd.DataFrame:
    """LSH-bucketed ANN: 6 tables × 6 hyperplanes; each query searches its
    bucket plus Hamming-1 neighbors in every table, candidates deduped, exact
    cosine on the candidate set.  Approximate — recall vs brute force
    asserted in tests (rows-only driver check)."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    first = ds.take_batch(1, batch_format="pyarrow")
    dim = len(first["embedding"][0])
    bucketed = ds.map_batches(LshBucketer, fn_constructor_args=(dim,),
                              batch_format="pyarrow", batch_size=4096,
                              concurrency=(1, 4), num_cpus=1)
    qdf = head_by_vec_id(ds, n_queries)
    Q = np.asarray(qdf["embedding"].tolist(), dtype=np.float32)
    qids = qdf["vec_id"].to_numpy()
    qbuckets = _table_buckets(Q, _table_planes(dim))
    # target buckets per query: own + hamming-1, per table
    targets = {}
    for qi in range(len(Q)):
        for t in range(_N_TABLES):
            qb = int(qbuckets[qi, t])
            for b in [qb] + [qb ^ (1 << p) for p in range(_T_PLANES)]:
                targets.setdefault(b, []).append(qi)
    t_ref = ray.put((qids, Q, targets))

    def search(t: pa.Table) -> pa.Table:
        qids_, Q_, targets_ = ray.get(t_ref)
        m = _emb_matrix(t)
        vid = t["vec_id"].to_numpy()
        buck = t["bucket"].to_numpy()
        rows = {"query_id": [], "vec_id": [], "cos": []}
        hit_q = {}
        for i, b in enumerate(buck):
            for qi in targets_.get(int(b), ()):
                hit_q.setdefault(qi, []).append(i)
        for qi, idxs in hit_q.items():
            # a vector can hit the same query via several tables — dedupe
            idxs = np.asarray(sorted(set(idxs)))
            uniq_v, first_i = np.unique(vid[idxs], return_index=True)
            idxs = idxs[first_i]
            sub = m[idxs]
            dots = (sub @ Q_[qi]).astype(np.float64)
            nm = np.sqrt((sub * sub).astype(np.float64).sum(axis=1))
            nq = np.sqrt((Q_[qi] * Q_[qi]).astype(np.float64).sum())
            cos = dots / (nm * nq)
            keep = vid[idxs] != qids_[qi]
            order = np.lexsort((vid[idxs][keep], -cos[keep]))[:k]
            v = vid[idxs][keep][order]
            c = cos[keep][order]
            rows["query_id"] += [int(qids_[qi])] * len(v)
            rows["vec_id"] += [int(x) for x in v]
            rows["cos"] += [float(x) for x in c]
        return pa.table({
            "query_id": pa.array(rows["query_id"], type=pa.int64()),
            "vec_id": pa.array(rows["vec_id"], type=pa.int64()),
            "cos": pa.array(rows["cos"]),
        })

    parts = bucketed.map_batches(search, batch_format="pyarrow").to_pandas()
    out = []
    for qid, g in parts.groupby("query_id"):
        g = (g.drop_duplicates("vec_id")
             .sort_values(["cos", "vec_id"], ascending=[False, True])
             .head(k).reset_index(drop=True))
        g["rank"] = np.arange(len(g), dtype=np.int64)
        out.append(g)
    if not out:
        return pd.DataFrame(columns=["query_id", "rank", "vec_id", "cos"])
    res = pd.concat(out, ignore_index=True)
    res["cos"] = round_half_away(res["cos"], 4)
    return res[["query_id", "rank", "vec_id", "cos"]].sort_values(
        ["query_id", "rank"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# IVF ANN (inverted-file coarse quantizer — the second scale path)
# ---------------------------------------------------------------------------

_IVF_NLIST = 32
_IVF_NPROBE = 6
_IVF_TRAIN = 2048  # training sample size (seeded, deterministic)


def _ivf_centroids(sample: np.ndarray, nlist: int, iters: int = 8,
                   seed: int = 42) -> np.ndarray:
    """Seeded k-means over the (driver-held) TRAINING SAMPLE only — sample
    size is a constant, never corpus-proportional.  Deterministic: fixed
    init, fixed iteration count, stable empty-cell reseeding."""
    rng = np.random.Generator(np.random.PCG64(seed))
    n = len(sample)
    idx = rng.choice(n, size=min(nlist, n), replace=False)
    C = sample[np.sort(idx)].astype(np.float64).copy()
    X = sample.astype(np.float64)
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for c in range(len(C)):
            m = a == c
            if m.any():
                C[c] = X[m].mean(axis=0)
            else:  # reseed empty cell deterministically: farthest point
                C[c] = X[d.min(axis=1).argmax()]
    return C.astype(np.float32)


def ann_ivf(sf_dir: str, n_queries: int = 5, k: int = 5,
            nlist: int = _IVF_NLIST, nprobe: int = _IVF_NPROBE) -> pd.DataFrame:
    """IVF ANN: train nlist coarse centroids on a seeded sample, broadcast
    (centroids, queries, per-query probe lists); each batch assigns its rows
    to cells with one matmul and scores only rows in probed cells — partial
    top-k per batch, tiny driver merge.  Approximate: recall vs brute force
    asserted in tests (rows-only driver check).  At 10^9+ vectors the same
    shape holds — the broadcast is (nlist×dim + queries), constant."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    # deterministic training sample + queries: first rows by vec_id
    head = head_by_vec_id(ds, max(_IVF_TRAIN, n_queries))
    sample = np.asarray(head["embedding"].tolist(), dtype=np.float32)
    C = _ivf_centroids(sample, nlist)
    qdf = head.iloc[:n_queries]
    Q = np.asarray(qdf["embedding"].tolist(), dtype=np.float32)
    qids = qdf["vec_id"].to_numpy(dtype=np.int64)
    # probe lists: nprobe nearest centroids per query (euclidean)
    dq = ((Q.astype(np.float64)[:, None, :]
           - C.astype(np.float64)[None, :, :]) ** 2).sum(axis=2)
    probes = np.argsort(dq, axis=1, kind="stable")[:, :nprobe]
    ref = ray.put((qids, Q, C, probes))

    def partial(t: pa.Table) -> pa.Table:
        qids_, Q_, C_, probes_ = ray.get(ref)
        m = _emb_matrix(t)
        vid = t["vec_id"].to_numpy()
        out = {"query_id": [], "vec_id": [], "cos": []}
        if len(m):
            # one matmul assigns every row to its nearest centroid:
            # argmin ||x-c||² = argmax (x·c - ||c||²/2)
            cc = (C_.astype(np.float64) ** 2).sum(axis=1) / 2.0
            cell = (m.astype(np.float64) @ C_.astype(np.float64).T
                    - cc[None, :]).argmax(axis=1)
            nm = np.sqrt((m * m).astype(np.float64).sum(axis=1))
            for qi in range(len(qids_)):
                mask = np.isin(cell, probes_[qi])
                mask &= vid != qids_[qi]
                idx = np.nonzero(mask)[0]
                if not len(idx):
                    continue
                sub = m[idx].astype(np.float64)
                q = Q_[qi].astype(np.float64)
                cos = (sub @ q) / (nm[idx] * np.sqrt((q * q).sum()))
                order = np.lexsort((vid[idx], -cos))[:k]
                out["query_id"] += [int(qids_[qi])] * len(order)
                out["vec_id"] += [int(v) for v in vid[idx][order]]
                out["cos"] += [float(x) for x in cos[order]]
        return pa.table({
            "query_id": pa.array(out["query_id"], type=pa.int64()),
            "vec_id": pa.array(out["vec_id"], type=pa.int64()),
            "cos": pa.array(out["cos"]),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    rows = []
    if len(parts):
        for qid, g in parts.groupby("query_id"):
            g = (g.sort_values(["cos", "vec_id"], ascending=[False, True])
                 .head(k).reset_index(drop=True))
            g["rank"] = np.arange(len(g), dtype=np.int64)
            rows.append(g)
    if not rows:
        return pd.DataFrame(columns=["query_id", "rank", "vec_id", "cos"])
    res = pd.concat(rows, ignore_index=True)
    res["cos"] = round_half_away(res["cos"], 4)
    return res[["query_id", "rank", "vec_id", "cos"]].sort_values(
        ["query_id", "rank"]).reset_index(drop=True)


def ann_recall_scalars(sf_dir: str, n_queries: int = 5,
                       k: int = 5) -> pd.DataFrame:
    """Value contract for the approximate ANN family (round-4 verdict item
    3): the EXACT per-query overlap of ann_lsh / ann_ivf result sets with
    the knn_brute_force ground truth on the same table — the
    approximate-by-design rows-only queries gain a deterministic,
    exact-integer recall surface.  Emits one (method, query_id, hits, k)
    row per (method, query); pytest recomputes the overlap independently
    and asserts equality plus the recall floors the family has carried
    since round 2 (lsh ≥ 0.4, ivf ≥ 0.3 overall)."""
    bf = knn_brute_force(sf_dir, n_queries, k)
    rows = []
    for method, fn in (("ivf", ann_ivf), ("lsh", ann_lsh)):
        res = fn(sf_dir, n_queries, k)
        for qid in sorted(bf["query_id"].unique()):
            truth = set(bf.loc[bf["query_id"] == qid, "vec_id"])
            got = set(res.loc[res["query_id"] == qid, "vec_id"])
            rows.append({"method": method, "query_id": int(qid),
                         "hits": int(len(truth & got)),
                         "k": int(len(truth))})
    out = pd.DataFrame(rows, columns=["method", "query_id", "hits", "k"])
    return (out.astype({"query_id": "int64", "hits": "int64", "k": "int64"})
            .sort_values(["method", "query_id"]).reset_index(drop=True))


_COS_VERIFY_BROADCAST_MAX_PAIRS = 50_000
# candidate-pair sets up to this verify via the broadcast path (embeddings
# fetched are bounded by 2×pairs, never corpus size; Ray's two-join fixed
# cost dominates small sets — same routing contract as the text-Jaccard
# verify in textops).  Larger sets route through two hash joins.


def _pair_cos(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Rowwise cosine of aligned (n, dim) float32 matrices; f32·f32 products
    are exact in f64, accumulation in f64 — both verify routes share this
    kernel so their outputs are bit-identical."""
    a = A.astype(np.float64)
    b = B.astype(np.float64)
    dots = (a * b).sum(axis=1)
    na = np.sqrt((a * a).sum(axis=1))
    nb = np.sqrt((b * b).sum(axis=1))
    return dots / (na * nb)


_EMPTY_PAIRS = {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")}


def _verify_cosine_small(ds, cand_df: pd.DataFrame, tau: float) -> pd.DataFrame:
    """Pair-bounded broadcast verify: is_in-fetch the ≤2·|pairs| candidate
    embeddings in one streaming pass, ray.put the matrix, verify pairs in
    parallel with vectorized searchsorted lookups."""
    need = pa.array(np.unique(np.concatenate(
        [cand_df["a"].to_numpy(dtype=np.int64),
         cand_df["b"].to_numpy(dtype=np.int64)])), type=pa.int64())
    sub = ds.map_batches(
        lambda t: t.filter(pa.compute.is_in(t["vec_id"], value_set=need)),
        batch_format="pyarrow").to_pandas()
    ids = sub["vec_id"].to_numpy(dtype=np.int64)
    M = np.asarray(sub["embedding"].tolist(), dtype=np.float32)
    order = np.argsort(ids, kind="stable")
    ref = ray.put((ids[order], M[order]))
    pairs_ds = ray.data.from_pandas(cand_df.reset_index(drop=True))

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        ids_, M_ = ray.get(ref)
        a = df["a"].to_numpy(dtype=np.int64)
        b = df["b"].to_numpy(dtype=np.int64)
        ia = np.searchsorted(ids_, a)
        ib = np.searchsorted(ids_, b)
        cos = _pair_cos(M_[ia], M_[ib])
        keep = cos >= tau
        return pd.DataFrame({"a": a[keep], "b": b[keep]}) if keep.any() \
            else pd.DataFrame(_EMPTY_PAIRS)

    out = pairs_ds.map_batches(verify, batch_format="pandas").to_pandas()
    if "a" not in out.columns:
        out = pd.DataFrame(_EMPTY_PAIRS)
    return out


def _verify_cosine_ds(ds, cand: ray.data.Dataset, tau: float) -> ray.data.Dataset:
    """Fully-distributed cosine verify: embeddings reach the pair rows via
    TWO native hash joins on vec_id (1× embedding payload per pair side
    through each shuffle — never a ×13 multi-probe replication), then
    vectorized rowwise cosine per batch.  Embeddings ride the join as raw
    float32 BYTES: acero rejects list-typed non-key columns
    ("Data type list<float> is not supported in join non-key field")."""
    from .util import join_partitions

    def pack(t: pa.Table) -> pa.Table:
        m = _emb_matrix(t)
        return pa.table({
            "vec_id": t["vec_id"],
            "emb": pa.array([m[i].tobytes() for i in range(len(m))],
                            type=pa.binary()),
        })

    embs = ds.map_batches(pack, batch_format="pyarrow")
    npart = join_partitions()
    j = cand.join(embs, join_type="inner", num_partitions=npart,
                  on=("a",), right_on=("vec_id",),
                  left_suffix="_l", right_suffix="_ea")
    j = j.join(embs, join_type="inner", num_partitions=npart,
               on=("b",), right_on=("vec_id",),
               left_suffix="_a", right_suffix="_b")

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(_EMPTY_PAIRS)
        A = np.stack([np.frombuffer(x, dtype=np.float32)
                      for x in df["emb_a"]])
        B = np.stack([np.frombuffer(x, dtype=np.float32)
                      for x in df["emb_b"]])
        cos = _pair_cos(A, B)
        keep = cos >= tau
        return pd.DataFrame({"a": df["a"].to_numpy(dtype=np.int64)[keep],
                             "b": df["b"].to_numpy(dtype=np.int64)[keep]}) \
            if keep.any() else pd.DataFrame(_EMPTY_PAIRS)

    return j.map_batches(verify, batch_format="pandas")


def _verify_cosine_routed(ds, cand: ray.data.Dataset, tau: float,
                          broadcast_max_pairs: int | None = None) -> ray.data.Dataset:
    """Route by candidate-pair count (pair-bounded, never corpus-bounded) —
    identical outputs either way (both routes share :func:`_pair_cos`;
    asserted equal in tests via a forced threshold)."""
    if broadcast_max_pairs is None:
        broadcast_max_pairs = _COS_VERIFY_BROADCAST_MAX_PAIRS
    if cand.count() <= broadcast_max_pairs:
        return ray.data.from_pandas(
            _verify_cosine_small(ds, cand.to_pandas(), tau))
    return _verify_cosine_ds(ds, cand, tau)


def embedding_near_dup(sf_dir: str, tau: float = 0.95,
                       broadcast_max_pairs: int | None = None) -> pd.DataFrame:
    """Embedding-cosine near-dup groups: THIN (vec_id, bucket) multi-probe
    rows (own + Hamming-1 LSH buckets, 16 B each — the ×13 replication
    carries ids only, never the embedding payload; round-2 review item 2) →
    in-bucket candidate pairs → routed exact-cosine verify (embeddings reach
    pairs by broadcast below the pair bound, by two hash joins above — ≤1×
    embedding bytes through any shuffle) → DISTRIBUTED connected components
    (:mod:`imc_ray.graph`) → (vec_id, dup_group = min member).

    One row per vector (vectors with no near-dup group to themselves).  The
    returned frame is the queries() compare surface; at-scale callers take
    :func:`imc_ray.graph.components_dataset` and stream it instead."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]).materialize()
    first = ds.take_batch(1, batch_format="pyarrow")
    dim = len(first["embedding"][0])
    P_ref = ray.put(_planes(dim))

    def emit(t: pa.Table) -> pa.Table:
        P = ray.get(P_ref)
        m = _emb_matrix(t)
        vid = t["vec_id"].to_numpy()
        signs = (m @ P) >= 0
        base = np.zeros(len(m), dtype=np.int64)
        for b in range(_N_PLANES):
            base |= signs[:, b].astype(np.int64) << b
        # multi-probe: id-only rows into own + Hamming-1 buckets (13 thin
        # rows per vector, vectorized — no per-row Python loop)
        probes = np.concatenate([[0], 1 << np.arange(_N_PLANES, dtype=np.int64)])
        buckets = (base[:, None] ^ probes[None, :]).reshape(-1)
        return pa.table({
            "vec_id": pa.array(np.repeat(vid, len(probes)), type=pa.int64()),
            "bucket": pa.array(buckets, type=pa.int64()),
        })

    def pairs_fn(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g["vec_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame(_EMPTY_PAIRS)
        iu, ju = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[iu].astype(np.int64),
                             "b": ids[ju].astype(np.int64)})

    raw = (ds.map_batches(emit, batch_format="pyarrow")
           .groupby("bucket").map_groups(pairs_fn, batch_format="pandas")
           .materialize())
    ids = ds.select_columns(["vec_id"])
    if raw.count() == 0:
        return graph.components_frame_empty(ids, "vec_id", "dup_group")
    # a pair can surface from several probe buckets — dedupe via groupby
    # (keys only through the shuffle), then verify + min-label components
    cand = graph.dedupe_pairs(raw).materialize()
    verified = _verify_cosine_routed(ds, cand, tau,
                                     broadcast_max_pairs).materialize()
    if verified.count() == 0:
        return graph.components_frame_empty(ids, "vec_id", "dup_group")
    return graph.components_frame(ids, verified, "vec_id", "dup_group")


def embedding_exact_dup_groups(sf_dir: str) -> pd.DataFrame:
    """Exact dedup over a vector column — the D1 content-hash pattern lifted
    to ``list<float>``: group key = 128-bit blake2b of the row's raw float32
    bytes (16 B through the shuffle instead of the embedding payload), then
    groupby → (vec_id = min member, n_copies).  Byte equality of float32
    vectors ⟺ list equality for the corpus contract (no NaN embeddings, no
    mixed-sign zeros), which is exactly DuckDB's ``GROUP BY embedding``."""
    import hashlib

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def add_hash(t: pa.Table) -> pa.Table:
        m = np.ascontiguousarray(_emb_matrix(t))
        h1 = np.empty(len(m), dtype=np.int64)
        h2 = np.empty(len(m), dtype=np.int64)
        for i in range(len(m)):
            d = hashlib.blake2b(m[i].tobytes(), digest_size=16).digest()
            h1[i] = int.from_bytes(d[:8], "big", signed=True)
            h2[i] = int.from_bytes(d[8:], "big", signed=True)
        return pa.table({"vec_id": t["vec_id"],
                         "h1": pa.array(h1), "h2": pa.array(h2)})

    from ray.data.aggregate import Count as _Count
    from ray.data.aggregate import Min as _Min

    out = (ds.map_batches(add_hash, batch_format="pyarrow")
           .groupby(["h1", "h2"])
           .aggregate(_Min("vec_id", alias_name="vec_id"),
                      _Count(alias_name="n_copies"))
           .to_pandas())
    out["n_copies"] = out["n_copies"].astype("int64")
    return (out[["vec_id", "n_copies"]].sort_values("vec_id")
            .reset_index(drop=True))


def explode_embeddings(sf_dir: str, max_vecs: int = 50) -> pd.DataFrame:
    """List explode (unnest WITH ORDINALITY): the first ``max_vecs`` vectors
    by vec_id flatten to one row per (vec_id, position, value).
    ``head_by_vec_id`` already delivers those rows (payload included) to
    the driver, so the flatten runs right there over ≤ max_vecs rows —
    a second is_in-filtered scan of the embeddings table (the first cut)
    would re-read the whole corpus to rebuild rows already in hand
    (round-3 review).  Row ids via ``np.repeat`` over the list lengths;
    no Python loop touches elements."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    head = head_by_vec_id(ds, max_vecs)
    embs = [np.asarray(e, dtype=np.float64) for e in head["embedding"]]
    lens = np.array([len(e) for e in embs], dtype=np.int64)
    vid = np.repeat(head["vec_id"].to_numpy().astype(np.int64), lens)
    pos = (np.concatenate([np.arange(1, n + 1, dtype=np.int64)
                           for n in lens]) if len(lens)
           else np.array([], dtype=np.int64))
    vals = (np.concatenate(embs) if embs
            else np.array([], dtype=np.float64))
    out = pd.DataFrame({
        "vec_id": vid, "pos": pos,
        "val": round_half_away(vals, 6),
    })
    return out.sort_values(["vec_id", "pos"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Distributed k-means over the embedding column (semantic clustering)
# ---------------------------------------------------------------------------

def _assign_cells(m64: np.ndarray, c64: np.ndarray) -> np.ndarray:
    """Nearest-centroid assignment via ONE matmul:
    ``argmin ||x-c||² = argmax (x·c − ||c||²/2)``; ties resolve to the
    lowest cluster index (argmax first-occurrence).  Shared by the
    distributed batches AND the single-node test oracle so float behavior
    is identical on both paths."""
    cc = (c64 * c64).sum(axis=1) / 2.0
    return (m64 @ c64.T - cc[None, :]).argmax(axis=1)


def kmeans_embeddings(sf_dir: str, k: int = 8,
                      iters: int = 4) -> pd.DataFrame:
    """Distributed Lloyd k-means over ``embeddings.embedding`` — the
    semantic-clustering primitive of cluster-based training-data curation
    (SemDeDup / cluster-balanced sampling; public algorithms).  Returns one
    (vec_id, cluster) row per vector.

    Ray-Data shape (iterative algorithm — not SQL-expressible, rows-only
    driver check; exactness asserted in pytest):

    * init: the ``k`` lowest-vec_id vectors (deterministic, no RNG);
    * per iteration: centroids broadcast ONCE via ``ray.put`` (k×dim,
      constant); each batch assigns rows with one matmul and emits thin
      per-cluster partial rows — (cluster, dim, Σcomponent) plus a
      (cluster, −1, count) row — so the shuffle carries ≤ k·(dim+1) rows
      per batch regardless of batch size; one small ``groupby(cluster,
      dim)`` Sum finishes the reduction and the ≤ k·(dim+1)-row result
      pivots on the driver;
    * new centroids round to float32 each iteration, so label assignments
      are invariant to partitioning/summation order with overwhelming
      probability (float64 block-sum divergence ~1e-13 ≪ float32 resolution
      ~2e-6/component; the residual risk — a block-sum that happens to
      straddle a float32 rounding boundary AND a point near-equidistant to
      the two affected centroids — is of order 1e-7 per centroid component
      per iteration, not zero; round-4 advice.  Empty clusters keep their
      previous centroid — deterministic);
    * final pass: one matmul per batch → (vec_id, cluster) labels.

    The input pins once (``materialize``) — iterations re-read blocks, not
    upstream lineage."""
    ds = (read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
          .materialize())
    c = _kmeans_fit(ds, k, iters)
    ref = ray.put(c)

    def label(t: pa.Table) -> pa.Table:
        c64 = ray.get(ref).astype(np.float64)
        m = _emb_matrix(t).astype(np.float64)
        a = (_assign_cells(m, c64) if len(m)
             else np.empty(0, dtype=np.int64))
        return pa.table({"vec_id": t["vec_id"],
                         "cluster": pa.array(a.astype(np.int64))})

    out = ds.map_batches(label, batch_format="pyarrow").to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


def _kmeans_fit(ds: ray.data.Dataset, k: int, iters: int) -> np.ndarray:
    """The distributed Lloyd fit behind :func:`kmeans_embeddings` (and the
    SemDeDup partition stage) — returns the float32 (k, dim) centroids.
    See kmeans_embeddings' docstring for the full shape rationale."""
    from ray.data.aggregate import Sum as _Sum

    c = np.asarray(head_by_vec_id(ds, k)["embedding"].tolist(),
                   dtype=np.float32)

    for _ in range(iters):
        ref = ray.put(c)

        def partial(t: pa.Table, _ref=ref) -> pa.Table:
            c64 = ray.get(_ref).astype(np.float64)
            m = _emb_matrix(t).astype(np.float64)
            if not len(m):
                return pa.table({"cluster": pa.array([], type=pa.int64()),
                                 "dim": pa.array([], type=pa.int64()),
                                 "s": pa.array([], type=pa.float64())})
            a = _assign_cells(m, c64)
            kk, dim = c64.shape
            onehot = np.zeros((len(m), kk), dtype=np.float64)
            onehot[np.arange(len(m)), a] = 1.0
            sums = onehot.T @ m                       # (k, dim)
            cnts = onehot.sum(axis=0)                 # (k,)
            cl = np.repeat(np.arange(kk, dtype=np.int64), dim + 1)
            dims = np.tile(np.concatenate([[-1], np.arange(dim)]), kk)
            s = np.concatenate([np.concatenate([[cnts[j]], sums[j]])
                                for j in range(kk)])
            return pa.table({"cluster": pa.array(cl),
                             "dim": pa.array(dims.astype(np.int64)),
                             "s": pa.array(s, type=pa.float64())})

        parts = ds.map_batches(partial, batch_format="pyarrow")
        # routed reduction: each BLOCK emits ≤ k·(dim+1) partial rows, so
        # below the bound one driver pass sums them (no shuffle per
        # iteration — the dominant fixed cost at bench scale); above it the
        # same rows reduce through a grouped Sum.  Either order feeds the
        # float32-rounded update, so labels stay partition-invariant.
        k_rows = c.shape[0] * (c.shape[1] + 1)
        if ds.num_blocks() * k_rows <= 1_000_000:
            agg = (parts.to_pandas()
                   .groupby(["cluster", "dim"], as_index=False)["s"].sum())
        else:
            agg = (parts.groupby(["cluster", "dim"])
                   .aggregate(_Sum("s", alias_name="s")).to_pandas())
        piv = agg.pivot(index="cluster", columns="dim", values="s")
        new_c = c.copy()
        for j in piv.index:
            n_j = float(piv.loc[j, -1])
            if n_j > 0:
                vec = piv.loc[j].drop(index=-1).sort_index().to_numpy()
                new_c[int(j)] = (vec / n_j).astype(np.float32)
        c = new_c
    return c


def semantic_dedup_embeddings(sf_dir: str, k: int = 8, iters: int = 4,
                              tau: float = 0.95,
                              broadcast_max_pairs: int | None = None
                              ) -> pd.DataFrame:
    """SemDeDup (Abbas et al. 2023, public): cluster-scoped semantic dedup —
    the canonical curation composition the round-4 verdict asked for.

    1. PARTITION: distributed Lloyd k-means (:func:`_kmeans_fit`) → every
       vector gets a cluster label with one broadcast-centroid matmul.
    2. WITHIN-CLUSTER near-dup candidates: the embedding_near_dup multi-probe
       LSH (own + Hamming-1 buckets, id-only 16 B rows), with the bucket key
       PREFIXED BY THE CLUSTER ID — candidate pairs can never cross clusters,
       so per-bucket occupancy shrinks by ~k and the verify stays
       pair-bounded regardless of corpus-wide density.
    3. VERIFY: routed exact cosine ≥ tau (broadcast fetch below the pair
       bound, two hash joins above — shared `_verify_cosine_routed`).
    4. GROUP + SURVIVOR: distributed connected components → dup_group = min
       member; ``keep`` marks the per-group survivor (min vec_id).

    Iterative + approximate → rows-only driver check; pytest asserts exact
    equality against a single-node numpy oracle that mirrors the SAME
    cluster-scoped candidate scheme, plus planted-duplicate recall and the
    no-cross-cluster-group invariant."""
    ds = (read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
          .materialize())
    first = ds.take_batch(1, batch_format="pyarrow")
    dim = len(first["embedding"][0])
    c = _kmeans_fit(ds, k, iters)
    ref = ray.put((c.astype(np.float64), _planes(dim)))

    def emit(t: pa.Table) -> pa.Table:
        c64, P = ray.get(ref)
        m = _emb_matrix(t)
        vid = t["vec_id"].to_numpy()
        cell = (_assign_cells(m.astype(np.float64), c64) if len(m)
                else np.empty(0, dtype=np.int64))
        signs = (m @ P) >= 0
        base = np.zeros(len(m), dtype=np.int64)
        for b in range(_N_PLANES):
            base |= signs[:, b].astype(np.int64) << b
        probes = np.concatenate([[0], 1 << np.arange(_N_PLANES,
                                                     dtype=np.int64)])
        buckets = (base[:, None] ^ probes[None, :])
        # bucket key namespaced by cluster: pairs never cross clusters
        keyed = (cell[:, None].astype(np.int64) << (_N_PLANES + 1)) | buckets
        return pa.table({
            "vec_id": pa.array(np.repeat(vid, len(probes)), type=pa.int64()),
            "bucket": pa.array(keyed.reshape(-1), type=pa.int64()),
        })

    def pairs_fn(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g["vec_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame(_EMPTY_PAIRS)
        iu, ju = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[iu].astype(np.int64),
                             "b": ids[ju].astype(np.int64)})

    raw = (ds.map_batches(emit, batch_format="pyarrow")
           .groupby("bucket").map_groups(pairs_fn, batch_format="pandas")
           .materialize())

    # per-vector cluster labels: ONE broadcast-centroid matmul pass (no
    # shuffle — recovering them from the 13×n probe rows via groupby would
    # move 13 thin rows per vector for a value each batch computes locally)
    def label_fn(t: pa.Table) -> pa.Table:
        c64, _ = ray.get(ref)
        m = _emb_matrix(t)
        cell = (_assign_cells(m.astype(np.float64), c64) if len(m)
                else np.empty(0, dtype=np.int64))
        return pa.table({"vec_id": t["vec_id"],
                         "cluster": pa.array(cell.astype(np.int64))})

    lab = ds.map_batches(label_fn, batch_format="pyarrow").to_pandas()
    ids = ds.select_columns(["vec_id"])
    if raw.count() == 0:
        comp = graph.components_frame_empty(ids, "vec_id", "dup_group")
    else:
        cand = graph.dedupe_pairs(raw).materialize()
        verified = _verify_cosine_routed(ds, cand, tau,
                                         broadcast_max_pairs).materialize()
        if verified.count() == 0:
            comp = graph.components_frame_empty(ids, "vec_id", "dup_group")
        else:
            comp = graph.components_frame(ids, verified, "vec_id",
                                          "dup_group")
    out = comp.merge(lab, on="vec_id", how="left")
    out["cluster"] = out["cluster"].astype("int64")
    out["keep"] = out["vec_id"] == out["dup_group"]
    return (out[["vec_id", "cluster", "dup_group", "keep"]]
            .sort_values("vec_id").reset_index(drop=True))
