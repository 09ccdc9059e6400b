"""Per-stage checkpointing with lineage manifests (SURVEY.md §4.6).

Layout::

    <ckpt_root>/<run_id>/<stage>/part-*.parquet
    <ckpt_root>/<run_id>/<stage>/_manifest.json
    <ckpt_root>/<run_id>/metrics.jsonl

A stage whose manifest is complete and whose ``config_hash`` + upstream
fingerprint match is skipped on resume — the pipeline re-reads its parquet
instead of recomputing, so a killed run resumes mid-pipeline (including
between the shuffle stages: shuffle outputs are themselves checkpointed
stages).  Metrics (rows, wall time, per-partition sizes) append to
``metrics.jsonl`` per completed stage — the "per-partition lineage + metrics"
of the north rule (BASELINE.json:14).
"""

from __future__ import annotations

import json
import os
import time

import ray.data


def _stage_dir(root: str, run_id: str, stage: str) -> str:
    return os.path.join(root, run_id, stage)


def _manifest_path(root: str, run_id: str, stage: str) -> str:
    return os.path.join(_stage_dir(root, run_id, stage), "_manifest.json")


def manifest_token(root: str, run_id: str, stage: str) -> str:
    """Stable fingerprint of a completed stage — the value the NEXT stage
    records as its ``upstream`` (round-1 review: validating only the upstream
    stage NAME silently reused checkpoints across changed inputs).  Derived
    from (stage, config_hash, upstream, rows) only: row count is a
    deterministic function of input+config, while part sizes/filenames vary
    with scheduling and would cascade spurious invalidations."""
    import hashlib

    p = _manifest_path(root, run_id, stage)
    try:
        with open(p) as f:
            m = json.load(f)
    except (json.JSONDecodeError, OSError):
        return ""
    payload = (f"{m.get('stage')}|{m.get('config_hash')}|"
               f"{m.get('upstream')}|{m.get('rows')}")
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def manifest_ok(root: str, run_id: str, stage: str, config_hash: str,
                upstream: str = "") -> bool:
    p = _manifest_path(root, run_id, stage)
    if not os.path.exists(p):
        return False
    try:
        with open(p) as f:
            m = json.load(f)
    except (json.JSONDecodeError, OSError):
        return False
    return (
        m.get("complete") is True
        and m.get("config_hash") == config_hash
        and m.get("upstream") == upstream
    )


def read_stage(root: str, run_id: str, stage: str) -> ray.data.Dataset:
    """Dataset over a completed stage's parquet (caller checked manifest_ok)."""
    return ray.data.read_parquet(_stage_dir(root, run_id, stage),
                                 file_extensions=["parquet"])


def checkpoint_stage(ds: ray.data.Dataset, root: str, run_id: str, stage: str,
                     config_hash: str, upstream: str = "") -> ray.data.Dataset:
    """Write ``ds`` as the stage checkpoint (atomic-ish: manifest written
    last) and return a Dataset reading it back — downstream stages consume
    the on-disk copy, so a resumed run and a fresh run see identical bytes."""
    d = _stage_dir(root, run_id, stage)
    if manifest_ok(root, run_id, stage, config_hash, upstream):
        return ray.data.read_parquet(d, file_extensions=["parquet"])
    os.makedirs(d, exist_ok=True)
    # clear stale partials (manifest absent/mismatched ⇒ not trusted)
    for f in os.listdir(d):
        if f.endswith(".parquet"):
            os.remove(os.path.join(d, f))
    t0 = time.time()
    ds.write_parquet(d)
    parts = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
    part_meta = [
        {"file": f, "bytes": os.path.getsize(os.path.join(d, f))} for f in parts
    ]
    out = ray.data.read_parquet(d, file_extensions=["parquet"])
    rows = out.count()
    with open(_manifest_path(root, run_id, stage), "w") as f:
        json.dump(
            {
                "stage": stage,
                "complete": True,
                "config_hash": config_hash,
                "upstream": upstream,
                "rows": rows,
                "parts": part_meta,
            },
            f,
        )
    log_metrics(root, run_id, stage, rows=rows, wall_s=time.time() - t0,
                n_parts=len(parts))
    return out


def log_metrics(root: str, run_id: str, stage: str, **kv) -> None:
    os.makedirs(os.path.join(root, run_id), exist_ok=True)
    with open(os.path.join(root, run_id, "metrics.jsonl"), "a") as f:
        f.write(json.dumps({"stage": stage, **kv}) + "\n")
