"""CLI entry point — the ``ray job submit`` surface (SURVEY.md §3.4).

    python -m imc_ray --synth 100000 --out /tmp/map            # synthetic corpus
    python -m imc_ray --pages /data/pages_parquet --out /tmp/map
    python -m imc_ray --synth 10000 --ckpt /tmp/ckpt --run-id r7 --out /tmp/map

Owns its Ray session (the only module besides bench.py and the test fixture
that does).  On a cluster the same invocation runs under ``ray job submit``
with ``--num-cpus`` omitted (use the cluster's resources).
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import time
import warnings


def _pages_digest(path: str) -> str:
    """Cheap content token for a pages file/directory: sha256 over the sorted
    (relative path, size, mtime_ns) listing — no data read."""
    import hashlib
    import os

    entries = []
    if os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            for f in sorted(files):
                p = os.path.join(root, f)
                st = os.stat(p)
                entries.append(f"{os.path.relpath(p, path)}:{st.st_size}:{st.st_mtime_ns}")
    elif os.path.exists(path):
        st = os.stat(path)
        entries.append(f"{os.path.basename(path)}:{st.st_size}:{st.st_mtime_ns}")
    h = hashlib.sha256("\n".join(sorted(entries)).encode()).hexdigest()[:16]
    return f"{path}@{h}"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="imc_ray")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--pages", help="directory/file of pages parquet")
    src.add_argument("--synth", type=int, help="synthesize N pages (seed 42)")
    ap.add_argument("--sites", type=int, default=500, help="synthetic site count")
    ap.add_argument("--out", required=True, help="output directory for map artifacts")
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--ckpt", default=None, help="checkpoint root (resumable)")
    ap.add_argument("--run-id", default="cli")
    args = ap.parse_args(argv)

    warnings.filterwarnings("ignore")
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    import ray
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False

    from imc_ray import pipeline, stages
    from imc_ray.config import PipelineConfig

    cfg = PipelineConfig(ckpt_root=args.ckpt, run_id=args.run_id)
    pages = (stages.synth_pages(args.synth, seed=42, n_sites=args.sites)
             if args.synth else stages.read_pages(args.pages))
    # source fingerprint enters the checkpoint lineage chain: a rerun with
    # the same --ckpt but different input recomputes instead of reusing.
    # For file inputs the token digests the file LISTING (path, size,
    # mtime_ns) — editing the input in place invalidates the checkpoints
    # rather than silently replaying them (round-2 advice)
    source_token = (f"synth:{args.synth}:42:{args.sites}" if args.synth
                    else f"pages:{_pages_digest(args.pages)}")
    t0 = time.time()
    res = pipeline.run(pages, cfg, source_token=source_token)
    paths = pipeline.write_map(res, args.out)
    summary = {
        "wall_s": round(time.time() - t0, 1),
        "segments": int(res["segments"].count()),
        "clusters": int(len(res["representatives"])),
        "tile_cluster_rows": int(res["tile_cluster"].count()),
        "outputs": paths,
    }
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
