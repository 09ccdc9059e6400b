"""CLI + parquet round-trip: write a pages corpus, run the CLI over it in a
fresh process, and check the map artifacts against the oracle."""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq


def test_cli_end_to_end(tmp_path):
    from imc_ray import extract, oracle

    pages_tbl = extract.synth_pages_table(80, seed=42)
    pages_dir = tmp_path / "pages"
    pages_dir.mkdir()
    pq.write_table(pages_tbl, str(pages_dir / "part-0.parquet"))
    out_dir = str(tmp_path / "map")

    env = dict(os.environ)
    p = subprocess.run(
        [sys.executable, "-m", "imc_ray", "--pages", str(pages_dir),
         "--out", out_dir, "--num-cpus", "4"],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=420,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    summary = json.loads(p.stdout.strip().splitlines()[-1])
    gold = oracle.run(pages_tbl)
    assert summary["segments"] == len(gold["segments"])
    assert summary["tile_cluster_rows"] == len(gold["tile_cluster"])
    # artifacts on disk
    labels = pq.read_table(os.path.join(out_dir, "labels.parquet")).to_pandas()
    gl = gold["labels"][gold["labels"].cluster_id >= 0]
    assert set(labels["seg_id"]) == set(gl["seg_id"])
