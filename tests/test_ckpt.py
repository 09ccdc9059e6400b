"""Checkpoint / resume tests (SURVEY.md §5.2-4d: resume-equals-fresh)."""

import json
import os
import shutil

import pytest

from imc_ray import pipeline, stages
from imc_ray.config import PipelineConfig

N_DOCS = 120


@pytest.fixture()
def ckpt_root(tmp_path):
    return str(tmp_path / "ckpt")


def _run(cfg):
    return pipeline.run(stages.synth_pages(N_DOCS, seed=42), cfg)


def test_resume_equals_fresh(ray_session, ckpt_root):
    cfg = PipelineConfig(ckpt_root=ckpt_root, run_id="r1")
    fresh = _run(cfg)
    fresh_labels = pipeline.full_labels(fresh)
    fresh_tc = (fresh["tile_cluster"].to_pandas()
                .sort_values(["tile_id", "cluster_id"]).reset_index(drop=True))

    # simulate a crash after the 'extracted' stage: delete later manifests
    for stage in ("segments", "tiles", "tile_cluster"):
        d = os.path.join(ckpt_root, "r1", stage)
        if os.path.isdir(d):
            shutil.rmtree(d)
    assert os.path.exists(os.path.join(ckpt_root, "r1", "extracted", "_manifest.json"))

    resumed = _run(cfg)
    resumed_labels = pipeline.full_labels(resumed)
    resumed_tc = (resumed["tile_cluster"].to_pandas()
                  .sort_values(["tile_id", "cluster_id"]).reset_index(drop=True))
    assert fresh_labels.equals(resumed_labels)
    assert fresh_tc.equals(resumed_tc)


def test_stale_config_invalidates_checkpoint(ray_session, ckpt_root):
    cfg1 = PipelineConfig(ckpt_root=ckpt_root, run_id="r2", eps=25.0)
    _run(cfg1)
    with open(os.path.join(ckpt_root, "r2", "segments", "_manifest.json")) as f:
        h1 = json.load(f)["config_hash"]
    # changed ε ⇒ different config hash ⇒ stage recomputes, manifest updates
    cfg2 = PipelineConfig(ckpt_root=ckpt_root, run_id="r2", eps=30.0)
    _run(cfg2)
    with open(os.path.join(ckpt_root, "r2", "segments", "_manifest.json")) as f:
        h2 = json.load(f)["config_hash"]
    assert h1 != h2


def test_write_map_roundtrip(ray_session, tmp_path):
    import pyarrow.parquet as pq

    cfg = PipelineConfig()
    res = _run(cfg)
    out = str(tmp_path / "map")
    paths = pipeline.write_map(res, out)
    assert set(paths) == {"tiles", "tile_cluster", "labels", "polygons"}
    tc = pq.read_table(
        [os.path.join(paths["tile_cluster"], f)
         for f in os.listdir(paths["tile_cluster"]) if f.endswith(".parquet")]
    )
    assert tc.num_rows == res["tile_cluster"].count()
    polys = pq.read_table(paths["polygons"])
    assert polys.num_rows == len(res["polygons"])
    assert polys.schema.field("ring").type == pq.read_table(
        paths["polygons"]).schema.field("ring").type


def test_changed_input_invalidates_checkpoint(ray_session, ckpt_root):
    """Round-1 review: same ckpt_root + different INPUT silently reused stale
    checkpoints.  With the source fingerprint chained through the manifests,
    a rerun over a different corpus must recompute, not replay."""
    cfg = PipelineConfig(ckpt_root=ckpt_root, run_id="r4")
    r1 = pipeline.run(stages.synth_pages(100, seed=42), cfg,
                      source_token="synth:100:42")
    n1 = int(r1["segments"].count())
    r2 = pipeline.run(stages.synth_pages(160, seed=42), cfg,
                      source_token="synth:160:42")
    n2 = int(r2["segments"].count())
    assert n2 > n1  # stale 100-doc checkpoints were NOT replayed
    # and an identical rerun still resumes to the same result
    r3 = pipeline.run(stages.synth_pages(160, seed=42), cfg,
                      source_token="synth:160:42")
    assert int(r3["segments"].count()) == n2
    assert pipeline.full_labels(r3).equals(pipeline.full_labels(r2))


def test_metrics_logged(ray_session, ckpt_root):
    cfg = PipelineConfig(ckpt_root=ckpt_root, run_id="r3")
    _run(cfg)
    mpath = os.path.join(ckpt_root, "r3", "metrics.jsonl")
    assert os.path.exists(mpath)
    lines = [json.loads(l) for l in open(mpath)]
    stages_seen = {l["stage"] for l in lines}
    assert {"extracted", "segments", "tiles", "tile_cluster"} <= stages_seen
    for l in lines:
        assert l["rows"] >= 0 and l["n_parts"] >= 1
