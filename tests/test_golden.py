"""Distributed engine vs single-node NumPy oracle — exact output equality
(SURVEY.md §5.2-3/4).  The oracle is the golden reference (empty reference
checkout, SURVEY §0); labels/representatives/tiles/tile_cluster must match
bit-for-bit after canonical relabeling."""

import numpy as np
import pandas as pd
import pytest

from imc_ray import extract, oracle, pipeline, stages
from imc_ray.config import PipelineConfig

N_DOCS = 200


@pytest.fixture(scope="module")
def gold():
    return oracle.run(extract.synth_pages_table(N_DOCS, seed=42))


def _gold_labels(gold):
    return gold["labels"].sort_values("seg_id").reset_index(drop=True)


def _assert_match(res, gold):
    eng = pipeline.full_labels(res)
    gl = _gold_labels(gold)
    assert len(eng) == len(gl)
    m = eng.merge(gl, on="seg_id", suffixes=("_e", "_g"))
    assert len(m) == len(gl)
    assert int((m.cluster_id_e != m.cluster_id_g).sum()) == 0

    et = res["tiles"].to_pandas().sort_values("tile_id").reset_index(drop=True)
    gt = gold["tiles"].sort_values("tile_id").reset_index(drop=True)
    assert et.astype("int64").equals(gt.astype("int64"))

    etc = (res["tile_cluster"].to_pandas()
           .sort_values(["tile_id", "cluster_id"]).reset_index(drop=True))
    gtc = (gold["tile_cluster"]
           .sort_values(["tile_id", "cluster_id"]).reset_index(drop=True))
    assert etc.equals(gtc)

    er = res["representatives"].sort_values("cluster_id").reset_index(drop=True)
    gr = gold["representatives"].sort_values("cluster_id").reset_index(drop=True)
    assert list(er.cluster_id) == list(gr.cluster_id)
    for i in range(len(er)):
        assert list(er.rep.iloc[i]) == list(gr.rep.iloc[i])
        assert er.n_segs.iloc[i] == gr.n_segs.iloc[i]
        assert er.n_trajs.iloc[i] == gr.n_trajs.iloc[i]


def test_engine_matches_oracle(ray_session, gold):
    res = pipeline.run(stages.synth_pages(N_DOCS, seed=42), PipelineConfig())
    _assert_match(res, gold)


def test_partition_invariance_small_cells(ray_session, gold):
    """Same labels when corridors span many cells (64 m) and the input is
    split into a prime number of blocks — exercises halo replication and
    cross-cell component merging (SURVEY §4.4 gate)."""
    cfg = PipelineConfig(coarse_cell=64.0)
    res = pipeline.run(
        stages.synth_pages(N_DOCS, seed=42, override_num_blocks=13), cfg
    )
    _assert_match_labels_only(res, gold)


def test_partition_invariance_salted(ray_session, gold):
    """Force salting (salt_cap tiny) — a salted hot cell must produce
    identical labels (SURVEY §4.3 skew handling)."""
    cfg = PipelineConfig(salt_cap=20)
    res = pipeline.run(
        stages.synth_pages(N_DOCS, seed=42, override_num_blocks=7), cfg
    )
    assert stages.salt_map_from_telemetry(res["telemetry"], cfg.salt_cap)  # salting active
    _assert_match_labels_only(res, gold)


def test_single_block(ray_session, gold):
    res = pipeline.run(
        stages.synth_pages(N_DOCS, seed=42, override_num_blocks=1), PipelineConfig()
    )
    _assert_match_labels_only(res, gold)


def test_partition_invariance_1000_docs(ray_session):
    """FIXTURES.md sizing: 1000-doc invariance run — small cells + forced
    salting + prime block count simultaneously, vs the oracle."""
    from imc_ray import extract, oracle

    cfg = PipelineConfig(coarse_cell=64.0, salt_cap=50)
    res = pipeline.run(
        stages.synth_pages(1000, seed=42, override_num_blocks=17), cfg
    )
    assert stages.salt_map_from_telemetry(res["telemetry"], cfg.salt_cap)
    gold1k = oracle.run(extract.synth_pages_table(1000, seed=42))
    _assert_match_labels_only(res, gold1k)


def test_two_phase_equals_single_pass(ray_session, gold):
    """The two-phase DBSCAN (1M replication + core-flag broadcast) and the
    single-pass variant (2M replication) must produce identical labels."""
    from imc_ray import stages
    from imc_ray.config import PipelineConfig

    cfg = PipelineConfig(coarse_cell=64.0)
    pages = stages.synth_pages(N_DOCS, seed=42).materialize()
    extracted = stages.extract_pages(stages.dedup_pages(pages), cfg)
    segments = stages.encode_cells(
        stages.build_segments(extracted, cfg).materialize(), cfg
    ).materialize()
    telemetry = stages.cell_telemetry(segments)
    salt_map = stages.salt_map_from_telemetry(telemetry, cfg.salt_cap)

    keyed1 = stages.replicate_for_dbscan(segments, salt_map, cfg).materialize()
    core_df = stages.dbscan_phase1(keyed1, cfg)
    links2p = stages.dbscan_phase2(keyed1, core_df, cfg)
    lab2p = stages.merge_labels(links2p, cfg).sort_values("seg_id")

    keyed2 = stages.replicate_for_dbscan(segments, salt_map, cfg, radius_mult=2.0)
    links1p = stages.dbscan_links(keyed2, cfg)
    lab1p = stages.merge_labels(links1p, cfg).sort_values("seg_id")

    assert list(lab2p["seg_id"]) == list(lab1p["seg_id"])
    assert list(lab2p["cluster_id"]) == list(lab1p["cluster_id"])

    # join-based core-flag attach (no driver broadcast) must emit identical
    # labels to the broadcast variant — the 10^12 two-phase path
    core_ds = stages.dbscan_phase1_ds(keyed1, cfg)
    links_j = stages.dbscan_phase2_joined(keyed1, core_ds, cfg).to_pandas()
    lab_j = stages.merge_labels(links_j, cfg).sort_values("seg_id")
    assert list(lab_j["seg_id"]) == list(lab2p["seg_id"])
    assert list(lab_j["cluster_id"]) == list(lab2p["cluster_id"])

    # the routed wrapper must pick each route correctly (forced by
    # threshold) and match on both
    for bmax in (0, 10**9):
        links_r = stages.dbscan_two_phase(keyed1, cfg,
                                          broadcast_max_flags=bmax)
        lab_r = stages.merge_labels(links_r, cfg).sort_values("seg_id")
        assert list(lab_r["cluster_id"]) == list(lab2p["cluster_id"]), bmax


def test_distributed_merge_equals_driver_merge(ray_session, gold):
    """merge_labels_distributed (no driver materialization) must equal the
    driver-side merge — small cells force multi-bucket label chains."""
    from imc_ray import stages
    from imc_ray.config import PipelineConfig

    cfg = PipelineConfig(coarse_cell=64.0)
    pages = stages.synth_pages(N_DOCS, seed=42).materialize()
    extracted = stages.extract_pages(stages.dedup_pages(pages), cfg)
    segments = stages.encode_cells(
        stages.build_segments(extracted, cfg).materialize(), cfg
    ).materialize()
    telemetry = stages.cell_telemetry(segments)
    salt_map = stages.salt_map_from_telemetry(telemetry, cfg.salt_cap)
    keyed = stages.replicate_for_dbscan(segments, salt_map, cfg,
                                        radius_mult=2.0).materialize()
    links = stages.dbscan_links(keyed, cfg)
    drv = stages.merge_labels(links, cfg)[["seg_id", "cluster_id"]] \
        .sort_values("seg_id").reset_index(drop=True)

    import ray.data as rd

    links_ds = rd.from_pandas(links)
    dist = (stages.merge_labels_distributed(links_ds, segments, cfg)
            .to_pandas().sort_values("seg_id").reset_index(drop=True))
    assert list(drv["seg_id"]) == list(dist["seg_id"])
    assert list(drv["cluster_id"]) == list(dist["cluster_id"])


def test_distributed_merge_with_salting(ray_session):
    """Distributed merge under forced salting — salted sub-buckets emit
    partial components that the propagation rounds must stitch."""
    from imc_ray import stages
    from imc_ray.config import PipelineConfig

    cfg = PipelineConfig(coarse_cell=64.0, salt_cap=30)
    pages = stages.synth_pages(N_DOCS, seed=42).materialize()
    extracted = stages.extract_pages(stages.dedup_pages(pages), cfg)
    segments = stages.encode_cells(
        stages.build_segments(extracted, cfg).materialize(), cfg
    ).materialize()
    telemetry = stages.cell_telemetry(segments)
    salt_map = stages.salt_map_from_telemetry(telemetry, cfg.salt_cap)
    assert salt_map  # salting active
    keyed = stages.replicate_for_dbscan(segments, salt_map, cfg,
                                        radius_mult=2.0).materialize()
    links = stages.dbscan_links(keyed, cfg)
    drv = stages.merge_labels(links, cfg)[["seg_id", "cluster_id"]] \
        .sort_values("seg_id").reset_index(drop=True)

    import ray.data as rd

    dist = (stages.merge_labels_distributed(rd.from_pandas(links), segments, cfg)
            .to_pandas().sort_values("seg_id").reset_index(drop=True))
    assert list(drv["seg_id"]) == list(dist["seg_id"])
    assert list(drv["cluster_id"]) == list(dist["cluster_id"])


def _assert_match_labels_only(res, gold):
    eng = pipeline.full_labels(res)
    gl = _gold_labels(gold)
    m = eng.merge(gl, on="seg_id", suffixes=("_e", "_g"))
    assert len(m) == len(gl) == len(eng)
    assert int((m.cluster_id_e != m.cluster_id_g).sum()) == 0
