"""Stage protocol surface (SURVEY.md §2.11)."""


def test_compose_pages_to_cells(ray_session):
    from imc_ray import stage_api, stages
    from imc_ray.config import PipelineConfig

    cfg = PipelineConfig()
    pages = stages.synth_pages(40, seed=42).materialize()
    segs = stage_api.compose(pages, cfg, ["dedup", "extract", "segments", "cells"])
    df = segs.to_pandas()
    assert len(df) > 0
    assert "cell" in df.columns and "seg_id" in df.columns


def test_registry_docs(ray_session):
    from imc_ray.stage_api import STAGES

    assert {"dedup", "extract", "points", "segments", "cells", "tiles"} <= set(STAGES)
    for s in STAGES.values():
        assert s.doc and callable(s.run)
