"""Stage protocol + registry (SURVEY.md §2.11 user-extension surface).

The reference exposed its knobs as script parameters with no extension
surface; here each pipeline stage is a named ``Stage`` with a uniform
``run(ds, cfg) -> Dataset`` signature so custom pipelines compose as lists:

    from imc_ray.stage_api import STAGES, compose
    ds = compose(pages_ds, cfg, ["dedup", "extract", "segments", "cells"])

``pipeline.run`` remains the tuned flagship composition (it branches and
pins intermediates); the registry is the introspectable à-la-carte surface.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import ray.data

from . import schemas, stages
from .config import PipelineConfig


@dataclass(frozen=True)
class Stage:
    name: str
    run: Callable  # (Dataset, PipelineConfig) -> Dataset
    schema_out: object | None  # pyarrow.Schema where fixed, else None
    doc: str


STAGES: dict[str, Stage] = {
    s.name: s
    for s in [
        Stage("dedup", lambda ds, cfg: stages.dedup_pages(ds), schemas.PAGES,
              "D1 exact url dedup (min warc_ts)"),
        Stage("extract", lambda ds, cfg: stages.extract_pages(ds, cfg),
              schemas.EXTRACTED, "M1 html→text + M3 lang filter"),
        Stage("points", lambda ds, cfg: stages.parse_points(ds), schemas.POINTS,
              "M2 track parse + M4 projection"),
        Stage("segments", lambda ds, cfg: stages.build_segments(ds, cfg), None,
              "M5 clean + M6 MDL partition + split + M7 features"),
        Stage("cells", lambda ds, cfg: stages.encode_cells(ds, cfg),
              schemas.SEGMENTS, "S1 Morton cell encoding (actor pool)"),
        Stage("tiles", lambda ds, cfg: stages.build_tiles_from_pages(ds, cfg),
              schemas.TILES, "A4 occupancy grid from extracted pages"),
    ]
}


def compose(ds: ray.data.Dataset, cfg: PipelineConfig,
            names: list[str]) -> ray.data.Dataset:
    for n in names:
        ds = STAGES[n].run(ds, cfg)
    return ds
