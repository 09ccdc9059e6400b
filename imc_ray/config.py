"""Pipeline configuration (SURVEY.md §2.11).

The reference exposed its knobs as script-level parameters (epsilon, MinLns,
MDL weights, gamma — TRACLUS §6 conventions); here they are one frozen-ish
dataclass threaded through every stage.  All defaults are graft-normative:
there is no runnable reference (SURVEY.md §0), so the NumPy oracle and the
distributed engine share these exact values and must agree bit-for-bit.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass
class PipelineConfig:
    # --- TRACLUS clustering parameters (TRACLUS §6 conventional defaults) ---
    eps: float = 25.0          # ε for segment-distance DBSCAN (meters)
    min_lns: int = 3           # MinLns: core threshold + trajectory cardinality
    gamma: float = 12.5        # sweep-line min spacing for representatives (≈ ε/2)
    w_perp: float = 1.0        # segment-distance component weights
    w_par: float = 1.0
    w_ang: float = 1.0

    # --- MDL partitioning ---
    mdl_clamp: float = 1.0     # distances are clamped to >= this before log2
                               # (keeps costs finite; graft-normative)
    max_seg_len: float = 50.0  # segments longer than this are split post-MDL —
                               # bounds the DBSCAN halo width (SURVEY.md §4.4)

    # --- spatial indexing / partitioning ---
    coarse_cell: float = 512.0   # DBSCAN shuffle cell size (meters); must be
                                 # >> halo width for thin halos
    tile_size: float = 5.0       # occupancy-grid raster resolution (meters)
    halo_margin: float = 2.5     # neighbor-midpoint bound M = halo_margin·ε +
                                 # max_seg_len; replication radius is 2M
    salt_cap: int = 20_000       # segments per (cell,salt) bucket before salting
                                 # splits the cell (skew handling, SURVEY §4.3)

    # --- corridor polygons ---
    corridor_halfwidth: float = 6.0   # buffer half-width for corridor rings
    miter_limit: float = 2.0

    # --- projection ---
    earth_radius: float = 6_371_000.0  # equirectangular projection radius

    # --- execution ---
    driver_merge_max_links: int = 20_000_000
    # runs with up to this many SEGMENTS use the driver-side vectorized label
    # merge; above it the pipeline routes through the fully-distributed
    # join+groupby-min propagation with NO driver materialization (the
    # 10^12-row path; equality asserted in tests; measured 1M-doc/2.9M-seg
    # runs: driver path ~5 s of merge, distributed path minutes — the
    # crossover sits far above this sandbox).  Sizing (round-2 advice made
    # this honest): links ≈ a few × segments (replicated-core emissions +
    # border pairs), and the driver frame is FOUR int64 columns (~32 B/link
    # — dbscan_links hashes traj_id to int64 before to_pandas), so 20M
    # segments ≈ 40-60M links ≈ 1.3-2 GB on the driver; a free metadata
    # count routes without a links-materialize barrier
    batch_size: int = 8192
    actor_pool: tuple = (1, 32)  # (min, max) actors for stateful stages —
                                 # autoscales down on small sessions
    ckpt_root: str | None = None  # per-stage checkpoint dir (SURVEY §4.6); None = off
    run_id: str = "run0"

    # --- language hygiene ---
    langs: tuple = ("en",)

    @property
    def halo(self) -> float:
        """Midpoint-distance bound M: every ε-neighbor (TRACLUS distance) of a
        segment has its midpoint within M of that segment's midpoint.
        M = halo_margin·ε + max_seg_len (SURVEY.md §4.4; empirically validated
        in tests/test_kernels.py::test_halo_bound)."""
        return self.halo_margin * self.eps + self.max_seg_len

    def config_hash(self) -> str:
        """Stable hash over every label-affecting parameter — part of the
        checkpoint manifest so stale checkpoints are never reused."""
        payload = json.dumps(asdict(self), sort_keys=True, default=str)
        return hashlib.sha256(payload.encode()).hexdigest()[:16]


DEFAULT_CONFIG = PipelineConfig()
