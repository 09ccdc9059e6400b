"""Flagship pipeline composition (SURVEY.md §3.2).

    pages → dedup (D1) → extract (M1/M3) → segments (M2/M4/M5/M6 fused)
          → CellEncoder actor pool (S1) → telemetry/salting (A2)
          → halo replication → (cell,salt) groupby DBSCAN (C1/C2)
          → link merge + cardinality (C3/C4) → representatives (C5)
          → corridor polygons (C6)
    pages → points (M2/M4) → occupancy tiles (A4) → raster↔vector join (J3)

Ray is never initialised here — the driver / bench / test fixture owns the
session.  With ``cfg.ckpt_root`` set, every materialized stage checkpoints
with a lineage manifest and a rerun resumes from the last complete stage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from . import ckpt, stages
from .config import DEFAULT_CONFIG, PipelineConfig


def _maybe_ckpt(ds, cfg: PipelineConfig, stage: str, upstream: str = "",
                pin: bool = False):
    """Checkpoint the stage to parquet when ckpt_root is set; otherwise, for
    stages consumed by MULTIPLE downstream branches (``pin=True``),
    materialize into the object store so the lineage isn't re-executed per
    consumer.  At production scale the disk checkpoint is the right pin; the
    object-store pin is the test/bench fast path.

    Returns (dataset, token): ``token`` fingerprints this stage's completed
    manifest and is passed as the NEXT stage's ``upstream``, so the manifest
    chain validates actual input lineage (source fingerprint → extracted →
    segments → keyed), not just stage names."""
    if cfg.ckpt_root:
        out = ckpt.checkpoint_stage(
            ds, cfg.ckpt_root, cfg.run_id, stage, cfg.config_hash(), upstream
        )
        return out, ckpt.manifest_token(cfg.ckpt_root, cfg.run_id, stage)
    return (ds.materialize() if pin else ds), ""


def _maybe_ckpt_lazy(make, cfg: PipelineConfig, stage: str, upstream: str = "",
                     pin: bool = False):
    """Like :func:`_maybe_ckpt` but the stage's input lineage is built by the
    ``make`` thunk ONLY when the checkpoint cannot be resumed — needed for
    stages whose construction materializes eagerly (dedup's keyed pages, the
    MDL segment build), which would otherwise re-execute the source on every
    resume (round-2 review follow-up)."""
    if cfg.ckpt_root and ckpt.manifest_ok(cfg.ckpt_root, cfg.run_id, stage,
                                          cfg.config_hash(), upstream):
        out = ckpt.read_stage(cfg.ckpt_root, cfg.run_id, stage)
        return out, ckpt.manifest_token(cfg.ckpt_root, cfg.run_id, stage)
    return _maybe_ckpt(make(), cfg, stage, upstream, pin)


def _merge_and_assign(keyed: ray.data.Dataset, segments: ray.data.Dataset,
                      cfg: PipelineConfig):
    """C3+C4 routing (SURVEY §4.4): the SEGMENT count (a free metadata scalar
    — segments is already materialized) picks the merge path; the link set is
    linear in replicated segments, so routing on segments avoids a
    materialize+count barrier on the links themselves (measured ~10 s of
    serial time at 16 CPUs — it cost 0.07 of scaling efficiency).  Small runs
    (≤ cfg.driver_merge_max_links segments) use the driver-side vectorized
    merge + broadcast label assignment; larger ones route through the
    fully-distributed join+groupby-min propagation and a native left-outer
    hash join on seg_id, with no driver materialization of per-segment data
    (the 10^12-row path; the two are asserted equal in tests/test_golden.py).

    Returns (labels, labeled_segments): ``labels`` is a DataFrame on the
    driver path and a Dataset on the distributed path."""
    if segments.count() <= cfg.driver_merge_max_links:
        labels = stages.merge_labels(stages.dbscan_links(keyed, cfg), cfg)
        labeled = stages.assign_labels(segments, labels)
        return labels[["seg_id", "cluster_id"]].reset_index(drop=True), labeled
    links_ds = stages.dbscan_links_ds(keyed, cfg).materialize()
    labels_ds = stages.merge_labels_distributed(
        links_ds, segments, cfg).materialize()
    labeled = stages.assign_labels_ds(segments, labels_ds)
    return labels_ds, labeled


def run(pages: ray.data.Dataset, cfg: PipelineConfig = DEFAULT_CONFIG,
        verify_invariant: bool = False, source_token: str = "") -> dict:
    """Run the full map-construction pipeline; returns a dict with the
    output Datasets / DataFrames:

    ``segments`` (Dataset), ``labels`` (DataFrame on the driver-merge path /
    Dataset on the distributed path), ``representatives`` (DataFrame),
    ``polygons`` (DataFrame), ``tiles`` (Dataset), ``tile_cluster``
    (Dataset), ``telemetry`` (DataFrame).

    ``verify_invariant=True`` asserts per row that the extracted text is
    byte-identical to the crawler-provided ``text`` column (the north-rule
    invariant) while extracting.  ``source_token`` fingerprints the INPUT
    (path / synth spec) into the checkpoint lineage chain so a rerun with the
    same ckpt_root but a different source never reuses stale checkpoints.
    """
    # dedup materializes its keyed pages internally (single source
    # execution) — built lazily so a resume with a valid 'parsed'
    # checkpoint never re-executes the source.  extracted now has ONE
    # consumer (the fused parse), so it streams unpinned — no full-corpus
    # text copy in the object store.
    def make_extracted():
        deduped = stages.dedup_pages(pages)
        return stages.extract_pages(deduped, cfg, verify_invariant)

    extracted, tok_ex = _maybe_ckpt_lazy(make_extracted, cfg, "extracted",
                                         upstream=source_token, pin=False)

    # ONE parse pass feeds both branches (segments + tiles — round-3 review
    # item 7: the two-branch design parsed every page twice); the combined
    # table is segment+tile-partial rows — tiny relative to pages — and the
    # pin doubles as the mid-pipeline resume point.  The materialize also
    # keeps Ray from fusing the parse tasks INTO the downstream actor pool
    # (measured 12x slower when fused behind the pool ramp-up).
    def make_parsed():
        return stages.build_parsed(extracted, cfg)

    parsed, tok_par = _maybe_ckpt_lazy(make_parsed, cfg, "parsed",
                                       upstream=tok_ex, pin=True)

    def make_segments():
        return stages.encode_cells(stages.split_segments(parsed), cfg)

    segments, tok_seg = _maybe_ckpt_lazy(make_segments, cfg, "segments",
                                         upstream=tok_par)
    # Keep the segment set pinned: it feeds telemetry, the keyed shuffle and
    # label assignment (small relative to pages — SURVEY §4.2).
    segments = segments.materialize()

    telemetry = stages.cell_telemetry(segments)
    salt_map = stages.salt_map_from_telemetry(telemetry, cfg.salt_cap)

    # single-pass DBSCAN: replicate at 2M so core flags are locally exact for
    # every segment within M of a cell (stages.dbscan_links docstring)
    keyed = stages.replicate_for_dbscan(segments, salt_map, cfg, radius_mult=2.0)
    # checkpointing the keyed (replicated) set = resume point just before the
    # big exchange — "resume mid-shuffle" (SURVEY §4.6)
    keyed, _ = _maybe_ckpt(keyed, cfg, "keyed", upstream=tok_seg)
    labels, labeled = _merge_and_assign(keyed, segments, cfg)
    # pin reps: polygons derive from them — without the pin the cluster_id
    # groupby shuffle would re-execute for the polygon branch
    reps_ds = stages.build_representatives(labeled, cfg).materialize()
    polys_ds = stages.build_polygons(reps_ds, cfg)

    tiles = stages.tiles_from_parsed(parsed, cfg)
    tiles, tok_tiles = _maybe_ckpt(tiles, cfg, "tiles", upstream=tok_par)

    # J3 routed by cluster count (free metadata — reps is pinned): broadcast
    # TileJoiner while the polygon set is small, cell-keyed co-partition
    # when cluster count has grown corpus-proportional.  On the co-partition
    # route the polygon set never rides a driver DataFrame into the join;
    # ``polygons``/``representatives`` in the result dict remain driver
    # frames as the declared compare surface (like graph.components_frame —
    # at-scale consumers would stream ``polys_ds`` / ``reps_ds`` to a
    # parquet sink instead of collecting them).
    if reps_ds.count() > stages._SPATIAL_BROADCAST_MAX_POLYS:
        polys_pin = polys_ds.materialize()
        tile_cluster = stages.spatial_join_copartition(tiles, polys_pin, cfg)
        polys = polys_pin.to_pandas()
    else:
        polys = polys_ds.to_pandas()
        tile_cluster = stages.spatial_join(tiles, polys, cfg)
    reps = reps_ds.to_pandas()
    tile_cluster, _ = _maybe_ckpt(tile_cluster, cfg, "tile_cluster",
                                  upstream=tok_tiles)

    return {
        "segments": segments,
        "labels": labels,
        "representatives": reps,
        "polygons": polys,
        "tiles": tiles,
        "tile_cluster": tile_cluster,
        "telemetry": telemetry,
    }


def run_from_points(points: ray.data.Dataset,
                    cfg: PipelineConfig = DEFAULT_CONFIG) -> dict:
    """Flagship from a POINTS source (e.g. ``stages.read_tracks_csv`` — the
    reference's native trajectory-file input): one groupby(traj_id) shuffle
    builds segments, then clustering / representatives / tiles / spatial
    join are the same stages as the pages path (identical deterministic
    outputs for the same point set — asserted in tests)."""
    points = points.materialize()  # consumed by segments and tiles branches
    segments = stages.segments_from_points(points, cfg).materialize()
    segments = stages.encode_cells(segments, cfg).materialize()
    telemetry = stages.cell_telemetry(segments)
    salt_map = stages.salt_map_from_telemetry(telemetry, cfg.salt_cap)
    keyed = stages.replicate_for_dbscan(segments, salt_map, cfg, radius_mult=2.0)
    labels, labeled = _merge_and_assign(keyed, segments, cfg)
    reps_ds = stages.build_representatives(labeled, cfg).materialize()
    polys_ds = stages.build_polygons(reps_ds, cfg)
    reps = reps_ds.to_pandas()
    polys = polys_ds.to_pandas()
    tiles = stages.build_tiles(points, cfg)
    tile_cluster = stages.spatial_join(tiles, polys, cfg)
    return {
        "segments": segments,
        "labels": labels,
        "representatives": reps,
        "polygons": polys,
        "tiles": tiles,
        "tile_cluster": tile_cluster,
        "telemetry": telemetry,
    }


def knn_query(pages: ray.data.Dataset, cfg: PipelineConfig = DEFAULT_CONFIG,
              k: int = 3) -> ray.data.Dataset:
    """J4 standalone: segment-Hausdorff kNN join over the cell+halo keyed
    segments (candidates complete within the replication radius 2M)."""
    deduped = stages.dedup_pages(pages)
    extracted = stages.extract_pages(deduped, cfg)
    segments = stages.encode_cells(
        stages.build_segments(extracted, cfg).materialize(), cfg
    ).materialize()
    telemetry = stages.cell_telemetry(segments)
    salt_map = stages.salt_map_from_telemetry(telemetry, cfg.salt_cap)
    keyed = stages.replicate_for_dbscan(segments, salt_map, cfg, radius_mult=2.0)
    # segments passed through → sparse-region homes whose k-th neighbor may
    # lie beyond the replication radius are re-resolved exactly (J4 ring
    # expansion; stages.knn_join docstring)
    return stages.knn_join(keyed, k, cfg, segments=segments)


def write_map(result: dict, out_dir: str) -> dict:
    """SNK2 — persist the corridor-map artifact: polygons, tiles, tile_cluster
    (+ labels) as partitioned Parquet directories, one per table, so a rerun
    can skip finished tables.  Returns {table: path}."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from .schemas import polygons_table

    paths = {}
    os.makedirs(out_dir, exist_ok=True)
    # big tables stream from their Datasets
    for name in ("tiles", "tile_cluster"):
        p = os.path.join(out_dir, name)
        result[name].write_parquet(p)
        paths[name] = p
    # labels: a Dataset on the distributed-merge path — stream it to a
    # partitioned dir like the other big tables (round-2 review: funnelling
    # it through a driver DataFrame reintroduced the materialization the
    # distributed path exists to avoid); small DataFrame otherwise
    if isinstance(result["labels"], pd.DataFrame):
        lbl = pa.Table.from_pandas(labels_frame(result["labels"]),
                                   preserve_index=False)
        p = os.path.join(out_dir, "labels.parquet")
        pq.write_table(lbl, p)
    else:
        p = os.path.join(out_dir, "labels")
        result["labels"].write_parquet(p)
    paths["labels"] = p
    polys = result["polygons"]
    ptab = polygons_table(polys)
    p = os.path.join(out_dir, "polygons.parquet")
    pq.write_table(ptab, p)
    paths["polygons"] = p
    return paths


def labels_frame(labels) -> pd.DataFrame:
    """Normalize the ``labels`` result (DataFrame on the driver-merge path,
    Dataset on the distributed path) to a (seg_id, cluster_id) DataFrame —
    only for small-result consumption (tests/compare surface)."""
    if isinstance(labels, pd.DataFrame):
        df = labels.copy()
    else:
        df = labels.to_pandas()
        if "seg_id" not in df.columns:  # empty dataset loses its schema
            return pd.DataFrame({"seg_id": pd.Series(dtype="int64"),
                                 "cluster_id": pd.Series(dtype="int64")})
    return df[["seg_id", "cluster_id"]]


def full_labels(result: dict) -> pd.DataFrame:
    """Labels for EVERY segment (noise = -1), sorted by seg_id — the
    exact-match comparison surface vs the oracle (tests/test_golden.py)."""
    seg_ids = result["segments"].select_columns(["seg_id"]).to_pandas()
    if "seg_id" not in seg_ids.columns:  # empty dataset loses its schema
        return pd.DataFrame({"seg_id": pd.Series(dtype="int64"),
                             "cluster_id": pd.Series(dtype="int64")})
    lab = labels_frame(result["labels"])
    # nullable Int64 keeps 64-bit ids exact through the left join (a float64
    # NaN-fill would round ids beyond 2^53)
    lab["cluster_id"] = lab["cluster_id"].astype("Int64")
    out = seg_ids.merge(lab, on="seg_id", how="left")
    out["cluster_id"] = out["cluster_id"].fillna(-1).astype(np.int64)
    return out.sort_values("seg_id").reset_index(drop=True)
