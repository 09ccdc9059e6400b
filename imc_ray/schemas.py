"""Declared Arrow schemas for every logical table (SURVEY.md §1.3).

The reference kept its schemas implicit in Python classes (Point/Trajectory/
Segment objects, TRACLUS §3 definitions); the Ray engine makes them explicit
pyarrow schemas so every ``map_batches`` stage has a fixed, checkable contract.
"""

from __future__ import annotations

import pyarrow as pa

PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.large_string()),
        ("lang", pa.string()),
    ]
)

EXTRACTED = pa.schema(
    [
        ("url", pa.string()),
        ("text", pa.large_string()),
        ("lang", pa.string()),
    ]
)

POINTS = pa.schema(
    [
        ("traj_id", pa.string()),
        ("seq", pa.int32()),
        ("x", pa.float64()),
        ("y", pa.float64()),
        ("t", pa.timestamp("us")),
    ]
)

SEGMENTS = pa.schema(
    [
        ("seg_id", pa.int64()),
        ("traj_id", pa.string()),
        ("x1", pa.float64()),
        ("y1", pa.float64()),
        ("x2", pa.float64()),
        ("y2", pa.float64()),
        ("seg_len", pa.float64()),
        ("angle", pa.float64()),
        ("cell", pa.int64()),
    ]
)

LABELS = pa.schema(
    [
        ("seg_id", pa.int64()),
        ("cluster_id", pa.int64()),  # canonical = min seg_id in cluster; -1 = noise
    ]
)

XY_STRUCT = pa.struct([("x", pa.float64()), ("y", pa.float64())])

REPRESENTATIVES = pa.schema(
    [
        ("cluster_id", pa.int64()),
        ("rep", pa.list_(XY_STRUCT)),
        ("n_segs", pa.int64()),
        ("n_trajs", pa.int64()),
    ]
)

POLYGONS = pa.schema(
    [
        ("cluster_id", pa.int64()),
        ("ring", pa.list_(XY_STRUCT)),
    ]
)

TILES = pa.schema(
    [
        ("tile_id", pa.int64()),
        ("i", pa.int64()),
        ("j", pa.int64()),
        ("occupancy", pa.int64()),
    ]
)

TILE_CLUSTER = pa.schema(
    [
        ("tile_id", pa.int64()),
        ("cluster_id", pa.int64()),
        ("frac", pa.float64()),
    ]
)


def polygons_table(polygons_df) -> pa.Table:
    """POLYGONS-schema Arrow table from the driver polygons frame
    (cluster_id + [{'x','y'}] rings) — the ONE conversion shared by the
    co-partition spatial join and the map writer, so the ring struct layout
    cannot drift between them."""
    # Arrow converts the nested list-of-{'x','y'} rows in C — no per-point
    # Python loop (round-3 advice: the dict comprehension here was the one
    # remaining per-point driver loop feeding the broadcast J3 route)
    rings = polygons_df["ring"].tolist() if len(polygons_df) else []
    return pa.table({
        "cluster_id": pa.array(
            polygons_df["cluster_id"].astype("int64")
            if len(polygons_df) else [], type=pa.int64()),
        "ring": pa.array(rings, type=POLYGONS.field("ring").type),
    })
