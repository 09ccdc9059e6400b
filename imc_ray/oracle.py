"""Single-node NumPy reference pipeline (SURVEY.md §5.1).

The reference checkout was empty (SURVEY §0), so this module IS the golden
reference: a direct, single-process implementation of the TRACLUS semantics
(M1..C6, A4, J3) over a pages Arrow table, sharing every geometry kernel with
the distributed engine via :mod:`imc_ray.geom`.  The distributed pipeline in
:mod:`imc_ray.pipeline` must reproduce these outputs exactly (tests/test_golden.py,
tests/test_invariance.py).

No Ray imports here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from . import extract, geom
from .config import DEFAULT_CONFIG, PipelineConfig


def dedup_pages(pages: pa.Table) -> pa.Table:
    """D1: keep the first crawl (min warc_ts, ties by row position) per url."""
    df = pages.to_pandas()
    df = df.sort_values(["url", "warc_ts"], kind="stable").drop_duplicates("url")
    return pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False)


def pages_to_points(pages: pa.Table, cfg: PipelineConfig) -> pd.DataFrame:
    """M1 extract + M3 lang filter + M2 parse + M4 project → points frame."""
    rows = []
    for url, html, lang in zip(
        pages["url"].to_pylist(), pages["html"].to_pylist(), pages["lang"].to_pylist()
    ):
        if cfg.langs and lang not in cfg.langs:
            continue
        text = extract.extract_text(html)
        for traj_id, lat, lon, ts in extract.parse_tracks(url, text):
            x, y = geom.project_xy(lat, lon, extract.ANCHOR_LAT, extract.ANCHOR_LON)
            rows.append(
                pd.DataFrame(
                    {
                        "traj_id": traj_id,
                        "seq": np.arange(len(x), dtype=np.int32),
                        "x": x,
                        "y": y,
                        "t": ts,
                    }
                )
            )
    if not rows:
        return pd.DataFrame(columns=["traj_id", "seq", "x", "y", "t"])
    return pd.concat(rows, ignore_index=True)


def clean_trajectory(pts: np.ndarray) -> np.ndarray:
    """M5: drop consecutive duplicate points (exact float equality)."""
    if len(pts) < 2:
        return pts
    keep = np.concatenate([[True], np.any(np.diff(pts, axis=0) != 0.0, axis=1)])
    return pts[keep]


def points_to_segments(points: pd.DataFrame, cfg: PipelineConfig) -> pd.DataFrame:
    """M5 clean + M6 MDL partition + long-segment split + deterministic seg ids.

    seg_id = blake2b-63bit of "traj_id#char_index#part_index" — stable across
    any execution order (SURVEY §4.5)."""
    out = {k: [] for k in ("seg_id", "traj_id", "x1", "y1", "x2", "y2")}
    for traj_id, g in points.sort_values(["traj_id", "seq"], kind="stable").groupby(
        "traj_id", sort=True
    ):
        pts = clean_trajectory(g[["x", "y"]].to_numpy(dtype=np.float64))
        if len(pts) < 2:
            continue
        cps = geom.mdl_partition(pts, cfg.mdl_clamp)
        raw = np.column_stack(
            [pts[cps[:-1], 0], pts[cps[:-1], 1], pts[cps[1:], 0], pts[cps[1:], 1]]
        )
        split, parent, part = geom.split_long_segments(raw, cfg.max_seg_len)
        names = [
            f"{traj_id}#{int(parent[i])}#{int(part[i])}" for i in range(len(split))
        ]
        ids = geom.stable_hash64(names)
        out["seg_id"].append(ids)
        out["traj_id"].append(np.full(len(split), traj_id, dtype=object))
        out["x1"].append(split[:, 0])
        out["y1"].append(split[:, 1])
        out["x2"].append(split[:, 2])
        out["y2"].append(split[:, 3])
    if not out["seg_id"]:
        return pd.DataFrame(
            columns=["seg_id", "traj_id", "x1", "y1", "x2", "y2", "seg_len", "angle"]
        )
    df = pd.DataFrame({k: np.concatenate(v) for k, v in out.items()})
    df["seg_len"] = np.hypot(df.x2 - df.x1, df.y2 - df.y1)
    df["angle"] = np.arctan2(df.y2 - df.y1, df.x2 - df.x1)
    return df


def cluster_segments(segments: pd.DataFrame, cfg: PipelineConfig) -> pd.DataFrame:
    """C1+C2+C3+C4 in one process: deterministic DBSCAN over all segments."""
    segs = segments[["x1", "y1", "x2", "y2"]].to_numpy(dtype=np.float64)
    labels = geom.dbscan_segments(
        segs,
        segments["seg_id"].to_numpy(),
        segments["traj_id"].to_numpy(),
        cfg.eps,
        cfg.min_lns,
        (cfg.w_perp, cfg.w_par, cfg.w_ang),
    )
    return pd.DataFrame({"seg_id": segments["seg_id"].to_numpy(), "cluster_id": labels})


def representatives(segments: pd.DataFrame, labels: pd.DataFrame,
                    cfg: PipelineConfig) -> pd.DataFrame:
    """C5 per cluster → rep polyline rows (cluster_id, rep, n_segs, n_trajs)."""
    df = segments.merge(labels, on="seg_id")
    df = df[df.cluster_id >= 0]
    rows = []
    for cid, g in df.groupby("cluster_id", sort=True):
        rep = geom.representative(
            g[["x1", "y1", "x2", "y2"]].to_numpy(dtype=np.float64),
            g["seg_id"].to_numpy(),
            cfg.min_lns,
            cfg.gamma,
        )
        rows.append(
            {
                "cluster_id": int(cid),
                "rep": [{"x": float(x), "y": float(y)} for x, y in rep],
                "n_segs": int(len(g)),
                "n_trajs": int(g["traj_id"].nunique()),
            }
        )
    return pd.DataFrame(rows, columns=["cluster_id", "rep", "n_segs", "n_trajs"])


def polygons(reps: pd.DataFrame, cfg: PipelineConfig) -> pd.DataFrame:
    """C6: corridor ring per representative with ≥ 2 points."""
    rows = []
    for _, r in reps.iterrows():
        line = np.asarray([[p["x"], p["y"]] for p in r["rep"]], dtype=np.float64)
        if len(line) < 2:
            continue
        ring = geom.buffer_polyline(line, cfg.corridor_halfwidth, cfg.miter_limit)
        rows.append(
            {
                "cluster_id": int(r["cluster_id"]),
                "ring": [{"x": float(x), "y": float(y)} for x, y in ring],
            }
        )
    return pd.DataFrame(rows, columns=["cluster_id", "ring"])


def occupancy_tiles(points: pd.DataFrame, cfg: PipelineConfig) -> pd.DataFrame:
    """A4: raster occupancy grid — trajectory points per tile."""
    if len(points) == 0:
        return pd.DataFrame(columns=["tile_id", "i", "j", "occupancy"])
    tid = geom.cell_id(points["x"].to_numpy(), points["y"].to_numpy(), cfg.tile_size)
    df = pd.DataFrame({"tile_id": tid})
    out = df.groupby("tile_id", sort=True).size().reset_index(name="occupancy")
    i, j, _, _ = geom.cell_decode(out["tile_id"].to_numpy(), cfg.tile_size)
    out["i"] = i
    out["j"] = j
    return out[["tile_id", "i", "j", "occupancy"]]


def tile_cluster_join(tiles: pd.DataFrame, polys: pd.DataFrame,
                      cfg: PipelineConfig) -> pd.DataFrame:
    """J3: raster↔vector join — tile (4 corners + center sampled) × corridor
    polygon containment; frac = inside-samples / 5, rows kept if frac > 0.
    Graft-normative sampling rule (SURVEY §2.5 J3)."""
    if len(tiles) == 0 or len(polys) == 0:
        return pd.DataFrame(columns=["tile_id", "cluster_id", "frac"])
    rings = [
        np.asarray([[p["x"], p["y"]] for p in r], dtype=np.float64)
        for r in polys["ring"]
    ]
    cids = polys["cluster_id"].to_numpy()
    boxes = np.asarray(
        [[r[:, 0].min(), r[:, 1].min(), r[:, 0].max(), r[:, 1].max()] for r in rings]
    )
    tree = geom.STRtree(boxes)
    s = cfg.tile_size
    _, _, x0, y0 = geom.cell_decode(tiles["tile_id"].to_numpy(), s)
    rows = []
    for k in range(len(tiles)):
        cand = tree.query(x0[k], y0[k], x0[k] + s, y0[k] + s)
        if len(cand) == 0:
            continue
        sx = np.array([x0[k], x0[k] + s, x0[k] + s, x0[k], x0[k] + s / 2])
        sy = np.array([y0[k], y0[k], y0[k] + s, y0[k] + s, y0[k] + s / 2])
        for c in cand:
            frac = float(geom.points_in_ring(sx, sy, rings[c]).sum()) / 5.0
            if frac > 0:
                rows.append(
                    {
                        "tile_id": int(tiles["tile_id"].iloc[k]),
                        "cluster_id": int(cids[c]),
                        "frac": frac,
                    }
                )
    return pd.DataFrame(rows, columns=["tile_id", "cluster_id", "frac"])


def run(pages: pa.Table, cfg: PipelineConfig = DEFAULT_CONFIG) -> dict:
    """Full single-node pipeline → dict of pandas frames (the golden output)."""
    pages = dedup_pages(pages)
    points = pages_to_points(pages, cfg)
    segments = points_to_segments(points, cfg)
    labels = cluster_segments(segments, cfg)
    reps = representatives(segments, labels, cfg)
    polys = polygons(reps, cfg)
    tiles = occupancy_tiles(points, cfg)
    tc = tile_cluster_join(tiles, polys, cfg)
    return {
        "points": points,
        "segments": segments,
        "labels": labels,
        "representatives": reps,
        "polygons": polys,
        "tiles": tiles,
        "tile_cluster": tc,
    }
