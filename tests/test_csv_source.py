"""CSV trajectory source (the reference's native input format) must produce
exactly the same map as the pages path for the same point set."""

import numpy as np
import pandas as pd

from imc_ray import extract, geom, oracle, pipeline, stages
from imc_ray.config import PipelineConfig

N_DOCS = 120


def _points_csv(tmp_path):
    """Dump the synth corpus's (en, deduped) points as lat/lon CSV."""
    pages = extract.synth_pages_table(N_DOCS, seed=42)
    pages = oracle.dedup_pages(pages)
    pts = oracle.pages_to_points(pages, PipelineConfig())
    lat, lon = geom.unproject_xy(pts["x"].to_numpy(), pts["y"].to_numpy(),
                                 extract.ANCHOR_LAT, extract.ANCHOR_LON)
    df = pd.DataFrame({
        "traj_id": pts["traj_id"], "seq": pts["seq"],
        # 6-decimal formatting = the TRACK grammar's wire precision; parsing
        # this CSV yields bit-identical doubles to the pages path
        "lat": [f"{v:.6f}" for v in lat],
        "lon": [f"{v:.6f}" for v in lon],
        "ts": pd.to_datetime(pts["t"]),
    })
    # shuffle rows so trajectories are NOT colocated in the file — exercises
    # the groupby(traj_id) path
    df = df.sample(frac=1.0, random_state=7).reset_index(drop=True)
    p = tmp_path / "tracks.csv"
    df.to_csv(str(p), index=False)
    return str(p), pts


def test_jsonl_pages_source(ray_session, tmp_path):
    """JSONL pages source round-trips into the standard pipeline."""
    import base64
    import json

    pages = extract.synth_pages_table(30, seed=42)
    p = tmp_path / "pages.jsonl"
    with open(p, "w") as f:
        for i in range(pages.num_rows):
            f.write(json.dumps({
                "url": pages["url"][i].as_py(),
                "warc_ts": pages["warc_ts"][i].as_py().isoformat(),
                "html_b64": base64.b64encode(pages["html"][i].as_py()).decode(),
                "text": pages["text"][i].as_py(),
                "lang": pages["lang"][i].as_py(),
            }) + "\n")
    ds = stages.read_pages_json(str(p))
    res = pipeline.run(ds, PipelineConfig())
    gold = oracle.run(pages)
    eng = pipeline.full_labels(res)
    gl = gold["labels"].sort_values("seg_id").reset_index(drop=True)
    m = eng.merge(gl, on="seg_id", suffixes=("_e", "_g"))
    assert len(m) == len(gl) and int((m.cluster_id_e != m.cluster_id_g).sum()) == 0


def test_csv_source_matches_pages_path(ray_session, tmp_path):
    csv_path, _ = _points_csv(tmp_path)
    cfg = PipelineConfig()
    points = stages.read_tracks_csv(csv_path)
    res_csv = pipeline.run_from_points(points, cfg)
    res_pages = pipeline.run(stages.synth_pages(N_DOCS, seed=42), cfg)

    lab_csv = pipeline.full_labels(res_csv)
    lab_pages = pipeline.full_labels(res_pages)
    # CSV lat/lon round-trips through 6-decimal formatting inside the pages
    # path too (both derive from the same printed TRACK lines), but the CSV
    # here was written from already-projected points at full precision, so
    # coordinates differ in the last ulps; seg_ids (hash of traj+index) and
    # label STRUCTURE must match exactly
    m = lab_csv.merge(lab_pages, on="seg_id", suffixes=("_c", "_p"))
    assert len(m) == len(lab_pages) == len(lab_csv)
    assert int((m.cluster_id_c != m.cluster_id_p).sum()) == 0

    tc_csv = (res_csv["tile_cluster"].to_pandas()
              .sort_values(["tile_id", "cluster_id"]).reset_index(drop=True))
    tc_pages = (res_pages["tile_cluster"].to_pandas()
                .sort_values(["tile_id", "cluster_id"]).reset_index(drop=True))
    assert tc_csv.equals(tc_pages)
