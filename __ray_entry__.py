"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash).

Ray is initialised by the driver BEFORE this module is imported: nothing here
(or in imc_ray library code) calls ``ray.init()`` / ``ray.shutdown()``.

Operator coverage ↔ SURVEY.md §2; geometry operators (M4-C6, S1-S4, J3-J4,
A4) are not SQL-expressible — they are exposed as ``geo_*`` rows-only queries
here and exact-value-checked against the NumPy oracle in tests/test_golden.py.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import pandas as pd

_GEO_CACHE: dict = {}


def _geo(sf_dir: str) -> dict:
    """Run the flagship geometry pipeline once per sf_dir and cache the
    result — the driver calls each geo_* query separately."""
    if sf_dir not in _GEO_CACHE:
        from imc_ray import pipeline, stages
        from imc_ray.config import PipelineConfig

        cfg = PipelineConfig()
        pages = stages.pages_from_documents(sf_dir)
        # verify_invariant: assert byte-identical extraction per url in-line
        _GEO_CACHE[sf_dir] = pipeline.run(pages, cfg, verify_invariant=True)
    return _GEO_CACHE[sf_dir]


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: documents-derived pages →
    dedup → extract → MDL segments → distributed DBSCAN → representatives →
    occupancy tiles → raster↔vector join.  Returns the tile_cluster join rows
    (the headline output of BASELINE.json's metric)."""
    res = _geo("/root/testdata/sf0.001")
    return res["tile_cluster"].to_pandas().sort_values(
        ["tile_id", "cluster_id"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Geometry pipeline queries (rows-only: not SQL-expressible; exact values are
# pytest-checked vs the single-node NumPy oracle)
# ---------------------------------------------------------------------------

def _geo_segments(sf_dir: str) -> pd.DataFrame:
    df = _geo(sf_dir)["segments"].to_pandas()
    return df[["seg_id", "traj_id", "x1", "y1", "x2", "y2", "seg_len", "cell"]] \
        .sort_values("seg_id").reset_index(drop=True)


def _geo_labels(sf_dir: str) -> pd.DataFrame:
    from imc_ray import pipeline

    return pipeline.full_labels(_geo(sf_dir))


def _geo_representatives(sf_dir: str) -> pd.DataFrame:
    df = _geo(sf_dir)["representatives"]
    out = pd.DataFrame({
        "cluster_id": df["cluster_id"].astype("int64"),
        "n_rep_points": [len(r) for r in df["rep"]],
        "n_segs": df["n_segs"].astype("int64"),
        "n_trajs": df["n_trajs"].astype("int64"),
    })
    return out.sort_values("cluster_id").reset_index(drop=True)


def _geo_tiles(sf_dir: str) -> pd.DataFrame:
    return (_geo(sf_dir)["tiles"].to_pandas()
            .sort_values("tile_id").reset_index(drop=True))


def _geo_tile_cluster(sf_dir: str) -> pd.DataFrame:
    return (_geo(sf_dir)["tile_cluster"].to_pandas()
            .sort_values(["tile_id", "cluster_id"]).reset_index(drop=True))


def _geo_knn(sf_dir: str) -> pd.DataFrame:
    from imc_ray import pipeline, stages
    from imc_ray.config import PipelineConfig

    cfg = PipelineConfig()
    pages = stages.pages_from_documents(sf_dir)
    out = pipeline.knn_query(pages, cfg, k=3).to_pandas()
    return out.sort_values(["seg_id", "rank"]).reset_index(drop=True)


def _media_features(sf_dir: str) -> pd.DataFrame:
    from imc_ray import multimodal, stages

    pages = stages.pages_from_documents(sf_dir)
    media = multimodal.pages_as_media(pages)
    feats = multimodal.featurize_media(media).to_pandas()
    out = pd.DataFrame({
        "media_id": feats["media_id"],
        "n_bytes": feats["n_bytes"].astype("int64"),
        "feat_dim": [len(f) for f in feats["feature"]],
    })
    return out.sort_values("media_id").reset_index(drop=True)


def _media_frame_features(sf_dir: str) -> pd.DataFrame:
    """Video-style plumbing: frame-sample (1 row → n rows) → resize →
    per-frame featurize, all actor-pool stages (rows-only; decode is the
    documented stub)."""
    from imc_ray import multimodal, stages

    pages = stages.pages_from_documents(sf_dir)
    media = multimodal.pages_as_media(pages)
    frames = multimodal.sample_frames(media, n_frames=3)
    resized = multimodal.resize_media(frames, 16, 16)
    # frame_idx passes through resize + featurize → stable per-frame rows
    feats = multimodal.featurize_media(resized).to_pandas()
    out = pd.DataFrame({
        "media_id": feats["media_id"],
        "frame_idx": feats["frame_idx"].astype("int64"),
        "n_bytes": feats["n_bytes"].astype("int64"),
        "feat_dim": [len(f) for f in feats["feature"]],
    })
    return (out.sort_values(["media_id", "frame_idx"])
            .reset_index(drop=True))


def _media_decode_stats(sf_dir: str) -> pd.DataFrame:
    from imc_ray import multimodal

    return multimodal.media_decode_stats(sf_dir)


def _geo_points(sf_dir: str) -> pd.DataFrame:
    """M2/M4 parse surface: exploded projected points (rows-only check)."""
    from imc_ray import stages

    pages = stages.pages_from_documents(sf_dir)
    extracted = stages.extract_pages(stages.dedup_pages(pages))
    pts = stages.parse_points(extracted).to_pandas()
    return pts.sort_values(["traj_id", "seq"]).reset_index(drop=True)


def _geo_polygons(sf_dir: str) -> pd.DataFrame:
    df = _geo(sf_dir)["polygons"]
    return pd.DataFrame({
        "cluster_id": df["cluster_id"].astype("int64"),
        "n_ring_points": [len(r) for r in df["ring"]],
    }).sort_values("cluster_id").reset_index(drop=True)


def _approx_distinct(sf_dir: str) -> pd.DataFrame:
    from imc_ray import sketches

    return sketches.approx_distinct_query(sf_dir)


def _quantile_sketch(sf_dir: str) -> pd.DataFrame:
    from imc_ray import sketches

    return sketches.quantile_sketch_query(sf_dir)


def queries() -> dict[str, Callable[[str], Any]]:
    from imc_ray import relational as R
    from imc_ray import textops as T
    from imc_ray import vector as V

    return {
        # relational layer (J1/J2/J5/J6, A1-A3, O1-O4, D1-D3, F1, scalar fns)
        "q1_pricing_summary": R.q1_pricing_summary,
        "q3_top_orders": R.q3_top_orders,
        "q5_nation_revenue": R.q5_nation_revenue,
        "filter_project_orders": R.filter_project_orders,
        "topk_orders": R.topk_orders,
        "global_aggs": R.global_aggs,
        "distinct_lang": R.distinct_lang,
        "dedup_documents": R.dedup_documents,
        "union_orders": R.union_orders,
        "semi_join_customers": R.semi_join_customers,
        "anti_join_customers": R.anti_join_customers,
        "events_daily": R.events_daily,
        "json_get_stats": R.json_get_stats,
        "asof_prev_event": R.asof_prev_event,
        "doc_length_check": R.doc_length_check,
        "embedding_norms": R.embedding_norms,
        "sample_orders_count": R.sample_orders_count,
        "left_join_customer_orders": R.left_join_customer_orders,
        "order_activity_full_outer": R.order_activity_full_outer,
        "top_orders_per_customer": R.top_orders_per_customer,
        "order_price_quantiles": R.order_price_quantiles,
        "token_stats": T.token_stats,
        "q6_revenue_delta": R.q6_revenue_delta,
        "distinct_users_per_type": R.distinct_users_per_type,
        "lang_set_ops": R.lang_set_ops,
        "parts_by_brand": R.parts_by_brand,
        "supplier_nations": R.supplier_nations,
        "running_total_per_user": R.running_total_per_user,
        # hot-key-routed associative window (r5): heavy users via
        # global_prefix_sum, the rest via the coarse-bucket engine
        "running_count_per_user_hot": R.running_count_per_user_hot,
        "sessionize_events": R.sessionize_events,
        "sliding_window_counts": R.sliding_window_counts,
        "pivot_user_events": R.pivot_user_events,
        "rollup_pricing": R.rollup_pricing,
        "corr_quantity_price": R.corr_quantity_price,
        "stddev_price_by_priority": R.stddev_price_by_priority,
        "mode_event_per_user": R.mode_event_per_user,
        "user_event_paths": R.user_event_paths,
        "range_join_purchases": R.range_join_purchases,
        "histogram_order_prices": R.histogram_order_prices,
        "q4_order_priority": R.q4_order_priority,
        "cumulative_new_users": R.cumulative_new_users,
        "ntile_order_prices": R.ntile_order_prices,
        "chunk_dup_stats": T.chunk_dup_stats,
        "simhash_near_dup": T.simhash_near_dup,
        "order_status_matrix": R.order_status_matrix,
        "explode_embeddings": V.explode_embeddings,
        "cube_pricing": R.cube_pricing,
        "regression_price_qty": R.regression_price_qty,
        "lead_next_gap": R.lead_next_gap,
        "best_order_per_customer": R.best_order_per_customer,
        "fuzzy_name_pairs": T.fuzzy_name_pairs,
        "event_flags_per_type": R.event_flags_per_type,
        "events_monthly": R.events_monthly,
        "rank_orders": R.rank_orders,
        "tfidf_top_terms": T.tfidf_top_terms,
        "dense_rank_orders": R.dense_rank_orders,
        "split_assign_documents": T.split_assign_documents,
        "decontaminate_documents": T.decontaminate_documents,
        # iterative (Lloyd) — not SQL-expressible; exact-label pytest oracle
        "kmeans_embeddings": V.kmeans_embeddings,
        "percent_rank_orders": R.percent_rank_orders,
        "user_first_last_value": R.user_first_last_value,
        "weighted_avg_discount": R.weighted_avg_discount,
        "skew_kurt_price": R.skew_kurt_price,
        "entropy_by_event_type": R.entropy_by_event_type,
        "orders_above_customer_avg": R.orders_above_customer_avg,
        "argmax_order": R.argmax_order,
        "moving_avg_user_value": R.moving_avg_user_value,
        "cume_dist_orders": R.cume_dist_orders,
        # text analysis + dedup family
        "quality_scores": T.quality_scores,
        "repetition_stats": T.repetition_stats,
        "pack_sequences_documents": R.pack_sequences_documents,
        "curation_pipeline": T.curation_pipeline,
        "stratified_sample_documents": T.stratified_sample_documents,
        "chunk_documents": T.chunk_documents,
        "fingerprint_md5": lambda sf: T.fingerprint_documents(sf)[["doc_id", "fp"]],
        "fingerprint_roll64": lambda sf: T.fingerprint_documents(sf)[["doc_id", "roll64"]],
        "lang_id_documents": T.lang_id_documents,
        "minhash_dedup": T.minhash_dedup,
        "near_dup_exact_groups": T.near_dup_exact_groups,
        "simhash_documents": T.simhash_documents,
        "ngram_jaccard_pairs": T.ngram_jaccard_pairs,
        # similarity search
        "embedding_sums": V.embedding_sums,
        "ann_topk_ones": V.ann_topk_ones,
        "knn_brute_force": V.knn_brute_force,
        "ann_lsh": V.ann_lsh,
        "ann_ivf": V.ann_ivf,
        # exact recall-vs-brute-force contract for the approximate family
        # (values recomputed + floor-asserted in pytest; rows-only driver)
        "ann_recall_scalars": V.ann_recall_scalars,
        "embedding_near_dup": V.embedding_near_dup,
        # SemDeDup composition (kmeans partition → cluster-scoped LSH
        # near-dup → min-id survivor); iterative+approximate — rows-only,
        # exact pytest oracle mirrors the same candidate scheme
        "semantic_dedup_embeddings": V.semantic_dedup_embeddings,
        "embedding_exact_dup_groups": V.embedding_exact_dup_groups,
        "top_tokens": T.top_tokens,
        "top_bigrams": T.top_bigrams,
        "regex_token_stats": T.regex_token_stats,
        # sketches (A5 — approximate; accuracy asserted in pytest)
        "approx_distinct_hll": _approx_distinct,
        "quantile_sketch_prices": _quantile_sketch,
        # geometry pipeline (rows-only; oracle = imc_ray.oracle via pytest)
        "geo_segments": _geo_segments,
        "geo_points": _geo_points,
        "geo_polygons": _geo_polygons,
        "geo_labels": _geo_labels,
        "geo_representatives": _geo_representatives,
        "geo_tiles": _geo_tiles,
        "geo_tile_cluster": _geo_tile_cluster,
        "geo_knn": _geo_knn,
        "media_features": _media_features,
        "media_frame_features": _media_frame_features,
        # REAL pure-numpy decode (BMP/WAV/concatenated-BMP): rows-only —
        # binary decode is not SQL-expressible; round-trip pytest-asserted
        "media_decode_stats": _media_decode_stats,
    }


def oracle_sql() -> dict[str, str]:
    _rev = "l_extendedprice * (1 - l_discount)"
    _ntok = "len(string_split(text, ' '))"
    _sq = "list_sum(list_transform(embedding, x -> CAST(x*x AS DOUBLE)))"
    _sm = "list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))"
    return {
        "q1_pricing_summary": f"""
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2)      AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum({_rev}), 2)          AS sum_disc_price,
                   round(avg(l_quantity), 2)      AS avg_qty,
                   count(*)                       AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-01'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q3_top_orders": f"""
            SELECT o.o_orderkey, o.o_orderpriority,
                   round(sum({_rev}), 2) AS revenue
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderkey, o.o_orderpriority
            ORDER BY sum({_rev}) DESC, o.o_orderkey
            LIMIT 10
        """,
        "q5_nation_revenue": f"""
            SELECT n.n_name, r.r_name, round(sum({_rev}), 2) AS revenue
            FROM lineitem l
            JOIN orders o   ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n   ON c.c_nationkey = n.n_nationkey
            JOIN region r   ON n.n_regionkey = r.r_regionkey
            GROUP BY n.n_name, r.r_name
            ORDER BY n.n_name
        """,
        "filter_project_orders": """
            SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS o_totalprice
            FROM orders WHERE o_totalprice > 300000
            ORDER BY o_orderkey
        """,
        "topk_orders": """
            SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
            FROM orders
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 20
        """,
        "global_aggs": """
            SELECT count(*)                       AS n_rows,
                   round(sum(l_quantity), 2)      AS sum_qty,
                   round(min(l_quantity), 2)      AS min_qty,
                   round(max(l_quantity), 2)      AS max_qty,
                   round(avg(l_extendedprice), 2) AS avg_price
            FROM lineitem
        """,
        "distinct_lang": "SELECT DISTINCT lang FROM documents ORDER BY lang",
        "sample_orders_count": """
            SELECT CAST(count(*) AS BIGINT) AS sampled_rows
            FROM orders
            WHERE (CAST(o_orderkey % 4294967296 AS HUGEINT) * 2654435761)
                  % 4294967296 < 429496729
        """,
        "q6_revenue_delta": """
            SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24
        """,
        "distinct_users_per_type": """
            SELECT event_type,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
                   count(*) AS n
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "lang_set_ops": """
            SELECT 'except' AS op, lang FROM (
                SELECT DISTINCT lang FROM documents WHERE source = 'src0'
                EXCEPT SELECT DISTINCT lang FROM documents WHERE source = 'src1'
            )
            UNION ALL
            SELECT 'intersect' AS op, lang FROM (
                SELECT DISTINCT lang FROM documents WHERE source = 'src0'
                INTERSECT SELECT DISTINCT lang FROM documents WHERE source = 'src1'
            )
            ORDER BY op, lang
        """,
        "dedup_documents": """
            SELECT min(doc_id) AS doc_id, count(*) AS n_copies
            FROM documents GROUP BY text ORDER BY doc_id
        """,
        "near_dup_exact_groups": """
            SELECT min(doc_id) AS doc_id, count(*) AS n_copies
            FROM documents GROUP BY text ORDER BY doc_id
        """,
        "union_orders": """
            SELECT o_orderkey, o_orderpriority, round(o_totalprice, 2) AS o_totalprice
            FROM orders WHERE o_orderpriority = '1-URGENT'
            UNION ALL
            SELECT o_orderkey, o_orderpriority, round(o_totalprice, 2) AS o_totalprice
            FROM orders WHERE o_totalprice > 350000
            ORDER BY o_orderkey, o_orderpriority, o_totalprice
        """,
        "semi_join_customers": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey IN (SELECT DISTINCT o_custkey FROM orders
                                WHERE o_totalprice > 350000)
            ORDER BY c_custkey
        """,
        "anti_join_customers": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (SELECT DISTINCT o_custkey FROM orders
                                    WHERE o_totalprice > 350000)
            ORDER BY c_custkey
        """,
        "events_daily": """
            SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
                   count(*) AS n, round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "json_get_stats": r"""
            SELECT event_type,
                   CAST(sum(TRY_CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
                   count(*) AS n
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "parts_by_brand": """
            SELECT p_brand, count(*) AS n_parts,
                   round(avg(p_retailprice), 2) AS avg_price,
                   CAST(max(p_size) AS BIGINT)  AS max_size
            FROM part GROUP BY p_brand ORDER BY p_brand
        """,
        "supplier_nations": """
            SELECT s.s_suppkey, s.s_name, n.n_name
            FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
            ORDER BY s.s_suppkey
        """,
        "running_total_per_user": """
            SELECT event_id,
                   round(sum(value) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING), 2)
                       AS running_value
            FROM events ORDER BY event_id
        """,
        "running_count_per_user_hot": """
            SELECT user_id, event_id,
                   CAST(row_number() OVER (PARTITION BY user_id
                                           ORDER BY event_id) AS BIGINT)
                       AS running
            FROM events ORDER BY user_id, event_id
        """,
        "sliding_window_counts": """
            SELECT event_id,
                   CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts
                                       RANGE BETWEEN INTERVAL 600 SECONDS PRECEDING
                                       AND CURRENT ROW) AS BIGINT)
                       AS n_trailing_10m
            FROM events ORDER BY event_id
        """,
        "sessionize_events": """
            SELECT event_id,
                   CAST(sum(CASE WHEN prev_ts IS NULL
                                 OR epoch(ts - prev_ts) > 300 THEN 1 ELSE 0 END)
                        OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
            FROM (
                SELECT event_id, user_id, ts,
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                           AS prev_ts
                FROM events
            ) ORDER BY event_id
        """,
        "asof_prev_event": """
            SELECT event_id, prev_ts FROM (
                SELECT event_id,
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
                FROM events
            ) WHERE prev_ts IS NOT NULL
            ORDER BY event_id
        """,
        "doc_length_check": f"""
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars2,
                   CAST({_ntok} AS BIGINT)      AS n_tokens,
                   (CAST(length(text) AS BIGINT) = n_chars) AS len_match
            FROM documents ORDER BY doc_id
        """,
        "embedding_norms": f"""
            SELECT vec_id,
                   round(sqrt({_sq}), 4)          AS l2,
                   round({_sm}, 4)                AS dot_ones,
                   CAST(len(embedding) AS BIGINT) AS dim
            FROM embeddings ORDER BY vec_id
        """,
        "quality_scores": f"""
            SELECT doc_id,
                   CAST({_ntok} AS BIGINT) AS n_tokens,
                   round((CAST(length(text) AS BIGINT) - ({_ntok} - 1))
                         / CAST(greatest({_ntok}, 1) AS DOUBLE), 4) AS avg_token_len,
                   round({_ntok} / ({_ntok} + 100.0), 4) AS quality
            FROM documents ORDER BY doc_id
        """,
        "chunk_documents": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS w FROM documents
            )
            SELECT doc_id,
                   CAST(i AS BIGINT) AS chunk_idx,
                   array_to_string(w[i*16 + 1 : i*16 + 24], ' ')
                       AS chunk_text,
                   CAST(len(w[i*16 + 1 : i*16 + 24]) AS BIGINT) AS n_tokens
            FROM (SELECT doc_id, w,
                         unnest(generate_series(0, (len(w) - 1) // 16)) AS i
                  FROM toks)
            ORDER BY doc_id, chunk_idx
        """,
        "stratified_sample_documents": """
            SELECT lang, CAST(count(*) AS BIGINT) AS n_kept
            FROM documents
            WHERE (CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761)
                  % 4294967296
                  < CASE lang WHEN 'en' THEN 3865470566
                              WHEN 'de' THEN 2147483648
                              WHEN 'es' THEN 2147483648
                              WHEN 'zh' THEN 1073741824
                              ELSE 0 END
            GROUP BY lang ORDER BY lang
        """,
        "curation_pipeline": """
            WITH f AS (
                SELECT doc_id, text, len(string_split(text, ' ')) AS n_tokens
                FROM documents
                WHERE len(string_split(text, ' ')) >= 30 AND lang = 'en'
            ), s AS (
                SELECT min(doc_id) AS doc_id, min(n_tokens) AS n_tokens
                FROM f GROUP BY text
            )
            SELECT CASE WHEN (CAST(doc_id % 4294967296 AS HUGEINT)
                              * 2654435761) % 4294967296
                             < 3435973836 THEN 'train'
                        WHEN (CAST(doc_id % 4294967296 AS HUGEINT)
                              * 2654435761) % 4294967296
                             < 3865470566 THEN 'val'
                        ELSE 'test' END AS split,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS total_tokens
            FROM s GROUP BY 1 ORDER BY 1
        """,
        "pack_sequences_documents": """
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   CAST(coalesce(SUM(len(string_split(text, ' ')))
                           OVER (ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING), 0) AS BIGINT)
                       AS start_tok,
                   CAST(coalesce(SUM(len(string_split(text, ' ')))
                           OVER (ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING), 0) // 256
                        AS BIGINT) AS seq_id
            FROM documents ORDER BY doc_id
        """,
        "repetition_stats": """
            WITH toks AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM documents
            ), cnt AS (
                SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2
            ), agg AS (
                SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                       CAST(count(*) AS BIGINT) AS n_types,
                       max(c) AS max_c
                FROM cnt GROUP BY doc_id
            )
            SELECT doc_id, n_tokens, n_types,
                   round(n_types / CAST(n_tokens AS DOUBLE), 6)
                       AS type_token_ratio,
                   round(max_c / CAST(n_tokens AS DOUBLE), 6)
                       AS top_token_frac
            FROM agg ORDER BY doc_id
        """,
        "fingerprint_md5": "SELECT doc_id, md5(text) AS fp FROM documents ORDER BY doc_id",
        "embedding_sums": f"""
            SELECT vec_id,
                   round({_sm} / (sqrt({_sq}) * sqrt(len(embedding))), 4) AS cos_ones
            FROM embeddings ORDER BY vec_id
        """,
        "order_activity_full_outer": """
            SELECT CAST(coalesce(b.o_custkey, r.o_custkey) AS BIGINT) AS o_custkey,
                   CAST(coalesce(b.n_big, 0)    AS BIGINT) AS n_big,
                   CAST(coalesce(r.n_recent, 0) AS BIGINT) AS n_recent
            FROM (SELECT o_custkey, count(*) AS n_big
                  FROM orders WHERE o_totalprice > 300000
                  GROUP BY o_custkey) b
            FULL OUTER JOIN
                 (SELECT o_custkey, count(*) AS n_recent
                  FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
                  GROUP BY o_custkey) r
            ON b.o_custkey = r.o_custkey
            ORDER BY o_custkey
        """,
        "top_orders_per_customer": """
            SELECT o_custkey, o_orderkey,
                   round(o_totalprice, 2) AS o_totalprice,
                   CAST(rnk AS BIGINT) AS rnk
            FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       row_number() OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey) AS rnk
                FROM orders
            )
            WHERE rnk <= 3
            ORDER BY o_custkey, rnk
        """,
        "order_price_quantiles": """
            SELECT o_orderpriority, count(*) AS n,
                   round(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
                   round(quantile_cont(o_totalprice, 0.9), 2) AS p90_price
            FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "pivot_user_events": """
            SELECT user_id,
                   CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
                   CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
                   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
                   CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
                   CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
                   count(*) AS n_total
            FROM events GROUP BY user_id ORDER BY user_id
        """,
        "rollup_pricing": """
            SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
                   coalesce(l_linestatus, 'ALL') AS l_linestatus,
                   round(sum(l_quantity), 2)     AS sum_qty,
                   count(*)                      AS n
            FROM lineitem
            GROUP BY ROLLUP(l_returnflag, l_linestatus)
            ORDER BY l_returnflag, l_linestatus
        """,
        "corr_quantity_price": """
            SELECT count(*) AS n,
                   round(corr(l_quantity, l_extendedprice), 6)       AS corr_qp,
                   round(covar_samp(l_quantity, l_extendedprice), -2) AS covar_qp,
                   round(stddev_samp(l_quantity), 2)                 AS sd_qty,
                   round(stddev_samp(l_extendedprice), 2)            AS sd_price
            FROM lineitem
        """,
        "stddev_price_by_priority": """
            SELECT o_orderpriority, count(*) AS n,
                   round(stddev_samp(o_totalprice), 2) AS sd_price,
                   round(var_samp(o_totalprice), 0)    AS var_price
            FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "mode_event_per_user": """
            SELECT user_id, event_type AS mode_type, CAST(n AS BIGINT) AS n
            FROM (
                SELECT user_id, event_type, count(*) AS n,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY count(*) DESC, event_type)
                           AS rn
                FROM events GROUP BY user_id, event_type
            )
            WHERE rn = 1 ORDER BY user_id
        """,
        "user_event_paths": """
            SELECT user_id,
                   string_agg(event_type, ',' ORDER BY ts, event_id) AS path,
                   count(*) AS n
            FROM events GROUP BY user_id ORDER BY user_id
        """,
        "range_join_purchases": """
            SELECT s.event_id AS signup_id, p.event_id AS purchase_id,
                   CAST(epoch_us(p.ts - s.ts) AS BIGINT) AS dt_us
            FROM events s JOIN events p
              ON p.user_id = s.user_id
             AND p.ts > s.ts
             AND p.ts <= s.ts + INTERVAL 14400 SECONDS
            WHERE s.event_type = 'signup' AND p.event_type = 'purchase'
            ORDER BY signup_id, purchase_id
        """,
        "histogram_order_prices": """
            SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bin,
                   round(floor(o_totalprice / 50000) * 50000.0, 2) AS lo_price,
                   count(*) AS n
            FROM orders GROUP BY 1, 2 ORDER BY bin
        """,
        "q4_order_priority": """
            SELECT o_orderpriority, count(*) AS n_orders
            FROM orders o
            WHERE EXISTS (
                SELECT 1 FROM lineitem l
                WHERE l.l_orderkey = o.o_orderkey
                  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l.l_shipdate <  TIMESTAMP '1996-07-01')
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "cumulative_new_users": """
            SELECT day, CAST(new_users AS BIGINT) AS new_users,
                   CAST(sum(new_users) OVER (ORDER BY day
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
            FROM (
                SELECT day, count(*) AS new_users FROM (
                    SELECT user_id, min(strftime(ts, '%Y-%m-%d')) AS day
                    FROM events GROUP BY user_id
                ) GROUP BY day
            ) ORDER BY day
        """,
        "ntile_order_prices": """
            SELECT o_orderkey, o_orderpriority,
                   CAST(ntile(4) OVER (PARTITION BY o_orderpriority
                        ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT)
                       AS tile
            FROM orders ORDER BY o_orderkey
        """,
        "order_status_matrix": """
            SELECT p.o_orderpriority, s.o_orderstatus,
                   CAST(coalesce(c.n, 0) AS BIGINT) AS n
            FROM (SELECT DISTINCT o_orderpriority FROM orders) p
            CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
            LEFT JOIN (SELECT o_orderpriority, o_orderstatus, count(*) AS n
                       FROM orders GROUP BY 1, 2) c
              ON p.o_orderpriority = c.o_orderpriority
             AND s.o_orderstatus = c.o_orderstatus
            ORDER BY 1, 2
        """,
        "cube_pricing": """
            SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
                   coalesce(l_linestatus, 'ALL') AS l_linestatus,
                   round(sum(l_quantity), 2)     AS sum_qty,
                   count(*)                      AS n
            FROM lineitem
            GROUP BY CUBE(l_returnflag, l_linestatus)
            ORDER BY l_returnflag, l_linestatus
        """,
        "regression_price_qty": """
            SELECT count(*) AS n,
                   round(covar_pop(l_quantity, l_extendedprice), -2)
                       AS covar_pop_qp,
                   round(regr_slope(l_extendedprice, l_quantity), 3)
                       AS slope,
                   round(regr_intercept(l_extendedprice, l_quantity), 3)
                       AS intercept
            FROM lineitem
        """,
        "lead_next_gap": """
            SELECT event_id, gap_s FROM (
                SELECT event_id,
                       epoch(lead(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id) - ts)
                           AS gap_s
                FROM events
            ) WHERE gap_s IS NOT NULL ORDER BY event_id
        """,
        "best_order_per_customer": """
            SELECT o_custkey, best_order, round(best_price, 2) AS best_price
            FROM (
                SELECT o_custkey, o_orderkey AS best_order,
                       o_totalprice AS best_price,
                       row_number() OVER (PARTITION BY o_custkey
                                          ORDER BY o_totalprice DESC,
                                                   o_orderkey) AS rn
                FROM orders
            ) WHERE rn = 1 ORDER BY o_custkey
        """,
        "fuzzy_name_pairs": """
            SELECT a.p_brand AS p_brand,
                   a.p_partkey AS key1, b.p_partkey AS key2,
                   levenshtein(a.p_name, b.p_name) AS lev,
                   jaccard(a.p_name, b.p_name)     AS jac
            FROM part a JOIN part b
              ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
            WHERE levenshtein(a.p_name, b.p_name) <= 3
            ORDER BY p_brand, key1, key2
        """,
        "percent_rank_orders": """
            SELECT o_orderkey,
                   percent_rank() OVER (ORDER BY o_totalprice DESC,
                                        o_orderkey) AS pr
            FROM orders ORDER BY o_orderkey
        """,
        "user_first_last_value": """
            SELECT DISTINCT user_id,
                   first_value(value) OVER w AS first_val,
                   last_value(value)  OVER w AS last_val
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND UNBOUNDED FOLLOWING)
            ORDER BY user_id
        """,
        "weighted_avg_discount": """
            SELECT l_returnflag,
                   round(sum(l_discount * l_extendedprice)
                         / sum(l_extendedprice), 6) AS w_avg_discount
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "skew_kurt_price": """
            SELECT count(*) AS n,
                   round(skewness(o_totalprice), 4) AS skew_price,
                   round(kurtosis(o_totalprice), 4) AS kurt_price
            FROM orders
        """,
        "entropy_by_event_type": """
            SELECT event_type,
                   count(DISTINCT user_id)       AS n_users,
                   round(entropy(user_id), 6)    AS ent_users
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "orders_above_customer_avg": """
            WITH o AS (SELECT o_custkey,
                              CAST(round(o_totalprice * 100) AS BIGINT) AS c
                       FROM orders),
                 g AS (SELECT o_custkey, count(*) AS n_orders, sum(c) AS s
                       FROM o GROUP BY o_custkey)
            SELECT g.o_custkey, g.n_orders,
                   count(*) FILTER (WHERE o.c * g.n_orders > g.s) AS n_above
            FROM o JOIN g USING (o_custkey)
            GROUP BY g.o_custkey, g.n_orders
            ORDER BY g.o_custkey
        """,
        "argmax_order": """
            SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
            FROM orders
            ORDER BY o_totalprice DESC, o_orderkey DESC LIMIT 1
        """,
        "moving_avg_user_value": """
            SELECT event_id,
                   round(avg(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
                       AS mov_avg
            FROM events ORDER BY event_id
        """,
        "cume_dist_orders": """
            SELECT o_orderkey,
                   cume_dist() OVER (ORDER BY o_totalprice DESC, o_orderkey)
                       AS cd
            FROM orders ORDER BY o_orderkey
        """,
        "split_assign_documents": """
            SELECT doc_id,
                   CAST((CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761)
                        % 4294967296 AS BIGINT) AS bucket,
                   CASE WHEN (CAST(doc_id % 4294967296 AS HUGEINT)
                              * 2654435761) % 4294967296
                             < 3435973836 THEN 'train'
                        WHEN (CAST(doc_id % 4294967296 AS HUGEINT)
                              * 2654435761) % 4294967296
                             < 3865470566 THEN 'val'
                        ELSE 'test' END AS split
            FROM documents ORDER BY doc_id
        """,
        "decontaminate_documents": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS w FROM documents
            ), grams AS (
                SELECT doc_id, array_to_string(w[i:i+3], ' ') AS g
                FROM (SELECT doc_id, w,
                             unnest(generate_series(1, len(w) - 3)) AS i
                      FROM toks)
            ), bl AS (
                SELECT DISTINCT g FROM grams WHERE doc_id % 100 = 0
            ), hits AS (
                SELECT DISTINCT grams.doc_id FROM grams
                JOIN bl USING (g) WHERE grams.doc_id % 100 <> 0
            )
            SELECT d.doc_id,
                   CAST(CASE WHEN h.doc_id IS NULL THEN 0 ELSE 1 END
                        AS BIGINT) AS contaminated
            FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
            WHERE d.doc_id % 100 <> 0
            ORDER BY d.doc_id
        """,
        "dense_rank_orders": """
            SELECT o_orderkey, round(o_totalprice, 2) AS price,
                   CAST(dense_rank() OVER (ORDER BY o_totalprice DESC)
                        AS BIGINT) AS drk
            FROM orders ORDER BY o_orderkey
        """,
        "tfidf_top_terms": """
            WITH toks AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS term
                FROM documents
            ), tf AS (
                SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
            ), df AS (
                SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1
            ), scored AS (
                SELECT tf.doc_id, tf.term, tf.tf,
                       CAST(tf.tf AS DOUBLE)
                           * ln((SELECT CAST(count(*) AS DOUBLE)
                                 FROM documents) / df.df) AS score
                FROM tf JOIN df USING (term)
            )
            SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, score FROM (
                SELECT *, row_number() OVER (PARTITION BY doc_id
                                             ORDER BY score DESC, term) AS rn
                FROM scored
            ) WHERE rn <= 3 ORDER BY doc_id, term
        """,
        "rank_orders": """
            SELECT o_orderkey, round(o_totalprice, 2) AS price,
                   row_number() OVER (ORDER BY o_totalprice DESC,
                                      o_orderkey) AS rn
            FROM orders ORDER BY o_orderkey
        """,
        "event_flags_per_type": """
            SELECT event_type,
                   bit_or(CAST(floor(value) AS BIGINT) & 255) AS flags_or,
                   bool_or(value > 400.0)  AS any_high,
                   bool_and(value >= 1.0)  AS all_nonneg
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "events_monthly": """
            SELECT strftime(date_trunc('month', ts), '%Y-%m-%d') AS month,
                   count(*) AS n, round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1 ORDER BY 1
        """,
        "chunk_dup_stats": """
            WITH p AS (
                SELECT doc_id,
                       array_to_string(
                           toks[c * 10 + 1 : least((c + 1) * 10, len(toks))],
                           ' ') AS chunk
                FROM (
                    SELECT doc_id, toks,
                           unnest(range(0, CAST(ceil(len(toks) / 10.0) AS INT)))
                               AS c
                    FROM (SELECT doc_id, string_split(text, ' ') AS toks
                          FROM documents)
                )
            ), c AS (
                SELECT chunk, count(*) AS cnt FROM p GROUP BY chunk
            )
            SELECT p.doc_id, count(*) AS n_chunks,
                   CAST(sum(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_dup_chunks
            FROM p JOIN c ON p.chunk = c.chunk
            GROUP BY p.doc_id ORDER BY p.doc_id
        """,
        "explode_embeddings": """
            SELECT vec_id,
                   CAST(generate_subscripts(embedding, 1) AS BIGINT) AS pos,
                   round(CAST(unnest(embedding) AS DOUBLE), 6) AS val
            FROM (SELECT vec_id, embedding FROM embeddings
                  ORDER BY vec_id LIMIT 50)
            ORDER BY vec_id, pos
        """,
        "embedding_exact_dup_groups": """
            SELECT min(vec_id) AS vec_id, count(*) AS n_copies
            FROM embeddings GROUP BY embedding ORDER BY vec_id
        """,
        "top_bigrams": """
            SELECT bigram, CAST(count(*) AS BIGINT) AS n
            FROM (
                SELECT toks[k] || ' ' || toks[k + 1] AS bigram
                FROM (
                    SELECT toks, unnest(range(1, len(toks))) AS k
                    FROM (SELECT string_split(text, ' ') AS toks
                          FROM documents)
                )
            )
            GROUP BY bigram
            ORDER BY n DESC, bigram
            LIMIT 20
        """,
        "regex_token_stats": r"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '\b[a-z]+s\b')) AS BIGINT)
                       AS n_s_tokens,
                   coalesce(regexp_extract(text, '\b([a-z]+s)\b', 1), '')
                       AS first_s_token
            FROM documents ORDER BY doc_id
        """,
        "top_tokens": """
            SELECT token, CAST(count(*) AS BIGINT) AS n
            FROM (SELECT unnest(string_split(text, ' ')) AS token
                  FROM documents)
            GROUP BY token
            ORDER BY n DESC, token
            LIMIT 20
        """,
        "token_stats": r"""
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
                   CAST(len(regexp_extract_all(text,
                        '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+')) AS BIGINT)
                       AS n_bpe_tokens
            FROM documents ORDER BY doc_id
        """,
        "left_join_customer_orders": """
            SELECT c.c_custkey, c.c_name,
                   CAST(coalesce(s.n_big, 0) AS BIGINT)   AS n_big,
                   round(coalesce(s.total_big, 0.0), 2)   AS total_big
            FROM customer c LEFT JOIN (
                SELECT o_custkey, count(*) AS n_big,
                       sum(o_totalprice)   AS total_big
                FROM orders WHERE o_totalprice > 250000
                GROUP BY o_custkey
            ) s ON c.c_custkey = s.o_custkey
            ORDER BY c.c_custkey
        """,
        "knn_brute_force": """
            WITH q AS (
                SELECT vec_id AS query_id, embedding AS qe
                FROM embeddings ORDER BY vec_id LIMIT 5
            ), pairs AS (
                SELECT q.query_id, e.vec_id,
                       list_sum(list_transform(
                           list_zip(e.embedding, q.qe),
                           p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                       / (sqrt(list_sum(list_transform(e.embedding,
                                x -> CAST(x*x AS DOUBLE))))
                          * sqrt(list_sum(list_transform(q.qe,
                                x -> CAST(x*x AS DOUBLE))))) AS cos_raw
                FROM embeddings e CROSS JOIN q
                WHERE e.vec_id <> q.query_id
            )
            SELECT query_id, CAST(rn - 1 AS BIGINT) AS rank, vec_id,
                   round(cos_raw, 4) AS cos
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY cos_raw DESC, vec_id) AS rn
                FROM pairs
            )
            WHERE rn <= 5
            ORDER BY query_id, rn
        """,
        "ann_topk_ones": f"""
            SELECT CAST(row_number() OVER (ORDER BY cos_raw DESC, vec_id) - 1 AS BIGINT) AS rank,
                   vec_id, round(cos_raw, 4) AS cos_ones
            FROM (
                SELECT vec_id,
                       {_sm} / (sqrt({_sq}) * sqrt(len(embedding))) AS cos_raw
                FROM embeddings
            )
            ORDER BY cos_raw DESC, vec_id
            LIMIT 10
        """,
    }
