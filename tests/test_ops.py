"""Operator-level tests: dedup family, similarity search, multimodal
plumbing, kNN semantics (driver brief components beyond the flagship)."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


class TestDedupFamily:
    def test_minhash_groups_cover_all_docs(self, ray_session):
        from imc_ray import textops

        out = textops.minhash_dedup(SF)
        assert len(out) == 500  # one row per document
        assert (out["dup_group"] <= out["doc_id"]).all()  # group = min member

    def test_minhash_finds_planted_duplicates(self, ray_session):
        """Near-identical texts must land in one group (planted fixture)."""
        import pyarrow as pa
        import ray

        from imc_ray import textops

        base = "the quick brown fox jumps over the lazy dog again and again " * 5
        texts = [base, base + "extra", "completely different words entirely " * 8]
        a, b = textops._perm_params()
        sigs = [textops.minhash_signature(t, a, b) for t in texts]
        sim01 = (sigs[0] == sigs[1]).mean()
        sim02 = (sigs[0] == sigs[2]).mean()
        assert sim01 > 0.5 > sim02

    def test_near_dup_exact_groups_planted(self, ray_session, tmp_path):
        """The threshold-1.0 LSH chain must recover exactly the GROUP BY
        text partition on a corpus with planted exact duplicates (the
        driver's DuckDB oracle shape for near_dup_exact_groups)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from imc_ray import textops

        texts = [f"some document body number {i} with shared words alpha "
                 f"beta gamma delta epsilon" for i in range(20)]
        # plant: 21/22 copy 0, 23 copies 5; 24 is a NEAR dup of 0 (must NOT
        # group at threshold 1.0)
        texts += [texts[0], texts[0], texts[5], texts[0] + " extra"]
        # round-3 review counterexample: cyclic repetitions share one
        # shingle SET (Jaccard 1.0) but are DIFFERENT texts — the exact
        # content-hash refine must keep them separate groups
        texts += ["p q r p q r", "p q r p q r p q r"]
        ids = list(range(len(texts)))
        pq.write_table(pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                                 "text": pa.array(texts, type=pa.string())}),
                       str(tmp_path / "documents.parquet"))
        out = textops.near_dup_exact_groups(str(tmp_path))
        got = dict(zip(out["doc_id"], out["n_copies"]))
        want = {i: 1 for i in range(26)}
        want[0] = 3          # 0, 20, 21
        want[5] = 2          # 5, 22
        del want[20], want[21], want[22]
        want[23] = 1         # near dup stays its own group
        # 24/25: same shingle set, different text → separate groups
        assert got == want

    def test_simhash_similar_texts_close(self, ray_session):
        from imc_ray.textops import simhash64

        a = simhash64("alpha beta gamma delta epsilon zeta eta theta")
        b = simhash64("alpha beta gamma delta epsilon zeta eta iota")
        c = simhash64("one two three four five six seven eight")
        ham_ab = bin(a ^ b).count("1")
        ham_ac = bin(a ^ c).count("1")
        assert ham_ab < ham_ac

    def test_rolling_hash_deterministic(self):
        from imc_ray.textops import rolling_hash64

        assert rolling_hash64("abc") == rolling_hash64("abc")
        assert rolling_hash64("abc") != rolling_hash64("abd")

    def test_hash_kernels_match_sequential_reference(self):
        """Value contract (round-1 → round-2): the batch-vectorized FNV and
        SimHash kernels must emit bit-identical values to the sequential
        reference loops they replaced."""
        import hashlib

        from imc_ray import textops

        texts = ["hello world", "", "a", "tok " * 300, "ünï ƒtèxt 一二三 mixed"]

        def fnv_seq(text):
            h = 14695981039346656037
            for byte in text.encode("utf-8"):
                h = ((h ^ byte) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
            return h

        assert [int(x) for x in textops.rolling_hash64_batch(texts)] == \
            [fnv_seq(t) for t in texts]

        def simhash_seq(text):
            acc = np.zeros(64, dtype=np.int64)
            for tok in text.split(" "):
                h = np.uint64(textops.token_hash64(tok))
                bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                acc += np.where(bits.astype(bool), 1, -1)
            out = 0
            for i in range(64):
                if acc[i] > 0:
                    out |= 1 << i
            return out >> 1

        assert [int(x) for x in textops.simhash64_batch(texts)] == \
            [simhash_seq(t) for t in texts]

    def test_verify_jaccard_routes_identical(self, ray_session):
        """The >threshold hash-join verify route must emit the same verified
        pairs as the broadcast route (round-2 review: the join route was
        otherwise never executed by any test corpus)."""
        from imc_ray import graph, textops
        from imc_ray.stages import read_table

        ds = read_table(SF, "documents",
                        columns=["doc_id", "text"]).materialize()
        bands = ds.map_batches(textops.MinHasher, batch_format="pyarrow",
                               batch_size=2048, concurrency=(1, 2), num_cpus=1)
        raw = textops._lsh_candidates_ds(bands, star_only=False).materialize()
        assert raw.count() > 0
        cand = graph.dedupe_pairs(raw).materialize()
        lo = 0.2
        bcast = (textops._verify_jaccard_routed(ds, cand, lo)
                 .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
        joined = (textops._verify_jaccard_routed(ds, cand, lo,
                                                 broadcast_max_pairs=0)
                  .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
        assert len(bcast) > 0
        assert bcast.equals(joined)

    def test_lsh_bucket_count_scales_with_rows(self):
        """The LSH coarse-bucket modulus must grow with the band-row count
        (round-2 review item 1: a fixed 512 caps shuffle parallelism and
        lets per-group fan-in grow linearly with corpus size)."""
        from imc_ray.textops import _lsh_bucket_count

        assert _lsh_bucket_count(1_000) == 512
        assert _lsh_bucket_count(512 * 2_000_000) == 512
        big = _lsh_bucket_count(16 * 10**9)
        assert big >= 8192 and big & (big - 1) == 0  # power of two

    def test_lsh_candidates_invariant_under_bucket_count(self, ray_session):
        """Candidate-pair SET must not depend on the coarse-bucket modulus —
        it only re-partitions the (band, hash) buckets."""
        from imc_ray import graph, textops
        from imc_ray.stages import read_table

        ds = read_table(SF, "documents",
                        columns=["doc_id", "text"]).materialize()
        bands = (ds.map_batches(textops.MinHasher, batch_format="pyarrow",
                                batch_size=2048, concurrency=(1, 2),
                                num_cpus=1).materialize())
        sets = []
        for nb in (8, 512):
            raw = textops._lsh_candidates_ds(bands, star_only=False,
                                             nbuckets=nb).materialize()
            assert raw.count() > 0
            cand = graph.dedupe_pairs(raw).to_pandas()
            sets.append(set(zip(cand["a"], cand["b"])))
        assert sets[0] == sets[1]

    def test_quantile_sketch_accuracy(self, ray_session):
        """Histogram sketch quantiles within one bucket width of exact."""
        import pyarrow.parquet as pq

        from imc_ray import sketches
        from imc_ray.stages import read_table

        ds = read_table(SF, "lineitem", columns=["l_extendedprice"])
        r = sketches.quantile_sketch(ds, "l_extendedprice")
        v = pq.read_table(f"{SF}/lineitem.parquet",
                          columns=["l_extendedprice"])["l_extendedprice"] \
            .to_numpy()
        width = (v.max() - v.min()) / 4096
        for q in (0.5, 0.9, 0.99):
            exact = float(np.percentile(v, q * 100))
            assert abs(r["quantiles"][q] - exact) <= width + 1e-9, q
        # determinism across runs (fixed boundaries, order-free sums)
        r2 = sketches.quantile_sketch(ds, "l_extendedprice")
        assert r == r2

    def test_top_tokens_matches_pandas(self, ray_session):
        import pyarrow.parquet as pq

        from imc_ray import textops

        got = textops.top_tokens(SF, k=10)
        texts = pq.read_table(f"{SF}/documents.parquet",
                              columns=["text"])["text"].to_pylist()
        cnt = pd.Series([t for s in texts for t in s.split(" ")]).value_counts()
        ref = (cnt.rename_axis("token").reset_index(name="n")
               .sort_values(["n", "token"], ascending=[False, True])
               .head(10).reset_index(drop=True))
        assert list(got["token"]) == list(ref["token"])
        assert list(got["n"]) == list(ref["n"])

    def test_dedup_pages_routes_identical(self, ray_session):
        """Broadcast-map and hash-join survivor filters must keep the exact
        same page rows (the route is picked by distinct-url count)."""
        from imc_ray import stages

        pages = stages.synth_pages(150, seed=42).materialize()
        a = (stages.dedup_pages(pages).to_pandas()
             .sort_values(["url", "warc_ts"]).reset_index(drop=True))
        b = (stages.dedup_pages(pages, broadcast_max_urls=0).to_pandas()
             .sort_values(["url", "warc_ts"]).reset_index(drop=True))
        assert len(a) > 0
        assert a[["url", "warc_ts", "text", "lang"]].equals(
            b[["url", "warc_ts", "text", "lang"]])

    def test_dedupe_pairs_routes_identical(self, ray_session):
        """Driver drop_duplicates and distributed keys-only groupby must
        yield the same edge set."""
        import ray.data

        from imc_ray import graph

        ds = ray.data.from_pandas(pd.DataFrame(
            {"a": [1, 1, 2, 2, 3], "b": [2, 2, 3, 3, 4]}))

        def norm(d):
            return (d.to_pandas().sort_values(["a", "b"])
                    .reset_index(drop=True))

        x = norm(graph.dedupe_pairs(ds))
        y = norm(graph.dedupe_pairs(ds, driver_max_pairs=0))
        assert x.equals(y) and len(x) == 3

    def test_distributed_components_equal_unionfind(self, ray_session):
        """graph.connected_components (join+groupby-min rounds, no driver
        state) must equal the driver UnionFind on random edge sets — the
        round-2 guarantee that near-dup group assembly is unchanged."""
        import ray.data

        from imc_ray import graph
        from imc_ray.geom import UnionFind

        rng = np.random.default_rng(7)
        ids = np.arange(100, dtype=np.int64) + 1000
        edges = pd.DataFrame({
            "a": rng.choice(ids, 60),
            "b": rng.choice(ids, 60),
        })
        uf = UnionFind()
        for a, b in zip(edges["a"], edges["b"]):
            uf.union(int(a), int(b))
        want = pd.DataFrame({"doc_id": ids,
                             "dup_group": [uf.find(int(i)) for i in ids]})
        ids_ds = ray.data.from_pandas(pd.DataFrame({"doc_id": ids}))
        # driver route (edge count below threshold)
        got = graph.components_frame(ids_ds, ray.data.from_pandas(edges),
                                     "doc_id", "dup_group")
        assert got.reset_index(drop=True).equals(want.reset_index(drop=True))
        # distributed route forced — must be identical
        got_d = graph.components_frame(ids_ds, ray.data.from_pandas(edges),
                                       "doc_id", "dup_group",
                                       driver_max_edges=0)
        assert got_d.reset_index(drop=True).equals(want.reset_index(drop=True))

    def test_distributed_components_long_chain(self, ray_session):
        """A chain component whose diameter exceeds max_rounds must still
        converge: pointer jumping (graph._pointer_jump, round ≥ 3) makes the
        round count O(log diameter) — hook-only propagation would need
        diameter-many rounds and raise.  Corridor-shaped cluster graphs ARE
        chains, so this is the at-scale shape, not a corner case."""
        import ray.data

        from imc_ray import graph

        n = 64  # hook-only would need ~63 rounds >> max_rounds=10
        edges = pd.DataFrame({"a": np.arange(n - 1, dtype=np.int64) + 500,
                              "b": np.arange(1, n, dtype=np.int64) + 500})
        lab = graph.connected_components(
            ray.data.from_pandas(edges), max_rounds=10).to_pandas()
        assert len(lab) == n and (lab["comp"] == 500).all()


class TestSimilaritySearch:
    def test_brute_force_matches_numpy_reference(self, ray_session):
        import pyarrow.parquet as pq

        from imc_ray import vector

        got = vector.knn_brute_force(SF, n_queries=3, k=4)
        t = pq.read_table(f"{SF}/embeddings.parquet")
        m = np.asarray(t["embedding"].to_pylist(), dtype=np.float32)
        vid = t["vec_id"].to_numpy()
        order = np.argsort(vid)
        m, vid = m[order], vid[order]
        for qi in range(3):
            q = m[qi]
            dots = (m @ q).astype(np.float64)
            nm = np.sqrt((m * m).astype(np.float64).sum(axis=1))
            nq = np.sqrt(float((q * q).astype(np.float64).sum()))
            cos = dots / (nm * nq)
            cos[vid == vid[qi]] = -np.inf
            ref = vid[np.lexsort((vid, -cos))[:4]]
            mine = got[got.query_id == vid[qi]].sort_values("rank")["vec_id"]
            assert list(mine) == [int(v) for v in ref]

    def test_lsh_recall_vs_brute_force(self, ray_session):
        from imc_ray import vector

        bf = vector.knn_brute_force(SF, n_queries=5, k=5)
        lsh = vector.ann_lsh(SF, n_queries=5, k=5)
        hits = tot = 0
        for qid in bf["query_id"].unique():
            want = set(bf[bf.query_id == qid]["vec_id"])
            got = set(lsh[lsh.query_id == qid]["vec_id"])
            hits += len(want & got)
            tot += len(want)
        assert tot > 0 and hits / tot >= 0.4  # approximate path: bounded recall

    def test_ivf_recall_vs_brute_force(self, ray_session):
        """IVF probes nprobe/nlist of the corpus; recall bounded below and
        every returned cos must equal the brute-force cos for that pair
        (scoring is exact within probed cells)."""
        from imc_ray import vector

        bf = vector.knn_brute_force(SF, n_queries=5, k=5)
        ivf = vector.ann_ivf(SF, n_queries=5, k=5)
        assert set(ivf.columns) == {"query_id", "rank", "vec_id", "cos"}
        hits = tot = 0
        for qid in bf["query_id"].unique():
            want = set(bf[bf.query_id == qid]["vec_id"])
            got = set(ivf[ivf.query_id == qid]["vec_id"])
            hits += len(want & got)
            tot += len(want)
        assert tot > 0 and hits / tot >= 0.3  # random embeddings: bounded
        # exactness of returned scores on the intersection
        m = ivf.merge(bf, on=["query_id", "vec_id"], suffixes=("_i", "_b"))
        if len(m):
            assert (m["cos_i"] == m["cos_b"]).all()

    def test_ivf_deterministic(self, ray_session):
        from imc_ray import vector

        a = vector.ann_ivf(SF, n_queries=3, k=4)
        b = vector.ann_ivf(SF, n_queries=3, k=4)
        assert a.equals(b)

    def test_ann_recall_scalars_exact(self, ray_session):
        """The recall surface must equal an independently recomputed
        overlap, meet the family's floors, and be deterministic — the
        value contract for the approximate rows-only ANN queries."""
        from imc_ray import vector

        out = vector.ann_recall_scalars(SF, n_queries=5, k=5)
        assert list(out.columns) == ["method", "query_id", "hits", "k"]
        bf = vector.knn_brute_force(SF, n_queries=5, k=5)
        res = {"lsh": vector.ann_lsh(SF, n_queries=5, k=5),
               "ivf": vector.ann_ivf(SF, n_queries=5, k=5)}
        for _, r in out.iterrows():
            truth = set(bf.loc[bf["query_id"] == r["query_id"], "vec_id"])
            got = set(res[r["method"]].loc[
                res[r["method"]]["query_id"] == r["query_id"], "vec_id"])
            assert r["hits"] == len(truth & got)
            assert r["k"] == len(truth)
        agg = out.groupby("method").sum(numeric_only=True)
        assert agg.loc["lsh", "hits"] / agg.loc["lsh", "k"] >= 0.4
        assert agg.loc["ivf", "hits"] / agg.loc["ivf", "k"] >= 0.3
        assert out.equals(vector.ann_recall_scalars(SF, n_queries=5, k=5))

    def test_embedding_near_dup_rows(self, ray_session):
        from imc_ray import vector

        out = vector.embedding_near_dup(SF)
        assert len(out) == 500
        assert (out["dup_group"] <= out["vec_id"]).all()

    def test_embedding_near_dup_routes_identical(self, ray_session):
        """Broadcast and hash-join cosine-verify routes must produce the
        same dup groups (round-3: the join route is otherwise never executed
        by any test corpus; both share the _pair_cos kernel)."""
        from imc_ray import vector

        a = vector.embedding_near_dup(SF)
        b = vector.embedding_near_dup(SF, broadcast_max_pairs=0)
        assert a.equals(b)

    def test_head_by_vec_id_matches_global_sort(self, ray_session):
        """The partial min-k head must equal the global sort+limit it
        replaced (round-2 review item 3: no AllToAll Sort for a
        constant-size deterministic head)."""
        from imc_ray import vector
        from imc_ray.stages import read_table

        ds = read_table(SF, "embeddings", columns=["vec_id", "embedding"])
        got = vector.head_by_vec_id(ds, 7)
        want = ds.sort("vec_id").limit(7).to_pandas()
        assert list(got["vec_id"]) == list(want["vec_id"])
        for g, w in zip(got["embedding"], want["embedding"]):
            assert np.array_equal(np.asarray(g), np.asarray(w))


class TestSketches:
    def test_hll_accuracy(self, ray_session):
        from imc_ray import sketches
        from imc_ray.stages import read_table

        ev = read_table(SF, "events", columns=["user_id"])
        est = sketches.approx_distinct(ev, "user_id")
        exact = len(set(ev.unique("user_id")))
        assert abs(est - exact) / exact < 0.06  # HLL p=12 ⇒ ~1.6% typical

    def test_hll_merge_equals_single(self):
        import numpy as np

        from imc_ray import sketches

        vals = [f"v{i}" for i in range(5000)]
        whole = sketches.hll_accumulate(vals)
        a = sketches.hll_accumulate(vals[:2500])
        b = sketches.hll_accumulate(vals[2500:])
        assert np.array_equal(sketches.hll_merge(a, b), whole)
        est = sketches.hll_estimate(whole)
        assert abs(est - 5000) / 5000 < 0.06


class TestMultimodal:
    def test_featurizer_plumbing(self, ray_session):
        from imc_ray import multimodal, stages

        pages = stages.synth_pages(30, seed=42)
        media = multimodal.pages_as_media(pages)
        feats = multimodal.featurize_media(media).to_pandas()
        assert len(feats) == 30
        assert all(len(f) == multimodal.FEATURE_DIM for f in feats["feature"])
        assert (feats["n_bytes"] > 0).all()

    def test_frame_sample_resize_pipeline(self, ray_session):
        """Video-style chain: frame-sample (1→n rows) → resize (fixed-size
        payloads) → per-frame featurize, all actor-pool stages."""
        from imc_ray import multimodal, stages

        pages = stages.synth_pages(20, seed=42)
        media = multimodal.pages_as_media(pages)
        frames = multimodal.sample_frames(media, n_frames=3).materialize()
        fdf = frames.to_pandas()
        assert len(fdf) == 60  # 20 media × 3 frames
        assert set(fdf["frame_idx"]) == {0, 1, 2}
        resized = multimodal.resize_media(frames, 8, 4).to_pandas()
        assert all(len(p) == 32 for p in resized["payload"])
        assert "frame_idx" in resized.columns  # attribution survives resize
        feats = multimodal.featurize_media(
            multimodal.resize_media(frames, 8, 4)).to_pandas()
        assert len(feats) == 60
        assert all(len(f) == multimodal.FEATURE_DIM for f in feats["feature"])
        # frame attribution survives the whole chain: every media carries
        # each frame index {0,1,2} equally often (synth corpus plants
        # duplicate urls, so one media_id may aggregate several pages)
        per_media = feats.groupby("media_id")["frame_idx"].apply(
            lambda s: sorted(s.tolist()))
        for v in per_media:
            assert len(v) % 3 == 0
            assert v == sorted([0, 1, 2] * (len(v) // 3))

    def test_fake_features_deterministic(self):
        from imc_ray.multimodal import fake_features

        a = fake_features(b"hello world payload")
        b = fake_features(b"hello world payload")
        assert np.array_equal(a, b)
        assert len(fake_features(b"")) == 18

    def test_real_decode_is_stubbed(self):
        from imc_ray.multimodal import _decode_real, _frame_sample_real, _resize_real

        for fn, args in ((_decode_real, (b"p", "image")),
                         (_resize_real, (b"p", 8, 8)),
                         (_frame_sample_real, (b"p", 100))):
            with pytest.raises(NotImplementedError):
                fn(*args)

    def test_fake_resize_and_frame_sample(self):
        from imc_ray.multimodal import fake_frame_sample, fake_resize

        out = fake_resize(b"0123456789", 4, 2)
        assert len(out) == 8
        assert fake_resize(b"0123456789", 4, 2) == out  # deterministic
        frames = fake_frame_sample(b"abcdefgh", 4)
        assert len(frames) == 4 and b"".join(frames) == b"abcdefgh"
        assert fake_frame_sample(b"", 4) == []


class TestFusedParse:
    def test_combined_parse_equals_two_pass(self, ray_session):
        """The single-parse combined stage split into segments/tiles must
        equal the two-pass build_segments / build_tiles_from_pages outputs
        exactly (round-3 review item 7: parse once, not once per branch)."""
        from imc_ray import stages
        from imc_ray.config import PipelineConfig

        cfg = PipelineConfig()
        pages = stages.synth_pages(120, seed=42).materialize()
        extracted = stages.extract_pages(stages.dedup_pages(pages), cfg) \
            .materialize()
        parsed = stages.build_parsed(extracted, cfg).materialize()

        seg_a = (stages.split_segments(parsed).to_pandas()
                 .sort_values("seg_id").reset_index(drop=True))
        seg_b = (stages.build_segments(extracted, cfg).to_pandas()
                 .sort_values("seg_id").reset_index(drop=True))
        assert seg_a.equals(seg_b)
        assert len(seg_a) > 0

        til_a = (stages.tiles_from_parsed(parsed, cfg).to_pandas()
                 .sort_values("tile_id").reset_index(drop=True))
        til_b = (stages.build_tiles_from_pages(extracted, cfg).to_pandas()
                 .sort_values("tile_id").reset_index(drop=True))
        assert til_a.equals(til_b)
        assert len(til_a) > 0


class TestSpatialJoinRouting:
    def test_spatial_join_routes_identical(self, ray_session):
        """The cell-keyed co-partitioned J3 (forced via threshold 0) must
        emit exactly the broadcast TileJoiner's rows — round-3 review item
        1: the broadcast-only polygon side was the last §2 component with no
        route that survives a corpus-proportional small side."""
        from imc_ray import pipeline, stages
        from imc_ray.config import PipelineConfig

        cfg = PipelineConfig()
        pages = stages.synth_pages(200, seed=42).materialize()
        res = pipeline.run(pages, cfg)
        tiles = res["tiles"].materialize()
        polys = res["polygons"]
        assert len(polys) > 0

        def norm(ds):
            return (ds.to_pandas()
                    .sort_values(["tile_id", "cluster_id"])
                    .reset_index(drop=True))

        bcast = norm(stages.spatial_join(tiles, polys, cfg))
        copart = norm(stages.spatial_join(tiles, polys, cfg,
                                          broadcast_max_polys=0))
        assert len(bcast) > 0
        assert bcast.equals(copart)
        # and both equal the pipeline's own (routed) output
        assert norm(res["tile_cluster"]).equals(bcast)


class TestKnnJoin:
    def test_knn_against_bruteforce_hausdorff(self, ray_session):
        """J4 kNN join must equal GLOBAL brute-force Hausdorff kNN — the
        ring-expansion fallback resolves sparse-region homes whose k-th
        neighbor lies beyond the replication radius (round 1 truncated the
        reference at 2M; cross-site neighbors kilometres away now count,
        so this doubles as the sparse-region regression test)."""
        from imc_ray import geom, pipeline, stages
        from imc_ray.config import PipelineConfig

        cfg = PipelineConfig()
        pages = stages.synth_pages(60, seed=42).materialize()
        got = pipeline.knn_query(pages, cfg, k=3).to_pandas()
        # brute force over all segments
        extracted = stages.extract_pages(stages.dedup_pages(pages), cfg)
        segs_df = stages.build_segments(extracted, cfg).to_pandas()
        S = segs_df[["x1", "y1", "x2", "y2"]].to_numpy()
        ids = segs_df["seg_id"].to_numpy()
        D = geom.hausdorff_block(S, S)
        mism = 0
        for r in range(len(S)):
            d = D[r].copy()
            d[r] = np.inf
            # brute-force top-3 with the same (dist, seg_id) tie order —
            # no radius truncation: the fallback makes the join globally exact
            order = np.lexsort((ids, d))[:3]
            ref = [int(ids[j]) for j in order if np.isfinite(d[j])]
            mine = got[got.seg_id == ids[r]].sort_values("rank")["nbr_id"].to_numpy()
            if list(mine) != ref:
                mism += 1
        assert mism == 0


class TestRound3Relational:
    def test_range_join_bucket_boundary(self, ray_session, tmp_path):
        """Bucketed band join must capture pairs that span a bucket boundary
        and honour the (open, closed] window edges exactly: dt == window is
        IN, dt == 0 and dt > window are OUT."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from imc_ray import relational

        w = 14400 * 1_000_000  # window in us (the operator default)
        base = np.int64(1_700_000_000_000_000)
        # signup at base; purchases at dt = 0, 1, w-1 (same bucket),
        # w (next bucket, still in), w+1 (out); plus an other-user purchase
        rows = [
            (1, 7, base, "signup"),
            (2, 7, base, "purchase"),          # dt=0 → out (strict >)
            (3, 7, base + 1, "purchase"),      # in
            (4, 7, base + w - 1, "purchase"),  # in, same bucket
            (5, 7, base + w, "purchase"),      # in, crosses bucket, dt==w
            (6, 7, base + w + 1, "purchase"),  # out
            (7, 8, base + 5, "purchase"),      # other user → out
        ]
        t = pa.table({
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "ts": pa.array(np.array([r[2] for r in rows],
                                    dtype=np.int64).astype("datetime64[us]")),
            "event_type": pa.array([r[3] for r in rows], type=pa.string()),
        })
        pq.write_table(t, str(tmp_path / "events.parquet"))
        out = relational.range_join_purchases(str(tmp_path))
        assert list(out["purchase_id"]) == [3, 4, 5]
        assert list(out["dt_us"]) == [1, w - 1, w]

    def test_embedding_exact_dup_groups_planted(self, ray_session, tmp_path):
        """Hash-groupby vector dedup must recover GROUP BY embedding exactly
        on planted duplicate vectors (float32-bit-identical ⟺ same group)."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from imc_ray import vector

        rng = np.random.default_rng(7)
        m = rng.normal(size=(10, 8)).astype(np.float32)
        m = np.vstack([m, m[0], m[3], m[0]])          # 10,11,12 are dups
        near = m[1].copy()
        near[0] += np.float32(1e-6)                    # near, NOT equal
        m = np.vstack([m, near])                       # 13
        t = pa.table({
            "vec_id": pa.array(np.arange(len(m), dtype=np.int64)),
            "embedding": pa.array([row.tolist() for row in m],
                                  type=pa.list_(pa.float32())),
        })
        pq.write_table(t, str(tmp_path / "embeddings.parquet"))
        out = vector.embedding_exact_dup_groups(str(tmp_path))
        got = dict(zip(out["vec_id"], out["n_copies"]))
        want = {i: 1 for i in range(10)}
        want[0] = 3            # 0, 10, 12
        want[3] = 2            # 3, 11
        del want[3]; want[3] = 2
        want[13] = 1
        assert got == want

    def test_rollup_internal_consistency(self, ray_session):
        """Subtotal rows must equal the sum of their finest-level rows."""
        from imc_ray import relational

        out = relational.rollup_pricing("/root/testdata/sf0.001")
        fine = out[(out["l_returnflag"] != "ALL")
                   & (out["l_linestatus"] != "ALL")]
        total = out[(out["l_returnflag"] == "ALL")]
        assert int(total["n"].iloc[0]) == int(fine["n"].sum())
        assert abs(float(total["sum_qty"].iloc[0])
                   - float(fine["sum_qty"].sum())) < 0.05

    def test_simhash_near_dup_equals_bruteforce(self, ray_session, tmp_path):
        """Band-bucketed Hamming grouping must equal the brute-force O(n²)
        union-find exactly — the 4×16-bit pigeonhole makes the candidates
        exhaustive at max_hamming=3, so this is equality, not recall."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from imc_ray import textops

        rng = np.random.default_rng(11)
        vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
                 "theta", "iota", "kappa"]
        texts = [" ".join(rng.choice(vocab, size=30)) for _ in range(60)]
        # plant exact dups (Hamming 0) and one-token edits (small Hamming)
        texts += [texts[0], texts[5], texts[5]]
        edited = texts[10].split(" "); edited[3] = "omega"
        texts.append(" ".join(edited))
        ids = np.arange(len(texts), dtype=np.int64)
        pq.write_table(pa.table({"doc_id": pa.array(ids),
                                 "text": pa.array(texts)}),
                       str(tmp_path / "documents.parquet"))

        out = textops.simhash_near_dup(str(tmp_path))
        got = dict(zip(out["doc_id"], out["dup_group"]))
        # the scale route (20-of-6 block triples, forced) is the SAME
        # exhaustive candidate guarantee — identical groups required
        out_scale = textops.simhash_near_dup(str(tmp_path), layout="20of6")
        assert got == dict(zip(out_scale["doc_id"], out_scale["dup_group"]))

        # brute force: popcount of all-pairs XOR + union-find
        hs = textops.simhash64_batch(texts).astype(np.uint64)
        parent = list(range(len(texts)))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for i in range(len(texts)):
            for j in range(i + 1, len(texts)):
                ham = bin(int(hs[i] ^ hs[j])).count("1")
                if ham <= 3:
                    ri, rj = find(i), find(j)
                    if ri != rj:
                        parent[max(ri, rj)] = min(ri, rj)
        want = {i: min(k for k in range(len(texts)) if find(k) == find(i))
                for i in range(len(texts))}
        assert got == want
        assert got[len(texts) - 4] == got[0]   # exact dup of 0 grouped

    def test_topk_count_rows_equals_global_sort(self, ray_session):
        """The partial top-k over a grouped count aggregate must equal the
        global sort+limit it replaced (keys are unique post-groupby, so the
        per-block head-k merge is exact)."""
        from ray.data.aggregate import Sum

        import pyarrow as pa
        import ray.data

        from imc_ray import textops

        rows = [{"token": f"t{i % 37:02d}", "n": 1} for i in range(500)]
        ds = ray.data.from_items(rows, override_num_blocks=8)
        agg = ds.groupby("token").aggregate(Sum("n", alias_name="n"))
        got = textops._topk_count_rows(agg, "token", 10)
        want = (agg.sort(["n", "token"], descending=[True, False]).limit(10)
                .to_pandas())
        assert list(got["token"]) == list(want["token"])
        assert [int(x) for x in got["n"]] == [int(x) for x in want["n"]]

    def test_levenshtein_pairs_kernel(self):
        """Pair-vectorized DP equals the textbook per-pair DP (random short
        strings incl. empties, repeats and length skew)."""
        import numpy as np

        from imc_ray.textops import _levenshtein_pairs

        def ref(a: str, b: str) -> int:
            prev = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                cur = [i]
                for j, cb in enumerate(b, 1):
                    cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                                   prev[j - 1] + (ca != cb)))
                prev = cur
            return prev[-1]

        rng = np.random.default_rng(7)
        words = ["".join(rng.choice(list("abcde"), size=int(n)))
                 for n in rng.integers(0, 12, size=30)]
        bs = [w.encode() for w in words]
        lens = np.array([len(b) for b in bs], dtype=np.int64)
        L = max(1, int(lens.max()))
        codes = np.zeros((len(bs), L), dtype=np.uint8)
        for k, b in enumerate(bs):
            codes[k, :len(b)] = np.frombuffer(b, dtype=np.uint8)
        iu, ju = np.triu_indices(len(words), k=1)
        got = _levenshtein_pairs(codes, lens, iu, ju)
        want = [ref(words[i], words[j]) for i, j in zip(iu, ju)]
        assert got.tolist() == want

    def test_charset_jaccard_masks(self):
        """Bitmask popcount Jaccard equals explicit character-set math
        (DuckDB jaccard() semantics: repeats collapse)."""
        import numpy as np

        from imc_ray.textops import _POP8, _charset_masks

        words = [b"small ring", b"small gizmo", b"red widget", b"aa", b"ab"]
        masks = _charset_masks(list(words))
        for i in range(len(words)):
            for j in range(len(words)):
                a, b = set(words[i]), set(words[j])
                inter = int(_POP8[masks[i] & masks[j]].sum())
                union = int(_POP8[masks[i] | masks[j]].sum())
                assert inter == len(a & b) and union == len(a | b)

    def test_custom_aggregate_v2_matches_pandas(self, ray_session):
        """BitOr/BoolOr/BoolAnd (AggregateFnV2 extension classes) must match
        a local pandas reduction over the same grouped data."""
        import numpy as np
        import pandas as pd
        import ray.data

        from imc_ray.relational import BitOr, BoolAnd, BoolOr

        rng = np.random.default_rng(3)
        df = pd.DataFrame({
            "k": rng.integers(0, 5, size=400),
            "bits": rng.integers(0, 256, size=400),
            "flag": rng.random(size=400) > 0.8,
        })
        got = (ray.data.from_pandas(df, override_num_blocks=7)
               .groupby("k")
               .aggregate(BitOr("bits", "b"), BoolOr("flag", "o"),
                          BoolAnd("flag", "a"))
               .to_pandas().sort_values("k").reset_index(drop=True))
        want = (df.groupby("k", as_index=False)
                .agg(b=("bits", lambda s: int(np.bitwise_or.reduce(
                        s.to_numpy()))),
                     o=("flag", "any"), a=("flag", "all")))
        assert got["b"].astype("int64").tolist() == want["b"].tolist()
        assert got["o"].astype(bool).tolist() == want["o"].tolist()
        assert got["a"].astype(bool).tolist() == want["a"].tolist()

    def test_semi_filter_routes_identical(self, ray_session):
        """Broadcast is_in and hash-join semi/anti routes must agree
        (round-3 audit: the key set of a semi filter is corpus-proportional,
        so the broadcast-only path needed a scale route)."""
        from imc_ray import relational

        for fn in (relational.semi_join_customers,
                   relational.anti_join_customers):
            bcast = fn(SF)
            joined = fn(SF, broadcast_max_keys=0)
            assert bcast.equals(joined), fn.__name__

    def test_global_row_number_bucket_invariance(self, ray_session):
        """Exact ranks must not depend on the bucket count (the sampled
        range partition only balances work), and must equal a local sort."""
        import numpy as np
        import pandas as pd
        import ray.data

        from imc_ray.relational import global_row_number

        rng = np.random.default_rng(11)
        df = pd.DataFrame({"k": rng.choice([1.5, 2.5, 2.5, 7.0, 9.25], 300),
                           "tid": np.arange(300, dtype=np.int64)})
        want = df.sort_values(["k", "tid"]).reset_index(drop=True)
        want["rn"] = np.arange(1, 301, dtype=np.int64)
        want = want.sort_values("tid").reset_index(drop=True)
        for nb in (2, 7, 64):
            ds = ray.data.from_pandas(df, override_num_blocks=5)
            got = (global_row_number(ds, "k", "tid", n_buckets=nb)
                   .to_pandas().sort_values("tid").reset_index(drop=True))
            assert got["rn"].tolist() == want["rn"].tolist(), nb

    def test_fuzzy_pairs_vocab_expansion_equals_bruteforce(self, ray_session):
        """Vocabulary-first pair generation (DP over distinct names, key
        expansion after) must equal the naive all-row-pairs double loop,
        including duplicate-name groups (lev-0 pairs)."""
        import numpy as np
        import pandas as pd
        import ray.data

        from imc_ray import textops

        def ref_lev(a, b):
            prev = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                cur = [i]
                for j, cb in enumerate(b, 1):
                    cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                                   prev[j - 1] + (ca != cb)))
                prev = cur
            return prev[-1]

        names = ["red gear", "red bear", "red gear", "blue bolt", "red gea",
                 "red gear", "tan bolt", "blue bolt"]
        df = pd.DataFrame({"p_partkey": np.arange(len(names), dtype=np.int64),
                           "p_name": names, "p_brand": "B#1"})
        import os, tempfile
        with tempfile.TemporaryDirectory() as d:
            df.to_parquet(os.path.join(d, "part.parquet"))
            out = textops.fuzzy_name_pairs(d)
        want = []
        for i in range(len(names)):
            for j in range(i + 1, len(names)):
                lv = ref_lev(names[i], names[j])
                if lv <= 3:
                    a, b = set(names[i].encode()), set(names[j].encode())
                    want.append(("B#1", i, j, lv, len(a & b) / len(a | b)))
        want = (pd.DataFrame(want, columns=["p_brand", "key1", "key2",
                                            "lev", "jac"])
                .sort_values(["key1", "key2"]).reset_index(drop=True))
        out = (out.sort_values(["key1", "key2"]).reset_index(drop=True)
               .astype({"key1": "int64", "key2": "int64", "lev": "int64"}))
        pd.testing.assert_frame_equal(
            out[["key1", "key2", "lev", "jac"]],
            want[["key1", "key2", "lev", "jac"]])

    def test_semi_filter_null_keys_route_parity(self, ray_session):
        """NOT-EXISTS null semantics, identical on both routes: a null
        filter column matches nothing — dropped by semi, kept by anti
        (Arrow is_in evaluates null as not-in, matching the left-outer
        null-marker route)."""
        import pandas as pd
        import ray.data

        from imc_ray.relational import semi_filter

        df = pd.DataFrame({"k": pd.array([1, 2, None, 4], dtype="Int64"),
                           "v": ["a", "b", "c", "d"]})
        keys = pd.DataFrame({"kk": pd.array([2, 9], dtype="Int64")})
        for bmax in (100, 0):   # broadcast route, join route
            ds = ray.data.from_pandas(df)
            kds = ray.data.from_pandas(keys)
            semi = (semi_filter(ds, "k", kds, "kk", True, bmax)
                    .to_pandas().sort_values("v")["v"].tolist())
            anti = (semi_filter(ds, "k", kds, "kk", False, bmax)
                    .to_pandas().sort_values("v")["v"].tolist())
            assert semi == ["b"], (bmax, semi)
            assert anti == ["a", "c", "d"], (bmax, anti)


class TestWindowBucketRoute:
    def test_window_bucket_route(self, ray_session):
        """per_key_windows must (a) equal the per-key map_groups semantics
        exactly and (b) invoke bucket_fn once per COARSE bucket (≤ B calls
        total), never once per key — the round-3 verdict item 1 contract."""
        import ray.data

        from imc_ray.relational import per_key_windows

        rng = np.random.default_rng(7)
        n, n_keys, b = 5000, 400, 8
        df = pd.DataFrame({
            "k": rng.integers(0, n_keys, n).astype("int64"),
            "ord": np.arange(n, dtype="int64"),
            "v": rng.normal(size=n),
        })
        ds = ray.data.from_pandas(df).repartition(6)

        def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["k", "ord"], kind="stable")
            g["cum"] = g.groupby("k", sort=False)["v"].cumsum()
            # one marker row per invocation proves the call count
            g["call_rows"] = np.int64(len(g))
            return g[["k", "ord", "cum", "call_rows"]]

        out = (per_key_windows(ds, "k", bucket_fn, n_buckets=b)
               .to_pandas().sort_values("ord").reset_index(drop=True))

        # (a) exact per-key window semantics
        ref = df.sort_values(["k", "ord"], kind="stable")
        ref = ref.assign(cum=ref.groupby("k")["v"].cumsum())
        ref = ref.sort_values("ord").reset_index(drop=True)
        np.testing.assert_allclose(out["cum"].to_numpy(),
                                   ref["cum"].to_numpy(), rtol=0, atol=0)
        assert len(out) == n

        # (b) bucket_fn ran once per coarse bucket: the distinct invocation
        # sizes must partition n into ≤ b pieces (each key's rows intact)
        sizes = out.groupby("call_rows")["ord"].count()
        n_calls = int(sum(int(s) // int(cr) for cr, s in sizes.items()))
        assert n_calls <= b, (n_calls, b)
        # every key fully inside one invocation: per-key call_rows constant
        assert (out.groupby("k")["call_rows"].nunique() == 1).all()


class TestDecontaminate:
    def test_decontaminate_route_parity_and_semantics(self, ray_session, tmp_path):
        """Broadcast and hash-join routes must agree, and the flags must
        equal a brute-force n-gram overlap check against the blocklist
        slice (doc_id % 100 == 0)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from imc_ray import textops

        rng = np.random.default_rng(3)
        vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
        texts = [" ".join(rng.choice(vocab, size=12)) for _ in range(40)]
        # doc 0 and 100 are blocklist; plant doc 7 to contain doc 0's grams
        texts[0] = "one two three four five six"
        texts[7] = "zzz two three four five yyy"        # shares 4-gram
        ids = np.array(list(range(7)) + [7] + list(range(8, 39)) + [100],
                       dtype=np.int64)
        pq.write_table(pa.table({"doc_id": pa.array(ids),
                                 "text": pa.array(texts)}),
                       str(tmp_path / "documents.parquet"))

        a = textops.decontaminate_documents(str(tmp_path))
        b = textops.decontaminate_documents(str(tmp_path), broadcast_max=0)
        pd.testing.assert_frame_equal(a, b)
        flags = dict(zip(a["doc_id"], a["contaminated"]))
        assert 0 not in flags and 100 not in flags  # blocklist rows excluded

        # brute force
        def grams(s, n=4):
            t = s.split(" ")
            return {" ".join(t[i:i + n]) for i in range(len(t) - n + 1)}

        bl = set().union(*(grams(t) for d, t in zip(ids, texts)
                           if d % 100 == 0))
        for d, t in zip(ids, texts):
            if d % 100 != 0:
                assert flags[d] == int(bool(grams(t) & bl)), d
        assert flags[7] == 1


class TestLangIdVectorized:
    def test_langid_matches_per_row_reference(self, ray_session):
        """The batch-vectorized LangId must emit IDENTICAL predictions to
        the per-row reference loop it replaced (round-3 verdict item 6),
        including CJK, empty, no-signal and tie-break cases."""
        import re

        import pyarrow as pa

        from imc_ray.textops import _LANG_MARKERS, LangId

        texts = [
            "the query select join table data for a in is",
            "der die das und ist nicht mit für ein",
            "el la los que y en un una de",
            "一二三四五六七八九十一二三四五六",     # zh
            "",                                     # und (no tokens)
            "zzz qqq xxx www",                      # und (no signal)
            "the der",                              # tie → 'de' (lex min)
            "Héllo The WORLD für 123 ñá the the",
            "ä一b" * 300,                            # CJK below threshold
            "the " * 1500,                           # prefix truncation
        ]

        def reference(text):
            word = re.compile(r"[a-zA-ZäöüÄÖÜßáéíóúñ]+")
            cjk = sum(1 for ch in text[:400] if "一" <= ch <= "鿿")
            if cjk > 5:
                return "zh"
            toks = [w.lower() for w in word.findall(text[:2000])]
            if not toks:
                return "und"
            scores = {lang: sum(1 for w in toks if w in markers)
                      for lang, markers in _LANG_MARKERS.items() if markers}
            best = max(scores.values())
            if best == 0:
                return "und"
            return min(l for l, s in scores.items() if s == best)

        batch = pa.table({"text": pa.array(texts, type=pa.string())})
        got = LangId()(batch)["pred_lang"].to_pylist()
        assert got == [reference(t) for t in texts]

        # and on the real sf0.001 corpus
        import pyarrow.parquet as pq
        corpus = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                               columns=["text"])
        got2 = LangId()(corpus)["pred_lang"].to_pylist()
        want2 = [reference(t) for t in corpus["text"].to_pylist()]
        assert got2 == want2


class TestNtileRoute:
    def test_ntile_scale_route_equals_group_route(self, ray_session):
        """The rank-arithmetic scale route (global_row_number over the
        composite partition key) must equal the per-partition map_groups
        route exactly, including uneven-tile edge cases."""
        from imc_ray.relational import ntile_order_prices

        sf = "/root/testdata/sf0.001"
        a = ntile_order_prices(sf)                        # group route
        b = ntile_order_prices(sf, group_rows_bound=0)    # rank route
        pd.testing.assert_frame_equal(a, b)


class TestKmeansEmbeddings:
    def test_kmeans_matches_numpy_oracle(self, ray_session):
        """Distributed Lloyd must emit EXACTLY the single-node labels: same
        init (k lowest vec_ids), same assignment kernel, float32-rounded
        centroid updates make the result partition-invariant."""
        import pyarrow.parquet as pq

        from imc_ray.vector import _assign_cells, kmeans_embeddings

        sf = "/root/testdata/sf0.001"
        k, iters = 8, 4
        got = kmeans_embeddings(sf, k=k, iters=iters)

        t = pq.read_table(sf + "/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        df = t.to_pandas().sort_values("vec_id").reset_index(drop=True)
        X = np.asarray(df["embedding"].tolist(), dtype=np.float32)
        c = X[:k].copy()
        for _ in range(iters):
            a = _assign_cells(X.astype(np.float64), c.astype(np.float64))
            for j in range(k):
                m = a == j
                if m.any():
                    c[j] = (X[m].astype(np.float64).sum(axis=0)
                            / m.sum()).astype(np.float32)
        want = _assign_cells(X.astype(np.float64), c.astype(np.float64))

        assert got["vec_id"].tolist() == df["vec_id"].tolist()
        assert got["cluster"].tolist() == [int(x) for x in want]
        assert got["cluster"].nunique() > 1  # actually clusters something

    def test_semantic_dedup_matches_numpy_oracle(self, ray_session):
        """SemDeDup composition must equal a single-node oracle that mirrors
        the same scheme exactly: identical k-means labels, candidate pairs
        ⟺ same cluster AND Hamming(base codes) ≤ 2 (own + Hamming-1 probe
        buckets intersect), exact cosine ≥ tau, min-id union-find groups."""
        import pyarrow.parquet as pq

        from imc_ray.vector import (_assign_cells, _pair_cos, _planes,
                                    _N_PLANES, semantic_dedup_embeddings)

        sf = "/root/testdata/sf0.001"
        k, iters, tau = 4, 3, 0.1  # low tau so real pairs survive the verify
        got = semantic_dedup_embeddings(sf, k=k, iters=iters, tau=tau)

        t = pq.read_table(sf + "/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        df = t.to_pandas().sort_values("vec_id").reset_index(drop=True)
        X = np.asarray(df["embedding"].tolist(), dtype=np.float32)
        vid = df["vec_id"].to_numpy(dtype=np.int64)
        c = X[:k].copy()
        for _ in range(iters):
            a = _assign_cells(X.astype(np.float64), c.astype(np.float64))
            for j in range(k):
                m = a == j
                if m.any():
                    c[j] = (X[m].astype(np.float64).sum(axis=0)
                            / m.sum()).astype(np.float32)
        lab = _assign_cells(X.astype(np.float64), c.astype(np.float64))
        P = _planes(X.shape[1])
        signs = (X @ P) >= 0
        base = np.zeros(len(X), dtype=np.int64)
        for b in range(_N_PLANES):
            base |= signs[:, b].astype(np.int64) << b
        # union-find over oracle-verified candidate pairs
        parent = {int(v): int(v) for v in vid}

        def find(u):
            while parent[u] != u:
                parent[u] = parent[parent[u]]
                u = parent[u]
            return u

        for i in range(len(X)):
            for j in range(i + 1, len(X)):
                if lab[i] != lab[j]:
                    continue
                if bin(int(base[i]) ^ int(base[j])).count("1") > 2:
                    continue
                cos = _pair_cos(X[i:i + 1], X[j:j + 1])[0]
                if cos >= tau:
                    ra, rb = find(int(vid[i])), find(int(vid[j]))
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        want_group = [find(int(v)) for v in vid]

        assert got["vec_id"].tolist() == vid.tolist()
        assert got["cluster"].tolist() == [int(x) for x in lab]
        assert got["dup_group"].tolist() == want_group
        assert (got["keep"] == (got["vec_id"] == got["dup_group"])).all()
        assert got["keep"].sum() < len(got)  # at tau=0.1 some dups collapse
        # the composition invariant: a dup group never crosses clusters
        g = got.groupby("dup_group")["cluster"].nunique()
        assert (g == 1).all()

    def test_semantic_dedup_planted_duplicates(self, ray_session, tmp_path):
        """Planted EXACT duplicate vectors (cos = 1, identical codes) must
        collapse to the min-id survivor; distinct random vectors survive."""
        import pyarrow.parquet as pq

        from imc_ray.vector import semantic_dedup_embeddings

        import pyarrow as pa

        rng = np.random.default_rng(7)
        base = rng.normal(size=(40, 16)).astype(np.float32)
        dup = np.vstack([base, base[:5]])  # ids 40..44 duplicate 0..4
        t = pa.table({
            "vec_id": pa.array(np.arange(len(dup), dtype=np.int64)),
            "embedding": pa.array([r.tolist() for r in dup],
                                  type=pa.list_(pa.float32())),
        })
        pq.write_table(t, tmp_path / "embeddings.parquet")
        out = semantic_dedup_embeddings(str(tmp_path), k=3, iters=2,
                                        tau=0.999)
        by = dict(zip(out["vec_id"], out["dup_group"]))
        for i in range(5):
            assert by[40 + i] == i  # survivor = min id of the pair
            assert by[i] == i
        assert not out.loc[out["vec_id"] >= 40, "keep"].any()
        assert out.loc[out["vec_id"] < 40, "keep"].all()

    def test_window_bucket_count_invariance(self, ray_session):
        """Window results must not depend on the coarse-bucket modulus —
        it only re-partitions complete key groups."""
        import ray.data

        from imc_ray.relational import per_key_windows

        rng = np.random.default_rng(13)
        df = pd.DataFrame({
            "k": rng.integers(0, 50, 800).astype("int64"),
            "ord": np.arange(800, dtype="int64"),
            "v": rng.normal(size=800),
        })

        def fn(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["k", "ord"], kind="stable")
            g["cum"] = g.groupby("k", sort=False)["v"].cumsum()
            return g[["k", "ord", "cum"]]

        outs = []
        for b in (2, 64):
            ds = ray.data.from_pandas(df).repartition(5)
            outs.append(per_key_windows(ds, "k", fn, n_buckets=b)
                        .to_pandas().sort_values("ord")
                        .reset_index(drop=True))
        pd.testing.assert_frame_equal(outs[0], outs[1])


class TestPerKeyRunningTotal:
    def test_hot_key_route_equality(self, ray_session):
        """A key holding 50% of all rows must produce IDENTICAL running
        totals through the hot route (global_prefix_sum per hot key) and
        the cold coarse-bucket route — and match single-node pandas."""
        import ray.data

        from imc_ray.relational import per_key_running_total

        rng = np.random.default_rng(21)
        n = 4000
        key = np.where(np.arange(n) % 2 == 0, 7,
                       rng.integers(100, 160, n)).astype("int64")
        df = pd.DataFrame({
            "k": key,
            "ord": rng.permutation(np.arange(n)).astype("int64"),
            "v": rng.integers(-50, 50, n).astype("int64"),
        })
        want = df.sort_values(["k", "ord"], kind="stable").copy()
        want["running"] = want.groupby("k", sort=False)["v"].cumsum()
        want = (want[["k", "ord", "running"]]
                .sort_values(["k", "ord"]).reset_index(drop=True))

        outs = []
        for thresh in (100, 10**9):  # hot route forced / all-cold route
            ds = ray.data.from_pandas(df).repartition(6)
            got = (per_key_running_total(ds, "k", "ord", "v",
                                         hot_threshold=thresh)
                   .to_pandas().sort_values(["k", "ord"])
                   .reset_index(drop=True))
            got["running"] = got["running"].astype("int64")
            outs.append(got)
        pd.testing.assert_frame_equal(outs[0], outs[1])
        pd.testing.assert_frame_equal(outs[0], want)


class TestGlobalPrefixSum:
    def test_prefix_sum_exact_and_bucket_invariant(self, ray_session):
        """global_prefix_sum must equal the single-node exclusive cumsum
        exactly, for any bucket modulus."""
        import ray.data

        from imc_ray.relational import global_prefix_sum

        rng = np.random.default_rng(5)
        df = pd.DataFrame({
            "k": rng.permutation(np.arange(3000)).astype("int64"),
            "v": rng.integers(0, 40, 3000).astype("int64"),
        })
        want = df.sort_values("k").reset_index(drop=True)
        want["pre"] = np.concatenate([[0],
                                      np.cumsum(want["v"].to_numpy())[:-1]])
        for b in (4, 64):
            ds = ray.data.from_pandas(df).repartition(7)
            got = (global_prefix_sum(ds, "k", "v", n_buckets=b)
                   .to_pandas().sort_values("k").reset_index(drop=True))
            pd.testing.assert_frame_equal(
                got.astype({"pre": "int64"}),
                want.rename(columns={})[["k", "v", "pre"]])


class TestRealMediaCodecs:
    def test_bmp_roundtrip(self):
        from imc_ray.multimodal import decode_bmp, encode_bmp

        rng = np.random.default_rng(2)
        for h, w in ((1, 1), (5, 7), (24, 32), (17, 3)):
            img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
            np.testing.assert_array_equal(decode_bmp(encode_bmp(img)), img)

    def test_wav_roundtrip(self):
        from imc_ray.multimodal import decode_wav, encode_wav

        rng = np.random.default_rng(3)
        s = rng.integers(-32768, 32767, 2000).astype(np.int16)
        rate, got = decode_wav(encode_wav(s, 22050))
        assert rate == 22050
        np.testing.assert_array_equal(got, s)

    def test_video_container_demux(self):
        from imc_ray.multimodal import (decode_bmp, encode_bmp,
                                        split_bmp_frames)

        rng = np.random.default_rng(4)
        imgs = [rng.integers(0, 256, (8, 11, 3)).astype(np.uint8)
                for _ in range(5)]
        payload = b"".join(encode_bmp(i) for i in imgs)
        frames = split_bmp_frames(payload)
        assert len(frames) == 5
        for f, img in zip(frames, imgs):
            np.testing.assert_array_equal(decode_bmp(f), img)

    def test_nearest_resize_reference(self):
        from imc_ray.multimodal import nearest_resize

        img = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(6, 4, 3)
        out = nearest_resize(img, 2, 3)
        assert out.shape == (3, 2, 3)
        # reference: src index = floor(dst * S/D)
        for y in range(3):
            for x in range(2):
                np.testing.assert_array_equal(
                    out[y, x], img[(y * 6) // 3, (x * 4) // 2])

    def test_real_decode_pipeline(self, ray_session):
        """REAL decode over the synthetic media corpus: decoded dimensions
        and sample counts must match what the encoders wrote; real resize +
        real frame sampling round through the actor stages."""
        from imc_ray import multimodal

        out = multimodal.media_decode_stats("/root/testdata/sf0.001")
        assert len(out) == 500
        img = out[out["kind"] == "image"]
        assert img["w"].isin([30, 31, 32]).all()
        assert img["h"].isin([24, 32, 40]).all()
        assert img["w"].nunique() == 3  # all row paddings exercised
        aud = out[out["kind"] == "audio"]
        assert (aud["n_samples"] >= 1600).all()
        vid = out[out["kind"] == "video"]
        assert (vid["n_frames"] == 3).all()

        # real resize + real frame sample through the Ray stages
        ds = multimodal.synth_media_from_documents("/root/testdata/sf0.001")

        def only(kind):
            def f(t):
                import pyarrow.compute as pc
                return t.filter(pc.equal(t["media_type"], kind))
            return f

        imgs = ds.map_batches(only("image"), batch_format="pyarrow")
        resized = multimodal.resize_media(imgs, 8, 8, use_stub=False)
        rb = resized.take_batch(5, batch_format="pyarrow")
        from imc_ray.multimodal import decode_bmp
        for p in rb["payload"].to_pylist():
            assert decode_bmp(p).shape == (8, 8, 3)

        vids = ds.map_batches(only("video"), batch_format="pyarrow")
        frames = multimodal.sample_frames(vids, n_frames=2,
                                          use_stub=False)
        fb = frames.take_batch(6, batch_format="pyarrow")
        assert set(fb["frame_idx"].to_pylist()) <= {0, 1, 2}


class TestWindowStringKeys:
    def test_per_key_windows_string_keys(self, ray_session):
        """String partition keys hash through the same coarse buckets with
        identical per-key semantics."""
        import ray.data

        from imc_ray.relational import per_key_windows

        rng = np.random.default_rng(9)
        df = pd.DataFrame({
            "k": rng.choice([f"user-{i}" for i in range(40)], 600),
            "ord": np.arange(600, dtype="int64"),
            "v": rng.integers(0, 10, 600).astype("int64"),
        })

        def fn(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["k", "ord"], kind="stable")
            g["cum"] = g.groupby("k", sort=False)["v"].cumsum()
            return g[["k", "ord", "cum"]]

        ds = ray.data.from_pandas(df).repartition(4)
        got = (per_key_windows(ds, "k", fn, n_buckets=8)
               .to_pandas().sort_values("ord").reset_index(drop=True))
        ref = df.sort_values(["k", "ord"], kind="stable")
        ref = ref.assign(cum=ref.groupby("k")["v"].cumsum())
        ref = ref.sort_values("ord").reset_index(drop=True)
        assert got["cum"].tolist() == ref["cum"].tolist()
