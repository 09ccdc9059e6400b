"""Property-based tests (hypothesis) for the geometry kernels, plus
empty-corpus robustness of the full pipeline."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from imc_ray import geom

coord = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
                  allow_infinity=False)


def seg_strategy():
    return st.tuples(coord, coord, coord, coord).map(
        lambda t: np.array(t, dtype=np.float64)
    )


class TestDistanceProperties:
    @settings(max_examples=200, deadline=None)
    @given(seg_strategy(), seg_strategy())
    def test_symmetry(self, a, b):
        A = a.reshape(1, 4)
        B = b.reshape(1, 4)
        assert geom.seg_distance_block(A, B)[0, 0] == \
            geom.seg_distance_block(B, A)[0, 0]

    @settings(max_examples=200, deadline=None)
    @given(seg_strategy())
    def test_self_distance_zero(self, a):
        A = a.reshape(1, 4)
        assert geom.seg_distance_block(A, A)[0, 0] == 0.0

    @settings(max_examples=200, deadline=None)
    @given(seg_strategy(), seg_strategy())
    def test_nonnegative_finite(self, a, b):
        d = geom.seg_distance_block(a.reshape(1, 4), b.reshape(1, 4))[0, 0]
        assert np.isfinite(d) and d >= 0.0

    @settings(max_examples=100, deadline=None)
    @given(seg_strategy(), seg_strategy(),
           st.floats(min_value=1.0, max_value=100.0))
    def test_prefilter_mask_equals_exact(self, a, b, eps):
        A = a.reshape(1, 4)
        B = np.vstack([b.reshape(1, 4), a.reshape(1, 4)])
        exact = geom.seg_distance_block(A, B) <= eps
        assert np.array_equal(exact, geom.close_pair_mask(A, B, eps))

    @settings(max_examples=60, deadline=None)
    @given(st.floats(min_value=1e6, max_value=1e7),
           st.floats(min_value=1e6, max_value=1e7),
           st.integers(min_value=0, max_value=2 ** 31 - 1),
           st.floats(min_value=5.0, max_value=50.0))
    def test_prefilter_exact_at_wide_offsets(self, ox, oy, seed, eps):
        """Round-1 review: the fixed f32 margin dropped true ε-pairs beyond
        ~10^6 m from the A-centroid.  The data-derived margin must keep the
        prefiltered mask equal to the pure-f64 mask for corpus extents up to
        10^7 m (whole-corpus oracle evaluation)."""
        rng = np.random.default_rng(seed)
        # two clusters far apart, each with near-ε geometry around (ox, oy)
        base = np.array([ox, oy])
        pts = rng.uniform(-30.0, 30.0, size=(12, 2)) + base
        far = rng.uniform(-30.0, 30.0, size=(6, 2)) - base
        mk = lambda p: np.column_stack(
            [p[:, 0], p[:, 1],
             p[:, 0] + rng.uniform(-40, 40, len(p)),
             p[:, 1] + rng.uniform(-40, 40, len(p))])
        A = mk(pts)
        B = np.vstack([mk(pts), mk(far)])
        exact = geom.seg_distance_block(A, B) <= eps
        assert np.array_equal(exact, geom.close_pair_mask(A, B, eps))


class TestCellProperties:
    @settings(max_examples=200, deadline=None)
    @given(coord, coord, st.floats(min_value=1.0, max_value=4096.0))
    def test_morton_roundtrip(self, x, y, size):
        c = geom.cell_id(np.array([x]), np.array([y]), size)
        i, j, x0, y0 = geom.cell_decode(c, size)
        # 1e-6 slack: quantization happens on (coord + 2^25), whose float64
        # ulp (~7e-9 m) can push exact-boundary coords into the adjacent
        # cell — deterministic and consistent across every call site
        assert x0[0] - 1e-6 <= x < x0[0] + size + 1e-6
        assert y0[0] - 1e-6 <= y < y0[0] + size + 1e-6

    @settings(max_examples=100, deadline=None)
    @given(coord, coord, st.floats(min_value=1.0, max_value=200.0))
    def test_cells_within_contains_home(self, x, y, radius):
        rows, cells = geom.cells_within(np.array([x]), np.array([y]),
                                        radius, 512.0)
        home = geom.cell_id(np.array([x]), np.array([y]), 512.0)[0]
        assert home in set(cells)


class TestMDLProperties:
    @settings(max_examples=100, deadline=None)
    @given(st.lists(st.tuples(coord, coord), min_size=2, max_size=40))
    def test_endpoints_always_characteristic(self, pts):
        arr = np.asarray(pts, dtype=np.float64)
        cps = geom.mdl_partition(arr)
        assert cps[0] == 0 and cps[-1] == len(arr) - 1
        assert np.all(np.diff(cps) >= 1)


def test_empty_corpus_pipeline(ray_session):
    """All-filtered corpus (no matching language) must flow through every
    stage and produce empty outputs, not crash."""
    from imc_ray import pipeline, stages
    from imc_ray.config import PipelineConfig

    cfg = PipelineConfig(langs=("zz",))
    res = pipeline.run(stages.synth_pages(30, seed=42), cfg)
    assert res["segments"].count() == 0
    assert len(res["labels"]) == 0
    assert len(res["representatives"]) == 0
    assert res["tile_cluster"].count() == 0
    assert len(pipeline.full_labels(res)) == 0


class TestCodecProperties:
    @settings(max_examples=60, deadline=None)
    @given(st.integers(1, 24), st.integers(1, 24), st.integers(0, 2**32 - 1))
    def test_bmp_roundtrip_any_shape(self, h, w, seed):
        from imc_ray.multimodal import decode_bmp, encode_bmp

        img = np.random.Generator(np.random.PCG64(seed)).integers(
            0, 256, (h, w, 3)).astype(np.uint8)
        np.testing.assert_array_equal(decode_bmp(encode_bmp(img)), img)

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.integers(-32768, 32767), min_size=0, max_size=500),
           st.sampled_from([8000, 16000, 44100]))
    def test_wav_roundtrip_any_samples(self, samples, rate):
        from imc_ray.multimodal import decode_wav, encode_wav

        s = np.asarray(samples, dtype=np.int16)
        r, got = decode_wav(encode_wav(s, rate))
        assert r == rate
        np.testing.assert_array_equal(got, s)

    @settings(max_examples=40, deadline=None)
    @given(st.integers(1, 40), st.integers(1, 40),
           st.integers(1, 30), st.integers(1, 30))
    def test_nearest_resize_shape_and_membership(self, h, w, oh, ow):
        from imc_ray.multimodal import nearest_resize

        img = np.arange(h * w * 3, dtype=np.uint8).reshape(h, w, 3)
        out = nearest_resize(img, ow, oh)
        assert out.shape == (oh, ow, 3)
        # every output pixel is SOME input pixel (no interpolation)
        flat_in = {tuple(p) for p in img.reshape(-1, 3)}
        assert all(tuple(p) in flat_in for p in out.reshape(-1, 3))


class TestDeconGramProperties:
    @settings(max_examples=50, deadline=None)
    @given(st.lists(st.sampled_from("abc"), min_size=8, max_size=20),
           st.lists(st.sampled_from("abc"), min_size=8, max_size=20))
    def test_gram_hash_sequence_sensitivity(self, t1, t2):
        """The order-dependent 8-token mixes must agree exactly when the
        token sequences agree and (for these tiny alphabets) differ when
        they differ — the decontamination key contract."""
        import pandas as pd
        import pyarrow as pa

        from imc_ray.textops import _DECON_C1

        def h(tokens):
            th = (pd.util.hash_pandas_object(
                pd.Series(list(tokens), dtype=object), index=False,
                hash_key="imcray-decon-tk1").to_numpy().astype(np.uint64))
            win = np.lib.stride_tricks.sliding_window_view(th, 8)
            return set((win @ _DECON_C1[:8]).tolist())

        if t1 == t2:
            assert h(t1) == h(t2)
        else:
            g1 = {" ".join(t1[i:i + 8]) for i in range(len(t1) - 7)}
            g2 = {" ".join(t2[i:i + 8]) for i in range(len(t2) - 7)}
            # shared STRING grams ⇒ shared hash keys (never a false negative)
            if g1 & g2:
                assert h(t1) & h(t2)
