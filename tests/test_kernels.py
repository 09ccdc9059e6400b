"""Unit tests for the pure-NumPy geometry kernels (SURVEY.md §5.2-1).

No Ray involvement — the fastest place to pin the math down exactly.
"""

import numpy as np
import pytest

from imc_ray import geom


# ---------------------------------------------------------------------------
# TRACLUS segment distance (C1)
# ---------------------------------------------------------------------------

class TestSegDistance:
    def test_identical_is_zero(self):
        A = np.array([[0.0, 0.0, 10.0, 0.0]])
        assert geom.seg_distance_block(A, A)[0, 0] == 0.0

    def test_parallel_offset(self):
        # B parallel to A, 5 m above, same x-extent: d⊥=5, d∥=0, dθ=0
        A = np.array([[0.0, 0.0, 10.0, 0.0]])
        B = np.array([[0.0, 5.0, 10.0, 5.0]])
        assert geom.seg_distance_block(A, B)[0, 0] == pytest.approx(5.0)

    def test_perpendicular(self):
        # B perpendicular, crossing A's midpoint: dθ = ‖B‖·sin90 = ‖B‖
        A = np.array([[0.0, 0.0, 10.0, 0.0]])
        B = np.array([[5.0, -2.0, 5.0, 2.0]])
        d = geom.seg_distance_block(A, B)[0, 0]
        # d⊥ = (4+4)/4 = 2, d∥ = min(5,5)=5, dθ = 4 → 11
        assert d == pytest.approx(2.0 + 5.0 + 4.0)

    def test_antiparallel_angular_full_length(self):
        # θ > 90° → dθ = ‖shorter‖
        A = np.array([[0.0, 0.0, 10.0, 0.0]])
        B = np.array([[10.0, 1.0, 2.0, 1.0]])  # reversed direction, len 8
        d_perp, d_par, d_ang = geom._components(
            np.array([0.0]), np.array([0.0]), np.array([10.0]), np.array([0.0]),
            np.array([10.0]), np.array([1.0]), np.array([2.0]), np.array([1.0]),
        )
        assert d_ang[0] == pytest.approx(8.0)
        assert d_perp[0] == pytest.approx(1.0)

    def test_symmetry_under_argument_swap(self):
        rng = np.random.default_rng(7)
        A = rng.normal(0, 20, (40, 4))
        B = rng.normal(0, 20, (30, 4))
        D1 = geom.seg_distance_block(A, B)
        D2 = geom.seg_distance_block(B, A)
        assert np.array_equal(D1, D2.T)  # bit-for-bit, incl. tie cases

    def test_equal_length_tie_symmetry(self):
        # split_long_segments produces exactly equal lengths — tie-break must
        # make d(A,B) == d(B,A) bit-for-bit
        A = np.array([[0.0, 0.0, 10.0, 0.0]])
        B = np.array([[3.0, 1.0, 13.0, 1.0]])
        assert geom.seg_distance_block(A, B)[0, 0] == geom.seg_distance_block(B, A)[0, 0]

    def test_zero_length_segment_guarded(self):
        A = np.array([[0.0, 0.0, 0.0, 0.0]])
        B = np.array([[1.0, 0.0, 2.0, 0.0]])
        d = geom.seg_distance_block(A, B)
        assert np.isfinite(d).all()


# ---------------------------------------------------------------------------
# Morton cells (S1)
# ---------------------------------------------------------------------------

class TestCells:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        x = rng.uniform(-1e6, 1e6, 1000)
        y = rng.uniform(-1e6, 1e6, 1000)
        for size in (5.0, 512.0):
            c = geom.cell_id(x, y, size)
            i, j, x0, y0 = geom.cell_decode(c, size)
            assert np.all((x0 <= x) & (x < x0 + size))
            assert np.all((y0 <= y) & (y < y0 + size))
            assert np.array_equal(geom.cell_from_ij(i, j), c)

    def test_cells_within_includes_home_and_neighbors(self):
        x = np.array([10.0])
        y = np.array([10.0])
        rows, cells = geom.cells_within(x, y, 15.0, 512.0)
        home = geom.cell_id(x, y, 512.0)[0]
        assert home in set(cells)  # always includes own cell
        # point near a corner picks up neighbor cells
        rows2, cells2 = geom.cells_within(np.array([511.0]), np.array([511.0]),
                                          5.0, 512.0)
        assert len(cells2) == 4

    def test_dist_to_cell(self):
        c = geom.cell_id(np.array([100.0]), np.array([100.0]), 512.0)
        assert geom.dist_to_cell(np.array([100.0]), np.array([100.0]), c, 512.0)[0] == 0.0
        d = geom.dist_to_cell(np.array([-10.0]), np.array([100.0]), c, 512.0)[0]
        assert d == pytest.approx(10.0)


# ---------------------------------------------------------------------------
# MDL partitioning (M6)
# ---------------------------------------------------------------------------

class TestMDL:
    def test_straight_line_one_segment(self):
        pts = np.column_stack([np.linspace(0, 100, 20), np.zeros(20)])
        assert list(geom.mdl_partition(pts)) == [0, 19]

    def test_right_angle_two_segments(self):
        pts = np.vstack([
            np.column_stack([np.linspace(0, 50, 10), np.zeros(10)]),
            np.column_stack([np.full(10, 50.0), np.linspace(5, 50, 10)]),
        ])
        cps = geom.mdl_partition(pts)
        assert len(cps) == 3 and cps[0] == 0 and cps[-1] == 19
        assert 8 <= cps[1] <= 11  # corner detected near index 9/10

    def test_short_trajectory(self):
        assert list(geom.mdl_partition(np.array([[0.0, 0.0], [1.0, 1.0]]))) == [0, 1]
        assert list(geom.mdl_partition(np.array([[0.0, 0.0]]))) == [0]

    def test_translation_invariance(self):
        rng = np.random.default_rng(3)
        pts = rng.normal(0, 10, (30, 2)).cumsum(axis=0)
        a = geom.mdl_partition(pts)
        b = geom.mdl_partition(pts + np.array([1000.0, -500.0]))
        assert np.allclose(a, b)

    def test_split_long_segments(self):
        segs = np.array([[0.0, 0.0, 120.0, 0.0], [0.0, 0.0, 10.0, 0.0]])
        out, parent, part = geom.split_long_segments(segs, 50.0)
        assert len(out) == 4  # 120 → 3 parts, 10 → 1 part
        assert np.hypot(out[:, 2] - out[:, 0], out[:, 3] - out[:, 1]).max() <= 50.0
        assert list(parent) == [0, 0, 0, 1]
        # parts tile the parent exactly
        assert out[0, 0] == 0.0 and out[2, 2] == 120.0
        assert out[0, 2] == out[1, 0]


# ---------------------------------------------------------------------------
# DBSCAN (C2) + halo bound
# ---------------------------------------------------------------------------

class TestDBSCAN:
    def _corridor(self, rng, y, n):
        # n roughly-parallel unit segments along y
        x0 = rng.uniform(0, 100, n)
        return np.column_stack([x0, np.full(n, y) + rng.normal(0, 1, n),
                                x0 + 8, np.full(n, y) + rng.normal(0, 1, n)])

    def test_two_corridors_separate(self):
        rng = np.random.default_rng(1)
        a = self._corridor(rng, 0.0, 20)
        b = self._corridor(rng, 500.0, 20)
        segs = np.vstack([a, b])
        ids = np.arange(len(segs)) + 100
        trajs = np.array([f"t{i % 7}" for i in range(len(segs))], dtype=object)
        labels = geom.dbscan_segments(segs, ids, trajs, eps=25.0, min_lns=3)
        la = set(labels[:20])
        lb = set(labels[20:])
        assert len(la) == 1 and len(lb) == 1 and la != lb
        assert -1 not in la | lb

    def test_cardinality_filter(self):
        rng = np.random.default_rng(2)
        segs = self._corridor(rng, 0.0, 10)
        ids = np.arange(10)
        trajs = np.array(["only_one"] * 10, dtype=object)  # 1 distinct traj < MinLns
        labels = geom.dbscan_segments(segs, ids, trajs, eps=25.0, min_lns=3)
        assert set(labels) == {-1}

    def test_canonical_label_is_min_member(self):
        rng = np.random.default_rng(4)
        segs = self._corridor(rng, 0.0, 15)
        ids = rng.permutation(np.arange(1000, 1015))
        trajs = np.array([f"t{i % 5}" for i in range(15)], dtype=object)
        labels = geom.dbscan_segments(segs, ids, trajs, eps=25.0, min_lns=3)
        assert set(labels) == {ids[labels >= 0].min()} or -1 in set(labels)

    def test_halo_bound_empirical(self):
        """Validate the SURVEY §4.4 bound: TRACLUS-distance ≤ ε ⇒ midpoint
        distance ≤ halo_margin·ε + len_sum/2 with margin 2.5."""
        rng = np.random.default_rng(5)
        n = 4000
        A = rng.uniform(-50, 50, (n, 4))
        B = A + rng.uniform(-60, 60, (n, 4))
        d = np.array([geom.seg_distance_block(A[k:k + 1], B[k:k + 1])[0, 0]
                      for k in range(n)])
        mids_a = geom.seg_midpoints(A)
        mids_b = geom.seg_midpoints(B)
        mid_d = np.hypot(*(mids_a - mids_b).T)
        len_a = np.hypot(A[:, 2] - A[:, 0], A[:, 3] - A[:, 1])
        len_b = np.hypot(B[:, 2] - B[:, 0], B[:, 3] - B[:, 1])
        eps = 25.0
        close = d <= eps
        bound = 2.5 * eps + (len_a + len_b) / 2.0
        assert np.all(mid_d[close] <= bound[close])


# ---------------------------------------------------------------------------
# Representative (C5), buffering (C6), PIP (S3), STRtree (S2)
# ---------------------------------------------------------------------------

class TestMapProducts:
    def test_representative_straight_corridor(self):
        # 10 horizontal segments stacked in y → rep ≈ horizontal line at mean y
        segs = np.array([[0.0, float(k), 40.0, float(k)] for k in range(10)])
        ids = np.arange(10)
        rep = geom.representative(segs, ids, min_lns=3, gamma=5.0)
        assert len(rep) >= 2
        assert np.all(np.abs(rep[:, 1] - 4.5) < 1.0)
        assert rep[0, 0] < rep[-1, 0]

    def test_representative_order_invariance(self):
        rng = np.random.default_rng(6)
        segs = rng.normal(0, 5, (20, 4)) + np.array([0, 0, 10, 0])
        ids = np.arange(20) + 50
        r1 = geom.representative(segs, ids, 3, 5.0)
        perm = rng.permutation(20)
        r2 = geom.representative(segs[perm], ids[perm], 3, 5.0)
        assert np.array_equal(r1, r2)  # bit-for-bit under member reordering

    def test_buffer_rectangle(self):
        line = np.array([[0.0, 0.0], [10.0, 0.0]])
        ring = geom.buffer_polyline(line, 2.0)
        assert len(ring) == 4
        assert geom.points_in_ring(np.array([5.0]), np.array([0.0]), ring)[0]
        assert not geom.points_in_ring(np.array([5.0]), np.array([3.0]), ring)[0]

    def test_pip_edge_cases(self):
        ring = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
        px = np.array([5.0, 15.0, -1.0, 5.0])
        py = np.array([5.0, 5.0, 5.0, 20.0])
        assert list(geom.points_in_ring(px, py, ring)) == [True, False, False, False]

    def test_strtree_vs_bruteforce(self):
        rng = np.random.default_rng(8)
        lo = rng.uniform(0, 100, (200, 2))
        boxes = np.hstack([lo, lo + rng.uniform(1, 10, (200, 2))])
        tree = geom.STRtree(boxes)
        for _ in range(50):
            q = rng.uniform(0, 110, 2)
            qbox = (q[0], q[1], q[0] + 8, q[1] + 8)
            brute = set(np.nonzero(
                ~((boxes[:, 0] > qbox[2]) | (boxes[:, 2] < qbox[0]) |
                  (boxes[:, 1] > qbox[3]) | (boxes[:, 3] < qbox[1]))
            )[0])
            assert set(tree.query(*qbox)) == brute

    def test_strtree_empty(self):
        tree = geom.STRtree(np.empty((0, 4)))
        assert len(tree.query(0, 0, 1, 1)) == 0

    def test_hausdorff(self):
        A = np.array([[0.0, 0.0, 10.0, 0.0]])
        B = np.array([[0.0, 3.0, 10.0, 3.0]])
        assert geom.hausdorff_block(A, B)[0, 0] == pytest.approx(3.0)
        assert geom.hausdorff_block(A, A)[0, 0] == 0.0


class TestProjection:
    def test_roundtrip(self):
        rng = np.random.default_rng(9)
        lat = 37.0 + rng.uniform(0, 1, 100)
        lon = -122.0 + rng.uniform(0, 1, 100)
        x, y = geom.project_xy(lat, lon, 37.0, -122.0)
        lat2, lon2 = geom.unproject_xy(x, y, 37.0, -122.0)
        assert np.allclose(lat, lat2) and np.allclose(lon, lon2)

    def test_meters_scale(self):
        # 0.001° latitude ≈ 111.2 m
        _, y = geom.project_xy(37.001, -122.0, 37.0, -122.0)
        assert abs(float(y) - 111.19) < 0.2
