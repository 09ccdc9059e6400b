"""Pure-NumPy geometry kernels (no Ray imports) — SURVEY.md §2 / §7.0.

Implements, from scratch (no shapely/h3/s2/scipy in the environment, and the
north rule demands from-scratch anyway):

* equirectangular lat/lon → local-meter projection              (M4)
* 64-bit Morton/Z-order hierarchical cell ids + neighbors       (S1 math)
* TRACLUS 3-component segment distance, pairwise-vectorized     (C1; TRACLUS §4.3.1)
* MDL approximate trajectory partitioning                       (M6; TRACLUS §4.2 Fig 6)
* deterministic DBSCAN over segments                            (C2; TRACLUS §4.3 Fig 7)
* sweep-line representative trajectory                          (C5; TRACLUS §5.2 Fig 8)
* polyline buffering → corridor ring                            (C6)
* ray-casting point-in-polygon                                  (S3 math)
* STR (Sort-Tile-Recursive) bulk-loaded R-tree                  (S2 math)
* segment-Hausdorff distance                                    (J4 math)

Determinism contract (SURVEY.md §4.5): every function here is a pure function
of its float64 inputs with a fixed operand order — no RNG, no wall clock, no
parallel-reduction order dependence.  The distributed engine and the
single-node oracle both call these kernels, so they agree exactly.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Projection (M4)
# ---------------------------------------------------------------------------

def project_xy(lat, lon, lat0: float, lon0: float, radius: float = 6_371_000.0):
    """Equirectangular projection about anchor (lat0, lon0) → meters.

    x = R·(λ−λ0)·cos φ0,  y = R·(φ−φ0).  Graft-normative formula (SURVEY §2.2
    M4); the reference projected geographic coords to a local planar frame.
    """
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    k = np.pi / 180.0
    x = radius * (lon - lon0) * k * np.cos(lat0 * k)
    y = radius * (lat - lat0) * k
    return x, y


def unproject_xy(x, y, lat0: float, lon0: float, radius: float = 6_371_000.0):
    """Inverse of :func:`project_xy` (used by the synthetic-pages generator)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    k = np.pi / 180.0
    lat = lat0 + y / (radius * k)
    lon = lon0 + x / (radius * k * np.cos(lat0 * k))
    return lat, lon


# ---------------------------------------------------------------------------
# Hierarchical Morton cells (S1 math) — H3/S2-style 64-bit ids from scratch
# ---------------------------------------------------------------------------

_CELL_OFFSET = float(1 << 25)  # shift world coords positive (±33,554 km in m)


def _part1by1(n: np.ndarray) -> np.ndarray:
    """Spread the low 26 bits of ``n`` so there is a zero bit between each."""
    n = n.astype(np.uint64) & np.uint64(0x3FFFFFF)
    n = (n | (n << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    n = (n | (n << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    n = (n | (n << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    n = (n | (n << np.uint64(2))) & np.uint64(0x3333333333333333)
    n = (n | (n << np.uint64(1))) & np.uint64(0x5555555555555555)
    return n


def _unpart1by1(n: np.ndarray) -> np.ndarray:
    n = n.astype(np.uint64) & np.uint64(0x5555555555555555)
    n = (n | (n >> np.uint64(1))) & np.uint64(0x3333333333333333)
    n = (n | (n >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    n = (n | (n >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    n = (n | (n >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    n = (n | (n >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return n


def cell_ij(x, y, size: float):
    """Integer grid coordinates of (x, y) at resolution ``size`` meters.

    Supported resolutions are ≥ 1 m: the 26-bit index space covers the full
    ±2^25 m world at size 1; finer grids would overflow the Morton key at the
    world boundary (found by the hypothesis round-trip property)."""
    assert size >= 1.0, f"cell size {size} < 1 m overflows the 26-bit grid"
    i = np.floor((np.asarray(x, dtype=np.float64) + _CELL_OFFSET) / size).astype(np.int64)
    j = np.floor((np.asarray(y, dtype=np.float64) + _CELL_OFFSET) / size).astype(np.int64)
    return i, j


def cell_id(x, y, size: float) -> np.ndarray:
    """64-bit Morton/Z-order cell id of (x, y) at resolution ``size``.

    Interleaved 26+26 bits → 52-bit key, returned as int64 (non-negative).
    Parent/child/neighbor relations are pure bit arithmetic — the engine's
    replacement for the H3/S2 libraries absent from the environment.
    """
    i, j = cell_ij(x, y, size)
    m = _part1by1(i.astype(np.uint64)) | (_part1by1(j.astype(np.uint64)) << np.uint64(1))
    return m.astype(np.int64)


def cell_decode(cell, size: float):
    """Morton id → (i, j) grid coords and (x0, y0) of the cell's lower corner."""
    c = np.asarray(cell).astype(np.uint64)
    i = _unpart1by1(c).astype(np.int64)
    j = _unpart1by1(c >> np.uint64(1)).astype(np.int64)
    x0 = i.astype(np.float64) * size - _CELL_OFFSET
    y0 = j.astype(np.float64) * size - _CELL_OFFSET
    return i, j, x0, y0


def cell_from_ij(i, j) -> np.ndarray:
    m = _part1by1(np.asarray(i).astype(np.uint64)) | (
        _part1by1(np.asarray(j).astype(np.uint64)) << np.uint64(1)
    )
    return m.astype(np.int64)


def cells_within(x, y, radius: float, size: float):
    """All cell ids whose closed square intersects the disc of ``radius``
    around each (x, y).  Returns (row_index, cell_id) arrays — the halo
    replication primitive (SURVEY §4.4).  Vectorized over a bounded ring:
    radius is assumed << a few cells (asserted)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    r_cells = int(np.ceil(radius / size))
    assert r_cells <= 4, f"halo of {r_cells} cells — coarse_cell too small vs halo"
    i0, j0 = cell_ij(x, y, size)
    rows, cells = [], []
    for di in range(-r_cells, r_cells + 1):
        for dj in range(-r_cells, r_cells + 1):
            i = i0 + di
            j = j0 + dj
            # distance from (x,y) to cell square [i*s, (i+1)*s] × [j*s, (j+1)s]
            cx0 = i.astype(np.float64) * size - _CELL_OFFSET
            cy0 = j.astype(np.float64) * size - _CELL_OFFSET
            dx = np.maximum(np.maximum(cx0 - x, x - (cx0 + size)), 0.0)
            dy = np.maximum(np.maximum(cy0 - y, y - (cy0 + size)), 0.0)
            keep = dx * dx + dy * dy <= radius * radius
            idx = np.nonzero(keep)[0]
            rows.append(idx)
            cells.append(cell_from_ij(i[idx], j[idx]))
    return np.concatenate(rows), np.concatenate(cells)


def dist_to_cell(x, y, cell, size: float):
    """Euclidean distance from points to the closed cell square (0 inside)."""
    _, _, cx0, cy0 = cell_decode(cell, size)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    dx = np.maximum(np.maximum(cx0 - x, x - (cx0 + size)), 0.0)
    dy = np.maximum(np.maximum(cy0 - y, y - (cy0 + size)), 0.0)
    return np.sqrt(dx * dx + dy * dy)


# ---------------------------------------------------------------------------
# TRACLUS segment distance (C1) — TRACLUS §4.3.1
# ---------------------------------------------------------------------------

def _components(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2):
    """Distance components with segment A as the base (longer) segment.

    Broadcasts: pass A columns shaped (n,1) and B columns shaped (1,m) for a
    full pairwise block.  Returns (d_perp, d_par, d_ang) per TRACLUS §4.3.1:

      d⊥ = (l⊥1² + l⊥2²) / (l⊥1 + l⊥2)          (0 when both are 0)
      d∥ = min(l∥1, l∥2),  l∥1/l∥2 measured from A's start/end to the nearer
           projection of B's endpoints onto line(A)
      dθ = ‖B‖·sin θ for 0 ≤ θ < 90°, else ‖B‖
    """
    adx = ax2 - ax1
    ady = ay2 - ay1
    alen2 = adx * adx + ady * ady
    alen = np.sqrt(alen2)
    safe = np.maximum(alen2, 1e-300)

    # projections of B endpoints onto line(A), as arclength u ∈ [0, alen]
    u1 = ((bx1 - ax1) * adx + (by1 - ay1) * ady) / safe * alen
    u2 = ((bx2 - ax1) * adx + (by2 - ay1) * ady) / safe * alen
    # perpendicular distances of B endpoints to line(A)
    lp1 = np.abs((bx1 - ax1) * ady - (by1 - ay1) * adx) / np.maximum(alen, 1e-300)
    lp2 = np.abs((bx2 - ax1) * ady - (by2 - ay1) * adx) / np.maximum(alen, 1e-300)
    denom = lp1 + lp2
    d_perp = np.where(denom > 0, (lp1 * lp1 + lp2 * lp2) / np.maximum(denom, 1e-300), 0.0)

    l_par1 = np.minimum(np.abs(u1), np.abs(u2))
    l_par2 = np.minimum(np.abs(alen - u1), np.abs(alen - u2))
    d_par = np.minimum(l_par1, l_par2)

    bdx = bx2 - bx1
    bdy = by2 - by1
    blen = np.sqrt(bdx * bdx + bdy * bdy)
    dot = adx * bdx + ady * bdy
    cross = np.abs(adx * bdy - ady * bdx)
    sin_t = cross / np.maximum(alen * blen, 1e-300)
    d_ang = np.where(dot >= 0, blen * np.clip(sin_t, 0.0, 1.0), blen)
    return d_perp, d_par, d_ang


def _distance_core(a, b, w):
    """TRACLUS distance from pre-broadcast column lists ``a``/``b`` (any
    mutually-broadcastable shapes, any float dtype).

    The longer segment of each pair is the base; exact length ties (common
    after split_long_segments) break on coordinate lexicographic order so
    d(A,B) == d(B,A) bit-for-bit in any array order."""
    alen = np.hypot(a[2] - a[0], a[3] - a[1])
    blen = np.hypot(b[2] - b[0], b[3] - b[1])
    tie = alen == blen
    gt = (a[0] > b[0]) | ((a[0] == b[0]) & ((a[1] > b[1]) | ((a[1] == b[1]) & (
        (a[2] > b[2]) | ((a[2] == b[2]) & (a[3] >= b[3]))))))
    a_base = (alen > blen) | (tie & gt)

    pa_, pr_, an_ = _components(a[0], a[1], a[2], a[3], b[0], b[1], b[2], b[3])
    pb_, rb_, ab_ = _components(b[0], b[1], b[2], b[3], a[0], a[1], a[2], a[3])
    d_perp = np.where(a_base, pa_, pb_)
    d_par = np.where(a_base, pr_, rb_)
    d_ang = np.where(a_base, an_, ab_)
    return w[0] * d_perp + w[1] * d_par + w[2] * d_ang


def seg_distance_block(A: np.ndarray, B: np.ndarray,
                       w=(1.0, 1.0, 1.0)) -> np.ndarray:
    """Pairwise TRACLUS distance matrix (n, m) between segment arrays
    ``A`` (n,4) and ``B`` (m,4) of (x1, y1, x2, y2).  Fully vectorized;
    caller chunks rows to bound memory."""
    A = np.asarray(A, dtype=np.float64)
    B = np.asarray(B, dtype=np.float64)
    a = [A[:, k][:, None] for k in range(4)]
    b = [B[:, k][None, :] for k in range(4)]
    return _distance_core(a, b, w)


def seg_distance_pairwise(A: np.ndarray, B: np.ndarray,
                          w=(1.0, 1.0, 1.0)) -> np.ndarray:
    """Elementwise TRACLUS distance for matched pair lists (k,4)·(k,4)→(k,)."""
    A = np.asarray(A, dtype=np.float64)
    B = np.asarray(B, dtype=np.float64)
    a = [A[:, k] for k in range(4)]
    b = [B[:, k] for k in range(4)]
    return _distance_core(a, b, w)


def close_pair_mask(A: np.ndarray, B: np.ndarray, eps: float,
                    w=(1.0, 1.0, 1.0)) -> np.ndarray:
    """Boolean (n, m) mask of pairs with exact f64 TRACLUS distance ≤ ε.

    Two-stage: a float32 block prefilter (half the memory traffic of the f64
    block — these kernels are DRAM-bound at high core counts) keeps pairs
    within ε + margin, then the exact float64 distance is evaluated only on
    the surviving pairs, so the ≤ ε decision is bit-identical to the pure-f64
    path (and to the oracle).  The margin is DERIVED FROM THE DATA: after the
    centroid shift the worst-case f32 rounding of these kernels scales with
    the largest shifted coordinate magnitude (round-1 review: a fixed margin
    silently dropped true ε-pairs beyond ~10^6 m from the A-centroid);
    maxabs·2^-18 + ε·10^-3 + 0.05 bounds it with ~30× headroom over the
    ~maxabs·2^-23·C accumulation error (validated by the 10^6-10^7 m offset
    property test in tests/test_kernels.py) — wider margins only send a few
    extra pairs to the exact pass."""
    A = np.asarray(A, dtype=np.float64)
    B = np.asarray(B, dtype=np.float64)
    # shift into a local frame before the f32 cast: raw projected coords are
    # ~1e7 m, where f32 cancellation would cost meters; locals are ~1e2 m
    cx = (A[:, 0].mean() + A[:, 2].mean()) * 0.5 if len(A) else 0.0
    cy = (A[:, 1].mean() + A[:, 3].mean()) * 0.5 if len(A) else 0.0
    shift = np.array([cx, cy, cx, cy])
    As = A - shift
    Bs = B - shift
    maxabs = max(float(np.abs(As).max()) if As.size else 0.0,
                 float(np.abs(Bs).max()) if Bs.size else 0.0)
    A32 = As.astype(np.float32)
    B32 = Bs.astype(np.float32)
    a32 = [A32[:, k][:, None] for k in range(4)]
    b32 = [B32[:, k][None, :] for k in range(4)]
    with np.errstate(invalid="ignore", divide="ignore"):
        d32 = _distance_core(a32, b32, w)
    # nan/inf from f32-degenerate inputs fall through to the exact pass
    margin = eps * 1e-3 + 0.05 + maxabs * 2.0 ** -18
    cand = ~(d32 > np.float32(eps + margin))
    ii, jj = np.nonzero(cand)
    out = np.zeros(d32.shape, dtype=bool)
    if len(ii):
        d = seg_distance_pairwise(A[ii], B[jj], w)
        keep = d <= eps
        out[ii[keep], jj[keep]] = True
    return out


def seg_midpoints(S: np.ndarray) -> np.ndarray:
    S = np.asarray(S, dtype=np.float64)
    return np.stack([(S[:, 0] + S[:, 2]) * 0.5, (S[:, 1] + S[:, 3]) * 0.5], axis=1)


# ---------------------------------------------------------------------------
# MDL trajectory partitioning (M6) — TRACLUS §4.2 Fig 6
# ---------------------------------------------------------------------------

def _log2c(v, clamp: float) -> np.ndarray:
    """log2 with the argument clamped to >= ``clamp`` (graft-normative; keeps
    MDL costs finite for zero distances — SURVEY §2.2 M6)."""
    return np.log2(np.maximum(v, clamp))


def mdl_partition(pts: np.ndarray, clamp: float = 1.0) -> np.ndarray:
    """Approximate MDL partitioning → indices of characteristic points.

    TRACLUS §4.2 Fig 6: walk the trajectory keeping the longest prefix while
    MDL_par ≤ MDL_nopar; on violation emit a characteristic point at the
    previous index.  Costs (TRACLUS eq. 8/9, per-step sum of logs):
    L(H) = log2 ‖p_i p_j‖ ;
    L(D|H) = Σ_k [ log2 d⊥(p_i p_j, p_k p_{k+1}) + log2 dθ(...) ],
    each log argument clamped to ≥ ``clamp`` so zero distances cost 0 bits
    (graft-normative — keeps costs finite and the walk deterministic).

    Pure function of the float64 point array; the inner distance sums are
    vectorized over the candidate window.
    """
    pts = np.asarray(pts, dtype=np.float64)
    n = len(pts)
    if n < 2:
        return np.arange(n)
    # Delegate to the batched kernel with a single trajectory so EVERY path
    # (oracle, CSV map_groups route, flagship batched parse) shares one
    # summation order — decisions are identical by construction.
    cps, _ = mdl_partition_many(pts, np.asarray([0, n], dtype=np.int64), clamp)
    return cps


def _csum0(counts: np.ndarray) -> np.ndarray:
    """Exclusive prefix sum → group start offsets for repeat/reduceat tricks."""
    out = np.empty(len(counts) + 1, dtype=np.int64)
    out[0] = 0
    np.cumsum(counts, out=out[1:])
    return out


def mdl_partition_many(pts: np.ndarray, offsets: np.ndarray,
                       clamp: float = 1.0):
    """Batched approximate MDL partitioning of MANY trajectories at once.

    ``pts`` is the concatenation of every trajectory's points; ``offsets``
    (T+1,) delimits trajectories.  Decisions are IDENTICAL per trajectory to
    :func:`mdl_partition` (asserted in tests): the algorithm runs in
    lockstep rounds — every active trajectory finds its next characteristic
    point per round — so each round is a handful of large vectorized ops
    over the concatenated candidate triangles instead of ~30 small numpy
    dispatches per trajectory restart (the round-5 flagship hot-kernel fix;
    per-trajectory dispatch overhead dominated the parse/MDL stage).

    Returns ``(cps_flat, cps_offsets)``: absolute indices into ``pts`` of
    each trajectory's characteristic points, concatenated per trajectory in
    walk order (``cps_offsets`` is (T+1,)).
    """
    pts = np.asarray(pts, dtype=np.float64)
    offsets = np.asarray(offsets, dtype=np.int64)
    T = len(offsets) - 1
    N = len(pts)
    if T == 0 or N == 0:
        return np.empty(0, dtype=np.int64), np.zeros(T + 1, dtype=np.int64)
    X = pts[:, 0]
    Y = pts[:, 1]
    # global step arrays; entries at trajectory boundaries exist but are
    # never referenced: step k is only used with s <= k <= c-1 <= end-2,
    # all inside one trajectory (points of a trajectory are contiguous)
    sdx = X[1:] - X[:-1]
    sdy = Y[1:] - Y[:-1]
    step_len = np.hypot(sdx, sdy)
    # no-partition cost prefix, accumulated FROM EACH TRAJECTORY'S START so
    # C[c] - C[s] is bit-identical to the single-trajectory cumsum (a global
    # running sum would round differently and flip borderline MDL decisions)
    step_cost = _log2c(step_len, clamp)
    C = np.zeros(N, dtype=np.float64)
    for t in range(T):
        a, b = offsets[t], offsets[t + 1]
        if b - a >= 2:
            np.cumsum(step_cost[a:b - 1], out=C[a + 1:b])
    start = offsets[:-1].copy()
    end = offsets[1:]
    n_pts = end - start
    emit_t: list = []
    emit_cp: list = []
    # every non-empty trajectory emits its first point (mdl_partition's
    # cps[0] = 0; for n == 1 it returns arange(1) = [0])
    ne = np.nonzero(n_pts >= 1)[0]
    emit_t.append(ne)
    emit_cp.append(start[ne])
    active = np.nonzero(n_pts >= 2)[0]
    BIG = np.iinfo(np.int64).max
    while len(active):
        s = start[active]
        e = end[active]
        m = e - 1 - s  # candidates c = s+1 .. e-1
        # m == 1: the single candidate c = s+1 can never split → terminal
        term = m == 1
        if term.any():
            emit_t.append(active[term])
            emit_cp.append(e[term] - 1)
            active = active[~term]
            s = s[~term]
            e = e[~term]
            m = m[~term]
        if not len(active):
            break
        # Cap the round's flat entry-triangle size by splitting the ACTIVE
        # TRAJECTORY SET into chunks (per-trajectory math is independent, so
        # decisions are unchanged): bounds peak allocation to ~16 MB/array
        # instead of O(total candidates) — the unchunked version's ~300 MB
        # first-touch page-fault warmup showed up as a constant ~2.5 s per
        # worker in the flagship wall (round-5 scaling work).
        est_entries = ((m - 1) * m // 2).cumsum()
        if est_entries[-1] > 2_000_000 and len(active) > 1:
            cut = int(np.searchsorted(est_entries, 2_000_000) + 1)
            defer = active[cut:]
            active = active[:cut]
            s = s[:cut]
            e = e[:cut]
            m = m[:cut]
        else:
            defer = None
        cc = m - 1                       # candidates i = 1 .. m-1 per traj
        coff = _csum0(cc)
        tot_c = int(coff[-1])
        cand_t = np.repeat(np.arange(len(active)), cc)
        cand_i = np.arange(tot_c, dtype=np.int64) - coff[cand_t] + 1
        s_c = s[cand_t]
        c_abs = s_c + 1 + cand_i
        adx = X[c_abs] - X[s_c]
        ady = Y[c_abs] - Y[s_c]
        alen = np.hypot(adx, ady)
        inv = 1.0 / np.maximum(alen, 1e-300)
        # entry triangle: candidate i has steps k = 0 .. i (i+1 entries)
        ce = cand_i + 1
        eoff = _csum0(ce)
        tot_e = int(eoff[-1])
        ent_c = np.repeat(np.arange(tot_c, dtype=np.int64), ce)
        k_abs = (np.arange(tot_e, dtype=np.int64) - eoff[ent_c]) + s_c[ent_c]
        adx_e = adx[ent_c]
        ady_e = ady[ent_c]
        sx = sdx[k_abs]
        sy = sdy[k_abs]
        sl = step_len[k_abs]
        x_se = X[s_c[ent_c]]
        y_se = Y[s_c[ent_c]]
        p0x = X[k_abs] - x_se
        p0y = Y[k_abs] - y_se
        p1x = p0x + sx
        p1y = p0y + sy
        inv_e = inv[ent_c]
        l1 = np.abs(p0x * ady_e - p0y * adx_e) * inv_e
        l2 = np.abs(p1x * ady_e - p1y * adx_e) * inv_e
        denom = l1 + l2
        d_perp = np.where(denom > 0,
                          (l1 * l1 + l2 * l2) / np.maximum(denom, 1e-300), 0.0)
        dot = adx_e * sx + ady_e * sy
        cross = np.abs(adx_e * sy - ady_e * sx)
        sin_t = np.minimum(cross / np.maximum(alen[ent_c] * sl, 1e-300), 1.0)
        d_ang = np.where(dot >= 0, sl * sin_t, sl)
        degen = alen < 1e-12
        if degen.any():
            dg = np.nonzero(degen[ent_c])[0]
            dp0 = np.hypot(p0x[dg], p0y[dg])
            dp1 = np.hypot(p1x[dg], p1y[dg])
            dden = dp0 + dp1
            d_perp[dg] = np.where(
                dden > 0, (dp0 * dp0 + dp1 * dp1) / np.maximum(dden, 1e-300),
                0.0)
            d_ang[dg] = sl[dg]
        terms = _log2c(d_perp, clamp) + _log2c(d_ang, clamp)
        cost_par = _log2c(alen, clamp) + np.add.reduceat(terms, eoff[:-1])
        cost_nopar = C[c_abs] - C[s_c]
        viol = cost_par > cost_nopar
        v = np.where(viol, cand_i, BIG)
        first = np.minimum.reduceat(v, coff[:-1])
        hit = first < BIG
        if hit.any():
            cp = s[hit] + first[hit]
            emit_t.append(active[hit])
            emit_cp.append(cp)
            start[active[hit]] = cp
        nh = ~hit
        if nh.any():
            emit_t.append(active[nh])
            emit_cp.append(e[nh] - 1)
        active = active[hit]
        if defer is not None:
            active = np.concatenate([active, defer])
    et = np.concatenate(emit_t)
    ec = np.concatenate(emit_cp)
    order = np.lexsort((ec, et))
    cps_flat = ec[order]
    cps_offsets = _csum0(np.bincount(et, minlength=T).astype(np.int64))
    return cps_flat, cps_offsets


def split_long_segments(segs: np.ndarray, max_len: float):
    """Split segments longer than ``max_len`` into equal parts (M6 post-rule).

    Bounds every segment's length so the DBSCAN halo width is bounded
    (SURVEY §4.4).  Returns (new_segs (m,4), parent_index (m,), part_index).
    Deterministic: parts are exact linear subdivisions in order.
    """
    segs = np.asarray(segs, dtype=np.float64)
    L = np.hypot(segs[:, 2] - segs[:, 0], segs[:, 3] - segs[:, 1])
    n_parts = np.maximum(np.ceil(L / max_len).astype(np.int64), 1)
    total = int(n_parts.sum())
    parent = np.repeat(np.arange(len(segs)), n_parts)
    # fractional position of each part within its parent
    cum = np.concatenate([[0], np.cumsum(n_parts)])
    part = np.arange(total) - cum[parent]
    f0 = part / n_parts[parent]
    f1 = (part + 1) / n_parts[parent]
    p = segs[parent]
    out = np.empty((total, 4), dtype=np.float64)
    out[:, 0] = p[:, 0] + (p[:, 2] - p[:, 0]) * f0
    out[:, 1] = p[:, 1] + (p[:, 3] - p[:, 1]) * f0
    out[:, 2] = p[:, 0] + (p[:, 2] - p[:, 0]) * f1
    out[:, 3] = p[:, 1] + (p[:, 3] - p[:, 1]) * f1
    return out, parent, part.astype(np.int64)


# ---------------------------------------------------------------------------
# Deterministic DBSCAN over segments (C2) — TRACLUS §4.3 Fig 7
# ---------------------------------------------------------------------------

class UnionFind:
    """Tiny array union-find (C3 merge; SURVEY §2.4)."""

    def __init__(self):
        self.parent: dict = {}

    def find(self, a):
        p = self.parent
        root = a
        while p.get(root, root) != root:
            root = p[root]
        while p.get(a, a) != a:
            p[a], a = root, p[a]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller id wins as root
            if rb < ra:
                ra, rb = rb, ra
            self.parent[rb] = ra


def core_flags(segs: np.ndarray, eps: float, min_lns: int,
               w=(1.0, 1.0, 1.0), query_idx=None, chunk: int = 128):
    """ε-neighborhood counts (including self) → core flags for the segments at
    ``query_idx`` (default all), computed against the whole array.  Chunked
    dense distance evaluation."""
    n = len(segs)
    if query_idx is None:
        query_idx = np.arange(n)
    counts = np.zeros(len(query_idx), dtype=np.int64)
    for s in range(0, len(query_idx), chunk):
        q = query_idx[s:s + chunk]
        counts[s:s + len(q)] = close_pair_mask(segs[q], segs, eps, w).sum(axis=1)
    return counts >= min_lns, counts


def dbscan_segments(segs: np.ndarray, seg_ids: np.ndarray, traj_ids: np.ndarray,
                    eps: float, min_lns: int, w=(1.0, 1.0, 1.0),
                    chunk: int = 128) -> np.ndarray:
    """Deterministic DBSCAN over one in-memory segment set.

    Variant semantics (graft-normative, SURVEY §4.5/§7.4 — classic DBSCAN's
    border assignment is visit-order-dependent, which cannot survive
    distribution):

      1. core ⇔ |Nε(L)| ≥ MinLns (self included)        [TRACLUS Fig 7 l.2]
      2. clusters = connected components of the core-core ε-graph
      3. border (non-core with ≥1 core ε-neighbor) joins the component whose
         canonical id is smallest; canonical component id = min core seg_id
      4. final cluster_id = min seg_id over ALL members (cores + borders)
      5. clusters with |{traj_id}| < MinLns dropped      [TRACLUS Defn 5]

    Returns cluster label per segment (canonical seg_id) or -1 for noise.
    This is the golden single-node semantics the distributed engine must match.
    """
    n = len(segs)
    labels = np.full(n, -1, dtype=np.int64)
    if n == 0:
        return labels
    is_core = np.zeros(n, dtype=bool)
    uf = UnionFind()
    # pass 1: core flags (f32-prefiltered masks — decisions are exact f64)
    for s in range(0, n, chunk):
        close = close_pair_mask(segs[s:s + chunk], segs, eps, w)
        is_core[s:s + chunk] = close.sum(axis=1) >= min_lns
    core_idx = np.nonzero(is_core)[0]
    # pass 2: core-core edges
    for s in range(0, len(core_idx), chunk):
        q = core_idx[s:s + chunk]
        close = close_pair_mask(segs[q], segs[core_idx], eps, w)
        rows, cols = np.nonzero(close)
        for r, c in zip(q[rows], core_idx[cols]):
            if r != c:
                uf.union(int(seg_ids[r]), int(seg_ids[c]))
    comp = {int(seg_ids[i]): uf.find(int(seg_ids[i])) for i in core_idx}
    for i in core_idx:
        labels[i] = comp[int(seg_ids[i])]
    # pass 3: border attachment (min canonical component id)
    non_core = np.nonzero(~is_core)[0]
    for s in range(0, len(non_core), chunk):
        q = non_core[s:s + chunk]
        if len(core_idx) == 0:
            break
        close = close_pair_mask(segs[q], segs[core_idx], eps, w)
        for k, i in enumerate(q):
            nbr = np.nonzero(close[k])[0]
            if len(nbr):
                labels[i] = min(comp[int(seg_ids[core_idx[j]])] for j in nbr)
    # pass 4: canonicalize to min member seg_id, then cardinality filter
    labels = canonicalize_labels(labels, seg_ids)
    labels = cardinality_filter(labels, traj_ids, min_lns)
    return labels


def canonicalize_labels(labels: np.ndarray, seg_ids: np.ndarray) -> np.ndarray:
    """Relabel every cluster to min(seg_id) over its members (SURVEY §4.5)."""
    out = labels.copy()
    mask = labels >= 0
    if mask.any():
        import pandas as pd  # local import keeps geom numpy-only at module load

        m = pd.Series(seg_ids[mask]).groupby(labels[mask]).min()
        out[mask] = m.reindex(labels[mask]).to_numpy()
    return out


def cardinality_filter(labels: np.ndarray, traj_ids: np.ndarray,
                       min_lns: int) -> np.ndarray:
    """Drop clusters whose distinct-trajectory count < MinLns (C4;
    TRACLUS Defn 5)."""
    out = labels.copy()
    mask = labels >= 0
    if mask.any():
        import pandas as pd

        nt = pd.Series(traj_ids[mask]).groupby(labels[mask]).nunique()
        bad = set(nt[nt < min_lns].index)
        if bad:
            out[mask & np.isin(labels, list(bad))] = -1
    return out


# ---------------------------------------------------------------------------
# Representative trajectory (C5) — TRACLUS §5.2 Fig 8
# ---------------------------------------------------------------------------

def representative(segs: np.ndarray, seg_ids: np.ndarray, min_lns: int,
                   gamma: float) -> np.ndarray:
    """Sweep-line representative polyline of one cluster → (k, 2) array.

    Average direction V = Σ ±vec(L_i), each segment flipped to agree with the
    direction of the member with the smallest seg_id (deterministic anchor —
    the paper's 'average direction vector' leaves the sign convention open).
    Rotate so V ∥ x-axis, sort endpoints by x′ (ties by seg_id then endpoint
    order), sweep: where ≥ MinLns segments intersect the vertical line and the
    x′-gap from the previous emitted point ≥ γ, emit the mean intersection y′.
    """
    segs = np.asarray(segs, dtype=np.float64)
    if len(segs) == 0:
        return np.empty((0, 2))
    # sort members by seg_id so every float reduction below has a fixed
    # operand order regardless of shuffle/block order (SURVEY §4.5)
    order = np.argsort(np.asarray(seg_ids), kind="stable")
    segs = segs[order]
    seg_ids = np.asarray(seg_ids)[order]
    anchor = segs[int(np.argmin(seg_ids))]
    adir = np.array([anchor[2] - anchor[0], anchor[3] - anchor[1]])
    vecs = np.stack([segs[:, 2] - segs[:, 0], segs[:, 3] - segs[:, 1]], axis=1)
    flip = (vecs @ adir) < 0
    vecs[flip] *= -1.0
    V = vecs.sum(axis=0)
    norm = np.hypot(V[0], V[1])
    if norm < 1e-12:
        V = adir / max(np.hypot(*adir), 1e-12)
    else:
        V = V / norm
    c, s = V[0], V[1]
    # rotate into the sweep frame
    xs1 = segs[:, 0] * c + segs[:, 1] * s
    ys1 = -segs[:, 0] * s + segs[:, 1] * c
    xs2 = segs[:, 2] * c + segs[:, 3] * s
    ys2 = -segs[:, 2] * s + segs[:, 3] * c
    lo = np.minimum(xs1, xs2)
    hi = np.maximum(xs1, xs2)
    # sweep events: all endpoints ordered by (x', seg_id, which-end)
    ev_x = np.concatenate([xs1, xs2])
    ev_sid = np.concatenate([seg_ids, seg_ids])
    ev_end = np.concatenate([np.zeros(len(segs)), np.ones(len(segs))])
    order = np.lexsort((ev_end, ev_sid, ev_x))
    pts = []
    prev_x = -np.inf
    for e in order:
        v = ev_x[e]
        inside = (lo <= v) & (v <= hi)
        if int(inside.sum()) < min_lns:
            continue
        if v - prev_x < gamma:
            continue
        dx = hi[inside] - lo[inside]
        y_at = np.where(
            dx > 1e-12,
            ys1[inside] + (v - xs1[inside]) / np.where(
                np.abs(xs2[inside] - xs1[inside]) > 1e-12,
                xs2[inside] - xs1[inside], 1.0,
            ) * (ys2[inside] - ys1[inside]),
            (ys1[inside] + ys2[inside]) * 0.5,
        )
        y_mean = float(np.sum(y_at) / len(y_at))
        pts.append((v, y_mean))
        prev_x = v
    if not pts:
        return np.empty((0, 2))
    arr = np.asarray(pts)
    # un-rotate
    out = np.empty_like(arr)
    out[:, 0] = arr[:, 0] * c - arr[:, 1] * s
    out[:, 1] = arr[:, 0] * s + arr[:, 1] * c
    return out


# ---------------------------------------------------------------------------
# Polyline buffering → corridor ring (C6)
# ---------------------------------------------------------------------------

def buffer_polyline(line: np.ndarray, halfwidth: float,
                    miter_limit: float = 2.0) -> np.ndarray:
    """Offset a polyline both sides by ``halfwidth`` with mitered joins and
    flat caps → closed ring (k, 2), counter-clockwise-ish.

    From-scratch replacement for shapely ``.buffer`` (absent from the env);
    sharp turns are miter-limited, self-intersection on extreme turns is
    accepted and documented (SURVEY §7.4-3).  A single point becomes a square.
    """
    line = np.asarray(line, dtype=np.float64)
    if len(line) == 0:
        return np.empty((0, 2))
    if len(line) == 1:
        x, y = line[0]
        h = halfwidth
        return np.array([[x - h, y - h], [x + h, y - h], [x + h, y + h], [x - h, y + h]])
    d = np.diff(line, axis=0)
    seg_len = np.hypot(d[:, 0], d[:, 1])
    keep = seg_len > 1e-12
    if not keep.all():
        # drop zero-length steps deterministically
        idx = np.concatenate([[True], keep])
        line = line[idx]
        if len(line) == 1:
            return buffer_polyline(line, halfwidth, miter_limit)
        d = np.diff(line, axis=0)
        seg_len = np.hypot(d[:, 0], d[:, 1])
    u = d / seg_len[:, None]
    # edge normals (left side)
    en = np.stack([-u[:, 1], u[:, 0]], axis=1)
    # vertex normals = normalized average of adjacent edge normals, miter-scaled
    vn = np.empty_like(line)
    vn[0] = en[0]
    vn[-1] = en[-1]
    scale = np.ones(len(line))
    for k in range(1, len(line) - 1):
        m = en[k - 1] + en[k]
        mn = np.hypot(m[0], m[1])
        if mn < 1e-9:
            vn[k] = en[k]
        else:
            m = m / mn
            cos_half = float(m @ en[k])
            vn[k] = m
            scale[k] = min(1.0 / max(cos_half, 1e-6), miter_limit)
    left = line + vn * (halfwidth * scale)[:, None]
    right = line - vn * (halfwidth * scale)[:, None]
    return np.concatenate([left, right[::-1]], axis=0)


# ---------------------------------------------------------------------------
# Point-in-polygon (S3 math) — vectorized ray casting
# ---------------------------------------------------------------------------

def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Crossing-number point-in-polygon test, vectorized over points.

    Loops over ring edges (rings are small), vectorizes over points.  Edge /
    vertex grazing follows the standard half-open rule — deterministic for
    given float inputs.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    inside = np.zeros(px.shape, dtype=bool)
    n = len(ring)
    if n < 3:
        return inside
    x0, y0 = ring[-1]
    for k in range(n):
        x1, y1 = ring[k]
        crosses = ((y0 > py) != (y1 > py))
        with np.errstate(divide="ignore", invalid="ignore"):
            xi = x0 + (py - y0) * (x1 - x0) / np.where(y1 != y0, y1 - y0, 1.0)
        inside ^= crosses & (px < xi)
        x0, y0 = x1, y1
    return inside


# ---------------------------------------------------------------------------
# STR bulk-loaded R-tree (S2 math)
# ---------------------------------------------------------------------------

class STRtree:
    """Sort-Tile-Recursive bulk-loaded R-tree over bounding boxes.

    From-scratch (SURVEY §2.3 S2): sort by center-x into vertical tiles of
    √(n/cap) runs, sort each tile by center-y, pack leaves of ``cap`` entries,
    then build upward the same way.  Query = bbox descent.  Pure NumPy arrays
    per level; deterministic for fixed input order.
    """

    def __init__(self, boxes: np.ndarray, cap: int = 16):
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)  # x0,y0,x1,y1
        self.n = len(boxes)
        self.cap = cap
        # levels[0] = entry boxes in STR order (node k ↔ original leaf_ids[k]);
        # levels[L>=1] = (node_boxes, child_start, child_end) grouping level L-1
        self.levels: list = []
        if self.n == 0:
            return
        order = self._str_order(boxes, cap)
        self.leaf_ids = order
        self.levels.append((boxes[order], None, None))
        while len(self.levels[-1][0]) > 1:
            child = self.levels[-1][0]
            k = len(child)
            n_nodes = (k + cap - 1) // cap
            starts = np.arange(n_nodes) * cap
            ends = np.minimum(starts + cap, k)
            node_boxes = np.empty((n_nodes, 4))
            for t in range(n_nodes):
                blk = child[starts[t]:ends[t]]
                node_boxes[t] = [blk[:, 0].min(), blk[:, 1].min(),
                                 blk[:, 2].max(), blk[:, 3].max()]
            self.levels.append((node_boxes, starts, ends))

    @staticmethod
    def _str_order(boxes: np.ndarray, cap: int) -> np.ndarray:
        cx = (boxes[:, 0] + boxes[:, 2]) * 0.5
        cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
        n = len(boxes)
        n_leaves = int(np.ceil(n / cap))
        n_slices = int(np.ceil(np.sqrt(n_leaves)))
        by_x = np.argsort(cx, kind="stable")
        slice_size = int(np.ceil(n / n_slices))
        order = np.empty(n, dtype=np.int64)
        pos = 0
        for s in range(0, n, slice_size):
            sl = by_x[s:s + slice_size]
            order[pos:pos + len(sl)] = sl[np.argsort(cy[sl], kind="stable")]
            pos += len(sl)
        return order

    def query(self, qx0: float, qy0: float, qx1: float, qy1: float) -> np.ndarray:
        """Original indices of entries whose bbox intersects the query bbox."""
        if self.n == 0:
            return np.empty(0, dtype=np.int64)
        top = len(self.levels) - 1
        frontier = [(top, node) for node in range(len(self.levels[top][0]))]
        hits = []
        while frontier:
            lvl, node = frontier.pop()
            boxes, starts, ends = self.levels[lvl]
            b = boxes[node]
            if b[0] > qx1 or b[2] < qx0 or b[1] > qy1 or b[3] < qy0:
                continue
            if lvl == 0:
                hits.append(node)
                continue
            for c in range(int(starts[node]), int(ends[node])):
                frontier.append((lvl - 1, c))
        if not hits:
            return np.empty(0, dtype=np.int64)
        return self.leaf_ids[np.asarray(sorted(hits), dtype=np.int64)]


# ---------------------------------------------------------------------------
# Segment-Hausdorff distance (J4 math)
# ---------------------------------------------------------------------------

def point_seg_dist(px, py, sx1, sy1, sx2, sy2):
    """Distance from points to segments, elementwise with broadcasting."""
    dx = sx2 - sx1
    dy = sy2 - sy1
    L2 = dx * dx + dy * dy
    t = np.clip(((px - sx1) * dx + (py - sy1) * dy) / np.maximum(L2, 1e-300), 0.0, 1.0)
    cx = sx1 + t * dx
    cy = sy1 + t * dy
    return np.hypot(px - cx, py - cy)


def hausdorff_block(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Symmetric endpoint-Hausdorff segment distance matrix (n, m):
    max over each segment's endpoints of distance to the other segment,
    symmetrized (graft-normative exact formula, SURVEY §2.5 J4)."""
    A = np.asarray(A, dtype=np.float64)
    B = np.asarray(B, dtype=np.float64)
    a = [A[:, k][:, None] for k in range(4)]
    b = [B[:, k][None, :] for k in range(4)]
    hA = np.maximum(
        point_seg_dist(a[0], a[1], b[0], b[1], b[2], b[3]),
        point_seg_dist(a[2], a[3], b[0], b[1], b[2], b[3]),
    )
    hB = np.maximum(
        point_seg_dist(b[0], b[1], a[0], a[1], a[2], a[3]),
        point_seg_dist(b[2], b[3], a[0], a[1], a[2], a[3]),
    )
    return np.maximum(hA, hB)


def stable_hash64(strings) -> np.ndarray:
    """Deterministic 63-bit id per string — seg_id/traj hash basis.

    Vectorized (round 5): ONE fixed-key ``hash_pandas_object`` pass replaces
    the per-string blake2b loop (shared by the oracle and every engine path,
    so ids stay identical across routes by construction).  Collision odds at
    test scale are negligible; at 10^12-row scale ids would widen to 128-bit
    (documented trade-off)."""
    import pandas as _pd

    s = _pd.Series(np.asarray(strings, dtype=object), dtype=object)
    h = _pd.util.hash_pandas_object(s, index=False,
                                    hash_key="imcray-seg-id-64").to_numpy()
    return (h.astype(np.uint64) >> np.uint64(1)).astype(np.int64)
