"""Distributed connected components over an edge Dataset (SURVEY §2.4 C3
generalized) — the shared machinery for near-dup group assembly
(minhash/embedding) so no union-find ever runs on the driver.

Same join+groupby-min label-propagation scheme as
:func:`imc_ray.stages.merge_labels_distributed` (which keeps its
pipeline-specific border/cardinality logic): labels decrease monotonically
each round, so a stable exact global sum certifies the fixpoint with one
scalar per round.  Round count is O(diameter of the largest component) —
near-dup components are tiny (dup clusters), so 2-4 rounds in practice.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Min

from .util import join_partitions


def _exact_label_sum(lab_ds: ray.data.Dataset, col: str) -> int:
    """Exact Σ label over the Dataset: 31-bit hi/lo partial sums per batch
    (int64-exact), reassembled as a Python int — labels can be ~2^63."""
    parts = lab_ds.map_batches(
        lambda t: pa.table({
            "hi": pa.array([int((t[col].to_numpy() >> 31).sum())]),
            "lo": pa.array([int((t[col].to_numpy()
                                 & np.int64(0x7FFFFFFF)).sum())]),
        }),
        batch_format="pyarrow",
    ).to_pandas()
    return (int(parts["hi"].sum()) << 31) + int(parts["lo"].sum())


def min_label_prop(ei: np.ndarray, ej: np.ndarray, n: int) -> np.ndarray:
    """Vectorized connected components over edge INDEX arrays: returns
    ``lab`` (int64, len n) where ``lab[i]`` is the index of the minimum
    node of i's component.  Indices must come from a node table sorted
    ascending (``np.unique``), so min-index ≡ min-node-id.

    Hooking (``np.minimum.at`` both directions) + pointer jumping
    (``lab = lab[lab]`` to fixpoint) — the Shiloach–Vishkin shortcut —
    converges in O(log n) outer rounds instead of O(component diameter)
    for plain hooking.  Corridor-shaped cluster graphs are CHAINS
    (diameter ~ thousands of segments), where plain hooking was measured
    at ~100 rounds / 13 s on the driver at 600k docs; this runs the same
    merge in <1 s with bit-identical output (both fixpoints are
    min-per-component).

    Monotonicity argument: lab starts as identity and only decreases, so
    lab[i] <= i always, hence lab[lab[i]] <= lab[i] and pointer jumping
    preserves component membership while strictly shrinking chains."""
    lab = np.arange(n, dtype=np.int64)
    while True:
        old = lab.copy()
        np.minimum.at(lab, ei, lab[ej])
        np.minimum.at(lab, ej, lab[ei])
        while True:
            nxt = lab[lab]
            if np.array_equal(nxt, lab):
                break
            lab = nxt
        if np.array_equal(lab, old):
            break
    return lab


DRIVER_DEDUPE_MAX_PAIRS = 5_000_000
# raw pair sets up to this (thin (a,b) int64 rows, ≤80 MB) dedupe on the
# driver — one groupby shuffle costs ~1-2 s of aggregator fixed cost that
# dominates small candidate sets (three dedup queries × 2-4 s at bench
# scale); larger sets keep the distributed keys-only groupby.


def _pointer_jump(lab: ray.data.Dataset, num_partitions: int,
                  comp_col: str) -> ray.data.Dataset:
    """One distributed pointer-jump round: comp(node) ← comp(comp(node)).

    Every label value is itself a node of the label table (self edges put
    every node in ``lab``), so the self-join is total; labels only decrease
    (comp[k] ≤ k), so the monotone-sum fixpoint certificate is preserved.
    Jumping halves chain lengths each round, turning the hook-only
    O(component diameter) round count into O(log diameter) — corridor
    cluster graphs are chains, where diameter-many join rounds would blow
    the round budget long before 10^12 rows."""

    jumped = lab.join(lab, join_type="inner",
                      num_partitions=num_partitions,
                      on=(comp_col,), right_on=("node",),
                      left_suffix="", right_suffix="_j")
    col = comp_col + "_j"

    def take(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"], comp_col: t[col]})

    return jumped.map_batches(take, batch_format="pyarrow")


def dedupe_pairs(pairs: ray.data.Dataset, a: str = "a", b: str = "b",
                 driver_max_pairs: int = DRIVER_DEDUPE_MAX_PAIRS) -> ray.data.Dataset:
    """Global (a, b) pair dedupe — pairs surfacing from multiple LSH bands /
    probe buckets collapse to one edge.  Routed by raw pair count (bounded
    by candidate pairs, never corpus size): vectorized driver
    drop_duplicates below ``driver_max_pairs``, one keys-only groupby above.
    Same edge SET either way (downstream verify/CC are order-free).  Caller
    must ensure ``pairs`` is non-empty (an empty map_groups output has no
    schema for the groupby)."""
    from ray.data.aggregate import Count

    pairs = pairs.materialize()
    if pairs.count() <= driver_max_pairs:
        df = (pairs.to_pandas()[[a, b]].drop_duplicates()
              .reset_index(drop=True))
        return ray.data.from_pandas(df)
    return (pairs.groupby([a, b]).aggregate(Count(alias_name="_n"))
            .select_columns([a, b]))


def connected_components(edges: ray.data.Dataset, a: str = "a", b: str = "b",
                         num_partitions: int | None = None,
                         max_rounds: int = 30) -> ray.data.Dataset:
    """(a, b) edge Dataset → (node, comp) for every node incident to an edge;
    comp = min node id in the component (matches the driver UnionFind whose
    smaller id wins as root — equality asserted in tests)."""
    if num_partitions is None:
        num_partitions = join_partitions()

    def to_edges(t: pa.Table) -> pa.Table:
        x = t[a].to_numpy().astype(np.int64)
        y = t[b].to_numpy().astype(np.int64)
        node = np.concatenate([x, y, x, y])
        nbr = np.concatenate([y, x, x, y])  # both directions + self edges
        return pa.table({"node": pa.array(node, type=pa.int64()),
                         "nbr": pa.array(nbr, type=pa.int64())})

    edge_ds = edges.map_batches(to_edges, batch_format="pyarrow").materialize()
    # repartition folds away the degenerate-schema empty partitions Ray's
    # hash aggregate emits (they break the downstream acero join); block
    # count scales with edge count so no round funnels through one block
    rep = int(max(1, min(num_partitions, edge_ds.count() // 800_000)))
    lab = (edge_ds.groupby("node").aggregate(Min("nbr", alias_name="comp"))
           .repartition(rep).materialize())
    prev = None
    converged = False
    for rnd in range(max_rounds + 1):
        s = _exact_label_sum(lab, "comp")
        if prev is not None and s == prev:
            converged = True
            break
        prev = s
        prop = edge_ds.join(lab, join_type="inner",
                            num_partitions=num_partitions,
                            on=("nbr",), right_on=("node",),
                            left_suffix="_e", right_suffix="_l")
        lab = (prop.groupby("node").aggregate(Min("comp", alias_name="comp"))
               .repartition(rep).materialize())
        if rnd >= 2:
            # dup components converge in ≤3 hook rounds — skip the jump's
            # fixed join cost there; longer (chain) components get
            # pointer jumping from round 3 ⇒ O(log diameter) total rounds
            lab = (_pointer_jump(lab, num_partitions, "comp")
                   .repartition(rep).materialize())
    if not converged:
        # with jumping, rounds needed ≈ log2(component diameter) + 3; a
        # silent return here would split long chain components (review r2)
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds "
            "— raise max_rounds (component diameter exceeds it)")
    return lab


def assign_groups(ids: ray.data.Dataset, comps: ray.data.Dataset,
                  id_col: str, group_col: str,
                  num_partitions: int | None = None) -> ray.data.Dataset:
    """LEFT OUTER hash join of every id onto its component; ids with no
    near-dup edge get group = their own id (one output row per input id —
    the near-dup ops' output contract)."""
    if comps.count() == 0:
        # join on an empty/degenerate-schema side breaks acero — short-circuit
        def own(t: pa.Table) -> pa.Table:
            v = pc.cast(t[id_col], pa.int64())
            return pa.table({id_col: v, group_col: v})

        return ids.map_batches(own, batch_format="pyarrow")
    joined = ids.join(comps, join_type="left_outer",
                      num_partitions=num_partitions or join_partitions(),
                      on=(id_col,), right_on=("node",))

    def fill(t: pa.Table) -> pa.Table:
        comp = pc.cast(t["comp"], pa.int64()) if t.num_rows else t["comp"]
        grp = pc.coalesce(comp, pc.cast(t[id_col], pa.int64()))
        return pa.table({id_col: t[id_col], group_col: grp})

    return joined.map_batches(fill, batch_format="pyarrow")


DRIVER_CC_MAX_EDGES = 5_000_000
# edge sets up to this size run the driver-side vectorized propagation (the
# edge list is THIN (a, b) int64 pairs — bounded by dup-pair count, never by
# corpus size — so 5M edges is ~80 MB); above it the join+groupby-min rounds
# run fully distributed.  Ray's shuffle fixed cost (~1-2 s per join/groupby,
# ~8 ops for a CC) dominates below ~10^6 edges, measured 4.4 s for 246 edges.


def _driver_components(edges_df: pd.DataFrame, a: str, b: str) -> pd.DataFrame:
    """Vectorized min-label propagation on the driver over the thin edge
    list — identical result to connected_components (both equal UnionFind;
    asserted in tests)."""
    x = edges_df[a].to_numpy(dtype=np.int64)
    y = edges_df[b].to_numpy(dtype=np.int64)
    nodes, inv = np.unique(np.concatenate([x, y]), return_inverse=True)
    ei, ej = inv[: len(x)], inv[len(x):]
    lab = min_label_prop(ei, ej, len(nodes))
    return pd.DataFrame({"node": nodes, "comp": nodes[lab]})


def _assign_broadcast(ids: ray.data.Dataset, comps_df: pd.DataFrame,
                      id_col: str, group_col: str) -> ray.data.Dataset:
    """Attach groups via a ray.put of the (edge-bounded, small) component
    map + vectorized searchsorted per batch — the ids side streams; no
    corpus-proportional driver state."""
    import ray as _ray

    nodes = comps_df["node"].to_numpy(dtype=np.int64)
    comp = comps_df["comp"].to_numpy(dtype=np.int64)
    order = np.argsort(nodes, kind="stable")
    ref = _ray.put((nodes[order], comp[order]))

    def f(t: pa.Table) -> pa.Table:
        ns, cs = _ray.get(ref)
        v = pc.cast(t[id_col], pa.int64()).to_numpy()
        if len(ns):
            pos = np.clip(np.searchsorted(ns, v), 0, len(ns) - 1)
            grp = np.where(ns[pos] == v, cs[pos], v)
        else:
            grp = v
        return pa.table({id_col: pa.array(v, type=pa.int64()),
                         group_col: pa.array(grp, type=pa.int64())})

    return ids.map_batches(f, batch_format="pyarrow")


def components_dataset(ids: ray.data.Dataset, edges: ray.data.Dataset,
                       id_col: str, group_col: str,
                       driver_max_edges: int = DRIVER_CC_MAX_EDGES) -> ray.data.Dataset:
    """Near-dup group assembly → (id, group) DATASET, one row per input id —
    the at-scale output path: nothing corpus-proportional ever touches the
    driver (the component map is edge-bounded; assignment streams).  Routed
    by EDGE count: driver propagation + broadcast-map assignment below
    ``driver_max_edges``, fully-distributed join rounds above — same outputs
    either way (asserted in tests)."""
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        def own(t: pa.Table) -> pa.Table:
            v = pc.cast(t[id_col], pa.int64())
            return pa.table({id_col: v, group_col: v})

        return ids.map_batches(own, batch_format="pyarrow")
    if n_edges <= driver_max_edges:
        comps_df = _driver_components(edges.to_pandas(), "a", "b")
        return _assign_broadcast(ids, comps_df, id_col, group_col)
    comps = connected_components(edges)
    return assign_groups(ids, comps, id_col, group_col)


def components_frame(ids: ray.data.Dataset, edges: ray.data.Dataset,
                     id_col: str, group_col: str,
                     driver_max_edges: int = DRIVER_CC_MAX_EDGES) -> pd.DataFrame:
    """:func:`components_dataset` collected to a sorted DataFrame — the
    queries() compare surface ONLY.  This pulls one row per corpus id to the
    driver by design (the declared output contract of the dedup queries);
    at-scale callers consume :func:`components_dataset` and write/stream it
    instead (round-2 advice: the frame, not the algorithm, is the
    driver-bound part)."""
    out = components_dataset(ids, edges, id_col, group_col,
                             driver_max_edges).to_pandas()
    if id_col not in out.columns:  # empty input loses its schema
        return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                             group_col: pd.Series(dtype="int64")})
    return out.sort_values(id_col).reset_index(drop=True)


def components_frame_empty(ids: ray.data.Dataset, id_col: str,
                           group_col: str) -> pd.DataFrame:
    """No edges → every id is its own group (short-circuits the join, which
    rejects an empty/degenerate-schema edge side)."""

    def own(t: pa.Table) -> pa.Table:
        v = pc.cast(t[id_col], pa.int64())
        return pa.table({id_col: v, group_col: v})

    out = ids.map_batches(own, batch_format="pyarrow").to_pandas()
    if id_col not in out.columns:
        return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                             group_col: pd.Series(dtype="int64")})
    return out.sort_values(id_col).reset_index(drop=True)
