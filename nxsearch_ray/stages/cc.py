"""Connected components over the verified pair stream → cluster ids.

Cluster id = min page_id of the component (deterministic, independent
of edge order / parallelism — SURVEY.md §7 "determinism").

Two physical plans, one semantic:

  * **driver union-find** (default): verified pairs are a tiny fraction
    of the corpus (dup rate ≪ 1), so streaming them through
    ``iter_batches`` into a union-find on the driver is both exact and
    fast.  The stream never materializes the full dataset — batches
    arrive with backpressure.
  * **distributed min-label propagation** (scale path): the classic
    hash-hash iteration — each round attaches every node's current
    label to both edge endpoints (partitioned hash join), takes
    per-node min over (own label ∪ neighbor labels) via groupby, and
    stops when no label changed.  Converges in O(diameter) rounds
    (near-dup clusters are shallow; boilerplate chains from the skew
    cap bound the diameter by the chain length — capped rounds +
    convergence check).  Label skew for giant components is the BTS
    (ICDE 2024) concern; min-label with per-round rehashing avoids a
    single hot reducer because the groupby key is the node id, not the
    label.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

CLUSTER_SCHEMA = pa.schema([("page_id", pa.int64()),
                            ("cluster_id", pa.int64())])


def cc_driver_unionfind(pairs_ds) -> pa.Table:
    """Stream (a, b) batches to the driver and solve components with
    the vectorized min-hooking kernel; returns the clusters table
    (only nodes that appear in ≥1 pair).  Small-scale plan — the
    flagship default is ``cc_tree`` (distributed, no driver collect)."""
    from nxsearch_ray.state.unionfind import min_label_components

    a_parts, b_parts = [], []
    for batch in pairs_ds.select_columns(["a", "b"]).iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"):
        a_parts.append(batch.column("a").to_numpy())
        b_parts.append(batch.column("b").to_numpy())
    if not a_parts:
        return CLUSTER_SCHEMA.empty_table()
    nodes, labs = min_label_components(np.concatenate(a_parts),
                                       np.concatenate(b_parts))
    return pa.Table.from_arrays([pa.array(nodes), pa.array(labs)],
                                schema=CLUSTER_SCHEMA)


def _star_edges(t: pa.Table, a_col: str = "a", b_col: str = "b"
                ) -> pa.Table:
    """Collapse one block's edges to star edges (node → component-min
    label seen inside this block), dropping self rows.  Associative:
    re-running over a union of star-edge blocks merges components, so
    this is both the leaf step and the combine step of the tree
    reduction."""
    from nxsearch_ray.state.unionfind import min_label_components

    nodes, labs = min_label_components(t.column(a_col).to_numpy(),
                                       t.column(b_col).to_numpy())
    keep = nodes != labs
    return pa.Table.from_arrays(
        [pa.array(nodes[keep]), pa.array(labs[keep])],
        names=["a", "b"])


def cc_tree_unionfind(pairs_ds, *, fanin: int = 8):
    """Distributed connected components by tree-reduce union-find — the
    flagship default.  No driver-side collect and no per-row Python:

      1. leaf: every pair block is collapsed to star edges (node →
         block-local component min) by the vectorized min-hooking
         kernel — output rows ≤ distinct nodes in the block, so dup-
         heavy blocks shrink massively;
      2. reduce: repartition coalesces ``fanin`` star-edge blocks into
         one and re-collapses, log_fanin(B) rounds of narrow (non-
         shuffling) repartitions;
      3. root: the single surviving block holds one star edge per
         non-min dup node; a final pass emits (page_id, cluster_id)
         with the min nodes' self rows restored.

    Memory bound: the root task holds O(distinct dup nodes) rows
    (16 B/row).  ``run_dedup(cc_mode='auto')`` counts the collapsed
    edges after the leaf pass and falls back to label propagation when
    they exceed ``cfg.cc_tree_max_rows`` — the 10^12-doc escape hatch.
    Returns a Ray Dataset with CLUSTER_SCHEMA."""
    ds = pairs_ds.select_columns(["a", "b"]).map_batches(
        _star_edges, batch_format="pyarrow").materialize()
    return _cc_tree_reduce(ds, fanin=fanin)


def _cc_tree_reduce(star_ds, *, fanin: int = 8):
    """Reduce a materialized star-edge Dataset to the clusters table."""
    import math

    nblocks = star_ds.num_blocks()
    while nblocks > 1:
        target = max(1, math.ceil(nblocks / fanin))
        star_ds = star_ds.repartition(target).map_batches(
            _star_edges, batch_format="pyarrow",
            batch_size=None).materialize()
        new_n = star_ds.num_blocks()
        if new_n >= nblocks:      # safeguard: force the root merge
            star_ds = star_ds.repartition(1).map_batches(
                _star_edges, batch_format="pyarrow",
                batch_size=None).materialize()
            break
        nblocks = new_n

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return CLUSTER_SCHEMA.empty_table()
        node = t.column("a").to_numpy()
        lab = t.column("b").to_numpy()
        # restore the min nodes (labels) as members of their own cluster
        mins = np.unique(lab)
        nodes = np.concatenate([node, mins])
        labs = np.concatenate([lab, mins])
        order = np.argsort(nodes, kind="stable")
        return pa.Table.from_arrays(
            [pa.array(nodes[order]), pa.array(labs[order])],
            schema=CLUSTER_SCHEMA)

    return star_ds.map_batches(finish, batch_format="pyarrow",
                               batch_size=None)


_SENTINEL = np.iinfo(np.int64).max


def cc_label_propagation(pairs_ds, *, max_rounds: int = 50):
    """Distributed min-label propagation; returns a Ray Dataset with
    CLUSTER_SCHEMA.

    Each round: rows (node, dst, label) — one label row per node
    (dst = -1) plus one row per directed edge (label = sentinel) — are
    sorted by node; a fully vectorized block scan computes each node's
    current label (segment-min via ``np.minimum.reduceat``) and emits
    it to every neighbor; a native groupby-min folds the messages into
    new labels.  No per-group Python anywhere, so rounds cost two
    small shuffles regardless of node count.  Converges in
    O(diameter) rounds (label sums are monotone — equal sums ⇔ fixed
    point); boundary runs of the sort are handled by a second
    reduceat pass inside the min-fold, which is order-insensitive."""

    def to_edges(t: pa.Table) -> pa.Table:
        """Per-block union-find combiner: collapse every component
        that lives inside this block to a star around its min node
        BEFORE the global iteration — long chains (the skew-cap policy
        emits them for hot buckets) mostly come from one bucket and
        land in one block, so this turns O(chain length) global rounds
        into O(1).  Vectorized (min-hooking kernel) — no per-edge
        Python."""
        from nxsearch_ray.state.unionfind import min_label_components

        node, root = min_label_components(t.column("a").to_numpy(),
                                          t.column("b").to_numpy())
        keep = node != root
        node, root = node[keep], root[keep]
        return pa.Table.from_arrays(
            [pa.array(np.concatenate([node, root]), type=pa.int64()),
             pa.array(np.concatenate([root, node]), type=pa.int64())],
            names=["node", "dst"])

    # coalesce: pair datasets arrive highly fragmented (union of many
    # filter outputs) and per-round cost scales with BLOCK count, not
    # row count
    edges = pairs_ds.select_columns(["a", "b"]).map_batches(
        to_edges, batch_format="pyarrow").repartition(16).materialize()

    def init_labels(t: pa.Table) -> pa.Table:
        node = t.column("node")
        return pa.Table.from_arrays([node, node],
                                    names=["node", "label"])

    labels = edges.map_batches(init_labels, batch_format="pyarrow") \
        .groupby("node").min("label").map_batches(
            lambda t: t.rename_columns(["node", "label"]),
            batch_format="pyarrow").materialize()

    def tag_label(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_arrays(
            [t.column("node"),
             pa.array(np.full(n, -1, np.int64)),
             t.column("label")],
            names=["node", "dst", "label"])

    def tag_edge(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_arrays(
            [t.column("node"), t.column("dst"),
             pa.array(np.full(n, _SENTINEL, np.int64))],
            names=["node", "dst", "label"])

    mixed_schema = pa.schema([
        ("node", pa.int64()), ("label", pa.int64()),
        ("dst", pa.int64()), ("pending", pa.bool_())])

    def propagate_block(t: pa.Table) -> pa.Table:
        """Vectorized per-block message emission over node runs
        (segment-min via ``np.minimum.reduceat``).  Runs touching a
        block edge may be split across blocks — their node's label row
        might live in the other block — so their raw rows are routed
        to a tiny per-node fallback, like the candidate pair scan."""
        n = t.num_rows
        if n == 0:
            return mixed_schema.empty_table()
        node = t.column("node").to_numpy()
        dst = t.column("dst").to_numpy()
        lab = t.column("label").to_numpy()
        change = np.nonzero(node[1:] != node[:-1])[0] + 1
        starts = np.concatenate(([0], change))
        counts = np.diff(np.concatenate((starts, [n])))
        pend = np.zeros(n, dtype=bool)
        pend[:counts[0]] = True
        pend[starts[-1]:] = True
        run_min = np.minimum.reduceat(lab, starts)
        run_id = np.cumsum(np.concatenate(
            ([0], (node[1:] != node[:-1]).astype(np.int64))))
        msg_label = run_min[run_id]
        out_node = np.where(dst == -1, node, dst)
        keep = ~pend
        done_t = pa.Table.from_arrays(
            [pa.array(out_node[keep]), pa.array(msg_label[keep]),
             pa.array(np.full(int(keep.sum()), -2, np.int64)),
             pa.array(np.zeros(int(keep.sum()), dtype=bool))],
            schema=mixed_schema)
        pend_t = pa.Table.from_arrays(
            [pa.array(node[pend]), pa.array(lab[pend]),
             pa.array(dst[pend]),
             pa.array(np.ones(int(pend.sum()), dtype=bool))],
            schema=mixed_schema)
        return pa.concat_tables([done_t, pend_t])

    def fallback_emit(g: pa.Table) -> pa.Table:
        lab = g.column("label").to_numpy()
        dst = g.column("dst").to_numpy()
        node = int(g.column("node")[0].as_py())
        node_label = int(lab.min())
        out_node = np.where(dst == -1, node, dst)
        return pa.Table.from_arrays(
            [pa.array(out_node, type=pa.int64()),
             pa.array(np.full(len(out_node), node_label, np.int64))],
            names=["node", "label"])

    def pointer_jump(lbls):
        """label(node) ← label(label(node)) — pointer jumping halves
        pointer-chain depth per application, so chains the per-block
        combiner could not see converge in O(log diameter) instead of
        O(diameter) rounds."""
        from nxsearch_ray.stages.join import hash_join

        lab_schema = pa.schema([("node", pa.int64()),
                                ("label", pa.int64())])
        j = hash_join(lbls, lbls, left_key="label", right_key="node",
                      left_schema=lab_schema, right_schema=lab_schema,
                      right_suffix="_p")

        def finish(t: pa.Table) -> pa.Table:
            return pa.Table.from_arrays(
                [t.column("node"), t.column("label_p")],
                names=["node", "label"])

        return j.map_batches(finish, batch_format="pyarrow") \
            .repartition(16).materialize()

    old_sum = labels.sum("label")
    for _ in range(max_rounds):
        tagged = labels.map_batches(tag_label, batch_format="pyarrow") \
            .union(edges.map_batches(tag_edge, batch_format="pyarrow"))
        mixed = tagged.sort("node").map_batches(
            propagate_block, batch_format="pyarrow",
            batch_size=None).materialize()
        done = mixed.map_batches(
            lambda t: t.filter(pa.compute.invert(t.column("pending")))
            .select(["node", "label"]), batch_format="pyarrow")
        pending = mixed.map_batches(
            lambda t: t.filter(t.column("pending")),
            batch_format="pyarrow")
        fb = pending.groupby("node").map_groups(
            fallback_emit, batch_format="pyarrow")
        msgs = done.union(fb)
        # repartition: aggregate/sort outputs fragment into many tiny
        # blocks; left unchecked the block count compounds each round
        new_labels = msgs.groupby("node").min("label").map_batches(
            lambda t: t.rename_columns(["node", "label"]),
            batch_format="pyarrow").repartition(16).materialize()
        new_labels = pointer_jump(new_labels)

        new_sum = new_labels.sum("label")
        labels = new_labels
        if old_sum == new_sum:
            break
        old_sum = new_sum

    return labels.map_batches(
        lambda t: t.rename_columns(["page_id", "cluster_id"]),
        batch_format="pyarrow")
