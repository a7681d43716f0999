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
    """Stream (a, b) batches into a driver union-find; returns the
    clusters table (only nodes that appear in ≥1 pair)."""
    from nxsearch_ray.state.unionfind import UnionFind

    uf = UnionFind()
    for batch in pairs_ds.select_columns(["a", "b"]).iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        a = batch.column("a").to_numpy()
        b = batch.column("b").to_numpy()
        for i in range(len(a)):
            uf.union(int(a[i]), int(b[i]))
    labels = uf.labels_min()
    if not labels:
        return CLUSTER_SCHEMA.empty_table()
    nodes = np.fromiter(labels.keys(), dtype=np.int64, count=len(labels))
    labs = np.fromiter(labels.values(), dtype=np.int64, count=len(labels))
    order = np.argsort(nodes, kind="stable")
    return pa.Table.from_arrays(
        [pa.array(nodes[order]), pa.array(labs[order])],
        schema=CLUSTER_SCHEMA)


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
        into O(1)."""
        from nxsearch_ray.state.unionfind import UnionFind

        a = t.column("a").to_numpy()
        b = t.column("b").to_numpy()
        uf = UnionFind()
        for i in range(len(a)):
            uf.union(int(a[i]), int(b[i]))
        labels = uf.labels_min()
        node = np.fromiter(labels.keys(), np.int64, len(labels))
        root = np.fromiter(labels.values(), np.int64, len(labels))
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
