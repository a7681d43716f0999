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


def cc_label_propagation(pairs_ds, *, max_rounds: int = 50):
    """Distributed min-label propagation; returns a Ray Dataset with
    CLUSTER_SCHEMA.  Each round is two groupby shuffles over
    (node, label) rows; edges are re-used from the object store."""
    import ray.data as rd

    def to_edges(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy()
        b = t.column("b").to_numpy()
        return pa.Table.from_arrays(
            [pa.array(np.concatenate([a, b]), type=pa.int64()),
             pa.array(np.concatenate([b, a]), type=pa.int64())],
            names=["src", "dst"])

    edges = pairs_ds.select_columns(["a", "b"]).map_batches(
        to_edges, batch_format="pyarrow").materialize()

    # initial labels: label(node) = node
    def init_labels(t: pa.Table) -> pa.Table:
        src = t.column("src")
        return pa.Table.from_arrays([src, src], names=["node", "label"])

    labels = edges.map_batches(init_labels, batch_format="pyarrow") \
        .groupby("node").min("label").map_batches(
            lambda t: t.rename_columns(["node", "label"]),
            batch_format="pyarrow").materialize()

    for _ in range(max_rounds):
        # neighbor messages: for edge (src→dst), dst receives label(src).
        # Attach labels to edge sources via groupby(node/src) co-location:
        # union labeled rows + edges, per-group broadcast of the label.
        def tag_label(t: pa.Table) -> pa.Table:
            return pa.Table.from_arrays(
                [t.column("node"), pa.nulls(t.num_rows, pa.int64()),
                 t.column("label")],
                names=["node", "dst", "label"])

        def tag_edge(t: pa.Table) -> pa.Table:
            return pa.Table.from_arrays(
                [t.column("src"), t.column("dst"),
                 pa.nulls(t.num_rows, pa.int64())],
                names=["node", "dst", "label"])

        tagged = labels.map_batches(tag_label, batch_format="pyarrow") \
            .union(edges.map_batches(tag_edge, batch_format="pyarrow"))

        def propagate(g: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            node = g.column("node")[0].as_py()
            lab = g.column("label").drop_null()
            node_label = (pc.min(lab).as_py() if len(lab) else node)
            dst = g.column("dst").drop_null().to_pylist()
            out_nodes = [node] + dst
            return pa.Table.from_arrays(
                [pa.array(out_nodes, type=pa.int64()),
                 pa.array([node_label] * len(out_nodes),
                          type=pa.int64())],
                names=["node", "label"])

        msgs = tagged.groupby("node").map_groups(
            propagate, batch_format="pyarrow")
        new_labels = msgs.groupby("node").min("label").map_batches(
            lambda t: t.rename_columns(["node", "label"]),
            batch_format="pyarrow").materialize()

        old_sum = labels.sum("label")
        new_sum = new_labels.sum("label")
        labels = new_labels
        if old_sum == new_sum:
            break

    return labels.map_batches(
        lambda t: t.rename_columns(["page_id", "cluster_id"]),
        batch_format="pyarrow")
