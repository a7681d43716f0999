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


def cc_label_propagation(pairs_ds, *, max_rounds: int = 50,
                         num_partitions: int | None = None):
    """Distributed min-label propagation as a BSP loop over raw Ray
    tasks (the Pregel pattern); returns a Ray Dataset with
    CLUSTER_SCHEMA columns.

    Why raw tasks and not Dataset ops: an iterative algorithm run as
    per-round Dataset stages pays a full stage launch + exchange
    (aggregator pool spin-up, plan compile) every round — measured
    ~5 s/round at sandbox scale for data measured in kilobytes.  Here
    the edge set is partitioned ONCE (star-collapsed per block by the
    vectorized union-find combiner, exploded to both directions,
    hash-exchanged on an explicit partition column we can recompute
    for any destination id), and each round is P plain tasks passing
    P×P small message arrays through the object store — delta
    propagation, so a round's traffic is proportional to the labels
    that actually changed, and convergence (no change anywhere) is
    O(diameter) rounds over star-collapsed edges.

    Partitioning assumptions, stated: P should scale with the edge
    count (default: cluster CPUs / 2); P² message objects per round
    are tiny but their count grows quadratically — at very large P,
    batch messages per destination WORKER rather than per partition.
    Determinism: labels evolve by min() folds only, so the fixed
    point is independent of scheduling order."""
    import ray

    from nxsearch_ray.functions.hashing import splitmix64
    from nxsearch_ray.stages.shuffle import (
        default_num_partitions,
        hash_partitioned,
    )

    P = num_partitions or default_num_partitions()

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
        both_n = np.concatenate([node, root])
        both_d = np.concatenate([root, node])
        pcol = (splitmix64(both_n.astype(np.uint64))
                % np.uint64(P)).astype(np.int64)
        return pa.Table.from_arrays(
            [pa.array(both_n, type=pa.int64()),
             pa.array(both_d, type=pa.int64()),
             pa.array(pcol, type=pa.int64())],
            names=["node", "dst", "pcol"])

    edges = pairs_ds.select_columns(["a", "b"]).map_batches(
        to_edges, batch_format="pyarrow")
    blocks = [b for b in hash_partitioned(edges, ["pcol"], P)
              .materialize().to_arrow_refs()]

    @ray.remote
    def _prep(block):
        """Per-partition state: node-sorted edge arrays, the sorted
        unique node ids, and initial labels = min(node, local min
        neighbor).  Returns (state, labels0, pcols)."""
        if block.num_columns == 0 or block.num_rows == 0:
            return None, np.empty(0, np.int64), np.empty(0, np.int64)
        node = block.column("node").to_numpy()
        dst = block.column("dst").to_numpy()
        pcols = np.unique(block.column("pcol").to_numpy())
        order = np.argsort(node, kind="stable")
        node, dst = node[order], dst[order]
        nodes, starts = np.unique(node, return_index=True)
        local_min = np.minimum.reduceat(dst, starts)
        labels = np.minimum(nodes, local_min)
        eidx = np.searchsorted(nodes, node)   # edge row → node slot
        state = {"nodes": nodes, "eidx": eidx, "dst": dst}
        return state, labels, pcols

    preps = [_prep.options(num_returns=3).remote(b) for b in blocks]
    state_refs = [p[0] for p in preps]
    pcol_lists = ray.get([p[2] for p in preps])
    B = len(blocks)
    pcol2blk = np.full(P, -1, dtype=np.int64)
    for bi, pl in enumerate(pcol_lists):
        pcol2blk[pl] = bi
    live = [bi for bi, pl in enumerate(pcol_lists) if len(pl)]
    if not live:
        import ray.data as rd

        return rd.from_arrow(CLUSTER_SCHEMA.empty_table())

    @ray.remote
    def _round(state, labels, first, pcol2blk_, nblocks, *inbox):
        """One BSP superstep: fold inbox minima into labels, emit the
        changed labels along local out-edges grouped by destination
        block.  Returns (labels, changed_count, msg_0, ..., msg_B-1);
        each msg is a 2×k int64 array (dst ids, labels)."""
        empty = np.empty((2, 0), dtype=np.int64)
        if state is None:
            return (labels, 0) + (empty,) * nblocks
        nodes = state["nodes"]
        lab = labels.copy()
        for m in inbox:
            if m is None or m.shape[1] == 0:
                continue
            pos = np.clip(np.searchsorted(nodes, m[0]), 0,
                          len(nodes) - 1)
            # routing guarantees targets exist here; the mask is
            # cheap insurance against a foreign id
            ok = nodes[pos] == m[0]
            np.minimum.at(lab, pos[ok], m[1][ok])
        changed_mask = lab != labels
        changed = int(changed_mask.sum())
        emit_mask = changed_mask if not first else \
            np.ones(len(nodes), dtype=bool)
        if not emit_mask.any():
            return (lab, changed) + (empty,) * nblocks
        eidx = state["eidx"]
        sel = emit_mask[eidx]
        dsel = state["dst"][sel]
        lsel = lab[eidx[sel]]
        dblk = pcol2blk_[(splitmix64(dsel.astype(np.uint64))
                          % np.uint64(len(pcol2blk_))).astype(np.int64)]
        order = np.argsort(dblk, kind="stable")
        dblk, dsel, lsel = dblk[order], dsel[order], lsel[order]
        bounds = np.searchsorted(dblk, np.arange(nblocks + 1))
        out = tuple(
            np.stack([dsel[bounds[q]:bounds[q + 1]],
                      lsel[bounds[q]:bounds[q + 1]]])
            if bounds[q + 1] > bounds[q] else empty
            for q in range(nblocks))
        return (lab, changed) + out

    # round 0 bootstraps: every node announces its initial label
    # (labels0 from _prep); later rounds emit only changed labels
    label_refs: list = [preps[bi][1] for bi in range(B)]
    msg_refs = [[None] * B for _ in range(B)]   # [src][dst]
    for rnd in range(max_rounds):
        outs = {}
        for bi in live:
            inbox = [msg_refs[q][bi] for q in live
                     if msg_refs[q][bi] is not None]
            outs[bi] = _round.options(num_returns=2 + B).remote(
                state_refs[bi], label_refs[bi], rnd == 0,
                pcol2blk, B, *inbox)
        changed_refs = []
        for bi in live:
            r = outs[bi]
            label_refs[bi] = r[0]
            changed_refs.append(r[1])
            for q in range(B):
                msg_refs[bi][q] = r[2 + q]
        total_changed = sum(ray.get(changed_refs))
        if rnd > 0 and total_changed == 0:
            # a full fold round saw no change anywhere, and delta
            # emission means its outboxes are empty → fixed point
            break

    @ray.remote
    def _to_table(state, labels):
        if state is None:
            return CLUSTER_SCHEMA.empty_table()
        return pa.Table.from_arrays(
            [pa.array(state["nodes"]), pa.array(labels)],
            schema=CLUSTER_SCHEMA)

    import ray.data as rd

    tables = [_to_table.remote(state_refs[bi], label_refs[bi])
              for bi in live]
    return rd.from_arrow_refs(tables)
