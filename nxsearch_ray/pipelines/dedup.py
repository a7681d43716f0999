"""The flagship pipeline: near-duplicate detection + clustering.

End-to-end dataflow (physical plan in SURVEY.md §4):

  pages (url, warc_ts, html, text, lang)
    → extract_text            [map_batches, html dropped immediately]
    → canonicalize            [actor pool: tokenizer + filter chain]
    → signatures              [actor pool: shingles → MinHash/SimHash/
                               bottom-k/anchors]
    → 3 candidate passes      [explode keys → groupby shuffle → pairs]:
        minhash: LSH bands      simhash: Hamming chunks
        suffix:  anchor shingles
    → union + exact pair dedup (source sets)      [groupby (a,b)]
    → verification            [broadcast signature index (default) or
                               bucketed hash joins (scale path)]
    → exact suffix-automaton verify for screen-only survivors
    → connected components    [driver union-find | label propagation]
    → clusters (page_id, cluster_id)

Materialization policy: `canonical` and `signatures` are consumed by
several downstream passes, so they are pinned once — to Parquet
checkpoints when ``out_dir`` is given (resumable, with lineage
manifests), else to the object store (``materialize()``).  Everything
else streams.  All hashing is seeded from the config; output is
invariant to parallelism and retries.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

from nxsearch_ray.config import PipelineConfig
from nxsearch_ray.stages.cc import cc_driver_unionfind, cc_label_propagation
from nxsearch_ray.stages.pairs import (
    multi_candidate_pairs,
    union_pair_sources,
)
from nxsearch_ray.stages.signatures import canonsig_stage
from nxsearch_ray.stages.suffix import (
    collect_token_index,
    suffix_verify_broadcast,
    suffix_verify_bucketed,
)
from nxsearch_ray.stages.verify import (
    collect_signature_index,
    verify_pairs_broadcast,
    verify_pairs_bucketed,
)
from nxsearch_ray.state.lineage import checkpoint


@dataclass
class DedupResult:
    clusters: "object"            # Dataset | pa.Table: page_id, cluster_id
    verified_pairs: "object"      # Dataset: a, b, source
    stats: dict = field(default_factory=dict)


def pin_blocks(ds, target_blocks: int | None = None):
    """Materialize AND sever lineage: a MaterializedDataset handle
    keeps its upstream actor pool's minimum actors alive (reserved
    CPUs starve later stages); re-wrapping the block refs in a fresh
    Dataset drops the plan so the pool shuts down, while the refs keep
    the blocks alive in the object store.

    ``target_blocks`` coalesces fragmented outputs (unions of filters
    produce hundreds of near-empty blocks whose per-task overhead then
    dominates every downstream stage)."""
    import ray.data as rd

    if target_blocks is not None:
        ds = ds.repartition(target_blocks)
    mat = ds.materialize()
    return rd.from_arrow_refs(mat.to_arrow_refs())


def _pin(ds_factory, out_dir, stage, cfg, stats):
    """Checkpoint to parquet (resumable) or pin in the object store."""
    if out_dir is not None:
        ds, skipped = checkpoint(ds_factory, out_dir, stage, cfg)
        stats[f"{stage}_resumed"] = skipped
        return ds
    return pin_blocks(ds_factory())


def run_dedup(pages_ds, cfg: PipelineConfig | None = None, *,
              out_dir: str | None = None,
              verify_mode: str = "broadcast",
              cc_mode: str = "driver",
              enable_suffix_pass: bool = True) -> DedupResult:
    """Run the full near-dup pipeline over a pages Dataset.

    ``verify_mode``: 'broadcast' (signature index via ray.put) or
    'bucketed' (partitioned hash joins — the 10^12-doc plan).
    ``cc_mode``: 'driver' (union-find reducer over the streamed pair
    batches) or 'labelprop' (distributed min-label propagation).
    """
    import time as _time

    import ray

    cfg = cfg or PipelineConfig()
    stats: dict = {}
    _t = _time.monotonic

    # fused extract→canonicalize→signature: the signatures table
    # carries token_ids, so no separate canonical materialization
    t0 = _t()
    signatures = _pin(
        lambda: canonsig_stage(pages_ds, cfg),
        out_dir, "signatures", cfg, stats)
    stats["wall_signatures"] = round(_t() - t0, 2)

    t0 = _t()
    candidates = union_pair_sources(
        multi_candidate_pairs(signatures, cfg),
        min_suffix_hits=cfg.min_anchor_hits)
    stats["wall_candidates"] = round(_t() - t0, 2)

    t0 = _t()
    if verify_mode == "broadcast":
        sig_idx_ref = ray.put(collect_signature_index(signatures, cfg))
        scored = verify_pairs_broadcast(candidates, sig_idx_ref, cfg)
    elif verify_mode == "bucketed":
        scored = verify_pairs_bucketed(candidates, signatures, cfg)
    else:
        raise ValueError(f"unknown verify_mode {verify_mode!r}")
    stats["wall_verify_setup"] = round(_t() - t0, 2)

    def split_direct(t: pa.Table) -> pa.Table:
        return t.filter(t.column("keep_minsim")) \
            .select(["a", "b", "source"])

    direct = scored.map_batches(split_direct, batch_format="pyarrow")

    if enable_suffix_pass:
        t0 = _t()
        scored = pin_blocks(scored, target_blocks=32)
        stats["wall_verify"] = round(_t() - t0, 2)
        direct = scored.map_batches(split_direct, batch_format="pyarrow")

        def split_exact(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            m = pc.and_(pc.invert(t.column("keep_minsim")),
                        t.column("keep_exact_screen"))
            return t.filter(m).select(["a", "b", "source"])

        need_exact = scored.map_batches(split_exact,
                                        batch_format="pyarrow")
        t0 = _t()
        if verify_mode == "bucketed":
            exact = suffix_verify_bucketed(need_exact, signatures, cfg)
        else:
            tok_idx_ref = ray.put(collect_token_index(signatures))
            exact = suffix_verify_broadcast(need_exact, tok_idx_ref, cfg)
        all_pairs = pin_blocks(direct.union(
            exact.select_columns(["a", "b", "source"])),
            target_blocks=16)
        stats["wall_exact"] = round(_t() - t0, 2)
    else:
        all_pairs = direct

    if out_dir is not None:
        all_pairs, skipped = checkpoint(lambda: all_pairs, out_dir,
                                        "verified_pairs", cfg)
        stats["verified_pairs_resumed"] = skipped

    t0 = _t()
    if cc_mode == "driver":
        clusters = cc_driver_unionfind(all_pairs)  # pa.Table
        stats["wall_cc"] = round(_t() - t0, 2)
        if out_dir is not None:
            import ray.data as rd

            tbl = clusters
            clusters, _ = checkpoint(lambda: rd.from_arrow(tbl),
                                     out_dir, "clusters", cfg)
    elif cc_mode == "labelprop":
        clusters = cc_label_propagation(all_pairs)
        stats["wall_cc"] = round(_t() - t0, 2)
        if out_dir is not None:
            clusters, _ = checkpoint(lambda: clusters, out_dir,
                                     "clusters", cfg)
    else:
        raise ValueError(f"unknown cc_mode {cc_mode!r}")

    return DedupResult(clusters=clusters, verified_pairs=all_pairs,
                       stats=stats)


def clusters_as_table(result: DedupResult) -> pa.Table:
    import numpy as np

    from nxsearch_ray.stages.cc import CLUSTER_SCHEMA

    c = result.clusters
    if not isinstance(c, pa.Table):
        batches = list(c.iter_batches(batch_size=65536,
                                      batch_format="pyarrow"))
        c = (pa.concat_tables(batches) if batches
             else CLUSTER_SCHEMA.empty_table())
    if c.num_rows == 0:
        return c
    order = np.argsort(c.column("page_id").to_numpy(), kind="stable")
    return c.take(pa.array(order, type=pa.int64()))
