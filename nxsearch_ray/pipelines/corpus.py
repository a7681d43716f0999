"""End-to-end training-corpus pipeline: clean → near-dup → semantic.

The composed dataflow a Common-Crawl-scale training-data run actually
executes, wired as ONE resumable job (reference ships only the
indexing harness, src/utils/benchmark.c:72-109 — the cleaning/dedup
composition is the Ray-native extension surface; each tier is the
same code its standalone query uses):

  1. ``clean_pages`` — domain blocklist (stages/urlfilter.py), Gopher
     quality gate (stages/textstats.py, Rae et al. 2021 A1), PII
     scrub (stages/pii.py).  Map-only: no shuffle, streams.
  2. ``neardup``    — the flagship MinHash-LSH / SimHash / suffix
     near-dup pipeline (pipelines/dedup.run_dedup) over the cleaned
     pages; cluster ids are component minima, so every non-minimal
     member is a tier-2 drop with ``dup_of = cluster_id``.
  3. ``semantic``   — SemDeDup (stages/semdedup.run_semdedup) over the
     embeddings of tier-2 SURVIVORS only (embeddings keyed by
     ``vec_id == page_id``; the tier is skipped when no embedding
     table is supplied).
  4. ``final``      — one decision row per cleaned page:
     ``(page_id, drop_tier, dup_of)`` with tier 0 = kept,
     2 = near-dup, 3 = semantic (tier 1, the quality gate, removes
     rows before decisions exist — reported in stats as
     ``n_quality_dropped``).

Every stage boundary is a lineage-manifest checkpoint
(state/lineage.py) when ``out_dir`` is set: a re-run resumes from the
last completed stage, and per-stage walls are recorded in
``CorpusResult.stats`` (``wall_clean`` / ``wall_neardup`` /
``wall_semantic`` / ``wall_final``) so a bench can attribute cost.

Scale notes: stages 1 and 4 are map-only / key-disjoint hash joins;
stage 2/3 scale notes live with their own pipelines.  The tier-2 and
tier-3 decision tables are a few int64s per DUPLICATE (not per page),
so the fold joins ship far less than the corpus.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from nxsearch_ray.config import PipelineConfig
from nxsearch_ray.state.lineage import checkpoint

DECISION_SCHEMA = pa.schema([("page_id", pa.int64()),
                             ("drop_tier", pa.int8()),
                             ("dup_of", pa.int64())])
_CLEAN_SCHEMA = pa.schema([("page_id", pa.int64()),
                           ("url", pa.string()),
                           ("text", pa.string())])


@dataclass
class CorpusResult:
    decisions: "object"        # Dataset: page_id, drop_tier, dup_of
    clusters: "object"         # near-dup clusters (pa.Table | Dataset)
    stats: dict = field(default_factory=dict)


@dataclass
class _StageParams:
    """config_hash carrier for lineage manifests of the corpus-only
    stages (the nested dedup/semdedup runs hash their own params)."""

    kw: dict

    def config_hash(self) -> str:
        import hashlib
        import json

        return hashlib.md5(json.dumps(
            self.kw, sort_keys=True).encode()).hexdigest()[:16]


def run_corpus(pages_ds, cfg: PipelineConfig | None = None, *,
               out_dir: str | None = None,
               embeddings_ds=None,
               blocklist: tuple[str, ...] = (),
               min_words: int = 20,
               min_required_stopwords: int = 1,
               scrub: bool = True,
               semdedup_eps: float = 0.93,
               semdedup_nlist: int = 64,
               seed: int = 42,
               verify_mode: str = "auto",
               cc_mode: str = "auto") -> CorpusResult:
    """Run the composed corpus pipeline over a pages Dataset
    (columns ``page_id, url, text`` at minimum).  ``embeddings_ds``
    is an optional ``(vec_id, embedding: list<float>)`` Dataset keyed
    by page id; without it the semantic tier is skipped."""
    import os

    from nxsearch_ray.pipelines.dedup import pin_blocks, run_dedup
    from nxsearch_ray.stages.join import hash_join
    from nxsearch_ray.stages.pii import scrub_pii
    from nxsearch_ray.stages.textstats import gopher_filter
    from nxsearch_ray.stages.urlfilter import filter_blocklist

    cfg = cfg or PipelineConfig()
    stats: dict = {}
    _t = time.monotonic

    # ---------------- stage 1: clean (map-only) ----------------
    clean_params = _StageParams({
        "stage": "clean_pages", "blocklist": sorted(blocklist),
        "min_words": min_words,
        "min_required_stopwords": min_required_stopwords,
        "scrub": scrub, "cfg": cfg.config_hash(), "version": 1})

    def clean_factory():
        ds = pages_ds
        if blocklist:
            ds = filter_blocklist(ds, blocklist)

        def clean_batch(t: pa.Table) -> pa.Table:
            t = gopher_filter(t, min_words=min_words,
                              min_required_stopwords=(
                                  min_required_stopwords))
            t = t.filter(t.column("keep"))
            text = t.column("text")
            if scrub and t.num_rows:
                text = scrub_pii(t).column("clean_text")
            return pa.table({"page_id": t.column("page_id"),
                             "url": t.column("url"),
                             "text": text}, schema=_CLEAN_SCHEMA)

        return ds.map_batches(clean_batch, batch_format="pyarrow")

    t0 = _t()
    clean, skipped = checkpoint(clean_factory, out_dir, "clean_pages",
                                clean_params)
    if out_dir is None:
        clean = pin_blocks(clean)
    stats["clean_pages_resumed"] = skipped
    n_clean = clean.count()
    stats["n_clean_pages"] = n_clean
    stats["wall_clean"] = round(_t() - t0, 2)

    # ---------------- stage 2: near-dup (the flagship) ----------
    t0 = _t()
    ndir = os.path.join(out_dir, "neardup") if out_dir else None
    nd = run_dedup(clean, cfg, out_dir=ndir, verify_mode=verify_mode,
                   cc_mode=cc_mode)
    clusters = nd.clusters          # page_id, cluster_id (= comp min)
    if isinstance(clusters, pa.Table):
        import ray.data as rd

        clusters_ds = rd.from_arrow(clusters)
    else:
        clusters_ds = clusters
    stats.update({f"neardup_{k}": v for k, v in nd.stats.items()})
    stats["wall_neardup"] = round(_t() - t0, 2)

    def t2_decide(t: pa.Table) -> pa.Table:
        ids = t.column("page_id").to_numpy()
        rep = t.column("cluster_id").to_numpy()
        keep = ids == rep           # min member stays
        return pa.table({
            "page_id": pa.array(ids[~keep], type=pa.int64()),
            "dup2": pa.array(rep[~keep], type=pa.int64())})

    t2 = clusters_ds.map_batches(t2_decide, batch_format="pyarrow")
    t2_schema = pa.schema([("page_id", pa.int64()),
                           ("dup2", pa.int64())])

    # ---------------- stage 3: semantic (survivors only) --------
    t3 = None
    t3_schema = pa.schema([("page_id", pa.int64()),
                           ("dup3", pa.int64())])
    if embeddings_ds is not None:
        from nxsearch_ray.stages.semdedup import run_semdedup

        t0 = _t()
        emb_schema = pa.schema([
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32()))])
        # anti-join: survivors' embeddings = embeddings minus tier-2
        # drops (left join + null filter; the right side is only the
        # duplicate rows, far smaller than the corpus)
        j = hash_join(embeddings_ds, t2, left_key="vec_id",
                      right_key="page_id", left_schema=emb_schema,
                      right_schema=t2_schema, right_suffix="",
                      how="left")

        def survivors(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(pc.is_null(t.column("dup2"))) \
                .select(["vec_id", "embedding"])

        surv = j.map_batches(survivors, batch_format="pyarrow")
        # Pin/checkpoint the survivor embeddings BEFORE the semantic
        # tier: (a) semdedup re-reads its input once per pass (census /
        # sub-train / final) — unpinned, each pass would re-execute the
        # whole upstream join; (b) the join lineage carries the scoped
        # hash-shuffle context (stages/shuffle.adopt_hash_context),
        # under which semdedup's own groupbys would run Ray's native
        # hash-shuffle aggregation (64 × 0.2-CPU aggregators) and
        # deadlock a small session.  Severing the lineage restores the
        # default sort-based aggregation and makes each pass a cheap
        # re-read.
        surv_params = _StageParams({
            "stage": "semantic_survivors",
            "clean": clean_params.config_hash(),
            "cfg": cfg.config_hash(), "version": 1})
        if out_dir is not None:
            surv, sk = checkpoint(lambda: surv, out_dir,
                                  "semantic_survivors", surv_params)
            stats["semantic_survivors_resumed"] = sk
        else:
            surv = pin_blocks(surv)
        dec, sd_stats = run_semdedup(
            surv, eps=semdedup_eps, nlist=semdedup_nlist, seed=seed,
            out_dir=out_dir)
        stats.update({f"semantic_{k}": v for k, v in sd_stats.items()})

        def t3_decide(t: pa.Table) -> pa.Table:
            ids = t.column("id").to_numpy()
            dup = t.column("dup_of").to_numpy()
            drop = dup >= 0
            return pa.table({
                "page_id": pa.array(ids[drop], type=pa.int64()),
                "dup3": pa.array(dup[drop], type=pa.int64())})

        t3 = dec.map_batches(t3_decide, batch_format="pyarrow")
        if out_dir is None:
            # same lineage-severing as above: without a checkpoint the
            # fold join would re-trigger semdedup's groupbys under the
            # join's scoped hash-shuffle context
            t3 = pin_blocks(t3)
        stats["wall_semantic"] = round(_t() - t0, 2)

    # ---------------- stage 4: fold decisions -------------------
    t0 = _t()
    final_params = _StageParams({
        "stage": "corpus_final", "clean": clean_params.config_hash(),
        "cfg": cfg.config_hash(), "eps": semdedup_eps,
        "nlist": semdedup_nlist, "seed": seed,
        "semantic": embeddings_ds is not None, "version": 1})

    def final_factory():
        ids_only = clean.select_columns(["page_id"])
        f = hash_join(ids_only, t2, left_key="page_id",
                      right_key="page_id",
                      left_schema=pa.schema([("page_id", pa.int64())]),
                      right_schema=t2_schema, right_suffix="",
                      how="left")
        f_schema = pa.schema([("page_id", pa.int64()),
                              ("dup2", pa.int64())])
        if t3 is not None:
            f = hash_join(f, t3, left_key="page_id",
                          right_key="page_id", left_schema=f_schema,
                          right_schema=t3_schema,
                          right_suffix="", how="left")

        def fold(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            n = t.num_rows
            dup2 = pc.fill_null(t.column("dup2"), -1) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            dup3 = (pc.fill_null(t.column("dup3"), -1)
                    .to_numpy(zero_copy_only=False).astype(np.int64)
                    if "dup3" in t.schema.names
                    else np.full(n, -1, dtype=np.int64))
            tier = np.zeros(n, dtype=np.int8)
            dup = np.full(n, -1, dtype=np.int64)
            m2 = dup2 >= 0
            m3 = ~m2 & (dup3 >= 0)
            tier[m2] = 2
            tier[m3] = 3
            dup[m2] = dup2[m2]
            dup[m3] = dup3[m3]
            return pa.table({
                "page_id": t.column("page_id"),
                "drop_tier": pa.array(tier),
                "dup_of": pa.array(dup)}, schema=DECISION_SCHEMA)

        return f.map_batches(fold, batch_format="pyarrow")

    decisions, skipped = checkpoint(final_factory, out_dir,
                                    "corpus_final", final_params)
    stats["corpus_final_resumed"] = skipped
    if out_dir is None:
        decisions = pin_blocks(decisions)
    stats["wall_final"] = round(_t() - t0, 2)
    return CorpusResult(decisions=decisions, clusters=nd.clusters,
                        stats=stats)


def decisions_as_table(result: CorpusResult) -> pa.Table:
    """Collect the (small) decision table, sorted by page_id."""
    d = result.decisions
    if not isinstance(d, pa.Table):
        batches = list(d.iter_batches(batch_size=1 << 16,
                                      batch_format="pyarrow"))
        d = (pa.concat_tables(batches) if batches
             else DECISION_SCHEMA.empty_table())
    return d.sort_by("page_id")
