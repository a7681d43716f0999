"""Unigram language-model quality scoring (CCNet-style).

CCNet (Wenzek et al., "CCNet: Extracting high quality monolingual
datasets from web crawl data", arXiv:1911.00359, public) ranks web
documents by LM perplexity and keeps the low-perplexity head.  The
full pipeline uses a 5-gram KenLM; a KenLM binary is library-bound in
this container, so this stage implements the UNIGRAM member of the
family exactly — the corpus's own maximum-likelihood unigram model —
which is fully SQL-twinnable and exercises the identical Ray dataflow
a KenLM scorer needs (census/model build -> broadcast -> streaming
actor-pool lookup).  Swapping in a real KenLM means replacing only
the per-batch lookup kernel.

Tokenization matches the repo's WORD_RE census convention
(stages/textstats.py WORD_RE = \\S+ over lowercased text), i.e.
DuckDB ``regexp_extract_all(lower(text), '\\S+')``.

Scale plan (100 TB):
  1. census — map_batches pre-aggregates per-batch word counts (the
     combiner) so the groupby shuffles VOCABULARY rows, not token
     rows; one native groupby sum.
  2. model — ONE remote task folds the census blocks into sorted
     (word, logp) arrays; optional ``vocab_cap`` keeps the top-V
     words by (count desc, word asc) — deterministic — and OOV
     tokens fall back to an add-one floor.  The model is MBs at any
     corpus size once capped, broadcast via ray.put.
  3. score — stateless task pool: per batch, one vectorized
     searchsorted lookup + segmented mean.  No shuffle.

log p(w) is computed as ``ln(n_w / N)`` (divide THEN log, matching
the SQL twin bit-for-bit); per-doc logloss = mean over tokens of
``-ln p``; perplexity = ``exp(logloss)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SCORE_SCHEMA = pa.schema([("doc_id", pa.int64()),
                          ("n_tokens", pa.int64()),
                          ("logloss", pa.float64()),
                          ("perplexity", pa.float64())])


def _tokens(batch: pa.Table, text_col: str):
    """(parent_row_index, token) for WORD_RE = \\S+ over lower(text),
    fully vectorized: split on \\s+ and drop the boundary empties."""
    low = pc.utf8_lower(batch.column(text_col))
    lists = pc.split_pattern_regex(low, pattern=r"\s+")
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists)
    nonempty = pc.not_equal(flat, "")
    return (pc.filter(parents, nonempty).to_numpy(),
            pc.filter(flat, nonempty))


def unigram_census(docs_ds, *, text_col: str = "text"):
    """(word, n) corpus census with a per-batch combiner."""

    def partial(batch: pa.Table) -> pa.Table:
        _, toks = _tokens(batch, text_col)
        vc = pc.value_counts(toks)      # StructArray (values, counts)
        return pa.table({"word": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    return docs_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("word").sum("n")


def unigram_model_ref(census_ds, *, vocab_cap: int | None = None):
    """Fold the census into ONE object-store model: sorted word array
    + aligned ``ln(n/N)`` array + the OOV floor ``ln(1/(N+V))``.
    Built in a remote task — the driver never holds the vocabulary."""
    import ray

    refs = census_ds.to_arrow_refs()

    @ray.remote
    def _build(*blocks):
        tbs = [t for t in blocks if t.num_columns]
        t = pa.concat_tables(tbs) if tbs else pa.table(
            {"word": pa.array([], type=pa.string()),
             "n": pa.array([], type=pa.int64())})
        words = np.asarray(t.column("word").to_pylist(), dtype=object)
        n = t.column("sum(n)" if "sum(n)" in t.column_names
                     else "n").to_numpy().astype(np.float64)
        total = n.sum()
        vsize = len(words)
        if vocab_cap is not None and vsize > vocab_cap:
            keep = np.lexsort((words, -n))[:vocab_cap]
            words, n = words[keep], n[keep]
        order = np.argsort(words)
        words, n = words[order], n[order]
        logp = np.log(n / total) if total else n
        floor = float(np.log(1.0 / (total + vsize))) if total else 0.0
        return {"words": words.astype(np.str_), "logp": logp,
                "floor": floor}

    return _build.remote(*refs)


class UnigramScorer:
    """Task-pool kernel: model fetched once per worker (plasma,
    zero-copy for the float array), vectorized lookup + segmented
    mean per batch."""

    def __init__(self, model_ref, id_col: str = "doc_id",
                 text_col: str = "text"):
        import ray
        m = ray.get(model_ref) if not isinstance(model_ref, dict) \
            else model_ref
        self.words = m["words"]
        self.logp = m["logp"]
        self.floor = m["floor"]
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy()
        parents, toks = _tokens(batch, self.text_col)
        # dtype=np.str_ keeps each token's full width — casting to the
        # model's itemsize would TRUNCATE longer OOV tokens into false
        # vocabulary hits; numpy compares unicode arrays of different
        # itemsize correctly
        tok_np = np.asarray(toks.to_pylist(), dtype=np.str_)
        if len(self.words):
            pos = np.searchsorted(self.words, tok_np)
            pos_c = np.clip(pos, 0, len(self.words) - 1)
            hit = self.words[pos_c] == tok_np
            lp = np.where(hit, self.logp[pos_c], self.floor)
        else:
            lp = np.full(len(tok_np), self.floor)
        n_tok = np.bincount(parents, minlength=batch.num_rows) \
            .astype(np.int64)
        sums = np.bincount(parents, weights=-lp,
                           minlength=batch.num_rows)
        has = n_tok > 0
        logloss = np.divide(sums, n_tok, out=np.zeros_like(sums),
                            where=has)
        out = pa.Table.from_arrays(
            [pa.array(ids[has], type=pa.int64()),
             pa.array(n_tok[has]),
             pa.array(logloss[has], type=pa.float64()),
             pa.array(np.exp(logloss[has]), type=pa.float64())],
            schema=SCORE_SCHEMA)
        return out


def lm_perplexity(docs_ds, *, id_col: str = "doc_id",
                  text_col: str = "text",
                  vocab_cap: int | None = None, model_ref=None,
                  concurrency=(1, 8)):
    """Per-document unigram perplexity against the corpus's own MLE
    unigram model (or a prebuilt ``model_ref``).  Documents with zero
    tokens are omitted (no defined perplexity), matching the SQL
    twin's inner join."""
    if model_ref is None:
        model_ref = unigram_model_ref(
            unigram_census(docs_ds, text_col=text_col),
            vocab_cap=vocab_cap)
    return docs_ds.map_batches(
        UnigramScorer, fn_constructor_args=(model_ref, id_col,
                                            text_col),
        batch_format="pyarrow", batch_size=1024,
        concurrency=concurrency, num_cpus=1)
