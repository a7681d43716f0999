"""Exact n-gram Jaccard set-similarity join (distributed).

The classic inverted-index similarity join (Vernica et al., SIGMOD
2010 shape): explode every document's distinct word n-grams to
(ngram_hash, page_id) rows, shuffle on the n-gram, emit co-occurrence
pairs per group, then count distinct shared n-grams per pair with one
more shuffle and compute J = c / (|A| + |B| - c).

Unlike the MinHash path this is *exact* (no sketch error), at the cost
of shuffling every n-gram occurrence — the right tool for small/medium
corpora or as the verifier of sketch-based passes.  N-grams are built
over raw whitespace words (NOT canonical tokens) so the DuckDB oracle
can reproduce the result verbatim; see `__ray_entry__.oracle_sql`.

Hot n-grams (boilerplate) are capped by the same skew policy as LSH
buckets (pairs_within chain) — for the *exact* count stage a capped
bucket under-counts, so the cap only bounds candidate generation;
pairs surviving to the count stage use all their n-grams.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from nxsearch_ray.functions.hashing import hash_strings
from nxsearch_ray.stages.pairs import pairs_within

_WS_RE = None


def _words(text: str) -> list[str]:
    global _WS_RE
    if _WS_RE is None:
        import re

        _WS_RE = re.compile(r"\S+")
    return _WS_RE.findall(text or "")


def ngram_set(text: str, n: int) -> set[str]:
    """Distinct word n-grams, space-joined — the definition shared with
    the SQL oracle (list_transform over regexp_extract_all)."""
    w = _words(text)
    return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}


def explode_ngrams(n: int, id_col: str = "page_id",
                   text_col: str = "text"):
    """map_batches fn: docs → (bucket_key=ngram hash, page_id, n_grams)."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        texts = batch.column(text_col).to_pylist()
        all_grams: list[str] = []
        counts = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            grams = sorted(ngram_set(t, n))
            all_grams.extend(grams)
            counts[i] = len(grams)
        gh = hash_strings(all_grams) if all_grams else \
            np.empty(0, dtype=np.uint64)
        return pa.Table.from_arrays(
            [pa.array(gh, type=pa.uint64()),
             pa.array(np.repeat(ids, counts), type=pa.int64()),
             pa.array(np.repeat(counts, counts), type=pa.int64())],
            names=["bucket_key", "page_id", "setsize"])

    return fn


def ngram_jaccard_pairs(docs_ds, *, n: int = 3, threshold: float = 0.5,
                        id_col: str = "page_id", text_col: str = "text",
                        bucket_cap: int = 4096):
    """Dataset of (a, b, n_common, size_a, size_b, jaccard) for all doc
    pairs with word-n-gram Jaccard ≥ threshold."""
    keyed = docs_ds.map_batches(explode_ngrams(n, id_col, text_col),
                                batch_format="pyarrow")

    def emit(group: pa.Table) -> pa.Table:
        ids = group.column("page_id").to_numpy()
        sizes = group.column("setsize").to_numpy()
        size_of = dict(zip(ids.tolist(), sizes.tolist()))
        a, b = pairs_within(ids, bucket_cap)
        return pa.Table.from_arrays(
            [pa.array(a, type=pa.int64()), pa.array(b, type=pa.int64()),
             pa.array([size_of[x] for x in a.tolist()], type=pa.int64()),
             pa.array([size_of[x] for x in b.tolist()], type=pa.int64())],
            names=["a", "b", "size_a", "size_b"])

    co = keyed.groupby("bucket_key").map_groups(emit,
                                                batch_format="pyarrow")

    # One co-occurrence row per shared n-gram per pair, each carrying
    # both (constant) set sizes → a single groupby computes the exact
    # intersection count AND the Jaccard.
    thr = threshold
    out_schema = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("n_common", pa.int64()),
         ("size_a", pa.int64()), ("size_b", pa.int64()),
         ("jaccard", pa.float64())])

    def combine(g: pa.Table) -> pa.Table:
        n_common = g.num_rows
        size_a = g.column("size_a")[0].as_py()
        size_b = g.column("size_b")[0].as_py()
        denom = size_a + size_b - n_common
        jac = (n_common / denom) if denom else 0.0
        if jac < thr:
            return out_schema.empty_table()
        return pa.Table.from_arrays(
            [g.column("a").slice(0, 1), g.column("b").slice(0, 1),
             pa.array([n_common], type=pa.int64()),
             pa.array([size_a], type=pa.int64()),
             pa.array([size_b], type=pa.int64()),
             pa.array([jac], type=pa.float64())],
            schema=out_schema)

    return co.groupby(["a", "b"]).map_groups(combine,
                                             batch_format="pyarrow")
