"""Fuzzy term lookup over the corpus vocabulary.

The analogue of the reference's ``idxterm_fuzzysearch``
(src/index/idxterm.c:210-249): an unresolved token is matched against
the term vocabulary with a BK-tree at Levenshtein tolerance 2
(LEVDIST_TOLERANCE, src/index/index.h:26) and resolved to the MOST
FREQUENT candidate (``idxterm_get_total`` — total occurrences across
the corpus).  Pick rule here: exact hit (distance 0) wins outright,
else highest total, ties broken by smallest term (the reference's
selection loop *intends* max-total — its comparison variable is never
updated, an upstream quirk we do not replicate; the deterministic
tie-break is ours, the reference has none).

Dataflow:

  * **vocabulary** — one hash exchange over the canonical token table:
    explode (term, 1) rows, partition by term, per-block run count →
    (term, total).  Term strings are required, so the canonicalization
    stage must run with ``include_tokens=True``.
  * **vocabulary index** — built in one remote task (sorted term array
    + totals), broadcast by ObjectRef.
  * **bulk lookup** — an actor pool: each actor builds the BK-tree
    ONCE in ``__init__`` from the broadcast index (sorted-order
    inserts → identical tree on every actor), then resolves its
    batches; per-probe BK-tree search is the reference's own
    algorithm and cost shape.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from nxsearch_ray.functions.bktree import BKTree

TOLERANCE = 2   # reference src/index/index.h:26 LEVDIST_TOLERANCE


def vocabulary(canonical_tokens_ds, *, num_partitions: int | None = None):
    """(term, total) Dataset from a canonicalized Dataset carrying the
    ``tokens`` list<string> column."""
    from nxsearch_ray.stages.shuffle import hash_partitioned

    def explode(t: pa.Table) -> pa.Table:
        col = t.column("tokens")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pa.table({"term": col.flatten()})

    keyed = canonical_tokens_ds.select_columns(["tokens"]) \
        .map_batches(explode, batch_format="pyarrow")

    def count_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("term", pa.string()),
                              ("total", pa.int64())]).empty_table()
        terms = t.column("term")
        counts = terms.value_counts()
        return pa.table({"term": counts.field("values"),
                         "total": counts.field("counts")})

    return hash_partitioned(keyed, ["term"], num_partitions) \
        .map_batches(count_block, batch_format="pyarrow",
                     batch_size=None)


def build_vocab_index_ref(vocab_ds):
    """Sorted (terms, totals) arrays in one remote task → ObjectRef."""
    import ray

    refs = vocab_ds.to_arrow_refs()

    @ray.remote
    def _build(*blocks):
        blocks = [b for b in blocks if b.num_columns > 0]
        if not blocks:
            return {"terms": [], "totals": np.empty(0, np.int64)}
        t = pa.concat_tables(blocks)
        terms = np.asarray(t.column("term").to_pylist(), dtype=object)
        totals = t.column("total").to_numpy()
        order = np.argsort(terms, kind="stable")
        return {"terms": terms[order].tolist(),
                "totals": totals[order].astype(np.int64)}

    return _build.remote(*refs)


def pick_candidate(cands: list[tuple[str, int]],
                   totals_of) -> str | None:
    """Selection rule shared by the actor and tests: exact hit wins;
    else max total, tie → smallest term."""
    if not cands:
        return None
    for term, d in cands:
        if d == 0:
            return term
    best = None
    best_key = None
    for term, _d in cands:
        key = (-int(totals_of(term)), term)
        if best_key is None or key < best_key:
            best_key = key
            best = term
    return best


class FuzzyLookupActor:
    """Per-actor BK-tree over the broadcast vocabulary; resolves a
    ``word`` column to (matched_term, distance, total)."""

    def __init__(self, vocab_ref, tolerance: int = TOLERANCE,
                 word_col: str = "word"):
        import ray

        v = ray.get(vocab_ref) if not isinstance(vocab_ref, dict) \
            else vocab_ref
        self.terms = v["terms"]
        self.totals = v["totals"]
        self.tree = BKTree(self.terms)       # sorted-order inserts
        self.tolerance = tolerance
        self.word_col = word_col
        self._pos = {t: i for i, t in enumerate(self.terms)}

    def resolve(self, word: str) -> tuple[str | None, int]:
        cands = self.tree.search(word, self.tolerance)
        pick = pick_candidate(
            cands, lambda t: self.totals[self._pos[t]])
        if pick is None:
            return None, -1
        d = next(d for t, d in cands if t == pick)
        return pick, d

    def __call__(self, batch: pa.Table) -> pa.Table:
        words = batch.column(self.word_col).to_pylist()
        matched: list[str | None] = []
        dist = np.full(len(words), -1, dtype=np.int32)
        tot = np.zeros(len(words), dtype=np.int64)
        for i, w in enumerate(words):
            m, d = self.resolve(w or "")
            matched.append(m)
            if m is not None:
                dist[i] = d
                tot[i] = self.totals[self._pos[m]]
        return batch.append_column(
            "matched_term", pa.array(matched, type=pa.string())) \
            .append_column("distance", pa.array(dist)) \
            .append_column("term_total", pa.array(tot))


def fuzzy_lookup(words_ds, vocab_ref, *, tolerance: int = TOLERANCE,
                 word_col: str = "word", concurrency=None):
    from nxsearch_ray.stages.shuffle import actor_pool_size

    if concurrency is None:
        concurrency = actor_pool_size(0.5)
    return words_ds.map_batches(
        FuzzyLookupActor,
        fn_constructor_args=(vocab_ref, tolerance, word_col),
        batch_format="pyarrow", batch_size=4096,
        concurrency=concurrency, num_cpus=1)
