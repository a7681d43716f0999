"""Distributed prefix scan + token-budget sequence packing and exact
column quantiles — corpus-preparation operators for training pipelines.

``pack_sequences`` assigns every document to a training-sequence pack
by its starting offset in the global token stream (documents in
``order_col`` order, ``pack_id = token_start // budget``).  This is
the associative formulation of sequence packing: it needs only a
global prefix sum, so it distributes as the classic two-phase scan —
per-block partial sums (tiny driver collect: one int per block), then
an embarrassingly-parallel offset pass.  Ray Data has no scan
primitive, so phase 2 runs as one raw Ray task per sorted block
(documented Dataset-API gap; everything else in this repo is Dataset
operators).  A greedy never-split-never-overflow packer would make
pack boundaries depend on running state that crosses blocks
non-associatively — this streaming-chunk formulation is what a 100 TB
corpus can actually compute in two passes, and it is exactly
SQL-expressible (window cumsum), so the DuckDB oracle checks it
bit-for-bit.

``exact_quantiles`` computes exact discrete quantiles (DuckDB
``quantile_disc`` semantics: the ``ceil(q*n)``-th smallest value) from
a distributed value census — one ``groupby(col).count()`` whose result
is at most the number of DISTINCT values (token counts, lengths:
thousands, not corpus-sized), merged on the driver.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from nxsearch_ray.stages.textstats import WORD_RE


def count_tokens(batch: pa.Table, *, text_col: str = "text",
                 out_col: str = "n_tokens") -> pa.Table:
    """Append the whitespace-token count (same WORD_RE as doc_stats,
    SQL twin: len(regexp_extract_all(text, '\\S+')))."""
    n = pc.count_substring_regex(batch.column(text_col), WORD_RE)
    return batch.append_column(out_col, n.cast(pa.int64()))


def pack_sequences(ds, *, budget: int, order_col: str = "doc_id",
                   text_col: str = "text",
                   count_col: str | None = None):
    """Assign documents to token-budget packs; returns a Dataset of
    ``(order_col, n_tokens, pack_id, pack_offset)``.

    ``pack_id = token_start // budget`` where token_start is the
    document's offset in the corpus token stream ordered by
    ``order_col``; ``pack_offset`` is its position inside the pack.
    SQL twin: `pack_sequences_sql`."""
    import ray

    if count_col is None:
        ds = ds.map_batches(
            lambda b: count_tokens(b, text_col=text_col)
            .select([order_col, "n_tokens"]),
            batch_format="pyarrow")
        count_col = "n_tokens"
    else:
        ds = ds.select_columns([order_col, count_col])

    # phase 0: range-partition into globally ordered blocks
    blocks = ds.sort(order_col).materialize()
    refs = [r for r in blocks.to_arrow_refs()]
    if not refs:
        import ray.data
        return ray.data.from_arrow(pa.schema([
            (order_col, pa.int64()), ("n_tokens", pa.int64()),
            ("pack_id", pa.int64()),
            ("pack_offset", pa.int64())]).empty_table())

    @ray.remote
    def block_sum(t: pa.Table) -> int:
        if t.num_columns == 0 or t.num_rows == 0:
            return 0
        return int(pc.sum(t.column(count_col)).as_py() or 0)

    # phase 1: per-block totals — one int per block to the driver
    sums = ray.get([block_sum.remote(r) for r in refs])
    starts = np.zeros(len(sums), dtype=np.int64)
    np.cumsum(sums[:-1], out=starts[1:])

    @ray.remote
    def assign(t: pa.Table, base: int) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema([
                (order_col, pa.int64()), ("n_tokens", pa.int64()),
                ("pack_id", pa.int64()),
                ("pack_offset", pa.int64())]).empty_table()
        c = t.column(count_col).to_numpy().astype(np.int64)
        start = base + np.r_[0, np.cumsum(c[:-1])]
        return pa.table({
            order_col: t.column(order_col),
            "n_tokens": pa.array(c, type=pa.int64()),
            "pack_id": pa.array(start // budget, type=pa.int64()),
            "pack_offset": pa.array(start % budget, type=pa.int64()),
        })

    # phase 2: embarrassingly parallel offset pass
    import ray.data
    out_refs = [assign.remote(r, int(b)) for r, b in zip(refs, starts)]
    return ray.data.from_arrow_refs(out_refs)


def pack_sequences_sql(table: str = "documents", *, budget: int,
                       order_col: str = "doc_id") -> str:
    """DuckDB query mirroring `pack_sequences`."""
    return f"""
WITH c AS (
  SELECT {order_col},
         len(regexp_extract_all(text, '{WORD_RE}'))::BIGINT AS n_tokens
  FROM {table}),
s AS (
  SELECT {order_col}, n_tokens,
         coalesce(sum(n_tokens) OVER (
             ORDER BY {order_col}
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0)::BIGINT AS token_start
  FROM c)
SELECT {order_col}, n_tokens,
       (token_start // {budget})::BIGINT AS pack_id,
       (token_start % {budget})::BIGINT AS pack_offset
FROM s
"""


DEFAULT_QS = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99)


def exact_quantiles(ds, col: str, qs=DEFAULT_QS) -> pa.Table:
    """Exact discrete quantiles of an integer-ish column via a
    distributed value census: ``groupby(col).count()`` (result size =
    distinct values), merged and inverted on the driver.  Matches
    DuckDB ``quantile_disc`` (the ceil(q·n)-th smallest value)."""
    import ray

    census = ds.groupby(col).count()
    parts = [ray.get(r) for r in census.to_arrow_refs()]
    parts = [p for p in parts if p.num_columns > 0 and p.num_rows > 0]
    if not parts:
        return pa.table({"q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.int64())})
    t = pa.concat_tables(parts)
    vals = t.column(col).to_numpy()
    cnts = t.column("count()").to_numpy().astype(np.int64)
    order = np.argsort(vals)
    vals, cnts = vals[order], cnts[order]
    cum = np.cumsum(cnts)
    n = int(cum[-1])
    out = []
    for q in qs:
        rank = max(int(math.ceil(q * n)), 1)      # 1-based
        out.append(vals[int(np.searchsorted(cum, rank))])
    return pa.table({"q": pa.array(list(qs), pa.float64()),
                     "value": pa.array(out)})


def exact_quantiles_sql(table: str, value_expr: str,
                        qs=DEFAULT_QS) -> str:
    """DuckDB query mirroring `exact_quantiles` over value_expr."""
    return f"""
WITH vals AS (SELECT {value_expr} AS v FROM {table})
SELECT * FROM (
  SELECT unnest([{", ".join(str(q) for q in qs)}]) AS q,
         unnest([{", ".join(f"quantile_disc(v, {q})" for q in qs)}])
           AS value
  FROM vals)
"""


def exact_quantiles_sorted(ds, col: str, qs=DEFAULT_QS) -> pa.Table:
    """Exact discrete quantiles for columns where a value census would
    be corpus-sized (floats, all-distinct values): one distributed
    ``sort(col)`` — blocks come back range-ordered — then the
    ceil(q·n)-th row is located by per-block row counts (metadata) and
    only those blocks are fetched.  Same quantile_disc semantics as
    `exact_quantiles`."""
    import ray

    blocks = ds.select_columns([col]).sort(col).materialize()
    refs = blocks.to_arrow_refs()

    @ray.remote
    def nrows(t: pa.Table) -> int:
        return t.num_rows if t.num_columns else 0

    counts = np.asarray(ray.get([nrows.remote(r) for r in refs]),
                        dtype=np.int64)
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0
    if n == 0:
        return pa.table({"q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.float64())})

    @ray.remote
    def fetch(t: pa.Table, idxs: list) -> list:
        c = t.column(col)
        return [c[i].as_py() for i in idxs]

    # group the wanted global ranks by owning block; fetch each block once
    per_block: dict[int, list[tuple[int, int]]] = {}
    for qi, q in enumerate(qs):
        rank = max(int(math.ceil(q * n)), 1) - 1      # 0-based global
        b = int(np.searchsorted(cum, rank + 1))
        local = rank - (int(cum[b - 1]) if b else 0)
        per_block.setdefault(b, []).append((qi, local))
    out: list = [None] * len(qs)
    got = ray.get([fetch.remote(refs[b], [loc for _, loc in pairs])
                   for b, pairs in per_block.items()])
    for pairs, vals in zip(per_block.values(), got):
        for (qi, _), v in zip(pairs, vals):
            out[qi] = v
    return pa.table({"q": pa.array(list(qs), pa.float64()),
                     "value": pa.array(out)})


def chunk_documents(batch: pa.Table, *, text_col: str = "text",
                    id_col: str = "doc_id", chunk_tokens: int = 128,
                    overlap: int = 32) -> pa.Table:
    """Explode documents into overlapping token windows — the
    RAG/pretraining chunker.  Chunk ``i`` covers words
    ``[i*stride, i*stride + chunk_tokens)`` with
    ``stride = chunk_tokens - overlap``; the last chunk is the ragged
    tail.  Fully vectorized (segment arithmetic + one ``take`` + one
    ``binary_join``); SQL twin: `chunk_documents_sql`."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    parts = pc.split_pattern(text, " ")
    offsets = parts.offsets.to_numpy().astype(np.int64)
    n = np.diff(offsets)                              # words per doc
    n_chunks = 1 + (np.maximum(n - chunk_tokens, 0) + stride - 1) \
        // stride
    doc_of_chunk = np.repeat(np.arange(len(batch)), n_chunks)
    cstarts = np.zeros(len(batch) + 1, dtype=np.int64)
    np.cumsum(n_chunks, out=cstarts[1:])
    chunk_no = np.arange(int(n_chunks.sum()), dtype=np.int64) - \
        np.repeat(cstarts[:-1], n_chunks)
    w_start = chunk_no * stride                       # within-doc
    w_end = np.minimum(w_start + chunk_tokens, n[doc_of_chunk])
    lens = w_end - w_start
    # gather indices: for each chunk, arange(w_start, w_end) offset by
    # the doc's word base
    base = offsets[:-1][doc_of_chunk] + w_start
    total = int(lens.sum())
    gstarts = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=gstarts[1:])
    idx = np.arange(total, dtype=np.int64) - \
        np.repeat(gstarts[:-1], lens) + np.repeat(base, lens)
    taken = parts.values.take(pa.array(idx, type=pa.int64()))
    lst = pa.ListArray.from_arrays(
        pa.array(gstarts, type=pa.int32()), taken)
    return pa.table({
        id_col: batch.column(id_col).take(
            pa.array(doc_of_chunk, type=pa.int64())),
        "chunk_no": pa.array(chunk_no, type=pa.int64()),
        "n_chunk_tokens": pa.array(lens, type=pa.int64()),
        "chunk_text": pc.binary_join(lst, " "),
    })


def chunk_documents_sql(table: str = "documents", *,
                        id_col: str = "doc_id",
                        chunk_tokens: int = 128,
                        overlap: int = 32) -> str:
    """DuckDB query mirroring `chunk_documents`."""
    stride = chunk_tokens - overlap
    return f"""
WITH w AS (
  SELECT {id_col}, string_split(text, ' ') AS ws,
         len(string_split(text, ' ')) AS n
  FROM {table}),
c AS (
  SELECT {id_col}, ws, n,
         1 + (greatest(n - {chunk_tokens}, 0) + {stride} - 1)
             // {stride} AS n_chunks
  FROM w),
u AS (
  SELECT {id_col}, ws, n,
         unnest(range(0, n_chunks)) AS chunk_no
  FROM c)
SELECT {id_col}, chunk_no::BIGINT AS chunk_no,
       (least(chunk_no * {stride} + {chunk_tokens}, n)
        - chunk_no * {stride})::BIGINT AS n_chunk_tokens,
       array_to_string(list_slice(
         ws, chunk_no * {stride} + 1,
         least(chunk_no * {stride} + {chunk_tokens}, n)), ' ')
         AS chunk_text
FROM u
"""
