"""Generic per-group top-k — the reference's capped results heap as a
Ray Data operator.

The reference serves search results through a capped min-heap with a
default limit of 1000 (src/algo/heap.c:33-221, src/core/results.c:
182-220, NXS_DEFAULT_RESULTS_LIMIT src/core/nxs_impl.h:39).  The
distributed equivalent: every block keeps only its local top-k per
group under the final total order (so the block output is a superset
of each group's global top-k members present in that block), then one
key-disjoint hash exchange co-locates each group and a second
vectorized pass keeps the global top-k.  No per-group Python, no
global sort.

Order: ``order_col`` descending (ascending=False default), ties broken
by ascending ``tie_col`` — deterministic like the reference's doc-id
ordering of equal scores.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DEFAULT_LIMIT = 1000   # reference src/core/nxs_impl.h:39


def _block_topk(group_col: str, order_col: str, tie_col: str,
                k: int, descending: bool, schema: pa.Schema | None = None):
    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            # hash-exchange partitions with zero rows arrive as
            # schema-LESS blocks; emit the pass-through schema so the
            # executor never sees a schema-less RefBundle
            if t.num_columns == 0 and schema is not None:
                return schema.empty_table()
            return t
        gcol = t.column(group_col)
        if pa.types.is_string(gcol.type) or \
                pa.types.is_large_string(gcol.type):
            # block-local dictionary codes: lexsort-able int32 proxy
            # (codes only need to agree WITHIN the block)
            if isinstance(gcol, pa.ChunkedArray):
                gcol = gcol.combine_chunks()
            g = gcol.dictionary_encode().indices.to_numpy(
                zero_copy_only=False)
        else:
            g = gcol.to_numpy(zero_copy_only=False)
        v = t.column(order_col).to_numpy(zero_copy_only=False)
        tie = t.column(tie_col).to_numpy(zero_copy_only=False)
        key_v = -v if descending else v
        order = np.lexsort((tie, key_v, g))
        g_sorted = g[order]
        starts = np.concatenate(
            ([0], np.nonzero(g_sorted[1:] != g_sorted[:-1])[0] + 1))
        run_id = np.cumsum(np.concatenate(
            ([0], (g_sorted[1:] != g_sorted[:-1]).astype(np.int64))))
        rank = np.arange(n) - starts[run_id]
        keep = order[rank < k]
        keep.sort()                      # preserve input row order
        return t.take(pa.array(keep, type=pa.int64()))

    return fn


def topk_per_group(ds, *, group_col: str, order_col: str,
                   tie_col: str, k: int = DEFAULT_LIMIT,
                   descending: bool = True,
                   num_partitions: int | None = None):
    """Keep each group's top ``k`` rows by ``order_col`` (desc by
    default), ties by ascending ``tie_col``; all columns pass through."""
    from nxsearch_ray.stages.shuffle import hash_partitioned

    # pass-through schema for empty exchange partitions (known without
    # execution for read→select lineages; None is a harmless fallback)
    try:
        s = ds.schema(fetch_if_missing=False)
        schema = getattr(s, "base_schema", None)
    except Exception:
        schema = None
    partial = ds.map_batches(
        _block_topk(group_col, order_col, tie_col, k, descending),
        batch_format="pyarrow")
    parts = hash_partitioned(partial, [group_col], num_partitions)
    return parts.map_batches(
        _block_topk(group_col, order_col, tie_col, k, descending,
                    schema),
        batch_format="pyarrow", batch_size=None)
