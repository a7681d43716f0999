"""Skew / corpus diagnostics.

The reference tracks global term totals with atomic counters in shared
mmap (reference src/index/idxterm.c:267-313); the distributed
equivalent for skew detection is a bucket-size census over the
exploded candidate keys (SURVEY.md §2.5 A2: "for dedup only
*bucket-size* stats matter") — the pre-pass the skew policy is tuned
from.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from nxsearch_ray.config import PipelineConfig


def duplicate_page_ids(pages_ds, id_col: str = "page_id") -> pa.Table:
    """Ids appearing on more than one row — the distributed analogue of
    the reference's duplicate-doc-id ingest guard (reference
    src/core/nxs.c:505-511 rejects an already-indexed doc_id; the
    hashed-id pipeline instead surfaces collisions/duplicates as a
    diagnostic).  One native Count aggregation; returns a small table
    ``(page_id, n_rows)`` with n_rows ≥ 2 — empty means ids are unique
    (the pipeline's input contract)."""
    import pyarrow.compute as pc
    from ray.data import aggregate as agg

    counts = pages_ds.select_columns([id_col]) \
        .groupby(id_col).aggregate(agg.Count())

    def keep_dups(t: pa.Table) -> pa.Table:
        t = t.rename_columns([id_col, "n_rows"])
        return t.filter(pc.greater_equal(t.column("n_rows"), 2))

    out = counts.map_batches(keep_dups, batch_format="pyarrow")
    batches = list(out.iter_batches(batch_size=1 << 20,
                                    batch_format="pyarrow"))
    schema = pa.schema([(id_col, pa.int64()), ("n_rows", pa.int64())])
    batches = [b for b in batches if b.num_columns > 0]
    return pa.concat_tables(batches) if batches else schema.empty_table()


def bucket_census(signatures_ds, cfg: PipelineConfig):
    """Histogram of candidate-bucket sizes per source:
    (source, bucket_size, n_buckets).  One shuffle (sort) + vectorized
    run-length count per block + a small final groupby."""
    from nxsearch_ray.stages.pairs import SRC_NAMES, explode_all

    keyed = signatures_ds.map_batches(explode_all(cfg.to_json()),
                                      batch_format="pyarrow")

    def block_counts(t: pa.Table) -> pa.Table:
        keys = t.column("bucket_key").to_numpy()
        srcs = t.column("src").to_numpy()
        n = len(keys)
        if n == 0:
            return pa.schema([("src", pa.int8()),
                              ("bucket_size", pa.int64()),
                              ("n_buckets", pa.int64())]).empty_table()
        change = np.nonzero((keys[1:] != keys[:-1])
                            | (srcs[1:] != srcs[:-1]))[0] + 1
        starts = np.concatenate(([0], change))
        counts = np.diff(np.concatenate((starts, [n])))
        run_src = srcs[starts]
        # (src, size) histogram via lexsort-unique
        order = np.lexsort((counts, run_src))
        rs, rc = run_src[order], counts[order]
        uniq = np.ones(len(rs), dtype=bool)
        uniq[1:] = (rs[1:] != rs[:-1]) | (rc[1:] != rc[:-1])
        ustart = np.nonzero(uniq)[0]
        freq = np.diff(np.concatenate((ustart, [len(rs)])))
        return pa.Table.from_arrays(
            [pa.array(rs[ustart], type=pa.int8()),
             pa.array(rc[ustart].astype(np.int64)),
             pa.array(freq.astype(np.int64))],
            names=["src", "bucket_size", "n_buckets"])

    partial = keyed.sort(["bucket_key", "src"]).map_batches(
        block_counts, batch_format="pyarrow", batch_size=None)
    # block-boundary splits can split one bucket across two counts —
    # acceptable for a diagnostic histogram (±1 per boundary)
    out = partial.groupby(["src", "bucket_size"]).sum("n_buckets")

    def finish(t: pa.Table) -> pa.Table:
        codes = t.column("src").to_numpy()
        return pa.Table.from_arrays(
            [pa.array([SRC_NAMES[int(c)] for c in codes],
                      type=pa.string()),
             t.column("bucket_size"),
             t.column("sum(n_buckets)").cast(pa.int64())],
            names=["source", "bucket_size", "n_buckets"])

    return out.map_batches(finish, batch_format="pyarrow")
