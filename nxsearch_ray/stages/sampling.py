"""Deterministic stratified sampling — uniform k per group for corpus
balancing (per-language / per-domain caps in training-data pipelines).

Selection is hash-ordered: each row gets a pseudo-random key
``hash(seed | group | id)`` and the k smallest keys per group win —
the distributed equivalent of a per-stratum uniform sample that is
reproducible across runs, partition counts, and engines.  The heavy
lifting is the existing per-group top-k operator
(`stages.topk.topk_per_group`: block-local cap, one key-disjoint
exchange, vectorized final cap).

Two key functions:
  * ``method="md5"`` — hashlib md5 of the decimal-rendered triple;
    inherently per-row but exactly reproducible in DuckDB
    (`stratified_sample_sql`), so the driver oracle hash-checks the
    sample;
  * ``method="fnv"`` — the repo's vectorized 64-bit string hash
    (`functions.hashing.hash_strings`), the scale path (no SQL twin).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from nxsearch_ray.functions.hashing import hash_strings
from nxsearch_ray.stages.topk import topk_per_group


def _key_batch(batch: pa.Table, *, group_col: str, id_col: str,
               seed: int, method: str) -> pa.Table:
    trip = pc.binary_join_element_wise(
        str(seed), "|",
        pc.cast(batch.column(group_col), pa.string()), "|",
        pc.cast(batch.column(id_col), pa.string()), "")
    if method == "md5":
        # per-row by necessity: md5 is the only digest DuckDB shares
        keys = pa.array(
            [hashlib.md5(s.encode()).hexdigest()
             for s in trip.to_pylist()], type=pa.string())
    elif method == "fnv":
        if isinstance(trip, pa.ChunkedArray):
            trip = trip.combine_chunks()
        bufs = trip.buffers()
        offs = np.frombuffer(bufs[1], dtype=np.int32)[
            trip.offset:trip.offset + len(trip) + 1].astype(np.int64)
        data = np.frombuffer(bufs[2], dtype=np.uint8) \
            if bufs[2] is not None else np.empty(0, np.uint8)
        keys = pa.array(hash_strings(offsets=offs, data=data)
                        .view(np.int64), type=pa.int64())
    else:
        raise ValueError(f"unknown sample key method {method!r}")
    return batch.append_column("sample_key", keys)


def stratified_sample(ds, *, group_col: str, id_col: str, k: int,
                      seed: int = 0, method: str = "md5",
                      num_partitions: int | None = None):
    """Uniform deterministic sample of ``k`` rows per ``group_col``
    value.  SQL twin (md5 method): `stratified_sample_sql`."""
    keyed = ds.map_batches(
        lambda b: _key_batch(b, group_col=group_col, id_col=id_col,
                             seed=seed, method=method),
        batch_format="pyarrow")
    out = topk_per_group(keyed, group_col=group_col,
                         order_col="sample_key", tie_col=id_col,
                         k=k, descending=False,
                         num_partitions=num_partitions)
    return out.drop_columns(["sample_key"])


def stratified_sample_sql(table: str, *, group_col: str, id_col: str,
                          columns: str, k: int, seed: int = 0) -> str:
    """DuckDB query mirroring the md5-keyed sample."""
    key = f"md5('{seed}' || '|' || {group_col} || '|' || {id_col})"
    return f"""
SELECT {columns} FROM (
  SELECT {columns},
         row_number() OVER (PARTITION BY {group_col}
                            ORDER BY {key}, {id_col}) AS rn
  FROM {table})
WHERE rn <= {k}
"""
