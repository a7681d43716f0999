"""Partitioned hash join for Ray Data (both-sides-large path).

Ray 2.49 has no general `Dataset.join`; the portable pattern (per the
Ray docs guidance) is: add ``bucket = hash(key) % B`` to both sides,
shuffle both on the bucket, and join matching buckets inside
`map_groups`.  Arrow's Acero join rejects list-typed payload columns
(our minhash/bottomk), so the within-bucket join is a numpy
searchsorted + ``Table.take`` gather, which supports every Arrow type.

This is the engine's hash-join operator (the distributed analogue of
the reference's token→term hash-lookup semi-join ``tokenset_resolve``,
reference src/core/tokenizer.c:160-199).  Small-side joins should use
broadcast lookups instead (see stages/verify.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from nxsearch_ray.functions.hashing import splitmix64


def hash_join(left_ds, right_ds, *, left_key: str, right_key: str,
              left_schema: pa.Schema, right_schema: pa.Schema,
              num_buckets: int = 64, right_suffix: str = "_r"):
    """Inner-join ``left[left_key] == right[right_key]``.

    Schemas are passed explicitly (Ray schemas are lazy; passing them
    avoids triggering execution just to inspect).  The right side must
    be unique per key (true for signature/canonical tables keyed by
    page_id); every matching left row appears exactly once in the
    output, with right payload columns suffixed ``right_suffix``.
    ``num_buckets`` bounds group count per shuffle; hot keys are not a
    concern here because the right side is unique per key.
    """
    left_names = [f.name for f in left_schema]
    payload_fields = [pa.field(f.name + right_suffix, f.type)
                      for f in right_schema if f.name != right_key]
    payload_names = [f.name for f in payload_fields]
    out_schema = pa.schema(list(left_schema) + payload_fields)

    union_schema = pa.schema(
        [pa.field("__side", pa.int8()), pa.field("__bucket", pa.int32()),
         pa.field("__key", pa.int64())]
        + list(left_schema) + payload_fields)

    def prepare(side: int, key: str, rename: dict[str, str]):
        def fn(t: pa.Table) -> pa.Table:
            k = t.column(key).to_numpy().astype(np.int64)
            b = (splitmix64(k.astype(np.uint64))
                 % np.uint64(num_buckets)).astype(np.int32)
            cols = {rename.get(c, c): t.column(c) for c in t.column_names}
            out = []
            for f in union_schema:
                if f.name == "__side":
                    out.append(pa.array(
                        np.full(t.num_rows, side, dtype=np.int8)))
                elif f.name == "__bucket":
                    out.append(pa.array(b))
                elif f.name == "__key":
                    out.append(pa.array(k, type=pa.int64()))
                elif f.name in cols:
                    out.append(cols[f.name].cast(f.type))
                else:
                    out.append(pa.nulls(t.num_rows, type=f.type))
            return pa.Table.from_arrays(out, schema=union_schema)
        return fn

    left_t = left_ds.map_batches(prepare(0, left_key, {}),
                                 batch_format="pyarrow")
    right_t = right_ds.map_batches(
        prepare(1, right_key,
                {f.name: f.name + right_suffix
                 for f in right_schema if f.name != right_key}),
        batch_format="pyarrow")

    def join_group(g: pa.Table) -> pa.Table:
        side = g.column("__side").to_numpy()
        keys = g.column("__key").to_numpy()
        lmask = side == 0
        lt = g.filter(pa.array(lmask))
        rt = g.filter(pa.array(~lmask))
        rkeys = keys[~lmask]
        if lt.num_rows == 0 or rt.num_rows == 0:
            return out_schema.empty_table()
        order = np.argsort(rkeys, kind="stable")
        rsorted = rkeys[order]
        lkeys = keys[lmask]
        pos = np.clip(np.searchsorted(rsorted, lkeys), 0, len(rsorted) - 1)
        hit = rsorted[pos] == lkeys
        lt = lt.filter(pa.array(hit))
        rt_taken = rt.take(pa.array(order[pos[hit]], type=pa.int64()))
        cols = [lt.column(n) for n in left_names]
        cols += [rt_taken.column(n) for n in payload_names]
        return pa.Table.from_arrays(cols, schema=out_schema)

    return left_t.union(right_t).groupby("__bucket").map_groups(
        join_group, batch_format="pyarrow")
