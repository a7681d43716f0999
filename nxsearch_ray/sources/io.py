"""Metadata-clean parquet reads.

Parquet files written through pandas carry a ``b'pandas'`` schema
metadata blob.  pyarrow schemas with metadata are UNHASHABLE
(``hash(schema)`` raises ``unhashable type: 'dict'``), which makes Ray
Data's block-schema deduplication log a warning per worker every time
it coalesces read blocks into batches ("Failed to hash the schemas").
Passing an explicit metadata-free schema to ``read_parquet`` keeps
every downstream block metadata-free — no warning, and one less blob
copied around with every block.
"""

from __future__ import annotations

import os


def _schema_source(paths) -> str:
    """One representative parquet file for footer-schema discovery."""
    first = paths[0] if isinstance(paths, (list, tuple)) else paths
    if os.path.isdir(first):
        for root, _, files in sorted(os.walk(first)):
            for f in sorted(files):
                if f.endswith(".parquet"):
                    return os.path.join(root, f)
    return first


def read_parquet_clean(paths, *, columns=None, **kwargs):
    """``ray.data.read_parquet`` with a metadata-stripped schema.

    ``columns`` prunes at the read exactly like the stock reader; the
    explicit schema covers just those fields (Ray validates block
    schemas against it)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    full = pq.read_schema(_schema_source(paths)).remove_metadata()
    if columns:
        schema = pa.schema([full.field(c) for c in columns])
    else:
        schema = full
    return ray.data.read_parquet(
        paths, schema=schema,
        columns=list(columns) if columns else None, **kwargs)
