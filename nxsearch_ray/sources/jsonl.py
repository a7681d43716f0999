"""JSONL / JSONL.gz ingest — the interchange format text-corpus
releases ship in (Dolma, RedPajama, OSCAR dumps: one JSON object per
line, gzip-compressed shards).

Distribution unit is one shard file per task (the granularity these
corpora are released at — hundreds of ~100 MB-1 GB shards), read via
``ray.data.read_binary_files`` so decompression and parsing happen in
the tasks, not the driver.  Parsing uses the stdlib ``json`` per line
(the irreducible part of a row-oriented text format); column assembly
is one Arrow array build per shard.

``documents_from_jsonl`` maps records onto the `documents` table
shape (doc_id, text, lang, source) used across the engine; pass
``field_map`` when the corpus uses different key names (e.g. Dolma's
``id``/``text``/``metadata.language``).
"""

from __future__ import annotations

import gzip
import json

import pyarrow as pa

DOCUMENTS_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("text", pa.string()),
    ("lang", pa.string()),
    ("source", pa.string()),
])


def jsonl_bytes_to_documents(buf: bytes, *, field_map: dict | None
                             = None, default_source: str = "jsonl"
                             ) -> pa.Table:
    """One shard's bytes (plain or gzip) → documents-schema table.
    Records without an integer id get a stable md5-derived id with
    bit 62 set (so re-runs assign identical ids AND hashed ids live in
    [2^62, 2^63), disjoint from any realistic genuine integer id;
    JSON ``true``/``false`` ids are treated as absent, not as 1/0)."""
    import hashlib

    fm = {"doc_id": "doc_id", "text": "text", "lang": "lang",
          "source": "source", **(field_map or {})}
    if buf[:2] == b"\x1f\x8b":
        buf = gzip.decompress(buf)
    ids, texts, langs, sources = [], [], [], []
    for line in buf.splitlines():
        line = line.strip()
        if not line:
            continue
        rec = json.loads(line)
        text = str(rec.get(fm["text"], ""))
        rid = rec.get(fm["doc_id"])
        if isinstance(rid, int) and not isinstance(rid, bool):
            ids.append(rid)
        else:
            key = str(rid) if rid is not None else text
            h62 = int.from_bytes(
                hashlib.md5(key.encode()).digest()[:8], "big") >> 2
            ids.append(h62 | (1 << 62))
        texts.append(text)
        langs.append(str(rec.get(fm["lang"], "")))
        sources.append(str(rec.get(fm["source"], default_source)))
    return pa.Table.from_arrays(
        [pa.array(ids, type=pa.int64()),
         pa.array(texts, type=pa.string()),
         pa.array(langs, type=pa.string()),
         pa.array(sources, type=pa.string())],
        schema=DOCUMENTS_SCHEMA)


def documents_from_jsonl(paths, *, field_map: dict | None = None):
    """JSONL shard(s) → documents Dataset (one parse task per
    shard)."""
    import ray.data

    ds = ray.data.read_binary_files(paths, include_paths=True)

    def to_docs(t: pa.Table) -> pa.Table:
        tables = [jsonl_bytes_to_documents(b, field_map=field_map)
                  for b in t.column("bytes").to_pylist()]
        return pa.concat_tables(tables) if tables else \
            DOCUMENTS_SCHEMA.empty_table()

    return ds.map_batches(to_docs, batch_format="pyarrow",
                          batch_size=1)
