"""Bloom-filter "seen before" ingest guard — incremental crawl dedup
against a prior corpus.

At 10^12 documents, asking "has this URL been ingested in an earlier
crawl?" as an exact join is a full all-to-all exchange of BOTH
corpora on every incremental batch.  The standard large-crawl answer
(e.g. the Common-Crawl/Heritrix "already-seen" structure, public) is
a Bloom filter built ONCE over the prior corpus's keys and broadcast
to every ingest worker: membership is then a map-only pass with no
shuffle, no false negatives, and a tunable false-positive rate
(~(1-e^{-kn/m})^k), so the expensive exact path runs only for the
tiny "maybe seen" slice.

Mirrors the reference's ingest-time duplicate-id guard
(/root/reference/src/index/dtmap.c idx_dtmap_add's ALREADY_EXISTS
check) re-expressed for the no-shared-state dataflow: the shared
term/dtmap lookup becomes a broadcast read-only bitmap.

Scale plan:
  build  — one remote task per input block computes a partial bitmap
           over zero-copy Arrow string buffers (hash_strings is the
           repo's vectorized FNV+splitmix kernel); partials are
           OR-folded in a FAN_IN-ary task tree, so the driver holds
           nothing and peak memory per task is FAN_IN bitmaps.  The
           bitmap is sized by the caller (m_bits); at 10^11 prior
           keys and 1% FP the bitmap is ~120 GB and would instead be
           SHARDED by key-hash prefix (each worker fetches only the
           shards its batch's prefixes touch) — the single-ref plan
           here is the broadcast member of that family.
  probe  — the bitmap ref travels by handle inside an actor-pool
           map_batches; each actor ray.get()s it ONCE (plasma,
           zero-copy for the word array) and probes per batch with
           k gather+shift ops, no Python loop.

Positions use Kirsch-Mitzenmacher double hashing (public):
pos_i = (h1 + i*h2) mod m with h2 forced odd, giving k independent-
enough probes from one 64-bit hash.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from nxsearch_ray.functions.hashing import (hash_strings, splitmix64,
                                            string_buffers)

_U64 = np.uint64
FAN_IN = 8


def bloom_positions(h: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing; h2 is forced odd so
    its additive orbit covers the ring for any power-of-two m."""
    h1 = h.astype(_U64)
    h2 = splitmix64(h1 ^ _U64(0xA076_1D64_78BD_642F)) | _U64(1)
    i = np.arange(k, dtype=_U64)[None, :]
    old = np.seterr(over="ignore")
    try:
        return ((h1[:, None] + i * h2[:, None])
                % _U64(m_bits)).astype(np.int64)
    finally:
        np.seterr(**old)


def _partial_bitmap(block: pa.Table, col: str, m_bits: int, k: int,
                    seed: int) -> np.ndarray:
    nwords = (m_bits + 63) // 64
    words = np.zeros(nwords, dtype=_U64)
    if block.num_rows:
        offs, data = string_buffers(block.column(col))
        h = hash_strings(offsets=offs, data=data, seed=seed)
        pos = bloom_positions(h, m_bits, k).ravel()
        np.bitwise_or.at(words, pos >> 6,
                         _U64(1) << (pos & np.int64(63)).astype(_U64))
    return words


def bloom_build_ref(ds, col: str, *, m_bits: int = 1 << 20,
                    k: int = 5, seed: int = 0):
    """ObjectRef to the uint64 word array of a Bloom filter over
    ``ds[col]`` — per-block partials, FAN_IN-ary OR-fold tree."""
    import ray

    @ray.remote
    def _partial(block):
        return _partial_bitmap(block, col, m_bits, k, seed)

    @ray.remote
    def _orr(*ws):
        return np.bitwise_or.reduce(np.stack(ws), axis=0)

    parts = [_partial.remote(b)
             for b in ds.select_columns([col]).to_arrow_refs()]
    if not parts:
        return ray.put(np.zeros((m_bits + 63) // 64, dtype=_U64))
    while len(parts) > 1:
        parts = [_orr.remote(*parts[i:i + FAN_IN])
                 for i in range(0, len(parts), FAN_IN)]
    return parts[0]


def bloom_probe(words: np.ndarray, values, *, m_bits: int, k: int,
                seed: int = 0) -> np.ndarray:
    """Vectorized membership over a pa.string Array/ChunkedArray:
    True iff all k bits are set (no false negatives by construction)."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if not len(values):
        return np.zeros(0, dtype=bool)
    offs, data = string_buffers(values)
    h = hash_strings(offsets=offs, data=data, seed=seed)
    pos = bloom_positions(h, m_bits, k)
    bit = (words[pos >> 6] >> (pos & np.int64(63)).astype(_U64)) \
        & _U64(1)
    return bit.astype(bool).all(axis=1)


class BloomSeen:
    """Actor-pool probe stage: bitmap fetched once per actor,
    appends a boolean ``out_col`` per batch."""

    def __init__(self, bits_ref, col: str, m_bits: int, k: int,
                 seed: int = 0, out_col: str = "seen_bloom"):
        import ray
        self.words = ray.get(bits_ref) \
            if not isinstance(bits_ref, np.ndarray) else bits_ref
        self.col = col
        self.m_bits = m_bits
        self.k = k
        self.seed = seed
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        seen = bloom_probe(self.words, batch.column(self.col),
                           m_bits=self.m_bits, k=self.k,
                           seed=self.seed)
        return batch.append_column(self.out_col, pa.array(seen))


def bloom_seen(ds, bits_ref, col: str, *, m_bits: int = 1 << 20,
               k: int = 5, seed: int = 0,
               out_col: str = "seen_bloom", concurrency=(1, 8)):
    """Map-only "seen before" flag against a prebuilt broadcast
    Bloom bitmap — the incremental-ingest guard."""
    return ds.map_batches(
        BloomSeen, fn_constructor_args=(bits_ref, col, m_bits, k,
                                        seed, out_col),
        batch_format="pyarrow", concurrency=concurrency, num_cpus=1)
