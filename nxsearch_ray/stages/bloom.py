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


# ---------------------------------------------------------------
# Sharded variant — the >memory scale path promised above.  Keys are
# routed to shard = top bits of their hash; each shard is an
# independent Bloom filter over its own key population, built by the
# same partial/fold machinery and held as a SEPARATE object ref.  A
# probe batch groups its keys by shard and fetches ONLY the shards it
# touches (plasma-cached per worker after first use), so no single
# worker ever holds the full bitmap: at 10^11 prior keys / 1% FP
# (~120 GB of bits) a 1024-shard layout costs a worker ~120 MB per
# touched shard instead.  Soundness is per-shard, so the sharded
# probe returns EXACTLY the single-filter verdicts when both are
# sized to the same bits-per-key (gated in tests).
# ---------------------------------------------------------------


def _shard_of(h: np.ndarray, shards: int) -> np.ndarray:
    """Shard index from the TOP hash bits — disjoint from the
    position bits, which double-hash off the full value."""
    s = max(1, int(shards)).bit_length() - 1
    return (h >> _U64(64 - s)).astype(np.int64) if s else \
        np.zeros(len(h), dtype=np.int64)


def bloom_build_sharded(ds, col: str, *, shards: int = 16,
                        m_bits_per_shard: int = 1 << 16, k: int = 5,
                        seed: int = 0) -> list:
    """List of per-shard bitmap ObjectRefs (``shards`` must be a
    power of two).  One pass: every block contributes a partial to
    EVERY shard it has keys for; per-shard partials fold
    independently, so build parallelism is blocks × shards."""
    import ray

    assert shards & (shards - 1) == 0, "shards must be a power of two"

    @ray.remote
    def _partials(block: pa.Table):
        nwords = (m_bits_per_shard + 63) // 64
        out = [np.zeros(0, dtype=_U64)] * shards   # empty = no keys
        if block.num_rows:
            offs, data = string_buffers(block.column(col))
            h = hash_strings(offsets=offs, data=data, seed=seed)
            sh = _shard_of(h, shards)
            order = np.argsort(sh, kind="stable")
            h, sh = h[order], sh[order]
            bounds = np.searchsorted(sh, np.arange(shards + 1))
            for s in range(shards):
                hs = h[bounds[s]:bounds[s + 1]]
                if not len(hs):
                    continue
                words = np.zeros(nwords, dtype=_U64)
                pos = bloom_positions(hs, m_bits_per_shard, k).ravel()
                np.bitwise_or.at(
                    words, pos >> 6,
                    _U64(1) << (pos & np.int64(63)).astype(_U64))
                out[s] = words
        return out

    @ray.remote
    def _fold_shard(*parts):
        nwords = (m_bits_per_shard + 63) // 64
        full = [p for p in parts if len(p)]
        return np.bitwise_or.reduce(np.stack(full), axis=0) if full \
            else np.zeros(nwords, dtype=_U64)

    blocks = ds.select_columns([col]).to_arrow_refs()
    if not blocks:
        import ray as _r
        z = np.zeros((m_bits_per_shard + 63) // 64, dtype=_U64)
        return [_r.put(z.copy()) for _ in range(shards)]
    per_block = [_partials.options(num_returns=shards).remote(b)
                 for b in blocks]
    refs = []
    for s in range(shards):
        parts = [pb[s] for pb in per_block]
        while len(parts) > 1:
            parts = [_fold_shard.remote(*parts[i:i + FAN_IN])
                     for i in range(0, len(parts), FAN_IN)]
        # final fold even for a single part: partials use a 0-length
        # array as the "no keys in this shard" sentinel, which the
        # fold normalizes to a full-width zero bitmap
        refs.append(_fold_shard.remote(parts[0]))
    return refs


class ShardedBloomSeen:
    """Probe stage over a sharded filter: fetches only the shards a
    batch's keys route to (plasma caches repeats per worker)."""

    def __init__(self, shard_refs: list, col: str,
                 m_bits_per_shard: int, k: int, seed: int = 0,
                 out_col: str = "seen_bloom"):
        self.refs = shard_refs
        self.cache: dict[int, np.ndarray] = {}
        self.col = col
        self.m = m_bits_per_shard
        self.k = k
        self.seed = seed
        self.out_col = out_col

    def _shard(self, s: int) -> np.ndarray:
        if s not in self.cache:
            import ray
            self.cache[s] = ray.get(self.refs[s])
        return self.cache[s]

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        seen = np.zeros(n, dtype=bool)
        if n:
            arr = batch.column(self.col)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            offs, data = string_buffers(arr)
            h = hash_strings(offsets=offs, data=data, seed=self.seed)
            sh = _shard_of(h, len(self.refs))
            for s in np.unique(sh):
                rows = np.nonzero(sh == s)[0]
                words = self._shard(int(s))
                pos = bloom_positions(h[rows], self.m, self.k)
                bit = (words[pos >> 6]
                       >> (pos & np.int64(63)).astype(_U64)) & _U64(1)
                seen[rows] = bit.astype(bool).all(axis=1)
        return batch.append_column(self.out_col, pa.array(seen))


def bloom_seen_sharded(ds, shard_refs: list, col: str, *,
                       m_bits_per_shard: int = 1 << 16, k: int = 5,
                       seed: int = 0, out_col: str = "seen_bloom",
                       concurrency=(1, 8)):
    """Sharded-probe member of ``bloom_seen`` — same verdicts, no
    full-bitmap residency per worker."""
    return ds.map_batches(
        ShardedBloomSeen,
        fn_constructor_args=(shard_refs, col, m_bits_per_shard, k,
                             seed, out_col),
        batch_format="pyarrow", concurrency=concurrency, num_cpus=1)
