"""Candidate-pair generation: LSH banding, SimHash Hamming bucketing,
anchor buckets — all the "explode keys → shuffle → pair within group"
passes, plus pair union/dedup.

The shuffle-by-key pattern replaces the reference's shared in-memory
reverse index (term → doc bitmap, reference src/core/nxs.c:48-55):
what nxsearch surfaces as posting-list overlap we surface as co-located
rows after a `groupby` (SURVEY.md §2.3 ST5, §2.4 J1-J3).

Skew policy (SURVEY.md §4 "Skew / stragglers"): inside a bucket of n
docs we emit all C(n,2) pairs only while n ≤ ``hot_bucket_cap``;
beyond that the bucket is near-certainly boilerplate and a *spanning
chain* over the sorted doc ids preserves connectivity for the
union-find with n-1 pairs instead of O(n²).  The same policy function
is used by the distributed stage and the pure-python oracle so their
outputs match exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from nxsearch_ray.config import PipelineConfig
from nxsearch_ray.functions import hashing as H
from nxsearch_ray.stages.signatures import list_column_numpy

_U64 = np.uint64


def pairs_within(ids: np.ndarray, cap: int) -> tuple[np.ndarray, np.ndarray]:
    """Canonical (a<b) pairs for one bucket under the skew policy.

    ids are deduped+sorted first so the result is independent of row
    order (determinism under retries/parallelism, SURVEY.md §7)."""
    ids = np.unique(np.asarray(ids, dtype=np.int64))
    n = len(ids)
    if n < 2:
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    if n <= cap:
        iu = np.triu_indices(n, k=1)
        return ids[iu[0]], ids[iu[1]]
    # spanning chain: connectivity-preserving, linear in n
    return ids[:-1], ids[1:]


# ---------------------------------------------------------------- explode

def explode_minhash_bands(cfg_json: str):
    """map_batches fn factory: signatures → (bucket_key, page_id) rows,
    one row per LSH band."""
    cfg = PipelineConfig.from_json(cfg_json)

    def fn(batch: pa.Table) -> pa.Table:
        sig_flat, _ = list_column_numpy(batch.column("minhash"))
        ndocs = batch.num_rows
        sig = sig_flat.reshape(ndocs, cfg.num_perms)
        keys = H.band_keys(sig, cfg.lsh_bands, cfg.lsh_rows, cfg.seed)
        page = batch.column("page_id").to_numpy()
        return pa.Table.from_arrays(
            [pa.array(keys.reshape(-1), type=pa.uint64()),
             pa.array(np.repeat(page, cfg.lsh_bands), type=pa.int64())],
            names=["bucket_key", "page_id"])

    return fn


def explode_simhash_chunks(cfg_json: str):
    """SimHash Hamming bucketing (Manku et al. 2007): split the 64-bit
    fingerprint into ``hamming+1`` chunks — any pair within Hamming
    distance d shares at least one exact chunk (pigeonhole).  Key =
    (chunk index, chunk bits) mixed into one uint64."""
    cfg = PipelineConfig.from_json(cfg_json)
    nchunks = cfg.simhash_hamming + 1
    width = cfg.simhash_bits // nchunks

    def fn(batch: pa.Table) -> pa.Table:
        sim = batch.column("simhash").to_numpy().astype(_U64)
        page = batch.column("page_id").to_numpy()
        keys = np.empty((len(sim), nchunks), dtype=_U64)
        mask = _U64((1 << width) - 1)
        for c in range(nchunks):
            chunk = (sim >> _U64(c * width)) & mask
            keys[:, c] = H.splitmix64(chunk ^ H.splitmix64(
                np.array(c + 0x5151, dtype=_U64)))
        return pa.Table.from_arrays(
            [pa.array(keys.reshape(-1), type=pa.uint64()),
             pa.array(np.repeat(page, nchunks), type=pa.int64())],
            names=["bucket_key", "page_id"])

    return fn


def explode_seq_hash(batch: pa.Table) -> pa.Table:
    """Exact-duplicate pass: one key per doc — the order-sensitive hash
    of the full canonical token sequence.  Guarantees exact-copy recall
    independent of signature quality (degenerate short/empty docs
    included); the distributed form of the reference's identical-
    tokenset case (same text ⇒ same tokenset, src/core/tokenizer.c)."""
    return pa.Table.from_arrays(
        [batch.column("seq_hash"), batch.column("page_id")],
        names=["bucket_key", "page_id"])


def explode_anchors(batch: pa.Table) -> pa.Table:
    """signatures → (bucket_key=anchor shingle, page_id) for the
    containment/suffix pass."""
    a_flat, a_off = list_column_numpy(batch.column("anchors"))
    page = batch.column("page_id").to_numpy()
    counts = a_off[1:] - a_off[:-1]
    return pa.Table.from_arrays(
        [pa.array(a_flat, type=pa.uint64()),
         pa.array(np.repeat(page, counts), type=pa.int64())],
        names=["bucket_key", "page_id"])


# ------------------------------------------------------- pairs from keys

def candidate_pairs(keyed_ds, cfg: PipelineConfig, source: str):
    """(bucket_key, page_id) Dataset → candidate pair Dataset
    (a, b, source) via groupby(bucket_key) shuffle.

    Pairs may repeat across buckets — dedup happens once, in
    ``union_pair_sources`` (one shuffle instead of one per source)."""
    cap = cfg.hot_bucket_cap

    def emit(group: pa.Table) -> pa.Table:
        a, b = pairs_within(group.column("page_id").to_numpy(), cap)
        return pa.Table.from_arrays(
            [pa.array(a, type=pa.int64()), pa.array(b, type=pa.int64()),
             pa.array([source] * len(a), type=pa.string())],
            names=["a", "b", "source"])

    return keyed_ds.groupby("bucket_key").map_groups(
        emit, batch_format="pyarrow")


def union_pair_sources(*pair_datasets):
    """minhash ∪ simhash ∪ suffix candidate pairs → one row per (a, b)
    carrying the sorted, comma-joined *set* of proposing sources
    (deterministic; verification checks each source's rule).  This is
    the exact pair dedup — hash-partition + per-group first, the
    distributed analogue of the reference's doc-id-exists guard
    (reference src/core/nxs.c:505-511)."""
    ds = pair_datasets[0]
    for other in pair_datasets[1:]:
        ds = ds.union(other)

    def merge(group: pa.Table) -> pa.Table:
        srcs = ",".join(sorted(set(group.column("source").to_pylist())))
        return pa.Table.from_arrays(
            [group.column("a").slice(0, 1), group.column("b").slice(0, 1),
             pa.array([srcs], type=pa.string())],
            names=["a", "b", "source"])

    return ds.groupby(["a", "b"]).map_groups(merge, batch_format="pyarrow")
