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


def pairs_within(ids: np.ndarray, cap: int,
                 skip_over: int | None = None
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Canonical (a<b) pairs for one bucket under the skew policy.

    ids are deduped+sorted first so the result is independent of row
    order (determinism under retries/parallelism, SURVEY.md §7).
    ``skip_over``: buckets larger than this emit NOTHING (stop-shingle
    pruning for the anchor pass); None disables."""
    ids = np.unique(np.asarray(ids, dtype=np.int64))
    n = len(ids)
    if n < 2 or (skip_over is not None and n > skip_over):
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


SRC_NAMES = ("exact", "minhash", "simhash", "suffix")


def explode_all(cfg_json: str):
    """ONE explode for all four candidate passes: signatures →
    (bucket_key, page_id, src: int8) rows.  Emitting every pass from a
    single map_batches lets the whole candidate generation ride ONE
    sort instead of four — the dominant shuffle of the pipeline.
    Band/chunk keys are salted by band/chunk index; seq/anchor keys are
    salted by a source constant so buckets never mix across passes."""
    cfg = PipelineConfig.from_json(cfg_json)
    nchunks = cfg.simhash_hamming + 1
    width = cfg.simhash_bits // nchunks

    def fn(batch: pa.Table) -> pa.Table:
        page = batch.column("page_id").to_numpy()
        ndocs = batch.num_rows
        keys_out: list[np.ndarray] = []
        page_out: list[np.ndarray] = []
        src_out: list[np.ndarray] = []
        aux_out: list[np.ndarray] = []

        def add(keys, pages, code, aux=None):
            keys_out.append(keys)
            page_out.append(pages)
            src_out.append(np.full(len(keys), code, dtype=np.int8))
            aux_out.append(np.zeros(len(keys), dtype=np.int64)
                           if aux is None else aux.astype(np.int64))

        # exact (src 0): seq_hash, salted
        seqh = batch.column("seq_hash").to_numpy().astype(_U64)
        add(H.splitmix64(seqh ^ _U64(0xE0)), page, 0)

        # minhash bands (src 1)
        sig_flat, _ = list_column_numpy(batch.column("minhash"))
        sig = sig_flat.reshape(ndocs, cfg.num_perms)
        bkeys = H.band_keys(sig, cfg.lsh_bands, cfg.lsh_rows, cfg.seed)
        add(bkeys.reshape(-1), np.repeat(page, cfg.lsh_bands), 1)

        # simhash chunks (src 2); aux = the full 64-bit fingerprint so
        # the bucket scan can apply the TRUE Hamming test in-bucket.
        # A w-bit chunk key collides by pure chance between unrelated
        # docs at rate ~n²/2^w per chunk — 8.5M of 8.6M candidate
        # pairs at 520k pages (measured round 4) were such chance
        # pairs, flooding the verify exchanges; at 10^12 docs the
        # unfiltered pass is unusable.  Filtering in-bucket emits only
        # pairs at Hamming ≤ cfg.simhash_hamming — exactly the rule
        # verification enforces for this source.
        sim = batch.column("simhash").to_numpy().astype(_U64)
        ckeys = np.empty((ndocs, nchunks), dtype=_U64)
        mask = _U64((1 << width) - 1)
        for c in range(nchunks):
            chunk = (sim >> _U64(c * width)) & mask
            ckeys[:, c] = H.splitmix64(chunk ^ H.splitmix64(
                np.array(c + 0x5151, dtype=_U64)))
        add(ckeys.reshape(-1), np.repeat(page, nchunks), 2,
            np.repeat(sim.view(np.int64), nchunks))

        # anchors (src 3); aux = the emitting page's anchor count: a
        # fully-contained small doc can share at most
        # min(n_anchors_a, n_anchors_b) anchor buckets, so the
        # co-occurrence threshold downstream must cap at that — a
        # tail/copy of a <2-shingle doc is otherwise structurally
        # unreachable by the containment pass (found at sf0.01:
        # a 10-word doc's 5-word tail has ONE shingle).
        a_flat, a_off = list_column_numpy(batch.column("anchors"))
        counts = a_off[1:] - a_off[:-1]
        add(H.splitmix64(a_flat ^ _U64(0xA3)),
            np.repeat(page, counts), 3, np.repeat(counts, counts))

        return pa.Table.from_arrays(
            [pa.array(np.concatenate(keys_out), type=pa.uint64()),
             pa.array(np.concatenate(page_out), type=pa.int64()),
             pa.array(np.concatenate(src_out), type=pa.int8()),
             pa.array(np.concatenate(aux_out), type=pa.int64())],
            names=["bucket_key", "page_id", "src", "aux"])

    return fn


def multi_candidate_pairs(signatures_ds, cfg: PipelineConfig, *,
                          num_partitions: int | None = None):
    """All candidate passes in ONE exchange: explode_all →
    key-disjoint hash repartition (stages/shuffle.py) → per-block
    local sort + vectorized run scan.  Every (bucket_key, src) run is
    complete inside its block, so there is no block-edge fallback, no
    materialize, and the stage streams straight into pair union.
    Returns (a, b, src int8-code) pairs."""
    from nxsearch_ray.stages.shuffle import hash_partitioned

    keyed = signatures_ds.map_batches(explode_all(cfg.to_json()),
                                      batch_format="pyarrow")
    parts = hash_partitioned(keyed, ["bucket_key"], num_partitions)
    cap = cfg.hot_bucket_cap
    skip_by_src = {3: cfg.anchor_bucket_max}
    SIMHASH_CODE = SRC_NAMES.index("simhash")
    max_ham = cfg.simhash_hamming
    # pair rows carry the int8 source CODE, not the name: the pair
    # stream is the widest intermediate and strings triple its width.
    # aux = min over the pair of the members' anchor counts for suffix
    # rows (the achievable hit bound union_pair_sources caps the
    # co-occurrence threshold at), 0 elsewhere; simhash pairs are
    # Hamming-filtered HERE (aux carries the fingerprint) and emit 0.
    out_schema = pa.schema([
        ("a", pa.int64()), ("b", pa.int64()), ("src", pa.int8()),
        ("aux", pa.int64())])

    def block_fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return out_schema.empty_table()
        keys = t.column("bucket_key").to_numpy()
        ids = t.column("page_id").to_numpy()
        srcs = t.column("src").to_numpy()
        auxs = t.column("aux").to_numpy()
        order = np.lexsort((srcs, keys))
        keys, ids, srcs, auxs = (keys[order], ids[order], srcs[order],
                                 auxs[order])
        a_out, b_out, s_out, x_out = [], [], [], []
        change = np.nonzero((keys[1:] != keys[:-1])
                            | (srcs[1:] != srcs[:-1]))[0] + 1
        starts = np.concatenate(([0], change))
        counts = np.diff(np.concatenate((starts, [n])))
        # vectorized fast path: 2-member runs are the overwhelming
        # majority of non-singleton buckets — emit their single
        # pair with pure array ops, no per-run Python
        s2 = starts[counts == 2]
        if len(s2):
            x = ids[s2]
            y = ids[s2 + 1]
            code2 = srcs[s2]
            ok = x != y
            is_sim = code2 == SIMHASH_CODE
            if is_sim.any():
                ham = H.hamming64(auxs[s2].view(_U64),
                                  auxs[s2 + 1].view(_U64))
                ok &= ~is_sim | (ham <= max_ham)
            lo = np.minimum(x, y)[ok]
            hi = np.maximum(x, y)[ok]
            a_out.append(lo)
            b_out.append(hi)
            s_out.append(code2[ok])
            pair_aux = np.minimum(auxs[s2], auxs[s2 + 1])
            pair_aux[is_sim] = 0
            x_out.append(pair_aux[ok])
        # slow path: runs of ≥3 (rare; skew policy applies)
        for r in np.nonzero(counts >= 3)[0]:
            s, c = starts[r], counts[r]
            code = int(srcs[s])
            u, uidx = np.unique(ids[s:s + c], return_index=True)
            a, b = pairs_within(ids[s:s + c], cap,
                                skip_by_src.get(code))
            ua = auxs[s:s + c][uidx]
            xa = ua[np.searchsorted(u, a)]
            xb = ua[np.searchsorted(u, b)]
            if code == SIMHASH_CODE:
                keep = H.hamming64(xa.view(_U64),
                                   xb.view(_U64)) <= max_ham
                a, b = a[keep], b[keep]
                pair_aux = np.zeros(len(a), dtype=np.int64)
            else:
                pair_aux = np.minimum(xa, xb)
            a_out.append(a)
            b_out.append(b)
            s_out.append(np.full(len(a), code, dtype=np.int8))
            x_out.append(pair_aux)
        a_all = np.concatenate(a_out) if a_out else np.empty(0, np.int64)
        b_all = np.concatenate(b_out) if b_out else np.empty(0, np.int64)
        s_all = np.concatenate(s_out) if s_out else np.empty(0, np.int8)
        x_all = np.concatenate(x_out) if x_out else np.empty(0, np.int64)
        return pa.Table.from_arrays(
            [pa.array(a_all), pa.array(b_all),
             pa.array(s_all, type=pa.int8()),
             pa.array(x_all.astype(np.int64))],
            schema=out_schema)

    return parts.map_batches(block_fn, batch_format="pyarrow",
                             batch_size=None)


# ------------------------------------------------------- pairs from keys

def _block_runs(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(run_starts, run_counts) of equal-key runs in a sorted array."""
    n = len(keys)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    change = np.nonzero(keys[1:] != keys[:-1])[0] + 1
    starts = np.concatenate(([0], change))
    counts = np.diff(np.concatenate((starts, [n])))
    return starts, counts


def candidate_pairs(keyed_ds, cfg: PipelineConfig, source: str,
                    skip_over: int | None = None):
    """(bucket_key, page_id) Dataset → candidate pair Dataset
    (a, b, source).

    Physical plan: global ``sort(bucket_key)`` (the shuffle), then a
    vectorized per-block pass over key runs — Python only ever touches
    runs with ≥2 members, so the millions of singleton buckets cost a
    couple of numpy ops total instead of one `map_groups` call each.
    Runs touching a block edge may continue in the neighboring block;
    their rows are routed to a tiny groupby fallback (≤ 2 keys per
    block) so no pair is missed or double-emitted.

    Pairs may repeat across buckets — dedup happens once, in
    ``union_pair_sources`` (one shuffle instead of one per source)."""
    cap = cfg.hot_bucket_cap
    out_schema = pa.schema([
        ("a", pa.int64()), ("b", pa.int64()), ("source", pa.string()),
        ("pending_key", pa.uint64()), ("pending_id", pa.int64())])

    def block_fn(t: pa.Table) -> pa.Table:
        keys = t.column("bucket_key").to_numpy()
        ids = t.column("page_id").to_numpy()
        starts, counts = _block_runs(keys)
        a_out: list[np.ndarray] = []
        b_out: list[np.ndarray] = []
        pend_mask = np.zeros(len(keys), dtype=bool)
        if len(starts):
            # first + last run may continue in neighbor blocks
            pend_mask[:counts[0]] = True
            pend_mask[starts[-1]:] = True
            # python loop over MULTI-member interior runs only — the
            # singleton majority never leaves numpy
            multi = np.nonzero(counts >= 2)[0]
            for r in multi:
                if r == 0 or r == len(starts) - 1:
                    continue
                s, c = starts[r], counts[r]
                a, b = pairs_within(ids[s:s + c], cap, skip_over)
                a_out.append(a)
                b_out.append(b)
        a_all = np.concatenate(a_out) if a_out else np.empty(0, np.int64)
        b_all = np.concatenate(b_out) if b_out else np.empty(0, np.int64)
        npairs = len(a_all)
        npend = int(pend_mask.sum())
        return pa.Table.from_arrays(
            [pa.array(np.concatenate([a_all, np.zeros(npend, np.int64)])),
             pa.array(np.concatenate([b_all, np.zeros(npend, np.int64)])),
             pa.array([source] * npairs + [""] * npend,
                      type=pa.string()),
             pa.array(np.concatenate(
                 [np.zeros(npairs, np.uint64), keys[pend_mask]]),
                 type=pa.uint64()),
             pa.array(np.concatenate(
                 [np.full(npairs, -1, np.int64), ids[pend_mask]]))],
            schema=out_schema)

    mixed = keyed_ds.sort("bucket_key").map_batches(
        block_fn, batch_format="pyarrow", batch_size=None)
    mixed = mixed.materialize()

    done = mixed.map_batches(
        lambda t: t.filter(
            pa.compute.equal(t.column("pending_id"), -1))
        .select(["a", "b", "source"]),
        batch_format="pyarrow")

    pending = mixed.map_batches(
        lambda t: t.filter(
            pa.compute.not_equal(t.column("pending_id"), -1))
        .select(["pending_key", "pending_id"])
        .rename_columns(["bucket_key", "page_id"]),
        batch_format="pyarrow")

    def emit(group: pa.Table) -> pa.Table:
        a, b = pairs_within(group.column("page_id").to_numpy(), cap,
                            skip_over)
        return pa.Table.from_arrays(
            [pa.array(a, type=pa.int64()), pa.array(b, type=pa.int64()),
             pa.array([source] * len(a), type=pa.string())],
            names=["a", "b", "source"])

    fallback = pending.groupby("bucket_key").map_groups(
        emit, batch_format="pyarrow")
    return done.union(fallback)


def union_pair_sources(*pair_datasets, min_suffix_hits: int = 1,
                       num_partitions: int | None = None):
    """minhash ∪ simhash ∪ suffix candidate pairs → one row per (a, b)
    carrying the sorted, comma-joined *set* of proposing sources
    (deterministic; verification checks each source's rule).  This is
    the exact pair dedup — the distributed analogue of the reference's
    doc-id-exists guard (reference src/core/nxs.c:505-511).

    ONE exchange: key-disjoint hash repartition on (a, b), then a
    fully vectorized per-block local sort + run scan — per-run source
    bitmask via bitwise_or.reduceat, per-run suffix hit count via
    add.reduceat.  Every pair's sightings are complete in-block, so
    no fallback pass exists and the stage streams into verification."""
    from nxsearch_ray.stages.shuffle import hash_partitioned

    ds = pair_datasets[0]
    for other in pair_datasets[1:]:
        ds = ds.union(other)

    SUFFIX_CODE = SRC_NAMES.index("suffix")
    # mask → "exact,minhash,..." (SRC_NAMES happens to be sorted)
    MASK_LUT = np.array(
        [",".join(n for i, n in enumerate(SRC_NAMES) if m >> i & 1)
         for m in range(1 << len(SRC_NAMES))], dtype=object)
    out_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                            ("source", pa.string())])

    parts = hash_partitioned(ds, ["a", "b"], num_partitions)

    def block_fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return out_schema.empty_table()
        a = t.column("a").to_numpy()
        b = t.column("b").to_numpy()
        src = t.column("src").to_numpy().astype(np.int32)
        aux = t.column("aux").to_numpy().astype(np.int64)
        order = np.lexsort((b, a))
        a, b, src, aux = a[order], b[order], src[order], aux[order]
        change = np.nonzero((a[1:] != a[:-1]) | (b[1:] != b[:-1]))[0] + 1
        starts = np.concatenate(([0], change))

        bits = np.left_shift(1, src)
        run_or = np.bitwise_or.reduceat(bits, starts)
        suffix_hits = np.add.reduceat(
            (src == SUFFIX_CODE).astype(np.int64), starts)
        # the achievable-hit bound: a pair whose smaller side emitted
        # only k < min_suffix_hits anchors can share at most k anchor
        # buckets even under full containment — cap the threshold
        # there (aux is ≥1 on suffix rows; mask other sources' aux to
        # 0 before the run max so only the suffix bound survives)
        run_aux = np.maximum.reduceat(
            np.where(src == SUFFIX_CODE, aux, 0), starts)
        required = np.maximum(1, np.minimum(min_suffix_hits, run_aux))
        suffix_bit = 1 << SUFFIX_CODE
        final_mask = run_or & ~suffix_bit
        final_mask |= np.where(suffix_hits >= required, suffix_bit, 0)
        emit = final_mask != 0
        s_emit = starts[emit]
        names = MASK_LUT[final_mask[emit]]
        return pa.Table.from_arrays(
            [pa.array(a[s_emit]), pa.array(b[s_emit]),
             pa.array(names.tolist(), type=pa.string())],
            schema=out_schema)

    return parts.map_batches(block_fn, batch_format="pyarrow",
                             batch_size=None)
