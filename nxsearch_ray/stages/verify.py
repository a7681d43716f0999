"""Candidate-pair verification: estimated Jaccard / Hamming / containment.

Semantics donor is the reference's query path: anything compared must
go through identical canonicalization first (reference
src/query/query.c:75-115), and the decision math runs over the derived
signatures.  Two physical plans, one semantic:

  * **broadcast** (default at test scale; per-node at cluster scale):
    the signature table is put in the object store once (`ray.put`) and
    every verify task reads it zero-copy — no shuffle.  This is the
    "broadcast the small side" join rule.
  * **bucketed** (the 10^12-doc path): two partitioned hash joins
    (pairs⋈sig on `a`, then on `b`) via stages/join.py.

A candidate pair carries the *set* of sources that proposed it
(comma-joined, sorted — see stages/pairs.union_pair_sources); the
decision rules themselves apply to every candidate regardless of
source (see ``apply_rules``).  ``keep_minsim`` marks pairs confirmed
outright; ``keep_exact_screen`` marks borderline pairs routed to exact
adjudication (stages/suffix.py: suffix-automaton containment + exact
shingle Jaccard).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from nxsearch_ray.config import PipelineConfig
from nxsearch_ray.functions import hashing as H
from nxsearch_ray.stages.signatures import list_column_numpy

_U64 = np.uint64

SCORED_SCHEMA = pa.schema([
    ("a", pa.int64()), ("b", pa.int64()), ("source", pa.string()),
    ("est_jaccard", pa.float64()), ("hamming", pa.int32()),
    ("jaccard_bk", pa.float64()), ("containment_bk", pa.float64()),
    ("keep_minsim", pa.bool_()), ("keep_exact_screen", pa.bool_())])


@dataclass
class SignatureIndex:
    """Driver-materialized signature lookup, broadcast via ray.put.

    Arrays are sorted by page_id; lookups are vectorized searchsorted.
    At 10^12 docs this index does not fit on one node and the bucketed
    plan applies (verify_pairs_bucketed)."""

    page_ids: np.ndarray       # (n,) int64 sorted
    mh_res: np.ndarray         # (n, P) uint8 MinHash residues
    simhash: np.ndarray        # (n,) uint64
    bk_flat: np.ndarray        # uint32 bottom-k prefixes (sorted/doc)
    bk_offsets: np.ndarray     # (n+1,) int64

    @classmethod
    def from_table(cls, t: pa.Table, num_perms: int) -> "SignatureIndex":
        page = t.column("page_id").to_numpy()
        order = np.argsort(page, kind="stable")
        t = t.take(pa.array(order, type=pa.int64()))
        mh_flat, _ = list_column_numpy(t.column("mh_res"), dtype=np.uint8)
        bk_flat, bk_off = list_column_numpy(t.column("bottomk"),
                                            dtype=np.uint32)
        return cls(
            page_ids=page[order],
            mh_res=mh_flat.reshape(len(page), num_perms),
            simhash=t.column("simhash").to_numpy().astype(_U64),
            bk_flat=bk_flat, bk_offsets=bk_off)

    def rows_for(self, ids: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(self.page_ids, ids)
        pos = np.clip(pos, 0, len(self.page_ids) - 1)
        if not np.all(self.page_ids[pos] == ids):
            missing = ids[self.page_ids[pos] != ids]
            raise KeyError(f"page_ids missing from index: {missing[:5]}")
        return pos


def collect_signature_index(sig_ds, cfg: PipelineConfig) -> SignatureIndex:
    """Gather the signature table to the driver.  For a MATERIALIZED
    dataset ``to_arrow_refs`` hands back the existing blocks and
    ``ray.get`` maps them zero-copy from the object store — much faster
    than re-batching through ``iter_batches``."""
    import ray

    cols = ["page_id", "mh_res", "simhash", "bottomk"]
    try:
        blocks = ray.get(sig_ds.to_arrow_refs())
        t = pa.concat_tables(b.select(cols) for b in blocks)
    except Exception:
        t = pa.concat_tables(
            sig_ds.select_columns(cols)
            .iter_batches(batch_size=8192, batch_format="pyarrow"))
    return SignatureIndex.from_table(t, cfg.num_perms)


def build_signature_index_ref(sig_ds, cfg: PipelineConfig):
    """Build the broadcast SignatureIndex in ONE remote task — the
    driver never holds the index; it only passes the ObjectRef to the
    verify actors (which ray.get it zero-copy from plasma).  Removes
    the driver-serial collect+argsort from the critical path."""
    import ray

    cols = ["page_id", "mh_res", "simhash", "bottomk"]
    refs = sig_ds.select_columns(cols).to_arrow_refs()
    if not refs:
        return ray.put(SignatureIndex.from_table(
            pa.schema([("page_id", pa.int64()),
                       ("mh_res", pa.list_(pa.uint8(), cfg.num_perms)),
                       ("simhash", pa.uint64()),
                       ("bottomk", pa.list_(pa.uint32()))]).empty_table(),
            cfg.num_perms))

    @ray.remote
    def _build(num_perms, *blocks):
        return SignatureIndex.from_table(pa.concat_tables(blocks),
                                         num_perms)

    return _build.remote(cfg.num_perms, *refs)


def _padded_gather(flat: np.ndarray, offsets: np.ndarray,
                   rows: np.ndarray, width: int,
                   pad: np.uint64) -> tuple[np.ndarray, np.ndarray]:
    """(npairs, width) matrix of each row's sketch slice, padded with
    ``pad`` past its true length; also returns the true lengths."""
    starts = offsets[rows]
    lens = offsets[rows + 1] - starts
    idx = starts[:, None] + np.arange(width, dtype=np.int64)[None, :]
    valid = idx < (starts + lens)[:, None]
    np.clip(idx, 0, max(len(flat) - 1, 0), out=idx)
    mat = np.where(valid, flat[idx] if len(flat) else pad, pad)
    return mat, lens


def bottomk_pair_scores(flat: np.ndarray, offsets: np.ndarray,
                        ia: np.ndarray, ib: np.ndarray,
                        k: int) -> tuple[np.ndarray, np.ndarray]:
    """(jaccard_bk, containment_bk) per pair from bottom-k sketches,
    fully vectorized across the pair batch.

    Bottom-k estimate: within the k smallest of the union of both
    sketches ("window", upper value hi), jaccard ≈ |in both| /
    |window| and containment ≈ |in both| / min(|SA ≤ hi|, |SB ≤ hi|)
    — dividing by the less-sampled side; any element ≤ hi of either
    full set is guaranteed present in that doc's sketch, which is what
    makes the estimator valid.

    Implementation: pad each pair's two (sorted) sketches into a
    (npairs, 2k) matrix with distinct sentinels, one row-wise sort,
    then adjacency marks intersection elements (each sketch's values
    are unique, so duplicates only arise across the two sketches)."""
    n = len(ia)
    jac = np.zeros(n, dtype=np.float64)
    con = np.zeros(n, dtype=np.float64)
    if n == 0:
        return jac, con
    offsets = np.asarray(offsets, dtype=np.int64)
    dt = flat.dtype if len(flat) else np.dtype(np.uint32)
    if dt.itemsize < 8:
        # widen so the pad sentinels sit OUTSIDE the value range — a
        # genuine sketch value can never collide with a pad (in-band
        # sentinels mis-scored real values w.p. ~2^-32 per element)
        flat = flat.astype(np.int64)
        bound = np.int64(1) << np.int64(8 * dt.itemsize)
        PAD_B = bound            # "real" test below is `< PAD_B`
        PAD_A = bound + 1        # distinct: pads never "match"
    else:
        top = np.iinfo(dt).max
        PAD_A = dt.type(top)
        PAD_B = dt.type(top - 1)
    SA, la = _padded_gather(flat, offsets, np.asarray(ia), k, PAD_A)
    SB, lb = _padded_gather(flat, offsets, np.asarray(ib), k, PAD_B)
    la = np.minimum(la, k)
    lb = np.minimum(lb, k)

    M = np.concatenate([SA, SB], axis=1)
    M.sort(axis=1)
    # intersection marks among REAL values only — runs of identical
    # pad sentinels at the row tail must not count
    dup = (M[:, 1:] == M[:, :-1]) & (M[:, 1:] < PAD_B)
    uniq = np.concatenate(
        [np.ones((n, 1), dtype=bool), ~dup], axis=1)
    ucount = np.cumsum(uniq, axis=1)

    total_unique = la + lb - dup.sum(axis=1)
    win = np.minimum(total_unique, k)              # window size
    nonempty = (la > 0) & (lb > 0)
    # index of the win-th unique element per row = hi position
    target = np.maximum(win, 1)
    hi_pos = np.argmax(ucount >= target[:, None], axis=1)
    hi = M[np.arange(n), hi_pos]

    nboth = np.sum(dup & (M[:, 1:] <= hi[:, None]), axis=1)
    n_a = np.sum(SA <= hi[:, None], axis=1)
    n_b = np.sum(SB <= hi[:, None], axis=1)
    n_small = np.minimum(n_a, n_b)

    ok = nonempty & (win > 0)
    jac[ok] = nboth[ok] / win[ok]
    okc = ok & (n_small > 0)
    con[okc] = nboth[okc] / n_small[okc]
    return jac, con


def apply_rules(sources: list[str], est_j: np.ndarray, ham: np.ndarray,
                con_bk: np.ndarray, cfg: PipelineConfig
                ) -> tuple[np.ndarray, np.ndarray]:
    """(keep_minsim, keep_exact_screen) — the single decision function
    shared by broadcast stage, bucketed stage and the python oracle.

    Decision rules apply to EVERY candidate regardless of which pass
    proposed it (sources only govern candidate *generation*):

      keep_minsim      — confirmed outright: exact sequence match, or
                         est_jaccard ≥ threshold, or SimHash Hamming
                         within the pigeonhole bound.
      keep_exact_screen — borderline: bottom-k containment above the
                         loose screen, or est_jaccard in the
                         [borderline, threshold) noise window.  These
                         go to exact adjudication (suffix-automaton
                         containment + exact shingle Jaccard)."""
    has_exact = np.array(["exact" in s.split(",") for s in sources])
    keep_minsim = has_exact | (est_j >= cfg.jaccard_threshold) | \
        (ham <= cfg.simhash_hamming)
    keep_screen = (con_bk >= 0.5 * cfg.containment_threshold) | \
        ((est_j >= cfg.jaccard_borderline)
         & (est_j < cfg.jaccard_threshold))
    return keep_minsim, keep_screen


def score_pairs_table(pairs: pa.Table, idx: SignatureIndex,
                      cfg: PipelineConfig) -> pa.Table:
    """Score one pair batch against the signature index; returns only
    surviving pairs (any rule passed)."""
    if pairs.num_rows == 0:
        return SCORED_SCHEMA.empty_table()
    a = pairs.column("a").to_numpy()
    b = pairs.column("b").to_numpy()
    ia = idx.rows_for(a)
    ib = idx.rows_for(b)
    est_j = (idx.mh_res[ia] == idx.mh_res[ib]).mean(axis=1)
    ham = H.hamming64(idx.simhash[ia], idx.simhash[ib])
    jac_bk, con_bk = bottomk_pair_scores(
        idx.bk_flat, idx.bk_offsets, ia, ib, cfg.bottomk)
    src = pairs.column("source").to_pylist()
    keep_minsim, keep_screen = apply_rules(src, est_j, ham, con_bk, cfg)
    keep = keep_minsim | keep_screen
    out = pa.Table.from_arrays(
        [pairs.column("a"), pairs.column("b"),
         pa.array(src, type=pa.string()),
         pa.array(est_j, type=pa.float64()),
         pa.array(ham.astype(np.int32)),
         pa.array(jac_bk, type=pa.float64()),
         pa.array(con_bk, type=pa.float64()),
         pa.array(keep_minsim), pa.array(keep_screen)],
        schema=SCORED_SCHEMA)
    return out.filter(pa.array(keep))


class VerifyBroadcastActor:
    """Verify stage callable: ray.get the broadcast SignatureIndex
    once per worker (zero-copy numpy views over plasma)."""

    def __init__(self, idx_ref, cfg_json: str):
        import ray
        self.idx = ray.get(idx_ref) if not isinstance(
            idx_ref, SignatureIndex) else idx_ref
        self.cfg = PipelineConfig.from_json(cfg_json)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return score_pairs_table(batch, self.idx, self.cfg)


# per-worker-process cache for the broadcast index: a TASK-pool stage
# re-enters score_batch many times in one worker; the plasma get is
# zero-copy but the dataclass unwrap + config parse are worth caching
_BCAST_CACHE: dict = {}


def verify_pairs_broadcast(pairs_ds, idx_ref, cfg: PipelineConfig,
                           concurrency=None):
    """Task-pool verify (NOT an actor pool): the only per-worker state
    is the broadcast index, and ``ray.get`` of plasma-backed numpy is
    zero-copy — tasks need no warm state worth reserving CPUs for.
    Measured on 520k pages / 8.6M candidates: the actor-pool version
    ran 61-83 s at 8 cpus (pool ramp + one coarse task per input
    block serializing on stragglers); the task pool runs 20-27 s at
    8 cpus and 49-55 s at 2 — 3x faster AND better-scaling, because
    batch_size-granular tasks keep every CPU busy and worker processes
    are already warm."""
    key = (idx_ref.hex() if hasattr(idx_ref, "hex") else id(idx_ref),
           cfg.config_hash())
    cfg_json = cfg.to_json()

    def score_batch(batch: pa.Table) -> pa.Table:
        import ray

        cached = _BCAST_CACHE.get(key)
        if cached is None:
            idx = ray.get(idx_ref) if not isinstance(
                idx_ref, SignatureIndex) else idx_ref
            cached = (idx, PipelineConfig.from_json(cfg_json))
            _BCAST_CACHE.clear()
            _BCAST_CACHE[key] = cached
        return score_pairs_table(batch, cached[0], cached[1])

    kwargs = {}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return pairs_ds.map_batches(
        score_batch, batch_format="pyarrow", batch_size=32768,
        **kwargs)


def _pack_payload(t: pa.Table, num_perms: int) -> pa.Table:
    """Slim signature row → ONE binary blob per page:
    ``[mh_res P bytes][simhash 8 LE][bottomk 4 LE × k]``.

    The pair join ships the payload through two hash exchanges with
    every role row carrying NULLS for the payload columns; a
    fixed_size_list<uint8, P> column allocates its P-byte child even
    for null rows (≈400 MB of shuffled zeros at 520k pages / 1.5M
    candidates, measured round 4), and each per-block gather copies
    three typed columns.  One variable-width binary column makes null
    rows cost 4 offset bytes and every gather a single memcpy."""
    n = t.num_rows
    mh_flat, _ = list_column_numpy(t.column("mh_res"), dtype=np.uint8)
    mh = mh_flat.reshape(n, num_perms)
    sim = t.column("simhash").to_numpy().astype("<u8")
    bk_flat, bk_off = list_column_numpy(t.column("bottomk"),
                                        dtype=np.uint32)
    bk_counts = (bk_off[1:] - bk_off[:-1]).astype(np.int64)
    head = num_perms + 8
    lens = head + 4 * bk_counts
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    out = np.empty(offs[-1], dtype=np.uint8)
    starts = offs[:-1]
    out[starts[:, None] + np.arange(num_perms)] = mh
    out[starts[:, None] + num_perms + np.arange(8)] = \
        sim.view(np.uint8).reshape(n, 8)
    total_bk = int(bk_counts.sum()) * 4
    if total_bk:
        bstart = starts + head
        blens = 4 * bk_counts
        intra = np.arange(total_bk) - np.repeat(
            np.concatenate(([0], np.cumsum(blens)))[:-1], blens)
        out[np.repeat(bstart, blens) + intra] = \
            bk_flat.astype("<u4").view(np.uint8)
    blob = pa.Array.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(offs.astype(np.int32).tobytes()),
         pa.py_buffer(out.tobytes())])
    return pa.table({"page_id": t.column("page_id"), "blob": blob})


def _unpack_blobs(col, num_perms: int):
    """Binary blob column → (mh (n,P) uint8, simhash (n,) uint64,
    bk_flat uint32, bk_offsets int64) — vectorized gathers only."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    raw_offs = np.frombuffer(col.buffers()[1], dtype=np.int32)
    offs = raw_offs[col.offset:col.offset + n + 1].astype(np.int64)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    starts = offs[:-1]
    head = num_perms + 8
    mh = data[starts[:, None] + np.arange(num_perms)]
    sim = data[starts[:, None] + num_perms + np.arange(8)] \
        .copy().view("<u8").reshape(-1).astype(np.uint64)
    blens = offs[1:] - starts - head
    total = int(blens.sum())
    if total:
        intra = np.arange(total) - np.repeat(
            np.concatenate(([0], np.cumsum(blens)))[:-1], blens)
        bk_bytes = data[np.repeat(starts + head, blens) + intra].copy()
        bk_flat = bk_bytes.view("<u4").astype(np.uint32)
    else:
        bk_flat = np.empty(0, dtype=np.uint32)
    bk_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(blens // 4, out=bk_off[1:])
    return mh, sim, bk_flat, bk_off


def verify_pairs_bucketed(pairs_ds, sig_ds, cfg: PipelineConfig,
                          num_partitions: int | None = None):
    """Scale path: one fused pair-payload join (stages/join.pair_join —
    the signature payload rides each of its two shuffles exactly once,
    packed into a single binary blob per endpoint, see
    ``_pack_payload``) then a stateless score.  Decision math
    identical to the broadcast path (shared helpers).

    Exchange width is sized to the DATA (shuffle.sized_num_partitions)
    — round 4's full-width (one partition per cluster CPU) choice was
    a measured regression at every tested scale on a single node
    (24.7 s vs 2.2 s at 26k pages, 40 s vs 6.3 s at 520k): each extra
    hash-shuffle partition is an aggregator actor with seconds of
    fixed coordination cost.  ``sig_ds`` must be materialized /
    checkpointed (run_dedup pins it) so ``count()`` is metadata, not
    an execution."""
    from nxsearch_ray.stages.join import pair_join
    from nxsearch_ray.stages.shuffle import sized_num_partitions

    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                             ("source", pa.string())])
    sig_schema = pa.schema([("page_id", pa.int64()),
                            ("blob", pa.binary())])

    if num_partitions is None:
        num_partitions = sized_num_partitions(sig_ds.count())

    P = cfg.num_perms
    packed = sig_ds.select_columns(
        ["page_id", "mh_res", "simhash", "bottomk"]) \
        .map_batches(lambda t: _pack_payload(t, P),
                     batch_format="pyarrow")
    j2 = pair_join(pairs_ds, packed, right_key="page_id",
                   pair_schema=pair_schema, right_schema=sig_schema,
                   num_partitions=num_partitions)

    cfg_json = cfg.to_json()

    def score(t: pa.Table) -> pa.Table:
        c = PipelineConfig.from_json(cfg_json)
        if t.num_rows == 0:
            return SCORED_SCHEMA.empty_table()
        n = t.num_rows
        mh_a, sim_a, bka_flat, bka_off = _unpack_blobs(
            t.column("blob_a"), c.num_perms)
        mh_b, sim_b, bkb_flat, bkb_off = _unpack_blobs(
            t.column("blob_b"), c.num_perms)
        est_j = (mh_a == mh_b).mean(axis=1)
        ham = H.hamming64(sim_a, sim_b)
        # stack both docs' sketches into one flat+offsets layout so the
        # shared bottom-k helper applies
        flat = np.concatenate([bka_flat, bkb_flat])
        off = np.concatenate([bka_off, bka_off[-1] + bkb_off[1:]])
        ia = np.arange(n)
        ib = np.arange(n) + n
        jac_bk, con_bk = bottomk_pair_scores(flat, off, ia, ib, c.bottomk)
        src = t.column("source").to_pylist()
        keep_minsim, keep_screen = apply_rules(src, est_j, ham, con_bk, c)
        keep = keep_minsim | keep_screen
        out = pa.Table.from_arrays(
            [t.column("a"), t.column("b"),
             pa.array(src, type=pa.string()),
             pa.array(est_j, type=pa.float64()),
             pa.array(ham.astype(np.int32)),
             pa.array(jac_bk, type=pa.float64()),
             pa.array(con_bk, type=pa.float64()),
             pa.array(keep_minsim), pa.array(keep_screen)],
            schema=SCORED_SCHEMA)
        return out.filter(pa.array(keep))

    return j2.map_batches(score, batch_format="pyarrow")
