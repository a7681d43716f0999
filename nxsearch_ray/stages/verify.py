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
    minhash: np.ndarray        # (n, P) uint64
    simhash: np.ndarray        # (n,) uint64
    bk_flat: np.ndarray        # bottom-k values concatenated (sorted/doc)
    bk_offsets: np.ndarray     # (n+1,) int64

    @classmethod
    def from_table(cls, t: pa.Table, num_perms: int) -> "SignatureIndex":
        page = t.column("page_id").to_numpy()
        order = np.argsort(page, kind="stable")
        t = t.take(pa.array(order, type=pa.int64()))
        mh_flat, _ = list_column_numpy(t.column("minhash"))
        bk_flat, bk_off = list_column_numpy(t.column("bottomk"))
        return cls(
            page_ids=page[order],
            minhash=mh_flat.reshape(len(page), num_perms),
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
    t = pa.concat_tables(
        sig_ds.select_columns(["page_id", "minhash", "simhash", "bottomk"])
        .iter_batches(batch_size=8192, batch_format="pyarrow"))
    return SignatureIndex.from_table(t, cfg.num_perms)


def bottomk_pair_scores(flat: np.ndarray, offsets: np.ndarray,
                        ia: np.ndarray, ib: np.ndarray,
                        k: int) -> tuple[np.ndarray, np.ndarray]:
    """(jaccard_bk, containment_bk) per pair from bottom-k sketches.

    Bottom-k estimate: within the k smallest of the union of both
    sketches, jaccard ≈ |in both| / |window|; containment of the
    smaller-sketch doc ≈ |in both| / |window ∩ smaller sketch|.
    Per-pair loop over sorted slices — candidate sets are orders of
    magnitude smaller than the corpus, so this is off the hot path."""
    jac = np.zeros(len(ia), dtype=np.float64)
    con = np.zeros(len(ia), dtype=np.float64)
    for i in range(len(ia)):
        sa = flat[offsets[ia[i]]:offsets[ia[i] + 1]]
        sb = flat[offsets[ib[i]]:offsets[ib[i] + 1]]
        if len(sa) == 0 or len(sb) == 0:
            continue
        merged = np.union1d(sa, sb)[:k]
        hi = merged[-1]
        both = np.intersect1d(sa, sb, assume_unique=True)
        nboth = int(np.searchsorted(both, hi, side="right"))
        # containment of the less-sampled-in-window side: divide by
        # min(|SA ≤ hi|, |SB ≤ hi|) — using list lengths instead is
        # wrong when one doc's values dominate the low window
        n_a = int(np.searchsorted(sa, hi, side="right"))
        n_b = int(np.searchsorted(sb, hi, side="right"))
        n_small = min(n_a, n_b)
        jac[i] = nboth / len(merged)
        con[i] = nboth / n_small if n_small else 0.0
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
    est_j = (idx.minhash[ia] == idx.minhash[ib]).mean(axis=1)
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
    """Actor-pool verify stage: ray.get the broadcast SignatureIndex
    once per actor in __init__ (zero-copy numpy views over plasma)."""

    def __init__(self, idx_ref, cfg_json: str):
        import ray
        self.idx = ray.get(idx_ref) if not isinstance(
            idx_ref, SignatureIndex) else idx_ref
        self.cfg = PipelineConfig.from_json(cfg_json)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return score_pairs_table(batch, self.idx, self.cfg)


def verify_pairs_broadcast(pairs_ds, idx_ref, cfg: PipelineConfig,
                           concurrency=(1, 8)):
    return pairs_ds.map_batches(
        VerifyBroadcastActor,
        fn_constructor_args=(idx_ref, cfg.to_json()),
        batch_format="pyarrow", batch_size=8192,
        concurrency=concurrency, num_cpus=1)


def verify_pairs_bucketed(pairs_ds, sig_ds, cfg: PipelineConfig,
                          num_buckets: int = 64):
    """Scale path: two partitioned hash joins then a stateless score.
    Decision math identical to the broadcast path (shared helpers)."""
    from nxsearch_ray.stages.join import hash_join

    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                             ("source", pa.string())])
    sig_schema = pa.schema([
        ("page_id", pa.int64()),
        ("minhash", pa.list_(pa.uint64(), cfg.num_perms)),
        ("simhash", pa.uint64()),
        ("bottomk", pa.list_(pa.uint64()))])

    sig_slim = sig_ds.select_columns(
        ["page_id", "minhash", "simhash", "bottomk"])
    j1 = hash_join(pairs_ds, sig_slim, left_key="a", right_key="page_id",
                   left_schema=pair_schema, right_schema=sig_schema,
                   num_buckets=num_buckets, right_suffix="_a")
    j1_schema = pa.schema(list(pair_schema) + [
        pa.field("minhash_a", pa.list_(pa.uint64(), cfg.num_perms)),
        pa.field("simhash_a", pa.uint64()),
        pa.field("bottomk_a", pa.list_(pa.uint64()))])
    j2 = hash_join(j1, sig_slim, left_key="b", right_key="page_id",
                   left_schema=j1_schema, right_schema=sig_schema,
                   num_buckets=num_buckets, right_suffix="_b")

    cfg_json = cfg.to_json()

    def score(t: pa.Table) -> pa.Table:
        c = PipelineConfig.from_json(cfg_json)
        if t.num_rows == 0:
            return SCORED_SCHEMA.empty_table()
        mh_a, _ = list_column_numpy(t.column("minhash_a"))
        mh_b, _ = list_column_numpy(t.column("minhash_b"))
        mh_a = mh_a.reshape(t.num_rows, c.num_perms)
        mh_b = mh_b.reshape(t.num_rows, c.num_perms)
        est_j = (mh_a == mh_b).mean(axis=1)
        ham = H.hamming64(t.column("simhash_a").to_numpy().astype(_U64),
                          t.column("simhash_b").to_numpy().astype(_U64))
        # stack both docs' sketches into one flat+offsets layout so the
        # shared bottom-k helper applies
        bka_flat, bka_off = list_column_numpy(t.column("bottomk_a"))
        bkb_flat, bkb_off = list_column_numpy(t.column("bottomk_b"))
        flat = np.concatenate([bka_flat, bkb_flat])
        off = np.concatenate([bka_off, bka_off[-1] + bkb_off[1:]])
        n = t.num_rows
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
