"""Suffix/containment pass: exact long-span substring verification.

Candidate generation is the anchor-bucket shuffle (stages/pairs.py
``explode_anchors``: content-defined anchor shingles, h % anchor_mod ==
0, shared by containing and contained documents).  Survivors of the
bottom-k containment screen are verified *exactly* with a suffix
automaton over canonical token-id sequences (functions/suffix.py).

The token sequences are fetched by broadcast lookup (test scale) —
at 10^12 docs this becomes the bucketed hash-join plan exactly like
stages/verify.py; both paths share the per-pair math.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from nxsearch_ray.config import PipelineConfig
from nxsearch_ray.functions.suffix import lcs_tokens
from nxsearch_ray.stages.signatures import list_column_numpy

SUFFIX_PAIR_SCHEMA = pa.schema([
    ("a", pa.int64()), ("b", pa.int64()), ("source", pa.string()),
    ("lcs_len", pa.int32()), ("containment", pa.float64()),
    ("exact_jaccard", pa.float64())])


@dataclass
class TokenIndex:
    """page_id → canonical token-id sequence, broadcast via ray.put."""

    page_ids: np.ndarray     # (n,) int64 sorted
    tok_flat: np.ndarray     # uint64 concatenated
    tok_offsets: np.ndarray  # (n+1,) int64

    @classmethod
    def from_table(cls, t: pa.Table) -> "TokenIndex":
        page = t.column("page_id").to_numpy()
        order = np.argsort(page, kind="stable")
        t = t.take(pa.array(order, type=pa.int64()))
        flat, off = list_column_numpy(t.column("token_ids"))
        return cls(page_ids=page[order], tok_flat=flat, tok_offsets=off)

    def tokens_for(self, pid: int) -> np.ndarray:
        pos = int(np.searchsorted(self.page_ids, pid))
        if pos >= len(self.page_ids) or self.page_ids[pos] != pid:
            raise KeyError(pid)
        return self.tok_flat[self.tok_offsets[pos]:self.tok_offsets[pos + 1]]

    def gather(self, pids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized multi-doc lookup: (flat token ids, offsets) in
        ``pids`` order.  Raises KeyError on any missing id."""
        from nxsearch_ray.functions.hashing import _seg_arange

        pids = np.asarray(pids, dtype=np.int64)
        if len(pids) == 0:
            return (np.empty(0, self.tok_flat.dtype),
                    np.zeros(1, dtype=np.int64))
        if len(self.page_ids) == 0:
            raise KeyError(int(pids[0]))
        pos = np.searchsorted(self.page_ids, pids)
        clipped = np.minimum(pos, len(self.page_ids) - 1)
        bad = (pos >= len(self.page_ids)) | (self.page_ids[clipped] != pids)
        if bad.any():
            raise KeyError(int(pids[np.argmax(bad)]))
        pos = clipped
        starts = self.tok_offsets[pos]
        counts = self.tok_offsets[pos + 1] - starts
        offsets = np.zeros(len(pids) + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        return self.tok_flat[_seg_arange(starts, counts)], offsets


def collect_token_index(canonical_ds) -> TokenIndex:
    t = pa.concat_tables(
        b for b in canonical_ds.select_columns(["page_id", "token_ids"])
        .iter_batches(batch_size=8192, batch_format="pyarrow"))
    return TokenIndex.from_table(t)


def build_token_index_ref(canonical_ds):
    """Build the broadcast TokenIndex in ONE remote task (driver never
    holds it); returns the ObjectRef — see
    verify.build_signature_index_ref for the rationale."""
    import ray

    refs = canonical_ds.select_columns(
        ["page_id", "token_ids"]).to_arrow_refs()
    if not refs:
        return ray.put(TokenIndex(
            page_ids=np.empty(0, np.int64),
            tok_flat=np.empty(0, np.uint64),
            tok_offsets=np.zeros(1, np.int64)))

    @ray.remote
    def _build(*blocks):
        return TokenIndex.from_table(pa.concat_tables(blocks))

    return _build.remote(*refs)


def exact_adjudicate(ta: np.ndarray, tb: np.ndarray, cfg: PipelineConfig
                     ) -> tuple[int, float, float]:
    """(lcs_len, containment, exact_jaccard) for one token-id pair —
    the single exact-decision kernel shared by the broadcast stage, the
    bucketed stage and the oracle.

    The exact shingle Jaccard (vectorized numpy) runs first; when it
    already crosses the keep threshold the pure-Python suffix-automaton
    LCS — the per-pair cost ceiling of this stage — is skipped and
    (lcs, containment) are reported as (-1, 0.0) sentinels.  The KEEP
    decision (containment ≥ thr OR jaccard ≥ thr) is unchanged."""
    m = min(len(ta), len(tb))
    if m == 0:
        return 0, 0.0, 0.0
    jac = exact_shingle_jaccard(ta, tb, cfg.shingle_k)
    if jac >= cfg.jaccard_threshold:
        return -1, 0.0, jac
    lcs = lcs_tokens(ta.tolist(), tb.tolist())
    return lcs, lcs / m, jac


def _seg_unique(vals: np.ndarray, offsets: np.ndarray, n: int
                ) -> tuple[np.ndarray, np.ndarray]:
    """Per-segment unique: (flat unique values grouped by segment,
    per-segment unique counts)."""
    seg = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
    order = np.lexsort((vals, seg))
    v, s = vals[order], seg[order]
    keep = np.ones(len(v), dtype=bool)
    keep[1:] = (v[1:] != v[:-1]) | (s[1:] != s[:-1])
    v, s = v[keep], s[keep]
    return v, np.bincount(s, minlength=n)


def batch_shingle_jaccard(ta_flat: np.ndarray, ta_off: np.ndarray,
                          tb_flat: np.ndarray, tb_off: np.ndarray,
                          k: int) -> np.ndarray:
    """Exact k-shingle-set Jaccard for a whole block of pairs at once:
    TWO shingle_hashes calls (one per side) instead of two per pair,
    then vectorized per-segment set unique + intersection.  Value-
    identical to ``exact_shingle_jaccard`` row by row (same shingle
    hashing, same integer set math, same division)."""
    from nxsearch_ray.functions import hashing as H

    n = len(ta_off) - 1
    sha, offa = H.shingle_hashes(ta_flat, np.asarray(ta_off, np.int64), k)
    shb, offb = H.shingle_hashes(tb_flat, np.asarray(tb_off, np.int64), k)
    ua, ca = _seg_unique(sha, offa, n)
    ub, cb = _seg_unique(shb, offb, n)
    # Each side is unique within a segment, so an adjacent (seg, value)
    # duplicate in the merged sorted stream means "present in both".
    seg = np.concatenate([np.repeat(np.arange(n, dtype=np.int64), ca),
                          np.repeat(np.arange(n, dtype=np.int64), cb)])
    val = np.concatenate([ua, ub])
    order = np.lexsort((val, seg))
    seg_s, val_s = seg[order], val[order]
    dup = (seg_s[1:] == seg_s[:-1]) & (val_s[1:] == val_s[:-1])
    inter = np.bincount(seg_s[1:][dup], minlength=n)
    union = ca + cb - inter
    out = np.zeros(n, dtype=np.float64)
    nz = union > 0
    out[nz] = inter[nz] / union[nz]
    return out


def batch_exact_adjudicate(ta_flat: np.ndarray, ta_off: np.ndarray,
                           tb_flat: np.ndarray, tb_off: np.ndarray,
                           cfg: PipelineConfig
                           ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Block-batched ``exact_adjudicate``: vectorized shingle Jaccard
    across all pairs decides first; the pure-Python suffix-automaton
    LCS runs only for the borderline remainder (jac < threshold).
    Decision- and value-identical to the scalar kernel per row."""
    ta_off = np.asarray(ta_off, dtype=np.int64)
    tb_off = np.asarray(tb_off, dtype=np.int64)
    n = len(ta_off) - 1
    m = np.minimum(ta_off[1:] - ta_off[:-1], tb_off[1:] - tb_off[:-1])
    jac = batch_shingle_jaccard(ta_flat, ta_off, tb_flat, tb_off,
                                cfg.shingle_k)
    jac[m == 0] = 0.0
    lcs = np.zeros(n, dtype=np.int32)
    con = np.zeros(n, dtype=np.float64)
    passed = (jac >= cfg.jaccard_threshold) & (m > 0)
    lcs[passed] = -1
    for i in np.flatnonzero(~passed & (m > 0)):
        length = lcs_tokens(ta_flat[ta_off[i]:ta_off[i + 1]].tolist(),
                            tb_flat[tb_off[i]:tb_off[i + 1]].tolist())
        lcs[i] = length
        con[i] = length / int(m[i])
    return lcs, con, jac


def exact_shingle_jaccard(ta: np.ndarray, tb: np.ndarray,
                          k: int) -> float:
    """Exact Jaccard of the two docs' k-shingle sets (recomputed from
    token ids — identical shingle hashing to the signature stage)."""
    from nxsearch_ray.functions import hashing as H

    off = np.array([0, len(ta)], dtype=np.int64)
    sha, _ = H.shingle_hashes(ta, off, k)
    offb = np.array([0, len(tb)], dtype=np.int64)
    shb, _ = H.shingle_hashes(tb, offb, k)
    sa = np.unique(sha)
    sb = np.unique(shb)
    if len(sa) == 0 or len(sb) == 0:
        return 0.0
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    return inter / (len(sa) + len(sb) - inter)


def exact_containment_table(pairs: pa.Table, idx: TokenIndex,
                            cfg: PipelineConfig) -> pa.Table:
    """Per-pair exact adjudication (shared with the oracle): keeps a
    pair when its exact suffix-automaton containment ≥
    containment_threshold OR its exact shingle Jaccard ≥
    jaccard_threshold (the borderline-est_j rescue)."""
    a = pairs.column("a").to_numpy()
    b = pairs.column("b").to_numpy()
    ta_flat, ta_off = idx.gather(a)
    tb_flat, tb_off = idx.gather(b)
    lcs, con, jac = batch_exact_adjudicate(
        ta_flat, ta_off, tb_flat, tb_off, cfg)
    keep = (con >= cfg.containment_threshold) | \
        (jac >= cfg.jaccard_threshold)
    src = (pairs.column("source").cast(pa.string())
           if "source" in pairs.column_names
           else pa.array(["suffix"] * len(a), type=pa.string()))
    out = pa.Table.from_arrays(
        [pairs.column("a"), pairs.column("b"), src,
         pa.array(lcs), pa.array(con), pa.array(jac)],
        schema=SUFFIX_PAIR_SCHEMA)
    return out.filter(pa.array(keep))


class SuffixVerifyActor:
    def __init__(self, idx_ref, cfg_json: str):
        import ray
        self.idx = ray.get(idx_ref) if not isinstance(
            idx_ref, TokenIndex) else idx_ref
        self.cfg = PipelineConfig.from_json(cfg_json)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return exact_containment_table(batch, self.idx, self.cfg)


# per-worker-process cache (same rationale as verify._BCAST_CACHE:
# plasma get is zero-copy, tasks need no warm state worth an actor
# pool's ramp + coarse per-block task granularity)
_TOKIDX_CACHE: dict = {}


def suffix_verify_broadcast(pairs_ds, idx_ref, cfg: PipelineConfig,
                            concurrency=None):
    key = (idx_ref.hex() if hasattr(idx_ref, "hex") else id(idx_ref),
           cfg.config_hash())
    cfg_json = cfg.to_json()

    def adjudicate_batch(batch: pa.Table) -> pa.Table:
        import ray

        cached = _TOKIDX_CACHE.get(key)
        if cached is None:
            idx = ray.get(idx_ref) if not isinstance(
                idx_ref, TokenIndex) else idx_ref
            cached = (idx, PipelineConfig.from_json(cfg_json))
            _TOKIDX_CACHE.clear()
            _TOKIDX_CACHE[key] = cached
        return exact_containment_table(batch, cached[0], cached[1])

    kwargs = {}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return pairs_ds.map_batches(
        adjudicate_batch, batch_format="pyarrow", batch_size=4096,
        **kwargs)


def suffix_verify_bucketed(pairs_ds, canonical_ds, cfg: PipelineConfig,
                           num_partitions: int | None = None):
    """Scale path for the exact-adjudication stage: attach both docs'
    token sequences via the fused pair-payload join (no driver-side
    token index), then a stateless per-pair exact decision.  Decision
    math identical to the broadcast path (shared ``exact_adjudicate``).

    Exchange width sized to the screen-pair stream (the payload side
    is semi-join-pruned to ≤ 2 rows per pair); token_ids payloads are
    heavy, so the per-partition row target is small."""
    from nxsearch_ray.stages.join import pair_join
    from nxsearch_ray.stages.shuffle import sized_num_partitions
    from nxsearch_ray.stages.signatures import list_column_numpy

    import ray

    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                             ("source", pa.string())])
    tok_schema = pa.schema([("page_id", pa.int64()),
                            ("token_ids", pa.list_(pa.uint64()))])

    # semi-join: only a tiny fraction of docs appear in screen-passing
    # pairs, so broadcast the needed page-id SET (ids only — tiny even
    # when payloads are not) and prune the canonical side before the
    # payload-carrying sort.  Classic semi-join reduction.  The set is
    # built in ONE remote task (the driver never holds it) and read
    # zero-copy from the object store by every prune task.
    pairs_ds = pairs_ds.materialize()
    id_refs = pairs_ds.select_columns(["a", "b"]).to_arrow_refs()

    @ray.remote
    def _needed_ids(*blocks):
        blocks = [b for b in blocks if b.num_columns > 0]
        if not blocks:
            return np.empty(0, np.int64)
        chunks = [np.concatenate([t.column("a").to_numpy(),
                                  t.column("b").to_numpy()])
                  for t in blocks]
        return np.unique(np.concatenate(chunks))

    needed_ref = _needed_ids.remote(*id_refs)

    def prune(t: pa.Table) -> pa.Table:
        ids = t.column("page_id").to_numpy()
        want = ray.get(needed_ref)
        pos = np.searchsorted(want, ids)
        pos = np.clip(pos, 0, max(len(want) - 1, 0))
        hit = (len(want) > 0) & (want[pos] == ids)
        return t.filter(pa.array(hit))

    tok_slim = canonical_ds.select_columns(["page_id", "token_ids"]) \
        .map_batches(prune, batch_format="pyarrow")
    if num_partitions is None:
        # pairs_ds was materialized above — count() is metadata
        num_partitions = sized_num_partitions(
            2 * pairs_ds.count(), rows_per_partition=8192)
    j2 = pair_join(pairs_ds, tok_slim, right_key="page_id",
                   pair_schema=pair_schema, right_schema=tok_schema,
                   num_partitions=num_partitions)

    cfg_json = cfg.to_json()

    def adjudicate(t: pa.Table) -> pa.Table:
        c = PipelineConfig.from_json(cfg_json)
        if t.num_rows == 0:
            return SUFFIX_PAIR_SCHEMA.empty_table()
        ta_flat, ta_off = list_column_numpy(t.column("token_ids_a"))
        tb_flat, tb_off = list_column_numpy(t.column("token_ids_b"))
        lcs, con, jac = batch_exact_adjudicate(
            ta_flat, ta_off, tb_flat, tb_off, c)
        keep = (con >= c.containment_threshold) | \
            (jac >= c.jaccard_threshold)
        out = pa.Table.from_arrays(
            [t.column("a"), t.column("b"),
             t.column("source").cast(pa.string()),
             pa.array(lcs), pa.array(con), pa.array(jac)],
            schema=SUFFIX_PAIR_SCHEMA)
        return out.filter(pa.array(keep))

    return j2.map_batches(adjudicate, batch_format="pyarrow")
