"""Suffix automaton / LCS / containment units."""

from __future__ import annotations

from nxsearch_ray.functions.suffix import (
    SuffixAutomaton,
    containment_ratio,
    lcs_tokens,
)


def test_lcs_basic():
    assert lcs_tokens([1, 2, 3, 4], [9, 2, 3, 8]) == 2
    assert lcs_tokens([1, 2, 3], [1, 2, 3]) == 3
    assert lcs_tokens([1, 2, 3], [4, 5, 6]) == 0
    assert lcs_tokens([], [1]) == 0


def test_lcs_substring_containment():
    base = list(range(100))
    slice_ = base[20:70]
    assert lcs_tokens(base, slice_) == 50
    assert containment_ratio(base, slice_) == 1.0


def test_lcs_symmetric():
    a = [1, 2, 3, 4, 5, 1, 2]
    b = [3, 4, 5, 9, 9, 1, 2, 3]
    assert lcs_tokens(a, b) == lcs_tokens(b, a) == 3


def test_automaton_recognizes_all_substrings():
    seq = [1, 2, 1, 3, 1, 2]
    sa = SuffixAutomaton(seq)
    for i in range(len(seq)):
        for j in range(i + 1, len(seq) + 1):
            sub = seq[i:j]
            assert sa.longest_common_substring(sub) == len(sub)


def test_automaton_rejects_missing():
    sa = SuffixAutomaton([1, 2, 3])
    assert sa.longest_common_substring([4, 5]) == 0
    assert sa.longest_common_substring([3, 1]) == 1  # '3' matches, '31' not


def test_containment_partial():
    base = list(range(50))
    # half-overlapping window: longest shared run is 25
    other = list(range(25, 75))
    assert lcs_tokens(base, other) == 25
    assert containment_ratio(base, other) == 0.5


def test_batch_adjudicate_matches_scalar():
    """batch_exact_adjudicate must be value-identical to the scalar
    exact_adjudicate row by row — short docs (< shingle_k), empty docs,
    exact copies, borderline near-misses and disjoint pairs."""
    import numpy as np

    from nxsearch_ray.config import PipelineConfig
    from nxsearch_ray.stages.suffix import (
        batch_exact_adjudicate,
        batch_shingle_jaccard,
        exact_adjudicate,
        exact_shingle_jaccard,
    )

    cfg = PipelineConfig()
    rng = np.random.default_rng(7)
    pairs = []
    base = rng.integers(1, 50, size=200).astype(np.uint64)
    pairs.append((base, base.copy()))                     # exact copy
    pairs.append((base, base[30:170]))                    # containment
    mut = base.copy()
    mut[::7] = rng.integers(100, 200, size=len(mut[::7])).astype(np.uint64)
    pairs.append((base, mut))                             # borderline
    pairs.append((base, rng.integers(500, 900, 150).astype(np.uint64)))
    pairs.append((base[:3], base[:2]))                    # < shingle_k
    pairs.append((np.empty(0, np.uint64), base[:10]))     # empty side
    pairs.append((np.empty(0, np.uint64), np.empty(0, np.uint64)))
    for _ in range(20):                                   # fuzz
        la, lb = rng.integers(0, 60, size=2)
        pairs.append((rng.integers(1, 30, la).astype(np.uint64),
                      rng.integers(1, 30, lb).astype(np.uint64)))

    ta_flat = np.concatenate([a for a, _ in pairs])
    tb_flat = np.concatenate([b for _, b in pairs])
    ta_off = np.zeros(len(pairs) + 1, np.int64)
    np.cumsum([len(a) for a, _ in pairs], out=ta_off[1:])
    tb_off = np.zeros(len(pairs) + 1, np.int64)
    np.cumsum([len(b) for _, b in pairs], out=tb_off[1:])

    lcs, con, jac = batch_exact_adjudicate(
        ta_flat, ta_off, tb_flat, tb_off, cfg)
    jac_only = batch_shingle_jaccard(
        ta_flat, ta_off, tb_flat, tb_off, cfg.shingle_k)
    for i, (a, b) in enumerate(pairs):
        s_lcs, s_con, s_jac = exact_adjudicate(a, b, cfg)
        assert lcs[i] == s_lcs, (i, lcs[i], s_lcs)
        assert con[i] == s_con, (i, con[i], s_con)
        assert jac[i] == s_jac, (i, jac[i], s_jac)
        if len(a) and len(b):
            assert jac_only[i] == exact_shingle_jaccard(a, b, cfg.shingle_k)
