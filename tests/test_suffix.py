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
