"""Levenshtein edit distance (single-row Wagner–Fischer).

Scalar-function parity with the reference's fuzzy-match support
(reference src/algo/levdist.c:67-150 — same single-row DP).  The
reference uses it under a BK-tree for fuzzy term lookup
(src/index/idxterm.c:210-249); our engine's fuzzy analogue is SimHash
Hamming bucketing, but the scalar is part of the function library and
useful for token-level near-match filters.
"""

from __future__ import annotations


def levenshtein(a: str, b: str, *, cap: int | None = None) -> int:
    """Edit distance; with ``cap``, returns cap+1 early once the
    distance provably exceeds it (the BK-tree tolerance trick)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    if cap is not None and abs(la - lb) > cap:
        return cap + 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    prev = list(range(la + 1))
    for j in range(1, lb + 1):
        cur = [j] + [0] * la
        bj = b[j - 1]
        row_min = cur[0]
        for i in range(1, la + 1):
            cost = 0 if a[i - 1] == bj else 1
            cur[i] = min(prev[i] + 1, cur[i - 1] + 1,
                         prev[i - 1] + cost)
            if cur[i] < row_min:
                row_min = cur[i]
        if cap is not None and row_min > cap:
            return cap + 1
        prev = cur
    return prev[la]
