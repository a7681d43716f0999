"""Burkhard-Keller tree over Levenshtein distance.

Structure and search mirror the reference's metric tree
(src/algo/bktree.c: insert at child slot = distance to node, search
visits children in the [d - tolerance, d + tolerance] band), built on
the shared ``functions/levdist.py`` scalar with the tolerance cap.
Used by the fuzzy term lookup (stages/fuzzy.py), the analogue of
``idxterm_fuzzysearch`` (src/index/idxterm.c:210-249).
"""

from __future__ import annotations

from nxsearch_ray.functions.levdist import levenshtein


class BKTree:
    """children keyed by distance; deterministic for a fixed insert
    order (stages/fuzzy.py inserts in sorted-term order)."""

    __slots__ = ("_root",)

    def __init__(self, items=()):
        # node = [value, {dist: node}]
        self._root = None
        for v in items:
            self.insert(v)

    def insert(self, value: str) -> None:
        if self._root is None:
            self._root = [value, {}]
            return
        node = self._root
        while True:
            d = levenshtein(value, node[0])
            if d == 0:
                return                      # already present
            child = node[1].get(d)
            if child is None:
                node[1][d] = [value, {}]
                return
            node = child

    def search(self, value: str, tolerance: int) -> list[tuple[str, int]]:
        """All stored values within ``tolerance`` edits, as
        (value, distance), in tree-discovery order (bktree.c FIFO)."""
        out: list[tuple[str, int]] = []
        if self._root is None:
            return out
        queue = [self._root]
        head = 0
        while head < len(queue):
            node = queue[head]
            head += 1
            d = levenshtein(value, node[0], cap=None)
            if d <= tolerance:
                out.append((node[0], d))
            lo = max(d - tolerance, 0)
            hi = d + tolerance
            for cd, child in node[1].items():
                if lo <= cd <= hi:
                    queue.append(child)
        return out
