"""Union-find with path compression + union by size.

Used (a) as the driver-side reducer for connected components when the
verified pair set is small enough to stream to one process (the common
case after verification — pairs ≪ docs), and (b) as the ground-truth
oracle for the distributed label-propagation implementation.  Load
balancing concerns for the distributed variant follow BTS (ICDE 2024,
PAPERS.md) — see stages/cc.py.
"""

from __future__ import annotations


class UnionFind:
    __slots__ = ("parent", "size")

    def __init__(self):
        self.parent: dict[int, int] = {}
        self.size: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent
        if x not in p:
            p[x] = x
            self.size[x] = 1
            return x
        root = x
        while p[root] != root:
            root = p[root]
        while p[x] != root:
            p[x], x = root, p[x]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if self.size[ra] < self.size[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        self.size[ra] += self.size[rb]

    def labels_min(self) -> dict[int, int]:
        """node → min node id of its component (deterministic cluster id
        regardless of union order)."""
        root_min: dict[int, int] = {}
        for x in self.parent:
            r = self.find(x)
            m = root_min.get(r)
            if m is None or x < m:
                root_min[r] = x
        return {x: root_min[self.find(x)] for x in self.parent}
