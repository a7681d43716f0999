"""Union-find reducer units."""

from __future__ import annotations

import random

from nxsearch_ray.state.unionfind import UnionFind


def test_basic_components():
    uf = UnionFind()
    uf.union(1, 2)
    uf.union(3, 4)
    uf.union(2, 3)
    uf.union(10, 11)
    labels = uf.labels_min()
    assert labels[1] == labels[2] == labels[3] == labels[4] == 1
    assert labels[10] == labels[11] == 10


def test_label_is_min_member_regardless_of_order():
    edges = [(5, 9), (9, 2), (2, 7), (100, 50)]
    for perm in range(10):
        rng = random.Random(perm)
        shuffled = edges[:]
        rng.shuffle(shuffled)
        uf = UnionFind()
        for a, b in shuffled:
            if rng.random() < 0.5:
                a, b = b, a
            uf.union(a, b)
        labels = uf.labels_min()
        assert labels[5] == labels[9] == labels[2] == labels[7] == 2
        assert labels[100] == labels[50] == 50


def test_large_random_graph_matches_naive():
    rng = random.Random(11)
    edges = [(rng.randrange(500), rng.randrange(500)) for _ in range(400)]
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    labels = uf.labels_min()

    # naive BFS components
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seen: dict[int, int] = {}
    for start in adj:
        if start in seen:
            continue
        comp = {start}
        stack = [start]
        while stack:
            x = stack.pop()
            for y in adj[x]:
                if y not in comp:
                    comp.add(y)
                    stack.append(y)
        m = min(comp)
        for x in comp:
            seen[x] = m
    assert labels == seen
