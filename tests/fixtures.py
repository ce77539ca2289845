"""Deterministic graph fixtures (FIXTURES.md §3, mirroring the
reference test corpus at reference tests/test_VertexPartition.py:15-81)."""

import itertools

import numpy as np

from leidenalg_ray.graph import Graph

# Zachary karate club, 34 nodes / 78 undirected edges (public domain)
KARATE_EDGES = [
    (0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (0, 6), (0, 7), (0, 8),
    (0, 10), (0, 11), (0, 12), (0, 13), (0, 17), (0, 19), (0, 21),
    (0, 31), (1, 2), (1, 3), (1, 7), (1, 13), (1, 17), (1, 19),
    (1, 21), (1, 30), (2, 3), (2, 7), (2, 8), (2, 9), (2, 13),
    (2, 27), (2, 28), (2, 32), (3, 7), (3, 12), (3, 13), (4, 6),
    (4, 10), (5, 6), (5, 10), (5, 16), (6, 16), (8, 30), (8, 32),
    (8, 33), (9, 33), (13, 33), (14, 32), (14, 33), (15, 32),
    (15, 33), (18, 32), (18, 33), (19, 33), (20, 32), (20, 33),
    (22, 32), (22, 33), (23, 25), (23, 27), (23, 29), (23, 32),
    (23, 33), (24, 25), (24, 27), (24, 31), (25, 31), (26, 29),
    (26, 33), (27, 33), (28, 31), (28, 33), (29, 32), (29, 33),
    (30, 32), (30, 33), (31, 32), (31, 33), (32, 33),
]


def karate():
    return Graph(34, edges=KARATE_EDGES)


def full_graph(n):
    return Graph(n, edges=np.array(
        list(itertools.combinations(range(n), 2))))


def tree_graph(n, k, mode="undirected"):
    edges = [((i - 1) // k, i) for i in range(1, n)]
    if mode == "in":
        edges = [(b, a) for a, b in edges]
    return Graph(n, edges=edges, directed=mode in ("out", "in"))


def lattice(n, nei=3, directed=False):
    edges = [(i, (i + j) % n) for i in range(n)
             for j in range(1, nei + 1)]
    return Graph(n, edges=edges, directed=directed)


def erdos_renyi(n, p, directed=False, loops=False, seed=0):
    r = np.random.default_rng(seed)
    m = r.random((n, n)) < p
    if not directed:
        keep = np.triu(m, 1)
        if loops:
            keep |= np.diag(np.diag(m))
        s, d = np.nonzero(keep)
    else:
        if not loops:
            np.fill_diagonal(m, False)
        s, d = np.nonzero(m)
    return Graph(n, src=s, dst=d, directed=directed)


def weighted(g, seed=1):
    r = np.random.default_rng(seed)
    return Graph(g.n, src=g.src, dst=g.dst,
                 weights=r.random(g.ecount), directed=g.directed)


def disjoint_trees(n_trees=10, size=10, k=3):
    edges = []
    for c in range(n_trees):
        edges += [(((i - 1) // k) + size * c, i + size * c)
                  for i in range(1, size)]
    return Graph(n_trees * size, edges=edges)


def planted_partition(n_comm=4, per=25, p_in=0.5, p_out=0.01, seed=9):
    n = n_comm * per
    truth = np.repeat(np.arange(n_comm), per)
    r = np.random.default_rng(seed)
    M = r.random((n, n))
    same = truth[:, None] == truth[None, :]
    A = np.triu(same & (M < p_in) | ~same & (M < p_out), 1)
    s, d = np.nonzero(A)
    return Graph(n, src=s, dst=d), truth


def bipartite8():
    edges = [(0, 4), (0, 5), (0, 6), (1, 4), (1, 5), (2, 6), (2, 7),
             (3, 6), (3, 7), (3, 5)]
    return Graph(8, edges=edges), [0, 0, 0, 0, 1, 1, 1, 1]
