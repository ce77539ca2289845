"""Single-process numpy reference implementations used as test oracles
(SURVEY.md §5.2c) — deliberately simple and obviously-correct, never on
the hot path."""

from __future__ import annotations

import numpy as np


def pagerank_serial(src, dst, n, damping=0.85, tol=1e-6, max_iter=200,
                    weight=None, weighted=False, personalize=None):
    """``personalize``: seed vids; the teleport vector (and dangling
    redistribution) becomes uniform over the seeds instead of over all
    vertices (personalized PageRank)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    w = (np.asarray(weight, dtype=np.float64) if weight is not None
         else np.ones(len(src)))
    norm = np.zeros(n)
    if weighted:
        np.add.at(norm, src, w)
    else:
        np.add.at(norm, src, 1.0)
    if personalize is None:
        p = np.full(n, 1.0 / n)
    else:
        seeds = np.asarray(personalize, dtype=np.int64)
        p = np.zeros(n)
        p[seeds] = 1.0 / len(seeds)
    rank = p.copy()
    for it in range(max_iter):
        contrib = np.zeros(n)
        nz = norm > 0
        contrib[nz] = rank[nz] / norm[nz]
        per_edge = contrib[src] * (w if weighted else 1.0)
        agg = np.zeros(n)
        np.add.at(agg, dst, per_edge)
        dangling = rank[~nz].sum()
        new = (1.0 - damping) * p + damping * (agg + dangling * p)
        if np.abs(new - rank).sum() < tol:
            rank = new
            break
        rank = new
    return rank, it + 1


def sssp_serial(src, dst, n, sources, weight=None):
    """Weighted single-source (multi-seed) shortest distances by
    Bellman-Ford relaxation; unreachable = +inf. Pass both edge
    directions for undirected semantics."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    w = (np.asarray(weight, dtype=np.float64) if weight is not None
         else np.ones(len(src)))
    dist = np.full(n, np.inf)
    dist[np.asarray(sources, dtype=np.int64)] = 0.0
    for _ in range(n):
        cand = dist[src] + w
        new = dist.copy()
        np.minimum.at(new, dst, cand)
        if np.array_equal(new, dist):  # inf == inf -> equal; no NaNs
            break
        dist = new
    return dist


def connected_components_serial(src, dst, n):
    """Weak components; labels = min vid per component."""
    parent = np.arange(n)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(np.asarray(src), np.asarray(dst)):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    roots = np.array([find(v) for v in range(n)])
    return roots


def label_propagation_serial(src, dst, n, weight=None, max_iter=100,
                             weighted=True):
    """Synchronous plurality-label propagation, ties -> lowest label;
    both directions of each edge count (undirected semantics)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    w = (np.asarray(weight, dtype=np.float64) if weight is not None
         else np.ones(len(src)))
    nl = src != dst
    s2 = np.concatenate([src, dst[nl]])
    d2 = np.concatenate([dst, src[nl]])
    w2 = np.concatenate([w, w[nl]])
    label = np.arange(n, dtype=np.int64)
    for it in range(max_iter):
        key = d2 * (n + 1) + label[s2]
        uniq, inv = np.unique(key, return_inverse=True)
        tot = np.zeros(len(uniq))
        np.add.at(tot, inv, w2 if weighted else np.ones(len(w2)))
        d = (uniq // (n + 1)).astype(np.int64)
        l = (uniq % (n + 1)).astype(np.int64)
        order = np.lexsort((l, -tot, d))
        d_s, l_s = d[order], l[order]
        first = np.ones(len(d_s), dtype=bool)
        first[1:] = d_s[1:] != d_s[:-1]
        new = label.copy()
        new[d_s[first]] = l_s[first]
        if np.array_equal(new, label):
            break
        label = new
    return label, it + 1


def bfs_serial(src, dst, n, sources):
    """Unweighted hop distances from ``sources`` over the directed edge
    list as given (pass both directions for undirected semantics);
    unreachable = int64 max."""
    INF = np.iinfo(np.int64).max
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    dist = np.full(n, INF, dtype=np.int64)
    dist[np.asarray(sources, dtype=np.int64)] = 0
    frontier = set(int(s) for s in sources)
    adj = [[] for _ in range(n)]
    for a, b in zip(src, dst):
        adj[int(a)].append(int(b))
    d = 0
    while frontier:
        nxt = set()
        for v in frontier:
            for u in adj[v]:
                if dist[u] > d + 1:
                    dist[u] = d + 1
                    nxt.add(u)
        frontier = nxt
        d += 1
    return dist


def kcore_serial(src, dst, n, k):
    """Boolean mask of the k-core (max subgraph with min degree >= k)
    of the undirected simple graph; both directions expected in the
    edge list, duplicates collapsed here."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    nl = src != dst
    pairs = np.unique(src[nl] * np.int64(n) + dst[nl])
    a = (pairs // n).astype(np.int64)
    b = (pairs % n).astype(np.int64)
    alive = np.zeros(n, dtype=bool)
    alive[a] = True
    alive[b] = True
    while True:
        deg = np.zeros(n, dtype=np.int64)
        m = alive[a] & alive[b]
        np.add.at(deg, b[m], 1)
        new = alive & (deg >= k)
        if np.array_equal(new, alive):
            return alive
        alive = new


def hits_serial(src, dst, n, iters=20):
    """Fixed-iteration HITS, simultaneous (Jacobi) update from the old
    state, L1 normalisation each iteration; vertex set = endpoints of
    at least one edge."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    act = np.zeros(n, dtype=bool)
    act[src] = True
    act[dst] = True
    na = int(act.sum())
    hub = np.where(act, 1.0 / na, 0.0)
    auth = np.where(act, 1.0 / na, 0.0)
    for _ in range(iters):
        ar = np.zeros(n)
        np.add.at(ar, dst, hub[src])
        hr = np.zeros(n)
        np.add.at(hr, src, auth[dst])
        s_a, s_h = ar.sum(), hr.sum()
        auth = ar / s_a if s_a > 0 else ar
        hub = hr / s_h if s_h > 0 else hr
    return hub, auth, act


def triangles_serial(src, dst, n):
    """Per-vertex and global triangle counts (undirected simple graph:
    parallel edges and loops are collapsed/dropped first; each triangle
    counted once)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    nl = src != dst
    a = np.minimum(src[nl], dst[nl])
    b = np.maximum(src[nl], dst[nl])
    pairs = np.unique(a * np.int64(n) + b)
    a = (pairs // n).astype(np.int64)
    b = (pairs % n).astype(np.int64)
    adj = [set() for _ in range(n)]
    for x, y in zip(a, b):
        adj[int(x)].add(int(y))
        adj[int(y)].add(int(x))
    per_vertex = np.zeros(n, dtype=np.int64)
    total = 0
    # for each oriented edge (x<y), close with z>y adjacent to both so
    # each triangle x<y<z is counted exactly once
    for x, y in zip(a, b):
        for z in adj[int(x)] & adj[int(y)]:
            if z > int(y):
                per_vertex[int(x)] += 1
                per_vertex[int(y)] += 1
                per_vertex[z] += 1
                total += 1
    return per_vertex, int(total)
