"""k-truss decomposition: iterative support peel over the
degree-ordered triangle plan.

The k-truss is the maximal subgraph whose every edge closes >= k-2
triangles inside the subgraph; it is computed by repeatedly dropping
under-supported edges until a fixed point (cohesive-subgraph mining —
Cohen 2008, public algorithm). Support counting reuses the
compact-forward wedge enumeration of ``triangles.triangle_count_fast``
(P numpy tasks over source-partitioned forward adjacency, closing
membership against the sorted edge-key array broadcast once); each
found triangle credits all three of its edges. For edge sets past a
node's memory swap the closing step for the bucketed hash-join plan of
``triangles.triangle_count`` exactly as the counting path does.
"""

from __future__ import annotations

import numpy as np
import ray


def edge_supports(a, b, n, P=8):
    """Per-edge triangle counts for a deduped (a < b) edge set.
    Returns an int64 array aligned with the (a, b) order."""
    m = len(a)
    keys = a * np.int64(n) + b
    # keys must be sorted for the membership test
    assert m < 2 or (keys[1:] > keys[:-1]).all()
    deg = np.bincount(a, minlength=n) + np.bincount(b, minlength=n)
    rank = np.lexsort((np.arange(n), deg))
    pos = np.empty(n, dtype=np.int64)
    pos[rank] = np.arange(n)
    fsrc = np.where(pos[a] < pos[b], a, b)
    fdst = np.where(pos[a] < pos[b], b, a)
    order = np.argsort(fsrc, kind="stable")
    fsrc, fdst = fsrc[order], fdst[order]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, fsrc + 1, 1)
    np.cumsum(indptr, out=indptr)
    key_ref = ray.put(keys)
    adj_ref = ray.put((indptr, fdst))

    @ray.remote
    def support_part(p):
        indptr_, fdst_ = ray.get(adj_ref)
        keys_ = ray.get(key_ref)
        cnt = np.zeros(len(keys_), dtype=np.int64)
        for u in range(p, n, P):
            nb = fdst_[indptr_[u]:indptr_[u + 1]]
            if len(nb) < 2:
                continue
            ii, jj = np.triu_indices(len(nb), k=1)
            x, y = nb[ii], nb[jj]
            lo = np.minimum(x, y)
            hi = np.maximum(x, y)
            kclose = lo * np.int64(n) + hi
            idx = np.searchsorted(keys_, kclose).clip(0, len(keys_) - 1)
            hit = keys_[idx] == kclose
            if not hit.any():
                continue
            np.add.at(cnt, idx[hit], 1)            # closing edge
            for w in (x[hit], y[hit]):             # the two wedge edges
                l2 = np.minimum(u, w)
                h2 = np.maximum(u, w)
                k2 = l2 * np.int64(n) + h2
                i2 = np.searchsorted(keys_, k2)
                np.add.at(cnt, i2, 1)
            del hit
        return cnt

    parts = ray.get([support_part.remote(p) for p in range(P)])
    out = parts[0].copy()    # plasma arrays are read-only views
    for c in parts[1:]:
        out += c
    return out


def k_truss(src, dst, n, k, P=8, max_rounds=1_000):
    """Edges of the k-truss of the (deduped, loop-free) undirected
    graph, as sorted (a, b) arrays, plus the peel round count."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    nl = src != dst
    a = np.minimum(src[nl], dst[nl])
    b = np.maximum(src[nl], dst[nl])
    keys = np.unique(a * np.int64(n) + b)
    a = (keys // n).astype(np.int64)
    b = (keys % n).astype(np.int64)
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        if len(a) == 0:
            break
        sup = edge_supports(a, b, n, P=P)
        keep = sup >= k - 2
        if keep.all():
            break
        a, b = a[keep], b[keep]
    return a, b, rounds
