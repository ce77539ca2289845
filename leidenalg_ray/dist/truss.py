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


def k_truss_partitioned(src, dst, n, k, K=8, max_rounds=1_000):
    """>node-memory k-truss: edges stay bucketed by ``lo % K`` in the
    object store across peel rounds; each round mirrors
    ``triangles.triangle_count``'s plan (degree rank -> forward
    orientation -> wedge keys shipped to the closing edge's bucket)
    plus one extra K x K exchange that credits each found triangle
    back to its two wedge edges' home buckets. The driver holds only
    O(V) degree partials and per-round drop counts — never an edge
    array.

    Returns (a, b, rounds) like ``k_truss`` (driver-side result
    arrays; write per-bucket outputs directly at real scale).
    """
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    nl = src != dst
    a = np.minimum(src[nl], dst[nl])
    b = np.maximum(src[nl], dst[nl])
    keys = np.unique(a * np.int64(n) + b)
    a = (keys // n).astype(np.int64)
    b = (keys % n).astype(np.int64)
    # initial buckets (sorted within bucket by key, for membership)
    edge_refs = []
    for kk in range(K):
        m = (a % K) == kk
        edge_refs.append(ray.put((a[m], b[m])))

    @ray.remote
    def degrees(edges):
        ea, eb = edges
        v, c = np.unique(np.concatenate([ea, eb]), return_counts=True)
        return v, c

    @ray.remote
    def forward(vp, edges):
        verts_, pos_ = vp
        ea, eb = edges
        pa_ = pos_[np.searchsorted(verts_, ea)]
        pb_ = pos_[np.searchsorted(verts_, eb)]
        af = pa_ < pb_
        u = np.where(af, ea, eb)
        v = np.where(af, eb, ea)
        bucket = u % K
        order = np.argsort(bucket, kind="stable")
        u, v, bucket = u[order], v[order], bucket[order]
        bounds = np.searchsorted(bucket, np.arange(K + 1))
        return [(u[bounds[i]:bounds[i + 1]], v[bounds[i]:bounds[i + 1]])
                for i in range(K)]

    @ray.remote
    def wedges(*parts):
        u = np.concatenate([p[0] for p in parts])
        v = np.concatenate([p[1] for p in parts])
        order = np.argsort(u, kind="stable")
        u, v = u[order], v[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]]) \
            if len(u) else np.empty(0, np.int64)
        ends = np.append(starts[1:], len(u))
        mids, los, his = [], [], []
        for s0, s1 in zip(starts, ends):
            if s1 - s0 < 2:
                continue
            nb = v[s0:s1]
            ii, jj = np.triu_indices(len(nb), k=1)
            x, y = nb[ii], nb[jj]
            mids.append(np.full(len(x), u[s0]))
            los.append(np.minimum(x, y))
            his.append(np.maximum(x, y))
        if not mids:
            e = np.empty(0, np.int64)
            return [(e, e, e)] * K
        mid = np.concatenate(mids)
        lo = np.concatenate(los)
        hi = np.concatenate(his)
        bucket = lo % K
        order = np.argsort(bucket, kind="stable")
        mid, lo, hi, bucket = (mid[order], lo[order], hi[order],
                               bucket[order])
        bounds = np.searchsorted(bucket, np.arange(K + 1))
        return [(mid[bounds[i]:bounds[i + 1]],
                 lo[bounds[i]:bounds[i + 1]],
                 hi[bounds[i]:bounds[i + 1]]) for i in range(K)]

    @ray.remote
    def close(edges, *wparts):
        """Membership-test wedges against this bucket's edges; credit
        the closing edge locally, ship wedge-edge credits home."""
        ea, eb = edges
        keys_ = ea * np.int64(n) + eb
        mid = np.concatenate([p[0] for p in wparts])
        lo = np.concatenate([p[1] for p in wparts])
        hi = np.concatenate([p[2] for p in wparts])
        sup_local = np.zeros(len(keys_), dtype=np.int64)
        credits = [[] for _ in range(K)]
        if len(mid) and len(keys_):
            wk = lo * np.int64(n) + hi
            idx = np.searchsorted(keys_, wk).clip(0, len(keys_) - 1)
            hit = keys_[idx] == wk
            np.add.at(sup_local, idx[hit], 1)
            for w in (lo[hit], hi[hit]):
                l2 = np.minimum(mid[hit], w)
                h2 = np.maximum(mid[hit], w)
                k2 = l2 * np.int64(n) + h2
                tgt = l2 % K
                for i in range(K):
                    credits[i].append(k2[tgt == i])
        out = [np.concatenate(c) if c else np.empty(0, np.int64)
               for c in credits]
        return (sup_local, *out)

    @ray.remote
    def peel(edges, sup_local, *credit_keys):
        ea, eb = edges
        keys_ = ea * np.int64(n) + eb
        sup = sup_local.copy()
        for ck in credit_keys:
            if len(ck):
                np.add.at(sup, np.searchsorted(keys_, ck), 1)
        keep = sup >= k - 2
        return (ea[keep], eb[keep]), int((~keep).sum())

    rounds = 0
    for rounds in range(1, max_rounds + 1):
        deg_parts = ray.get([degrees.remote(edge_refs[i])
                             for i in range(K)])
        if not any(len(p[0]) for p in deg_parts):
            break
        verts = np.unique(np.concatenate([p[0] for p in deg_parts]))
        deg = np.zeros(len(verts), dtype=np.int64)
        for v, c in deg_parts:
            deg[np.searchsorted(verts, v)] += c
        rank = np.lexsort((verts, deg))
        pos = np.empty(len(verts), dtype=np.int64)
        pos[rank] = np.arange(len(verts))
        vp_ref = ray.put((verts, pos))
        fwd = [forward.options(num_returns=K).remote(
            vp_ref, edge_refs[i]) for i in range(K)]
        if K == 1:
            fwd = [[r] for r in fwd]
        wref = [wedges.options(num_returns=K).remote(
            *[fwd[j][i] for j in range(K)]) for i in range(K)]
        if K == 1:
            wref = [[r] for r in wref]
        cref = [close.options(num_returns=K + 1).remote(
            edge_refs[i], *[wref[j][i] for j in range(K)])
            for i in range(K)]
        outs = [peel.options(num_returns=2).remote(
            edge_refs[i], cref[i][0],
            *[cref[j][1 + i] for j in range(K)]) for i in range(K)]
        edge_refs = [o[0] for o in outs]
        dropped = sum(ray.get([o[1] for o in outs]))
        if dropped == 0:
            break
    parts = ray.get(edge_refs)
    a = np.concatenate([p[0] for p in parts]) if parts else a[:0]
    b = np.concatenate([p[1] for p in parts]) if parts else b[:0]
    order = np.lexsort((b, a))
    return a[order], b[order], rounds
