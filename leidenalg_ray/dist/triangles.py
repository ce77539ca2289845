"""Distributed triangle counting (SURVEY.md §2.8).

Two paths share the same degree-ordered (compact-forward) algorithm —
orient each edge from the lower-(degree, vid) endpoint so wedges
enumerate only among forward neighbours (sum outdeg^2, outdeg in
O(sqrt(2m)); the standard skew fix):

- ``triangle_count_fast``: the whole canonical edge-key array
  broadcasts once via ``ray.put`` — fastest while the deduped edge set
  fits a node.
- ``triangle_count``: the >node-memory form. The edge set spills to
  K hash partitions (by the lower endpoint), degree/rank state is the
  only O(V) driver piece, and wedge keys flow worker-to-worker into
  the partition that owns their closing edge — no stage ever holds
  the full edge set, and no Ray Data join materialises the wedge
  stream (the join formulation measured 112x slower than the
  broadcast path; this one is within a few x).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray


def triangle_count(edges_ds, num_partitions=16, per_vertex=False,
                   spill_dir=None):
    """Global triangle count (int), optionally with a per-vertex count
    Dataset ``(v, n_triangles)`` — partitioned compact-forward plan:

    1. orient low->high + per-batch pre-dedup -> partitioned parquet
       spill by ``a % K`` (resumable; each bucket fits a worker),
    2. K loader tasks: exact partition-local dedup (every copy of an
       edge shares its bucket) + compressed degree partials,
    3. driver combines degrees (O(V)) into the (degree, vid) rank,
    4. K re-bucket tasks orient edges forward and ship them to their
       source vertex's bucket (worker-to-worker, ``num_returns=K``),
    5. K wedge tasks enumerate forward-neighbour pairs per vertex and
       ship each closing key (lo, hi) to bucket ``lo % K``,
    6. K close tasks membership-test wedge keys against their bucket's
       sorted edge keys.

    Partitioning assumption: vid key packing ``lo * n + hi`` needs
    ``n < 3e9`` in int64; beyond that swap for a two-level
    (searchsorted on lo, then hi) membership test.
    """
    import os
    import tempfile
    import pyarrow.dataset as pads

    K = int(num_partitions)
    spill_dir = spill_dir or tempfile.mkdtemp(prefix="lray_tri_")

    def orient(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        nl = s != d
        a = np.minimum(s[nl], d[nl])
        b = np.maximum(s[nl], d[nl])
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        first = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])] \
            if len(a) else np.empty(0, bool)
        a, b = a[first], b[first]
        return pa.table({"a": pa.array(a), "b": pa.array(b),
                         "part": pa.array((a % K).astype(np.int32))})

    edges_ds.map_batches(orient, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .write_parquet(spill_dir, partition_cols=["part"])

    @ray.remote(num_returns=2)
    def load_bucket(k):
        d = os.path.join(spill_dir, f"part={k}")
        e = np.empty(0, np.int64)
        if not os.path.isdir(d):
            return (e, e.copy()), (e.copy(), e.copy())
        t = pads.dataset(d).to_table(columns=["a", "b"])
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        first = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])] \
            if len(a) else np.empty(0, bool)
        a, b = a[first], b[first]
        v, c = np.unique(np.concatenate([a, b]), return_counts=True)
        return (a, b), (v, c)

    outs = [load_bucket.remote(k) for k in range(K)]
    edge_refs = [o[0] for o in outs]
    deg_parts = ray.get([o[1] for o in outs])

    # combine degrees -> (degree, vid) total order; O(V) driver state
    verts = np.unique(np.concatenate([p[0] for p in deg_parts]))
    deg = np.zeros(len(verts), dtype=np.int64)
    for v, c in deg_parts:
        deg[np.searchsorted(verts, v)] += c
    rank_order = np.lexsort((verts, deg))
    pos = np.empty(len(verts), dtype=np.int64)
    pos[rank_order] = np.arange(len(verts))
    n = int(verts.max()) + 1 if len(verts) else 1
    vp_ref = ray.put((verts, pos, np.int64(n)))

    @ray.remote
    def forward_bucket(vp, edges):
        verts_, pos_, _ = vp
        a, b = edges
        pa_ = pos_[np.searchsorted(verts_, a)]
        pb_ = pos_[np.searchsorted(verts_, b)]
        a_first = pa_ < pb_
        u = np.where(a_first, a, b)
        v = np.where(a_first, b, a)
        bucket = u % K
        order = np.argsort(bucket, kind="stable")
        u, v, bucket = u[order], v[order], bucket[order]
        bounds = np.searchsorted(bucket, np.arange(K + 1))
        return [(u[bounds[k]:bounds[k + 1]], v[bounds[k]:bounds[k + 1]])
                for k in range(K)]

    fwd_refs = [forward_bucket.options(num_returns=K).remote(
        vp_ref, edge_refs[k]) for k in range(K)]
    if K == 1:
        fwd_refs = [[r] for r in fwd_refs]

    @ray.remote
    def wedge_bucket(vp, *parts):
        verts_, pos_, n_ = vp
        u = np.concatenate([p[0] for p in parts])
        v = np.concatenate([p[1] for p in parts])
        pv = pos_[np.searchsorted(verts_, v)]
        order = np.lexsort((pv, u))
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
        return [(mid[bounds[k]:bounds[k + 1]],
                 lo[bounds[k]:bounds[k + 1]],
                 hi[bounds[k]:bounds[k + 1]]) for k in range(K)]

    wedge_refs = [wedge_bucket.options(num_returns=K).remote(
        vp_ref, *[fwd_refs[j][k] for j in range(K)])
        for k in range(K)]
    if K == 1:
        wedge_refs = [[r] for r in wedge_refs]

    @ray.remote(num_returns=2)
    def close_bucket(vp, edges, *wparts):
        _, _, n_ = vp
        a, b = edges
        keys = a * n_ + b          # sorted: edges lexsorted by (a, b)
        mid = np.concatenate([p[0] for p in wparts])
        lo = np.concatenate([p[1] for p in wparts])
        hi = np.concatenate([p[2] for p in wparts])
        if len(mid) == 0 or len(keys) == 0:
            e = np.empty(0, np.int64)
            return 0, (e, e.copy())
        wk = lo * n_ + hi
        idx = np.searchsorted(keys, wk).clip(0, len(keys) - 1)
        hit = keys[idx] == wk
        if not per_vertex:
            return int(hit.sum()), (np.empty(0, np.int64),
                                    np.empty(0, np.int64))
        tri_v = np.concatenate([mid[hit], lo[hit], hi[hit]])
        uv, cv = np.unique(tri_v, return_counts=True)
        return int(hit.sum()), (uv, cv.astype(np.int64))

    closed = [close_bucket.remote(vp_ref, edge_refs[k],
                                  *[wedge_refs[j][k] for j in range(K)])
              for k in range(K)]
    counts = ray.get([c[0] for c in closed])
    total = int(sum(counts))
    if not per_vertex:
        return total
    pv_parts = ray.get([c[1] for c in closed])
    allv = np.concatenate([p[0] for p in pv_parts])
    allc = np.concatenate([p[1] for p in pv_parts])
    uv = np.unique(allv)
    cv = np.zeros(len(uv), dtype=np.int64)
    for v, c in pv_parts:
        cv[np.searchsorted(uv, v)] += c
    import ray.data as rd
    pv_ds = rd.from_arrow(pa.table({"v": pa.array(uv),
                                    "count()": pa.array(cv)}))
    return total, pv_ds


def triangle_count_arrays(src, dst, n, num_partitions=8, per_vertex=False):
    """Convenience entry from numpy arrays."""
    import ray.data as rd
    t = pa.table({"src": pa.array(np.asarray(src, dtype=np.int64)),
                  "dst": pa.array(np.asarray(dst, dtype=np.int64))})
    ds = rd.from_arrow(t)
    return triangle_count(ds, num_partitions, per_vertex)


def triangle_count_fast(src, dst, n, P=16, per_vertex=False):
    """Degree-ordered triangle counting (compact-forward): orient each
    edge from the lower-(degree, vid) endpoint to the higher one, so a
    vertex's forward out-degree is O(sqrt(2m)) and the wedge count
    drops from sum deg^2 to sum outdeg^2 — the standard skew fix for
    power-law graphs.

    Wedge generation runs as P numpy tasks over source-partitioned
    forward adjacency; closing membership tests run against the sorted
    edge-key array broadcast once via ``ray.put`` (8 bytes/edge — for
    corpora where the deduped edge set no longer fits a node, swap the
    closing step for the hash-join variant in ``triangle_count``).
    """
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    nl = src != dst
    a = np.minimum(src[nl], dst[nl])
    b = np.maximum(src[nl], dst[nl])
    keys = np.unique(a * np.int64(n) + b)
    a = (keys // n).astype(np.int64)
    b = (keys % n).astype(np.int64)
    deg = np.bincount(a, minlength=n) + np.bincount(b, minlength=n)
    # total order: (degree, vid)
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
    adj_ref = ray.put((indptr, fdst, pos))

    @ray.remote
    def count_part(p):
        indptr_, fdst_, pos_ = ray.get(adj_ref)
        keys_ = ray.get(key_ref)
        verts = np.arange(p, n, P)
        tri = 0
        pv = np.zeros(n, dtype=np.int64) if per_vertex else None
        for u in verts:
            nb = fdst_[indptr_[u]:indptr_[u + 1]]
            if len(nb) < 2:
                continue
            # wedge pairs among forward neighbours, ordered by pos
            o = np.argsort(pos_[nb])
            nb = nb[o]
            ii, jj = np.triu_indices(len(nb), k=1)
            x, y = nb[ii], nb[jj]
            lo = np.minimum(x, y)
            hi = np.maximum(x, y)
            k = lo * np.int64(n) + hi
            idx = np.searchsorted(keys_, k).clip(0, len(keys_) - 1)
            hit = keys_[idx] == k
            cnt = int(hit.sum())
            tri += cnt
            if per_vertex and cnt:
                pv[u] += cnt
                np.add.at(pv, x[hit], 1)
                np.add.at(pv, y[hit], 1)
        return tri, pv

    results = ray.get([count_part.remote(p) for p in range(P)])
    total = sum(r[0] for r in results)
    if not per_vertex:
        return total
    pv = np.zeros(n, dtype=np.int64)
    for r in results:
        pv += r[1]
    return total, pv


def k4_count_fast(src, dst, n, P=16):
    """4-clique (K4) counting on the compact-forward DAG: orient by
    (degree, vid) rank as in ``triangle_count_fast``; each K4 has a
    unique minimum vertex u, and its other three members form a
    TRIANGLE inside u's forward neighbourhood — so K4 = sum over u of
    triangles in the induced subgraph G[N+(u)]. Per vertex that
    subgraph's edges are exactly the closed wedge pairs the triangle
    kernel already finds; its triangles come from one small dense
    matmul (|N+(u)| = O(sqrt(2m)) by the orientation, the same bound
    that kills hub blowup for triangles). Same broadcast envelope as
    ``triangle_count_fast`` (sorted edge keys via ``ray.put``).

    Returns (n_triangles, n_k4)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    nl = src != dst
    a = np.minimum(src[nl], dst[nl])
    b = np.maximum(src[nl], dst[nl])
    keys = np.unique(a * np.int64(n) + b)
    a = (keys // n).astype(np.int64)
    b = (keys % n).astype(np.int64)
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
    def count_part(p):
        indptr_, fdst_ = ray.get(adj_ref)
        keys_ = ray.get(key_ref)
        tri = 0
        k4 = 0
        for u in range(p, n, P):
            nb = np.sort(fdst_[indptr_[u]:indptr_[u + 1]])
            k = len(nb)
            if k < 2:
                continue
            ii, jj = np.triu_indices(k, 1)
            kk = nb[ii] * np.int64(n) + nb[jj]    # nb sorted: lo*n+hi
            idx = np.searchsorted(keys_, kk).clip(0, len(keys_) - 1)
            hit = keys_[idx] == kk
            cnt = int(hit.sum())
            tri += cnt
            if cnt < 3 or k < 3:
                continue
            # triangles inside G[N+(u)]: one dense k x k matmul
            A = np.zeros((k, k), dtype=np.int64)
            A[ii[hit], jj[hit]] = 1
            A |= A.T
            M = A @ A
            k4 += int(M[ii[hit], jj[hit]].sum()) // 3
        return tri, k4

    results = ray.get([count_part.remote(p) for p in range(P)])
    return (sum(r[0] for r in results), sum(r[1] for r in results))


# ----------------------------------------------------------------------
# Directed triad census (igraph ``triad_census`` parity)
# ----------------------------------------------------------------------
TRIAD_L3_LABELS = ("030T", "030C", "120D", "120U", "120C", "210", "300")
TRIAD_WEDGE_LABELS = ("021D", "021U", "021C", "111D", "111U", "201")


def _corner_wedge_class(m, i, o):
    """Wedge class index (into TRIAD_WEDGE_LABELS) of a 2-dyad corner
    with m mutual / i asym-in / o asym-out incident dyads (m+i+o==2):
    021D = two out, 021U = two in, 021C = in+out, 111D = mutual+in,
    111U = mutual+out, 201 = two mutual (igraph MAN layouts)."""
    cls = np.full(len(m), -1, dtype=np.int64)
    cls[(m == 0) & (o == 2)] = 0
    cls[(m == 0) & (i == 2)] = 1
    cls[(m == 0) & (i == 1) & (o == 1)] = 2
    cls[(m == 1) & (i == 1)] = 3
    cls[(m == 1) & (o == 1)] = 4
    cls[m == 2] = 5
    return cls


def triad_triangle_census(lo, hi, code, n, P=16):
    """Classify every LINKED TRIANGLE (all three dyads present) of a
    directed graph given as unordered dyads ``(lo, hi)`` with code
    1 = lo->hi only, 2 = hi->lo only, 3 = mutual. Compact-forward
    triangle enumeration (each triangle exactly once) with the dyad
    code array broadcast alongside the sorted key set — the same
    envelope as ``triangle_count_fast`` (swap the closing lookup for
    the hash-join plan of ``triangle_count`` past node memory).

    Returns (l3_counts[7], wedge_dec[6]) int64 arrays, indexed by
    TRIAD_L3_LABELS / TRIAD_WEDGE_LABELS: the triangle-class counts
    and, for the open-triad subtraction, how many wedges of each
    2-dyad class sit inside those triangles."""
    lo = np.asarray(lo, dtype=np.int64)
    hi = np.asarray(hi, dtype=np.int64)
    code = np.asarray(code, dtype=np.int64)
    keys = lo * np.int64(n) + hi
    order = np.argsort(keys)
    keys, codes = keys[order], code[order]
    a, b = lo[order], hi[order]
    deg = np.bincount(a, minlength=n) + np.bincount(b, minlength=n)
    rank = np.lexsort((np.arange(n), deg))
    pos = np.empty(n, dtype=np.int64)
    pos[rank] = np.arange(n)
    fsrc = np.where(pos[a] < pos[b], a, b)
    fdst = np.where(pos[a] < pos[b], b, a)
    o2 = np.argsort(fsrc, kind="stable")
    fsrc, fdst = fsrc[o2], fdst[o2]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, fsrc + 1, 1)
    np.cumsum(indptr, out=indptr)
    key_ref = ray.put((keys, codes))
    adj_ref = ray.put((indptr, fdst, pos))

    def _code_of(keys_, codes_, u, v):
        k = np.minimum(u, v) * np.int64(n) + np.maximum(u, v)
        idx = np.searchsorted(keys_, k).clip(0, len(keys_) - 1)
        return codes_[idx], keys_[idx] == k

    @ray.remote
    def census_part(p):
        indptr_, fdst_, pos_ = ray.get(adj_ref)
        keys_, codes_ = ray.get(key_ref)
        l3 = np.zeros(7, dtype=np.int64)
        wd = np.zeros(6, dtype=np.int64)
        for u in np.arange(p, n, P):
            nb = fdst_[indptr_[u]:indptr_[u + 1]]
            if len(nb) < 2:
                continue
            o = np.argsort(pos_[nb])
            nb = nb[o]
            ii, jj = np.triu_indices(len(nb), k=1)
            x, y = nb[ii], nb[jj]
            cxy, hit = _code_of(keys_, codes_, x, y)
            if not hit.any():
                continue
            x, y, cxy = x[hit], y[hit], cxy[hit]
            uu = np.full(len(x), u, dtype=np.int64)
            cux, _ = _code_of(keys_, codes_, uu, x)
            cuy, _ = _code_of(keys_, codes_, uu, y)
            # asym arc directions (True = first->second), valid
            # only where the dyad is not mutual
            fux = np.where(uu < x, cux == 1, cux == 2)
            fuy = np.where(uu < y, cuy == 1, cuy == 2)
            fxy = np.where(x < y, cxy == 1, cxy == 2)
            aux, auy, axy = cux != 3, cuy != 3, cxy != 3
            m_u = (cux == 3).astype(np.int64) + (cuy == 3)
            o_u = (aux & fux).astype(np.int64) + (auy & fuy)
            i_u = (aux & ~fux).astype(np.int64) + (auy & ~fuy)
            m_x = (cux == 3).astype(np.int64) + (cxy == 3)
            o_x = (aux & ~fux).astype(np.int64) + (axy & fxy)
            i_x = (aux & fux).astype(np.int64) + (axy & ~fxy)
            m_y = (cuy == 3).astype(np.int64) + (cxy == 3)
            o_y = (auy & ~fuy).astype(np.int64) + (axy & ~fxy)
            i_y = (auy & fuy).astype(np.int64) + (axy & fxy)
            mm = (cux == 3).astype(np.int64) + (cuy == 3) + (cxy == 3)
            # triangle class
            tcls = np.empty(len(x), dtype=np.int64)
            tcls[mm == 3] = 6                      # 300
            tcls[mm == 2] = 5                      # 210
            one = mm == 1
            if one.any():
                ow = np.where(m_u == 0, o_u,
                              np.where(m_x == 0, o_x, o_y))
                iw = np.where(m_u == 0, i_u,
                              np.where(m_x == 0, i_x, i_y))
                tcls[one & (ow == 2)] = 2          # 120D
                tcls[one & (iw == 2)] = 3          # 120U
                tcls[one & (ow == 1) & (iw == 1)] = 4   # 120C
            zero = mm == 0
            if zero.any():
                cyc = (i_u == 1) & (o_u == 1) & (i_x == 1) & (o_x == 1)
                tcls[zero & cyc] = 1               # 030C
                tcls[zero & ~cyc] = 0              # 030T
            np.add.at(l3, tcls, 1)
            for m_, i_, o_ in ((m_u, i_u, o_u), (m_x, i_x, o_x),
                               (m_y, i_y, o_y)):
                np.add.at(wd, _corner_wedge_class(m_, i_, o_), 1)
        return l3, wd

    results = ray.get([census_part.remote(p) for p in range(P)])
    l3 = np.zeros(7, dtype=np.int64)
    wd = np.zeros(6, dtype=np.int64)
    for r3, rw in results:
        l3 += r3
        wd += rw
    return l3, wd
