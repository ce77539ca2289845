"""Link prediction and neighborhood operators over edge Datasets.

Companion operators a link-graph user runs next to the §2.8 kernels
(no counterpart in the reference — vtraag/leidenalg stops at
community detection; these follow the same partitioned plan as
``dist/triangles.triangle_count``):

- ``adamic_adar_topk``: top-k non-adjacent vertex pairs by
  common-neighbor count / Adamic-Adar score. Wedges are enumerated
  per middle vertex inside the bucket that owns it, pair partials
  aggregate bucket-locally, and each bucket returns only its own
  top-k — the driver merges K * k rows, never the pair stream.
- ``neighbor_sample``: deterministic fan-out-k neighbor sampling
  (the GraphSAGE mini-batch shape): per-vertex neighbor ranking by a
  reproducible modular hash, emitted as a Dataset without driver
  materialization.

Partitioning assumptions: pair keys pack as ``lo * n + hi`` (needs
``n < 3e9`` in int64, same as triangles); per-bucket wedge volume is
``sum(deg^2)/K`` — for power-law corpora cap hub degrees upstream or
raise K so a bucket fits a worker.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa
import ray


def _spill_canonical(edges_ds, K, spill_dir):
    """Orient low->high, per-batch pre-dedup, spill partitioned by
    ``a % K`` (each bucket fits a worker; resumable)."""

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
def _load_bucket(spill_dir, k):
    """Exact partition-local dedup + compressed degree partials."""
    import pyarrow.dataset as pads
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


def _group_sum(keys, score, counts=None):
    """Aggregate (count, score-sum) per unique key. Deliberately NOT
    ``np.unique(return_inverse=True)`` / ``np.add.reduceat``: their
    scatter passes collapse ~30x when many workers run concurrently on
    one memory controller (measured on this host). argsort + boundary
    cumsum + ``bincount`` over sorted group ids keeps every write
    sequential."""
    order = np.argsort(keys, kind="stable")
    ks = keys[order]
    ss = score[order]
    flag = np.r_[True, ks[1:] != ks[:-1]]
    gid = np.cumsum(flag) - 1
    if counts is None:
        cn = np.bincount(gid).astype(np.int64)
    else:
        cn = np.bincount(gid, weights=counts[order]).astype(np.int64)
    sc = np.bincount(gid, weights=ss)
    return ks[flag], cn, sc


def _combined_degrees(deg_parts):
    """O(V) driver state: global (verts, deg) from bucket partials —
    the same driver footprint the triangle plan carries."""
    verts = np.unique(np.concatenate([p[0] for p in deg_parts]))
    deg = np.zeros(len(verts), dtype=np.int64)
    for v, c in deg_parts:
        deg[np.searchsorted(verts, v)] += c
    return verts, deg


def adamic_adar_topk(edges_ds, k_top=20, num_partitions=8,
                     spill_dir=None):
    """Top ``k_top`` NON-adjacent pairs by (common-neighbor count
    desc, a asc, b asc), with the Adamic-Adar score
    ``sum_w 1/ln(deg(w))`` over shared neighbors ``w`` as a second
    signal. Returns ``pa.Table(a, b, common_neighbors, aa_score)``
    with the score rounded to 6 decimals.
    """
    K = int(num_partitions)
    spill_dir = spill_dir or tempfile.mkdtemp(prefix="lray_aa_")
    _spill_canonical(edges_ds, K, spill_dir)

    outs = [_load_bucket.remote(spill_dir, k) for k in range(K)]
    edge_refs = [o[0] for o in outs]
    deg_parts = ray.get([o[1] for o in outs])
    verts, deg = _combined_degrees(deg_parts)
    n = int(verts.max()) + 1 if len(verts) else 1
    vd_ref = ray.put((verts, deg, np.int64(n)))

    @ray.remote
    def adjacency_bucket(edges):
        """Both directions of the bucket's edges, shipped to the
        middle vertex's owner."""
        a, b = edges
        w = np.concatenate([a, b])
        v = np.concatenate([b, a])
        bucket = w % K
        order = np.argsort(bucket, kind="stable")
        w, v, bucket = w[order], v[order], bucket[order]
        bounds = np.searchsorted(bucket, np.arange(K + 1))
        return [(w[bounds[k]:bounds[k + 1]], v[bounds[k]:bounds[k + 1]])
                for k in range(K)]

    adj_refs = [adjacency_bucket.options(num_returns=K).remote(
        edge_refs[k]) for k in range(K)]
    if K == 1:
        adj_refs = [[r] for r in adj_refs]

    @ray.remote
    def wedge_bucket(vd, *parts):
        """Enumerate neighbor pairs per owned middle vertex; aggregate
        (pair -> count, score) bucket-locally; ship partials to the
        pair's owner ``lo % K``."""
        verts_, deg_, n_ = vd
        w = np.concatenate([p[0] for p in parts])
        v = np.concatenate([p[1] for p in parts])
        order = np.lexsort((v, w))
        w, v = w[order], v[order]
        starts = np.flatnonzero(np.r_[True, w[1:] != w[:-1]]) \
            if len(w) else np.empty(0, np.int64)
        ends = np.append(starts[1:], len(w))
        keys_l, score_l = [], []
        for s0, s1 in zip(starts, ends):
            if s1 - s0 < 2:
                continue
            nb = v[s0:s1]
            d = deg_[np.searchsorted(verts_, w[s0])]
            ii, jj = np.triu_indices(len(nb), k=1)
            lo, hi = nb[ii], nb[jj]
            keys_l.append(lo * n_ + hi)
            score_l.append(np.full(len(lo), 1.0 / np.log(d)))
        if not keys_l:
            e = np.empty(0, np.int64)
            f = np.empty(0, np.float64)
            return [(e, e.copy(), f)] * K
        keys = np.concatenate(keys_l)
        score = np.concatenate(score_l)
        uk, cn, sc = _group_sum(keys, score)
        lo = (uk // n_).astype(np.int64)
        bucket = lo % K
        order = np.argsort(bucket, kind="stable")
        uk, cn, sc, bucket = uk[order], cn[order], sc[order], bucket[order]
        bounds = np.searchsorted(bucket, np.arange(K + 1))
        return [(uk[bounds[k]:bounds[k + 1]],
                 cn[bounds[k]:bounds[k + 1]],
                 sc[bounds[k]:bounds[k + 1]]) for k in range(K)]

    wedge_refs = [wedge_bucket.options(num_returns=K).remote(
        vd_ref, *[adj_refs[j][k] for j in range(K)])
        for k in range(K)]
    if K == 1:
        wedge_refs = [[r] for r in wedge_refs]

    @ray.remote
    def close_bucket(vd, edges, *wparts):
        """Combine pair partials, drop existing edges, local top-k."""
        _, _, n_ = vd
        a, b = edges
        ekeys = a * n_ + b  # lexsorted by (a, b) -> sorted keys
        keys = np.concatenate([p[0] for p in wparts])
        cn = np.concatenate([p[1] for p in wparts])
        sc = np.concatenate([p[2] for p in wparts])
        if len(keys) == 0:
            return (np.empty(0, np.int64), np.empty(0, np.int64),
                    np.empty(0, np.int64), np.empty(0, np.float64))
        uk, cn_t, sc_t = _group_sum(keys, sc, counts=cn)
        if len(ekeys):
            idx = np.searchsorted(ekeys, uk).clip(0, len(ekeys) - 1)
            keep = ekeys[idx] != uk
            uk, cn_t, sc_t = uk[keep], cn_t[keep], sc_t[keep]
        lo = (uk // n_).astype(np.int64)
        hi = (uk % n_).astype(np.int64)
        # top-k by (cn desc, lo asc, hi asc): integer-deterministic
        order = np.lexsort((hi, lo, -cn_t))[:k_top]
        return lo[order], hi[order], cn_t[order], sc_t[order]

    closed = ray.get([close_bucket.remote(
        vd_ref, edge_refs[k], *[wedge_refs[j][k] for j in range(K)])
        for k in range(K)])
    lo = np.concatenate([c[0] for c in closed])
    hi = np.concatenate([c[1] for c in closed])
    cn = np.concatenate([c[2] for c in closed])
    sc = np.concatenate([c[3] for c in closed])
    order = np.lexsort((hi, lo, -cn))[:k_top]
    from ..util import round6
    return pa.table({
        "a": pa.array(lo[order]),
        "b": pa.array(hi[order]),
        "common_neighbors": pa.array(cn[order]),
        "aa_score": pa.array(round6(sc[order])),
    })


def degree_assortativity(edges_ds, num_partitions=8, spill_dir=None):
    """Degree assortativity coefficient (Pearson correlation of
    endpoint degrees over the symmetrized directed edge list). Sums
    accumulate as exact python ints from per-bucket int64 partials;
    the final expression mirrors the SQL oracle's operation order
    term for term so both sides produce the identical double."""
    K = int(num_partitions)
    spill_dir = spill_dir or tempfile.mkdtemp(prefix="lray_as_")
    _spill_canonical(edges_ds, K, spill_dir)
    outs = [_load_bucket.remote(spill_dir, k) for k in range(K)]
    edge_refs = [o[0] for o in outs]
    deg_parts = ray.get([o[1] for o in outs])
    verts, deg = _combined_degrees(deg_parts)
    vd_ref = ray.put((verts, deg))

    @ray.remote
    def partial(vd, edges):
        verts_, deg_ = vd
        a, b = edges
        x = deg_[np.searchsorted(verts_, a)]
        y = deg_[np.searchsorted(verts_, b)]
        # each canonical edge contributes (x, y) AND (y, x)
        return (int(x.sum() + y.sum()),
                int(2 * (x * y).sum()),
                int((x * x).sum() + (y * y).sum()),
                2 * len(a))

    parts = ray.get([partial.remote(vd_ref, edge_refs[k])
                     for k in range(K)])
    sx = sum(p[0] for p in parts)
    sxy = sum(p[1] for p in parts)
    sxx = sum(p[2] for p in parts)
    m = sum(p[3] for p in parts)
    # x and y marginals are identical by symmetry; keep the general
    # Pearson form so the float ops match the SQL expression exactly
    mean_x = sx / m
    var_x = sxx / m - mean_x * mean_x
    cov = sxy / m - mean_x * mean_x
    import math
    return cov / (math.sqrt(var_x) * math.sqrt(var_x))


# Modular hash for deterministic neighbor ranking — reproducible
# verbatim in SQL (`(src*7919 + dst*104729) % 1000003`).
_SAMPLE_MOD = 1_000_003


def neighbor_sample(edges_ds, fanout=5, num_partitions=8,
                    spill_dir=None):
    """Deterministic fan-out neighbor sampling: for every vertex keep
    its ``fanout`` neighbors ranked by ``((src*7919 + dst*104729) %
    1000003, dst)`` — the GraphSAGE mini-batch sampling shape with a
    reproducible pseudo-random order. Returns a Ray ``Dataset``
    ``(src, dst, rk)`` (rk 1-based) assembled from per-bucket Arrow
    tables without driver materialization."""
    import ray.data as rd

    K = int(num_partitions)
    spill_dir = spill_dir or tempfile.mkdtemp(prefix="lray_ns_")
    _spill_canonical(edges_ds, K, spill_dir)
    outs = [_load_bucket.remote(spill_dir, k) for k in range(K)]
    edge_refs = [o[0] for o in outs]

    @ray.remote
    def adjacency_bucket(edges):
        a, b = edges
        s = np.concatenate([a, b])
        d = np.concatenate([b, a])
        bucket = s % K
        order = np.argsort(bucket, kind="stable")
        s, d, bucket = s[order], d[order], bucket[order]
        bounds = np.searchsorted(bucket, np.arange(K + 1))
        return [(s[bounds[k]:bounds[k + 1]], d[bounds[k]:bounds[k + 1]])
                for k in range(K)]

    adj_refs = [adjacency_bucket.options(num_returns=K).remote(
        edge_refs[k]) for k in range(K)]
    if K == 1:
        adj_refs = [[r] for r in adj_refs]

    @ray.remote
    def sample_bucket(*parts):
        s = np.concatenate([p[0] for p in parts])
        d = np.concatenate([p[1] for p in parts])
        if len(s) == 0:
            return pa.table({"src": pa.array(s), "dst": pa.array(d),
                             "rk": pa.array(np.empty(0, np.int64))})
        h = (s * 7919 + d * 104729) % _SAMPLE_MOD
        order = np.lexsort((d, h, s))
        s, d = s[order], d[order]
        starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        seg = np.repeat(starts, np.diff(np.append(starts, len(s))))
        rk = np.arange(len(s)) - seg + 1
        keep = rk <= fanout
        return pa.table({"src": pa.array(s[keep]),
                         "dst": pa.array(d[keep]),
                         "rk": pa.array(rk[keep])})

    tbl_refs = [sample_bucket.remote(*[adj_refs[j][k] for j in range(K)])
                for k in range(K)]
    return rd.from_arrow_refs(tbl_refs)
