"""Distributed triangle counting (SURVEY.md §2.8): orient edges
low->high, hash-join edges on the middle vertex to enumerate wedges,
semi-join wedges against the edge set to close triangles. All three
shuffles are Ray Data hash joins/groupbys — no driver-side iteration.

Each triangle a<b<c is produced exactly once: wedge (a-b, b-c) with
a<b<c joined against edge (a,c).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray


def oriented_unique_edges(edges_ds):
    """(src,dst) Dataset -> deduplicated (a,b) with a<b (loops dropped).
    The dedup is a groupby shuffle; per-batch pre-dedup first."""
    def orient(t: pa.Table) -> pa.Table:
        s = t["src"]
        d = t["dst"]
        a = pc.min_element_wise(s, d)
        b = pc.max_element_wise(s, d)
        out = pa.table({"a": a, "b": b}).filter(pc.less(a, b))
        # pre-dedup inside the batch to shrink the shuffle
        return out.group_by(["a", "b"]).aggregate([]) if out.num_rows \
            else out
    return edges_ds.map_batches(orient, batch_format="pyarrow",
                                zero_copy_batch=True) \
                   .groupby(["a", "b"]).count() \
                   .select_columns(["a", "b"])


def triangle_count(edges_ds, num_partitions=16, per_vertex=False):
    """Global triangle count (int), optionally with a per-vertex count
    Dataset ``(v, n_triangles)``.

    Partitioning assumption: wedges of a middle vertex b co-locate via
    the hash join on b; skewed hubs fan out b's wedge set, which is why
    the closing step is another hash join rather than a broadcast.
    """
    e = oriented_unique_edges(edges_ds).materialize()
    # wedges: a-b-c with (a,b) and (b,c) edges, a<b<c
    wedges = e.join(e, "inner", num_partitions, on=("b",), right_on=("a",),
                    right_suffix="_r")
    # columns: a, b, b_r(=c). close with edge (a, c)
    closed = wedges.join(e, "inner", num_partitions, on=("a", "b_r"),
                         right_on=("a", "b"), right_suffix="_e")
    if not per_vertex:
        return closed.count()

    def explode(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        c = t["b_r"].to_numpy(zero_copy_only=False)
        return pa.table({"v": np.concatenate([a, b, c])})
    pv = closed.map_batches(explode, batch_format="pyarrow") \
               .groupby("v").count()
    return closed.count(), pv


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
