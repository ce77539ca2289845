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
