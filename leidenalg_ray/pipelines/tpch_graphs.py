"""Graph construction from the driver's TPC-H-ish tables.

Two canonical graphs (used by the correctness-gate queries and bench):

- ``ps``: directed bipartite part->supplier graph from lineitem;
  vertex encoding ``part -> 2*l_partkey``, ``supplier ->
  2*l_suppkey+1`` (disjoint id spaces, reproducible in SQL);
  weight = number of lineitem rows. Suppliers are dangling
  (out-degree 0) — exercises PageRank's dangling-mass path.
- ``co``: undirected part co-occurrence graph: two parts are linked
  once per pair of lineitem rows that share an order
  (``a < b`` canonical orientation); weight = pair count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Sum


def read_lineitem(sf_dir, columns):
    return rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=columns)


def ps_edges(sf_dir):
    """Dataset (src, dst, weight) for the part->supplier graph."""
    li = read_lineitem(sf_dir, ["l_partkey", "l_suppkey"])

    def preagg(t: pa.Table) -> pa.Table:
        src = pc.multiply(t["l_partkey"], 2)
        dst = pc.add(pc.multiply(t["l_suppkey"], 2), 1)
        tt = pa.table({"src": src, "dst": dst})
        return tt.group_by(["src", "dst"]).aggregate([([], "count_all")]) \
                 .rename_columns(["src", "dst", "weight"])

    pre = li.map_batches(preagg, batch_format="pyarrow",
                         zero_copy_batch=True)
    out = pre.groupby(["src", "dst"]).aggregate(
        Sum("weight", alias_name="weight"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": pc.cast(t["src"], pa.int64()),
            "dst": pc.cast(t["dst"], pa.int64()),
            "weight": pc.cast(t["weight"], pa.float64()),
        })
    return out.map_batches(finish, batch_format="pyarrow")


def co_edges(sf_dir, num_partitions=16):
    """Dataset (a, b, weight): part co-occurrence within orders, a<b.
    The pair enumeration is a self hash-join of lineitem on
    l_orderkey; the dedup is a groupby with per-batch combiners."""
    li = read_lineitem(sf_dir, ["l_orderkey", "l_partkey"])
    right = li.map_batches(
        lambda t: t.rename_columns(["l_orderkey", "partkey_r"]),
        batch_format="pyarrow", zero_copy_batch=True)
    joined = li.join(right, "inner", num_partitions, on=("l_orderkey",))

    def pairs(t: pa.Table) -> pa.Table:
        a = t["l_partkey"]
        b = t["partkey_r"]
        tt = pa.table({"a": a, "b": b}).filter(pc.less(a, b))
        return tt.group_by(["a", "b"]).aggregate([([], "count_all")]) \
                 .rename_columns(["a", "b", "weight"])

    pre = joined.map_batches(pairs, batch_format="pyarrow",
                             zero_copy_batch=True)
    out = pre.groupby(["a", "b"]).aggregate(Sum("weight",
                                                alias_name="weight"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "a": pc.cast(t["a"], pa.int64()),
            "b": pc.cast(t["b"], pa.int64()),
            "weight": pc.cast(t["weight"], pa.float64()),
        })
    return out.map_batches(finish, batch_format="pyarrow")


def co_edge_arrays(sf_dir, num_partitions=16):
    """(a, b, weight) numpy arrays of the co-occurrence graph (driver
    pulls the deduped edge table — small relative to lineitem)."""
    df = co_edges(sf_dir, num_partitions).to_pandas()
    return (df["a"].to_numpy(np.int64), df["b"].to_numpy(np.int64),
            df["weight"].to_numpy(np.float64))


def ps_edge_arrays(sf_dir):
    df = ps_edges(sf_dir).to_pandas()
    return (df["src"].to_numpy(np.int64), df["dst"].to_numpy(np.int64),
            df["weight"].to_numpy(np.float64))
