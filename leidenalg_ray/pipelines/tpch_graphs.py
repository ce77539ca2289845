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


_CO_ROWS_CACHE = {}


def co_edge_rows(sf_dir, num_partitions=16):
    """Multi-edge variant of ``co_edges``: per-batch pre-aggregated
    (a, b, weight) rows WITHOUT the global groupby dedup. Consumers
    whose math sums edge weights anyway (Leiden, weighted PageRank,
    CSR block builds with partition-local dedup) don't need the exact
    one-row-per-pair table, and Ray Data's groupby-aggregate carries a
    ~12 s fixed shuffle cost at sandbox scale — the single most
    expensive avoidable stage in the bench. Memoised (materialized)
    per sf_dir: every graph query on the co graph shares one
    self-join."""
    key = (sf_dir, num_partitions)
    if key in _CO_ROWS_CACHE:
        return _CO_ROWS_CACHE[key]
    li = read_lineitem(sf_dir, ["l_orderkey", "l_partkey"])
    right = li.map_batches(
        lambda t: t.rename_columns(["l_orderkey", "partkey_r"]),
        batch_format="pyarrow", zero_copy_batch=True)
    joined = li.join(right, "inner", num_partitions, on=("l_orderkey",))

    def pairs(t: pa.Table) -> pa.Table:
        a = t["l_partkey"]
        b = t["partkey_r"]
        tt = pa.table({"a": a, "b": b}).filter(pc.less(a, b))
        out = tt.group_by(["a", "b"]).aggregate([([], "count_all")]) \
                .rename_columns(["src", "dst", "weight"])
        return pa.table({
            "src": pc.cast(out["src"], pa.int64()),
            "dst": pc.cast(out["dst"], pa.int64()),
            "weight": pc.cast(out["weight"], pa.float64()),
        })

    _CO_ROWS_CACHE[key] = joined.map_batches(
        pairs, batch_format="pyarrow",
        zero_copy_batch=True).materialize()
    return _CO_ROWS_CACHE[key]


# ----------------------------------------------------------------------
# Planted structured graphs with closed-form Leiden optima.
#
# These are correctness instruments (reference
# ``tests/test_Optimiser.py:12-18,96-103``: K_n below the density
# threshold is one community; CPM at gamma->0 is connected
# components): at the chosen gammas the UNIQUE optimum is one
# community per nation, so the driver can verify the Leiden family
# against a plain-SQL oracle (dense rank of nations by size desc,
# min-suppkey asc — the engine's renumber contract).
# ----------------------------------------------------------------------
def nation_clique_edges(sf_dir):
    """Dataset (src, dst, weight=1): one clique per nation over
    supplier vids (s_suppkey is 0-based contiguous)."""
    su = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    right = su.map_batches(
        lambda t: t.rename_columns(["suppkey_r", "s_nationkey"]),
        batch_format="pyarrow", zero_copy_batch=True)
    joined = su.join(right, "inner", 4, on=("s_nationkey",))

    def pairs(t: pa.Table) -> pa.Table:
        a, b = t["s_suppkey"], t["suppkey_r"]
        tt = pa.table({"src": a, "dst": b}).filter(pc.less(a, b))
        return pa.table({
            "src": pc.cast(tt["src"], pa.int64()),
            "dst": pc.cast(tt["dst"], pa.int64()),
            "weight": pa.array(np.ones(tt.num_rows)),
        })

    return joined.map_batches(pairs, batch_format="pyarrow",
                              zero_copy_batch=True)


def nation_bipartite_edges(sf_dir, weight=-0.1):
    """Dataset (src, dst, weight=-0.1): the FULL bipartite graph
    between two nation-indexed sides — side A vid = n_nationkey
    (0..24), side B vid = 25 + n_nationkey — every cross pair one
    edge. The negative-weight ALL_COMMS fixture (reference
    ``tests/test_Optimiser.py:167-175``) at nation scale: same-side
    vertices share no edge, so only an all-communities candidate set
    can merge a side."""
    na = rd.read_parquet(f"{sf_dir}/nation.parquet",
                         columns=["n_nationkey"])

    def keyed(name):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({
                name: pc.cast(t["n_nationkey"], pa.int64()),
                "one": pa.array(np.zeros(t.num_rows, np.int64)),
            })
        return fn

    left = na.map_batches(keyed("a"), batch_format="pyarrow",
                          zero_copy_batch=True)
    right = na.map_batches(keyed("b"), batch_format="pyarrow",
                           zero_copy_batch=True)
    joined = left.join(right, "inner", 4, on=("one",))

    def pairs(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": t["a"],
            "dst": pc.add(pc.cast(t["b"], pa.int64()),
                          pa.scalar(25, pa.int64())),
            "weight": pa.array(np.full(t.num_rows, float(weight))),
        })

    return joined.map_batches(pairs, batch_format="pyarrow",
                              zero_copy_batch=True)


def nation_bipartite_clique_edges(sf_dir):
    """Dataset (src, dst, weight=1): one COMPLETE BIPARTITE block per
    nation — side A vid = s_suppkey, side B vid = n + s_suppkey
    (n = supplier count), every cross pair within a nation one edge.
    The bipartite-CPM planted fixture: with gamma_0 = gamma_1 = 0 the
    objective reduces to w_in - gamma_01 * (#cross-side pairs), so
    one community per nation block is the unique optimum (merging
    blocks adds cross pairs with no edges; splitting loses edges)."""
    su = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    n = supplier_count(sf_dir)
    right = su.map_batches(
        lambda t: t.rename_columns(["suppkey_r", "s_nationkey"]),
        batch_format="pyarrow", zero_copy_batch=True)
    joined = su.join(right, "inner", 4, on=("s_nationkey",))

    def pairs(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": pc.cast(t["s_suppkey"], pa.int64()),
            "dst": pc.add(pc.cast(t["suppkey_r"], pa.int64()),
                          pa.scalar(n, pa.int64())),
            "weight": pa.array(np.ones(t.num_rows)),
        })

    return joined.map_batches(pairs, batch_format="pyarrow",
                              zero_copy_batch=True)


def nation_ring_edges(sf_dir):
    """Dataset (src, dst, weight=1): one ring per nation (suppliers in
    suppkey order, consecutive + wraparound when size >= 3)."""
    import pandas as pd

    su = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])

    def ring(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["s_suppkey"].to_numpy(np.int64))
        if len(v) < 2:
            return _empty_edges()
        src = list(v[:-1])
        dst = list(v[1:])
        if len(v) >= 3:
            src.append(int(v[0]))
            dst.append(int(v[-1]))
        return pd.DataFrame({"src": np.asarray(src, np.int64),
                             "dst": np.asarray(dst, np.int64),
                             "weight": np.ones(len(src))})

    return su.groupby("s_nationkey").map_groups(ring,
                                                batch_format="pandas")


def nation_path_edges(sf_dir):
    """Dataset (src, dst, weight=1): one simple path per nation
    (suppliers in suppkey order, consecutive pairs — the ring builder
    without the wraparound edge). Shortest paths on a path are unique
    and integral, which makes sampled Brandes betweenness closed-form
    (seed at one end -> dependency of position i is k-1-i)."""
    import pandas as pd

    su = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])

    def path(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["s_suppkey"].to_numpy(np.int64))
        if len(v) < 2:
            return _empty_edges()
        return pd.DataFrame({"src": v[:-1], "dst": v[1:],
                             "weight": np.ones(len(v) - 1)})

    return su.groupby("s_nationkey").map_groups(path,
                                                batch_format="pandas")


def _empty_edges():
    import pandas as pd
    return pd.DataFrame({"src": np.empty(0, np.int64),
                         "dst": np.empty(0, np.int64),
                         "weight": np.empty(0, np.float64)})


def nation_star_edges(sf_dir):
    """Dataset (src, dst, weight=1): one star per nation, hub = min
    suppkey. Every leaf is hub-adjacent, so greedy local moves reach
    the unique gamma->0 optimum (one community per component) with no
    arc-split trap — the safe 'CPM at gamma->0 == connected
    components' instrument (rings/paths have node-optimal partial
    splits that Leiden legitimately returns)."""
    import pandas as pd

    su = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])

    def star(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["s_suppkey"].to_numpy(np.int64))
        if len(v) < 2:
            return _empty_edges()
        return pd.DataFrame({"src": np.full(len(v) - 1, v[0], np.int64),
                             "dst": v[1:],
                             "weight": np.ones(len(v) - 1)})

    return su.groupby("s_nationkey").map_groups(star,
                                                batch_format="pandas")


def supplier_count(sf_dir):
    return rd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey"]).count()


def part_count(sf_dir):
    return rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey"]).count()


_CO_CACHE = {}


def co_edge_arrays(sf_dir, num_partitions=16):
    """(a, b, weight) numpy arrays of the co-occurrence graph.

    The superstep substrate consumes driver-side arrays, so the final
    dedup runs as one vectorised ``np.unique`` over the streamed,
    per-batch pre-deduped pair rows — skipping the groupby shuffle the
    Dataset variant (``co_edges``) needs when the result must stay
    distributed. Memoised per sf_dir: the graph algorithms in the
    driver's correctness gate all share one build."""
    if sf_dir in _CO_CACHE:
        return _CO_CACHE[sf_dir]
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

    keys, weights = [], []
    M = np.int64(1) << 32
    for batch in joined.map_batches(pairs, batch_format="pyarrow",
                                    zero_copy_batch=True) \
                       .iter_batches(batch_format="pyarrow",
                                     batch_size=1 << 18):
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        keys.append(a * M + b)
        weights.append(batch["weight"].to_numpy(zero_copy_only=False)
                       .astype(np.float64))
    key = np.concatenate(keys) if keys else np.empty(0, np.int64)
    wt = np.concatenate(weights) if weights else np.empty(0)
    uniq, inv = np.unique(key, return_inverse=True)
    w = np.zeros(len(uniq))
    np.add.at(w, inv, wt)
    out = ((uniq // M).astype(np.int64), (uniq % M).astype(np.int64), w)
    _CO_CACHE[sf_dir] = out
    return out


_PS_CACHE = {}


def ps_edge_arrays(sf_dir):
    if sf_dir not in _PS_CACHE:
        df = ps_edges(sf_dir).to_pandas()
        _PS_CACHE[sf_dir] = (df["src"].to_numpy(np.int64),
                             df["dst"].to_numpy(np.int64),
                             df["weight"].to_numpy(np.float64))
    return _PS_CACHE[sf_dir]
