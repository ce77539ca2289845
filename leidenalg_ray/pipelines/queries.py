"""The engine's query catalogue: every operator from SURVEY.md §2 plus
the training-data operators, each as a callable ``(sf_dir) -> result``
with (where SQL-expressible) a DuckDB oracle in ``ORACLE_SQL`` computing
the same result on the same parquet tables.

Column names and float rounding are deliberately identical on both
sides: the driver hashes values after sorting columns by name, so an
aggregate named differently (or a float that differs in the 7th
decimal) is a mismatch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Min, Sum

from . import tpch_graphs as tg
from ..dist.blocks import DistGraph
from ..dist import superstep as ss
from ..dist.triangles import triangle_count
from ..dist.truss import k_truss
from ..dist.leiden import DistLeiden
from ..stages import text as tx
from ..stages import dedup as dd
from ..stages import ann as annm
from ..util import round6, round_half_away

PAGERANK_ITERS = 30
DAMPING = 0.85


def _docs(sf_dir, columns=("doc_id", "text")):
    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=list(columns))


def _emb(sf_dir):
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])


def _compact(src, dst):
    vids = np.unique(np.concatenate([src, dst]))
    return (vids, np.searchsorted(vids, src).astype(np.int64),
            np.searchsorted(vids, dst).astype(np.int64))


# Dataset-built CSR substrates for the BSP graph queries (PageRank,
# CC, LP): edges stream through `DistGraph.from_dataset` on the RAW id
# space — no driver-side edge arrays, no driver-side id compaction
# (kernels take the vertex set from per-partition active masks). One
# build per (sf_dir, graph) is shared by every query on that graph.
_G_CACHE = {}


def _co_distgraph(sf_dir, P=8):
    """Symmetrised weighted co-occurrence graph from the multi-edge
    Dataset; exact dedup happens partition-locally in the block
    build."""
    key = (sf_dir, "co")
    if key not in _G_CACHE:
        from ..dist.blocks import symmetrize_edges
        n = int(rd.read_parquet(f"{sf_dir}/part.parquet",
                                columns=["p_partkey"])
                .max("p_partkey")) + 1
        edges = symmetrize_edges(tg.co_edge_rows(sf_dir))
        _G_CACHE[key] = DistGraph.from_dataset(
            edges, n=n, P=P, directed=False, dedup=True)
    return _G_CACHE[key]


def _co_canon_refs(sf_dir):
    """Canonical deduped (a < b, weight) edge rows of the co graph as
    per-shard OBJECT REFS, derived from the shared ``_co_distgraph``
    blocks (symmetrised + partition-locally deduped, so keeping only
    the src < dst direction of each shard's rows yields every
    canonical pair exactly once — no extra unique pass). Consumers
    that need the whole edge list at once (the broadcast-envelope
    kernels: K4, Burt constraint, percolation) gather these INSIDE a
    worker task, keeping the driver o(E) (r4 verdict item 4)."""
    import ray

    g = _co_distgraph(sf_dir)
    key = (sf_dir, "co_canon")
    if key not in _G_CACHE:
        P = g.P

        @ray.remote
        def canon(p, block):
            s = block["src_local"] * P + p
            d = (block["dst_local"].astype(np.int64) * P
                 + block["dst_part"].astype(np.int64))
            m = s < d
            return s[m], d[m], block["weight"][m]

        _G_CACHE[key] = [canon.remote(p, g.blocks[p])
                         for p in range(P)]
    return g, _G_CACHE[key]


def _ps_distgraph(sf_dir, symmetric, P=8):
    """Part–supplier bipartite graph (vids: partkey*2 / suppkey*2+1)
    from the already-deduped edge Dataset."""
    key = (sf_dir, "ps", symmetric)
    if key not in _G_CACHE:
        from ..dist.blocks import symmetrize_edges
        np_ = int(rd.read_parquet(f"{sf_dir}/part.parquet",
                                  columns=["p_partkey"])
                  .max("p_partkey"))
        ns = int(rd.read_parquet(f"{sf_dir}/supplier.parquet",
                                 columns=["s_suppkey"])
                 .max("s_suppkey"))
        n = max(2 * np_, 2 * ns + 1) + 1
        edges = tg.ps_edges(sf_dir)
        if symmetric:
            edges = symmetrize_edges(edges)
        _G_CACHE[key] = DistGraph.from_dataset(
            edges, n=n, P=P, directed=not symmetric, dedup=False)
    return _G_CACHE[key]


# ======================================================================
# Relational / aggregate baseline
# ======================================================================
def q_pricing_summary(sf_dir):
    """TPC-H Q1-shaped pricing summary: per-batch partial aggregation
    (the combiner) feeding a small groupby — the canonical
    pre-aggregate-then-shuffle pattern."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        disc_price = pc.multiply(t["l_extendedprice"],
                                 pc.subtract(1.0, t["l_discount"]))
        tt = pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "qty": t["l_quantity"],
            "price": t["l_extendedprice"],
            "disc": t["l_discount"],
            "disc_price": disc_price,
        })
        return tt.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("price", "sum"), ("disc", "sum"),
             ("disc_price", "sum"), ([], "count_all")]) \
            .rename_columns(["l_returnflag", "l_linestatus", "sum_qty",
                             "sum_price", "sum_disc", "sum_disc_price",
                             "n"])

    pre = li.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
    agg = pre.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_price", alias_name="sum_price"),
        Sum("sum_disc", alias_name="sum_disc"),
        Sum("sum_disc_price", alias_name="sum_disc_price"),
        Sum("n", alias_name="n"))
    df = agg.to_pandas()
    out = pd.DataFrame({
        "l_returnflag": df["l_returnflag"],
        "l_linestatus": df["l_linestatus"],
        "sum_qty": round_half_away(df["sum_qty"], 2),
        "sum_base_price": round_half_away(df["sum_price"], 2),
        "sum_disc_price": round_half_away(df["sum_disc_price"], 2),
        "avg_qty": round6(df["sum_qty"] / df["n"]),
        "avg_disc": round6(df["sum_disc"] / df["n"]),
        "count_order": df["n"].astype(np.int64),
    })
    return out


SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_quantity) / count(*), 6) AS avg_qty,
       round(sum(l_discount) / count(*), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem GROUP BY 1, 2
"""


# ======================================================================
# Graph build
# ======================================================================
def q_edges_ps(sf_dir):
    return tg.ps_edges(sf_dir)


SQL_EDGES_PS = """
SELECT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst,
       CAST(count(*) AS DOUBLE) AS weight
FROM lineitem GROUP BY 1, 2
"""


def q_edges_co(sf_dir):
    return tg.co_edges(sf_dir)


SQL_EDGES_CO = """
SELECT l1.l_partkey AS a, l2.l_partkey AS b,
       CAST(count(*) AS DOUBLE) AS weight
FROM lineitem l1 JOIN lineitem l2
  ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
GROUP BY 1, 2
"""


def q_degree_ps(sf_dir):
    e = tg.ps_edges(sf_dir)
    out = e.groupby("src").aggregate(
        Count(alias_name="out_degree"),
        Sum("weight", alias_name="out_strength"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": t["src"],
            "out_degree": pc.cast(t["out_degree"], pa.int64()),
            "out_strength": pc.cast(t["out_strength"], pa.float64()),
        })
    return out.map_batches(finish, batch_format="pyarrow")


SQL_DEGREE_PS = """
WITH e AS (SELECT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst,
                  CAST(count(*) AS DOUBLE) AS weight
           FROM lineitem GROUP BY 1, 2)
SELECT src, count(*) AS out_degree, sum(weight) AS out_strength
FROM e GROUP BY src
"""


def q_degree_distribution_ps(sf_dir):
    """Degree histogram of the part->supplier graph: how many vertices
    have each out-degree (the sort/top-k + histogram shape)."""
    deg = q_degree_ps(sf_dir)
    out = deg.groupby("out_degree").aggregate(
        Count(alias_name="n_vertices"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "out_degree": pc.cast(t["out_degree"], pa.int64()),
            "n_vertices": pc.cast(t["n_vertices"], pa.int64()),
        })
    return out.map_batches(finish, batch_format="pyarrow")


SQL_DEGREE_DISTRIBUTION_PS = """
WITH e AS (SELECT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
           FROM lineitem GROUP BY 1, 2),
deg AS (SELECT src, count(*) AS out_degree FROM e GROUP BY src)
SELECT out_degree, count(*) AS n_vertices FROM deg GROUP BY out_degree
"""


def q_top_parts_by_strength(sf_dir):
    """Top-20 parts by summed edge weight (integer-valued -> exact
    hash match), deterministic tie-break on vid: the engine's
    sort + limit path (``ds.sort(...).limit(k)``)."""
    deg = q_degree_ps(sf_dir)
    top = deg.sort(["out_strength", "src"], descending=[True, False]) \
             .limit(20)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": t["src"],
            "out_strength": pc.cast(t["out_strength"], pa.float64()),
        })
    return top.map_batches(finish, batch_format="pyarrow")


SQL_TOP_PARTS_BY_STRENGTH = """
WITH e AS (SELECT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst,
                  CAST(count(*) AS DOUBLE) AS weight
           FROM lineitem GROUP BY 1, 2),
deg AS (SELECT src, sum(weight) AS out_strength FROM e GROUP BY src)
SELECT src, out_strength FROM deg
ORDER BY out_strength DESC, src ASC LIMIT 20
"""


# ======================================================================
# Connected components
# ======================================================================
def q_cc_ps(sf_dir):
    g = _ps_distgraph(sf_dir, symmetric=True)
    comp, _ = ss.connected_components(g)
    # labels propagate over RAW vids, so the component label is already
    # the smallest original vid in the component
    vids = np.flatnonzero(g.active_global()).astype(np.int64)
    return pa.table({"vid": pa.array(vids),
                     "component": pa.array(comp[vids])})


SQL_CC_PS = """
WITH RECURSIVE
e AS (SELECT l_partkey * 2 AS a, l_suppkey * 2 + 1 AS b
      FROM lineitem GROUP BY 1, 2),
ee AS (SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e),
verts AS (SELECT DISTINCT a AS v FROM ee),
reach(v, lab) AS (
  SELECT v, v FROM verts
  UNION
  SELECT ee.b, reach.lab FROM reach JOIN ee ON ee.a = reach.v
)
SELECT v AS vid, min(lab) AS component FROM reach GROUP BY v
"""


def q_cc_sizes_ps(sf_dir):
    """Component sizes from the already-driver-resident label vector:
    one ``np.unique`` over the O(n) labels — no pandas round-trip, no
    per-vertex materialised table."""
    g = _ps_distgraph(sf_dir, symmetric=True)
    comp, _ = ss.connected_components(g)
    labs = comp[np.flatnonzero(g.active_global())]
    uniq, counts = np.unique(labs, return_counts=True)
    return pa.table({
        "component": pa.array(uniq.astype(np.int64)),
        "n_vertices": pa.array(counts.astype(np.int64)),
    })


SQL_CC_SIZES_PS = """
WITH RECURSIVE
e AS (SELECT l_partkey * 2 AS a, l_suppkey * 2 + 1 AS b
      FROM lineitem GROUP BY 1, 2),
ee AS (SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e),
verts AS (SELECT DISTINCT a AS v FROM ee),
reach(v, lab) AS (
  SELECT v, v FROM verts
  UNION
  SELECT ee.b, reach.lab FROM reach JOIN ee ON ee.a = reach.v
),
comp AS (SELECT v, min(lab) AS component FROM reach GROUP BY v)
SELECT component, count(*) AS n_vertices FROM comp GROUP BY component
"""


# ======================================================================
# PageRank
# ======================================================================
def q_pagerank_co(sf_dir):
    """Weighted PageRank on the symmetrised co-occurrence graph,
    exactly PAGERANK_ITERS iterations (fixed, so the SQL oracle can
    reproduce it); ranks rounded to 6 decimals. Dataset-built CSR on
    the raw part-key id space, vertex set = active mask — the driver
    never holds the edge list or an id map."""
    g = _co_distgraph(sf_dir)
    rank, _ = ss.pagerank(g, damping=DAMPING, tol=0.0,
                          max_iter=PAGERANK_ITERS, weighted=True,
                          active=True)
    vids = np.flatnonzero(g.active_global()).astype(np.int64)
    return pa.table({"vid": pa.array(vids),
                     "rank": pa.array(round6(rank[vids]))})


def q_pagerank_shardout_co(sf_dir):
    """The same PageRank run through the o(n)-driver OUTPUT seam
    (``result_out=``): each shard writes its (vid, rank) parquet from
    a worker task, the driver sees only {path, rows, column}, and the
    query reads the partitioned files back — so the driver gate
    verifies the shard-side write path end-to-end against the same
    SQL oracle as ``pagerank_co``."""
    import shutil
    import tempfile

    import pyarrow.dataset as pads

    g = _co_distgraph(sf_dir)
    out = tempfile.mkdtemp(prefix="lray_pr_out_")
    try:
        res, _ = ss.pagerank(g, damping=DAMPING, tol=0.0,
                             max_iter=PAGERANK_ITERS, weighted=True,
                             active=True, result_out=out)
        assert res["rows"] == g.n
        t = pads.dataset(out).to_table()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    vids = t["vid"].to_numpy()
    rank = t["rank"].to_numpy()
    act = g.active_global()[vids]
    return pa.table({"vid": pa.array(vids[act]),
                     "rank": pa.array(round6(rank[act]))})


SQL_PAGERANK_CO = f"""
WITH RECURSIVE
e0 AS (SELECT l1.l_partkey AS a, l2.l_partkey AS b,
              CAST(count(*) AS DOUBLE) AS w
       FROM lineitem l1 JOIN lineitem l2
         ON l1.l_orderkey = l2.l_orderkey
        AND l1.l_partkey < l2.l_partkey
       GROUP BY 1, 2),
e AS (SELECT a, b, w FROM e0 UNION ALL SELECT b, a, w FROM e0),
verts AS (SELECT a AS v, sum(w) AS strength FROM e GROUP BY a),
nn AS (SELECT count(*) AS n FROM verts),
pr(i, v, r) AS (
  SELECT 0, v, 1.0 / (SELECT n FROM nn) FROM verts
  UNION ALL
  SELECT p.i + 1, e.b,
         (1 - {DAMPING}) / (SELECT n FROM nn)
         + {DAMPING} * sum(p.r * e.w / vs.strength)
  FROM pr p
  JOIN verts vs ON vs.v = p.v
  JOIN e ON e.a = p.v
  WHERE p.i < {PAGERANK_ITERS}
  GROUP BY p.i, e.b
)
SELECT v AS vid, round(r, 6) AS rank
FROM pr WHERE i = {PAGERANK_ITERS}
"""


def q_pagerank_ps(sf_dir):
    """Directed bipartite PageRank (suppliers dangling) — exercises the
    dangling-mass redistribution. Fixed PAGERANK_ITERS iterations so
    the recursive-CTE oracle reproduces it exactly (the oracle's
    per-iteration dangling sum references the recursive table twice —
    DuckDB supports this)."""
    g = _ps_distgraph(sf_dir, symmetric=False)
    rank, iters = ss.pagerank(g, damping=DAMPING, tol=0.0,
                              max_iter=PAGERANK_ITERS, weighted=False,
                              active=True)
    vids = np.flatnonzero(g.active_global()).astype(np.int64)
    return pa.table({"vid": pa.array(vids),
                     "rank": pa.array(round6(rank[vids]))})


SQL_PAGERANK_PS = f"""
WITH RECURSIVE
e AS (SELECT l_partkey * 2 AS a, l_suppkey * 2 + 1 AS b
      FROM lineitem GROUP BY 1, 2),
verts AS (SELECT DISTINCT v FROM
          (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)),
outdeg AS (SELECT a AS v, CAST(count(*) AS DOUBLE) AS deg
           FROM e GROUP BY a),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
pr(i, v, r) AS (
  SELECT 0, v, 1.0 / (SELECT n FROM nn) FROM verts
  UNION ALL
  SELECT vx.i + 1, vx.v,
         (1 - {DAMPING}) / (SELECT n FROM nn)
         + {DAMPING} * (
             COALESCE((SELECT sum(p.r / od.deg)
                       FROM pr p JOIN outdeg od ON od.v = p.v
                       JOIN e ON e.a = p.v
                       WHERE e.b = vx.v AND p.i = vx.i), 0)
             + COALESCE((SELECT sum(p.r) FROM pr p
                         LEFT JOIN outdeg od ON od.v = p.v
                         WHERE od.v IS NULL AND p.i = vx.i), 0)
               / (SELECT n FROM nn))
  FROM pr vx WHERE vx.i < {PAGERANK_ITERS}
)
SELECT v AS vid, round(r, 6) AS rank
FROM pr WHERE i = {PAGERANK_ITERS}
"""


# ======================================================================
# Dynamic-graph maintenance: warm-started PageRank, incremental CC
# ======================================================================
PAGERANK_WARM_EXTRA = 15


def q_pagerank_warm_co(sf_dir):
    """Warm-started (dynamic) PageRank: resume from the
    PAGERANK_ITERS-step state via ``init_rank`` and run
    PAGERANK_WARM_EXTRA more supersteps. Warm-starting is bit-identical
    to having kept iterating, so the fixed-iteration CTE at
    PAGERANK_ITERS + PAGERANK_WARM_EXTRA verifies the warm-start
    plumbing exactly — the recrawl path for a web-scale link graph
    (re-converge yesterday's ranks after a delta-edge batch instead of
    restarting from uniform)."""
    g = _co_distgraph(sf_dir)
    base, _ = ss.pagerank(g, damping=DAMPING, tol=0.0,
                          max_iter=PAGERANK_ITERS, weighted=True,
                          active=True)
    rank, _ = ss.pagerank(g, damping=DAMPING, tol=0.0,
                          max_iter=PAGERANK_WARM_EXTRA, weighted=True,
                          active=True, init_rank=base)
    vids = np.flatnonzero(g.active_global()).astype(np.int64)
    return pa.table({"vid": pa.array(vids),
                     "rank": pa.array(round6(rank[vids]))})


SQL_PAGERANK_WARM_CO = f"""
WITH RECURSIVE
e0 AS (SELECT l1.l_partkey AS a, l2.l_partkey AS b,
              CAST(count(*) AS DOUBLE) AS w
       FROM lineitem l1 JOIN lineitem l2
         ON l1.l_orderkey = l2.l_orderkey
        AND l1.l_partkey < l2.l_partkey
       GROUP BY 1, 2),
e AS (SELECT a, b, w FROM e0 UNION ALL SELECT b, a, w FROM e0),
verts AS (SELECT a AS v, sum(w) AS strength FROM e GROUP BY a),
nn AS (SELECT count(*) AS n FROM verts),
pr(i, v, r) AS (
  SELECT 0, v, 1.0 / (SELECT n FROM nn) FROM verts
  UNION ALL
  SELECT p.i + 1, e.b,
         (1 - {DAMPING}) / (SELECT n FROM nn)
         + {DAMPING} * sum(p.r * e.w / vs.strength)
  FROM pr p
  JOIN verts vs ON vs.v = p.v
  JOIN e ON e.a = p.v
  WHERE p.i < {PAGERANK_ITERS + PAGERANK_WARM_EXTRA}
  GROUP BY p.i, e.b
)
SELECT v AS vid, round(r, 6) AS rank
FROM pr WHERE i = {PAGERANK_ITERS + PAGERANK_WARM_EXTRA}
"""


def q_cc_incremental_ps(sf_dir):
    """Incremental connected components after a delta-edge batch:
    labels of the base graph (lineitem rows with l_linenumber <= 3)
    warm-start min-label propagation over the full graph — only the
    regions the delta edges bridge move, so re-convergence costs
    ~diameter-of-change supersteps. The fixed point is independent of
    the warm start (component minima), so the plain CC recursive CTE
    over the full edge set verifies the incremental path exactly."""
    from ..dist.blocks import symmetrize_edges
    g = _ps_distgraph(sf_dir, symmetric=True)

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey",
                                  "l_linenumber"])

    def base_edges(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_linenumber"], 3))
        tt = pa.table({
            "src": pc.cast(pc.multiply(t["l_partkey"], 2), pa.int64()),
            "dst": pc.cast(pc.add(pc.multiply(t["l_suppkey"], 2), 1),
                           pa.int64()),
        })
        return tt.group_by(["src", "dst"]).aggregate([([], "count_all")]) \
                 .rename_columns(["src", "dst", "weight"])

    base = li.map_batches(base_edges, batch_format="pyarrow",
                          zero_copy_batch=True)
    g0 = DistGraph.from_dataset(symmetrize_edges(base), n=g.n, P=g.P,
                                directed=False, dedup=True)
    labels0, _ = ss.connected_components(g0)
    comp, _ = ss.connected_components(g, init_labels=labels0)
    vids = np.flatnonzero(g.active_global()).astype(np.int64)
    return pa.table({"vid": pa.array(vids),
                     "component": pa.array(comp[vids])})


# same fixed point as the from-scratch run: the full-graph CC oracle
SQL_CC_INCREMENTAL_PS = SQL_CC_PS


# ======================================================================
# Triangles
# ======================================================================
def q_triangles_co(sf_dir):
    """Partitioned compact-forward triangle count over the edge
    Dataset (the >node-memory plan; the broadcast-arrays fast path is
    benchmarked separately in bench.py)."""
    n_tri = triangle_count(tg.co_edge_rows(sf_dir), num_partitions=8)
    return pa.table({"n_triangles": pa.array([n_tri], pa.int64())})


SQL_TRIANGLES_CO = """
WITH e AS (SELECT l1.l_partkey AS a, l2.l_partkey AS b
           FROM lineitem l1 JOIN lineitem l2
             ON l1.l_orderkey = l2.l_orderkey
            AND l1.l_partkey < l2.l_partkey
           GROUP BY 1, 2)
SELECT count(*) AS n_triangles
FROM e e1 JOIN e e2 ON e2.a = e1.b JOIN e e3
  ON e3.a = e1.a AND e3.b = e2.b
"""


def q_triangles_co_per_vertex(sf_dir):
    _, pv = triangle_count(tg.co_edge_rows(sf_dir), num_partitions=8,
                           per_vertex=True)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "vid": pc.cast(t["v"], pa.int64()),
            "n_triangles": pc.cast(t["count()"], pa.int64()),
        })
    return pv.map_batches(finish, batch_format="pyarrow")


SQL_TRIANGLES_CO_PV = """
WITH e AS (SELECT l1.l_partkey AS a, l2.l_partkey AS b
           FROM lineitem l1 JOIN lineitem l2
             ON l1.l_orderkey = l2.l_orderkey
            AND l1.l_partkey < l2.l_partkey
           GROUP BY 1, 2),
t AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e e1 JOIN e e2 ON e2.a = e1.b JOIN e e3
        ON e3.a = e1.a AND e3.b = e2.b)
SELECT vid, count(*) AS n_triangles FROM (
  SELECT x AS vid FROM t UNION ALL SELECT y FROM t
  UNION ALL SELECT z FROM t
) GROUP BY vid
"""


# ======================================================================
# Label propagation + Leiden (non-SQL-expressible: rows-only checks;
# exactness pinned by the pytest suite)
# ======================================================================
SQL_LABEL_PROPAGATION_CO = """
WITH RECURSIVE
e0 AS (SELECT l1.l_partkey AS a, l2.l_partkey AS b,
              CAST(count(*) AS DOUBLE) AS w
       FROM lineitem l1 JOIN lineitem l2
         ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
       GROUP BY 1, 2),
e AS (SELECT a, b, w FROM e0 UNION ALL SELECT b, a, w FROM e0),
verts AS (SELECT DISTINCT a AS v FROM e),
lp(i, v, lab) AS (
  SELECT 0, v, v FROM verts
  UNION ALL
  SELECT q.i + 1, q.v, q.lab FROM (
    SELECT p.i AS i, e.b AS v, p.lab AS lab,
           row_number() OVER (PARTITION BY e.b
                              ORDER BY sum(e.w) DESC, p.lab ASC) AS rn
    FROM lp p JOIN e ON e.a = p.v
    WHERE p.i < 20
    GROUP BY p.i, e.b, p.lab
  ) q WHERE q.rn = 1
)
SELECT v AS vid, lab AS label FROM lp WHERE i = 20
"""


def q_label_propagation_co(sf_dir):
    g = _co_distgraph(sf_dir)
    lab, _ = ss.label_propagation(g, max_iter=20)
    vids = np.flatnonzero(g.active_global()).astype(np.int64)
    return pa.table({"vid": pa.array(vids),
                     "label": pa.array(lab[vids])})


def q_participation_co(sf_dir):
    """Participation coefficient (Guimerà & Amaral 2005, 'cartography
    of complex networks'): P(v) = 1 - Σ_c (k_vc / k_v)², the
    community-role metric over the LP partition (LP is itself
    driver-green via its recursive-CTE twin, so the composition stays
    fully SQL-checkable). Integer k_vc/k_v sums with ONE final
    division — no float-accumulation-order divergence possible.
    Degrees/per-community counts use the deduped edge arrays (gate
    scale; at scale both are one groupby over (v, lab[nbr]))."""
    g = _co_distgraph(sf_dir)
    lab, _ = ss.label_propagation(g, max_iter=20)
    t = pa.concat_tables(
        [bt for bt in tg.co_edge_rows(sf_dir).iter_batches(
            batch_size=None, batch_format="pyarrow")])
    s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = int(max(s.max(), d.max())) + 1
    lo, hi = np.minimum(s, d), np.maximum(s, d)
    keys = np.unique(lo[lo != hi] * np.int64(n) + hi[lo != hi])
    a, b = keys // n, keys % n
    src = np.concatenate([a, b])
    nbr = np.concatenate([b, a])
    k = np.bincount(src, minlength=n).astype(np.int64)
    ckeys, ccnt = np.unique(src * np.int64(n) + lab[nbr],
                            return_counts=True)
    ssum = np.zeros(n, dtype=np.int64)
    np.add.at(ssum, ckeys // n, ccnt.astype(np.int64) ** 2)
    vids = np.flatnonzero(k > 0).astype(np.int64)
    part = 1.0 - ssum[vids].astype(np.float64) \
        / (k[vids] * k[vids]).astype(np.float64)
    return pa.table({
        "vid": pa.array(vids),
        "label": pa.array(lab[vids].astype(np.int64)),
        "participation": pa.array(round6(part)),
    })


SQL_PARTICIPATION_CO = """
WITH RECURSIVE
e0 AS (SELECT l1.l_partkey AS a, l2.l_partkey AS b,
              CAST(count(*) AS DOUBLE) AS w
       FROM lineitem l1 JOIN lineitem l2
         ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
       GROUP BY 1, 2),
e AS (SELECT a, b, w FROM e0 UNION ALL SELECT b, a, w FROM e0),
verts AS (SELECT DISTINCT a AS v FROM e),
lp(i, v, lab) AS (
  SELECT 0, v, v FROM verts
  UNION ALL
  SELECT q.i + 1, q.v, q.lab FROM (
    SELECT p.i AS i, e.b AS v, p.lab AS lab,
           row_number() OVER (PARTITION BY e.b
                              ORDER BY sum(e.w) DESC, p.lab ASC) AS rn
    FROM lp p JOIN e ON e.a = p.v
    WHERE p.i < 20
    GROUP BY p.i, e.b, p.lab
  ) q WHERE q.rn = 1
),
labs AS (SELECT v, lab FROM lp WHERE i = 20),
deg AS (SELECT a AS v, count(*) AS k FROM e GROUP BY 1),
kic AS (SELECT e.a AS v, l.lab AS c, count(*) AS kc
        FROM e JOIN labs l ON l.v = e.b GROUP BY 1, 2)
SELECT CAST(d.v AS BIGINT) AS vid,
       CAST(l.lab AS BIGINT) AS label,
       round(1 - CAST(sum(kic.kc * kic.kc) AS DOUBLE)
             / (d.k * d.k), 6) AS participation
FROM kic JOIN deg d ON d.v = kic.v JOIN labs l ON l.v = kic.v
GROUP BY d.v, l.lab, d.k
"""


LP_SEED_MOD = 97
LP_SEED_ITERS = 10


def q_label_propagation_seeded_co(sf_dir):
    """Semi-supervised label spreading (the distributed analogue of
    the reference optimiser's ``is_membership_fixed``): seeds =
    vids % 97 == 0 hold pinned labels; unlabeled vertices take the
    plurality label of their LABELED neighbours each superstep.
    Fixed LP_SEED_ITERS supersteps; output = labeled vertices only."""
    g = _co_distgraph(sf_dir)
    act = g.active_global()
    seeds = np.flatnonzero(act)[
        np.flatnonzero(act) % LP_SEED_MOD == 0].astype(np.int64)
    lab = ss.label_propagation_seeded(g, seeds, seeds,
                                      iters=LP_SEED_ITERS)
    vids = np.flatnonzero(lab >= 0).astype(np.int64)
    return pa.table({"vid": pa.array(vids),
                     "label": pa.array(lab[vids])})


SQL_LABEL_PROPAGATION_SEEDED_CO = f"""
WITH RECURSIVE
e0 AS (SELECT l1.l_partkey AS a, l2.l_partkey AS b,
              CAST(count(*) AS DOUBLE) AS w
       FROM lineitem l1 JOIN lineitem l2
         ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
       GROUP BY 1, 2),
e AS (SELECT a, b, w FROM e0 UNION ALL SELECT b, a, w FROM e0),
verts AS (SELECT DISTINCT a AS v FROM e),
lp(i, v, lab) AS (
  SELECT 0, v, v FROM verts WHERE v % {LP_SEED_MOD} = 0
  UNION ALL
  SELECT x.i, x.v, x.lab FROM (
    -- non-seeds: plurality label of labeled neighbours
    SELECT q.i + 1 AS i, q.v, q.lab FROM (
      SELECT p.i AS i, e.b AS v, p.lab AS lab,
             row_number() OVER (PARTITION BY p.i, e.b
                                ORDER BY sum(e.w) DESC, p.lab ASC) AS rn
      FROM lp p JOIN e ON e.a = p.v
      WHERE p.i < {LP_SEED_ITERS} AND e.b % {LP_SEED_MOD} <> 0
      GROUP BY p.i, e.b, p.lab
    ) q WHERE q.rn = 1
    UNION ALL
    -- seeds: pinned
    SELECT p.i + 1, p.v, p.lab FROM lp p
    WHERE p.i < {LP_SEED_ITERS} AND p.v % {LP_SEED_MOD} = 0
  ) x
)
SELECT v AS vid, lab AS label FROM lp WHERE i = {LP_SEED_ITERS}
"""


# ======================================================================
# BFS distances / k-core / HITS / clustering coefficient
# ======================================================================
_SQL_CO_EDGES_BOTH = """
e0 AS (SELECT l1.l_partkey AS a, l2.l_partkey AS b
       FROM lineitem l1 JOIN lineitem l2
         ON l1.l_orderkey = l2.l_orderkey
        AND l1.l_partkey < l2.l_partkey
       GROUP BY 1, 2),
e AS (SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0)"""

# materialized variant for oracles that reference ``e`` many times
# (DuckDB inlines plain CTEs at every reference)
_SQL_CO_EDGES_BOTH_MAT = """
e0 AS MATERIALIZED (SELECT l1.l_partkey AS a, l2.l_partkey AS b
       FROM lineitem l1 JOIN lineitem l2
         ON l1.l_orderkey = l2.l_orderkey
        AND l1.l_partkey < l2.l_partkey
       GROUP BY 1, 2),
e AS MATERIALIZED (SELECT a, b FROM e0
                   UNION ALL SELECT b AS a, a AS b FROM e0)"""


def q_bfs_dist_co(sf_dir):
    """Unweighted hop distance from the smallest active part key,
    via the frontier-min BSP kernel; output = reachable vertices
    only (matching the SQL reachability CTE)."""
    g = _co_distgraph(sf_dir)
    act = g.active_global()
    source = int(np.flatnonzero(act)[0])
    dist, _ = ss.bfs_distances(g, [source])
    INF = np.iinfo(np.int64).max
    vids = np.flatnonzero(act & (dist < INF)).astype(np.int64)
    return pa.table({"vid": pa.array(vids),
                     "dist": pa.array(dist[vids])})


SQL_BFS_DIST_CO = f"""
WITH RECURSIVE
{_SQL_CO_EDGES_BOTH},
s AS (SELECT min(a) AS v FROM e),
bfs(v, d) AS (
  SELECT v, 0 FROM s
  UNION
  SELECT e.b, bfs.d + 1 FROM bfs JOIN e ON e.a = bfs.v
  WHERE bfs.d < 30
)
SELECT v AS vid, CAST(min(d) AS BIGINT) AS dist FROM bfs GROUP BY v
"""


# Bellman-Ford rounds for the SQL oracle: the engine iterates to
# fixed point, so any K >= convergence matches. Measured convergence
# on the co graph: 11 rounds at sf0.01, 15 at sf0.1, 18 at sf1
# (generated via scripts/gen_testdata.py — r5 scale re-validation;
# the old bound of 14 was one round short already at sf0.1). Growth
# is ~+3 rounds per data decade; 24 covers sf1 with two decades of
# slack.
SSSP_SQL_ITERS = 24


def _co_sssp_distgraph(sf_dir, P=8):
    """Co-occurrence graph re-weighted with a deterministic modular
    weight per canonical (a < b) pair: the count weights make every
    shortest path trivial on this dense graph (unweighted diameter 2),
    while ``(a*7919 + b*104729) % 97 + 1`` is reproducible verbatim in
    SQL. Multi-edge duplicate rows carry identical derived weights, so
    min-plus semantics need no dedup."""
    key = (sf_dir, "co_sssp")
    if key not in _G_CACHE:
        from ..dist.blocks import symmetrize_edges
        n = int(rd.read_parquet(f"{sf_dir}/part.parquet",
                                columns=["p_partkey"])
                .max("p_partkey")) + 1

        def derive(t: pa.Table) -> pa.Table:
            a = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            b = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            w = ((a * 7919 + b * 104729) % 97 + 1).astype(np.float64)
            return pa.table({"src": pa.array(a), "dst": pa.array(b),
                             "weight": pa.array(w)})

        edges = symmetrize_edges(
            tg.co_edge_rows(sf_dir).map_batches(
                derive, batch_format="pyarrow", zero_copy_batch=True))
        _G_CACHE[key] = DistGraph.from_dataset(
            edges, n=n, P=P, directed=False, dedup=False)
    return _G_CACHE[key]


def q_sssp_co(sf_dir):
    """Weighted shortest distances from the smallest active part key
    via the BSP Bellman-Ford kernel (min-plus relaxation per superstep
    to fixed point). Distances are integer-valued sums of the modular
    edge weights, so the output casts exactly to int64; unreachable
    vertices are dropped (matching the SQL's reachability filter)."""
    g = _co_sssp_distgraph(sf_dir)
    act = g.active_global()
    source = int(np.flatnonzero(act)[0])
    dist, _ = ss.sssp(g, [source])
    vids = np.flatnonzero(act & np.isfinite(dist)).astype(np.int64)
    return pa.table({"vid": pa.array(vids),
                     "dist": pa.array(dist[vids].astype(np.int64))})


SQL_SSSP_CO = f"""
WITH RECURSIVE
e0 AS (SELECT l1.l_partkey AS a, l2.l_partkey AS b
       FROM lineitem l1 JOIN lineitem l2
         ON l1.l_orderkey = l2.l_orderkey
        AND l1.l_partkey < l2.l_partkey
       GROUP BY 1, 2),
ew AS (SELECT a, b,
              CAST((a * 7919 + b * 104729) % 97 + 1 AS DOUBLE) AS w
       FROM e0),
e AS (SELECT a, b, w FROM ew UNION ALL SELECT b, a, w FROM ew),
verts AS (SELECT DISTINCT a AS v FROM e),
s AS (SELECT min(v) AS v FROM verts),
ee AS (SELECT a, b, w FROM e
       UNION ALL SELECT v, v, 0.0 FROM verts),
bf(i, v, d) AS (
  SELECT 0, v, CASE WHEN v = (SELECT v FROM s) THEN 0.0 ELSE 1e18 END
  FROM verts
  UNION ALL
  SELECT p.i + 1, ee.b, min(p.d + ee.w)
  FROM bf p JOIN ee ON ee.a = p.v
  WHERE p.i < {SSSP_SQL_ITERS}
  GROUP BY p.i, ee.b
)
SELECT v AS vid, CAST(d AS BIGINT) AS dist
FROM bf WHERE i = {SSSP_SQL_ITERS} AND d < 1e17
"""


PPR_SEEDS = 5


def q_pagerank_personalized_co(sf_dir):
    """Personalized PageRank on the weighted co graph: teleport (and
    dangling redistribution — zero here, the symmetric graph has no
    sinks) uniform over the PPR_SEEDS smallest active vids instead of
    the whole vertex set. Fixed PAGERANK_ITERS iterations so the
    recursive-CTE oracle reproduces it; ranks rounded to 6 decimals."""
    g = _co_distgraph(sf_dir)
    act = g.active_global()
    seeds = np.flatnonzero(act)[:PPR_SEEDS].astype(np.int64)
    rank, _ = ss.pagerank(g, damping=DAMPING, tol=0.0,
                          max_iter=PAGERANK_ITERS, weighted=True,
                          active=True, personalize=seeds)
    vids = np.flatnonzero(act).astype(np.int64)
    return pa.table({"vid": pa.array(vids),
                     "rank": pa.array(round6(rank[vids]))})


SQL_PAGERANK_PERSONALIZED_CO = f"""
WITH RECURSIVE
e0 AS (SELECT l1.l_partkey AS a, l2.l_partkey AS b,
              CAST(count(*) AS DOUBLE) AS w
       FROM lineitem l1 JOIN lineitem l2
         ON l1.l_orderkey = l2.l_orderkey
        AND l1.l_partkey < l2.l_partkey
       GROUP BY 1, 2),
e AS (SELECT a, b, w FROM e0 UNION ALL SELECT b, a, w FROM e0),
verts AS (SELECT a AS v, sum(w) AS strength FROM e GROUP BY a),
seeds AS (SELECT v FROM verts ORDER BY v LIMIT {PPR_SEEDS}),
ks AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM seeds),
pr(i, v, r) AS (
  SELECT 0, v,
         CASE WHEN v IN (SELECT v FROM seeds)
              THEN 1.0 / (SELECT k FROM ks) ELSE 0.0 END
  FROM verts
  UNION ALL
  SELECT p.i + 1, e.b,
         (1 - {DAMPING}) * (CASE WHEN e.b IN (SELECT v FROM seeds)
                                 THEN 1.0 / (SELECT k FROM ks)
                                 ELSE 0.0 END)
         + {DAMPING} * sum(p.r * e.w / vs.strength)
  FROM pr p
  JOIN verts vs ON vs.v = p.v
  JOIN e ON e.a = p.v
  WHERE p.i < {PAGERANK_ITERS}
  GROUP BY p.i, e.b
)
SELECT v AS vid, round(r, 6) AS rank
FROM pr WHERE i = {PAGERANK_ITERS}
"""


def q_ppr_batch_co(sf_dir):
    """Batched multi-seed personalized PageRank: PPR_SEEDS singleton
    seed vectors computed in ONE fused superstep schedule
    (``ss.pagerank_batch`` — vertex state is a (shard, S) matrix so S
    seeds cost one exchange per iteration, the PPR-similarity-feature
    batch form). Output is long-format (seed vid, vid, rank); the
    oracle runs the same fixed-iteration recursion with the seed as
    an extra recursion column."""
    g = _co_distgraph(sf_dir)
    act = g.active_global()
    seeds = np.flatnonzero(act)[:PPR_SEEDS].astype(np.int64)
    mat, _ = ss.pagerank_batch(g, [[int(s)] for s in seeds],
                               damping=DAMPING, tol=0.0,
                               max_iter=PAGERANK_ITERS, weighted=True,
                               active=True)
    vids = np.flatnonzero(act).astype(np.int64)
    return pa.table({
        "seed": pa.array(np.repeat(seeds, len(vids))),
        "vid": pa.array(np.tile(vids, len(seeds))),
        "rank": pa.array(round6(mat[vids].T.ravel())),
    })


# One single-seed recursion per seed column, unioned. Two DuckDB-1.0
# planner traps force this exact shape: (a) the natural multi-key
# form (pr(i, s, v, r) with GROUP BY i, s, b) silently mis-aggregates
# beyond toy sizes (each column's mass collapses after one step), and
# (b) a CONSTANT-FOLDABLE teleport (`THEN 1.0`) inside the recursive
# aggregate miscompiles the same way — the proven
# SQL_PAGERANK_PERSONALIZED_CO shape survives only because its
# teleport is the non-foldable scalar subquery `1.0/(SELECT k FROM
# ks)`. So each seed k gets a verbatim copy of that proven recursion
# (seed = k-th smallest vertex via LIMIT 1 OFFSET k, ks{k} always 1,
# matching the kernel's flatnonzero(act)[:S] singleton columns).
def _ppr_batch_sql():
    parts = []
    for k in range(PPR_SEEDS):
        parts.append(f"""
sd{k} AS (SELECT v FROM verts ORDER BY v LIMIT 1 OFFSET {k}),
ks{k} AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM sd{k}),
pr{k}(i, v, r) AS (
  SELECT 0, v,
         CASE WHEN v IN (SELECT v FROM sd{k})
              THEN 1.0 / (SELECT k FROM ks{k}) ELSE 0.0 END
  FROM verts
  UNION ALL
  SELECT p.i + 1, e.b,
         (1 - {DAMPING}) * (CASE WHEN e.b IN (SELECT v FROM sd{k})
                                 THEN 1.0 / (SELECT k FROM ks{k})
                                 ELSE 0.0 END)
         + {DAMPING} * sum(p.r * e.w / vs.strength)
  FROM pr{k} p
  JOIN verts vs ON vs.v = p.v
  JOIN e ON e.a = p.v
  WHERE p.i < {PAGERANK_ITERS}
  GROUP BY p.i, e.b
)""")
    finals = "\nUNION ALL\n".join(
        f"SELECT (SELECT v FROM sd{k}) AS seed, v AS vid,"
        f" round(r, 6) AS rank FROM pr{k} WHERE i = {PAGERANK_ITERS}"
        for k in range(PPR_SEEDS))
    return f"""
WITH RECURSIVE
e0 AS MATERIALIZED (SELECT l1.l_partkey AS a, l2.l_partkey AS b,
              CAST(count(*) AS DOUBLE) AS w
       FROM lineitem l1 JOIN lineitem l2
         ON l1.l_orderkey = l2.l_orderkey
        AND l1.l_partkey < l2.l_partkey
       GROUP BY 1, 2),
e AS MATERIALIZED (SELECT a, b, w FROM e0
                   UNION ALL SELECT b, a, w FROM e0),
verts AS MATERIALIZED (SELECT a AS v, sum(w) AS strength
                       FROM e GROUP BY a),
{",".join(parts)}
{finals}
"""


SQL_PPR_BATCH_CO = _ppr_batch_sql()


def q_spam_mass_co(sf_dir):
    """TrustRank spam mass (Gyongyi, Garcia-Molina & Pedersen, VLDB
    2004) on the weighted co graph: global PageRank ``rank`` and
    TrustRank ``trust`` (teleport + dangling mass restricted to the
    PPR_SEEDS smallest active vids — the 'manually vetted' seed set),
    both at fixed PAGERANK_ITERS; absolute spam mass ``mass`` = r - t
    and relative spam mass ``rel_mass`` = (r - t)/r. A page with high
    rank but little of it reachable from trusted seeds is the spam
    review queue. Both PageRank runs reuse the cached shard state
    (one CSR build); the composition adds no new shuffle."""
    g = _co_distgraph(sf_dir)
    act = g.active_global()
    seeds = np.flatnonzero(act)[:PPR_SEEDS].astype(np.int64)
    rank, _ = ss.pagerank(g, damping=DAMPING, tol=0.0,
                          max_iter=PAGERANK_ITERS, weighted=True,
                          active=True)
    trust, _ = ss.pagerank(g, damping=DAMPING, tol=0.0,
                           max_iter=PAGERANK_ITERS, weighted=True,
                           active=True, personalize=seeds)
    vids = np.flatnonzero(act).astype(np.int64)
    r, t = rank[vids], trust[vids]
    return pa.table({
        "vid": pa.array(vids),
        "rank": pa.array(round6(r)),
        "trust": pa.array(round6(t)),
        "mass": pa.array(round6(r - t)),
        "rel_mass": pa.array(round6((r - t) / r)),
    })


SQL_SPAM_MASS_CO = f"""
WITH RECURSIVE
e0 AS (SELECT l1.l_partkey AS a, l2.l_partkey AS b,
              CAST(count(*) AS DOUBLE) AS w
       FROM lineitem l1 JOIN lineitem l2
         ON l1.l_orderkey = l2.l_orderkey
        AND l1.l_partkey < l2.l_partkey
       GROUP BY 1, 2),
e AS (SELECT a, b, w FROM e0 UNION ALL SELECT b, a, w FROM e0),
verts AS (SELECT a AS v, sum(w) AS strength FROM e GROUP BY a),
nn AS (SELECT count(*) AS n FROM verts),
seeds AS (SELECT v FROM verts ORDER BY v LIMIT {PPR_SEEDS}),
ks AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM seeds),
pr(i, v, r) AS (
  SELECT 0, v, 1.0 / (SELECT n FROM nn) FROM verts
  UNION ALL
  SELECT p.i + 1, e.b,
         (1 - {DAMPING}) / (SELECT n FROM nn)
         + {DAMPING} * sum(p.r * e.w / vs.strength)
  FROM pr p
  JOIN verts vs ON vs.v = p.v
  JOIN e ON e.a = p.v
  WHERE p.i < {PAGERANK_ITERS}
  GROUP BY p.i, e.b
),
tr(i, v, r) AS (
  SELECT 0, v,
         CASE WHEN v IN (SELECT v FROM seeds)
              THEN 1.0 / (SELECT k FROM ks) ELSE 0.0 END
  FROM verts
  UNION ALL
  SELECT p.i + 1, e.b,
         (1 - {DAMPING}) * (CASE WHEN e.b IN (SELECT v FROM seeds)
                                 THEN 1.0 / (SELECT k FROM ks)
                                 ELSE 0.0 END)
         + {DAMPING} * sum(p.r * e.w / vs.strength)
  FROM tr p
  JOIN verts vs ON vs.v = p.v
  JOIN e ON e.a = p.v
  WHERE p.i < {PAGERANK_ITERS}
  GROUP BY p.i, e.b
)
SELECT pr.v AS vid, round(pr.r, 6) AS rank, round(tr.r, 6) AS trust,
       round(pr.r - tr.r, 6) AS mass,
       round((pr.r - tr.r) / pr.r, 6) AS rel_mass
FROM pr JOIN tr ON tr.v = pr.v AND tr.i = pr.i
WHERE pr.i = {PAGERANK_ITERS}
"""


def q_diameter_sweep_co(sf_dir):
    """Double-sweep BFS diameter lower bound (Magnien, Latapy &
    Habib's classic heuristic): BFS from the smallest active vid,
    take the farthest reached vertex (smallest vid on ties), BFS
    again from it — the second eccentricity lower-bounds the graph
    diameter. Two frontier-BSP kernel runs, one row out; the exact
    all-pairs diameter is never materialised."""
    g = _co_distgraph(sf_dir)
    act = g.active_global()
    s0 = int(np.flatnonzero(act)[0])
    INF = np.iinfo(np.int64).max
    d0, _ = ss.bfs_distances(g, [s0])
    fin0 = np.flatnonzero(act & (d0 < INF))
    far = int(fin0[d0[fin0] == d0[fin0].max()].min())
    d1, _ = ss.bfs_distances(g, [far])
    fin1 = np.flatnonzero(act & (d1 < INF))
    return pa.table({
        "start_vid": pa.array([s0], pa.int64()),
        "far_vid": pa.array([far], pa.int64()),
        "diameter_lb": pa.array([int(d1[fin1].max())], pa.int64()),
    })


SQL_DIAMETER_SWEEP_CO = f"""
WITH RECURSIVE
{_SQL_CO_EDGES_BOTH_MAT},
s0 AS (SELECT min(a) AS v FROM e),
b0(v, d) AS (
  SELECT v, 0 FROM s0
  UNION
  SELECT e.b, b0.d + 1 FROM b0 JOIN e ON e.a = b0.v WHERE b0.d < 30
),
d0 AS (SELECT v, min(d) AS d FROM b0 GROUP BY v),
far AS (SELECT v FROM d0 ORDER BY d DESC, v ASC LIMIT 1),
b1(v, d) AS (
  SELECT v, 0 FROM far
  UNION
  SELECT e.b, b1.d + 1 FROM b1 JOIN e ON e.a = b1.v WHERE b1.d < 30
),
d1 AS (SELECT v, min(d) AS d FROM b1 GROUP BY v)
SELECT (SELECT v FROM s0) AS start_vid,
       (SELECT v FROM far) AS far_vid,
       (SELECT CAST(max(d) AS BIGINT) FROM d1) AS diameter_lb
"""


KCORE_K = 80
_KCORE_SQL_ITERS = 12


def q_kcore_co(sf_dir):
    """k-core membership (k=80) via the distributed peel kernel; the
    kernel is idempotent past its fixed point, so the fixed-iteration
    SQL peel reproduces it exactly (fixed point is ~6 supersteps at
    sf0.01; the oracle runs 12)."""
    g = _co_distgraph(sf_dir)
    mask, _ = ss.kcore(g, KCORE_K)
    vids = np.flatnonzero(mask).astype(np.int64)
    return pa.table({"vid": pa.array(vids)})


SQL_KCORE_CO = f"""
WITH RECURSIVE
{_SQL_CO_EDGES_BOTH},
verts AS (SELECT DISTINCT a AS v FROM e),
peel(i, v) AS (
  SELECT 0, v FROM verts
  UNION ALL
  SELECT q.i + 1, q.v FROM (
    SELECT p.i AS i, e.b AS v, count(*) AS deg
    FROM peel p JOIN e ON e.a = p.v
    JOIN peel p2 ON p2.v = e.b AND p2.i = p.i
    WHERE p.i < {_KCORE_SQL_ITERS}
    GROUP BY p.i, e.b) q
  WHERE q.deg >= {KCORE_K}
)
SELECT CAST(v AS BIGINT) AS vid FROM peel WHERE i = {_KCORE_SQL_ITERS}
"""


CORENESS_LEVELS = (20, 40, 60, 80, 100, 120)
# Peel depth for the SQL twin: max observed convergence rounds across
# sf0.001/0.01/0.1 is <= 12 for every k in CORENESS_LEVELS; 14 gives
# two rounds of slack. If a corpus ever needed more, the SQL survivor
# set would be a strict superset of the fixed point — the engine side
# peels to convergence, so a gate mismatch at a new scale means THIS
# bound, not the kernel.
_CORENESS_SQL_ITERS = 14


def q_coreness_co(sf_dir):
    """Stepped core decomposition: per vertex the highest level k in
    CORENESS_LEVELS whose k-core still contains it (1 if none — the
    active set). Each level's peel warm-starts from the previous
    level's survivors (k-core ⊆ (k-1)-core), so the whole
    decomposition costs barely more than the deepest single peel."""
    g = _co_distgraph(sf_dir)
    core, _ = ss.coreness(g, CORENESS_LEVELS)
    vids = np.flatnonzero(core > 0).astype(np.int64)
    return pa.table({"vid": pa.array(vids),
                     "coreness": pa.array(core[vids])})


SQL_CORENESS_CO = f"""
WITH RECURSIVE
{_SQL_CO_EDGES_BOTH},
verts AS (SELECT DISTINCT a AS v FROM e),
ks AS (SELECT UNNEST({list(CORENESS_LEVELS)}) AS k),
peel(k, i, v) AS (
  SELECT ks.k, 0, verts.v FROM verts, ks
  UNION ALL
  SELECT q.k, q.i + 1, q.v FROM (
    SELECT p.k AS k, p.i AS i, e.b AS v, count(*) AS deg
    FROM peel p JOIN e ON e.a = p.v
    JOIN peel p2 ON p2.v = e.b AND p2.i = p.i AND p2.k = p.k
    WHERE p.i < {_CORENESS_SQL_ITERS}
    GROUP BY p.k, p.i, e.b) q
  WHERE q.deg >= q.k
),
sur AS (SELECT k, v FROM peel WHERE i = {_CORENESS_SQL_ITERS})
SELECT CAST(verts.v AS BIGINT) AS vid,
       CAST(COALESCE(max(sur.k), 1) AS BIGINT) AS coreness
FROM verts LEFT JOIN sur ON sur.v = verts.v
GROUP BY verts.v
"""


HITS_ITERS = 20


def q_hits_ps(sf_dir):
    """HITS hubs/authorities on the directed part->supplier graph
    (parts are pure hubs, suppliers pure authorities). Fixed
    HITS_ITERS simultaneous-update iterations with L1 normalisation,
    so the recursive-CTE oracle reproduces it; rounded to 6
    decimals."""
    g = _ps_distgraph(sf_dir, symmetric=False)
    g_rev = _ps_rev_distgraph(sf_dir)
    hub, auth, act = ss.hits(g, g_rev, iters=HITS_ITERS)
    vids = np.flatnonzero(act).astype(np.int64)
    return pa.table({"vid": pa.array(vids),
                     "hub": pa.array(round6(hub[vids])),
                     "authority": pa.array(round6(auth[vids]))})


SQL_HITS_PS = f"""
WITH RECURSIVE
e AS (SELECT l_partkey * 2 AS a, l_suppkey * 2 + 1 AS b
      FROM lineitem GROUP BY 1, 2),
verts AS (SELECT DISTINCT v FROM
          (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
hits(i, v, h, a) AS (
  SELECT 0, v, 1.0 / (SELECT n FROM nn), 1.0 / (SELECT n FROM nn)
  FROM verts
  UNION ALL
  SELECT q.i, q.v,
         q.hr / sum(q.hr) OVER (),
         q.ar / sum(q.ar) OVER ()
  FROM (
    SELECT p.i + 1 AS i, p.v AS v,
           COALESCE((SELECT sum(p2.a) FROM hits p2 JOIN e ON e.b = p2.v
                     WHERE e.a = p.v AND p2.i = p.i), 0) AS hr,
           COALESCE((SELECT sum(p2.h) FROM hits p2 JOIN e ON e.a = p2.v
                     WHERE e.b = p.v AND p2.i = p.i), 0) AS ar
    FROM hits p WHERE p.i < {HITS_ITERS}
  ) q
)
SELECT v AS vid, round(h, 6) AS hub, round(a, 6) AS authority
FROM hits WHERE i = {HITS_ITERS}
"""


def _ps_rev_distgraph(sf_dir, P=8):
    """Reversed part->supplier graph (supplier -> part), built once via
    the same Dataset path; the HITS hub gather reads authority state
    partition-locally on this orientation."""
    key = (sf_dir, "ps_rev")
    if key not in _G_CACHE:
        fwd = _ps_distgraph(sf_dir, symmetric=False)

        def swap(t: pa.Table) -> pa.Table:
            return pa.table({"src": t["dst"], "dst": t["src"],
                             "weight": t["weight"]})

        edges = tg.ps_edges(sf_dir).map_batches(
            swap, batch_format="pyarrow", zero_copy_batch=True)
        _G_CACHE[key] = DistGraph.from_dataset(
            edges, n=fwd.n, P=P, directed=True, dedup=False)
    return _G_CACHE[key]


def q_salsa_ps(sf_dir):
    """SALSA hubs/authorities (Lempel & Moran 2000) on the directed
    part->supplier graph: the HITS exchange with each sender's mass
    split over its edges (hub/out-degree forward, authority/in-degree
    reversed) — the stochastic chains whose fixed point is
    indegree-proportional within authority components. Fixed
    HITS_ITERS simultaneous iterations, L1 normalised, rounded to 6
    decimals for the CTE twin."""
    g = _ps_distgraph(sf_dir, symmetric=False)
    g_rev = _ps_rev_distgraph(sf_dir)
    hub, auth, act = ss.salsa(g, g_rev, iters=HITS_ITERS)
    vids = np.flatnonzero(act).astype(np.int64)
    return pa.table({"vid": pa.array(vids),
                     "hub": pa.array(round6(hub[vids])),
                     "authority": pa.array(round6(auth[vids]))})


SQL_SALSA_PS = f"""
WITH RECURSIVE
e AS (SELECT l_partkey * 2 AS a, l_suppkey * 2 + 1 AS b
      FROM lineitem GROUP BY 1, 2),
outdeg AS (SELECT a AS v, CAST(count(*) AS DOUBLE) AS d
           FROM e GROUP BY a),
indeg AS (SELECT b AS v, CAST(count(*) AS DOUBLE) AS d
          FROM e GROUP BY b),
verts AS (SELECT DISTINCT v FROM
          (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
hits(i, v, h, a) AS (
  SELECT 0, v, 1.0 / (SELECT n FROM nn), 1.0 / (SELECT n FROM nn)
  FROM verts
  UNION ALL
  SELECT q.i, q.v,
         q.hr / sum(q.hr) OVER (),
         q.ar / sum(q.ar) OVER ()
  FROM (
    SELECT p.i + 1 AS i, p.v AS v,
           COALESCE((SELECT sum(p2.a / di.d)
                     FROM hits p2 JOIN e ON e.b = p2.v
                     JOIN indeg di ON di.v = p2.v
                     WHERE e.a = p.v AND p2.i = p.i), 0) AS hr,
           COALESCE((SELECT sum(p2.h / od.d)
                     FROM hits p2 JOIN e ON e.a = p2.v
                     JOIN outdeg od ON od.v = p2.v
                     WHERE e.b = p.v AND p2.i = p.i), 0) AS ar
    FROM hits p WHERE p.i < {HITS_ITERS}
  ) q
)
SELECT v AS vid, round(h, 6) AS hub, round(a, 6) AS authority
FROM hits WHERE i = {HITS_ITERS}
"""


KATZ_ALPHA = 0.005
KATZ_BETA = 1.0
KATZ_ITERS = 20
EIGEN_ITERS = 20


def q_katz_co(sf_dir):
    """Katz centrality on the simple (unweighted) symmetric co graph:
    fixed KATZ_ITERS Jacobi supersteps, alpha below 1/lambda_max so
    the series converges; rounded to 6 decimals for the CTE oracle."""
    g = _co_distgraph(sf_dir)
    x = ss.katz(g, alpha=KATZ_ALPHA, beta=KATZ_BETA, iters=KATZ_ITERS)
    vids = np.flatnonzero(g.active_global()).astype(np.int64)
    return pa.table({"vid": pa.array(vids),
                     "katz": pa.array(round6(x[vids]))})


SQL_KATZ_CO = f"""
WITH RECURSIVE
{_SQL_CO_EDGES_BOTH},
verts AS (SELECT DISTINCT a AS v FROM e),
katz(i, v, x) AS (
  -- CAST: a bare 1.0 literal would type x DECIMAL(2,1) and truncate
  SELECT 0, v, CAST({KATZ_BETA} AS DOUBLE) FROM verts
  UNION ALL
  SELECT p.i + 1, p.v,
         {KATZ_BETA} + {KATZ_ALPHA} *
         COALESCE((SELECT sum(p2.x) FROM katz p2 JOIN e ON e.a = p2.v
                   WHERE e.b = p.v AND p2.i = p.i), 0)
  FROM katz p WHERE p.i < {KATZ_ITERS}
)
SELECT v AS vid, round(x, 6) AS katz
FROM katz WHERE i = {KATZ_ITERS}
"""


def q_eigencentrality_co(sf_dir):
    """Eigenvector centrality on the weighted symmetric co graph:
    fixed EIGEN_ITERS power-iteration supersteps with per-step L1
    normalisation (the HITS oracle pattern)."""
    g = _co_distgraph(sf_dir)
    x, act = ss.eigenvector_centrality(g, iters=EIGEN_ITERS,
                                       weighted=True)
    vids = np.flatnonzero(act).astype(np.int64)
    return pa.table({"vid": pa.array(vids),
                     "centrality": pa.array(round6(x[vids]))})


SQL_EIGENCENTRALITY_CO = f"""
WITH RECURSIVE
e0 AS (SELECT l1.l_partkey AS a, l2.l_partkey AS b,
              CAST(count(*) AS DOUBLE) AS w
       FROM lineitem l1 JOIN lineitem l2
         ON l1.l_orderkey = l2.l_orderkey
        AND l1.l_partkey < l2.l_partkey
       GROUP BY 1, 2),
e AS (SELECT a, b, w FROM e0 UNION ALL SELECT b AS a, a AS b, w FROM e0),
verts AS (SELECT DISTINCT a AS v FROM e),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
ec(i, v, x) AS (
  SELECT 0, v, 1.0 / (SELECT n FROM nn) FROM verts
  UNION ALL
  SELECT q.i, q.v, q.raw / sum(q.raw) OVER ()
  FROM (
    SELECT p.i + 1 AS i, p.v AS v,
           COALESCE((SELECT sum(p2.x * e.w) FROM ec p2
                     JOIN e ON e.a = p2.v
                     WHERE e.b = p.v AND p2.i = p.i), 0) AS raw
    FROM ec p WHERE p.i < {EIGEN_ITERS}
  ) q
)
SELECT v AS vid, round(x, 6) AS centrality
FROM ec WHERE i = {EIGEN_ITERS}
"""


WL_ITERS = 2


def q_wl_colors_co(sf_dir):
    """Weisfeiler-Lehman (1-WL color refinement) vertex fingerprints
    on the simple co graph, WL_ITERS rounds: initial color = degree,
    then md5(own || '|' || sorted neighbour colors). Structural-role
    fingerprints for graph-similarity / isomorphism screening; the
    md5 chain is reproduced verbatim in SQL."""
    g = _co_distgraph(sf_dir)
    lab, act = ss.wl_refinement(g, iters=WL_ITERS)
    vids = np.flatnonzero(act).astype(np.int64)
    return pa.table({"vid": pa.array(vids),
                     "wl": pa.array(lab[vids])})


SQL_WL_COLORS_CO = f"""
WITH
{_SQL_CO_EDGES_BOTH},
deg AS (SELECT a AS v, CAST(count(*) AS VARCHAR) AS lab
        FROM e GROUP BY a),
l1 AS (SELECT e.b AS v,
              md5(any_value(d2.lab) || '|' ||
                  string_agg(d1.lab, ',' ORDER BY d1.lab)) AS lab
       FROM e JOIN deg d1 ON d1.v = e.a JOIN deg d2 ON d2.v = e.b
       GROUP BY e.b),
l2 AS (SELECT e.b AS v,
              md5(any_value(x2.lab) || '|' ||
                  string_agg(x1.lab, ',' ORDER BY x1.lab)) AS lab
       FROM e JOIN l1 x1 ON x1.v = e.a JOIN l1 x2 ON x2.v = e.b
       GROUP BY e.b)
SELECT CAST(v AS BIGINT) AS vid, lab AS wl FROM l2
"""


WL_DRIFT_YEARS = (1995, 1996)


def _co_edges_year(sf_dir, yr, num_partitions=16):
    """Distinct co-occurrence pairs restricted to orders of one
    calendar year (the crawl-slice analogue): one l_orderkey
    hash-join attaches the year filter, then the same self-join +
    per-batch pre-aggregation as ``co_edge_rows``."""
    li = tg.read_lineitem(sf_dir, ["l_orderkey", "l_partkey"])
    oy = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_orderdate"])

    def pick(t: pa.Table) -> pa.Table:
        keep = pc.equal(pc.year(t["o_orderdate"]), yr)
        return pa.table({"l_orderkey": t["o_orderkey"]}).filter(keep)

    dated = li.join(oy.map_batches(pick, batch_format="pyarrow"),
                    "inner", num_partitions, on=("l_orderkey",))
    right = li.map_batches(
        lambda t: t.rename_columns(["l_orderkey", "partkey_r"]),
        batch_format="pyarrow", zero_copy_batch=True)
    joined = dated.join(right, "inner", num_partitions,
                        on=("l_orderkey",))

    def pairs(t: pa.Table) -> pa.Table:
        keep = pc.less(t["l_partkey"], t["partkey_r"])
        tt = pa.table({"src": t["l_partkey"],
                       "dst": t["partkey_r"]}).filter(keep)
        out = tt.group_by(["src", "dst"]).aggregate([])
        return pa.table({
            "src": pc.cast(out["src"], pa.int64()),
            "dst": pc.cast(out["dst"], pa.int64()),
            "weight": pa.array(np.ones(out.num_rows)),
        })

    return joined.map_batches(pairs, batch_format="pyarrow",
                              zero_copy_batch=True)


def q_wl_drift_co(sf_dir, years=WL_DRIFT_YEARS, num_partitions=16):
    """Structural drift between two temporal graph slices (the
    monitoring op a long-running crawl pipeline needs: did this
    week's link graph change SHAPE, not just size): run the same
    1-WL refinement on the co graph of each slice year, histogram the
    color fingerprints, and report the weighted Jaccard
    sum(min)/sum(max) of the two histograms — 1.0 means structurally
    indistinguishable slices. All-integer until the final ratio; the
    color histogram is the only driver state (bounded by distinct
    structural roles)."""
    from ..dist.blocks import symmetrize_edges
    n = int(rd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_partkey"]).max("p_partkey")) + 1
    hists = []
    for yr in years:
        g = DistGraph.from_dataset(
            symmetrize_edges(_co_edges_year(sf_dir, yr,
                                            num_partitions)), n=n, P=8,
            directed=False, dedup=True)
        lab, act = ss.wl_refinement(g, iters=WL_ITERS)
        vals, cnts = np.unique(np.asarray(lab)[np.asarray(act)],
                               return_counts=True)
        hists.append(dict(zip(vals.tolist(), cnts.tolist())))
    ha, hb = hists
    allc = set(ha) | set(hb)
    smin = sum(min(ha.get(c, 0), hb.get(c, 0)) for c in allc)
    smax = sum(max(ha.get(c, 0), hb.get(c, 0)) for c in allc)
    n_common = sum(1 for c in allc if c in ha and c in hb)
    return pa.table({
        "n_colors_a": pa.array([len(ha)], pa.int64()),
        "n_colors_b": pa.array([len(hb)], pa.int64()),
        "n_common": pa.array([n_common], pa.int64()),
        "wl_jaccard": pa.array(round6([smin / smax if smax else 1.0])),
    })


def _wl_year_chain(tag, yr):
    return f"""
e0{tag} AS (SELECT l1.l_partkey AS a, l2.l_partkey AS b
       FROM lineitem l1 JOIN lineitem l2
         ON l1.l_orderkey = l2.l_orderkey
        AND l1.l_partkey < l2.l_partkey
       JOIN orders o ON o.o_orderkey = l1.l_orderkey
        AND year(o.o_orderdate) = {yr}
       GROUP BY 1, 2),
e{tag} AS (SELECT a, b FROM e0{tag}
           UNION ALL SELECT b AS a, a AS b FROM e0{tag}),
deg{tag} AS (SELECT a AS v, CAST(count(*) AS VARCHAR) AS lab
             FROM e{tag} GROUP BY a),
l1{tag} AS (SELECT e.b AS v,
              md5(any_value(d2.lab) || '|' ||
                  string_agg(d1.lab, ',' ORDER BY d1.lab)) AS lab
       FROM e{tag} e JOIN deg{tag} d1 ON d1.v = e.a
       JOIN deg{tag} d2 ON d2.v = e.b
       GROUP BY e.b),
l2{tag} AS (SELECT e.b AS v,
              md5(any_value(x2.lab) || '|' ||
                  string_agg(x1.lab, ',' ORDER BY x1.lab)) AS lab
       FROM e{tag} e JOIN l1{tag} x1 ON x1.v = e.a
       JOIN l1{tag} x2 ON x2.v = e.b
       GROUP BY e.b),
h{tag} AS (SELECT lab, count(*) AS c FROM l2{tag} GROUP BY lab)"""


SQL_WL_DRIFT_CO = f"""
WITH
{_wl_year_chain('a', WL_DRIFT_YEARS[0])},
{_wl_year_chain('b', WL_DRIFT_YEARS[1])},
m AS (SELECT COALESCE(ha.c, 0) AS ca, COALESCE(hb.c, 0) AS cb,
             CASE WHEN ha.lab IS NOT NULL AND hb.lab IS NOT NULL
                  THEN 1 ELSE 0 END AS in_both
      FROM ha FULL OUTER JOIN hb ON ha.lab = hb.lab)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM ha) AS n_colors_a,
       (SELECT CAST(count(*) AS BIGINT) FROM hb) AS n_colors_b,
       CAST(sum(in_both) AS BIGINT) AS n_common,
       round(sum(least(ca, cb)) * 1.0 / sum(greatest(ca, cb)), 6)
         AS wl_jaccard
FROM m
"""


def q_reciprocity_co(sf_dir):
    """Edge reciprocity of the DIRECTED co-occurrence graph (a -> b
    when a's lineitem precedes b's within an order): the fraction of
    directed edges whose reverse also exists — the classic link-graph
    symmetry diagnostic. One pair-key shuffle: per-batch partial
    direction flags, groupby max (idempotent combine), tiny partial
    count reduce."""
    from ray.data.aggregate import Max
    li = tg.read_lineitem(sf_dir,
                          ["l_orderkey", "l_partkey", "l_linenumber"])
    right = li.map_batches(
        lambda t: t.rename_columns(
            ["l_orderkey", "partkey_r", "linenumber_r"]),
        batch_format="pyarrow", zero_copy_batch=True)
    joined = li.join(right, "inner", 16, on=("l_orderkey",))

    def pre(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.less(t["l_linenumber"], t["linenumber_r"]),
                       pc.not_equal(t["l_partkey"], t["partkey_r"]))
        tt = t.filter(keep)
        a, b = tt["l_partkey"], tt["partkey_r"]
        g = pa.table({
            "lo": pc.min_element_wise(a, b),
            "hi": pc.max_element_wise(a, b),
            "f": pc.cast(pc.less(a, b), pa.int64()),
            "r": pc.cast(pc.greater(a, b), pa.int64()),
        }).group_by(["lo", "hi"]).aggregate([("f", "max"), ("r", "max")])
        return g.rename_columns(["lo", "hi", "f", "r"])

    agg = joined.map_batches(pre, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby(["lo", "hi"]).aggregate(Max("f", alias_name="f"),
                                         Max("r", alias_name="r"))

    def counts(t: pa.Table) -> pa.Table:
        f = t["f"].to_numpy(zero_copy_only=False)
        r = t["r"].to_numpy(zero_copy_only=False)
        return pa.table({
            "ne": pa.array([int((f + r).sum())], pa.int64()),
            "nr": pa.array([int(2 * ((f == 1) & (r == 1)).sum())],
                           pa.int64()),
        })

    part = agg.map_batches(counts, batch_format="pyarrow").to_pandas()
    ne, nr = int(part["ne"].sum()), int(part["nr"].sum())
    rec = round6(np.array([nr / ne if ne else 0.0]))
    return pa.table({"n_edges": pa.array([ne], pa.int64()),
                     "n_reciprocal": pa.array([nr], pa.int64()),
                     "reciprocity": pa.array(rec)})


SQL_RECIPROCITY_CO = """
WITH d AS (SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
           FROM lineitem l1 JOIN lineitem l2
             ON l1.l_orderkey = l2.l_orderkey
            AND l1.l_linenumber < l2.l_linenumber
            AND l1.l_partkey <> l2.l_partkey),
p AS (SELECT least(a, b) AS lo, greatest(a, b) AS hi,
             max(CASE WHEN a < b THEN 1 ELSE 0 END) AS f,
             max(CASE WHEN a > b THEN 1 ELSE 0 END) AS r
      FROM d GROUP BY 1, 2)
SELECT CAST(sum(f + r) AS BIGINT) AS n_edges,
       CAST(sum(CASE WHEN f = 1 AND r = 1 THEN 2 ELSE 0 END)
            AS BIGINT) AS n_reciprocal,
       round(sum(CASE WHEN f = 1 AND r = 1 THEN 2 ELSE 0 END)
             / CAST(sum(f + r) AS DOUBLE), 6) AS reciprocity
FROM p
"""


def q_clustering_coeff_co(sf_dir):
    """Local clustering coefficient: 2*triangles(v) / (deg(v)*(deg(v)-1))
    on the simple co graph (0 when deg < 2). Triangles come from the
    partitioned compact-forward plan; degrees from the Dataset-built
    CSR shards. Driver work is O(n) output assembly only."""
    g = _co_distgraph(sf_dir)
    _, pv = triangle_count(tg.co_edge_rows(sf_dir), num_partitions=8,
                           per_vertex=True)
    tri = np.zeros(g.n, dtype=np.float64)
    for batch in pv.iter_batches(batch_format="pyarrow"):
        v = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = batch["count()"].to_numpy(zero_copy_only=False)
        tri[v] = c
    deg = ss.assemble(g, g.out_deg).astype(np.float64)
    act = g.active_global()
    vids = np.flatnonzero(act).astype(np.int64)
    d = deg[vids]
    coeff = np.zeros(len(vids))
    m = d >= 2
    coeff[m] = 2.0 * tri[vids][m] / (d[m] * (d[m] - 1.0))
    return pa.table({"vid": pa.array(vids),
                     "coeff": pa.array(round6(coeff))})


SQL_CLUSTERING_COEFF_CO = """
WITH e0 AS (SELECT l1.l_partkey AS a, l2.l_partkey AS b
            FROM lineitem l1 JOIN lineitem l2
              ON l1.l_orderkey = l2.l_orderkey
             AND l1.l_partkey < l2.l_partkey
            GROUP BY 1, 2),
t AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e0 e1 JOIN e0 e2 ON e2.a = e1.b JOIN e0 e3
        ON e3.a = e1.a AND e3.b = e2.b),
tc AS (SELECT vid, count(*) AS n_tri FROM (
         SELECT x AS vid FROM t UNION ALL SELECT y FROM t
         UNION ALL SELECT z FROM t) GROUP BY vid),
deg AS (SELECT v, count(*) AS d FROM (
          SELECT a AS v FROM e0 UNION ALL SELECT b AS v FROM e0)
        GROUP BY v)
SELECT deg.v AS vid,
       round(CASE WHEN deg.d >= 2
                  THEN 2.0 * COALESCE(tc.n_tri, 0) / (deg.d * (deg.d - 1))
                  ELSE 0.0 END, 6) AS coeff
FROM deg LEFT JOIN tc ON tc.vid = deg.v
"""


# SQL fragment: canonical co pairs + both-directions expansion shared
# by the link-prediction / sampling / assortativity oracles.
_SQL_CO_PAIRS = """e0 AS (SELECT l1.l_partkey AS a, l2.l_partkey AS b
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey
       AND l1.l_partkey < l2.l_partkey
      GROUP BY 1, 2)"""


def q_link_predict_co(sf_dir):
    """Top-20 NON-adjacent co-graph pairs by common-neighbor count
    (Adamic-Adar score as the companion signal): partitioned wedge
    plan — per-middle-vertex pair enumeration in the bucket owning the
    middle, bucket-local aggregation, per-bucket top-k, driver merges
    K*k rows (never the pair stream)."""
    from ..dist.linkpred import adamic_adar_topk
    return adamic_adar_topk(tg.co_edge_rows(sf_dir), k_top=20,
                            num_partitions=8)


SQL_LINK_PREDICT_CO = f"""
WITH
{_SQL_CO_PAIRS},
ee AS (SELECT a AS w, b AS v FROM e0
       UNION ALL SELECT b AS w, a AS v FROM e0),
deg AS (SELECT w, count(*) AS dg FROM ee GROUP BY w),
wedges AS (SELECT x.v AS a, y.v AS b, 1.0 / ln(d.dg) AS s
           FROM ee x JOIN ee y ON x.w = y.w AND x.v < y.v
           JOIN deg d ON d.w = x.w),
agg AS (SELECT a, b, count(*) AS cn, sum(s) AS aa
        FROM wedges GROUP BY a, b),
ne AS (SELECT g.a, g.b, g.cn, g.aa FROM agg g
       LEFT JOIN e0 ON e0.a = g.a AND e0.b = g.b
       WHERE e0.a IS NULL)
SELECT a, b, cn AS common_neighbors, round(aa, 6) AS aa_score
FROM ne ORDER BY cn DESC, a ASC, b ASC LIMIT 20
"""


NEIGHBOR_FANOUT = 5


def q_neighbor_sample_co(sf_dir):
    """Deterministic fan-out-5 neighbor sampling (the GraphSAGE
    mini-batch shape): per-vertex neighbor rank by the modular hash
    ``(src*7919 + dst*104729) % 1000003`` with dst tie-break,
    assembled as a Dataset from per-bucket Arrow tables."""
    from ..dist.linkpred import neighbor_sample
    return neighbor_sample(tg.co_edge_rows(sf_dir),
                           fanout=NEIGHBOR_FANOUT, num_partitions=8)


SQL_NEIGHBOR_SAMPLE_CO = f"""
WITH
{_SQL_CO_PAIRS},
ee AS (SELECT a AS src, b AS dst FROM e0
       UNION ALL SELECT b AS src, a AS dst FROM e0),
r AS (SELECT src, dst,
             row_number() OVER (
               PARTITION BY src
               ORDER BY (src * 7919 + dst * 104729) % 1000003, dst)
               AS rk
      FROM ee)
SELECT src, dst, rk FROM r WHERE rk <= {NEIGHBOR_FANOUT}
"""


def q_assortativity_co(sf_dir):
    """Degree assortativity of the co graph (scalar): exact integer
    partial sums per bucket; the driver evaluates the Pearson
    expression in the same float operation order as the SQL."""
    from ..dist.linkpred import degree_assortativity
    r = degree_assortativity(tg.co_edge_rows(sf_dir), num_partitions=8)
    return pa.table({"assortativity": pa.array(round6([r]))})


SQL_ASSORTATIVITY_CO = f"""
WITH
{_SQL_CO_PAIRS},
ee AS (SELECT a AS s, b AS d FROM e0 UNION ALL SELECT b, a FROM e0),
deg AS (SELECT s, count(*) AS dg FROM ee GROUP BY s),
xy AS (SELECT d1.dg AS x, d2.dg AS y
       FROM ee JOIN deg d1 ON d1.s = ee.s JOIN deg d2 ON d2.s = ee.d)
SELECT round(
  (sum(x * y) / count(*) - (sum(x) / count(*)) * (sum(y) / count(*)))
  / (sqrt(sum(x * x) / count(*)
          - (sum(x) / count(*)) * (sum(x) / count(*)))
     * sqrt(sum(y * y) / count(*)
            - (sum(y) / count(*)) * (sum(y) / count(*)))), 6)
  AS assortativity
FROM xy
"""


def _item_seq_edges(sf_dir):
    """Directed item-sequence graph: within each order, consecutive
    line numbers give a part->part transition edge. One l_orderkey
    hash shuffle. Returns (edges Dataset, n)."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_partkey"])
    n = int(rd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_partkey"]).max("p_partkey")) + 1

    def seq(g: pd.DataFrame) -> pd.DataFrame:
        # (l_orderkey, l_linenumber) has ties in the synthetic data:
        # break on l_partkey for a total, oracle-replicable order
        g = g.sort_values(["l_linenumber", "l_partkey"])
        a = g["l_partkey"].to_numpy(np.int64)
        return pd.DataFrame({"src": a[:-1], "dst": a[1:]})

    return li.groupby("l_orderkey").map_groups(
        seq, batch_format="pandas"), n


def _item_seq_distgraph(sf_dir, P=8):
    """Cached forward item-sequence DistGraph: the l_orderkey shuffle
    and parquet spill run once per sf_dir and are shared by every
    item-sequence query (SCC, bow-tie, walks, effective diameter).
    The spill dir is kept on the instance so the reversed build can
    reuse it."""
    key = (sf_dir, "item_seq")
    if key not in _G_CACHE:
        import tempfile
        edges, n = _item_seq_edges(sf_dir)
        spill = tempfile.mkdtemp(prefix="lray_itemseq_")
        g = DistGraph.from_dataset(edges, n=n, P=P, directed=True,
                                   dedup=True, spill_dir=spill)
        g._item_seq_spill = spill
        _G_CACHE[key] = g
    return _G_CACHE[key]


def _item_seq_rev_distgraph(sf_dir, P=8):
    """Reversed item-sequence blocks from the forward build's parquet
    spill — the l_orderkey shuffle runs once, not twice."""
    key = (sf_dir, "item_seq_rev")
    if key not in _G_CACHE:
        gf = _item_seq_distgraph(sf_dir, P)
        swapped = rd.read_parquet(gf._item_seq_spill,
                                  columns=["src", "dst"]) \
            .map_batches(
                lambda t: pa.table({"src": t["dst"],
                                    "dst": t["src"]}),
                batch_format="pyarrow", zero_copy_batch=True)
        _G_CACHE[key] = DistGraph.from_dataset(
            swapped, n=gf.n, P=P, directed=True, dedup=True)
    return _G_CACHE[key]


def q_scc_items(sf_dir):
    """Strongly connected components of the directed item-sequence
    graph: the FW-BW-colouring BSP kernel (``superstep.scc``) over
    Dataset-built CSR blocks — forward and reversed block sets, no
    driver edge list."""
    gf = _item_seq_distgraph(sf_dir)
    gb = _item_seq_rev_distgraph(sf_dir)
    lab, _ = ss.scc(gf, gb)
    vids = np.flatnonzero(gf.active_global()).astype(np.int64)
    return pa.table({"vid": pa.array(vids),
                     "scc_id": pa.array(lab[vids])})


SQL_SCC_ITEMS = """
WITH RECURSIVE
seq AS (SELECT l_partkey AS a,
               lead(l_partkey) OVER (PARTITION BY l_orderkey
                                     ORDER BY l_linenumber, l_partkey) AS b
        FROM lineitem),
e AS (SELECT DISTINCT a, b FROM seq WHERE b IS NOT NULL),
verts AS (SELECT a AS v FROM e UNION SELECT b FROM e),
reach(s, t) AS (
  SELECT a, b FROM e
  UNION
  SELECT r.s, e.b FROM reach r JOIN e ON e.a = r.t
),
mutual AS (SELECT r1.s AS v, r1.t AS u
           FROM reach r1 JOIN reach r2 ON r1.s = r2.t AND r1.t = r2.s)
SELECT vv.v AS vid,
       CAST(least(vv.v, coalesce(min(m.u), vv.v)) AS BIGINT) AS scc_id
FROM verts vv LEFT JOIN mutual m ON m.v = vv.v
GROUP BY vv.v
"""


def q_bowtie_items(sf_dir):
    """Bow-tie decomposition (Broder et al., 'Graph structure in the
    web', WWW 2000) of the directed item-sequence graph, relative to
    the SCC of the smallest active vid: 'scc' = mutually reachable
    with the seed, 'in' = reaches the core, 'out' = reached from the
    core, 'other' = tendrils/disconnected. Two frontier-BSP BFS runs
    (forward blocks + reversed blocks from the same one-shuffle
    spill); the driver holds two bool masks, never an edge list."""
    gf = _item_seq_distgraph(sf_dir)
    gb = _item_seq_rev_distgraph(sf_dir)
    act = gf.active_global()
    seed = int(np.flatnonzero(act)[0])
    INF = np.iinfo(np.int64).max
    df, _ = ss.bfs_distances(gf, [seed])
    db, _ = ss.bfs_distances(gb, [seed])
    fwd, bwd = df < INF, db < INF
    vids = np.flatnonzero(act).astype(np.int64)
    cls = np.where(fwd[vids] & bwd[vids], "scc",
                   np.where(bwd[vids], "in",
                            np.where(fwd[vids], "out", "other")))
    return pa.table({"vid": pa.array(vids),
                     "cls": pa.array(cls.astype(object), pa.string())})


SQL_BOWTIE_ITEMS = """
WITH RECURSIVE
seq AS (SELECT l_partkey AS a,
               lead(l_partkey) OVER (PARTITION BY l_orderkey
                                     ORDER BY l_linenumber, l_partkey) AS b
        FROM lineitem),
e AS (SELECT DISTINCT a, b FROM seq WHERE b IS NOT NULL),
verts AS (SELECT DISTINCT v FROM
          (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)),
s AS (SELECT min(v) AS v FROM verts),
fwd(v) AS (
  SELECT v FROM s
  UNION
  SELECT e.b FROM fwd JOIN e ON e.a = fwd.v
),
bwd(v) AS (
  SELECT v FROM s
  UNION
  SELECT e.a FROM bwd JOIN e ON e.b = bwd.v
)
SELECT vv.v AS vid,
       CASE WHEN f.v IS NOT NULL AND b.v IS NOT NULL THEN 'scc'
            WHEN b.v IS NOT NULL THEN 'in'
            WHEN f.v IS NOT NULL THEN 'out'
            ELSE 'other' END AS cls
FROM verts vv
LEFT JOIN fwd f ON f.v = vv.v
LEFT JOIN bwd b ON b.v = vv.v
"""


def q_onion_paths(sf_dir):
    """Onion decomposition on the per-nation supplier paths: a path
    peels one position from each end per round (core pins at 1), so
    layer(v_i) = min(i, k-1-i) + 1 in suppkey order and coreness = 1
    — the closed-form SQL-green row for ``superstep.onion_layers``
    through the distributed peel schedule (isolated suppliers are
    not in the edge set, so no round-0 coreness-0 shift)."""
    from ..dist.blocks import symmetrize_edges
    n = tg.supplier_count(sf_dir)
    g = DistGraph.from_dataset(
        symmetrize_edges(tg.nation_path_edges(sf_dir)),
        n=n, P=8, directed=False, dedup=False)
    (layers, core), _ = ss.onion_layers(g)
    vids = np.flatnonzero(g.active_global()).astype(np.int64)
    return pa.table({"vid": pa.array(vids),
                     "layer": pa.array(layers[vids]),
                     "coreness": pa.array(core[vids])})


SQL_ONION_PATHS = """
WITH c AS (SELECT s_nationkey, count(*) AS k FROM supplier
           GROUP BY 1 HAVING count(*) > 1),
r AS (SELECT s_suppkey, s_nationkey,
             row_number() OVER (PARTITION BY s_nationkey
                                ORDER BY s_suppkey) - 1 AS i
      FROM supplier)
SELECT CAST(r.s_suppkey AS BIGINT) AS vid,
       CAST(least(r.i, c.k - 1 - r.i) + 1 AS BIGINT) AS layer,
       CAST(1 AS BIGINT) AS coreness
FROM r JOIN c USING (s_nationkey)
"""


def q_densest_cliques(sf_dir):
    """Densest-subgraph batched peel (Bahmani et al. 2012, eps=0) on
    the disjoint nation cliques: every vertex of a clique shares a
    degree, so each round peels whole nations and the level-indexed
    SQL replica runs on 25 nation rows — an exact twin of the
    distributed per-vertex schedule (identical double arithmetic:
    rho = CAST(E AS DOUBLE)/V, thr = 2.0*rho)."""
    from ..dist.blocks import symmetrize_edges
    n = tg.supplier_count(sf_dir)
    g = DistGraph.from_dataset(
        symmetrize_edges(tg.nation_clique_edges(sf_dir)),
        n=n, P=8, directed=False, dedup=False)
    best, _, _ = ss.densest_subgraph(g, eps=0.0)
    return pa.table({
        "best_density": pa.array(round6([best["density"]])),
        "best_round": pa.array([best["round"]], pa.int64()),
        "n_vertices": pa.array([best["n_vertices"]], pa.int64()),
        "n_edges": pa.array([best["n_edges"]], pa.int64()),
    })


SQL_DENSEST_CLIQUES = """
WITH RECURSIVE
peel(i, nation, k) AS (
  SELECT 0, s_nationkey, count(*) FROM supplier
  GROUP BY s_nationkey HAVING count(*) > 1
  UNION ALL
  SELECT p.i + 1, p.nation, p.k
  FROM peel p JOIN (
    SELECT i, 2.0 * (CAST(sum(k * (k - 1) / 2) AS DOUBLE) / sum(k))
             AS thr
    FROM peel GROUP BY i) t ON t.i = p.i
  WHERE p.k - 1 > t.thr
),
lvl AS (SELECT i, CAST(sum(k * (k - 1) / 2) AS BIGINT) AS e,
               CAST(sum(k) AS BIGINT) AS v
        FROM peel GROUP BY i)
SELECT round(CAST(e AS DOUBLE) / v, 6) AS best_density,
       CAST(i AS BIGINT) AS best_round,
       v AS n_vertices, e AS n_edges
FROM lvl ORDER BY CAST(e AS DOUBLE) / v DESC, i ASC LIMIT 1
"""


def q_dag_depth_items(sf_dir):
    """Critical-path depth of the item-sequence graph: SCC labels
    (FW-BW kernel), condense edges to labels (vectorised broadcast
    relabel, partition-local dedup in the block build), then the
    integer max-plus ``dag_longest_path`` kernel on the condensation
    DAG — every vertex reports the longest condensed path (in edges)
    ending at its SCC. The recursive-CTE oracle enumerates (vertex,
    path-length) pairs on the same DAG; UNION dedup bounds it by
    V x depth rows."""
    import ray

    gf = _item_seq_distgraph(sf_dir)
    gb = _item_seq_rev_distgraph(sf_dir)
    lab, _ = ss.scc(gf, gb)
    lab_ref = ray.put(lab)

    def relabel(t: pa.Table) -> pa.Table:
        lb = ray.get(lab_ref)
        a = lb[t["src"].to_numpy(zero_copy_only=False)]
        b = lb[t["dst"].to_numpy(zero_copy_only=False)]
        keep = a != b
        return pa.table({"src": pa.array(a[keep].astype(np.int64)),
                         "dst": pa.array(b[keep].astype(np.int64))})

    import tempfile
    cond = rd.read_parquet(gf._item_seq_spill, columns=["src", "dst"]) \
        .map_batches(relabel, batch_format="pyarrow",
                     zero_copy_batch=True)
    g2 = DistGraph.from_dataset(
        cond, n=gf.n, P=8, directed=True, dedup=True,
        spill_dir=tempfile.mkdtemp(prefix="lray_dagdepth_"))
    depth, _ = ss.dag_longest_path(g2)
    vids = np.flatnonzero(gf.active_global()).astype(np.int64)
    return pa.table({"vid": pa.array(vids),
                     "depth": pa.array(depth[lab[vids]])})


SQL_DAG_DEPTH_ITEMS = """
WITH RECURSIVE
seq AS (SELECT l_partkey AS a,
               lead(l_partkey) OVER (PARTITION BY l_orderkey
                                     ORDER BY l_linenumber, l_partkey) AS b
        FROM lineitem),
e AS (SELECT DISTINCT a, b FROM seq WHERE b IS NOT NULL),
verts AS (SELECT a AS v FROM e UNION SELECT b FROM e),
reach(s, t) AS (
  SELECT a, b FROM e
  UNION
  SELECT r.s, e.b FROM reach r JOIN e ON e.a = r.t
),
mutual AS (SELECT r1.s AS v, r1.t AS u
           FROM reach r1 JOIN reach r2 ON r1.s = r2.t AND r1.t = r2.s),
lab AS (SELECT vv.v AS v,
               least(vv.v, coalesce(min(m.u), vv.v)) AS l
        FROM verts vv LEFT JOIN mutual m ON m.v = vv.v
        GROUP BY vv.v),
ec AS (SELECT DISTINCT la.l AS a, lb.l AS b
       FROM e JOIN lab la ON la.v = e.a JOIN lab lb ON lb.v = e.b
       WHERE la.l <> lb.l),
cverts AS (SELECT DISTINCT l AS v FROM lab),
paths(v, d) AS (
  SELECT v, 0 FROM cverts
  UNION
  SELECT ec.b, p.d + 1 FROM paths p JOIN ec ON ec.a = p.v
),
depth AS (SELECT v, max(d) AS d FROM paths GROUP BY v)
SELECT CAST(lab.v AS BIGINT) AS vid, CAST(depth.d AS BIGINT) AS depth
FROM lab JOIN depth ON depth.v = lab.l
"""


WALK_SEEDS = 8
WALK_LEN = 8


def q_random_walks(sf_dir):
    """Deterministic random walks over the directed item-sequence
    graph (node2vec-style corpus prep): 8 walks of length 8 from the
    8 smallest active vids; each step is the out-neighbour minimising
    (walk_hash(w, s, u), u) — the BSP frontier kernel
    ``superstep.random_walks`` over Dataset-built CSR blocks."""
    g = _item_seq_distgraph(sf_dir)
    act = np.flatnonzero(g.active_global())
    seeds = act[:WALK_SEEDS].astype(np.int64)
    w, s, v = ss.random_walks(g, seeds, length=WALK_LEN)
    return pa.table({"walk_id": pa.array(w), "step": pa.array(s),
                     "vid": pa.array(v)})


SQL_RANDOM_WALKS = f"""
WITH RECURSIVE
seq AS (SELECT l_partkey AS a,
               lead(l_partkey) OVER (PARTITION BY l_orderkey
                                     ORDER BY l_linenumber, l_partkey) AS b
        FROM lineitem),
e AS (SELECT DISTINCT a, b FROM seq WHERE b IS NOT NULL),
-- UNION ALL + DISTINCT: a bare UNION CTE mis-executes under
-- WITH RECURSIVE in DuckDB 1.0.0 (returns duplicated first value)
verts AS (SELECT DISTINCT v FROM
          (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)),
seeds AS (SELECT v FROM verts ORDER BY v LIMIT {WALK_SEEDS}),
walk(w, s, cur) AS (
  SELECT v, 0, v FROM seeds
  UNION ALL
  SELECT w, s + 1,
         (SELECT eb.b FROM e eb WHERE eb.a = walk.cur
          ORDER BY ((walk.w % 1000003) * 7919
                    + ((walk.s + 1) % 1000003) * 104729
                    + (eb.b % 1000003) * 15485863) % 1000003, eb.b
          LIMIT 1)
  FROM walk
  WHERE s < {WALK_LEN}
    AND EXISTS (SELECT 1 FROM e eb WHERE eb.a = walk.cur)
)
SELECT w AS walk_id, s AS step, cur AS vid FROM walk
"""


EFFDIAM_SEEDS = 8
EFFDIAM_Q = 0.9
_EFFDIAM_SQL_DEPTH = 100   # >= observed BFS depth at the gate scales


def q_effective_diameter_items(sf_dir):
    """Effective diameter (ANF-style, Palmer/Gibbons/Faloutsos 2002):
    the smallest hop distance d such that >= 90% of the reachable
    (seed, vertex) pairs — seeds = the EFFDIAM_SEEDS smallest active
    vids, self-pairs at distance 0 included — are within d. One
    ``multi_bfs`` plane run (k distance rows per partition, messages
    pre-aggregated by destination); the driver reduces the k x n
    matrix to a single row."""
    g = _item_seq_distgraph(sf_dir)
    act = np.flatnonzero(g.active_global())
    seeds = act[:EFFDIAM_SEEDS].astype(np.int64)
    dist, _ = ss.multi_bfs(g, seeds)
    INF = np.iinfo(np.int64).max
    fin = np.sort(dist[dist < INF])
    thr = int(np.ceil(EFFDIAM_Q * len(fin)))
    return pa.table({
        "n_reach": pa.array([len(fin)], pa.int64()),
        "eff_diameter": pa.array([int(fin[thr - 1])], pa.int64()),
    })


SQL_EFFECTIVE_DIAMETER_ITEMS = f"""
WITH RECURSIVE
seq AS (SELECT l_partkey AS a,
               lead(l_partkey) OVER (PARTITION BY l_orderkey
                                     ORDER BY l_linenumber, l_partkey) AS b
        FROM lineitem),
e AS (SELECT DISTINCT a, b FROM seq WHERE b IS NOT NULL),
verts AS (SELECT DISTINCT v FROM
          (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)),
seeds AS (SELECT v FROM verts ORDER BY v LIMIT {EFFDIAM_SEEDS}),
bfs(s, v, d) AS (
  SELECT v, v, 0 FROM seeds
  UNION
  SELECT bfs.s, e.b, bfs.d + 1 FROM bfs JOIN e ON e.a = bfs.v
  WHERE bfs.d < {_EFFDIAM_SQL_DEPTH}
),
dmin AS (SELECT s, v, min(d) AS d FROM bfs GROUP BY s, v),
tot AS (SELECT count(*) AS c FROM dmin),
run AS (SELECT d, sum(count(*)) OVER (ORDER BY d) AS cum
        FROM dmin GROUP BY d)
SELECT (SELECT CAST(c AS BIGINT) FROM tot) AS n_reach,
       (SELECT CAST(min(d) AS BIGINT) FROM run
        WHERE cum >= ceil({EFFDIAM_Q} * (SELECT c FROM tot)))
       AS eff_diameter
"""


N2V_MR, N2V_MC, N2V_MF = 3, 2, 1   # return / common / far multiplicities


def q_node2vec_walks(sf_dir):
    """Second-order node2vec walks (Grover & Leskovec 2016) over the
    directed item-sequence graph: integer class multiplicities
    (return=3, common-neighbour=2, far=1) stand in for 1/p, 1, 1/q,
    and the draw is the deterministic weighted-multiset hash min —
    the full bias logic (predecessor-adjacency classification) runs
    through the two-round BSP kernel ``superstep.node2vec_walks``."""
    g = _item_seq_distgraph(sf_dir)
    act = np.flatnonzero(g.active_global())
    seeds = act[:WALK_SEEDS].astype(np.int64)
    w, s, v = ss.node2vec_walks(g, seeds, length=WALK_LEN,
                                mult_return=N2V_MR,
                                mult_common=N2V_MC, mult_far=N2V_MF)
    return pa.table({"walk_id": pa.array(w), "step": pa.array(s),
                     "vid": pa.array(v)})


SQL_NODE2VEC_WALKS = f"""
WITH RECURSIVE
seq AS (SELECT l_partkey AS a,
               lead(l_partkey) OVER (PARTITION BY l_orderkey
                                     ORDER BY l_linenumber, l_partkey) AS b
        FROM lineitem),
e AS (SELECT DISTINCT a, b FROM seq WHERE b IS NOT NULL),
verts AS (SELECT DISTINCT v FROM
          (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)),
seeds AS (SELECT v FROM verts ORDER BY v LIMIT {WALK_SEEDS}),
walk(w, s, prev, cur) AS (
  SELECT v, 0, CAST(-1 AS BIGINT), v FROM seeds
  UNION ALL
  SELECT w, s + 1, walk.cur,
         (SELECT eb.b FROM e eb WHERE eb.a = walk.cur
          ORDER BY
            (SELECT min(((walk.w % 1000003) * 7919
                         + ((walk.s + 1) % 1000003) * 104729
                         + (eb.b % 1000003) * 15485863
                         + rr.r * 32452843) % 1000003)
             FROM (VALUES (0), (1), (2), (3)) rr(r)
             WHERE rr.r < CASE
                 WHEN walk.prev < 0 THEN 1
                 WHEN eb.b = walk.prev THEN {N2V_MR}
                 WHEN EXISTS (SELECT 1 FROM e e2
                              WHERE e2.a = walk.prev
                                AND e2.b = eb.b) THEN {N2V_MC}
                 ELSE {N2V_MF} END),
            eb.b
          LIMIT 1)
  FROM walk
  WHERE s < {WALK_LEN}
    AND EXISTS (SELECT 1 FROM e eb WHERE eb.a = walk.cur)
)
SELECT w AS walk_id, s AS step, cur AS vid FROM walk
"""


def _leiden_co_dataset(sf_dir, quality, gamma):
    """Dataset-native Leiden on the co graph: the edge Dataset spills
    to partitioned parquet and each shard actor loads only its own
    partition — the driver never materialises the edge list (the
    100-TB path; VERDICT r1 #3). Vids are the raw part keys (the id
    space is dense enough); output rows cover the actual vertex set
    (degree > 0) with the dense size-desc renumber over it."""
    edges = tg.co_edge_rows(sf_dir)
    n = int(rd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_partkey"]).max("p_partkey")) + 1
    dl = DistLeiden.from_dataset(edges, n=n, directed=False,
                                 quality=quality,
                                 resolution_parameter=gamma, P=8,
                                 seed=42)
    mem, q, info = dl.run()
    vids = dl.active_vids()
    return pa.table({"vid": pa.array(vids),
                     "comm": pa.array(_renumber_dense(mem[vids],
                                                      len(vids)))})


def q_leiden_cpm_co(sf_dir):
    return _leiden_co_dataset(sf_dir, "cpm", 0.5)


def q_leiden_multiplex(sf_dir):
    """Multiplex Leiden over two layers on the shared part vertex set:
    layer 1 = order co-occurrence (weight = pair count), layer 2 =
    same-brand cliques (weight 1), lambda = [1, 0.2]. Exercises
    find_partition_multiplex (reference functions.py:95-176) on real
    tables. Rows-only check; multiplex semantics pinned by tests."""
    from ..functions_api import find_partition_multiplex
    from ..graph import Graph as G
    from ..partition import CPMVertexPartition as CPM

    a, b, w = tg.co_edge_arrays(sf_dir)
    vids, s, d = _compact(a, b)
    n = len(vids)
    g1 = G(n, src=s, dst=d, weights=w)

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand"]).to_pandas()
    key2pos = {int(k): i for i, k in enumerate(vids)}
    bs, bd = [], []
    for _, grp in part.groupby("p_brand"):
        ks = [key2pos[int(k)] for k in grp["p_partkey"]
              if int(k) in key2pos]
        ks.sort()
        # same-brand star (not full clique: keeps the layer sparse and
        # deterministic) rooted at the smallest member
        bs += [ks[0]] * (len(ks) - 1)
        bd += ks[1:]
    g2 = G(n, src=np.asarray(bs, dtype=np.int64),
           dst=np.asarray(bd, dtype=np.int64))
    mem, imp = find_partition_multiplex(
        [g1, g2], CPM, layer_weights=[1.0, 0.2],
        resolution_parameter=0.5, seed=42)
    return pa.table({"vid": pa.array(vids),
                     "comm": pa.array(np.asarray(mem, dtype=np.int64))})


def q_resolution_profile_co(sf_dir):
    """Resolution profile (recursive bisection on gamma) for CPM over
    an induced subgraph of the co-occurrence graph (first 300 vertices
    — the profile runs a full optimisation per probed gamma).
    Output: one row per profile breakpoint (resolution, n_communities,
    bisect_value). Non-SQL-expressible -> rows-only check; endpoint
    behaviour pinned by tests."""
    from ..graph import Graph as G
    from ..optimiser import Optimiser
    from ..partition import CPMVertexPartition as CPM

    a, b, w = tg.co_edge_arrays(sf_dir)
    vids, s, d = _compact(a, b)
    keep = (s < 150) & (d < 150)
    g = G(150, src=s[keep], dst=d[keep], weights=w[keep])
    opt = Optimiser()
    opt.set_rng_seed(42)
    profile = opt.resolution_profile(g, CPM, resolution_range=(0.05, 2),
                                     min_diff_bisect_value=25,
                                     min_diff_resolution=0.02)
    return pa.table({
        "resolution": pa.array([round(p.resolution_parameter, 8)
                                for p in profile]),
        "n_communities": pa.array([int(p.n_communities())
                                   for p in profile], pa.int64()),
        "bisect_value": pa.array([round(p.bisect_value(), 6)
                                  for p in profile]),
    })


def _renumber_dense(mem, n):
    """The engine's renumber contract (reference
    ``VertexPartition.py`` renumber: size desc, min-vid tiebreak),
    recomputed defensively so planted-oracle queries pin it exactly."""
    mem = np.asarray(mem, dtype=np.int64)
    ulab, uinv = np.unique(mem, return_inverse=True)
    counts = np.bincount(uinv)
    first_v = np.full(len(ulab), np.iinfo(np.int64).max)
    np.minimum.at(first_v, uinv, np.arange(n))
    order = np.lexsort((first_v, -counts))
    rank = np.empty(len(ulab), dtype=np.int64)
    rank[order] = np.arange(len(ulab))
    return rank[uinv]


def _planted_edges(ds):
    df = ds.to_pandas()  # planted verification graph: small by design
    if len(df) == 0 or "src" not in df.columns:
        z = np.empty(0, np.int64)
        return z, z.copy(), np.empty(0, np.float64)
    return (df["src"].to_numpy(np.int64), df["dst"].to_numpy(np.int64),
            df["weight"].to_numpy(np.float64))


# Shared closed-form oracle: at the chosen gammas the unique optimum is
# one community per nation; community ids follow the engine's renumber
# contract (size desc, min member vid asc, dense from 0).
SQL_LEIDEN_NATIONS = """
WITH sz AS (SELECT s_nationkey, count(*) AS cnt, min(s_suppkey) AS mv
            FROM supplier GROUP BY s_nationkey),
r AS (SELECT s_nationkey,
             CAST(dense_rank() OVER (ORDER BY cnt DESC, mv ASC)
                  AS BIGINT) - 1 AS comm
      FROM sz)
SELECT CAST(s.s_suppkey AS BIGINT) AS vid, r.comm AS comm
FROM supplier s JOIN r ON s.s_nationkey = r.s_nationkey
"""


def q_leiden_cpm_cliques(sf_dir):
    """Distributed Leiden, CPM gamma=0.5, on disjoint per-nation
    cliques: the unique optimum is one community per clique (every
    subset S of a clique scores e(S) - 0.5*|S|(|S|-1)/2 =
    0.5*|S|(|S|-1)/2, strictly superadditive), so the driver verifies
    the full distributed schedule against a closed-form SQL oracle
    (reference ``tests/test_Optimiser.py:12-18``)."""
    s, d, w = _planted_edges(tg.nation_clique_edges(sf_dir))
    n = tg.supplier_count(sf_dir)
    dl = DistLeiden(s, d, weight=w, n=n, directed=False, quality="cpm",
                    resolution_parameter=0.5, P=8, seed=42)
    mem, q, info = dl.run()
    return pa.table({"vid": pa.array(np.arange(n, dtype=np.int64)),
                     "comm": pa.array(_renumber_dense(mem, n))})


def q_leiden_warm_cliques(sf_dir):
    """Incremental (warm-started) distributed Leiden: start from a
    deliberately stale prior — nations merged pairwise, the shape a
    yesterday's-communities seed has after graph updates — and verify
    the schedule still reaches the closed-form optimum (one community
    per nation-clique). Exercises the split path end to end: level-0
    local move cannot peel a clique vertex out of a merged community,
    so the fix must come from refinement re-validating communities
    from singletons + the aggregate-level move separating the
    disconnected parts (reference Optimiser.py aggregate-on-refined /
    seed-from-unrefined schedule)."""
    s, d, w = _planted_edges(tg.nation_clique_edges(sf_dir))
    n = tg.supplier_count(sf_dir)
    su = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sk = su["s_suppkey"].to_numpy(np.int64)
    nk = su["s_nationkey"].to_numpy(np.int64)
    warm = np.arange(n, dtype=np.int64)
    # merge nations pairwise, but only vertices that have edges
    # (suppliers of >=2-supplier nations); edgeless vertices hold no
    # incidence rows in any shard so no move can ever peel them back
    counts = np.bincount(nk, minlength=int(nk.max()) + 1)
    active = counts[nk] >= 2
    warm[sk[active]] = n + nk[active] // 2
    dl = DistLeiden(s, d, weight=w, n=n, directed=False, quality="cpm",
                    resolution_parameter=0.5, P=8, seed=42)
    mem, q, info = dl.run(initial_membership=warm)
    return pa.table({"vid": pa.array(np.arange(n, dtype=np.int64)),
                     "comm": pa.array(_renumber_dense(mem, n))})


def q_leiden_negweight_bipartite(sf_dir):
    """Distributed Leiden with ``consider_comms="all"`` (ALL_COMMS) on
    the full 25+25 bipartite graph with edge weight -0.1, CPM
    gamma=-0.1 — the negative-weight fixture of reference
    ``tests/test_Optimiser.py:167-175`` through the SHARD schedule.
    Same-side vertices share no edge, so only the all-communities
    candidate set can merge a side; a mixed community (a, b) scores
    exactly the sum of its pure parts (-0.1ab + 0.05(a+b)(a+b-1) =
    0.05(a^2-a) + 0.05(b^2-b)), so cross merges are quality-neutral
    and never taken (> eps gate) while same-side merges strictly
    improve — every schedule reaches the two pure sides from
    singletons. Renumber contract: equal sizes, min-vid asc -> side A
    (vid 0) is community 0."""
    s, d, w = _planted_edges(tg.nation_bipartite_edges(sf_dir))
    n = 50
    dl = DistLeiden(s, d, weight=w, n=n, directed=False, quality="cpm",
                    resolution_parameter=-0.1, P=8, seed=42,
                    consider_comms="all")
    mem, q, info = dl.run()
    side = np.arange(n) < 25
    if len(set(mem[side])) != 1 or len(set(mem[~side])) != 1 \
            or mem[0] == mem[n - 1]:
        raise AssertionError(
            "negative-weight bipartite fixed point is not the two "
            f"pure sides: {np.bincount(_renumber_dense(mem, n))}")
    return pa.table({"vid": pa.array(np.arange(n, dtype=np.int64)),
                     "comm": pa.array(_renumber_dense(mem, n))})


SQL_LEIDEN_NEGWEIGHT_BIPARTITE = """
SELECT CAST(n_nationkey AS BIGINT) AS vid, CAST(0 AS BIGINT) AS comm
FROM nation
UNION ALL
SELECT CAST(n_nationkey AS BIGINT) + 25, CAST(1 AS BIGINT)
FROM nation
"""


def q_leiden_bipartite_cliques(sf_dir):
    """Distributed ``CPMVertexPartition.Bipartite`` (3 CPM layers,
    class-masked node sizes, layer weights [1,-1,-1]; reference
    ``VertexPartition.py:950-1105``) through the shard kernel, on one
    complete bipartite block per nation (side A = s_suppkey, side B =
    n + s_suppkey). With gamma_0 = gamma_1 = 0 the objective is
    w_in - gamma_01 * (#cross-side pairs), so the unique optimum is
    one community per nation block (a^2 edges vs a^2 cross pairs at
    gamma_01 = 0.5: merging blocks adds 2*a1*a2 penalised pairs with
    no edges, splitting loses edges). Comm ids follow the renumber
    contract with sizes 2*|nation| and min member vid = the nation's
    min s_suppkey."""
    s, d, w = _planted_edges(tg.nation_bipartite_clique_edges(sf_dir))
    n = tg.supplier_count(sf_dir)
    types = np.r_[np.zeros(n, np.int64), np.ones(n, np.int64)]
    dl = DistLeiden.bipartite(s, d, types=types, weight=w, n=2 * n,
                              resolution_parameter_01=0.5, P=8,
                              seed=42)
    mem, q, info = dl.run()
    return pa.table({"vid": pa.array(np.arange(2 * n,
                                               dtype=np.int64)),
                     "comm": pa.array(_renumber_dense(mem, 2 * n))})


SQL_LEIDEN_BIPARTITE_NATIONS = """
WITH sz AS (SELECT s_nationkey, count(*) AS cnt, min(s_suppkey) AS mv
            FROM supplier GROUP BY s_nationkey),
r AS (SELECT s_nationkey,
             CAST(dense_rank() OVER (ORDER BY cnt DESC, mv ASC)
                  AS BIGINT) - 1 AS comm
      FROM sz),
n AS (SELECT count(*) AS n FROM supplier)
SELECT CAST(s.s_suppkey AS BIGINT) AS vid, r.comm AS comm
FROM supplier s JOIN r ON s.s_nationkey = r.s_nationkey
UNION ALL
SELECT CAST(s.s_suppkey AS BIGINT) + n.n, r.comm
FROM supplier s JOIN r ON s.s_nationkey = r.s_nationkey, n
"""


def q_leiden_modularity_cliques(sf_dir):
    """Distributed Leiden, Modularity, same planted cliques: merging
    disconnected communities always decreases modularity and splitting
    a small clique loses internal weight, so the optimum is again one
    community per nation."""
    s, d, w = _planted_edges(tg.nation_clique_edges(sf_dir))
    n = tg.supplier_count(sf_dir)
    dl = DistLeiden(s, d, weight=w, n=n, directed=False,
                    quality="modularity", P=8, seed=42)
    mem, q, info = dl.run()
    return pa.table({"vid": pa.array(np.arange(n, dtype=np.int64)),
                     "comm": pa.array(_renumber_dense(mem, n))})


def q_leiden_surprise_cliques(sf_dir):
    """Distributed Leiden, Surprise quality, on the planted cliques:
    the nonlinear combine runs distributed via the global-term-vector
    delta (quality.SurpriseQuality.combine_many; reference
    ``VertexPartition.py:470-492``); on disjoint cliques the optimum
    is one community per clique (maximal internal density), same SQL
    oracle."""
    s, d, w = _planted_edges(tg.nation_clique_edges(sf_dir))
    n = tg.supplier_count(sf_dir)
    dl = DistLeiden(s, d, weight=w, n=n, directed=False,
                    quality="surprise", P=8, seed=42)
    mem, q, info = dl.run()
    return pa.table({"vid": pa.array(np.arange(n, dtype=np.int64)),
                     "comm": pa.array(_renumber_dense(mem, n))})


def q_leiden_significance_cliques(sf_dir):
    """Distributed Leiden, Significance quality (unweighted-only —
    reference ``VertexPartition.py:554,580``; the planted cliques are
    weight-1), same closed-form optimum: one community per clique.
    With this row every one of the six quality functions is
    driver-SQL-verified through the distributed schedule."""
    s, d, w = _planted_edges(tg.nation_clique_edges(sf_dir))
    n = tg.supplier_count(sf_dir)
    dl = DistLeiden(s, d, weight=None, n=n, directed=False,
                    quality="significance", P=8, seed=42)
    mem, q, info = dl.run()
    return pa.table({"vid": pa.array(np.arange(n, dtype=np.int64)),
                     "comm": pa.array(_renumber_dense(mem, n))})


def _leiden_planted_cliques(sf_dir, quality, gamma, weighted=True):
    s, d, w = _planted_edges(tg.nation_clique_edges(sf_dir))
    n = tg.supplier_count(sf_dir)
    dl = DistLeiden(s, d, weight=(w if weighted else None), n=n,
                    directed=False, quality=quality,
                    resolution_parameter=gamma, P=8, seed=42)
    mem, q, info = dl.run()
    return pa.table({"vid": pa.array(np.arange(n, dtype=np.int64)),
                     "comm": pa.array(_renumber_dense(mem, n))})


def q_leiden_rbconfig_cliques(sf_dir):
    """Distributed Leiden, RBConfiguration gamma=1 (== modularity up
    to scale — reference ``VertexPartition.py:794-796``), planted
    cliques, same closed-form optimum."""
    return _leiden_planted_cliques(sf_dir, "rb_configuration", 1.0)


def q_leiden_rber_cliques(sf_dir):
    """Distributed Leiden, RBER gamma=1 (Erdos-Renyi null — reference
    ``VertexPartition.py:680-698``), planted cliques, same closed-form
    optimum."""
    return _leiden_planted_cliques(sf_dir, "rber", 1.0)


def q_leiden_temporal_cliques(sf_dir):
    """find_partition_temporal (reference ``functions.py:178-306``)
    over two identical clique time-slices with interslice coupling
    weight 1, CPM gamma=0.5: the coupled optimum is one community per
    nation SPANNING both slices, so each slice's membership equals the
    nation grouping — the temporal entry point's driver-SQL row."""
    from ..functions_api import find_partition_temporal
    from ..graph import Graph as G
    from ..partition import CPMVertexPartition as CPM

    s, d, w = _planted_edges(tg.nation_clique_edges(sf_dir))
    n = tg.supplier_count(sf_dir)
    g = G(n, src=s, dst=d, weights=w)
    mems, imp = find_partition_temporal(
        [g, g], CPM, interslice_weight=1.0,
        resolution_parameter=0.5, seed=42)
    cat = np.concatenate([np.asarray(m) for m in mems])
    comm = _renumber_dense(cat, 2 * n)
    vids = np.arange(n, dtype=np.int64)
    return pa.table({
        "slice": pa.array(np.repeat(np.array([0, 1], np.int64), n)),
        "vid": pa.array(np.concatenate([vids, vids])),
        "comm": pa.array(comm),
    })


SQL_LEIDEN_TEMPORAL = """
WITH sz AS (SELECT s_nationkey, count(*) AS cnt, min(s_suppkey) AS mv
            FROM supplier GROUP BY s_nationkey),
r AS (SELECT s_nationkey,
             CAST(dense_rank() OVER (ORDER BY cnt DESC, mv ASC)
                  AS BIGINT) - 1 AS comm
      FROM sz)
SELECT CAST(sl.s AS BIGINT) AS slice,
       CAST(s.s_suppkey AS BIGINT) AS vid, r.comm AS comm
FROM supplier s
JOIN r ON s.s_nationkey = r.s_nationkey
CROSS JOIN (SELECT 0 AS s UNION ALL SELECT 1) sl
"""


def q_leiden_cpm_stars(sf_dir):
    """Distributed Leiden, CPM at gamma->0 (0.001), on disjoint
    per-nation stars: the optimum is the connected components, i.e.
    the nations (reference ``tests/test_Optimiser.py:96-103`` — CPM at
    gamma below the component-density threshold IS connected
    components). Splitting off j leaves cuts j unit edges while saving
    only gamma*j*(k-j) < j for gamma < 1/k; merging two stars costs
    gamma*kA*kB > 0. Stars (unlike rings/paths) have no partial-split
    node-optimal traps: every leaf is hub-adjacent, so greedy local
    moves reach the unique optimum."""
    s, d, w = _planted_edges(tg.nation_star_edges(sf_dir))
    n = tg.supplier_count(sf_dir)
    dl = DistLeiden(s, d, weight=w, n=n, directed=False, quality="cpm",
                    resolution_parameter=0.001, P=8, seed=42)
    mem, q, info = dl.run()
    return pa.table({"vid": pa.array(np.arange(n, dtype=np.int64)),
                     "comm": pa.array(_renumber_dense(mem, n))})


def q_leiden_multiplex_cliques(sf_dir):
    """find_partition_multiplex (reference ``functions.py:95-176``)
    over two layers on the supplier vertex set — clique layer + ring
    layer, lambda=[1, 0.5], CPM gamma=0.5. Any community S inside a
    nation scores 1*(pairs(S) - 0.5*pairs(S)) + 0.5*(e_ring(S) -
    0.5*pairs(S)) = 0.25*pairs(S) + 0.5*e_ring(S) — strictly
    superadditive in S (pairs is), so the unique optimum is one
    community per nation and the same SQL oracle applies; the dominant
    clique term keeps every vertex adjacent to its whole community, so
    greedy local moves reach it (lambda=[1,1] would cancel the clique
    term exactly and leave the trap-prone pure-ring landscape)."""
    from ..functions_api import find_partition_multiplex
    from ..graph import Graph as G
    from ..partition import CPMVertexPartition as CPM

    n = tg.supplier_count(sf_dir)
    cs, cd, cw = _planted_edges(tg.nation_clique_edges(sf_dir))
    rs, rd_, rw = _planted_edges(tg.nation_ring_edges(sf_dir))
    g1 = G(n, src=cs, dst=cd, weights=cw)
    g2 = G(n, src=rs, dst=rd_, weights=rw)
    mem, imp = find_partition_multiplex(
        [g1, g2], CPM, layer_weights=[1.0, 0.5],
        resolution_parameter=0.5, seed=42)
    return pa.table({"vid": pa.array(np.arange(n, dtype=np.int64)),
                     "comm": pa.array(_renumber_dense(mem, n))})


def q_leiden_multiplex_dataset_cliques(sf_dir):
    """The DISTRIBUTED multiplex schedule (DistLeiden with a layer
    column: per-layer shard stats, lambda_k-weighted propose deltas,
    multiplex refinement + per-layer aggregation) on the same planted
    two-layer instance as ``leiden_multiplex_cliques`` — clique layer
    + ring layer on the supplier vertex set, lambda=[1, 0.5], CPM
    gamma=0.5, unique optimum one community per nation (see that
    query's proof). Routed through edge DATASETS ->
    ``find_partition_multiplex_dataset`` (reference
    ``functions.py:95-176`` + ``Optimiser.py:357-461``), so the
    >node-memory multiplex path carries its own driver-SQL row."""
    from ..functions_api import find_partition_multiplex_dataset

    n = tg.supplier_count(sf_dir)
    cs, cd, cw = _planted_edges(tg.nation_clique_edges(sf_dir))
    rs, rd_, rw = _planted_edges(tg.nation_ring_edges(sf_dir))
    ds1 = rd.from_arrow(pa.table({
        "src": pa.array(cs), "dst": pa.array(cd),
        "weight": pa.array(cw.astype(np.float64))}))
    ds2 = rd.from_arrow(pa.table({
        "src": pa.array(rs), "dst": pa.array(rd_),
        "weight": pa.array(rw.astype(np.float64))}))
    mem, q, info, _ = find_partition_multiplex_dataset(
        [ds1, ds2], n=n, quality="cpm", resolution_parameter=0.5,
        layer_weights=[1.0, 0.5], P=8, seed=42)
    return pa.table({"vid": pa.array(np.arange(n, dtype=np.int64)),
                     "comm": pa.array(_renumber_dense(mem, n))})


def q_leiden_temporal_dataset_cliques(sf_dir):
    """The DISTRIBUTED temporal schedule on the same planted instance
    as ``leiden_temporal_cliques``: two identical clique time-slices
    as edge DATASETS, path-coupled (interslice weight 1, CPM gamma=0
    coupling layer with zero node sizes — reference
    ``functions.py:337-364,517-526``), CPM gamma=0.5 slice layers.
    The coupled optimum is one community per nation spanning both
    slices, so the same closed-form SQL oracle verifies the
    >node-memory temporal path end to end."""
    from ..functions_api import find_partition_temporal_dataset

    s, d, w = _planted_edges(tg.nation_clique_edges(sf_dir))
    n = tg.supplier_count(sf_dir)
    ds = rd.from_arrow(pa.table({
        "src": pa.array(s), "dst": pa.array(d),
        "weight": pa.array(w.astype(np.float64))}))
    mems, q, info = find_partition_temporal_dataset(
        [ds, ds], n_nodes=n, quality="cpm", resolution_parameter=0.5,
        interslice_weight=1.0, P=8, seed=42)
    comm = _renumber_dense(mems.reshape(-1), 2 * n)
    vids = np.arange(n, dtype=np.int64)
    return pa.table({
        "slice": pa.array(np.repeat(np.array([0, 1], np.int64), n)),
        "vid": pa.array(np.concatenate([vids, vids])),
        "comm": pa.array(comm),
    })


def q_leiden_fixed_cliques(sf_dir):
    """``is_membership_fixed`` through the DISTRIBUTED schedule
    (reference ``python_optimiser_interface.cpp:77-97`` + property
    ``test_Optimiser.py:145-164``): the minimum supplier of every
    >=2-supplier nation is frozen at the distinctive label
    ``n + nationkey`` (all other vertices seeded singleton). CPM
    gamma=0.5 on the nation cliques has the unique optimum one
    community per clique, so every clique must coalesce around its
    frozen anchor and inherit its label; edgeless suppliers
    (1-supplier nations) stay singleton and take the engine's
    collision-free non-fixed label ``2n + vid``. Closed-form, so the
    fixed-membership knob carries its own driver-SQL row."""
    s, d, w = _planted_edges(tg.nation_clique_edges(sf_dir))
    n = tg.supplier_count(sf_dir)
    su = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"]) \
        .to_pandas()
    sk = su["s_suppkey"].to_numpy(np.int64)
    nk = su["s_nationkey"].to_numpy(np.int64)
    nnat = int(nk.max()) + 1
    counts = np.bincount(nk, minlength=nnat)
    minv = np.full(nnat, np.iinfo(np.int64).max)
    np.minimum.at(minv, nk, sk)
    seed = np.arange(n, dtype=np.int64)
    fixed = np.zeros(n, dtype=bool)
    for nat in np.flatnonzero(counts >= 2):
        seed[minv[nat]] = n + nat
        fixed[minv[nat]] = True
    dl = DistLeiden(s, d, weight=w, n=n, directed=False, quality="cpm",
                    resolution_parameter=0.5, P=8, seed=42)
    mem, q, info = dl.run(initial_membership=seed,
                          is_membership_fixed=fixed)
    return pa.table({"vid": pa.array(np.arange(n, dtype=np.int64)),
                     "comm": pa.array(mem.astype(np.int64))})


SQL_LEIDEN_FIXED = """
WITH cnt AS (SELECT s_nationkey, count(*) AS c
             FROM supplier GROUP BY 1),
nn AS (SELECT count(*) AS n FROM supplier),
anyfix AS (SELECT max(c) >= 2 AS f FROM cnt)
SELECT CAST(s.s_suppkey AS BIGINT) AS vid,
       -- no >=2-supplier nation => no anchors get frozen and the
       -- engine takes its normal renumber path (all singletons =>
       -- comm = vid); otherwise fixed communities keep n+nationkey
       -- and edgeless singletons take the engine's 2n+vid labels
       CAST(CASE WHEN NOT anyfix.f THEN s.s_suppkey
                 WHEN cnt.c >= 2 THEN nn.n + s.s_nationkey
                 ELSE 2 * nn.n + s.s_suppkey END AS BIGINT) AS comm
FROM supplier s
JOIN cnt ON cnt.s_nationkey = s.s_nationkey
CROSS JOIN nn CROSS JOIN anyfix
"""


def q_leiden_recrawl_cliques(sf_dir):
    """The canonical incremental-recrawl combination — warm start +
    frozen seed vertices — through the DISTRIBUTED schedule: yesterday's
    (deliberately stale: nations merged pairwise) communities seed the
    optimiser, each nation's min supplier is frozen at ``n +
    nationkey``, and the schedule must split the stale merges while
    anchoring every clique to its frozen vertex. Closed form: same
    output as ``leiden_fixed_cliques`` (anchored nations at
    n + nationkey, edgeless singletons at the engine's 2n + vid)."""
    s, d, w = _planted_edges(tg.nation_clique_edges(sf_dir))
    n = tg.supplier_count(sf_dir)
    su = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"]) \
        .to_pandas()
    sk = su["s_suppkey"].to_numpy(np.int64)
    nk = su["s_nationkey"].to_numpy(np.int64)
    nnat = int(nk.max()) + 1
    counts = np.bincount(nk, minlength=nnat)
    minv = np.full(nnat, np.iinfo(np.int64).max)
    np.minimum.at(minv, nk, sk)
    seed = np.arange(n, dtype=np.int64)
    fixed = np.zeros(n, dtype=bool)
    # stale warm start: nations with edges merged pairwise
    active = counts[nk] >= 2
    seed[sk[active]] = n + nk[active] // 2
    # ...but each active nation's min supplier is frozen at its own
    # distinctive label (overrides the merged seed for the anchor)
    for nat in np.flatnonzero(counts >= 2):
        seed[minv[nat]] = n + nat
        fixed[minv[nat]] = True
    dl = DistLeiden(s, d, weight=w, n=n, directed=False, quality="cpm",
                    resolution_parameter=0.5, P=8, seed=42)
    mem, q, info = dl.run(initial_membership=seed,
                          is_membership_fixed=fixed)
    return pa.table({"vid": pa.array(np.arange(n, dtype=np.int64)),
                     "comm": pa.array(mem.astype(np.int64))})


def q_leiden_minsize_complete(sf_dir):
    """``min_comm_size`` + ``community_constraint_enforcement``
    through the DISTRIBUTED schedule, on the reference's canonical
    fixture shape (``test_Optimiser.py:20-38``): the complete graph
    over the suppliers under CPM gamma=1 is move-indifferent (every
    merge delta is exactly 0 — internal weight gained equals the
    resolution penalty), so the soft min-size bonus/penalty alone
    shapes the fixed point. The landscape has MANY stuck states
    (e.g. all-size-4 communities: the +E fill bonus exactly cancels
    the -E leave penalty), so a size histogram would be
    seed/schedule-dependent. The emitted row asserts only the
    invariants that hold in EVERY fixed point of the dynamics:
    total mass = n, no community above min_comm_size (a member of a
    >min_s community always has the positive-score escape to an
    empty community: +E fill, no leave penalty), and no singleton
    coexisting with another fillable (<min_s) community (that move
    scores +E with no leave penalty). The K_n instance is a
    driver-built planted verification graph, like the other planted
    rows."""
    n = tg.supplier_count(sf_dir)
    ii, jj = np.triu_indices(n, k=1)
    dl = DistLeiden(ii.astype(np.int64), jj.astype(np.int64), n=n,
                    directed=False, quality="cpm",
                    resolution_parameter=1.0, P=8, seed=42,
                    min_comm_size=5,
                    community_constraint_enforcement=10.0)
    mem, q, info = dl.run()
    sizes = np.bincount(np.unique(mem, return_inverse=True)[1])
    min_s = 5
    n1 = int((sizes == 1).sum())
    mid_small = int(((sizes >= 2) & (sizes < min_s)).sum())
    escapable_singleton = n1 >= 2 or (n1 == 1 and mid_small > 0)
    fixed_ok = (int(sizes.max()) <= min_s) \
        and not escapable_singleton
    return pa.table({
        "total": pa.array([int(sizes.sum())], pa.int64()),
        "fixed_ok": pa.array([int(fixed_ok)], pa.int64()),
    })


SQL_LEIDEN_MINSIZE = """
SELECT CAST(count(*) AS BIGINT) AS total,
       CAST(1 AS BIGINT) AS fixed_ok
FROM supplier
"""


def q_leiden_randcomm_complete(sf_dir):
    """RAND_COMM through the DISTRIBUTED schedule (r5 — closes the
    last reference consider_comms enum gap; reference
    ``Optimiser.py:104-107``): candidates are size-proportional
    random-community draws from the driver's per-superstep broadcast
    reservoir. Planted on the complete supplier graph under CPM
    gamma=0.5, where EVERY draw of a community at least as large as
    the leaver's remainder improves quality ((1-gamma)(b-(a-1)) > 0),
    so the random schedule provably coalesces to the unique one-
    community optimum regardless of the draw sequence — a closed-form
    oracle despite the stochastic candidate set. Seeded, so the run
    is deterministic."""
    n = tg.supplier_count(sf_dir)
    ii, jj = np.triu_indices(n, k=1)
    dl = DistLeiden(ii.astype(np.int64), jj.astype(np.int64), n=n,
                    directed=False, quality="cpm",
                    resolution_parameter=0.5, P=8, seed=42,
                    consider_comms="rand")
    mem, q, info = dl.run()
    return pa.table({
        "vid": pa.array(np.arange(n, dtype=np.int64)),
        "comm": pa.array(mem.astype(np.int64)),
    })


SQL_LEIDEN_RANDCOMM = """
SELECT CAST(s_suppkey AS BIGINT) AS vid, CAST(0 AS BIGINT) AS comm
FROM supplier
"""


def q_leiden_modularity_co(sf_dir):
    return _leiden_co_dataset(sf_dir, "modularity", 1.0)


def q_resolution_profile_cliques(sf_dir):
    """Resolution profile (reference ``Optimiser.py:661-861``) on the
    planted per-nation cliques, reported as the DISTINCT
    (n_communities, bisect_value) partitions found. Every clique has
    uniform internal density 1, so over gamma in (0.05, 2) exactly two
    partitions exist — one community per nation below gamma=1
    (bisect value = sum k(k-1)/2) and singletons above (0) — making
    the profile driver-SQL-verifiable (the probe gamma sequence itself
    is bisection-internal and deliberately not part of the output)."""
    from ..graph import Graph as G
    from ..optimiser import Optimiser
    from ..partition import CPMVertexPartition as CPM

    s, d, w = _planted_edges(tg.nation_clique_edges(sf_dir))
    n = tg.supplier_count(sf_dir)
    g = G(n, src=s, dst=d, weights=w)
    opt = Optimiser()
    opt.set_rng_seed(42)
    prof = opt.resolution_profile(g, CPM, resolution_range=(0.05, 2))
    rows = sorted({(int(p.n_communities()),
                    float(round_half_away(p.bisect_value(), 6)))
                   for p in prof})
    return pa.table({
        "n_communities": pa.array([r[0] for r in rows], pa.int64()),
        "bisect_value": pa.array([r[1] for r in rows], pa.float64()),
    })


def q_resolution_profile_dataset_cliques(sf_dir):
    """The DISTRIBUTED resolution profile (``resolution_profile_dataset``
    — every bisection probe a DistLeiden run over the parquet-spilled
    edge Dataset, reference ``Optimiser.py:661-861``) on the planted
    per-nation cliques; identical closed form to
    ``resolution_profile_cliques``: exactly two distinct
    (n_communities, bisect_value) partitions over gamma in
    (0.05, 2)."""
    from ..functions_api import resolution_profile_dataset

    s, d, w = _planted_edges(tg.nation_clique_edges(sf_dir))
    n = tg.supplier_count(sf_dir)
    ds = rd.from_arrow(pa.table({
        "src": pa.array(s), "dst": pa.array(d),
        "weight": pa.array(w.astype(np.float64))}))
    prof = resolution_profile_dataset(ds, n=n, quality="cpm",
                                      resolution_range=(0.05, 2),
                                      P=8, seed=42)
    rows = sorted({(int(p.n_communities()),
                    float(round_half_away(p.bisect_value(), 6)))
                   for p in prof})
    return pa.table({
        "n_communities": pa.array([r[0] for r in rows], pa.int64()),
        "bisect_value": pa.array([r[1] for r in rows], pa.float64()),
    })


SQL_RESOLUTION_PROFILE_CLIQUES = """
WITH sz AS (SELECT s_nationkey, count(*) AS k
            FROM supplier GROUP BY s_nationkey)
SELECT DISTINCT * FROM (
  SELECT CAST((SELECT count(*) FROM sz) AS BIGINT) AS n_communities,
         CAST((SELECT sum(k * (k - 1) / 2) FROM sz) AS DOUBLE)
             AS bisect_value
  UNION ALL
  SELECT CAST(count(*) AS BIGINT), 0.0 FROM supplier
)
"""


# ======================================================================
# Text analysis
# ======================================================================
def q_token_counts(sf_dir):
    return tx.token_counts(_docs(sf_dir))


SQL_TOKEN_COUNTS = """
SELECT doc_id,
       len(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS n_tokens,
       len(list_filter(regexp_extract_all(lower(text), '[a-z0-9_]+'),
           x -> x IN ('the','and','of','a','to','is','in','it','that',
                      'for'))) AS n_stopwords,
       length(text) AS n_chars
FROM documents
"""


def q_doc_quality(sf_dir):
    return tx.quality_scores(_docs(sf_dir))


SQL_DOC_QUALITY = """
SELECT doc_id,
       len(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS n_tokens,
       round(len(list_filter(regexp_extract_all(lower(text),
                 '[a-z0-9_]+'),
             x -> x IN ('the','and','of','a','to','is','in','it','that',
                        'for')))
           / greatest(1, len(regexp_extract_all(lower(text),
                 '[a-z0-9_]+'))), 6) AS stop_ratio,
       round(length(regexp_replace(text, '[^A-Za-z0-9_ ]', '', 'g'))
           / greatest(1, length(text)), 6) AS alnum_ratio
FROM documents
"""


def q_lang_id(sf_dir):
    return tx.lang_id(_docs(sf_dir))


def _lang_score_sql(lang):
    words = ",".join(f"'{w}'" for w in tx.LANG_MARKERS[lang])
    return ("len(list_filter(regexp_extract_all(lower(text), "
            f"'[a-z0-9_]+'), x -> x IN ({words})))")


SQL_LANG_ID = f"""
SELECT doc_id,
       CASE
         WHEN {_lang_score_sql('en')} >= {_lang_score_sql('de')}
          AND {_lang_score_sql('en')} >= {_lang_score_sql('fr')}
           THEN 'en'
         WHEN {_lang_score_sql('de')} >= {_lang_score_sql('fr')}
           THEN 'de'
         ELSE 'fr'
       END AS pred_lang
FROM documents
"""


def q_fingerprint_md5(sf_dir):
    return tx.md5_fingerprints(_docs(sf_dir))


SQL_FINGERPRINT_MD5 = """
SELECT doc_id, md5(text) AS fingerprint FROM documents
"""


def q_fingerprint_rolling(sf_dir):
    return tx.rolling_fingerprint(_docs(sf_dir))


# ``hash_token`` is the first 8 bytes of md5, big-endian — exactly this
# DuckDB expression, which makes every hash-derived operator (rolling
# fingerprints, SimHash, MinHash) SQL-oracle-able.
_SQL_TOKHASH = "('0x' || substr(md5({w}), 1, 16))::UBIGINT"
_T64 = "18446744073709551616::HUGEINT"   # 2^64: numpy uint64 wrap
_M61_SQL = f"{(1 << 61) - 1}::HUGEINT"

# documents -> (doc_id, h: UBIGINT[] token hashes, n: token count),
# duplicates preserved (token-stream operators need occurrences).
_SQL_TOKEN_HASHES = f"""
toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS tk
  FROM documents
),
th AS (
  SELECT doc_id,
         [{_SQL_TOKHASH.format(w='w')} for w in tk] AS h,
         len(tk) AS n
  FROM toks
)"""

_POW257 = [257 ** k for k in range(8)]
_SQL_WINDOW8 = " + ".join(
    f"h[j+{t}]::HUGEINT*{_POW257[7 - t]}" for t in range(8))

SQL_FINGERPRINT_ROLLING = f"""
WITH {_SQL_TOKEN_HASHES}
SELECT doc_id,
  CASE WHEN len(h) = 0 THEN 0::UBIGINT
       WHEN len(h) >= 8 THEN
         (list_min([({_SQL_WINDOW8}) % {_M61_SQL}
                    for j in range(1, len(h) - 6)]))::UBIGINT
       ELSE
         (list_sum([h[t]::HUGEINT * ({_POW257}[len(h) - t + 1])
                    for t in range(1, len(h) + 1)]) % {_M61_SQL})::UBIGINT
  END AS fingerprint
FROM th
"""


# ======================================================================
# Dedup
# ======================================================================
# doc-id hash expression shared by the sampling / split oracles —
# identical to stages/pack._id_hash (md5 first 8 bytes, big-endian)
_SQL_DOC_HASH = ("('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))"
                 "::UBIGINT")


def q_doc_sample(sf_dir):
    """Deterministic ~10% corpus sample by id-hash residue."""
    from ..stages import pack as pk
    return pk.hash_sample(_docs(sf_dir, columns=("doc_id",)),
                          mod=10, keep=0)


SQL_DOC_SAMPLE = f"""
SELECT doc_id FROM documents WHERE {_SQL_DOC_HASH} % 10 = 0
"""


def q_doc_split(sf_dir):
    """Deterministic 80/10/10 train/val/test assignment by id-hash
    percentile."""
    from ..stages import pack as pk
    return pk.hash_split(_docs(sf_dir, columns=("doc_id",)))


SQL_DOC_SPLIT = f"""
SELECT doc_id,
       CASE WHEN {_SQL_DOC_HASH} % 100 < 80 THEN 'train'
            WHEN {_SQL_DOC_HASH} % 100 < 90 THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


PACK_BUDGET = 512


def q_doc_pack_chunks(sf_dir):
    """Sequence packing (greedy concat-and-cut): chunk assignment via
    a distributed prefix scan over doc_id order — per-bucket token
    totals, driver-side exclusive offsets (O(n_docs/bucket) state),
    one hash shuffle on the bucket key."""
    from ..stages import pack as pk
    return pk.pack_chunks(_docs(sf_dir), budget=PACK_BUDGET)


SQL_DOC_PACK_CHUNKS = f"""
WITH tok AS (SELECT doc_id,
                    len(regexp_extract_all(lower(text), '[a-z0-9_]+'))
                      AS n_tokens
             FROM documents),
c AS (SELECT doc_id, n_tokens,
             COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS prev
      FROM tok)
SELECT doc_id, n_tokens,
       CAST(prev // {PACK_BUDGET} AS BIGINT) AS chunk_id
FROM c
"""


VOCAB_TOP_K = 50


def q_vocab_top_terms(sf_dir):
    """Corpus vocabulary build (the BPE-ish pre-tokenization stat a
    training pipeline runs first): top-50 ``[a-z0-9]+`` tokens by
    frequency across all documents."""
    return tx.vocab_top_terms(_docs(sf_dir, columns=("text",)),
                              k=VOCAB_TOP_K)


SQL_VOCAB_TOP_TERMS = f"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
           AS term
  FROM documents),
agg AS (SELECT term, count(*) AS n FROM toks WHERE term <> ''
        GROUP BY term)
SELECT term, n FROM agg ORDER BY n DESC, term ASC LIMIT {VOCAB_TOP_K}
"""


TFIDF_K = 5


def q_tfidf_topk(sf_dir):
    """Top-5 terms per document by tf-idf: one vocab-sized df groupby
    (per-batch partials) + broadcast lookup; scoring and per-doc top-k
    stay shuffle-free because a doc is complete within its row."""
    return tx.tfidf_topk(_docs(sf_dir), k=TFIDF_K)


SQL_TFIDF_TOPK = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
           AS term
  FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       WHERE term <> '' GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n FROM documents),
scored AS (SELECT tf.doc_id, tf.term,
                  tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) AS tfidf
           FROM tf JOIN df USING (term) CROSS JOIN n),
ranked AS (SELECT doc_id, term, tfidf,
                  row_number() OVER (PARTITION BY doc_id
                                     ORDER BY tfidf DESC, term ASC)
                    AS rn
           FROM scored)
SELECT doc_id, term, round(tfidf, 6) AS tfidf
FROM ranked WHERE rn <= {TFIDF_K}
"""


BM25_TERMS = ("hash", "merge", "spark", "stream", "window")
BM25_K = 10
BM25_K1 = 1.2
BM25_B = 0.75


def q_bm25_topk(sf_dir):
    """BM25 top-10 documents for a fixed 5-term query (Robertson/
    Lucene idf). Pass 1 is a shuffle-free streaming reduction
    (n_docs, total tokens, per-term df); pass 2 scores in parallel
    with a per-batch partial top-k, so only k x n_batches rows reach
    the final sort. Ranks by the ROUNDED score (both sides) so a
    last-ulp ln() difference between numpy and DuckDB can't flip the
    k boundary."""
    return tx.bm25_topk(_docs(sf_dir), BM25_TERMS, k=BM25_K,
                        k1=BM25_K1, b=BM25_B)


SQL_BM25_TOPK = f"""
WITH q(term) AS (
  SELECT unnest({list(BM25_TERMS)!r})),
toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
           AS term
  FROM documents),
tok2 AS (SELECT * FROM toks WHERE term <> ''),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT CAST(count(*) AS DOUBLE) FROM tok2)
           / (SELECT count(*) FROM documents) AS avgdl),
dl AS (SELECT d.doc_id, count(t.term) AS dl
       FROM documents d LEFT JOIN tok2 t USING (doc_id) GROUP BY 1),
df AS (SELECT q.term, count(DISTINCT t.doc_id) AS df
       FROM q LEFT JOIN tok2 t ON t.term = q.term GROUP BY 1),
tf AS (SELECT t.doc_id, t.term, count(*) AS tf
       FROM tok2 t JOIN q USING (term) GROUP BY 1, 2),
scored AS (
  SELECT tf.doc_id,
         sum(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * ({BM25_K1} + 1)
             / (tf.tf + {BM25_K1} * (1 - {BM25_B}
                + {BM25_B} * dl.dl / stats.avgdl))) AS s
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
  CROSS JOIN stats GROUP BY 1)
SELECT doc_id, round(s, 6) AS score FROM scored
WHERE round(s, 6) > 0
ORDER BY round(s, 6) DESC, doc_id ASC LIMIT {BM25_K}
"""


SHUFFLE_SEED = 17


def q_docs_shuffle(sf_dir):
    """Seeded global training order: dense rank 0..n-1 in
    md5(seed:doc_id) order via order-compatible md5-prefix range
    buckets (one B-row count groupby + per-bucket key sort; O(B)
    driver state) — never a whole-corpus sort."""
    from ..stages import pack as pk
    return pk.global_shuffle_rank(_docs(sf_dir, columns=("doc_id",)),
                                  seed=SHUFFLE_SEED)


SQL_DOCS_SHUFFLE = f"""
SELECT doc_id,
       row_number() OVER (
         ORDER BY md5('{SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)))
         - 1 AS rank
FROM documents
"""


CDC_MOD = 16


def q_doc_cdc_chunks(sf_dir):
    """Content-defined chunking: boundaries where the 4-token gram
    hash is 0 mod 16; per-chunk (idx, token count, md5). Exact SQL
    twin via the shared md5-token-hash + base-257 polynomial CTEs."""
    return tx.cdc_chunks(_docs(sf_dir), mod=CDC_MOD)


def _sql_doc_cdc_chunks():
    """Deferred build: reuses ``_SQL_TOKEN_HASHES`` / ``_M61_SQL``
    (defined later in this module)."""
    return f"""
WITH {_SQL_TOKEN_HASHES},
g AS (SELECT doc_id,
        CASE WHEN len(h) >= 4 THEN
          [(h[j]::HUGEINT * 16974593 + h[j+1]::HUGEINT * 66049
            + h[j+2]::HUGEINT * 257 + h[j+3]::HUGEINT) % {_M61_SQL}
           FOR j IN range(1, len(h) - 2)]
        ELSE [] END AS gs
      FROM th),
bounds AS (
  SELECT doc_id, unnest([j + 3 FOR j IN range(1, len(gs) + 1)
                         IF gs[j] % {CDC_MOD} = 0]) AS be
  FROM g),
tokpos AS (
  SELECT doc_id,
         unnest([{{'i': i, 'w': tk[i]}}
                 FOR i IN range(1, len(tk) + 1)],
                recursive := true)
  FROM toks),
cid AS (SELECT tp.doc_id, tp.i, tp.w, count(b.be) AS c
        FROM tokpos tp LEFT JOIN bounds b
          ON b.doc_id = tp.doc_id AND b.be < tp.i
        GROUP BY tp.doc_id, tp.i, tp.w)
SELECT doc_id, c AS chunk_idx, CAST(count(*) AS BIGINT) AS n_tokens,
       md5(string_agg(w, ' ' ORDER BY i)) AS chunk_md5
FROM cid GROUP BY doc_id, c
"""


def q_inverted_postings(sf_dir):
    """Inverted-index posting lists for the BM25 query vocabulary:
    (term, doc_id, tf) — the index-build half of the retrieval stack
    (BM25 is the scoring half). Embarrassingly parallel: a doc's
    postings come from its own row; only matching terms are emitted,
    so the output is bounded by |q| x docs-containing-q."""
    docs = _docs(sf_dir)
    terms = sorted(BM25_TERMS)

    def postings(t: pa.Table) -> pa.Table:
        tf = tx._doc_term_tf(t)
        keep = pc.is_in(tf["term"], value_set=pa.array(terms))
        tf = tf.filter(keep)
        return pa.table({
            "term": pc.cast(tf["term"], pa.string()),
            "doc_id": pc.cast(tf["doc_id"], pa.int64()),
            "tf": pc.cast(tf["tf"], pa.int64()),
        })

    return docs.map_batches(postings, batch_format="pyarrow",
                            zero_copy_batch=True)


SQL_INVERTED_POSTINGS = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
           AS term
  FROM documents)
SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
FROM toks WHERE term IN (SELECT unnest({sorted(BM25_TERMS)!r}))
GROUP BY 1, 2
"""


PHRASE = ("slow", "hash", "batch")


def q_phrase_search(sf_dir):
    """Exact phrase search ("slow hash batch"): every (doc_id,
    token position) where the consecutive token triple matches —
    vectorised shifted equality per document row, no index, no
    shuffle."""
    docs = _docs(sf_dir)
    p0, p1, p2 = PHRASE

    def hits(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]),
                                      "[^a-z0-9]+")
        flat = toks.to_pylist()
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        out_d, out_p = [], []
        for i, ts in enumerate(flat):
            ts = [w for w in ts if w]
            a = np.asarray(ts, dtype=object)
            if len(a) < 3:
                continue
            m = (a[:-2] == p0) & (a[1:-1] == p1) & (a[2:] == p2)
            for p in np.flatnonzero(m):
                out_d.append(int(ids[i]))
                out_p.append(int(p))
        return pa.table({"doc_id": pa.array(out_d, pa.int64()),
                         "pos": pa.array(out_p, pa.int64())})

    return docs.map_batches(hits, batch_format="pyarrow",
                            zero_copy_batch=True)


SQL_PHRASE_SEARCH = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     t -> t <> '') AS ts
  FROM documents),
g AS (SELECT doc_id,
        unnest([{{'pos': j - 1,
                 'g': array_to_string(ts[j : j + 2], ' ')}}
                FOR j IN range(1, len(ts) - 1)],
               recursive := true)
      FROM toks)
SELECT doc_id, CAST(pos AS BIGINT) AS pos
FROM g WHERE g = '{' '.join(PHRASE)}'
"""


SNIPPET_W = 10


def q_snippet_windows(sf_dir):
    """Best snippet per matching document: among windows of
    SNIPPET_W tokens STARTING AT a query-term hit, the one covering
    the most query-term occurrences (ties -> smallest start). The
    start-at-a-hit restriction loses no hits (shifting a window right
    to its first hit preserves its count) and makes the oracle a
    bounded self-join over hit positions instead of all starts."""
    docs = _docs(sf_dir)
    terms = sorted(BM25_TERMS)

    def best(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]),
                                      "[^a-z0-9]+")
        flat = toks.to_pylist()
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        out_d, out_s, out_h = [], [], []
        for i, ts in enumerate(flat):
            a = np.asarray([w for w in ts if w], dtype=object)
            pos = np.flatnonzero(np.isin(a, terms))
            if len(pos) == 0:
                continue
            cnt = np.searchsorted(pos, pos + SNIPPET_W) \
                - np.arange(len(pos))
            k = int(np.argmax(cnt))  # first max = smallest start
            out_d.append(int(ids[i]))
            out_s.append(int(pos[k]))
            out_h.append(int(cnt[k]))
        return pa.table({"doc_id": pa.array(out_d, pa.int64()),
                         "win_start": pa.array(out_s, pa.int64()),
                         "hits": pa.array(out_h, pa.int64())})

    return docs.map_batches(best, batch_format="pyarrow",
                            zero_copy_batch=True)


SQL_SNIPPET_WINDOWS = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     t -> t <> '') AS ts
  FROM documents),
tp AS (SELECT doc_id,
              unnest([{{'p': j - 1, 'w': ts[j]}}
                      FOR j IN range(1, len(ts) + 1)],
                     recursive := true)
       FROM toks),
hits AS (SELECT doc_id, p FROM tp
         WHERE w IN (SELECT unnest({sorted(BM25_TERMS)!r}))),
wins AS (SELECT h1.doc_id, h1.p AS s, count(*) AS hits
         FROM hits h1 JOIN hits h2
           ON h2.doc_id = h1.doc_id
          AND h2.p >= h1.p AND h2.p < h1.p + {SNIPPET_W}
         GROUP BY 1, 2),
best AS (SELECT doc_id, s, hits,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY hits DESC, s ASC) AS rn
         FROM wins)
SELECT doc_id, CAST(s AS BIGINT) AS win_start,
       CAST(hits AS BIGINT) AS hits
FROM best WHERE rn = 1
"""


SUBSTR_N = 8


def q_dedup_exact_substr(sf_dir):
    """ExactSubstr duplicated-span detection (Lee et al. 2022): token
    8-grams occurring >= 2 times anywhere in the corpus, merged into
    maximal per-document spans. Pass 1 ships per-batch (gram,
    min_doc, max_doc, cnt) partials into one gram groupby; the dup
    set (bounded by the corpus's duplication volume, not its size)
    broadcasts for the parallel scoring/merge pass. The SQL twin
    groups by the gram STRING where the engine groups by its 61-bit
    polynomial hash — equal up to a ~2^-61 collision the value
    comparison would catch."""
    return dd.exact_substr_spans(_docs(sf_dir), n=SUBSTR_N)


SQL_DEDUP_EXACT_SUBSTR = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     t -> t <> '') AS ts
  FROM documents),
grams AS (
  SELECT doc_id,
         unnest([{{'pos': j - 1,
                  'g': array_to_string(ts[j : j + {SUBSTR_N - 1}], ' ')}}
                 FOR j IN range(1, len(ts) - {SUBSTR_N - 2})],
                recursive := true)
  FROM toks),
dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
hits AS (SELECT doc_id, pos FROM grams
         WHERE g IN (SELECT g FROM dup)),
brk AS (SELECT doc_id, pos,
          CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
                                         ORDER BY pos) <= {SUBSTR_N}
               THEN 0 ELSE 1 END AS b
        FROM hits),
isl AS (SELECT doc_id, pos,
          sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS gid
        FROM brk)
SELECT doc_id, min(pos) AS span_start,
       max(pos) + {SUBSTR_N} AS span_end
FROM isl GROUP BY doc_id, gid
"""


def q_dedup_substr_rewrite(sf_dir):
    """ExactSubstr apply step: cut duplicated-8-gram-covered tokens
    per document; output (doc_id, n_tokens, n_cut, clean_md5) — the
    md5 pins the full rewritten text so the oracle checks the rewrite
    byte-for-byte without shipping the corpus."""
    return dd.exact_substr_rewrite(_docs(sf_dir), n=SUBSTR_N)


SQL_DEDUP_SUBSTR_REWRITE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     t -> t <> '') AS ts
  FROM documents),
grams AS (
  SELECT doc_id,
         unnest([{{'pos': j - 1,
                  'g': array_to_string(ts[j : j + {SUBSTR_N - 1}], ' ')}}
                 FOR j IN range(1, len(ts) - {SUBSTR_N - 2})],
                recursive := true)
  FROM toks),
dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
hits AS (SELECT doc_id, pos FROM grams
         WHERE g IN (SELECT g FROM dup)),
cov AS (SELECT DISTINCT doc_id, cp FROM (
          SELECT doc_id, unnest(range(pos, pos + {SUBSTR_N})) AS cp
          FROM hits)),
tokpos AS (
  SELECT doc_id,
         unnest([{{'p': j - 1, 'w': ts[j]}}
                 FOR j IN range(1, len(ts) + 1)],
                recursive := true)
  FROM toks),
kept AS (SELECT tp.doc_id, tp.p, tp.w
         FROM tokpos tp LEFT JOIN cov c
           ON c.doc_id = tp.doc_id AND c.cp = tp.p
         WHERE c.cp IS NULL),
agg AS (SELECT doc_id, md5(string_agg(w, ' ' ORDER BY p)) AS h
        FROM kept GROUP BY 1),
nc AS (SELECT doc_id, count(*) AS nc FROM cov GROUP BY 1)
SELECT t.doc_id, len(t.ts) AS n_tokens,
       coalesce(nc.nc, 0) AS n_cut,
       coalesce(agg.h, md5('')) AS clean_md5
FROM toks t
LEFT JOIN nc USING (doc_id)
LEFT JOIN agg USING (doc_id)
"""


def q_dedup_exact(sf_dir):
    out = dd.exact_dedup(_docs(sf_dir))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "text_hash": t["text_hash"],
            "rep_doc_id": pc.cast(t["rep_doc_id"], pa.int64()),
            "n_dups": pc.cast(t["n_dups"], pa.int64()),
        })
    return out.map_batches(finish, batch_format="pyarrow")


SQL_DEDUP_EXACT = """
SELECT md5(text) AS text_hash, min(doc_id) AS rep_doc_id,
       count(*) AS n_dups
FROM documents GROUP BY md5(text)
"""


def q_dedup_minhash(sf_dir):
    return dd.minhash_dedup(_docs(sf_dir), threshold=0.8)


WINNOW_MIN_SHARED = 2
WINNOW_MAX_BUCKET = 2000


def q_doc_winnow_matches(sf_dir):
    """Winnowing (MOSS) overlap pairs: k-gram polynomial hashes ->
    sliding-window minima -> distinct selected fingerprints per doc
    -> bucket-groupby on fingerprint value -> pairs sharing >=
    WINNOW_MIN_SHARED fingerprints (``stages/dedup.winnow_matches``;
    Schleimer, Wilkerson & Aiken, SIGMOD 2003). Detects partial
    overlap runs >= kgram+window-1 tokens — the positional
    complement to MinHash's whole-doc Jaccard. The engine's
    >WINNOW_MAX_BUCKET fingerprint-bucket cap is replicated in the
    oracle (HAVING count <= cap), like the cocitation degree cap."""
    return dd.winnow_matches(_docs(sf_dir),
                             min_shared=WINNOW_MIN_SHARED,
                             max_bucket=WINNOW_MAX_BUCKET)


SQL_DOC_WINNOW_MATCHES = f"""
WITH {_SQL_TOKEN_HASHES},
g AS (SELECT doc_id,
        CASE WHEN len(h) >= 4 THEN
          [(h[j]::HUGEINT * 16974593 + h[j+1]::HUGEINT * 66049
            + h[j+2]::HUGEINT * 257 + h[j+3]::HUGEINT) % {_M61_SQL}
           FOR j IN range(1, len(h) - 2)]
        ELSE [] END AS gs
      FROM th),
sel AS (SELECT doc_id,
          list_distinct(CASE
            WHEN len(gs) = 0 THEN []
            WHEN len(gs) < 4 THEN [list_min(gs)]
            ELSE [list_min(gs[j : j + 3])
                  FOR j IN range(1, len(gs) - 2)]
          END) AS fps
        FROM g),
fp AS (SELECT doc_id, CAST(unnest(fps) AS BIGINT) AS fp FROM sel),
ok AS (SELECT fp FROM fp GROUP BY fp
       HAVING count(*) <= {WINNOW_MAX_BUCKET})
SELECT x.doc_id AS a, y.doc_id AS b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM fp x JOIN fp y ON x.fp = y.fp AND x.doc_id < y.doc_id
JOIN ok ON ok.fp = x.fp
GROUP BY 1, 2
HAVING count(*) >= {WINNOW_MIN_SHARED}
"""


def _sql_dedup_minhash(num_hashes=64, bands=16, rows=4, seed=7,
                       threshold=0.8):
    """Exact DuckDB replica of the MinHash-LSH pipeline: word-3-gram
    shingles -> md5-derived 64-bit hashes -> per-permutation min of
    ((h*a) mod 2^64 + b) mod 2^64 mod M61 (numpy uint64 wrap semantics
    in HUGEINT) -> per-band polynomial fold bucket keys -> candidate
    pairs sharing a bucket -> exact Jaccard over the hash sets. The
    (a, b) permutation constants are inlined from the same seeded
    generator the engine uses. The engine's >2000-id bucket cap cannot
    trigger at oracle scale (500 docs) and is omitted."""
    a, b = dd._minhash_params(num_hashes, seed)
    params = ",".join(f"({i},{int(a[i])},{int(b[i])})"
                      for i in range(num_hashes))
    band_c = int(dd.MinHasher._BAND_C)
    fold = "l[1]"
    for r in range(2, rows + 1):
        fold = f"(({fold})*{band_c} + l[{r}]) % {_T64}"
    jac = """CASE WHEN len(ha.h) = 0 AND len(hb.h) = 0 THEN 1.0
      ELSE CAST(len(list_intersect(ha.h, hb.h)) AS DOUBLE)
           / (len(ha.h) + len(hb.h) - len(list_intersect(ha.h, hb.h)))
      END"""
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS tk
  FROM documents
),
sh_str AS (
  SELECT doc_id,
         CASE WHEN len(tk) < 3 THEN
              CASE WHEN len(tk) = 0 THEN CAST([] AS VARCHAR[])
                   ELSE [array_to_string(tk, ' ')] END
         ELSE list_distinct([array_to_string(tk[i:i+2], ' ')
                             for i in range(1, len(tk) - 1)])
         END AS shingles
  FROM toks
),
hs AS (
  SELECT doc_id,
         list_distinct([{_SQL_TOKHASH.format(w='s')}
                        for s in shingles]) AS h
  FROM sh_str
),
params(i, a, b) AS (VALUES {params}),
sig AS (
  SELECT t.doc_id, p.i,
         min(((t.hv::HUGEINT * p.a) % {_T64} + p.b) % {_T64}
             % {_M61_SQL}) AS v
  FROM (SELECT doc_id, unnest(h) AS hv FROM hs) t, params p
  GROUP BY t.doc_id, p.i
),
folds AS (
  SELECT doc_id, (i // {rows})::INT AS band_id, list(v ORDER BY i) AS l
  FROM sig GROUP BY doc_id, (i // {rows})::INT
),
allbands AS (
  SELECT doc_id, band_id, ({fold}) AS bh FROM folds
  UNION ALL
  SELECT doc_id, r.b::INT AS band_id, 0::HUGEINT AS bh
  FROM hs, range({bands}) r(b) WHERE len(h) = 0
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM allbands x JOIN allbands y
    ON x.band_id = y.band_id AND x.bh = y.bh AND x.doc_id < y.doc_id
)
SELECT c.a::BIGINT AS a, c.b::BIGINT AS b, round({jac}, 6) AS jaccard
FROM cand c JOIN hs ha ON ha.doc_id = c.a JOIN hs hb ON hb.doc_id = c.b
WHERE {jac} >= {threshold}
"""


SQL_DEDUP_MINHASH = _sql_dedup_minhash()


def q_dedup_cluster(sf_dir):
    """Near-dup clusters: MinHash-LSH pairs -> connected components
    over the dup graph (sharded min-label BSP on Dataset-built CSR
    blocks) -> canonical min-doc_id representative per cluster."""
    return dd.dedup_cluster(_docs(sf_dir), threshold=0.8)


# the component step as a recursive min-label CTE over the (already
# SQL-replicated) MinHash pair set
SQL_DEDUP_CLUSTER = f"""
WITH RECURSIVE pairs AS ({_sql_dedup_minhash()}),
ee AS (SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs),
verts AS (SELECT DISTINCT a AS v FROM ee),
reach(v, lab) AS (
  SELECT v, v FROM verts
  UNION
  SELECT ee.b, reach.lab FROM reach JOIN ee ON ee.a = reach.v
)
SELECT v AS doc_id, min(lab) AS rep_doc_id FROM reach GROUP BY v
"""


def q_dedup_jaccard(sf_dir):
    """Exact all-pairs word-3-gram Jaccard >= 0.3 — the SQL-verifiable
    form of the near-dup verify stage (the MinHash-LSH pipeline runs
    the same ``jaccard_verify`` on LSH candidates; here the candidate
    set is the full cross product so a DuckDB list-comprehension
    oracle reproduces it exactly)."""
    return dd.jaccard_all_pairs(_docs(sf_dir), threshold=0.3)


SQL_DEDUP_JACCARD = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS tk
  FROM documents
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(tk) < 3 THEN
              CASE WHEN len(tk) = 0 THEN CAST([] AS VARCHAR[])
                   ELSE [array_to_string(tk, ' ')] END
         ELSE list_distinct([array_to_string(tk[i:i+2], ' ')
                             for i in range(1, len(tk) - 1)])
         END AS shingles
  FROM toks
)
SELECT s1.doc_id AS a, s2.doc_id AS b,
       round(CASE WHEN len(s1.shingles) = 0 AND len(s2.shingles) = 0
                  THEN 1.0
             ELSE CAST(len(list_intersect(s1.shingles, s2.shingles))
                       AS DOUBLE)
                  / (len(s1.shingles) + len(s2.shingles)
                     - len(list_intersect(s1.shingles, s2.shingles)))
             END, 6) AS jaccard
FROM sh s1 JOIN sh s2 ON s1.doc_id < s2.doc_id
WHERE CASE WHEN len(s1.shingles) = 0 AND len(s2.shingles) = 0 THEN 1.0
      ELSE CAST(len(list_intersect(s1.shingles, s2.shingles)) AS DOUBLE)
           / (len(s1.shingles) + len(s2.shingles)
              - len(list_intersect(s1.shingles, s2.shingles)))
      END >= 0.3
"""


def q_dedup_jaccard_lsh(sf_dir):
    """THE scale path for near-dup Jaccard, registered as its own gate
    row (r4 verdict item 3): banded MinHash-LSH candidates (never
    all-pairs) -> ``jaccard_verify_candidates`` (semi-join + broadcast
    signatures) at threshold 0.5 — a different operating point from
    both ``dedup_minhash`` (0.8) and the all-pairs ``dedup_jaccard``
    (0.3). The SQL twin replicates the band bucket keys AND the
    verify, so the driver checks the candidate set exactly: pairs the
    LSH legitimately misses at J ~ 0.5 are missed identically on both
    sides (banding probability 1-(1-J^4)^16, Leskovec et al., Mining
    of Massive Datasets ch.3)."""
    cand = dd.minhash_candidates(_docs(sf_dir))
    return dd.jaccard_verify_candidates(cand, _docs(sf_dir),
                                        threshold=0.5)


SQL_DEDUP_JACCARD_LSH = _sql_dedup_minhash(threshold=0.5)


def q_knn_eval(sf_dir):
    """Classifier-quality evaluation of the kNN label propagation
    (the model-eval op a labeling pipeline needs): per-class TP / FP /
    FN and F1 against the vectors' own labels, over exactly the
    ``knn_label_predict`` output. F1 = 2TP/(2TP+FP+FN) is one
    integer-ratio IEEE division per class; classes with no
    predictions and no truth among the PREDICTED vectors are absent
    on both engines. Fusion runs on the gate-identical predict
    output, driver state = the per-class table (the query RESULT)."""
    pred = q_knn_label_predict(sf_dir).to_pandas()
    truth = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "label"]).to_pandas()
    m = pred.merge(truth, on="vec_id")
    labels = np.union1d(m["pred_label"].unique(),
                        m["label"].unique()).astype(np.int64)
    rows = []
    for c in sorted(labels):
        tp = int(((m["pred_label"] == c) & (m["label"] == c)).sum())
        fp = int(((m["pred_label"] == c) & (m["label"] != c)).sum())
        fn = int(((m["pred_label"] != c) & (m["label"] == c)).sum())
        f1 = 2.0 * tp / (2 * tp + fp + fn) if (2 * tp + fp + fn)             else 0.0
        rows.append((int(c), tp, fp, fn, f1))
    return pa.table({
        "label": pa.array([r[0] for r in rows], pa.int64()),
        "tp": pa.array([r[1] for r in rows], pa.int64()),
        "fp": pa.array([r[2] for r in rows], pa.int64()),
        "fn": pa.array([r[3] for r in rows], pa.int64()),
        "f1": pa.array(round6([r[4] for r in rows])),
    })


def _sql_knn_eval():
    base = SQL_KNN_LABEL_PREDICT
    return f"""
WITH p AS (SELECT pr.vec_id, pr.pred_label, e.label
           FROM ({base}) pr
           JOIN embeddings e ON e.vec_id = pr.vec_id),
cls AS (SELECT DISTINCT pred_label AS label FROM p
        UNION SELECT DISTINCT label FROM p),
st AS (SELECT cls.label,
              (SELECT count(*) FROM p
               WHERE p.pred_label = cls.label
                 AND p.label = cls.label) AS tp,
              (SELECT count(*) FROM p
               WHERE p.pred_label = cls.label
                 AND p.label <> cls.label) AS fp,
              (SELECT count(*) FROM p
               WHERE p.pred_label <> cls.label
                 AND p.label = cls.label) AS fn
       FROM cls)
SELECT CAST(label AS BIGINT) AS label, CAST(tp AS BIGINT) AS tp,
       CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
       round(CASE WHEN 2 * tp + fp + fn = 0 THEN 0.0
                  ELSE 2.0 * tp / (2 * tp + fp + fn) END, 6) AS f1
FROM st
"""


BPE_TOPK = 20


def q_bpe_merge_candidates(sf_dir):
    """Tokenizer-training primitive — the counting step of one BPE
    merge round (Sennrich et al. 2016): frequency of every adjacent
    CHARACTER pair across all word occurrences in the corpus; the
    argmax pair is the merge a BPE trainer would perform. Per-batch
    partial counts use a distinct-word cache (pairs counted once per
    distinct word, scaled by its batch multiplicity — the
    ``hash_tokens`` trick), then one bounded pair groupby. All
    integers; top BPE_TOPK by (count desc, pair asc)."""
    docs = _docs(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter
        cnt = Counter()
        for txt in t["text"].to_pylist():
            words = tx.TOKEN_RE.findall(txt.lower())
            uw, uc = np.unique(np.asarray(words, dtype=object),
                               return_counts=True)
            for w, c in zip(uw, uc):
                # the SQL oracle enumerates pair positions with
                # generate_series(1, 30): fail loudly past its bound
                assert len(w) <= 31, \
                    f"word of length {len(w)} exceeds the SQL " \
                    f"oracle's generate_series bound"
                for i in range(len(w) - 1):
                    cnt[w[i:i + 2]] += int(c)
        if not cnt:
            return pa.table({"pair": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        ks = sorted(cnt)
        return pa.table({"pair": pa.array(ks, pa.string()),
                         "n": pa.array([cnt[k] for k in ks],
                                       pa.int64())})

    agg = docs.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)         .groupby("pair").aggregate(Sum("n", alias_name="n"))         .to_pandas()
    agg = agg.sort_values(["n", "pair"],
                          ascending=[False, True]).head(BPE_TOPK)
    return pa.table({
        "pair": pa.array(agg["pair"].astype(str), pa.string()),
        "n": pa.array(agg["n"].to_numpy(np.int64)),
    })


SQL_BPE_MERGE_CANDIDATES = f"""
WITH w AS (SELECT unnest(regexp_extract_all(lower(text),
                                            '[a-z0-9_]+')) AS w
           FROM documents),
p AS (SELECT substr(w, i, 2) AS pair
      FROM w, generate_series(1, 30) gs(i)
      WHERE i <= len(w) - 1)
SELECT pair, CAST(count(*) AS BIGINT) AS n
FROM p GROUP BY pair
ORDER BY n DESC, pair LIMIT {BPE_TOPK}
"""


PPJOIN_TAU = 0.4


def q_dedup_ppjoin(sf_dir):
    """PPJoin-style prefix-filtered similarity self-join (bigram
    shingles, Jaccard >= PPJOIN_TAU): the oracle is deliberately the
    NAIVE all-pairs form — prefix filtering is provably lossless, so
    hash-equality against the brute-force SQL is the strongest
    possible check that the pruning never drops a qualifying pair."""
    return dd.ppjoin_pairs(_docs(sf_dir), threshold=PPJOIN_TAU,
                           shingle_k=2)


SQL_DEDUP_PPJOIN = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS tk
  FROM documents
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(tk) < 2 THEN
              CASE WHEN len(tk) = 0 THEN CAST([] AS VARCHAR[])
                   ELSE [array_to_string(tk, ' ')] END
         ELSE list_distinct([array_to_string(tk[i:i+1], ' ')
                             for i in range(1, len(tk))])
         END AS shingles
  FROM toks
),
nz AS (SELECT * FROM sh WHERE len(shingles) > 0)
SELECT s1.doc_id AS a, s2.doc_id AS b,
       round(CAST(len(list_intersect(s1.shingles, s2.shingles))
                  AS DOUBLE)
             / (len(s1.shingles) + len(s2.shingles)
                - len(list_intersect(s1.shingles, s2.shingles))), 6)
         AS jaccard
FROM nz s1 JOIN nz s2 ON s1.doc_id < s2.doc_id
WHERE CAST(len(list_intersect(s1.shingles, s2.shingles)) AS DOUBLE)
      / (len(s1.shingles) + len(s2.shingles)
         - len(list_intersect(s1.shingles, s2.shingles)))
      >= {PPJOIN_TAU}
"""


CONTAIN_TAU = 0.5


def q_dedup_containment(sf_dir):
    """Directed shingle containment |S_a ∩ S_b| / |S_a| >= tau
    (Broder 1997's asymmetric resemblance): catches quotes and subset
    documents that symmetric Jaccard dilutes away. All-pairs
    oracle-verifiable form of the shared double-hash-join verify; at
    scale the candidate side comes from ``minhash_candidates``."""
    return dd.containment_all_pairs(_docs(sf_dir),
                                    threshold=CONTAIN_TAU)


SQL_DEDUP_CONTAINMENT = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS tk
  FROM documents
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(tk) < 3 THEN
              CASE WHEN len(tk) = 0 THEN CAST([] AS VARCHAR[])
                   ELSE [array_to_string(tk, ' ')] END
         ELSE list_distinct([array_to_string(tk[i:i+2], ' ')
                             for i in range(1, len(tk) - 1)])
         END AS shingles
  FROM toks
)
SELECT s1.doc_id AS a, s2.doc_id AS b,
       round(CAST(len(list_intersect(s1.shingles, s2.shingles))
                  AS DOUBLE) / len(s1.shingles), 6) AS containment
FROM sh s1 JOIN sh s2 ON s1.doc_id <> s2.doc_id
WHERE len(s1.shingles) > 0
  AND CAST(len(list_intersect(s1.shingles, s2.shingles)) AS DOUBLE)
      / len(s1.shingles) >= {CONTAIN_TAU}
"""


def q_dedup_simhash(sf_dir):
    return dd.simhash_dedup(_docs(sf_dir), max_hamming=3)


_SQL_POW2 = ",".join(f"({j},{1 << j})" for j in range(64))

# Exact DuckDB replica of the SimHash pipeline: per-bit majority vote
# over md5-derived token hashes (occurrences, not distinct), 64-bit
# signature, 4x16-bit pigeonhole blocking, Hamming verify <= 3.
SQL_DEDUP_SIMHASH = f"""
WITH {_SQL_TOKEN_HASHES},
jtab(j, p) AS (VALUES {_SQL_POW2}),
bits AS (
  SELECT r.doc_id, jt.j, jt.p,
         sum(((r.hv >> jt.j) & 1)::BIGINT) AS ones
  FROM (SELECT doc_id, unnest(h) AS hv FROM th) r, jtab jt
  GROUP BY r.doc_id, jt.j, jt.p
),
sigs AS (
  SELECT b.doc_id,
         sum(CASE WHEN 2*b.ones > t.n THEN b.p::HUGEINT
                  ELSE 0::HUGEINT END)::UBIGINT AS s
  FROM bits b JOIN th t USING(doc_id)
  GROUP BY b.doc_id
  UNION ALL
  SELECT doc_id, 0::UBIGINT AS s FROM th WHERE n = 0
),
chunks AS (
  SELECT doc_id, s, t.c, (s >> (16*t.c)::INT) & 65535 AS cv
  FROM sigs, range(4) t(c)
)
SELECT DISTINCT x.doc_id::BIGINT AS a, y.doc_id::BIGINT AS b,
       bit_count(xor(x.s, y.s))::BIGINT AS hamming
FROM chunks x JOIN chunks y
  ON x.c = y.c AND x.cv = y.cv AND x.doc_id < y.doc_id
WHERE bit_count(xor(x.s, y.s)) <= 3
"""


def q_embed_cosine_pairs(sf_dir):
    """Exact all-pairs cosine >= 0.4 (threshold chosen so the synthetic
    embeddings produce a non-trivial pair set; max pairwise cosine in
    the test corpus is ~0.51). ``use_lsh=False`` so the DuckDB
    cross-join oracle computes the identical pair set; the LSH-bucketed
    scale path is exercised by tests."""
    return dd.embedding_cosine_pairs(_emb(sf_dir), threshold=0.4,
                                     use_lsh=False)


SQL_EMBED_COSINE_PAIRS = """
SELECT e1.vec_id AS a, e2.vec_id AS b,
       round(list_cosine_similarity(
           CAST(e1.embedding AS DOUBLE[]),
           CAST(e2.embedding AS DOUBLE[])), 6) AS cos
FROM embeddings e1 JOIN embeddings e2 ON e1.vec_id < e2.vec_id
WHERE list_cosine_similarity(CAST(e1.embedding AS DOUBLE[]),
                             CAST(e2.embedding AS DOUBLE[])) >= 0.4
"""


CENTROID_DIMS = 4
CENTROID_Q = 1 << 20

KMEANS_K = 8
KMEANS_ITERS = 2
KMEANS_DIM = 64


def q_kmeans_fixed(sf_dir):
    """Distributed Lloyd k-means, fixed KMEANS_ITERS=2 rounds — the
    SQL-verifiable twin of the iterative k-means behind ``ann_ivf``
    (same convention as ``ann_ivf_fixed``: deterministic anchors =
    first KMEANS_K vectors, cosine assignment with ties to the lowest
    centroid id). Each round is ONE shuffle-free map_batches pass:
    per-batch assignment against the broadcast centroid matrix plus
    fixed-point-quantised per-(cluster, dim) integer partials
    (round(x * 2^20), the ``embed_centroids`` trick) so the
    distributed mean is order-independent; the driver merges only
    K x (D+1) scalars per batch. Mean update mu_j = (sum_q / 2^20) / n
    is written identically in the oracle, so the round-2 assignment
    sees bit-identical centroids on both engines."""
    head = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"]) \
        .filter(expr=f"vec_id < {KMEANS_K}").to_pandas() \
        .sort_values("vec_id")
    cm = np.stack([np.asarray(v, dtype=np.float64)
                   for v in head["embedding"]])
    labels = head["vec_id"].to_numpy().astype(np.int64)

    def one_round(cm, labels):
        cn = np.linalg.norm(cm, axis=1)
        cn[cn == 0] = 1.0
        cmn = cm / cn[:, None]

        def partial(t: pa.Table) -> pa.Table:
            vec = np.stack([np.asarray(v, dtype=np.float64)
                            for v in t["embedding"].to_pylist()])
            norm = np.linalg.norm(vec, axis=1)
            norm[norm == 0] = 1.0
            b = np.argmax((vec / norm[:, None]) @ cmn.T, axis=1)
            qz = np.floor(vec * CENTROID_Q + 0.5).astype(np.int64)
            ub, inv = np.unique(b, return_inverse=True)
            n = np.zeros(len(ub), np.int64)
            np.add.at(n, inv, 1)
            s = np.zeros((len(ub), vec.shape[1]), np.int64)
            np.add.at(s, inv, qz)
            cols = {"bucket": pa.array(labels[ub]), "n": pa.array(n)}
            for j in range(vec.shape[1]):
                cols[f"s{j}"] = pa.array(s[:, j])
            return pa.table(cols)

        parts = _emb(sf_dir).map_batches(
            partial, batch_format="pyarrow",
            zero_copy_batch=True).to_pandas()
        agg = parts.groupby("bucket", sort=True).sum()
        n = agg["n"].to_numpy().astype(np.float64)
        s = agg[[f"s{j}" for j in range(KMEANS_DIM)]].to_numpy() \
            .astype(np.float64)
        new_cm = (s / CENTROID_Q) / n[:, None]
        return new_cm, agg.index.to_numpy().astype(np.int64), \
            agg["n"].to_numpy().astype(np.int64)

    for _ in range(KMEANS_ITERS):
        cm, labels, sizes = one_round(cm, labels)

    out = {"bucket": pa.array(labels), "n": pa.array(sizes)}
    for j in range(CENTROID_DIMS):
        out[f"c{j}"] = pa.array(round6(cm[:, j]))
    return pa.table(out)


SQL_KMEANS_FIXED = f"""
WITH dims AS (SELECT j FROM range({KMEANS_DIM}) t(j)),
cent0 AS (
  SELECT vec_id AS c, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id < {KMEANS_K}
),
a1 AS (
  SELECT vec_id, c AS bucket FROM (
    SELECT e.vec_id, cent0.c,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(
                 CAST(e.embedding AS DOUBLE[]), cent0.cv) DESC, cent0.c)
             AS rn
    FROM embeddings e CROSS JOIN cent0
  ) WHERE rn = 1
),
m1 AS (
  SELECT a1.bucket, dims.j,
         (sum(CAST(floor(e.embedding[dims.j + 1] * {CENTROID_Q} + 0.5)
                   AS BIGINT)) / {CENTROID_Q}.0) / count(*) AS mu
  FROM a1 JOIN embeddings e USING (vec_id) CROSS JOIN dims
  GROUP BY 1, 2
),
cent1 AS (
  SELECT bucket AS c, list(mu ORDER BY j) AS cv FROM m1 GROUP BY 1
),
a2 AS (
  SELECT vec_id, c AS bucket FROM (
    SELECT e.vec_id, cent1.c,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(
                 CAST(e.embedding AS DOUBLE[]), cent1.cv) DESC, cent1.c)
             AS rn
    FROM embeddings e CROSS JOIN cent1
  ) WHERE rn = 1
),
m2 AS (
  SELECT a2.bucket, dims.j,
         (sum(CAST(floor(e.embedding[dims.j + 1] * {CENTROID_Q} + 0.5)
                   AS BIGINT)) / {CENTROID_Q}.0) / count(*) AS mu,
         count(*) AS n
  FROM a2 JOIN embeddings e USING (vec_id) CROSS JOIN dims
  WHERE dims.j < {CENTROID_DIMS}
  GROUP BY 1, 2
)
SELECT bucket, CAST(max(n) AS BIGINT) AS n,
""" + ",\n".join(
    f"       round(max(CASE WHEN j = {j} THEN mu END), 6) AS c{j}"
    for j in range(4)) + """
FROM m2 GROUP BY bucket
"""


SEMDEDUP_K = 16
SEMDEDUP_TAU = 0.4


def q_semdedup(sf_dir):
    """SemDeDup (Abbas et al. 2023): semantic dedup bucketed by
    nearest-centroid cluster — the pairwise pass is bounded by the
    cluster, never the corpus. Deterministic centroids (the first
    SEMDEDUP_K vectors by vec_id, the ``ann_ivf_fixed`` convention) so
    the DuckDB oracle replicates assignment, the per-cluster similar
    pairs and the keep-lowest-centroid-cosine election exactly."""
    emb = _emb(sf_dir)
    head = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"]) \
        .filter(expr=f"vec_id < {SEMDEDUP_K}").to_pandas() \
        .sort_values("vec_id")
    cent = np.stack([np.asarray(v, dtype=np.float64)
                     for v in head["embedding"]])
    return dd.semdedup(emb, cent, tau=SEMDEDUP_TAU)


SQL_SEMDEDUP = f"""
WITH cent AS (
  SELECT vec_id AS c, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id < {SEMDEDUP_K}
),
a AS (  -- every vector -> nearest centroid (ties: lowest c)
  SELECT vec_id, c AS bucket, ccos FROM (
    SELECT e.vec_id, cent.c,
           list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                  cent.cv) AS ccos,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(
                 CAST(e.embedding AS DOUBLE[]), cent.cv) DESC, cent.c)
             AS rn
    FROM embeddings e CROSS JOIN cent
  ) WHERE rn = 1
),
rm AS (  -- removed: a same-cluster member >= tau wins the keep rule
  SELECT DISTINCT x.vec_id
  FROM a x JOIN a y ON x.bucket = y.bucket AND x.vec_id <> y.vec_id
  JOIN embeddings ex ON ex.vec_id = x.vec_id
  JOIN embeddings ey ON ey.vec_id = y.vec_id
  WHERE list_cosine_similarity(CAST(ex.embedding AS DOUBLE[]),
                               CAST(ey.embedding AS DOUBLE[]))
          >= {SEMDEDUP_TAU}
    AND (y.ccos < x.ccos
         OR (y.ccos = x.ccos AND y.vec_id < x.vec_id))
)
SELECT a.vec_id, a.bucket, round(a.ccos, 6) AS ccos,
       CAST(CASE WHEN rm.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT)
         AS keep
FROM a LEFT JOIN rm ON rm.vec_id = a.vec_id
"""


def q_ann_topk(sf_dir):
    """Brute-force cosine top-10 for the first 5 vectors as queries."""
    emb = _emb(sf_dir)
    qdf = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"]) \
        .filter(expr="vec_id < 5").to_pandas()
    qdf = qdf.sort_values("vec_id")
    qv = np.stack([np.asarray(v, dtype=np.float64)
                   for v in qdf["embedding"]])
    return annm.brute_force_topk(emb, qv, qdf["vec_id"].to_numpy(), k=10)


SQL_ANN_TOPK = """
SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
       round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                    CAST(e.embedding AS DOUBLE[])), 6)
           AS cos,
       CAST(row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(
               CAST(q.embedding AS DOUBLE[]),
               CAST(e.embedding AS DOUBLE[])) DESC, e.vec_id)
         AS BIGINT) AS rank
FROM embeddings q CROSS JOIN embeddings e
WHERE q.vec_id < 5
QUALIFY rank <= 10
"""


def q_ann_ivf(sf_dir):
    """IVF approximate top-k (scale path; rows-only check — recall vs
    brute force is asserted in tests)."""
    emb = _emb(sf_dir)
    qdf = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"]) \
        .filter(expr="vec_id < 5").to_pandas().sort_values("vec_id")
    qv = np.stack([np.asarray(v, dtype=np.float64)
                   for v in qdf["embedding"]])
    return annm.ivf_topk(emb, qv, qdf["vec_id"].to_numpy(), k=10)


def q_ann_ivf_fixed(sf_dir):
    """IVF with deterministic centroids (the first 16 vectors by
    vec_id) instead of k-means — the SQL-verifiable form: assignment
    argmax, probe ranking and bucketed top-k search are identical to
    the k-means path, but the coarse quantiser is closed-form so the
    DuckDB oracle reproduces the whole pipeline exactly."""
    emb = _emb(sf_dir)
    head = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"]) \
        .filter(expr="vec_id < 16").to_pandas().sort_values("vec_id")
    cent = np.stack([np.asarray(v, dtype=np.float64)
                     for v in head["embedding"]])
    qdf = head[head.vec_id < 5]
    qv = np.stack([np.asarray(v, dtype=np.float64)
                   for v in qdf["embedding"]])
    return annm.ivf_topk(emb, qv, qdf["vec_id"].to_numpy(), k=10,
                         nprobe=4, centroids=cent)


SQL_ANN_IVF_FIXED = """
WITH cent AS (
  SELECT vec_id AS c, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id < 16
),
assign AS (  -- every vector -> nearest centroid (ties: lowest c)
  SELECT vec_id, c AS bucket FROM (
    SELECT e.vec_id, cent.c,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(
                 CAST(e.embedding AS DOUBLE[]), cent.cv) DESC, cent.c)
             AS rn
    FROM embeddings e CROSS JOIN cent
  ) WHERE rn = 1
),
probes AS (  -- every query -> its nprobe=4 nearest centroids
  SELECT query_id, c FROM (
    SELECT q.vec_id AS query_id, cent.c,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(
                 CAST(q.embedding AS DOUBLE[]), cent.cv) DESC, cent.c)
             AS rn
    FROM embeddings q CROSS JOIN cent WHERE q.vec_id < 5
  ) WHERE rn <= 4
)
SELECT query_id, vec_id,
       round(list_cosine_similarity(qe, ee), 6) AS cos,
       CAST(row_number() OVER (
           PARTITION BY query_id
           ORDER BY list_cosine_similarity(qe, ee) DESC, vec_id)
         AS BIGINT) AS rank
FROM (
  SELECT p.query_id, e.vec_id,
         CAST(q.embedding AS DOUBLE[]) AS qe,
         CAST(e.embedding AS DOUBLE[]) AS ee
  FROM probes p
  JOIN assign a ON a.bucket = p.c
  JOIN embeddings e ON e.vec_id = a.vec_id
  JOIN embeddings q ON q.vec_id = p.query_id
)
QUALIFY rank <= 10
"""


PQ_M = 8          # subspaces (64 dims -> 8 x 8)
PQ_SUBDIM = 8
PQ_K = 16         # codewords per subspace (anchors: vec_id < 16)
PQ_TOPK = 10
PQ_NQ = 5


def q_ann_pq(sf_dir):
    """Product-quantization ANN (Jégou et al. 2011) with asymmetric
    distance computation: 64-dim embeddings split into M=8 subspaces,
    each encoded as the nearest of K=16 codewords (deterministic
    codebooks — the subvectors of the first 16 vectors by vec_id — so
    the DuckDB oracle reproduces the whole pipeline exactly, mirroring
    ``ann_ivf_fixed``). A query precomputes its M x K subspace
    distance table; the scan then reads ONE BYTE per (vector,
    subspace) instead of the raw floats — at 100 TB the code table is
    32x smaller than the embedding column, which is the point of PQ.

    Determinism: per-subspace query-to-codeword L2^2 distances are
    quantised to 1e-9 fixed point before the per-vector sum, so ADC
    totals are exact integers (order-free) and ranking ties break on
    vec_id. Encode + ADC + partial top-k run in one shuffle-free
    ``map_batches`` pass with the tiny codebook broadcast; the driver
    sees K_top rows per (query, batch)."""
    emb = _emb(sf_dir)
    head = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"]) \
        .filter(expr=f"vec_id < {PQ_K}").to_pandas() \
        .sort_values("vec_id")
    anchors = np.stack([np.asarray(v, dtype=np.float64)
                        for v in head["embedding"]])        # (K, 64)
    # cb[m]: (K, SUBDIM) codebook of subspace m
    cb = [anchors[:, m * PQ_SUBDIM:(m + 1) * PQ_SUBDIM]
          for m in range(PQ_M)]
    qdf = head[head.vec_id < PQ_NQ]
    qv = np.stack([np.asarray(v, dtype=np.float64)
                   for v in qdf["embedding"]])              # (Q, 64)
    qids = qdf["vec_id"].to_numpy(np.int64)
    # quantised query distance tables: (Q, M, K) int64
    qt = np.empty((len(qids), PQ_M, PQ_K), dtype=np.int64)
    for m in range(PQ_M):
        sub = qv[:, m * PQ_SUBDIM:(m + 1) * PQ_SUBDIM]
        d2 = ((sub[:, None, :] - cb[m][None, :, :]) ** 2).sum(-1)
        qt[:, m, :] = np.floor(d2 * 1e9 + 0.5).astype(np.int64)
    import ray as _ray
    cb_ref = _ray.put(cb)
    qt_ref = _ray.put(qt)

    def scan(t: pa.Table) -> pa.Table:
        import ray as _ray
        cbl = _ray.get(cb_ref)
        qtl = _ray.get(qt_ref)
        vec = annm._to_matrix(t["embedding"])
        ids = t["vec_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = len(ids)
        if n == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        adist = np.zeros((len(qtl), n), dtype=np.int64)
        for m in range(PQ_M):
            sub = vec[:, m * PQ_SUBDIM:(m + 1) * PQ_SUBDIM]
            d2 = ((sub[:, None, :] - cbl[m][None, :, :]) ** 2).sum(-1)
            codes = np.argmin(d2, axis=1)      # ties -> lowest k
            adist += qtl[:, m, codes]
        kk = min(PQ_TOPK, n)
        out_q, out_v, out_s = [], [], []
        for j in range(len(qtl)):
            order = np.lexsort((ids, adist[j]))[:kk]
            out_q.append(np.full(kk, j, dtype=np.int64))
            out_v.append(ids[order])
            out_s.append(adist[j][order])
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         "vec_id": pa.array(np.concatenate(out_v)),
                         "s": pa.array(np.concatenate(out_s))})

    parts = emb.map_batches(scan, batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas()
    frames = []
    for j in range(len(qids)):
        g = parts[parts["query_id"] == j]
        order = np.lexsort((g["vec_id"].to_numpy(),
                            g["s"].to_numpy()))[:PQ_TOPK]
        sel = g.iloc[order]
        frames.append(pa.table({
            "query_id": pa.array(np.full(len(sel), qids[j])),
            "vec_id": pa.array(sel["vec_id"].to_numpy(np.int64)),
            "adist": pa.array(round6(
                sel["s"].to_numpy(np.int64) / 1e9)),
            "rank": pa.array(np.arange(1, len(sel) + 1,
                                       dtype=np.int64)),
        }))
    return pa.concat_tables(frames)


_PQ_D2 = ("list_sum(list_transform(generate_series(1, {sd}), "
          "i -> (sv[i] - cv[i]) * (sv[i] - cv[i])))")

SQL_ANN_PQ = f"""
WITH ms AS (SELECT unnest(generate_series(0, {PQ_M - 1})) AS m),
anch AS (SELECT vec_id AS k, CAST(embedding AS DOUBLE[]) AS av
         FROM embeddings WHERE vec_id < {PQ_K}),
cbook AS (SELECT k, m,
                 list_slice(av, m * {PQ_SUBDIM} + 1,
                            m * {PQ_SUBDIM} + {PQ_SUBDIM}) AS cv
          FROM anch, ms),
vsub AS (SELECT vec_id, m,
                list_slice(CAST(embedding AS DOUBLE[]),
                           m * {PQ_SUBDIM} + 1,
                           m * {PQ_SUBDIM} + {PQ_SUBDIM}) AS sv
         FROM embeddings, ms),
cand AS (SELECT v.vec_id, v.m, c.k,
                {_PQ_D2.format(sd=PQ_SUBDIM).replace('sv', 'v.sv')
                 .replace('cv', 'c.cv')} AS d2
         FROM vsub v JOIN cbook c USING (m)),
codes AS (SELECT vec_id, m, k AS code FROM (
            SELECT vec_id, m, k,
                   row_number() OVER (PARTITION BY vec_id, m
                                      ORDER BY d2, k) AS rn
            FROM cand) WHERE rn = 1),
qtab AS (SELECT vec_id AS query_id, m, k,
                CAST(floor(d2 * 1000000000 + 0.5) AS BIGINT) AS dq
         FROM cand WHERE vec_id < {PQ_NQ}),
adc AS (SELECT q.query_id, c.vec_id, sum(q.dq) AS s
        FROM codes c JOIN qtab q ON q.m = c.m AND q.k = c.code
        GROUP BY 1, 2)
SELECT query_id, vec_id,
       round(CAST(s AS DOUBLE) / 1000000000, 6) AS adist,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY s, vec_id) AS BIGINT) AS rank
FROM adc QUALIFY rank <= {PQ_TOPK}
"""


IVFPQ_NPROBE = 4


def q_ann_ivfpq(sf_dir):
    """IVF-PQ composite ANN — the FAISS-style at-scale architecture:
    a coarse inverted index prunes the corpus to nprobe buckets (the
    ``ann_ivf_fixed`` quantiser: deterministic centroids = first 16
    vectors, cosine assignment, ties to the lowest id), then the PQ
    asymmetric-distance scan of ``ann_pq`` scores ONLY the surviving
    candidates from 1-byte-per-subspace codes. At 100 TB the probe
    filter cuts the scan ~K/nprobe-fold on top of PQ's 32x byte
    shrink. Same determinism contract: quantised integer ADC,
    (distance, vec_id) tie order; one shuffle-free map_batches pass
    with the codebooks + probe table broadcast."""
    emb = _emb(sf_dir)
    head = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])         .filter(expr=f"vec_id < {PQ_K}").to_pandas()         .sort_values("vec_id")
    anchors = np.stack([np.asarray(v, dtype=np.float64)
                        for v in head["embedding"]])
    cn = np.linalg.norm(anchors, axis=1)
    cn[cn == 0] = 1.0
    cmn = anchors / cn[:, None]
    cb = [anchors[:, m * PQ_SUBDIM:(m + 1) * PQ_SUBDIM]
          for m in range(PQ_M)]
    qdf = head[head.vec_id < PQ_NQ]
    qv = np.stack([np.asarray(v, dtype=np.float64)
                   for v in qdf["embedding"]])
    qids = qdf["vec_id"].to_numpy(np.int64)
    qt = np.empty((len(qids), PQ_M, PQ_K), dtype=np.int64)
    for m in range(PQ_M):
        sub = qv[:, m * PQ_SUBDIM:(m + 1) * PQ_SUBDIM]
        d2 = ((sub[:, None, :] - cb[m][None, :, :]) ** 2).sum(-1)
        qt[:, m, :] = np.floor(d2 * 1e9 + 0.5).astype(np.int64)
    # probe sets: nprobe nearest centroids per query (cosine desc, c)
    qn = np.linalg.norm(qv, axis=1)
    qn[qn == 0] = 1.0
    sim = (qv / qn[:, None]) @ cmn.T
    probes = np.argsort(-sim, kind="stable")[:, :IVFPQ_NPROBE]
    import ray as _ray
    cb_ref = _ray.put((cb, cmn))
    qt_ref = _ray.put((qt, probes))

    def scan(t: pa.Table) -> pa.Table:
        import ray as _ray
        cbl, cmnl = _ray.get(cb_ref)
        qtl, probesl = _ray.get(qt_ref)
        vec = annm._to_matrix(t["embedding"])
        ids = t["vec_id"].to_numpy(zero_copy_only=False)             .astype(np.int64)
        n = len(ids)
        if n == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        norm = np.linalg.norm(vec, axis=1)
        norm[norm == 0] = 1.0
        bucket = np.argmax((vec / norm[:, None]) @ cmnl.T, axis=1)
        adist = np.zeros((len(qtl), n), dtype=np.int64)
        for m in range(PQ_M):
            sub = vec[:, m * PQ_SUBDIM:(m + 1) * PQ_SUBDIM]
            d2 = ((sub[:, None, :] - cbl[m][None, :, :]) ** 2).sum(-1)
            codes = np.argmin(d2, axis=1)
            adist += qtl[:, m, codes]
        out_q, out_v, out_s = [], [], []
        for j in range(len(qtl)):
            cand = np.flatnonzero(np.isin(bucket, probesl[j]))
            if not len(cand):
                continue
            kk = min(PQ_TOPK, len(cand))
            order = cand[np.lexsort((ids[cand], adist[j][cand]))[:kk]]
            out_q.append(np.full(kk, j, dtype=np.int64))
            out_v.append(ids[order])
            out_s.append(adist[j][order])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         "vec_id": pa.array(np.concatenate(out_v)),
                         "s": pa.array(np.concatenate(out_s))})

    parts = emb.map_batches(scan, batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas()
    frames = []
    for j in range(len(qids)):
        g = parts[parts["query_id"] == j]
        order = np.lexsort((g["vec_id"].to_numpy(),
                            g["s"].to_numpy()))[:PQ_TOPK]
        sel = g.iloc[order]
        frames.append(pa.table({
            "query_id": pa.array(np.full(len(sel), qids[j])),
            "vec_id": pa.array(sel["vec_id"].to_numpy(np.int64)),
            "adist": pa.array(round6(
                sel["s"].to_numpy(np.int64) / 1e9)),
            "rank": pa.array(np.arange(1, len(sel) + 1,
                                       dtype=np.int64)),
        }))
    return pa.concat_tables(frames)


SQL_ANN_IVFPQ = f"""
WITH ms AS (SELECT unnest(generate_series(0, {PQ_M - 1})) AS m),
anch AS (SELECT vec_id AS k, CAST(embedding AS DOUBLE[]) AS av
         FROM embeddings WHERE vec_id < {PQ_K}),
assign AS (SELECT vec_id, k AS bucket FROM (
    SELECT e.vec_id, anch.k,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(
                 CAST(e.embedding AS DOUBLE[]), anch.av) DESC, anch.k)
             AS rn
    FROM embeddings e CROSS JOIN anch
  ) WHERE rn = 1),
probes AS (SELECT query_id, k FROM (
    SELECT q.vec_id AS query_id, anch.k,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(
                 CAST(q.embedding AS DOUBLE[]), anch.av) DESC, anch.k)
             AS rn
    FROM embeddings q CROSS JOIN anch WHERE q.vec_id < {PQ_NQ}
  ) WHERE rn <= {IVFPQ_NPROBE}),
cbook AS (SELECT k, m,
                 list_slice(av, m * {PQ_SUBDIM} + 1,
                            m * {PQ_SUBDIM} + {PQ_SUBDIM}) AS cv
          FROM anch, ms),
vsub AS (SELECT vec_id, m,
                list_slice(CAST(embedding AS DOUBLE[]),
                           m * {PQ_SUBDIM} + 1,
                           m * {PQ_SUBDIM} + {PQ_SUBDIM}) AS sv
         FROM embeddings, ms),
cand AS (SELECT v.vec_id, v.m, c.k,
                {_PQ_D2.format(sd=PQ_SUBDIM).replace('sv', 'v.sv')
                 .replace('cv', 'c.cv')} AS d2
         FROM vsub v JOIN cbook c USING (m)),
codes AS (SELECT vec_id, m, k AS code FROM (
            SELECT vec_id, m, k,
                   row_number() OVER (PARTITION BY vec_id, m
                                      ORDER BY d2, k) AS rn
            FROM cand) WHERE rn = 1),
qtab AS (SELECT vec_id AS query_id, m, k,
                CAST(floor(d2 * 1000000000 + 0.5) AS BIGINT) AS dq
         FROM cand WHERE vec_id < {PQ_NQ}),
adc AS (SELECT q.query_id, c.vec_id, sum(q.dq) AS s
        FROM codes c
        JOIN assign a ON a.vec_id = c.vec_id
        JOIN qtab q ON q.m = c.m AND q.k = c.code
        JOIN probes p ON p.query_id = q.query_id
                     AND p.k = a.bucket
        GROUP BY 1, 2)
SELECT query_id, vec_id,
       round(CAST(s AS DOUBLE) / 1000000000, 6) AS adist,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY s, vec_id) AS BIGINT) AS rank
FROM adc QUALIFY rank <= {PQ_TOPK}
"""



# ======================================================================
# Events: windowed aggregation + sessionisation
# ======================================================================
def q_events_window(sf_dir):
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(t["ts"], pa.int64())
        win = pc.divide(ts_us, 300_000_000)
        tt = pa.table({"user_id": t["user_id"], "win": win,
                       "value": t["value"]})
        return tt.group_by(["user_id", "win"]).aggregate(
            [("value", "sum"), ([], "count_all")]) \
            .rename_columns(["user_id", "win", "sum_value", "n_events"])

    pre = ev.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
    agg = pre.groupby(["user_id", "win"]).aggregate(
        Sum("sum_value", alias_name="sum_value"),
        Sum("n_events", alias_name="n_events"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "win": pc.cast(t["win"], pa.int64()),
            "n_events": pc.cast(t["n_events"], pa.int64()),
            "sum_value": pa.array(round6(
                pc.cast(t["sum_value"], pa.float64()).to_numpy(
                    zero_copy_only=False))),
        })
    return agg.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_WINDOW = """
SELECT user_id, CAST(floor(epoch(ts) / 300) AS BIGINT) AS win,
       count(*) AS n_events, round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_events_window_sliding(sf_dir):
    """Sliding (hopping) windows — 600 s size, 300 s hop, so every
    event lands in exactly two windows: the per-batch combiner
    EXPLODES each event into its covering windows before the partial
    aggregate, then the same small groupby as the tumbling case. The
    fan-out happens inside the batch, so the shuffle still carries
    (user, window) partials, not the doubled event stream."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        h = pc.divide(pc.cast(t["ts"], pa.int64()), 300_000_000)
        tt = pa.concat_tables([
            pa.table({"user_id": t["user_id"],
                      "win": pc.subtract(h, o), "value": t["value"]})
            for o in (0, 1)])
        return tt.group_by(["user_id", "win"]).aggregate(
            [("value", "sum"), ([], "count_all")]) \
            .rename_columns(["user_id", "win", "sum_value", "n_events"])

    pre = ev.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
    agg = pre.groupby(["user_id", "win"]).aggregate(
        Sum("sum_value", alias_name="sum_value"),
        Sum("n_events", alias_name="n_events"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "win": pc.cast(t["win"], pa.int64()),
            "n_events": pc.cast(t["n_events"], pa.int64()),
            "sum_value": pa.array(round6(
                pc.cast(t["sum_value"], pa.float64()).to_numpy(
                    zero_copy_only=False))),
        })
    return agg.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_WINDOW_SLIDING = """
WITH x AS (SELECT user_id, value,
                  CAST(floor(epoch(ts) / 300) AS BIGINT) AS h
           FROM events)
SELECT user_id, h - o AS win, count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM x, unnest([0, 1]) AS t(o)
GROUP BY 1, 2
"""


def q_events_quantiles(sf_dir):
    """Exact per-type order-statistic quantiles (percentile_disc
    semantics: sorted[ceil(q*n) - 1]) of the event value: one hash
    shuffle on event_type, per-group vectorised sort. For groups past
    node memory the same output comes from a per-batch value
    histogram + a tiny cumulative groupby (values are discrete);
    the sort form is the general-dtype path."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def qtile(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["value"].to_numpy(np.float64))
        n = len(v)
        pick = lambda q: v[max(int(np.ceil(q * n)) - 1, 0)]
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "n": np.array([n], np.int64),
            "p50": round6([pick(0.5)]),
            "p90": round6([pick(0.9)]),
            "p99": round6([pick(0.99)]),
        })

    return ev.groupby("event_type").map_groups(qtile,
                                               batch_format="pandas")


SQL_EVENTS_QUANTILES = """
SELECT event_type, count(*) AS n,
       round(percentile_disc(0.5) WITHIN GROUP (ORDER BY value), 6)
         AS p50,
       round(percentile_disc(0.9) WITHIN GROUP (ORDER BY value), 6)
         AS p90,
       round(percentile_disc(0.99) WITHIN GROUP (ORDER BY value), 6)
         AS p99
FROM events GROUP BY event_type
"""


def q_events_sessionize(sf_dir):
    """Session windows (30-min inactivity gap) per user: sorted
    ``map_groups`` over the user partition — the engine's
    streaming-window shape (ray_guide.md 'Streaming-shaped
    workloads')."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id", "value"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        gap = g["ts"].diff().dt.total_seconds()
        new_s = (gap.isna() | (gap > 1800)).astype(np.int64)
        sess = new_s.cumsum()
        out = g.assign(session_id=sess).groupby("session_id").agg(
            session_start=("ts", "min"),
            n_events=("event_id", "count"),
            sum_value=("value", "sum")).reset_index()
        out["user_id"] = g["user_id"].iloc[0]
        out["sum_value"] = round6(out["sum_value"])
        out["n_events"] = out["n_events"].astype(np.int64)
        out["session_id"] = out["session_id"].astype(np.int64)
        return out[["user_id", "session_id", "session_start",
                    "n_events", "sum_value"]]

    return ev.groupby("user_id").map_groups(sessions,
                                            batch_format="pandas")


SQL_EVENTS_SESSIONIZE = """
WITH x AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
               OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
y AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM x
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       min(ts) AS session_start, count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM y GROUP BY user_id, session_id
"""


def _events(sf_dir, columns):
    return rd.read_parquet(f"{sf_dir}/events.parquet",
                           columns=list(columns))


def _events_of_type(sf_dir, etype):
    ev = _events(sf_dir, ["event_id", "user_id", "ts", "event_type"])

    def keep(t: pa.Table) -> pa.Table:
        m = pc.equal(t["event_type"], etype)
        return t.filter(m).select(["event_id", "user_id", "ts"])

    return ev.map_batches(keep, batch_format="pyarrow",
                          zero_copy_batch=True)


def q_events_asof(sf_dir):
    """As-of join: each click matched to the user's most recent view
    at or before it (ties on the timestamp -> largest view id). One
    hash shuffle on user_id + per-group searchsorted
    (``stages/joins.asof_join``); gap reported in whole microseconds
    so the comparison is float-free."""
    from ..stages.joins import asof_join
    clicks = _events_of_type(sf_dir, "click")
    views = _events_of_type(sf_dir, "view")
    out = asof_join(clicks, views, by="user_id", on="ts",
                    left_id="event_id", right_id="event_id",
                    right_out="prev_view_id")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "prev_view_id": pc.cast(t["prev_view_id"], pa.int64()),
            "gap_us": pc.cast(t["gap_us"], pa.int64()),
        })
    return out.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_ASOF = """
WITH c AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'click'),
v AS (SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'view'),
j AS (SELECT c.event_id AS event_id, v.event_id AS prev_view_id,
             date_diff('microsecond', v.ts, c.ts) AS gap_us,
             row_number() OVER (PARTITION BY c.event_id
                                ORDER BY v.ts DESC, v.event_id DESC)
               AS rn
      FROM c JOIN v ON v.user_id = c.user_id AND v.ts <= c.ts)
SELECT event_id, prev_view_id, gap_us FROM j WHERE rn = 1
"""


def q_events_range_join(sf_dir):
    """Preceding-interval join: per error event, how many events the
    same user produced in the strict 5 minutes before it (0 kept)."""
    from ..stages.joins import range_join_count
    errors = _events_of_type(sf_dir, "error")
    allev = _events(sf_dir, ["event_id", "user_id", "ts"])
    out = range_join_count(errors, allev, by="user_id", on="ts",
                           left_id="event_id", right_id="event_id",
                           window_us=300_000_000)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "n_in_range": pc.cast(t["n_in_range"], pa.int64()),
        })
    return out.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_RANGE_JOIN = """
WITH er AS (SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'error')
SELECT er.event_id AS event_id, count(e2.event_id) AS n_in_range
FROM er LEFT JOIN events e2
  ON e2.user_id = er.user_id
 AND e2.ts < er.ts
 AND e2.ts >= er.ts - INTERVAL 5 MINUTE
GROUP BY er.event_id
"""


def q_events_props_json(sf_dir):
    """JSON property extraction from the events ``props`` column (the
    engine's parser-stage shape on semi-structured payloads): per
    event_type, sum and count of ``$.k``."""
    import json

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "props"])

    def extract(t: pa.Table) -> pa.Table:
        ks = np.fromiter((json.loads(p)["k"]
                          for p in t["props"].to_pylist()),
                         dtype=np.int64, count=t.num_rows)
        tt = pa.table({"event_type": t["event_type"],
                       "k": pa.array(ks)})
        return tt.group_by(["event_type"]).aggregate(
            [("k", "sum"), ([], "count_all")]) \
            .rename_columns(["event_type", "sum_k", "n"])

    pre = ev.map_batches(extract, batch_format="pyarrow",
                         zero_copy_batch=True)
    agg = pre.groupby("event_type").aggregate(
        Sum("sum_k", alias_name="sum_k"), Sum("n", alias_name="n"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "sum_k": pc.cast(t["sum_k"], pa.int64()),
            "n": pc.cast(t["n"], pa.int64()),
        })
    return agg.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_PROPS_JSON = """
SELECT event_type,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
           AS sum_k,
       count(*) AS n
FROM events GROUP BY event_type
"""


# ======================================================================
# Registry
# ======================================================================
def q_events_graph_diff(sf_dir):
    """Temporal graph churn: the distinct user-transition edge sets
    of the event stream's two halves (split at the midpoint event_id
    = (min+max)//2, a data-derived constant both engines compute
    identically), reported as retained/added/removed counts plus
    edge-set Jaccard. One user_id shuffle builds both halves' pairs
    (half flag rides along); the distinct edge space is bounded by
    |types|^2 so the set compare is a driver-side table op."""
    ev = _events(sf_dir, ["user_id", "ts", "event_type", "event_id"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        out = []
        for h in (0, 1):
            a = g.loc[g["half"] == h, "event_type"].to_numpy()
            out.append(pd.DataFrame({
                "from_type": a[:-1], "to_type": a[1:],
                "half": np.full(max(len(a) - 1, 0), h,
                                dtype=np.int64)}))
        return pd.concat(out, ignore_index=True)

    lo = int(ev.min("event_id"))
    hi = int(ev.max("event_id"))
    mid = (lo + hi) // 2

    def with_half(t: pa.Table) -> pa.Table:
        half = pc.cast(pc.greater(t["event_id"], mid), pa.int64())
        return t.append_column("half", half)

    tagged = ev.map_batches(with_half, batch_format="pyarrow",
                            zero_copy_batch=True)
    dist = tagged.groupby("user_id").map_groups(
        pairs, batch_format="pandas") \
        .groupby(["from_type", "to_type", "half"]).aggregate(
            Count(alias_name="n")).to_pandas()
    e0 = set(map(tuple, dist.loc[dist["half"] == 0,
                                 ["from_type", "to_type"]].values))
    e1 = set(map(tuple, dist.loc[dist["half"] == 1,
                                 ["from_type", "to_type"]].values))
    inter, union = len(e0 & e1), len(e0 | e1)
    return pa.table({
        "n_retained": pa.array([inter], pa.int64()),
        "n_added": pa.array([len(e1 - e0)], pa.int64()),
        "n_removed": pa.array([len(e0 - e1)], pa.int64()),
        "jaccard": pa.array(round6([inter / union if union else 0.0])),
    })


SQL_EVENTS_GRAPH_DIFF = """
WITH mid AS (SELECT (min(event_id) + max(event_id)) // 2 AS m
             FROM events),
seq AS (
  SELECT e.event_type AS a,
         lead(e.event_type) OVER (
           PARTITION BY e.user_id, (e.event_id > mid.m)
           ORDER BY e.ts, e.event_id) AS b,
         CAST(e.event_id > mid.m AS BIGINT) AS half
  FROM events e CROSS JOIN mid),
ed AS (SELECT DISTINCT a, b, half FROM seq WHERE b IS NOT NULL),
e0 AS (SELECT a, b FROM ed WHERE half = 0),
e1 AS (SELECT a, b FROM ed WHERE half = 1),
i AS (SELECT count(*) AS n FROM e0 JOIN e1 USING (a, b)),
c0 AS (SELECT count(*) AS n FROM e0),
c1 AS (SELECT count(*) AS n FROM e1)
SELECT CAST(i.n AS BIGINT) AS n_retained,
       CAST(c1.n - i.n AS BIGINT) AS n_added,
       CAST(c0.n - i.n AS BIGINT) AS n_removed,
       round(CAST(i.n AS DOUBLE) / nullif(c0.n + c1.n - i.n, 0),
             6) AS jaccard
FROM i, c0, c1
"""


PATHS_TOPK = 10


def q_events_paths_topk(sf_dir):
    """Frequent 3-step event-type paths (clickstream path mining):
    per-user (ts, event_id)-ordered trigrams, counted over the tiny
    type^3 space, global top-10 with a total (n desc, path asc)
    order. One user_id shuffle + one bounded groupby."""
    ev = _events(sf_dir, ["user_id", "ts", "event_type", "event_id"])

    def tri(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        a = g["event_type"].to_numpy()
        return pd.DataFrame({"s1": a[:-2], "s2": a[1:-1],
                             "s3": a[2:]})

    paths = ev.groupby("user_id").map_groups(tri,
                                             batch_format="pandas")
    agg = paths.groupby(["s1", "s2", "s3"]).aggregate(
        Count(alias_name="n"))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:  # dataless shuffle partition
            return pa.table({"s1": pa.array([], pa.string()),
                             "s2": pa.array([], pa.string()),
                             "s3": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        return pa.table({
            "s1": pc.cast(t["s1"], pa.string()),
            "s2": pc.cast(t["s2"], pa.string()),
            "s3": pc.cast(t["s3"], pa.string()),
            "n": pc.cast(t["n"], pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow") \
        .sort(["n", "s1", "s2", "s3"],
              descending=[True, False, False, False]) \
        .limit(PATHS_TOPK)


SQL_EVENTS_PATHS_TOPK = f"""
WITH s AS (
  SELECT event_type AS s1,
         lead(event_type, 1) OVER w AS s2,
         lead(event_type, 2) OVER w AS s3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT s1, s2, s3, CAST(count(*) AS BIGINT) AS n
FROM s WHERE s3 IS NOT NULL
GROUP BY 1, 2, 3
ORDER BY n DESC, s1, s2, s3 LIMIT {PATHS_TOPK}
"""


def q_events_transitions(sf_dir):
    """Event-type Markov transitions: per-user event sequences
    ordered by (ts, event_id), bigram counts over consecutive events.
    One hash shuffle on user_id (``groupby.map_groups``), then a tiny
    groupby over the type-pair space."""
    ev = _events(sf_dir, ["user_id", "ts", "event_type", "event_id"])

    def trans(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        a = g["event_type"].to_numpy()
        return pd.DataFrame({"from_type": a[:-1], "to_type": a[1:]})

    pairs = ev.groupby("user_id").map_groups(trans,
                                             batch_format="pandas")
    agg = pairs.groupby(["from_type", "to_type"]).aggregate(
        Count(alias_name="n"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "from_type": pc.cast(t["from_type"], pa.string()),
            "to_type": pc.cast(t["to_type"], pa.string()),
            "n": pc.cast(t["n"], pa.int64()),
        })
    return agg.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_TRANSITIONS = """
WITH seq AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events)
SELECT event_type AS from_type, nxt AS to_type, count(*) AS n
FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
"""


def q_distinct_parts_per_supplier(sf_dir):
    """Exact distributed count-distinct: distinct parts per supplier.
    Per-batch (suppkey, partkey) dedup bounds what the single
    supplier-key shuffle carries at the distinct-pair count, then a
    per-group vectorised nunique."""
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_suppkey", "l_partkey"])

    def pre(t: pa.Table) -> pa.Table:
        return t.group_by(["l_suppkey", "l_partkey"]).aggregate([])

    def nunique(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_suppkey": [g["l_suppkey"].iloc[0]],
            "n_parts": np.array([g["l_partkey"].nunique()], np.int64),
        })

    return li.map_batches(pre, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("l_suppkey").map_groups(nunique, batch_format="pandas")


SQL_DISTINCT_PARTS_PER_SUPPLIER = """
SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts
FROM lineitem GROUP BY l_suppkey
"""


def q_hll_parts_per_supplier(sf_dir):
    """HyperLogLog approximate count-distinct per supplier
    (``stages/sketch.py``): 64-register mergeable sketch, per-batch
    partials, one (key, register) groupby — fixed state per group at
    any corpus size. The register layout keeps the estimator
    bit-identical to the SQL replica (dyadic partial sums)."""
    from ..stages import sketch as sk
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_suppkey", "l_partkey"])
    est = sk.hll_count_distinct(li, "l_suppkey", "l_partkey")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_suppkey": pc.cast(t["key"], pa.int64()),
            "hll_est": pa.array(round6(
                t["hll_est"].to_numpy(zero_copy_only=False))),
        })
    return est.map_batches(finish, batch_format="pyarrow")


def q_bloom_seen_parts(sf_dir):
    """Bloom-filter seen-set (``stages/sketch.py``): build the
    4096-bit / k=4 filter over the DISTINCT part keys appearing in
    lineitem (per-batch word-OR partials, O(1) driver state), then
    probe every part key plus a shifted non-member range. No false
    negatives by construction; the false-positive pattern is
    deterministic (md5 bit positions), so the SQL twin reproduces the
    ENTIRE output bit for bit — build and probe."""
    from ..stages import sketch as sk
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey"])
    words = sk.bloom_build(li, "l_partkey")
    pk = rd.read_parquet(f"{sf_dir}/part.parquet",
                         columns=["p_partkey"])

    def mk_probes(t: pa.Table) -> pa.Table:
        x = t["p_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"probe_id": pa.array(
            np.concatenate([x, x + 1_000_000]))})

    probes = pk.map_batches(mk_probes, batch_format="pyarrow",
                            zero_copy_batch=True)
    return sk.bloom_contains(probes, "probe_id", words)


SQL_BLOOM_SEEN_PARTS = """
WITH ins AS (SELECT DISTINCT l_partkey AS x FROM lineitem),
js AS (SELECT unnest([0, 1, 2, 3]) AS j),
ipos AS (SELECT (('0x' || substr(md5(CAST(j AS VARCHAR) || ':'
                                     || CAST(x AS VARCHAR)), 1, 16))
                 ::UBIGINT % 4096) AS pos
         FROM ins CROSS JOIN js),
words AS (SELECT pos // 64 AS w,
                 bit_or(1::UBIGINT << CAST(pos % 64 AS INT)) AS bits
          FROM ipos GROUP BY 1),
probes AS (SELECT CAST(p_partkey AS BIGINT) AS probe_id FROM part
           UNION ALL
           SELECT CAST(p_partkey AS BIGINT) + 1000000 FROM part),
ppos AS (SELECT probe_id, j,
                (('0x' || substr(md5(CAST(j AS VARCHAR) || ':'
                     || CAST(probe_id AS VARCHAR)), 1, 16))
                 ::UBIGINT % 4096) AS pos
         FROM probes CROSS JOIN js),
hits AS (SELECT probe_id, j,
                coalesce(((w.bits >> CAST(pos % 64 AS INT))
                          & 1) = 1, FALSE) AS b
         FROM ppos LEFT JOIN words w ON w.w = pos // 64)
SELECT probe_id,
       CAST(CASE WHEN bool_and(b) THEN 1 ELSE 0 END AS BIGINT)
           AS maybe_present
FROM hits GROUP BY probe_id
"""


SQL_HLL_PARTS_PER_SUPPLIER = """
WITH d AS (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem),
h AS (SELECT l_suppkey,
             ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8))
               ::UBIGINT AS h
      FROM d),
b AS (SELECT l_suppkey, CAST(h >> 26 AS BIGINT) AS bucket,
             CAST(h % 67108864 AS BIGINT) AS rem
      FROM h),
b2 AS (SELECT l_suppkey, bucket,
              CASE WHEN rem = 0 THEN 27
                   ELSE 26 - (SELECT max(kk)
                              FROM generate_series(0, 26) g(kk)
                              WHERE rem >= (CAST(1 AS BIGINT) << kk))
              END AS rho
       FROM b),
r AS (SELECT l_suppkey, bucket, max(rho) AS rho
      FROM b2 GROUP BY 1, 2),
agg AS (SELECT l_suppkey, 64 - count(*) AS v_empty,
               sum(CAST(1 AS BIGINT) << (27 - rho))
                 + (64 - count(*)) * 134217728 AS s_int
        FROM r GROUP BY 1)
SELECT l_suppkey,
       round(CASE WHEN ((0.7213 / (1 + 1.079 / 64)) * 64 * 64)
                       / (s_int / 134217728.0) <= 160.0
                       AND v_empty > 0
                  THEN 64 * ln(64.0 / v_empty)
                  ELSE ((0.7213 / (1 + 1.079 / 64)) * 64 * 64)
                       / (s_int / 134217728.0)
             END, 6) AS hll_est
FROM agg
"""


def q_events_window_hll(sf_dir):
    """Approximate distinct users per tumbling 1-hour window: the
    same mergeable 64-register HLL as ``hll_parts_per_supplier``
    keyed by the window start (epoch_us // 3.6e9). Per-batch
    partials keep the shuffle at 64 rows per window regardless of
    event volume — the streaming cardinality pattern."""
    from ..stages import sketch as sk
    ev = _events(sf_dir, ["ts", "user_id"])

    def wk(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").view(np.int64)
        return pa.table({
            "wkey": pa.array((ts // 3_600_000_000).astype(np.int64)),
            "user_id": t["user_id"],
        })

    keyed = ev.map_batches(wk, batch_format="pyarrow",
                           zero_copy_batch=True)
    est = sk.hll_count_distinct(keyed, "wkey", "user_id")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "window_h": pc.cast(t["key"], pa.int64()),
            "hll_est": pa.array(round6(
                t["hll_est"].to_numpy(zero_copy_only=False))),
        })
    return est.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_WINDOW_HLL = """
WITH d AS (SELECT DISTINCT epoch_us(ts) // 3600000000 AS window_h,
                           user_id
           FROM events),
h AS (SELECT window_h,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
               ::UBIGINT AS h
      FROM d),
b AS (SELECT window_h, CAST(h >> 26 AS BIGINT) AS bucket,
             CAST(h % 67108864 AS BIGINT) AS rem
      FROM h),
b2 AS (SELECT window_h, bucket,
              CASE WHEN rem = 0 THEN 27
                   ELSE 26 - (SELECT max(kk)
                              FROM generate_series(0, 26) g(kk)
                              WHERE rem >= (CAST(1 AS BIGINT) << kk))
              END AS rho
       FROM b),
r AS (SELECT window_h, bucket, max(rho) AS rho
      FROM b2 GROUP BY 1, 2),
agg AS (SELECT window_h, 64 - count(*) AS v_empty,
               sum(CAST(1 AS BIGINT) << (27 - rho))
                 + (64 - count(*)) * 134217728 AS s_int
        FROM r GROUP BY 1)
SELECT CAST(window_h AS BIGINT) AS window_h,
       round(CASE WHEN ((0.7213 / (1 + 1.079 / 64)) * 64 * 64)
                       / (s_int / 134217728.0) <= 160.0
                       AND v_empty > 0
                  THEN 64 * ln(64.0 / v_empty)
                  ELSE ((0.7213 / (1 + 1.079 / 64)) * 64 * 64)
                       / (s_int / 134217728.0)
             END, 6) AS hll_est
FROM agg
"""


TOPN_PER_CUST = 3


def q_top_orders_per_cust(sf_dir):
    """Windowed rank: top-3 orders per customer by (totalprice desc,
    orderkey asc). Per-batch partial top-3 per key prunes the shuffle
    to <= 3 rows per (batch, key); final rank in a per-key group."""
    od = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_orderkey",
                                  "o_totalprice"])

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                            ascending=[True, False, True])
        return df.groupby("o_custkey", as_index=False,
                          sort=False).head(TOPN_PER_CUST)

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_totalprice", "o_orderkey"],
                          ascending=[False, True]) \
            .head(TOPN_PER_CUST).reset_index(drop=True)
        return pd.DataFrame({
            "o_custkey": g["o_custkey"],
            "o_orderkey": g["o_orderkey"],
            "o_totalprice": round6(g["o_totalprice"].to_numpy()),
            "rn": np.arange(1, len(g) + 1, dtype=np.int64),
        })

    return od.map_batches(pre, batch_format="pandas") \
        .groupby("o_custkey").map_groups(rank, batch_format="pandas")


SQL_TOP_ORDERS_PER_CUST = f"""
WITH w AS (
  SELECT o_custkey, o_orderkey, round(o_totalprice, 6) AS o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey)
           AS rn
  FROM orders)
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
FROM w WHERE rn <= {TOPN_PER_CUST}
"""


CLOSENESS_SEEDS = 4


def q_closeness_co(sf_dir):
    """Closeness centrality for the 4 smallest active vertices of the
    co graph: one multi-source BSP BFS (``superstep.multi_bfs`` —
    per-partition (k, n/P) distance planes, messages pre-aggregated
    by destination partition), closeness = reached / sum(dist)."""
    g = _co_distgraph(sf_dir)
    act = g.active_global()
    seeds = np.flatnonzero(act)[:CLOSENESS_SEEDS].astype(np.int64)
    dist, _ = ss.multi_bfs(g, seeds)
    INF = np.iinfo(np.int64).max
    reach = ((dist < INF) & (dist > 0)).sum(axis=1).astype(np.int64)
    sum_d = np.where(dist < INF, dist, 0).sum(axis=1)
    clo = np.where(sum_d > 0, reach / np.where(sum_d > 0, sum_d, 1), 0.0)
    return pa.table({"vid": pa.array(seeds),
                     "n_reached": pa.array(reach),
                     "closeness": pa.array(round6(clo))})


SQL_CLOSENESS_CO = f"""
WITH RECURSIVE
{_SQL_CO_EDGES_BOTH},
seeds AS (SELECT a AS s FROM e GROUP BY a ORDER BY a
          LIMIT {CLOSENESS_SEEDS}),
bfs(s, v, d) AS (
  SELECT s, s, 0 FROM seeds
  UNION
  SELECT bfs.s, e.b, bfs.d + 1 FROM bfs JOIN e ON e.a = bfs.v
  WHERE bfs.d < 30
),
sd AS (SELECT s, v, min(d) AS d FROM bfs GROUP BY s, v)
SELECT s AS vid,
       CAST(count(*) FILTER (WHERE d > 0) AS BIGINT) AS n_reached,
       round(count(*) FILTER (WHERE d > 0) / sum(d), 6) AS closeness
FROM sd GROUP BY s
"""


def q_orders_rollup(sf_dir):
    """Grouping-sets rollup over (status, year): ONE per-batch
    partial aggregate at the finest level feeds all three levels; the
    (tiny) subtotal and grand-total rows derive from the finest
    groupby output, so the input is shuffled once, pre-aggregated."""
    od = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderstatus", "o_orderdate",
                                  "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        yr = pc.year(t["o_orderdate"])
        # sum exact integer cents so subtotal sums are
        # order-independent (float += order differs engine vs oracle)
        cents = np.floor(
            t["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64)
        tt = pa.table({"o_orderstatus": t["o_orderstatus"],
                       "yr": pc.cast(yr, pa.int64()),
                       "cents": pa.array(cents)})
        return tt.group_by(["o_orderstatus", "yr"]).aggregate(
            [("cents", "sum"), ([], "count_all")]) \
            .rename_columns(["o_orderstatus", "yr", "sum_cents",
                             "n_orders"])

    fine = od.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby(["o_orderstatus", "yr"]).aggregate(
            Sum("sum_cents", alias_name="sum_cents"),
            Sum("n_orders", alias_name="n_orders")) \
        .to_pandas()          # finest level: |status| x |years| rows
    lvl0 = fine.assign(yr=fine["yr"].astype(np.int64).astype(str))
    lvl1 = fine.groupby("o_orderstatus", as_index=False)[
        ["sum_cents", "n_orders"]].sum().assign(yr="ALL")
    lvl2 = pd.DataFrame({"o_orderstatus": ["ALL"], "yr": ["ALL"],
                         "sum_cents": [fine["sum_cents"].sum()],
                         "n_orders": [fine["n_orders"].sum()]})
    out = pd.concat([lvl0, lvl1, lvl2], ignore_index=True)
    return pd.DataFrame({
        "o_orderstatus": out["o_orderstatus"],
        "yr": out["yr"],
        "n_orders": out["n_orders"].astype(np.int64),
        "sum_price": round6(
            out["sum_cents"].to_numpy(np.int64) / 100.0),
    })


SQL_ORDERS_ROLLUP = """
SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
       COALESCE(CAST(year(o_orderdate) AS VARCHAR), 'ALL') AS yr,
       count(*) AS n_orders,
       round(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             / 100.0, 6) AS sum_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, year(o_orderdate))
"""


def q_cust_no_finished_order(sf_dir):
    """Broadcast anti-join: customers with no finished ('F') order.
    The distinct blocked-key set (bounded by the customer count) is
    built with per-batch dedup + a driver union, shipped once via
    ``ray.put``, and each customer batch filters vectorised — no
    all-to-all shuffle. For a blocked side past driver memory the
    hash-shuffle groupby anti-join replaces the broadcast."""
    import ray as _ray
    od = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_orderstatus"]) \
        .filter(expr="o_orderstatus == 'F'")

    def keys(t: pa.Table) -> pa.Table:
        return pa.table({"k": pc.unique(t["o_custkey"])})

    parts = [b["k"] for b in od.map_batches(
        keys, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow")]
    blocked = np.unique(np.concatenate(
        [p.to_numpy(zero_copy_only=False) for p in parts])
        if parts else np.array([], dtype=np.int64))
    blocked_ref = _ray.put(blocked)

    cu = rd.read_parquet(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name"])

    def anti(t: pa.Table) -> pa.Table:
        bl = _ray.get(blocked_ref)
        keep = ~np.isin(t["c_custkey"].to_numpy(), bl)
        return t.filter(pa.array(keep))

    return cu.map_batches(anti, batch_format="pyarrow")


SQL_CUST_NO_FINISHED_ORDER = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderstatus = 'F')
"""


def q_cust_order_counts(sf_dir):
    """Left outer join with zero-fill: per-customer order count.
    The aggregated side (one row per custkey, bounded by the customer
    count) broadcasts once via ``ray.put``; each customer batch
    attaches its count vectorised via ``searchsorted`` — no
    all-to-all join shuffle for an aggregate-then-join pattern."""
    import ray as _ray
    od = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey"])

    def pre(t: pa.Table) -> pa.Table:
        return t.group_by("o_custkey").aggregate([([], "count_all")]) \
            .rename_columns(["o_custkey", "n"])

    counts = od.map_batches(pre, batch_format="pyarrow") \
        .groupby("o_custkey").aggregate(Sum("n", alias_name="n")) \
        .to_pandas()
    keys = counts["o_custkey"].to_numpy(np.int64)
    vals = counts["n"].to_numpy(np.int64)
    order = np.argsort(keys)
    ref = _ray.put((keys[order], vals[order]))

    cu = rd.read_parquet(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey"])

    def attach(t: pa.Table) -> pa.Table:
        k, v = _ray.get(ref)
        ck = t["c_custkey"].to_numpy()
        pos = np.searchsorted(k, ck)
        pos_c = np.clip(pos, 0, len(k) - 1)
        hit = (len(k) > 0) & (k[pos_c] == ck)
        n = np.where(hit, v[pos_c], 0).astype(np.int64)
        return pa.table({"c_custkey": t["c_custkey"],
                         "n_orders": pa.array(n)})

    return cu.map_batches(attach, batch_format="pyarrow")


SQL_CUST_ORDER_COUNTS = """
SELECT c_custkey, CAST(COALESCE(o.n, 0) AS BIGINT) AS n_orders
FROM customer
LEFT JOIN (SELECT o_custkey, count(*) AS n FROM orders
           GROUP BY o_custkey) o
  ON o.o_custkey = c_custkey
"""


QBIN_SCALE = 16


def q_events_quantiles_approx(sf_dir):
    """Streaming approximate quantiles via a fixed-bin histogram
    sketch (bin = floor(value * 16)): per-batch integer bin counts,
    one tiny (type, bin) groupby, cumulative pick of the first bin
    whose running count reaches ceil(q * n). All-integer decisions —
    deterministic, mergeable, O(bins) state per group at any corpus
    size (the exact-sort path is ``events_quantiles``). Reported
    value = bin upper edge (bin + 1) / 16."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        b = np.floor(t["value"].to_numpy() * QBIN_SCALE).astype(np.int64)
        tt = pa.table({"event_type": t["event_type"],
                       "bin": pa.array(b)})
        return tt.group_by(["event_type", "bin"]).aggregate(
            [([], "count_all")]) \
            .rename_columns(["event_type", "bin", "n"])

    hist = ev.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby(["event_type", "bin"]).aggregate(
            Sum("n", alias_name="n"))

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bin")
        bins = g["bin"].to_numpy(np.int64)
        cum = g["n"].to_numpy(np.int64).cumsum()
        n = int(cum[-1])

        def q_at(q):
            target = int(np.ceil(q * n))
            return (bins[np.searchsorted(cum, target)] + 1) / QBIN_SCALE
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "n": np.array([n], np.int64),
            "p50": round6([q_at(0.5)]),
            "p90": round6([q_at(0.9)]),
            "p99": round6([q_at(0.99)]),
        })

    return hist.groupby("event_type").map_groups(pick,
                                                 batch_format="pandas")


SQL_EVENTS_QUANTILES_APPROX = f"""
WITH h AS (SELECT event_type,
                  CAST(floor(value * {QBIN_SCALE}) AS BIGINT) AS bin,
                  count(*) AS n
           FROM events GROUP BY 1, 2),
c AS (SELECT event_type, bin, n,
             sum(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             sum(n) OVER (PARTITION BY event_type) AS total
      FROM h)
SELECT event_type, CAST(max(total) AS BIGINT) AS n,
       round((min(CASE WHEN cum >= ceil(0.5 * total) THEN bin END) + 1)
             / {QBIN_SCALE}.0, 6) AS p50,
       round((min(CASE WHEN cum >= ceil(0.9 * total) THEN bin END) + 1)
             / {QBIN_SCALE}.0, 6) AS p90,
       round((min(CASE WHEN cum >= ceil(0.99 * total) THEN bin END) + 1)
             / {QBIN_SCALE}.0, 6) AS p99
FROM c GROUP BY event_type
"""


SPATH_MAX_D = 6


def q_spath_counts_co(sf_dir):
    """Shortest-path counts (Brandes' sigma) from the smallest
    active vertex of the co graph, to vertices within 6 hops: the
    level-synchronous integer BSP kernel ``superstep.spath_counts``
    — exact path counts, which is what makes the iterative part of
    betweenness driver-verifiable (the float dependency sweep is
    pinned by pytest against serial Brandes)."""
    g = _co_distgraph(sf_dir)
    act = g.active_global()
    source = int(np.flatnonzero(act)[0])
    dist, sigma = ss.spath_counts(g, source)
    INF = np.iinfo(np.int64).max
    keep = np.flatnonzero((dist < INF) & (dist <= SPATH_MAX_D))
    return pa.table({"vid": pa.array(keep.astype(np.int64)),
                     "dist": pa.array(dist[keep]),
                     "n_paths": pa.array(sigma[keep])})


def _sigma_levels_sql(max_d):
    """Chained per-level aggregation CTEs (recursive CTEs cannot
    aggregate): l_d = sum of l_{d-1} sigmas over edges into
    still-unseen vertices."""
    # MATERIALIZED: DuckDB inlines plain CTEs at every reference, so
    # the chained levels re-evaluate exponentially without it
    parts = ["l0 AS MATERIALIZED "
             "(SELECT v, CAST(1 AS HUGEINT) AS sigma FROM s)"]
    union = ["SELECT v, 0 AS d, sigma FROM l0"]
    for d in range(1, max_d + 1):
        seen = " UNION ALL ".join(
            f"SELECT v FROM l{k}" for k in range(d))
        parts.append(
            f"l{d} AS MATERIALIZED "
            f"(SELECT e.b AS v, sum(l{d-1}.sigma) AS sigma\n"
            f"  FROM l{d-1} JOIN e ON e.a = l{d-1}.v\n"
            f"  WHERE e.b NOT IN ({seen}) GROUP BY e.b)")
        union.append(f"SELECT v, {d} AS d, sigma FROM l{d}")
    return ",\n".join(parts), " UNION ALL ".join(union)


_SIG_CTES, _SIG_UNION = _sigma_levels_sql(SPATH_MAX_D)

SQL_SPATH_COUNTS_CO = f"""
WITH
{_SQL_CO_EDGES_BOTH_MAT},
s AS (SELECT min(a) AS v FROM e),
{_SIG_CTES}
SELECT v AS vid, CAST(d AS BIGINT) AS dist,
       CAST(sigma AS BIGINT) AS n_paths
FROM ({_SIG_UNION})
"""


BETWEENNESS_SEEDS = 3


def q_betweenness_co(sf_dir):
    """Seed-sampled betweenness centrality (Brandes) on the co
    graph: forward integer sigma BSP + backward float dependency
    sweep (``superstep.betweenness``). The float accumulation is not
    SQL-expressible order-stably, so this row is rows-only at the
    driver; the sweep is pinned by
    ``tests/test_dist.py::test_betweenness_matches_serial`` and the
    integer forward pass is driver-verified via ``spath_counts_co``."""
    g = _co_distgraph(sf_dir)
    act = g.active_global()
    seeds = np.flatnonzero(act)[:BETWEENNESS_SEEDS].astype(np.int64)
    bc = ss.betweenness(g, seeds)
    vids = np.flatnonzero(act).astype(np.int64)
    return pa.table({"vid": pa.array(vids),
                     "betweenness": pa.array(round6(bc[vids]))})


DOC_LANGS = ("de", "en", "es", "fr", "zh")


def q_docs_pivot_lang(sf_dir):
    """Pivot / conditional aggregation: documents per source with one
    count column per language. The pivot happens INSIDE the per-batch
    partial (one int64 column per known language), so the shuffle
    carries |sources| x (|langs|+1) integers, not the document rows."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        lang = t["lang"].to_numpy(zero_copy_only=False)
        cols = {"source": t["source"]}
        for lg in DOC_LANGS:
            cols[f"n_{lg}"] = pa.array(
                (lang == lg).astype(np.int64))
        return pa.table(cols).group_by("source").aggregate(
            [(f"n_{lg}", "sum") for lg in DOC_LANGS]) \
            .rename_columns(["source"] + [f"n_{lg}" for lg in DOC_LANGS])

    agg = docs.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True) \
        .groupby("source").aggregate(
            *[Sum(f"n_{lg}", alias_name=f"n_{lg}") for lg in DOC_LANGS])

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {"source": t["source"],
             **{f"n_{lg}": pc.cast(t[f"n_{lg}"], pa.int64())
                for lg in DOC_LANGS}})
    return agg.map_batches(finish, batch_format="pyarrow")


SQL_DOCS_PIVOT_LANG = """
SELECT source,
       count(*) FILTER (WHERE lang = 'de') AS n_de,
       count(*) FILTER (WHERE lang = 'en') AS n_en,
       count(*) FILTER (WHERE lang = 'es') AS n_es,
       count(*) FILTER (WHERE lang = 'fr') AS n_fr,
       count(*) FILTER (WHERE lang = 'zh') AS n_zh
FROM documents GROUP BY source
"""


EXCEPT_THRESHOLD = 200


def q_users_click_no_signup(sf_dir):
    """Set difference (EXCEPT): users with a high-value (>200) click
    but no high-value signup. One user_id shuffle of per-batch
    boolean partials, then a vectorised flag filter — both sides of
    the EXCEPT come from a single pass over the events."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "value"]) \
        .filter(expr=f"value > {EXCEPT_THRESHOLD}")

    def partial(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": t["user_id"],
            "saw": pa.array((et == "click").astype(np.int64)),
            "bought": pa.array((et == "signup").astype(np.int64)),
        }).group_by("user_id").aggregate(
            [("saw", "max"), ("bought", "max")]) \
            .rename_columns(["user_id", "saw", "bought"])

    from ray.data.aggregate import Max
    agg = ev.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("user_id").aggregate(
            Max("saw", alias_name="saw"),
            Max("bought", alias_name="bought"))

    def finish(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.equal(t["saw"], 1), pc.equal(t["bought"], 0))
        return t.filter(keep).select(["user_id"])
    return agg.map_batches(finish, batch_format="pyarrow")


SQL_USERS_CLICK_NO_SIGNUP = f"""
SELECT DISTINCT user_id FROM events
WHERE event_type = 'click' AND value > {EXCEPT_THRESHOLD}
EXCEPT
SELECT DISTINCT user_id FROM events
WHERE event_type = 'signup' AND value > {EXCEPT_THRESHOLD}
"""


BIGRAM_TOP_K = 20


def q_bigram_topk(sf_dir):
    """Top-20 adjacent-token collocations over the corpus
    (``stages/text.bigram_top_terms``): flatten + parent-index
    pairing, per-batch pair counts — the bigram vocabulary, not the
    token stream, is what shuffles."""
    return tx.bigram_top_terms(_docs(sf_dir), k=BIGRAM_TOP_K)


SQL_BIGRAM_TOPK = f"""
WITH t AS (SELECT doc_id, list_filter(
             regexp_split_to_array(lower(text), '[^a-z0-9]+'),
             x -> x <> '') AS arr
           FROM documents),
tok AS (SELECT doc_id, unnest(arr) AS w,
               generate_subscripts(arr, 1) AS i FROM t),
seq AS (SELECT w AS a,
               lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS b
        FROM tok),
agg AS (SELECT a, b, count(*) AS n FROM seq WHERE b IS NOT NULL
        GROUP BY a, b)
SELECT a, b, n FROM agg ORDER BY n DESC, a, b LIMIT {BIGRAM_TOP_K}
"""


def q_eccentricity_co(sf_dir):
    """Eccentricity (max finite hop distance) of the 4 smallest
    active co-graph vertices — a diameter probe from the same
    ``multi_bfs`` distance planes as closeness."""
    g = _co_distgraph(sf_dir)
    act = g.active_global()
    seeds = np.flatnonzero(act)[:CLOSENESS_SEEDS].astype(np.int64)
    dist, _ = ss.multi_bfs(g, seeds)
    INF = np.iinfo(np.int64).max
    ecc = np.where(dist < INF, dist, 0).max(axis=1).astype(np.int64)
    return pa.table({"vid": pa.array(seeds),
                     "eccentricity": pa.array(ecc)})


SQL_ECCENTRICITY_CO = f"""
WITH RECURSIVE
{_SQL_CO_EDGES_BOTH},
seeds AS (SELECT a AS s FROM e GROUP BY a ORDER BY a
          LIMIT {CLOSENESS_SEEDS}),
bfs(s, v, d) AS (
  SELECT s, s, 0 FROM seeds
  UNION
  SELECT bfs.s, e.b, bfs.d + 1 FROM bfs JOIN e ON e.a = bfs.v
  WHERE bfs.d < 30
),
sd AS (SELECT s, v, min(d) AS d FROM bfs GROUP BY s, v)
SELECT s AS vid, CAST(max(d) AS BIGINT) AS eccentricity
FROM sd GROUP BY s
"""


FUNNEL_WINDOW_H = 72


def q_events_funnel(sf_dir):
    """Ordered-sequence funnel: per user, first 'view', then the
    first 'click' within 72 h of it, then any 'purchase' within 72 h
    of that click (order = strictly increasing (ts, event_id)). One
    user_id hash shuffle; the per-group check is a vectorised
    running-stage scan. Output = users per deepest stage (0-3)."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])
    stages = ("view", "click", "purchase")
    win = np.timedelta64(FUNNEL_WINDOW_H, "h")

    def funnel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        et = g["event_type"].to_numpy()
        ts = g["ts"].to_numpy()
        stage, deadline = 0, None
        for s in stages:
            ok = et == s
            if deadline is not None:
                ok &= ts <= deadline
            hit = np.flatnonzero(ok)
            if len(hit) == 0:
                break
            stage += 1
            deadline = ts[hit[0]] + win
            et, ts = et[hit[0] + 1:], ts[hit[0] + 1:]
        return pd.DataFrame({"user_id": [g["user_id"].iloc[0]],
                             "stage": np.array([stage], np.int64)})

    per_user = ev.groupby("user_id").map_groups(funnel,
                                                batch_format="pandas")

    def agg(t: pa.Table) -> pa.Table:
        return t.group_by("stage").aggregate([([], "count_all")]) \
            .rename_columns(["stage", "n_users"])

    return per_user.map_batches(agg, batch_format="pyarrow") \
        .groupby("stage").aggregate(Sum("n_users",
                                        alias_name="n_users")) \
        .map_batches(lambda t: pa.table({
            "stage": pc.cast(t["stage"], pa.int64()),
            "n_users": pc.cast(t["n_users"], pa.int64())}),
            batch_format="pyarrow")


SQL_EVENTS_FUNNEL = """
WITH v AS (SELECT user_id,
                  min(CASE WHEN event_type = 'view'
                      THEN (ts, event_id) END) AS k1
           FROM events GROUP BY user_id),
c AS (SELECT ev.user_id,
             min(CASE WHEN event_type = 'click'
                  AND (ev.ts, ev.event_id) > v.k1
                  AND ev.ts <= v.k1[1] + INTERVAL 72 HOUR
                 THEN (ev.ts, ev.event_id) END) AS k2
      FROM events ev JOIN v USING (user_id)
      WHERE v.k1 IS NOT NULL GROUP BY ev.user_id),
p AS (SELECT ev.user_id,
             count(CASE WHEN event_type = 'purchase'
                    AND (ev.ts, ev.event_id) > c.k2
                    AND ev.ts <= c.k2[1] + INTERVAL 72 HOUR
                   THEN 1 END) AS np
      FROM events ev JOIN c USING (user_id)
      WHERE c.k2 IS NOT NULL GROUP BY ev.user_id),
stages AS (
  SELECT v.user_id,
         CASE WHEN v.k1 IS NULL THEN 0
              WHEN c.k2 IS NULL THEN 1
              WHEN COALESCE(p.np, 0) = 0 THEN 2
              ELSE 3 END AS stage
  FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id))
SELECT stage, count(*) AS n_users FROM stages GROUP BY stage
"""


MIS_SQL_ROUNDS = 12


def q_mis_co(sf_dir):
    """Maximal independent set on the co graph via deterministic Luby
    rounds (``superstep.luby_mis``): the classic BSP symmetry-breaking
    primitive — a vertex joins when its per-round hash priority beats
    every active neighbour's, then deactivates its neighbourhood.
    Output = the MIS membership."""
    g = _co_distgraph(sf_dir)
    state, rounds = ss.luby_mis(g)
    assert rounds <= MIS_SQL_ROUNDS, \
        f"Luby took {rounds} rounds; raise MIS_SQL_ROUNDS"
    vids = np.flatnonzero(state == 1).astype(np.int64)
    return pa.table({"vid": pa.array(vids)})


def _mis_rounds_sql(max_r):
    """Round-unrolled Luby oracle (materialized — see sigma note):
    c_r = active local-priority minima, m advances, a shrinks by the
    joined set and its neighbourhood. Extra rounds no-op once a is
    empty, so unrolling past convergence is safe."""
    def key(col, r):
        return (f"(((({col}) % 1000003) * 7919 + ({r} % 1000003) * "
                f"104729) % 1000003) * 100000000 + ({col})")
    parts = [
        "a0 AS MATERIALIZED (SELECT DISTINCT a AS v FROM e)",
        "m0 AS MATERIALIZED (SELECT CAST(NULL AS BIGINT) AS v "
        "WHERE FALSE)",
    ]
    for r in range(max_r):
        parts.append(
            f"c{r} AS MATERIALIZED (SELECT av.v FROM a{r} av\n"
            f"  WHERE NOT EXISTS (SELECT 1 FROM e JOIN a{r} nb\n"
            f"    ON nb.v = e.b WHERE e.a = av.v\n"
            f"    AND {key('nb.v', r)} < {key('av.v', r)}))")
        parts.append(
            f"m{r + 1} AS MATERIALIZED (SELECT v FROM m{r}\n"
            f"  UNION ALL SELECT v FROM c{r})")
        parts.append(
            f"a{r + 1} AS MATERIALIZED (SELECT v FROM a{r}\n"
            f"  WHERE v NOT IN (SELECT v FROM c{r})\n"
            f"  AND v NOT IN (SELECT e.b FROM e JOIN c{r} cc\n"
            f"                ON e.a = cc.v))")
    return ",\n".join(parts), f"m{max_r}"


_MIS_CTES, _MIS_FINAL = _mis_rounds_sql(MIS_SQL_ROUNDS)

SQL_MIS_CO = f"""
WITH
{_SQL_CO_EDGES_BOTH_MAT},
{_MIS_CTES}
SELECT v AS vid FROM {_MIS_FINAL}
"""


WEEK_US = 604_800 * 1_000_000


def q_cohort_retention(sf_dir):
    """Cohort retention: users grouped by first-seen week; for each
    (cohort_week, week_offset) the count of users active that week.
    One user_id hash shuffle; each group emits its (cohort, offset)
    pairs, then a tiny second groupby counts — the event stream never
    shuffles twice."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        w = np.unique(g["ts"].to_numpy().astype("datetime64[us]")
                      .astype(np.int64) // WEEK_US)
        return pd.DataFrame({"cohort_week": np.full(len(w), w[0]),
                             "week_offset": w - w[0]})

    pairs = ev.groupby("user_id").map_groups(per_user,
                                             batch_format="pandas")

    def pre(t: pa.Table) -> pa.Table:
        return t.group_by(["cohort_week", "week_offset"]).aggregate(
            [([], "count_all")]) \
            .rename_columns(["cohort_week", "week_offset", "n_users"])

    return pairs.map_batches(pre, batch_format="pyarrow") \
        .groupby(["cohort_week", "week_offset"]).aggregate(
            Sum("n_users", alias_name="n_users")) \
        .map_batches(lambda t: pa.table({
            "cohort_week": pc.cast(t["cohort_week"], pa.int64()),
            "week_offset": pc.cast(t["week_offset"], pa.int64()),
            "n_users": pc.cast(t["n_users"], pa.int64())}),
            batch_format="pyarrow")


SQL_COHORT_RETENTION = """
WITH u AS (SELECT user_id,
                  CAST(floor(epoch(min(ts)) / 604800) AS BIGINT) AS cw
           FROM events GROUP BY user_id),
act AS (SELECT DISTINCT user_id,
               CAST(floor(epoch(ts) / 604800) AS BIGINT) AS w
        FROM events)
SELECT u.cw AS cohort_week, act.w - u.cw AS week_offset,
       count(*) AS n_users
FROM act JOIN u USING (user_id) GROUP BY 1, 2
"""


def q_coloring_co(sf_dir):
    """Greedy distributed graph coloring (iterated Luby MIS layers,
    ``superstep.mis_coloring``) on the co graph. Rows-only at the
    driver: the colour count depends on iterate-to-fixed-point MIS
    layers (too deep to unroll in SQL); properness, completeness and
    parallelism-invariance are pinned by
    ``tests/test_dist.py::test_mis_coloring_valid_and_invariant``,
    and the single-layer MIS primitive is driver-verified via
    ``mis_co``."""
    g = _co_distgraph(sf_dir)
    colors, _ = ss.mis_coloring(g)
    vids = np.flatnonzero(colors >= 0).astype(np.int64)
    return pa.table({"vid": pa.array(vids),
                     "color": pa.array(colors[vids])})


def q_betweenness_paths(sf_dir):
    """Planted SQL-green twin for the Brandes sweep: one simple path
    per nation (suppliers in suppkey order), seeds = the min-suppkey
    end of each path. Shortest paths on a path are unique, so the
    dependency of the vertex at position i in a k-path is exactly
    k-1-i (0 for the seed) — integral, hence order-stable, hence
    SQL-expressible. Runs the full distributed forward-sigma +
    backward-dependency schedule of ``superstep.betweenness``."""
    from ..dist.blocks import symmetrize_edges
    n = tg.supplier_count(sf_dir)
    g = DistGraph.from_dataset(
        symmetrize_edges(tg.nation_path_edges(sf_dir)),
        n=n, P=8, directed=False, dedup=False)
    su = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sk = su["s_suppkey"].to_numpy(np.int64)
    nk = su["s_nationkey"].to_numpy(np.int64)
    counts = np.bincount(nk)
    order = np.lexsort((sk, nk))
    sk_s, nk_s = sk[order], nk[order]
    first = np.r_[True, nk_s[1:] != nk_s[:-1]]
    seeds = np.sort(sk_s[first & (counts[nk_s] >= 2)])
    bc = ss.betweenness(g, seeds)
    vids = np.sort(sk[counts[nk] >= 2])
    return pa.table({"vid": pa.array(vids),
                     "betweenness": pa.array(round6(bc[vids]))})


SQL_BETWEENNESS_PATHS = """
WITH s2 AS (SELECT s_suppkey,
                   count(*) OVER (PARTITION BY s_nationkey) AS k,
                   row_number() OVER (PARTITION BY s_nationkey
                                      ORDER BY s_suppkey) - 1 AS pos
            FROM supplier)
SELECT CAST(s_suppkey AS BIGINT) AS vid,
       round(CAST(CASE WHEN pos = 0 THEN 0 ELSE k - 1 - pos END
                  AS DOUBLE), 6) AS betweenness
FROM s2 WHERE k >= 2
"""


def q_coloring_cliques(sf_dir):
    """Planted SQL-green twin for Luby-layer coloring: on disjoint
    nation cliques every MIS layer removes exactly one vertex per
    remaining clique (independence => at most one; maximality => at
    least one), so a k-clique consumes colors 0..k-1 exactly. The
    per-nation profile (distinct colors, min, max) is closed-form
    without replicating hash priorities, and pins properness +
    completeness of ``superstep.mis_coloring`` through the
    distributed schedule."""
    from ..dist.blocks import symmetrize_edges
    import pandas as pd
    n = tg.supplier_count(sf_dir)
    g = DistGraph.from_dataset(
        symmetrize_edges(tg.nation_clique_edges(sf_dir)),
        n=n, P=8, directed=False, dedup=False)
    colors, _ = ss.mis_coloring(g)
    su = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sk = su["s_suppkey"].to_numpy(np.int64)
    nk = su["s_nationkey"].to_numpy(np.int64)
    counts = np.bincount(nk)
    keep = counts[nk] >= 2
    df = pd.DataFrame({"nationkey": nk[keep],
                       "color": colors[sk[keep]]})
    agg = df.groupby("nationkey")["color"] \
        .agg(["nunique", "min", "max"]).reset_index()
    return pa.table({
        "nationkey": pa.array(agg["nationkey"].to_numpy(np.int64)),
        "n_colors": pa.array(agg["nunique"].to_numpy(np.int64)),
        "min_color": pa.array(agg["min"].to_numpy(np.int64)),
        "max_color": pa.array(agg["max"].to_numpy(np.int64)),
    })


SQL_COLORING_CLIQUES = """
SELECT CAST(s_nationkey AS BIGINT) AS nationkey,
       CAST(count(*) AS BIGINT) AS n_colors,
       CAST(0 AS BIGINT) AS min_color,
       CAST(count(*) - 1 AS BIGINT) AS max_color
FROM supplier
GROUP BY s_nationkey
HAVING count(*) >= 2
"""


KTRUSS_K = 10
KTRUSS_SQL_ROUNDS = 12


def q_ktruss_co(sf_dir):
    """k-truss (k=10) of the co graph: iterative support peel over
    the compact-forward triangle plan (``dist/truss.k_truss``) —
    every surviving edge closes >= 8 triangles inside the subgraph.
    This is the broadcast tier (sorted edge keys shipped once, 16
    bytes/edge — same envelope as ``triangle_count_fast``); past
    node memory the peel swaps its support step for the bucketed
    spill plan of ``triangles.triangle_count`` (see truss.py)."""
    t = pa.concat_tables(
        [b for b in tg.co_edge_rows(sf_dir).iter_batches(
            batch_size=None, batch_format="pyarrow")])
    s = t["src"].to_numpy(zero_copy_only=False)
    d = t["dst"].to_numpy(zero_copy_only=False)
    n = int(max(s.max(), d.max())) + 1
    a, b, rounds = k_truss(s, d, n, k=KTRUSS_K, P=8)
    assert rounds <= KTRUSS_SQL_ROUNDS, \
        f"peel took {rounds} rounds; raise KTRUSS_SQL_ROUNDS"
    return pa.table({"a": pa.array(a), "b": pa.array(b)})


def _ktruss_rounds_sql(k, max_r):
    """Round-unrolled peel (materialized): support via the
    both-direction wedge join, HAVING >= k-2 keeps the edge. Extra
    rounds past the fixed point are no-ops."""
    parts = ["t0 AS MATERIALIZED (SELECT a, b FROM e0)"]
    for r in range(max_r):
        parts.append(
            f"d{r} AS MATERIALIZED (SELECT a, b FROM t{r}\n"
            f"  UNION ALL SELECT b AS a, a AS b FROM t{r})")
        parts.append(
            f"t{r + 1} AS MATERIALIZED (\n"
            f"  SELECT e.a, e.b FROM t{r} e\n"
            f"  JOIN d{r} x ON x.a = e.a\n"
            f"  JOIN d{r} y ON y.a = e.b AND y.b = x.b\n"
            f"  GROUP BY e.a, e.b HAVING count(*) >= {k - 2})")
    return ",\n".join(parts), f"t{max_r}"


_KT_CTES, _KT_FINAL = _ktruss_rounds_sql(KTRUSS_K, KTRUSS_SQL_ROUNDS)

SQL_KTRUSS_CO = f"""
WITH
{_SQL_CO_EDGES_BOTH_MAT},
{_KT_CTES}
SELECT a, b FROM {_KT_FINAL}
"""


MOD_TERMS_C = 10


def q_modularity_terms_co(sf_dir):
    """Per-community modularity terms of the deterministic partition
    ``comm = vid % 10`` on the (unweighted, deduped) co graph —
    driver-verifies the quality FORMULA itself on real graph data
    (``quality.py ModularityQuality``: term_c = w_in_c - d_c^2/(4m);
    the planted Leiden queries verify the optimiser, this verifies
    the arithmetic). Integer stats aggregate distributively (one
    small shuffle); the float term is a single deterministic IEEE
    expression per community, identical to the SQL.
    Cross-checked against the in-memory tier in
    ``tests/test_partition.py::test_modularity_terms_query_formula``."""
    edges = tg.co_edges(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        ca, cb = a % MOD_TERMS_C, b % MOD_TERMS_C
        win = np.bincount(ca[ca == cb], minlength=MOD_TERMS_C)
        dsum = (np.bincount(ca, minlength=MOD_TERMS_C)
                + np.bincount(cb, minlength=MOD_TERMS_C))
        return pa.table({
            "comm": pa.array(np.arange(MOD_TERMS_C, dtype=np.int64)),
            "w_in": pa.array(win.astype(np.int64)),
            "d_sum": pa.array(dsum.astype(np.int64)),
            "m": pa.array(np.full(MOD_TERMS_C, len(a), np.int64)),
        })

    agg = edges.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby("comm").aggregate(Sum("w_in", alias_name="w_in"),
                                   Sum("d_sum", alias_name="d_sum"),
                                   Sum("m", alias_name="m"))

    def finish(t: pa.Table) -> pa.Table:
        w = t["w_in"].to_numpy(zero_copy_only=False).astype(np.float64)
        d = t["d_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
        m = t["m"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "comm": pc.cast(t["comm"], pa.int64()),
            "w_in": pc.cast(t["w_in"], pa.int64()),
            "d_sum": pc.cast(t["d_sum"], pa.int64()),
            "term": pa.array(round6(w - d * d / (4.0 * m))),
        })
    return agg.map_batches(finish, batch_format="pyarrow")


SQL_MODULARITY_TERMS_CO = f"""
WITH e AS (SELECT l1.l_partkey AS a, l2.l_partkey AS b
           FROM lineitem l1 JOIN lineitem l2
             ON l1.l_orderkey = l2.l_orderkey
            AND l1.l_partkey < l2.l_partkey
           GROUP BY 1, 2),
s AS (SELECT a % {MOD_TERMS_C} AS ca, b % {MOD_TERMS_C} AS cb FROM e),
m AS (SELECT count(*) AS m FROM e),
stats AS (
  SELECT comm,
         sum(CASE WHEN ca = cb AND src = 'a' THEN 1 ELSE 0 END) AS w_in,
         count(*) AS d_half
  FROM (SELECT ca AS comm, ca, cb, 'a' AS src FROM s
        UNION ALL SELECT cb, ca, cb, 'b' FROM s)
  GROUP BY comm)
SELECT comm, CAST(w_in AS BIGINT) AS w_in,
       CAST(d_half AS BIGINT) AS d_sum,
       round(w_in - (d_half * d_half) / (4.0 * m.m), 6) AS term
FROM stats, m
"""


def q_media_decode(sf_dir):
    """Multimodal decode plumbing, driver-verified: documents as a
    media table (payload = utf8 text, kind by id residue), decoded by
    the actor-pool ``MediaDecoderMd5`` stub — dimensions/frames/
    features derive from the payload md5 so the SQL oracle replicates
    the whole stage; the real-codec seam stays
    ``MediaDecoder(decode='real')`` (raises: no codecs here)."""
    from ..stages import multimodal as mm
    media = mm.docs_as_media(_docs(sf_dir))
    return media.map_batches(mm.MediaDecoderMd5, batch_format="pyarrow",
                             batch_size=64, zero_copy_batch=True,
                             concurrency=(1, 4))


SQL_MEDIA_DECODE = """
WITH b AS (SELECT doc_id AS media_id,
                  CASE doc_id % 3 WHEN 0 THEN 'image'
                       WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                  md5(text) AS h
           FROM documents),
d AS (SELECT media_id, kind,
             ('0x' || substr(h, 1, 2))::INT AS b0,
             ('0x' || substr(h, 3, 2))::INT AS b1,
             ('0x' || substr(h, 5, 2))::INT AS b2,
             ('0x' || substr(h, 7, 2))::INT AS b3
      FROM b)
SELECT media_id, kind,
       CAST(64 + b0 * 4 AS BIGINT) AS width,
       CAST(64 + b1 * 4 AS BIGINT) AS height,
       CAST(CASE WHEN kind = 'image' THEN 1 ELSE 1 + b2 END
            AS BIGINT) AS n_frames,
       round(b0 / 255.0, 6) AS f0, round(b1 / 255.0, 6) AS f1,
       round(b2 / 255.0, 6) AS f2, round(b3 / 255.0, 6) AS f3
FROM d
"""


def q_media_decode_real(sf_dir):
    """REAL byte-level media decode through the actor pool — no stub:
    ``synth_real_media_table`` writes valid 24-bit BMPs, REAL
    zlib-compressed 8-bit PNGs (row filters 0..4 all exercised), and
    16-bit PCM WAVs whose dimensions/colors/samples are closed forms
    of the media id; ``MediaDecoderRealFlat`` parses the actual bytes
    (BITMAPINFOHEADER rows with 4-byte padding, PNG inflate +
    5-filter scanline reconstruction, RIFF chunks) and computes
    channel means / luminance / rms / peak / zcr / duration — the SQL
    oracle reproduces every value from id arithmetic alone, so any
    parse or unfilter bug is a gate FAIL. r5: ids with i%8==6 ship as
    REAL baseline 4:2:0 huffman JPEGs; their oracle replays the
    fixed-point DC quantise/dequantise/IDCT closed form of the
    constant-colour blocks (``_sql_jpeg_img_ctes``). MP3 / H.264 /
    progressive JPEG remain the documented ``NotImplementedError``
    seam."""
    from ..stages import multimodal as mm
    media = rd.from_arrow(mm.synth_real_media_table(90))
    return media.map_batches(mm.MediaDecoderRealFlat,
                             batch_format="pyarrow", batch_size=16,
                             zero_copy_batch=True, concurrency=(1, 4))


def _sql_jpeg_rec(v, q):
    """SQL closed form of one constant channel through the baseline
    JPEG fixed-point pipeline (multimodal.encode_jpeg/decode_jpeg):
    DC-only block -> quantise (round-half-away) -> dequantise ->
    11-bit fixed-point IDCT -> +128, clip. 33547264 = (8*724)^2,
    524176 = 724^2, 724 = round(2048/sqrt(8))."""
    f = f"(33547264*({v}-128))"
    s = (f"CAST(floor((2*abs({f}) + {q * 4194304}) / "
         f"{2 * q * 4194304}.0) AS BIGINT)")
    dc = f"(CASE WHEN {f} < 0 THEN -{s} ELSE {s} END)"
    return (f"LEAST(255, GREATEST(0, CAST(floor((524176*{dc}*{q} "
            f"+ 2097152)/4194304.0) AS BIGINT) + 128))")


def _sql_jpeg_img_ctes():
    """CTE chain replaying the decoded constant colour of every even
    media id: BMP/PNG ids decode losslessly; JPEG ids (i%8=6) replay
    the fixed-point quantisation closed form."""
    return f"""
raw AS (SELECT i, (i*37)%256 AS r, (i*59)%256 AS g, (i*83)%256 AS b
        FROM ids WHERE i%2=0),
jy AS (SELECT i, r, g, b,
  LEAST(255, GREATEST(0, CAST(floor(0.299*r + 0.587*g + 0.114*b
                                    + 0.5) AS BIGINT))) AS y,
  LEAST(255, GREATEST(0, CAST(floor(-0.168736*r - 0.331264*g
                                    + 0.5*b + 128.5) AS BIGINT)))
    AS cb,
  LEAST(255, GREATEST(0, CAST(floor(0.5*r - 0.418688*g - 0.081312*b
                                    + 128.5) AS BIGINT))) AS cr
  FROM raw),
jq AS (SELECT i, r, g, b, {_sql_jpeg_rec('y', 16)} AS py,
              {_sql_jpeg_rec('cb', 17)} AS pcb,
              {_sql_jpeg_rec('cr', 17)} AS pcr
  FROM jy),
img AS (SELECT i,
  CASE WHEN i%8=6 THEN LEAST(255, GREATEST(0,
    CAST(floor(py + 1.402*(pcr-128.0) + 0.5) AS BIGINT)))
    ELSE r END AS r,
  CASE WHEN i%8=6 THEN LEAST(255, GREATEST(0,
    CAST(floor(py - 0.344136*(pcb-128.0) - 0.714136*(pcr-128.0)
               + 0.5) AS BIGINT))) ELSE g END AS g,
  CASE WHEN i%8=6 THEN LEAST(255, GREATEST(0,
    CAST(floor(py + 1.772*(pcb-128.0) + 0.5) AS BIGINT)))
    ELSE b END AS b
  FROM jq)"""


SQL_MEDIA_DECODE_REAL = f"""
WITH ids AS (SELECT unnest(generate_series(0, 89)) AS i),
{_sql_jpeg_img_ctes()},
aud AS (SELECT i, 800 + (i%5)*80 AS n, (i*291)%32768 AS v
        FROM ids WHERE i%2=1)
SELECT CAST(i AS BIGINT) AS media_id, 'image' AS kind,
       CAST(8 + i%13 AS BIGINT) AS width,
       CAST(8 + i%7 AS BIGINT) AS height,
       CAST(1 AS BIGINT) AS n_frames,
       round(r/255.0, 6) AS f0, round(g/255.0, 6) AS f1,
       round(b/255.0, 6) AS f2,
       round((299*r + 587*g + 114*b)/255000.0, 6) AS f3
FROM img
UNION ALL
SELECT CAST(i AS BIGINT), 'audio', 0, 0, CAST(n AS BIGINT),
       round(v/32768.0, 6), round(v/32768.0, 6), 0.0,
       round(n/8000.0, 6)
FROM aud
"""


def q_media_ann(sf_dir):
    """Composition row: REAL media decode feeds the similarity-search
    stack. Decoded BMP feature vectors (channel means + luminance,
    round6) become the embedding column; images 2/4/6 are the query
    vectors (also obtained THROUGH the byte-level decode); brute-force
    cosine top-5 over the image corpus. Media 0 is excluded on both
    sides (its constant-black image is the zero vector — cosine is
    undefined and engines disagree on NaN ordering)."""
    from ..stages import multimodal as mm
    media_tab = mm.synth_real_media_table(90)
    feats_ds = rd.from_arrow(media_tab).map_batches(
        mm.MediaDecoderRealFlat, batch_format="pyarrow",
        batch_size=16, zero_copy_batch=True, concurrency=(1, 4))

    def to_emb(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.equal(t["kind"], "image"),
                             pc.greater(t["media_id"], 0)))
        f = np.stack([t[f"f{j}"].to_numpy() for j in range(4)],
                     axis=1)
        return pa.table({
            "vec_id": t["media_id"],
            "embedding": pa.array(f.tolist(), pa.list_(pa.float64())),
        })

    emb = feats_ds.map_batches(to_emb, batch_format="pyarrow",
                               zero_copy_batch=True)
    qsel = media_tab.filter(
        pc.is_in(media_tab["media_id"],
                 pa.array([2, 4, 6], pa.int64())))
    qrows = mm.MediaDecoderRealFlat()(qsel)
    qv = np.stack([qrows[f"f{j}"].to_numpy() for j in range(4)],
                  axis=1)
    return annm.brute_force_topk(
        emb, qv, qrows["media_id"].to_numpy(zero_copy_only=False),
        k=5)


SQL_MEDIA_ANN = f"""
WITH ids AS (SELECT unnest(generate_series(2, 89)) AS i),
{_sql_jpeg_img_ctes()},
f AS (SELECT i,
             list_value(
               round(r/255.0, 6),
               round(g/255.0, 6),
               round(b/255.0, 6),
               round((299*r + 587*g + 114*b)/255000.0, 6)) AS emb
      FROM img)
SELECT CAST(q.i AS BIGINT) AS query_id, CAST(e.i AS BIGINT) AS vec_id,
       round(list_cosine_similarity(CAST(q.emb AS DOUBLE[]),
                                    CAST(e.emb AS DOUBLE[])), 6)
           AS cos,
       CAST(row_number() OVER (
           PARTITION BY q.i
           ORDER BY list_cosine_similarity(
               CAST(q.emb AS DOUBLE[]),
               CAST(e.emb AS DOUBLE[])) DESC, e.i)
         AS BIGINT) AS rank
FROM f q CROSS JOIN f e
WHERE q.i IN (2, 4, 6)
QUALIFY rank <= 5
"""


MEDIA_FRAME_EVERY = 2


def q_media_frame_sample(sf_dir):
    """Frame-sampling plumbing, driver-verified: one row per sampled
    frame index (stride 2) of each 'video' row; images/audio pass
    through as frame 0."""
    from ..stages import multimodal as mm
    import hashlib as _h
    media = mm.docs_as_media(_docs(sf_dir))

    def sample(batch: pa.Table) -> pa.Table:
        ids, kinds, frames = [], [], []
        for mid, kind, payload in zip(batch["media_id"].to_pylist(),
                                      batch["kind"].to_pylist(),
                                      batch["payload"].to_pylist()):
            if kind == "video":
                n = 1 + _h.md5(payload).digest()[2]
                for f in range(0, n, MEDIA_FRAME_EVERY):
                    ids.append(mid); kinds.append(kind)
                    frames.append(f)
            else:
                ids.append(mid); kinds.append(kind)
                frames.append(0)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "frame": pa.array(frames, pa.int64()),
        })
    return media.map_batches(sample, batch_format="pyarrow",
                             batch_size=64, zero_copy_batch=True)


SQL_MEDIA_FRAME_SAMPLE = f"""
WITH b AS (SELECT doc_id AS media_id,
                  CASE doc_id % 3 WHEN 0 THEN 'image'
                       WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                  1 + ('0x' || substr(md5(text), 5, 2))::INT AS n
           FROM documents)
-- static series + predicate: DuckDB 1.0 rejects lateral column
-- parameters in generate_series
SELECT media_id, kind, CAST(f AS BIGINT) AS frame
FROM b, generate_series(0, 256) t(f)
WHERE kind = 'video' AND f < n AND f % {MEDIA_FRAME_EVERY} = 0
UNION ALL
SELECT media_id, kind, 0 FROM b WHERE kind <> 'video'
"""


def q_orders_percent_rank(sf_dir):
    """percent_rank window: each order's price percentile within its
    status — one status hash shuffle, per-group vectorised min-rank
    over the sorted column (ties share rank, exactly the SQL window
    semantics)."""
    od = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_orderstatus",
                                  "o_totalprice"])

    def prank(g: pd.DataFrame) -> pd.DataFrame:
        p = g["o_totalprice"].to_numpy(np.float64)
        order = np.argsort(p, kind="stable")
        sp = p[order]
        # min-rank with ties: position of first equal value
        first = np.searchsorted(sp, sp, side="left")
        rank = np.empty(len(p), dtype=np.int64)
        rank[order] = first + 1
        denom = max(len(p) - 1, 1)
        return pd.DataFrame({
            "o_orderkey": g["o_orderkey"],
            "pr": round6((rank - 1) / denom),
        })

    return od.groupby("o_orderstatus").map_groups(
        prank, batch_format="pandas")


SQL_ORDERS_PERCENT_RANK = """
SELECT o_orderkey,
       round(percent_rank() OVER (PARTITION BY o_orderstatus
                                  ORDER BY o_totalprice), 6) AS pr
FROM orders
"""


MOVAVG_W = 3


def q_events_moving_avg(sf_dir):
    """Moving average window (ROWS 2 PRECEDING .. CURRENT) of the
    event value per user ordered by (ts, event_id): one user shuffle,
    per-group shifted adds in the SQL frame's summation order
    ((x[i-2] + x[i-1]) + x[i]) so the float result is bit-identical
    to the window oracle."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "value"])

    def mavg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        x = g["value"].to_numpy(np.float64)
        n = len(x)
        s = x.copy()
        cnt = np.ones(n)
        if n > 1:
            s[1:] = x[:-1] + x[1:]          # (x[i-1]) + x[i]
            cnt[1:] = 2
        if n > 2:
            s[2:] = (x[:-2] + x[1:-1]) + x[2:]
            cnt[2:] = 3
        return pd.DataFrame({
            "event_id": g["event_id"],
            "mavg": round6(s / cnt),
        })

    return ev.groupby("user_id").map_groups(mavg,
                                            batch_format="pandas")


SQL_EVENTS_MOVING_AVG = """
SELECT event_id,
       round(avg(value) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING
                                   AND CURRENT ROW), 6) AS mavg
FROM events
"""




def q_embed_centroids(sf_dir):
    """Per-label embedding centroids (the k-means update step /
    class-prototype op, first 4 dims): per-batch fixed-point
    quantised integer sums (round(x * 2^20)) so the distributed
    accumulation is order-independent and the final float centroid is
    one deterministic IEEE expression — exactly reproducible in SQL,
    unlike a naive float mean whose value depends on reduce order."""
    em = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        arr = np.stack([np.asarray(v[:CENTROID_DIMS], dtype=np.float64)
                        for v in t["embedding"].to_pylist()])
        qz = np.floor(arr * CENTROID_Q + 0.5).astype(np.int64)
        cols = {"label": pa.array(lab),
                "n": pa.array(np.ones(len(lab), np.int64))}
        for j in range(CENTROID_DIMS):
            cols[f"s{j}"] = pa.array(qz[:, j])
        return pa.table(cols).group_by("label").aggregate(
            [(f"s{j}", "sum") for j in range(CENTROID_DIMS)]
            + [("n", "sum")]) \
            .rename_columns(["label"]
                            + [f"s{j}" for j in range(CENTROID_DIMS)]
                            + ["n"])

    agg = em.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("label").aggregate(
            *[Sum(f"s{j}", alias_name=f"s{j}")
              for j in range(CENTROID_DIMS)],
            Sum("n", alias_name="n"))

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        cols = {"label": pc.cast(t["label"], pa.int64()),
                "n": pc.cast(t["n"], pa.int64())}
        for j in range(CENTROID_DIMS):
            s = t[f"s{j}"].to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            cols[f"c{j}"] = pa.array(round6((s / CENTROID_Q) / n))
        return pa.table(cols)
    return agg.map_batches(finish, batch_format="pyarrow")


SQL_EMBED_CENTROIDS = f"""
WITH q AS (SELECT label,
""" + ",\n".join(
    f"        CAST(floor(embedding[{j + 1}] * {CENTROID_Q} + 0.5) "
    f"AS BIGINT) AS s{j}" for j in range(CENTROID_DIMS)) + f"""
           FROM embeddings)
SELECT CAST(label AS BIGINT) AS label, count(*) AS n,
""" + ",\n".join(
    f"       round((sum(s{j}) / {CENTROID_Q}.0) / count(*), 6) AS c{j}"
    for j in range(CENTROID_DIMS)) + """
FROM q GROUP BY label
"""


STRATA_RATES = {"en": 2, "de": 3, "es": 3, "fr": 3, "zh": 3}


def q_doc_sample_stratified(sf_dir):
    """Stratified deterministic sampling: per-language keep rates
    (1/2 for en, 1/3 otherwise) by id-hash residue — the
    training-data rebalancing op (downsample the dominant language).
    Pure map stage, no shuffle; reproducible across runs, shards and
    parallelism (same md5 id-hash as ``stages/pack.hash_sample``)."""
    from ..stages.pack import _id_hash
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang"])

    def pick(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        lang = t["lang"].to_numpy(zero_copy_only=False)
        h = _id_hash(ids)
        keep = np.zeros(len(ids), dtype=bool)
        for lg, mod in STRATA_RATES.items():
            m = lang == lg
            keep[m] = (h[m] % np.uint64(mod)) == np.uint64(0)
        return pa.table({"doc_id": pa.array(ids[keep]),
                         "lang": pa.array(lang[keep], pa.string())})

    return docs.map_batches(pick, batch_format="pyarrow",
                            zero_copy_batch=True)


SQL_DOC_SAMPLE_STRATIFIED = """
WITH h AS (SELECT doc_id, lang,
                  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))
                    ::UBIGINT AS h
           FROM documents)
SELECT doc_id, lang FROM h
WHERE h % (CASE WHEN lang = 'en' THEN 2 ELSE 3 END) = 0
"""


def q_doc_pii_scrub(sf_dir):
    """PII scrubbing (email/phone masking) — the synthetic corpus has
    no PII, so the query plants a deterministic contact line per doc
    (derived from doc_id only) and scrubs it: the stage's RE2 masking
    + counts run for real and the SQL oracle replants and re-scrubs
    with the SAME pattern strings (DuckDB is also RE2)."""
    docs = _docs(sf_dir)

    def plant(t: pa.Table) -> pa.Table:
        i = pc.cast(t["doc_id"], pa.string())
        ph = pc.cast(pc.add(pc.multiply(t["doc_id"], 7), 1000000),
                     pa.string())
        dirty = pc.binary_join_element_wise(
            t["text"], " contact doc", i, "@mail.example.com or +1555",
            ph, " now", "")
        return pa.table({"doc_id": t["doc_id"], "text": dirty})

    return tx.pii_scrub(docs.map_batches(plant, batch_format="pyarrow",
                                         zero_copy_batch=True))


SQL_DOC_PII_SCRUB = rf"""
WITH dirty AS (
  SELECT doc_id,
         text || ' contact doc' || CAST(doc_id AS VARCHAR)
              || '@mail.example.com or +1555'
              || CAST(doc_id * 7 + 1000000 AS VARCHAR)
              || ' now' AS text
  FROM documents),
s1 AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text,
              '{tx.PII_EMAIL_RE}')) AS BIGINT) AS n_emails,
         regexp_replace(text, '{tx.PII_EMAIL_RE}', '[EMAIL]', 'g')
           AS text
  FROM dirty)
SELECT doc_id, n_emails,
       CAST(len(regexp_extract_all(text,
            '{tx.PII_PHONE_RE}')) AS BIGINT) AS n_phones,
       md5(regexp_replace(text, '{tx.PII_PHONE_RE}', '[PHONE]', 'g'))
         AS clean_md5
FROM s1
"""


def q_docs_normalize(sf_dir):
    """Text normalisation stage: lowercase, collapse whitespace runs
    to one space, trim; output the md5 of the normalised text (the
    canonical-form fingerprint that exact dedup would key on after
    cleaning). Vectorised RE2 kernels; SQL replicates with
    lower/regexp_replace/trim/md5."""
    import hashlib as _h
    docs = _docs(sf_dir)

    def norm(t: pa.Table) -> pa.Table:
        x = pc.utf8_lower(t["text"])
        x = pc.replace_substring_regex(x, r"\s+", " ")
        x = pc.utf8_trim_whitespace(x)
        return pa.table({
            "doc_id": t["doc_id"],
            "norm_md5": pa.array(
                [_h.md5(s.encode("utf-8")).hexdigest()
                 for s in x.to_pylist()], pa.string()),
        })
    return docs.map_batches(norm, batch_format="pyarrow",
                            zero_copy_batch=True)


SQL_DOCS_NORMALIZE = r"""
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
         AS norm_md5
FROM documents
"""


def q_doc_repetition(sf_dir):
    """Word-trigram repetition ratio per doc (boilerplate/loop-spam
    quality signal): 1 - distinct/total trigrams."""
    return tx.repetition_stats(_docs(sf_dir))


SQL_DOC_REPETITION = """
WITH toks AS (SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9_]+') AS ws
              FROM documents),
tri AS (SELECT doc_id,
               ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
        FROM toks, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)
        WHERE len(ws) >= 3)
SELECT doc_id,
       count(*) AS n_tri,
       count(DISTINCT g) AS n_uniq,
       round(1.0 - count(DISTINCT g) / count(*), 6) AS rep_ratio
FROM tri GROUP BY doc_id
"""


def q_doc_entropy(sf_dir):
    """Word-unigram Shannon entropy per doc (perplexity-proxy quality
    score; base-2)."""
    return tx.entropy_stats(_docs(sf_dir))


SQL_DOC_ENTROPY = """
WITH toks AS (SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9_]+') AS ws
              FROM documents),
w AS (SELECT doc_id, UNNEST(ws) AS w FROM toks WHERE len(ws) > 0),
cnt AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY doc_id, w),
tot AS (SELECT doc_id, sum(c) AS n FROM cnt GROUP BY doc_id)
SELECT cnt.doc_id,
       CAST(any_value(tot.n) AS BIGINT) AS n_tokens,
       round(-sum((c / tot.n) * log2(c / tot.n)), 6) AS entropy
FROM cnt JOIN tot ON cnt.doc_id = tot.doc_id
GROUP BY cnt.doc_id
"""


def q_contamination(sf_dir):
    """Benchmark-contamination check: fraction of each training doc's
    word 5-grams present in the eval slice (doc_id % 19 == 0). Eval
    grams are the broadcast small side; the corpus streams."""
    return tx.contamination_check(_docs(sf_dir))


def q_contamination_bloom(sf_dir):
    """The at-scale contamination form: a broadcast Bloom filter
    (2^18 bits over the eval grams) gates the exact membership probe
    — only Bloom-positive grams touch the exact set. No false
    negatives + exact verify make the output bit-identical to the
    unfiltered stage, so the SAME exact SQL oracle is the gate: a
    PASS here proves the prefilter loses nothing."""
    return tx.contamination_check_bloom(_docs(sf_dir))


SQL_CONTAMINATION = """
WITH toks AS (SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9_]+') AS ws
              FROM documents),
g AS (SELECT doc_id,
             ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
             ws[i+3] || ' ' || ws[i+4] AS g
      FROM toks, UNNEST(generate_series(1, len(ws) - 4)) AS t(i)
      WHERE len(ws) >= 5),
ev AS (SELECT DISTINCT g FROM g WHERE doc_id % 19 = 0),
tr AS (SELECT doc_id, g.g AS gg FROM g WHERE doc_id % 19 <> 0)
SELECT tr.doc_id,
       count(*) AS n_grams,
       CAST(sum(CASE WHEN ev.g IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hit,
       round(CAST(sum(CASE WHEN ev.g IS NOT NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS contamination
FROM tr LEFT JOIN ev ON tr.gg = ev.g
GROUP BY tr.doc_id
"""


PRICE_BUCKET_W = 5000.0


def q_price_histogram(sf_dir):
    """Fixed-width histogram of l_extendedprice (dataset-profiling
    op): per-batch ``np.bincount`` partials, tiny driver reduce — no
    shuffle; count/min/max are order-free so the match is exact."""
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_extendedprice"])

    def part(t: pa.Table) -> pa.Table:
        x = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        b = np.floor(x / PRICE_BUCKET_W).astype(np.int64)
        uniq, inv = np.unique(b, return_inverse=True)
        n = np.bincount(inv)
        vmin = np.full(len(uniq), np.inf)
        vmax = np.full(len(uniq), -np.inf)
        np.minimum.at(vmin, inv, x)
        np.maximum.at(vmax, inv, x)
        return pa.table({"bucket": pa.array(uniq),
                         "n": pa.array(n, pa.int64()),
                         "vmin": pa.array(vmin, pa.float64()),
                         "vmax": pa.array(vmax, pa.float64())})

    acc: dict = {}
    for t in li.map_batches(part, batch_format="pyarrow",
                            zero_copy_batch=True) \
               .iter_batches(batch_format="pyarrow"):
        for bk, n, lo, hi in zip(t["bucket"].to_pylist(),
                                 t["n"].to_pylist(),
                                 t["vmin"].to_pylist(),
                                 t["vmax"].to_pylist()):
            if bk in acc:
                an, alo, ahi = acc[bk]
                acc[bk] = (an + n, min(alo, lo), max(ahi, hi))
            else:
                acc[bk] = (n, lo, hi)
    ks = sorted(acc)
    return pa.table({
        "bucket": pa.array(ks, pa.int64()),
        "n": pa.array([acc[k][0] for k in ks], pa.int64()),
        "min_price": pa.array([acc[k][1] for k in ks], pa.float64()),
        "max_price": pa.array([acc[k][2] for k in ks], pa.float64()),
    })


SQL_PRICE_HISTOGRAM = """
SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bucket,
       count(*) AS n,
       min(l_extendedprice) AS min_price,
       max(l_extendedprice) AS max_price
FROM lineitem GROUP BY 1
"""


PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def q_profile_lineitem(sf_dir):
    """Column-profiling operator (the 'describe' a data engine runs
    before a training job): one streaming pass computes
    count/nulls/min/max/mean for every numeric column via per-batch
    partials + a tiny driver combine. One row per column."""
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=list(PROFILE_COLS))

    def part(t: pa.Table) -> pa.Table:
        rows = {"column": [], "n": [], "n_null": [], "vmin": [],
                "vmax": [], "s": []}
        for c in PROFILE_COLS:
            col = t[c]
            x = col.to_numpy(zero_copy_only=False)
            nn = col.null_count
            v = x[~np.isnan(x)] if nn else x
            rows["column"].append(c)
            rows["n"].append(len(x))
            rows["n_null"].append(nn)
            rows["vmin"].append(float(v.min()) if len(v) else np.inf)
            rows["vmax"].append(float(v.max()) if len(v) else -np.inf)
            # exact integer-cents sum: float summation ORDER differs
            # between the engine's partials and DuckDB, which flips
            # the 6th decimal of the mean for near-boundary values
            rows["s"].append(
                int(np.round(v * 100.0).astype(np.int64).sum()))
        return pa.table({"column": pa.array(rows["column"], pa.string()),
                         "n": pa.array(rows["n"], pa.int64()),
                         "n_null": pa.array(rows["n_null"], pa.int64()),
                         "vmin": pa.array(rows["vmin"], pa.float64()),
                         "vmax": pa.array(rows["vmax"], pa.float64()),
                         "s": pa.array(rows["s"], pa.int64())})

    acc = {c: [0, 0, np.inf, -np.inf, 0] for c in PROFILE_COLS}
    for t in li.map_batches(part, batch_format="pyarrow",
                            zero_copy_batch=True) \
               .iter_batches(batch_format="pyarrow"):
        for c, n, nn, lo, hi, s in zip(*(t[k].to_pylist() for k in
                                         ("column", "n", "n_null",
                                          "vmin", "vmax", "s"))):
            a = acc[c]
            a[0] += n
            a[1] += nn
            a[2] = min(a[2], lo)
            a[3] = max(a[3], hi)
            a[4] += s
    cols = sorted(PROFILE_COLS)
    return pa.table({
        "column": pa.array(cols, pa.string()),
        "n_rows": pa.array([acc[c][0] for c in cols], pa.int64()),
        "n_null": pa.array([acc[c][1] for c in cols], pa.int64()),
        "vmin": pa.array([acc[c][2] for c in cols], pa.float64()),
        "vmax": pa.array([acc[c][3] for c in cols], pa.float64()),
        "mean": pa.array(
            round6(np.array([acc[c][4]
                             / (100.0 * max(acc[c][0] - acc[c][1], 1))
                             for c in cols])), pa.float64()),
    })


SQL_PROFILE_LINEITEM = """
SELECT 'l_discount' AS column, count(*) AS n_rows,
       count(*) - count(l_discount) AS n_null,
       min(l_discount) AS vmin, max(l_discount) AS vmax,
       round(sum(CAST(round(l_discount * 100) AS BIGINT))
             / (100.0 * count(l_discount)), 6) AS mean
FROM lineitem
UNION ALL
SELECT 'l_extendedprice', count(*), count(*) - count(l_extendedprice),
       min(l_extendedprice), max(l_extendedprice),
       round(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
             / (100.0 * count(l_extendedprice)), 6)
FROM lineitem
UNION ALL
SELECT 'l_quantity', count(*), count(*) - count(l_quantity),
       min(l_quantity), max(l_quantity),
       round(sum(CAST(round(l_quantity * 100) AS BIGINT))
             / (100.0 * count(l_quantity)), 6)
FROM lineitem
UNION ALL
SELECT 'l_tax', count(*), count(*) - count(l_tax),
       min(l_tax), max(l_tax),
       round(sum(CAST(round(l_tax * 100) AS BIGINT))
             / (100.0 * count(l_tax)), 6)
FROM lineitem
"""


def q_events_cumsum(sf_dir):
    """Running total per user ordered by (ts, event_id) — the
    UNBOUNDED-PRECEDING window frame: one user shuffle, per-group
    sequential accumulate in the oracle's running-add order."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "value"])

    def csum(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        x = g["value"].to_numpy(np.float64)
        return pd.DataFrame({
            "event_id": g["event_id"],
            "running_total": round6(np.add.accumulate(x)),
        })

    return ev.groupby("user_id").map_groups(csum,
                                            batch_format="pandas")


SQL_EVENTS_CUMSUM = """
SELECT event_id,
       round(sum(value) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW), 6)
         AS running_total
FROM events
"""


def q_orders_cube(sf_dir):
    """GROUP BY CUBE (status, year): the finest-level shuffle output
    feeds all four grouping sets (fine, per-status, per-year, grand
    total) — the input is shuffled once; exact integer-cents sums
    make every subtotal order-independent."""
    od = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderstatus", "o_orderdate",
                                  "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        yr = pc.year(t["o_orderdate"])
        cents = np.floor(
            t["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64)
        tt = pa.table({"o_orderstatus": t["o_orderstatus"],
                       "yr": pc.cast(yr, pa.int64()),
                       "cents": pa.array(cents)})
        return tt.group_by(["o_orderstatus", "yr"]).aggregate(
            [("cents", "sum"), ([], "count_all")]) \
            .rename_columns(["o_orderstatus", "yr", "sum_cents",
                             "n_orders"])

    fine = od.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby(["o_orderstatus", "yr"]).aggregate(
            Sum("sum_cents", alias_name="sum_cents"),
            Sum("n_orders", alias_name="n_orders")) \
        .to_pandas()
    agg_cols = ["sum_cents", "n_orders"]
    lvl0 = fine.assign(yr=fine["yr"].astype(np.int64).astype(str))
    by_status = fine.groupby("o_orderstatus", as_index=False)[
        agg_cols].sum().assign(yr="ALL")
    by_year = fine.groupby("yr", as_index=False)[agg_cols].sum()
    by_year = by_year.assign(
        yr=by_year["yr"].astype(np.int64).astype(str),
        o_orderstatus="ALL")
    total = pd.DataFrame({"o_orderstatus": ["ALL"], "yr": ["ALL"],
                          "sum_cents": [fine["sum_cents"].sum()],
                          "n_orders": [fine["n_orders"].sum()]})
    out = pd.concat([lvl0, by_status, by_year, total],
                    ignore_index=True)
    return pd.DataFrame({
        "o_orderstatus": out["o_orderstatus"],
        "yr": out["yr"],
        "n_orders": out["n_orders"].astype(np.int64),
        "sum_price": round6(
            out["sum_cents"].to_numpy(np.int64) / 100.0),
    })


SQL_ORDERS_CUBE = """
SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
       COALESCE(CAST(year(o_orderdate) AS VARCHAR), 'ALL') AS yr,
       count(*) AS n_orders,
       round(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             / 100.0, 6) AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, year(o_orderdate))
"""


def q_orders_above_cust_avg(sf_dir):
    """Correlated-subquery pattern (TPC-H Q17 family): orders priced
    strictly above their customer's average order price. One
    customer-keyed pre-aggregate (bounded by the customer count)
    broadcasts via ``ray.put``; each order batch compares vectorised.
    The comparison is all-integer (price_cents * n > sum_cents), so
    engine and oracle decide every boundary case identically."""
    import ray as _ray
    od = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_custkey",
                                  "o_totalprice"])

    def pre(t: pa.Table) -> pa.Table:
        cents = np.floor(
            t["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64)
        tt = pa.table({"o_custkey": t["o_custkey"],
                       "cents": pa.array(cents)})
        return tt.group_by("o_custkey").aggregate(
            [("cents", "sum"), ([], "count_all")]) \
            .rename_columns(["o_custkey", "sum_cents", "n"])

    agg = od.map_batches(pre, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("o_custkey").aggregate(
            Sum("sum_cents", alias_name="sum_cents"),
            Sum("n", alias_name="n")).to_pandas()
    keys = agg["o_custkey"].to_numpy(np.int64)
    order = np.argsort(keys)
    ref = _ray.put((keys[order],
                    agg["sum_cents"].to_numpy(np.int64)[order],
                    agg["n"].to_numpy(np.int64)[order]))

    def above(t: pa.Table) -> pa.Table:
        k, s, n = _ray.get(ref)
        ck = t["o_custkey"].to_numpy()
        pos = np.searchsorted(k, ck)
        cents = np.floor(
            t["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64)
        keep = cents * n[pos] > s[pos]
        return t.filter(pa.array(keep))

    return od.map_batches(above, batch_format="pyarrow")


SQL_ORDERS_ABOVE_CUST_AVG = """
WITH agg AS (
  SELECT o_custkey,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS sum_cents,
         count(*) AS n
  FROM orders GROUP BY o_custkey)
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
FROM orders o JOIN agg ON agg.o_custkey = o.o_custkey
WHERE CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) * agg.n
      > agg.sum_cents
"""


HARMONIC_LCM = 2329089562800  # lcm(1..30); 30 caps the BFS depth


def q_harmonic_co(sf_dir):
    """Harmonic centrality (sum of 1/d over reached vertices) for the
    same seeds as ``closeness_co``, from one multi-source BSP BFS.
    The sum is computed over a common denominator lcm(1..30) so both
    sides accumulate INTEGERS — no float-order dependence at all."""
    g = _co_distgraph(sf_dir)
    act = g.active_global()
    seeds = np.flatnonzero(act)[:CLOSENESS_SEEDS].astype(np.int64)
    dist, _ = ss.multi_bfs(g, seeds)
    INF = np.iinfo(np.int64).max
    harm = np.empty(len(seeds), dtype=np.float64)
    for i in range(len(seeds)):
        d = dist[i]
        d = d[(d > 0) & (d < INF)]
        cnt = np.bincount(d)
        ds = np.flatnonzero(cnt)
        num = int((cnt[ds] * (HARMONIC_LCM // ds)).sum())
        harm[i] = float(num) / float(HARMONIC_LCM)
    return pa.table({"vid": pa.array(seeds),
                     "harmonic": pa.array(round6(harm))})


SQL_HARMONIC_CO = f"""
WITH RECURSIVE
{_SQL_CO_EDGES_BOTH},
seeds AS (SELECT a AS s FROM e GROUP BY a ORDER BY a
          LIMIT {CLOSENESS_SEEDS}),
bfs(s, v, d) AS (
  SELECT s, s, 0 FROM seeds
  UNION
  SELECT bfs.s, e.b, bfs.d + 1 FROM bfs JOIN e ON e.a = bfs.v
  WHERE bfs.d < 30
),
sd AS (SELECT s, v, min(d) AS d FROM bfs GROUP BY s, v)
SELECT s AS vid,
       round(CAST(sum({HARMONIC_LCM} // d) AS DOUBLE)
             / {HARMONIC_LCM}.0, 6) AS harmonic
FROM sd WHERE d > 0 GROUP BY s
"""


def q_two_hop_co(sf_dir):
    """Friends-of-friends reach: distinct 1-hop and 2-hop (min-dist)
    neighbour counts for the closeness seeds, read straight off the
    multi-source BSP BFS distance planes (no pair-explosion join)."""
    g = _co_distgraph(sf_dir)
    act = g.active_global()
    seeds = np.flatnonzero(act)[:CLOSENESS_SEEDS].astype(np.int64)
    dist, _ = ss.multi_bfs(g, seeds)
    n1 = (dist == 1).sum(axis=1).astype(np.int64)
    n2 = (dist == 2).sum(axis=1).astype(np.int64)
    return pa.table({"vid": pa.array(seeds),
                     "n_1hop": pa.array(n1),
                     "n_2hop": pa.array(n2)})


SQL_TWO_HOP_CO = f"""
WITH
{_SQL_CO_EDGES_BOTH},
seeds AS (SELECT a AS s FROM e GROUP BY a ORDER BY a
          LIMIT {CLOSENESS_SEEDS}),
h1 AS (SELECT seeds.s, e.b AS v FROM seeds JOIN e ON e.a = seeds.s
       GROUP BY seeds.s, e.b),
h2 AS (SELECT h1.s, e.b AS v FROM h1 JOIN e ON e.a = h1.v
       WHERE e.b <> h1.s GROUP BY h1.s, e.b),
h2o AS (SELECT h2.s, h2.v FROM h2
        LEFT JOIN h1 ON h1.s = h2.s AND h1.v = h2.v
        WHERE h1.v IS NULL)
SELECT seeds.s AS vid,
       (SELECT count(*) FROM h1 WHERE h1.s = seeds.s) AS n_1hop,
       (SELECT count(*) FROM h2o WHERE h2o.s = seeds.s) AS n_2hop
FROM seeds
"""


EDGE_SAMPLE_MOD = 8


def q_edges_sample_co(sf_dir):
    """Deterministic graph sampling: keep co edges whose pair-hash
    residue is 0 (1/8 rate) — reproducible across runs, shards and
    parallelism (same md5-prefix hash family as ``hash_sample``).
    Pure map stage over the edge Dataset, no shuffle."""
    import hashlib as _h
    e = tg.co_edges(sf_dir)

    def pick(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        keep = np.fromiter(
            (int(_h.md5(f"{x}_{y}".encode()).hexdigest()[:16], 16)
             % EDGE_SAMPLE_MOD == 0 for x, y in zip(a, b)),
            count=len(a), dtype=bool)
        return t.filter(pa.array(keep))

    return e.map_batches(pick, batch_format="pyarrow",
                         zero_copy_batch=True)


SQL_EDGES_SAMPLE_CO = """
WITH e AS (SELECT l1.l_partkey AS a, l2.l_partkey AS b,
                  CAST(count(*) AS DOUBLE) AS weight
           FROM lineitem l1 JOIN lineitem l2
             ON l1.l_orderkey = l2.l_orderkey
            AND l1.l_partkey < l2.l_partkey
           GROUP BY 1, 2)
SELECT a, b, weight FROM e
WHERE ('0x' || substr(md5(CAST(a AS VARCHAR) || '_'
                          || CAST(b AS VARCHAR)), 1, 16))::UBIGINT
      % 8 = 0
"""


def q_orders_ntile(sf_dir):
    """ntile(4) price quartile per customer's orders, ordered by
    (price, orderkey): one customer shuffle, per-group vectorised
    tile assignment with the SQL distribution rule (first n%k tiles
    get the extra row)."""
    od = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_orderkey",
                                  "o_totalprice"])
    K = 4

    def tiles(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_totalprice", "o_orderkey"])
        n = len(g)
        base, rem = divmod(n, K)
        sizes = np.full(K, base, dtype=np.int64)
        sizes[:rem] += 1
        tile = np.repeat(np.arange(1, K + 1), sizes)
        return pd.DataFrame({"o_orderkey": g["o_orderkey"],
                             "tile": tile})

    return od.groupby("o_custkey").map_groups(tiles,
                                              batch_format="pandas")


SQL_ORDERS_NTILE = """
SELECT o_orderkey,
       CAST(ntile(4) OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice, o_orderkey)
            AS BIGINT) AS tile
FROM orders
"""


FUZZY_PREFIX_LEN = 16
FUZZY_BLOCK_LEN = 4
FUZZY_MAX_DIST = 2
FUZZY_BLOCK_CAP = 256  # lowest doc_ids kept per block (skew guard)


def _levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def q_doc_fuzzy_pairs(sf_dir):
    """Fuzzy (edit-distance) string self-join: document pairs whose
    16-char text prefixes are within Levenshtein distance 2,
    candidate-blocked by the 4-char prefix (blocking is part of the
    operator contract — both sides enumerate only in-block pairs).
    One block-key shuffle; per-block O(k^2) verify on short strings.
    Pathological blocks cap at the 256 lowest doc_ids (the dedup
    family's skew guard) — the cap is replicated in the oracle so the
    comparison stays exact."""
    docs = _docs(sf_dir)

    def keyed(t: pa.Table) -> pa.Table:
        s16 = pc.utf8_slice_codeunits(t["text"], 0, FUZZY_PREFIX_LEN)
        blk = pc.utf8_slice_codeunits(t["text"], 0, FUZZY_BLOCK_LEN)
        return pa.table({"doc_id": t["doc_id"], "s16": s16,
                         "blk": blk})

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["doc_id"].to_numpy(np.int64)
        ss_ = g["s16"].to_numpy(object)
        order = np.argsort(ids)
        ids, ss_ = ids[order], ss_[order]
        ids, ss_ = ids[:FUZZY_BLOCK_CAP], ss_[:FUZZY_BLOCK_CAP]
        a_out, b_out, d_out = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = _levenshtein(ss_[i], ss_[j])
                if d <= FUZZY_MAX_DIST:
                    a_out.append(ids[i])
                    b_out.append(ids[j])
                    d_out.append(d)
        return pd.DataFrame({
            "a": np.asarray(a_out, dtype=np.int64),
            "b": np.asarray(b_out, dtype=np.int64),
            "dist": np.asarray(d_out, dtype=np.int64)})

    return docs.map_batches(keyed, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby("blk").map_groups(verify, batch_format="pandas")


SQL_DOC_FUZZY_PAIRS = """
WITH s0 AS (SELECT doc_id, substr(text, 1, 16) AS s16,
                   substr(text, 1, 4) AS blk
            FROM documents),
s AS (SELECT doc_id, s16, blk FROM s0
      QUALIFY row_number() OVER (PARTITION BY blk
                                 ORDER BY doc_id) <= 256)
SELECT s1.doc_id AS a, s2.doc_id AS b,
       CAST(levenshtein(s1.s16, s2.s16) AS BIGINT) AS dist
FROM s s1 JOIN s s2 ON s1.blk = s2.blk AND s1.doc_id < s2.doc_id
WHERE levenshtein(s1.s16, s2.s16) <= 2
"""


def q_users_click_and_signup(sf_dir):
    """Set intersection (INTERSECT): users with BOTH a high-value
    click and a high-value signup — same single-pass boolean-partial
    plan as the EXCEPT query, flipped filter."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "value"]) \
        .filter(expr=f"value > {EXCEPT_THRESHOLD}")

    def partial(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": t["user_id"],
            "saw": pa.array((et == "click").astype(np.int64)),
            "bought": pa.array((et == "signup").astype(np.int64)),
        }).group_by("user_id").aggregate(
            [("saw", "max"), ("bought", "max")]) \
            .rename_columns(["user_id", "saw", "bought"])

    from ray.data.aggregate import Max
    agg = ev.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("user_id").aggregate(
            Max("saw", alias_name="saw"),
            Max("bought", alias_name="bought"))

    def finish(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.equal(t["saw"], 1), pc.equal(t["bought"], 1))
        return t.filter(keep).select(["user_id"])
    return agg.map_batches(finish, batch_format="pyarrow")


SQL_USERS_CLICK_AND_SIGNUP = f"""
SELECT DISTINCT user_id FROM events
WHERE event_type = 'click' AND value > {EXCEPT_THRESHOLD}
INTERSECT
SELECT DISTINCT user_id FROM events
WHERE event_type = 'signup' AND value > {EXCEPT_THRESHOLD}
"""


def q_users_customers_outer(sf_dir):
    """FULL OUTER join (identity stitching): clickstream user ids vs
    CRM customer ids, with per-user event counts and a customer flag.
    No outer-join shuffle machinery needed: both sides land in ONE
    union-then-groupby pass (tagged partials, key shuffle once) — the
    union IS the full outer join when followed by a grouped sum."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id"])

    def ev_part(t: pa.Table) -> pa.Table:
        g = pa.table({"key": t["user_id"]}).group_by("key") \
            .aggregate([([], "count_all")]) \
            .rename_columns(["key", "n_events"])
        return g.append_column(
            "has_customer", pa.array(np.zeros(len(g), np.int64)))

    cu = rd.read_parquet(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey"])

    def cu_part(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({"key": t["c_custkey"],
                         "n_events": pa.array(np.zeros(n, np.int64)),
                         "has_customer": pa.array(np.ones(n, np.int64))})

    both = ev.map_batches(ev_part, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .union(cu.map_batches(cu_part, batch_format="pyarrow",
                              zero_copy_batch=True))
    agg = both.groupby("key").aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("has_customer", alias_name="has_customer"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "key": pc.cast(t["key"], pa.int64()),
            "n_events": pc.cast(t["n_events"], pa.int64()),
            "has_customer": pc.cast(t["has_customer"], pa.int64()),
        })
    return agg.map_batches(finish, batch_format="pyarrow")


SQL_USERS_CUSTOMERS_OUTER = """
SELECT COALESCE(e.user_id, c.c_custkey) AS key,
       CAST(COALESCE(e.n, 0) AS BIGINT) AS n_events,
       CAST(CASE WHEN c.c_custkey IS NULL THEN 0 ELSE 1 END
            AS BIGINT) AS has_customer
FROM (SELECT user_id, count(*) AS n FROM events GROUP BY 1) e
FULL OUTER JOIN customer c ON c.c_custkey = e.user_id
"""


def q_community_graph_cliques(sf_dir):
    """Coarse (community) graph after distributed Leiden on the
    planted per-nation cliques — driver-verifies the
    ``aggregate_partition`` edge contraction (membership joined to the
    edge Dataset, grouped by community pair) against a closed form:
    cliques are disjoint, so the coarse graph is pure self-loops of
    weight C(n_c, 2). Reference ``VertexPartition.py`` aggregate
    semantics; contraction runs over the edge Dataset with the
    membership broadcast once."""
    import ray as _ray
    edges = tg.nation_clique_edges(sf_dir)
    s, d, w = _planted_edges(edges)
    n = tg.supplier_count(sf_dir)
    dl = DistLeiden(s, d, weight=w, n=n, directed=False, quality="cpm",
                    resolution_parameter=0.5, P=8, seed=42)
    mem, q, info = dl.run()
    comm = _renumber_dense(mem, n)
    ref = _ray.put(comm)

    def contract(t: pa.Table) -> pa.Table:
        c = _ray.get(ref)
        ca = c[t["src"].to_numpy(zero_copy_only=False)]
        cb = c[t["dst"].to_numpy(zero_copy_only=False)]
        tt = pa.table({"ca": pa.array(np.minimum(ca, cb)),
                       "cb": pa.array(np.maximum(ca, cb)),
                       "w": t["weight"]})
        return tt.group_by(["ca", "cb"]).aggregate([("w", "sum")]) \
            .rename_columns(["ca", "cb", "w"])

    pre = edges.map_batches(contract, batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas()
    out = pre.groupby(["ca", "cb"], as_index=False)["w"].sum()
    return pa.table({
        "ca": pa.array(out["ca"].to_numpy(np.int64)),
        "cb": pa.array(out["cb"].to_numpy(np.int64)),
        "weight": pa.array(out["w"].to_numpy(np.float64)),
    })


SQL_COMMUNITY_GRAPH_CLIQUES = """
WITH sz AS (SELECT s_nationkey, count(*) AS cnt, min(s_suppkey) AS mv
            FROM supplier GROUP BY s_nationkey),
r AS (SELECT CAST(dense_rank() OVER (ORDER BY cnt DESC, mv ASC)
                  AS BIGINT) - 1 AS comm, cnt
      FROM sz)
SELECT comm AS ca, comm AS cb,
       CAST(cnt * (cnt - 1) // 2 AS DOUBLE) AS weight
FROM r WHERE cnt > 1
"""


BIPROJ_MOD = 50  # sampled projection: parts with p % 50 == 0


def q_bipartite_projection_ps(sf_dir):
    """Bipartite projection (igraph ``bipartite_projection`` parity):
    project the part-supplier bipartite graph onto parts — pairs
    sharing >=1 supplier, weight = #shared suppliers. Sampled to the
    p%50==0 part slice (both sides, part of the operator contract) so
    the pair explosion stays bounded; the full projection is the same
    plan without the filter. Distinct (part, supplier) is one
    groupby; the pair enumeration is a supplier-keyed self-join with
    per-batch pre-aggregation before the final pair groupby."""
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey"])

    def dedup_part(t: pa.Table) -> pa.Table:
        p = t["l_partkey"].to_numpy(zero_copy_only=False)
        m = (p % BIPROJ_MOD) == 0
        return t.filter(pa.array(m)) \
            .select(["l_partkey", "l_suppkey"])

    pre = li.map_batches(dedup_part, batch_format="pyarrow",
                         zero_copy_batch=True)
    distinct = pre.groupby(["l_partkey", "l_suppkey"]).aggregate(
        Count(alias_name="cnt")).drop_columns(["cnt"])
    right = distinct.map_batches(
        lambda t: t.rename_columns(["partkey_r", "l_suppkey"]),
        batch_format="pyarrow", zero_copy_batch=True)
    joined = distinct.join(right, "inner", 8, on=("l_suppkey",))

    def pairs(t: pa.Table) -> pa.Table:
        a, b = t["l_partkey"], t["partkey_r"]
        tt = pa.table({"a": a, "b": b}).filter(pc.less(a, b))
        return tt.group_by(["a", "b"]).aggregate([([], "count_all")]) \
            .rename_columns(["a", "b", "shared_suppliers"])

    agg = joined.map_batches(pairs, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby(["a", "b"]).aggregate(
            Sum("shared_suppliers", alias_name="shared_suppliers"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "a": pc.cast(t["a"], pa.int64()),
            "b": pc.cast(t["b"], pa.int64()),
            "shared_suppliers": pc.cast(t["shared_suppliers"],
                                        pa.int64()),
        })
    return agg.map_batches(finish, batch_format="pyarrow")


SQL_BIPARTITE_PROJECTION_PS = f"""
WITH ps AS (SELECT l_partkey AS p, l_suppkey AS s FROM lineitem
            WHERE l_partkey % {BIPROJ_MOD} = 0 GROUP BY 1, 2)
SELECT p1.p AS a, p2.p AS b, count(*) AS shared_suppliers
FROM ps p1 JOIN ps p2 ON p1.s = p2.s AND p1.p < p2.p
GROUP BY 1, 2
"""


BLOCKWORDS = ("spark", "slow", "big")


def q_doc_blocklist(sf_dir):
    """Content filtering: per-document blocklist hit count and the
    keep decision (the toxicity/keyword-filter stage of a
    training-data pipeline). Vectorised token scan, no shuffle."""
    docs = _docs(sf_dir)
    block = set(BLOCKWORDS)
    token_re = tx.TOKEN_RE

    def scan(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        n_blocked = np.empty(len(texts), dtype=np.int64)
        for i, txt in enumerate(texts):
            n_blocked[i] = sum(1 for w in token_re.findall(txt.lower())
                               if w in block)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_blocked": pa.array(n_blocked),
            "keep": pa.array((n_blocked == 0).astype(np.int64)),
        })

    return docs.map_batches(scan, batch_format="pyarrow",
                            zero_copy_batch=True)


SQL_DOC_BLOCKLIST = f"""
SELECT doc_id,
       len(list_filter(regexp_extract_all(lower(text), '[a-z0-9_]+'),
                       x -> x IN {BLOCKWORDS!r}))::BIGINT AS n_blocked,
       CAST(CASE WHEN len(list_filter(
                regexp_extract_all(lower(text), '[a-z0-9_]+'),
                x -> x IN {BLOCKWORDS!r})) = 0
            THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM documents
"""


def q_events_window_streaming(sf_dir):
    """STREAMING form of ``events_window``: the (ts, event_id)-sorted
    event stream pumps through a watermarking window-actor pool that
    emits each window the moment the stream passes it (state = open
    windows only). Same aggregate, same SQL oracle — the driver
    verifies the streaming path produces the batch answer."""
    from ..stages.streaming import streaming_window_counts
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "value"])
    t = streaming_window_counts(ev)
    return pa.table({
        "user_id": t["user_id"],
        "win": t["win"],
        "n_events": t["n_events"],
        "sum_value": pa.array(round6(
            t["raw_sum"].to_numpy(zero_copy_only=False))),
    })


COND_PARTS = 8


def q_conductance_co(sf_dir):
    """Per-partition conductance on the co-purchase graph under the
    hash partitioning part(v) = v % 8 — the cut-quality diagnostic a
    partitioner/community pipeline reports (cut / min(vol, 2E - vol)).
    Per-batch 8x8 cell-count partials, tiny driver reduce; all-integer
    until the final ratio, so the match is exact."""
    e = tg.co_edges(sf_dir)

    def part(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False) % COND_PARTS
        b = t["b"].to_numpy(zero_copy_only=False) % COND_PARTS
        cnt = np.bincount(a * COND_PARTS + b,
                          minlength=COND_PARTS * COND_PARTS)
        return pa.table({"cell": pa.array(np.arange(len(cnt)),
                                          pa.int64()),
                         "n": pa.array(cnt, pa.int64())})

    m = np.zeros(COND_PARTS * COND_PARTS, dtype=np.int64)
    for t in e.map_batches(part, batch_format="pyarrow",
                           zero_copy_batch=True) \
              .iter_batches(batch_format="pyarrow"):
        # np.add.at, not fancy-index +=: iter_batches may coalesce
        # blocks, producing repeated cell ids within one batch
        np.add.at(m, t["cell"].to_numpy(zero_copy_only=False),
                  t["n"].to_numpy(zero_copy_only=False))
    M = m.reshape(COND_PARTS, COND_PARTS)
    internal = np.diag(M)
    cut = M.sum(axis=0) + M.sum(axis=1) - 2 * internal
    vol = 2 * internal + cut
    tot = int(vol.sum())
    denom = np.minimum(vol, tot - vol)
    cond = np.where(denom > 0, cut / np.maximum(denom, 1), 0.0)
    return pa.table({
        "part": pa.array(np.arange(COND_PARTS), pa.int64()),
        "internal_edges": pa.array(internal, pa.int64()),
        "cut_edges": pa.array(cut, pa.int64()),
        "vol": pa.array(vol, pa.int64()),
        "conductance": pa.array(round6(cond), pa.float64()),
    })


SQL_CONDUCTANCE_CO = """
WITH e AS (SELECT l1.l_partkey AS a, l2.l_partkey AS b
           FROM lineitem l1 JOIN lineitem l2
             ON l1.l_orderkey = l2.l_orderkey
            AND l1.l_partkey < l2.l_partkey
           GROUP BY 1, 2),
parts AS (SELECT UNNEST(generate_series(0, 7)) AS part),
agg AS (SELECT part,
               CAST(sum(CASE WHEN a % 8 = part AND b % 8 = part
                             THEN 1 ELSE 0 END) AS BIGINT) AS internal_edges,
               CAST(sum(CASE WHEN (a % 8 = part) <> (b % 8 = part)
                             THEN 1 ELSE 0 END) AS BIGINT) AS cut_edges
        FROM e, parts GROUP BY part),
v AS (SELECT part, internal_edges, cut_edges,
             2 * internal_edges + cut_edges AS vol
      FROM agg),
tot AS (SELECT sum(vol) AS t FROM v)
SELECT part, internal_edges, cut_edges, CAST(vol AS BIGINT) AS vol,
       CASE WHEN least(vol, tot.t - vol) > 0
            THEN round(CAST(cut_edges AS DOUBLE)
                       / least(vol, tot.t - vol), 6)
            ELSE 0.0 END AS conductance
FROM v, tot
"""


def q_events_median_cont(sf_dir):
    """Interpolated (percentile_cont) median of the event value per
    type: one event_type hash shuffle, per-group vectorised sort, and
    the explicit interpolation v[lo] + (pos-lo)*(v[hi]-v[lo]) — the
    SQL oracle writes the SAME window-function expression (not
    DuckDB's quantile_cont internals) so both sides evaluate identical
    IEEE operations."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def med(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["value"].to_numpy(np.float64))
        n = len(v)
        pos = (n - 1) * 0.5
        lo = int(np.floor(pos))
        hi = min(lo + 1, n - 1)
        m = v[lo] + (pos - lo) * (v[hi] - v[lo])
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "n": np.array([n], np.int64),
            "median_cont": round6([m]),
        })

    return ev.groupby("event_type").map_groups(med,
                                               batch_format="pandas")


SQL_EVENTS_MEDIAN_CONT = """
WITH o AS (SELECT event_type, value,
                  row_number() OVER (PARTITION BY event_type
                                     ORDER BY value) - 1 AS rn,
                  count(*) OVER (PARTITION BY event_type) AS n
           FROM events),
pos AS (SELECT event_type, n,
               (n - 1) * 0.5 AS p,
               CAST(floor((n - 1) * 0.5) AS BIGINT) AS lo,
               least(CAST(floor((n - 1) * 0.5) AS BIGINT) + 1,
                     n - 1) AS hi
        FROM (SELECT DISTINCT event_type, n FROM o)),
l AS (SELECT o.event_type, o.value AS lv, pos.p, pos.lo, pos.n
      FROM o JOIN pos ON o.event_type = pos.event_type
                     AND o.rn = pos.lo),
u AS (SELECT o.event_type, o.value AS uv
      FROM o JOIN pos ON o.event_type = pos.event_type
                     AND o.rn = pos.hi)
SELECT l.event_type, CAST(l.n AS BIGINT) AS n,
       round(l.lv + (l.p - l.lo) * (u.uv - l.lv), 6) AS median_cont
FROM l JOIN u ON l.event_type = u.event_type
"""


def q_cms_user_counts(sf_dir):
    """Count-Min sketch frequency estimation of per-user event counts
    (``stages/sketch.cms_frequencies``): 4x128 mergeable integer
    counters — per-batch partials, one <=512-cell groupby, sketch
    broadcast once, per-key min-over-rows estimate. Fixed sketch
    state at any stream size; all-integer, so the SQL replica (same
    md5 cell hashes, same min) is exact."""
    from ..stages import sketch as sk
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id"])
    est = sk.cms_frequencies(ev, "user_id")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(t["key"], pa.int64()),
            "cms_est": pc.cast(t["cms_est"], pa.int64()),
        })
    return est.map_batches(finish, batch_format="pyarrow")


SQL_CMS_USER_COUNTS = """
WITH cells AS (
  SELECT i.i AS r,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)
                                  || '#' || i.i), 1, 8))
              ::UBIGINT % 128 AS BIGINT) AS cell,
         count(*) AS cnt
  FROM events, generate_series(0, 3) i(i)
  GROUP BY 1, 2),
users AS (SELECT DISTINCT user_id FROM events),
uc AS (SELECT u.user_id, i.i AS r,
              CAST(('0x' || substr(md5(CAST(u.user_id AS VARCHAR)
                                       || '#' || i.i), 1, 8))
                   ::UBIGINT % 128 AS BIGINT) AS cell
       FROM users u, generate_series(0, 3) i(i))
SELECT uc.user_id, CAST(min(c.cnt) AS BIGINT) AS cms_est
FROM uc JOIN cells c ON c.r = uc.r AND c.cell = uc.cell
GROUP BY uc.user_id
"""


SKIPGRAM_WINDOW = 2


def q_walk_skipgrams(sf_dir):
    """Skip-gram (center, context) training-pair counts from the
    deterministic random walks (word2vec/node2vec corpus prep): one
    walk_id shuffle, per-walk vectorised window pairing (|step delta|
    <= 2, both directions), per-batch pair-count partials, and a
    pair-vocabulary-sized groupby."""
    g = _item_seq_distgraph(sf_dir)
    act = np.flatnonzero(g.active_global())
    seeds = act[:WALK_SEEDS].astype(np.int64)
    w, s, v = ss.random_walks(g, seeds, length=WALK_LEN)
    walks = rd.from_arrow(pa.table({
        "walk_id": pa.array(w.astype(np.int64)),
        "step": pa.array(s.astype(np.int64)),
        "vid": pa.array(v.astype(np.int64))}))

    def pairs(gdf: pd.DataFrame) -> pd.DataFrame:
        gdf = gdf.sort_values("step")
        vv = gdf["vid"].to_numpy(np.int64)
        cs, xs = [], []
        for d in range(1, SKIPGRAM_WINDOW + 1):
            if len(vv) > d:
                cs += [vv[:-d], vv[d:]]
                xs += [vv[d:], vv[:-d]]
        if not cs:
            return pd.DataFrame({"center": np.array([], np.int64),
                                 "context": np.array([], np.int64)})
        return pd.DataFrame({"center": np.concatenate(cs),
                             "context": np.concatenate(xs)})

    def pre(t: pa.Table) -> pa.Table:
        g2 = t.group_by(["center", "context"]).aggregate(
            [([], "count_all")])
        return pa.table({"center": g2["center"],
                         "context": g2["context"],
                         "cnt": g2["count_all"]})

    out = walks.groupby("walk_id").map_groups(pairs,
                                              batch_format="pandas") \
        .map_batches(pre, batch_format="pyarrow") \
        .groupby(["center", "context"]).aggregate(
            Sum("cnt", alias_name="cnt"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"center": pc.cast(t["center"], pa.int64()),
                         "context": pc.cast(t["context"], pa.int64()),
                         "cnt": pc.cast(t["cnt"], pa.int64())})
    return out.map_batches(finish, batch_format="pyarrow")


SQL_WALK_SKIPGRAMS = f"""
WITH RECURSIVE
seq AS (SELECT l_partkey AS a,
               lead(l_partkey) OVER (PARTITION BY l_orderkey
                                     ORDER BY l_linenumber, l_partkey) AS b
        FROM lineitem),
e AS (SELECT DISTINCT a, b FROM seq WHERE b IS NOT NULL),
verts AS (SELECT DISTINCT v FROM
          (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)),
seeds AS (SELECT v FROM verts ORDER BY v LIMIT {{WALK_SEEDS}}),
walk(w, s, cur) AS (
  SELECT v, 0, v FROM seeds
  UNION ALL
  SELECT w, s + 1,
         (SELECT eb.b FROM e eb WHERE eb.a = walk.cur
          ORDER BY ((walk.w % 1000003) * 7919
                    + ((walk.s + 1) % 1000003) * 104729
                    + (eb.b % 1000003) * 15485863) % 1000003, eb.b
          LIMIT 1)
  FROM walk
  WHERE s < {{WALK_LEN}}
    AND EXISTS (SELECT 1 FROM e eb WHERE eb.a = walk.cur)
)
SELECT a.cur AS center, b.cur AS context, count(*) AS cnt
FROM walk a JOIN walk b
  ON a.w = b.w AND a.s <> b.s AND abs(a.s - b.s) <= {{SKIPGRAM_WINDOW}}
GROUP BY 1, 2
""".format(WALK_SEEDS=WALK_SEEDS, WALK_LEN=WALK_LEN,
           SKIPGRAM_WINDOW=SKIPGRAM_WINDOW)


def q_edge_jaccard_co(sf_dir):
    """Per-edge neighborhood Jaccard similarity (edge embeddedness)
    on the simple co graph: support (= common-neighbor count) from the
    compact-forward wedge plan (``truss.edge_supports`` — the same
    broadcast envelope as ``triangle_count_fast``; past node memory
    the bucketed spill plan of ``triangles.triangle_count`` supplies
    the same per-edge supports), degrees from bincounts, jaccard =
    support / (deg_a + deg_b - support) as ONE integer division per
    edge — deterministic across engines. igraph similarity_jaccard
    parity for adjacent pairs."""
    from ..dist.truss import edge_supports
    t = pa.concat_tables(
        [b for b in tg.co_edge_rows(sf_dir).iter_batches(
            batch_size=None, batch_format="pyarrow")])
    s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = int(max(s.max(), d.max())) + 1
    lo = np.minimum(s, d)
    hi = np.maximum(s, d)
    keys = np.unique(lo[lo != hi] * np.int64(n) + hi[lo != hi])
    a, b = keys // n, keys % n
    sup = edge_supports(a, b, n, P=8)
    deg = np.bincount(a, minlength=n) + np.bincount(b, minlength=n)
    union = deg[a] + deg[b] - sup
    return pa.table({"a": pa.array(a), "b": pa.array(b),
                     "support": pa.array(sup),
                     "jaccard": pa.array(round6(sup / union))})


SQL_EDGE_JACCARD_CO = f"""
WITH {_SQL_CO_PAIRS},
dd AS (SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0),
sup AS (SELECT e.a, e.b, count(*) AS sp
        FROM e0 e JOIN dd x ON x.a = e.a
                  JOIN dd y ON y.a = e.b AND y.b = x.b
        GROUP BY 1, 2),
deg AS (SELECT a AS v, count(*) AS dg FROM dd GROUP BY 1)
SELECT e.a, e.b,
       CAST(COALESCE(sup.sp, 0) AS BIGINT) AS support,
       round(COALESCE(sup.sp, 0)
             / (da.dg + db.dg - COALESCE(sup.sp, 0)), 6) AS jaccard
FROM e0 e
LEFT JOIN sup ON sup.a = e.a AND sup.b = e.b
JOIN deg da ON da.v = e.a
JOIN deg db ON db.v = e.b
"""


FEATURE_PROP_DIM = 64
FEATURE_PROP_THRESHOLD = 0.4


def q_feature_prop(sf_dir):
    """GNN-style feature propagation (one smoothing round): each
    vector's neighbours in the exact cosine>=0.4 similarity graph are
    mean-aggregated. Embeddings are fixed-point quantised
    (floor(x*1e6 + 0.5) -> int64) so the distributed accumulation is
    order-independent and the SQL replica exact; the final mean is ONE
    IEEE division per (vec_id, dim). Plan: similarity edges stream
    through per-batch scatter-add partials + one (vec_id, dim)
    groupby; the quantised matrix is the broadcast small side
    (ray.put once) — past node memory the same plan hash-joins edges
    to vectors on u instead."""
    import ray
    emb = _emb(sf_dir)
    pairs = dd.embedding_cosine_pairs(
        emb, threshold=FEATURE_PROP_THRESHOLD, use_lsh=False)
    edf = emb.to_pandas()   # the small side (one row per vector)
    nvec = int(edf["vec_id"].max()) + 1
    q = np.zeros((nvec, FEATURE_PROP_DIM), dtype=np.int64)
    for vid, vec in zip(edf["vec_id"], edf["embedding"]):
        q[int(vid)] = np.floor(
            np.asarray(vec, np.float64) * 1e6 + 0.5).astype(np.int64)
    q_ref = ray.put(q)

    def prop(t: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        dsts = np.concatenate([b, a])      # each pair smooths both ends
        srcs = np.concatenate([a, b])
        vids, inv = np.unique(dsts, return_inverse=True)
        sums = np.zeros((len(vids), FEATURE_PROP_DIM), dtype=np.int64)
        np.add.at(sums, inv, qm[srcs])
        cnt = np.bincount(inv, minlength=len(vids)).astype(np.int64)
        k = len(vids)
        return pa.table({
            "vec_id": pa.array(np.repeat(vids, FEATURE_PROP_DIM)),
            "dim": pa.array(np.tile(
                np.arange(FEATURE_PROP_DIM, dtype=np.int64), k)),
            "qsum": pa.array(sums.reshape(-1)),
            "cnt": pa.array(np.repeat(cnt, FEATURE_PROP_DIM)),
        })

    agg = pairs.map_batches(prop, batch_format="pyarrow") \
        .groupby(["vec_id", "dim"]).aggregate(
            Sum("qsum", alias_name="qsum"),
            Sum("cnt", alias_name="cnt"))

    def finish(t: pa.Table) -> pa.Table:
        qsum = t["qsum"].to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "vec_id": pc.cast(t["vec_id"], pa.int64()),
            "dim": pc.cast(t["dim"], pa.int64()),
            "qsum": pa.array(qsum),
            "prop": pa.array(round6(qsum / (cnt * 1000000.0))),
        })
    return agg.map_batches(finish, batch_format="pyarrow")


SQL_FEATURE_PROP = """
WITH p AS (SELECT e1.vec_id AS a, e2.vec_id AS b
           FROM embeddings e1 JOIN embeddings e2
             ON e1.vec_id < e2.vec_id
           WHERE list_cosine_similarity(
                     CAST(e1.embedding AS DOUBLE[]),
                     CAST(e2.embedding AS DOUBLE[])) >= 0.4),
ed AS (SELECT a AS u, b AS v FROM p
       UNION ALL SELECT b AS u, a AS v FROM p),
q AS (SELECT ed.v AS vec_id, d.d AS dim,
             CAST(floor(CAST(e.embedding[d.d + 1] AS DOUBLE)
                        * 1000000 + 0.5) AS BIGINT) AS qv
      FROM ed JOIN embeddings e ON e.vec_id = ed.u
      CROSS JOIN generate_series(0, 63) d(d))
SELECT vec_id, CAST(dim AS BIGINT) AS dim,
       CAST(sum(qv) AS BIGINT) AS qsum,
       round(sum(qv) / (count(*) * 1000000), 6) AS prop
FROM q GROUP BY vec_id, dim
"""


RICH_CLUB_KS = (2, 4, 8, 16)


def q_rich_club_co(sf_dir):
    """Rich-club coefficient phi(k) = 2*E_k / (N_k*(N_k-1)) of the
    simple co graph for k in {2,4,8,16}: N_k = vertices with degree
    > k, E_k = edges with both endpoints in the club. Degrees and the
    distinct edge set come from the same broadcast-tier arrays as
    edge_jaccard_co (compact-forward envelope; the partitioned plan
    swaps in past node memory); per-k work is two vectorised masks —
    all-integer counts until the one final ratio."""
    t = pa.concat_tables(
        [bt for bt in tg.co_edge_rows(sf_dir).iter_batches(
            batch_size=None, batch_format="pyarrow")])
    s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = int(max(s.max(), d.max())) + 1
    lo = np.minimum(s, d)
    hi = np.maximum(s, d)
    keys = np.unique(lo[lo != hi] * np.int64(n) + hi[lo != hi])
    a, b = keys // n, keys % n
    deg = np.bincount(a, minlength=n) + np.bincount(b, minlength=n)
    ks, nks, eks, phis = [], [], [], []
    for k in RICH_CLUB_KS:
        nk = int((deg > k).sum())
        ek = int(((deg[a] > k) & (deg[b] > k)).sum())
        phi = float(round6([(2.0 * ek) / (nk * (nk - 1))])[0]) \
            if nk >= 2 else 0.0
        ks.append(k)
        nks.append(nk)
        eks.append(ek)
        phis.append(phi)
    return pa.table({"k": pa.array(ks, pa.int64()),
                     "n_k": pa.array(nks, pa.int64()),
                     "e_k": pa.array(eks, pa.int64()),
                     "phi": pa.array(phis, pa.float64())})


SQL_RICH_CLUB_CO = f"""
WITH {_SQL_CO_PAIRS},
d2 AS (SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0),
deg AS (SELECT a AS v, count(*) AS dg FROM d2 GROUP BY 1),
ks AS (SELECT unnest([2, 4, 8, 16]) AS k),
nk AS (SELECT ks.k, count(*) AS n_k
       FROM ks JOIN deg ON deg.dg > ks.k GROUP BY 1),
ek AS (SELECT ks.k, count(*) AS e_k
       FROM ks JOIN e0 e ON TRUE
       JOIN deg da ON da.v = e.a
       JOIN deg db ON db.v = e.b
       WHERE da.dg > ks.k AND db.dg > ks.k GROUP BY 1)
SELECT CAST(ks.k AS BIGINT) AS k,
       CAST(COALESCE(nk.n_k, 0) AS BIGINT) AS n_k,
       CAST(COALESCE(ek.e_k, 0) AS BIGINT) AS e_k,
       round(CASE WHEN COALESCE(nk.n_k, 0) >= 2
                  THEN 2.0 * COALESCE(ek.e_k, 0)
                       / (nk.n_k * (nk.n_k - 1))
                  ELSE 0.0 END, 6) AS phi
FROM ks LEFT JOIN nk ON nk.k = ks.k
        LEFT JOIN ek ON ek.k = ks.k
"""


DELTA_MOD = 8


def q_dedup_delta(sf_dir):
    """Incremental (delta) dedup: the 'new crawl' slice
    (doc_id % 8 == 0) is checked for near-duplicates AGAINST the
    existing corpus only — MinHash-LSH banding runs over corpus+delta
    and only cross (old, new) pairs survive. At 100 TB the corpus band
    buckets are a persisted index (the partitioned-parquet sink
    layout): each day's delta bands hash-join against it, so daily
    dedup costs O(delta), not O(corpus)."""
    pairs = dd.minhash_dedup(_docs(sf_dir), threshold=0.8)

    def cross(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        j = t["jaccard"].to_numpy(zero_copy_only=False)
        na = a % DELTA_MOD == 0
        nb = b % DELTA_MOD == 0
        keep = na != nb
        a, b, j, na = a[keep], b[keep], j[keep], na[keep]
        return pa.table({
            "old_id": pa.array(np.where(na, b, a)),
            "new_id": pa.array(np.where(na, a, b)),
            "jaccard": pa.array(j),
        })

    return pairs.map_batches(cross, batch_format="pyarrow")


SQL_DEDUP_DELTA = f"""
SELECT CASE WHEN a % {DELTA_MOD} = 0 THEN b ELSE a END AS old_id,
       CASE WHEN a % {DELTA_MOD} = 0 THEN a ELSE b END AS new_id,
       jaccard
FROM ({_sql_dedup_minhash()})
WHERE (a % {DELTA_MOD} = 0) <> (b % {DELTA_MOD} = 0)
"""


def q_knn_label_predict(sf_dir):
    """Semi-supervised kNN label inference over the exact cosine>=0.4
    similarity graph: each vector's predicted label is the plurality
    label of its neighbours (ties -> smallest label). Per-batch
    (vec_id, label) vote partials, one groupby, per-vertex vectorised
    argmax; the label map is the broadcast small side (one int per
    vector). ``correct`` compares against the vector's own label —
    the standard propagation-accuracy diagnostic."""
    import ray
    emb_full = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "label"]).to_pandas()
    nvec = int(emb_full["vec_id"].max()) + 1
    labels = np.full(nvec, -1, dtype=np.int64)
    labels[emb_full["vec_id"].to_numpy()] = \
        emb_full["label"].to_numpy().astype(np.int64)
    lab_ref = ray.put(labels)
    pairs = dd.embedding_cosine_pairs(
        _emb(sf_dir), threshold=FEATURE_PROP_THRESHOLD, use_lsh=False)

    def votes(t: pa.Table) -> pa.Table:
        lm = ray.get(lab_ref)
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = np.concatenate([b, a])
        u = np.concatenate([a, b])
        df = pd.DataFrame({"vec_id": v, "lbl": lm[u]})
        g = df.groupby(["vec_id", "lbl"], as_index=False).size()
        return pa.table({"vec_id": pa.array(g["vec_id"].to_numpy()),
                         "lbl": pa.array(g["lbl"].to_numpy()),
                         "c": pa.array(g["size"].to_numpy(np.int64))})

    agg = pairs.map_batches(votes, batch_format="pyarrow") \
        .groupby(["vec_id", "lbl"]).aggregate(Sum("c", alias_name="c"))

    def argmax(g: pd.DataFrame) -> pd.DataFrame:
        lm = ray.get(lab_ref)
        g = g.sort_values(["c", "lbl"], ascending=[False, True])
        vid = int(g["vec_id"].iloc[0])
        pred = int(g["lbl"].iloc[0])
        return pd.DataFrame({
            "vec_id": np.array([vid], np.int64),
            "pred_label": np.array([pred], np.int64),
            "n_nbrs": np.array([int(g["c"].sum())], np.int64),
            "correct": np.array([int(pred == lm[vid])], np.int64),
        })

    return agg.groupby("vec_id").map_groups(argmax,
                                            batch_format="pandas")


SQL_KNN_LABEL_PREDICT = """
WITH p AS (SELECT e1.vec_id AS a, e2.vec_id AS b
           FROM embeddings e1 JOIN embeddings e2
             ON e1.vec_id < e2.vec_id
           WHERE list_cosine_similarity(
                     CAST(e1.embedding AS DOUBLE[]),
                     CAST(e2.embedding AS DOUBLE[])) >= 0.4),
ed AS (SELECT a AS u, b AS v FROM p
       UNION ALL SELECT b AS u, a AS v FROM p),
votes AS (SELECT ed.v AS vec_id, e.label AS lbl, count(*) AS c
          FROM ed JOIN embeddings e ON e.vec_id = ed.u
          GROUP BY 1, 2),
best AS (SELECT vec_id, lbl, c,
                row_number() OVER (PARTITION BY vec_id
                                   ORDER BY c DESC, lbl) AS rk,
                sum(c) OVER (PARTITION BY vec_id) AS n_nbrs
         FROM votes)
SELECT b.vec_id, CAST(b.lbl AS BIGINT) AS pred_label,
       CAST(b.n_nbrs AS BIGINT) AS n_nbrs,
       CAST(CASE WHEN b.lbl = e.label THEN 1 ELSE 0 END AS BIGINT)
           AS correct
FROM best b JOIN embeddings e ON e.vec_id = b.vec_id
WHERE rk = 1
"""


def q_bfs_locality_co(sf_dir):
    """WebGraph-style locality renumbering: relabel reachable
    vertices in (BFS level, old vid) order from the smallest active
    vid and report the mean absolute edge gap |id(a) - id(b)| before
    vs after — the number that drives delta-encoded adjacency
    compression (Boldi & Vigna 2004). Integer gap sums + one
    division, so the SQL twin is exact."""
    g = _co_distgraph(sf_dir)
    act = g.active_global()
    source = int(np.flatnonzero(act)[0])
    dist, _ = ss.bfs_distances(g, [source])
    INF = np.iinfo(np.int64).max
    reach = np.flatnonzero(act & (dist < INF)).astype(np.int64)
    order = reach[np.lexsort((reach, dist[reach]))]
    new_id = np.full(g.n, -1, np.int64)
    new_id[order] = np.arange(len(order), dtype=np.int64)

    t = pa.concat_tables(
        [bt for bt in tg.co_edge_rows(sf_dir).iter_batches(
            batch_size=None, batch_format="pyarrow")])
    s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = int(max(s.max(), d.max())) + 1
    lo, hi = np.minimum(s, d), np.maximum(s, d)
    keys = np.unique(lo[lo != hi] * np.int64(n) + hi[lo != hi])
    a, b = keys // n, keys % n
    ok = (new_id[a] >= 0) & (new_id[b] >= 0)
    a, b = a[ok], b[ok]
    gap_old = int(np.abs(a - b).sum())
    gap_new = int(np.abs(new_id[a] - new_id[b]).sum())
    m = len(a)
    return pa.table({
        "n_reachable": pa.array([len(reach)], pa.int64()),
        "n_edges": pa.array([m], pa.int64()),
        "mean_gap_old": pa.array(round6([gap_old / m])),
        "mean_gap_new": pa.array(round6([gap_new / m])),
    })


SQL_BFS_LOCALITY_CO = """
WITH RECURSIVE
e0 AS (SELECT l1.l_partkey AS a, l2.l_partkey AS b
       FROM lineitem l1 JOIN lineitem l2
         ON l1.l_orderkey = l2.l_orderkey
        AND l1.l_partkey < l2.l_partkey
       GROUP BY 1, 2),
e AS (SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0),
s AS (SELECT min(a) AS v FROM e),
bfs(v, d) AS (
  SELECT v, 0 FROM s
  UNION
  SELECT e.b, bfs.d + 1 FROM bfs JOIN e ON e.a = bfs.v
  WHERE bfs.d < 30
),
lvl AS (SELECT v, min(d) AS d FROM bfs GROUP BY v),
ren AS (SELECT v, row_number() OVER (ORDER BY d, v) - 1 AS nid
        FROM lvl),
ge AS (SELECT abs(e0.a - e0.b) AS go, abs(ra.nid - rb.nid) AS gn
       FROM e0 JOIN ren ra ON ra.v = e0.a JOIN ren rb ON rb.v = e0.b)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM ren) AS n_reachable,
       CAST(count(*) AS BIGINT) AS n_edges,
       round(CAST(sum(go) AS DOUBLE) / count(*), 6) AS mean_gap_old,
       round(CAST(sum(gn) AS DOUBLE) / count(*), 6) AS mean_gap_new
FROM ge
"""


EDGECUT_P = 8


def q_partition_edgecut_co(sf_dir):
    """Partitioning self-audit: edge-cut fraction and vertex balance
    of the engine's own vid % P shard assignment on the co graph —
    the number every distributed kernel's exchange volume scales
    with. Per-batch integer partials (cut/total/per-shard vertex
    counts) -> one tiny reduction; integer sums, single divisions."""
    t = pa.concat_tables(
        [bt for bt in tg.co_edge_rows(sf_dir).iter_batches(
            batch_size=None, batch_format="pyarrow")])
    s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = int(max(s.max(), d.max())) + 1
    lo, hi = np.minimum(s, d), np.maximum(s, d)
    keys = np.unique(lo[lo != hi] * np.int64(n) + hi[lo != hi])
    a, b = keys // n, keys % n
    cut = int((a % EDGECUT_P != b % EDGECUT_P).sum())
    total = len(keys)
    deg = np.bincount(a, minlength=n) + np.bincount(b, minlength=n)
    vids = np.flatnonzero(deg > 0)
    per_shard = np.bincount(vids % EDGECUT_P, minlength=EDGECUT_P)
    balance = float(per_shard.max()) * EDGECUT_P / len(vids)
    return pa.table({
        "n_edges": pa.array([total], pa.int64()),
        "n_cut": pa.array([cut], pa.int64()),
        "cut_frac": pa.array(round6([cut / total])),
        "balance": pa.array(round6([balance])),
    })


SQL_PARTITION_EDGECUT_CO = f"""
WITH e0 AS (SELECT l1.l_partkey AS a, l2.l_partkey AS b
            FROM lineitem l1 JOIN lineitem l2
              ON l1.l_orderkey = l2.l_orderkey
             AND l1.l_partkey < l2.l_partkey
            GROUP BY 1, 2),
verts AS (SELECT a AS v FROM e0 UNION SELECT b FROM e0),
stats AS (SELECT count(*) AS total,
                 sum(CASE WHEN a % {EDGECUT_P} <> b % {EDGECUT_P}
                     THEN 1 ELSE 0 END) AS cut
          FROM e0),
shard AS (SELECT v % {EDGECUT_P} AS p, count(*) AS c
          FROM verts GROUP BY 1),
bal AS (SELECT max(c) * {EDGECUT_P}
               / (SELECT CAST(count(*) AS DOUBLE) FROM verts) AS b
        FROM shard)
SELECT CAST(stats.total AS BIGINT) AS n_edges,
       CAST(stats.cut AS BIGINT) AS n_cut,
       round(CAST(stats.cut AS DOUBLE) / stats.total, 6) AS cut_frac,
       round(bal.b, 6) AS balance
FROM stats, bal
"""


def q_ego_density_co(sf_dir):
    """Closed 1-hop ego-network density per vertex: edges within
    {v} ∪ N(v) = deg(v) spokes + tri(v) neighbour-neighbour edges
    (each such edge is exactly one triangle through v), over
    C(deg+1, 2) possible. Triangles come from the distributed
    partitioned counter; degrees from the deduped edge arrays (the
    same gate-scale broadcast as ``avg_neighbor_degree_co`` — at
    scale both terms are per-vertex kernel outputs joined on vid)."""
    _, pv = triangle_count(tg.co_edge_rows(sf_dir), num_partitions=8,
                           per_vertex=True)
    tri_pd = pv.to_pandas()
    t = pa.concat_tables(
        [bt for bt in tg.co_edge_rows(sf_dir).iter_batches(
            batch_size=None, batch_format="pyarrow")])
    s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = int(max(s.max(), d.max())) + 1
    lo = np.minimum(s, d)
    hi = np.maximum(s, d)
    keys = np.unique(lo[lo != hi] * np.int64(n) + hi[lo != hi])
    a, b = keys // n, keys % n
    deg = np.bincount(a, minlength=n) + np.bincount(b, minlength=n)
    tri = np.zeros(n, dtype=np.int64)
    tri[tri_pd["v"].to_numpy(np.int64)] = \
        tri_pd[tri_pd.columns[1]].to_numpy(np.int64)
    vids = np.flatnonzero(deg > 0).astype(np.int64)
    dv, tv = deg[vids].astype(np.int64), tri[vids]
    ego_edges = dv + tv
    denom = ((dv + 1) * dv).astype(np.float64) / 2.0
    return pa.table({
        "vid": pa.array(vids),
        "ego_n": pa.array(dv + 1),
        "ego_edges": pa.array(ego_edges),
        "density": pa.array(round6(ego_edges / denom)),
    })


SQL_EGO_DENSITY_CO = f"""
WITH {_SQL_CO_EDGES_BOTH},
deg AS (SELECT a AS vid, count(*) AS deg FROM e GROUP BY 1),
t AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e0 e1 JOIN e0 e2 ON e2.a = e1.b JOIN e0 e3
        ON e3.a = e1.a AND e3.b = e2.b),
pv AS (SELECT vid, count(*) AS tri FROM (
         SELECT x AS vid FROM t UNION ALL SELECT y FROM t
         UNION ALL SELECT z FROM t) GROUP BY vid)
SELECT CAST(deg.vid AS BIGINT) AS vid,
       CAST(deg.deg + 1 AS BIGINT) AS ego_n,
       CAST(deg.deg + coalesce(pv.tri, 0) AS BIGINT) AS ego_edges,
       round(CAST(deg.deg + coalesce(pv.tri, 0) AS DOUBLE)
             / (CAST((deg.deg + 1) * deg.deg AS DOUBLE) / 2), 6)
         AS density
FROM deg LEFT JOIN pv USING (vid)
"""


def q_avg_neighbor_degree_co(sf_dir):
    """Average neighbour degree per vertex (the knn(v) curve, the
    local form of degree assortativity): degrees broadcast once from
    the deduped edge arrays, neighbour-degree sums by vectorised
    scatter-add, ONE integer division per vertex. The companion to
    ``assortativity_co`` (global corr) at per-vertex granularity."""
    t = pa.concat_tables(
        [bt for bt in tg.co_edge_rows(sf_dir).iter_batches(
            batch_size=None, batch_format="pyarrow")])
    s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = int(max(s.max(), d.max())) + 1
    lo = np.minimum(s, d)
    hi = np.maximum(s, d)
    keys = np.unique(lo[lo != hi] * np.int64(n) + hi[lo != hi])
    a, b = keys // n, keys % n
    deg = np.bincount(a, minlength=n) + np.bincount(b, minlength=n)
    nsum = np.zeros(n, dtype=np.int64)
    np.add.at(nsum, a, deg[b])
    np.add.at(nsum, b, deg[a])
    vids = np.flatnonzero(deg > 0).astype(np.int64)
    return pa.table({
        "vid": pa.array(vids),
        "degree": pa.array(deg[vids]),
        "avg_nbr_deg": pa.array(round6(nsum[vids] / deg[vids])),
    })


SQL_AVG_NEIGHBOR_DEGREE_CO = f"""
WITH {_SQL_CO_PAIRS},
d2 AS (SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0),
deg AS (SELECT a AS v, count(*) AS dg FROM d2 GROUP BY 1)
SELECT d2.a AS vid,
       CAST(da.dg AS BIGINT) AS degree,
       round(sum(db.dg) / da.dg, 6) AS avg_nbr_deg
FROM d2 JOIN deg da ON da.v = d2.a
        JOIN deg db ON db.v = d2.b
GROUP BY d2.a, da.dg
"""


def _co_edges_decayed(sf_dir, num_partitions=16):
    """Co-occurrence edges with recency-decayed weights: each order's
    pair contributes 2^(year - 1998) (1 for the newest year down to
    1/64) — the web-crawl 'fresh links count more' weighting. Powers
    of two are exact dyadic floats, so the distributed weight sums are
    order-independent and the SQL replica exact. Plan: one
    l_orderkey hash-join attaches the order year (both sides stream;
    no driver materialisation), then the same self-join + per-batch
    pre-aggregation as ``co_edge_rows``."""
    li = tg.read_lineitem(sf_dir, ["l_orderkey", "l_partkey"])
    oy = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_orderdate"])

    def year(t: pa.Table) -> pa.Table:
        y = pc.year(t["o_orderdate"])
        return pa.table({
            "l_orderkey": t["o_orderkey"],
            "decay": pc.power(
                pa.scalar(2.0),
                pc.cast(pc.subtract(y, 1998), pa.float64())),
        })

    dated = li.join(oy.map_batches(year, batch_format="pyarrow"),
                    "inner", num_partitions, on=("l_orderkey",))
    right = li.map_batches(
        lambda t: t.rename_columns(["l_orderkey", "partkey_r"]),
        batch_format="pyarrow", zero_copy_batch=True)
    joined = dated.join(right, "inner", num_partitions,
                        on=("l_orderkey",))

    def pairs(t: pa.Table) -> pa.Table:
        keep = pc.less(t["l_partkey"], t["partkey_r"])
        tt = pa.table({"src": t["l_partkey"], "dst": t["partkey_r"],
                       "weight": t["decay"]}).filter(keep)
        out = tt.group_by(["src", "dst"]).aggregate([("weight", "sum")])
        return pa.table({
            "src": pc.cast(out["src"], pa.int64()),
            "dst": pc.cast(out["dst"], pa.int64()),
            "weight": pc.cast(out["weight_sum"], pa.float64()),
        })

    return joined.map_batches(pairs, batch_format="pyarrow",
                              zero_copy_batch=True)


def q_pagerank_decayed_co(sf_dir):
    """Weighted PageRank over the recency-decayed co graph (temporal
    link-graph weighting): same BSP kernel and fixed iteration count
    as ``pagerank_co``, only the edge-weight definition changes —
    demonstrating weight plugins compose with the kernels."""
    from ..dist.blocks import symmetrize_edges
    n = int(rd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_partkey"]).max("p_partkey")) + 1
    edges = symmetrize_edges(_co_edges_decayed(sf_dir))
    g = DistGraph.from_dataset(edges, n=n, P=8, directed=False,
                               dedup=True)
    rank, _ = ss.pagerank(g, damping=DAMPING, tol=0.0,
                          max_iter=PAGERANK_ITERS, weighted=True,
                          active=True)
    vids = np.flatnonzero(g.active_global()).astype(np.int64)
    return pa.table({"vid": pa.array(vids),
                     "rank": pa.array(round6(rank[vids]))})


SQL_PAGERANK_DECAYED_CO = f"""
WITH RECURSIVE
e0 AS (SELECT l1.l_partkey AS a, l2.l_partkey AS b,
              sum(power(2.0, CAST(year(o.o_orderdate) - 1998
                                  AS DOUBLE))) AS w
       FROM lineitem l1 JOIN lineitem l2
         ON l1.l_orderkey = l2.l_orderkey
        AND l1.l_partkey < l2.l_partkey
       JOIN orders o ON o.o_orderkey = l1.l_orderkey
       GROUP BY 1, 2),
e AS (SELECT a, b, w FROM e0 UNION ALL SELECT b, a, w FROM e0),
verts AS (SELECT a AS v, sum(w) AS strength FROM e GROUP BY a),
nn AS (SELECT count(*) AS n FROM verts),
pr(i, v, r) AS (
  SELECT 0, v, 1.0 / (SELECT n FROM nn) FROM verts
  UNION ALL
  SELECT p.i + 1, e.b,
         (1 - {DAMPING}) / (SELECT n FROM nn)
         + {DAMPING} * sum(p.r * e.w / vs.strength)
  FROM pr p
  JOIN verts vs ON vs.v = p.v
  JOIN e ON e.a = p.v
  WHERE p.i < {PAGERANK_ITERS}
  GROUP BY p.i, e.b
)
SELECT v AS vid, round(r, 6) AS rank
FROM pr WHERE i = {PAGERANK_ITERS}
"""


def q_bigram_pmi(sf_dir):
    """PMI-scored collocations: pointwise mutual information for the
    top-20 bigrams — pmi = ln(c_ab * T_tok^2 / (T_pairs * c_a * c_b)),
    every count an exact integer so the single ln is the only float op
    (same ln-parity-with-DuckDB contract the HLL estimator uses). One
    extra corpus pass gathers unigram counts for the <=40 words of the
    top bigrams (word set broadcast once) plus the two totals as
    sentinel rows — the shuffle carries <=42 rows per batch."""
    import ray
    top = tx.bigram_top_terms(_docs(sf_dir), k=BIGRAM_TOP_K).to_pandas()
    words = np.array(sorted(set(top["a"]) | set(top["b"])))
    wref = ray.put(words)

    def partial(t: pa.Table) -> pa.Table:
        w = ray.get(wref)
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]),
                                      "[^a-z0-9]+")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False)
        keep = flat != ""
        f, p = flat[keep], par[keep]
        n_pairs = int((p[:-1] == p[1:]).sum()) if len(f) >= 2 else 0
        m = np.isin(f, w)
        vals, cnts = np.unique(f[m], return_counts=True)
        return pa.table({
            "w": pa.array(list(vals) + ["\x00tok", "\x00pair"]),
            "c": pa.array(list(cnts.astype(np.int64))
                          + [len(f), n_pairs], pa.int64()),
        })

    agg = _docs(sf_dir).map_batches(partial, batch_format="pyarrow",
                                    zero_copy_batch=True) \
        .groupby("w").aggregate(Sum("c", alias_name="c")).to_pandas()
    cmap = dict(zip(agg["w"], agg["c"].astype(np.int64)))
    t_tok = int(cmap.pop("\x00tok"))
    t_pairs = int(cmap.pop("\x00pair"))
    n = top["n"].to_numpy(np.int64)
    ca = np.array([cmap[x] for x in top["a"]], np.int64)
    cb = np.array([cmap[x] for x in top["b"]], np.int64)
    num = n * t_tok * t_tok
    den = t_pairs * ca * cb
    return pa.table({
        "a": pa.array(top["a"]), "b": pa.array(top["b"]),
        "n": pa.array(n),
        "pmi": pa.array(round6(np.log(num / den))),
    })


SQL_BIGRAM_PMI = f"""
WITH t AS (SELECT doc_id, list_filter(
             regexp_split_to_array(lower(text), '[^a-z0-9]+'),
             x -> x <> '') AS arr
           FROM documents),
tok AS (SELECT doc_id, unnest(arr) AS w,
               generate_subscripts(arr, 1) AS i FROM t),
seq AS (SELECT w AS a,
               lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS b
        FROM tok),
agg AS (SELECT a, b, count(*) AS n FROM seq WHERE b IS NOT NULL
        GROUP BY a, b),
top AS (SELECT a, b, n FROM agg ORDER BY n DESC, a, b
        LIMIT {BIGRAM_TOP_K}),
uni AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
tot AS (SELECT (SELECT count(*) FROM tok) AS t_tok,
               (SELECT count(*) FROM seq WHERE b IS NOT NULL)
                   AS t_pairs)
SELECT top.a, top.b, CAST(top.n AS BIGINT) AS n,
       round(ln((top.n * tot.t_tok * tot.t_tok)
                / (tot.t_pairs * ua.c * ub.c)), 6) AS pmi
FROM top CROSS JOIN tot
JOIN uni ua ON ua.w = top.a
JOIN uni ub ON ub.w = top.b
"""


def q_audience_overlap(sf_dir):
    """Audience overlap: user-set Jaccard between every pair of event
    types. Per-batch (user, type) dedup partials, ONE user_id hash
    shuffle, per-user pair emission (types-per-user is tiny), then a
    pair-keyed count — the output is |types|^2-bounded however many
    users stream through."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])

    def pre(t: pa.Table) -> pa.Table:
        return t.group_by(["user_id", "event_type"]).aggregate([])

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        ts = sorted(g["event_type"].unique())
        ta, tb = [], []
        for i in range(len(ts)):
            ta.append(ts[i])
            tb.append(ts[i])          # diagonal row = set size
            for j in range(i + 1, len(ts)):
                ta.append(ts[i])
                tb.append(ts[j])
        return pd.DataFrame({"ta": ta, "tb": tb,
                             "c": np.ones(len(ta), np.int64)})

    cnt = ev.map_batches(pre, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("user_id").map_groups(emit, batch_format="pandas") \
        .groupby(["ta", "tb"]).aggregate(Sum("c", alias_name="c")) \
        .to_pandas()
    sz = dict(zip(cnt[cnt["ta"] == cnt["tb"]]["ta"],
                  cnt[cnt["ta"] == cnt["tb"]]["c"].astype(np.int64)))
    off = cnt[cnt["ta"] != cnt["tb"]]
    inter = off["c"].to_numpy(np.int64)
    na = np.array([sz[x] for x in off["ta"]], np.int64)
    nb = np.array([sz[x] for x in off["tb"]], np.int64)
    return pa.table({
        "ta": pa.array(off["ta"]), "tb": pa.array(off["tb"]),
        "inter": pa.array(inter),
        "n_a": pa.array(na), "n_b": pa.array(nb),
        "jaccard": pa.array(round6(inter / (na + nb - inter))),
    })


SQL_AUDIENCE_OVERLAP = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
pairs AS (SELECT a.event_type AS ta, b.event_type AS tb,
                 count(*) AS inter
          FROM ut a JOIN ut b
            ON a.user_id = b.user_id AND a.event_type < b.event_type
          GROUP BY 1, 2),
sz AS (SELECT event_type, count(*) AS n FROM ut GROUP BY 1)
SELECT p.ta, p.tb, CAST(p.inter AS BIGINT) AS inter,
       CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
       round(p.inter / (sa.n + sb.n - p.inter), 6) AS jaccard
FROM pairs p JOIN sz sa ON sa.event_type = p.ta
             JOIN sz sb ON sb.event_type = p.tb
"""


SEG_LEN = 10



def q_doc_segment_dedup(sf_dir):
    """Segment-level exact dedup ratio (the MassiveText/'Deduplicating
    Training Data' line-dedup op adapted to fixed 10-token chunks):
    per-doc fraction of non-overlapping 10-token segments whose hash
    occurs >= 2 times corpus-wide. Plan: explode segments per batch,
    ONE segment-hash groupby for corpus counts, one hash-join back,
    per-doc count aggregates — no driver-side segment state."""
    from ray.data.aggregate import Count
    segs = _docs(sf_dir).map_batches(_segment_explode,
                                     batch_format="pyarrow",
                                     zero_copy_batch=True)
    cnts = segs.groupby("h").aggregate(Count(alias_name="cnt"))
    dup = cnts.map_batches(
        lambda t: t.filter(pc.greater_equal(t["cnt"], 2)),
        batch_format="pyarrow", zero_copy_batch=True)
    joined = segs.join(dup, "inner", 8, on=("h",))
    ndup = joined.groupby("doc_id").aggregate(
        Count(alias_name="n_dup")).to_pandas()
    nseg = segs.groupby("doc_id").aggregate(
        Count(alias_name="n_segs")).to_pandas()
    df = nseg.merge(ndup, on="doc_id", how="left")
    n_segs = df["n_segs"].to_numpy(np.int64)
    n_dup = df["n_dup"].fillna(0).to_numpy(np.int64)
    return pa.table({
        "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
        "n_segs": pa.array(n_segs),
        "n_dup": pa.array(n_dup),
        "dup_ratio": pa.array(round6(n_dup / n_segs)),
    })


def _segment_explode(t: pa.Table) -> pa.Table:
    """(doc_id, text) -> one row per non-overlapping SEG_LEN-token
    segment: (doc_id, md5-of-joined-tokens). Same tokenizer as the
    bigram/vocab family."""
    import hashlib
    toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]),
                                  "[^a-z0-9]+")
    flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
    par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    keep = flat != ""
    f, p = flat[keep], par[keep]
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    out_id, out_h = [], []
    for row in np.unique(p) if len(p) else []:
        w = f[p == row]
        # the SQL oracle enumerates segments with generate_series(0,
        # 998); a doc with >=999 segments (~9990 tokens) would silently
        # diverge, so fail loudly instead (corpus docs are ~200 tokens)
        assert len(w) // SEG_LEN <= 998, \
            f"doc with {len(w)} tokens exceeds the SQL oracle's " \
            f"generate_series segment bound"
        for k in range(len(w) // SEG_LEN):
            seg = " ".join(w[k * SEG_LEN:(k + 1) * SEG_LEN])
            out_id.append(int(ids[row]))
            out_h.append(hashlib.md5(seg.encode()).hexdigest())
    return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                     "h": pa.array(out_h, pa.string())})


SQL_DOC_SEGMENT_DEDUP = f"""
WITH t AS (SELECT doc_id, list_filter(
             regexp_split_to_array(lower(text), '[^a-z0-9]+'),
             x -> x <> '') AS arr
           FROM documents),
segs AS (SELECT doc_id,
                md5(array_to_string(
                    arr[(k * {SEG_LEN} + 1):(k * {SEG_LEN} + {SEG_LEN})],
                    ' ')) AS h
         FROM t, generate_series(0, 998) g(k)
         WHERE k < CAST(floor(len(arr) / {SEG_LEN}) AS BIGINT)),
c AS (SELECT h, count(*) AS cnt FROM segs GROUP BY h),
perdoc AS (SELECT s.doc_id, count(*) AS n_segs,
                  sum(CASE WHEN c.cnt >= 2 THEN 1 ELSE 0 END) AS n_dup
           FROM segs s JOIN c ON c.h = s.h GROUP BY 1)
SELECT doc_id, CAST(n_segs AS BIGINT) AS n_segs,
       CAST(n_dup AS BIGINT) AS n_dup,
       round(n_dup / n_segs, 6) AS dup_ratio
FROM perdoc
"""


def q_embed_quantize(sf_dir):
    """Per-vector int8 scalar quantization diagnostics (vector-store
    compression): scale = (max-min)/255, q = floor((x-min)/scale+0.5),
    reconstruction error = max |min + q*scale - x|. Pure map stage —
    each vector is complete within its row, nothing shuffles; every
    float op is written identically in the SQL oracle."""
    emb = _emb(sf_dir)

    def quant(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        arr = t["embedding"].combine_chunks()
        X = np.asarray(arr.flatten(), np.float64).reshape(len(arr), -1)
        mn = X.min(axis=1)
        mx = X.max(axis=1)
        sc = (mx - mn) / 255
        # constant vector: sc == 0 would give 0/0 NaN (and DuckDB's
        # 0/0 handling differs) — quantization is exact, err = 0
        safe = np.where(sc == 0, 1.0, sc)
        q = np.floor((X - mn[:, None]) / safe[:, None] + 0.5)
        err = np.abs(mn[:, None] + q * safe[:, None] - X).max(axis=1)
        err = np.where(sc == 0, 0.0, err)
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "vmin": pa.array(round6(mn)),
            "vmax": pa.array(round6(mx)),
            "max_err": pa.array(round6(err)),
        })

    return emb.map_batches(quant, batch_format="pyarrow",
                           zero_copy_batch=True)


SQL_EMBED_QUANTIZE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
s AS (SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx FROM e),
q AS (SELECT vec_id, mn, mx, (mx - mn) / 255 AS sc, v FROM s)
SELECT vec_id, round(mn, 6) AS vmin, round(mx, 6) AS vmax,
       CASE WHEN mx = mn THEN 0.0 ELSE
       round(list_max([abs(mn + floor((x - mn) / sc + 0.5) * sc - x)
                       for x in v]), 6) END AS max_err
FROM q
"""


def q_dedup_provenance(sf_dir):
    """Provenance matrix of near-duplication: MinHash-LSH verified
    pairs counted by (source, source) — the 'which crawls/feeds
    duplicate each other' curation diagnostic. The doc->source map is
    the broadcast small side (one string per doc id; at corpus scale
    this is a hash-join of pairs to metadata); per-batch pair counts,
    one |sources|^2-bounded groupby."""
    import ray
    meta = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source"]).to_pandas()
    src = dict(zip(meta["doc_id"].astype(int), meta["source"]))
    sref = ray.put(src)
    pairs = dd.minhash_dedup(_docs(sf_dir), threshold=0.8)

    def tag(t: pa.Table) -> pa.Table:
        sm = ray.get(sref)
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        sa = [sm[int(x)] for x in a]
        sb = [sm[int(x)] for x in b]
        lo = [min(x, y) for x, y in zip(sa, sb)]
        hi = [max(x, y) for x, y in zip(sa, sb)]
        tt = pa.table({"src_a": pa.array(lo, pa.string()),
                       "src_b": pa.array(hi, pa.string())})
        return tt.group_by(["src_a", "src_b"]).aggregate(
            [([], "count_all")]).rename_columns(
                ["src_a", "src_b", "n_pairs"])

    out = pairs.map_batches(tag, batch_format="pyarrow") \
        .groupby(["src_a", "src_b"]).aggregate(
            Sum("n_pairs", alias_name="n_pairs"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "src_a": pc.cast(t["src_a"], pa.string()),
            "src_b": pc.cast(t["src_b"], pa.string()),
            "n_pairs": pc.cast(t["n_pairs"], pa.int64()),
        })
    return out.map_batches(finish, batch_format="pyarrow")


SQL_DEDUP_PROVENANCE = f"""
WITH prs AS ({_sql_dedup_minhash()})
SELECT least(da.source, db.source) AS src_a,
       greatest(da.source, db.source) AS src_b,
       count(*) AS n_pairs
FROM prs JOIN documents da ON da.doc_id = prs.a
         JOIN documents db ON db.doc_id = prs.b
GROUP BY 1, 2
"""


def q_lang_confusion(sf_dir):
    """Language-ID confusion matrix (lang-id quality audit): the
    LangId actor-pool predictions counted against the ground-truth
    ``lang`` column. The doc->lang map is the broadcast small side
    (at corpus scale: carry ``lang`` through the prediction batch);
    per-batch (true, pred) count partials, |langs|^2-bounded
    groupby."""
    import ray
    meta = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang"]).to_pandas()
    lm = dict(zip(meta["doc_id"].astype(int), meta["lang"]))
    lref = ray.put(lm)
    pred = tx.lang_id(_docs(sf_dir))

    def tag(t: pa.Table) -> pa.Table:
        m = ray.get(lref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        tt = pa.table({
            "lang_true": pa.array([m[int(i)] for i in ids],
                                  pa.string()),
            "pred_lang": t["pred_lang"],
        })
        return tt.group_by(["lang_true", "pred_lang"]).aggregate(
            [([], "count_all")]).rename_columns(
                ["lang_true", "pred_lang", "n"])

    out = pred.map_batches(tag, batch_format="pyarrow") \
        .groupby(["lang_true", "pred_lang"]).aggregate(
            Sum("n", alias_name="n"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "lang_true": pc.cast(t["lang_true"], pa.string()),
            "pred_lang": pc.cast(t["pred_lang"], pa.string()),
            "n": pc.cast(t["n"], pa.int64()),
        })
    return out.map_batches(finish, batch_format="pyarrow")


SQL_LANG_CONFUSION = f"""
WITH pred AS ({SQL_LANG_ID})
SELECT d.lang AS lang_true, p.pred_lang, count(*) AS n
FROM pred p JOIN documents d ON d.doc_id = p.doc_id
GROUP BY 1, 2
"""


def q_source_similarity(sf_dir):
    """Corpus-similarity matrix between sources: cosine over the
    per-source term-count vectors — 'which feeds look alike'
    curation diagnostic. Per-batch (source, term) count partials, one
    vocabulary-bounded groupby; the |sources| x |vocab| table is tiny
    whatever the corpus size, so the pairwise cosines assemble on the
    driver. All-integer dot products; sqrt/divide are the only float
    ops, written identically in SQL."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]),
                                      "[^a-z0-9]+")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False)
        keep = flat != ""
        src = t["source"].to_numpy(zero_copy_only=False)[par[keep]]
        df = pd.DataFrame({"source": src, "w": flat[keep]})
        g = df.groupby(["source", "w"], as_index=False).size()
        return pa.table({"source": pa.array(g["source"]),
                         "w": pa.array(g["w"]),
                         "c": pa.array(g["size"].to_numpy(np.int64))})

    agg = docs.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True) \
        .groupby(["source", "w"]).aggregate(
            Sum("c", alias_name="c")).to_pandas()
    piv = agg.pivot_table(index="source", columns="w", values="c",
                          fill_value=0, aggfunc="sum").astype(np.int64)
    srcs = list(piv.index)
    m = piv.to_numpy()
    n2 = (m * m).sum(axis=1)
    oa, ob, od, oc = [], [], [], []
    for i in range(len(srcs)):
        for j in range(len(srcs)):
            if srcs[i] < srcs[j]:
                dot = int(m[i] @ m[j])
                oa.append(srcs[i])
                ob.append(srcs[j])
                od.append(dot)
                oc.append(dot / (np.sqrt(n2[i]) * np.sqrt(n2[j])))
    return pa.table({"src_a": pa.array(oa, pa.string()),
                     "src_b": pa.array(ob, pa.string()),
                     "dot": pa.array(od, pa.int64()),
                     "cos": pa.array(round6(oc))})


SQL_SOURCE_SIMILARITY = """
WITH tok AS (SELECT source,
                    unnest(list_filter(
                        regexp_split_to_array(lower(text),
                                              '[^a-z0-9]+'),
                        x -> x <> '')) AS w
             FROM documents),
c AS (SELECT source, w, count(*) AS c FROM tok GROUP BY 1, 2),
nrm AS (SELECT source, sum(c * c) AS n2 FROM c GROUP BY 1),
dot AS (SELECT a.source AS src_a, b.source AS src_b,
               sum(a.c * b.c) AS dot
        FROM c a JOIN c b ON a.w = b.w AND a.source < b.source
        GROUP BY 1, 2)
SELECT d.src_a, d.src_b, CAST(d.dot AS BIGINT) AS dot,
       round(d.dot / (sqrt(na.n2) * sqrt(nb.n2)), 6) AS cos
FROM dot d JOIN nrm na ON na.source = d.src_a
           JOIN nrm nb ON nb.source = d.src_b
"""


K_ANON = 5


def q_k_anonymity(sf_dir):
    """k-anonymity audit over the (event_type, hour-of-day)
    quasi-identifier: groups with fewer than k=5 rows are re-identifi-
    cation risks a privacy-aware training-data pipeline must flag.
    Per-batch combo-count partials, one |types|x24-bounded groupby —
    counts never leave integer space."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def pre(t: pa.Table) -> pa.Table:
        tt = pa.table({"event_type": t["event_type"],
                       "hour": pc.cast(pc.hour(t["ts"]), pa.int64())})
        return tt.group_by(["event_type", "hour"]).aggregate(
            [([], "count_all")]).rename_columns(
                ["event_type", "hour", "n"])

    agg = ev.map_batches(pre, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby(["event_type", "hour"]).aggregate(
            Sum("n", alias_name="n"))

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "event_type": pc.cast(t["event_type"], pa.string()),
            "hour": pc.cast(t["hour"], pa.int64()),
            "n": pa.array(n),
            "at_risk": pa.array((n < K_ANON).astype(np.int64)),
        })
    return agg.map_batches(finish, batch_format="pyarrow")


SQL_K_ANONYMITY = f"""
SELECT event_type, CAST(hour(ts) AS BIGINT) AS hour,
       count(*) AS n,
       CAST(CASE WHEN count(*) < {K_ANON} THEN 1 ELSE 0 END
            AS BIGINT) AS at_risk
FROM events GROUP BY 1, 2
"""


def q_events_drift(sf_dir):
    """Distribution-drift table: weekly observed event-type counts vs
    the expectation under the whole-corpus type mix — the training-
    data freshness/drift audit. All counts integers; the expectation
    week_total*type_total/T is the single float op per cell (no
    order-dependent float sums)."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def pre(t: pa.Table) -> pa.Table:
        iso = pc.iso_week(t["ts"])
        tt = pa.table({"event_type": t["event_type"],
                       "week": pc.cast(iso, pa.int64())})
        return tt.group_by(["event_type", "week"]).aggregate(
            [([], "count_all")]).rename_columns(
                ["event_type", "week", "o"])

    agg = ev.map_batches(pre, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby(["event_type", "week"]).aggregate(
            Sum("o", alias_name="o")).to_pandas()
    o = agg["o"].to_numpy(np.int64)
    wk_tot = agg.groupby("week")["o"].transform("sum") \
        .to_numpy(np.int64)
    ty_tot = agg.groupby("event_type")["o"].transform("sum") \
        .to_numpy(np.int64)
    total = int(o.sum())
    return pa.table({
        "event_type": pa.array(agg["event_type"], pa.string()),
        "week": pa.array(agg["week"].to_numpy(np.int64)),
        "o": pa.array(o),
        "expected": pa.array(round6(wk_tot * ty_tot / total)),
    })


SQL_EVENTS_DRIFT = """
WITH c AS (SELECT event_type, CAST(weekofyear(ts) AS BIGINT) AS week,
                  count(*) AS o
           FROM events GROUP BY 1, 2),
wk AS (SELECT week, sum(o) AS wt FROM c GROUP BY 1),
ty AS (SELECT event_type, sum(o) AS tt FROM c GROUP BY 1),
tot AS (SELECT sum(o) AS t FROM c)
SELECT c.event_type, c.week, CAST(c.o AS BIGINT) AS o,
       round(wk.wt * ty.tt / tot.t, 6) AS expected
FROM c JOIN wk ON wk.week = c.week
       JOIN ty ON ty.event_type = c.event_type
       CROSS JOIN tot
"""


NEG_SAMPLES = 500


def q_link_negatives(sf_dir):
    """Deterministic negative sampling for link-prediction training
    (GNN corpus prep): NEG_SAMPLES hash-generated candidate pairs over
    the active vertex set, kept when they are NOT co-graph edges.
    Candidate generation is embarrassingly parallel (pure arithmetic
    on the sample index); edge membership uses the broadcast sorted
    key set (compact-forward envelope; the partitioned bucket plan
    swaps in past node memory). Same modular-hash constants as the
    random-walk kernel, so the SQL replica is exact."""
    t = pa.concat_tables(
        [bt for bt in tg.co_edge_rows(sf_dir).iter_batches(
            batch_size=None, batch_format="pyarrow")])
    s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = int(max(s.max(), d.max())) + 1
    lo = np.minimum(s, d)
    hi = np.maximum(s, d)
    keys = np.unique(lo[lo != hi] * np.int64(n) + hi[lo != hi])
    vids = np.unique(np.concatenate([lo, hi]))
    nv = len(vids)
    i = np.arange(NEG_SAMPLES, dtype=np.int64)
    u = vids[(i * 104729) % nv]
    v = vids[(i * 15485863 + 7919) % nv]
    a = np.minimum(u, v)
    b = np.maximum(u, v)
    ok = a != b
    i, a, b = i[ok], a[ok], b[ok]
    k = a * np.int64(n) + b
    idx = np.searchsorted(keys, k).clip(0, len(keys) - 1)
    non_edge = keys[idx] != k
    return pa.table({"i": pa.array(i[non_edge]),
                     "a": pa.array(a[non_edge]),
                     "b": pa.array(b[non_edge])})


SQL_LINK_NEGATIVES = f"""
WITH {_SQL_CO_PAIRS},
verts AS (SELECT v, row_number() OVER (ORDER BY v) - 1 AS r
          FROM (SELECT a AS v FROM e0 UNION SELECT b FROM e0)),
nv AS (SELECT count(*) AS c FROM verts),
cand AS (SELECT g.i,
                vu.v AS u, vv.v AS v
         FROM generate_series(0, {NEG_SAMPLES - 1}) g(i)
         CROSS JOIN nv
         JOIN verts vu ON vu.r = (g.i * 104729) % nv.c
         JOIN verts vv ON vv.r = (g.i * 15485863 + 7919) % nv.c),
pairs AS (SELECT i, least(u, v) AS a, greatest(u, v) AS b
          FROM cand WHERE u <> v)
SELECT p.i, p.a, p.b
FROM pairs p
LEFT JOIN e0 e ON e.a = p.a AND e.b = p.b
WHERE e.a IS NULL
"""


PPS_MOD = 1_000_000


AES_TOPK = 50
AES_LN_Q = 1_000_000_000


def q_orders_aes_sample(sf_dir):
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis
    A-ES, Inf. Process. Lett. 2006): keep the top-k orders by priority
    ln(u)/w where u is a deterministic md5-uniform in (0,1] and
    w = integer cents of o_totalprice — one pass, per-batch partial
    top-k (the ``ann_topk`` winner envelope: the driver sees k rows
    per batch, never the corpus). u uses the hash's top 52 bits so
    (h52 + 1) / 2^52 is one exact IEEE conversion on both engines;
    ln is quantised to 1e-9 fixed point (the ``partition_compare``
    trick) and the final key q/w is a single integer-over-integer
    IEEE division — bit-identical in DuckDB."""
    od = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        import hashlib
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        w = np.floor(p * 100 + 0.5).astype(np.int64)
        h = np.array([int.from_bytes(
            hashlib.md5(str(int(x)).encode()).digest()[:8], "big")
            for x in k], dtype=np.uint64)
        u = ((h >> np.uint64(12)).astype(np.float64) + 1.0) / (2.0 ** 52)
        q = np.floor(np.log(u) * AES_LN_Q + 0.5).astype(np.int64)
        key = q.astype(np.float64) / w
        order = np.lexsort((k, -key))[:AES_TOPK]
        return pa.table({
            "o_orderkey": pa.array(k[order].astype(np.int64)),
            "priority": pa.array(key[order]),
        })

    parts = od.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    parts = parts.sort_values(["priority", "o_orderkey"],
                              ascending=[False, True]).head(AES_TOPK)
    return pa.table({
        "o_orderkey": pa.array(parts["o_orderkey"].to_numpy(np.int64)),
        "priority": pa.array(round6(parts["priority"].to_numpy())),
    })


SQL_ORDERS_AES_SAMPLE = f"""
WITH x AS (
  SELECT o_orderkey AS id,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS w,
         ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 16))
           ::UBIGINT AS h
  FROM orders),
k AS (
  SELECT id, w,
         CAST(floor(ln((CAST(h >> 12 AS DOUBLE) + 1.0)
                        / 4503599627370496.0)
                    * {AES_LN_Q} + 0.5) AS BIGINT) AS q
  FROM x)
SELECT CAST(id AS BIGINT) AS o_orderkey,
       round(CAST(q AS DOUBLE) / w, 6) AS priority
FROM k ORDER BY CAST(q AS DOUBLE) / w DESC, id LIMIT {AES_TOPK}
"""


def q_orders_pps_sample(sf_dir):
    """Deterministic probability-proportional-to-size sampling:
    order o is kept iff md5-hash(o_orderkey) % 1e6 <
    floor(o_totalprice) (integer-cents-free PPS — bigger orders more
    likely). Pure map stage, no shuffle, reproducible row-for-row in
    SQL; the standard weighted-subsample op for training-mix
    construction."""
    od = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_totalprice"])

    def keep(t: pa.Table) -> pa.Table:
        import hashlib
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        h = np.array([int.from_bytes(
            hashlib.md5(str(int(x)).encode()).digest()[:4], "big")
            for x in k], dtype=np.int64) % PPS_MOD
        m = h < np.floor(p).astype(np.int64)
        return pa.table({
            "o_orderkey": pa.array(k[m].astype(np.int64)),
            "o_totalprice": pa.array(p[m]),
        })

    return od.map_batches(keep, batch_format="pyarrow",
                          zero_copy_batch=True)


SQL_ORDERS_PPS_SAMPLE = f"""
SELECT o_orderkey, o_totalprice
FROM orders
WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
      ::UBIGINT % {PPS_MOD}
      < CAST(floor(o_totalprice) AS BIGINT)
"""


EQUIDEPTH_QS = (0.25, 0.5, 0.75)


def q_price_equidepth(sf_dir):
    """Equi-depth (quantile-boundary) binning: quartile boundaries of
    o_totalprice learned once (percentile_disc order statistics),
    broadcast, then every order assigned bucket = #boundaries strictly
    below its price; per-bucket counts. The learn-boundaries-then-
    broadcast pattern is how equi-depth histograms are built at scale
    (one small aggregate, then a pure map)."""
    od = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_totalprice"])
    # boundary learning: distinct-value counts via one groupby — the
    # driver holds only the (distinct price, count) aggregate, never
    # the raw column; stored doubles are preserved exactly so bucket
    # comparisons bit-match the SQL
    vc = od.map_batches(
        lambda t: t.group_by(["o_totalprice"]).aggregate(
            [([], "count_all")]).rename_columns(["p", "c"]),
        batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("p").aggregate(Sum("c", alias_name="c")).to_pandas() \
        .sort_values("p")
    cum = vc["c"].to_numpy(np.int64).cumsum()
    n = int(cum[-1])
    pv = vc["p"].to_numpy(np.float64)
    bounds = np.array([
        pv[np.searchsorted(cum, max(int(np.ceil(q * n)), 1))]
        for q in EQUIDEPTH_QS])

    import ray
    bref = ray.put(bounds)

    def assign(t: pa.Table) -> pa.Table:
        bs = ray.get(bref)
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        bucket = (p[:, None] > bs[None, :]).sum(axis=1).astype(np.int64)
        tt = pa.table({"bucket": pa.array(bucket)})
        return tt.group_by(["bucket"]).aggregate(
            [([], "count_all")]).rename_columns(["bucket", "n"])

    agg = od.map_batches(assign, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("bucket").aggregate(Sum("n", alias_name="n"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "bucket": pc.cast(t["bucket"], pa.int64()),
            "n": pc.cast(t["n"], pa.int64()),
        })
    return agg.map_batches(finish, batch_format="pyarrow")


SQL_PRICE_EQUIDEPTH = """
WITH o AS (SELECT o_totalprice AS p,
                  row_number() OVER (ORDER BY o_totalprice) AS rn,
                  count(*) OVER () AS n
           FROM orders),
b AS (SELECT q.q,
             (SELECT p FROM o
              WHERE rn = greatest(CAST(ceil(q.q * o2.n) AS BIGINT), 1)
              LIMIT 1) AS bound
      FROM (SELECT unnest([0.25, 0.5, 0.75]) AS q) q
      CROSS JOIN (SELECT count(*) AS n FROM orders) o2)
SELECT CAST((SELECT count(*) FROM b
             WHERE orders.o_totalprice > b.bound) AS BIGINT) AS bucket,
       count(*) AS n
FROM orders GROUP BY 1
"""


def q_embed_components(sf_dir):
    """Embedding clustering via connected components of the exact
    cosine>=0.4 similarity graph: the vector analogue of near-dup
    clustering — pairs stream into Dataset-built CSR blocks and the
    sharded min-label BSP kernel runs as on any other graph (kernels
    are graph-source-agnostic). Output covers vectors with >= 1
    neighbour; component id = min vec_id in the component."""
    from ..dist.blocks import symmetrize_edges
    emb = _emb(sf_dir)
    nvec = int(rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id"]).max("vec_id")) + 1
    pairs = dd.embedding_cosine_pairs(
        emb, threshold=FEATURE_PROP_THRESHOLD, use_lsh=False)

    def as_edges(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["a"], "dst": t["b"]})

    edges = symmetrize_edges(pairs.map_batches(
        as_edges, batch_format="pyarrow", zero_copy_batch=True))
    g = DistGraph.from_dataset(edges, n=nvec, P=4, directed=False,
                               dedup=True)
    lab, _ = ss.connected_components(g)
    vids = np.flatnonzero(g.active_global()).astype(np.int64)
    return pa.table({"vec_id": pa.array(vids),
                     "component": pa.array(lab[vids].astype(np.int64))})


SQL_EMBED_COMPONENTS = """
WITH RECURSIVE
p AS (SELECT e1.vec_id AS a, e2.vec_id AS b
      FROM embeddings e1 JOIN embeddings e2 ON e1.vec_id < e2.vec_id
      WHERE list_cosine_similarity(
                CAST(e1.embedding AS DOUBLE[]),
                CAST(e2.embedding AS DOUBLE[])) >= 0.4),
e AS (SELECT a, b FROM p UNION SELECT b, a FROM p),
verts AS (SELECT DISTINCT a AS v FROM e),
reach(v, u) AS (
  SELECT v, v FROM verts
  UNION
  SELECT r.v, e.b FROM reach r JOIN e ON e.a = r.u
)
SELECT v AS vec_id, CAST(min(u) AS BIGINT) AS component
FROM reach GROUP BY v
"""


def q_revenue_by_nation(sf_dir):
    """TPC-H Q5-shaped star join: revenue by customer nation where the
    supplier is local (c_nationkey = s_nationkey) — the canonical
    multi-way join plan: every dimension (customer->nation->region,
    supplier) broadcast once via ray.put, the ONE big fact join
    (orders |><| lineitem on orderkey) as a Dataset hash join,
    per-batch revenue partials in EXACT integer 1e-4 units
    (cents x (100 - discount%)), one |nations|-bounded groupby.
    Reference pattern: prune at the read, broadcast small sides,
    shuffle the fact table once."""
    import ray
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"]) \
        .to_pandas()
    supp = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_nationkey"]) \
        .to_pandas()
    nat = rd.read_parquet(f"{sf_dir}/nation.parquet",
                          columns=["n_nationkey", "n_name"]).to_pandas()
    c_nat = np.full(int(cust["c_custkey"].max()) + 1, -1, np.int64)
    c_nat[cust["c_custkey"].to_numpy()] = \
        cust["c_nationkey"].to_numpy(np.int64)
    s_nat = np.full(int(supp["s_suppkey"].max()) + 1, -1, np.int64)
    s_nat[supp["s_suppkey"].to_numpy()] = \
        supp["s_nationkey"].to_numpy(np.int64)
    cref, sref = ray.put(c_nat), ray.put(s_nat)

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"]) \
        .map_batches(lambda t: t.rename_columns(
            ["o_orderkey", "l_suppkey", "l_extendedprice",
             "l_discount"]),
            batch_format="pyarrow", zero_copy_batch=True)
    joined = li.join(orders, "inner", 16, on=("o_orderkey",))

    def partial(t: pa.Table) -> pa.Table:
        cn = ray.get(cref)[t["o_custkey"].to_numpy(
            zero_copy_only=False)]
        sn = ray.get(sref)[t["l_suppkey"].to_numpy(
            zero_copy_only=False)]
        keep = cn == sn
        price = t["l_extendedprice"].to_numpy(
            zero_copy_only=False)[keep]
        disc = t["l_discount"].to_numpy(zero_copy_only=False)[keep]
        cents = np.floor(price * 100 + 0.5).astype(np.int64)
        dpct = np.floor(disc * 100 + 0.5).astype(np.int64)
        rev = cents * (100 - dpct)          # exact 1e-4 money units
        df = pd.DataFrame({"nk": cn[keep], "rev_e4": rev}) \
            .groupby("nk", as_index=False)["rev_e4"].sum()
        return pa.Table.from_pandas(df, preserve_index=False)

    agg = joined.map_batches(partial, batch_format="pyarrow") \
        .groupby("nk").aggregate(Sum("rev_e4", alias_name="rev_e4")) \
        .to_pandas()
    nmap = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    rev_e4 = agg["rev_e4"].to_numpy(np.int64)
    return pa.table({
        "n_name": pa.array([nmap[int(k)] for k in agg["nk"]],
                           pa.string()),
        "rev_e4": pa.array(rev_e4),
        "revenue": pa.array(round6(rev_e4 / 10000.0)),
    })


SQL_REVENUE_BY_NATION = """
SELECT n.n_name,
       CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l.l_discount * 100 + 0.5)
                              AS BIGINT))) AS BIGINT) AS rev_e4,
       round(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                 * (100 - CAST(floor(l.l_discount * 100 + 0.5)
                               AS BIGINT))) / 10000.0, 6) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
                AND s.s_nationkey = c.c_nationkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name
"""


# --- graph contraction by vertex attribute (the host-graph workflow:
# contract the url->url web graph to host->host; here part->brand on
# the gate tables — same shape: small-side attribute broadcast, edge
# relabel inside map_batches, fixed-size per-batch partials) ---------

def _brand_codes(sf_dir):
    """(sorted unique brands, partkey -> brand-code lookup array).
    The part dim is the broadcast-small side even at crawl scale (the
    host/brand domain is bounded); one column-pruned read."""
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/part.parquet",
                      columns=["p_partkey", "p_brand"])
    pk = t["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    brands, codes = np.unique(
        np.asarray(t["p_brand"].to_pylist()), return_inverse=True)
    lut = np.zeros(int(pk.max()) + 1, dtype=np.int64)
    lut[pk] = codes
    return brands, lut


_BRAND_GRAPH_CACHE = {}


def q_brand_graph_co(sf_dir):
    """Contract the part co-occurrence graph to brand level (the
    host-graph contraction: url->host becomes part->brand). The
    brand lookup broadcasts once via ``ray.put``; each edge batch
    relabels vectorised and emits a fixed B*B integer partial, merged
    on the driver (bounded O(B^2) state, no shuffle) — the edge list
    never moves. Self-pairs (intra-brand edges) are kept — they are
    the intra-host link mass. Memoised per sf_dir (brand_pagerank
    reuses the contraction)."""
    if sf_dir in _BRAND_GRAPH_CACHE:
        return _BRAND_GRAPH_CACHE[sf_dir]
    import ray as _ray
    brands, lut = _brand_codes(sf_dir)
    B = len(brands)
    ref = _ray.put(lut)
    edges = tg.co_edge_rows(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        m = _ray.get(ref)
        a = m[t["src"].to_numpy(zero_copy_only=False)]
        b = m[t["dst"].to_numpy(zero_copy_only=False)]
        w = t["weight"].to_numpy(zero_copy_only=False)
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        key = lo * B + hi
        # weights are integer-valued doubles (co counts): bincount in
        # int64 so the partial sums are exact and order-free
        ws = np.bincount(key, weights=w, minlength=B * B) \
            .astype(np.int64)
        nz = np.flatnonzero(ws)
        return pa.table({"key": pa.array(nz.astype(np.int64)),
                         "w": pa.array(ws[nz])})

    # merge the fixed B*B partials on the driver (bounded state; a
    # Ray Data groupby here would pay the ~12 s fixed shuffle cost
    # for a 325-row merge — CLAUDE.md hot-path rule)
    acc = np.zeros(B * B, dtype=np.int64)
    for part_t in edges.map_batches(partial, batch_format="pyarrow",
                                    zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):
        np.add.at(acc, part_t["key"].to_numpy(zero_copy_only=False),
                  part_t["w"].to_numpy(zero_copy_only=False))
    nz = np.flatnonzero(acc)
    out = pa.table({
        "brand_a": pa.array(brands[nz // B]),
        "brand_b": pa.array(brands[nz % B]),
        "weight": pa.array(acc[nz].astype(np.float64)),
    })
    _BRAND_GRAPH_CACHE[sf_dir] = out
    return out


SQL_BRAND_GRAPH_CO = """
WITH e0 AS (SELECT l1.l_partkey AS a, l2.l_partkey AS b,
                   count(*) AS w
            FROM lineitem l1 JOIN lineitem l2
              ON l1.l_orderkey = l2.l_orderkey
             AND l1.l_partkey < l2.l_partkey
            GROUP BY 1, 2)
SELECT least(p1.p_brand, p2.p_brand) AS brand_a,
       greatest(p1.p_brand, p2.p_brand) AS brand_b,
       CAST(sum(e0.w) AS DOUBLE) AS weight
FROM e0 JOIN part p1 ON p1.p_partkey = e0.a
        JOIN part p2 ON p2.p_partkey = e0.b
GROUP BY 1, 2
"""


def q_brand_pagerank(sf_dir):
    """Weighted PageRank over the contracted brand graph — the
    host-level PageRank workflow (contract, then rank hosts). The
    contracted graph is community-space sized, but it flows through
    the same Dataset -> DistGraph -> superstep path as the full graph
    (kernels are graph-source-agnostic), including self-loop strength
    handling the full co graph never exercises."""
    from ..dist.blocks import DistGraph

    brands, _ = _brand_codes(sf_dir)
    B = len(brands)
    t = q_brand_graph_co(sf_dir)         # memoised contraction table

    a = np.searchsorted(brands, np.asarray(t["brand_a"].to_pylist()))
    b = np.searchsorted(brands, np.asarray(t["brand_b"].to_pylist()))
    w = t["weight"].to_numpy(zero_copy_only=False)
    nl = a != b                          # self-loops stay single
    sym = pa.table({
        "src": pa.array(np.concatenate([a, b[nl]])),
        "dst": pa.array(np.concatenate([b, a[nl]])),
        "weight": pa.array(np.concatenate([w, w[nl]])),
    })
    g = DistGraph.from_dataset(
        rd.from_arrow(sym), n=B, P=4, directed=False, dedup=True)
    rank, _ = ss.pagerank(g, damping=DAMPING, tol=0.0,
                          max_iter=PAGERANK_ITERS, weighted=True)
    return pa.table({"brand": pa.array(brands),
                     "rank": pa.array(round6(rank))})


SQL_BRAND_PAGERANK = f"""
WITH RECURSIVE
e0 AS (SELECT l1.l_partkey AS a, l2.l_partkey AS b, count(*) AS w
       FROM lineitem l1 JOIN lineitem l2
         ON l1.l_orderkey = l2.l_orderkey
        AND l1.l_partkey < l2.l_partkey
       GROUP BY 1, 2),
c0 AS (SELECT least(p1.p_brand, p2.p_brand) AS ba,
              greatest(p1.p_brand, p2.p_brand) AS bb,
              CAST(sum(e0.w) AS DOUBLE) AS w
       FROM e0 JOIN part p1 ON p1.p_partkey = e0.a
               JOIN part p2 ON p2.p_partkey = e0.b
       GROUP BY 1, 2),
e AS (SELECT ba AS a, bb AS b, w FROM c0
      UNION ALL
      SELECT bb, ba, w FROM c0 WHERE ba <> bb),
verts AS (SELECT a AS v, sum(w) AS strength FROM e GROUP BY a),
nn AS (SELECT count(*) AS n FROM verts),
pr(i, v, r) AS (
  SELECT 0, v, 1.0 / (SELECT n FROM nn) FROM verts
  UNION ALL
  SELECT p.i + 1, e.b,
         (1 - {DAMPING}) / (SELECT n FROM nn)
         + {DAMPING} * sum(p.r * e.w / vs.strength)
  FROM pr p
  JOIN verts vs ON vs.v = p.v
  JOIN e ON e.a = p.v
  WHERE p.i < {PAGERANK_ITERS}
  GROUP BY p.i, e.b
)
SELECT v AS brand, round(r, 6) AS rank
FROM pr WHERE i = {PAGERANK_ITERS}
"""


def _temporal_recrawl_pages(n=60, shift=5):
    """Deterministic two-epoch recrawl corpus: same urls, planted
    10-cliques shifted by ``shift`` between epochs, epoch 1 pushed
    1000 h later in ``warc_ts``. Shared by the rows-only end-to-end
    row (``pages_temporal``) and its closed-form driver-green twin
    (``pages_temporal_cliques``)."""
    from ..sources.pages import generate_pages_table

    def cliq(sh):
        s, d = [], []
        for base in range(0, n, 10):
            mem = [(base + k + sh) % n for k in range(10)]
            for i in range(10):
                for j in range(i + 1, 10):
                    s.append(mem[i])
                    d.append(mem[j])
        return np.asarray(s), np.asarray(d)

    sA, dA = cliq(0)
    sB, dB = cliq(shift)
    tabA = generate_pages_table(sA, dA, n, seed=1, dup_prob=0.0)
    tabB = generate_pages_table(sB, dB, n, seed=2, dup_prob=0.0)
    tsB = pa.array(tabB["warc_ts"].cast(pa.int64()).to_numpy()
                   + 3_600_000_000_000, pa.timestamp("us"))
    tabB = tabB.set_column(tabB.schema.get_field_index("warc_ts"),
                           "warc_ts", tsB)
    return rd.from_arrow(pa.concat_tables([tabA, tabB]))


def _temporal_communities(interslice_weight, n=60):
    """pages -> pages_temporal_graph -> temporal Leiden -> (slice,
    url, comm) with per-slice labels canonicalised by first url
    appearance (temporal vids are url-rank-ordered, so vid order IS
    url order)."""
    from ..functions_api import find_partition_temporal_dataset
    from ..stages.graph_build import pages_temporal_graph

    pages = _temporal_recrawl_pages(n)
    slices, mapping, nv, _ = pages_temporal_graph(
        pages, n_slices=2, B=4, num_partitions=8)
    mems, q, info = find_partition_temporal_dataset(
        slices, n_nodes=nv, quality="cpm", resolution_parameter=0.5,
        interslice_weight=interslice_weight, P=4, seed=3,
        n_iterations=-1)

    m = mapping.to_pandas().sort_values("vid")
    urls = m["url"].to_numpy()
    # bucket-rank vids are NOT globally url-ordered — canonicalise by
    # actual url order so the labels are id-assignment-independent
    url_order = np.argsort(urls)
    out_slice, out_url, out_comm = [], [], []
    for t in range(2):
        # canonicalise labels by first appearance in url order
        seen = {}
        for v in url_order:
            lab = int(mems[t][v])
            c = seen.setdefault(lab, len(seen))
            out_slice.append(t)
            out_url.append(urls[v])
            out_comm.append(c)
    return pa.table({
        "slice": pa.array(np.asarray(out_slice, np.int64)),
        "url": pa.array(out_url, pa.string()),
        "comm": pa.array(np.asarray(out_comm, np.int64)),
    })


def q_pages_temporal(sf_dir):
    """End-to-end crawl-snapshot communities: the two-epoch recrawl
    corpus -> ``pages_temporal_graph`` (slice spill, shared id space,
    per-slice extraction) -> ``find_partition_temporal_dataset`` with
    a small positive interslice coupling. Rows-only: the coupled
    Leiden fixed point is non-SQL; the slicing/extraction plumbing is
    oracle-checked in ``tests/test_extract.py::
    test_pages_temporal_graph_slices_recrawl`` and the SAME path is
    driver-green via the closed-form ``pages_temporal_cliques`` twin
    (interslice_weight=0)."""
    return _temporal_communities(interslice_weight=0.01)


def q_anchor_terms_cliques(sf_dir):
    """Inbound anchor-text term counts per target page — the classic
    web-link relevance signal — through the REAL extraction actor
    pool (``ExtractAnchors``) over a planted corpus: six disjoint
    10-cliques, every member linking to its 9 peers with anchor
    'to {v}', so each target receives exactly 9 'to' tokens and 9 of
    its own vid token (closed form). Off-corpus hrefs (the
    generator's occasional dangling absent.example link) are dropped
    by the corpus-url prefix filter, matching the oracle's
    generate_series universe. Per-batch explode partials; the final
    combine runs on the bounded (targets x terms) partial table."""
    from ..sources.pages import generate_pages_table
    from ..stages.extract import anchors_dataset

    n = 60
    ii, jj = np.meshgrid(np.arange(10), np.arange(10))
    keep = ii.ravel() != jj.ravel()
    bi, bj = ii.ravel()[keep], jj.ravel()[keep]
    src = np.concatenate([bi + 10 * c for c in range(6)])
    dst = np.concatenate([bj + 10 * c for c in range(6)])
    pages = rd.from_arrow(generate_pages_table(src, dst, n, seed=1,
                                               dup_prob=0.0))
    anchors = anchors_dataset(pages, concurrency=4, batch_size=16)

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["dst_url", "anchor"]).to_pandas()
        df = df[df.dst_url.str.startswith("https://s")]
        df = df.assign(term=df.anchor.str.split()).explode("term")
        out = df.groupby(["dst_url", "term"], as_index=False).size()
        return out.rename(columns={"size": "cnt"})

    agg = anchors.map_batches(partial, batch_format="pyarrow") \
        .to_pandas().groupby(["dst_url", "term"],
                             as_index=False)["cnt"].sum()
    return pa.table({
        "dst_url": pa.array(agg["dst_url"], pa.string()),
        "term": pa.array(agg["term"], pa.string()),
        "cnt": pa.array(agg["cnt"].to_numpy(np.int64)),
    })


SQL_ANCHOR_TERMS_CLIQUES = """
WITH v AS (SELECT unnest(generate_series(0, 59)) AS v),
u AS (SELECT v, 'https://s' || lpad(CAST(v % 16 AS VARCHAR), 2, '0')
            || '.example/p' || lpad(CAST(v AS VARCHAR), 9, '0')
            || '.html' AS url
      FROM v)
SELECT url AS dst_url, 'to' AS term, CAST(9 AS BIGINT) AS cnt FROM u
UNION ALL
SELECT url, CAST(v AS VARCHAR), CAST(9 AS BIGINT) FROM u
"""


def q_redirect_resolve_planted(sf_dir):
    """Redirect-chain resolution (``dist/redirects.py`` pointer
    doubling): planted mapping of ten 9-hop chains (v -> v+1 within
    each block of 10, terminal at v%10==9), one 3-cycle and one
    self-loop. Resolved rows are closed form — final = the block
    terminal, hops = distance — and the cycle/self-loop entries are
    correctly omitted (the oracle universe excludes them)."""
    from ..dist.redirects import resolve_redirects

    src, dst = [], []
    for v in range(100):
        if v % 10 != 9:
            src.append(v)
            dst.append(v + 1)
    src += [200, 201, 202, 300]
    dst += [201, 202, 200, 300]
    vid, fin, hops = resolve_redirects(np.asarray(src, np.int64),
                                       np.asarray(dst, np.int64),
                                       P=8, rounds=10)
    return pa.table({"vid": pa.array(vid), "final": pa.array(fin),
                     "hops": pa.array(hops)})


SQL_REDIRECT_RESOLVE_PLANTED = """
WITH v AS (SELECT unnest(generate_series(0, 99)) AS v)
SELECT v AS vid,
       CAST(10 * (v // 10) + 9 AS BIGINT) AS final,
       CAST(9 - v % 10 AS BIGINT) AS hops
FROM v WHERE v % 10 <> 9
"""


def q_url_canonical_planted(sf_dir):
    """URL canonicalization (`stages/urls.py` — fragment strip, host
    lowercase, default-port drop, tracking-param removal) over a
    planted corpus of 100 deliberately-messy urls; the oracle states
    the known canonical form closed-form, so the whole RE2 rule chain
    is value-checked, not mirrored."""
    from ..stages.urls import canonicalize_urls

    msgs = []
    for v in range(100):
        u = f"HTTPS://Site{v % 7}.Example:443/p/{v}?id={v}"
        if v % 2 == 0:
            u += "&utm_source=feed"
        if v % 3 == 0:
            u += f"&gclid=g{v}"
        if v % 5 == 0:
            u += "#frag"
        msgs.append(u)
    ds = rd.from_arrow(pa.table({"url": pa.array(msgs, pa.string())}))
    df = canonicalize_urls(ds).to_pandas()
    return pa.table({"url": pa.array(df["url"], pa.string()),
                     "canon_url": pa.array(df["canon_url"],
                                           pa.string())})


SQL_URL_CANONICAL_PLANTED = """
WITH v AS (SELECT unnest(generate_series(0, 99)) AS v)
SELECT 'HTTPS://Site' || CAST(v % 7 AS VARCHAR) || '.Example:443/p/'
       || CAST(v AS VARCHAR) || '?id=' || CAST(v AS VARCHAR)
       || CASE WHEN v % 2 = 0 THEN '&utm_source=feed' ELSE '' END
       || CASE WHEN v % 3 = 0
               THEN '&gclid=g' || CAST(v AS VARCHAR) ELSE '' END
       || CASE WHEN v % 5 = 0 THEN '#frag' ELSE '' END AS url,
       'https://site' || CAST(v % 7 AS VARCHAR) || '.example/p/'
       || CAST(v AS VARCHAR) || '?id=' || CAST(v AS VARCHAR)
       AS canon_url
FROM v
"""


def q_pages_temporal_cliques(sf_dir):
    """Driver-green twin of ``pages_temporal`` (reference
    ``functions.py:337-364`` slice->layer coupling): the identical
    corpus and temporal slicing path with ``interslice_weight=0``, so
    each snapshot's fixed point is CLOSED FORM — its epoch's planted
    10-cliques (CPM gamma=0.5 on disjoint cliques, decoupled layers).
    Slice 0 cliques are v // 10; slice 1 (shifted by 5) cliques are
    ((v + 55) % 60) // 10; labels are canonicalised by first url
    appearance, i.e. dense rank of each clique's min url. Urls are
    SQL-reconstructible (``url_of``: zero-padded vid), so the oracle
    needs only generate_series — the one formerly rows-only row with
    no planted twin now has one."""
    return _temporal_communities(interslice_weight=0.0)


SQL_PAGES_TEMPORAL_CLIQUES = """
WITH v AS (SELECT unnest(generate_series(0, 59)) AS v),
u AS (SELECT v, 'https://s' || lpad(CAST(v % 16 AS VARCHAR), 2, '0')
            || '.example/p' || lpad(CAST(v AS VARCHAR), 9, '0')
            || '.html' AS url,
            v // 10 AS cl0,
            ((v + 55) % 60) // 10 AS cl1
      FROM v),
r0 AS (SELECT cl0, CAST(dense_rank() OVER (ORDER BY min(url))
                        AS BIGINT) - 1 AS comm
       FROM u GROUP BY cl0),
r1 AS (SELECT cl1, CAST(dense_rank() OVER (ORDER BY min(url))
                        AS BIGINT) - 1 AS comm
       FROM u GROUP BY cl1)
SELECT CAST(0 AS BIGINT) AS slice, u.url AS url, r0.comm AS comm
FROM u JOIN r0 ON u.cl0 = r0.cl0
UNION ALL
SELECT CAST(1 AS BIGINT), u.url, r1.comm
FROM u JOIN r1 ON u.cl1 = r1.cl1
"""


# --- partition comparison metrics (igraph compare_communities
# counterpart; reference workflow compares leidenalg partitions via
# igraph) — distributed contingency build, single formula source in
# leidenalg_ray/compare.py ------------------------------------------

_CMP_KA, _CMP_KB = 7, 10


def q_partition_compare(sf_dir):
    """NMI / ARI / VI / Rand / split-join between the deterministic
    partitions ``vid % 7`` and ``vid % 10`` of the part vertex set.
    Each batch reduces to a fixed (7*10)-cell integer contingency
    partial, one tiny shuffle, and the driver finishes on the (7, 10)
    matrix via ``compare.metrics_from_contingency`` (ln terms
    quantised to 1e-9 fixed point so the SQL oracle sums identical
    integers)."""
    from ..compare import metrics_from_contingency

    ka, kb = _CMP_KA, _CMP_KB
    parts = rd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_partkey"])

    def partial(t: pa.Table) -> pa.Table:
        pk = t["p_partkey"].to_numpy(zero_copy_only=False)
        key = (pk % ka) * kb + (pk % kb)
        n = np.bincount(key, minlength=ka * kb)
        return pa.table({
            "cell": pa.array(np.arange(ka * kb, dtype=np.int64)),
            "n": pa.array(n.astype(np.int64)),
        })

    # driver-merge of the fixed 70-cell partials (no groupby shuffle
    # for a 70-int merge — CLAUDE.md hot-path rule)
    C = np.zeros(ka * kb, dtype=np.int64)
    for part_t in parts.map_batches(partial, batch_format="pyarrow",
                                    zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):
        np.add.at(C, part_t["cell"].to_numpy(zero_copy_only=False),
                  part_t["n"].to_numpy(zero_copy_only=False))
    C = C.reshape(ka, kb)
    return pa.table({
        "nmi": pa.array(round6([metrics_from_contingency(C, "nmi")])),
        "ari": pa.array(round6([metrics_from_contingency(C, "ari")])),
        "vi": pa.array(round6([metrics_from_contingency(C, "vi")])),
        "rand": pa.array(round6([metrics_from_contingency(C, "rand")])),
        "split_join": pa.array(
            [int(metrics_from_contingency(C, "split-join"))],
            pa.int64()),
    })


SQL_PARTITION_COMPARE = f"""
WITH cells AS (SELECT p_partkey % {_CMP_KA} AS i,
                      p_partkey % {_CMP_KB} AS j,
                      count(*) AS n
               FROM part GROUP BY 1, 2),
nn AS (SELECT sum(n) AS N FROM cells),
am AS (SELECT i, sum(n) AS a FROM cells GROUP BY i),
bm AS (SELECT j, sum(n) AS b FROM cells GROUP BY j),
-- per-cell ln terms quantised to 1e-9 fixed point BEFORE summation
-- (identical parenthesisation to compare.metrics_from_contingency)
ifp AS (SELECT sum(c.n * CAST(floor(ln(
              (CAST(c.n AS DOUBLE) * nn.N)
              / (CAST(am.a AS DOUBLE) * CAST(bm.b AS DOUBLE)))
              * 1000000000 + 0.5) AS BIGINT)) AS v
        FROM cells c, nn
        JOIN am ON am.i = c.i JOIN bm ON bm.j = c.j),
hafp AS (SELECT sum(a * CAST(floor(ln(nn.N / CAST(a AS DOUBLE))
               * 1000000000 + 0.5) AS BIGINT)) AS v FROM am, nn),
hbfp AS (SELECT sum(b * CAST(floor(ln(nn.N / CAST(b AS DOUBLE))
               * 1000000000 + 0.5) AS BIGINT)) AS v FROM bm, nn),
pairs AS (SELECT
    (SELECT sum(n * (n - 1) // 2) FROM cells) AS sij,
    (SELECT sum(a * (a - 1) // 2) FROM am) AS sa,
    (SELECT sum(b * (b - 1) // 2) FROM bm) AS sb,
    (SELECT N * (N - 1) // 2 FROM nn) AS np),
sj AS (SELECT
    (SELECT sum(mx) FROM (SELECT max(n) AS mx FROM cells GROUP BY i))
    + (SELECT sum(mx) FROM (SELECT max(n) AS mx FROM cells GROUP BY j))
    AS covered),
fin AS (SELECT
    (CAST(ifp.v AS DOUBLE) / 1000000000) / nn.N AS i_,
    (CAST(hafp.v AS DOUBLE) / 1000000000) / nn.N AS ha,
    (CAST(hbfp.v AS DOUBLE) / 1000000000) / nn.N AS hb,
    CAST(p.sij AS DOUBLE) AS sij, CAST(p.sa AS DOUBLE) AS sa,
    CAST(p.sb AS DOUBLE) AS sb, CAST(p.np AS DOUBLE) AS np,
    nn.N AS n, sj.covered AS covered
    FROM ifp, hafp, hbfp, pairs p, nn, sj)
SELECT round(2.0 * i_ / (ha + hb), 6) AS nmi,
       round((sij - (sa * sb) / np)
             / ((sa + sb) / 2.0 - (sa * sb) / np), 6) AS ari,
       round(ha + hb - 2.0 * i_, 6) AS vi,
       round((np + 2 * sij - sa - sb) / np, 6) AS rand,
       CAST(2 * n - covered AS BIGINT) AS split_join
FROM fin
"""


# ----------------------------------------------------------------------
# cocitation / bibliographic coupling (igraph cocitation()/bibcoupling()
# parity, top pairs) over the directed item-sequence graph
# ----------------------------------------------------------------------
COCITE_DEG_CAP = 64
COCITE_TOPK = 100

# the shared directed-edge CTE every item-seq oracle uses (same total
# order as _item_seq_edges: l_linenumber ties broken on l_partkey)
_SQL_SEQ_E = """seq AS (SELECT l_partkey AS a,
               lead(l_partkey) OVER (PARTITION BY l_orderkey
                                     ORDER BY l_linenumber, l_partkey) AS b
        FROM lineitem),
e AS (SELECT DISTINCT a, b FROM seq WHERE b IS NOT NULL)"""


def _neighbor_pair_counts(g: DistGraph, cap: int, drop_counter=None):
    """Unordered-pair multiplicities over each source's DISTINCT
    out-neighbour set: count(u, v) = |{w : w->u and w->v}| for u < v.

    A source's out-edges live in exactly ONE CSR block (blocks are
    src-partitioned), so each block emits complete pair-count partials
    for its resident sources with NO shuffle; the driver merges P
    partials (bounded at gate scale — the at-scale form feeds the same
    partials into a pair-key groupby instead of a driver merge).
    Sources with out-degree > ``cap`` are skipped — the skew guard a
    hub page needs (C(k,2) blowup) — and COUNTED via ``drop_counter``
    (the "no silent caps" rule); the SQL oracle applies the identical
    degree filter.

    Returns (u, v, count) int64 arrays plus the dropped-source count.
    """
    import ray
    P, n = g.P, g.n

    @ray.remote
    def pairs(block, p):
        s = block["src_local"] * np.int64(P) + p
        d = block["dst_local"] * np.int64(P) + block["dst_part"]
        key = np.unique(s * np.int64(n) + d)   # DISTINCT (SQL parity)
        s, d = key // n, key % n
        if not len(s):
            z = np.empty(0, np.int64)
            return z, z, 0
        cuts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        ends = np.r_[cuts[1:], len(s)]
        out, dropped = [], 0
        for c0, c1 in zip(cuts, ends):
            k = int(c1 - c0)
            if k < 2:
                continue
            if k > cap:
                dropped += 1
                continue
            nb = d[c0:c1]                      # already sorted (key order)
            iu, ju = np.triu_indices(k, 1)
            out.append(nb[iu] * np.int64(n) + nb[ju])
        if out:
            uk, uc = np.unique(np.concatenate(out), return_counts=True)
        else:
            uk = uc = np.empty(0, np.int64)
        return uk, uc.astype(np.int64), dropped

    res = ray.get([pairs.remote(g.blocks[p], p) for p in range(P)])
    n_dropped = sum(r[2] for r in res)
    if n_dropped and drop_counter is not None:
        drop_counter.add.remote(n_dropped)
    keys = np.concatenate([r[0] for r in res]) if res else np.empty(0, np.int64)
    cnts = np.concatenate([r[1] for r in res]) if res else np.empty(0, np.int64)
    uk, inv = np.unique(keys, return_inverse=True)
    tot = np.zeros(len(uk), dtype=np.int64)
    np.add.at(tot, inv, cnts)
    return uk // n, uk % n, tot, n_dropped


def _top_pairs_table(u, v, c, topk):
    """(count DESC, u ASC, v ASC) top-k — the same total order the
    oracle's ORDER BY ... LIMIT uses, so ties at the cut are stable."""
    order = np.lexsort((v, u, -c))[:topk]
    return pa.table({"u": pa.array(u[order]), "v": pa.array(v[order]),
                     "n_common": pa.array(c[order])})


def q_cocitation_items(sf_dir):
    """Cocitation counts (igraph ``Graph.cocitation`` parity, top
    pairs): cocitation(u, v) = number of pages citing BOTH u and v =
    common in-neighbours, emitted per citing source over its distinct
    out-neighbour set from the cached forward item-sequence DistGraph
    (reference workflows call igraph cocitation on the same graphs
    leidenalg partitions). Sources above COCITE_DEG_CAP out-degree are
    skipped with a drop count — the hub-page skew guard — and the SQL
    oracle applies the same filter."""
    g = _item_seq_distgraph(sf_dir)
    u, v, c, _ = _neighbor_pair_counts(g, COCITE_DEG_CAP)
    return _top_pairs_table(u, v, c, COCITE_TOPK)


SQL_COCITATION_ITEMS = f"""
WITH {_SQL_SEQ_E},
dg AS (SELECT a, count(*) AS k FROM e GROUP BY 1),
el AS (SELECT e.a, e.b FROM e JOIN dg ON dg.a = e.a
       WHERE dg.k BETWEEN 2 AND {COCITE_DEG_CAP}),
p AS (SELECT x.b AS u, y.b AS v FROM el x JOIN el y
      ON x.a = y.a AND x.b < y.b),
c AS (SELECT u, v, count(*) AS n_common FROM p GROUP BY 1, 2)
SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v,
       CAST(n_common AS BIGINT) AS n_common
FROM c ORDER BY n_common DESC, u, v LIMIT {COCITE_TOPK}
"""


def q_bibcoupling_items(sf_dir):
    """Bibliographic coupling (igraph ``Graph.bibcoupling`` parity,
    top pairs): coupling(u, v) = number of pages BOTH u and v cite =
    common out-neighbours — the same pair kernel run on the cached
    REVERSED item-sequence graph (out-neighbours of the reversal are
    in-neighbours, so pairs per reversed source = pairs of citers per
    cited page). Cap + oracle filter as in cocitation, applied to the
    cited page's in-degree."""
    g = _item_seq_rev_distgraph(sf_dir)
    u, v, c, _ = _neighbor_pair_counts(g, COCITE_DEG_CAP)
    return _top_pairs_table(u, v, c, COCITE_TOPK)


SQL_BIBCOUPLING_ITEMS = f"""
WITH {_SQL_SEQ_E},
dg AS (SELECT b, count(*) AS k FROM e GROUP BY 1),
el AS (SELECT e.a, e.b FROM e JOIN dg ON dg.b = e.b
       WHERE dg.k BETWEEN 2 AND {COCITE_DEG_CAP}),
p AS (SELECT x.a AS u, y.a AS v FROM el x JOIN el y
      ON x.b = y.b AND x.a < y.a),
c AS (SELECT u, v, count(*) AS n_common FROM p GROUP BY 1, 2)
SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v,
       CAST(n_common AS BIGINT) AS n_common
FROM c ORDER BY n_common DESC, u, v LIMIT {COCITE_TOPK}
"""


# ----------------------------------------------------------------------
# bipartite butterfly (4-cycle) census over the part->supplier graph
# ----------------------------------------------------------------------
BUTTERFLY_DEG_CAP = 64


def q_butterflies_ps(sf_dir):
    """Bipartite butterfly census (Sanei-Mehri et al., KDD 2018 — the
    bipartite analogue of triangle counting; igraph users get it via
    ``motifs``): butterflies = #4-cycles = sum over supplier pairs of
    C(common_parts, 2), caterpillars = #length-3 paths = sum over
    distinct edges of (deg_part-1)*(deg_supp-1), and the
    Robins–Alexander bipartite clustering coefficient 4*B/C.

    Butterfly pairs ride the same block-resident per-source pair
    kernel as cocitation (a part's supplier set lives in ONE CSR
    block, so pair-count partials need no shuffle; sources above
    BUTTERFLY_DEG_CAP are skipped, identically filtered in the
    oracle). Caterpillars reduce shard-side: one scalar per block from
    the resident out-degrees plus the cached in-degree shards."""
    import ray
    g = _ps_distgraph(sf_dir, symmetric=False)
    _, _, c, _ = _neighbor_pair_counts(g, BUTTERFLY_DEG_CAP)
    n_butterflies = int((c * (c - 1) // 2).sum())
    ind = g.in_degree_shards()

    @ray.remote
    def cat_partial(block, outd, *ind_shards):
        ds = outd[block["src_local"]]          # edges sorted by dst_part
        off = block["dst_offsets"]
        tot = 0
        for q, shard in enumerate(ind_shards):
            sl = slice(int(off[q]), int(off[q + 1]))
            dd = shard[block["dst_local"][sl]]
            tot += int(((ds[sl] - 1) * (dd - 1)).sum())
        return tot

    n_cat = int(sum(ray.get(
        [cat_partial.remote(g.blocks[p], g.out_deg[p], *ind)
         for p in range(g.P)])))
    bcc = 4.0 * n_butterflies / n_cat if n_cat else 0.0
    return pa.table({
        "n_butterflies": pa.array([n_butterflies], pa.int64()),
        "n_caterpillars": pa.array([n_cat], pa.int64()),
        "bipartite_cc": pa.array(round6([bcc])),
    })


SQL_BUTTERFLIES_PS = f"""
WITH e AS (SELECT DISTINCT l_partkey AS a, l_suppkey AS b FROM lineitem),
dga AS (SELECT a, count(*) AS k FROM e GROUP BY 1),
dgb AS (SELECT b, count(*) AS k FROM e GROUP BY 1),
el AS (SELECT e.a, e.b FROM e JOIN dga ON dga.a = e.a
       WHERE dga.k BETWEEN 2 AND {BUTTERFLY_DEG_CAP}),
p AS (SELECT x.b AS u, y.b AS v, count(*) AS m FROM el x JOIN el y
      ON x.a = y.a AND x.b < y.b GROUP BY 1, 2),
bf AS (SELECT COALESCE(sum(m * (m - 1) // 2), 0) AS nb FROM p),
cat AS (SELECT COALESCE(sum((dga.k - 1) * (dgb.k - 1)), 0) AS nc
        FROM e JOIN dga ON dga.a = e.a JOIN dgb ON dgb.b = e.b)
SELECT CAST(bf.nb AS BIGINT) AS n_butterflies,
       CAST(cat.nc AS BIGINT) AS n_caterpillars,
       round(CASE WHEN cat.nc = 0 THEN 0.0
                  ELSE 4.0 * bf.nb / cat.nc END, 6) AS bipartite_cc
FROM bf, cat
"""


# ----------------------------------------------------------------------
# per-source boilerplate detection (template n-grams shared across a
# source's documents — the web-pipeline "same-site template" signal)
# ----------------------------------------------------------------------
BOILER_GRAM = 3


def _trigram_explode(t: pa.Table) -> pa.Table:
    """(doc_id, source, text) -> one row per DISTINCT sliding
    BOILER_GRAM-token window per doc: (source, h). Same tokenizer as
    the segment-dedup family."""
    import hashlib
    toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]),
                                  "[^a-z0-9]+")
    flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
    par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    keep = flat != ""
    f, p = flat[keep], par[keep]
    srcs = t["source"].to_pylist()
    out_s, out_h = [], []
    for row in (np.unique(p) if len(p) else []):
        w = f[p == row]
        # the SQL oracle enumerates windows with generate_series(0,
        # 998): fail loudly past its bound (corpus docs are ~40 tokens)
        assert len(w) <= 998 + BOILER_GRAM, \
            f"doc with {len(w)} tokens exceeds the SQL oracle's " \
            f"generate_series window bound"
        seen = set()
        for k in range(len(w) - BOILER_GRAM + 1):
            hh = hashlib.md5(
                " ".join(w[k:k + BOILER_GRAM]).encode()).hexdigest()
            if hh not in seen:
                seen.add(hh)
                out_s.append(srcs[int(row)])
                out_h.append(hh)
    return pa.table({"source": pa.array(out_s, pa.string()),
                     "h": pa.array(out_h, pa.string())})


def q_doc_boilerplate(sf_dir):
    """Per-source template (boilerplate) n-gram detection — the
    same-site-template signal a web curation pipeline uses to strip
    repeated navigation/footer text before training: a sliding 3-token
    gram that appears in >= 2 distinct documents of the same source is
    a template candidate. Plan: per-batch per-doc-distinct gram
    explode (a doc is complete within its row, so per-doc dedup never
    shuffles), ONE (source, h) groupby for doc counts, per-source
    aggregate. Output: source, n_grams (distinct grams), n_shared
    (grams in >= 2 docs), shared_ratio."""
    docs = _docs(sf_dir, columns=("doc_id", "text", "source"))
    grams = docs.map_batches(_trigram_explode, batch_format="pyarrow",
                             zero_copy_batch=True)
    cnt = grams.groupby(["source", "h"]).aggregate(
        Count(alias_name="nd"))

    def per_source(t: pa.Table) -> pa.Table:
        nd = t["nd"].to_numpy(zero_copy_only=False)
        return pa.table({
            "source": t["source"],
            "one": pa.array(np.ones(len(nd), dtype=np.int64)),
            "shared": pa.array((nd >= 2).astype(np.int64)),
        })

    agg = cnt.map_batches(per_source, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("source").aggregate(
            Sum("one", alias_name="n_grams"),
            Sum("shared", alias_name="n_shared")).to_pandas()
    n_grams = agg["n_grams"].to_numpy(np.int64)
    n_shared = agg["n_shared"].to_numpy(np.int64)
    return pa.table({
        "source": pa.array(agg["source"].astype(str), pa.string()),
        "n_grams": pa.array(n_grams),
        "n_shared": pa.array(n_shared),
        "shared_ratio": pa.array(round6(n_shared / n_grams)),
    })


SQL_DOC_BOILERPLATE = f"""
WITH t AS (SELECT doc_id, source, list_filter(
             regexp_split_to_array(lower(text), '[^a-z0-9]+'),
             x -> x <> '') AS arr
           FROM documents),
g AS (SELECT DISTINCT source, doc_id,
             md5(array_to_string(
                 arr[(k + 1):(k + {BOILER_GRAM})], ' ')) AS h
      FROM t, generate_series(0, 998) gs(k)
      WHERE k <= len(arr) - {BOILER_GRAM}),
c AS (SELECT source, h, count(*) AS nd FROM g GROUP BY 1, 2)
SELECT source, CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_shared,
       round(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END)
             / count(*), 6) AS shared_ratio
FROM c GROUP BY source
"""


# ----------------------------------------------------------------------
# unigram-LM cross-entropy quality score (perplexity proxy)
# ----------------------------------------------------------------------
def q_doc_novelty(sf_dir):
    """Per-document n-gram novelty (arrival order = doc_id): the
    fraction of a doc's DISTINCT sliding trigrams whose corpus-wide
    FIRST occurrence (min doc_id) is this doc — the freshness /
    curriculum-ordering signal (a recrawl or boilerplate-heavy doc
    scores near 0, genuinely new text near 1). Plan: per-doc-distinct
    trigram explode, ONE gram groupby for min doc_id, one hash-join
    back, per-doc count aggregates — no driver-side gram state."""
    from ray.data.aggregate import Min as _Min
    docs = _docs(sf_dir)

    def explode(t: pa.Table) -> pa.Table:
        import hashlib
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]),
                                      "[^a-z0-9]+")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keep = flat != ""
        f, p = flat[keep], par[keep]
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        out_id, out_h = [], []
        for row in (np.unique(p) if len(p) else []):
            w = f[p == row]
            assert len(w) <= 998 + BOILER_GRAM, \
                "doc exceeds the SQL oracle's generate_series bound"
            seen = set()
            for k in range(len(w) - BOILER_GRAM + 1):
                hh = hashlib.md5(
                    " ".join(w[k:k + BOILER_GRAM]).encode()).hexdigest()
                if hh not in seen:
                    seen.add(hh)
                    out_id.append(int(ids[int(row)]))
                    out_h.append(hh)
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "h": pa.array(out_h, pa.string())})

    grams = docs.map_batches(explode, batch_format="pyarrow",
                             zero_copy_batch=True)
    firsts = grams.groupby("h").aggregate(
        _Min("doc_id", alias_name="first_doc"))
    joined = grams.join(firsts, "inner", 8, on=("h",))

    def flag(t: pa.Table) -> pa.Table:
        nov = pc.equal(t["doc_id"], t["first_doc"])
        return pa.table({
            "doc_id": t["doc_id"],
            "one": pa.array(np.ones(t.num_rows, np.int64)),
            "novel": pc.cast(nov, pa.int64()),
        })

    agg = joined.map_batches(flag, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby("doc_id").aggregate(
            Sum("one", alias_name="n_grams"),
            Sum("novel", alias_name="n_novel")).to_pandas()
    n_grams = agg["n_grams"].to_numpy(np.int64)
    n_novel = agg["n_novel"].to_numpy(np.int64)
    return pa.table({
        "doc_id": pa.array(agg["doc_id"].to_numpy(np.int64)),
        "n_grams": pa.array(n_grams),
        "n_novel": pa.array(n_novel),
        "novelty": pa.array(round6(n_novel / n_grams)),
    })


SQL_DOC_NOVELTY = f"""
WITH t AS (SELECT doc_id, list_filter(
             regexp_split_to_array(lower(text), '[^a-z0-9]+'),
             x -> x <> '') AS arr
           FROM documents),
g AS (SELECT DISTINCT doc_id,
             md5(array_to_string(
                 arr[(k + 1):(k + {BOILER_GRAM})], ' ')) AS h
      FROM t, generate_series(0, 998) gs(k)
      WHERE k <= len(arr) - {BOILER_GRAM}),
f AS (SELECT h, min(doc_id) AS first_doc FROM g GROUP BY 1)
SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       round(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
             / count(*), 6) AS novelty
FROM g JOIN f USING (h) GROUP BY g.doc_id
"""



def q_doc_strip_boilerplate(sf_dir):
    """Boilerplate-segment REMOVAL with a verifiable rewrite (the
    curation op that actually edits the corpus, not just flags it):
    a non-overlapping SEG_LEN-token segment is template iff it occurs
    in >= 2 distinct documents of the SAME source; the cleaned doc is
    the k-ordered join of its kept segments (partial tail segments
    are dropped by the segmenter on both engines). Output per doc:
    n_segs, n_kept, md5 of the cleaned token stream — the rewrite is
    pinned byte-for-byte, no floats anywhere. Plan: segment explode
    (doc complete within its row), per-doc-distinct (source, seg)
    groupby for doc counts, one hash-join back, per-doc ordered
    reconstruct in a bounded map_groups."""
    import hashlib
    docs = _docs(sf_dir, columns=("doc_id", "text", "source"))

    def explode(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]),
                                      "[^a-z0-9]+")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keep = flat != ""
        f, p = flat[keep], par[keep]
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        srcs = t["source"].to_pylist()
        out_id, out_src, out_k, out_seg = [], [], [], []
        for row in (np.unique(p) if len(p) else []):
            w = f[p == row]
            assert len(w) // SEG_LEN <= 998, \
                "doc exceeds the SQL oracle's generate_series bound"
            for k in range(len(w) // SEG_LEN):
                out_id.append(int(ids[int(row)]))
                out_src.append(srcs[int(row)])
                out_k.append(k)
                out_seg.append(
                    " ".join(w[k * SEG_LEN:(k + 1) * SEG_LEN]))
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "source": pa.array(out_src, pa.string()),
                         "k": pa.array(out_k, pa.int64()),
                         "seg": pa.array(out_seg, pa.string())})

    segs = docs.map_batches(explode, batch_format="pyarrow",
                            zero_copy_batch=True)

    def dedup_doc(t: pa.Table) -> pa.Table:
        # per-doc-distinct rows for the doc-count groupby (a doc is
        # complete within its batch row)
        tt = pa.table({"doc_id": t["doc_id"], "source": t["source"],
                       "seg": t["seg"]})
        return tt.group_by(["doc_id", "source", "seg"]).aggregate([])

    nd = segs.map_batches(dedup_doc, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby(["source", "seg"]).aggregate(Count(alias_name="nd"))

    # groupby aggregates emit ZERO-COLUMN empty blocks for dataless
    # shuffle partitions; the hash join then crashes layout-dependently
    # (CLAUDE.md gotcha) — rebuild the declared schema at the producer
    def norm_nd(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.table({"source": pa.array([], pa.string()),
                             "seg": pa.array([], pa.string()),
                             "nd": pa.array([], pa.int64())})
        return t

    nd = nd.map_batches(norm_nd, batch_format="pyarrow")
    # map_batches passes schema-less empties through WITHOUT calling
    # fn — repartition coalesces blocks so they vanish before the join
    nd = nd.repartition(8)
    joined = segs.join(nd, "inner", 8, on=("source", "seg"))
    # the join itself emits schema-less empties too; repartition
    # coalesces them away before the map_groups shuffle
    joined = joined.repartition(8)

    def reconstruct(t: pa.Table) -> pa.Table:
        order = np.argsort(t["k"].to_numpy(zero_copy_only=False))
        segs_ = np.asarray(t["seg"].to_pylist(), dtype=object)[order]
        keep_ = (t["nd"].to_numpy(zero_copy_only=False) < 2)[order]
        cleaned = " ".join(segs_[keep_])
        return pa.table({
            "doc_id": pa.array([int(t["doc_id"][0].as_py())],
                               pa.int64()),
            "n_segs": pa.array([t.num_rows], pa.int64()),
            "n_kept": pa.array([int(keep_.sum())], pa.int64()),
            "cleaned_md5": pa.array(
                [hashlib.md5(cleaned.encode()).hexdigest()],
                pa.string()),
        })

    return joined.groupby("doc_id").map_groups(
        reconstruct, batch_format="pyarrow")


SQL_DOC_STRIP_BOILERPLATE = f"""
WITH t AS (SELECT doc_id, source, list_filter(
             regexp_split_to_array(lower(text), '[^a-z0-9]+'),
             x -> x <> '') AS arr
           FROM documents),
s AS (SELECT doc_id, source, k,
             array_to_string(
                 arr[(k * {SEG_LEN} + 1):(k * {SEG_LEN} + {SEG_LEN})],
                 ' ') AS seg
      FROM t, generate_series(0, 998) gs(k)
      WHERE k < len(arr) // {SEG_LEN}),
c AS (SELECT source, seg, count(DISTINCT doc_id) AS nd
      FROM s GROUP BY 1, 2)
SELECT s.doc_id,
       CAST(count(*) AS BIGINT) AS n_segs,
       CAST(sum(CASE WHEN c.nd < 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       md5(COALESCE(string_agg(CASE WHEN c.nd < 2 THEN s.seg END,
                               ' ' ORDER BY s.k), '')) AS cleaned_md5
FROM s JOIN c USING (source, seg)
GROUP BY s.doc_id
"""


def q_doc_lm_xent(sf_dir):
    """Unigram-LM cross-entropy per document against the CORPUS
    unigram distribution — the perplexity-proxy quality score LLM
    curation pipelines threshold on (a doc of rare tokens scores
    high, a doc of corpus-typical text scores low). p(w) = corpus
    count / total; xent(d) = -(1/|d|) * sum_{tokens} ln p(w).

    Determinism: per-distinct-word ln p(w) is quantised to 1e-9 fixed
    point (floor(ln(p)*1e9 + 0.5), identical expression in the SQL
    oracle) so per-doc sums are exact integers — order-independent —
    with ONE IEEE division at the end. Plan: per-batch (term, n)
    partials -> vocab-bounded groupby -> tiny (vocab-sized) broadcast
    -> pure map scoring stage. No full-corpus materialisation."""
    docs = _docs(sf_dir)

    def wc(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]),
                                      "[^a-z0-9]+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = pc.value_counts(flat)
        return pa.table({"w": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    counts = docs.map_batches(wc, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .groupby("w").aggregate(Sum("n", alias_name="n")).to_pandas()
    words = counts["w"].to_numpy()
    cnt = counts["n"].to_numpy(np.int64)
    total = int(cnt.sum())
    qv = np.floor(np.log(cnt / total) * 1e9 + 0.5).astype(np.int64)
    order = np.argsort(words)
    words_s, qv_s = words[order], qv[order]

    def score(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]),
                                      "[^a-z0-9]+")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keep = flat != ""
        f, p = flat[keep], par[keep]
        s = np.zeros(len(t), dtype=np.int64)
        ntok = np.zeros(len(t), dtype=np.int64)
        if len(f):
            idx = np.searchsorted(words_s, f)
            np.add.at(s, p, qv_s[idx])
            np.add.at(ntok, p, 1)
        nz = ntok > 0
        ids = t["doc_id"].to_numpy(zero_copy_only=False)[nz]
        sn, tn = s[nz], ntok[nz]
        return pa.table({
            "doc_id": pa.array(ids),
            "n_tokens": pa.array(tn),
            "xent": pa.array(round6(-(sn / 1e9) / tn)),
        })

    return docs.map_batches(score, batch_format="pyarrow",
                            zero_copy_batch=True)


SQL_DOC_LM_XENT = """
WITH t AS (SELECT doc_id, list_filter(
             regexp_split_to_array(lower(text), '[^a-z0-9]+'),
             x -> x <> '') AS arr
           FROM documents),
tok AS (SELECT doc_id, unnest(arr) AS w FROM t),
c AS (SELECT w, count(*) AS cnt FROM tok GROUP BY 1),
n AS (SELECT sum(cnt) AS total FROM c),
q AS (SELECT w, CAST(floor(ln(CAST(cnt AS DOUBLE) / total)
                           * 1000000000 + 0.5) AS BIGINT) AS qv
      FROM c, n),
d AS (SELECT tok.doc_id, count(*) AS n_tokens, sum(q.qv) AS s
      FROM tok JOIN q USING (w) GROUP BY 1)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       round(-(CAST(s AS DOUBLE) / 1000000000) / n_tokens, 6) AS xent
FROM d
"""


# ----------------------------------------------------------------------
# Gopher quality rules (composite document-quality gate)
# ----------------------------------------------------------------------
def q_doc_gopher_rules(sf_dir):
    """Gopher quality gate (Rae et al. 2021 §A1.1) over documents:
    per-doc signals (word count, mean word length, symbol/bullet/
    ellipsis ratios, alphabetic-word fraction, stop-word hits) plus
    the composite ``keep`` flag — the standard pre-filter an LLM
    corpus pipeline runs before dedup. Pure map stage (actor pool),
    no shuffle; thresholds are applied to the UNROUNDED signals on
    both engines."""
    return tx.gopher_rules(_docs(sf_dir))


SQL_DOC_GOPHER_RULES = f"""
WITH t AS (SELECT doc_id, text,
             list_filter(regexp_split_to_array(lower(text),
                                               '[^a-z0-9]+'),
                         x -> x <> '') AS toks,
             string_split(text, chr(10)) AS lines
           FROM documents),
m AS (SELECT doc_id, len(toks) AS n_words,
        CASE WHEN len(toks) > 0 THEN
          CAST(list_sum(list_transform(toks, w -> length(w)))
               AS DOUBLE) / len(toks) ELSE 0 END AS mean_word_len,
        CASE WHEN len(toks) > 0 THEN
          CAST((length(text) - length(replace(text, '#', '')))
               + (length(text) - length(replace(text, '...', ''))) / 3
               AS DOUBLE) / len(toks) ELSE 0 END AS symbol_ratio,
        CAST(len(list_filter(lines,
               l -> ltrim(l, ' ') LIKE '-%' OR ltrim(l, ' ') LIKE '*%'))
             AS DOUBLE) / len(lines) AS bullet_ratio,
        CAST(len(list_filter(lines, l -> rtrim(l, ' ') LIKE '%...'))
             AS DOUBLE) / len(lines) AS ellipsis_ratio,
        CASE WHEN len(toks) > 0 THEN
          CAST(len(list_filter(toks, w -> regexp_matches(w, '[a-z]')))
               AS DOUBLE) / len(toks) ELSE 0 END AS alpha_word_ratio,
        len(list_filter(['the','be','to','of','and','that','have',
                         'with'],
                        s -> list_contains(toks, s))) AS stop_hits
      FROM t)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       round(mean_word_len, 6) AS mean_word_len,
       round(symbol_ratio, 6) AS symbol_ratio,
       round(bullet_ratio, 6) AS bullet_ratio,
       round(ellipsis_ratio, 6) AS ellipsis_ratio,
       round(alpha_word_ratio, 6) AS alpha_word_ratio,
       CAST(stop_hits AS BIGINT) AS stop_hits,
       CAST(CASE WHEN n_words >= {tx.GOPHER_MIN_WORDS}
                  AND n_words <= {tx.GOPHER_MAX_WORDS}
                  AND mean_word_len >= {tx.GOPHER_MIN_MEAN_LEN}
                  AND mean_word_len <= {tx.GOPHER_MAX_MEAN_LEN}
                  AND symbol_ratio <= {tx.GOPHER_MAX_SYMBOL_RATIO}
                  AND bullet_ratio <= {tx.GOPHER_MAX_BULLET_RATIO}
                  AND ellipsis_ratio <= {tx.GOPHER_MAX_ELLIPSIS_RATIO}
                  AND alpha_word_ratio >= {tx.GOPHER_MIN_ALPHA_RATIO}
                  AND stop_hits >= {tx.GOPHER_MIN_STOP_HITS}
             THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM m
"""


# ----------------------------------------------------------------------
# DSIR importance resampling (data selection for LM pretraining)
# ----------------------------------------------------------------------
DSIR_BUCKETS = 512      # divides 2^64, so uint64 wraparound mod B ==
                        # plain mod B and the SQL twin needs no HUGEINT
DSIR_TOP_K = 100
DSIR_TARGET_LANG = "en"


def _dsir_doc_buckets(t: pa.Table):
    """Hashed-bigram feature stream for a batch: (doc_index, bucket)
    per within-doc adjacent token pair. bucket = (h(w1) * 1000003 +
    h(w2)) % B in uint64 wraparound arithmetic; because B divides
    2^64 the SQL twin computes the identical value with small-int
    mod algebra ((h1 % B) * 1000003 + h2 % B) % B."""
    toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]),
                                  "[^a-z0-9]+")
    flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
    par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    keep = flat != ""
    f, p = flat[keep], par[keep]
    if len(f) < 2:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    h = tx.hash_tokens(f)
    same = p[1:] == p[:-1]
    bk = ((h[:-1] * np.uint64(1_000_003) + h[1:])
          % np.uint64(DSIR_BUCKETS))[same]
    return p[:-1][same].astype(np.int64), bk.astype(np.int64)


def q_dsir_select(sf_dir):
    """DSIR — Data Selection via Importance Resampling (Xie et al.
    2023): score every document by how much more likely its hashed
    bigram features are under the TARGET distribution (here the
    ``lang='en'`` slice) than under the raw corpus, then resample by
    Gumbel-noised top-k — the standard recipe for selecting
    pretraining data that "looks like" a high-quality target set.

    log w(d) = sum_features c_f * (ln p_target(f) - ln p_corpus(f)),
    Laplace-smoothed over B=512 hash buckets. Determinism: the two
    per-bucket ln terms are quantised to 1e-9 fixed point (identical
    expression in the oracle) so per-doc sums are exact integers; the
    Gumbel key g = -ln(-ln(u)) draws u from the md5 of the doc id so
    both engines rank the identical float key.

    Plan: pass 1 = per-batch B-bucket bincount partials (driver
    merges a 512-int array, O(B) state); pass 2 = broadcast the
    512-int delta vector, per-batch scoring + partial top-k — the
    driver sees K rows per batch, never the corpus."""
    docs = _docs(sf_dir, columns=("doc_id", "text", "lang"))
    B = DSIR_BUCKETS

    def bcounts(t: pa.Table) -> pa.Table:
        di, bk = _dsir_doc_buckets(t)
        is_t = pc.equal(t["lang"], DSIR_TARGET_LANG) \
            .to_numpy(zero_copy_only=False)
        nc = np.bincount(bk, minlength=B)
        nt = np.bincount(bk[is_t[di]], minlength=B)
        return pa.table({"bucket": pa.array(np.arange(B)),
                         "nc": pa.array(nc.astype(np.int64)),
                         "nt": pa.array(nt.astype(np.int64))})

    nc = np.zeros(B, np.int64)
    nt = np.zeros(B, np.int64)
    for b in docs.map_batches(bcounts, batch_format="pyarrow",
                              zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):
        np.add.at(nc, b["bucket"].to_numpy(zero_copy_only=False),
                  b["nc"].to_numpy(zero_copy_only=False))
        np.add.at(nt, b["bucket"].to_numpy(zero_copy_only=False),
                  b["nt"].to_numpy(zero_copy_only=False))
    ct, tt = int(nc.sum()), int(nt.sum())
    delta = (np.floor(np.log((nt + 1.0) / (tt + B)) * 1e9 + 0.5)
             - np.floor(np.log((nc + 1.0) / (ct + B)) * 1e9 + 0.5)
             ).astype(np.int64)

    def score(t: pa.Table) -> pa.Table:
        di, bk = _dsir_doc_buckets(t)
        s = np.zeros(t.num_rows, np.int64)
        np.add.at(s, di, delta[bk])
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        u = (tx.hash_tokens(ids.astype(str)) % np.uint64(1_000_000)
             + 0.5) / 1_000_000.0
        g = -np.log(-np.log(u))
        key = s / 1e9 + g
        k = min(DSIR_TOP_K, t.num_rows)
        top = np.argpartition(-key, k - 1)[:k] if t.num_rows else \
            np.empty(0, np.int64)
        return pa.table({"doc_id": pa.array(ids[top]),
                         "sq": pa.array(s[top]),
                         "key": pa.array(key[top])})

    parts = docs.map_batches(score, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()
    order = np.lexsort((parts["doc_id"].to_numpy(),
                        -parts["key"].to_numpy()))[:DSIR_TOP_K]
    sel = parts.iloc[order]
    return pa.table({
        "doc_id": pa.array(sel["doc_id"].to_numpy(np.int64)),
        "logw": pa.array(round6(sel["sq"].to_numpy(np.int64) / 1e9)),
        "sample_key": pa.array(round6(sel["key"].to_numpy())),
    })


_DSIR_H = "('0x' || substr(md5({x}), 1, 16))::UBIGINT"

SQL_DSIR_SELECT = f"""
WITH t AS (SELECT doc_id, lang, list_filter(
             regexp_split_to_array(lower(text), '[^a-z0-9]+'),
             x -> x <> '') AS arr
           FROM documents),
tok AS (SELECT doc_id, lang, unnest(arr) AS w,
               generate_subscripts(arr, 1) AS i FROM t),
seq AS (SELECT doc_id, lang, w AS a,
               lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS b
        FROM tok),
bg AS (SELECT doc_id, lang,
              (({_DSIR_H.format(x='a')} % {DSIR_BUCKETS}) * 1000003
               + {_DSIR_H.format(x='b')} % {DSIR_BUCKETS})
              % {DSIR_BUCKETS} AS bucket
       FROM seq WHERE b IS NOT NULL),
c AS (SELECT bucket, count(*) AS nc,
             count(*) FILTER (WHERE lang = '{DSIR_TARGET_LANG}') AS nt
      FROM bg GROUP BY 1),
tot AS (SELECT sum(nc) AS ct, sum(nt) AS tt FROM c),
d AS (SELECT bucket,
             CAST(floor(ln((nt + 1.0) / (tt + {DSIR_BUCKETS}))
                        * 1000000000 + 0.5) AS BIGINT)
           - CAST(floor(ln((nc + 1.0) / (ct + {DSIR_BUCKETS}))
                        * 1000000000 + 0.5) AS BIGINT) AS delta
      FROM c, tot),
s AS (SELECT bg.doc_id, sum(d.delta) AS sq
      FROM bg JOIN d USING (bucket) GROUP BY 1),
k AS (SELECT doc_id, COALESCE(s.sq, 0) AS sq,
             CAST(COALESCE(s.sq, 0) AS DOUBLE) / 1000000000
             - ln(-ln(({_DSIR_H.format(x='CAST(doc_id AS VARCHAR)')}
                       % 1000000 + 0.5) / 1000000.0)) AS key
      FROM documents LEFT JOIN s USING (doc_id))
SELECT doc_id,
       round(CAST(sq AS DOUBLE) / 1000000000, 6) AS logw,
       round(key, 6) AS sample_key
FROM k ORDER BY key DESC, doc_id LIMIT {DSIR_TOP_K}
"""


# ----------------------------------------------------------------------
# temperature-scaled source mixing weights (data-mixing stage)
# ----------------------------------------------------------------------
MIX_ALPHA = 0.5  # w ∝ n^alpha; 0.5 = the sqrt temperature GPT-3-style
                 # mixing uses to upweight small sources


def q_source_mix_weights(sf_dir):
    """Per-source sampling weights for temperature-scaled data mixing
    (the corpus-balancing stage an LLM pipeline runs before packing):
    weight(source) ∝ n_docs^alpha with alpha=0.5 — small sources get
    upweighted relative to proportional sampling. sqrt(n) is IEEE
    correctly-rounded on both engines, then quantised to 1e-9 fixed
    point so the normalising sum is an exact integer (order-free);
    ONE final division per source. Per-batch count partials merge on
    the driver (|sources|-bounded, CLAUDE.md hot-path rule)."""
    from collections import defaultdict
    docs = _docs(sf_dir, columns=("source",))

    def partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t["source"])
        return pa.table({"source": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    tot = defaultdict(int)
    for b in docs.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):
        for s, n in zip(b["source"].to_pylist(),
                        b["n"].to_pylist()):
            tot[s] += n
    srcs = sorted(tot)
    n_docs = np.array([tot[s] for s in srcs], dtype=np.int64)
    qv = np.floor(np.sqrt(n_docs.astype(np.float64))
                  * 1e9 + 0.5).astype(np.int64)
    return pa.table({
        "source": pa.array(srcs, pa.string()),
        "n_docs": pa.array(n_docs),
        "weight": pa.array(round6(qv / qv.sum())),
    })


SQL_SOURCE_MIX_WEIGHTS = """
WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
q AS (SELECT source, n_docs,
             CAST(floor(sqrt(CAST(n_docs AS DOUBLE))
                        * 1000000000 + 0.5) AS BIGINT) AS qv
      FROM c),
t AS (SELECT sum(qv) AS tq FROM q)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       round(CAST(qv AS DOUBLE) / tq, 6) AS weight
FROM q, t
"""


# ----------------------------------------------------------------------
# near-dup representative election by quality (the curation keep-list)
# ----------------------------------------------------------------------
def q_dedup_keep_best(sf_dir):
    """Quality-based representative election over near-dup clusters —
    the curation form of dedup where you KEEP the best copy, not the
    first: per MinHash-LSH cluster (``dedup_cluster``'s components),
    keep the member with the most characters (tie -> min doc_id).
    Cluster members are a tiny fraction of the corpus, so the quality
    join is a membership-filtered scan, never a full-corpus shuffle."""
    clusters = q_dedup_cluster(sf_dir)          # (doc_id, rep_doc_id)
    member = clusters["doc_id"].to_numpy()
    cid = clusters["rep_doc_id"].to_numpy()
    member_set = np.sort(member)

    def pick(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        keep = np.isin(ids, member_set)
        return pa.table({"doc_id": pa.array(ids[keep]),
                         "n_chars": pa.array(
                             t["n_chars"].to_numpy(
                                 zero_copy_only=False)[keep])})

    quality = _docs(sf_dir, columns=("doc_id", "n_chars")) \
        .map_batches(pick, batch_format="pyarrow",
                     zero_copy_batch=True).to_pandas()
    nc = quality.set_index("doc_id")["n_chars"]
    n_chars = nc.loc[member].to_numpy(np.int64)
    # best per cluster: n_chars desc, doc_id asc
    order = np.lexsort((member, -n_chars))
    c_o, m_o, q_o = cid[order], member[order], n_chars[order]
    first = np.unique(c_o, return_index=True)[1]
    counts = np.bincount(np.searchsorted(np.unique(c_o), c_o))
    return pa.table({
        "cluster_id": pa.array(np.unique(c_o)),
        "n_members": pa.array(counts.astype(np.int64)),
        "keep_doc_id": pa.array(m_o[first]),
        "keep_n_chars": pa.array(q_o[first]),
    })


SQL_DEDUP_KEEP_BEST = f"""
WITH clusters AS ({SQL_DEDUP_CLUSTER}),
m AS (SELECT c.rep_doc_id AS cluster_id, c.doc_id, d.n_chars
      FROM clusters c JOIN documents d ON d.doc_id = c.doc_id),
b AS (SELECT cluster_id, doc_id, n_chars,
             row_number() OVER (PARTITION BY cluster_id
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM m),
n AS (SELECT cluster_id, count(*) AS n_members FROM m GROUP BY 1)
SELECT n.cluster_id, CAST(n.n_members AS BIGINT) AS n_members,
       b.doc_id AS keep_doc_id,
       CAST(b.n_chars AS BIGINT) AS keep_n_chars
FROM n JOIN b USING (cluster_id) WHERE b.rn = 1
"""


# ----------------------------------------------------------------------
# hard-negative mining (contrastive-training corpus prep)
# ----------------------------------------------------------------------
HARDNEG_NQ = 5


def q_ann_hard_negatives(sf_dir):
    """Hard-negative mining for contrastive training: for each query
    vector, the single most-similar vector with a DIFFERENT label —
    the negatives that actually move a contrastive loss. Same
    per-batch partial-top-k envelope as ``ann_topk`` (driver sees one
    winner per query per batch, never the corpus); the label-mismatch
    mask replaces the top-k cut."""
    import ray
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding", "label"])
    qdf = emb.filter(expr=f"vec_id < {HARDNEG_NQ}").to_pandas() \
        .sort_values("vec_id")
    qv = np.stack([np.asarray(v, dtype=np.float64)
                   for v in qdf["embedding"]])
    qn = np.linalg.norm(qv, axis=1)
    qn[qn == 0] = 1.0
    q_ref = ray.put(qv / qn[:, None])
    qid = qdf["vec_id"].to_numpy(np.int64)
    qlab = qdf["label"].to_numpy(np.int64)

    def partial(t: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        vec = annm._to_matrix(t["embedding"])
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        norm = np.linalg.norm(vec, axis=1)
        norm[norm == 0] = 1.0
        sim = (vec / norm[:, None]) @ qm.T
        out = {"qj": [], "vec_id": [], "cos": [], "neg_label": []}
        for j in range(qm.shape[0]):
            mask = lab != qlab[j]
            if not mask.any():
                continue
            s, i, l2 = sim[mask, j], ids[mask], lab[mask]
            w = np.lexsort((i, -s))[0]
            out["qj"].append(j)
            out["vec_id"].append(i[w])
            out["cos"].append(s[w])
            out["neg_label"].append(l2[w])
        return pa.table({k: pa.array(np.asarray(v, dtype=np.int64)
                                     if k != "cos"
                                     else np.asarray(v, np.float64))
                         for k, v in out.items()})

    parts = emb.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas()
    rows = {"query_id": [], "vec_id": [], "cos": [], "neg_label": []}
    for j in range(len(qid)):
        sub = parts[parts.qj == j]
        if not len(sub):
            continue
        w = np.lexsort((sub.vec_id.to_numpy(),
                        -sub.cos.to_numpy()))[0]
        rows["query_id"].append(int(qid[j]))
        rows["vec_id"].append(int(sub.vec_id.to_numpy()[w]))
        rows["cos"].append(float(round6(sub.cos.to_numpy()[w])))
        rows["neg_label"].append(int(sub.neg_label.to_numpy()[w]))
    return pa.table({
        "query_id": pa.array(rows["query_id"], pa.int64()),
        "vec_id": pa.array(rows["vec_id"], pa.int64()),
        "cos": pa.array(rows["cos"], pa.float64()),
        "neg_label": pa.array(rows["neg_label"], pa.int64()),
    })


SQL_ANN_HARD_NEGATIVES = f"""
WITH ranked AS (
  SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
         round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])), 6)
             AS cos,
         CAST(e.label AS BIGINT) AS neg_label,
         row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(
                 CAST(q.embedding AS DOUBLE[]),
                 CAST(e.embedding AS DOUBLE[])) DESC, e.vec_id) AS rn
  FROM embeddings q JOIN embeddings e ON q.label <> e.label
  WHERE q.vec_id < {HARDNEG_NQ})
SELECT query_id, vec_id, cos, neg_label FROM ranked WHERE rn = 1
"""


# ----------------------------------------------------------------------
# global transitivity, Dice similarity, graph summary (igraph
# transitivity_undirected / similarity_dice / summary parity)
# ----------------------------------------------------------------------

def q_k4_cliques_co(sf_dir):
    """4-clique (K4) census on the simple co graph — the next motif up
    from triangles (graphlet counting / community-density diagnostic).
    Compact-forward DAG: each K4's minimum-rank vertex sees the other
    three as a triangle inside its forward neighbourhood, so the count
    is one small dense matmul per vertex with |N+| = O(sqrt(2m))
    (``dist/triangles.k4_count_fast``); same broadcast envelope as
    ``triangle_count_fast``, partitioned variant swaps the closing
    lookup exactly as triangles does. The edge list is assembled from
    the shared deduped CSR blocks inside a worker task (driver stays
    o(E); r4 verdict item 4)."""
    import ray

    g, refs = _co_canon_refs(sf_dir)

    @ray.remote
    def run(*parts):
        from leidenalg_ray.dist.triangles import k4_count_fast
        aa = np.concatenate([p[0] for p in parts])
        bb = np.concatenate([p[1] for p in parts])
        n = int(max(aa.max(initial=-1), bb.max(initial=-1))) + 1
        return k4_count_fast(aa, bb, n, P=16)

    n_tri, n_k4 = ray.get(run.remote(*refs))
    return pa.table({"n_triangles": pa.array([n_tri], pa.int64()),
                     "n_k4": pa.array([n_k4], pa.int64())})


SQL_K4_CLIQUES_CO = """
WITH e AS (SELECT l1.l_partkey AS a, l2.l_partkey AS b
           FROM lineitem l1 JOIN lineitem l2
             ON l1.l_orderkey = l2.l_orderkey
            AND l1.l_partkey < l2.l_partkey
           GROUP BY 1, 2),
tri AS (SELECT e1.a, e1.b, e2.b AS c
        FROM e e1 JOIN e e2 ON e2.a = e1.b JOIN e e3
          ON e3.a = e1.a AND e3.b = e2.b)
SELECT (SELECT count(*) FROM tri) AS n_triangles,
       (SELECT count(*) FROM tri t
          JOIN e x ON x.a = t.c
          JOIN e y ON y.a = t.b AND y.b = x.b
          JOIN e z ON z.a = t.a AND z.b = x.b) AS n_k4
"""



CONSTRAINT_PQ = 1_000_000            # p_ij fixed point (1e-6)
CONSTRAINT_TQ = 1_000_000_000        # term^2 fixed point (1e-9)


def q_constraint_co(sf_dir):
    """Burt's constraint (igraph ``constraint()`` parity, weighted):
    c_i = sum_{j in N(i)} (p_ij + sum_{q in N(i), q != i,j} p_iq
    p_qj)^2 with p_ij = w_ij / strength_i. Proportions are quantised
    to 1e-6 fixed point so every two-hop product and sum is an exact
    integer (order-independent across partitions); the squared term is
    re-quantised to 1e-9 before the per-vertex sum, so both engines
    evaluate the identical IEEE expressions (the ``doc_lm_xent``
    fixed-point pattern). Two-hop partials run as P vid-stripe tasks
    against the broadcast quantised CSR — the gate-scale form of the
    worker-to-worker wedge shipping the partitioned triangle kernel
    uses past node memory (quantisation keeps that exchange exact at
    any P). Edge arrays are assembled from the shared deduped CSR
    blocks inside a worker task (driver stays o(E); r4 verdict
    item 4)."""
    import ray

    g, refs = _co_canon_refs(sf_dir)

    @ray.remote
    def run(*parts):
        aa = np.concatenate([p[0] for p in parts])
        bb = np.concatenate([p[1] for p in parts])
        ww = np.concatenate([p[2] for p in parts])
        n = int(max(aa.max(initial=-1), bb.max(initial=-1))) + 1
        return _constraint_scores(aa, bb, ww, n)

    return ray.get(run.remote(*refs))


def _constraint_scores(aa, bb, ww, n, P=8):
    """Quantised Burt-constraint kernel over undirected weighted
    (a, b, w) edge arrays — see ``q_constraint_co``."""
    import ray
    i = np.concatenate([aa, bb])
    j = np.concatenate([bb, aa])
    w = np.concatenate([ww, ww]).astype(np.float64)
    st = np.zeros(n)
    np.add.at(st, i, w)
    pq = np.floor(w / st[i] * CONSTRAINT_PQ + 0.5).astype(np.int64)
    order = np.argsort(i, kind="stable")
    i, j, pq = i[order], j[order], pq[order]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, i + 1, 1)
    np.cumsum(indptr, out=indptr)
    csr_ref = ray.put((indptr, j, pq))

    @ray.remote
    def stripe(p, P):
        indptr_, j_, pq_ = ray.get(csr_ref)
        vids, cons = [], []
        acc = np.zeros(n, dtype=np.int64)
        for u in range(p, n, P):
            lo, hi = int(indptr_[u]), int(indptr_[u + 1])
            if lo == hi:
                continue
            nb, pu = j_[lo:hi], pq_[lo:hi]
            # inner[j] = sum_q p_uq * p_qj over 2-paths u -> q -> j
            segs = [(int(indptr_[q]), int(indptr_[q + 1]))
                    for q in nb]
            qj = np.concatenate([j_[a:b] for a, b in segs])
            qv = np.concatenate(
                [pq_[a:b] * pu[k] for k, (a, b) in enumerate(segs)])
            np.add.at(acc, qj, qv)
            t = pu * np.int64(CONSTRAINT_PQ) + acc[nb]
            tf = t / 1e12
            tq = np.floor(tf * tf * CONSTRAINT_TQ + 0.5) \
                .astype(np.int64)
            vids.append(u)
            cons.append(int(tq.sum()))
            acc[qj] = 0                     # sparse reset
        return (np.asarray(vids, np.int64),
                np.asarray(cons, np.int64))

    res = ray.get([stripe.remote(p, P) for p in range(P)])
    vid = np.concatenate([r[0] for r in res])
    cs = np.concatenate([r[1] for r in res])
    o = np.argsort(vid)
    return pa.table({
        "vid": pa.array(vid[o]),
        "constraint_score": pa.array(round6(cs[o] / CONSTRAINT_TQ)),
    })


SQL_CONSTRAINT_CO = f"""
WITH e0 AS (SELECT l1.l_partkey AS a, l2.l_partkey AS b,
                   count(*) AS weight
            FROM lineitem l1 JOIN lineitem l2
              ON l1.l_orderkey = l2.l_orderkey
             AND l1.l_partkey < l2.l_partkey
            GROUP BY 1, 2),
ed AS (SELECT a AS i, b AS j, weight FROM e0
       UNION ALL SELECT b, a, weight FROM e0),
s AS (SELECT i, sum(weight) AS st FROM ed GROUP BY 1),
p AS (SELECT ed.i, ed.j,
             CAST(floor(ed.weight / s.st * {CONSTRAINT_PQ} + 0.5)
                  AS BIGINT) AS pq
      FROM ed JOIN s USING (i)),
inn AS (SELECT p1.i, p2.j, sum(p1.pq * p2.pq) AS v
        FROM p p1 JOIN p p2 ON p2.i = p1.j AND p2.j <> p1.i
        GROUP BY 1, 2),
t AS (SELECT p.i,
             (p.pq * {CONSTRAINT_PQ} + COALESCE(inn.v, 0))
               / 1000000000000.0 AS tf
      FROM p LEFT JOIN inn ON inn.i = p.i AND inn.j = p.j)
SELECT CAST(i AS BIGINT) AS vid,
       round(sum(CAST(floor(tf * tf * {CONSTRAINT_TQ} + 0.5)
                      AS BIGINT)) / {CONSTRAINT_TQ}.0, 6)
         AS constraint_score
FROM t GROUP BY i
"""


def q_transitivity_global_co(sf_dir):
    """Global transitivity (igraph ``transitivity_undirected``):
    3 * triangles / wedges on the simple co graph, wedges = sum over
    vertices of C(deg, 2). Triangles from the partitioned
    compact-forward plan; the wedge sum reduces SHARD-SIDE over the
    CSR degree shards (one scalar per shard to the driver, no O(n)
    assemble)."""
    import ray
    g = _co_distgraph(sf_dir)
    n_tri = triangle_count(tg.co_edge_rows(sf_dir), num_partitions=8)

    @ray.remote
    def wedge_partial(deg):
        d = deg.astype(np.float64)
        return float((d * (d - 1.0) / 2.0).sum())

    n_wedges = int(sum(ray.get([wedge_partial.remote(r)
                                for r in g.out_deg])))
    return pa.table({
        "n_triangles": pa.array([int(n_tri)], pa.int64()),
        "n_wedges": pa.array([n_wedges], pa.int64()),
        "transitivity": pa.array(round6([3.0 * n_tri / n_wedges])),
    })


SQL_TRANSITIVITY_GLOBAL_CO = """
WITH e0 AS (SELECT l1.l_partkey AS a, l2.l_partkey AS b
            FROM lineitem l1 JOIN lineitem l2
              ON l1.l_orderkey = l2.l_orderkey
             AND l1.l_partkey < l2.l_partkey
            GROUP BY 1, 2),
tri AS (SELECT count(*) AS t
        FROM e0 e1 JOIN e0 e2 ON e2.a = e1.b JOIN e0 e3
          ON e3.a = e1.a AND e3.b = e2.b),
deg AS (SELECT v, count(*) AS d FROM (
          SELECT a AS v FROM e0 UNION ALL SELECT b AS v FROM e0)
        GROUP BY v),
w AS (SELECT sum(d * (d - 1) // 2) AS wedges FROM deg)
SELECT CAST(tri.t AS BIGINT) AS n_triangles,
       CAST(w.wedges AS BIGINT) AS n_wedges,
       round(3.0 * tri.t / w.wedges, 6) AS transitivity
FROM tri, w
"""


def q_edge_dice_co(sf_dir):
    """Per-edge Dice similarity (igraph ``similarity_dice`` for
    adjacent pairs): dice = 2*support / (deg_a + deg_b) — same
    compact-forward support plan and degree bincounts as
    ``edge_jaccard_co``, different normalisation."""
    from ..dist.truss import edge_supports
    t = pa.concat_tables(
        [b for b in tg.co_edge_rows(sf_dir).iter_batches(
            batch_size=None, batch_format="pyarrow")])
    s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = int(max(s.max(), d.max())) + 1
    lo = np.minimum(s, d)
    hi = np.maximum(s, d)
    keys = np.unique(lo[lo != hi] * np.int64(n) + hi[lo != hi])
    a, b = keys // n, keys % n
    sup = edge_supports(a, b, n, P=8)
    deg = np.bincount(a, minlength=n) + np.bincount(b, minlength=n)
    return pa.table({"a": pa.array(a), "b": pa.array(b),
                     "support": pa.array(sup),
                     "dice": pa.array(round6(
                         2.0 * sup / (deg[a] + deg[b])))})


SQL_EDGE_DICE_CO = f"""
WITH {_SQL_CO_PAIRS},
dd AS (SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0),
sup AS (SELECT e.a, e.b, count(*) AS sp
        FROM e0 e JOIN dd x ON x.a = e.a
                  JOIN dd y ON y.a = e.b AND y.b = x.b
        GROUP BY 1, 2),
deg AS (SELECT a AS v, count(*) AS dg FROM dd GROUP BY 1)
SELECT e.a, e.b,
       CAST(COALESCE(sup.sp, 0) AS BIGINT) AS support,
       round(2.0 * COALESCE(sup.sp, 0) / (da.dg + db.dg), 6) AS dice
FROM e0 e
LEFT JOIN sup ON sup.a = e.a AND sup.b = e.b
JOIN deg da ON da.v = e.a
JOIN deg db ON db.v = e.b
"""


def q_spearman_centrality_co(sf_dir):
    """Spearman rank correlation between the PageRank and Katz
    orderings (the link-signal agreement diagnostic): rho = 1 -
    6*sum(d^2) / (n(n^2-1)) over the two (score desc, vid) rank
    permutations — all-integer until one final division, computed on
    the gate-identical rounded per-vertex outputs (ties broken by
    vid, the ``rrf_centrality_co`` convention)."""
    pr = q_pagerank_co(sf_dir).to_pandas()
    kz = q_katz_co(sf_dir).to_pandas()
    pr = pr.sort_values(["rank", "vid"], ascending=[False, True])
    r1 = pd.Series(np.arange(1, len(pr) + 1), index=pr["vid"].values)
    kz = kz.sort_values(["katz", "vid"], ascending=[False, True])
    r2 = pd.Series(np.arange(1, len(kz) + 1), index=kz["vid"].values)
    d = (r1 - r2.reindex(r1.index)).to_numpy(np.int64)
    n = len(d)
    sum_d2 = int((d * d).sum())
    rho = 1.0 - 6.0 * sum_d2 / (n * (n * n - 1))
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "sum_d2": pa.array([sum_d2], pa.int64()),
        "spearman_rho": pa.array(round6([rho])),
    })


def _sql_spearman():
    return f"""
WITH pr AS (SELECT vid, row_number() OVER (ORDER BY rank DESC, vid)
                     AS r1
            FROM ({SQL_PAGERANK_CO})),
kz AS (SELECT vid, row_number() OVER (ORDER BY katz DESC, vid) AS r2
       FROM ({SQL_KATZ_CO})),
d AS (SELECT CAST(r1 AS BIGINT) - CAST(r2 AS BIGINT) AS dd
      FROM pr JOIN kz USING (vid))
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum(dd * dd) AS BIGINT) AS sum_d2,
       round(1.0 - 6.0 * sum(dd * dd)
             / (count(*) * (count(*) * count(*) - 1)), 6)
         AS spearman_rho
FROM d
"""


RRF_K = 60
RRF_TOPN = 20


def q_rrf_centrality_co(sf_dir):
    """Reciprocal-rank fusion of two centrality rankings (Cormack et
    al. 2009 — the standard way a ranking pipeline combines link
    signals): rrf(v) = 1/(60 + rank_pagerank) + 1/(60 + rank_katz),
    ranks on the two SQL-green per-vertex outputs with (score desc,
    vid) tie order, top-RRF_TOPN reported. Fusion runs on the rounded
    per-vertex outputs (the driver-hashed contract values, identical
    on both engines by the pagerank_co / katz_co gates), so the rank
    comparison is exact; the fusion itself is a fixed two-term IEEE
    expression. Driver state is the two per-vertex outputs — the size
    of the query RESULT, not the edge set."""
    pr = q_pagerank_co(sf_dir).to_pandas()
    kz = q_katz_co(sf_dir).to_pandas()
    pr = pr.sort_values(["rank", "vid"], ascending=[False, True])         .reset_index(drop=True)
    pr["r1"] = np.arange(1, len(pr) + 1)
    kz = kz.sort_values(["katz", "vid"], ascending=[False, True])         .reset_index(drop=True)
    kz["r2"] = np.arange(1, len(kz) + 1)
    m = pr[["vid", "r1"]].merge(kz[["vid", "r2"]], on="vid")
    rrf = 1.0 / (RRF_K + m["r1"].to_numpy())         + 1.0 / (RRF_K + m["r2"].to_numpy())
    m["rrf"] = rrf
    m = m.sort_values(["rrf", "vid"], ascending=[False, True])         .head(RRF_TOPN)
    return pa.table({
        "vid": pa.array(m["vid"].to_numpy(np.int64)),
        "r_pagerank": pa.array(m["r1"].to_numpy(np.int64)),
        "r_katz": pa.array(m["r2"].to_numpy(np.int64)),
        "rrf": pa.array(round6(m["rrf"].to_numpy())),
    })


def _sql_rrf():
    from textwrap import indent
    pr = SQL_PAGERANK_CO
    kz = SQL_KATZ_CO
    return f"""
WITH pr AS (SELECT vid, row_number() OVER (ORDER BY rank DESC, vid)
                     AS r1
            FROM ({pr})),
kz AS (SELECT vid, row_number() OVER (ORDER BY katz DESC, vid) AS r2
       FROM ({kz}))
SELECT pr.vid, CAST(r1 AS BIGINT) AS r_pagerank,
       CAST(r2 AS BIGINT) AS r_katz,
       round(1.0 / ({RRF_K} + r1) + 1.0 / ({RRF_K} + r2), 6) AS rrf
FROM pr JOIN kz USING (vid)
ORDER BY 1.0 / ({RRF_K} + r1) + 1.0 / ({RRF_K} + r2) DESC, vid
LIMIT {RRF_TOPN}
"""


SPARSIFY_K = 8


def q_graph_sparsify_co(sf_dir):
    """Top-k edge sparsification (the pre-Leiden pruning step a dense
    co-occurrence graph needs at scale): keep an undirected edge iff
    it ranks in EITHER endpoint's top-SPARSIFY_K by (weight desc,
    neighbour asc). Each vertex's full out-list is resident in its one
    CSR block (src-partitioned), so ranking is shuffle-free; blocks
    emit their kept (lo, hi, w) partials and the union dedup is one
    pair-key pass (bounded by K*V — at scale a pair-key shuffle).
    Output: edge/weight retention summary (integer weights, exact)."""
    import ray
    g = _co_distgraph(sf_dir)
    P, n = g.P, g.n

    @ray.remote
    def kept_partial(block, p):
        s = block["src_local"] * np.int64(P) + p
        d = block["dst_local"] * np.int64(P) + block["dst_part"]
        w = block["weight"].astype(np.int64)
        order = np.lexsort((d, -w, s))
        s, d, w = s[order], d[order], w[order]
        cuts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        ends = np.r_[cuts[1:], len(s)]
        rank = np.arange(len(s)) - np.repeat(cuts, ends - cuts)
        m = rank < SPARSIFY_K
        lo = np.minimum(s[m], d[m])
        hi = np.maximum(s[m], d[m])
        tot_w = int(w.sum())          # directed rows; halves global
        return lo * np.int64(n) + hi, w[m], len(s), tot_w

    res = ray.get([kept_partial.remote(g.blocks[p], p)
                   for p in range(P)])
    keys = np.concatenate([r[0] for r in res])
    ws = np.concatenate([r[1] for r in res])
    n_dir_edges = sum(r[2] for r in res)
    w_dir_total = sum(r[3] for r in res)
    uk, idx = np.unique(keys, return_index=True)
    n_edges = n_dir_edges // 2
    w_total = w_dir_total // 2
    w_kept = int(ws[idx].sum())
    return pa.table({
        "n_edges": pa.array([n_edges], pa.int64()),
        "n_kept": pa.array([len(uk)], pa.int64()),
        "w_total": pa.array([w_total], pa.int64()),
        "w_kept": pa.array([w_kept], pa.int64()),
        "edge_retention": pa.array(round6([len(uk) / n_edges])),
        "weight_retention": pa.array(round6([w_kept / w_total])),
    })


SQL_GRAPH_SPARSIFY_CO = f"""
WITH e0 AS (SELECT l1.l_partkey AS a, l2.l_partkey AS b,
                   count(*) AS w
            FROM lineitem l1 JOIN lineitem l2
              ON l1.l_orderkey = l2.l_orderkey
             AND l1.l_partkey < l2.l_partkey
            GROUP BY 1, 2),
ed AS (SELECT a AS i, b AS j, w FROM e0
       UNION ALL SELECT b, a, w FROM e0),
r AS (SELECT i, j, w,
             row_number() OVER (PARTITION BY i
                                ORDER BY w DESC, j) AS rn
      FROM ed),
kept AS (SELECT DISTINCT least(i, j) AS lo, greatest(i, j) AS hi, w
         FROM r WHERE rn <= {SPARSIFY_K})
SELECT (SELECT CAST(count(*) AS BIGINT) FROM e0) AS n_edges,
       (SELECT CAST(count(*) AS BIGINT) FROM kept) AS n_kept,
       (SELECT CAST(sum(w) AS BIGINT) FROM e0) AS w_total,
       (SELECT CAST(sum(w) AS BIGINT) FROM kept) AS w_kept,
       round((SELECT count(*) FROM kept) * 1.0
             / (SELECT count(*) FROM e0), 6) AS edge_retention,
       round((SELECT sum(w) FROM kept) * 1.0
             / (SELECT sum(w) FROM e0), 6) AS weight_retention
"""


def q_graph_summary_co(sf_dir):
    """One-row graph summary (igraph ``summary()`` numbers) for the
    simple co graph: vertices with >= 1 edge, distinct undirected
    edges, density over active vertices, max and mean degree — all
    from per-shard degree partials (scalars to the driver)."""
    import ray
    g = _co_distgraph(sf_dir)

    @ray.remote
    def part(deg):
        act = deg > 0
        return (int(act.sum()), int(deg.sum()), int(deg.max(initial=0)))

    parts = ray.get([part.remote(r) for r in g.out_deg])
    n_v = sum(p[0] for p in parts)
    n_e = sum(p[1] for p in parts) // 2     # undirected: both dirs stored
    max_d = max(p[2] for p in parts)
    return pa.table({
        "n_vertices": pa.array([n_v], pa.int64()),
        "n_edges": pa.array([n_e], pa.int64()),
        "density": pa.array(round6([2.0 * n_e / (n_v * (n_v - 1.0))])),
        "max_degree": pa.array([max_d], pa.int64()),
        "mean_degree": pa.array(round6([2.0 * n_e / n_v])),
    })


SQL_GRAPH_SUMMARY_CO = f"""
WITH {_SQL_CO_PAIRS},
dd AS (SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0),
deg AS (SELECT a AS v, count(*) AS dg FROM dd GROUP BY 1),
s AS (SELECT count(*) AS n_v, sum(dg) AS sd, max(dg) AS mx FROM deg)
SELECT CAST(n_v AS BIGINT) AS n_vertices,
       CAST(sd // 2 AS BIGINT) AS n_edges,
       round(CAST(sd AS DOUBLE) / (n_v * (n_v - 1.0)), 6) AS density,
       CAST(mx AS BIGINT) AS max_degree,
       round(CAST(sd AS DOUBLE) / n_v, 6) AS mean_degree
FROM s
"""


# ----------------------------------------------------------------------
# dyad census (igraph dyad_census parity) over the directed
# precedence co graph — same graph as reciprocity_co
# ----------------------------------------------------------------------
def q_dyad_census_co(sf_dir):
    """Dyad census (igraph ``dyad_census``) of the directed precedence
    co graph: mutual / asymmetric / null unordered dyads over the
    vertices with at least one directed edge. Same one-pair-key-
    shuffle plan as ``reciprocity_co`` (per-batch direction-flag
    partials, idempotent max combine); the null count is closed-form
    C(n_active, 2) - mut - asym so no all-pairs stage exists."""
    from ray.data.aggregate import Max
    li = tg.read_lineitem(sf_dir,
                          ["l_orderkey", "l_partkey", "l_linenumber"])
    right = li.map_batches(
        lambda t: t.rename_columns(
            ["l_orderkey", "partkey_r", "linenumber_r"]),
        batch_format="pyarrow", zero_copy_batch=True)
    joined = li.join(right, "inner", 16, on=("l_orderkey",))

    def pre(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.less(t["l_linenumber"], t["linenumber_r"]),
                       pc.not_equal(t["l_partkey"], t["partkey_r"]))
        tt = t.filter(keep)
        a, b = tt["l_partkey"], tt["partkey_r"]
        g = pa.table({
            "lo": pc.min_element_wise(a, b),
            "hi": pc.max_element_wise(a, b),
            "f": pc.cast(pc.less(a, b), pa.int64()),
            "r": pc.cast(pc.greater(a, b), pa.int64()),
        }).group_by(["lo", "hi"]).aggregate([("f", "max"), ("r", "max")])
        return g.rename_columns(["lo", "hi", "f", "r"])

    agg = joined.map_batches(pre, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby(["lo", "hi"]).aggregate(Max("f", alias_name="f"),
                                         Max("r", alias_name="r"))

    mut = asym = 0
    vids: set[int] = set()
    for t in agg.iter_batches(batch_format="pyarrow"):
        f = t["f"].to_numpy(zero_copy_only=False)
        r = t["r"].to_numpy(zero_copy_only=False)
        mut += int(((f == 1) & (r == 1)).sum())
        asym += int((f + r == 1).sum())
        vids.update(t["lo"].to_pylist())
        vids.update(t["hi"].to_pylist())
    n = len(vids)
    return pa.table({
        "mut": pa.array([mut], pa.int64()),
        "asym": pa.array([asym], pa.int64()),
        "null_dyads": pa.array([n * (n - 1) // 2 - mut - asym],
                               pa.int64()),
    })


SQL_DYAD_CENSUS_CO = """
WITH d AS (SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
           FROM lineitem l1 JOIN lineitem l2
             ON l1.l_orderkey = l2.l_orderkey
            AND l1.l_linenumber < l2.l_linenumber
            AND l1.l_partkey <> l2.l_partkey),
p AS (SELECT least(a, b) AS lo, greatest(a, b) AS hi,
             max(CASE WHEN a < b THEN 1 ELSE 0 END) AS f,
             max(CASE WHEN a > b THEN 1 ELSE 0 END) AS r
      FROM d GROUP BY 1, 2),
v AS (SELECT count(DISTINCT x) AS n FROM (
        SELECT lo AS x FROM p UNION SELECT hi FROM p)),
s AS (SELECT sum(CASE WHEN f = 1 AND r = 1 THEN 1 ELSE 0 END) AS mut,
             sum(CASE WHEN f + r = 1 THEN 1 ELSE 0 END) AS asym
      FROM p)
SELECT CAST(s.mut AS BIGINT) AS mut,
       CAST(s.asym AS BIGINT) AS asym,
       CAST(v.n * (v.n - 1) // 2 - s.mut - s.asym AS BIGINT)
           AS null_dyads
FROM s, v
"""


def _co_brand_pair_counts(sf_dir):
    """(B, B) int64 brand-pair endpoint counts over the deduped
    DIRECTED co edge set (blocks hold both directions, so each
    undirected edge contributes one count per orientation — exactly
    the doubled mixing-matrix convention nominal assortativity uses).
    One per-block bincount task per partition, B*B integers to the
    driver, brand LUT broadcast once."""
    import ray as _ray
    g = _co_distgraph(sf_dir)
    brands, lut = _brand_codes(sf_dir)
    B = len(brands)
    P = g.P
    lut_ref = _ray.put(lut)

    @_ray.remote
    def counts(block, lut_, p):
        src_g = block["src_local"] * P + p
        dst_g = block["dst_local"] * P + block["dst_part"]
        key = lut_[src_g] * B + lut_[dst_g]
        return np.bincount(key, minlength=B * B).astype(np.int64)

    parts = _ray.get([counts.remote(g.blocks[p], lut_ref, p)
                      for p in range(P)])
    return brands, sum(parts).reshape(B, B)


def q_assortativity_nominal_co(sf_dir):
    """Nominal (categorical) assortativity of the co graph by part
    brand — igraph ``assortativity_nominal`` parity: r = (sum_i e_ii
    - sum_i a_i^2) / (1 - sum_i a_i^2) over the edge-endpoint mixing
    matrix. Computed from all-integer brand-pair counts (per-block
    bincounts, B^2 driver state) with ONE final float division:
    r = (T*same - sum_A^2) / (T^2 - sum_A^2)."""
    _, E = _co_brand_pair_counts(sf_dir)
    T = int(E.sum())
    same = int(np.trace(E))
    a = E.sum(axis=1)
    sa2 = int((a.astype(object) ** 2).sum())
    r = (T * same - sa2) / (T * T - sa2)
    return pa.table({
        "r_nominal": pa.array(round6(np.array([r]))),
        "n_endpoints": pa.array([T], pa.int64()),
        "same_brand": pa.array([same], pa.int64()),
    })


SQL_ASSORT_NOMINAL_CO = f"""
WITH {_SQL_CO_PAIRS},
dd AS (SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0),
m AS (SELECT pa.p_brand AS ba, pb.p_brand AS bb, count(*) AS c
      FROM dd JOIN part pa ON pa.p_partkey = dd.a
              JOIN part pb ON pb.p_partkey = dd.b
      GROUP BY 1, 2),
t AS (SELECT sum(c) AS T,
             sum(CASE WHEN ba = bb THEN c ELSE 0 END) AS same FROM m),
arow AS (SELECT ba, sum(c) AS av FROM m GROUP BY 1),
s AS (SELECT sum(av * av) AS sa2 FROM arow)
SELECT round((t.T * t.same - s.sa2) * 1.0
             / (t.T * t.T - s.sa2), 6) AS r_nominal,
       CAST(t.T AS BIGINT) AS n_endpoints,
       CAST(t.same AS BIGINT) AS same_brand
FROM t, s
"""


def q_crossing_brand_co(sf_dir):
    """Per-edge community-crossing flags (igraph
    ``VertexClustering.crossing`` parity) for the co graph under the
    brand partition: one row per undirected co edge with crossing = 1
    iff its endpoints carry different brands. Per-block vectorised
    relabel against the broadcast LUT; each block emits only its
    src<dst orientation so every edge appears exactly once."""
    import ray as _ray
    g = _co_distgraph(sf_dir)
    _, lut = _brand_codes(sf_dir)
    P = g.P
    lut_ref = _ray.put(lut)

    @_ray.remote
    def edges(block, lut_, p):
        src_g = block["src_local"] * P + p
        dst_g = block["dst_local"] * P + block["dst_part"]
        m = src_g < dst_g
        s, d = src_g[m], dst_g[m]
        return s, d, (lut_[s] != lut_[d]).astype(np.int64)

    parts = _ray.get([edges.remote(g.blocks[p], lut_ref, p)
                      for p in range(P)])
    return pa.table({
        "a": pa.array(np.concatenate([p[0] for p in parts])),
        "b": pa.array(np.concatenate([p[1] for p in parts])),
        "crossing": pa.array(np.concatenate([p[2] for p in parts])),
    })


SQL_CROSSING_BRAND_CO = f"""
WITH {_SQL_CO_PAIRS}
SELECT e0.a, e0.b,
       CAST(CASE WHEN pa.p_brand <> pb.p_brand THEN 1 ELSE 0 END
            AS BIGINT) AS crossing
FROM e0 JOIN part pa ON pa.p_partkey = e0.a
        JOIN part pb ON pb.p_partkey = e0.b
"""


SAMPLE_PER_USER_K = 3


def q_events_sample_per_user(sf_dir):
    """Deterministic per-group reservoir sample: for every user keep
    the K=3 events with the smallest md5(event_id) — the
    hash-as-priority form of uniform-without-replacement group
    sampling that needs no RNG state and is reproducible across
    engines and reruns. Per-batch pre-prune (<= K rows per user leave
    each batch) then ONE user shuffle and a vectorised per-group
    selection."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id"])

    def prune(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        h = tx.hash_tokens(eid.astype(str)).astype(np.uint64)
        order = np.lexsort((h, uid))
        uid_s, eid_s, h_s = uid[order], eid[order], h[order]
        starts = np.r_[True, uid_s[1:] != uid_s[:-1]]
        grp = np.cumsum(starts) - 1
        first = np.flatnonzero(starts)
        rank = np.arange(len(uid_s)) - first[grp]
        keep = rank < SAMPLE_PER_USER_K
        return pa.table({"user_id": pa.array(uid_s[keep]),
                         "event_id": pa.array(eid_s[keep])})

    pruned = ev.map_batches(prune, batch_format="pyarrow",
                            zero_copy_batch=True)

    def select(g: pd.DataFrame) -> pd.DataFrame:
        eid = g["event_id"].to_numpy()
        h = tx.hash_tokens(eid.astype(str)).astype(np.uint64)
        top = np.argsort(h)[:SAMPLE_PER_USER_K]
        return pd.DataFrame({"user_id": g["user_id"].to_numpy()[top],
                             "event_id": eid[top]})

    return pruned.groupby("user_id").map_groups(
        select, batch_format="pandas")


SQL_EVENTS_SAMPLE_PER_USER = f"""
SELECT user_id, event_id FROM (
  SELECT user_id, event_id,
         row_number() OVER (
           PARTITION BY user_id
           ORDER BY ('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                                    1, 16))::UBIGINT) AS rn
  FROM events)
WHERE rn <= {SAMPLE_PER_USER_K}
"""


TRIAD_LABELS = ("003", "012", "102", "021D", "021U", "021C", "111D",
                "111U", "030T", "030C", "201", "120D", "120U", "120C",
                "210", "300")


def q_triad_census_co(sf_dir):
    """Full directed triad census (igraph ``triad_census``, all 16
    MAN classes) of the precedence co graph, over the active vertex
    set (vertices with at least one directed edge — the same
    convention as ``dyad_census_co``).

    Decomposition (no all-triples stage anywhere):
    - 3-linked classes (030T/030C/120*/210/300) from the
      compact-forward triangle enumeration with dyad codes broadcast
      (``triangles.triad_triangle_census``), which also returns how
      many wedges of each 2-dyad class its triangles contain;
    - 2-linked classes (021*/111*/201) = closed-form per-vertex
      (mutual, asym-in, asym-out) wedge formulas minus those
      triangle-interior wedges;
    - 1-linked classes (012/102) per dyad from linked degrees and the
      per-edge common-neighbour supports (``truss.edge_supports`` —
      the edge_jaccard plan);
    - 003 = C(n,3) minus everything else.
    Verified against an independent per-triple brute-force classifier
    in ``tests/test_dist.py::test_triad_census_matches_bruteforce``."""
    from ray.data.aggregate import Max
    from ..dist.triangles import (triad_triangle_census,
                                  TRIAD_L3_LABELS, TRIAD_WEDGE_LABELS)
    from ..dist.truss import edge_supports
    li = tg.read_lineitem(sf_dir,
                          ["l_orderkey", "l_partkey", "l_linenumber"])
    right = li.map_batches(
        lambda t: t.rename_columns(
            ["l_orderkey", "partkey_r", "linenumber_r"]),
        batch_format="pyarrow", zero_copy_batch=True)
    joined = li.join(right, "inner", 16, on=("l_orderkey",))

    def pre(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.less(t["l_linenumber"], t["linenumber_r"]),
                       pc.not_equal(t["l_partkey"], t["partkey_r"]))
        tt = t.filter(keep)
        a, b = tt["l_partkey"], tt["partkey_r"]
        g = pa.table({
            "lo": pc.min_element_wise(a, b),
            "hi": pc.max_element_wise(a, b),
            "f": pc.cast(pc.less(a, b), pa.int64()),
            "r": pc.cast(pc.greater(a, b), pa.int64()),
        }).group_by(["lo", "hi"]).aggregate([("f", "max"), ("r", "max")])
        return g.rename_columns(["lo", "hi", "f", "r"])

    agg = joined.map_batches(pre, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby(["lo", "hi"]).aggregate(Max("f", alias_name="f"),
                                         Max("r", alias_name="r")) \
        .to_pandas()
    lo = agg["lo"].to_numpy(np.int64)
    hi = agg["hi"].to_numpy(np.int64)
    f = agg["f"].to_numpy(np.int64)
    r = agg["r"].to_numpy(np.int64)
    code = np.where((f == 1) & (r == 1), 3, np.where(f == 1, 1, 2)) \
        .astype(np.int64)
    n_raw = int(hi.max()) + 1 if len(hi) else 0
    verts = np.unique(np.concatenate([lo, hi]))
    N = len(verts)
    cl = np.searchsorted(verts, lo)
    ch = np.searchsorted(verts, hi)
    m_v = np.bincount(cl[code == 3], minlength=N) \
        + np.bincount(ch[code == 3], minlength=N)
    i_v = np.bincount(cl[code == 2], minlength=N) \
        + np.bincount(ch[code == 1], minlength=N)
    o_v = np.bincount(cl[code == 1], minlength=N) \
        + np.bincount(ch[code == 2], minlength=N)
    W = {"021D": int((o_v * (o_v - 1) // 2).sum()),
         "021U": int((i_v * (i_v - 1) // 2).sum()),
         "021C": int((i_v * o_v).sum()),
         "111D": int((m_v * i_v).sum()),
         "111U": int((m_v * o_v).sum()),
         "201": int((m_v * (m_v - 1) // 2).sum())}
    l3, wd = triad_triangle_census(lo, hi, code, n=n_raw, P=16)
    sup = edge_supports(cl, ch, N, P=8)
    dL = m_v + i_v + o_v
    nulls = (N - 2) - (dL[cl] - 1) - (dL[ch] - 1) + sup
    out = {lab: int(l3[k]) for k, lab in enumerate(TRIAD_L3_LABELS)}
    for k, lab in enumerate(TRIAD_WEDGE_LABELS):
        out[lab] = W[lab] - int(wd[k])
    out["012"] = int(nulls[code != 3].sum())
    out["102"] = int(nulls[code == 3].sum())
    out["003"] = N * (N - 1) * (N - 2) // 6 - sum(out.values())
    return pa.table({
        "clazz": pa.array(list(TRIAD_LABELS)),
        "cnt": pa.array([out[c] for c in TRIAD_LABELS], pa.int64()),
    })


_TRIAD_CORNER_CLS = """CASE WHEN m{k} = 2 THEN '201'
         WHEN m{k} = 1 AND i{k} = 1 THEN '111D'
         WHEN m{k} = 1 THEN '111U'
         WHEN i{k} = 2 THEN '021U'
         WHEN o{k} = 2 THEN '021D'
         ELSE '021C' END"""

SQL_TRIAD_CENSUS_CO = f"""
WITH d AS (SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
           FROM lineitem l1 JOIN lineitem l2
             ON l1.l_orderkey = l2.l_orderkey
            AND l1.l_linenumber < l2.l_linenumber
            AND l1.l_partkey <> l2.l_partkey),
p AS (SELECT least(a, b) AS lo, greatest(a, b) AS hi,
             max(CASE WHEN a < b THEN 1 ELSE 0 END) AS fw,
             max(CASE WHEN a > b THEN 1 ELSE 0 END) AS rv
      FROM d GROUP BY 1, 2),
c AS MATERIALIZED (SELECT lo, hi,
       CASE WHEN fw = 1 AND rv = 1 THEN 3
            WHEN fw = 1 THEN 1 ELSE 2 END AS code FROM p),
nv AS (SELECT count(DISTINCT x) AS n FROM (
         SELECT lo AS x FROM c UNION SELECT hi FROM c)),
inc AS (SELECT lo AS v,
               CASE WHEN code = 3 THEN 1 ELSE 0 END AS m,
               CASE WHEN code = 2 THEN 1 ELSE 0 END AS i,
               CASE WHEN code = 1 THEN 1 ELSE 0 END AS o
        FROM c
        UNION ALL
        SELECT hi AS v,
               CASE WHEN code = 3 THEN 1 ELSE 0 END,
               CASE WHEN code = 1 THEN 1 ELSE 0 END,
               CASE WHEN code = 2 THEN 1 ELSE 0 END
        FROM c),
vio AS MATERIALIZED (SELECT v, sum(m) AS m, sum(i) AS i, sum(o) AS o
                     FROM inc GROUP BY 1),
w AS (SELECT sum(o * (o - 1) // 2) AS w021d,
             sum(i * (i - 1) // 2) AS w021u,
             sum(i * o) AS w021c, sum(m * i) AS w111d,
             sum(m * o) AS w111u,
             sum(m * (m - 1) // 2) AS w201 FROM vio),
dd AS (SELECT lo AS x, hi AS y FROM c
       UNION ALL SELECT hi, lo FROM c),
sup AS (SELECT e.lo, e.hi, count(*) AS cn
        FROM c e JOIN dd s1 ON s1.x = e.lo
                 JOIN dd s2 ON s2.x = e.hi AND s2.y = s1.y
        GROUP BY 1, 2),
l1 AS (SELECT
         sum(CASE WHEN c.code <> 3 THEN
               (nv.n - 2) - (du.m + du.i + du.o - 1)
               - (dv.m + dv.i + dv.o - 1) + COALESCE(sup.cn, 0)
             ELSE 0 END) AS n012,
         sum(CASE WHEN c.code = 3 THEN
               (nv.n - 2) - (du.m + du.i + du.o - 1)
               - (dv.m + dv.i + dv.o - 1) + COALESCE(sup.cn, 0)
             ELSE 0 END) AS n102
       FROM c
       JOIN vio du ON du.v = c.lo
       JOIN vio dv ON dv.v = c.hi
       LEFT JOIN sup ON sup.lo = c.lo AND sup.hi = c.hi, nv),
tri AS (SELECT e1.code AS c12, e2.code AS c13, e3.code AS c23
        FROM c e1 JOIN c e2 ON e2.lo = e1.lo AND e2.hi > e1.hi
                  JOIN c e3 ON e3.lo = e1.hi AND e3.hi = e2.hi),
tstat AS MATERIALIZED (SELECT
    (CASE WHEN c12 = 3 THEN 1 ELSE 0 END
     + CASE WHEN c13 = 3 THEN 1 ELSE 0 END) AS m1,
    (CASE WHEN c12 = 2 THEN 1 ELSE 0 END
     + CASE WHEN c13 = 2 THEN 1 ELSE 0 END) AS i1,
    (CASE WHEN c12 = 1 THEN 1 ELSE 0 END
     + CASE WHEN c13 = 1 THEN 1 ELSE 0 END) AS o1,
    (CASE WHEN c12 = 3 THEN 1 ELSE 0 END
     + CASE WHEN c23 = 3 THEN 1 ELSE 0 END) AS m2,
    (CASE WHEN c12 = 1 THEN 1 ELSE 0 END
     + CASE WHEN c23 = 2 THEN 1 ELSE 0 END) AS i2,
    (CASE WHEN c12 = 2 THEN 1 ELSE 0 END
     + CASE WHEN c23 = 1 THEN 1 ELSE 0 END) AS o2,
    (CASE WHEN c13 = 3 THEN 1 ELSE 0 END
     + CASE WHEN c23 = 3 THEN 1 ELSE 0 END) AS m3,
    (CASE WHEN c13 = 1 THEN 1 ELSE 0 END
     + CASE WHEN c23 = 1 THEN 1 ELSE 0 END) AS i3,
    (CASE WHEN c13 = 2 THEN 1 ELSE 0 END
     + CASE WHEN c23 = 2 THEN 1 ELSE 0 END) AS o3,
    (CASE WHEN c12 = 3 THEN 1 ELSE 0 END
     + CASE WHEN c13 = 3 THEN 1 ELSE 0 END
     + CASE WHEN c23 = 3 THEN 1 ELSE 0 END) AS mm
  FROM tri),
tcls AS (SELECT CASE
           WHEN mm = 3 THEN '300'
           WHEN mm = 2 THEN '210'
           WHEN mm = 1 THEN
             CASE WHEN (CASE WHEN m1 = 0 THEN o1
                             WHEN m2 = 0 THEN o2 ELSE o3 END) = 2
                    THEN '120D'
                  WHEN (CASE WHEN m1 = 0 THEN i1
                             WHEN m2 = 0 THEN i2 ELSE i3 END) = 2
                    THEN '120U'
                  ELSE '120C' END
           ELSE CASE WHEN i1 = 1 AND o1 = 1 AND i2 = 1 AND o2 = 1
                     THEN '030C' ELSE '030T' END
         END AS cls FROM tstat),
l3 AS (SELECT cls, count(*) AS n FROM tcls GROUP BY 1),
wdec AS (SELECT cls, count(*) AS n FROM (
           SELECT {_TRIAD_CORNER_CLS.format(k=1)} AS cls FROM tstat
           UNION ALL
           SELECT {_TRIAD_CORNER_CLS.format(k=2)} FROM tstat
           UNION ALL
           SELECT {_TRIAD_CORNER_CLS.format(k=3)} FROM tstat)
         GROUP BY 1),
base AS (
  SELECT '012' AS clazz, (SELECT n012 FROM l1) AS cnt
  UNION ALL SELECT '102', (SELECT n102 FROM l1)
  UNION ALL SELECT '021D', (SELECT w021d FROM w)
    - COALESCE((SELECT n FROM wdec WHERE cls = '021D'), 0)
  UNION ALL SELECT '021U', (SELECT w021u FROM w)
    - COALESCE((SELECT n FROM wdec WHERE cls = '021U'), 0)
  UNION ALL SELECT '021C', (SELECT w021c FROM w)
    - COALESCE((SELECT n FROM wdec WHERE cls = '021C'), 0)
  UNION ALL SELECT '111D', (SELECT w111d FROM w)
    - COALESCE((SELECT n FROM wdec WHERE cls = '111D'), 0)
  UNION ALL SELECT '111U', (SELECT w111u FROM w)
    - COALESCE((SELECT n FROM wdec WHERE cls = '111U'), 0)
  UNION ALL SELECT '201', (SELECT w201 FROM w)
    - COALESCE((SELECT n FROM wdec WHERE cls = '201'), 0)
  UNION ALL SELECT '030T',
    COALESCE((SELECT n FROM l3 WHERE cls = '030T'), 0)
  UNION ALL SELECT '030C',
    COALESCE((SELECT n FROM l3 WHERE cls = '030C'), 0)
  UNION ALL SELECT '120D',
    COALESCE((SELECT n FROM l3 WHERE cls = '120D'), 0)
  UNION ALL SELECT '120U',
    COALESCE((SELECT n FROM l3 WHERE cls = '120U'), 0)
  UNION ALL SELECT '120C',
    COALESCE((SELECT n FROM l3 WHERE cls = '120C'), 0)
  UNION ALL SELECT '210',
    COALESCE((SELECT n FROM l3 WHERE cls = '210'), 0)
  UNION ALL SELECT '300',
    COALESCE((SELECT n FROM l3 WHERE cls = '300'), 0))
SELECT clazz, CAST(cnt AS BIGINT) AS cnt FROM base
UNION ALL
SELECT '003', CAST((SELECT n * (n - 1) * (n - 2) // 6 FROM nv)
                   - (SELECT sum(cnt) FROM base) AS BIGINT)
"""


# ----------------------------------------------------------------------
# local community detection: ACL PPR push + conductance sweep
# ----------------------------------------------------------------------
def q_ppr_local_cliques(sf_dir):
    """ACL local community (PPR push + sweep, Andersen-Chung-Lang
    FOCS'06) on the planted nation cliques, seed = supplier 0: the
    sweep-minimum-conductance set is EXACTLY supplier 0's nation
    clique — its conductance is 0 (the clique is a whole component)
    and every proper prefix has positive cut, so the oracle is closed
    form and independent of float score ordering. Driver state is the
    push support only (bounded by 1/(eps*alpha), o(n))."""
    from ..dist.ppr import ppr_local_community
    s, d, w = _planted_edges(tg.nation_clique_edges(sf_dir))
    n = tg.supplier_count(sf_dir)
    g = DistGraph.from_edges(s, d, weight=w, n=n, P=8,
                             directed=False, both_directions=True)
    members, phi, _, _ = ppr_local_community(g, seed=0, alpha=0.15,
                                             eps=1e-7)
    assert phi == 0.0, "planted clique component must sweep to phi=0"
    return pa.table({"vid": pa.array(members)})


SQL_PPR_LOCAL_CLIQUES = """
SELECT CAST(s_suppkey AS BIGINT) AS vid
FROM supplier
WHERE s_nationkey = (SELECT s_nationkey FROM supplier
                     WHERE s_suppkey = 0)
"""


def q_ppr_local_co(sf_dir):
    """ACL local community around vertex 0 of the real co graph —
    the seeded-expansion form of community detection (iterative +
    sweep, not SQL-expressible; the planted twin ``ppr_local_cliques``
    is the driver-green closed form). Output: members with their
    (rounded) PPR mass."""
    from ..dist.ppr import ppr_local_community
    g = _co_distgraph(sf_dir)
    members, phi, p_map, _ = ppr_local_community(g, seed=0,
                                                 alpha=0.15, eps=1e-5)
    return pa.table({
        "vid": pa.array(members),
        "ppr": pa.array(round6([p_map[int(v)] for v in members])),
    })


# ----------------------------------------------------------------------
# WARC ingestion under the gate: CC-layout shard -> extraction ->
# edge table, against a closed-form oracle
# ----------------------------------------------------------------------
def q_edges_warc_cliques(sf_dir):
    """End-to-end WARC ingestion: the planted six-10-clique corpus is
    written as a per-record-gzip WARC shard (the Common Crawl layout),
    read back through ``read_pages_warc``, link-extracted by the REAL
    extractor, and deduped to the weighted edge table — which the
    closed form pins to exactly the 540 in-clique ordered pairs at
    weight 1. Exercises the whole crawl-archive -> graph path the
    input_hint describes."""
    import tempfile

    from ..sources.pages import generate_pages_table
    from ..sources.warc import read_pages_warc, write_warc
    from ..stages.extract import extract_dataset, links_of

    n = 60
    ii, jj = np.meshgrid(np.arange(10), np.arange(10))
    keep = ii.ravel() != jj.ravel()
    bi, bj = ii.ravel()[keep], jj.ravel()[keep]
    src = np.concatenate([bi + 10 * c for c in range(6)])
    dst = np.concatenate([bj + 10 * c for c in range(6)])
    pages_t = generate_pages_table(src, dst, n, seed=1, dup_prob=0.0)
    with tempfile.TemporaryDirectory(prefix="lray_warc_") as d:
        shard = f"{d}/planted.warc.gz"
        write_warc(pages_t, shard, per_record_gzip=True)
        pages = read_pages_warc([shard])
        links = links_of(extract_dataset(pages, concurrency=4,
                                         batch_size=16))

        def pre(t: pa.Table) -> pa.Table:
            tt = t.filter(pc.starts_with(t["dst_url"], "https://s"))
            g = pa.table({"src_url": tt["src_url"],
                          "dst_url": tt["dst_url"]}) \
                .group_by(["src_url", "dst_url"]) \
                .aggregate([([], "count_all")])
            return g.rename_columns(["src_url", "dst_url", "weight"])

        agg = links.map_batches(pre, batch_format="pyarrow") \
            .to_pandas().groupby(["src_url", "dst_url"],
                                 as_index=False)["weight"].sum()
    return pa.table({
        "src_url": pa.array(agg["src_url"], pa.string()),
        "dst_url": pa.array(agg["dst_url"], pa.string()),
        "weight": pa.array(agg["weight"].to_numpy(np.int64)),
    })


SQL_EDGES_WARC_CLIQUES = """
WITH v AS (SELECT unnest(generate_series(0, 59)) AS v),
u AS (SELECT v, 'https://s' || lpad(CAST(v % 16 AS VARCHAR), 2, '0')
            || '.example/p' || lpad(CAST(v AS VARCHAR), 9, '0')
            || '.html' AS url
      FROM v)
SELECT a.url AS src_url, b.url AS dst_url, CAST(1 AS BIGINT) AS weight
FROM u a JOIN u b
  ON a.v // 10 = b.v // 10 AND a.v <> b.v
"""


MATCH_SQL_ROUNDS = 14


def q_matching_co(sf_dir):
    """Greedy maximal matching on the co graph via locally-dominant
    edges (``superstep.maximal_matching``): per round every active
    vertex points at its minimum-key incident edge and an edge that
    is the minimum at BOTH endpoints matches — exactly the sequential
    greedy matching in ascending ``match_key`` order (greedy matching
    is confluent), which the round-unrolled SQL oracle replicates.
    Output = one row per matched vertex (both directions present)."""
    g = _co_distgraph(sf_dir)
    partner, rounds = ss.maximal_matching(g)
    assert rounds <= MATCH_SQL_ROUNDS, \
        f"matching took {rounds} rounds; raise MATCH_SQL_ROUNDS"
    vids = np.flatnonzero(partner >= 0).astype(np.int64)
    return pa.table({"vid": pa.array(vids),
                     "partner": pa.array(partner[vids])})


def _matching_rounds_sql(max_r):
    """Round-unrolled locally-dominant-edge oracle: ae = active
    edges with the engine's packed key, vm = per-vertex minima, d =
    edges minimal at both endpoints (both directions land in d since
    e carries both). Extra rounds no-op once a is empty."""
    key = ("((((least(e.a, e.b) % 1000003) * 7919 + "
           "(greatest(e.a, e.b) % 1000003) * 104729) % 1000003) "
           "* 4000000000000 + least(e.a, e.b) * 2000000 "
           "+ greatest(e.a, e.b))")
    parts = [
        "a0 AS MATERIALIZED (SELECT DISTINCT a AS v FROM e)",
        "m0 AS MATERIALIZED (SELECT CAST(NULL AS BIGINT) AS v, "
        "CAST(NULL AS BIGINT) AS partner WHERE FALSE)",
    ]
    for r in range(max_r):
        parts.append(
            f"ae{r} AS MATERIALIZED (SELECT e.a, e.b, {key} AS k\n"
            f"  FROM e JOIN a{r} x ON x.v = e.a\n"
            f"         JOIN a{r} y ON y.v = e.b\n"
            f"  WHERE e.a <> e.b)")
        parts.append(
            f"vm{r} AS MATERIALIZED (SELECT a AS v, min(k) AS km\n"
            f"  FROM ae{r} GROUP BY a)")
        parts.append(
            f"d{r} AS MATERIALIZED (SELECT ae.a AS v, ae.b AS partner\n"
            f"  FROM ae{r} ae\n"
            f"  JOIN vm{r} va ON va.v = ae.a AND va.km = ae.k\n"
            f"  JOIN vm{r} vb ON vb.v = ae.b AND vb.km = ae.k)")
        parts.append(
            f"m{r + 1} AS MATERIALIZED (SELECT v, partner FROM m{r}\n"
            f"  UNION ALL SELECT v, partner FROM d{r})")
        parts.append(
            f"a{r + 1} AS MATERIALIZED (SELECT v FROM a{r}\n"
            f"  WHERE v NOT IN (SELECT v FROM d{r}))")
    return ",\n".join(parts), f"m{max_r}"


_MATCH_CTES, _MATCH_FINAL = _matching_rounds_sql(MATCH_SQL_ROUNDS)

SQL_MATCHING_CO = f"""
WITH
{_SQL_CO_EDGES_BOTH_MAT},
{_MATCH_CTES}
SELECT v AS vid, partner FROM {_MATCH_FINAL}
"""


def _mst_by_nation(edges_ds, sf_dir):
    """Shared tail of the planted MSF queries: run the distributed
    Borůvka kernel (``dist/mst.py``) over the planted per-nation
    graph, then aggregate the emitted forest edges by the nation of
    their endpoints (both endpoints share a nation by construction —
    the planted graphs never cross nations)."""
    from ..dist.blocks import symmetrize_edges
    from ..dist.mst import minimum_spanning_forest

    n = tg.supplier_count(sf_dir)
    g = DistGraph.from_dataset(symmetrize_edges(edges_ds), n=n, P=8,
                               directed=False)
    info, _ = minimum_spanning_forest(g)
    su = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"]) \
        .to_pandas()
    nk = np.zeros(n, dtype=np.int64)
    nk[su["s_suppkey"].to_numpy(np.int64)] = \
        su["s_nationkey"].to_numpy(np.int64)
    nat = nk[info["u"]]
    cnt = np.bincount(nat)
    wsum = np.bincount(nat, weights=info["weight"])
    nz = np.flatnonzero(cnt)
    return pa.table({
        "nation": pa.array(nz, pa.int64()),
        "n_edges": pa.array(cnt[nz], pa.int64()),
        "mst_weight": pa.array(
            [round_half_away(x, 6) for x in wsum[nz]], pa.float64()),
    })


def q_mst_cliques(sf_dir):
    """Minimum spanning forest through the distributed Borůvka
    kernel on per-nation cliques weighted w(i,j)=min(i,j): every
    weight-m edge (m = the nation's minimum vid) is incident to m, so
    the unique MSF is the star at m with total (k-1)*m — closed-form
    in SQL from per-nation counts/minima. The tie-heavy weighting
    (all k-1 star edges share weight m) exercises the lexicographic
    tie-break; multi-round convergence is pinned by ``mst_paths`` and
    the Kruskal-oracle pytest suite (tests/test_mst.py)."""
    ed = tg.nation_clique_edges(sf_dir)

    def reweight(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        return pa.table({
            "src": t["src"], "dst": t["dst"],
            "weight": pa.array(np.minimum(s, d).astype(np.float64)),
        })

    return _mst_by_nation(
        ed.map_batches(reweight, batch_format="pyarrow",
                       zero_copy_batch=True), sf_dir)


SQL_MST_CLIQUES = """
SELECT CAST(s_nationkey AS BIGINT) AS nation,
       CAST(count(*) - 1 AS BIGINT) AS n_edges,
       ROUND(CAST((count(*) - 1) * min(s_suppkey) AS DOUBLE), 6)
           AS mst_weight
FROM supplier
GROUP BY s_nationkey
HAVING count(*) > 1
ORDER BY nation
"""


def q_mst_paths(sf_dir):
    """MSF on per-nation unit-weight paths: the forest IS the path
    set (k-1 edges, weight k-1 per nation), while Borůvka needs
    O(log k) rounds of pairwise merging to find it — the multi-round
    driver-green row for the kernel."""
    return _mst_by_nation(tg.nation_path_edges(sf_dir), sf_dir)


SQL_MST_PATHS = """
SELECT CAST(s_nationkey AS BIGINT) AS nation,
       CAST(count(*) - 1 AS BIGINT) AS n_edges,
       ROUND(CAST(count(*) - 1 AS DOUBLE), 6) AS mst_weight
FROM supplier
GROUP BY s_nationkey
HAVING count(*) > 1
ORDER BY nation
"""


HH_K = 127


def q_heavy_hitter_users(sf_dir):
    """Exact heavy hitters (users with > N/(k+1) of all events)
    through the 2-pass Misra-Gries path
    (``stages/sketch.heavy_hitters``): pass 1 folds per-batch
    summaries into O(k) driver state (the merged summary provably
    keeps every key above the bar — Agarwal et al., PODS 2012),
    pass 2 recounts only the <= k candidates exactly. No full
    groupby shuffle; the oracle is the plain exact HAVING filter,
    which the guarantee makes identical."""
    from ..stages.sketch import heavy_hitters
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id"])
    keys, cnts, _n = heavy_hitters(ev, "user_id", k=HH_K)
    return pa.table({
        "user_id": pa.array(keys, pa.int64()),
        "n_events": pa.array(cnts, pa.int64()),
    })


SQL_HEAVY_HITTER_USERS = f"""
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
FROM events
GROUP BY user_id
HAVING count(*) * {HH_K + 1} > (SELECT count(*) FROM events)
ORDER BY user_id
"""


HT_ITERS = 30


def q_hitting_time_co(sf_dir):
    """Truncated expected hitting time of the weighted random walk to
    the PPR_SEEDS smallest active vids (``ss.hitting_time`` — value
    iteration, the random-walk distance used for recommendation /
    trust propagation; fixed HT_ITERS sweeps so the recursive-CTE
    oracle replays it exactly). The symmetric co graph makes the
    push-along-edges gather shape identical to PageRank's."""
    g = _co_distgraph(sf_dir)
    act = g.active_global()
    targets = np.flatnonzero(act)[:PPR_SEEDS].astype(np.int64)
    h, _ = ss.hitting_time(g, targets, iters=HT_ITERS, weighted=True)
    vids = np.flatnonzero(act).astype(np.int64)
    return pa.table({"vid": pa.array(vids),
                     "h": pa.array(round6(h[vids]))})


SQL_HITTING_TIME_CO = f"""
WITH RECURSIVE
e0 AS (SELECT l1.l_partkey AS a, l2.l_partkey AS b,
              CAST(count(*) AS DOUBLE) AS w
       FROM lineitem l1 JOIN lineitem l2
         ON l1.l_orderkey = l2.l_orderkey
        AND l1.l_partkey < l2.l_partkey
       GROUP BY 1, 2),
e AS (SELECT a, b, w FROM e0 UNION ALL SELECT b, a, w FROM e0),
verts AS (SELECT a AS v, sum(w) AS strength FROM e GROUP BY a),
tgt AS (SELECT v FROM verts ORDER BY v LIMIT {PPR_SEEDS}),
one AS (SELECT CAST(count(*) AS DOUBLE) / count(*) AS o FROM verts),
ht(i, v, h) AS (
  SELECT 0, v, CAST(0.0 AS DOUBLE) FROM verts
  UNION ALL
  SELECT p.i + 1, e.b,
         CASE WHEN e.b IN (SELECT v FROM tgt)
              THEN CAST(0.0 AS DOUBLE)
              ELSE (SELECT o FROM one)
                   + sum(p.h * e.w) / vs2.strength END
  FROM ht p
  JOIN e ON e.a = p.v
  JOIN verts vs2 ON vs2.v = e.b
  WHERE p.i < {HT_ITERS}
  GROUP BY p.i, e.b, vs2.strength
)
SELECT v AS vid, round(h, 6) AS h FROM ht WHERE i = {HT_ITERS}
"""


PERC_BUCKETS = (64, 128, 192, 256)   # of 256 md5 buckets kept


def q_percolation_co(sf_dir):
    """Bond-percolation robustness curve of the co graph: for each
    deterministic edge-retention level (md5 bucket of the canonical
    edge key < kept/256), the retained edge count and the giant
    component size among vertices with >= 1 retained edge — the
    standard crawl-graph robustness diagnostic (how fast does the
    web graph shatter as links drop). Each level runs the SAME
    distributed min-label CC kernel on the filtered edge set; the
    oracle replays every level with the closure-recursion CC CTE.
    The md5 bucketing and the per-level orchestration run inside a
    worker task over the shared deduped CSR blocks (driver receives
    only the 3 x len(PERC_BUCKETS) scalars; r4 verdict item 4)."""
    import ray

    _, refs = _co_canon_refs(sf_dir)

    @ray.remote
    def run(*parts):
        import hashlib as _h
        a = np.concatenate([p[0] for p in parts])
        b = np.concatenate([p[1] for p in parts])
        n = int(max(a.max(initial=-1), b.max(initial=-1))) + 1 \
            if len(a) else 0
        h = np.asarray([int(_h.md5(f"{x}_{y}".encode())
                            .hexdigest()[:2], 16)
                        for x, y in zip(a, b)], dtype=np.int64)
        kept, n_edges, giant = [], [], []
        for T in PERC_BUCKETS:
            m = h < T
            g = DistGraph.from_edges(a[m], b[m], n=n, P=4,
                                     directed=False,
                                     both_directions=True)
            comp, _ = ss.connected_components(g)
            act = np.flatnonzero(g.active_global())
            labs = comp[act]
            sizes = np.unique(labs, return_counts=True)[1] \
                if len(labs) else np.array([0])
            kept.append(T)
            n_edges.append(int(m.sum()))
            giant.append(int(sizes.max()))
        return kept, n_edges, giant

    kept, n_edges, giant = ray.get(run.remote(*refs))
    return pa.table({
        "kept_buckets": pa.array(kept, pa.int64()),
        "n_edges": pa.array(n_edges, pa.int64()),
        "giant_size": pa.array(giant, pa.int64()),
    })


def _percolation_sql():
    blocks, finals = [], []
    for T in PERC_BUCKETS:
        blocks.append(f"""
ek{T} AS (SELECT a, b FROM eh WHERE h < {T}),
eek{T} AS (SELECT a, b FROM ek{T}
           UNION SELECT b AS a, a AS b FROM ek{T}),
vk{T} AS (SELECT DISTINCT a AS v FROM eek{T}),
reach{T}(v, lab) AS (
  SELECT v, v FROM vk{T}
  UNION
  SELECT e.b, r.lab FROM reach{T} r JOIN eek{T} e ON e.a = r.v
),
comp{T} AS (SELECT v, min(lab) AS lab FROM reach{T} GROUP BY v)""")
        finals.append(f"""
SELECT CAST({T} AS BIGINT) AS kept_buckets,
       (SELECT CAST(count(*) AS BIGINT) FROM ek{T}) AS n_edges,
       (SELECT CAST(coalesce(max(sz), 0) AS BIGINT)
        FROM (SELECT count(*) AS sz FROM comp{T} GROUP BY lab))
           AS giant_size""")
    return f"""
WITH RECURSIVE
e0 AS MATERIALIZED (SELECT l1.l_partkey AS a, l2.l_partkey AS b
       FROM lineitem l1 JOIN lineitem l2
         ON l1.l_orderkey = l2.l_orderkey
        AND l1.l_partkey < l2.l_partkey
       GROUP BY 1, 2),
eh AS MATERIALIZED (SELECT a, b,
        ('0x' || substr(md5(CAST(a AS VARCHAR) || '_'
                            || CAST(b AS VARCHAR)), 1, 2))::INT AS h
      FROM e0),
{",".join(blocks)}
{" UNION ALL ".join(finals)}
ORDER BY kept_buckets
"""


SQL_PERCOLATION_CO = _percolation_sql()


TEXTRANK_TOPK = 20


def q_textrank_keywords(sf_dir):
    """TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004):
    corpus-level top-``TEXTRANK_TOPK`` tokens by weighted PageRank
    over the adjacent-token co-occurrence graph (window 2,
    undirected, weight = adjacency count) — the graph engine feeding
    text analytics in one pipeline. Bigram extraction is a
    vectorised per-batch partial (pair counts pre-reduced per
    batch); the edge list is vocabulary-bounded, so the driver folds
    partials into arrays and runs the SAME weighted fixed-iteration
    PageRank kernel as ``pagerank_co`` over dense vocab ids (the
    repo's vocab-bounded driver-state precedent, cf.
    ``vocab_top_terms``). Selection orders by (rounded rank DESC,
    token ASC) on BOTH engines so the top-k boundary is
    deterministic."""
    docs = _docs(sf_dir)

    def bigrams(t: pa.Table) -> pa.Table:
        xs, ys = [], []
        for txt in t["text"].to_pylist():
            toks = np.asarray(tx.TOKEN_RE.findall(txt.lower()),
                              dtype=object)
            if len(toks) < 2:
                continue
            x, y = toks[:-1], toks[1:]
            m = x != y
            if not m.any():
                continue
            xs.append(np.minimum(x[m], y[m]))
            ys.append(np.maximum(x[m], y[m]))
        if not xs:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string()),
                             "w": pa.array([], pa.int64())})
        tt = pa.table({"a": pa.array(np.concatenate(xs)),
                       "b": pa.array(np.concatenate(ys))})
        return tt.group_by(["a", "b"]).aggregate([([], "count_all")]) \
            .rename_columns(["a", "b", "w"])

    agg: dict = {}
    for b in docs.map_batches(bigrams, batch_format="pyarrow",
                              zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):
        if b.num_columns == 0:
            continue
        for a_, b_, w_ in zip(b["a"].to_pylist(), b["b"].to_pylist(),
                              b["w"].to_pylist()):
            agg[(a_, b_)] = agg.get((a_, b_), 0) + int(w_)
    pairs = sorted(agg)
    toks_a = np.asarray([p[0] for p in pairs], dtype=object)
    toks_b = np.asarray([p[1] for p in pairs], dtype=object)
    w = np.asarray([agg[p] for p in pairs], dtype=np.float64)
    vocab = np.unique(np.concatenate([toks_a, toks_b]))
    src = np.searchsorted(vocab, toks_a)
    dst = np.searchsorted(vocab, toks_b)
    g = DistGraph.from_edges(src, dst, w, n=len(vocab), P=4,
                             directed=False, both_directions=True)
    rank, _ = ss.pagerank(g, damping=DAMPING, tol=0.0,
                          max_iter=PAGERANK_ITERS, weighted=True)
    r6 = round6(rank)
    order = sorted(range(len(vocab)), key=lambda i: (-r6[i],
                                                     str(vocab[i])))
    top = order[:TEXTRANK_TOPK]
    return pa.table({
        "token": pa.array([str(vocab[i]) for i in top], pa.string()),
        "rank": pa.array([float(r6[i]) for i in top], pa.float64()),
    })


SQL_TEXTRANK_KEYWORDS = f"""
WITH RECURSIVE
toks AS (SELECT doc_id,
                regexp_extract_all(lower(text), '[a-z0-9_]+') AS tk
         FROM documents),
bi AS (SELECT least(tk[i], tk[i + 1]) AS a,
              greatest(tk[i], tk[i + 1]) AS b
       FROM toks, unnest(generate_series(1, len(tk) - 1)) AS u(i)
       WHERE tk[i] <> tk[i + 1]),
e0 AS (SELECT a, b, CAST(count(*) AS DOUBLE) AS w
       FROM bi GROUP BY 1, 2),
e AS (SELECT a, b, w FROM e0 UNION ALL SELECT b, a, w FROM e0),
verts AS (SELECT a AS v, sum(w) AS strength FROM e GROUP BY a),
nn AS (SELECT count(*) AS n FROM verts),
pr(i, v, r) AS (
  SELECT 0, v, 1.0 / (SELECT n FROM nn) FROM verts
  UNION ALL
  SELECT p.i + 1, e.b,
         (1 - {DAMPING}) / (SELECT n FROM nn)
         + {DAMPING} * sum(p.r * e.w / vs.strength)
  FROM pr p
  JOIN verts vs ON vs.v = p.v
  JOIN e ON e.a = p.v
  WHERE p.i < {PAGERANK_ITERS}
  GROUP BY p.i, e.b
)
SELECT v AS token, round(r, 6) AS rank
FROM pr WHERE i = {PAGERANK_ITERS}
ORDER BY round(r, 6) DESC, v ASC LIMIT {TEXTRANK_TOPK}
"""


FUNNEL_MIN_WORDS = 50
FUNNEL_MIN_STOP_HITS = 1


class _FunnelFlags:
    """Fused funnel actor: per-doc (text_hash, key) where ``key =
    doc_id*4 + f_en*2 + f_q`` packs the lang-id and quality flags
    under the doc_id order, reusing the gate-identical ``LangId`` /
    ``GopherRules`` stage callables (state built once per actor)."""

    def __init__(self):
        self.lang = tx.LangId()
        self.gop = tx.GopherRules()

    def __call__(self, t: pa.Table) -> pa.Table:
        import hashlib
        lt = self.lang(t)
        gt = self.gop(t)
        f_en = pc.equal(lt["pred_lang"], "en").to_numpy(
            zero_copy_only=False).astype(np.int64)
        nw = gt["n_words"].to_numpy(zero_copy_only=False)
        sh = gt["stop_hits"].to_numpy(zero_copy_only=False)
        f_q = ((nw >= FUNNEL_MIN_WORDS)
               & (sh >= FUNNEL_MIN_STOP_HITS)).astype(np.int64)
        texts = np.asarray(t["text"].to_pylist(), dtype=object)
        uniq, inv = np.unique(texts, return_inverse=True)
        digests = np.asarray(
            [hashlib.md5(x.encode("utf-8")).hexdigest()
             for x in uniq], dtype=object)
        doc_id = t["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "text_hash": pa.array(digests[inv], pa.string()),
            "key": pa.array(doc_id * 4 + f_en * 2 + f_q),
        })


def q_docs_funnel(sf_dir):
    """CCNet-style preprocessing funnel (Wenzek et al. 2020 order:
    dedup -> language id -> quality filter) composed from the
    GATE-IDENTICAL stage outputs: exact-dedup representatives
    (``dd.exact_dedup``), ``tx.lang_id`` == 'en', then a quality cut
    on the Gopher signals (``tx.gopher_rules``; the funnel uses the
    integer n_words/stop_hits signals with thresholds that
    discriminate on the synthetic corpus — the full Gopher ``keep``
    conjunction keeps zero synthetic docs, which would feed an
    all-empty side into the join). One row per stage with the
    surviving doc count — the corpus-curation report every pipeline
    run emits; each underlying stage is separately oracle-verified,
    this row pins their composition.

    Execution shape: ONE fused actor stage computes per-doc
    (text_hash, key) with the lang/quality flags packed into the low
    bits of ``key = doc_id*4 + f_en*2 + f_q``, so a single
    ``groupby(text_hash).aggregate(Min(key))`` both elects the
    exact-dedup representative (min doc_id dominates the key order —
    flags contribute < 4 and doc_ids are distinct) AND carries that
    representative's own flags out of the shuffle. One shuffle, no
    joins (two chained Ray hash joins deadlock a small test session;
    duplicate texts share flags anyway, so the rep's flags are
    well-defined)."""
    docs = _docs(sf_dir)
    n_total = docs.count()
    agg = docs.map_batches(
        _FunnelFlags, batch_format="pyarrow", batch_size=2048,
        zero_copy_batch=True, concurrency=(1, 4)) \
        .groupby("text_hash").aggregate(Min("key", alias_name="key"))
    n_exact = n_lang = n_q = 0
    for b in agg.iter_batches(batch_format="pyarrow"):
        if b.num_columns == 0 or b.num_rows == 0:
            continue
        k = b["key"].to_numpy(zero_copy_only=False)
        f_en = (k >> 1) & 1
        f_q = k & 1
        n_exact += len(k)
        n_lang += int(f_en.sum())
        n_q += int((f_en & f_q).sum())
    return pa.table({
        "stage": pa.array([0, 1, 2, 3], pa.int64()),
        "name": pa.array(["total", "exact_dedup", "lang_en",
                          "quality"], pa.string()),
        "n_docs": pa.array([n_total, n_exact, n_lang, n_q],
                           pa.int64()),
    })


SQL_DOCS_FUNNEL = f"""
WITH reps AS (SELECT min(doc_id) AS doc_id
              FROM documents GROUP BY md5(text)),
lang AS ({SQL_LANG_ID}),
gop AS ({SQL_DOC_GOPHER_RULES})
SELECT * FROM (
  SELECT CAST(0 AS BIGINT) AS stage, 'total' AS name,
         CAST(count(*) AS BIGINT) AS n_docs FROM documents
  UNION ALL
  SELECT 1, 'exact_dedup', count(*) FROM reps
  UNION ALL
  SELECT 2, 'lang_en', count(*)
  FROM reps r JOIN lang l USING (doc_id)
  WHERE l.pred_lang = 'en'
  UNION ALL
  SELECT 3, 'quality', count(*)
  FROM reps r JOIN lang l USING (doc_id)
              JOIN gop g USING (doc_id)
  WHERE l.pred_lang = 'en'
    AND g.n_words >= {FUNNEL_MIN_WORDS}
    AND g.stop_hits >= {FUNNEL_MIN_STOP_HITS}
) ORDER BY stage
"""


POWERLAW_DMIN = 5


def q_degree_powerlaw_co(sf_dir):
    """Power-law tail exponent of the co-graph degree distribution —
    the Hill / Clauset-Shalizi-Newman continuous-approximation MLE at
    a fixed cutoff: alpha = 1 + m / sum_{d_i >= dmin}
    ln(d_i / (dmin - 0.5)). The heavy-tail diagnostic every web-graph
    audit runs before trusting sampling/skew assumptions. Degrees
    come from the shared deduped CSR graph's per-shard degree arrays
    (``_co_distgraph().out_deg`` — symmetrised, so out-degree is full
    degree), combined as BOUNDED per-shard histograms: the driver
    never holds a per-vertex or per-edge array for this row (r4
    verdict item 4). The ln terms are quantised to 1e-9 fixed point
    over the degree histogram so the SQL twin reproduces the sum
    exactly (the repo's standard qln parity trick, cf. compare.py)."""
    import ray

    g = _co_distgraph(sf_dir)

    @ray.remote
    def hist(deg):
        dd_ = deg[deg > 0]
        return np.unique(dd_, return_counts=True)

    parts = ray.get([hist.remote(r) for r in g.out_deg])
    d = np.unique(np.concatenate([p[0] for p in parts]))
    nv = np.zeros(len(d), dtype=np.int64)
    for u, c in parts:
        nv[np.searchsorted(d, u)] += c
    tail = d >= POWERLAW_DMIN
    m = int(nv[tail].sum())
    qln = np.floor(np.log(d[tail].astype(np.float64)
                          / (POWERLAW_DMIN - 0.5)) * 1e9
                   + 0.5).astype(np.int64)
    s_fp = int(np.sum(nv[tail].astype(object) * qln.astype(object)))
    alpha = 0.0 if s_fp == 0 else 1.0 + float(m) / (s_fp / 1e9)
    return pa.table({
        "dmin": pa.array([POWERLAW_DMIN], pa.int64()),
        "n_tail": pa.array([m], pa.int64()),
        "alpha": pa.array([round_half_away(alpha, 6)], pa.float64()),
    })


SQL_DEGREE_POWERLAW_CO = f"""
WITH
{_SQL_CO_EDGES_BOTH},
deg AS (SELECT a AS vid, count(*) AS deg FROM e GROUP BY a),
tail AS (SELECT deg, count(*) AS nv FROM deg
         WHERE deg >= {POWERLAW_DMIN} GROUP BY deg),
s AS (SELECT sum(nv) AS m,
             sum(nv * CAST(floor(ln(CAST(deg AS DOUBLE)
                                    / {POWERLAW_DMIN - 0.5}) * 1e9
                                 + 0.5) AS BIGINT)) AS sfp
      FROM tail)
SELECT CAST({POWERLAW_DMIN} AS BIGINT) AS dmin,
       CAST(coalesce(m, 0) AS BIGINT) AS n_tail,
       ROUND(CASE WHEN coalesce(sfp, 0) = 0 THEN 0.0
             ELSE 1.0 + CAST(m AS DOUBLE)
                  / (CAST(sfp AS DOUBLE) / 1e9) END, 6) AS alpha
FROM s
"""


DOULION_BUCKETS = 256
DOULION_KEEP = 64   # p = 64/256 = 1/4; estimator scale = p^-3 = 64


def q_triangles_sampled_co(sf_dir):
    """DOULION sampled triangle count (Tsourakakis, Kang, Miller &
    Faloutsos, KDD 2009): keep each canonical co edge iff its md5
    bucket < 64/256 (p = 1/4 — deterministic hash sampling, so every
    multi-edge copy of a pair filters identically at any
    partitioning), run the SAME partitioned compact-forward kernel
    on the sparsified graph, scale by p^-3 = 64. The estimator for
    when even the >node-memory exact plan is too hot: unbiased, and
    ~p^2 of the exact plan's traffic. All-integer output."""
    import hashlib

    edges = tg.co_edge_rows(sf_dir)

    def sample(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        a = np.minimum(s, d)
        b = np.maximum(s, d)
        key = a.astype(np.int64) * (1 << 32) + b
        uk, inv = np.unique(key, return_inverse=True)
        ub = np.array([int.from_bytes(
            hashlib.md5(f"{k >> 32}:{k & 0xffffffff}".encode())
            .digest()[:4], "big") % DOULION_BUCKETS for k in uk],
            dtype=np.int64)
        keep = (ub < DOULION_KEEP)[inv]
        return t.filter(pa.array(keep))

    sampled = edges.map_batches(sample, batch_format="pyarrow",
                                zero_copy_batch=True)
    n_tri = triangle_count(sampled, num_partitions=8)
    kept = _doulion_kept_count(sf_dir)
    scale = (DOULION_BUCKETS // DOULION_KEEP) ** 3
    return pa.table({
        "n_kept_edges": pa.array([kept], pa.int64()),
        "n_sampled_triangles": pa.array([int(n_tri)], pa.int64()),
        "estimate": pa.array([int(n_tri) * scale], pa.int64()),
    })


def _doulion_kept_count(sf_dir):
    """Distinct canonical co pairs surviving the DOULION hash sample
    (shared by ``q_triangles_sampled_co``; driver sees one int)."""
    import hashlib

    df = q_edges_co(sf_dir).to_pandas()
    a = df["a"].to_numpy(np.int64)
    b = df["b"].to_numpy(np.int64)
    ub = np.array([int.from_bytes(
        hashlib.md5(f"{x}:{y}".encode()).digest()[:4], "big")
        % DOULION_BUCKETS for x, y in zip(a, b)], dtype=np.int64)
    return int((ub < DOULION_KEEP).sum())


SQL_TRIANGLES_SAMPLED_CO = f"""
WITH e AS (SELECT l1.l_partkey AS a, l2.l_partkey AS b
           FROM lineitem l1 JOIN lineitem l2
             ON l1.l_orderkey = l2.l_orderkey
            AND l1.l_partkey < l2.l_partkey
           GROUP BY 1, 2),
s AS (SELECT a, b FROM e
      WHERE ('0x' || substr(md5(CAST(a AS VARCHAR) || ':'
                                || CAST(b AS VARCHAR)), 1, 8))
              ::UBIGINT % {DOULION_BUCKETS} < {DOULION_KEEP}),
tri AS (SELECT count(*) AS c
        FROM s e1 JOIN s e2 ON e2.a = e1.b
        JOIN s e3 ON e3.a = e1.a AND e3.b = e2.b)
SELECT CAST((SELECT count(*) FROM s) AS BIGINT) AS n_kept_edges,
       CAST(tri.c AS BIGINT) AS n_sampled_triangles,
       CAST(tri.c * {(DOULION_BUCKETS // DOULION_KEEP) ** 3} AS BIGINT)
         AS estimate
FROM tri
"""


def q_doc_gopher_repetition(sf_dir):
    """Gopher §A1.2 repetition signals (Rae et al. 2021) — the
    duplicated-n-gram filters that complement the §A1.1 quality gate
    (``doc_gopher_rules``): per doc, (a) ``top2_frac`` = characters
    covered by ALL occurrences of the doc's most frequent word
    2-gram (ties: lexicographically smallest) / total word
    characters, and (b) ``dup5_frac`` = characters covered by every
    occurrence of a duplicated (count >= 2 in-doc) word 5-gram /
    total word characters — overlap counted, the standard
    reimplementation convention. All-integer numerators (gram char
    length x occurrence count) with ONE IEEE division per signal, so
    both engines agree exactly. Docs with <2 words are out of scope
    on both engines."""
    docs = _docs(sf_dir)

    def rep(t: pa.Table) -> pa.Table:
        from collections import Counter
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        out = {"doc_id": [], "n_words": [], "top2_frac": [],
               "dup5_frac": []}
        for i, txt in enumerate(t["text"].to_pylist()):
            ws = tx.TOKEN_RE.findall(txt.lower())
            if len(ws) < 2:
                continue
            total = sum(len(w) for w in ws)
            c2 = Counter(" ".join(ws[j:j + 2])
                         for j in range(len(ws) - 1))
            best = min(c2.items(), key=lambda kv: (-kv[1], kv[0]))
            t2 = best[1] * (len(best[0]) - 1)
            d5 = 0
            if len(ws) >= 5:
                c5 = Counter(" ".join(ws[j:j + 5])
                             for j in range(len(ws) - 4))
                d5 = sum(c * (len(g) - 4) for g, c in c5.items()
                         if c >= 2)
            out["doc_id"].append(int(ids[i]))
            out["n_words"].append(len(ws))
            out["top2_frac"].append(t2 / total)
            out["dup5_frac"].append(d5 / total)
        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "n_words": pa.array(out["n_words"], pa.int64()),
            "top2_frac": pa.array(round6(np.array(out["top2_frac"]))),
            "dup5_frac": pa.array(round6(np.array(out["dup5_frac"]))),
        })

    return docs.map_batches(rep, batch_format="pyarrow",
                            zero_copy_batch=True)


SQL_DOC_GOPHER_REPETITION = """
WITH t AS (SELECT doc_id, list_filter(
             regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
             x -> x <> '') AS ws
           FROM documents WHERE len(list_filter(
             regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
             x -> x <> '')) >= 2),
tot AS (SELECT doc_id, len(ws) AS n_words,
               CAST(list_sum(list_transform(ws, w -> length(w)))
                    AS BIGINT) AS total
        FROM t),
g2 AS (SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS g
       FROM t, generate_series(1, 999) gs(i) WHERE i <= len(ws) - 1),
c2 AS (SELECT doc_id, g, count(*) AS c,
              length(g) - 1 AS chars
       FROM g2 GROUP BY 1, 2),
top2 AS (SELECT doc_id, c * chars AS t2
         FROM (SELECT doc_id, c, chars,
                      row_number() OVER (PARTITION BY doc_id
                                         ORDER BY c DESC, g) AS rn
               FROM c2)
         WHERE rn = 1),
g5 AS (SELECT doc_id,
              ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
                    || ws[i+3] || ' ' || ws[i+4] AS g
       FROM t, generate_series(1, 999) gs(i) WHERE i <= len(ws) - 4),
c5 AS (SELECT doc_id, g, count(*) AS c, length(g) - 4 AS chars
       FROM g5 GROUP BY 1, 2),
d5 AS (SELECT doc_id, CAST(COALESCE(sum(CASE WHEN c >= 2
                                             THEN c * chars END), 0)
                           AS BIGINT) AS d5
       FROM c5 GROUP BY 1)
SELECT tot.doc_id, tot.n_words,
       ROUND(CAST(top2.t2 AS DOUBLE) / tot.total, 6) AS top2_frac,
       ROUND(CAST(COALESCE(d5.d5, 0) AS DOUBLE) / tot.total, 6)
         AS dup5_frac
FROM tot JOIN top2 USING (doc_id) LEFT JOIN d5 USING (doc_id)
"""


def q_ann_recall(sf_dir):
    """Recall@10 of the IVF index against brute-force ground truth,
    per query — the retrieval-quality eval every ANN deployment
    publishes (and the quantified answer to "what did probing
    nprobe buckets cost?"). Runs exactly the two gate-green
    pipelines (``ann_ivf_fixed``, ``ann_topk``) and joins their
    result sets; |Q| x k rows of driver state."""
    bf = q_ann_topk(sf_dir).to_pandas()
    ivf = q_ann_ivf_fixed(sf_dir).to_pandas()
    hit = bf.merge(ivf[["query_id", "vec_id"]],
                   on=["query_id", "vec_id"], how="left",
                   indicator=True)
    g = hit.groupby("query_id")["_merge"] \
        .apply(lambda s: int((s == "both").sum()))
    qids = np.sort(g.index.to_numpy())
    n_hit = g[qids].to_numpy(np.int64)
    return pa.table({
        "query_id": pa.array(qids.astype(np.int64)),
        "n_hit": pa.array(n_hit),
        "recall": pa.array(round6(n_hit / 10.0)),
    })


def _sql_ann_recall():
    return f"""
WITH bf AS (SELECT * FROM ({SQL_ANN_TOPK}) t),
ivf AS (SELECT * FROM ({SQL_ANN_IVF_FIXED}) t)
SELECT bf.query_id,
       CAST(count(ivf.vec_id) AS BIGINT) AS n_hit,
       ROUND(count(ivf.vec_id) / 10.0, 6) AS recall
FROM bf LEFT JOIN ivf ON ivf.query_id = bf.query_id
                     AND ivf.vec_id = bf.vec_id
GROUP BY bf.query_id
"""


SBM_K = 8          # planted blocks
SBM_SIZE = 64      # vertices per block
SBM_PIN = 0.25     # within-block edge probability
SBM_POUT = 0.01    # cross-block edge probability


def _sbm_edges():
    """Deterministic stochastic-block-model graph: edge (u < v) iff
    md5-uniform(u, v) < p_in (same block) / p_out (cross block) —
    the standard planted-partition benchmark for community
    detection, hash-sampled so it is identical at any parallelism.
    Returns (src, dst, labels)."""
    import hashlib
    n = SBM_K * SBM_SIZE
    iu, iv = np.triu_indices(n, k=1)
    h = np.array([int(hashlib.md5(f"sbm:{u}:{v}".encode())
                      .hexdigest()[:16], 16)
                  for u, v in zip(iu, iv)], dtype=np.uint64)
    u01 = h / 2.0 ** 64
    same = (iu // SBM_SIZE) == (iv // SBM_SIZE)
    keep = np.where(same, u01 < SBM_PIN, u01 < SBM_POUT)
    labels = np.arange(n, dtype=np.int64) // SBM_SIZE
    return (iu[keep].astype(np.int64), iv[keep].astype(np.int64),
            labels)


def q_sbm_edges_planted(sf_dir):
    """The deterministic SBM generator behind
    ``sbm_leiden_recovery``, pinned cross-engine: edge totals within
    / across blocks from the identical md5-uniform sampling rule —
    the oracle replays every pair decision, so the recovery
    benchmark's input graph is itself gate-verified."""
    s, d, labels = _sbm_edges()
    same = labels[s] == labels[d]
    return pa.table({
        "n_edges": pa.array([len(s)], pa.int64()),
        "n_within": pa.array([int(same.sum())], pa.int64()),
        "n_cross": pa.array([int((~same).sum())], pa.int64()),
    })


SQL_SBM_EDGES_PLANTED = f"""
WITH p AS (SELECT u.u AS u, v.v AS v
           FROM generate_series(0, {SBM_K * SBM_SIZE - 1}) u(u),
                generate_series(0, {SBM_K * SBM_SIZE - 1}) v(v)
           WHERE u.u < v.v),
h AS (SELECT u, v, (u // {SBM_SIZE}) = (v // {SBM_SIZE}) AS same,
             ('0x' || substr(md5('sbm:' || u || ':' || v), 1, 16))
               ::UBIGINT AS hv
      FROM p),
kept AS (SELECT same FROM h
         WHERE CAST(hv AS DOUBLE) / 18446744073709551616.0
               < CASE WHEN same THEN CAST({SBM_PIN} AS DOUBLE)
                      ELSE CAST({SBM_POUT} AS DOUBLE) END)
SELECT CAST(count(*) AS BIGINT) AS n_edges,
       CAST(sum(CASE WHEN same THEN 1 ELSE 0 END) AS BIGINT)
         AS n_within,
       CAST(sum(CASE WHEN same THEN 0 ELSE 1 END) AS BIGINT)
         AS n_cross
FROM kept
"""


def q_sbm_leiden_recovery(sf_dir):
    """Planted-partition recovery benchmark: the DISTRIBUTED Leiden
    schedule must recover the ground-truth blocks of a deterministic
    hash-sampled SBM (8 blocks x 64 vertices, p_in=0.25,
    p_out=0.01 — a regime well above the detectability threshold).
    Reports blocks found, Danon-NMI / ARI vs the planted labels
    (``compare.compare_partitions``) and the CPM quality. The
    standard external-validity check every community-detection
    engine publishes (Lancichinetti & Fortunato 2009 benchmarking
    methodology); iterative => rows-only, pinned by the pytest
    NMI >= 0.95 recovery bar."""
    from ..compare import compare_partitions

    s, d, labels = _sbm_edges()
    n = SBM_K * SBM_SIZE
    dl = DistLeiden(s, d, n=n, directed=False, quality="cpm",
                    resolution_parameter=0.05, P=8, seed=42)
    mem, q, info = dl.run()
    nmi = compare_partitions(mem, labels, "nmi")
    ari = compare_partitions(mem, labels, "ari")
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "k_planted": pa.array([SBM_K], pa.int64()),
        "k_found": pa.array([int(len(np.unique(mem)))], pa.int64()),
        "nmi": pa.array([round6(nmi)], pa.float64()),
        "ari": pa.array([round6(ari)], pa.float64()),
        "quality": pa.array([round6(q)], pa.float64()),
    })


HYPERANF_ROUNDS = 8


def q_hyperanf_co(sf_dir):
    """HyperANF neighbourhood function of the co graph (Boldi, Rosa &
    Vigna 2011): NF(t) estimated from per-vertex 64-register HLL
    sketches max-merged along edges — the at-scale effective-diameter
    path covering EVERY vertex at 64 bytes/vertex (the exact-BFS
    companion is ``effective_diameter_items``; the planted SQL-green
    twin of this kernel is ``hyperanf_cliques``). Per-vertex
    estimates quantise to 1e-6 fixed point before summing, so NF is
    an exact integer sum — P-independent. Iterative (rows-only);
    pinned by a pytest serial replica and the twin."""
    g = _co_distgraph(sf_dir)
    nf_q, _ = ss.hyperanf(g, rounds=HYPERANF_ROUNDS)
    return pa.table({
        "t": pa.array(np.arange(len(nf_q), dtype=np.int64)),
        "nf": pa.array(round6(nf_q / 1e6)),
    })


def q_hyperanf_cliques(sf_dir):
    """HyperANF through the REAL distributed kernel on the planted
    per-nation cliques, where every round is closed-form: ball(v,0)
    = {v} (single-register sketch), ball(v,>=1) = v's whole clique
    (the clique's max-merged registers), and the kernel stops one
    round after the fixed point. The oracle replicates the md5
    register derivation, the max-merge, the gate-proven HLL
    estimator, the 1e-6 quantised sum, AND the changed-row stop rule
    — any drift in sketch init, merge order handling, estimator
    arithmetic or stop logic is a driver FAIL."""
    s, d, w = _planted_edges(tg.nation_clique_edges(sf_dir))
    n = tg.supplier_count(sf_dir)
    g = DistGraph.from_edges(s, d, weight=w, n=n, P=8,
                             both_directions=True)
    nf_q, _ = ss.hyperanf(g, rounds=HYPERANF_ROUNDS)
    return pa.table({
        "t": pa.array(np.arange(len(nf_q), dtype=np.int64)),
        "nf": pa.array(round6(nf_q / 1e6)),
    })


def q_harmonic_hyperball_cliques(sf_dir):
    """HyperBall harmonic approximation through the REAL distributed
    kernel on the planted per-nation cliques — closed-form per
    vertex: ball grows {v} -> clique at t=1 and stops, so
    ``harm(v) = (est1_q(clique) - est0_q(v)) / 1e6`` exactly. The
    oracle replicates register init, max-merge, estimator,
    quantisation AND the one-round accumulator arithmetic per
    vertex."""
    s, d, w = _planted_edges(tg.nation_clique_edges(sf_dir))
    n = tg.supplier_count(sf_dir)
    g = DistGraph.from_edges(s, d, weight=w, n=n, P=8,
                             both_directions=True)
    harm, _ = ss.hyperball_harmonic(g, rounds=HYPERANF_ROUNDS)
    act = np.flatnonzero(g.active_global())
    return pa.table({
        "vid": pa.array(act.astype(np.int64)),
        "harmonic": pa.array(round6(harm[act])),
    })


def q_harmonic_hyperball_co(sf_dir):
    """HyperBall approximate harmonic centrality of the co graph —
    per-vertex closeness-family centrality for EVERY vertex at 64
    bytes/vertex (the exact companion ``harmonic_co`` ships one BFS
    per seed; this is the 100-TB path). Iterative => rows-only;
    pinned by a serial replica test, a rank-correlation check
    against the exact kernel, and the SQL-green
    ``harmonic_hyperball_cliques`` twin. Top-20 by (rounded score
    desc, vid asc)."""
    g = _co_distgraph(sf_dir)
    harm, _ = ss.hyperball_harmonic(g, rounds=HYPERANF_ROUNDS)
    act = np.flatnonzero(g.active_global())
    r6 = round6(harm[act])
    order = np.lexsort((act, -r6))[:20]
    return pa.table({
        "vid": pa.array(act[order].astype(np.int64)),
        "harmonic": pa.array(r6[order]),
    })


SQL_HARMONIC_HYPERBALL_CLIQUES = f"""
WITH ck AS (SELECT s_nationkey AS nk FROM supplier
            GROUP BY 1 HAVING count(*) >= 2),
v AS (SELECT s_suppkey AS vid, s_nationkey AS nk
      FROM supplier WHERE s_nationkey IN (SELECT nk FROM ck)),
h AS (SELECT vid, nk,
             ('0x' || substr(md5(CAST(vid AS VARCHAR)), 1, 8))
               ::UBIGINT AS h
      FROM v),
b2 AS (SELECT vid, nk, CAST(h >> 26 AS BIGINT) AS bucket,
              CASE WHEN h % 67108864 = 0 THEN 27
                   ELSE 26 - (SELECT max(kk)
                              FROM generate_series(0, 26) g(kk)
                              WHERE h % 67108864
                                    >= (CAST(1 AS BIGINT) << kk))
              END AS rho
       FROM h),
a0 AS (SELECT vid, nk, (CAST(1 AS BIGINT) << (27 - rho))
                         + CAST(63 AS BIGINT) * 134217728 AS s_int,
              CAST(63 AS BIGINT) AS v_empty
       FROM b2),
e0 AS (SELECT vid, nk, CAST(floor(
           CASE WHEN {{RAW}} <= 160.0 AND v_empty > 0
                THEN 64 * ln(64.0 / v_empty)
                ELSE {{RAW}} END * 1e6 + 0.5) AS BIGINT) AS eq
       FROM a0),
r1 AS (SELECT nk, bucket, max(rho) AS rho FROM b2 GROUP BY 1, 2),
a1 AS (SELECT nk, 64 - count(*) AS v_empty,
              sum(CAST(1 AS BIGINT) << (27 - rho))
                + (64 - count(*)) * 134217728 AS s_int
       FROM r1 GROUP BY 1),
e1 AS (SELECT nk, CAST(floor(
           CASE WHEN {{RAW}} <= 160.0 AND v_empty > 0
                THEN 64 * ln(64.0 / v_empty)
                ELSE {{RAW}} END * 1e6 + 0.5) AS BIGINT) AS eq
       FROM a1)
SELECT e0.vid, ROUND(((e1.eq - e0.eq) / 1e6) / 1, 6) AS harmonic
FROM e0 JOIN e1 USING (nk)
"""


def q_sumdist_hyperball_paths(sf_dir):
    """HyperBall total-distance (closeness numerator) through the
    REAL distributed kernel in ``weight="distance"`` mode on the
    planted per-nation paths — the MULTI-ROUND geometric-centrality
    twin (the cliques twin only exercises one round): ball(v,t) on a
    path is the position window [pos-t, pos+t], so the oracle can
    rebuild every round's sketch as a windowed register max,
    replicate the estimator, and sum the EXACT integer
    ``Δq * t`` series — any drift in round scheduling, merge,
    estimator or the integer accumulator is a driver FAIL."""
    s, d, w = _planted_edges(tg.nation_path_edges(sf_dir))
    n = tg.supplier_count(sf_dir)
    g = DistGraph.from_edges(s, d, weight=w, n=n, P=8,
                             both_directions=True)
    acc_q, _ = ss.hyperball_harmonic(g, rounds=HYPERANF_ROUNDS,
                                     weight="distance")
    act = np.flatnonzero(g.active_global())
    return pa.table({
        "vid": pa.array(act.astype(np.int64)),
        "sumdist": pa.array(round6(acc_q[act] / 1e6)),
    })


def q_closeness_hyperball_co(sf_dir):
    """HyperBall average-distance / closeness approximation of the
    co graph: ``sumdist_q`` from the distance-mode kernel over EVERY
    vertex (the exact companion ``closeness_co`` ships one BFS per
    seed). Iterative => rows-only; pinned by the multi-round
    SQL-green ``sumdist_hyperball_paths`` twin and a serial replica
    test. Top-20 most-central (smallest sumdist > 0, tie vid)."""
    g = _co_distgraph(sf_dir)
    acc_q, _ = ss.hyperball_harmonic(g, rounds=HYPERANF_ROUNDS,
                                     weight="distance")
    act = np.flatnonzero(g.active_global())
    r6 = round6(acc_q[act] / 1e6)
    pos = r6 > 0
    act, r6 = act[pos], r6[pos]
    order = np.lexsort((act, r6))[:20]
    return pa.table({
        "vid": pa.array(act[order].astype(np.int64)),
        "sumdist": pa.array(r6[order]),
    })


SQL_SUMDIST_HYPERBALL_PATHS = """
WITH ck AS (SELECT s_nationkey AS nk FROM supplier
            GROUP BY 1 HAVING count(*) >= 2),
v AS (SELECT s_suppkey AS vid, s_nationkey AS nk,
             row_number() OVER (PARTITION BY s_nationkey
                                ORDER BY s_suppkey) AS pos
      FROM supplier WHERE s_nationkey IN (SELECT nk FROM ck)),
h AS (SELECT vid, ('0x' || substr(md5(CAST(vid AS VARCHAR)), 1, 8))
               ::UBIGINT AS h
      FROM v),
b2 AS (SELECT vid, CAST(h >> 26 AS BIGINT) AS bucket,
              CASE WHEN h % 67108864 = 0 THEN 27
                   ELSE 26 - (SELECT max(kk)
                              FROM generate_series(0, 26) g(kk)
                              WHERE h % 67108864
                                    >= (CAST(1 AS BIGINT) << kk))
              END AS rho
       FROM h),
grid AS (SELECT a.vid AS v, t.t, b.bucket, max(b.rho) AS rho
         FROM v a JOIN v u ON u.nk = a.nk
         JOIN b2 b ON b.vid = u.vid
         CROSS JOIN generate_series(0, {T}) t(t)
         WHERE abs(a.pos - u.pos) <= t.t
         GROUP BY 1, 2, 3),
agg AS (SELECT v, t, 64 - count(*) AS v_empty,
               sum(CAST(1 AS BIGINT) << (27 - rho))
                 + (64 - count(*)) * 134217728 AS s_int
        FROM grid GROUP BY 1, 2),
eq AS (SELECT v, t, CAST(floor(
           CASE WHEN {RAW} <= 160.0 AND v_empty > 0
                THEN 64 * ln(64.0 / v_empty)
                ELSE {RAW} END * 1e6 + 0.5) AS BIGINT) AS eq
       FROM agg),
d AS (SELECT v, t,
             eq - lag(eq) OVER (PARTITION BY v ORDER BY t) AS dq
      FROM eq),
acc AS (SELECT v, CAST(COALESCE(sum(dq * t), 0) AS BIGINT) AS q
        FROM d WHERE t >= 1 GROUP BY v)
SELECT v AS vid, ROUND(CAST(q AS DOUBLE) / 1e6, 6) AS sumdist
FROM acc
"""


_SQL_HLL_RAW = ("((0.7213 / (1 + 1.079 / 64)) * 64 * 64)"
                " / (s_int / 134217728.0)")
SQL_SUMDIST_HYPERBALL_PATHS = SQL_SUMDIST_HYPERBALL_PATHS \
    .replace("{RAW}", _SQL_HLL_RAW).replace("{T}", str(HYPERANF_ROUNDS))
SQL_HARMONIC_HYPERBALL_CLIQUES = SQL_HARMONIC_HYPERBALL_CLIQUES \
    .replace("{RAW}", _SQL_HLL_RAW)

SQL_HYPERANF_CLIQUES = f"""
WITH ck AS (SELECT s_nationkey AS nk FROM supplier
            GROUP BY 1 HAVING count(*) >= 2),
v AS (SELECT s_suppkey AS vid, s_nationkey AS nk
      FROM supplier WHERE s_nationkey IN (SELECT nk FROM ck)),
h AS (SELECT vid, nk,
             ('0x' || substr(md5(CAST(vid AS VARCHAR)), 1, 8))
               ::UBIGINT AS h
      FROM v),
b2 AS (SELECT vid, nk, CAST(h >> 26 AS BIGINT) AS bucket,
              CASE WHEN h % 67108864 = 0 THEN 27
                   ELSE 26 - (SELECT max(kk)
                              FROM generate_series(0, 26) g(kk)
                              WHERE h % 67108864
                                    >= (CAST(1 AS BIGINT) << kk))
              END AS rho
       FROM h),
a0 AS (SELECT vid, (CAST(1 AS BIGINT) << (27 - rho))
                     + CAST(63 AS BIGINT) * 134217728 AS s_int,
              CAST(63 AS BIGINT) AS v_empty
       FROM b2),
e0 AS (SELECT vid, CAST(floor(
           CASE WHEN {_SQL_HLL_RAW} <= 160.0 AND v_empty > 0
                THEN 64 * ln(64.0 / v_empty)
                ELSE {_SQL_HLL_RAW} END * 1e6 + 0.5) AS BIGINT) AS eq
       FROM a0),
r1 AS (SELECT nk, bucket, max(rho) AS rho FROM b2 GROUP BY 1, 2),
a1 AS (SELECT nk, 64 - count(*) AS v_empty,
              sum(CAST(1 AS BIGINT) << (27 - rho))
                + (64 - count(*)) * 134217728 AS s_int
       FROM r1 GROUP BY 1),
e1 AS (SELECT nk, CAST(floor(
           CASE WHEN {_SQL_HLL_RAW} <= 160.0 AND v_empty > 0
                THEN 64 * ln(64.0 / v_empty)
                ELSE {_SQL_HLL_RAW} END * 1e6 + 0.5) AS BIGINT) AS eq
       FROM a1),
sz AS (SELECT nk, count(*) AS k FROM v GROUP BY 1),
nf0 AS (SELECT CAST(COALESCE(sum(eq), 0) AS BIGINT) AS q FROM e0),
nf1 AS (SELECT CAST(COALESCE(sum(sz.k * e1.eq), 0) AS BIGINT) AS q
        FROM e1 JOIN sz USING (nk)),
chg AS (SELECT count(*) AS c FROM (
          SELECT nk FROM b2 GROUP BY nk
          HAVING count(DISTINCT bucket * 100 + rho) >= 2))
SELECT * FROM (
  SELECT CAST(0 AS BIGINT) AS t,
         ROUND(CAST(q AS DOUBLE) / 1e6, 6) AS nf FROM nf0
  UNION ALL
  SELECT CAST(1 AS BIGINT), ROUND(CAST(q AS DOUBLE) / 1e6, 6)
  FROM nf1
  UNION ALL
  SELECT CAST(2 AS BIGINT), ROUND(CAST(q AS DOUBLE) / 1e6, 6)
  FROM nf1 WHERE (SELECT c FROM chg) > 0)
"""


BPE_MERGES = 8


def _bpe_train(words_hist):
    """Greedy BPE training (Sennrich et al. 2016) on a distinct-word
    histogram: BPE_MERGES rounds of (count adjacent symbol pairs
    weighted by word frequency -> merge the (count desc, pair asc)
    argmax everywhere). Returns (merges, pieces) with ``pieces`` the
    final symbol sequence per distinct word. Pure driver-side
    function of the exact integer histogram — O(vocab) per round,
    independent of corpus size (the standard BPE-trainer
    representation)."""
    from collections import Counter

    seq = {w: tuple(w) for w in words_hist}
    merges = []
    for _ in range(BPE_MERGES):
        cnt = Counter()
        for w, c in words_hist.items():
            s = seq[w]
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] += c
        if not cnt:
            break
        best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        for w, s in seq.items():
            if best[0] not in s:
                continue
            out, i = [], 0
            while i < len(s):
                if (i + 1 < len(s) and s[i] == best[0]
                        and s[i + 1] == best[1]):
                    out.append(joined)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seq[w] = tuple(out)
    return merges, seq


def q_bpe_train_apply(sf_dir):
    """Full BPE tokenizer training + corpus re-tokenization — the
    tokenizer step of an LLM data pipeline, end to end: ONE pass
    builds the distinct-word histogram (vocab-bounded driver fold),
    BPE_MERGES=8 greedy merge rounds run on the histogram
    driver-side, and the resulting word->pieces table broadcasts
    into a pure apply map. Per doc: word count, piece count, and the
    md5 of the piece stream (pieces joined '+' within a word, words
    by ' ') — the rewrite is pinned byte-for-byte.

    Inherently iterative (each merge depends on the argmax of the
    previous round) => rows-only at the driver gate; pinned by (a) a
    pytest serial replica of the whole train+apply, (b) merge #1 ==
    the SQL-green ``bpe_merge_candidates`` argmax (same tokenizer,
    same tie order), (c) the md5-pinned output. Reference for the
    algorithm: Sennrich, Haddow & Birch 2016 §3.2."""
    docs = _docs(sf_dir)

    def wc(t: pa.Table) -> pa.Table:
        out_w, out_n = [], []
        from collections import Counter
        cnt = Counter()
        for txt in t["text"].to_pylist():
            cnt.update(tx.TOKEN_RE.findall(txt.lower()))
        ks = sorted(cnt)
        return pa.table({"w": pa.array(ks, pa.string()),
                         "n": pa.array([cnt[k] for k in ks],
                                       pa.int64())})

    hist_df = docs.map_batches(wc, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas() \
        .groupby("w")["n"].sum()
    merges, pieces = _bpe_train(dict(hist_df))

    def apply_(t: pa.Table) -> pa.Table:
        import hashlib
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        nw = np.zeros(len(t), dtype=np.int64)
        npc = np.zeros(len(t), dtype=np.int64)
        h = []
        for i, txt in enumerate(t["text"].to_pylist()):
            words = tx.TOKEN_RE.findall(txt.lower())
            nw[i] = len(words)
            npc[i] = sum(len(pieces[w]) for w in words)
            stream = " ".join("+".join(pieces[w]) for w in words)
            h.append(hashlib.md5(stream.encode()).hexdigest())
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_words": pa.array(nw),
            "n_pieces": pa.array(npc),
            "pieces_md5": pa.array(h, pa.string()),
        })

    return docs.map_batches(apply_, batch_format="pyarrow",
                            zero_copy_batch=True)


SRC_QUALITY_MIN_RATE = 0.5  # source keep threshold on gopher pass rate


def q_source_quality_gate(sf_dir):
    """Source-level (FineWeb-style per-domain) quality gate: per
    ``source``, the Gopher keep-rate of its documents and a composite
    source keep flag (``rate >= 0.5``) — the curation step that drops
    whole low-quality domains rather than individual documents.
    Thresholds apply to the UNROUNDED rate on both engines.

    Plan: ONE actor-pool map_batches pass reusing the gate-identical
    ``GopherRules`` callable, combined per batch into (source, n,
    n_keep) integer partials — a |sources|-bounded driver fold, no
    shuffle, no per-doc materialisation."""
    from ..stages.text import GopherRules

    docs = _docs(sf_dir, columns=("doc_id", "text", "source"))

    class SourceGate:
        def __init__(self):
            self.rules = GopherRules()

        def __call__(self, t: pa.Table) -> pa.Table:
            keep = self.rules(t)["keep"].to_numpy(zero_copy_only=False)
            src = np.asarray(t["source"].to_pylist(), dtype=object)
            us, inv = np.unique(src.astype(str), return_inverse=True)
            n = np.bincount(inv, minlength=len(us)).astype(np.int64)
            nk = np.zeros(len(us), dtype=np.int64)
            np.add.at(nk, inv, keep)
            return pa.table({"source": pa.array(us, pa.string()),
                             "n": pa.array(n),
                             "n_keep": pa.array(nk)})

    parts = docs.map_batches(SourceGate, batch_format="pyarrow",
                             batch_size=2048, zero_copy_batch=True,
                             concurrency=(1, 4)).to_pandas()
    g = parts.groupby("source", as_index=False)[["n", "n_keep"]].sum()
    n = g["n"].to_numpy(np.int64)
    nk = g["n_keep"].to_numpy(np.int64)
    rate = nk / n
    return pa.table({
        "source": pa.array(g["source"].to_numpy(dtype=object),
                           pa.string()),
        "n_docs": pa.array(n),
        "n_keep": pa.array(nk),
        "keep_rate": pa.array(round6(rate)),
        "source_keep": pa.array(
            (rate >= SRC_QUALITY_MIN_RATE).astype(np.int64)),
    })


SQL_SOURCE_QUALITY_GATE = f"""
WITH gop AS ({SQL_DOC_GOPHER_RULES}),
j AS (SELECT d.source, g.keep
      FROM documents d JOIN gop g USING (doc_id))
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(keep) AS BIGINT) AS n_keep,
       ROUND(CAST(sum(keep) AS DOUBLE) / count(*), 6) AS keep_rate,
       CAST(CASE WHEN CAST(sum(keep) AS DOUBLE) / count(*)
                      >= {SRC_QUALITY_MIN_RATE}
                 THEN 1 ELSE 0 END AS BIGINT) AS source_keep
FROM j GROUP BY source
"""


PCA_DIM = 64
PCA_QSCALE = 1e6
PCA_ITERS = 3
RP_K = 16  # JL target dimensionality (sqrt(16) = 4 is float-exact)


def q_embed_rp(sf_dir):
    """Johnson-Lindenstrauss random projection of the embedding
    corpus to RP_K=16 dims with a deterministic ±1 sign matrix
    (Achlioptas 2003 database-friendly projection) — the cheap
    dimensionality-reduction front of LSH / ANN pipelines.
    ``y_k = (1/sqrt(K)) * sum_i s(k,i) * x_i`` with
    ``s(k,i) = ±1`` from ``md5("rp:k:i") % 2`` (the repo's shared
    hash convention, replicated bit-for-bit in the oracle).

    Exactness: with 1e6-quantised embeddings each projection is an
    exact integer dot product; ``y = round6(yq/1e6/4)`` (sqrt(16)=4
    exactly). ONE shuffle-free map_batches pass against the
    broadcast 16x64 sign matrix; output is long-format
    (vec_id, k, y)."""
    import hashlib

    S = np.empty((RP_K, PCA_DIM), dtype=np.int64)
    for k in range(RP_K):
        for i in range(1, PCA_DIM + 1):
            h = int(hashlib.md5(
                f"rp:{k}:{i}".encode()).hexdigest()[:16], 16)
            S[k, i - 1] = 1 if h % 2 == 0 else -1

    def project(t: pa.Table) -> pa.Table:
        X = np.stack([np.asarray(v, dtype=np.float64)
                      for v in t["embedding"].to_pylist()])
        xq = np.floor(X * PCA_QSCALE + 0.5).astype(np.int64)
        Y = xq @ S.T  # (B, K) exact ints
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        B = len(ids)
        return pa.table({
            "vec_id": pa.array(np.repeat(ids, RP_K)),
            "k": pa.array(np.tile(np.arange(RP_K, dtype=np.int64), B)),
            "y": pa.array(round6(Y.reshape(-1) / 1e6 / 4)),
        })

    return _emb(sf_dir).map_batches(project, batch_format="pyarrow",
                                    zero_copy_batch=True)


SQL_EMBED_RP = f"""
WITH emb AS (SELECT vec_id, i,
                    CAST(floor(CAST(embedding[i] AS DOUBLE)
                               * {PCA_QSCALE} + 0.5) AS BIGINT) AS xq
             FROM embeddings, generate_series(1, {PCA_DIM}) gs(i)),
s AS (SELECT k, i,
             CASE WHEN ('0x' || substr(md5('rp:' || k || ':' || i),
                                       1, 16))::UBIGINT % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM generate_series(0, {RP_K - 1}) g1(k),
           generate_series(1, {PCA_DIM}) g2(i)),
p AS (SELECT e.vec_id, s.k, CAST(sum(e.xq * s.sgn) AS BIGINT) AS yq
      FROM emb e JOIN s USING (i) GROUP BY 1, 2)
SELECT vec_id, CAST(k AS BIGINT) AS k,
       ROUND(CAST(yq AS DOUBLE) / 1e6 / 4, 6) AS y
FROM p
"""


def q_embed_pca(sf_dir):
    """Leading principal direction of the embedding corpus — the
    whitening / SemDeDup-preprocessing step of embedding pipelines —
    via a FIXED 3-step integer power iteration so the whole job is
    exactly SQL-expressible (the ``kmeans_fixed`` convention for
    iterative algorithms). The 3-step iterate is the *defined output*
    (bit-pinned by the oracle): it converges geometrically in the
    covariance eigengap, so on real anisotropic corpora it IS the top
    PC, while on gap-free isotropic noise it is the exact 3-step
    Rayleigh ascent from the all-ones start (monotone-improvement
    property pinned in pytest).

    Exactness: embeddings quantise to 1e6 fixed point; the
    covariance NUMERATOR ``N = n * Sxx - Sx Sxᵀ`` is an exact integer
    matrix (order-independent at any partitioning), and each power
    step ``u = N @ v`` stays in exact integers, renormalised by
    ``floor(double(u) * 1e9 / double(max|u|))`` — one identical IEEE
    expression per entry on both engines (scale-free, so no fixed
    divisor can underflow). The loading vector is reported as
    ``round6(s * r / sqrt(sum r^2))`` with the sign ``s`` fixed by
    the first nonzero entry. Plan: ONE map_batches pass emits
    per-batch integer ``(Sx, Sxx)`` partials (64 rows x 66 cols;
    driver folds O(D^2) scalars per batch — independent of corpus
    size); the 3 matvecs are 64x64 driver-side Python-int ops."""
    load = _pca_loadings(sf_dir)
    if load is None:
        return pa.table({"dim": pa.array([], pa.int64()),
                         "loading": pa.array([], pa.float64())})
    return pa.table({
        "dim": pa.array(np.arange(PCA_DIM, dtype=np.int64)),
        "loading": pa.array(load, pa.float64()),
    })


def _pca_loadings(sf_dir):
    """The 3-step integer power iterate of ``q_embed_pca`` as a
    round6 float64 loading list (None if the covariance is zero —
    the oracle's empty-result case)."""
    import math

    emb = _emb(sf_dir)
    D = PCA_DIM

    def partials(t: pa.Table) -> pa.Table:
        X = np.stack([np.asarray(v, dtype=np.float64)
                      for v in t["embedding"].to_pylist()])
        assert X.shape[1] == D
        xq = np.floor(X * PCA_QSCALE + 0.5).astype(np.int64)
        sxx = xq.T @ xq
        cols = {"i": pa.array(np.arange(D, dtype=np.int64)),
                "n": pa.array(np.full(D, len(xq), dtype=np.int64)),
                "sx": pa.array(xq.sum(axis=0))}
        for j in range(D):
            cols[f"s{j}"] = pa.array(sxx[:, j])
        return pa.table(cols)

    df = emb.map_batches(partials, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    g = df.groupby("i").sum()
    n = int(df[df["i"] == 0]["n"].sum())
    sx = [int(v) for v in g["sx"]]
    N = [[n * int(g[f"s{j}"].iloc[i]) - sx[i] * sx[j]
          for j in range(D)] for i in range(D)]

    v = [1] * D
    for _ in range(PCA_ITERS):
        u = [sum(N[i][j] * v[j] for j in range(D)) for i in range(D)]
        m = max(abs(x) for x in u)
        if m == 0:  # zero covariance: the oracle's r-CTEs go empty
            return None
        v = [math.floor((float(x) * 1e9) / float(m)) for x in u]

    n2 = sum(x * x for x in v)
    s = 1
    for x in v:
        if x != 0:
            s = -1 if x < 0 else 1
            break
    denom = math.sqrt(float(n2)) if n2 else 1.0
    return [round6(float(s * x) / denom) for x in v]


# shared CTE chain: quantised embeddings -> exact integer covariance
# numerator -> 3 scale-free integer power steps -> loading vector
_SQL_PCA_CTES = f"""emb AS (SELECT vec_id, i,
                    CAST(floor(CAST(embedding[i] AS DOUBLE)
                               * {PCA_QSCALE} + 0.5) AS BIGINT) AS xq
             FROM embeddings, generate_series(1, {PCA_DIM}) gs(i)),
nv AS (SELECT count(*) AS n FROM embeddings),
sx AS (SELECT i, CAST(sum(xq) AS HUGEINT) AS sx FROM emb GROUP BY i),
sxx AS (SELECT a.i AS i, b.i AS j,
               CAST(sum(a.xq * b.xq) AS HUGEINT) AS sxx
        FROM emb a JOIN emb b USING (vec_id) GROUP BY 1, 2),
cov AS (SELECT sxx.i, sxx.j,
               nv.n * sxx.sxx - sa.sx * sb.sx AS c
        FROM sxx JOIN sx sa ON sa.i = sxx.i
                 JOIN sx sb ON sb.i = sxx.j
        CROSS JOIN nv),
u1 AS (SELECT i, CAST(sum(c) AS HUGEINT) AS u FROM cov GROUP BY i),
m1 AS (SELECT max(abs(u)) AS m FROM u1),
r1 AS (SELECT i, CAST(floor((CAST(u AS DOUBLE) * 1e9)
                            / CAST(m AS DOUBLE)) AS HUGEINT) AS val
       FROM u1, m1 WHERE m <> 0),
u2 AS (SELECT cov.i, CAST(sum(cov.c * r1.val) AS HUGEINT) AS u
       FROM cov JOIN r1 ON r1.i = cov.j GROUP BY cov.i),
m2 AS (SELECT max(abs(u)) AS m FROM u2),
r2 AS (SELECT i, CAST(floor((CAST(u AS DOUBLE) * 1e9)
                            / CAST(m AS DOUBLE)) AS HUGEINT) AS val
       FROM u2, m2 WHERE m <> 0),
u3 AS (SELECT cov.i, CAST(sum(cov.c * r2.val) AS HUGEINT) AS u
       FROM cov JOIN r2 ON r2.i = cov.j GROUP BY cov.i),
m3 AS (SELECT max(abs(u)) AS m FROM u3),
r3 AS (SELECT i, CAST(floor((CAST(u AS DOUBLE) * 1e9)
                            / CAST(m AS DOUBLE)) AS HUGEINT) AS val
       FROM u3, m3 WHERE m <> 0),
n2 AS (SELECT CAST(sum(val * val) AS HUGEINT) AS n2 FROM r3),
sgn AS (SELECT COALESCE((SELECT CASE WHEN val < 0 THEN -1 ELSE 1 END
                         FROM r3 WHERE val <> 0 ORDER BY i LIMIT 1),
                        1) AS s),
pca AS (SELECT r3.i AS i,
               ROUND(CAST(sgn.s * r3.val AS DOUBLE)
                     / sqrt(CAST(n2.n2 AS DOUBLE)), 6) AS loading
        FROM r3, n2, sgn)"""

SQL_EMBED_PCA = f"""
WITH {_SQL_PCA_CTES}
SELECT CAST(i - 1 AS BIGINT) AS dim, loading FROM pca
"""


def q_embed_detop(sf_dir):
    """All-but-the-top common-component removal (Mu & Viswanath
    2018) — the embedding post-processing step that strips the
    corpus-wide dominant direction before similarity search: per
    vector, the projection coefficient onto the ``embed_pca``
    leading direction, ``coef = <x, v>``. Vectors with large |coef|
    are dominated by the common component; downstream ANN subtracts
    ``coef * v``.

    Exactness: the loading vector is the gate-pinned round6 output
    of ``q_embed_pca`` (identical on both engines), re-quantised to
    1e6 fixed point; with the 1e6-quantised embeddings the dot
    product is an exact integer sum — order-independent — and
    ``coef = round6(cq / 1e12)``. One shuffle-free map_batches pass
    against the broadcast 64-float direction."""
    load = _pca_loadings(sf_dir)
    if load is None:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "coef": pa.array([], pa.float64())})
    vq = np.floor(np.asarray(load) * 1e6 + 0.5).astype(np.int64)

    def coef(t: pa.Table) -> pa.Table:
        X = np.stack([np.asarray(v, dtype=np.float64)
                      for v in t["embedding"].to_pylist()])
        xq = np.floor(X * PCA_QSCALE + 0.5).astype(np.int64)
        cq = xq @ vq
        return pa.table({
            "vec_id": pc.cast(t["vec_id"], pa.int64()),
            "coef": pa.array(round6(cq / 1e12)),
        })

    return _emb(sf_dir).map_batches(coef, batch_format="pyarrow",
                                    zero_copy_batch=True)


SQL_EMBED_DETOP = f"""
WITH {_SQL_PCA_CTES},
vq AS (SELECT i, CAST(floor(loading * 1e6 + 0.5) AS BIGINT) AS vq
       FROM pca),
c AS (SELECT e.vec_id, CAST(sum(e.xq * v.vq) AS BIGINT) AS cq
      FROM emb e JOIN vq v USING (i) GROUP BY 1)
SELECT vec_id, ROUND(CAST(cq AS DOUBLE) / 1e12, 6) AS coef
FROM c
"""


LM2_LAMBDA = 0.7  # bigram weight in the interpolated LM


def q_doc_lm_xent2(sf_dir):
    """Interpolated bigram-LM cross-entropy per document — the
    KenLM-style perplexity quality score of CCNet (Wenzek et al.
    2020) reduced to a 2-gram model with unigram interpolation:
    ``p(w2|w1) = 0.7 * c(w1,w2)/starts(w1) + 0.3 * c(w2)/T``,
    ``xent(d) = -(1/#bigrams) * sum ln p`` over the doc's adjacent
    token pairs. The model is trained on the corpus itself in the
    same job (one counting pass), so train+score is exactly
    SQL-expressible.

    Determinism: per-distinct-bigram ln p is quantised to 1e-9 fixed
    point (identical IEEE expression in the oracle — the operand
    order ``0.7*nb/ns + 0.3*n/T`` is written the same on both
    engines) so per-doc sums are exact integers, with one IEEE
    division at the end. Plan: one map_batches pass emits per-batch
    unigram + bigram count partials (bigram-vocab-bounded driver
    fold — at 100 TB this fold becomes one bounded groupby and the
    model table a hash-bucketed broadcast, the doc_lm_xent scale
    note); the quantised bigram score table is broadcast into a pure
    scoring map. Docs with <2 tokens are out of scope on both
    engines."""
    docs = _docs(sf_dir)

    def _toks(t: pa.Table):
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]),
                                      "[^a-z0-9]+")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keep = flat != ""
        return flat[keep], par[keep]

    def counts(t: pa.Table) -> pa.Table:
        f, p = _toks(t)
        out_1, out_2, out_n = [], [], []
        if len(f):
            assert int(np.bincount(p).max()) <= 1000, \
                "doc exceeds the SQL oracle's generate_series bound"
            uw, code = np.unique(f, return_inverse=True)
            uc = np.bincount(code)
            out_1 += list(uw)
            out_2 += [None] * len(uw)
            out_n += [int(c) for c in uc]
            adj = p[1:] == p[:-1]
            if adj.any():
                k = code[:-1][adj].astype(np.int64) * len(uw) \
                    + code[1:][adj]
                ub, cb = np.unique(k, return_counts=True)
                out_1 += list(uw[ub // len(uw)])
                out_2 += list(uw[ub % len(uw)])
                out_n += [int(c) for c in cb]
        return pa.table({"w1": pa.array(out_1, pa.string()),
                         "w2": pa.array(out_2, pa.string()),
                         "n": pa.array(out_n, pa.int64())})

    parts = docs.map_batches(counts, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()
    uni = parts[parts["w2"].isna()].groupby("w1")["n"].sum()
    bi = parts[parts["w2"].notna()].groupby(
        ["w1", "w2"])["n"].sum().reset_index()
    T = int(uni.sum())
    starts = bi.groupby("w1")["n"].sum()
    vocab = np.sort(uni.index.to_numpy().astype(object))
    w1c = np.searchsorted(vocab, bi["w1"].to_numpy(dtype=object))
    w2c = np.searchsorted(vocab, bi["w2"].to_numpy(dtype=object))
    nb = bi["n"].to_numpy(np.int64)
    ns = starts[bi["w1"]].to_numpy(np.int64)
    un = uni[bi["w2"]].to_numpy(np.int64)
    p_int = LM2_LAMBDA * nb / ns + (1.0 - LM2_LAMBDA) * un / T
    qv = np.floor(np.log(p_int) * 1e9 + 0.5).astype(np.int64)
    key = w1c.astype(np.int64) * len(vocab) + w2c
    order = np.argsort(key)
    key_s, qv_s = key[order], qv[order]

    def score(t: pa.Table) -> pa.Table:
        f, p = _toks(t)
        s = np.zeros(len(t), dtype=np.int64)
        nbg = np.zeros(len(t), dtype=np.int64)
        if len(f):
            code = np.searchsorted(vocab, f)
            adj = p[1:] == p[:-1]
            k = code[:-1][adj].astype(np.int64) * len(vocab) \
                + code[1:][adj]
            par = p[:-1][adj]
            np.add.at(s, par, qv_s[np.searchsorted(key_s, k)])
            np.add.at(nbg, par, 1)
        nz = nbg > 0
        ids = t["doc_id"].to_numpy(zero_copy_only=False)[nz]
        return pa.table({
            "doc_id": pa.array(ids),
            "n_bigrams": pa.array(nbg[nz]),
            "xent": pa.array(round6(-(s[nz] / 1e9) / nbg[nz])),
        })

    return docs.map_batches(score, batch_format="pyarrow",
                            zero_copy_batch=True)


SQL_DOC_LM_XENT2 = f"""
WITH t AS (SELECT doc_id, list_filter(
             regexp_split_to_array(lower(text), '[^a-z0-9]+'),
             x -> x <> '') AS arr
           FROM documents),
uni AS (SELECT w2, count(*) AS n
        FROM (SELECT unnest(arr) AS w2 FROM t) GROUP BY 1),
tt AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM uni),
big AS (SELECT doc_id, k, arr[k] AS w1, arr[k + 1] AS w2
        FROM t, generate_series(1, 999) gs(k)
        WHERE k < len(arr)),
bi AS (SELECT w1, w2, count(*) AS nb FROM big GROUP BY 1, 2),
cs AS (SELECT w1, CAST(sum(nb) AS BIGINT) AS ns FROM bi GROUP BY 1),
q AS (SELECT b.w1, b.w2,
             CAST(floor(ln(CAST({LM2_LAMBDA} AS DOUBLE) * b.nb / cs.ns
                           + CAST({1.0 - LM2_LAMBDA} AS DOUBLE) * u.n
                             / tt.tot) * 1e9
                        + 0.5) AS BIGINT) AS qv
      FROM bi b JOIN cs USING (w1) JOIN uni u ON u.w2 = b.w2
      CROSS JOIN tt)
SELECT g.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       ROUND(-(CAST(sum(q.qv) AS DOUBLE) / 1e9) / count(*), 6) AS xent
FROM big g JOIN q ON g.w1 = q.w1 AND g.w2 = q.w2
GROUP BY g.doc_id
"""


NB_TEST_MOD = 5  # doc_id % 5 == 0 -> held-out test split


def q_nb_lang_classify(sf_dir):
    """Multinomial Naive-Bayes language classifier, trained and
    applied in one job — the fastText-style linear quality/lang
    classifier step of LLM curation pipelines (GPT-3 / LLaMA corpus
    filters), with closed-form one-pass training so the whole
    train+score job is exactly SQL-expressible.

    Split: train = ``doc_id % 5 != 0``, test = ``doc_id % 5 == 0``
    (deterministic, engine-independent). Model: Laplace-smoothed
    multinomial NB over lowercase ``[^a-z0-9]+`` tokens —
    ``logp(w|c) = ln((n_wc + 1)/(tot_c + V))``, prior
    ``ln(docs_c/docs)``. Determinism: every ln is quantised to 1e-9
    fixed point (identical expression in the oracle) so per-doc
    class scores are exact integer sums — order-independent at any
    partitioning — and argmax ties break to the lexicographically
    smallest class on both engines.

    Plan: ONE pass over train emits per-batch (lang, w, n) token
    partials plus (lang, NULL, n_docs) doc-count partials (vocab x
    |langs|-bounded driver fold — the doc_lm_xent pattern); the
    quantised (V+1) x C log-prob matrix (+1 = unseen-token row) is
    broadcast into a pure scoring map over the test split. No
    full-corpus materialisation; test docs with zero tokens are out
    of scope on both engines."""
    docs = _docs(sf_dir, columns=("doc_id", "text", "lang"))

    def train_mask(t: pa.Table):
        return (t["doc_id"].to_numpy(zero_copy_only=False)
                % NB_TEST_MOD != 0)

    model = tx.nb_train(docs, mask_fn=train_mask)

    def score(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(ids % NB_TEST_MOD == 0))
        scored = tx.nb_score_batch(model, t)
        # join the true label back (nb_score_batch keeps row order
        # over its >=1-token subset)
        byid = dict(zip(t["doc_id"].to_pylist(),
                        t["lang"].to_pylist()))
        true = np.asarray([byid[d] for d in
                           scored["doc_id"].to_pylist()], dtype=object)
        plang = np.asarray(scored["pred_lang"].to_pylist(),
                           dtype=object)
        return pa.table({
            "doc_id": scored["doc_id"],
            "lang": pa.array(true, pa.string()),
            "pred_lang": scored["pred_lang"],
            "score_q": scored["score_q"],
            "correct": pa.array((plang == true).astype(np.int64)),
        })

    return docs.map_batches(score, batch_format="pyarrow",
                            zero_copy_batch=True)


SQL_NB_LANG_CLASSIFY = f"""
WITH train AS (SELECT * FROM documents WHERE doc_id % {NB_TEST_MOD} <> 0),
tok AS (SELECT lang,
               unnest(list_filter(
                   regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                   x -> x <> '')) AS w
        FROM train),
cnt AS (SELECT lang, w, count(*) AS n FROM tok GROUP BY 1, 2),
tot AS (SELECT lang, count(*) AS tot FROM tok GROUP BY 1),
vocab AS (SELECT count(DISTINCT w) AS v FROM tok),
ndoc AS (SELECT count(*) AS nd FROM train),
prior AS (SELECT lang,
                 CAST(floor(ln(CAST(count(*) AS DOUBLE) / nd) * 1e9
                            + 0.5) AS BIGINT) AS pq
          FROM train, ndoc GROUP BY lang, nd),
stok AS (SELECT doc_id, lang AS true_lang,
                unnest(list_filter(
                    regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                    x -> x <> '')) AS w
         FROM documents WHERE doc_id % {NB_TEST_MOD} = 0),
scored AS (SELECT s.doc_id, s.true_lang, t.lang AS clang,
                  p.pq + CAST(sum(CAST(floor(
                      ln((COALESCE(c.n, 0) + 1.0) / (t.tot + v.v)) * 1e9
                      + 0.5) AS BIGINT)) AS BIGINT) AS score_q
           FROM stok s
           CROSS JOIN tot t
           CROSS JOIN vocab v
           JOIN prior p ON p.lang = t.lang
           LEFT JOIN cnt c ON c.lang = t.lang AND c.w = s.w
           GROUP BY s.doc_id, s.true_lang, t.lang, p.pq),
best AS (SELECT doc_id, true_lang, clang, score_q,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score_q DESC, clang) AS rn
         FROM scored)
SELECT doc_id, true_lang AS lang, clang AS pred_lang, score_q,
       CAST(CASE WHEN clang = true_lang THEN 1 ELSE 0 END AS BIGINT)
         AS correct
FROM best WHERE rn = 1
"""


QUERIES = {
    "pricing_summary": q_pricing_summary,
    "edges_ps": q_edges_ps,
    "edges_co": q_edges_co,
    "degree_ps": q_degree_ps,
    "degree_distribution_ps": q_degree_distribution_ps,
    "top_parts_by_strength": q_top_parts_by_strength,
    "cc_ps": q_cc_ps,
    "cc_sizes_ps": q_cc_sizes_ps,
    "pagerank_co": q_pagerank_co,
    "pagerank_shardout_co": q_pagerank_shardout_co,
    "pagerank_ps": q_pagerank_ps,
    "pagerank_warm_co": q_pagerank_warm_co,
    "cc_incremental_ps": q_cc_incremental_ps,
    "triangles_co": q_triangles_co,
    "triangles_co_per_vertex": q_triangles_co_per_vertex,
    "label_propagation_co": q_label_propagation_co,
    "label_propagation_seeded_co": q_label_propagation_seeded_co,
    "bfs_dist_co": q_bfs_dist_co,
    "sssp_co": q_sssp_co,
    "pagerank_personalized_co": q_pagerank_personalized_co,
    "spam_mass_co": q_spam_mass_co,
    "ppr_batch_co": q_ppr_batch_co,
    "diameter_sweep_co": q_diameter_sweep_co,
    "kcore_co": q_kcore_co,
    "hits_ps": q_hits_ps,
    "salsa_ps": q_salsa_ps,
    "katz_co": q_katz_co,
    "eigencentrality_co": q_eigencentrality_co,
    "wl_colors_co": q_wl_colors_co,
    "reciprocity_co": q_reciprocity_co,
    "coreness_co": q_coreness_co,
    "clustering_coeff_co": q_clustering_coeff_co,
    "link_predict_co": q_link_predict_co,
    "neighbor_sample_co": q_neighbor_sample_co,
    "assortativity_co": q_assortativity_co,
    "leiden_cpm_co": q_leiden_cpm_co,
    "leiden_modularity_co": q_leiden_modularity_co,
    "leiden_cpm_cliques": q_leiden_cpm_cliques,
    "leiden_warm_cliques": q_leiden_warm_cliques,
    "leiden_negweight_bipartite": q_leiden_negweight_bipartite,
    "leiden_bipartite_cliques": q_leiden_bipartite_cliques,
    "leiden_modularity_cliques": q_leiden_modularity_cliques,
    "leiden_cpm_stars": q_leiden_cpm_stars,
    "leiden_surprise_cliques": q_leiden_surprise_cliques,
    "leiden_significance_cliques": q_leiden_significance_cliques,
    "leiden_rbconfig_cliques": q_leiden_rbconfig_cliques,
    "leiden_rber_cliques": q_leiden_rber_cliques,
    "leiden_temporal_cliques": q_leiden_temporal_cliques,
    "leiden_multiplex_cliques": q_leiden_multiplex_cliques,
    "leiden_multiplex_dataset_cliques": q_leiden_multiplex_dataset_cliques,
    "leiden_temporal_dataset_cliques": q_leiden_temporal_dataset_cliques,
    "leiden_fixed_cliques": q_leiden_fixed_cliques,
    "leiden_recrawl_cliques": q_leiden_recrawl_cliques,
    "leiden_minsize_complete": q_leiden_minsize_complete,
    "leiden_randcomm_complete": q_leiden_randcomm_complete,
    "mst_cliques": q_mst_cliques,
    "mst_paths": q_mst_paths,
    "degree_powerlaw_co": q_degree_powerlaw_co,
    "docs_funnel": q_docs_funnel,
    "textrank_keywords": q_textrank_keywords,
    "percolation_co": q_percolation_co,
    "hitting_time_co": q_hitting_time_co,
    "heavy_hitter_users": q_heavy_hitter_users,
    "resolution_profile_co": q_resolution_profile_co,
    "resolution_profile_cliques": q_resolution_profile_cliques,
    "resolution_profile_dataset_cliques":
        q_resolution_profile_dataset_cliques,
    "leiden_multiplex": q_leiden_multiplex,
    "token_counts": q_token_counts,
    "doc_quality": q_doc_quality,
    "lang_id": q_lang_id,
    "fingerprint_md5": q_fingerprint_md5,
    "fingerprint_rolling": q_fingerprint_rolling,
    "dedup_exact": q_dedup_exact,
    "dedup_minhash": q_dedup_minhash,
    "doc_winnow_matches": q_doc_winnow_matches,
    "dedup_jaccard": q_dedup_jaccard,
    "dedup_jaccard_lsh": q_dedup_jaccard_lsh,
    "dedup_simhash": q_dedup_simhash,
    "embed_cosine_pairs": q_embed_cosine_pairs,
    "ann_topk": q_ann_topk,
    "ann_ivf": q_ann_ivf,
    "ann_ivf_fixed": q_ann_ivf_fixed,
    "events_window": q_events_window,
    "events_sessionize": q_events_sessionize,
    "events_asof": q_events_asof,
    "events_range_join": q_events_range_join,
    "events_props_json": q_events_props_json,
    "vocab_top_terms": q_vocab_top_terms,
    "events_transitions": q_events_transitions,
    "doc_sample": q_doc_sample,
    "doc_split": q_doc_split,
    "doc_pack_chunks": q_doc_pack_chunks,
    "dedup_cluster": q_dedup_cluster,
    "tfidf_topk": q_tfidf_topk,
    "bm25_topk": q_bm25_topk,
    "dedup_exact_substr": q_dedup_exact_substr,
    "docs_shuffle": q_docs_shuffle,
    "dag_depth_items": q_dag_depth_items,
    "dedup_substr_rewrite": q_dedup_substr_rewrite,
    "onion_paths": q_onion_paths,
    "densest_cliques": q_densest_cliques,
    "events_paths_topk": q_events_paths_topk,
    "doc_cdc_chunks": q_doc_cdc_chunks,
    "events_graph_diff": q_events_graph_diff,
    "inverted_postings": q_inverted_postings,
    "phrase_search": q_phrase_search,
    "snippet_windows": q_snippet_windows,
    "ego_density_co": q_ego_density_co,
    "participation_co": q_participation_co,
    "partition_edgecut_co": q_partition_edgecut_co,
    "events_window_hll": q_events_window_hll,
    "bfs_locality_co": q_bfs_locality_co,
    "scc_items": q_scc_items,
    "bowtie_items": q_bowtie_items,
    "effective_diameter_items": q_effective_diameter_items,
    "events_window_sliding": q_events_window_sliding,
    "events_quantiles": q_events_quantiles,
    "random_walks": q_random_walks,
    "node2vec_walks": q_node2vec_walks,
    "distinct_parts_per_supplier": q_distinct_parts_per_supplier,
    "hll_parts_per_supplier": q_hll_parts_per_supplier,
    "bloom_seen_parts": q_bloom_seen_parts,
    "top_orders_per_cust": q_top_orders_per_cust,
    "closeness_co": q_closeness_co,
    "orders_rollup": q_orders_rollup,
    "cust_no_finished_order": q_cust_no_finished_order,
    "cust_order_counts": q_cust_order_counts,
    "events_quantiles_approx": q_events_quantiles_approx,
    "spath_counts_co": q_spath_counts_co,
    "betweenness_co": q_betweenness_co,
    "betweenness_paths": q_betweenness_paths,
    "coloring_cliques": q_coloring_cliques,
    "docs_pivot_lang": q_docs_pivot_lang,
    "users_click_no_signup": q_users_click_no_signup,
    "bigram_topk": q_bigram_topk,
    "eccentricity_co": q_eccentricity_co,
    "events_funnel": q_events_funnel,
    "mis_co": q_mis_co,
    "cohort_retention": q_cohort_retention,
    "coloring_co": q_coloring_co,
    "ktruss_co": q_ktruss_co,
    "modularity_terms_co": q_modularity_terms_co,
    "media_decode": q_media_decode,
    "media_decode_real": q_media_decode_real,
    "media_ann": q_media_ann,
    "media_frame_sample": q_media_frame_sample,
    "orders_percent_rank": q_orders_percent_rank,
    "events_moving_avg": q_events_moving_avg,
    "embed_centroids": q_embed_centroids,
    "doc_sample_stratified": q_doc_sample_stratified,
    "docs_normalize": q_docs_normalize,
    "doc_pii_scrub": q_doc_pii_scrub,
    "doc_repetition": q_doc_repetition,
    "doc_entropy": q_doc_entropy,
    "contamination": q_contamination,
    "contamination_bloom": q_contamination_bloom,
    "price_histogram": q_price_histogram,
    "profile_lineitem": q_profile_lineitem,
    "conductance_co": q_conductance_co,
    "events_cumsum": q_events_cumsum,
    "orders_cube": q_orders_cube,
    "orders_above_cust_avg": q_orders_above_cust_avg,
    "harmonic_co": q_harmonic_co,
    "two_hop_co": q_two_hop_co,
    "edges_sample_co": q_edges_sample_co,
    "orders_ntile": q_orders_ntile,
    "doc_fuzzy_pairs": q_doc_fuzzy_pairs,
    "users_click_and_signup": q_users_click_and_signup,
    "users_customers_outer": q_users_customers_outer,
    "community_graph_cliques": q_community_graph_cliques,
    "bipartite_projection_ps": q_bipartite_projection_ps,
    "doc_blocklist": q_doc_blocklist,
    "events_window_streaming": q_events_window_streaming,
    "events_median_cont": q_events_median_cont,
    "cms_user_counts": q_cms_user_counts,
    "walk_skipgrams": q_walk_skipgrams,
    "edge_jaccard_co": q_edge_jaccard_co,
    "feature_prop": q_feature_prop,
    "rich_club_co": q_rich_club_co,
    "dedup_delta": q_dedup_delta,
    "knn_label_predict": q_knn_label_predict,
    "avg_neighbor_degree_co": q_avg_neighbor_degree_co,
    "pagerank_decayed_co": q_pagerank_decayed_co,
    "bigram_pmi": q_bigram_pmi,
    "audience_overlap": q_audience_overlap,
    "doc_segment_dedup": q_doc_segment_dedup,
    "embed_quantize": q_embed_quantize,
    "dedup_provenance": q_dedup_provenance,
    "lang_confusion": q_lang_confusion,
    "source_similarity": q_source_similarity,
    "k_anonymity": q_k_anonymity,
    "events_drift": q_events_drift,
    "link_negatives": q_link_negatives,
    "orders_pps_sample": q_orders_pps_sample,
    "orders_aes_sample": q_orders_aes_sample,
    "wl_drift_co": q_wl_drift_co,
    "graph_sparsify_co": q_graph_sparsify_co,
    "rrf_centrality_co": q_rrf_centrality_co,
    "ann_ivfpq": q_ann_ivfpq,
    "dedup_ppjoin": q_dedup_ppjoin,
    "knn_eval": q_knn_eval,
    "bpe_merge_candidates": q_bpe_merge_candidates,
    "spearman_centrality_co": q_spearman_centrality_co,
    "price_equidepth": q_price_equidepth,
    "embed_components": q_embed_components,
    "revenue_by_nation": q_revenue_by_nation,
    "brand_graph_co": q_brand_graph_co,
    "brand_pagerank": q_brand_pagerank,
    "partition_compare": q_partition_compare,
    "pages_temporal": q_pages_temporal,
    "pages_temporal_cliques": q_pages_temporal_cliques,
    "anchor_terms_cliques": q_anchor_terms_cliques,
    "url_canonical_planted": q_url_canonical_planted,
    "redirect_resolve_planted": q_redirect_resolve_planted,
    "cocitation_items": q_cocitation_items,
    "bibcoupling_items": q_bibcoupling_items,
    "butterflies_ps": q_butterflies_ps,
    "semdedup": q_semdedup,
    "kmeans_fixed": q_kmeans_fixed,
    "dedup_containment": q_dedup_containment,
    "k4_cliques_co": q_k4_cliques_co,
    "doc_novelty": q_doc_novelty,
    "doc_strip_boilerplate": q_doc_strip_boilerplate,
    "constraint_co": q_constraint_co,
    "doc_boilerplate": q_doc_boilerplate,
    "doc_lm_xent": q_doc_lm_xent,
    "nb_lang_classify": q_nb_lang_classify,
    "doc_lm_xent2": q_doc_lm_xent2,
    "embed_pca": q_embed_pca,
    "embed_detop": q_embed_detop,
    "source_quality_gate": q_source_quality_gate,
    "embed_rp": q_embed_rp,
    "bpe_train_apply": q_bpe_train_apply,
    "hyperanf_co": q_hyperanf_co,
    "sbm_leiden_recovery": q_sbm_leiden_recovery,
    "sbm_edges_planted": q_sbm_edges_planted,
    "harmonic_hyperball_co": q_harmonic_hyperball_co,
    "closeness_hyperball_co": q_closeness_hyperball_co,
    "sumdist_hyperball_paths": q_sumdist_hyperball_paths,
    "ann_recall": q_ann_recall,
    "doc_gopher_repetition": q_doc_gopher_repetition,
    "triangles_sampled_co": q_triangles_sampled_co,
    "harmonic_hyperball_cliques": q_harmonic_hyperball_cliques,
    "hyperanf_cliques": q_hyperanf_cliques,
    "source_mix_weights": q_source_mix_weights,
    "dedup_keep_best": q_dedup_keep_best,
    "ann_hard_negatives": q_ann_hard_negatives,
    "transitivity_global_co": q_transitivity_global_co,
    "edge_dice_co": q_edge_dice_co,
    "graph_summary_co": q_graph_summary_co,
    "dyad_census_co": q_dyad_census_co,
    "ppr_local_cliques": q_ppr_local_cliques,
    "ppr_local_co": q_ppr_local_co,
    "edges_warc_cliques": q_edges_warc_cliques,
    "matching_co": q_matching_co,
    "dsir_select": q_dsir_select,
    "doc_gopher_rules": q_doc_gopher_rules,
    "ann_pq": q_ann_pq,
    "triad_census_co": q_triad_census_co,
    "assortativity_nominal_co": q_assortativity_nominal_co,
    "crossing_brand_co": q_crossing_brand_co,
    "events_sample_per_user": q_events_sample_per_user,
}

ORACLE_SQL = {
    "pricing_summary": SQL_PRICING,
    "edges_ps": SQL_EDGES_PS,
    "edges_co": SQL_EDGES_CO,
    "degree_ps": SQL_DEGREE_PS,
    "degree_distribution_ps": SQL_DEGREE_DISTRIBUTION_PS,
    "top_parts_by_strength": SQL_TOP_PARTS_BY_STRENGTH,
    "cc_ps": SQL_CC_PS,
    "cc_sizes_ps": SQL_CC_SIZES_PS,
    "pagerank_co": SQL_PAGERANK_CO,
    "pagerank_shardout_co": SQL_PAGERANK_CO,
    "pagerank_ps": SQL_PAGERANK_PS,
    "pagerank_warm_co": SQL_PAGERANK_WARM_CO,
    "cc_incremental_ps": SQL_CC_INCREMENTAL_PS,
    "label_propagation_co": SQL_LABEL_PROPAGATION_CO,
    "label_propagation_seeded_co": SQL_LABEL_PROPAGATION_SEEDED_CO,
    "bfs_dist_co": SQL_BFS_DIST_CO,
    "sssp_co": SQL_SSSP_CO,
    "pagerank_personalized_co": SQL_PAGERANK_PERSONALIZED_CO,
    "spam_mass_co": SQL_SPAM_MASS_CO,
    "ppr_batch_co": SQL_PPR_BATCH_CO,
    "diameter_sweep_co": SQL_DIAMETER_SWEEP_CO,
    "kcore_co": SQL_KCORE_CO,
    "hits_ps": SQL_HITS_PS,
    "salsa_ps": SQL_SALSA_PS,
    "katz_co": SQL_KATZ_CO,
    "eigencentrality_co": SQL_EIGENCENTRALITY_CO,
    "wl_colors_co": SQL_WL_COLORS_CO,
    "reciprocity_co": SQL_RECIPROCITY_CO,
    "coreness_co": SQL_CORENESS_CO,
    "clustering_coeff_co": SQL_CLUSTERING_COEFF_CO,
    "link_predict_co": SQL_LINK_PREDICT_CO,
    "neighbor_sample_co": SQL_NEIGHBOR_SAMPLE_CO,
    "assortativity_co": SQL_ASSORTATIVITY_CO,
    "leiden_cpm_cliques": SQL_LEIDEN_NATIONS,
    "leiden_warm_cliques": SQL_LEIDEN_NATIONS,
    "leiden_negweight_bipartite": SQL_LEIDEN_NEGWEIGHT_BIPARTITE,
    "leiden_bipartite_cliques": SQL_LEIDEN_BIPARTITE_NATIONS,
    "pages_temporal_cliques": SQL_PAGES_TEMPORAL_CLIQUES,
    "anchor_terms_cliques": SQL_ANCHOR_TERMS_CLIQUES,
    "url_canonical_planted": SQL_URL_CANONICAL_PLANTED,
    "redirect_resolve_planted": SQL_REDIRECT_RESOLVE_PLANTED,
    "leiden_modularity_cliques": SQL_LEIDEN_NATIONS,
    "leiden_cpm_stars": SQL_LEIDEN_NATIONS,
    "leiden_surprise_cliques": SQL_LEIDEN_NATIONS,
    "leiden_significance_cliques": SQL_LEIDEN_NATIONS,
    "leiden_rbconfig_cliques": SQL_LEIDEN_NATIONS,
    "leiden_rber_cliques": SQL_LEIDEN_NATIONS,
    "leiden_temporal_cliques": SQL_LEIDEN_TEMPORAL,
    "resolution_profile_cliques": SQL_RESOLUTION_PROFILE_CLIQUES,
    "resolution_profile_dataset_cliques": SQL_RESOLUTION_PROFILE_CLIQUES,
    "leiden_multiplex_cliques": SQL_LEIDEN_NATIONS,
    "leiden_multiplex_dataset_cliques": SQL_LEIDEN_NATIONS,
    "leiden_temporal_dataset_cliques": SQL_LEIDEN_TEMPORAL,
    "leiden_fixed_cliques": SQL_LEIDEN_FIXED,
    "leiden_recrawl_cliques": SQL_LEIDEN_FIXED,
    "leiden_minsize_complete": SQL_LEIDEN_MINSIZE,
    "leiden_randcomm_complete": SQL_LEIDEN_RANDCOMM,
    "mst_cliques": SQL_MST_CLIQUES,
    "mst_paths": SQL_MST_PATHS,
    "degree_powerlaw_co": SQL_DEGREE_POWERLAW_CO,
    "docs_funnel": SQL_DOCS_FUNNEL,
    "textrank_keywords": SQL_TEXTRANK_KEYWORDS,
    "percolation_co": SQL_PERCOLATION_CO,
    "hitting_time_co": SQL_HITTING_TIME_CO,
    "heavy_hitter_users": SQL_HEAVY_HITTER_USERS,
    "triangles_co": SQL_TRIANGLES_CO,
    "triangles_co_per_vertex": SQL_TRIANGLES_CO_PV,
    "token_counts": SQL_TOKEN_COUNTS,
    "doc_quality": SQL_DOC_QUALITY,
    "lang_id": SQL_LANG_ID,
    "fingerprint_md5": SQL_FINGERPRINT_MD5,
    "fingerprint_rolling": SQL_FINGERPRINT_ROLLING,
    "dedup_exact": SQL_DEDUP_EXACT,
    "dedup_jaccard": SQL_DEDUP_JACCARD,
    "dedup_jaccard_lsh": SQL_DEDUP_JACCARD_LSH,
    "dedup_minhash": SQL_DEDUP_MINHASH,
    "doc_winnow_matches": SQL_DOC_WINNOW_MATCHES,
    "dedup_simhash": SQL_DEDUP_SIMHASH,
    "embed_cosine_pairs": SQL_EMBED_COSINE_PAIRS,
    "ann_topk": SQL_ANN_TOPK,
    "ann_ivf_fixed": SQL_ANN_IVF_FIXED,
    "events_window": SQL_EVENTS_WINDOW,
    "events_sessionize": SQL_EVENTS_SESSIONIZE,
    "events_asof": SQL_EVENTS_ASOF,
    "events_range_join": SQL_EVENTS_RANGE_JOIN,
    "events_props_json": SQL_EVENTS_PROPS_JSON,
    "vocab_top_terms": SQL_VOCAB_TOP_TERMS,
    "events_transitions": SQL_EVENTS_TRANSITIONS,
    "doc_sample": SQL_DOC_SAMPLE,
    "doc_split": SQL_DOC_SPLIT,
    "doc_pack_chunks": SQL_DOC_PACK_CHUNKS,
    "dedup_cluster": SQL_DEDUP_CLUSTER,
    "tfidf_topk": SQL_TFIDF_TOPK,
    "bm25_topk": SQL_BM25_TOPK,
    "dedup_exact_substr": SQL_DEDUP_EXACT_SUBSTR,
    "docs_shuffle": SQL_DOCS_SHUFFLE,
    "dag_depth_items": SQL_DAG_DEPTH_ITEMS,
    "dedup_substr_rewrite": SQL_DEDUP_SUBSTR_REWRITE,
    "onion_paths": SQL_ONION_PATHS,
    "densest_cliques": SQL_DENSEST_CLIQUES,
    "events_paths_topk": SQL_EVENTS_PATHS_TOPK,
    "doc_cdc_chunks": _sql_doc_cdc_chunks(),
    "events_graph_diff": SQL_EVENTS_GRAPH_DIFF,
    "inverted_postings": SQL_INVERTED_POSTINGS,
    "phrase_search": SQL_PHRASE_SEARCH,
    "snippet_windows": SQL_SNIPPET_WINDOWS,
    "ego_density_co": SQL_EGO_DENSITY_CO,
    "participation_co": SQL_PARTICIPATION_CO,
    "partition_edgecut_co": SQL_PARTITION_EDGECUT_CO,
    "events_window_hll": SQL_EVENTS_WINDOW_HLL,
    "bfs_locality_co": SQL_BFS_LOCALITY_CO,
    "scc_items": SQL_SCC_ITEMS,
    "bowtie_items": SQL_BOWTIE_ITEMS,
    "effective_diameter_items": SQL_EFFECTIVE_DIAMETER_ITEMS,
    "events_window_sliding": SQL_EVENTS_WINDOW_SLIDING,
    "events_quantiles": SQL_EVENTS_QUANTILES,
    "random_walks": SQL_RANDOM_WALKS,
    "node2vec_walks": SQL_NODE2VEC_WALKS,
    "distinct_parts_per_supplier": SQL_DISTINCT_PARTS_PER_SUPPLIER,
    "hll_parts_per_supplier": SQL_HLL_PARTS_PER_SUPPLIER,
    "bloom_seen_parts": SQL_BLOOM_SEEN_PARTS,
    "top_orders_per_cust": SQL_TOP_ORDERS_PER_CUST,
    "closeness_co": SQL_CLOSENESS_CO,
    "orders_rollup": SQL_ORDERS_ROLLUP,
    "cust_no_finished_order": SQL_CUST_NO_FINISHED_ORDER,
    "cust_order_counts": SQL_CUST_ORDER_COUNTS,
    "events_quantiles_approx": SQL_EVENTS_QUANTILES_APPROX,
    "spath_counts_co": SQL_SPATH_COUNTS_CO,
    "docs_pivot_lang": SQL_DOCS_PIVOT_LANG,
    "users_click_no_signup": SQL_USERS_CLICK_NO_SIGNUP,
    "bigram_topk": SQL_BIGRAM_TOPK,
    "eccentricity_co": SQL_ECCENTRICITY_CO,
    "events_funnel": SQL_EVENTS_FUNNEL,
    "mis_co": SQL_MIS_CO,
    "betweenness_paths": SQL_BETWEENNESS_PATHS,
    "coloring_cliques": SQL_COLORING_CLIQUES,
    "cohort_retention": SQL_COHORT_RETENTION,
    "ktruss_co": SQL_KTRUSS_CO,
    "modularity_terms_co": SQL_MODULARITY_TERMS_CO,
    "media_decode": SQL_MEDIA_DECODE,
    "media_decode_real": SQL_MEDIA_DECODE_REAL,
    "media_ann": SQL_MEDIA_ANN,
    "media_frame_sample": SQL_MEDIA_FRAME_SAMPLE,
    "orders_percent_rank": SQL_ORDERS_PERCENT_RANK,
    "events_moving_avg": SQL_EVENTS_MOVING_AVG,
    "embed_centroids": SQL_EMBED_CENTROIDS,
    "doc_sample_stratified": SQL_DOC_SAMPLE_STRATIFIED,
    "docs_normalize": SQL_DOCS_NORMALIZE,
    "doc_pii_scrub": SQL_DOC_PII_SCRUB,
    "doc_repetition": SQL_DOC_REPETITION,
    "doc_entropy": SQL_DOC_ENTROPY,
    "contamination": SQL_CONTAMINATION,
    "contamination_bloom": SQL_CONTAMINATION,
    "price_histogram": SQL_PRICE_HISTOGRAM,
    "profile_lineitem": SQL_PROFILE_LINEITEM,
    "conductance_co": SQL_CONDUCTANCE_CO,
    "events_cumsum": SQL_EVENTS_CUMSUM,
    "orders_cube": SQL_ORDERS_CUBE,
    "orders_above_cust_avg": SQL_ORDERS_ABOVE_CUST_AVG,
    "harmonic_co": SQL_HARMONIC_CO,
    "two_hop_co": SQL_TWO_HOP_CO,
    "edges_sample_co": SQL_EDGES_SAMPLE_CO,
    "orders_ntile": SQL_ORDERS_NTILE,
    "doc_fuzzy_pairs": SQL_DOC_FUZZY_PAIRS,
    "users_click_and_signup": SQL_USERS_CLICK_AND_SIGNUP,
    "users_customers_outer": SQL_USERS_CUSTOMERS_OUTER,
    "community_graph_cliques": SQL_COMMUNITY_GRAPH_CLIQUES,
    "bipartite_projection_ps": SQL_BIPARTITE_PROJECTION_PS,
    "doc_blocklist": SQL_DOC_BLOCKLIST,
    "events_window_streaming": SQL_EVENTS_WINDOW,
    "events_median_cont": SQL_EVENTS_MEDIAN_CONT,
    "cms_user_counts": SQL_CMS_USER_COUNTS,
    "walk_skipgrams": SQL_WALK_SKIPGRAMS,
    "edge_jaccard_co": SQL_EDGE_JACCARD_CO,
    "feature_prop": SQL_FEATURE_PROP,
    "rich_club_co": SQL_RICH_CLUB_CO,
    "dedup_delta": SQL_DEDUP_DELTA,
    "knn_label_predict": SQL_KNN_LABEL_PREDICT,
    "avg_neighbor_degree_co": SQL_AVG_NEIGHBOR_DEGREE_CO,
    "pagerank_decayed_co": SQL_PAGERANK_DECAYED_CO,
    "bigram_pmi": SQL_BIGRAM_PMI,
    "audience_overlap": SQL_AUDIENCE_OVERLAP,
    "doc_segment_dedup": SQL_DOC_SEGMENT_DEDUP,
    "embed_quantize": SQL_EMBED_QUANTIZE,
    "dedup_provenance": SQL_DEDUP_PROVENANCE,
    "lang_confusion": SQL_LANG_CONFUSION,
    "source_similarity": SQL_SOURCE_SIMILARITY,
    "k_anonymity": SQL_K_ANONYMITY,
    "events_drift": SQL_EVENTS_DRIFT,
    "link_negatives": SQL_LINK_NEGATIVES,
    "orders_pps_sample": SQL_ORDERS_PPS_SAMPLE,
    "orders_aes_sample": SQL_ORDERS_AES_SAMPLE,
    "wl_drift_co": SQL_WL_DRIFT_CO,
    "graph_sparsify_co": SQL_GRAPH_SPARSIFY_CO,
    "rrf_centrality_co": _sql_rrf(),
    "ann_ivfpq": SQL_ANN_IVFPQ,
    "dedup_ppjoin": SQL_DEDUP_PPJOIN,
    "knn_eval": _sql_knn_eval(),
    "bpe_merge_candidates": SQL_BPE_MERGE_CANDIDATES,
    "spearman_centrality_co": _sql_spearman(),
    "price_equidepth": SQL_PRICE_EQUIDEPTH,
    "embed_components": SQL_EMBED_COMPONENTS,
    "revenue_by_nation": SQL_REVENUE_BY_NATION,
    "brand_graph_co": SQL_BRAND_GRAPH_CO,
    "brand_pagerank": SQL_BRAND_PAGERANK,
    "partition_compare": SQL_PARTITION_COMPARE,
    "cocitation_items": SQL_COCITATION_ITEMS,
    "bibcoupling_items": SQL_BIBCOUPLING_ITEMS,
    "butterflies_ps": SQL_BUTTERFLIES_PS,
    "semdedup": SQL_SEMDEDUP,
    "kmeans_fixed": SQL_KMEANS_FIXED,
    "dedup_containment": SQL_DEDUP_CONTAINMENT,
    "k4_cliques_co": SQL_K4_CLIQUES_CO,
    "doc_novelty": SQL_DOC_NOVELTY,
    "doc_strip_boilerplate": SQL_DOC_STRIP_BOILERPLATE,
    "constraint_co": SQL_CONSTRAINT_CO,
    "doc_boilerplate": SQL_DOC_BOILERPLATE,
    "doc_lm_xent": SQL_DOC_LM_XENT,
    "nb_lang_classify": SQL_NB_LANG_CLASSIFY,
    "doc_lm_xent2": SQL_DOC_LM_XENT2,
    "embed_pca": SQL_EMBED_PCA,
    "embed_detop": SQL_EMBED_DETOP,
    "source_quality_gate": SQL_SOURCE_QUALITY_GATE,
    "embed_rp": SQL_EMBED_RP,
    "hyperanf_cliques": SQL_HYPERANF_CLIQUES,
    "harmonic_hyperball_cliques": SQL_HARMONIC_HYPERBALL_CLIQUES,
    "sumdist_hyperball_paths": SQL_SUMDIST_HYPERBALL_PATHS,
    "sbm_edges_planted": SQL_SBM_EDGES_PLANTED,
    "ann_recall": _sql_ann_recall(),
    "doc_gopher_repetition": SQL_DOC_GOPHER_REPETITION,
    "triangles_sampled_co": SQL_TRIANGLES_SAMPLED_CO,
    "source_mix_weights": SQL_SOURCE_MIX_WEIGHTS,
    "dedup_keep_best": SQL_DEDUP_KEEP_BEST,
    "ann_hard_negatives": SQL_ANN_HARD_NEGATIVES,
    "transitivity_global_co": SQL_TRANSITIVITY_GLOBAL_CO,
    "edge_dice_co": SQL_EDGE_DICE_CO,
    "graph_summary_co": SQL_GRAPH_SUMMARY_CO,
    "dyad_census_co": SQL_DYAD_CENSUS_CO,
    "ppr_local_cliques": SQL_PPR_LOCAL_CLIQUES,
    "edges_warc_cliques": SQL_EDGES_WARC_CLIQUES,
    "matching_co": SQL_MATCHING_CO,
    "dsir_select": SQL_DSIR_SELECT,
    "doc_gopher_rules": SQL_DOC_GOPHER_RULES,
    "ann_pq": SQL_ANN_PQ,
    "triad_census_co": SQL_TRIAD_CENSUS_CO,
    "assortativity_nominal_co": SQL_ASSORT_NOMINAL_CO,
    "crossing_brand_co": SQL_CROSSING_BRAND_CO,
    "events_sample_per_user": SQL_EVENTS_SAMPLE_PER_USER,
}
