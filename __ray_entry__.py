"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; no
``ray.init`` / ``ray.shutdown`` here or in the library (see repo
verify skill).

- ``entry()``: flagship pipeline on /root/testdata/sf0.001 — build the
  part co-occurrence graph from lineitem, run PageRank + connected
  components + Leiden (CPM) on the distributed substrate, return one
  table (vid, rank, component, comm).
- ``queries()`` / ``oracle_sql()``: the operator catalogue
  (leidenalg_ray.pipelines.queries) — one entry per implemented
  operator from SURVEY.md §2 plus the training-data operators; oracle
  SQL present for every SQL-expressible one.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _quiet():
    import logging
    import ray.data as rd
    rd.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 — fully
    Dataset-native: the co-occurrence edge Dataset spills to
    partitioned parquet and each shard/block actor loads only its own
    partition; the driver never materialises the edge list (the
    at-scale path, SURVEY.md §4.3.1)."""
    _quiet()
    import numpy as np
    import pyarrow as pa

    from leidenalg_ray.pipelines import tpch_graphs as tg
    from leidenalg_ray.dist.blocks import DistGraph
    from leidenalg_ray.dist import superstep as ss
    from leidenalg_ray.dist.leiden import DistLeiden

    sf_dir = "/root/testdata/sf0.001"
    edges = tg.co_edge_rows(sf_dir, num_partitions=4)
    n = tg.part_count(sf_dir)              # p_partkey is 0-based dense

    def sym(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        w = t["weight"].to_numpy(zero_copy_only=False)
        nl = s != d
        return pa.table({
            "src": pa.array(np.concatenate([s, d[nl]])),
            "dst": pa.array(np.concatenate([d, s[nl]])),
            "weight": pa.array(np.concatenate([w, w[nl]])),
        })

    g = DistGraph.from_dataset(
        edges.map_batches(sym, batch_format="pyarrow",
                          zero_copy_batch=True),
        n=n, P=4, dedup=True)
    rank, _ = ss.pagerank(g, tol=1e-6, weighted=True)
    comp, _ = ss.connected_components(g)
    dl = DistLeiden.from_dataset(edges, n=n, directed=False,
                                 quality="cpm",
                                 resolution_parameter=0.5, P=4, seed=42)
    mem, q, info = dl.run()
    vids = dl.active_vids()
    return pa.table({
        "vid": pa.array(vids),
        "rank": pa.array(np.round(rank[vids], 6)),
        "component": pa.array(comp[vids].astype(np.int64)),
        "comm": pa.array(mem[vids].astype(np.int64)),
    })


def queries() -> dict[str, Callable[[str], Any]]:
    _quiet()
    from leidenalg_ray.pipelines.queries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from leidenalg_ray.pipelines.queries import ORACLE_SQL
    return dict(ORACLE_SQL)
