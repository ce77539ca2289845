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
    """Flagship pipeline on /root/testdata/sf0.001."""
    _quiet()
    import numpy as np
    import pyarrow as pa

    from leidenalg_ray.pipelines import tpch_graphs as tg
    from leidenalg_ray.pipelines.queries import _compact
    from leidenalg_ray.dist.blocks import DistGraph
    from leidenalg_ray.dist import superstep as ss
    from leidenalg_ray.dist.leiden import DistLeiden

    sf_dir = "/root/testdata/sf0.001"
    a, b, w = tg.co_edge_arrays(sf_dir)
    vids, s, d = _compact(a, b)
    g = DistGraph.from_edges(s, d, weight=w, n=len(vids), P=4,
                             both_directions=True)
    rank, _ = ss.pagerank(g, tol=1e-6, weighted=True)
    comp, _ = ss.connected_components(g)
    dl = DistLeiden(s, d, weight=w, n=len(vids), directed=False,
                    quality="cpm", resolution_parameter=0.5, P=4, seed=42)
    mem, q, info = dl.run()
    return pa.table({
        "vid": pa.array(vids),
        "rank": pa.array(np.round(rank, 6)),
        "component": pa.array(vids[comp]),
        "comm": pa.array(mem.astype(np.int64)),
    })


def queries() -> dict[str, Callable[[str], Any]]:
    _quiet()
    from leidenalg_ray.pipelines.queries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from leidenalg_ray.pipelines.queries import ORACLE_SQL
    return dict(ORACLE_SQL)
