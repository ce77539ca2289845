"""Headline benchmark over $GRAFT_SF_DIR (default /root/testdata/sf0.1).

Prints ONE JSON line:
``{"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "edges_traversed_per_sec": ...}``

``--scaling``: runs the same bench twice in fresh processes at
num_cpus=8 and num_cpus=32 (the sandbox proxy for N vs 4N cluster
nodes — SURVEY.md §4.3.7) and prints throughput at both plus the
scaling efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def run_bench():
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR", log_to_driver=False)
    import logging

    import numpy as np
    import ray.data as rd
    rd.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from leidenalg_ray.pipelines import queries as Q
    from leidenalg_ray.pipelines import tpch_graphs as tg
    from leidenalg_ray.pipelines.queries import _compact
    from leidenalg_ray.dist.blocks import DistGraph
    from leidenalg_ray.dist import superstep as ss

    # warm the page cache so we measure compute + shuffle, not disk
    for t in ("lineitem", "documents", "embeddings", "events"):
        with open(f"{sf_dir}/{t}.parquet", "rb") as f:
            while f.read(1 << 24):
                pass

    times = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn(sf_dir)
        # consume lazily-built results
        if hasattr(out, "count") and not isinstance(out, (int, float)):
            try:
                out.count()
            except AttributeError:
                pass
        times[name] = round(time.time() - t0, 3)
        return out

    timed("pricing_summary", Q.q_pricing_summary)
    timed("edges_co", lambda s: Q.q_edges_co(s).count())

    # graph algorithms share one co-occurrence graph build
    t0 = time.time()
    a, b, w = tg.co_edge_arrays(sf_dir)
    vids, s_, d_ = _compact(a, b)
    times["co_graph_build"] = round(time.time() - t0, 3)
    n = len(vids)
    m_edges = len(a)

    t0 = time.time()
    g = DistGraph.from_edges(s_, d_, weight=w, n=n, P=min(16, max(4, num_cpus // 2)),
                             both_directions=True)
    rank, pr_iters = ss.pagerank(g, damping=0.85, tol=1e-6, weighted=True)
    pr_time = time.time() - t0
    times["pagerank"] = round(pr_time, 3)

    t0 = time.time()
    comp, cc_iters = ss.connected_components(g)
    times["connected_components"] = round(time.time() - t0, 3)

    t0 = time.time()
    lab, lp_iters = ss.label_propagation(g, max_iter=20)
    times["label_propagation"] = round(time.time() - t0, 3)

    timed("leiden_cpm", Q.q_leiden_cpm_co)
    timed("triangles", Q.q_triangles_co)
    timed("token_counts", lambda s: Q.q_token_counts(s).count())
    timed("dedup_minhash", lambda s: Q.q_dedup_minhash(s).count())
    timed("ann_topk", Q.q_ann_topk)
    timed("events_sessionize",
          lambda s: Q.q_events_sessionize(s).count())

    total = round(sum(times.values()), 3)
    # symmetrised edge traversals per superstep for the BSP algorithms
    traversals = 2 * m_edges * (pr_iters + cc_iters + lp_iters)
    bsp_time = (times["pagerank"] + times["connected_components"]
                + times["label_propagation"])
    result = {
        "metric": "headline pipeline wall time (graph build + PageRank "
                  "tol 1e-6 + CC + LP + Leiden CPM + triangles + text "
                  "ops)",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "graph": {"n": int(n), "edges": int(m_edges),
                  "pagerank_iters": int(pr_iters)},
        "edges_traversed_per_sec": int(traversals / max(bsp_time, 1e-9)),
    }
    print(json.dumps(result))
    ray.shutdown()
    return result


def run_scaling():
    def run(ncpu):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, __file__], env=env,
                             capture_output=True, text=True, check=True)
        return json.loads(out.stdout.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo = run(lo)
    r_hi = run(hi)
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    speedup = t_lo / t_hi
    eff = speedup / (hi / lo)
    print(json.dumps({
        "metric": "scaling efficiency (same input, fresh processes, "
                  f"num_cpus={lo} vs {hi})",
        "sec_8": t_lo,
        "sec_32": t_hi,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "edges_traversed_per_sec_8": r_lo["edges_traversed_per_sec"],
        "edges_traversed_per_sec_32": r_hi["edges_traversed_per_sec"],
        "queries_8": r_lo["queries"],
        "queries_32": r_hi["queries"],
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        run_bench()
