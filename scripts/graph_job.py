"""General graph job — run the BSP kernels on ANY edge-list input.

    python scripts/graph_job.py --edges graph.metis --format metis \
        --out /tmp/gout --kernels pagerank,cc,leiden,anf

Reads edges from CSV / JSONL / SNAP-style text / METIS / partitioned
parquet (``sources/edgelists.py``), builds the hash-partitioned CSR
blocks once (``DistGraph.from_dataset``, partition-local dedup), and
runs the selected kernels with shard-side ``result_out=`` /
``membership_out=`` outputs — the driver never assembles an O(n)
array. The pages-corpus counterpart is ``run_job.py``; this is the
entry point for graphs that arrive as edge files (exports from other
systems, METIS partitioner inputs, SNAP datasets).

Standalone safety: initialises Ray only if no session exists.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def read_edges(paths, fmt):
    from leidenalg_ray.sources import edgelists as el
    if fmt == "csv":
        return el.read_edges_csv(paths)
    if fmt == "jsonl":
        return el.read_edges_jsonl(paths)
    if fmt == "text":
        return el.read_edges_text(paths)
    if fmt == "metis":
        return el.read_edges_metis(paths)
    if fmt == "parquet":
        return el.read_edges_partitioned(paths[0])
    raise ValueError(f"unknown format {fmt!r}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", required=True, nargs="+",
                    help="edge file(s) / partitioned-parquet dir")
    ap.add_argument("--format", required=True,
                    choices=["csv", "jsonl", "text", "metis",
                             "parquet"])
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=None,
                    help="vertex-id space size (default: max id + 1)")
    ap.add_argument("--kernels", default="pagerank,cc",
                    help="comma list of pagerank,cc,leiden,anf")
    ap.add_argument("--quality", default="cpm",
                    choices=["cpm", "modularity"])
    ap.add_argument("--gamma", type=float, default=0.5)
    ap.add_argument("--anf-rounds", type=int, default=8)
    ap.add_argument("--partitions", type=int, default=16)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()
    kernels = [k.strip() for k in args.kernels.split(",") if k.strip()]
    bad = set(kernels) - {"pagerank", "cc", "leiden", "anf"}
    if bad:
        raise SystemExit(f"unknown kernels: {sorted(bad)}")

    import ray
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 num_cpus=args.num_cpus, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    import pyarrow as pa
    import ray.data as rd  # noqa: F401  (readers return Datasets)

    from leidenalg_ray.dist import superstep as ss
    from leidenalg_ray.dist.blocks import DistGraph
    from leidenalg_ray.dist.leiden import DistLeiden

    t0 = time.time()
    edges = read_edges(args.edges, args.format)
    n = args.n
    if n is None:
        mx = edges.map_batches(
            lambda t: pa.table({"m": pa.array(
                [max(int(np.max(t["src"].to_numpy(
                    zero_copy_only=False), initial=-1)),
                    int(np.max(t["dst"].to_numpy(
                        zero_copy_only=False), initial=-1)))],
                pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True).max("m")
        n = int(mx) + 1

    def sym(t: pa.Table) -> pa.Table:
        w = t["weight"] if "weight" in t.column_names else \
            pa.array(np.ones(t.num_rows))
        return pa.table({
            "src": pa.concat_arrays(
                [t["src"].combine_chunks(),
                 t["dst"].combine_chunks()]),
            "dst": pa.concat_arrays(
                [t["dst"].combine_chunks(),
                 t["src"].combine_chunks()]),
            "weight": pa.concat_arrays([
                w.combine_chunks() if hasattr(w, "combine_chunks")
                else w] * 2),
        })

    symmetric = edges.map_batches(sym, batch_format="pyarrow",
                                  zero_copy_batch=True)
    g = DistGraph.from_dataset(symmetric, n=n, P=args.partitions,
                               directed=False, dedup=True)
    t_build = time.time() - t0
    os.makedirs(args.out, exist_ok=True)

    summary = {"n_vertices": int(n), "P": args.partitions,
               "sec_build": round(t_build, 2),
               "kernels": kernels}
    if "pagerank" in kernels:
        t0 = time.time()
        res, iters = ss.pagerank(
            g, tol=1e-6, checkpoint=args.checkpoint,
            result_out=os.path.join(args.out, "pagerank"))
        summary["pagerank"] = {"iters": int(iters),
                               "rows": int(res["rows"]),
                               "sec": round(time.time() - t0, 2)}
    if "cc" in kernels:
        t0 = time.time()
        res, iters = ss.connected_components(
            g, checkpoint=args.checkpoint,
            result_out=os.path.join(args.out, "components"))
        summary["cc"] = {"iters": int(iters),
                         "rows": int(res["rows"]),
                         "sec": round(time.time() - t0, 2)}
    if "anf" in kernels:
        t0 = time.time()
        res, nf_q, rounds = ss.hyperanf(
            g, rounds=args.anf_rounds, checkpoint=args.checkpoint,
            result_out=os.path.join(args.out, "ball_est"))
        thr = -(-9 * int(nf_q[-1]) // 10)
        summary["anf"] = {
            "rounds": int(rounds),
            "nf": [round(int(v) / 1e6, 6) for v in nf_q],
            "effective_diameter_90": int(np.searchsorted(nf_q, thr)),
            "rows": int(res["rows"]),
            "sec": round(time.time() - t0, 2)}
    if "leiden" in kernels:
        t0 = time.time()
        dl = DistLeiden.from_dataset(
            symmetric, n=n, directed=False, quality=args.quality,
            resolution_parameter=args.gamma, P=args.partitions,
            seed=42)
        _, q, info = dl.run(
            checkpoint=args.checkpoint,
            membership_out=os.path.join(args.out, "communities"))
        summary["leiden"] = {
            "quality": float(q),
            "n_communities": info["n_communities"],
            "rows": int(info["membership_rows"]),
            "sec": round(time.time() - t0, 2)}

    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()
