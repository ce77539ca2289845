"""BSP superstep engine over partitioned CSR blocks: PageRank,
connected components, label propagation (SURVEY.md §2.8).

Each superstep is: P gather tasks (one per source partition; reads its
block + its vertex-state shard, both partition-local) that pre-aggregate
messages per *destination partition* inside the task, then P reduce
tasks (one per destination partition) that combine incoming message
arrays and produce the next state shard. Message refs flow
worker-to-worker (``num_returns=P``); the driver only orchestrates and
sums tiny per-partition convergence metrics.

This is the explicit form of the reference mapping in SURVEY.md §2.8 —
``map_batches`` gather feeding a ``groupby(dst).sum`` shuffle — with
the shuffle expressed as a deterministic P×P exchange so vertex state
never leaves its partition and supersteps can checkpoint per-partition
(``checkpoint.py``).
"""

from __future__ import annotations

import numpy as np
import ray

from .blocks import DistGraph, part_sizes
from .checkpoint import CheckpointManager


# ----------------------------------------------------------------------
# PageRank
# ----------------------------------------------------------------------
def pagerank(g: DistGraph, damping=0.85, tol=1e-6, max_iter=200,
             weighted=False, checkpoint=None,
             message_dtype=np.float64, active=False, personalize=None,
             init_rank=None, result_out=None):
    """North-rule semantics: rank = (1-d)/n + d*(sum_in rank/outdeg +
    dangling_mass/n); iterate until L1 delta < tol. ``weighted`` uses
    strength-normalised contributions instead of degree.
    ``message_dtype=np.float32`` halves the bytes each superstep ships
    through the object store (messages accumulate partition-locally in
    float64 and downcast only for the exchange; rank state stays
    float64) — for throughput probes and bandwidth-tight clusters, not
    for 1e-6-oracle runs.

    ``active=True``: the vertex set is the vertices with >= 1 edge
    (per-partition masks from the graph itself), so sparse raw id
    spaces — ``DistGraph.from_dataset`` without any driver-side id
    compaction — get the same n/teleport/dangling denominators a
    compacted build would; inactive ids hold rank 0.

    ``personalize``: seed vids — teleport (and dangling
    redistribution) becomes uniform over the seeds (personalized
    PageRank) instead of uniform over the vertex set.

    ``init_rank``: dense length-n warm-start vector (e.g. the ranks
    of the graph before a delta-edge batch landed, or a prior run's
    converged state). Iterating from it is bit-identical to having
    reached that state in-run, so warm-starting a converged vector
    after small graph updates re-converges in a handful of supersteps
    instead of from scratch — the dynamic-recrawl path for a web-scale
    link graph.

    ``result_out=<dir>``: each shard writes its ``(vid, rank)``
    parquet from its worker instead of the driver assembling an O(n)
    array — returns ``({"path", "rows", "column"}, iters)``. The
    at-scale output seam (all superstep kernels share it via
    ``_finish``), mirroring ``DistLeiden.run(membership_out=)``."""
    P, n, sizes = g.P, g.n, g.sizes
    if active:
        act_refs, n_eff = g.active_masks()
    else:
        act_refs, n_eff = [None] * P, n
    if personalize is not None:
        seeds = np.asarray(personalize, dtype=np.int64)
        p_refs = []
        for p in range(P):
            shard = np.zeros(sizes[p])
            sp = seeds[seeds % P == p]
            shard[sp // P] = 1.0 / len(seeds)
            p_refs.append(ray.put(shard))
    else:
        p_refs = [None] * P

    @ray.remote
    def gather(block, rank, norm):
        src_contrib = np.zeros(len(rank))
        nz = norm > 0
        src_contrib[nz] = rank[nz] / norm[nz]
        if weighted:
            per_edge = (src_contrib[block["src_local"]] * block["weight"])
        else:
            per_edge = src_contrib[block["src_local"]]
        off = block["dst_offsets"]
        outs = []
        for q in range(P):
            sl = slice(int(off[q]), int(off[q + 1]))
            arr = np.zeros(sizes[q])
            np.add.at(arr, block["dst_local"][sl], per_edge[sl])
            outs.append(arr.astype(message_dtype, copy=False))
        return outs

    @ray.remote
    def dangling_of(rank, norm, act):
        m = norm <= 0 if act is None else (act & (norm <= 0))
        return float(rank[m].sum())

    @ray.remote
    def reduce(q_size, old, dangling_total, act, pvec, *incoming):
        if pvec is None:
            new = np.full(q_size, (1.0 - damping) / n_eff)
            new += damping * dangling_total / n_eff
        else:
            new = (1.0 - damping + damping * dangling_total) * pvec
        for arr in incoming:
            new += damping * arr
        if act is not None:
            new[~act] = 0.0
        return new, float(np.abs(new - old).sum())

    @ray.remote
    def init_shard(q_size, act, pvec, warm):
        if warm is not None:
            r = warm.astype(np.float64, copy=True)
        elif pvec is None:
            r = np.full(q_size, 1.0 / n_eff)
        else:
            r = pvec.copy()
        if act is not None:
            r[~act] = 0.0
        return r

    if init_rank is not None:
        init_rank = np.asarray(init_rank, dtype=np.float64)
        if len(init_rank) != g.n:
            raise ValueError(
                f"init_rank has length {len(init_rank)}, graph has "
                f"n={g.n}")
        warm_refs = [ray.put(init_rank[p::P]) for p in range(P)]
    else:
        warm_refs = [None] * P
    norm_refs = g.out_strength if weighted else g.out_deg
    rank_refs = [init_shard.remote(sizes[p], act_refs[p], p_refs[p],
                                   warm_refs[p]) for p in range(P)]
    ckpt = CheckpointManager(checkpoint, "pagerank", P, n=n) \
        if checkpoint else None
    start_iter = 0
    it = -1
    if ckpt is not None:
        resumed = ckpt.resume()
        if resumed is not None:
            start_iter, shards, metrics = resumed
            rank_refs = [ray.put(s) for s in shards]
            if metrics.get("l1_delta", np.inf) < tol:
                # the checkpointed run already converged
                return _finish(g, rank_refs, start_iter, result_out,
                               "rank")

    for it in range(start_iter, max_iter):
        msg_refs = [gather.options(num_returns=P).remote(
            g.blocks[p], rank_refs[p], norm_refs[p]) for p in range(P)]
        dang_refs = [dangling_of.remote(rank_refs[p], norm_refs[p],
                                        act_refs[p]) for p in range(P)]
        dangling_total = sum(ray.get(dang_refs))
        outs = []
        for q in range(P):
            outs.append(reduce.options(num_returns=2).remote(
                sizes[q], rank_refs[q], dangling_total, act_refs[q],
                p_refs[q], *[msg_refs[p][q] for p in range(P)]))
        rank_refs = [o[0] for o in outs]
        delta = sum(ray.get([o[1] for o in outs]))
        if ckpt is not None:
            ckpt.save(it + 1, ray.get(rank_refs),
                      metrics={"l1_delta": delta})
        if delta < tol:
            break
    return _finish(g, rank_refs, it + 1, result_out, "rank")


def assemble(g: DistGraph, shard_refs):
    """Shards -> one dense array indexed by global vid."""
    out = np.zeros(g.n, dtype=np.asarray(ray.get(shard_refs[0])).dtype) \
        if g.P else np.zeros(0)
    for p in range(g.P):
        shard = ray.get(shard_refs[p])
        out[p::g.P] = shard
    return out


@ray.remote
def _write_shard_task(shard, p, P, out_dir, column):
    """Write one shard's (vid, value) parquet from the worker.

    Crash-safe + resumable: writes to a tmp name and ``os.replace``s
    into place, and skips a part file that already exists, so a rerun
    after a mid-write crash neither duplicates nor re-does finished
    partitions (a torn write only ever exists under the tmp name)."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"part-{p:05d}.parquet")
    if os.path.exists(path):
        return len(shard)
    shard = np.asarray(shard)
    vids = p + P * np.arange(len(shard), dtype=np.int64)
    tmp = path + f".tmp-{os.getpid()}"
    pq.write_table(pa.table({"vid": pa.array(vids),
                             column: pa.array(shard)}), tmp)
    os.replace(tmp, path)
    return len(shard)


def write_shard_results(g: DistGraph, shard_refs, out_dir, column):
    """Shard-side partitioned parquet output — the o(n)-driver seam.

    Each shard writes its own ``part-{p:05d}.parquet`` with columns
    ``(vid, <column>)`` directly from a worker task (the shard ref
    never moves through the driver), mirroring
    ``DistLeiden.run(membership_out=)``. Returns total rows written.
    At 10^10 vertices the driver holds P object refs and P ints —
    never an O(n) array.

    Resume is IDENTITY-CHECKED: a ``_RESULT_MANIFEST.json`` recording
    (n, P, column) is written before the shard tasks launch; existing
    part files are skipped only when the manifest matches — a dir
    left by a different graph size, partition count or kernel is
    cleared instead of silently reused (the same stale-output rule as
    the temporal spill's ``_SPILL_DONE``)."""
    import json
    import os
    manifest = os.path.join(out_dir, "_RESULT_MANIFEST.json")
    expect = {"n": int(g.n), "P": int(g.P), "column": column}
    if os.path.isdir(out_dir):
        ok = False
        if os.path.exists(manifest):
            try:
                with open(manifest) as f:
                    ok = json.load(f) == expect
            except (ValueError, OSError):
                ok = False
        if not ok:
            for f in os.listdir(out_dir):
                if f.startswith("part-") \
                        or f == "_RESULT_MANIFEST.json":
                    os.remove(os.path.join(out_dir, f))
    os.makedirs(out_dir, exist_ok=True)
    if not os.path.exists(manifest):
        tmp = manifest + f".tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(expect, f)
        os.replace(tmp, manifest)
    rows = ray.get([_write_shard_task.remote(
        shard_refs[p], p, g.P, out_dir, column) for p in range(g.P)])
    return int(sum(rows))


def _finish(g: DistGraph, shard_refs, iters, result_out, column):
    """Common kernel epilogue: assemble on the driver (the in-memory
    tier / oracle path), or — when ``result_out`` is a directory —
    write per-shard parquet from the workers and hand back only
    ``{"path", "rows", "column"}`` (the at-scale path; driver state
    stays o(n))."""
    if result_out is None:
        return assemble(g, shard_refs), iters
    rows = write_shard_results(g, shard_refs, result_out, column)
    return {"path": result_out, "rows": rows, "column": column}, iters


# ----------------------------------------------------------------------
# Connected components (weak): min-label propagation to fixed point
# ----------------------------------------------------------------------
def connected_components(g: DistGraph, max_iter=10_000, checkpoint=None,
                         init_labels=None, result_out=None):
    """Exact membership; graph blocks must contain both edge
    directions (``from_edges(..., both_directions=True)``).

    ``init_labels``: dense length-n warm-start labels — incremental
    recompute after edge insertions. Min-label propagation started
    from any labelling where ``label[v]`` is a vid in ``v``'s
    component (e.g. the pre-delta component minima; identity for new
    vertices) converges to the same fixed point as the identity init
    — the component minimum — but only the regions bridged by the new
    edges move, so re-convergence takes ~diameter-of-change
    supersteps, not diameter-of-graph."""
    P, n, sizes = g.P, g.n, g.sizes
    BIG = np.iinfo(np.int64).max

    @ray.remote
    def gather(block, label):
        per_edge = label[block["src_local"]]
        off = block["dst_offsets"]
        outs = []
        for q in range(P):
            sl = slice(int(off[q]), int(off[q + 1]))
            arr = np.full(sizes[q], BIG, dtype=np.int64)
            np.minimum.at(arr, block["dst_local"][sl], per_edge[sl])
            outs.append(arr)
        return outs

    @ray.remote
    def reduce(old, *incoming):
        new = old.copy()
        for arr in incoming:
            np.minimum(new, arr, out=new)
        return new, int((new != old).sum())

    if init_labels is not None:
        init_labels = np.asarray(init_labels, dtype=np.int64)
        if len(init_labels) != g.n:
            raise ValueError(
                f"init_labels has length {len(init_labels)}, graph has "
                f"n={g.n}")
        label_refs = [ray.put(init_labels[p::P].copy())
                      for p in range(P)]
    else:
        label_refs = [ray.put(np.arange(p, n, P, dtype=np.int64))
                      for p in range(P)]
    ckpt = CheckpointManager(checkpoint, "cc", P, n=n) \
        if checkpoint else None
    start_iter = 0
    if ckpt is not None:
        resumed = ckpt.resume()
        if resumed is not None:
            start_iter, shards, metrics = resumed
            label_refs = [ray.put(s) for s in shards]
            if metrics.get("changed", -1) == 0:
                return _finish(g, label_refs, start_iter, result_out,
                               "component")
    it = start_iter
    for it in range(start_iter, max_iter):
        msg_refs = [gather.options(num_returns=P).remote(
            g.blocks[p], label_refs[p]) for p in range(P)]
        outs = [reduce.options(num_returns=2).remote(
            label_refs[q], *[msg_refs[p][q] for p in range(P)])
            for q in range(P)]
        label_refs = [o[0] for o in outs]
        changed = sum(ray.get([o[1] for o in outs]))
        if ckpt is not None:
            ckpt.save(it + 1, ray.get(label_refs),
                      metrics={"changed": changed})
        if changed == 0:
            break
    return _finish(g, label_refs, it + 1, result_out, "component")


# ----------------------------------------------------------------------
# BFS distances: frontier min-distance propagation from seed vertices
# ----------------------------------------------------------------------
def bfs_distances(g: DistGraph, sources, max_iter=10_000,
                  checkpoint=None, result_out=None):
    """Unweighted hop distance from ``sources`` to every reachable
    vertex; unreachable vertices hold ``INF`` (int64 max). Same
    superstep shape as connected components (min-combine), so it
    inherits the scale properties: per-block pre-aggregation by
    destination partition, worker-to-worker message refs, the driver
    only sums per-partition change counts. Blocks must hold both
    directions for undirected semantics."""
    P, n, sizes = g.P, g.n, g.sizes
    INF = np.iinfo(np.int64).max

    @ray.remote
    def gather(block, dist):
        # dist+1 per edge; saturating so INF stays INF
        d = dist[block["src_local"]]
        per_edge = np.where(d == INF, INF, d + 1)
        off = block["dst_offsets"]
        outs = []
        for q in range(P):
            sl = slice(int(off[q]), int(off[q + 1]))
            arr = np.full(sizes[q], INF, dtype=np.int64)
            np.minimum.at(arr, block["dst_local"][sl], per_edge[sl])
            outs.append(arr)
        return outs

    @ray.remote
    def reduce(old, *incoming):
        new = old.copy()
        for arr in incoming:
            np.minimum(new, arr, out=new)
        return new, int((new != old).sum())

    sources = np.asarray(sources, dtype=np.int64)
    dist_refs = []
    for p in range(P):
        shard = np.full(sizes[p], INF, dtype=np.int64)
        sp = sources[sources % P == p]
        shard[sp // P] = 0
        dist_refs.append(ray.put(shard))
    ckpt = CheckpointManager(checkpoint, "bfs", P, n=n) \
        if checkpoint else None
    start_iter = 0
    if ckpt is not None:
        resumed = ckpt.resume()
        if resumed is not None:
            start_iter, shards, metrics = resumed
            dist_refs = [ray.put(s) for s in shards]
            if metrics.get("changed", -1) == 0:
                return _finish(g, dist_refs, start_iter, result_out,
                               "dist")
    it = start_iter
    for it in range(start_iter, max_iter):
        msg_refs = [gather.options(num_returns=P).remote(
            g.blocks[p], dist_refs[p]) for p in range(P)]
        outs = [reduce.options(num_returns=2).remote(
            dist_refs[q], *[msg_refs[p][q] for p in range(P)])
            for q in range(P)]
        dist_refs = [o[0] for o in outs]
        changed = sum(ray.get([o[1] for o in outs]))
        if ckpt is not None:
            ckpt.save(it + 1, ray.get(dist_refs),
                      metrics={"changed": changed})
        if changed == 0:
            break
    return _finish(g, dist_refs, it + 1, result_out, "dist")


# ----------------------------------------------------------------------
# Weighted SSSP: Bellman-Ford min-plus relaxation to fixed point
# ----------------------------------------------------------------------
def sssp(g: DistGraph, sources, max_iter=10_000, checkpoint=None,
         result_out=None):
    """Weighted shortest distances from ``sources`` (min-plus
    relaxation per superstep — the BSP Bellman-Ford); unreachable
    vertices hold ``inf``. Same exchange shape as ``bfs_distances``
    with ``dist[src] + weight`` as the per-edge message; weights must
    be non-negative. Blocks must hold both directions for undirected
    semantics."""
    P, n, sizes = g.P, g.n, g.sizes

    @ray.remote
    def gather(block, dist):
        per_edge = dist[block["src_local"]] + block["weight"]
        off = block["dst_offsets"]
        outs = []
        for q in range(P):
            sl = slice(int(off[q]), int(off[q + 1]))
            arr = np.full(sizes[q], np.inf)
            np.minimum.at(arr, block["dst_local"][sl], per_edge[sl])
            outs.append(arr)
        return outs

    @ray.remote
    def reduce(old, *incoming):
        new = old.copy()
        for arr in incoming:
            np.minimum(new, arr, out=new)
        return new, int((new != old).sum())

    sources = np.asarray(sources, dtype=np.int64)
    dist_refs = []
    for p in range(P):
        shard = np.full(sizes[p], np.inf)
        sp = sources[sources % P == p]
        shard[sp // P] = 0.0
        dist_refs.append(ray.put(shard))
    ckpt = CheckpointManager(checkpoint, "sssp", P, n=n) \
        if checkpoint else None
    start_iter = 0
    if ckpt is not None:
        resumed = ckpt.resume()
        if resumed is not None:
            start_iter, shards, metrics = resumed
            dist_refs = [ray.put(s) for s in shards]
            if metrics.get("changed", -1) == 0:
                return _finish(g, dist_refs, start_iter, result_out,
                               "dist")
    it = start_iter
    for it in range(start_iter, max_iter):
        msg_refs = [gather.options(num_returns=P).remote(
            g.blocks[p], dist_refs[p]) for p in range(P)]
        outs = [reduce.options(num_returns=2).remote(
            dist_refs[q], *[msg_refs[p][q] for p in range(P)])
            for q in range(P)]
        dist_refs = [o[0] for o in outs]
        changed = sum(ray.get([o[1] for o in outs]))
        if ckpt is not None:
            ckpt.save(it + 1, ray.get(dist_refs),
                      metrics={"changed": changed})
        if changed == 0:
            break
    return _finish(g, dist_refs, it + 1, result_out, "dist")


# ----------------------------------------------------------------------
# Onion decomposition: layered peel refining the k-core decomposition
# ----------------------------------------------------------------------
def onion_layers(g: DistGraph, max_iter=10_000, result_out=None):
    """Onion decomposition (Hébert-Dufresne, Grochow & Allard 2016):
    each round removes EVERY alive vertex whose remaining degree is
    <= the running core value, where core = max(core, min remaining
    degree) — so ``layer(v)`` (1-based removal round) refines the
    k-core decomposition and ``coreness(v)`` is the core value at
    removal. Deterministic: rounds remove whole degree classes, no
    tie-breaking. Blocks must hold BOTH directions.

    Shard state is (alive, layer, core) per partition; each round is
    one degree gather (the kcore exchange) + an O(P) driver min +
    a shard-local peel — the driver never holds an O(n) array on the
    ``result_out`` path (layer under ``<dir>/layer``, coreness under
    ``<dir>/coreness``). Inactive vertices (no edges) keep layer 0.

    Returns ((layers, coreness), rounds) — or ({"layer": {...},
    "coreness": {...}}, rounds) with ``result_out``."""
    import os

    P, n, sizes = g.P, g.n, g.sizes
    BIG = np.iinfo(np.int64).max

    @ray.remote
    def gather(block, alive):
        per_edge = alive[block["src_local"]].astype(np.int64)
        off = block["dst_offsets"]
        outs = []
        for q in range(P):
            sl = slice(int(off[q]), int(off[q + 1]))
            arr = np.zeros(sizes[q], dtype=np.int64)
            np.add.at(arr, block["dst_local"][sl], per_edge[sl])
            outs.append(arr)
        return outs

    @ray.remote
    def local_min(alive, *incoming):
        deg = incoming[0].copy()
        for arr in incoming[1:]:
            deg += arr
        m = int(deg[alive].min()) if alive.any() else BIG
        return deg, m

    @ray.remote
    def peel(alive, layer, core, deg, k, rnd):
        rm = alive & (deg <= k)
        layer = layer.copy()
        core_out = core.copy()
        layer[rm] = rnd
        core_out[rm] = k
        alive = alive & ~rm
        return alive, layer, core_out, int(alive.sum())

    act_refs, _ = g.active_masks()
    alive_refs = [ray.put(np.asarray(ray.get(act_refs[p])).copy())
                  for p in range(P)]
    layer_refs = [ray.put(np.zeros(sizes[p], np.int64))
                  for p in range(P)]
    core_refs = [ray.put(np.zeros(sizes[p], np.int64))
                 for p in range(P)]
    core_k = 0
    rounds = 0
    for rnd in range(1, max_iter + 1):
        msg_refs = [gather.options(num_returns=P).remote(
            g.blocks[p], alive_refs[p]) for p in range(P)]
        dm = [local_min.options(num_returns=2).remote(
            alive_refs[q], *[msg_refs[p][q] for p in range(P)])
            for q in range(P)]
        deg_refs = [o[0] for o in dm]
        mins = ray.get([o[1] for o in dm])
        if min(mins) == BIG:
            break
        core_k = max(core_k, min(mins))
        outs = [peel.options(num_returns=4).remote(
            alive_refs[q], layer_refs[q], core_refs[q], deg_refs[q],
            core_k, rnd) for q in range(P)]
        alive_refs = [o[0] for o in outs]
        layer_refs = [o[1] for o in outs]
        core_refs = [o[2] for o in outs]
        rounds = rnd
        if sum(ray.get([o[3] for o in outs])) == 0:
            break
    if result_out is None:
        return (assemble(g, layer_refs), assemble(g, core_refs)), rounds
    lr = write_shard_results(g, layer_refs,
                             os.path.join(result_out, "layer"), "layer")
    cr = write_shard_results(g, core_refs,
                             os.path.join(result_out, "coreness"),
                             "coreness")
    return ({"layer": {"path": os.path.join(result_out, "layer"),
                       "rows": lr, "column": "layer"},
             "coreness": {"path": os.path.join(result_out, "coreness"),
                          "rows": cr, "column": "coreness"}}, rounds)


# ----------------------------------------------------------------------
# Densest subgraph: batched greedy peel (2(1+eps)-approximation)
# ----------------------------------------------------------------------
def densest_subgraph(g: DistGraph, eps=0.0, max_iter=10_000):
    """Bahmani, Kumar & Vassilvitskii (VLDB 2012) batched peel: each
    round evaluates the remaining graph's density rho = E_r/V_r, then
    removes EVERY vertex with remaining degree <= 2(1+eps)*rho. The
    densest level seen is a 2(1+eps)-approximation of the densest
    subgraph; eps>0 gives O(log n) rounds, eps=0 still terminates
    (min degree <= average) and is exactly replicable by a
    level-indexed SQL peel. Blocks must hold BOTH directions.

    One kcore-shaped degree gather per round; driver state is O(P)
    scalars plus P object refs for the best level's alive mask.
    Returns ({"density", "round", "n_vertices", "n_edges"},
    best_mask_refs, rounds) — the mask stays sharded."""
    P, n, sizes = g.P, g.n, g.sizes

    @ray.remote
    def gather(block, alive):
        per_edge = alive[block["src_local"]].astype(np.int64)
        off = block["dst_offsets"]
        outs = []
        for q in range(P):
            sl = slice(int(off[q]), int(off[q + 1]))
            arr = np.zeros(sizes[q], dtype=np.int64)
            np.add.at(arr, block["dst_local"][sl], per_edge[sl])
            outs.append(arr)
        return outs

    @ray.remote
    def stats(alive, *incoming):
        deg = incoming[0].copy()
        for arr in incoming[1:]:
            deg += arr
        return deg, int(alive.sum()), int(deg[alive].sum())

    @ray.remote
    def peel(alive, deg, thr):
        return alive & (deg > thr)

    act_refs, _ = g.active_masks()
    alive_refs = [ray.put(np.asarray(ray.get(act_refs[p])).copy())
                  for p in range(P)]
    best = {"density": 0.0, "round": -1, "n_vertices": 0,
            "n_edges": 0}
    best_refs = list(alive_refs)
    for rnd in range(max_iter):
        msg_refs = [gather.options(num_returns=P).remote(
            g.blocks[p], alive_refs[p]) for p in range(P)]
        outs = [stats.options(num_returns=3).remote(
            alive_refs[q], *[msg_refs[p][q] for p in range(P)])
            for q in range(P)]
        deg_refs = [o[0] for o in outs]
        v_r = sum(ray.get([o[1] for o in outs]))
        e_r = sum(ray.get([o[2] for o in outs])) // 2
        if v_r == 0:
            return best, best_refs, rnd
        rho = e_r / v_r
        if rho > best["density"]:
            best = {"density": rho, "round": rnd, "n_vertices": v_r,
                    "n_edges": e_r}
            best_refs = list(alive_refs)
        thr = 2.0 * (1.0 + eps) * rho
        alive_refs = [peel.remote(alive_refs[q], deg_refs[q], thr)
                      for q in range(P)]
    raise RuntimeError("densest_subgraph did not terminate in "
                       f"{max_iter} rounds")


# ----------------------------------------------------------------------
# DAG longest path (critical-path depth): max-plus relaxation
# ----------------------------------------------------------------------
def dag_longest_path(g: DistGraph, max_iter=10_000, checkpoint=None,
                     result_out=None):
    """Longest-path depth (in edges) per vertex of a DAG: integer
    max-plus relaxation per superstep — depth[v] = max(depth[v],
    max over in-edges (depth[u] + 1)), init 0. Same exchange shape as
    ``sssp`` with max instead of min. Converges in (longest path
    length) supersteps; a CYCLIC input never converges, so the kernel
    raises when ``max_iter`` is exhausted — feed it the SCC
    condensation of a cyclic graph. Blocks must hold the FORWARD
    direction only (``directed=True``)."""
    P, n, sizes = g.P, g.n, g.sizes

    @ray.remote
    def gather(block, depth):
        per_edge = depth[block["src_local"]] + np.int64(1)
        off = block["dst_offsets"]
        outs = []
        for q in range(P):
            sl = slice(int(off[q]), int(off[q + 1]))
            arr = np.full(sizes[q], -1, np.int64)
            np.maximum.at(arr, block["dst_local"][sl], per_edge[sl])
            outs.append(arr)
        return outs

    @ray.remote
    def reduce(old, *incoming):
        new = old.copy()
        for arr in incoming:
            np.maximum(new, arr, out=new)
        return new, int((new != old).sum())

    depth_refs = [ray.put(np.zeros(sizes[p], np.int64))
                  for p in range(P)]
    ckpt = CheckpointManager(checkpoint, "dag_longest_path", P, n=n) \
        if checkpoint else None
    start_iter = 0
    if ckpt is not None:
        resumed = ckpt.resume()
        if resumed is not None:
            start_iter, shards, metrics = resumed
            depth_refs = [ray.put(s) for s in shards]
            if metrics.get("changed", -1) == 0:
                return _finish(g, depth_refs, start_iter, result_out,
                               "depth")
    changed = -1
    it = start_iter
    for it in range(start_iter, max_iter):
        msg_refs = [gather.options(num_returns=P).remote(
            g.blocks[p], depth_refs[p]) for p in range(P)]
        outs = [reduce.options(num_returns=2).remote(
            depth_refs[q], *[msg_refs[p][q] for p in range(P)])
            for q in range(P)]
        depth_refs = [o[0] for o in outs]
        changed = sum(ray.get([o[1] for o in outs]))
        if ckpt is not None:
            ckpt.save(it + 1, ray.get(depth_refs),
                      metrics={"changed": changed})
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            "dag_longest_path did not converge in %d supersteps — "
            "the input graph has a cycle (run scc + condense first)"
            % max_iter)
    return _finish(g, depth_refs, it + 1, result_out, "depth")


# ----------------------------------------------------------------------
# k-core: iterative peel to the maximal subgraph with min degree >= k
# ----------------------------------------------------------------------
def kcore(g: DistGraph, k, max_iter=10_000, checkpoint=None,
          init_alive=None, result_out=None):
    """Boolean per-partition membership masks; each superstep counts,
    per vertex, its edges whose *source* endpoint is still in the core
    candidate set (blocks hold both directions, so that is the degree
    within the remaining subgraph) and drops vertices below ``k``.
    Fixed point = the k-core. Returns (mask over vids, iterations).

    Idempotent after convergence, so a fixed-iteration SQL oracle that
    runs past the fixed point reproduces it exactly.

    ``init_alive``: dense length-n bool warm start. The k-core is a
    subset of the (k-1)-core, so a core *decomposition* peels each
    level from the previous level's survivors instead of the whole
    graph — the fixed point is unchanged (peeling is monotone from
    any superset of the k-core). For the fully shard-resident
    decomposition use :func:`coreness`.

    ``result_out=<dir>``: shard-side ``(vid, in_core)`` parquet —
    see :func:`pagerank`."""
    P = g.P
    if init_alive is not None:
        init_alive = np.asarray(init_alive, dtype=bool)
        if len(init_alive) != g.n:
            raise ValueError(
                f"init_alive has length {len(init_alive)}, graph has "
                f"n={g.n}")
        alive_refs = [ray.put(init_alive[p::P].copy())
                      for p in range(P)]
    else:
        alive_refs = None
    alive_refs, iters = _kcore_shards(g, k, alive_refs, max_iter,
                                      checkpoint)
    return _finish(g, alive_refs, iters, result_out, "in_core")


def _kcore_shards(g: DistGraph, k, alive_refs=None, max_iter=10_000,
                  checkpoint=None):
    """Shard-level peel loop: takes/returns per-partition bool mask
    refs so callers (``kcore``, ``coreness``) can compose levels
    without ever assembling an O(n) array on the driver."""
    P, n, sizes = g.P, g.n, g.sizes

    @ray.remote
    def gather(block, alive):
        per_edge = alive[block["src_local"]].astype(np.int64)
        off = block["dst_offsets"]
        outs = []
        for q in range(P):
            sl = slice(int(off[q]), int(off[q + 1]))
            arr = np.zeros(sizes[q], dtype=np.int64)
            np.add.at(arr, block["dst_local"][sl], per_edge[sl])
            outs.append(arr)
        return outs

    @ray.remote
    def reduce(old, *incoming):
        deg = incoming[0].copy()
        for arr in incoming[1:]:
            deg += arr
        new = old & (deg >= k)
        return new, int((new != old).sum())

    # default start: the active vertex set (vertices with >= 1 edge)
    if alive_refs is None:
        act_refs, _ = g.active_masks()
        alive_refs = [ray.put(np.asarray(ray.get(act_refs[p])).copy())
                      for p in range(P)]
    ckpt = CheckpointManager(checkpoint, f"kcore{k}", P, n=n) \
        if checkpoint else None
    start_iter = 0
    if ckpt is not None:
        resumed = ckpt.resume()
        if resumed is not None:
            start_iter, shards, metrics = resumed
            alive_refs = [ray.put(s) for s in shards]
            if metrics.get("changed", -1) == 0:
                return alive_refs, start_iter
    it = start_iter
    for it in range(start_iter, max_iter):
        msg_refs = [gather.options(num_returns=P).remote(
            g.blocks[p], alive_refs[p]) for p in range(P)]
        outs = [reduce.options(num_returns=2).remote(
            alive_refs[q], *[msg_refs[p][q] for p in range(P)])
            for q in range(P)]
        alive_refs = [o[0] for o in outs]
        changed = sum(ray.get([o[1] for o in outs]))
        if ckpt is not None:
            ckpt.save(it + 1, ray.get(alive_refs),
                      metrics={"changed": changed})
        if changed == 0:
            break
    return alive_refs, it + 1


def coreness(g: DistGraph, levels, max_iter=10_000, checkpoint=None,
             result_out=None):
    """Stepped core decomposition entirely on shards: per vertex, the
    highest level k in ``levels`` (ascending) whose k-core still
    contains it; 1 for active vertices in no listed core, 0 for
    inactive (degree-0) ids. Each level's peel warm-starts from the
    previous level's survivors (k-core ⊆ (k-1)-core) and the running
    ``coreness`` vector is updated by per-shard worker tasks — the
    driver holds only per-level alive counts, never an O(n) array
    (the decomposition twin of ``q_coreness_co``'s semantics with the
    driver-side level loop pushed onto the shards)."""
    P = g.P
    act_refs, _ = g.active_masks()

    @ray.remote
    def init_core(act):
        return np.where(np.asarray(act), np.int64(1), np.int64(0))

    @ray.remote
    def to_bool(act):
        return np.asarray(act, dtype=bool).copy()

    @ray.remote
    def bump(core, alive, k):
        new = core.copy()
        new[alive] = k
        return new

    @ray.remote
    def count_alive(alive):
        return int(alive.sum())

    core_refs = [init_core.remote(act_refs[p]) for p in range(P)]
    alive_refs = [to_bool.remote(act_refs[p]) for p in range(P)]
    total_iters = 0
    for k in levels:
        alive_refs, iters = _kcore_shards(g, int(k), alive_refs,
                                          max_iter, checkpoint)
        total_iters += iters
        n_alive = sum(ray.get([count_alive.remote(a)
                               for a in alive_refs]))
        if n_alive == 0:
            break
        core_refs = [bump.remote(core_refs[p], alive_refs[p], int(k))
                     for p in range(P)]
    return _finish(g, core_refs, total_iters, result_out, "coreness")


# ----------------------------------------------------------------------
# HITS: hubs & authorities, simultaneous (Jacobi) update, L1 normalise
# ----------------------------------------------------------------------
def hits(g: DistGraph, g_rev: DistGraph, iters=20, result_out=None,
         degree_normalized=False):
    """Fixed-iteration HITS on a directed graph. Per iteration, from
    the OLD state: authority_raw(v) = sum of hub over in-edges,
    hub_raw(v) = sum of authority over out-edges; both vectors L1
    normalise (sum = 1). The simultaneous update keeps the recursion
    single-step so the SQL oracle can reproduce it exactly; it
    converges to the same principal eigenvectors as the Gauss–Seidel
    form. ``g_rev`` is the same edge set with src/dst swapped (built
    once via ``DistGraph.from_dataset`` on the swapped Dataset): the
    hub gather reads authority state partition-locally there instead
    of shipping destination state into source blocks.

    Isolated ids (no in- or out-edge anywhere) are excluded from the
    vertex set via the union of both graphs' active masks.

    ``degree_normalized=True`` gives SALSA (Lempel & Moran 2000): each
    sender's state is split equally over its edges in that orientation
    (hub mass / out-degree on the forward gather, authority mass /
    in-degree on the reversed gather) — the power iteration of the two
    stochastic SALSA chains instead of the unnormalised HITS matrices.
    The sender degrees are the build's existing per-partition
    out-degree shards; no extra task or exchange."""
    P, n, sizes = g.P, g.n, g.sizes
    assert g_rev.P == P and g_rev.n == n

    if degree_normalized:
        # the build already holds per-partition out-degree shards
        # (exactly the bincount of each block's src_local)
        fwd_deg, rev_deg = g.out_deg, g_rev.out_deg
    else:
        fwd_deg = rev_deg = [None] * P

    @ray.remote
    def gather(block, state, deg):
        per_edge = state[block["src_local"]]
        if deg is not None:
            # deg[src_local] >= 1: a vertex with no edge in this
            # orientation never appears as a sender here
            per_edge = per_edge / deg[block["src_local"]]
        off = block["dst_offsets"]
        outs = []
        for q in range(P):
            sl = slice(int(off[q]), int(off[q + 1]))
            arr = np.zeros(sizes[q])
            np.add.at(arr, block["dst_local"][sl], per_edge[sl])
            outs.append(arr)
        return outs

    @ray.remote(num_returns=2)
    def combine(act, *incoming):
        tot = incoming[0].copy()
        for arr in incoming[1:]:
            tot += arr
        tot[~act] = 0.0
        return tot, float(tot.sum())

    @ray.remote
    def scale(arr, s):
        return arr / s if s > 0 else arr

    # vertex set: active in either orientation
    fwd_masks, _ = g.active_masks()
    rev_masks, _ = g_rev.active_masks()

    @ray.remote(num_returns=2)
    def union_mask(a, b):
        m = a | b
        return m, int(m.sum())

    res = [union_mask.remote(fwd_masks[p], rev_masks[p])
           for p in range(P)]
    act_refs = [r[0] for r in res]
    n_act = int(sum(ray.get([r[1] for r in res])))

    @ray.remote
    def init_shard(act):
        v = np.zeros(len(act))
        v[act] = 1.0 / n_act
        return v

    hub_refs = [init_shard.remote(act_refs[p]) for p in range(P)]
    auth_refs = [init_shard.remote(act_refs[p]) for p in range(P)]

    for _ in range(iters):
        # authority_raw <- forward edges carrying OLD hub
        a_msgs = [gather.options(num_returns=P).remote(
            g.blocks[p], hub_refs[p], fwd_deg[p]) for p in range(P)]
        # hub_raw <- reversed edges carrying OLD authority
        h_msgs = [gather.options(num_returns=P).remote(
            g_rev.blocks[p], auth_refs[p], rev_deg[p]) for p in range(P)]
        a_out = [combine.remote(act_refs[q],
                                *[a_msgs[p][q] for p in range(P)])
                 for q in range(P)]
        h_out = [combine.remote(act_refs[q],
                                *[h_msgs[p][q] for p in range(P)])
                 for q in range(P)]
        a_tot = sum(ray.get([o[1] for o in a_out]))
        h_tot = sum(ray.get([o[1] for o in h_out]))
        auth_refs = [scale.remote(a_out[q][0], a_tot) for q in range(P)]
        hub_refs = [scale.remote(h_out[q][0], h_tot) for q in range(P)]

    if result_out is not None:
        # shard-side (vid, hub)/(vid, authority) parquet under
        # <dir>/hub and <dir>/authority; the per-shard active masks
        # are never assembled either
        import os
        hub_dir = os.path.join(result_out, "hub")
        auth_dir = os.path.join(result_out, "authority")
        hub_rows = write_shard_results(g, hub_refs, hub_dir, "hub")
        auth_rows = write_shard_results(g, auth_refs, auth_dir,
                                        "authority")
        return ({"path": hub_dir, "rows": hub_rows, "column": "hub"},
                {"path": auth_dir, "rows": auth_rows,
                 "column": "authority"}, None)
    act = np.zeros(n, dtype=bool)
    for p in range(P):
        act[p::P] = ray.get(act_refs[p])
    return assemble(g, hub_refs), assemble(g, auth_refs), act


def salsa(g: DistGraph, g_rev: DistGraph, iters=20, result_out=None):
    """SALSA (Lempel & Moran, 'The stochastic approach for
    link-structure analysis', 2000): HITS with each gather
    degree-normalised on the sender side, i.e. the power iteration of
    the two stochastic chains. Same exchange shape, masks, and
    ``result_out`` seam as ``hits``."""
    return hits(g, g_rev, iters=iters, result_out=result_out,
                degree_normalized=True)


# ----------------------------------------------------------------------
# Katz centrality: fixed-iteration Jacobi update
# ----------------------------------------------------------------------
def katz(g: DistGraph, alpha=0.005, beta=1.0, iters=20,
         weighted=False, result_out=None):
    """Katz centrality, simultaneous (Jacobi) update from the OLD
    state: x_{k+1}(v) = beta + alpha * sum over in-edges (u, v) of
    x_k(u) [* weight]; x_0 = beta on the active vertex set (vertices
    with any edge), 0 elsewhere. Fixed ``iters`` supersteps so a
    recursive-CTE oracle reproduces it exactly; converges when
    alpha < 1/lambda_max. Same exchange shape as ``pagerank``:
    per-block destination-partition pre-aggregation, worker-to-worker
    message refs, no driver-side per-edge work."""
    P, n, sizes = g.P, g.n, g.sizes

    @ray.remote
    def gather(block, x):
        per_edge = x[block["src_local"]]
        if weighted:
            per_edge = per_edge * block["weight"]
        off = block["dst_offsets"]
        outs = []
        for q in range(P):
            sl = slice(int(off[q]), int(off[q + 1]))
            arr = np.zeros(sizes[q])
            np.add.at(arr, block["dst_local"][sl], per_edge[sl])
            outs.append(arr)
        return outs

    @ray.remote
    def reduce(act, *incoming):
        tot = incoming[0].copy()
        for arr in incoming[1:]:
            tot += arr
        new = beta + alpha * tot
        new[~act] = 0.0
        return new

    act_refs, _ = g.active_masks()

    @ray.remote
    def init_shard(act):
        x = np.zeros(len(act))
        x[act] = beta
        return x

    x_refs = [init_shard.remote(act_refs[p]) for p in range(P)]
    for _ in range(iters):
        msg = [gather.options(num_returns=P).remote(
            g.blocks[p], x_refs[p]) for p in range(P)]
        x_refs = [reduce.remote(act_refs[q],
                                *[msg[p][q] for p in range(P)])
                  for q in range(P)]
    if result_out is not None:
        rows = write_shard_results(g, x_refs, result_out, "katz")
        return {"path": result_out, "rows": rows, "column": "katz"}
    return assemble(g, x_refs)


# ----------------------------------------------------------------------
# Eigenvector centrality: power iteration, L1 normalise per step
# ----------------------------------------------------------------------
def eigenvector_centrality(g: DistGraph, iters=20, weighted=False,
                           result_out=None):
    """Power iteration on the (weighted) adjacency operator with L1
    normalisation (sum = 1) per superstep, from the uniform vector on
    the active vertex set. Fixed ``iters`` so the SQL oracle can
    reproduce it exactly; blocks must hold both directions for
    undirected semantics. Returns (x, active_mask)."""
    P, n, sizes = g.P, g.n, g.sizes

    @ray.remote
    def gather(block, x):
        per_edge = x[block["src_local"]]
        if weighted:
            per_edge = per_edge * block["weight"]
        off = block["dst_offsets"]
        outs = []
        for q in range(P):
            sl = slice(int(off[q]), int(off[q + 1]))
            arr = np.zeros(sizes[q])
            np.add.at(arr, block["dst_local"][sl], per_edge[sl])
            outs.append(arr)
        return outs

    @ray.remote(num_returns=2)
    def combine(act, *incoming):
        tot = incoming[0].copy()
        for arr in incoming[1:]:
            tot += arr
        tot[~act] = 0.0
        return tot, float(tot.sum())

    @ray.remote
    def scale(arr, s):
        return arr / s if s > 0 else arr

    act_refs, n_act = g.active_masks()

    @ray.remote
    def init_shard(act):
        x = np.zeros(len(act))
        x[act] = 1.0 / n_act
        return x

    x_refs = [init_shard.remote(act_refs[p]) for p in range(P)]
    for _ in range(iters):
        msg = [gather.options(num_returns=P).remote(
            g.blocks[p], x_refs[p]) for p in range(P)]
        outs = [combine.remote(act_refs[q],
                               *[msg[p][q] for p in range(P)])
                for q in range(P)]
        tot = sum(ray.get([o[1] for o in outs]))
        x_refs = [scale.remote(outs[q][0], tot) for q in range(P)]
    if result_out is not None:
        rows = write_shard_results(g, x_refs, result_out,
                                   "eigenvector")
        return ({"path": result_out, "rows": rows,
                 "column": "eigenvector"}, None)
    act = np.zeros(n, dtype=bool)
    for p in range(P):
        act[p::P] = ray.get(act_refs[p])
    return assemble(g, x_refs), act


# ----------------------------------------------------------------------
# Weisfeiler-Lehman color refinement
# ----------------------------------------------------------------------
def wl_refinement(g: DistGraph, iters=2):
    """1-WL (color refinement) vertex fingerprints: the initial color
    is the degree (as a decimal string); each round every vertex's new
    color is ``md5(own || '|' || join(sorted(neighbour colors), ','))``
    — exactly reproducible in SQL as ``md5(own || '|' ||
    string_agg(nlab, ',' ORDER BY nlab))``, so the whole refinement is
    driver-verifiable. Sorting is lexicographic on both sides (numpy
    unicode sort == VARCHAR byte order for this hex/digit alphabet).

    BSP shape: neighbour colors ship per destination partition
    (strings, so ~33 bytes/edge/round — WL is a fingerprint pass, not
    a hot kernel); the md5 loop runs inside the partition task.
    Returns (labels '<U32' over vids, active mask)."""
    P, n, sizes = g.P, g.n, g.sizes

    @ray.remote
    def gather(block, lab):
        per_edge = lab[block["src_local"]]
        off = block["dst_offsets"]
        outs = []
        for q in range(P):
            sl = slice(int(off[q]), int(off[q + 1]))
            outs.append((block["dst_local"][sl], per_edge[sl]))
        return outs

    @ray.remote
    def reduce(own, *incoming):
        import hashlib
        dl = np.concatenate([x[0] for x in incoming])
        lb = np.concatenate([x[1] for x in incoming])
        order = np.lexsort((lb, dl))
        dl, lb = dl[order], lb[order]
        m = len(own)
        starts = np.searchsorted(dl, np.arange(m))
        ends = np.searchsorted(dl, np.arange(1, m + 1))
        out = np.empty(m, dtype="<U32")
        for i in range(m):
            s = f"{own[i]}|" + ",".join(lb[starts[i]:ends[i]])
            out[i] = hashlib.md5(s.encode()).hexdigest()
        return out

    @ray.remote
    def deg_str(d):
        return d.astype(np.int64).astype("<U20").astype("<U32")

    # degree over the stored (both-direction) blocks
    lab_refs = [deg_str.remote(g.out_deg[p]) for p in range(P)]
    for _ in range(iters):
        msg = [gather.options(num_returns=P).remote(
            g.blocks[p], lab_refs[p]) for p in range(P)]
        lab_refs = [reduce.remote(lab_refs[q],
                                  *[msg[p][q] for p in range(P)])
                    for q in range(P)]
    shards = ray.get(lab_refs)
    out = np.empty(n, dtype="<U32")
    for p in range(P):
        out[p::P] = shards[p]
    return out, g.active_global()


# ----------------------------------------------------------------------
# Label propagation: plurality label of neighbours, ties -> lowest label
# ----------------------------------------------------------------------
def label_propagation(g: DistGraph, max_iter=100, weighted=True,
                      checkpoint=None, result_out=None):
    """Synchronous supersteps; each vertex adopts the neighbour label
    with the highest total edge weight (ties: lowest label); vertices
    with no neighbours keep their label. Fixed point or max_iter.
    Blocks must hold both directions for undirected semantics."""
    P, n, sizes = g.P, g.n, g.sizes

    @ray.remote
    def gather(block, label):
        per_edge_label = label[block["src_local"]]
        w = block["weight"] if weighted else np.ones(len(per_edge_label))
        off = block["dst_offsets"]
        outs = []
        for q in range(P):
            sl = slice(int(off[q]), int(off[q + 1]))
            dl = block["dst_local"][sl]
            lb = per_edge_label[sl]
            ww = w[sl]
            # per-(dst,label) partial weight sums inside the task
            if len(dl) == 0:
                outs.append((np.empty(0, np.int64), np.empty(0, np.int64),
                             np.empty(0)))
                continue
            key = dl * (n + 1) + lb
            uniq, inv = np.unique(key, return_inverse=True)
            ws = np.zeros(len(uniq))
            np.add.at(ws, inv, ww)
            outs.append(((uniq // (n + 1)).astype(np.int64),
                         (uniq % (n + 1)).astype(np.int64), ws))
        return outs

    @ray.remote
    def reduce(old, *incoming):
        dl = np.concatenate([x[0] for x in incoming])
        lb = np.concatenate([x[1] for x in incoming])
        ws = np.concatenate([x[2] for x in incoming])
        new = old.copy()
        if len(dl):
            key = dl * (n + 1) + lb
            uniq, inv = np.unique(key, return_inverse=True)
            tot = np.zeros(len(uniq))
            np.add.at(tot, inv, ws)
            d = (uniq // (n + 1)).astype(np.int64)
            l = (uniq % (n + 1)).astype(np.int64)
            # argmax weight per dst, ties -> lowest label: sort by
            # (dst, -weight, label) and take the first row per dst
            order = np.lexsort((l, -tot, d))
            d_s, l_s = d[order], l[order]
            first = np.ones(len(d_s), dtype=bool)
            first[1:] = d_s[1:] != d_s[:-1]
            new[d_s[first]] = l_s[first]
        return new, int((new != old).sum())

    label_refs = [ray.put(np.arange(p, n, P, dtype=np.int64))
                  for p in range(P)]
    ckpt = CheckpointManager(checkpoint, "labelprop", P, n=n) \
        if checkpoint else None
    start_iter = 0
    if ckpt is not None:
        resumed = ckpt.resume()
        if resumed is not None:
            start_iter, shards, metrics = resumed
            label_refs = [ray.put(s) for s in shards]
            if metrics.get("changed", -1) == 0:
                return _finish(g, label_refs, start_iter, result_out,
                               "label")
    it = start_iter
    for it in range(start_iter, max_iter):
        msg_refs = [gather.options(num_returns=P).remote(
            g.blocks[p], label_refs[p]) for p in range(P)]
        outs = [reduce.options(num_returns=2).remote(
            label_refs[q], *[msg_refs[p][q] for p in range(P)])
            for q in range(P)]
        label_refs = [o[0] for o in outs]
        changed = sum(ray.get([o[1] for o in outs]))
        if ckpt is not None:
            ckpt.save(it + 1, ray.get(label_refs),
                      metrics={"changed": changed})
        if changed == 0:
            break
    return _finish(g, label_refs, it + 1, result_out, "label")


# ----------------------------------------------------------------------
# Seeded (semi-supervised) label propagation
# ----------------------------------------------------------------------
def label_propagation_seeded(g: DistGraph, seeds, seed_labels,
                             iters=10, weighted=True, result_out=None):
    """Semi-supervised label spreading (the distributed analogue of
    the reference's ``is_membership_fixed``): seed vertices hold
    pinned class labels; every other vertex is unlabeled (-1) until a
    labeled neighbour appears, then re-takes the plurality label of
    its LABELED neighbours each superstep (ties -> lowest label;
    unlabeled vertices with no labeled neighbour keep -1). Labels
    never disappear, so a fixed-iteration recursive-CTE oracle
    reproduces the run exactly. Blocks must hold both directions.
    Class labels may be arbitrary non-negative int64 (the packing
    base adapts)."""
    P, n, sizes = g.P, g.n, g.sizes
    seeds = np.asarray(seeds, dtype=np.int64)
    seed_labels = np.asarray(seed_labels, dtype=np.int64)
    # (dst, label) pair packing base: labels are seed class ids, which
    # may exceed n
    L = int(max(n, seed_labels.max(initial=0) + 1, 2))

    @ray.remote
    def gather(block, label):
        lab = label[block["src_local"]]
        keep = lab >= 0
        w = (block["weight"] if weighted
             else np.ones(len(lab)))
        off = block["dst_offsets"]
        outs = []
        for q in range(P):
            sl = slice(int(off[q]), int(off[q + 1]))
            m = keep[sl]
            dl = block["dst_local"][sl][m]
            lb = lab[sl][m]
            ww = w[sl][m]
            if len(dl) == 0:
                outs.append((np.empty(0, np.int64),
                             np.empty(0, np.int64), np.empty(0)))
                continue
            key = dl * L + lb
            uniq, inv = np.unique(key, return_inverse=True)
            ws = np.zeros(len(uniq))
            np.add.at(ws, inv, ww)
            outs.append(((uniq // L).astype(np.int64),
                         (uniq % L).astype(np.int64), ws))
        return outs

    @ray.remote
    def reduce(old, fixed, *incoming):
        dl = np.concatenate([x[0] for x in incoming])
        lb = np.concatenate([x[1] for x in incoming])
        ws = np.concatenate([x[2] for x in incoming])
        new = old.copy()
        if len(dl):
            key = dl * L + lb
            uniq, inv = np.unique(key, return_inverse=True)
            tot = np.zeros(len(uniq))
            np.add.at(tot, inv, ws)
            d = (uniq // L).astype(np.int64)
            l = (uniq % L).astype(np.int64)
            order = np.lexsort((l, -tot, d))
            d_s, l_s = d[order], l[order]
            first = np.ones(len(d_s), dtype=bool)
            first[1:] = d_s[1:] != d_s[:-1]
            new[d_s[first]] = l_s[first]
        new[fixed] = old[fixed]
        return new

    label_refs, fixed_refs = [], []
    for p in range(P):
        lab = np.full(sizes[p], -1, dtype=np.int64)
        fx = np.zeros(sizes[p], dtype=bool)
        m = seeds % P == p
        lab[seeds[m] // P] = seed_labels[m]
        fx[seeds[m] // P] = True
        label_refs.append(ray.put(lab))
        fixed_refs.append(ray.put(fx))
    for _ in range(iters):
        msg_refs = [gather.options(num_returns=P).remote(
            g.blocks[p], label_refs[p]) for p in range(P)]
        label_refs = [reduce.remote(label_refs[q], fixed_refs[q],
                                    *[msg_refs[p][q] for p in range(P)])
                      for q in range(P)]
    if result_out is not None:
        rows = write_shard_results(g, label_refs, result_out, "label")
        return {"path": result_out, "rows": rows, "column": "label"}
    return assemble(g, label_refs)


# ----------------------------------------------------------------------
# Strongly connected components: FW-BW colouring
# ----------------------------------------------------------------------
def scc(g_fwd: DistGraph, g_bwd: DistGraph, max_rounds=1_000,
        result_out=None):
    """SCC labels (= min vid in the component) via the distributed
    FW-BW-colouring algorithm (Orzan-style; public BSP formulation):

    per outer round, over the still-unassigned subgraph:
      1. forward min-label colouring to fixed point: F[v] = min vid
         that reaches v (same sharded min-propagation as
         ``connected_components`` but along directed edges only);
      2. backward root-mark sweep: every root (F[r] == r) marks,
         along REVERSED edges, the vertices u that can reach it while
         sharing its colour — those are exactly r's SCC. The mark
         ships as the root's label; because F[w] <= F[u] on every
         edge u->w, "some out-neighbour carries my colour" is a
         max-reduce + equality test (no per-edge colour exchange).
    Each round assigns >= the SCC of every current colour root (at
    minimum the globally smallest unassigned vid), so rounds <=
    number of SCCs and in practice a handful.

    ``g_bwd`` must be the same edge set with src/dst swapped (same
    ``n`` and ``P``). Returns (labels over raw vids, supersteps).

    SHARD-RESIDENT (round 4): the running assignment lives as
    per-partition object refs mutated by worker tasks; the driver
    orchestrates refs and per-round unassigned counts only.
    ``result_out=<dir>``: shard-side ``(vid, scc)`` parquet.
    """
    P, n, sizes = g_fwd.P, g_fwd.n, g_fwd.sizes
    assert g_bwd.P == P and g_bwd.n == n
    BIG = np.iinfo(np.int64).max

    @ray.remote
    def fgather(block, F):
        per_edge = F[block["src_local"]]
        off = block["dst_offsets"]
        outs = []
        for q in range(P):
            sl = slice(int(off[q]), int(off[q + 1]))
            arr = np.full(sizes[q], BIG, dtype=np.int64)
            np.minimum.at(arr, block["dst_local"][sl], per_edge[sl])
            outs.append(arr)
        return outs

    @ray.remote
    def freduce(old, assigned, *incoming):
        new = old.copy()
        for arr in incoming:
            np.minimum(new, arr, out=new)
        new[assigned] = BIG
        return new, int((new != old).sum())

    @ray.remote
    def bgather(block, m):
        per_edge = m[block["src_local"]]
        off = block["dst_offsets"]
        outs = []
        for q in range(P):
            sl = slice(int(off[q]), int(off[q + 1]))
            arr = np.full(sizes[q], -1, dtype=np.int64)
            np.maximum.at(arr, block["dst_local"][sl], per_edge[sl])
            outs.append(arr)
        return outs

    @ray.remote
    def breduce(m_old, F, *incoming):
        mx = np.full(len(m_old), -1, dtype=np.int64)
        for arr in incoming:
            np.maximum(mx, arr, out=mx)
        hit = (m_old == -1) & (F != BIG) & (mx == F)
        new = m_old.copy()
        new[hit] = F[hit]
        return new, int(hit.sum())

    @ray.remote(num_returns=2)
    def init_scc(act, p):
        vids = np.arange(p, n, P, dtype=np.int64)
        # inactive vertices are their own singleton (filtered by
        # callers via active_global); start them assigned so they
        # never colour
        s = np.where(np.asarray(act), np.int64(-1), vids)
        return s, int((s < 0).sum())

    @ray.remote(num_returns=2)
    def round_state(scc_q, p):
        vids = np.arange(p, n, P, dtype=np.int64)
        return scc_q >= 0, np.where(scc_q < 0, vids, BIG)

    @ray.remote
    def mk_marks(F_q, scc_q, p):
        vids = np.arange(p, n, P, dtype=np.int64)
        return np.where((F_q == vids) & (scc_q < 0), F_q,
                        np.int64(-1))

    @ray.remote(num_returns=2)
    def apply_marks(scc_q, m_q):
        newly = m_q >= 0
        new = scc_q.copy()
        new[newly] = m_q[newly]
        return new, int((new < 0).sum())

    act_masks, _ = g_fwd.active_masks()
    res = [init_scc.remote(act_masks[p], p) for p in range(P)]
    scc_refs = [r[0] for r in res]
    unassigned = sum(ray.get([r[1] for r in res]))
    steps = 0
    for _round in range(max_rounds):
        if unassigned == 0:
            break
        st = [round_state.options(num_returns=2).remote(
            scc_refs[p], p) for p in range(P)]
        assigned_refs = [s[0] for s in st]
        F_refs = [s[1] for s in st]
        while True:
            msg = [fgather.options(num_returns=P).remote(
                g_fwd.blocks[p], F_refs[p]) for p in range(P)]
            outs = [freduce.options(num_returns=2).remote(
                F_refs[q], assigned_refs[q],
                *[msg[p][q] for p in range(P)]) for q in range(P)]
            F_refs = [o[0] for o in outs]
            steps += 1
            if sum(ray.get([o[1] for o in outs])) == 0:
                break
        m_refs = [mk_marks.remote(F_refs[p], scc_refs[p], p)
                  for p in range(P)]
        while True:
            msg = [bgather.options(num_returns=P).remote(
                g_bwd.blocks[p], m_refs[p]) for p in range(P)]
            outs = [breduce.options(num_returns=2).remote(
                m_refs[q], F_refs[q],
                *[msg[p][q] for p in range(P)]) for q in range(P)]
            m_refs = [o[0] for o in outs]
            steps += 1
            if sum(ray.get([o[1] for o in outs])) == 0:
                break
        outs = [apply_marks.options(num_returns=2).remote(
            scc_refs[p], m_refs[p]) for p in range(P)]
        scc_refs = [o[0] for o in outs]
        unassigned = sum(ray.get([o[1] for o in outs]))
    return _finish(g_fwd, scc_refs, steps, result_out, "scc")


# ----------------------------------------------------------------------
# Deterministic random walks (node2vec-style corpus prep)
# ----------------------------------------------------------------------
WALK_MOD = 1_000_003


def walk_hash(w, s, u):
    """Deterministic per-step ranking hash, fully numpy-vectorised
    and reproducible verbatim in SQL:
    ``((w % M) * 7919 + (s % M) * 104729 + (u % M) * 15485863) % M``
    (same modular-hash idiom as ``linkpred.neighbor_sample``)."""
    M = WALK_MOD
    return ((w % M) * 7919 + (s % M) * 104729
            + (u % M) * 15485863) % M


def _block_csr_view(block, P, size_p):
    """Per-partition src-sorted CSR view of a block for the walk
    kernels: (starts, dstg_global, src_sorted), with each src run's
    destinations sorted ascending (lexsort) so membership tests can
    binary-search a run."""
    src = block["src_local"]
    off = block["dst_offsets"]
    dstg = np.empty(len(src), dtype=np.int64)
    for q in range(P):
        sl = slice(int(off[q]), int(off[q + 1]))
        dstg[sl] = block["dst_local"][sl] * P + q
    order = np.lexsort((dstg, src))
    ss_, dg = src[order], dstg[order]
    starts = np.searchsorted(ss_, np.arange(size_p + 1))
    return starts, dg, ss_


def random_walks(g: DistGraph, seeds, length):
    """Fixed-length walks along directed edges; the step from ``cur``
    for walk ``w`` at step ``s`` goes to the out-neighbour ``u``
    minimising ``(walk_hash(w, s, u), u)`` — a deterministic hash
    choice (reproducible across runs and parallelism levels, and
    exactly replicable in SQL), standing in for the RNG draw of a
    production walk engine. Walks stop at dead ends.

    BSP shape: each partition builds a src-sorted CSR view of its own
    block once; per superstep the walk frontier is bucketed by
    ``cur % P`` and each partition advances only its own walks — walk
    state never exceeds O(frontier / P) per task and the driver holds
    only the frontier (which IS the query output, O(walks x length)).

    Returns (walk_id, step, vid) int64 arrays.
    """
    P, sizes = g.P, g.sizes

    @ray.remote
    def build_adj(block, p):
        starts, dg, _ = _block_csr_view(block, P, sizes[p])
        return starts, dg

    @ray.remote
    def step_task(adj, wids, curs, step):
        starts, dg = adj
        loc = curs // P
        deg = starts[loc + 1] - starts[loc]
        out = np.full(len(wids), -1, dtype=np.int64)
        live = np.flatnonzero(deg > 0)
        if len(live) == 0:
            return out
        # flatten every live walk's neighbour list, rank by
        # (hash, u) packed into one int64, segmented min
        counts = deg[live]
        offs = np.concatenate(([0], np.cumsum(counts)))
        flat = np.concatenate(
            [dg[starts[loc[i]]:starts[loc[i] + 1]] for i in live])
        w_rep = np.repeat(wids[live], counts)
        key = walk_hash(w_rep, step, flat) * np.int64(g.n) + flat
        best = np.minimum.reduceat(key, offs[:-1])
        out[live] = best % g.n
        return out

    adj_refs = [build_adj.remote(g.blocks[p], p) for p in range(P)]
    wids = np.asarray(seeds, dtype=np.int64)
    cur = wids.copy()
    out_w = [wids.copy()]
    out_s = [np.zeros(len(wids), dtype=np.int64)]
    out_v = [cur.copy()]
    for s in range(1, length + 1):
        if len(wids) == 0:
            break
        parts = (cur % P).astype(np.int64)
        nxt = np.full(len(wids), -1, dtype=np.int64)
        futs = {}
        for p in range(P):
            idx = np.flatnonzero(parts == p)
            if len(idx):
                futs[p] = (idx, step_task.remote(
                    adj_refs[p], wids[idx], cur[idx], s))
        for p, (idx, f) in futs.items():
            nxt[idx] = ray.get(f)
        alive = nxt >= 0
        wids, cur = wids[alive], nxt[alive]
        out_w.append(wids.copy())
        out_s.append(np.full(len(wids), s, dtype=np.int64))
        out_v.append(cur.copy())
    return (np.concatenate(out_w), np.concatenate(out_s),
            np.concatenate(out_v))


N2V_R_MAX = 4         # class multiplicities live in 1..N2V_R_MAX
N2V_R_PRIME = 32452843


def node2vec_hash(w, s, u, r):
    """``walk_hash`` extended with the multiset-replica index ``r``
    (same modular idiom, one more prime multiplier); replicable
    verbatim in SQL."""
    M = WALK_MOD
    return ((w % M) * 7919 + (s % M) * 104729
            + (u % M) * 15485863 + (r % M) * N2V_R_PRIME) % M


def node2vec_walks(g: DistGraph, seeds, length,
                   mult_return=1, mult_common=2, mult_far=1):
    """Second-order (node2vec; Grover & Leskovec 2016) biased walks.
    From ``cur`` with predecessor ``prev``, each out-neighbour ``u``
    falls in a class — return (``u == prev``), common (``u`` is an
    out-neighbour of ``prev``), far (neither) — with integer
    multiplicity ``m`` in 1..N2V_R_MAX standing in for node2vec's
    1/p, 1, 1/q edge weights. The step goes to the candidate
    minimising ``(min_{r<m} node2vec_hash(w, s, u, r), u)``: a
    deterministic draw from the weighted multiset (each candidate
    entered m times), reproducible across runs / parallelism levels
    and replicable in SQL. The first step (no predecessor) is the
    uniform m=1 draw.

    BSP shape: two shard rounds per step. Round A on cur's partition
    enumerates the walk's candidates and buckets them by
    ``prev % P``; round B on prev's partition classifies each
    candidate against prev's adjacency run (CSR sorted by
    (src, dst): membership is one binary search on the combined
    ``src_local * n + dst`` key — fits int64 while n^2/P < 2^63) and
    returns ONE best candidate per walk; the driver merges
    O(frontier) per-walk partials, never the candidate set.

    Returns (walk_id, step, vid) int64 arrays like ``random_walks``.
    """
    for m in (mult_return, mult_common, mult_far):
        if not 1 <= m <= N2V_R_MAX:
            raise ValueError(f"class multiplicity {m} outside "
                             f"1..{N2V_R_MAX}")
    P, sizes, n = g.P, g.sizes, g.n
    nI = np.int64(n)

    @ray.remote
    def build_adj(block, p):
        starts, dg, ss_ = _block_csr_view(block, P, sizes[p])
        return starts, dg, ss_ * nI + dg   # member key: globally sorted

    @ray.remote
    def first_step(adj, wids, curs, step):
        """Uniform m=1 step (no predecessor): one best per walk."""
        starts, dg, _ = adj
        loc = curs // P
        deg = starts[loc + 1] - starts[loc]
        out = np.full(len(wids), -1, dtype=np.int64)
        live = np.flatnonzero(deg > 0)
        if len(live) == 0:
            return out
        counts = deg[live]
        offs = np.concatenate(([0], np.cumsum(counts)))
        flat = np.concatenate(
            [dg[starts[loc[i]]:starts[loc[i] + 1]] for i in live])
        w_rep = np.repeat(wids[live], counts)
        key = node2vec_hash(w_rep, step, flat, 0) * nI + flat
        best = np.minimum.reduceat(key, offs[:-1])
        out[live] = best % nI
        return out

    @ray.remote
    def enumerate_candidates(adj, wids, prevs, curs):
        """Round A: candidate (wid, prev, u) triples bucketed by
        prev % P."""
        starts, dg, _ = adj
        loc = curs // P
        deg = starts[loc + 1] - starts[loc]
        live = np.flatnonzero(deg > 0)
        if len(live) == 0:
            empty = np.empty(0, dtype=np.int64)
            return [(empty, empty, empty)] * P
        counts = deg[live]
        flat = np.concatenate(
            [dg[starts[loc[i]]:starts[loc[i] + 1]] for i in live])
        w_rep = np.repeat(wids[live], counts)
        p_rep = np.repeat(prevs[live], counts)
        buckets = (p_rep % P).astype(np.int64)
        outs = []
        for q in range(P):
            m = buckets == q
            outs.append((w_rep[m], p_rep[m], flat[m]))
        return outs

    @ray.remote
    def classify_and_pick(adj, step, *incoming):
        """Round B: class multiplicity against prev's adjacency, then
        per-walk (hash, u) min — returns one partial best per walk."""
        _, _, member_key = adj
        w = np.concatenate([t[0] for t in incoming])
        pv = np.concatenate([t[1] for t in incoming])
        u = np.concatenate([t[2] for t in incoming])
        if len(w) == 0:
            return np.empty(0, dtype=np.int64), np.empty(0,
                                                         dtype=np.int64)
        qk = (pv // P) * nI + u
        if len(member_key):
            idx = np.minimum(np.searchsorted(member_key, qk),
                             len(member_key) - 1)
            is_nbr = member_key[idx] == qk
        else:
            is_nbr = np.zeros(len(w), dtype=bool)
        mcls = np.full(len(w), mult_far, dtype=np.int64)
        mcls[is_nbr] = mult_common
        mcls[u == pv] = mult_return
        base = ((w % WALK_MOD) * 7919 + (step % WALK_MOD) * 104729
                + (u % WALK_MOD) * 15485863)
        key = base % WALK_MOD
        for r in range(1, N2V_R_MAX):
            hr = (base + r * N2V_R_PRIME) % WALK_MOD
            key = np.where(r < mcls, np.minimum(key, hr), key)
        packed = key * nI + u
        order = np.lexsort((packed, w))
        ws, ps = w[order], packed[order]
        first = np.ones(len(ws), dtype=bool)
        first[1:] = ws[1:] != ws[:-1]
        return ws[first], ps[first]

    adj_refs = [build_adj.remote(g.blocks[p], p) for p in range(P)]
    wids = np.asarray(seeds, dtype=np.int64)
    cur = wids.copy()
    prev = np.full(len(wids), -1, dtype=np.int64)
    out_w = [wids.copy()]
    out_s = [np.zeros(len(wids), dtype=np.int64)]
    out_v = [cur.copy()]
    for s in range(1, length + 1):
        if len(wids) == 0:
            break
        parts = (cur % P).astype(np.int64)
        if s == 1:
            nxt = np.full(len(wids), -1, dtype=np.int64)
            futs = {}
            for p in range(P):
                idx = np.flatnonzero(parts == p)
                if len(idx):
                    futs[p] = (idx, first_step.remote(
                        adj_refs[p], wids[idx], cur[idx], s))
            for p, (idx, f) in futs.items():
                nxt[idx] = ray.get(f)
            alive = nxt >= 0
            wids, cur, prev = wids[alive], nxt[alive], cur[alive]
        else:
            cand_futs = []
            for p in range(P):
                idx = np.flatnonzero(parts == p)
                if len(idx):
                    cand_futs.append(
                        enumerate_candidates.options(
                            num_returns=P).remote(
                            adj_refs[p], wids[idx], prev[idx],
                            cur[idx]))
            pick_futs = [classify_and_pick.remote(
                adj_refs[q], s, *[cf[q] for cf in cand_futs])
                for q in range(P)]
            parts_out = ray.get(pick_futs)
            aw = np.concatenate([t[0] for t in parts_out])
            ap = np.concatenate([t[1] for t in parts_out])
            if len(aw) == 0:
                break
            order = np.lexsort((ap, aw))
            aw_s, ap_s = aw[order], ap[order]
            first = np.ones(len(aw_s), dtype=bool)
            first[1:] = aw_s[1:] != aw_s[:-1]
            win_w, win_u = aw_s[first], ap_s[first] % nI
            # realign to walk order, vectorised (win_w is sorted);
            # dead walks simply drop out of the frontier
            keep = np.isin(wids, win_w)
            new_cur = win_u[np.searchsorted(win_w, wids[keep])]
            prev = cur[keep]
            wids = wids[keep]
            cur = new_cur
        out_w.append(wids.copy())
        out_s.append(np.full(len(wids), s, dtype=np.int64))
        out_v.append(cur.copy())
    return (np.concatenate(out_w), np.concatenate(out_s),
            np.concatenate(out_v))


def multi_bfs(g: DistGraph, sources, max_iter=10_000):
    """Per-source unweighted hop distances for a SMALL seed set
    (closeness / eccentricity probes): one (k, size_p) int64 plane
    per partition — state O(k * n / P), messages pre-aggregated by
    destination partition exactly like ``bfs_distances``, driver only
    sums change counts. Returns a (k, n) distance matrix (INF =
    unreachable).
    """
    P, n, sizes = g.P, g.n, g.sizes
    INF = np.iinfo(np.int64).max
    k = len(sources)

    @ray.remote
    def gather(block, dist):
        d = dist[:, block["src_local"]]
        per_edge = np.where(d == INF, INF, d + 1)
        off = block["dst_offsets"]
        outs = []
        for q in range(P):
            sl = slice(int(off[q]), int(off[q + 1]))
            arr = np.full((k, sizes[q]), INF, dtype=np.int64)
            np.minimum.at(arr.T, block["dst_local"][sl],
                          per_edge[:, sl].T)
            outs.append(arr)
        return outs

    @ray.remote
    def reduce(old, *incoming):
        new = old.copy()
        for arr in incoming:
            np.minimum(new, arr, out=new)
        return new, int((new != old).sum())

    sources = np.asarray(sources, dtype=np.int64)
    dist_refs = []
    for p in range(P):
        shard = np.full((k, sizes[p]), INF, dtype=np.int64)
        for i, s in enumerate(sources):
            if s % P == p:
                shard[i, s // P] = 0
        dist_refs.append(ray.put(shard))
    it = 0
    for it in range(max_iter):
        msg_refs = [gather.options(num_returns=P).remote(
            g.blocks[p], dist_refs[p]) for p in range(P)]
        outs = [reduce.options(num_returns=2).remote(
            dist_refs[q], *[msg_refs[p][q] for p in range(P)])
            for q in range(P)]
        dist_refs = [o[0] for o in outs]
        changed = sum(ray.get([o[1] for o in outs]))
        if changed == 0:
            break
    shards = ray.get(dist_refs)
    out = np.full((k, n), INF, dtype=np.int64)
    for p in range(P):
        out[:, p::P] = shards[p]
    return out, it + 1


def _spath_shards(g: DistGraph, source, max_depth=64):
    """Shard-level forward pass of Brandes: returns (dist_refs,
    sig_refs, maxd) — per-partition int64 shards as object refs plus
    the deepest assigned level; the driver holds only refs and
    per-level change counts."""
    P, n, sizes = g.P, g.n, g.sizes
    INF = np.iinfo(np.int64).max

    @ray.remote
    def gather(block, dist, sigma, d):
        src = block["src_local"]
        on = dist[src] == d
        off = block["dst_offsets"]
        outs = []
        for q in range(P):
            sl = slice(int(off[q]), int(off[q + 1]))
            m = on[sl]
            arr = np.zeros(sizes[q], dtype=np.int64)
            np.add.at(arr, block["dst_local"][sl][m],
                      sigma[src[sl][m]])
            outs.append(arr)
        return outs

    @ray.remote
    def reduce(dist, sigma, d, *incoming):
        total = incoming[0].copy()
        for arr in incoming[1:]:
            total += arr
        new = (dist == INF) & (total > 0)
        nd, ns = dist.copy(), sigma.copy()
        nd[new] = d + 1
        ns[new] = total[new]
        return nd, ns, int(new.sum())

    dist_refs, sig_refs = [], []
    for p in range(P):
        dd = np.full(sizes[p], INF, dtype=np.int64)
        sg = np.zeros(sizes[p], dtype=np.int64)
        if source % P == p:
            dd[source // P] = 0
            sg[source // P] = 1
        dist_refs.append(ray.put(dd))
        sig_refs.append(ray.put(sg))
    maxd = 0
    for d in range(max_depth):
        msg_refs = [gather.options(num_returns=P).remote(
            g.blocks[p], dist_refs[p], sig_refs[p], d)
            for p in range(P)]
        outs = [reduce.options(num_returns=3).remote(
            dist_refs[q], sig_refs[q], d,
            *[msg_refs[p][q] for p in range(P)]) for q in range(P)]
        dist_refs = [o[0] for o in outs]
        sig_refs = [o[1] for o in outs]
        if sum(ray.get([o[2] for o in outs])) == 0:
            break
        maxd = d + 1
    return dist_refs, sig_refs, maxd


def spath_counts(g: DistGraph, source, max_depth=64):
    """Single-source shortest-path counts (the sigma of Brandes'
    betweenness): level-synchronous BSP — at level d every edge
    (u, v) with dist[u] == d contributes sigma[u] to v's incoming
    sum, pre-aggregated per destination partition inside the block
    task; the reduce assigns dist = d + 1 and sigma = total incoming
    to still-unlabelled vertices. Integer-exact (int64 counts;
    overflow only on pathological path-count blowups).

    Returns (dist, sigma) length-n int64 arrays (INF / 0 where
    unreached) — the oracle-facing assembled form of
    ``_spath_shards``.
    """
    dist_refs, sig_refs, _ = _spath_shards(g, source, max_depth)
    return assemble(g, dist_refs), assemble(g, sig_refs)


def betweenness(g: DistGraph, sources, result_out=None):
    """Seed-sampled betweenness centrality (Brandes): forward
    ``_spath_shards`` per seed, then the backward dependency sweep
    level by level — delta[v] += sigma[v]/sigma[w] * (1 + delta[w])
    over DAG edges (v, w), dist[w] == dist[v] + 1 — run as one block
    task round per level with destination-partition pre-aggregation.
    Endpoints excluded (the classic definition). Blocks must hold
    both directions (undirected semantics).

    SHARD-RESIDENT end to end (round 4): dist/sigma/delta/acc live as
    per-partition object refs; the driver orchestrates refs and
    per-level counts only — no O(n) array per source. With
    ``result_out=<dir>`` the accumulated dependencies write per shard
    (column ``betweenness``) and the return is {path, rows, column}.

    Sampled sources approximate full betweenness at 100-TB scale
    (Brandes & Pich 2007); pass every vertex for the exact value.
    Returns a length-n float64 array of summed dependencies (or the
    result_out descriptor).
    """
    P, n, sizes = g.P, g.n, g.sizes
    INF = np.iinfo(np.int64).max

    @ray.remote
    def zeros(sz):
        return np.zeros(sz, dtype=np.float64)

    @ray.remote
    def back_gather(block, p, d, *shards):
        # edges (src, dst) with dist[dst] == d, dist[src] == d - 1:
        # contribution to src: sigma[src]/sigma[dst] * (1 + delta[dst])
        # grouped per src partition owner == this block's partition.
        # ``shards`` = P dist shards, P sigma shards, P delta shards.
        dist = shards[:P]
        sigma = shards[P:2 * P]
        delta = shards[2 * P:]
        src = block["src_local"]
        off = block["dst_offsets"]
        contrib = np.zeros(len(src), dtype=np.float64)
        keep = np.zeros(len(src), dtype=bool)
        for q in range(P):
            sl = slice(int(off[q]), int(off[q + 1]))
            dl = block["dst_local"][sl]
            m = dist[q][dl] == d
            keep[sl] = m
            with np.errstate(divide="ignore", invalid="ignore"):
                c = np.where(
                    m, (1.0 + delta[q][dl]) / sigma[q][dl], 0.0)
            contrib[sl] = c
        out = np.zeros(sizes[p], dtype=np.float64)
        np.add.at(out, src[keep], contrib[keep])
        return out

    @ray.remote
    def back_update(delta_q, dist_q, sig_q, upd_q, d):
        new = delta_q.copy()
        m = dist_q == d - 1
        new[m] += sig_q[m] * upd_q[m]
        return new

    @ray.remote
    def acc_update(acc_q, delta_q, dist_q):
        m = (dist_q > 0) & (dist_q < INF)
        new = acc_q.copy()
        new[m] += delta_q[m]
        return new

    acc_refs = [zeros.remote(sizes[p]) for p in range(P)]
    for s in sources:
        dist_refs, sig_refs, maxd = _spath_shards(g, int(s))
        delta_refs = [zeros.remote(sizes[p]) for p in range(P)]
        for d in range(maxd, 0, -1):
            upd_refs = [back_gather.remote(
                g.blocks[p], p, d,
                *dist_refs, *sig_refs, *delta_refs)
                for p in range(P)]
            delta_refs = [back_update.remote(
                delta_refs[q], dist_refs[q], sig_refs[q],
                upd_refs[q], d) for q in range(P)]
        acc_refs = [acc_update.remote(acc_refs[q], delta_refs[q],
                                      dist_refs[q])
                    for q in range(P)]
    if result_out is not None:
        rows = write_shard_results(g, acc_refs, result_out,
                                   "betweenness")
        return {"path": result_out, "rows": rows,
                "column": "betweenness"}
    return assemble(g, acc_refs)


MIS_KEY_STRIDE = 100_000_000


def mis_key(v, r):
    """Deterministic Luby priority for round ``r``, packed with the
    vid tiebreak into one int64 (== the SQL oracle's expression):
    ``walk-hash(v, r) * 1e8 + v`` — requires ``n < 1e8``; raise the
    stride (or split the comparison) past that."""
    M = WALK_MOD
    h = ((v % M) * 7919 + (r % M) * 104729) % M
    return h * MIS_KEY_STRIDE + v


def luby_mis(g: DistGraph, max_rounds=64, result_out=None):
    """Maximal independent set via deterministic Luby rounds: a
    vertex joins the MIS when its priority key is strictly smaller
    than every ACTIVE neighbour's; its neighbours then deactivate.
    Two BSP half-steps per round (neighbour-min of keys, then
    exclusion broadcast), destination-aggregated messages, driver
    sums only change counts. Blocks must hold both directions.

    Returns (state, rounds): state per vertex — 1 = in MIS,
    2 = excluded, 0 = never active (no edges).
    """
    P, n, sizes = g.P, g.n, g.sizes
    BIG = np.iinfo(np.int64).max

    @ray.remote
    def nbr_min(block, state, keys):
        src = block["src_local"]
        k = np.where(state[src] == 0, keys[src], BIG)
        off = block["dst_offsets"]
        outs = []
        for q in range(P):
            sl = slice(int(off[q]), int(off[q + 1]))
            arr = np.full(sizes[q], BIG, dtype=np.int64)
            np.minimum.at(arr, block["dst_local"][sl], k[sl])
            outs.append(arr)
        return outs

    @ray.remote
    def join_mis(state, keys, *incoming):
        m = incoming[0].copy()
        for arr in incoming[1:]:
            np.minimum(m, arr, out=m)
        new = state.copy()
        cand = (state == 0) & (keys < m)
        new[cand] = 1
        return new, int(cand.sum())

    @ray.remote
    def excl_gather(block, state, prev_state):
        src = block["src_local"]
        joined = (state[src] == 1) & (prev_state[src] == 0)
        off = block["dst_offsets"]
        outs = []
        for q in range(P):
            sl = slice(int(off[q]), int(off[q + 1]))
            arr = np.zeros(sizes[q], dtype=bool)
            np.logical_or.at(arr, block["dst_local"][sl], joined[sl])
            outs.append(arr)
        return outs

    @ray.remote
    def exclude(state, *incoming):
        hit = incoming[0].copy()
        for arr in incoming[1:]:
            np.logical_or(hit, arr, out=hit)
        new = state.copy()
        new[(state == 0) & hit] = 2
        return new, int((state == 0).sum() - ((state == 0) & hit).sum())

    # active = vertices with at least one edge
    act_refs, _ = g.active_masks()
    state_refs = []
    for p in range(P):
        act = ray.get(act_refs[p])
        st = np.where(act, 0, 3).astype(np.int64)  # 3 = inactive/no-edge
        state_refs.append(ray.put(st))

    rounds = 0
    for r in range(max_rounds):
        key_refs = [ray.put(mis_key(np.arange(p, n, P, dtype=np.int64),
                                    r)) for p in range(P)]
        prev_refs = state_refs
        msg = [nbr_min.options(num_returns=P).remote(
            g.blocks[p], state_refs[p], key_refs[p]) for p in range(P)]
        outs = [join_mis.options(num_returns=2).remote(
            state_refs[q], key_refs[q],
            *[msg[p][q] for p in range(P)]) for q in range(P)]
        state_refs = [o[0] for o in outs]
        joined = sum(ray.get([o[1] for o in outs]))
        emsg = [excl_gather.options(num_returns=P).remote(
            g.blocks[p], state_refs[p], prev_refs[p])
            for p in range(P)]
        outs = [exclude.options(num_returns=2).remote(
            state_refs[q], *[emsg[p][q] for p in range(P)])
            for q in range(P)]
        state_refs = [o[0] for o in outs]
        remaining = sum(ray.get([o[1] for o in outs]))
        rounds = r + 1
        if remaining == 0:
            break
    @ray.remote
    def norm_state(s):
        out = s.copy()
        out[out == 3] = 0
        return out

    state_refs = [norm_state.remote(s) for s in state_refs]
    return _finish(g, state_refs, rounds, result_out, "state")


def mis_coloring(g: DistGraph, max_colors=256, result_out=None):
    """Distributed greedy graph coloring by iterated Luby layers:
    colour c = maximal independent set of the still-uncoloured
    subgraph. Deterministic (inherits ``mis_key``), parallelism-
    invariant, and every colour class is independent by construction;
    the colour count is within the usual MIS-layering bound (no
    optimality claim). Blocks must hold both directions.

    Returns (colors, n_colors): colour per vertex (-1 = no edges).
    """
    P, n, sizes = g.P, g.n, g.sizes
    BIG = np.iinfo(np.int64).max

    @ray.remote
    def nbr_min(block, avail, keys):
        src = block["src_local"]
        k = np.where(avail[src], keys[src], BIG)
        off = block["dst_offsets"]
        outs = []
        for q in range(P):
            sl = slice(int(off[q]), int(off[q + 1]))
            arr = np.full(sizes[q], BIG, dtype=np.int64)
            np.minimum.at(arr, block["dst_local"][sl], k[sl])
            outs.append(arr)
        return outs

    @ray.remote
    def join(avail, keys, *incoming):
        m = incoming[0].copy()
        for arr in incoming[1:]:
            np.minimum(m, arr, out=m)
        cand = avail & (keys < m)
        return cand, int(cand.sum())

    @ray.remote
    def excl_gather(block, cand):
        src = block["src_local"]
        off = block["dst_offsets"]
        outs = []
        for q in range(P):
            sl = slice(int(off[q]), int(off[q + 1]))
            arr = np.zeros(sizes[q], dtype=bool)
            np.logical_or.at(arr, block["dst_local"][sl],
                             cand[src][sl])
            outs.append(arr)
        return outs

    @ray.remote
    def apply_round(colors, avail, cand, color, *incoming):
        hit = incoming[0].copy()
        for arr in incoming[1:]:
            np.logical_or(hit, arr, out=hit)
        nc = colors.copy()
        nc[cand] = color
        na = avail & ~cand & ~hit     # excluded this MIS round
        return nc, na, int(na.sum()), int(avail.sum() - cand.sum())

    act_refs, _ = g.active_masks()
    color_refs, avail_refs, uncolored = [], [], 0
    for p in range(P):
        act = ray.get(act_refs[p])
        color_refs.append(ray.put(np.full(sizes[p], -1, dtype=np.int64)))
        avail_refs.append(ray.put(act.copy()))
        uncolored += int(act.sum())
    # 'remaining to colour' per colour layer: vertices not yet
    # coloured; within a layer, Luby rounds shrink 'avail'
    color = 0
    remaining_refs = avail_refs
    while uncolored > 0 and color < max_colors:
        # one full MIS over the uncoloured subgraph, Luby round r
        avail_refs = [ray.put(ray.get(r).copy())
                      for r in remaining_refs]
        r = 0
        while True:
            key_refs = [ray.put(mis_key(
                np.arange(p, n, P, dtype=np.int64),
                color * 1000 + r)) for p in range(P)]
            msg = [nbr_min.options(num_returns=P).remote(
                g.blocks[p], avail_refs[p], key_refs[p])
                for p in range(P)]
            outs = [join.options(num_returns=2).remote(
                avail_refs[q], key_refs[q],
                *[msg[p][q] for p in range(P)]) for q in range(P)]
            cand_refs = [o[0] for o in outs]
            joined = sum(ray.get([o[1] for o in outs]))
            emsg = [excl_gather.options(num_returns=P).remote(
                g.blocks[p], cand_refs[p]) for p in range(P)]
            outs = [apply_round.options(num_returns=4).remote(
                color_refs[q], avail_refs[q], cand_refs[q], color,
                *[emsg[p][q] for p in range(P)]) for q in range(P)]
            color_refs = [o[0] for o in outs]
            avail_refs = [o[1] for o in outs]
            left = sum(ray.get([o[2] for o in outs]))
            r += 1
            if left == 0:
                break
        # uncoloured = previous uncoloured minus this colour class
        @ray.remote
        def still_uncolored(colors, rem):
            na = rem & (colors < 0)
            return na, int(na.sum())
        outs = [still_uncolored.options(num_returns=2).remote(
            color_refs[p], remaining_refs[p]) for p in range(P)]
        remaining_refs = [o[0] for o in outs]
        uncolored = sum(ray.get([o[1] for o in outs]))
        color += 1
    return _finish(g, color_refs, color, result_out, "color")


# ----------------------------------------------------------------------
# Greedy maximal matching (locally-dominant edges)
# ----------------------------------------------------------------------
MATCH_KEY_STRIDE = 4_000_000_000_000
MATCH_VID_BOUND = 2_000_000


def match_key(a, b):
    """Deterministic symmetric edge key, unique per unordered pair,
    packed into one int64 (mirrored verbatim by the SQL oracle):
    ``hash(min,max) * 4e12 + min * 2e6 + max``. Uniqueness (required
    for the dominance test — a key tie at a shared endpoint could
    confirm the wrong partner) needs ``n < 2e6``; past that, split
    the comparison into a (hash, min, max) lexicographic tuple
    carried as two message arrays."""
    mn = np.minimum(a, b)
    mx = np.maximum(a, b)
    M = WALK_MOD
    h = ((mn % M) * 7919 + (mx % M) * 104729) % M
    return h * MATCH_KEY_STRIDE + mn * MATCH_VID_BOUND + mx


def maximal_matching(g: DistGraph, max_rounds=256, result_out=None):
    """Greedy maximal matching via locally-dominant edges: per round,
    every active vertex points at its minimum-key active incident
    edge; an edge whose key is the minimum at BOTH endpoints is
    matched and its endpoints deactivate. Keys are fixed hash values,
    so the result is exactly the sequential greedy matching in
    ascending key order (greedy matching is confluent), which the
    serial test oracle and the round-unrolled SQL twin replicate.
    The global minimum active edge is always dominant, so every round
    makes progress; hashed keys give O(log n) expected rounds.

    Blocks must hold both directions, so a vertex's full incidence
    list is resident in its own partition's block: the propose phase
    is partition-local, and only per-destination candidate minima
    (the dominance confirmations) shuffle.

    Returns (partner, rounds): ``partner[v]`` = matched neighbour vid,
    -1 when unmatched. ``result_out=<dir>``: per-shard ``(vid,
    partner)`` parquet, driver sees ``{path, rows, column}``.
    """
    P, n, sizes = g.P, g.n, g.sizes
    if n >= MATCH_VID_BOUND:
        raise ValueError(
            f"packed match_key needs n < {MATCH_VID_BOUND}; split the "
            "key comparison into (hash, min, max) message tuples")
    BIG = np.iinfo(np.int64).max

    @ray.remote
    def propose(p, block, state_p, *dst_states):
        """Partition-local argmin edge per resident vertex + candidate
        minima shipped to each destination partition."""
        src = block["src_local"]
        dst_part = block["dst_part"]
        dst_local = block["dst_local"]
        src_g = src * P + p
        dst_g = dst_local * P + dst_part
        off = block["dst_offsets"]
        dstate = np.empty(len(src), dtype=np.int8)
        for q in range(P):
            sl = slice(int(off[q]), int(off[q + 1]))
            dstate[sl] = dst_states[q][dst_local[sl]]
        ok = (state_p[src] == 0) & (dstate == 0) & (src_g != dst_g)
        ke = np.where(ok, match_key(src_g, dst_g), BIG)
        kmin = np.full(sizes[p], BIG, dtype=np.int64)
        np.minimum.at(kmin, src, ke)
        win = ok & (ke == kmin[src])
        partner = np.full(sizes[p], -1, dtype=np.int64)
        partner[src[win]] = dst_g[win]
        outs = []
        for q in range(P):
            sl = slice(int(off[q]), int(off[q + 1]))
            arr = np.full(sizes[q], BIG, dtype=np.int64)
            m = win[sl]
            np.minimum.at(arr, dst_local[sl][m], ke[sl][m])
            outs.append(arr)
        return [kmin, partner] + outs

    @ray.remote
    def confirm(state_q, partner_prev_q, kmin_q, partner_q, *cands):
        """v is matched iff its own minimum edge came back as a
        candidate (the proposer's minimum too — mutual by key
        uniqueness)."""
        c = cands[0].copy()
        for arr in cands[1:]:
            np.minimum(c, arr, out=c)
        matched = (state_q == 0) & (kmin_q < BIG) & (c == kmin_q)
        ns = state_q.copy()
        ns[matched] = 1
        npart = partner_prev_q.copy()
        npart[matched] = partner_q[matched]
        return ns, npart, int(matched.sum())

    act_refs, _ = g.active_masks()
    state_refs, partner_refs = [], []
    for p in range(P):
        act = ray.get(act_refs[p])
        state_refs.append(ray.put(
            np.where(act, 0, 3).astype(np.int8)))
        partner_refs.append(ray.put(
            np.full(sizes[p], -1, dtype=np.int64)))

    rounds = 0
    for r in range(max_rounds):
        msg = [propose.options(num_returns=2 + P).remote(
            p, g.blocks[p], state_refs[p], *state_refs)
            for p in range(P)]
        outs = [confirm.options(num_returns=3).remote(
            state_refs[q], partner_refs[q], msg[q][0], msg[q][1],
            *[msg[p][2 + q] for p in range(P)]) for q in range(P)]
        state_refs = [o[0] for o in outs]
        partner_refs = [o[1] for o in outs]
        matched = sum(ray.get([o[2] for o in outs]))
        rounds = r + 1
        if matched == 0:
            break
    return _finish(g, partner_refs, rounds, result_out, "partner")


# ----------------------------------------------------------------------
# Batched multi-seed personalized PageRank: S PPR vectors per exchange
# ----------------------------------------------------------------------
def pagerank_batch(g: DistGraph, seed_sets, damping=0.85, tol=0.0,
                   max_iter=20, weighted=False, active=False,
                   result_out=None):
    """S personalized-PageRank vectors fused into ONE superstep
    schedule: vertex state is a (shard_size, S) float64 matrix and
    each gather/reduce exchange carries (dst_shard_size, S) blocks,
    so S seed sets cost one exchange per iteration instead of S runs
    — at cluster scale the fixed superstep latency dominates a
    single-seed run, making this the batch form for PPR similarity
    features / recommendation candidates (same semantics per column
    as ``pagerank(personalize=seed_sets[s])``: teleport AND dangling
    mass uniform over that column's seeds).

    ``tol``: stop when the summed per-column L1 delta drops below it
    (0.0 = fixed ``max_iter``, the oracle form). ``result_out=<dir>``
    writes long-format ``(vid, seed, rank)`` parquet per shard (seed
    = the column index into ``seed_sets``) and returns
    ``({"path", "rows", "column"}, iters)``."""
    P, n, sizes = g.P, g.n, g.sizes
    S = len(seed_sets)
    if S == 0:
        raise ValueError("seed_sets must be non-empty")
    if active:
        act_refs, _n_eff = g.active_masks()
    else:
        act_refs = [None] * P
    pv_refs = []
    for p in range(P):
        m = np.zeros((sizes[p], S))
        for s, seeds in enumerate(seed_sets):
            seeds = np.asarray(seeds, dtype=np.int64)
            if len(seeds) == 0:
                raise ValueError(f"seed set {s} is empty")
            sp = seeds[seeds % P == p]
            m[sp // P, s] = 1.0 / len(seeds)
        pv_refs.append(ray.put(m))
    norm_refs = g.out_strength if weighted else g.out_deg

    @ray.remote
    def init_shard(act, pvec):
        r = pvec.copy()
        if act is not None:
            r[~act] = 0.0
        return r

    @ray.remote
    def gather(block, rank, norm):
        src_contrib = np.zeros_like(rank)
        nz = norm > 0
        src_contrib[nz] = rank[nz] / norm[nz, None]
        per_edge = src_contrib[block["src_local"]]
        if weighted:
            per_edge = per_edge * block["weight"][:, None]
        off = block["dst_offsets"]
        outs = []
        for q in range(P):
            sl = slice(int(off[q]), int(off[q + 1]))
            arr = np.zeros((sizes[q], S))
            np.add.at(arr, block["dst_local"][sl], per_edge[sl])
            outs.append(arr)
        return outs if P > 1 else outs + [None]

    @ray.remote
    def dangling_of(rank, norm, act):
        m = norm <= 0 if act is None else (act & (norm <= 0))
        return rank[m].sum(axis=0)

    @ray.remote
    def reduce(old, dang, act, pvec, *incoming):
        new = pvec * (1.0 - damping + damping * dang)[None, :]
        for arr in incoming:
            new += damping * arr
        if act is not None:
            new[~act] = 0.0
        return new, float(np.abs(new - old).sum())

    rank_refs = [init_shard.remote(act_refs[p], pv_refs[p])
                 for p in range(P)]
    it = -1
    for it in range(max_iter):
        msg_refs = [gather.options(num_returns=max(P, 2)).remote(
            g.blocks[p], rank_refs[p], norm_refs[p])
            for p in range(P)]
        dang = np.sum(ray.get([dangling_of.remote(
            rank_refs[p], norm_refs[p], act_refs[p])
            for p in range(P)]), axis=0)
        outs = [reduce.options(num_returns=2).remote(
            rank_refs[q], dang, act_refs[q], pv_refs[q],
            *[msg_refs[p][q] for p in range(P)]) for q in range(P)]
        rank_refs = [o[0] for o in outs]
        delta = sum(ray.get([o[1] for o in outs]))
        if tol > 0 and delta < tol:
            break

    if result_out is not None:
        @ray.remote
        def write_long(shard, p):
            import os
            import pyarrow as pa
            import pyarrow.parquet as pq
            os.makedirs(result_out, exist_ok=True)
            path = os.path.join(result_out,
                                f"part-{p:05d}.parquet")
            if os.path.exists(path):
                return shard.size
            vids = np.repeat(p + P * np.arange(len(shard),
                                               dtype=np.int64), S)
            seed = np.tile(np.arange(S, dtype=np.int64), len(shard))
            tmp = path + f".tmp-{os.getpid()}"
            pq.write_table(pa.table({
                "vid": pa.array(vids), "seed": pa.array(seed),
                "rank": pa.array(shard.ravel())}), tmp)
            os.replace(tmp, path)
            return shard.size

        rows = int(sum(ray.get([write_long.remote(rank_refs[p], p)
                                for p in range(P)])))
        return {"path": result_out, "rows": rows,
                "column": "rank"}, it + 1
    out = np.zeros((n, S))
    for p in range(P):
        out[p::P] = ray.get(rank_refs[p])
    return out, it + 1


# ----------------------------------------------------------------------
# Truncated expected hitting time to a target set (value iteration)
# ----------------------------------------------------------------------
def hitting_time(g: DistGraph, targets, iters=30, weighted=False,
                 result_out=None):
    """Expected steps of the (weighted) random walk to reach the
    target set, truncated at ``iters`` (value iteration from h=0:
    h_{t}(v) = 0 for targets, else 1 + sum_u P(v,u) h_{t-1}(u) with
    P(v,u) = w(v,u)/strength(v) — after K sweeps h equals the
    expectation of min(hitting time, K)'s Bellman truncation, the
    fixed-iteration form the SQL oracle replays). Messages push
    w*h(src) along src->dst edges and divide by strength at the
    destination, so the symmetric-graph gather is the same exchange
    shape as PageRank. ``result_out=`` shares ``_finish``."""
    P, n, sizes = g.P, g.n, g.sizes
    targets = np.asarray(targets, dtype=np.int64)
    tgt_refs = []
    for p in range(P):
        m = np.zeros(sizes[p], dtype=bool)
        tp = targets[targets % P == p]
        m[tp // P] = True
        tgt_refs.append(ray.put(m))
    norm_refs = g.out_strength if weighted else g.out_deg

    @ray.remote
    def gather(block, h):
        per_edge = h[block["src_local"]]
        if weighted:
            per_edge = per_edge * block["weight"]
        off = block["dst_offsets"]
        outs = []
        for q in range(P):
            sl = slice(int(off[q]), int(off[q + 1]))
            arr = np.zeros(sizes[q])
            np.add.at(arr, block["dst_local"][sl], per_edge[sl])
            outs.append(arr)
        return outs if P > 1 else outs + [None]

    @ray.remote
    def reduce(norm, tgt, *incoming):
        acc = np.zeros(len(norm))
        for arr in incoming:
            acc += arr
        new = np.zeros(len(norm))
        nz = norm > 0
        new[nz] = 1.0 + acc[nz] / norm[nz]
        new[~nz] = 0.0   # isolated vertices never move: undefined, 0
        new[tgt] = 0.0
        return new

    h_refs = [ray.put(np.zeros(sizes[p])) for p in range(P)]
    for _ in range(iters):
        msg = [gather.options(num_returns=max(P, 2)).remote(
            g.blocks[p], h_refs[p]) for p in range(P)]
        h_refs = [reduce.remote(norm_refs[q], tgt_refs[q],
                                *[msg[p][q] for p in range(P)])
                  for q in range(P)]
    return _finish(g, h_refs, iters, result_out, "hitting_time")


# ----------------------------------------------------------------------
# HyperANF: neighbourhood function via per-vertex HLL sketches
# ----------------------------------------------------------------------
def hyperanf(g: DistGraph, rounds=8, result_out=None,
             checkpoint=None):
    """HyperANF (Boldi, Rosa & Vigna, WWW 2011): the neighbourhood
    function NF(t) = sum_v |ball(v, t)| estimated with one 64-register
    HyperLogLog sketch per vertex, max-merged along edges each
    superstep — THE scalable effective-diameter algorithm for web
    graphs (exact multi-BFS ships O(n) per seed; this ships 64
    bytes/vertex total and covers EVERY vertex).

    Same superstep shape as connected components (CC is this kernel
    with a min over one int64): per-block destination-partition
    pre-aggregation, worker-to-worker message refs, elementwise max
    combine — idempotent and order-free, so the result is
    deterministic at any P. Registers/estimator are the gate-proven
    ``stages/sketch.py`` HLL (md5 hash32, exact-integer inner sums,
    the bit-identical-in-SQL estimator); per-vertex estimates are
    quantised to 1e-6 fixed point BEFORE summing so NF itself is an
    exact integer sum — partitioning-independent.

    Returns ``(nf_q, rounds_run)`` — ``nf_q[t]`` = the integer
    1e-6-fixed-point NF estimate over active vertices at hop t,
    t = 0..rounds (early exit at the fixed point, where the last two
    entries are equal). Inactive (edgeless) vertices carry empty
    sketches and contribute 0. With ``result_out=<dir>`` the FINAL
    per-vertex ball estimates also write per shard (column
    ``ball_est``, the o(n)-driver seam) and the return becomes
    ``({path, rows, column}, nf_q, rounds_run)``.
    ``checkpoint=<root>`` saves the register shards + the NF prefix
    per round through ``CheckpointManager`` (the standard kernel
    resume contract).
    """
    from ..stages.sketch import (HLL_M, HLL_REM_BITS, HLL_RHO_MAX,
                                 hash32, hll_estimate_from_sums)
    P, n, sizes = g.P, g.n, g.sizes
    masks, _ = g.active_masks()

    @ray.remote
    def init(mask, p):
        loc = np.flatnonzero(mask)
        reg = np.zeros((len(mask), HLL_M), dtype=np.uint8)
        if len(loc):
            vids = p + P * loc.astype(np.int64)
            h = hash32(vids)
            bucket = (h >> HLL_REM_BITS).astype(np.int64)
            rem = h & ((1 << HLL_REM_BITS) - 1)
            bl = np.zeros(len(rem), dtype=np.int64)
            x = rem.copy()
            while (x > 0).any():
                nz = x > 0
                bl[nz] += 1
                x = x >> 1
            rho = HLL_RHO_MAX - bl
            reg[loc, bucket] = rho.astype(np.uint8)
        return reg

    def _est_q(reg):
        pres = reg > 0
        npres = pres.sum(axis=1).astype(np.int64)
        vals = np.where(pres,
                        np.int64(1) << (HLL_RHO_MAX
                                        - reg.astype(np.int64)),
                        np.int64(0))
        est = hll_estimate_from_sums(vals.sum(axis=1), npres)
        est[npres == 0] = 0.0      # empty sketch = inactive vertex
        return np.floor(est * 1e6 + 0.5).astype(np.int64)

    @ray.remote
    def est_sum(reg):
        return int(_est_q(reg).sum())

    @ray.remote
    def est_arr(reg):
        return _est_q(reg) / 1e6

    @ray.remote
    def gather(block, reg):
        per_edge = reg[block["src_local"]]
        off = block["dst_offsets"]
        outs = []
        for q in range(P):
            sl = slice(int(off[q]), int(off[q + 1]))
            arr = np.zeros((sizes[q], HLL_M), dtype=np.uint8)
            np.maximum.at(arr, block["dst_local"][sl], per_edge[sl])
            outs.append(arr)
        return outs

    @ray.remote
    def reduce(old, *incoming):
        new = old.copy()
        for arr in incoming:
            np.maximum(new, arr, out=new)
        return new, int((new != old).any(axis=1).sum())

    ckpt = CheckpointManager(checkpoint, "hyperanf", P, n=n) \
        if checkpoint else None
    nf = None
    start = 1
    done = False
    if ckpt is not None:
        resumed = ckpt.resume()
        if resumed is not None:
            step, shards, metrics = resumed
            reg_refs = [ray.put(s) for s in shards]
            nf = [int(v) for v in metrics["nf"]]
            start = step + 1
            done = metrics.get("changed", -1) == 0
            t = step
    if nf is None:
        reg_refs = [init.remote(masks[p], p) for p in range(P)]
        nf = [int(sum(ray.get([est_sum.remote(r)
                               for r in reg_refs])))]
        t = 0
    if not done:
        for t in range(start, rounds + 1):
            msg_refs = [gather.options(num_returns=max(P, 2)).remote(
                g.blocks[p], reg_refs[p]) for p in range(P)]
            outs = [reduce.options(num_returns=2).remote(
                reg_refs[q], *[msg_refs[p][q] for p in range(P)])
                for q in range(P)]
            reg_refs = [o[0] for o in outs]
            changed = sum(ray.get([o[1] for o in outs]))
            nf.append(int(sum(ray.get([est_sum.remote(r)
                                       for r in reg_refs]))))
            if ckpt is not None:
                ckpt.save(t, ray.get(reg_refs),
                          metrics={"changed": changed, "nf": nf})
            if changed == 0:
                break
    nf_q = np.asarray(nf, dtype=np.int64)
    if result_out is None:
        return nf_q, t
    ball_refs = [est_arr.remote(r) for r in reg_refs]
    rows = write_shard_results(g, ball_refs, result_out, "ball_est")
    return ({"path": result_out, "rows": rows,
             "column": "ball_est"}, nf_q, t)


def hyperball_harmonic(g: DistGraph, rounds=8, result_out=None,
                       weight="harmonic"):
    """HyperBall geometric-centrality approximation (Boldi & Vigna,
    "In-core computation of geometric centralities with HyperBall",
    ICDMW 2013) over the same per-vertex HLL sketches as
    ``hyperanf`` — per-vertex closeness-family centrality for EVERY
    vertex at 64 bytes/vertex, where the exact kernel
    (``harmonic_centrality``) ships one BFS per seed.

    ``weight="harmonic"``: ``harm(v) ~= sum_t (|ball(v,t)| -
    |ball(v,t-1)|)/t`` (harmonic centrality; float accumulator in
    fixed t order). ``weight="distance"``: ``sumdist_q(v) = sum_t
    t * (est_q(v,t) - est_q(v,t-1))`` — the total-distance numerator
    of closeness / average distance / Lin's index as an EXACT
    1e-6-fixed-point INTEGER (order-free => SQL-twinnable); the
    caller divides by its reachable-count estimate.

    Same gather/reduce as ``hyperanf``; additionally each shard keeps
    (prev_est_q, acc) and folds ``acc += ((new_q - prev_q)/1e6)/t``
    (or ``* t``) after every round — est_q are the 1e-6-quantised
    integer estimates, so the accumulator is a fixed-length sum of
    deterministic doubles in a fixed order: P-independent. Returns
    ``(acc, rounds_run)`` — dense float64 (or the ``result_out``
    descriptor, column ``harmonic_est`` / ``sumdist_est``)."""
    if weight not in ("harmonic", "distance"):
        raise ValueError(f"unknown weight mode {weight!r}")
    from ..stages.sketch import (HLL_M, HLL_REM_BITS, HLL_RHO_MAX,
                                 hash32, hll_estimate_from_sums)
    P, n, sizes = g.P, g.n, g.sizes
    masks, _ = g.active_masks()

    def _est_q(reg):
        pres = reg > 0
        npres = pres.sum(axis=1).astype(np.int64)
        vals = np.where(pres,
                        np.int64(1) << (HLL_RHO_MAX
                                        - reg.astype(np.int64)),
                        np.int64(0))
        est = hll_estimate_from_sums(vals.sum(axis=1), npres)
        est[npres == 0] = 0.0
        return np.floor(est * 1e6 + 0.5).astype(np.int64)

    @ray.remote
    def init(mask, p):
        loc = np.flatnonzero(mask)
        reg = np.zeros((len(mask), HLL_M), dtype=np.uint8)
        if len(loc):
            vids = p + P * loc.astype(np.int64)
            h = hash32(vids)
            bucket = (h >> HLL_REM_BITS).astype(np.int64)
            rem = h & ((1 << HLL_REM_BITS) - 1)
            bl = np.zeros(len(rem), dtype=np.int64)
            x = rem.copy()
            while (x > 0).any():
                nz = x > 0
                bl[nz] += 1
                x = x >> 1
            reg[loc, bucket] = (HLL_RHO_MAX - bl).astype(np.uint8)
        # int64 zeros: harmonic's first float add promotes to
        # float64; distance mode stays exact-integer throughout
        return reg, _est_q(reg), np.zeros(len(mask), dtype=np.int64)

    @ray.remote
    def gather(block, reg):
        per_edge = reg[block["src_local"]]
        off = block["dst_offsets"]
        outs = []
        for q in range(P):
            sl = slice(int(off[q]), int(off[q + 1]))
            arr = np.zeros((sizes[q], HLL_M), dtype=np.uint8)
            np.maximum.at(arr, block["dst_local"][sl], per_edge[sl])
            outs.append(arr)
        return outs

    @ray.remote
    def reduce(old, prev_q, acc, t, harmonic, *incoming):
        new = old.copy()
        for arr in incoming:
            np.maximum(new, arr, out=new)
        new_q = _est_q(new)
        if harmonic:
            # float accumulator, fixed t-order (matches the serial
            # replica term by term)
            acc = acc + ((new_q - prev_q) / 1e6) / t
        else:
            # EXACT integer accumulator: sum of Δq * t is
            # order-free, so an SQL twin can sum it as integers
            acc = acc + (new_q - prev_q) * t
        changed = int((new != old).any(axis=1).sum())
        return new, new_q, acc, changed

    inits = [init.options(num_returns=3).remote(masks[p], p)
             for p in range(P)]
    reg_refs = [i[0] for i in inits]
    prev_refs = [i[1] for i in inits]
    acc_refs = [i[2] for i in inits]
    t = 0
    for t in range(1, rounds + 1):
        msg_refs = [gather.options(num_returns=max(P, 2)).remote(
            g.blocks[p], reg_refs[p]) for p in range(P)]
        outs = [reduce.options(num_returns=4).remote(
            reg_refs[q], prev_refs[q], acc_refs[q], t,
            weight == "harmonic",
            *[msg_refs[p][q] for p in range(P)])
            for q in range(P)]
        reg_refs = [o[0] for o in outs]
        prev_refs = [o[1] for o in outs]
        acc_refs = [o[2] for o in outs]
        changed = sum(ray.get([o[3] for o in outs]))
        if changed == 0:
            break
    col = "harmonic_est" if weight == "harmonic" else "sumdist_est"
    return _finish(g, acc_refs, t, result_out, col)
