"""Distributed Leiden (SURVEY.md §4.3.2, §7.1.4).

Level 0 — where the graph is huge — runs as synchronous supersteps over
the partitioned CSR blocks:

1. *gather/propose*: P tasks, each computes per-vertex
   neighbour-community weights (partial-aggregated inside the block)
   and the exact quality delta for every candidate move against the
   committed snapshot (broadcast membership + community stats, read
   zero-copy from the object store); only vertices in the active
   hash-colour class propose.
2. *commit*: the driver applies the colour class's proposals, then a
   distributed stats pass recomputes community internal weights
   (per-block partials, combined on the driver). Quality is evaluated
   each superstep; if a parallel commit ever decreases it (conflicting
   moves), the step is rolled back and a non-interfering subset
   (greedy by delta, one move per touched community) is applied
   instead — so quality is monotone non-decreasing like the
   reference's sequential queue, and the fixed point satisfies the
   same node-optimality property (reference
   ``tests/test_Optimiser.py:84-94``).

After level-0 convergence the aggregate graph is orders of magnitude
smaller (SURVEY.md §7.0): refinement runs per-community in parallel
tasks using the in-memory kernel on induced subgraphs, the aggregate
is built from per-block partial sums, and the remaining levels run the
exact in-memory schedule (``leidenalg_ray.optimiser``) — the identical
semantics at P=1.

Only the linear quality families run distributed (Modularity,
RBConfiguration, RBER, CPM, Significance); Surprise's nonlinear
combine needs global sums per candidate move — use the in-memory tier.
"""

from __future__ import annotations

import numpy as np
import ray

from ..graph import Graph
from ..partition import (
    CPMVertexPartition,
    ModularityVertexPartition,
    RBConfigurationVertexPartition,
    RBERVertexPartition,
    SignificanceVertexPartition,
)
from ..optimiser import Optimiser

PARTITION_TYPES = {
    "modularity": ModularityVertexPartition,
    "rb_configuration": RBConfigurationVertexPartition,
    "rber": RBERVertexPartition,
    "cpm": CPMVertexPartition,
    "significance": SignificanceVertexPartition,
}


class _ScalarGraph:
    """Just enough graph surface for the quality plugins: global
    scalars + possible_edges."""

    def __init__(self, n, directed, total_weight, total_size):
        self.n = n
        self.directed = directed
        self.total_weight = total_weight
        self.total_size = total_size

    def possible_edges(self, size, correct_self_loops=False):
        size = np.asarray(size, dtype=np.float64)
        denom = 1.0 if self.directed else 2.0
        if correct_self_loops:
            return size * size / denom
        return size * (size - 1.0) / denom


def _make_qf(quality, sg, gamma, correct_self_loops):
    from ..quality import QUALITY_REGISTRY
    cls = QUALITY_REGISTRY[quality]
    return cls(sg, resolution_parameter=gamma,
               correct_self_loops=correct_self_loops)


@ray.remote
def _propose(edges, mem, stats, scal, color, n_colors, superstep_salt):
    """Gather + propose for one partition.

    edges: dict(src_local, dst_global, weight, vid_base, P) sorted by
    src_local (symmetrised incidence: weight(v,c) sums each edge once
    from v's side; for directed graphs the pair carries w_to + w_from
    combined, which is exactly what the quality delta needs).
    mem: full membership array (broadcast, zero-copy).
    stats: dict of label-indexed arrays w_in, s_out, s_in, size.
    scal: dict of scalars incl. quality config + per-vertex arrays
    k_out, k_in, loop_w, node_size (broadcast once per run, not per
    step).
    Returns proposals (vid, target, dq) for the active colour class.
    """
    EMPTY = (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0),
             np.empty(0), np.empty(0))
    src_local = edges["src_local"]
    if len(src_local) == 0:
        return EMPTY
    P = scal["P"]
    vid_base = edges["vid_base"]  # global vid = src_local * P + vid_base
    M = scal["label_space"]
    sg = _ScalarGraph(scal["n"], scal["directed"], scal["m"],
                      scal["total_size"])
    qf = _make_qf(scal["quality"], sg, scal["gamma"],
                  scal["correct_self_loops"])
    scale = qf.linear_scale()
    gamma = scal["gamma"]

    dst_comm = mem[edges["dst_global"]]
    key = src_local.astype(np.int64) * M + dst_comm
    uniq, inv = np.unique(key, return_inverse=True)
    w_vc = np.zeros(len(uniq))
    np.add.at(w_vc, inv, edges["weight"])
    pv = (uniq // M).astype(np.int64)   # src_local per pair
    pc_ = (uniq % M).astype(np.int64)   # candidate community per pair

    vids = pv * P + vid_base            # global vid per pair
    # active colour class (deterministic hash colouring)
    h = (vids * np.int64(2654435761)) & np.int64(0x7FFFFFFF)
    active = (h % n_colors) == color
    cur = mem[vids]

    # per-vertex weight to current community, as a dense local-vertex
    # indexed array (vectorised; no per-pair Python lookups)
    is_cur = pc_ == cur
    max_loc = int(pv.max()) + 1
    w_cur_arr = np.zeros(max_loc)
    sel = is_cur & active
    w_cur_arr[pv[sel]] = w_vc[sel]

    cand = active & ~is_cur
    if not cand.any():
        return EMPTY
    ci = np.flatnonzero(cand)
    v_loc = pv[ci]
    vids_c = vids[ci]
    cs = pc_[ci]
    wv = w_vc[ci]
    cur_c = cur[ci]
    w_cur = w_cur_arr[v_loc]

    k_out = scal["k_out"][vids_c]
    k_in = scal["k_in"][vids_c]
    loop = scal["loop_w"][vids_c]
    nsz = scal["node_size"][vids_c]

    W, SO, SI, SZ = (stats["w_in"], stats["s_out"], stats["s_in"],
                     stats["size"])

    def term(w, so, si, sz):
        return np.atleast_2d(qf.term(w, so, si, sz, gamma))[0]

    d_new = term(W[cs] + wv + loop, SO[cs] + k_out, SI[cs] + k_in,
                 SZ[cs] + nsz) - term(W[cs], SO[cs], SI[cs], SZ[cs])
    d_old = term(W[cur_c] - w_cur - loop, SO[cur_c] - k_out,
                 SI[cur_c] - k_in, SZ[cur_c] - nsz) \
        - term(W[cur_c], SO[cur_c], SI[cur_c], SZ[cur_c])
    dq = scale * (d_new + d_old)
    max_size = scal.get("max_comm_size", 0)
    if max_size > 0:
        dq = np.where(SZ[cs] + nsz > max_size, -np.inf, dq)

    # empty-community candidate per active vertex (label = n + vid)
    vu, first = np.unique(v_loc, return_index=True)
    vids_u = vu * P + vid_base
    cur_u = mem[vids_u]
    w_cur_u = w_cur_arr[vu]
    k_out_u = scal["k_out"][vids_u]
    k_in_u = scal["k_in"][vids_u]
    loop_u = scal["loop_w"][vids_u]
    nsz_u = scal["node_size"][vids_u]
    zero = np.zeros(len(vu))
    d_new_e = term(zero + loop_u, k_out_u, k_in_u, nsz_u) \
        - term(zero, zero, zero, zero)
    d_old_e = term(W[cur_u] - w_cur_u - loop_u, SO[cur_u] - k_out_u,
                   SI[cur_u] - k_in_u, SZ[cur_u] - nsz_u) \
        - term(W[cur_u], SO[cur_u], SI[cur_u], SZ[cur_u])
    dq_e = scale * (d_new_e + d_old_e)
    # only meaningful if the vertex is not alone in its community
    alone = (SZ[cur_u] - nsz_u) <= 0
    dq_e[alone] = -np.inf
    empty_target = scal["n"] + vids_u

    # combine: per-vertex argmax over neighbour candidates + empty
    all_v = np.concatenate([vids_c, vids_u])
    all_t = np.concatenate([cs, empty_target])
    all_d = np.concatenate([dq, dq_e])
    all_wnew = np.concatenate([wv, np.zeros(len(vu))])
    # w(v, current comm) aligned per row
    all_wcur = np.concatenate([w_cur, w_cur_u])
    order = np.lexsort((all_t, -all_d, all_v))
    av, at, ad = all_v[order], all_t[order], all_d[order]
    awn, awc = all_wnew[order], all_wcur[order]
    firstmask = np.ones(len(av), dtype=bool)
    firstmask[1:] = av[1:] != av[:-1]
    bv, bt, bd = av[firstmask], at[firstmask], ad[firstmask]
    bwn, bwc = awn[firstmask], awc[firstmask]
    good = bd > 1e-10
    return bv[good], bt[good], bd[good], bwn[good], bwc[good]


@ray.remote
def _internal_weight_partials(edges, mem, label_space):
    """Per-community internal weight partial sums for one block:
    (labels, w_nonloop, w_loop). Non-loop symmetrised edges are counted
    from both sides across blocks -> driver divides by 2."""
    src_g = edges["src_local"] * edges["P"] + edges["vid_base"]
    dst_g = edges["dst_global"]
    same = mem[src_g] == mem[dst_g]
    lab = mem[src_g[same]]
    w = edges["weight"][same]
    isloop = src_g[same] == dst_g[same]
    uniq, inv = np.unique(lab, return_inverse=True)
    wn = np.zeros(len(uniq))
    wl = np.zeros(len(uniq))
    np.add.at(wn, inv[~isloop], w[~isloop])
    np.add.at(wl, inv[isloop], w[isloop])
    return uniq, wn, wl


@ray.remote
def _internal_edges(edges, mem):
    """Internal (same-community) edges of one block, canonicalised
    src<=dst so the symmetrised duplicates collapse. Used to extract
    per-community induced subgraphs for distributed refinement."""
    src_g = edges["src_local"] * edges["P"] + edges["vid_base"]
    dst_g = edges["dst_global"]
    same = (mem[src_g] == mem[dst_g]) & ~edges["is_rev"]
    return (src_g[same], dst_g[same], edges["weight"][same],
            mem[src_g[same]])


@ray.remote
def _refine_comms(sub_edges_list, quality, gamma, correct_self_loops,
                  directed, seed, max_comm_size=0):
    """Refine a batch of communities: singleton partition per induced
    subgraph, merge-constrained using the exact in-memory kernel.
    Returns (vids, refined_label) with labels globally unique (label =
    global vid of the refined community's first member)."""
    out_v, out_l = [], []
    for (vids, src, dst, w, nsz) in sub_edges_list:
        remap = {int(v): i for i, v in enumerate(vids)}
        ls = np.array([remap[int(x)] for x in src], dtype=np.int64)
        ld = np.array([remap[int(x)] for x in dst], dtype=np.int64)
        g = Graph(len(vids), src=ls, dst=ld, weights=w, node_sizes=nsz,
                  directed=directed)
        cls = PARTITION_TYPES[quality]
        part = cls.__new__(cls)
        from ..partition import MutableVertexPartition
        MutableVertexPartition.__init__(
            part, g, initial_membership=None,
            resolution_parameter=gamma,
            correct_self_loops=correct_self_loops, _validate=False)
        opt = Optimiser()
        opt.set_rng_seed(seed)
        opt.max_comm_size = max_comm_size
        opt.merge_nodes_constrained(part, part._new_like(
            g, np.zeros(len(vids), dtype=np.int64)))
        local_mem = np.asarray(part.membership)
        # label = global vid of the smallest member of the refined comm
        labels = np.full(local_mem.max() + 1, -1, dtype=np.int64)
        for i in range(len(vids)):
            c = local_mem[i]
            if labels[c] < 0:
                labels[c] = vids[i]
        out_v.append(np.asarray(vids, dtype=np.int64))
        out_l.append(labels[local_mem])
    if not out_v:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(out_v), np.concatenate(out_l)


class DistLeiden:
    """Distributed Leiden driver. Hybrid: distributed level 0 + exact
    in-memory tail on the (small) aggregate."""

    def __init__(self, src, dst, weight=None, n=None, directed=False,
                 quality="cpm", resolution_parameter=1.0, P=8, seed=42,
                 n_colors=2, node_sizes=None, correct_self_loops=None,
                 max_comm_size=0):
        src = np.asarray(src, dtype=np.int64)
        dst = np.asarray(dst, dtype=np.int64)
        if n is None:
            n = int(max(src.max(initial=-1), dst.max(initial=-1))) + 1
        if weight is None:
            weight = np.ones(len(src))
        weight = np.asarray(weight, dtype=np.float64)
        self.n, self.P, self.directed = int(n), int(P), bool(directed)
        self.quality = quality
        self.gamma = float(resolution_parameter)
        self.seed = seed
        self.n_colors = int(n_colors)
        self.src, self.dst, self.weight = src, dst, weight
        self.node_size = (np.ones(n) if node_sizes is None
                          else np.asarray(node_sizes, dtype=np.float64))

        loop = src == dst
        self.loop_w = np.zeros(n)
        np.add.at(self.loop_w, src[loop], weight[loop])
        self.k_out = np.zeros(n)
        self.k_in = np.zeros(n)
        if directed:
            np.add.at(self.k_out, src, weight)
            np.add.at(self.k_in, dst, weight)
        else:
            np.add.at(self.k_out, src[~loop], weight[~loop])
            np.add.at(self.k_out, dst[~loop], weight[~loop])
            self.k_out += 2.0 * self.loop_w
            self.k_in = self.k_out
        self.m = float(weight.sum())
        self.total_size = float(self.node_size.sum())
        if correct_self_loops is None:
            correct_self_loops = (bool(loop.any()) if quality == "cpm"
                                  else False)
        self.correct_self_loops = bool(correct_self_loops)
        self.max_comm_size = int(max_comm_size)

        # symmetrised incidence blocks keyed by source partition
        nl = ~loop
        s2 = np.concatenate([src, dst[nl]])
        d2 = np.concatenate([dst, src[nl]])
        w2 = np.concatenate([weight, weight[nl]])
        rev = np.concatenate([np.zeros(len(src), dtype=bool),
                              np.ones(int(nl.sum()), dtype=bool)])
        self.block_refs = []
        for p in range(P):
            msk = (s2 % P) == p
            order = np.argsort(s2[msk] // P, kind="stable")
            self.block_refs.append(ray.put({
                "src_local": (s2[msk] // P)[order],
                "dst_global": d2[msk][order],
                "weight": w2[msk][order],
                "is_rev": rev[msk][order],
                "vid_base": p,
                "P": P,
            }))
        self.scal_ref = ray.put({
            "P": P, "n": n, "m": self.m, "total_size": self.total_size,
            "directed": self.directed, "quality": quality,
            "gamma": self.gamma,
            "correct_self_loops": self.correct_self_loops,
            "max_comm_size": int(max_comm_size),
            "label_space": 2 * n,
            "k_out": self.k_out, "k_in": self.k_in,
            "loop_w": self.loop_w, "node_size": self.node_size,
        })

    # ------------------------------------------------------------------
    def _stats_of(self, mem):
        """Community stats arrays (label-indexed, size 2n): driver
        computes strength/size sums O(n); internal weights come from
        per-block distributed partials."""
        L = 2 * self.n
        w_in = np.zeros(L)
        s_out = np.zeros(L)
        s_in = np.zeros(L)
        size = np.zeros(L)
        np.add.at(s_out, mem, self.k_out)
        np.add.at(s_in, mem, self.k_in)
        np.add.at(size, mem, self.node_size)
        mem_ref = ray.put(mem)
        parts = ray.get([_internal_weight_partials.remote(
            b, mem_ref, L) for b in self.block_refs])
        for labs, wn, wl in parts:
            w_in[labs] += wn / 2.0 + wl
        return {"w_in": w_in, "s_out": s_out, "s_in": s_in, "size": size}, \
            mem_ref

    def _quality_of(self, stats):
        sg = _ScalarGraph(self.n, self.directed, self.m, self.total_size)
        qf = _make_qf(self.quality, sg, self.gamma, self.correct_self_loops)
        nz = (stats["size"] > 0) | (stats["w_in"] != 0)
        t = np.atleast_2d(qf.term(stats["w_in"][nz], stats["s_out"][nz],
                                  stats["s_in"][nz], stats["size"][nz],
                                  self.gamma))
        agg = t.sum(axis=1)
        return float(qf.combine(agg if qf.term_dim > 1 else agg[0],
                                self.gamma))

    # ------------------------------------------------------------------
    def local_move_level0(self, mem=None, max_supersteps=200,
                          min_rel_improvement=1e-9, checkpoint=None,
                          level_tag="L0"):
        """Distributed local move to the fixed point. Returns (mem,
        quality, n_supersteps, history).

        Commits are applied incrementally on the driver (strength/size
        updates are exact; community internal weights can drift when
        same-step moves interact). Once per colour cycle the stats are
        recomputed distributed and quality verified: a cycle that
        *decreased* quality (conflicting parallel moves) is rolled back
        and re-run in safe mode — per-step recompute plus a greedy
        non-interfering subset (one move per touched community) — so
        quality is monotone non-decreasing across cycles like the
        reference's sequential queue. When a cycle commits few moves
        (low conflict probability) the colour count adaptively drops to
        1, halving the scheduler-latency-bound rounds in the
        convergence tail. Convergence: a cycle with no moves, or
        relative improvement below ``min_rel_improvement`` (kills
        zero-gain ping-pong oscillations)."""
        from .checkpoint import CheckpointManager

        mem = (np.arange(self.n, dtype=np.int64) if mem is None
               else np.asarray(mem, dtype=np.int64).copy())
        ckpt = (CheckpointManager(checkpoint, f"leiden-{level_tag}",
                                  self.P) if checkpoint else None)
        start_cycle = 0
        if ckpt is not None:
            resumed = ckpt.resume()
            if resumed is not None:
                start_cycle, shards, metrics = resumed
                mem = np.concatenate(shards)[np.argsort(
                    np.concatenate([np.arange(p, self.n, self.P)
                                    for p in range(self.P)]))]
                if metrics.get("converged"):
                    stats, _ = self._stats_of(mem)
                    return (mem, self._quality_of(stats),
                            int(metrics.get("step", 0)), [])
        stats, mem_ref = self._stats_of(mem)
        q = self._quality_of(stats)
        history = []
        step = 0
        cycle_no = 0
        cur_colors = self.n_colors
        while step < max_supersteps:
            q_cycle_start = q
            cycle_mem = mem.copy()
            cycle_moves = 0
            for color in range(cur_colors):
                stats_ref = ray.put(stats)
                props = ray.get([_propose.remote(
                    b, mem_ref, stats_ref, self.scal_ref, color,
                    cur_colors, step) for b in self.block_refs])
                vids = np.concatenate([p[0] for p in props])
                targs = np.concatenate([p[1] for p in props])
                dqs = np.concatenate([p[2] for p in props])
                wnew = np.concatenate([p[3] for p in props])
                wcur = np.concatenate([p[4] for p in props])
                step += 1
                if len(vids) and self.max_comm_size > 0:
                    # parallel joins may overshoot the hard cap:
                    # greedy admit by delta, tracking running sizes
                    order = np.argsort(-dqs, kind="stable")
                    run_size = stats["size"].copy()
                    admit = np.zeros(len(vids), dtype=bool)
                    for i in order:
                        t_ = int(targs[i])
                        nsv = self.node_size[vids[i]]
                        if run_size[t_] + nsv <= self.max_comm_size:
                            run_size[t_] += nsv
                            run_size[int(mem[vids[i]])] -= nsv
                            admit[i] = True
                    vids, targs = vids[admit], targs[admit]
                    wnew, wcur = wnew[admit], wcur[admit]
                if len(vids):
                    self._apply_incremental(mem, stats, vids, targs,
                                            wnew, wcur)
                    mem_ref = ray.put(mem)
                    cycle_moves += len(vids)
                history.append({"step": step, "moves": int(len(vids))})
            cycle_no += 1
            converged = cycle_moves == 0
            if not converged:
                stats, mem_ref = self._stats_of(mem)
                q2 = self._quality_of(stats)
                if q2 + 1e-9 < q_cycle_start:
                    # conflicting parallel moves: redo the cycle safely
                    mem = cycle_mem.copy()
                    mem, stats, mem_ref, q2, safe_moves = \
                        self._safe_cycle(mem)
                    history.append({"step": step, "moves": safe_moves,
                                    "safe": True})
                q = q2
                converged = (q - q_cycle_start
                             < min_rel_improvement * (1 + abs(q)))
            if ckpt is not None:
                ckpt.save(start_cycle + cycle_no,
                          [mem[p::self.P] for p in range(self.P)],
                          metrics={"quality": q, "step": step,
                                   "moves": int(cycle_moves),
                                   "converged": bool(converged)})
            if converged:
                break
            if cycle_moves < max(8, self.n // 200):
                cur_colors = 1
        # final true stats/quality
        stats, mem_ref = self._stats_of(mem)
        q = self._quality_of(stats)
        return mem, q, step, history

    def _apply_incremental(self, mem, stats, vids, targs, wnew, wcur):
        loop = self.loop_w[vids]
        old = mem[vids]
        np.subtract.at(stats["w_in"], old, wcur + loop)
        np.add.at(stats["w_in"], targs, wnew + loop)
        np.subtract.at(stats["s_out"], old, self.k_out[vids])
        np.add.at(stats["s_out"], targs, self.k_out[vids])
        np.subtract.at(stats["s_in"], old, self.k_in[vids])
        np.add.at(stats["s_in"], targs, self.k_in[vids])
        np.subtract.at(stats["size"], old, self.node_size[vids])
        np.add.at(stats["size"], targs, self.node_size[vids])
        mem[vids] = targs

    def _safe_cycle(self, mem):
        """One colour cycle with per-step distributed stats recompute
        and a greedy non-interfering commit subset (exact, monotone)."""
        stats, mem_ref = self._stats_of(mem)
        total_moves = 0
        for color in range(self.n_colors):
            stats_ref = ray.put(stats)
            props = ray.get([_propose.remote(
                b, mem_ref, stats_ref, self.scal_ref, color,
                self.n_colors, -1) for b in self.block_refs])
            vids = np.concatenate([p[0] for p in props])
            targs = np.concatenate([p[1] for p in props])
            dqs = np.concatenate([p[2] for p in props])
            if len(vids) == 0:
                continue
            order = np.argsort(-dqs, kind="stable")
            touched = set()
            sel = []
            for i in order:
                a, b2 = int(mem[vids[i]]), int(targs[i])
                if a in touched or b2 in touched:
                    continue
                touched.add(a)
                touched.add(b2)
                sel.append(i)
            sel = np.asarray(sel, dtype=np.int64)
            mem[vids[sel]] = targs[sel]
            total_moves += len(sel)
            stats, mem_ref = self._stats_of(mem)
        q = self._quality_of(stats)
        return mem, stats, mem_ref, q, total_moves

    # ------------------------------------------------------------------
    def refine_distributed(self, mem):
        """Per-community parallel refinement (merge-constrained) on the
        base graph; returns refined membership (labels = global vid of
        a member => globally unique)."""
        mem_ref = ray.put(mem)
        parts = ray.get([_internal_edges.remote(b, mem_ref)
                         for b in self.block_refs])
        src = np.concatenate([p[0] for p in parts])
        dst = np.concatenate([p[1] for p in parts])
        w = np.concatenate([p[2] for p in parts])
        lab = np.concatenate([p[3] for p in parts])
        # group vertices and internal edges per community
        order = np.argsort(lab, kind="stable")
        src, dst, w, lab = src[order], dst[order], w[order], lab[order]
        vorder = np.argsort(mem, kind="stable")
        vlab = mem[vorder]
        uniq_comms = np.unique(mem)
        ebounds = np.searchsorted(lab, uniq_comms)
        ebounds = np.append(ebounds, len(lab))
        vbounds = np.searchsorted(vlab, uniq_comms)
        vbounds = np.append(vbounds, len(vlab))
        # batch communities into tasks; a pathological giant community
        # (the skew cliff: its induced subgraph would serialise into one
        # refinement task) keeps the identity refinement instead — always
        # a valid (if coarser) refinement — and is reported
        batches = []
        cur_batch = []
        budget = 0
        skipped_giants = 0
        REFINE_MAX = 500_000  # edges per community refinement task
        for i, c in enumerate(uniq_comms):
            vids = vorder[vbounds[i]:vbounds[i + 1]]
            es = slice(ebounds[i], ebounds[i + 1])
            if (es.stop - es.start) > REFINE_MAX:
                skipped_giants += 1
                continue
            cur_batch.append((vids, src[es], dst[es], w[es],
                              self.node_size[vids]))
            budget += len(vids) + (es.stop - es.start)
            if budget > 20000:
                batches.append(cur_batch)
                cur_batch, budget = [], 0
        if cur_batch:
            batches.append(cur_batch)
        if skipped_giants:
            import logging
            logging.getLogger(__name__).warning(
                "refinement: %d giant communities (>%d internal edges) "
                "kept identity refinement", skipped_giants, REFINE_MAX)
        results = ray.get([_refine_comms.remote(
            b, self.quality, self.gamma, self.correct_self_loops,
            self.directed, self.seed, self.max_comm_size)
            for b in batches])
        refined = np.arange(self.n, dtype=np.int64)
        for vv, ll in results:
            refined[vv] = ll
        return refined

    # ------------------------------------------------------------------
    def aggregate(self, refined_mem):
        """Aggregate edge table by refined membership from per-block
        partials: returns (agg Graph, dense map orig_label -> agg vid)."""
        labels, dense = np.unique(refined_mem, return_inverse=True)
        # driver holds original edges; the collapsed graph is small.
        cs = dense[self.src]
        cd = dense[self.dst]
        if not self.directed:
            lo = np.minimum(cs, cd)
            hi = np.maximum(cs, cd)
            cs, cd = lo, hi
        key = cs.astype(np.int64) * len(labels) + cd
        uniq, inv = np.unique(key, return_inverse=True)
        w = np.zeros(len(uniq))
        np.add.at(w, inv, self.weight)
        sizes = np.zeros(len(labels))
        np.add.at(sizes, dense, self.node_size)
        g = Graph(len(labels), src=(uniq // len(labels)).astype(np.int64),
                  dst=(uniq % len(labels)).astype(np.int64), weights=w,
                  node_sizes=sizes, directed=self.directed)
        return g, labels, dense

    # ------------------------------------------------------------------
    def run(self, n_iterations=2, max_supersteps=200,
            tail_max_edges=150_000, tail_max_n=3000, max_levels=8,
            min_rel_improvement=1e-9, checkpoint=None):
        """Full multi-level pipeline: distributed local-move + refine +
        aggregate per level. The exact in-memory schedule runs only on
        genuinely small aggregates (edge count below
        ``tail_max_edges``); edge-dense aggregates keep iterating
        distributed levels until quality stops improving — the in-memory
        queue kernel on a million-edge aggregate would dominate wall
        time. Returns (membership, quality, info)."""
        chain = []          # per level: dense map (level vids -> next)
        level = self
        seed = None
        level_infos = []
        total_steps = 0
        prev_q = -np.inf
        final_mem_agg = None
        quality = None
        while True:
            mem, q, steps, history = level.local_move_level0(
                mem=seed, max_supersteps=max_supersteps,
                min_rel_improvement=min_rel_improvement,
                checkpoint=checkpoint,
                level_tag=f"L{len(chain)}")
            total_steps += steps
            refined = level.refine_distributed(mem)
            agg_g, labels, dense = level.aggregate(refined)
            seed_mem = np.empty(len(labels), dtype=np.int64)
            seed_mem[dense] = mem
            chain.append(dense)
            level_infos.append({"n": level.n, "edges": len(level.src),
                                "supersteps": steps, "quality": q})
            small = (agg_g.ecount <= tail_max_edges
                     and agg_g.n <= tail_max_n)
            plateaued = (q - prev_q) < min_rel_improvement * (1 + abs(q))
            if small or len(chain) >= max_levels or \
                    (plateaued and len(chain) > 1):
                if small:
                    cls = PARTITION_TYPES[self.quality]
                    from ..partition import MutableVertexPartition
                    part = cls.__new__(cls)
                    MutableVertexPartition.__init__(
                        part, agg_g, initial_membership=seed_mem,
                        resolution_parameter=self.gamma,
                        correct_self_loops=self.correct_self_loops,
                        _validate=False)
                    opt = Optimiser()
                    opt.set_rng_seed(self.seed)
                    opt.max_comm_size = self.max_comm_size
                    opt.optimise_partition(part,
                                           n_iterations=n_iterations)
                    final_mem_agg = np.asarray(part.membership)
                    quality = part.quality()
                else:
                    final_mem_agg = seed_mem
                    quality = q
                break
            prev_q = q
            nxt = DistLeiden(
                agg_g.src, agg_g.dst, agg_g.weight, n=agg_g.n,
                directed=self.directed, quality=self.quality,
                resolution_parameter=self.gamma, P=self.P,
                seed=self.seed, n_colors=self.n_colors,
                node_sizes=agg_g.node_size,
                correct_self_loops=self.correct_self_loops,
                max_comm_size=self.max_comm_size)
            # dense-relabel the seed for the next level's label space
            _, seed = np.unique(seed_mem, return_inverse=True)
            seed = seed.astype(np.int64)
            level = nxt

        # unwind: compose the per-level coarsening maps
        composite = chain[0]
        for dense in chain[1:]:
            composite = dense[composite]
        final = final_mem_agg[composite]
        # dense renumber by decreasing size (deterministic)
        ulab, uinv = np.unique(final, return_inverse=True)
        counts = np.bincount(uinv)
        first_v = np.full(len(ulab), np.iinfo(np.int64).max)
        np.minimum.at(first_v, uinv, np.arange(self.n))
        order = np.lexsort((first_v, -counts))
        rank = np.empty(len(ulab), dtype=np.int64)
        rank[order] = np.arange(len(ulab))
        final = rank[uinv]
        info = {
            "levels": level_infos,
            "level0_supersteps": total_steps,
            "level0_quality": level_infos[0]["quality"],
            "final_quality": quality,
            "n_communities": int(final.max()) + 1,
        }
        return final, quality, info
