"""Local community detection: approximate personalized PageRank push
(Andersen-Chung-Lang, FOCS 2006) + conductance sweep over DistGraph
CSR blocks.

This is the seed-set-expansion primitive a link-graph pipeline uses to
grow a community around one url WITHOUT touching the rest of the
graph: the push support is bounded by 1/(eps*alpha) vertices
independent of n, so driver state is o(n) by construction (the same
discipline as ``DistLeiden`` shard state — CLAUDE.md).

Execution shape: the driver holds SPARSE estimate/residual maps
(support-bounded); each BSP round ships only the over-threshold
frontier to the shard that owns it, and the shard scans its block once
(vectorised ``np.isin`` over the frontier) to return sparse
(vid, pushed-mass) contributions. Communication per round is
proportional to the edges touched, never to |V| or |E|.

Complements (does not mirror) the reference: vtraag/leidenalg has no
local/seeded method; the sweep-cut contract follows the ACL paper and
igraph ``personalized_pagerank`` semantics for the diffusion itself.
"""
from __future__ import annotations

import numpy as np
import ray


@ray.remote
def _push_block(block, P, p, frontier_vids, push_mass):
    """Scatter (1-alpha)-scaled mass from the frontier vids resident
    in partition p along their out-edges. ``push_mass[i]`` is the full
    amount vertex ``frontier_vids[i]`` distributes (already divided by
    its strength upstream times edge weight here). Returns sparse
    (dst_vid, delta) pairs aggregated within the block."""
    src_l = block["src_local"]
    if not len(src_l):
        return np.empty(0, np.int64), np.empty(0, np.float64)
    loc = frontier_vids // P
    # one vectorised pass over the block per round
    order = np.argsort(loc, kind="stable")
    loc_s, mass_s = loc[order], push_mass[order]
    idx = np.searchsorted(loc_s, src_l)
    idx[idx == len(loc_s)] = 0
    hit = loc_s[idx] == src_l
    if not hit.any():
        return np.empty(0, np.int64), np.empty(0, np.float64)
    dst = (block["dst_local"][hit] * np.int64(P)
           + block["dst_part"][hit])
    delta = mass_s[idx[hit]] * block["weight"][hit]
    uk, inv = np.unique(dst, return_inverse=True)
    agg = np.zeros(len(uk))
    np.add.at(agg, inv, delta)
    return uk, agg


@ray.remote
def _induced_edges(block, P, p, support_vids):
    """Edges of the support-induced subgraph resident in partition p:
    (src_vid, dst_vid, weight) with BOTH endpoints in ``support_vids``
    (sorted). Support is push-bounded, so the result is small."""
    src_l = block["src_local"]
    if not len(src_l):
        z = np.empty(0, np.int64)
        return z, z.copy(), np.empty(0, np.float64)
    src_v = src_l * np.int64(P) + p
    dst_v = block["dst_local"] * np.int64(P) + block["dst_part"]
    m = (np.isin(src_v, support_vids)
         & np.isin(dst_v, support_vids))
    return src_v[m], dst_v[m], block["weight"][m]


def ppr_push(g, seed, alpha=0.15, eps=1e-5, max_rounds=10_000):
    """Approximate PPR vector around ``seed`` by batch-parallel push.

    Invariant maintained per ACL: after every round,
    ppr(seed) = p + ppr-of-residual; termination when every residual
    r[v] <= eps * strength[v]. Batch rounds push the WHOLE frontier at
    once — deterministic (no visit-order dependence) and one shard
    round-trip per round. Returns ({vid: p}, {vid: r}, rounds).
    """
    P = g.P
    strength = {}      # sparse cache of vertex strengths

    def strengths_of(vids):
        missing = [v for v in vids if v not in strength]
        if missing:
            mv = np.asarray(missing, dtype=np.int64)
            by_p = {}
            for v in mv:
                by_p.setdefault(int(v % P), []).append(int(v))
            fetched = ray.get([
                _strength_slice.remote(g.out_strength[pp],
                                       np.asarray(vs, np.int64) // P)
                for pp, vs in by_p.items()])
            for (pp, vs), vals in zip(by_p.items(), fetched):
                for v, s in zip(vs, vals):
                    strength[v] = float(s)
        return np.array([strength[v] for v in vids])

    p_map = {}
    r_map = {int(seed): 1.0}
    rounds = 0
    while rounds < max_rounds:
        vids = np.array(sorted(r_map), dtype=np.int64)
        res = np.array([r_map[int(v)] for v in vids])
        st = strengths_of(vids.tolist())
        live = st > 0
        over = np.zeros(len(vids), dtype=bool)
        over[live] = res[live] > eps * st[live]
        if not over.any():
            break
        rounds += 1
        f_vids, f_res, f_st = vids[over], res[over], st[over]
        for v, amt in zip(f_vids, f_res):
            p_map[int(v)] = p_map.get(int(v), 0.0) + alpha * amt
            r_map[int(v)] = 0.0
        # per-unit-weight mass each frontier vertex sends
        unit = (1.0 - alpha) * f_res / f_st
        by_p = {}
        for i, v in enumerate(f_vids):
            by_p.setdefault(int(v % P), []).append(i)
        outs = ray.get([
            _push_block.remote(g.blocks[pp], P, pp,
                               f_vids[idxs], unit[idxs])
            for pp, idxs in by_p.items()])
        for uk, agg in outs:
            for u, dmass in zip(uk, agg):
                r_map[int(u)] = r_map.get(int(u), 0.0) + float(dmass)
    return p_map, r_map, rounds


@ray.remote
def _strength_slice(stg, local_ids):
    return stg[local_ids]


def sweep_cut(g, p_map):
    """Conductance sweep over the push support: order support vids by
    p[v]/strength[v] desc (tie min vid), return the prefix with the
    minimum conductance cut(S)/min(vol(S), vol(G)-vol(S)) (tie:
    smallest prefix). Gathers only the support-induced subgraph —
    support is push-bounded, so this is o(n) driver work."""
    support = np.array(sorted(v for v, x in p_map.items() if x > 0),
                       dtype=np.int64)
    if not len(support):
        return np.empty(0, np.int64), float("nan")
    P = g.P
    st = np.concatenate(ray.get([
        _strength_slice.remote(g.out_strength[pp],
                               support[support % P == pp] // P)
        for pp in range(P)]))
    # realign: the concat above is grouped by partition
    order_vids = np.concatenate(
        [support[support % P == pp] for pp in range(P)])
    stren = dict(zip(order_vids.tolist(), st.tolist()))
    sv = np.array([stren[int(v)] for v in support])
    pv = np.array([p_map[int(v)] for v in support])
    vol_g = float(sum(ray.get([
        _strength_sum.remote(r) for r in g.out_strength])))
    # induced adjacency (support is sorted for np.isin)
    e = ray.get([_induced_edges.remote(g.blocks[pp], P, pp, support)
                 for pp in range(P)])
    es = np.concatenate([x[0] for x in e])
    ed = np.concatenate([x[1] for x in e])
    ew = np.concatenate([x[2] for x in e])
    rank_of = {int(v): i for i, v in enumerate(support)}
    live = sv > 0
    score = np.where(live, pv / np.where(sv > 0, sv, 1.0), np.inf)
    order = np.lexsort((support, -score))
    rank_in_order = np.empty(len(support), dtype=np.int64)
    rank_in_order[order] = np.arange(len(support))
    er_s = rank_in_order[[rank_of[int(v)] for v in es]]
    er_d = rank_in_order[[rank_of[int(v)] for v in ed]]
    # prefix volumes and internal weights
    vol_prefix = np.cumsum(sv[order])
    # edge (s, d) becomes internal once BOTH ranks < k, i.e. at
    # k = max(rank_s, rank_d) + 1; each direction is stored, so the
    # accumulated internal weight already counts both directions
    internal_at = np.maximum(er_s, er_d)
    internal = np.zeros(len(support))
    np.add.at(internal, internal_at, ew)
    internal = np.cumsum(internal)
    cut = vol_prefix - internal
    denom = np.minimum(vol_prefix, vol_g - vol_prefix)
    phi = np.where(denom > 0, cut / np.where(denom > 0, denom, 1.0),
                   np.inf)
    best = int(np.argmin(phi))       # ties -> smallest prefix
    members = np.sort(support[order][:best + 1])
    return members, float(phi[best])


@ray.remote
def _strength_sum(stg):
    return float(stg.sum())


def ppr_local_community(g, seed, alpha=0.15, eps=1e-5):
    """ACL local community around ``seed``: push + sweep. Returns
    (member vids sorted, conductance, p_map, rounds). An isolated
    seed (strength 0 — nothing to push) is its own community with
    conductance 0 (cut and volume are both empty)."""
    p_map, _, rounds = ppr_push(g, seed, alpha=alpha, eps=eps)
    if not p_map:
        return np.array([int(seed)], dtype=np.int64), 0.0, \
            {int(seed): 1.0}, rounds
    members, phi = sweep_cut(g, p_map)
    return members, phi, p_map, rounds
