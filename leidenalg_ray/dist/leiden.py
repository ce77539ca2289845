"""Distributed Leiden (SURVEY.md §4.3.2, §7.1.4).

Level 0 — where the graph is huge — runs as synchronous supersteps over
hash-partitioned incidence blocks held by P ``LeidenShard`` actors:

1. *gather/propose*: each shard computes per-vertex
   neighbour-community weights (partial-aggregated inside the block)
   and the exact quality delta for every candidate move against the
   committed snapshot; only vertices in the active hash-colour class
   propose.
2. *commit*: the driver broadcasts the colour class's accepted moves
   (a few small arrays — vids, targets and the per-vid degree/loop/size
   scalars the proposals already carry); every shard and the driver
   apply the identical incremental update to their membership + stats
   copies, so no O(n) array is re-``ray.put`` per superstep. Once per
   colour cycle the stats are recomputed from per-shard partials and
   quality verified; a cycle that *decreased* quality (conflicting
   parallel moves) is rolled back and re-run in safe mode — per-step
   recompute plus a greedy non-interfering subset — so quality is
   monotone non-decreasing like the reference's sequential queue and
   the fixed point satisfies the same node-optimality property
   (reference ``tests/test_Optimiser.py:84-94``).

After level-0 convergence the aggregate graph is orders of magnitude
smaller (SURVEY.md §7.0): refinement runs per-community in parallel
tasks (internal edges bucketed by community hash and shipped
worker-to-worker — the driver only passes refs), the aggregate is
built from per-shard ``(comm_src, comm_dst) -> w`` partials, and the
remaining levels run the exact in-memory schedule
(``leidenalg_ray.optimiser``) — the identical semantics at P=1.

Scale notes: the driver holds O(n) state (membership, node sizes,
community stats) but never O(edges); edges live only in the shard
actors (or, for ``from_dataset``, in partitioned parquet spill that
doubles as the resumable L0 input). Each shard's resident state is
O((n + E)/P): membership only for the vids its block references
(``ref_vids``/``mem_ref``) and community stats compressed to its
tracked labels (``stat_labels``), with driver-authoritative values
upserted from each move broadcast. Full O(n) arrays appear on shards
only transiently, as zero-copy reads of broadcast objects at cycle
boundaries (init/rollback), and are sliced before retention.

All six quality families run distributed. The linear ones
(Modularity, RBConfiguration, RBER, CPM, Significance) evaluate move
deltas directly from the two affected communities' terms; Surprise's
nonlinear combine evaluates every candidate against the GLOBAL
aggregated term vector (recomputed from the broadcast stats snapshot
inside each propose call) via the plugin's vectorised
``combine_many`` — reference semantics at
``/root/reference/src/leidenalg/VertexPartition.py:470-492``, formula
still owned solely by ``leidenalg_ray.quality``.
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
    SurpriseVertexPartition,
)
from ..optimiser import Optimiser

PARTITION_TYPES = {
    "modularity": ModularityVertexPartition,
    "rb_configuration": RBConfigurationVertexPartition,
    "rber": RBERVertexPartition,
    "cpm": CPMVertexPartition,
    "significance": SignificanceVertexPartition,
    "surprise": SurpriseVertexPartition,
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


_EMPTY_PROPS = tuple([np.empty(0, np.int64)] * 2 + [np.empty(0)] * 7
                     + [np.empty(0, np.int64)])


def _colour_hash(vids):
    """Mixed-bit colour hash. A plain Knuth multiply keeps the vid's
    low bits' parity (odd multiplier), which correlates colour classes
    with the vid%P partitioning — half the shards would idle every
    2-colour superstep. The splitmix-style shift decorrelates."""
    x = vids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    x ^= x >> np.uint64(29)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    return ((x >> np.uint64(32)) & np.uint64(0x7FFFFFFF)) \
        .astype(np.int64)


def _lab_idx(stat_labels, lab):
    """Translate global community labels into the shard's compressed
    stats index; raises on an untracked label (protocol violation)
    rather than silently reading a neighbour's slot."""
    i = np.searchsorted(stat_labels, lab)
    if len(stat_labels) == 0:
        if len(lab) == 0:
            return i
        raise ValueError("untracked community label in propose")
    i = np.minimum(i, len(stat_labels) - 1)
    if not np.array_equal(stat_labels[i], lab):
        raise ValueError("untracked community label in propose")
    return i


def _propose_kernel(block, kv, st, scal, color, n_colors):
    """Gather + propose for one shard's block.

    block: dict(src_local, dst_global, weight, dst_ref_idx) sorted by
    src_local (symmetrised incidence: weight(v, c) sums each edge once
    from v's side; for directed graphs the pair carries w_to + w_from
    combined, which is exactly what the quality delta needs).
    kv: per-local-vertex arrays (k_out, k_in, loop, nsz) for this
    shard's own vertices.
    st: the shard's compressed state — membership over the shard's
    REFERENCED vids only (``mem_ref`` indexed via ``own_ref_idx`` /
    ``dst_ref_idx``) and label-compressed community stats
    (``stat_labels`` + w_in/s_out/s_in/size aligned to it, plus the
    global term-sum vector ``agg0`` for nonlinear qualities). No O(n)
    array is resident.
    Returns accepted proposals for the active colour class, each row
    carrying the per-vid scalars needed to apply the move anywhere:
    (vids, targets, dq, wnew, wcur, loop, k_out, k_in, nsz, cur).
    """
    src_local = block["src_local"]
    if len(src_local) == 0:
        return _EMPTY_PROPS
    P = scal["P"]
    vid_base = scal["p"]
    M = scal["label_space"]

    # active colour class (deterministic hash colouring): filter the
    # block's rows to active-source edges BEFORE the per-(v, comm)
    # grouping — inactive vertices contribute nothing this superstep,
    # so with c colours the expensive np.unique shrinks by ~c x.
    if n_colors > 1:
        row_active = (block["row_hash"] % n_colors) == color
        if not row_active.any():
            return _EMPTY_PROPS
        src_local = src_local[row_active]
        weight = block["weight"][row_active]
        dref = block["dst_ref_idx"][row_active]
    else:
        weight = block["weight"]
        dref = block["dst_ref_idx"]

    sg = _ScalarGraph(scal["n"], scal["directed"], scal["m"],
                      scal["total_size"])
    qf = _make_qf(scal["quality"], sg, scal["gamma"],
                  scal["correct_self_loops"])
    scale = qf.linear_scale()
    gamma = scal["gamma"]

    mem_ref = st["mem_ref"]
    own_idx = st["own_ref_idx"]
    dst_comm = mem_ref[dref]
    key = src_local.astype(np.int64) * M + dst_comm
    uniq, inv = np.unique(key, return_inverse=True)
    w_vc = np.zeros(len(uniq))
    np.add.at(w_vc, inv, weight)
    pv = (uniq // M).astype(np.int64)   # src_local per pair
    pc_ = (uniq % M).astype(np.int64)   # candidate community per pair

    vids = pv * P + vid_base            # global vid per pair
    cur = mem_ref[own_idx[pv]]

    # per-vertex weight to current community, as a dense local-vertex
    # indexed array (vectorised; no per-pair Python lookups)
    is_cur = pc_ == cur
    max_loc = int(pv.max()) + 1
    w_cur_arr = np.zeros(max_loc)
    w_cur_arr[pv[is_cur]] = w_vc[is_cur]

    cand = ~is_cur
    if not cand.any():
        return _EMPTY_PROPS
    ci = np.flatnonzero(cand)
    v_loc = pv[ci]
    vids_c = vids[ci]
    cs = pc_[ci]
    wv = w_vc[ci]
    cur_c = cur[ci]
    w_cur = w_cur_arr[v_loc]

    k_out = kv["k_out"][v_loc]
    k_in = kv["k_in"][v_loc]
    loop = kv["loop"][v_loc]
    nsz = kv["nsz"][v_loc]

    SL = st["stat_labels"]
    W, SO, SI, SZ = (st["w_in"], st["s_out"], st["s_in"], st["size"])

    def term(w, so, si, sz):
        return np.atleast_2d(qf.term(w, so, si, sz, gamma))

    if scale is None:
        # nonlinear combine (Surprise): every candidate's exact global
        # delta = combine(global term sum + local term shift) - Q0.
        # The global term-sum vector agg0 (term_dim scalars, not O(n))
        # is maintained by the driver from its full stats and shipped
        # with every state push — the two-pass scheme VERDICT r1
        # sketched, with the formula still living only in quality.py
        # (combine_many).
        agg0 = np.atleast_1d(np.asarray(st["agg0"], dtype=np.float64))
        q0 = qf.combine(agg0, gamma)

        def dq_of(d_new, d_old):
            aggs = agg0[:, None] + d_new + d_old
            return qf.combine_many(aggs, gamma) - q0
    else:
        def dq_of(d_new, d_old):
            return scale * (d_new + d_old)[0]

    csi = _lab_idx(SL, cs)
    curci = _lab_idx(SL, cur_c)
    d_new = term(W[csi] + wv + loop, SO[csi] + k_out, SI[csi] + k_in,
                 SZ[csi] + nsz) - term(W[csi], SO[csi], SI[csi],
                                       SZ[csi])
    d_old = term(W[curci] - w_cur - loop, SO[curci] - k_out,
                 SI[curci] - k_in, SZ[curci] - nsz) \
        - term(W[curci], SO[curci], SI[curci], SZ[curci])
    dq = dq_of(d_new, d_old)
    max_size = scal.get("max_comm_size", 0)
    if max_size > 0:
        dq = np.where(SZ[csi] + nsz > max_size, -np.inf, dq)

    # empty-community candidate per active vertex (label = n + vid).
    # candidate rows are sorted by (vertex, community) — the np.unique
    # key ordering — so per-vertex segments are contiguous.
    starts = np.flatnonzero(np.r_[True, v_loc[1:] != v_loc[:-1]])
    vu = v_loc[starts]
    vids_u = vu * P + vid_base
    cur_u = mem_ref[own_idx[vu]]
    curui = _lab_idx(SL, cur_u)
    w_cur_u = w_cur_arr[vu]
    k_out_u = kv["k_out"][vu]
    k_in_u = kv["k_in"][vu]
    loop_u = kv["loop"][vu]
    nsz_u = kv["nsz"][vu]
    zero = np.zeros(len(vu))
    d_new_e = term(zero + loop_u, k_out_u, k_in_u, nsz_u) \
        - term(zero, zero, zero, zero)
    d_old_e = term(W[curui] - w_cur_u - loop_u, SO[curui] - k_out_u,
                   SI[curui] - k_in_u, SZ[curui] - nsz_u) \
        - term(W[curui], SO[curui], SI[curui], SZ[curui])
    dq_e = dq_of(d_new_e, d_old_e)
    # only meaningful if the vertex is not alone in its community
    alone = (SZ[curui] - nsz_u) <= 0
    dq_e[alone] = -np.inf
    empty_target = scal["n"] + vids_u

    # combine: segmented argmax per vertex (deterministic tie-break:
    # highest dq, then lowest target label — within a segment the
    # communities ascend, so the first max row is the lowest label)
    counts = np.diff(np.append(starts, len(v_loc)))
    seg_id = np.repeat(np.arange(len(vu)), counts)
    seg_max = np.maximum.reduceat(dq, starts)
    is_max = dq >= seg_max[seg_id]
    row_idx = np.where(is_max, np.arange(len(dq)), len(dq))
    first_idx = np.minimum.reduceat(row_idx, starts)
    nb_d = dq[first_idx]
    nb_t = cs[first_idx]
    use_empty = (dq_e > nb_d) | ((dq_e == nb_d)
                                 & (empty_target < nb_t))
    best_d = np.where(use_empty, dq_e, nb_d)
    best_t = np.where(use_empty, empty_target, nb_t)
    best_wnew = np.where(use_empty, 0.0, wv[first_idx])
    good = best_d > 1e-10
    return (vids_u[good], best_t[good], best_d[good], best_wnew[good],
            w_cur_u[good], loop_u[good], k_out_u[good], k_in_u[good],
            nsz_u[good], cur_u[good])


def _apply_moves_inplace(mem, stats, mv):
    """Incremental commit against the driver's full label-indexed
    copies. Shards apply the same moves to their compressed state via
    ``LeidenShard._apply_moves`` — membership deltas for referenced
    vids plus driver-authoritative stat values for touched labels, so
    copies never diverge."""
    vids, targs = mv["vids"], mv["targs"]
    old = mem[vids]
    np.subtract.at(stats["w_in"], old, mv["wcur"] + mv["loop"])
    np.add.at(stats["w_in"], targs, mv["wnew"] + mv["loop"])
    np.subtract.at(stats["s_out"], old, mv["k_out"])
    np.add.at(stats["s_out"], targs, mv["k_out"])
    np.subtract.at(stats["s_in"], old, mv["k_in"])
    np.add.at(stats["s_in"], targs, mv["k_in"])
    np.subtract.at(stats["size"], old, mv["nsz"])
    np.add.at(stats["size"], targs, mv["nsz"])
    mem[vids] = targs


@ray.remote(num_cpus=0)
class LeidenShard:
    """One partition's state: incidence block + per-vertex shards +
    membership over the shard's REFERENCED vids only and
    label-compressed community stats — O((n + E)/P) resident, no O(n)
    array per actor. Full arrays are read zero-copy from broadcast
    objects only at cycle boundaries (init/rollback) and sliced.
    ``num_cpus=0`` so a small test cluster isn't starved while the
    pool idles between supersteps; on a real cluster pin via custom
    resources."""

    def __init__(self, p, P, block=None, parquet_dir=None):
        self.p, self.P = int(p), int(P)
        if block is None:
            block = self._load_parquet(parquet_dir)
        self._set_block(block)
        self.mem_ref = None
        self.stat_labels = None
        self.stats = None
        self.agg0 = None
        self.scal = None

    def _load_parquet(self, parquet_dir):
        import os
        import pyarrow.dataset as pads
        d = os.path.join(parquet_dir, f"part={self.p}")
        if not os.path.isdir(d):
            e = np.empty(0, np.int64)
            return {"src_local": e, "dst_global": e.copy(),
                    "weight": np.empty(0), "is_rev": np.empty(0, bool)}
        t = pads.dataset(d).to_table(
            columns=["src", "dst", "weight", "is_rev"])
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        return {
            "src_local": src // self.P,
            "dst_global": t["dst"].to_numpy(zero_copy_only=False)
                .astype(np.int64),
            "weight": t["weight"].to_numpy(zero_copy_only=False)
                .astype(np.float64),
            "is_rev": t["is_rev"].to_numpy(zero_copy_only=False)
                .astype(bool),
        }

    def _set_block(self, block):
        order = np.argsort(block["src_local"], kind="stable")
        self.block = {k: np.ascontiguousarray(v[order])
                      for k, v in block.items()}
        vids_row = self.block["src_local"] * self.P + self.p
        self.block["row_hash"] = _colour_hash(vids_row)

    def load_level(self, block):
        """Reuse this actor for the next (smaller) level's graph."""
        self._set_block(block)
        self.mem_ref = None
        self.stat_labels = None
        self.stats = None
        self.agg0 = None
        self.scal = None
        return True

    # ------------------------------------------------------------------
    def vertex_summary(self, n, directed, node_sizes_shard=None):
        """Compute per-vertex shards from the incidence block; return
        the global-scalar partials the driver needs."""
        P, p = self.P, self.p
        n_local = (n - p + P - 1) // P
        b = self.block
        sl, w, rev = b["src_local"], b["weight"], b["is_rev"]
        dst = b["dst_global"]
        loop = np.zeros(n_local)
        is_loop = (~rev) & (sl * P + p == dst)
        np.add.at(loop, sl[is_loop], w[is_loop])
        k_out = np.zeros(n_local)
        k_in = np.zeros(n_local)
        if directed:
            np.add.at(k_out, sl[~rev], w[~rev])
            np.add.at(k_in, sl[rev], w[rev])
            k_in += loop
        else:
            np.add.at(k_out, sl, w)
            k_out += loop            # loops stored once, count double
            k_in = k_out
        nsz = (np.ones(n_local) if node_sizes_shard is None
               else np.asarray(node_sizes_shard, dtype=np.float64))
        self.kv = {"k_out": k_out, "k_in": k_in, "loop": loop,
                   "nsz": nsz}
        deg = np.zeros(n_local, dtype=np.int64)
        np.add.at(deg, sl, 1)
        # the shard's referenced vid set (own vertices + block
        # neighbours) and the precomputed lookup indices into it — the
        # only membership this actor ever needs
        own_vids = np.arange(n_local, dtype=np.int64) * P + p
        self.ref_vids = np.union1d(own_vids, dst)
        self.own_ref_idx = np.searchsorted(self.ref_vids, own_vids)
        self.block["dst_ref_idx"] = np.searchsorted(self.ref_vids, dst)
        return {
            "m": float(w[~rev].sum()),
            "n_edges": int((~rev).sum()),
            "size": float(nsz.sum()),
            "has_loops": bool(is_loop.any()),
            "active_local": np.flatnonzero(deg > 0),
        }

    def set_config(self, scal):
        scal = dict(scal)
        scal["p"] = self.p
        self.scal = scal
        return True

    def set_state(self, mem, stats, agg0=None):
        """Adopt a (broadcast) full state snapshot: slice membership to
        the referenced vids, compress stats to the referenced labels.
        The full arrays are read zero-copy from the object store; only
        the slices stay resident."""
        self.mem_ref = np.asarray(mem)[self.ref_vids].astype(np.int64)
        self._compress_stats(stats, agg0)
        return True

    def set_stats(self, stats, agg0=None):
        self._compress_stats(stats, agg0)
        return True

    def _compress_stats(self, stats, agg0):
        labels = np.unique(self.mem_ref)
        self.stat_labels = labels
        self.stats = {k: np.asarray(stats[k])[labels].astype(np.float64)
                      for k in ("w_in", "s_out", "s_in", "size")}
        self.agg0 = None if agg0 is None else np.asarray(agg0)

    def _upsert(self, labels, vals, allow_new=None):
        """Adopt driver-authoritative stat values for the given labels.
        ``allow_new=None`` inserts any untracked label; a boolean mask
        restricts insertion to the flagged labels (untracked,
        un-flagged labels are dropped — this shard never reads them,
        and a later move that makes one relevant re-ships its value),
        keeping the tracked set O(referenced labels), not O(moves)."""
        labels = np.asarray(labels, dtype=np.int64)
        if len(labels) == 0:
            return
        sl = self.stat_labels
        if len(sl):
            i = np.searchsorted(sl, labels)
            tracked = sl[np.minimum(i, len(sl) - 1)] == labels
        else:
            tracked = np.zeros(len(labels), dtype=bool)
        if allow_new is not None:
            keep = tracked | allow_new
            if not keep.all():
                labels = labels[keep]
                vals = {k: np.asarray(v)[keep] for k, v in vals.items()}
                tracked = tracked[keep]
                if len(labels) == 0:
                    return
        miss = ~tracked
        if miss.any():
            merged = np.union1d(sl, labels[miss])
            remap = np.searchsorted(merged, sl)
            for k in self.stats:
                arr = np.zeros(len(merged))
                arr[remap] = self.stats[k]
                self.stats[k] = arr
            self.stat_labels = sl = merged
        i = np.searchsorted(sl, labels)
        for k in self.stats:
            self.stats[k][i] = np.asarray(vals[k])

    def _apply_moves(self, moves):
        """Commit a broadcast move set: membership deltas for the vids
        this shard references, stat values for the touched labels —
        inserting only labels a referenced vid just moved to."""
        vids, targs = moves["vids"], moves["targs"]
        rv = self.ref_vids
        new_ref = targs[:0]
        if len(rv):
            i = np.minimum(np.searchsorted(rv, vids), len(rv) - 1)
            found = rv[i] == vids
            self.mem_ref[i[found]] = targs[found]
            new_ref = targs[found]
        labels = np.asarray(moves["upd_labels"], dtype=np.int64)
        self._upsert(labels, moves["upd_vals"],
                     allow_new=np.isin(labels, new_ref))
        if "agg0" in moves:
            self.agg0 = np.asarray(moves["agg0"])

    # ------------------------------------------------------------------
    def step(self, moves, color, n_colors, push=None):
        """Apply the previously-committed moves (broadcast deltas) —
        or adopt a driver-verified stats upsert ``push`` at a cycle
        boundary — then propose for the given colour: one actor round
        per colour superstep, no full-array broadcast in the steady
        state."""
        if push is not None:
            # boundary correction: update tracked labels only (an
            # untracked label can't be read until a move references
            # it, and that move re-ships its value)
            nlab = len(push["labels"])
            self._upsert(push["labels"], push["vals"],
                         allow_new=np.zeros(nlab, dtype=bool))
            if "agg0" in push:
                self.agg0 = np.asarray(push["agg0"])
        if moves is not None and len(moves["vids"]):
            self._apply_moves(moves)
        if color is None:
            return None
        st = {"mem_ref": self.mem_ref, "own_ref_idx": self.own_ref_idx,
              "stat_labels": self.stat_labels, "agg0": self.agg0,
              **self.stats}
        return _propose_kernel(self.block, self.kv, st, self.scal,
                               color, n_colors)

    def state_footprint(self):
        """Resident-state sizes (diagnostics / scale tests): the shard
        holds membership only for its referenced vids and stats only
        for its tracked labels — never O(n) arrays."""
        return {
            "ref_vids": int(len(self.ref_vids)),
            "stat_labels": (0 if self.stat_labels is None
                            else int(len(self.stat_labels))),
            "block_rows": int(len(self.block["src_local"])),
        }

    def stats_partials(self, moves=None):
        """Label-compressed community stat partials from local state:
        internal weights from the block, strength/size sums from own
        vertices. Non-loop symmetrised edges are counted from both
        sides across shards -> driver divides by 2. ``moves`` lets the
        cycle's last colour commit fold into this round."""
        if moves is not None and len(moves["vids"]):
            self._apply_moves(moves)
        b = self.block
        mem_src = self.mem_ref[self.own_ref_idx[b["src_local"]]]
        mem_dst = self.mem_ref[b["dst_ref_idx"]]
        same = mem_src == mem_dst
        lab = mem_src[same]
        w = b["weight"][same]
        src_g = b["src_local"] * self.P + self.p
        isloop = src_g[same] == b["dst_global"][same]
        uniq, inv = np.unique(lab, return_inverse=True)
        wn = np.zeros(len(uniq))
        wl = np.zeros(len(uniq))
        np.add.at(wn, inv[~isloop], w[~isloop])
        np.add.at(wl, inv[isloop], w[isloop])
        # own-vertex strength/size partials
        vlab = self.mem_ref[self.own_ref_idx]
        u2, inv2 = np.unique(vlab, return_inverse=True)
        so = np.zeros(len(u2))
        si = np.zeros(len(u2))
        sz = np.zeros(len(u2))
        np.add.at(so, inv2, self.kv["k_out"])
        np.add.at(si, inv2, self.kv["k_in"])
        np.add.at(sz, inv2, self.kv["nsz"])
        return (uniq, wn, wl), (u2, so, si, sz)

    # ------------------------------------------------------------------
    def internal_edge_buckets(self, R):
        """Internal (same-community) edges of this block, canonicalised
        (non-rev only, so the symmetrised duplicates collapse), bucketed
        by community hash for the distributed refinement tasks."""
        b = self.block
        src_g = b["src_local"] * self.P + self.p
        dst_g = b["dst_global"]
        mem_src = self.mem_ref[self.own_ref_idx[b["src_local"]]]
        mem_dst = self.mem_ref[b["dst_ref_idx"]]
        same = (mem_src == mem_dst) & ~b["is_rev"]
        s, d, w = src_g[same], dst_g[same], b["weight"][same]
        lab = mem_src[same]
        bucket = lab % R
        order = np.argsort(bucket, kind="stable")
        s, d, w, lab, bucket = (s[order], d[order], w[order], lab[order],
                                bucket[order])
        bounds = np.searchsorted(bucket, np.arange(R + 1))
        return [(s[bounds[r]:bounds[r + 1]], d[bounds[r]:bounds[r + 1]],
                 w[bounds[r]:bounds[r + 1]],
                 lab[bounds[r]:bounds[r + 1]]) for r in range(R)]

    def agg_partials(self, dense, n_labels, directed):
        """(comm_src, comm_dst) -> weight partial sums over this
        block's non-rev edges under the refined dense labelling, plus
        per-label node-size partials — the distributed form of the
        aggregate build (no O(edges) driver pass)."""
        b = self.block
        keep = ~b["is_rev"]
        src_g = (b["src_local"] * self.P + self.p)[keep]
        dst_g = b["dst_global"][keep]
        w = b["weight"][keep]
        cs = dense[src_g].astype(np.int64)
        cd = dense[dst_g].astype(np.int64)
        if not directed:
            lo = np.minimum(cs, cd)
            hi = np.maximum(cs, cd)
            cs, cd = lo, hi
        key = cs * n_labels + cd
        uniq, inv = np.unique(key, return_inverse=True)
        ws = np.zeros(len(uniq))
        np.add.at(ws, inv, w)
        own_vids = np.arange(len(self.kv["nsz"]),
                             dtype=np.int64) * self.P + self.p
        labs = dense[own_vids].astype(np.int64)
        u2, inv2 = np.unique(labs, return_inverse=True)
        sz = np.zeros(len(u2))
        np.add.at(sz, inv2, self.kv["nsz"])
        return uniq, ws, u2, sz


@ray.remote
def _refine_bucket(groups, quality, gamma, correct_self_loops,
                   directed, seed, max_comm_size, refine_max,
                   *edge_parts):
    """Refine the communities of one hash bucket: fetch this bucket's
    internal-edge partials (worker-to-worker refs), group them per
    community, run the exact merge-constrained in-memory kernel per
    induced subgraph. ``groups`` is [(comm_label, vids, node_sizes)].
    Returns (vids, refined_label) with labels globally unique (label =
    global vid of the refined community's smallest member)."""
    src = np.concatenate([e[0] for e in edge_parts]) \
        if edge_parts else np.empty(0, np.int64)
    dst = np.concatenate([e[1] for e in edge_parts]) \
        if edge_parts else np.empty(0, np.int64)
    w = np.concatenate([e[2] for e in edge_parts]) \
        if edge_parts else np.empty(0)
    lab = np.concatenate([e[3] for e in edge_parts]) \
        if edge_parts else np.empty(0, np.int64)
    order = np.argsort(lab, kind="stable")
    src, dst, w, lab = src[order], dst[order], w[order], lab[order]

    out_v, out_l = [], []
    cls = PARTITION_TYPES[quality]
    from ..partition import MutableVertexPartition
    n_giant = 0
    for comm, vids, nsz in groups:
        lo = np.searchsorted(lab, comm, side="left")
        hi = np.searchsorted(lab, comm, side="right")
        if hi - lo > refine_max:
            n_giant += 1   # identity refinement (valid, coarser)
            continue
        vids = np.asarray(vids, dtype=np.int64)
        ls = np.searchsorted(vids, src[lo:hi])
        ld = np.searchsorted(vids, dst[lo:hi])
        g = Graph(len(vids), src=ls, dst=ld, weights=w[lo:hi],
                  node_sizes=nsz, directed=directed)
        part = cls.__new__(cls)
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
        labels = np.full(local_mem.max() + 1, -1, dtype=np.int64)
        # label = global vid of the first (smallest, vids sorted)
        # member of the refined community
        for i in range(len(vids)):
            c = local_mem[i]
            if labels[c] < 0:
                labels[c] = vids[i]
        out_v.append(vids)
        out_l.append(labels[local_mem])
    if not out_v:
        return np.empty(0, np.int64), np.empty(0, np.int64), n_giant
    return np.concatenate(out_v), np.concatenate(out_l), n_giant


class DistLeiden:
    """Distributed Leiden driver. Hybrid: distributed level 0 over the
    shard-actor pool + exact in-memory tail on the (small) aggregate.

    Construct from driver arrays (``__init__`` — small/aggregate
    graphs) or from a Ray Data edge Dataset (``from_dataset`` — the
    at-scale path: edges spill to partitioned parquet and each shard
    loads only its own partition; the driver never holds the edge
    list)."""

    def __init__(self, src=None, dst=None, weight=None, n=None,
                 directed=False, quality="cpm",
                 resolution_parameter=1.0, P=8, seed=42, n_colors=2,
                 node_sizes=None, correct_self_loops=None,
                 max_comm_size=0, _actors=None, _parquet_dir=None):
        self.n = None if n is None else int(n)
        self.P, self.directed = int(P), bool(directed)
        self.quality = quality
        self.gamma = float(resolution_parameter)
        self.seed = seed
        self.n_colors = int(n_colors)
        self.max_comm_size = int(max_comm_size)
        self._corr_loops_arg = correct_self_loops

        if _parquet_dir is not None:
            self.node_size = (np.ones(self.n) if node_sizes is None
                              else np.asarray(node_sizes, np.float64))
            self.actors = [LeidenShard.remote(p, P,
                                              parquet_dir=_parquet_dir)
                           for p in range(P)]
            self._finish_init(node_sizes)
            return

        src = np.asarray(src, dtype=np.int64)
        dst = np.asarray(dst, dtype=np.int64)
        if n is None:
            self.n = n = int(max(src.max(initial=-1),
                                 dst.max(initial=-1))) + 1
        if weight is None:
            weight = np.ones(len(src))
        weight = np.asarray(weight, dtype=np.float64)
        self.node_size = (np.ones(n) if node_sizes is None
                          else np.asarray(node_sizes, dtype=np.float64))

        # symmetrised incidence rows keyed by source partition (both
        # directions for BOTH directed and undirected: the propose
        # gather needs w_to + w_from per (v, comm) pair)
        loop = src == dst
        nl = ~loop
        s2 = np.concatenate([src, dst[nl]])
        d2 = np.concatenate([dst, src[nl]])
        w2 = np.concatenate([weight, weight[nl]])
        rev = np.concatenate([np.zeros(len(src), dtype=bool),
                              np.ones(int(nl.sum()), dtype=bool)])
        blocks = []
        for p in range(P):
            msk = (s2 % P) == p
            blocks.append({
                "src_local": s2[msk] // P,
                "dst_global": d2[msk],
                "weight": w2[msk],
                "is_rev": rev[msk],
            })
        if _actors is not None:      # reuse the pool across levels
            self.actors = _actors
            ray.get([a.load_level.remote(b)
                     for a, b in zip(_actors, blocks)])
        else:
            self.actors = [LeidenShard.remote(p, P, block=blocks[p])
                           for p in range(P)]
        self._finish_init(node_sizes)

    def _finish_init(self, node_sizes):
        P, n = self.P, self.n
        shards = [None] * P if node_sizes is None else \
            [self.node_size[p::P] for p in range(P)]
        sums = ray.get([a.vertex_summary.remote(n, self.directed,
                                                shards[p])
                        for p, a in enumerate(self.actors)])
        self.m = float(sum(s["m"] for s in sums))
        self.n_edges = int(sum(s["n_edges"] for s in sums))
        self.total_size = float(sum(s["size"] for s in sums))
        has_loops = any(s["has_loops"] for s in sums)
        self._active_vids = np.sort(np.concatenate(
            [s["active_local"] * P + p for p, s in enumerate(sums)]))
        corr = self._corr_loops_arg
        if corr is None:
            corr = has_loops if self.quality == "cpm" else False
        self.correct_self_loops = bool(corr)
        scal = {
            "P": P, "n": n, "m": self.m, "total_size": self.total_size,
            "directed": self.directed, "quality": self.quality,
            "gamma": self.gamma,
            "correct_self_loops": self.correct_self_loops,
            "max_comm_size": self.max_comm_size,
            "label_space": 2 * n,
        }
        ray.get([a.set_config.remote(scal) for a in self.actors])

    # ------------------------------------------------------------------
    @classmethod
    def from_dataset(cls, edges_ds, n, directed=False, quality="cpm",
                     resolution_parameter=1.0, P=8, seed=42, n_colors=2,
                     correct_self_loops=None, max_comm_size=0,
                     spill_dir=None):
        """Dataset-native construction: edges Dataset(src, dst
        [, weight]) -> symmetrised incidence rows -> partitioned
        parquet spill (the resumable L0 input) -> each shard actor
        loads only its own partition's files. The driver never
        materialises the edge list (SURVEY.md §4.3.1)."""
        import os
        import tempfile
        import pyarrow as pa

        spill_dir = spill_dir or tempfile.mkdtemp(prefix="lray_leiden_")
        os.makedirs(spill_dir, exist_ok=True)
        Pv = int(P)

        def incidence(t: pa.Table) -> pa.Table:
            src = t["src"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            dst = t["dst"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            if "weight" in t.column_names:
                w = t["weight"].to_numpy(zero_copy_only=False) \
                    .astype(np.float64)
            else:
                w = np.ones(len(src))
            nl = src != dst
            s2 = np.concatenate([src, dst[nl]])
            d2 = np.concatenate([dst, src[nl]])
            w2 = np.concatenate([w, w[nl]])
            rev = np.concatenate([np.zeros(len(src), dtype=bool),
                                  np.ones(int(nl.sum()), dtype=bool)])
            return pa.table({
                "src": pa.array(s2), "dst": pa.array(d2),
                "weight": pa.array(w2), "is_rev": pa.array(rev),
                "part": pa.array((s2 % Pv).astype(np.int32)),
            })

        edges_ds.map_batches(incidence, batch_format="pyarrow",
                             zero_copy_batch=True) \
            .write_parquet(spill_dir, partition_cols=["part"])
        return cls(n=n, directed=directed, quality=quality,
                   resolution_parameter=resolution_parameter, P=Pv,
                   seed=seed, n_colors=n_colors,
                   correct_self_loops=correct_self_loops,
                   max_comm_size=max_comm_size,
                   _parquet_dir=spill_dir)

    def active_vids(self):
        """Vids with at least one incident edge (degree > 0) — the
        graph's actual vertex set when the id space is sparse."""
        return self._active_vids

    # ------------------------------------------------------------------
    def _stats_of(self, mem=None, moves_ref=None):
        """Combine per-shard stat partials into the label-indexed
        arrays. When ``mem`` is given (rollback path) it is broadcast
        first; ``moves_ref`` folds the last colour's un-shipped deltas
        into the same round."""
        if mem is not None:
            stats0 = {k: np.zeros(2 * self.n) for k in
                      ("w_in", "s_out", "s_in", "size")}
            mem_ref = ray.put(mem)
            # shards recompute against the pushed membership
            ray.get([a.set_state.remote(mem_ref, stats0)
                     for a in self.actors])
        parts = ray.get([a.stats_partials.remote(moves_ref)
                         for a in self.actors])
        L = 2 * self.n
        w_in = np.zeros(L)
        s_out = np.zeros(L)
        s_in = np.zeros(L)
        size = np.zeros(L)
        for (labs, wn, wl), (labs2, so, si, sz) in parts:
            w_in[labs] += wn / 2.0 + wl
            s_out[labs2] += so
            s_in[labs2] += si
            size[labs2] += sz
        return {"w_in": w_in, "s_out": s_out, "s_in": s_in,
                "size": size}

    def _quality_of(self, stats):
        sg = _ScalarGraph(self.n, self.directed, self.m, self.total_size)
        qf = _make_qf(self.quality, sg, self.gamma,
                      self.correct_self_loops)
        nz = (stats["size"] > 0) | (stats["w_in"] != 0)
        t = np.atleast_2d(qf.term(stats["w_in"][nz], stats["s_out"][nz],
                                  stats["s_in"][nz], stats["size"][nz],
                                  self.gamma))
        agg = t.sum(axis=1)
        return float(qf.combine(agg if qf.term_dim > 1 else agg[0],
                                self.gamma))

    def _term_sum(self, stats):
        """Global term-sum vector for nonlinear combines (Surprise);
        None for linear qualities — their kernels don't need it."""
        sg = _ScalarGraph(self.n, self.directed, self.m,
                          self.total_size)
        qf = _make_qf(self.quality, sg, self.gamma,
                      self.correct_self_loops)
        if qf.linear_scale() is not None:
            return None
        nz = (stats["size"] > 0) | (stats["w_in"] != 0)
        t = np.atleast_2d(qf.term(stats["w_in"][nz], stats["s_out"][nz],
                                  stats["s_in"][nz], stats["size"][nz],
                                  self.gamma))
        return t.sum(axis=1)

    def _broadcast_state(self, mem, stats):
        mem_ref = ray.put(mem)
        stats_ref = ray.put(stats)
        agg0 = self._term_sum(stats)
        ray.get([a.set_state.remote(mem_ref, stats_ref, agg0)
                 for a in self.actors])

    @staticmethod
    def _concat_props(props):
        props = [p for p in props if p is not None]
        keys = ("vids", "targs", "dq", "wnew", "wcur", "loop", "k_out",
                "k_in", "nsz", "cur")
        return {k: np.concatenate([p[i] for p in props])
                for i, k in enumerate(keys)}

    # ------------------------------------------------------------------
    def local_move_level0(self, mem=None, max_supersteps=200,
                          min_rel_improvement=1e-9, checkpoint=None,
                          level_tag="L0"):
        """Distributed local move to the fixed point. Returns (mem,
        quality, n_supersteps, history).

        Each colour superstep is ONE round of shard-actor calls
        (``step`` = apply previous colour's committed deltas +
        propose); the driver applies the identical deltas to its own
        copies, so full membership/stats arrays are broadcast only at
        cycle boundaries (recompute/rollback), not per step. Once per
        colour cycle the stats are recomputed from shard partials and
        quality verified: a cycle that decreased quality (conflicting
        parallel moves) is rolled back and re-run in safe mode — per-
        step recompute plus a greedy non-interfering subset (one move
        per touched community) — so quality is monotone non-decreasing
        like the reference's sequential queue. When a cycle commits few
        moves the colour count adaptively drops to 1, halving the
        latency-bound rounds in the convergence tail. Convergence: a
        cycle with no moves, or relative improvement below
        ``min_rel_improvement``."""
        from .checkpoint import CheckpointManager

        mem = (np.arange(self.n, dtype=np.int64) if mem is None
               else np.asarray(mem, dtype=np.int64).copy())
        ckpt = (CheckpointManager(checkpoint, f"leiden-{level_tag}",
                                  self.P, n=self.n)
                if checkpoint else None)
        start_cycle = 0
        if ckpt is not None:
            resumed = ckpt.resume()
            if resumed is not None:
                start_cycle, shards, metrics = resumed
                mem = np.concatenate(shards)[np.argsort(
                    np.concatenate([np.arange(p, self.n, self.P)
                                    for p in range(self.P)]))]
                if metrics.get("converged"):
                    stats = self._stats_of(mem)
                    return (mem, self._quality_of(stats),
                            int(metrics.get("step", 0)), [])
        stats = self._stats_of(mem)
        q = self._quality_of(stats)
        self._broadcast_state(mem, stats)
        history = []
        step = 0
        cycle_no = 0
        cur_colors = self.n_colors
        pending_ref = None    # moves committed but not yet shipped
        stats_push = None     # verified stats to adopt at cycle start
        while step < max_supersteps:
            q_cycle_start = q
            cycle_mem = mem.copy()
            cycle_moves = 0
            for color in range(cur_colors):
                props = ray.get([a.step.remote(pending_ref, color,
                                               cur_colors, stats_push)
                                 for a in self.actors])
                mv = self._concat_props(props)
                pending_ref = None
                stats_push = None
                step += 1
                vids = mv["vids"]
                if len(vids) and self.max_comm_size > 0:
                    # parallel joins may overshoot the hard cap:
                    # greedy admit by delta, tracking running sizes
                    order = np.argsort(-mv["dq"], kind="stable")
                    run_size = stats["size"].copy()
                    admit = np.zeros(len(vids), dtype=bool)
                    for i in order:
                        t_ = int(mv["targs"][i])
                        nsv = mv["nsz"][i]
                        if run_size[t_] + nsv <= self.max_comm_size:
                            run_size[t_] += nsv
                            run_size[int(mem[vids[i]])] -= nsv
                            admit[i] = True
                    mv = {k: v[admit] for k, v in mv.items()}
                    vids = mv["vids"]
                if len(vids):
                    old_lab = mem[vids].copy()
                    _apply_moves_inplace(mem, stats, mv)
                    # ship the post-commit stat values for every label
                    # this colour touched: shards upsert them into
                    # their compressed stores (absolute values from
                    # the driver's authoritative copy, so a label a
                    # shard newly references arrives with full history)
                    touched = np.unique(np.concatenate(
                        [old_lab, mv["targs"]]))
                    mv["upd_labels"] = touched
                    mv["upd_vals"] = {k: stats[k][touched].copy()
                                      for k in stats}
                    a0 = self._term_sum(stats)
                    if a0 is not None:
                        mv["agg0"] = a0
                    # one put: every shard reads the same ref zero-copy
                    pending_ref = ray.put(mv)
                    cycle_moves += len(vids)
                history.append({"step": step, "moves": int(len(vids))})
            cycle_no += 1
            converged = cycle_moves == 0
            if not converged:
                # recompute true stats from shard partials (incremental
                # community internal weights can drift when same-step
                # moves interact); the last colour's deltas fold into
                # the same round
                stats_inc = stats
                stats = self._stats_of(moves_ref=pending_ref)
                pending_ref = None
                q2 = self._quality_of(stats)
                if q2 + 1e-9 < q_cycle_start:
                    # conflicting parallel moves: redo the cycle safely
                    mem = cycle_mem.copy()
                    mem, stats, q2, safe_moves = self._safe_cycle(mem)
                    history.append({"step": step, "moves": safe_moves,
                                    "safe": True})
                else:
                    # shards adopt the verified stats with the next
                    # step call (no extra round) — only the labels
                    # whose values drifted from the incremental copies
                    # ship (shards' copies drift identically to the
                    # driver's, so an un-drifted label is already
                    # exact everywhere)
                    dl = np.flatnonzero(
                        (stats_inc["w_in"] != stats["w_in"])
                        | (stats_inc["s_out"] != stats["s_out"])
                        | (stats_inc["s_in"] != stats["s_in"])
                        | (stats_inc["size"] != stats["size"]))
                    push = {"labels": dl.astype(np.int64),
                            "vals": {k: stats[k][dl].copy()
                                     for k in stats}}
                    a0 = self._term_sum(stats)
                    if a0 is not None:
                        push["agg0"] = a0
                    stats_push = ray.put(push)
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
        # final true stats/quality (also leaves shards in sync for the
        # refinement pass; converged cycles have no pending moves and
        # stats already verified — but flush defensively)
        if pending_ref is not None or stats_push is None:
            stats = self._stats_of(moves_ref=pending_ref)
            q = self._quality_of(stats)
        else:
            ray.get([a.step.remote(None, None, cur_colors, stats_push)
                     for a in self.actors])
        return mem, q, step, history

    def _safe_cycle(self, mem):
        """One colour cycle with per-step distributed stats recompute
        and a greedy non-interfering commit subset (exact, monotone)."""
        stats = self._stats_of(mem)
        self._broadcast_state(mem, stats)
        total_moves = 0
        for color in range(self.n_colors):
            props = ray.get([a.step.remote(None, color, self.n_colors)
                             for a in self.actors])
            mv = self._concat_props(props)
            if len(mv["vids"]) == 0:
                continue
            order = np.argsort(-mv["dq"], kind="stable")
            touched = set()
            sel = []
            for i in order:
                a_, b_ = int(mem[mv["vids"][i]]), int(mv["targs"][i])
                if a_ in touched or b_ in touched:
                    continue
                touched.add(a_)
                touched.add(b_)
                sel.append(i)
            sel = np.asarray(sel, dtype=np.int64)
            mem[mv["vids"][sel]] = mv["targs"][sel]
            total_moves += len(sel)
            stats = self._stats_of(mem)
            stats_ref = ray.put(stats)
            agg0 = self._term_sum(stats)
            ray.get([a.set_stats.remote(stats_ref, agg0)
                     for a in self.actors])
        q = self._quality_of(stats)
        return mem, stats, q, total_moves

    # ------------------------------------------------------------------
    REFINE_MAX = 500_000  # internal edges per community refinement

    def refine_distributed(self, mem):
        """Per-community parallel refinement (merge-constrained) on the
        base graph. Internal edges are bucketed by community hash on
        the shards and shipped worker-to-worker; the driver only groups
        the O(n) vertex lists and passes refs. Returns refined
        membership (labels = global vid of a member => globally
        unique)."""
        R = max(self.P, 1)
        # shards hold the committed membership already (level0 leaves
        # them in sync); bucket their internal edges
        bucket_refs = [a.internal_edge_buckets.options(
            num_returns=R).remote(R) for a in self.actors]
        if R == 1:
            bucket_refs = [[r] for r in bucket_refs]

        # group vertices per community on the driver (O(n))
        vorder = np.argsort(mem, kind="stable")
        vlab = mem[vorder]
        uniq_comms, vstarts = np.unique(vlab, return_index=True)
        vbounds = np.append(vstarts, len(vlab))
        groups_per_bucket = [[] for _ in range(R)]
        for i, c in enumerate(uniq_comms):
            vids = np.sort(vorder[vbounds[i]:vbounds[i + 1]])
            groups_per_bucket[int(c) % R].append(
                (int(c), vids, self.node_size[vids]))

        results = ray.get([_refine_bucket.remote(
            groups_per_bucket[r], self.quality, self.gamma,
            self.correct_self_loops, self.directed, self.seed,
            self.max_comm_size, self.REFINE_MAX,
            *[bucket_refs[p][r] for p in range(self.P)])
            for r in range(R)])
        refined = np.arange(self.n, dtype=np.int64)
        n_giant = 0
        for vv, ll, ng in results:
            refined[vv] = ll
            n_giant += ng
        if n_giant:
            import logging
            logging.getLogger(__name__).warning(
                "refinement: %d giant communities (>%d internal edges)"
                " kept identity refinement", n_giant, self.REFINE_MAX)
        return refined

    # ------------------------------------------------------------------
    def aggregate(self, refined_mem):
        """Aggregate edge table by refined membership from per-shard
        partials: returns (agg Graph, labels, dense map). The driver
        combines only (comm_src, comm_dst) partials — never the edge
        list."""
        labels, dense = np.unique(refined_mem, return_inverse=True)
        nl = len(labels)
        dense_ref = ray.put(dense.astype(np.int64))
        parts = ray.get([a.agg_partials.remote(dense_ref, nl,
                                               self.directed)
                         for a in self.actors])
        keys = np.concatenate([p[0] for p in parts])
        ws = np.concatenate([p[1] for p in parts])
        uniq, inv = np.unique(keys, return_inverse=True)
        w = np.zeros(len(uniq))
        np.add.at(w, inv, ws)
        sizes = np.zeros(nl)
        for p in parts:
            sizes[p[2]] += p[3]
        g = Graph(nl, src=(uniq // nl).astype(np.int64),
                  dst=(uniq % nl).astype(np.int64), weights=w,
                  node_sizes=sizes, directed=self.directed)
        return g, labels, dense

    # ------------------------------------------------------------------
    def run(self, n_iterations=2, max_supersteps=200,
            tail_max_edges=150_000, tail_max_n=3000, max_levels=8,
            min_rel_improvement=1e-9, checkpoint=None,
            initial_membership=None):
        """Full multi-level pipeline: distributed local-move + refine +
        aggregate per level (the shard-actor pool is reused across
        levels). The exact in-memory schedule runs only on genuinely
        small aggregates (edge count below ``tail_max_edges``);
        edge-dense aggregates keep iterating distributed levels until
        quality stops improving. Returns (membership, quality, info).

        ``initial_membership``: length-n labels (< 2n) warm-starting
        level 0 — incremental re-clustering after graph updates
        (reference ``VertexPartition.py`` constructors' own
        ``initial_membership``): the local move starts from yesterday's
        communities instead of singletons, and refinement still
        re-validates every community from singletons inside it, so a
        stale merge gets split rather than frozen in."""
        chain = []          # per level: dense map (level vids -> next)
        level = self
        seed = None
        if initial_membership is not None:
            seed = np.asarray(initial_membership, dtype=np.int64).copy()
            if len(seed) != self.n:
                raise ValueError("initial_membership length != n")
            if seed.min(initial=0) < 0 or \
                    seed.max(initial=0) >= 2 * self.n:
                raise ValueError("initial_membership labels out of "
                                 "range [0, 2n)")
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
            level_infos.append({"n": level.n, "edges": level.n_edges,
                                "supersteps": steps, "quality": q})
            small = (agg_g.ecount <= tail_max_edges
                     and agg_g.n <= tail_max_n)
            plateaued = (q - prev_q) < min_rel_improvement * (1 + abs(q))
            if small or len(chain) >= max_levels or \
                    (plateaued and len(chain) > 1):
                if small:
                    cls2 = PARTITION_TYPES[self.quality]
                    from ..partition import MutableVertexPartition
                    part = cls2.__new__(cls2)
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
                max_comm_size=self.max_comm_size,
                _actors=level.actors)
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
