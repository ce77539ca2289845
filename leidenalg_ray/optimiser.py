"""The Leiden optimiser: local move, merge, constrained variants, the
full move→refine→aggregate schedule, multiplex optimisation and the
resolution profile.

Semantics follow reference ``src/leidenalg/Optimiser.py`` and the
executable pseudocode at reference ``doc/source/advanced.rst:100-123``.
Everything is implemented over the shared multi-layer move kernel, so a
single-layer optimisation is the K=1 case of the multiplex path
(Q = sum_k lambda_k Q_k, reference ``Optimiser.py:389-408``).

Documented divergences from the reference (see SURVEY.md §4.4):

- Node visit order is a seeded permutation (``set_rng_seed``; default
  seed 42) instead of an unseeded C RNG stream — same fixed-point
  properties, deterministic across reruns and parallelism levels.
- ``community_constraint_enforcement`` is implemented as a soft
  bonus/penalty of magnitude ``enforcement`` on moves that fill
  communities below ``min_comm_size`` / drain them under it;
  ``max_comm_size`` is a hard candidate filter. This reproduces the
  reference's observable behaviour (reference
  ``tests/test_Optimiser.py:20-38,64-82,105-125``).
- Refinement defaults to deterministic best-merge over neighbouring
  communities rather than the reference's randomised single-candidate
  refinement (reference ``CHANGELOG:18-19``); both satisfy the Leiden
  guarantees the reference documents (``Optimiser.py:21-40``).
"""

from __future__ import annotations

from collections import deque
from math import log, sqrt
from collections import namedtuple

import numpy as np

# Candidate-set constants (reference include/pynterface.h:124-130;
# numeric values are engine-local).
ALL_NEIGH_COMMS = 0
ALL_COMMS = 1
RAND_COMM = 2
RAND_NEIGH_COMM = 3
MOVE_NODES = 10
MERGE_NODES = 11

_EPS = 1e-10


class Optimiser:
    """Configuration knobs per reference ``Optimiser.py:77-292``."""

    def __init__(self):
        self.consider_comms = ALL_NEIGH_COMMS
        self.refine_consider_comms = ALL_NEIGH_COMMS
        self.optimise_routine = MOVE_NODES
        self.refine_routine = MERGE_NODES
        self.refine_partition = True
        self.consider_empty_community = True
        self.min_comm_size = 0
        self.max_comm_size = 0
        self.community_constraint_enforcement = 0.0
        self._rng = np.random.default_rng(42)

    def set_rng_seed(self, seed):
        """Seed the RNG for reproducible runs
        (reference ``Optimiser.py:284-292``)."""
        self._rng = np.random.default_rng(seed)

    # ------------------------------------------------------------------
    # The shared move kernel (multi-layer). parts share one membership.
    # ------------------------------------------------------------------
    def _move_kernel(self, parts, layer_weights, is_membership_fixed=None,
                     consider_comms=ALL_NEIGH_COMMS, constraint=None,
                     merge_only=False):
        """Greedy local move over all layers. Returns total weighted
        quality improvement. ``constraint``: array of block ids — moves
        allowed only between communities inside the same block
        (reference ``Optimiser.py:513-659``). ``merge_only``: one pass,
        only sole members of their community may move (join-only,
        reference ``Optimiser.py:584-589``)."""
        p0 = parts[0]
        n = p0.graph.n
        if n == 0:
            return 0.0
        fixed = (np.zeros(n, dtype=bool) if is_membership_fixed is None
                 else np.asarray(list(is_membership_fixed), dtype=bool))
        mem = p0.membership  # canonical shared membership (view)
        for p in parts[1:]:
            if not np.array_equal(p.membership, mem):
                p.set_membership(mem)

        order = self._rng.permutation(n)
        order = order[~fixed[order]]
        queue = deque(order)
        in_queue = np.zeros(n, dtype=bool)
        in_queue[order] = True
        total = 0.0
        E = float(self.community_constraint_enforcement)
        min_s = int(self.min_comm_size)
        max_s = int(self.max_comm_size)

        # node counts per label (shared across layers) for merge_only
        # checks; community *size* (summed node sizes, the reference's
        # csize — aggregate nodes carry the mass of their constituents,
        # reference VertexPartition.py:516-521) for the size constraints.
        def ncount(label):
            i = p0._idx_of.get(int(label))
            return int(p0._ncount[i]) if i is not None else 0

        def csize(label):
            i = p0._idx_of.get(int(label))
            return float(p0._size[i]) if i is not None else 0.0

        # community label -> constraint block (communities never span
        # blocks during constrained optimisation)
        comm_block = None
        if constraint is not None:
            comm_block = {}
            for v in range(n):
                lab = int(mem[v])
                if lab not in comm_block:
                    comm_block[lab] = int(constraint[v])
        processed = 0
        while queue:
            v = int(queue.popleft())
            in_queue[v] = False
            processed += 1
            cur = int(mem[v])
            alone = ncount(cur) == 1
            if merge_only and not alone:
                continue

            # --- candidate labels -------------------------------------
            per_layer = []  # (labels, w_to, w_from) per layer
            neigh_labels = None
            for p in parts:
                lw = p.neighbour_comm_weights(v)
                per_layer.append(lw)
                neigh_labels = (lw[0] if neigh_labels is None
                                else np.union1d(neigh_labels, lw[0]))
            if consider_comms == ALL_NEIGH_COMMS:
                cands = neigh_labels
            elif consider_comms == ALL_COMMS:
                cands = np.fromiter(p0._idx_of.keys(), dtype=np.int64)
                cands.sort()
            elif consider_comms == RAND_NEIGH_COMM:
                if len(neigh_labels) == 0:
                    cands = np.empty(0, dtype=np.int64)
                else:
                    # uniform over incident edges => proportional to the
                    # number of neighbours per community
                    # (reference Optimiser.py:99-103)
                    nb = parts[0].graph.neighbours(v)
                    if len(nb) == 0:
                        cands = np.empty(0, dtype=np.int64)
                    else:
                        u = int(nb[self._rng.integers(len(nb))])
                        cands = np.array([mem[u]], dtype=np.int64)
            elif consider_comms == RAND_COMM:
                u = int(self._rng.integers(n))
                cands = np.array([mem[u]], dtype=np.int64)
            else:
                raise ValueError(f"unknown consider_comms {consider_comms}")

            if constraint is not None and len(cands):
                blk = int(constraint[v])
                cands = np.asarray(
                    [lab for lab in cands if comm_block.get(int(lab)) == blk],
                    dtype=np.int64)

            cands = cands[cands != cur]
            # empty community target (reference Optimiser.py:212-220)
            empty_label = -1
            if (self.consider_empty_community and not alone
                    and not merge_only and constraint is None):
                empty_label = p0._next_label
                for p in parts[1:]:
                    empty_label = max(empty_label, p._next_label)
                cands = np.append(cands, empty_label)
            if len(cands) == 0:
                continue
            # hard max-community-size filter, on summed node size
            # (reference functions.py:86, CHANGELOG max_comm_size)
            if max_s > 0:
                nsv = float(p0.graph.node_size[v])
                keep = np.array([csize(lab) + nsv <= max_s
                                 if lab != empty_label else True
                                 for lab in cands])
                cands = cands[keep]
                if len(cands) == 0:
                    continue

            # --- evaluate -------------------------------------------------
            score = np.zeros(len(cands))
            for p, lam, (labels, w_to, w_from) in zip(parts, layer_weights,
                                                      per_layer):
                wt = np.zeros(len(cands))
                wf = np.zeros(len(cands))
                pos = np.searchsorted(labels, cands)
                ok = (pos < len(labels))
                ok[ok] = labels[pos[ok]] == cands[ok]
                wt[ok] = w_to[pos[ok]]
                wf[ok] = w_from[pos[ok]]
                posc = np.searchsorted(labels, cur)
                if posc < len(labels) and labels[posc] == cur:
                    curw = (float(w_to[posc]), float(w_from[posc]))
                else:
                    curw = (0.0, 0.0)
                order2 = np.argsort(cands, kind="stable")
                cl = cands[order2]
                vals = p._eval_moves(v, cl, wt[order2], wf[order2],
                                     cur_w=curw)
                back = np.empty_like(vals)
                back[order2] = vals
                score += lam * back
            dq = score.copy()

            # soft min-size constraint (engine-defined; see module doc)
            if E > 0 and min_s > 0:
                nsv = float(p0.graph.node_size[v])
                bonus = np.zeros(len(cands))
                for j, lab in enumerate(cands):
                    after = (nsv if lab == empty_label
                             else csize(lab) + nsv)
                    if after <= min_s:
                        bonus[j] += E
                if not alone and csize(cur) - nsv < min_s:
                    bonus -= E
                score = score + bonus

            best = int(np.argmax(score))
            # deterministic tie-break: lowest label among maximal scores
            ties = np.flatnonzero(score >= score[best] - 1e-15)
            if len(ties) > 1:
                best = int(ties[np.argmin(cands[ties])])
            if score[best] <= _EPS:
                continue
            target = int(cands[best])
            actual = 0.0
            for p, lam in zip(parts, layer_weights):
                actual += lam * p.move_node(v, target)
            total += actual
            if not merge_only:
                nbrs = p0.graph.neighbours(v)
                for p in parts[1:]:
                    nb2 = p.graph.neighbours(v)
                    if len(nb2):
                        nbrs = np.concatenate([nbrs, nb2])
                for u in np.unique(nbrs):
                    u = int(u)
                    if (not in_queue[u] and not fixed[u]
                            and mem[u] != target):
                        queue.append(u)
                        in_queue[u] = True
        return total

    # ------------------------------------------------------------------
    # Public routine wrappers (reference Optimiser.py:463-659)
    # ------------------------------------------------------------------
    def move_nodes(self, partition, is_membership_fixed=None,
                   consider_comms=None):
        if consider_comms is None:
            consider_comms = self.consider_comms
        return self._move_kernel([partition], [1.0], is_membership_fixed,
                                 consider_comms)

    def merge_nodes(self, partition, is_membership_fixed=None,
                    consider_comms=None):
        if consider_comms is None:
            consider_comms = self.consider_comms
        return self._move_kernel([partition], [1.0], is_membership_fixed,
                                 consider_comms, merge_only=True)

    def move_nodes_constrained(self, partition, constrained_partition,
                               consider_comms=None):
        if consider_comms is None:
            consider_comms = self.refine_consider_comms
        return self._move_kernel([partition], [1.0], None, consider_comms,
                                 constraint=np.asarray(
                                     constrained_partition.membership))

    def merge_nodes_constrained(self, partition, constrained_partition,
                                consider_comms=None):
        if consider_comms is None:
            consider_comms = self.refine_consider_comms
        return self._move_kernel([partition], [1.0], None, consider_comms,
                                 constraint=np.asarray(
                                     constrained_partition.membership),
                                 merge_only=True)

    # ------------------------------------------------------------------
    # Full Leiden schedule (reference advanced.rst:100-123)
    # ------------------------------------------------------------------
    def optimise_partition(self, partition, n_iterations=2,
                           is_membership_fixed=None):
        return self.optimise_partition_multiplex(
            [partition], layer_weights=[1.0], n_iterations=n_iterations,
            is_membership_fixed=is_membership_fixed)

    def optimise_partition_multiplex(self, partitions, layer_weights=None,
                                     n_iterations=2,
                                     is_membership_fixed=None):
        """Optimise K layer partitions sharing one membership;
        Q = sum_k lambda_k Q_k (reference ``Optimiser.py:357-461``)."""
        K = len(partitions)
        if layer_weights is None:
            layer_weights = [1.0] * K
        layer_weights = [float(w) for w in layer_weights]
        if any(np.isnan(layer_weights)):
            raise ValueError("layer weights cannot be NaN "
                             "(reference python_optimiser_interface.cpp:171-175)")
        n = partitions[0].graph.n
        for p in partitions[1:]:
            if p.graph.n != n:
                raise ValueError("multiplex layers must share a vertex set")
        fixed = (None if is_membership_fixed is None
                 else np.asarray(list(is_membership_fixed), dtype=bool))

        itr = 0
        total = 0.0
        while True:
            inc = self._one_iteration(partitions, layer_weights, fixed)
            total += inc
            itr += 1
            if n_iterations < 0:
                if inc <= _EPS:
                    break
            elif itr >= n_iterations:
                break
        if fixed is None or not fixed.any():
            # dense renumber by decreasing size, deterministic
            partitions[0].renumber_communities()
            canonical = partitions[0].membership
            for p in partitions[1:]:
                p.set_membership(canonical)
        return total

    def _one_iteration(self, partitions, layer_weights, fixed):
        """One Leiden iteration: move on the aggregate level, push down,
        refine on the base graph, aggregate on the refined partition with
        membership seeded from the unrefined one, repeat until local move
        stalls (reference ``advanced.rst:100-123``)."""
        K = len(partitions)
        base_graphs = [p.graph for p in partitions]
        n = base_graphs[0].n
        total = 0.0

        agg_parts = partitions
        agg_fixed = fixed
        node_of = np.arange(n)  # base vertex -> aggregate node
        level = 0
        routine_merge = self.optimise_routine == MERGE_NODES
        while True:
            d = self._move_kernel(agg_parts, layer_weights, agg_fixed,
                                  self.consider_comms,
                                  merge_only=routine_merge)
            total += d
            # push down to the base partitions
            if agg_parts is not partitions:
                base_mem = agg_parts[0].membership[node_of]
                for p in partitions:
                    p.set_membership(base_mem)
            if d <= _EPS and level > 0:
                break
            if agg_parts[0].graph.n == agg_parts[0].n_communities():
                # every aggregate node is its own community: nothing to
                # coarsen further
                if d <= _EPS:
                    break
            # refinement on the base graph
            if self.refine_partition:
                refined = [p._new_like(g, None)
                           for p, g in zip(partitions, base_graphs)]
                self._move_kernel(
                    refined, layer_weights, None, self.refine_consider_comms,
                    constraint=np.asarray(partitions[0].membership),
                    merge_only=self.refine_routine == MERGE_NODES)
                ref_mem = refined[0].membership
            else:
                ref_mem = partitions[0].membership
            labels, dense = np.unique(ref_mem, return_inverse=True)
            n_agg = len(labels)
            if n_agg == agg_parts[0].graph.n:
                break  # no coarsening possible
            # aggregate each layer by the refined partition, seed with the
            # unrefined membership (the Leiden twist, advanced.rst:116-123)
            seed = np.empty(n_agg, dtype=np.int64)
            seed[dense] = partitions[0].membership
            agg_parts = []
            for p, g in zip(partitions, base_graphs):
                agg_g = g.aggregate(dense)
                agg_parts.append(p._new_like(agg_g, seed))
            if fixed is not None and fixed.any():
                agg_fixed = np.zeros(n_agg, dtype=bool)
                np.logical_or.at(agg_fixed, dense, fixed)
            else:
                agg_fixed = None
            node_of = dense
            level += 1
        return total

    # ------------------------------------------------------------------
    # Resolution profile (reference Optimiser.py:661-861)
    # ------------------------------------------------------------------
    def resolution_profile(self, graph, partition_type, resolution_range,
                           weights=None,
                           bisect_func=lambda p: p.bisect_value(),
                           min_diff_bisect_value=1,
                           min_diff_resolution=1e-3,
                           linear_bisection=False,
                           number_iterations=1,
                           **kwargs):
        """Recursive bisection over the resolution parameter; geometric
        midpoints in log space when both endpoints are positive; stop
        when the bisect value changes by <= min_diff_bisect_value or the
        interval is below min_diff_resolution."""

        BisectPartition = namedtuple("BisectPartition",
                                     ["partition", "bisect_value"])

        def find_partition(res):
            part = partition_type(graph, weights=weights,
                                  resolution_parameter=res, **kwargs)
            n_itr = 0
            while self.optimise_partition(part) > _EPS and \
                    (n_itr < number_iterations or number_iterations <= 0):
                n_itr += 1
            return part

        def ensure_monotonicity(bisect_values, new_res):
            # reference Optimiser.py:762-773. NOTE: the second repair
            # loop is a no-op in the reference too (Optimiser.py:769
            # assigns ``best_res = new_res`` inside the loop, so
            # ``bisect_values[new_res]`` is always reassigned to
            # itself); we mirror that behaviour exactly rather than
            # "fix" it and diverge from the published profiles.
            for res, bp in list(bisect_values.items()):
                if (bisect_values[new_res].partition.quality(res)
                        > bp.partition.quality(res)):
                    bisect_values[res] = bisect_values[new_res]
            current_quality = bisect_values[new_res].partition.quality(new_res)
            best_res = new_res
            for res, bp in bisect_values.items():
                if bp.partition.quality(new_res) > current_quality:
                    best_res = new_res
            bisect_values[new_res] = bisect_values[best_res]

        def clean_stepwise(bisect_values):
            # reference Optimiser.py:732-757
            for res, bp in list(bisect_values.items()):
                best_bp = bp
                best_quality = bp.partition.quality(res)
                for res2, bp2 in bisect_values.items():
                    if bp2.partition.quality(res) > best_quality:
                        best_bp = bp2
                        best_quality = bp2.partition.quality(res)
                if best_bp is not bp:
                    bisect_values[res] = best_bp
            blist = sorted(((r, bp.bisect_value)
                            for r, bp in bisect_values.items()))
            for (r1, v1), (r2, v2) in zip(blist, blist[1:]):
                if v1 == v2 and r2 in bisect_values:
                    del bisect_values[r2]
            for res, bp in bisect_values.items():
                bp.partition.resolution_parameter = res

        bisect_values = {}
        stack = [tuple(resolution_range)]
        for res in resolution_range:
            part = find_partition(res)
            bisect_values[res] = BisectPartition(part, bisect_func(part))
        while stack:
            lo, hi = stack.pop()
            diff_bisect = abs(bisect_values[lo].bisect_value
                              - bisect_values[hi].bisect_value)
            if lo > 0 and hi > 0 and not linear_bisection:
                diff_res = log(hi / lo)
            else:
                diff_res = abs(hi - lo)
            if diff_bisect > min_diff_bisect_value and \
                    diff_res > min_diff_resolution:
                if lo > 0 and hi > 0 and not linear_bisection:
                    new_res = sqrt(hi * lo)
                else:
                    new_res = (lo + hi) / 2.0
                stack.append((lo, new_res))
                stack.append((new_res, hi))
                if new_res not in bisect_values:
                    part = find_partition(new_res)
                    bisect_values[new_res] = BisectPartition(
                        part, bisect_func(part))
                    ensure_monotonicity(bisect_values, new_res)
        clean_stepwise(bisect_values)
        return sorted((bp.partition for bp in bisect_values.values()),
                      key=lambda p: p.resolution_parameter)
