"""Mutable vertex partitions with incrementally-maintained community
administration, mirroring the reference's semantics
(reference ``src/leidenalg/VertexPartition.py``; C-glue
``python_partition_interface.cpp``) on the in-memory tier.

State per partition:

- ``membership[v]`` — community *label* (arbitrary non-negative int64;
  labels are preserved across moves, which is what lets fixed-membership
  nodes keep non-consecutive labels, reference
  ``tests/test_Optimiser.py:145-164``).
- community administration, indexed by a dense internal community id:
  ``w_in`` (internal edge weight, each edge once, self-loops once),
  ``s_out`` / ``s_in`` (summed vertex strengths), ``size`` (summed
  node sizes), ``ncount`` (vertex count) — the exact state the
  reference maintains incrementally (``VertexPartition.py:11-15,273-365``).
- ``_agg`` — running sum of the quality plugin's per-community term
  vector, so ``quality()`` is O(1) and ``diff_move`` is an exact local
  recompute (contract: ``diff_move(v,c) == quality_after - quality_before``,
  reference ``tests/test_VertexPartition.py:91-111``).
"""

from __future__ import annotations

import numpy as np

from .graph import Graph
from .quality import (
    QUALITY_REGISTRY,
    ModularityQuality,
    RBConfigurationQuality,
    CPMQuality,
    RBERQuality,
    SignificanceQuality,
    SurpriseQuality,
)


class MutableVertexPartition:
    """Base partition. Subclasses bind a quality plugin."""

    _qf_cls = None
    _linear = False  # has a linear resolution parameter

    def __init__(self, graph, initial_membership=None, weights=None,
                 node_sizes=None, resolution_parameter=1.0,
                 correct_self_loops=None, _validate=True):
        if weights is not None or node_sizes is not None:
            graph = Graph(graph.n, src=graph.src, dst=graph.dst,
                          weights=(weights if weights is not None
                                   else graph.weight),
                          node_sizes=(node_sizes if node_sizes is not None
                                      else graph.node_size),
                          directed=graph.directed)
        self.graph = graph
        if correct_self_loops is None:
            correct_self_loops = (graph.has_loops
                                  if self._qf_cls is CPMQuality else False)
        self.qf = self._qf_cls(graph, resolution_parameter=resolution_parameter,
                               correct_self_loops=correct_self_loops)
        if _validate and not self.qf.allows_negative_weights:
            w = graph.weight
            if len(w) and (np.isinf(w).any() or (w < 0).any()):
                raise ValueError(
                    f"{self.qf.name} requires finite non-negative edge weights "
                    "(reference python_partition_interface.cpp:83-91)")
        if initial_membership is None:
            mem = np.arange(graph.n, dtype=np.int64)
        else:
            mem = np.asarray(list(initial_membership), dtype=np.int64)
            if len(mem) != graph.n:
                raise ValueError("initial_membership length != vertex count")
            if len(mem) and mem.min() < 0:
                raise ValueError("membership must be non-negative")
        self._set_membership_internal(mem)

    # -- admin -----------------------------------------------------------
    def _set_membership_internal(self, mem):
        g = self.graph
        self._mem = np.asarray(mem, dtype=np.int64).copy()
        labels, inv = (np.unique(self._mem, return_inverse=True)
                       if g.n else (np.empty(0, np.int64), np.empty(0, np.int64)))
        cap = max(16, 2 * len(labels) + 8)
        C = len(labels)
        self._label = np.full(cap, -1, dtype=np.int64)
        self._label[:C] = labels
        self._idx_of = {int(l): i for i, l in enumerate(labels)}
        # dense label -> slot map for vectorised gathers (-1 = absent)
        top = int(labels.max()) + 1 if C else 1
        self._idx_arr = np.full(max(top, 16), -1, dtype=np.int64)
        self._idx_arr[labels] = np.arange(C)
        self._free = []
        self._w_in = np.zeros(cap)
        self._s_out = np.zeros(cap)
        self._s_in = np.zeros(cap)
        self._size = np.zeros(cap)
        self._ncount = np.zeros(cap, dtype=np.int64)
        self._n_comm = C
        if g.n:
            internal = self._mem[g.src] == self._mem[g.dst]
            ci = np.searchsorted(labels, self._mem[g.src[internal]])
            np.add.at(self._w_in, ci, g.weight[internal])
            np.add.at(self._s_out, inv, g.strength_out)
            np.add.at(self._s_in, inv, g.strength_in)
            np.add.at(self._size, inv, g.node_size)
            np.add.at(self._ncount, inv, 1)
        self._next_label = int(labels.max()) + 1 if C else 0
        self._recompute_agg()

    def _recompute_agg(self):
        idx = np.arange(len(self._label))[self._label >= 0]
        t = self.qf.term(self._w_in[idx], self._s_out[idx], self._s_in[idx],
                         self._size[idx], self.qf.gamma)
        t = np.atleast_2d(t)
        self._agg = t.sum(axis=1)

    def _grow(self):
        old = len(self._label)
        new = old * 2
        for name in ("_w_in", "_s_out", "_s_in", "_size"):
            arr = np.zeros(new)
            arr[:old] = getattr(self, name)
            setattr(self, name, arr)
        nc = np.zeros(new, dtype=np.int64)
        nc[:old] = self._ncount
        self._ncount = nc
        lb = np.full(new, -1, dtype=np.int64)
        lb[:old] = self._label
        self._label = lb

    def _alloc(self, label):
        """Internal idx for label, allocating an empty slot if new."""
        i = self._idx_of.get(int(label))
        if i is not None:
            return i
        if self._free:
            i = self._free.pop()
        else:
            empties = np.flatnonzero(self._label < 0)
            if len(empties) == 0:
                old = len(self._label)
                self._grow()
                i = old
            else:
                i = int(empties[0])
        self._label[i] = label
        self._w_in[i] = self._s_out[i] = self._s_in[i] = self._size[i] = 0.0
        self._ncount[i] = 0
        self._idx_of[int(label)] = i
        if label >= len(self._idx_arr):
            new = np.full(max(2 * len(self._idx_arr), int(label) + 1),
                          -1, dtype=np.int64)
            new[:len(self._idx_arr)] = self._idx_arr
            self._idx_arr = new
        self._idx_arr[int(label)] = i
        if label >= self._next_label:
            self._next_label = int(label) + 1
        return i

    def _release(self, i):
        lab = int(self._label[i])
        del self._idx_of[lab]
        self._idx_arr[lab] = -1
        self._label[i] = -1
        self._free.append(i)
        self._n_comm -= 1

    # -- public API ------------------------------------------------------
    @property
    def membership(self):
        return self._mem

    def set_membership(self, membership):
        """Overwrite membership, refresh administration
        (reference ``python_partition_interface.cpp:1036-1120``)."""
        self._set_membership_internal(np.asarray(list(membership)))

    def __len__(self):
        """Number of (non-empty) communities."""
        return int(self._n_comm)

    def n_communities(self):
        return int(self._n_comm)

    def sizes(self):
        """Vertex counts per community, in ascending label order
        (matches igraph ``VertexClustering.sizes()`` after renumbering)."""
        order = np.argsort(self._label[self._label >= 0], kind="stable")
        present = np.flatnonzero(self._label >= 0)[order]
        return [int(self._ncount[i]) for i in present]

    def quality(self, resolution_parameter=None):
        if resolution_parameter is None or not self.qf.uses_resolution:
            return float(self.qf.combine(
                self._agg if self.qf.term_dim > 1 else self._agg[0],
                self.qf.gamma))
        gamma = float(resolution_parameter)
        idx = np.flatnonzero(self._label >= 0)
        t = np.atleast_2d(self.qf.term(self._w_in[idx], self._s_out[idx],
                                       self._s_in[idx], self._size[idx], gamma))
        agg = t.sum(axis=1)
        return float(self.qf.combine(agg if self.qf.term_dim > 1 else agg[0],
                                     gamma))

    # -- per-vertex neighbour/community weights -------------------------
    def neighbour_comm_weights(self, v):
        """(labels, w_to, w_from): unique neighbour-community labels of v
        with summed edge weight v->comm and comm->v (self-loops excluded;
        undirected graphs report everything in ``w_to``). This is the
        'message' of the gather-scatter (reference
        ``VertexPartition.py:367-385``)."""
        g = self.graph
        no, wo = g.neighbours_out(v)
        ni, wi = g.neighbours_in(v)
        allc = self._mem[np.concatenate([no, ni])] if len(ni) else self._mem[no]
        if len(allc) == 0:
            return (np.empty(0, np.int64), np.empty(0), np.empty(0))
        uniq, inv = np.unique(allc, return_inverse=True)
        w_to = np.zeros(len(uniq))
        w_from = np.zeros(len(uniq))
        np.add.at(w_to, inv[:len(no)], wo)
        if len(ni):
            np.add.at(w_from, inv[len(no):], wi)
        return uniq, w_to, w_from

    def _eval_moves(self, v, cand_labels, w_to, w_from, cur_w=None):
        """Exact quality deltas for moving v to each candidate label.

        cand_labels (sorted) / w_to / w_from are aligned arrays (w_* =
        weight between v and that community, self-loops excluded).
        ``cur_w``: (w_to, w_from) between v and its *current* community —
        required when the current community is not among the candidates.
        Returns float array.
        """
        g = self.graph
        cur = int(self._mem[v])
        io = self._idx_of[cur]
        loop_v = float(g.loop_weight[v])
        ko, ki = float(g.strength_out[v]), float(g.strength_in[v])
        ns = float(g.node_size[v])
        qf = self.qf
        gamma = qf.gamma

        # weight between v and its current community
        pos = np.searchsorted(cand_labels, cur)
        has_cur = pos < len(cand_labels) and cand_labels[pos] == cur
        if cur_w is not None:
            cw_to, cw_from = float(cur_w[0]), float(cur_w[1])
        elif has_cur:
            cw_to, cw_from = float(w_to[pos]), float(w_from[pos])
        else:
            cw_to = cw_from = 0.0
        d_old_w = -(cw_to + cw_from + loop_v)

        # old community after v leaves
        old_after = (self._w_in[io] + d_old_w, self._s_out[io] - ko,
                     self._s_in[io] - ki, self._size[io] - ns)
        old_before = (self._w_in[io], self._s_out[io], self._s_in[io],
                      self._size[io])

        # candidate communities before/after v joins (empty label -> zeros)
        k = len(cand_labels)
        nw = np.zeros(k)
        nso = np.zeros(k)
        nsi = np.zeros(k)
        nsz = np.zeros(k)
        cl = np.asarray(cand_labels, dtype=np.int64)
        in_range = cl < len(self._idx_arr)
        idxs = np.full(k, -1, dtype=np.int64)
        idxs[in_range] = self._idx_arr[cl[in_range]]
        known = idxs >= 0
        nw[known] = self._w_in[idxs[known]]
        nso[known] = self._s_out[idxs[known]]
        nsi[known] = self._s_in[idxs[known]]
        nsz[known] = self._size[idxs[known]]
        aw = nw + w_to + w_from + loop_v
        aso, asi, asz = nso + ko, nsi + ki, nsz + ns

        # one fused term evaluation over [after_new | before_new |
        # old_after | old_before] instead of four separate calls
        tw = np.concatenate([aw, nw, [old_after[0], old_before[0]]])
        tso = np.concatenate([aso, nso, [old_after[1], old_before[1]]])
        tsi = np.concatenate([asi, nsi, [old_after[2], old_before[2]]])
        tsz = np.concatenate([asz, nsz, [old_after[3], old_before[3]]])
        terms = np.atleast_2d(qf.term(tw, tso, tsi, tsz, gamma))
        delta = (terms[:, :k] - terms[:, k:2 * k]
                 + terms[:, 2 * k:2 * k + 1] - terms[:, 2 * k + 1:])
        scale = qf.linear_scale()
        if scale is not None:
            out = scale * delta[0]
        else:
            # nonlinear combine (Surprise): exact per-candidate recompute
            base_q = self.quality()
            out = np.empty(k)
            for j in range(k):
                agg2 = self._agg + delta[:, j]
                out[j] = qf.combine(agg2 if qf.term_dim > 1 else agg2[0],
                                    gamma) - base_q
        # moving to own community is a no-op
        if has_cur:
            out[pos] = 0.0
        return out

    def diff_move(self, v, new_comm):
        """Exact change in quality() if v moved to community ``new_comm``
        (reference ``VertexPartition.py:110-147``)."""
        cur = int(self._mem[v])
        new_comm = int(new_comm)
        if new_comm == cur:
            return 0.0
        labels, w_to, w_from = self.neighbour_comm_weights(v)
        pos = np.searchsorted(labels, new_comm)
        if pos < len(labels) and labels[pos] == new_comm:
            cl = labels
            wt, wf = w_to, w_from
        else:
            cl = np.insert(labels, pos, new_comm)
            wt = np.insert(w_to, pos, 0.0)
            wf = np.insert(w_from, pos, 0.0)
        vals = self._eval_moves(v, cl, wt, wf)
        j = int(np.searchsorted(cl, new_comm))
        return float(vals[j])

    def move_node(self, v, new_comm):
        """Commit a move and update administration incrementally
        (reference ``VertexPartition.py:184-204``). Returns the exact
        quality delta."""
        cur = int(self._mem[v])
        new_comm = int(new_comm)
        if new_comm == cur:
            return 0.0
        labels, w_to, w_from = self.neighbour_comm_weights(v)

        def wsum(lab):
            p = np.searchsorted(labels, lab)
            if p < len(labels) and labels[p] == lab:
                return float(w_to[p]), float(w_from[p])
            return 0.0, 0.0

        pos = np.searchsorted(labels, new_comm)
        if pos < len(labels) and labels[pos] == new_comm:
            cl, wt, wf = labels, w_to, w_from
        else:
            cl = np.insert(labels, pos, new_comm)
            wt = np.insert(w_to, pos, 0.0)
            wf = np.insert(w_from, pos, 0.0)
        vals = self._eval_moves(v, cl, wt, wf)
        j = int(np.searchsorted(cl, new_comm))
        dq = float(vals[j])
        self._commit(v, new_comm, wsum(new_comm), wsum(cur))
        return dq

    def _commit(self, v, new_comm, w_new, w_cur):
        """Apply a move: update admin + agg incrementally. ``w_new`` /
        ``w_cur`` are (w_to, w_from) between v and the target / current
        community (self-loops excluded)."""
        g = self.graph
        cur = int(self._mem[v])
        loop_v = float(g.loop_weight[v])
        ko, ki = float(g.strength_out[v]), float(g.strength_in[v])
        ns = float(g.node_size[v])
        qf = self.qf
        gamma = qf.gamma

        def term_of(i):
            t = np.atleast_2d(qf.term(
                np.array([self._w_in[i]]), np.array([self._s_out[i]]),
                np.array([self._s_in[i]]), np.array([self._size[i]]), gamma))
            return t[:, 0]

        io = self._idx_of[cur]
        inw = self._alloc(new_comm)
        before = term_of(io) + term_of(inw)
        ct, cf = w_cur
        self._w_in[io] -= ct + cf + loop_v
        self._s_out[io] -= ko
        self._s_in[io] -= ki
        self._size[io] -= ns
        self._ncount[io] -= 1
        nt, nf = w_new
        was_empty = self._ncount[inw] == 0
        self._w_in[inw] += nt + nf + loop_v
        self._s_out[inw] += ko
        self._s_in[inw] += ki
        self._size[inw] += ns
        self._ncount[inw] += 1
        after = term_of(io) + term_of(inw)
        self._agg += after - before
        self._mem[v] = new_comm
        if was_empty:
            self._n_comm += 1
        if self._ncount[io] == 0:
            # zero out residual float dust and release the label
            self._agg -= term_of(io)
            self._w_in[io] = self._s_out[io] = self._s_in[io] = self._size[io] = 0.0
            self._agg += term_of(io)
            self._release(io)

    # -- community statistics accessors (reference VertexPartition.py:273-385)
    def _stat(self, arr, comm):
        i = self._idx_of.get(int(comm))
        return float(arr[i]) if i is not None else 0.0

    def total_weight_in_comm(self, comm):
        return self._stat(self._w_in, comm)

    def total_weight_from_comm(self, comm):
        """Total weight of edges leaving the community (external only):
        directed ``s_out - w_in``; undirected ``s - 2*w_in`` (strength
        counts internal edges and loops twice)."""
        i = self._idx_of.get(int(comm))
        if i is None:
            return 0.0
        w_int = self._w_in[i]
        if self.graph.directed:
            return float(self._s_out[i] - w_int)
        return float(self._s_out[i] - 2.0 * w_int)

    def total_weight_to_comm(self, comm):
        i = self._idx_of.get(int(comm))
        if i is None:
            return 0.0
        w_int = self._w_in[i]
        if self.graph.directed:
            return float(self._s_in[i] - w_int)
        return float(self._s_in[i] - 2.0 * w_int)

    def total_weight_in_all_comms(self):
        idx = self._label >= 0
        return float(self._w_in[idx].sum())

    def total_possible_edges_in_all_comms(self):
        idx = self._label >= 0
        return float(self.graph.possible_edges(
            self._size[idx], self.qf.correct_self_loops).sum())

    def weight_to_comm(self, v, comm):
        labels, w_to, _ = self.neighbour_comm_weights(v)
        p = np.searchsorted(labels, int(comm))
        if p < len(labels) and labels[p] == int(comm):
            return float(w_to[p])
        return 0.0

    def weight_from_comm(self, v, comm):
        if not self.graph.directed:
            return self.weight_to_comm(v, comm)
        labels, _, w_from = self.neighbour_comm_weights(v)
        p = np.searchsorted(labels, int(comm))
        if p < len(labels) and labels[p] == int(comm):
            return float(w_from[p])
        return 0.0

    # -- coarsening ------------------------------------------------------
    def _dense_membership(self):
        """(dense_membership, labels): dense ids 0..C-1 in ascending label
        order."""
        labels, dense = np.unique(self._mem, return_inverse=True)
        return dense.astype(np.int64), labels

    def aggregate_partition(self, membership_partition=None):
        """Collapse the graph by this partition's communities; the result
        starts as a singleton partition unless seeded from
        ``membership_partition`` (reference ``VertexPartition.py:149-182``)."""
        dense, labels = self._dense_membership()
        agg_graph = self.graph.aggregate(dense)
        if membership_partition is None:
            init = None
        else:
            init = np.empty(len(labels), dtype=np.int64)
            init[dense] = membership_partition.membership
        return self._new_like(agg_graph, init)

    def _new_like(self, graph, membership):
        p = type(self).__new__(type(self))
        MutableVertexPartition.__init__(
            p, graph, initial_membership=membership,
            resolution_parameter=self.qf.gamma,
            correct_self_loops=self.qf.correct_self_loops,
            _validate=False)
        return p

    def from_coarse_partition(self, partition, coarse_node=None):
        """membership[v] = partition.membership[coarse_node[v]]
        (reference ``VertexPartition.py:206-257``)."""
        cn = self._mem if coarse_node is None else np.asarray(coarse_node,
                                                              dtype=np.int64)
        self.set_membership(np.asarray(partition.membership)[cn])

    def renumber_communities(self):
        """Relabel communities 0..C-1 by decreasing vertex count,
        ties broken by smallest member vertex id (deterministic — stricter
        than the reference, which is explicitly unstable,
        ``VertexPartition.py:259-267``)."""
        mem = self._mem
        labels, dense = np.unique(mem, return_inverse=True)
        counts = np.bincount(dense)
        first_v = np.full(len(labels), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(first_v, dense, np.arange(len(mem)))
        order = np.lexsort((first_v, -counts))
        rank = np.empty(len(labels), dtype=np.int64)
        rank[order] = np.arange(len(labels))
        self.set_membership(rank[dense])

    @classmethod
    def FromPartition(cls, partition, **kwargs):
        """Re-type a partition: score an existing membership under another
        quality function (reference ``VertexPartition.py:56-94``)."""
        return cls(partition.graph,
                   initial_membership=partition.membership, **kwargs)

    def __repr__(self):
        return (f"{type(self).__name__}(n={self.graph.n}, "
                f"n_comm={self._n_comm}, q={self.quality():.6f})")


class ModularityVertexPartition(MutableVertexPartition):
    """Newman-Girvan modularity; Leicht-Newman for directed graphs
    (reference ``VertexPartition.py:387-463``)."""
    _qf_cls = ModularityQuality

    def __init__(self, graph, initial_membership=None, weights=None):
        super().__init__(graph, initial_membership, weights=weights)


class LinearResolutionParameterVertexPartition(MutableVertexPartition):
    _linear = True

    @property
    def resolution_parameter(self):
        return self.qf.gamma

    @resolution_parameter.setter
    def resolution_parameter(self, value):
        self.qf.gamma = float(value)
        self._recompute_agg()

    def bisect_value(self):
        """Monotone step function for resolution bisection
        (reference ``VertexPartition.py:661-668``)."""
        return self.total_weight_in_all_comms()


class RBConfigurationVertexPartition(LinearResolutionParameterVertexPartition):
    """Reichardt-Bornholdt with configuration null model
    (reference ``VertexPartition.py:760-847``)."""
    _qf_cls = RBConfigurationQuality

    def __init__(self, graph, initial_membership=None, weights=None,
                 resolution_parameter=1.0):
        super().__init__(graph, initial_membership, weights=weights,
                         resolution_parameter=resolution_parameter)


class RBERVertexPartition(LinearResolutionParameterVertexPartition):
    """Reichardt-Bornholdt with Erdos-Renyi null model
    (reference ``VertexPartition.py:673-758``)."""
    _qf_cls = RBERQuality

    def __init__(self, graph, initial_membership=None, weights=None,
                 node_sizes=None, resolution_parameter=1.0):
        super().__init__(graph, initial_membership, weights=weights,
                         node_sizes=node_sizes,
                         resolution_parameter=resolution_parameter)


class CPMVertexPartition(LinearResolutionParameterVertexPartition):
    """Constant Potts Model; negative weights allowed
    (reference ``VertexPartition.py:849-1105``)."""
    _qf_cls = CPMQuality

    def __init__(self, graph, initial_membership=None, weights=None,
                 node_sizes=None, resolution_parameter=1.0,
                 correct_self_loops=None):
        super().__init__(graph, initial_membership, weights=weights,
                         node_sizes=node_sizes,
                         resolution_parameter=resolution_parameter,
                         correct_self_loops=correct_self_loops)

    @classmethod
    def Bipartite(cls, graph, resolution_parameter_01,
                  resolution_parameter_0=0, resolution_parameter_1=0,
                  degree_as_node_size=False, types=None, **kwargs):
        """Three CPM layers for bipartite community detection, to be
        optimised with ``optimise_partition_multiplex(...,
        layer_weights=[1,-1,-1])`` (reference
        ``VertexPartition.py:950-1105``, construction at ``:1091-1105``).

        ``types``: array of vertex classes, coerced to {0, 1}.
        """
        types = np.asarray(types if types is not None
                           else np.zeros(graph.n, dtype=np.int64))
        uniq = np.unique(types)
        if len(uniq) > 2:
            raise ValueError("More than one type specified.")
        remap = {int(t): i for i, t in enumerate(uniq)}
        cls01 = np.array([remap[int(t)] for t in types], dtype=np.int64)
        if degree_as_node_size:
            if graph.directed:
                raise ValueError("degree_as_node_size requires an "
                                 "undirected graph")
            n_size = graph.strength_out.copy()
        else:
            n_size = np.ones(graph.n)
        no_edges = Graph(graph.n, src=np.empty(0, np.int64),
                         dst=np.empty(0, np.int64), directed=graph.directed)
        g_full = Graph(graph.n, src=graph.src, dst=graph.dst,
                       weights=graph.weight, node_sizes=n_size,
                       directed=graph.directed)
        size0 = np.where(cls01 == 0, n_size, 0.0)
        size1 = np.where(cls01 == 1, n_size, 0.0)
        g0 = Graph(graph.n, src=no_edges.src, dst=no_edges.dst,
                   node_sizes=size0, directed=graph.directed)
        g1 = Graph(graph.n, src=no_edges.src, dst=no_edges.dst,
                   node_sizes=size1, directed=graph.directed)
        p01 = cls(g_full, resolution_parameter=resolution_parameter_01,
                  **kwargs)
        p0 = cls(g0, resolution_parameter=(resolution_parameter_01
                                           - resolution_parameter_0))
        p1 = cls(g1, resolution_parameter=(resolution_parameter_01
                                           - resolution_parameter_1))
        return p01, p0, p1


class SignificanceVertexPartition(MutableVertexPartition):
    """Significance — unweighted graphs only at construction
    (reference ``VertexPartition.py:553-625``)."""
    _qf_cls = SignificanceQuality

    def __init__(self, graph, initial_membership=None, node_sizes=None):
        super().__init__(graph, initial_membership, node_sizes=node_sizes)


class SurpriseVertexPartition(MutableVertexPartition):
    """Asymptotic Surprise (reference ``VertexPartition.py:465-551``)."""
    _qf_cls = SurpriseQuality

    def __init__(self, graph, initial_membership=None, weights=None,
                 node_sizes=None):
        super().__init__(graph, initial_membership, weights=weights,
                         node_sizes=node_sizes)
