"""In-memory graph: the semantic substrate shared by both execution tiers.

Vertices are contiguous ints ``0..n-1``; the edge list stores each edge
once (``src, dst, weight``), matching the reference's igraph data model
(reference ``VertexPartition.py:39-54``): directed or undirected, float64
weights (default 1.0), float64 node sizes (default 1.0), self-loops
allowed.

Conventions (documented because the reference's C++ core is not vendored;
these are the engine's authoritative semantics, consistent with the
reference docstrings):

- ``total_weight`` (m) counts each edge once, self-loops included.
- Undirected strength ``k_v`` counts self-loops twice (igraph
  convention), so ``sum(k) == 2m``.
- Directed ``k_out`` / ``k_in`` count a self-loop once each.
- ``possible_edges(s)``: ``s*(s-1)/(2-directed)``, or ``s*s/(2-directed)``
  when ``correct_self_loops`` (reference ``VertexPartition.py:938-939``).
"""

from __future__ import annotations

import numpy as np


class Graph:
    """Immutable weighted graph over contiguous int vertex ids."""

    def __init__(self, n, edges=None, weights=None, node_sizes=None,
                 directed=False, src=None, dst=None):
        self.n = int(n)
        self.directed = bool(directed)
        if edges is not None:
            edges = np.asarray(edges, dtype=np.int64)
            if edges.size == 0:
                edges = edges.reshape(0, 2)
            self.src = np.ascontiguousarray(edges[:, 0])
            self.dst = np.ascontiguousarray(edges[:, 1])
        else:
            self.src = np.asarray(src if src is not None else [], dtype=np.int64)
            self.dst = np.asarray(dst if dst is not None else [], dtype=np.int64)
        m = len(self.src)
        if weights is None:
            self.weight = np.ones(m, dtype=np.float64)
        else:
            self.weight = np.asarray(weights, dtype=np.float64)
            if len(self.weight) != m:
                raise ValueError("weights length != edge count")
            if np.isnan(self.weight).any():
                raise ValueError("NaN edge weights not allowed")
        if node_sizes is None:
            self.node_size = np.ones(self.n, dtype=np.float64)
        else:
            self.node_size = np.asarray(node_sizes, dtype=np.float64)
            if len(self.node_size) != self.n:
                raise ValueError("node_sizes length != vertex count")
        if m and (self.src.min() < 0 or self.dst.min() < 0
                  or max(self.src.max(), self.dst.max()) >= self.n):
            raise ValueError("edge endpoint out of range")
        self._csr = None

    # ------------------------------------------------------------------
    @property
    def ecount(self):
        return len(self.src)

    @property
    def total_weight(self):
        return float(self.weight.sum())

    @property
    def total_size(self):
        return float(self.node_size.sum())

    @property
    def is_loop(self):
        return self.src == self.dst

    @property
    def has_loops(self):
        return bool((self.src == self.dst).any())

    # ------------------------------------------------------------------
    def _build_csr(self):
        """Incidence CSR, self-loops excluded (loop weight kept separately).

        Undirected: one merged incidence list per vertex (each non-loop
        edge appears in both endpoints' lists). Directed: separate
        out-edge and in-edge lists.
        """
        n = self.n
        loop = self.src == self.dst
        s, d, w = self.src[~loop], self.dst[~loop], self.weight[~loop]
        loop_w = np.zeros(n, dtype=np.float64)
        np.add.at(loop_w, self.src[loop], self.weight[loop])

        def csr(srcs, dsts, ws):
            order = np.argsort(srcs, kind="stable")
            indptr = np.zeros(n + 1, dtype=np.int64)
            np.add.at(indptr, srcs + 1, 1)
            np.cumsum(indptr, out=indptr)
            return indptr, dsts[order], ws[order]

        if self.directed:
            out = csr(s, d, w)
            inn = csr(d, s, w)
            k_out = np.zeros(n)
            np.add.at(k_out, s, w)
            k_out += loop_w
            k_in = np.zeros(n)
            np.add.at(k_in, d, w)
            k_in += loop_w
        else:
            both_s = np.concatenate([s, d])
            both_d = np.concatenate([d, s])
            both_w = np.concatenate([w, w])
            out = csr(both_s, both_d, both_w)
            inn = (out[0], np.empty(0, dtype=np.int64), np.empty(0))
            k_out = np.zeros(n)
            np.add.at(k_out, both_s, both_w)
            k_out += 2.0 * loop_w  # igraph convention: loops count twice
            k_in = k_out
        self._csr = {
            "out": out, "in": inn, "loop_w": loop_w,
            "k_out": k_out, "k_in": k_in,
        }

    def _c(self):
        if self._csr is None:
            self._build_csr()
        return self._csr

    @property
    def strength_out(self):
        return self._c()["k_out"]

    @property
    def strength_in(self):
        return self._c()["k_in"]

    @property
    def loop_weight(self):
        return self._c()["loop_w"]

    def neighbours_out(self, v):
        """(neighbour ids, weights) over out-incidences (undirected: all)."""
        indptr, idx, w = self._c()["out"]
        return idx[indptr[v]:indptr[v + 1]], w[indptr[v]:indptr[v + 1]]

    def neighbours_in(self, v):
        """(neighbour ids, weights) over in-incidences (undirected: empty)."""
        indptr, idx, w = self._c()["in"]
        if len(idx) == 0:
            return idx[:0], w[:0]
        return idx[indptr[v]:indptr[v + 1]], w[indptr[v]:indptr[v + 1]]

    def neighbours(self, v):
        """All neighbour ids (both directions), self excluded, may repeat."""
        a, _ = self.neighbours_out(v)
        b, _ = self.neighbours_in(v)
        return np.concatenate([a, b]) if len(b) else a

    # ------------------------------------------------------------------
    def possible_edges(self, size, correct_self_loops=False):
        """Total possible internal edge mass for a community of total size
        ``size``: ``s(s-1)/(2-dir)`` or ``s^2/(2-dir)`` with loop correction
        (reference ``VertexPartition.py:354-365``, ``:938-939``)."""
        size = np.asarray(size, dtype=np.float64)
        denom = 1.0 if self.directed else 2.0
        if correct_self_loops:
            return size * size / denom
        return size * (size - 1.0) / denom

    # ------------------------------------------------------------------
    def aggregate(self, membership):
        """Collapse by community: one vertex per community (dense labels
        required: 0..C-1), edge weights summed (self-loops carry internal
        weight), node sizes summed (reference
        ``python_partition_interface.cpp:751-754``).

        Returns (aggregated Graph, None).
        """
        membership = np.asarray(membership, dtype=np.int64)
        n_comm = int(membership.max()) + 1 if len(membership) else 0
        cs = membership[self.src]
        cd = membership[self.dst]
        # Dedup (cs, cd) pairs summing weight. For undirected graphs,
        # canonicalise pair order so (a,b) and (b,a) merge.
        if not self.directed:
            lo = np.minimum(cs, cd)
            hi = np.maximum(cs, cd)
            cs, cd = lo, hi
        key = cs * n_comm + cd
        uniq, inv = np.unique(key, return_inverse=True)
        w = np.zeros(len(uniq))
        np.add.at(w, inv, self.weight)
        new_src = (uniq // n_comm).astype(np.int64)
        new_dst = (uniq % n_comm).astype(np.int64)
        sizes = np.zeros(n_comm)
        np.add.at(sizes, membership, self.node_size)
        return Graph(n_comm, src=new_src, dst=new_dst, weights=w,
                     node_sizes=sizes, directed=self.directed)

    # ------------------------------------------------------------------
    @classmethod
    def from_arrays(cls, src, dst, weight=None, n=None, directed=False,
                    node_sizes=None):
        src = np.asarray(src, dtype=np.int64)
        dst = np.asarray(dst, dtype=np.int64)
        if n is None:
            n = int(max(src.max(initial=-1), dst.max(initial=-1))) + 1
        return cls(n, src=src, dst=dst, weights=weight,
                   node_sizes=node_sizes, directed=directed)

    def __repr__(self):
        return (f"Graph(n={self.n}, m={self.ecount}, "
                f"{'directed' if self.directed else 'undirected'})")
