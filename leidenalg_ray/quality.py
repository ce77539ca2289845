"""Quality functions as pure plugins over community statistics.

Each quality function is a pure function of per-community statistics
``(w_in, s_out, s_in, size)`` plus a handful of global scalars — exactly
the shape of a ``groupby("comm").aggregate(...)`` followed by a tiny
reduce, which is how the distributed tier evaluates them.

The engine maintains, per partition, the running sum of a small
per-community *term vector*; ``combine`` maps that sum to the quality
value. For the linear families (Modularity, RBConfiguration, RBER, CPM,
Significance) the term vector is the per-community quality contribution
itself; for Surprise it is ``(w_in, possible_edges)`` and ``combine``
applies the KL divergence. ``diff_move`` is computed by recomputing the
term vectors of the two affected communities exactly, so
``diff_move(v, c) == quality(after) - quality(before)`` holds by
construction (the core contract of the reference, tested at
reference ``tests/test_VertexPartition.py:91-111``).

Formulas follow the reference docstrings (reference
``src/leidenalg/VertexPartition.py``):

- Modularity (``:394-417``): undirected
  ``Q = (1/m) sum_c [W_c - K_c^2/(4m)]`` (Newman-Girvan); directed
  (Leicht-Newman) ``Q = (1/m) sum_c [W_c - Kout_c*Kin_c/m]``.
- RBConfiguration (``:760-847``): the unnormalised gamma-generalisation;
  equals ``(2-dir)*m* Modularity`` at gamma=1 ("same as Modularity when
  normalising by 2m, or m for directed", ``:794-796``).
- CPM (``:856-885``): ``Q = (2-dir) * sum_c [W_c - gamma*pe(n_c)]``.
- RBER (``:680-698``): CPM with the null scaled by overall density p.
- Significance (``:558-578``): ``(2-dir) * sum_c pe(n_c)*D(p_c || p)``;
  for directed graphs the binomials double (``:578-579``), which the
  ``(2-dir) * pe`` form reproduces for both orientations.
- Surprise (``:470-492``): ``Q = m * D(q || <q>)``.

``W_c`` counts internal edge weight once per edge (self-loops once);
``pe(s)`` is ``Graph.possible_edges``; ``m`` is total edge weight.
"""

from __future__ import annotations

import numpy as np


def binary_kl(q, p):
    """d(q || p) = q ln(q/p) + (1-q) ln((1-q)/(1-p)), with the usual
    0*ln(0) = 0 limits; q clamped into [0, 1]."""
    q = np.clip(np.asarray(q, dtype=np.float64), 0.0, 1.0)
    p = np.asarray(p, dtype=np.float64)
    out = np.zeros_like(q, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        t1 = np.where(q > 0, q * np.log(q / p), 0.0)
        t2 = np.where(q < 1, (1 - q) * np.log((1 - q) / (1 - p)), 0.0)
    out = t1 + t2
    return out


class QualityFunction:
    """Base plugin. Subclasses define term() and combine()."""

    name = "base"
    term_dim = 1
    uses_resolution = False
    allows_negative_weights = False
    # Significance is defined only on unweighted graphs
    # (reference VertexPartition.py:554,580)
    unweighted_only = False

    def __init__(self, graph, resolution_parameter=1.0,
                 correct_self_loops=False):
        self.g = graph
        self.gamma = float(resolution_parameter)
        self.correct_self_loops = bool(correct_self_loops)
        self._prepare()

    def _prepare(self):
        pass

    def _pe(self, size):
        return self.g.possible_edges(size, self.correct_self_loops)

    @property
    def _dir_factor(self):
        return 1.0 if self.g.directed else 2.0

    def term(self, w_in, s_out, s_in, size, gamma):
        """Per-community term vector; arrays in -> (term_dim, k) array."""
        raise NotImplementedError

    def combine(self, agg, gamma):
        """Sum of term vectors -> quality float."""
        raise NotImplementedError

    def linear_scale(self):
        """If quality == scale * sum(term), return scale (fast exact
        diffs); None for nonlinear combines (Surprise)."""
        return None

    def combine_many(self, aggs, gamma):
        """Vectorised ``combine`` over a (term_dim, k) matrix of
        aggregated term vectors -> k quality values. Nonlinear
        quality functions (Surprise) override this so the distributed
        propose kernel can evaluate every candidate move's exact
        global delta in one shot; the default falls back to per-column
        ``combine``."""
        aggs = np.atleast_2d(aggs)
        return np.array([self.combine(aggs[:, i], gamma)
                         for i in range(aggs.shape[1])])


class ModularityQuality(QualityFunction):
    name = "modularity"

    def term(self, w_in, s_out, s_in, size, gamma):
        m = self.g.total_weight
        if m == 0:
            return np.zeros_like(np.asarray(w_in, dtype=np.float64))
        nu = 1.0 if self.g.directed else 4.0
        return np.asarray(w_in) - np.asarray(s_out) * np.asarray(s_in) / (nu * m)

    def combine(self, agg, gamma):
        m = self.g.total_weight
        if m == 0:
            return 0.0
        return float(agg) / m

    def linear_scale(self):
        m = self.g.total_weight
        return 0.0 if m == 0 else 1.0 / m


class RBConfigurationQuality(QualityFunction):
    name = "rb_configuration"
    uses_resolution = True

    def term(self, w_in, s_out, s_in, size, gamma):
        m = self.g.total_weight
        if m == 0:
            return np.zeros_like(np.asarray(w_in, dtype=np.float64))
        nu = 1.0 if self.g.directed else 4.0
        return (np.asarray(w_in)
                - gamma * np.asarray(s_out) * np.asarray(s_in) / (nu * m))

    def combine(self, agg, gamma):
        return self._dir_factor * float(agg)

    def linear_scale(self):
        return self._dir_factor


class CPMQuality(QualityFunction):
    name = "cpm"
    uses_resolution = True
    allows_negative_weights = True

    def term(self, w_in, s_out, s_in, size, gamma):
        return np.asarray(w_in) - gamma * self._pe(size)

    def combine(self, agg, gamma):
        return self._dir_factor * float(agg)

    def linear_scale(self):
        return self._dir_factor


class RBERQuality(QualityFunction):
    name = "rber"
    uses_resolution = True

    def _prepare(self):
        total_pe = float(self.g.possible_edges(self.g.total_size,
                                               self.correct_self_loops))
        self.density = self.g.total_weight / total_pe if total_pe > 0 else 0.0

    def term(self, w_in, s_out, s_in, size, gamma):
        return np.asarray(w_in) - gamma * self.density * self._pe(size)

    def combine(self, agg, gamma):
        return self._dir_factor * float(agg)

    def linear_scale(self):
        return self._dir_factor


class SignificanceQuality(QualityFunction):
    name = "significance"
    unweighted_only = True

    def _prepare(self):
        total_pe = float(self.g.possible_edges(self.g.total_size,
                                               self.correct_self_loops))
        self.density = self.g.total_weight / total_pe if total_pe > 0 else 0.0

    def term(self, w_in, s_out, s_in, size, gamma):
        pe = self._pe(size)
        pe = np.asarray(pe, dtype=np.float64)
        w = np.asarray(w_in, dtype=np.float64)
        p = self.density
        if p <= 0 or p >= 1:
            return np.zeros_like(pe)
        with np.errstate(divide="ignore", invalid="ignore"):
            pc = np.where(pe > 0, w / np.where(pe > 0, pe, 1.0), 0.0)
        return np.where(pe > 0, pe * binary_kl(pc, p), 0.0)

    def combine(self, agg, gamma):
        return self._dir_factor * float(agg)

    def linear_scale(self):
        return self._dir_factor


class SurpriseQuality(QualityFunction):
    name = "surprise"
    term_dim = 2

    def term(self, w_in, s_out, s_in, size, gamma):
        w = np.asarray(w_in, dtype=np.float64)
        pe = np.asarray(self._pe(size), dtype=np.float64)
        return np.stack([w, pe])

    def combine(self, agg, gamma):
        m = self.g.total_weight
        total_pe = float(self.g.possible_edges(self.g.total_size,
                                               self.correct_self_loops))
        if m <= 0 or total_pe <= 0:
            return 0.0
        q = float(agg[0]) / m
        qe = float(agg[1]) / total_pe
        if qe <= 0 or qe >= 1:
            return 0.0
        return m * float(binary_kl(q, qe))

    def combine_many(self, aggs, gamma):
        aggs = np.atleast_2d(aggs)
        m = self.g.total_weight
        total_pe = float(self.g.possible_edges(self.g.total_size,
                                               self.correct_self_loops))
        if m <= 0 or total_pe <= 0:
            return np.zeros(aggs.shape[1])
        q = aggs[0] / m
        qe = aggs[1] / total_pe
        out = m * binary_kl(q, qe)
        out[(qe <= 0) | (qe >= 1)] = 0.0
        return out


QUALITY_REGISTRY = {
    cls.name: cls for cls in (
        ModularityQuality, RBConfigurationQuality, CPMQuality,
        RBERQuality, SignificanceQuality, SurpriseQuality,
    )
}
