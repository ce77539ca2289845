"""Partition comparison metrics — the ``compare_communities``
companion of the leidenalg workflow (the reference's docs compare
partitions via igraph; see reference doc/source/reference.rst). All
metrics are pure functions of the contingency table, so the
distributed form reduces each label batch to fixed-size integer
partials and the driver finishes on the (Ka, Kb) matrix.

Float discipline (shared with the SQL oracles): every metric is
integer accumulation plus per-cell ``ln`` terms quantised to 1e-9
fixed point BEFORE summation, so engine and oracle sum identical
integers in any order and the one final float expression matches
bit-for-bit.
"""

from __future__ import annotations

import numpy as np

__all__ = ["contingency", "compare_partitions",
           "metrics_from_contingency"]

_Q = 1_000_000_000  # 1e-9 fixed-point scale for ln terms


def contingency(m1, m2):
    """(Ka, Kb) int64 contingency matrix of two dense label vectors
    (labels need not be contiguous; rows/cols follow sorted unique
    labels)."""
    m1 = np.asarray(m1)
    m2 = np.asarray(m2)
    if m1.shape != m2.shape:
        raise ValueError("membership length mismatch")
    u1, i1 = np.unique(m1, return_inverse=True)
    u2, i2 = np.unique(m2, return_inverse=True)
    C = np.zeros((len(u1), len(u2)), dtype=np.int64)
    np.add.at(C, (i1, i2), 1)
    return C


def _qln(x):
    """ln quantised half-away to 1e-9 fixed point (int64) —
    summation-order-free."""
    return np.floor(np.log(x) * _Q + 0.5).astype(np.int64)


def compare_partitions(m1, m2, method: str = "nmi") -> float:
    """Similarity/distance between two partitions of the same vertex
    set. ``method``: ``nmi`` (normalised mutual information, Danon
    2I/(Ha+Hb) normalisation as in igraph compare_communities),
    ``ari`` (adjusted Rand index), ``vi`` (variation
    of information, nats), ``rand`` (Rand index) or ``split-join``
    (van Dongen split-join distance, integer)."""
    return metrics_from_contingency(contingency(m1, m2), method)


def metrics_from_contingency(C, method: str = "nmi") -> float:
    """Metric from a precomputed contingency matrix — the single
    formula source shared by ``compare_partitions`` and the
    distributed query path (which aggregates C as fixed-size integer
    partials)."""
    C = np.asarray(C, dtype=np.int64)
    N = int(C.sum())
    a = C.sum(axis=1)  # row marginals
    b = C.sum(axis=0)  # column marginals

    if method == "split-join":
        # 2N - sum_i max_j n_ij - sum_j max_i n_ij
        return float(2 * N - C.max(axis=1).sum() - C.max(axis=0).sum())

    if method in ("ari", "rand"):
        # pair counts are exact int64 (N choose 2 fits for N < 4.3e9)
        sij = int((C.astype(object) * (C - 1) // 2).sum())
        sa = int((a.astype(object) * (a - 1) // 2).sum())
        sb = int((b.astype(object) * (b - 1) // 2).sum())
        npairs = N * (N - 1) // 2
        # float ops parenthesised exactly as the SQL oracles replicate
        # them (integer->double conversions are round-to-nearest on
        # both sides)
        if method == "rand":
            return float(npairs + 2 * sij - sa - sb) / float(npairs)
        exp = float(sa * sb) / float(npairs)
        mx = float(sa + sb) / 2.0
        if mx == exp:
            return 1.0  # both partitions trivial (all-one / all-single)
        return (float(sij) - exp) / (mx - exp)

    # information-theoretic family: quantised per-cell ln terms.
    # I = sum_ij (n_ij/N) ln(N n_ij / (a_i b_j));
    # H(a) = -sum_i (a_i/N) ln(a_i/N)   (ln terms of INTEGER ratios
    # only, so the SQL side can reproduce each cell exactly)
    nz = C > 0
    ci = np.broadcast_to(a[:, None], C.shape)[nz]
    cj = np.broadcast_to(b[None, :], C.shape)[nz]
    nij = C[nz]
    # n_ij * qln(N n_ij / (a_i b_j)) summed in int64*int64 -> python int
    i_fp = int(np.sum(nij.astype(object)
                      * (_qln(nij.astype(np.float64) * N
                              / (ci.astype(np.float64)
                                 * cj.astype(np.float64))))))
    ha_fp = int(np.sum(a[a > 0].astype(object)
                       * _qln(N / a[a > 0].astype(np.float64))))
    hb_fp = int(np.sum(b[b > 0].astype(object)
                       * _qln(N / b[b > 0].astype(np.float64))))
    I = i_fp / _Q / N
    Ha = ha_fp / _Q / N
    Hb = hb_fp / _Q / N
    if method == "vi":
        return float(Ha + Hb - 2.0 * I)
    if method == "nmi":
        if Ha == 0.0 and Hb == 0.0:
            return 1.0  # both trivial -> identical
        # Danon et al. 2005 arithmetic-mean normalisation 2I/(Ha+Hb)
        # — igraph compare_communities("nmi")'s definition, the
        # upstream workflow counterpart this module mirrors
        denom = Ha + Hb
        return float(2.0 * I / denom) if denom > 0 else 0.0
    raise ValueError(f"unknown method {method!r}")
