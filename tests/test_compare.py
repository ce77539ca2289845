"""Partition comparison metrics (compare.py) — identity properties,
naive-formula equality, symmetry (igraph compare_communities
counterpart)."""

import math
from collections import Counter

import numpy as np
import pytest

from leidenalg_ray.compare import (compare_partitions, contingency,
                                   metrics_from_contingency)


def _naive(m1, m2, method):
    """Textbook formulas, unquantised floats — independent of the
    fixed-point implementation under test."""
    m1, m2 = list(m1), list(m2)
    N = len(m1)
    cnt = Counter(zip(m1, m2))
    a = Counter(m1)
    b = Counter(m2)
    if method == "split-join":
        byi, byj = {}, {}
        for (i, j), n in cnt.items():
            byi[i] = max(byi.get(i, 0), n)
            byj[j] = max(byj.get(j, 0), n)
        return 2 * N - sum(byi.values()) - sum(byj.values())
    if method in ("ari", "rand"):
        sij = sum(n * (n - 1) // 2 for n in cnt.values())
        sa = sum(n * (n - 1) // 2 for n in a.values())
        sb = sum(n * (n - 1) // 2 for n in b.values())
        npairs = N * (N - 1) // 2
        if method == "rand":
            return (npairs + 2 * sij - sa - sb) / npairs
        exp = sa * sb / npairs
        mx = (sa + sb) / 2
        return 1.0 if mx == exp else (sij - exp) / (mx - exp)
    I = sum(n / N * math.log(N * n / (a[i] * b[j]))
            for (i, j), n in cnt.items())
    Ha = -sum(n / N * math.log(n / N) for n in a.values())
    Hb = -sum(n / N * math.log(n / N) for n in b.values())
    if method == "vi":
        return Ha + Hb - 2 * I
    if Ha == 0 and Hb == 0:
        return 1.0
    return 2 * I / (Ha + Hb)  # Danon normalisation (igraph nmi)


METHODS = ["nmi", "ari", "vi", "rand", "split-join"]


@pytest.mark.parametrize("method", METHODS)
def test_matches_naive_formula(method):
    r = np.random.default_rng(7)
    for trial in range(5):
        n = int(r.integers(50, 400))
        m1 = r.integers(0, int(r.integers(2, 12)), n)
        m2 = r.integers(0, int(r.integers(2, 12)), n)
        got = compare_partitions(m1, m2, method)
        want = _naive(m1, m2, method)
        assert got == pytest.approx(want, abs=1e-6), (trial, n)


@pytest.mark.parametrize("method", METHODS)
def test_identical_partitions(method):
    r = np.random.default_rng(3)
    m = r.integers(0, 6, 200)
    got = compare_partitions(m, m, method)
    want = {"nmi": 1.0, "ari": 1.0, "vi": 0.0, "rand": 1.0,
            "split-join": 0.0}[method]
    assert got == pytest.approx(want, abs=1e-9)
    # relabelling is invisible to every metric
    perm = r.permutation(6)
    assert compare_partitions(m, perm[m], method) == \
        pytest.approx(want, abs=1e-9)


@pytest.mark.parametrize("method", METHODS)
def test_symmetry(method):
    r = np.random.default_rng(11)
    m1 = r.integers(0, 5, 300)
    m2 = r.integers(0, 9, 300)
    assert compare_partitions(m1, m2, method) == \
        pytest.approx(compare_partitions(m2, m1, method), abs=1e-9)


def test_contingency_and_matrix_path_agree():
    r = np.random.default_rng(5)
    m1 = r.integers(0, 4, 250)
    m2 = r.integers(0, 6, 250)
    C = contingency(m1, m2)
    assert C.sum() == 250
    for method in METHODS:
        assert metrics_from_contingency(C, method) == \
            compare_partitions(m1, m2, method)


def test_trivial_partitions():
    ones = np.zeros(50, np.int64)            # everything together
    singles = np.arange(50)                  # everything apart
    assert compare_partitions(ones, ones, "nmi") == 1.0
    assert compare_partitions(ones, ones, "ari") == 1.0
    assert compare_partitions(ones, singles, "vi") == \
        pytest.approx(math.log(50), abs=1e-6)
    assert compare_partitions(ones, singles, "split-join") == 49.0


def test_length_mismatch_raises():
    with pytest.raises(ValueError):
        compare_partitions([0, 1], [0, 1, 2])
    with pytest.raises(ValueError):
        compare_partitions([0, 1], [0, 1], method="nope")
