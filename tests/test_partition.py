"""Metamorphic properties per quality function x graph family
(FIXTURES.md §4; mirrors reference tests/test_VertexPartition.py)."""

import numpy as np
import pytest

from leidenalg_ray.partition import (
    CPMVertexPartition,
    ModularityVertexPartition,
    RBConfigurationVertexPartition,
    RBERVertexPartition,
    SignificanceVertexPartition,
    SurpriseVertexPartition,
)

from .fixtures import (erdos_renyi, karate, lattice, tree_graph,
                       weighted)

PTYPES = [ModularityVertexPartition, RBConfigurationVertexPartition,
          RBERVertexPartition, CPMVertexPartition,
          SignificanceVertexPartition, SurpriseVertexPartition]

GRAPHS = {
    "karate": karate(),
    "er_u": erdos_renyi(60, 0.08, seed=3),
    "er_u_loops": erdos_renyi(60, 0.08, loops=True, seed=4),
    "er_d": erdos_renyi(60, 0.08, directed=True, seed=5),
    "er_d_loops": erdos_renyi(60, 0.08, directed=True, loops=True,
                              seed=6),
    "tree_u": tree_graph(50, 3),
    "tree_out": tree_graph(50, 3, "out"),
    "lattice_u": lattice(50, 3),
    "lattice_d": lattice(50, 3, directed=True),
}


def cases():
    for gname, g in GRAPHS.items():
        for wt in (False, True):
            for pt in PTYPES:
                if pt is SignificanceVertexPartition and wt:
                    continue  # Significance is unweighted-only
                yield pytest.param(gname, wt, pt,
                                   id=f"{gname}-w{int(wt)}-{pt.__name__}")


@pytest.mark.parametrize("gname,wt,pt", cases())
def test_diff_move_matches_quality(gname, wt, pt):
    g = weighted(GRAPHS[gname]) if wt else GRAPHS[gname]
    mem = np.random.default_rng(7).integers(0, 8, g.n)
    p = pt(g, initial_membership=mem)
    for v in (0, 3, 11):
        nbrs = g.neighbours(v)
        if len(nbrs) == 0:
            continue
        c = int(p.membership[nbrs[0]])
        q0 = p.quality()
        d = p.diff_move(v, c)
        dd = p.move_node(v, c)
        assert dd == pytest.approx(d, abs=1e-12)
        assert p.quality() - q0 == pytest.approx(d, abs=1e-8)


@pytest.mark.parametrize("gname,wt,pt", cases())
def test_aggregation_preserves_quality(gname, wt, pt):
    g = weighted(GRAPHS[gname]) if wt else GRAPHS[gname]
    mem = np.random.default_rng(8).integers(0, 6, g.n)
    p = pt(g, initial_membership=mem)
    agg = p.aggregate_partition()
    assert agg.quality() == pytest.approx(p.quality(), abs=1e-9)
    # move on the aggregate, push down, still in sync
    if agg.graph.n > 2:
        nb = agg.graph.neighbours(1)
        if len(nb):
            agg.move_node(1, int(agg.membership[nb[0]]))
            dense, _ = p._dense_membership()
            p.from_coarse_partition(agg, dense)
            assert agg.quality() == pytest.approx(p.quality(), abs=1e-9)


@pytest.mark.parametrize("gname,wt,pt", cases())
def test_weight_sum_consistency(gname, wt, pt):
    g = weighted(GRAPHS[gname]) if wt else GRAPHS[gname]
    mem = np.random.default_rng(9).integers(0, 6, g.n)
    p = pt(g, initial_membership=mem)
    tot = sum(p.total_weight_in_comm(c) for c in np.unique(p.membership))
    assert tot == pytest.approx(p.total_weight_in_all_comms(), abs=1e-9)


def test_negative_weights_rejected_except_cpm():
    from leidenalg_ray.graph import Graph
    g = Graph(3, edges=[(0, 1), (1, 2)], weights=[-1.0, 1.0])
    with pytest.raises(ValueError):
        ModularityVertexPartition(g)
    CPMVertexPartition(g)  # allowed


def test_renumber_by_decreasing_size():
    g = erdos_renyi(30, 0.1, seed=2)
    mem = np.array([5] * 20 + [9] * 7 + [1] * 3)
    p = CPMVertexPartition(g, initial_membership=mem)
    p.renumber_communities()
    assert p.sizes() == [20, 7, 3]
    assert set(p.membership.tolist()) == {0, 1, 2}


def test_from_partition_retype():
    g = karate()
    p = CPMVertexPartition(g, resolution_parameter=0.1)
    p2 = ModularityVertexPartition.FromPartition(p)
    assert np.array_equal(p2.membership, p.membership)


def test_modularity_terms_query_formula():
    """The per-community term emitted by the SQL-verified
    ``modularity_terms_co`` query (w_in - d^2/(4m), summed and
    normalised by m) IS the in-memory tier's Modularity quality —
    one formula, two tiers (CLAUDE.md rule)."""
    from leidenalg_ray.graph import Graph

    rng = np.random.default_rng(21)
    n, m = 300, 1500
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    nl = src != dst
    a = np.minimum(src[nl], dst[nl])
    b = np.maximum(src[nl], dst[nl])
    keys = np.unique(a * np.int64(n) + b)
    a, b = (keys // n).astype(np.int64), (keys % n).astype(np.int64)

    g = Graph(n, src=a, dst=b)
    p = ModularityVertexPartition(
        g, initial_membership=(np.arange(n) % 10).tolist())

    C, me = 10, float(len(a))
    ca, cb = a % C, b % C
    w_in = np.bincount(ca[ca == cb], minlength=C).astype(np.float64)
    d = (np.bincount(ca, minlength=C)
         + np.bincount(cb, minlength=C)).astype(np.float64)
    q_terms = float((w_in - d * d / (4.0 * me)).sum() / me)
    assert q_terms == pytest.approx(p.quality(), abs=1e-9)
