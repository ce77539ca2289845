"""Closed-form optimiser outcomes (FIXTURES.md §3; mirrors reference
tests/test_Optimiser.py)."""

import numpy as np
import pytest

from leidenalg_ray import (
    ALL_COMMS,
    ALL_NEIGH_COMMS,
    CPMVertexPartition,
    ModularityVertexPartition,
    Optimiser,
    RBConfigurationVertexPartition,
    find_partition,
)
from leidenalg_ray.graph import Graph

from .fixtures import (disjoint_trees, erdos_renyi, full_graph, karate,
                       planted_partition)


def test_move_nodes_full_graph():
    p = CPMVertexPartition(full_graph(100), resolution_parameter=0.5)
    Optimiser().move_nodes(p, consider_comms=ALL_NEIGH_COMMS)
    assert p.sizes() == [100]


def test_merge_nodes_full_graph():
    g = full_graph(100)
    p = CPMVertexPartition(g, resolution_parameter=0.5)
    Optimiser().merge_nodes(p, consider_comms=ALL_NEIGH_COMMS)
    assert p.sizes() == [100]
    assert p.total_weight_in_all_comms() == g.ecount


def test_max_comm_size():
    opt = Optimiser()
    opt.max_comm_size = 17
    opt.community_constraint_enforcement = 100
    p = CPMVertexPartition(full_graph(100), resolution_parameter=0.5)
    opt.move_nodes(p, consider_comms=ALL_NEIGH_COMMS)
    p.renumber_communities()
    assert p.sizes() == [17, 17, 17, 17, 17, 15]


def test_min_comm_size():
    opt = Optimiser()
    opt.min_comm_size = 5
    opt.community_constraint_enforcement = 10
    p = CPMVertexPartition(full_graph(100), resolution_parameter=1.0)
    opt.move_nodes(p, consider_comms=ALL_NEIGH_COMMS)
    assert sorted(p.sizes()) == [5] * 20


def test_fixed_nodes_edge_plus_singleton():
    p = CPMVertexPartition(Graph(3, edges=[(0, 2)]),
                           resolution_parameter=0.1)
    Optimiser().move_nodes(p, is_membership_fixed=[True, False, True],
                           consider_comms=ALL_NEIGH_COMMS)
    assert p.sizes() == [1, 1, 1]


def test_fixed_nodes_full_k3():
    p = CPMVertexPartition(full_graph(3), resolution_parameter=0.01,
                           initial_membership=[2, 1, 0])
    q0 = p.quality()
    diff = Optimiser().optimise_partition(
        p, is_membership_fixed=[True, False, False])
    assert list(p.membership) == [2, 2, 2]
    assert p.quality() - q0 == pytest.approx(diff, abs=1e-10)


def test_fixed_nodes_keep_large_labels():
    g = erdos_renyi(100, 0.05, directed=True, loops=True, seed=1)
    p = RBConfigurationVertexPartition(
        g, initial_membership=list(range(100)))
    q0 = p.quality()
    fixed = [False] * 100
    fixed[90] = True
    diff = Optimiser().optimise_partition(p, is_membership_fixed=fixed)
    assert len(set(p.membership.tolist())) < 100
    assert p.quality() - q0 == pytest.approx(diff, abs=1e-10)
    assert p.membership[90] == 90


def test_cpm_gamma0_gives_components():
    p = CPMVertexPartition(disjoint_trees(), resolution_parameter=0)
    opt = Optimiser()
    opt.consider_comms = ALL_NEIGH_COMMS
    opt.optimise_partition(p)
    assert p.sizes() == [10] * 10


def test_node_optimality_at_fixed_point():
    g = erdos_renyi(100, 0.05, seed=11)
    p = CPMVertexPartition(g, resolution_parameter=0.1)
    opt = Optimiser()
    while opt.move_nodes(p, consider_comms=ALL_NEIGH_COMMS) > 0:
        pass
    for v in range(g.n):
        for c in set(int(p.membership[u]) for u in g.neighbours(v)):
            assert p.diff_move(v, c) <= 1e-10


def test_negative_weight_bipartite():
    sb = np.repeat(np.arange(50), 50)
    db = 50 + np.tile(np.arange(50), 50)
    g = Graph(100, src=sb, dst=db, weights=np.full(2500, -0.1))
    p = CPMVertexPartition(g, resolution_parameter=-0.1)
    opt = Optimiser()
    opt.consider_comms = ALL_COMMS
    opt.optimise_partition(p)
    assert p.sizes() == [50, 50]


def test_resolution_profile_endpoints():
    g = karate()
    profile = Optimiser().resolution_profile(
        g, CPMVertexPartition, resolution_range=(0, 1))
    assert profile[0].sizes() == [g.n]
    assert len(profile[-1]) > len(profile[0])


def test_planted_partition_recovery():
    g, truth = planted_partition()
    for pt, kwargs in ((ModularityVertexPartition, {}),
                       (CPMVertexPartition,
                        {"resolution_parameter": 0.1})):
        p = find_partition(g, pt, seed=4, **kwargs)
        pairs = set(zip(p.membership.tolist(), truth.tolist()))
        assert len(pairs) == 4
        assert len(set(p.membership.tolist())) == 4


def test_n_iterations_negative_runs_to_stability():
    g = erdos_renyi(80, 0.08, seed=5)
    p = find_partition(g, CPMVertexPartition, resolution_parameter=0.2,
                       n_iterations=-1, seed=1)
    opt = Optimiser()
    # no further single move improves
    assert opt.move_nodes(p) <= 1e-9


def test_seed_determinism():
    g = erdos_renyi(80, 0.08, directed=True, seed=5)
    a = find_partition(g, ModularityVertexPartition,
                       seed=7).membership.tolist()
    b = find_partition(g, ModularityVertexPartition,
                       seed=7).membership.tolist()
    assert a == b


def test_random_candidate_modes():
    from leidenalg_ray import RAND_COMM, RAND_NEIGH_COMM
    g = erdos_renyi(80, 0.08, seed=6)
    for mode in (RAND_NEIGH_COMM, RAND_COMM):
        p = CPMVertexPartition(g, resolution_parameter=0.05)
        opt = Optimiser()
        opt.set_rng_seed(11)
        q0 = p.quality()
        # run repeated randomized passes; quality must be monotone and
        # eventually improve over the singleton start
        for _ in range(20):
            d = opt.move_nodes(p, consider_comms=mode)
            assert d >= -1e-12
        assert p.quality() > q0


def test_merge_nodes_only_singletons_move():
    g = erdos_renyi(60, 0.1, seed=8)
    mem = np.random.default_rng(3).integers(0, 5, g.n)
    p = CPMVertexPartition(g, resolution_parameter=0.05,
                           initial_membership=mem)
    before = p.membership.copy()
    Optimiser().merge_nodes(p, consider_comms=ALL_NEIGH_COMMS)
    moved = np.flatnonzero(before != p.membership)
    # only nodes that were alone in their community may have moved
    for v in moved:
        assert (before == before[v]).sum() == 1


def test_louvain_mode_refine_partition_false():
    g, truth = planted_partition()
    opt = Optimiser()
    opt.refine_partition = False  # degrade to Louvain w/ fast local move
    opt.set_rng_seed(2)
    p = CPMVertexPartition(g, resolution_parameter=0.1)
    opt.optimise_partition(p)
    pairs = set(zip(p.membership.tolist(), truth.tolist()))
    assert len(pairs) == 4
