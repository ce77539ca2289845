"""Multiplex, temporal and bipartite paths (reference
functions.py:95-306, VertexPartition.py:950-1105)."""

import numpy as np

from leidenalg_ray import (
    CPMVertexPartition,
    Optimiser,
    find_partition_multiplex,
    find_partition_temporal,
    slices_to_layers,
)
from leidenalg_ray.graph import Graph

from .fixtures import bipartite8, erdos_renyi, lattice


def test_multiplex_identical_layers_match_single():
    g = erdos_renyi(60, 0.08, seed=3)
    mem, imp = find_partition_multiplex(
        [g, g], CPMVertexPartition, resolution_parameter=0.1, seed=2)
    assert len(mem) == g.n
    assert len(set(mem)) > 1


def test_bipartite_one_community():
    g, types = bipartite8()
    p01, p0, p1 = CPMVertexPartition.Bipartite(
        g, resolution_parameter_01=0.2, types=types)
    opt = Optimiser()
    opt.optimise_partition_multiplex([p01, p0, p1],
                                     layer_weights=[1, -1, -1])
    assert len(p01) == 1


def test_slices_to_layers_shapes():
    g1 = lattice(10, 1)
    g2 = lattice(10, 1)
    layers, inter, slice_of, id_of = slices_to_layers(
        [g1, g2], coupling_edges=[(0, 1, 1.0)])
    assert len(layers) == 2
    assert layers[0].n == 20
    assert layers[0].node_size.sum() == 10  # masked node sizes
    assert inter.ecount == 10  # common ids coupled
    assert inter.node_size.sum() == 0


def test_temporal_membership_coupled():
    g1 = lattice(100, 1)
    g2 = lattice(100, 1)
    mems, imp = find_partition_temporal(
        [g1, g2], CPMVertexPartition, interslice_weight=1,
        resolution_parameter=0.05, seed=3)
    assert len(mems) == 2 and len(mems[0]) == 100
    # strong coupling: most vertices share community across slices
    same = sum(1 for a, b in zip(mems[0], mems[1]) if a == b)
    assert same > 80
