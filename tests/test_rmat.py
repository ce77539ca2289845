"""RMAT synthetic graph source: determinism, skew, kernel feed."""

import numpy as np
import pyarrow as pa

from leidenalg_ray.sources.rmat import rmat_edges


def _collect(ds):
    t = pa.concat_tables(list(ds.iter_batches(batch_size=None,
                                              batch_format="pyarrow")))
    s = t["src"].to_numpy(zero_copy_only=False)
    d = t["dst"].to_numpy(zero_copy_only=False)
    order = np.lexsort((d, s))
    return s[order], d[order]


def test_rmat_partition_invariant_and_deterministic(ray_session):
    a4 = _collect(rmat_edges(8, edge_factor=4, num_partitions=4))
    a16 = _collect(rmat_edges(8, edge_factor=4, num_partitions=16))
    assert (a4[0] == a16[0]).all() and (a4[1] == a16[1]).all()
    b = _collect(rmat_edges(8, edge_factor=4, num_partitions=4))
    assert (a4[0] == b[0]).all() and (a4[1] == b[1]).all()


def test_rmat_shape_and_skew(ray_session):
    s, d = _collect(rmat_edges(10, edge_factor=8))
    n = 1 << 10
    assert len(s) == n * 8
    assert s.min() >= 0 and s.max() < n
    assert d.min() >= 0 and d.max() < n
    deg = np.bincount(s, minlength=n)
    # power-law skew: the hottest vertex far exceeds the mean degree
    assert deg.max() > 10 * deg.mean()


def test_rmat_feeds_bsp_kernels(ray_session):
    from leidenalg_ray.dist.blocks import DistGraph
    from leidenalg_ray.dist import superstep as ss
    n = 1 << 9
    g = DistGraph.from_dataset(rmat_edges(9, edge_factor=8), n=n, P=4,
                               directed=True, dedup=True)
    rank, iters = ss.pagerank(g, damping=0.85, tol=1e-8, active=True)
    act = g.active_global()
    assert iters > 1
    # rank sums to ~1 over the active vertex set
    assert abs(rank[act].sum() - 1.0) < 1e-6


def test_rmat_feeds_distributed_leiden(ray_session):
    """The flagship find_partition_dataset runs on the skewed RMAT
    graph (hub vertices stress the colour-cycle supersteps) and is
    deterministic across runs."""
    from leidenalg_ray.functions_api import find_partition_dataset
    n = 1 << 8
    edges = rmat_edges(8, edge_factor=8, num_partitions=4)
    m1, q1, _, act1 = find_partition_dataset(
        edges, n=n, quality="cpm", resolution_parameter=0.5, P=4,
        seed=3)
    m2, q2, _, act2 = find_partition_dataset(
        edges, n=n, quality="cpm", resolution_parameter=0.5, P=4,
        seed=3)
    assert (act1 == act2).all()
    assert q1 == q2
    assert (m1 == m2).all()
    assert q1 > 0
