"""Package-level entry points mirroring reference
``src/leidenalg/functions.py``: ``find_partition`` (``:21-93``),
``find_partition_multiplex`` (``:95-176``), ``find_partition_temporal``
(``:178-306``), ``slices_to_layers`` (``:366-528``) and
``time_slices_to_layers`` (``:337-364``).

The reference moves igraph objects with vertex attributes; this engine
is table-first: a slice is a ``Graph`` plus an array of external vertex
ids, and the slice→layer transform returns plain arrays (the
distributed tier runs the identical transform as Dataset ops — see
``leidenalg_ray.dist``).
"""

from __future__ import annotations

from collections import Counter

import numpy as np

from .graph import Graph
from .optimiser import Optimiser


def find_partition(graph, partition_type, initial_membership=None,
                   weights=None, n_iterations=2, max_comm_size=0, seed=None,
                   **kwargs):
    """Detect communities using the Leiden algorithm
    (reference ``functions.py:21-93``)."""
    partition = partition_type(graph, initial_membership=initial_membership,
                               weights=weights, **kwargs)
    optimiser = Optimiser()
    optimiser.max_comm_size = max_comm_size
    if seed is not None:
        optimiser.set_rng_seed(seed)
    optimiser.optimise_partition(partition, n_iterations)
    return partition


def find_partition_dataset(edges_ds, n, quality="modularity",
                           resolution_parameter=1.0, P=8, seed=42,
                           n_iterations=2, max_comm_size=0,
                           initial_membership=None, **kwargs):
    """Ray-Data-first ``find_partition``: Leiden over an edge Dataset
    ``(src, dst[, weight])`` on the raw id space — the >node-memory
    entry point (reference ``functions.py:21-93`` semantics; the
    reference itself is in-RAM by design, ``__init__.py:3-5``).

    The Dataset spills to partitioned parquet and each shard actor
    loads only its own partition; the driver never materialises the
    edge list. Returns ``(membership, quality, info, active_vids)``
    where membership indexes the raw id space and ``active_vids`` is
    the actual (degree > 0) vertex set."""
    from .dist.leiden import DistLeiden

    dl = DistLeiden.from_dataset(
        edges_ds, n=n, quality=quality,
        resolution_parameter=resolution_parameter, P=P, seed=seed,
        max_comm_size=max_comm_size, **kwargs)
    mem, q, info = dl.run(n_iterations=n_iterations,
                          initial_membership=initial_membership)
    return mem, q, info, dl.active_vids()


def find_partition_multiplex(graphs, partition_type, layer_weights=None,
                             n_iterations=2, max_comm_size=0, seed=None,
                             **kwargs):
    """Multiplex community detection over K graphs on an identical vertex
    set; returns (membership, improvement)
    (reference ``functions.py:95-176``)."""
    n_layers = len(graphs)
    partitions = [partition_type(g, **kwargs) for g in graphs]
    if layer_weights is None:
        layer_weights = [1.0] * n_layers
    optimiser = Optimiser()
    optimiser.max_comm_size = max_comm_size
    if seed is not None:
        optimiser.set_rng_seed(seed)
    improvement = optimiser.optimise_partition_multiplex(
        partitions, layer_weights, n_iterations)
    return list(partitions[0].membership), improvement


def slices_to_layers(slice_graphs, slice_ids=None, coupling_edges=None,
                     coupling_weight=1.0):
    """Convert slices on arbitrary vertex sets plus a coupling structure
    into layers over the disjoint-union vertex set keyed by
    ``(slice, id)`` (reference ``functions.py:366-528``).

    Parameters
    ----------
    slice_graphs : list of Graph
    slice_ids : list of 1-d arrays — external vertex id per slice vertex
        (default: ``0..n_k-1``). Ids must be unique within a slice
        (reference ``functions.py:492-503``).
    coupling_edges : list of (slice_i, slice_j, weight) — interslice
        couplings (default: none). Vertices with the same external id in
        the two slices are coupled (reference ``functions.py:504-515``).

    Returns
    -------
    (layers, interslice_layer, slice_of, id_of)
        ``layers[k]``: Graph over the union vertex set holding slice k's
        edges; ``node_size`` 1 on slice-k vertices, 0 elsewhere
        (reference ``functions.py:517-526``). ``interslice_layer``:
        coupling edges, all node sizes 0. ``slice_of``/``id_of``: arrays
        mapping union vid -> (slice index, external id).
    """
    T = len(slice_graphs)
    if slice_ids is None:
        slice_ids = [np.arange(g.n) for g in slice_graphs]
    offsets = np.zeros(T + 1, dtype=np.int64)
    for k, g in enumerate(slice_graphs):
        ids = np.asarray(slice_ids[k])
        if len(ids) != g.n:
            raise ValueError(f"slice {k}: ids length != vertex count")
        dup = [i for i, c in Counter(ids.tolist()).items() if c > 1]
        if dup:
            raise ValueError(
                f"The vertex id attribute is not unique for slice {k}: "
                f"duplicates {dup[:5]} "
                "(reference functions.py:492-503)")
        offsets[k + 1] = offsets[k] + g.n
    n_union = int(offsets[T])
    slice_of = np.concatenate([np.full(g.n, k, dtype=np.int64)
                               for k, g in enumerate(slice_graphs)]) \
        if T else np.empty(0, np.int64)
    id_of = np.concatenate([np.asarray(slice_ids[k])
                            for k in range(T)]) if T else np.empty(0)

    directed = any(g.directed for g in slice_graphs)
    layers = []
    for k, g in enumerate(slice_graphs):
        node_size = np.zeros(n_union)
        node_size[offsets[k]:offsets[k + 1]] = 1.0
        layers.append(Graph(n_union, src=g.src + offsets[k],
                            dst=g.dst + offsets[k], weights=g.weight.copy(),
                            node_sizes=node_size, directed=directed))

    isrc, idst, iw = [], [], []
    for (a, b, w) in (coupling_edges or []):
        ids_a = np.asarray(slice_ids[a])
        ids_b = np.asarray(slice_ids[b])
        # intersect on sorted external ids (reference functions.py:504-515)
        common, ia, ib = np.intersect1d(ids_a, ids_b, return_indices=True)
        isrc.append(ia + offsets[a])
        idst.append(ib + offsets[b])
        iw.append(np.full(len(common), float(w)))
    interslice = Graph(
        n_union,
        src=np.concatenate(isrc) if isrc else np.empty(0, np.int64),
        dst=np.concatenate(idst) if idst else np.empty(0, np.int64),
        weights=np.concatenate(iw) if iw else None,
        node_sizes=np.zeros(n_union),
        directed=directed)
    return layers, interslice, slice_of, id_of


def time_slices_to_layers(graphs, interslice_weight=1, slice_ids=None):
    """Path-coupled slices 1--2--...--T with uniform interslice weight
    (reference ``functions.py:337-364``)."""
    coupling = [(k, k + 1, interslice_weight) for k in range(len(graphs) - 1)]
    return slices_to_layers(graphs, slice_ids, coupling)


def find_partition_temporal(graphs, partition_type, interslice_weight=1,
                            slice_ids=None, n_iterations=2, max_comm_size=0,
                            seed=None, **kwargs):
    """Temporal community detection across time slices; returns
    (memberships per slice, improvement)
    (reference ``functions.py:178-306``)."""
    from .partition import CPMVertexPartition

    layers, interslice, slice_of, id_of = time_slices_to_layers(
        graphs, interslice_weight, slice_ids)
    partitions = [partition_type(H, node_sizes=H.node_size,
                                 weights=H.weight, **kwargs)
                  for H in layers]
    partition_interslice = CPMVertexPartition(
        interslice, resolution_parameter=0.0,
        node_sizes=interslice.node_size, weights=interslice.weight)
    optimiser = Optimiser()
    optimiser.max_comm_size = max_comm_size
    if seed is not None:
        optimiser.set_rng_seed(seed)
    improvement = optimiser.optimise_partition_multiplex(
        partitions + [partition_interslice],
        layer_weights=[1.0] * (len(partitions) + 1),
        n_iterations=n_iterations)
    union_mem = np.asarray(partitions[0].membership)
    memberships = []
    for k, g in enumerate(graphs):
        memberships.append(union_mem[slice_of == k].tolist())
    return memberships, improvement
