"""leidenalg_ray — a Ray-Data-native link-graph analytics engine.

From-scratch re-expression of the capabilities of vtraag/leidenalg
(reference at /root/reference) on Ray Data: Leiden community detection
(all six quality functions, multiplex/temporal/bipartite, resolution
profiles) plus the companion graph algorithms the north rule requires
(PageRank, connected components, label propagation, triangle counting),
over an edge table extracted from Common-Crawl-style web pages.

Two execution tiers share one semantic core:

- ``leidenalg_ray.graph`` / ``partition`` / ``optimiser``: an exact,
  numpy-vectorised in-memory implementation of the reference semantics
  (quality functions per the docstring formulas in
  reference ``src/leidenalg/VertexPartition.py``; the optimisation loop
  per ``src/leidenalg/Optimiser.py`` and ``doc/source/advanced.rst:100-123``).
  Used directly for small graphs and as the tail-level solver for the
  distributed path (aggregate graphs shrink geometrically).
- ``leidenalg_ray.dist``: the scale path — hash-partitioned CSR blocks
  in the Ray object store, BSP supersteps (map over partitions +
  per-destination-partition combiner shuffle), Ray Data pipelines for
  extraction / graph build / wide shuffles.
"""

from .graph import Graph
from .partition import (
    MutableVertexPartition,
    ModularityVertexPartition,
    RBConfigurationVertexPartition,
    RBERVertexPartition,
    CPMVertexPartition,
    SignificanceVertexPartition,
    SurpriseVertexPartition,
)
from .optimiser import (
    Optimiser,
    ALL_COMMS,
    ALL_NEIGH_COMMS,
    RAND_COMM,
    RAND_NEIGH_COMM,
    MOVE_NODES,
    MERGE_NODES,
)
from .functions_api import (
    find_partition,
    find_partition_dataset,
    find_partition_multiplex,
    find_partition_multiplex_dataset,
    find_partition_temporal,
    find_partition_temporal_dataset,
    resolution_profile_dataset,
    slices_to_layers,
    time_slices_to_layers,
)
from .compare import compare_partitions, contingency

__version__ = "0.1.0"

__all__ = [
    "Graph",
    "MutableVertexPartition",
    "ModularityVertexPartition",
    "RBConfigurationVertexPartition",
    "RBERVertexPartition",
    "CPMVertexPartition",
    "SignificanceVertexPartition",
    "SurpriseVertexPartition",
    "Optimiser",
    "ALL_COMMS",
    "ALL_NEIGH_COMMS",
    "RAND_COMM",
    "RAND_NEIGH_COMM",
    "MOVE_NODES",
    "MERGE_NODES",
    "find_partition",
    "find_partition_dataset",
    "find_partition_multiplex",
    "find_partition_multiplex_dataset",
    "find_partition_temporal",
    "find_partition_temporal_dataset",
    "resolution_profile_dataset",
    "slices_to_layers",
    "time_slices_to_layers",
    "compare_partitions",
    "contingency",
]
