"""Deterministic RMAT (Graph500-style) synthetic graph source.

Generates a power-law-skewed edge Dataset of 2^scale vertices and
n*edge_factor edges entirely inside ``map_batches`` — each edge is a
pure function of its index (counter-hash bit decisions), so generation
is partition-count-invariant, resumable, and needs no driver memory or
RNG state. This is the standard scalable benchmark graph (Chakrabarti,
Zhan & Faloutsos, "R-MAT: A Recursive Model for Graph Mining", SDM
2004; Graph500 spec — public knowledge): hub vertices emerge with
degree >> mean, which is exactly the skew the BSP kernels' salted
shuffles and per-destination pre-aggregation must absorb.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)
_G = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finaliser (public-domain mixing
    constants); uint64 in, well-mixed uint64 out."""
    x = (x + _G).astype(np.uint64)
    x = ((x ^ (x >> np.uint64(30))) * _M1).astype(np.uint64)
    x = ((x ^ (x >> np.uint64(27))) * _M2).astype(np.uint64)
    return (x ^ (x >> np.uint64(31))).astype(np.uint64)


def rmat_edges(scale: int, edge_factor: int = 16, a: float = 0.57,
               b: float = 0.19, c: float = 0.19, seed: int = 42,
               num_partitions: int = 16):
    """Dataset (src, dst, weight=1.0) with 2^scale vertices and
    (2^scale)*edge_factor directed multi-edges. Each of the `scale`
    quadrant decisions for edge i hashes (i, level, seed) — no state,
    no driver arrays, identical output at any partition count."""
    n_edges = (1 << scale) * edge_factor
    s_u64 = np.uint64(seed)

    def gen(t: pa.Table) -> pa.Table:
        idx = t["id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        src = np.zeros(len(idx), dtype=np.int64)
        dst = np.zeros(len(idx), dtype=np.int64)
        for lvl in range(scale):
            h = _splitmix64(idx * np.uint64(0x100000001B3)
                            ^ (np.uint64(lvl) * _G) ^ s_u64)
            r = (h >> np.uint64(11)).astype(np.float64) * 2.0 ** -53
            quad = np.where(r < a, 0,
                            np.where(r < a + b, 1,
                                     np.where(r < a + b + c, 2, 3)))
            src = src * 2 + (quad >> 1)
            dst = dst * 2 + (quad & 1)
        return pa.table({"src": pa.array(src), "dst": pa.array(dst),
                         "weight": pa.array(np.ones(len(idx)))})

    return rd.range(n_edges, override_num_blocks=num_partitions) \
        .map_batches(gen, batch_format="pyarrow", zero_copy_batch=True)
