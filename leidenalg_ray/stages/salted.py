"""Salted two-phase aggregation — the explicit skew handling for
hot keys (SURVEY.md §4.3.3, §7.3).

A plain ``groupby(key).sum()`` routes every row of a hot key through
one aggregator. ``salted_groupby_sum`` shuffles on ``(key, salt)``
with ``salt = hash(row) % S`` first (spreading a hot key over S
aggregators), then reduces the S partials per key in a second, much
smaller groupby. Combined with per-batch pre-aggregation (the
combiner), a hot key contributes at most ``S x n_batches`` rows to the
wide shuffle instead of its full multiplicity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Sum


def salted_groupby_sum(ds, keys, value, salt=8, alias=None):
    """ds.groupby(keys).sum(value) with salted two-phase aggregation.

    keys: list of column names; value: value column; salt: number of
    sub-buckets per key. Output columns: keys + [alias or value].
    """
    alias = alias or value
    keys = list(keys)

    def add_salt(t: pa.Table) -> pa.Table:
        # deterministic per-row salt: cheap rolling mix of the key cols
        n = t.num_rows
        mix = np.arange(n, dtype=np.int64)
        for k in keys:
            col = t[k].to_numpy(zero_copy_only=False).astype(np.int64)
            mix = mix * np.int64(1000003) + col
        return t.append_column(
            "_salt", pa.array((mix % salt).astype(np.int32)))

    phase1 = ds.map_batches(add_salt, batch_format="pyarrow",
                            zero_copy_batch=True) \
               .groupby(keys + ["_salt"]) \
               .aggregate(Sum(value, alias_name=alias))
    phase2 = phase1.groupby(keys).aggregate(Sum(alias, alias_name=alias))
    return phase2


def salted_groupby_sum_arrays(keys_arrays, values, salt=8):
    """Numpy reference for tests: exact grouped sums regardless of
    salting."""
    key = np.zeros(len(values), dtype=np.int64)
    for k in keys_arrays:
        key = key * np.int64(1000003) + np.asarray(k, dtype=np.int64)
    uniq, inv = np.unique(key, return_inverse=True)
    out = np.zeros(len(uniq))
    np.add.at(out, inv, values)
    return uniq, out
