"""Temporal joins the Dataset API lacks as primitives: as-of join and
range(-count) join, expressed as one hash shuffle on the entity key +
vectorised per-group merge (SURVEY.md §2.7 'custom operators'; task
brief: as-of / range joins as composition of groupby().map_groups).

Partitioning assumption (documented per the brief): ONE shuffle on
``by``; each group (one entity's rows) fits in a worker's heap. Keys
are user/session-grained, not corpus-grained — the same assumption the
sessionisation stage makes. Skewed keys cost a big group, not a big
driver: nothing here materialises on the driver.

Inside each group the match is a numpy ``searchsorted`` over the
right side sorted by (on, id) — O((L+R) log R) per group, no Python
row loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _tagged_union(left_ds, right_ds, by, on, left_id, right_id):
    """Align both sides to (by, on, id, side) and union: the groupby
    then shuffles both sides together in one exchange."""
    def tag(side, id_col):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({
                "by": t[by],
                "on": t[on],
                "id": t[id_col],
                "side": pa.array(
                    np.full(t.num_rows, side, dtype=np.int8)),
            })
        return fn

    l = left_ds.map_batches(tag(0, left_id), batch_format="pyarrow",
                            zero_copy_batch=True)
    r = right_ds.map_batches(tag(1, right_id), batch_format="pyarrow",
                             zero_copy_batch=True)
    return l.union(r)


def asof_join(left_ds, right_ds, by, on, left_id, right_id,
              right_out=None):
    """For each left row, the right row in the same ``by`` group with
    the greatest (``on``, right id) such that right.on <= left.on
    (ties on the timestamp break to the largest right id —
    deterministic). Inner semantics: unmatched left rows drop out.

    ``left_id`` / ``right_id`` name the id columns on each input;
    ``right_out`` renames the matched right id in the output (default
    ``right_id``, which must then differ from ``left_id``).

    Returns a Dataset with columns (left_id, right_out, gap_us): the
    match plus the elapsed microseconds — integer, so oracle
    comparison is float-free.
    """
    right_out = right_out or right_id
    u = _tagged_union(left_ds, right_ds, by, on, left_id, right_id)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["side"] == 0]
        r = g[g["side"] == 1].sort_values(["on", "id"])
        if len(l) == 0 or len(r) == 0:
            return pd.DataFrame({left_id: pd.Series([], dtype=np.int64),
                                 right_out: pd.Series([], dtype=np.int64),
                                 "gap_us": pd.Series([], dtype=np.int64)})
        r_on = r["on"].to_numpy()
        l_on = l["on"].to_numpy()
        # rows sorted by (on, id): searchsorted-right over on lands
        # after every tie, so idx-1 is the max (on, id) <= left.on
        pos = np.searchsorted(r_on, l_on, side="right") - 1
        m = pos >= 0
        lm = l[m]
        rm = r.iloc[pos[m]]
        gap = (lm["on"].to_numpy().astype("datetime64[us]").astype(np.int64)
               - rm["on"].to_numpy().astype("datetime64[us]").astype(np.int64))
        return pd.DataFrame({
            left_id: lm["id"].to_numpy().astype(np.int64),
            right_out: rm["id"].to_numpy().astype(np.int64),
            "gap_us": gap.astype(np.int64),
        })

    return u.groupby("by").map_groups(merge, batch_format="pandas")


def range_join_count(left_ds, right_ds, by, on, left_id, right_id,
                     window_us, strict_upper=True):
    """For each left row, count right rows in the same ``by`` group
    with ``left.on - window_us <= right.on < left.on`` (a preceding
    interval join). Every left row is kept (count 0 when nothing is in
    range). Returns (left_id, n_in_range).
    """
    u = _tagged_union(left_ds, right_ds, by, on, left_id, right_id)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["side"] == 0]
        if len(l) == 0:
            return pd.DataFrame({left_id: pd.Series([], dtype=np.int64),
                                 "n_in_range":
                                     pd.Series([], dtype=np.int64)})
        r = g[g["side"] == 1].sort_values("on")
        l_us = l["on"].to_numpy().astype("datetime64[us]") \
                .astype(np.int64)
        r_us = r["on"].to_numpy().astype("datetime64[us]") \
                .astype(np.int64)
        side = "left" if strict_upper else "right"
        hi = np.searchsorted(r_us, l_us, side=side)
        lo = np.searchsorted(r_us, l_us - window_us, side="left")
        return pd.DataFrame({
            left_id: l["id"].to_numpy().astype(np.int64),
            "n_in_range": (hi - lo).astype(np.int64),
        })

    return u.groupby("by").map_groups(merge, batch_format="pandas")
