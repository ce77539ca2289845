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
right side sorted by (on, id) — O((L+R) log R) per group, operating
on int64 views of the Arrow buffers (no pandas conversion, no Python
row loop).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


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


def _on_us(col) -> np.ndarray:
    """`on` column -> int64 (microseconds for timestamps)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
        else col
    if pa.types.is_timestamp(arr.type):
        arr = arr.cast(pa.timestamp("us"))
    return arr.cast(pa.int64()).to_numpy(zero_copy_only=False)


def _ids(col) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
        else col
    return arr.cast(pa.int64()).to_numpy(zero_copy_only=False)


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

    def merge(t: pa.Table) -> pa.Table:
        side = _ids(t["side"])
        on_us = _on_us(t["on"])
        ids = _ids(t["id"])
        lm = side == 0
        rm = ~lm
        if not lm.any() or not rm.any():
            e = pa.array([], pa.int64())
            return pa.table({left_id: e, right_out: e, "gap_us": e})
        r_on, r_id = on_us[rm], ids[rm]
        # sorted by (on, id): searchsorted-right over on lands after
        # every tie, so idx-1 is the max (on, id) <= left.on
        order = np.lexsort((r_id, r_on))
        r_on, r_id = r_on[order], r_id[order]
        l_on, l_id = on_us[lm], ids[lm]
        pos = np.searchsorted(r_on, l_on, side="right") - 1
        m = pos >= 0
        return pa.table({
            left_id: pa.array(l_id[m]),
            right_out: pa.array(r_id[pos[m]]),
            "gap_us": pa.array(l_on[m] - r_on[pos[m]]),
        })

    return u.groupby("by").map_groups(merge, batch_format="pyarrow")


def range_join_count(left_ds, right_ds, by, on, left_id, right_id,
                     window_us, strict_upper=True):
    """For each left row, count right rows in the same ``by`` group
    with ``left.on - window_us <= right.on < left.on`` (a preceding
    interval join). Every left row is kept (count 0 when nothing is in
    range). Returns (left_id, n_in_range).
    """
    u = _tagged_union(left_ds, right_ds, by, on, left_id, right_id)

    def merge(t: pa.Table) -> pa.Table:
        side = _ids(t["side"])
        on_us = _on_us(t["on"])
        ids = _ids(t["id"])
        lm = side == 0
        if not lm.any():
            e = pa.array([], pa.int64())
            return pa.table({left_id: e, "n_in_range": e})
        l_us, l_id = on_us[lm], ids[lm]
        r_us = np.sort(on_us[~lm])
        bound = "left" if strict_upper else "right"
        hi = np.searchsorted(r_us, l_us, side=bound)
        lo = np.searchsorted(r_us, l_us - window_us, side="left")
        return pa.table({
            left_id: pa.array(l_id),
            "n_in_range": pa.array((hi - lo).astype(np.int64)),
        })

    return u.groupby("by").map_groups(merge, batch_format="pyarrow")
