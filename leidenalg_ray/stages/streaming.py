"""Streaming tumbling-window aggregation with watermark-driven
incremental emission — the stateful-actor streaming form of the batch
``events_window`` operator (task brief: "a streaming window" as a
custom operator class (b): an actor-pool stage holding the needed
state).

Shape:

- the input Dataset is totally ordered by ``(ts, event_id)``
  (``ds.sort``), so event time is monotone across the pumped stream;
- the driver PUMPS each ts-ordered Arrow block to N window actors,
  hash-routed by ``user_id % N`` (vectorised split per block — the
  driver moves block slices, never rows);
- each actor holds OPEN windows only (``{(user, win): [sum, n]}``);
  when the watermark (the stream's current window id) passes a
  window's end, the window closes and its row is emitted immediately
  — actor state is O(open windows per actor), not O(events), at any
  stream length;
- a final ``flush`` closes whatever the watermark never passed.

The closed-row output equals the batch operator exactly (same
``(user, win, n, sum)`` aggregate), so the same SQL window oracle
verifies the streaming path; tests additionally pin the incremental
property (rows emit BEFORE the stream ends) and the state bound.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

WINDOW_US = 300_000_000  # 300 s tumbling windows (== events_window)


@ray.remote(num_cpus=0)
class WindowActor:
    """Holds open windows for its user shard; closes them as the
    watermark advances past their end."""

    def __init__(self):
        self.open: dict = {}
        self.high_wmark = np.iinfo(np.int64).min
        self.late_events = 0

    def add(self, t: pa.Table, watermark_win: int):
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts_us = t["ts_us"].to_numpy(zero_copy_only=False)
        val = t["value"].to_numpy(zero_copy_only=False)
        win = ts_us // WINDOW_US
        # late-event policy: an event whose window the watermark has
        # already closed is DROPPED AND COUNTED (re-opening would
        # emit a duplicate (user, win) row downstream) — the "no
        # silent caps" rule; the sorted pump never produces these,
        # a real out-of-order stream does
        late = win < self.high_wmark
        if late.any():
            self.late_events += int(late.sum())
            keep = ~late
            u, ts_us, val, win = u[keep], ts_us[keep], val[keep],                 win[keep]
        self.high_wmark = max(self.high_wmark, int(watermark_win))
        if len(u) == 0:
            return self._close_below(watermark_win)
        # accumulate in stream order (vectorised per (u, win) run —
        # the pump is (ts, event_id)-sorted so runs are contiguous)
        key = np.stack([u, win], axis=1)
        change = np.r_[True, (np.diff(key, axis=0) != 0).any(axis=1)]
        starts = np.flatnonzero(change)
        ends = np.r_[starts[1:], len(u)]
        for s, e in zip(starts, ends):
            k = (int(u[s]), int(win[s]))
            acc = self.open.get(k)
            if acc is None:
                acc = [0.0, 0]
                self.open[k] = acc
            acc[0] += float(val[s:e].sum())
            acc[1] += int(e - s)
        return self._close_below(watermark_win)

    def _close_below(self, watermark_win):
        done = [k for k in self.open if k[1] < watermark_win]
        if not done:
            return None
        rows = [(k[0], k[1], self.open.pop(k)) for k in sorted(done)]
        return pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "win": pa.array([r[1] for r in rows], pa.int64()),
            "n_events": pa.array([r[2][1] for r in rows], pa.int64()),
            "raw_sum": pa.array([r[2][0] for r in rows], pa.float64()),
        })

    def flush(self):
        return self._close_below(np.iinfo(np.int64).max)

    def n_open(self):
        return len(self.open)

    def late_count(self):
        return self.late_events


def streaming_window_counts(events_ds, n_actors=4, probe=None,
                            pump_batch_size=None):
    """Pump a (ts, event_id)-sorted event Dataset through the window
    actor pool; returns the closed-window Arrow table (user_id, win,
    n_events, raw_sum). ``probe``, if given, is called with
    (n_emitted_so_far, n_open_total) after every pumped block —
    tests use it to pin incremental emission and the state bound."""
    actors = [WindowActor.remote() for _ in range(n_actors)]
    emitted = []

    def pump(t: pa.Table):
        ts_us = pc.cast(t["ts"], pa.int64())
        tt = pa.table({"user_id": t["user_id"], "ts_us": ts_us,
                       "value": t["value"]})
        u = t["user_id"].to_numpy(zero_copy_only=False)
        wmark = int(ts_us.to_numpy(zero_copy_only=False).max()
                    // WINDOW_US)
        outs = []
        for a_i, actor in enumerate(actors):
            m = (u % n_actors) == a_i
            if not m.any():
                continue
            outs.append(actor.add.remote(tt.filter(pa.array(m)),
                                         wmark))
        return outs

    srt = events_ds.sort(["ts", "event_id"])
    for b in srt.iter_batches(batch_format="pyarrow",
                              batch_size=pump_batch_size):
        if len(b) == 0:
            continue
        closed = [c for c in ray.get(pump(b)) if c is not None]
        emitted.extend(closed)
        if probe is not None:
            n_rows = sum(len(c) for c in emitted)
            n_open = sum(ray.get([a.n_open.remote() for a in actors]))
            probe(n_rows, n_open)
    final = [c for c in ray.get([a.flush.remote() for a in actors])
             if c is not None]
    emitted.extend(final)
    if not emitted:
        return pa.table({"user_id": pa.array([], pa.int64()),
                         "win": pa.array([], pa.int64()),
                         "n_events": pa.array([], pa.int64()),
                         "raw_sum": pa.array([], pa.float64())})
    return pa.concat_tables(emitted)
