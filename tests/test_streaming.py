"""Streaming tumbling-window actor pool: batch-equality, incremental
watermark emission, and the open-window state bound."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from leidenalg_ray.stages.streaming import (WINDOW_US,
                                            streaming_window_counts)

SF = "/root/testdata/sf0.001"


def _sorted_df(t):
    df = t.to_pandas() if hasattr(t, "to_pandas") else t
    return df.sort_values(["user_id", "win"]).reset_index(drop=True)


def test_streaming_equals_batch():
    from leidenalg_ray.pipelines.queries import (q_events_window,
                                                 q_events_window_streaming)
    batch = _sorted_df(q_events_window(SF).to_pandas())
    stream = _sorted_df(q_events_window_streaming(SF))
    assert len(batch) == len(stream)
    assert (batch["user_id"].to_numpy()
            == stream["user_id"].to_numpy()).all()
    assert (batch["win"].to_numpy() == stream["win"].to_numpy()).all()
    assert (batch["n_events"].to_numpy()
            == stream["n_events"].to_numpy()).all()
    # float sums accumulate in different orders; both are round6
    assert np.allclose(batch["sum_value"], stream["sum_value"],
                       atol=2e-6)


def test_incremental_emission_and_state_bound():
    # synthetic stream: 3 users x 20 windows, several events each
    rng = np.random.default_rng(7)
    rows = []
    eid = 0
    for w in range(20):
        for u in range(3):
            for _ in range(4):
                ts = w * WINDOW_US + int(rng.integers(0, WINDOW_US))
                rows.append((u, ts, eid, float(rng.random())))
                eid += 1
    df = pd.DataFrame(rows, columns=["user_id", "ts_us", "event_id",
                                     "value"])
    t = pa.table({
        "user_id": pa.array(df.user_id.to_numpy(np.int64)),
        "ts": pa.array(df.ts_us.to_numpy(np.int64)).cast(
            pa.timestamp("us")),
        "event_id": pa.array(df.event_id.to_numpy(np.int64)),
        "value": pa.array(df.value.to_numpy(np.float64)),
    })
    ds = rd.from_arrow(t).repartition(10)
    probes = []
    out = streaming_window_counts(
        ds, n_actors=2, pump_batch_size=40,
        probe=lambda n_rows, n_open: probes.append((n_rows, n_open)))
    assert len(out) == 60  # 3 users x 20 windows
    # rows were emitted BEFORE the final flush
    assert probes and probes[-1][0] > 0
    assert any(n_rows > 0 for n_rows, _ in probes[:-1])
    # state bound: open windows never exceed one per user (sorted
    # tumbling stream)
    assert all(n_open <= 3 for _, n_open in probes)
    # exactness on the synthetic stream
    want = df.assign(win=df.ts_us // WINDOW_US).groupby(
        ["user_id", "win"]).agg(n=("value", "size"),
                                s=("value", "sum")).reset_index()
    got = out.to_pandas().sort_values(["user_id", "win"]).reset_index(
        drop=True)
    want = want.sort_values(["user_id", "win"]).reset_index(drop=True)
    assert (got["n_events"].to_numpy() == want["n"].to_numpy()).all()
    assert np.allclose(got["raw_sum"], want["s"], atol=1e-9)


def test_late_events_dropped_and_counted(ray_session):
    """An out-of-order event for a window the watermark already
    closed is dropped AND counted — never re-opened (a re-open would
    emit a duplicate (user, win) row)."""
    import numpy as np
    import pyarrow as pa
    import ray
    from leidenalg_ray.stages import streaming as st

    actor = st.WindowActor.remote()
    W = st.WINDOW_US

    def batch(users, wins, vals):
        return pa.table({
            "user_id": pa.array(users, pa.int64()),
            "ts_us": pa.array([w * W + 1 for w in wins], pa.int64()),
            "value": pa.array(vals, pa.float64()),
        })

    # windows 0 and 1 arrive; watermark closes window 0
    out1 = ray.get(actor.add.remote(batch([1, 1], [0, 1],
                                          [1.0, 2.0]), 1))
    assert out1 is not None and out1.num_rows == 1
    assert out1["win"].to_pylist() == [0]
    # a straggler for window 0 arrives late -> dropped + counted
    out2 = ray.get(actor.add.remote(batch([1], [0], [5.0]), 1))
    assert out2 is None
    assert ray.get(actor.late_count.remote()) == 1
    # window 1 closes with ONLY its on-time event
    fin = ray.get(actor.flush.remote())
    assert fin["win"].to_pylist() == [1]
    assert fin["raw_sum"].to_pylist() == [2.0]
    # no duplicate (user, win) rows anywhere
    allw = out1["win"].to_pylist() + fin["win"].to_pylist()
    assert len(allw) == len(set(allw))
