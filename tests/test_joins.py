"""As-of and range-count joins (stages/joins.py) vs hand-computed
cases and a brute-force pandas oracle on random timestamps."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from leidenalg_ray.stages.joins import asof_join, range_join_count


def _ts(us):
    return pd.to_datetime(np.asarray(us, dtype=np.int64), unit="us")


def _ds(ids, users, ts_us):
    return rd.from_pandas(pd.DataFrame({
        "id": np.asarray(ids, dtype=np.int64),
        "user": np.asarray(users, dtype=np.int64),
        "ts": _ts(ts_us),
    }))


def _collect(ds):
    df = ds.to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_asof_basic_and_ties():
    # user 1: views at t=0 (id 100), t=10 (ids 101 and 102), t=20 (103)
    right = _ds([100, 101, 102, 103], [1, 1, 1, 1], [0, 10, 10, 20])
    # clicks: before any view (dropped), ==10 (tie -> id 102), 15, 25
    left = _ds([1, 2, 3, 4], [1, 1, 1, 1], [-5, 10, 15, 25])
    out = _collect(asof_join(left, right, by="user", on="ts",
                             left_id="id", right_id="id",
                             right_out="view_id"))
    exp = pd.DataFrame({
        "id": np.array([2, 3, 4], dtype=np.int64),
        "view_id": np.array([102, 102, 103], dtype=np.int64),
        "gap_us": np.array([0, 5, 5], dtype=np.int64),
    })
    pd.testing.assert_frame_equal(out, _collect(rd.from_pandas(exp)))


def test_asof_group_isolation():
    # user 2 has clicks but no views -> all dropped; user 1 matches
    right = _ds([10], [1], [100])
    left = _ds([1, 2, 3], [1, 2, 2], [150, 150, 200])
    out = _collect(asof_join(left, right, by="user", on="ts",
                             left_id="id", right_id="id",
                             right_out="rid"))
    assert out["id"].tolist() == [1]
    assert out["rid"].tolist() == [10]
    assert out["gap_us"].tolist() == [50]


def test_range_count_bounds():
    # window [left-100, left): lower inclusive, upper strict
    right = _ds([10, 11, 12, 13], [1, 1, 1, 1], [0, 100, 199, 200])
    left = _ds([1, 2], [1, 1], [200, 500])
    out = _collect(range_join_count(left, right, by="user", on="ts",
                                    left_id="id", right_id="id",
                                    window_us=100))
    # left t=200: right in [100, 200) -> ids 11,12 = 2 (13 at 200 excl)
    # left t=500: nothing in [400, 500) -> kept with 0
    assert out[out["id"] == 1]["n_in_range"].item() == 2
    assert out[out["id"] == 2]["n_in_range"].item() == 0


@pytest.fixture(scope="module")
def random_tables():
    rng = np.random.default_rng(7)
    nl, nr, users = 400, 600, 12
    lt = pd.DataFrame({
        "id": np.arange(nl, dtype=np.int64),
        "user": rng.integers(0, users, nl).astype(np.int64),
        "ts": _ts(rng.integers(0, 10_000, nl) * 1000),
    })
    rt = pd.DataFrame({
        "id": np.arange(1000, 1000 + nr, dtype=np.int64),
        "user": rng.integers(0, users, nr).astype(np.int64),
        "ts": _ts(rng.integers(0, 10_000, nr) * 1000),
    })
    return lt, rt


def test_asof_matches_bruteforce(random_tables):
    lt, rt = random_tables
    out = _collect(asof_join(rd.from_pandas(lt), rd.from_pandas(rt),
                             by="user", on="ts",
                             left_id="id", right_id="id",
                             right_out="rid"))
    rows = []
    for _, l in lt.iterrows():
        c = rt[(rt["user"] == l["user"]) & (rt["ts"] <= l["ts"])]
        if len(c) == 0:
            continue
        m = c.sort_values(["ts", "id"]).iloc[-1]
        gap = (l["ts"] - m["ts"]).value // 1000  # ns -> us
        rows.append((l["id"], m["id"], gap))
    exp = pd.DataFrame(rows, columns=["id", "rid", "gap_us"]) \
        .astype(np.int64)
    exp = exp.sort_values(list(exp.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, exp)


def test_range_count_matches_bruteforce(random_tables):
    lt, rt = random_tables
    w = 500_000
    out = _collect(range_join_count(rd.from_pandas(lt),
                                    rd.from_pandas(rt),
                                    by="user", on="ts",
                                    left_id="id", right_id="id",
                                    window_us=w))
    rows = []
    for _, l in lt.iterrows():
        lo = l["ts"] - pd.Timedelta(microseconds=w)
        n = ((rt["user"] == l["user"]) & (rt["ts"] >= lo)
             & (rt["ts"] < l["ts"])).sum()
        rows.append((l["id"], n))
    exp = pd.DataFrame(rows, columns=["id", "n_in_range"]) \
        .astype(np.int64)
    exp = exp.sort_values(list(exp.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, exp)
