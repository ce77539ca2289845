"""Property tests for the late-round catalogue operators (their
value-exactness is pinned by the DuckDB oracles via the gate; these
pin the *semantic* invariants that an oracle bug could miss)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from leidenalg_ray.pipelines import queries as Q

SF = "/root/testdata/sf0.001"


def _df(res):
    return res.to_pandas() if hasattr(res, "to_pandas") else res


def test_embed_quantize_error_within_half_step(ray_session):
    df = _df(Q.QUERIES["embed_quantize"](SF))
    step = (df["vmax"] - df["vmin"]) / 255
    # rounding to 6dp on both sides -> allow 2e-6 slack
    assert (df["max_err"] <= step / 2 + 2e-6).all()
    assert (df["max_err"] >= 0).all()


def test_walk_skipgrams_match_bruteforce(ray_session):
    walks = _df(Q.QUERIES["random_walks"](SF))
    pairs = _df(Q.QUERIES["walk_skipgrams"](SF))
    want = {}
    for _, g in walks.groupby("walk_id"):
        v = g.sort_values("step")["vid"].to_numpy()
        for i in range(len(v)):
            for j in range(len(v)):
                if i != j and abs(i - j) <= Q.SKIPGRAM_WINDOW:
                    want[(v[i], v[j])] = want.get((v[i], v[j]), 0) + 1
    got = {(r.center, r.context): r.cnt for r in pairs.itertuples()}
    assert got == want


def test_dedup_delta_pairs_are_cross_role(ray_session):
    df = _df(Q.QUERIES["dedup_delta"](SF))
    assert (df["new_id"] % Q.DELTA_MOD == 0).all()
    assert (df["old_id"] % Q.DELTA_MOD != 0).all()


def test_segment_explode_chunking():
    toks25 = " ".join(f"w{i}" for i in range(25))
    toks9 = " ".join(f"w{i}" for i in range(9))
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array([toks25, toks9])})
    out = Q._segment_explode(t)
    df = out.to_pandas()
    assert (df["doc_id"] == 1).all()          # 9 tokens -> no segment
    assert len(df) == 2                        # floor(25/10) segments
    assert df["h"].nunique() == 2


def test_k_anonymity_flag_matches_count(ray_session):
    df = _df(Q.QUERIES["k_anonymity"](SF))
    assert ((df["n"] < Q.K_ANON).astype(int) == df["at_risk"]).all()


def test_rich_club_monotone_shrinking_club(ray_session):
    df = _df(Q.QUERIES["rich_club_co"](SF)).sort_values("k")
    # the club can only shrink as k grows
    assert (np.diff(df["n_k"].to_numpy()) <= 0).all()
    assert (np.diff(df["e_k"].to_numpy()) <= 0).all()


def test_audience_overlap_bounds(ray_session):
    df = _df(Q.QUERIES["audience_overlap"](SF))
    assert (df["inter"] <= np.minimum(df["n_a"], df["n_b"])).all()
    assert ((df["jaccard"] > 0) & (df["jaccard"] <= 1)).all()
