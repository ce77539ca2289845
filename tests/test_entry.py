"""Driver-contract smoke: entry() runs, queries() vs oracle_sql() on
sf0.001 for a fast subset (the full sweep runs via
scripts/check_oracles.py at sf0.01)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()
SF = "/root/testdata/sf0.001"

FAST_SQL_QUERIES = ["pricing_summary", "edges_ps", "degree_ps",
                    "pagerank_co", "cc_ps", "pagerank_warm_co",
                    "cc_incremental_ps", "token_counts",
                    "dedup_exact", "ann_topk", "events_window",
                    "doc_entropy", "doc_repetition", "doc_blocklist",
                    "profile_lineitem", "price_histogram",
                    "orders_ntile", "events_cumsum", "orders_cube",
                    # users_click_and_signup is legitimately EMPTY at
                    # sf0.001 and an empty Dataset's to_pandas() drops
                    # the schema; the sf0.01 gate covers it (8 rows)
                    "users_customers_outer", "docs_normalize",
                    "events_median_cont", "cms_user_counts",
                    "walk_skipgrams", "rich_club_co",
                    "audience_overlap", "doc_segment_dedup",
                    "embed_quantize", "lang_confusion",
                    "source_similarity", "k_anonymity",
                    "events_drift", "link_negatives",
                    "orders_pps_sample", "price_equidepth",
                    "revenue_by_nation"]


@pytest.fixture(scope="module")
def entrymod():
    import __ray_entry__
    return __ray_entry__


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF}/{t}.parquet')")
    return c


def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_entry_smoke(entrymod):
    out = entrymod.entry()
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    assert len(df) > 0
    assert set(df.columns) == {"vid", "rank", "component", "comm"}


def test_every_query_has_callable(entrymod):
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    assert len(qs) >= 20
    assert set(sqls) <= set(qs)
    assert len(sqls) >= 15


@pytest.mark.parametrize("name", FAST_SQL_QUERIES)
def test_query_matches_oracle(entrymod, con, name):
    qs = entrymod.queries()
    res = qs[name](SF)
    mine = res.to_pandas() if hasattr(res, "to_pandas") else res
    oracle = con.execute(entrymod.oracle_sql()[name]).fetchdf()
    a, b = canon(mine), canon(oracle)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    for c in a.columns:
        if np.issubdtype(a[c].dtype, np.floating):
            assert np.allclose(a[c].to_numpy(),
                               b[c].to_numpy().astype(float),
                               atol=1e-9)
        else:
            assert (a[c].to_numpy() == b[c].to_numpy()).all()
