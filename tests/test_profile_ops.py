"""Quality-signal / profiling operators: repetition ratio, word
entropy, contamination check, histogram, column profile, conductance."""

import math

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data as rd

from leidenalg_ray.stages import text as tx


@pytest.fixture(scope="module")
def docs():
    base = [
        "a b c a b c a b c",              # id 0 (eval: 0 % 19 == 0)
        "x y z w v u t s r q p o n m",    # id 1, all-distinct trigrams
        "a b c a b c d e f g h i j",      # id 2, shares 5-grams with 0
        "hi",                             # id 3, too short for trigrams
        "p p p p p p p p",                # id 4, one repeated token
    ]
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(base)), pa.int64()),
        "text": pa.array(base, pa.string()),
    }))


def test_repetition_ratio(docs):
    out = tx.repetition_stats(docs).to_pandas().set_index("doc_id")
    assert 3 not in out.index  # <3 tokens -> no row
    # doc 0: 7 trigrams, 3 distinct ("a b c","b c a","c a b")
    assert out.loc[0, "n_tri"] == 7 and out.loc[0, "n_uniq"] == 3
    assert out.loc[0, "rep_ratio"] == pytest.approx(1 - 3 / 7, abs=1e-6)
    assert out.loc[1, "rep_ratio"] == 0.0      # all distinct
    assert out.loc[4, "n_uniq"] == 1           # "p p p" only


def test_word_entropy(docs):
    out = tx.entropy_stats(docs).to_pandas().set_index("doc_id")
    assert out.loc[4, "entropy"] == 0.0        # single symbol
    # doc 0: uniform over 3 symbols -> log2(3)
    assert out.loc[0, "entropy"] == pytest.approx(math.log2(3),
                                                  abs=1e-6)
    assert out.loc[0, "n_tokens"] == 9


def test_contamination(docs):
    out = tx.contamination_check(docs).to_pandas().set_index("doc_id")
    assert 0 not in out.index                  # eval doc excluded
    assert 3 not in out.index                  # <5 tokens
    # doc 2's first five 5-grams: "a b c a b","b c a b c","c a b c d",
    # "a b c d e",... — the first two appear in doc 0's gram set
    assert out.loc[2, "n_grams"] == 9
    assert out.loc[2, "n_hit"] == 2
    assert out.loc[1, "n_hit"] == 0


def test_contamination_eval_set(docs):
    ev = tx.eval_gram_set(docs)
    # doc 0 has 5 distinct 5-grams ("a b c a b", "b c a b c",
    # "c a b c a", "a b c a b" dup, ...)
    toks = "a b c a b c a b c".split()
    want = {" ".join(toks[i:i + 5]) for i in range(len(toks) - 4)}
    assert ev == frozenset(want)


def test_price_histogram_and_profile():
    sf_dir_small = "/root/testdata/sf0.001"
    import duckdb
    from leidenalg_ray.pipelines.queries import (
        q_price_histogram, q_profile_lineitem)
    hist = q_price_histogram(sf_dir_small).to_pandas()
    con = duckdb.connect()
    n = con.execute(
        f"SELECT count(*) FROM "
        f"read_parquet('{sf_dir_small}/lineitem.parquet')").fetchone()[0]
    assert hist.n.sum() == n
    assert (hist.min_price >= hist.bucket * 5000.0).all()
    assert (hist.max_price < (hist.bucket + 1) * 5000.0).all()

    prof = q_profile_lineitem(sf_dir_small).to_pandas()
    assert set(prof["column"]) == {"l_quantity", "l_extendedprice",
                                   "l_discount", "l_tax"}
    assert (prof.n_rows == n).all() and (prof.n_null == 0).all()
    q = prof.set_index("column").loc["l_quantity"]
    assert q.vmin >= 1 and q.vmax <= 50 and 1 <= q["mean"] <= 50


def test_conductance_parts():
    sf_dir_small = "/root/testdata/sf0.001"
    from leidenalg_ray.pipelines.queries import q_conductance_co
    out = q_conductance_co(sf_dir_small).to_pandas()
    assert len(out) == 8
    # vol = 2*internal + cut per part; conductance in [0, 1]
    assert (out.vol == 2 * out.internal_edges + out.cut_edges).all()
    assert ((out.conductance >= 0) & (out.conductance <= 1)).all()
    # hash partition of a near-random co graph: cuts dominate
    assert (out.cut_edges > out.internal_edges).all()
