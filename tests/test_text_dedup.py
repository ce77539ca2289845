"""Training-data operators: dedup families, ANN, text analysis."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from leidenalg_ray.stages import ann as annm
from leidenalg_ray.stages import dedup as dd
from leidenalg_ray.stages import text as tx


@pytest.fixture(scope="module")
def docs():
    base = [
        "the quick brown fox jumps over the lazy dog and runs away",
        "the quick brown fox jumps over the lazy dog and walks away",
        "completely different text about graph community detection",
        "another unrelated document mentioning tables and rows",
        "the quick brown fox jumps over the lazy dog and runs away",
    ]
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(base)), pa.int64()),
        "text": pa.array(base, pa.string()),
    }))


def _drop_snapshot(ctr, want_buckets, timeout_s=15.0):
    """Poll the DropCounter until the expected bucket count lands.

    ``add.remote()`` is fire-and-forget from map_groups workers; task
    completion does not guarantee the actor has processed the message
    before the driver's ``snapshot`` call, so a fresh read can race to
    zero. Poll with a deadline instead of sleeping blind."""
    import time

    import ray

    deadline = time.monotonic() + timeout_s
    while True:
        snap = ray.get(ctr.snapshot.remote())
        if snap["dropped_buckets"] >= want_buckets \
                or time.monotonic() >= deadline:
            return snap
        time.sleep(0.2)


def test_exact_dedup(docs):
    out = dd.exact_dedup(docs).to_pandas()
    assert len(out) == 4  # docs 0 and 4 identical
    dup = out[out.n_dups > 1]
    assert len(dup) == 1 and dup.iloc[0].rep_doc_id == 0


def test_minhash_near_dups(docs):
    pairs = dd.minhash_dedup(docs, threshold=0.5).to_pandas()
    got = set(map(tuple, pairs[["a", "b"]].to_numpy()))
    assert (0, 4) in got  # identical
    assert (0, 1) in got  # near-identical
    assert (0, 2) not in got


def test_simhash_near_dups(docs):
    pairs = dd.simhash_dedup(docs, max_hamming=6).to_pandas()
    got = set(map(tuple, pairs[["a", "b"]].to_numpy()))
    assert (0, 4) in got
    assert all(p not in got for p in [(0, 2), (2, 3)])


def test_embedding_cosine_lsh_vs_exact():
    rng = np.random.default_rng(2)
    base = rng.standard_normal((40, 16))
    # create 5 near-duplicate rows
    dups = base[:5] + 0.01 * rng.standard_normal((5, 16))
    vecs = np.vstack([base, dups])
    t = pa.table({"vec_id": pa.array(range(len(vecs)), pa.int64()),
                  "embedding": pa.array(list(vecs.astype(np.float32)))})
    ds = rd.from_arrow(t)
    exact = dd.embedding_cosine_pairs(ds, threshold=0.99,
                                      use_lsh=False).to_pandas()
    ex = set(map(tuple, exact[["a", "b"]].to_numpy()))
    assert all((i, 40 + i) in ex for i in range(5))
    lsh = dd.embedding_cosine_pairs(ds, threshold=0.99, n_planes=4,
                                    use_lsh=True).to_pandas()
    ls = set(map(tuple, lsh[["a", "b"]].to_numpy()))
    assert ls.issubset(ex)
    assert len(ls) >= len(ex) * 0.6  # recall floor for 4 planes


def test_ann_brute_force_topk():
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((100, 8))
    t = pa.table({"vec_id": pa.array(range(100), pa.int64()),
                  "embedding": pa.array(list(vecs.astype(np.float32)))})
    ds = rd.from_arrow(t)
    out = annm.brute_force_topk(ds, vecs[:2].astype(np.float64),
                                [0, 1], k=5).to_pandas()
    # numpy oracle
    v64 = vecs.astype(np.float32).astype(np.float64)
    unit = v64 / np.linalg.norm(v64, axis=1, keepdims=True)
    for q in (0, 1):
        sims = unit @ (v64[q] / np.linalg.norm(v64[q]))
        top = np.lexsort((np.arange(100), -sims))[:5]
        got = out[out.query_id == q].sort_values("rank").vec_id.tolist()
        assert got == top.tolist()


def test_ann_ivf_recall():
    rng = np.random.default_rng(4)
    vecs = rng.standard_normal((300, 16))
    t = pa.table({"vec_id": pa.array(range(300), pa.int64()),
                  "embedding": pa.array(list(vecs.astype(np.float32)))})
    ds = rd.from_arrow(t)
    brute = annm.brute_force_topk(ds, vecs[:3], [0, 1, 2],
                                  k=10).to_pandas()
    ivf = annm.ivf_topk(ds, vecs[:3], [0, 1, 2], k=10, n_centroids=8,
                        nprobe=4).to_pandas()
    recalls = []
    for q in (0, 1, 2):
        bset = set(brute[brute.query_id == q].vec_id)
        iset = set(ivf[ivf.query_id == q].vec_id)
        recalls.append(len(bset & iset) / len(bset))
    assert np.mean(recalls) >= 0.6


def test_token_stats_and_langid(docs):
    out = tx.token_counts(docs, concurrency=2).to_pandas() \
        .sort_values("doc_id")
    assert out.n_tokens.iloc[0] == 12
    lang = tx.lang_id(docs, concurrency=2).to_pandas()
    assert (lang.pred_lang == "en").all()
    de = rd.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["der hund ist nicht mit der katze und das"],
                         pa.string())}))
    assert tx.lang_id(de, concurrency=1).to_pandas() \
        .pred_lang.iloc[0] == "de"


def test_rolling_fingerprint_shift_invariance():
    # same token stream => same fingerprint; different stream differs
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "alpha beta gamma delta epsilon zeta eta theta iota kappa",
            "alpha  beta   gamma delta epsilon zeta eta theta iota kappa",
            "alpha beta gamma delta epsilon zeta eta theta iota lambda",
        ], pa.string()),
    })
    out = tx.rolling_fingerprint(rd.from_arrow(t)).to_pandas() \
        .sort_values("doc_id")
    assert out.fingerprint.iloc[0] == out.fingerprint.iloc[1]
    assert out.fingerprint.iloc[0] != out.fingerprint.iloc[2]


def test_dedup_cluster_transitive(docs):
    """0-1 and 0-4 are near-dup pairs -> {0,1,4} one cluster with rep
    0 via transitivity (even if 1-4 were never an LSH candidate);
    matches a serial union-find over the verified pair set."""
    out = dd.dedup_cluster(docs, threshold=0.5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert set(out.doc_id) == {0, 1, 4}
    assert (out.rep_doc_id == 0).all()

    pairs = dd.minhash_dedup(docs, threshold=0.5).to_pandas()
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs[["a", "b"]].to_numpy():
        parent[find(int(a))] = find(int(b))
    serial = {d: min(x for x in parent if find(x) == find(d))
              for d in parent}
    got = dict(zip(out.doc_id, out.rep_doc_id))
    assert got == serial


def test_tfidf_topk_serial_oracle(docs):
    """tfidf == tf * ln(N/df) computed serially; output invariant to
    batching (df shuffle + broadcast make it batch-independent)."""
    import collections
    import math
    import re

    out = tx.tfidf_topk(docs, k=3).to_pandas() \
        .sort_values(["doc_id", "term"]).reset_index(drop=True)

    texts = docs.to_pandas().set_index("doc_id")["text"]
    tf = {d: collections.Counter(re.findall(r"[a-z0-9]+", t.lower()))
          for d, t in texts.items()}
    df = collections.Counter(w for c in tf.values() for w in set(c))
    n = len(texts)
    rows = []
    for d, c in tf.items():
        scored = sorted(((w, f * math.log(n / df[w]))
                         for w, f in c.items()),
                        key=lambda x: (-x[1], x[0]))[:3]
        rows.extend((d, w, round(abs(s) * 1e6 + 0.5) // 1 / 1e6
                     * (1 if s >= 0 else -1)) for w, s in scored)
    import pandas as pd
    exp = pd.DataFrame(rows, columns=["doc_id", "term", "tfidf"]) \
        .sort_values(["doc_id", "term"]).reset_index(drop=True)
    assert list(out.doc_id) == list(exp.doc_id)
    assert list(out.term) == list(exp.term)
    assert np.allclose(out.tfidf, exp.tfidf, atol=1e-6)

    rebatched = docs.repartition(3)
    out2 = tx.tfidf_topk(rebatched, k=3).to_pandas() \
        .sort_values(["doc_id", "term"]).reset_index(drop=True)
    assert out.equals(out2)


def test_pii_scrub_masks_and_counts(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from leidenalg_ray.stages.text import pii_scrub
    import hashlib

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "mail me at a.b-c%d@sub.example.org or +4915112345678 ok",
            "no pii here at all",
            "two mails x@y.io z@w.co and +1234567 end",
        ]),
    }))
    out = pii_scrub(docs).to_pandas().sort_values("doc_id")
    assert out["n_emails"].tolist() == [1, 0, 2]
    assert out["n_phones"].tolist() == [1, 0, 1]
    clean1 = "mail me at [EMAIL] or [PHONE] ok"
    assert out["clean_md5"].iloc[0] == hashlib.md5(
        clean1.encode()).hexdigest()


def test_ivf_topk_hot_bucket_skew():
    """VERDICT r2: the IVF search must not materialise a whole
    centroid bucket in one task. The rewrite fuses assignment + probed
    search into a single map_batches with per-batch partial top-k, so
    an adversarially skewed corpus (every vector in ONE bucket) still
    returns the exact probed-search result with bounded batches."""
    import ray.data as rd
    import pyarrow as pa
    from leidenalg_ray.stages import ann as annm

    rng = np.random.default_rng(11)
    d = 8
    # all corpus vectors clustered tightly around one direction ->
    # every vector lands in the same coarse bucket
    base = rng.normal(size=d)
    base /= np.linalg.norm(base)
    vecs = base[None, :] + 0.01 * rng.normal(size=(4000, d))
    # centroids: one near the hot direction, the rest far away
    cents = rng.normal(size=(8, d))
    cents[0] = base
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(4000, dtype=np.int64)),
        "embedding": pa.array(list(vecs.astype(np.float64))),
    })).repartition(16)
    out = annm.ivf_topk(ds, vecs[:3], [0, 1, 2], k=5,
                        nprobe=2, centroids=cents).to_pandas()
    # exact oracle: brute force restricted to the probed buckets
    unit = vecs / np.linalg.norm(vecs, axis=1)[:, None]
    cu = cents / np.linalg.norm(cents, axis=1)[:, None]
    assign = np.argmax(unit @ cu.T, axis=1)
    for j in range(3):
        qd = cu @ unit[j]
        probes = np.lexsort((np.arange(8), -qd))[:2]
        mask = np.isin(assign, probes)
        sims = unit[mask] @ unit[j]
        ids = np.arange(4000)[mask]
        order = np.lexsort((ids, -sims))[:5]
        want = ids[order]
        got = out[out.query_id == j].sort_values("rank")["vec_id"] \
            .to_numpy()
        assert np.array_equal(got, want)


def test_hash_tokens_bit_identical():
    """The distinct-cache vectorised hasher produces exactly the same
    md5-derived hashes as the per-occurrence loop (the SQL oracles
    replicate that md5, so this identity is load-bearing)."""
    words = ["the", "cat", "the", "mat", "cat", "the", ""]
    got = tx.hash_tokens(words)
    want = np.array([tx.hash_token(w) for w in words], dtype=np.uint64)
    assert np.array_equal(got, want)
    assert len(tx.hash_tokens([])) == 0


def test_shingles_batch_matches_per_doc():
    texts = ["the quick brown fox jumps", "short", "",
             "the quick brown fox jumps over the quick brown fox",
             "a b", "x y z w"]
    batch = dd._shingles_batch(texts, 3)
    for t, got in zip(texts, batch):
        want = dd._shingles(t, 3)
        assert np.array_equal(got, want), t


def test_lsh_drop_counter_counts_capped_buckets(ray_session):
    """'No silent caps': an over-max_bucket LSH bucket increments the
    DropCounter (one increment per dropped band bucket) instead of
    silently vanishing; under-cap runs leave it at zero."""
    import ray

    texts = ["identical boilerplate page body text here"] * 12
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(12, dtype=np.int64)),
        "text": pa.array(texts),
    }))
    ctr = dd.DropCounter.remote()
    cand = dd.minhash_candidates(docs, num_hashes=16, bands=4,
                                 max_bucket=5, drop_counter=ctr)
    assert cand.count() == 0        # every bucket over the cap
    snap = _drop_snapshot(ctr, want_buckets=4)
    assert snap["dropped_buckets"] == 4   # one per band, 12 ids each
    assert snap["dropped_ids"] == 48
    # under the cap: pairs flow, counter untouched
    ctr2 = dd.DropCounter.remote()
    cand2 = dd.minhash_candidates(docs, num_hashes=16, bands=4,
                                  max_bucket=100, drop_counter=ctr2)
    assert cand2.count() == 12 * 11 // 2
    assert ray.get(ctr2.snapshot.remote())["dropped_buckets"] == 0


def test_simhash_drop_counter(ray_session):
    """The SimHash chunk-bucket cap uses the same non-silent
    DropCounter channel as the MinHash bands."""
    texts = ["same exact page body"] * 8
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(8, dtype=np.int64)),
        "text": pa.array(texts),
    }))
    ctr = dd.DropCounter.remote()
    out = dd.simhash_dedup(docs, max_bucket=4, drop_counter=ctr)
    assert out.count() == 0
    snap = _drop_snapshot(ctr, want_buckets=4)
    assert snap["dropped_buckets"] == 4    # one per 16-bit chunk
    assert snap["dropped_ids"] == 32


def test_winnow_moss_guarantee(ray_session):
    # two docs sharing a run of >= kgram+window-1 = 7 tokens must
    # share at least one winnowing fingerprint (Schleimer et al. 2003)
    shared = "alpha beta gamma delta epsilon zeta eta"
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            f"unique prefix one {shared} tail xx yy",
            f"other opening words {shared} different ending zz",
            "no overlap here at all just filler tokens apple pear",
        ], pa.string()),
    })
    fps = dd.winnow_fingerprints(rd.from_arrow(t)).to_pandas()
    s0 = set(fps[fps["doc_id"] == 0]["fp"])
    s1 = set(fps[fps["doc_id"] == 1]["fp"])
    s2 = set(fps[fps["doc_id"] == 2]["fp"])
    assert s0 & s1, "shared 7-token run must share a fingerprint"
    assert not (s0 & s2) and not (s1 & s2)


def test_winnow_matches_threshold_and_identity(ray_session):
    txt = ("the quick brown fox jumps over the lazy dog again and "
           "again with more words to winnow")
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([txt, txt,
                          "entirely different content with nothing "
                          "in common whatsoever for this test"],
                         pa.string()),
    })
    m = dd.winnow_matches(rd.from_arrow(t), min_shared=2).to_pandas()
    assert len(m) == 1
    assert (int(m["a"].iloc[0]), int(m["b"].iloc[0])) == (0, 1)
    # identical docs share ALL fingerprints
    fps = dd.winnow_fingerprints(rd.from_arrow(t)).to_pandas()
    n0 = (fps["doc_id"] == 0).sum()
    assert int(m["n_shared"].iloc[0]) == n0


def test_winnow_short_docs(ray_session):
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["one two three",        # < kgram tokens
                          "one two three four",   # exactly 1 k-gram
                          ""], pa.string()),
    })
    fps = dd.winnow_fingerprints(rd.from_arrow(t)).to_pandas()
    assert (fps["doc_id"] == 0).sum() == 0
    assert (fps["doc_id"] == 1).sum() == 1
    assert (fps["doc_id"] == 2).sum() == 0


def test_bm25_topk_serial_oracle(docs):
    """BM25 (Robertson idf, k1/b saturation) == a serial recompute;
    output invariant to batching (pass-1 partials are per-doc exact,
    pass-2 per-batch top-k prunes below the global k only)."""
    import collections
    import math
    import re

    import pandas as pd

    q = ["fox", "graph", "tables"]
    k1, b = 1.2, 0.75
    out = tx.bm25_topk(docs, q, k=3, k1=k1, b=b).to_pandas()

    texts = docs.to_pandas().set_index("doc_id")["text"]
    tf = {d: collections.Counter(re.findall(r"[a-z0-9]+", t.lower()))
          for d, t in texts.items()}
    n = len(texts)
    dl = {d: sum(c.values()) for d, c in tf.items()}
    avgdl = sum(dl.values()) / n
    rows = []
    for d, c in tf.items():
        s = 0.0
        for w in q:
            dfw = sum(1 for cc in tf.values() if w in cc)
            f = c.get(w, 0)
            s += (math.log(1 + (n - dfw + 0.5) / (dfw + 0.5))
                  * f * (k1 + 1) / (f + k1 * (1 - b + b * dl[d] / avgdl)))
        s = round(s, 6)
        if s > 0:
            rows.append((d, s))
    rows.sort(key=lambda r: (-r[1], r[0]))
    exp = pd.DataFrame(rows[:3], columns=["doc_id", "score"])
    assert list(out.doc_id) == list(exp.doc_id)
    assert np.allclose(out.score, exp.score, atol=1e-9)

    out2 = tx.bm25_topk(docs.repartition(3), q, k=3,
                        k1=k1, b=b).to_pandas()
    assert out.equals(out2)


def test_exact_substr_spans_planted():
    """Planted shared runs produce exactly the expected maximal
    spans; merging joins overlapping grams; intra-doc repetition
    also counts (corpus occurrences >= 2, Lee et al. semantics)."""
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    base = [
        # docs 0 and 1 share a 10-token run at different offsets
        shared + " one two three four five six seven eight",
        "x1 x2 x3 " + shared + " y1 y2 y3 y4 y5",
        # doc 2: an 8-token phrase repeated twice WITHIN the doc
        "p1 p2 p3 p4 p5 p6 p7 p8 mid1 mid2 mid3 mid4 mid5 mid6 mid7 "
        "mid8 mid9 p1 p2 p3 p4 p5 p6 p7 p8",
        # doc 3: no duplicated 4-grams with anything
        "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 q11 q12",
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(base)), pa.int64()),
        "text": pa.array(base, pa.string()),
    }))
    out = dd.exact_substr_spans(ds, n=4).to_pandas() \
        .sort_values(["doc_id", "span_start"]).reset_index(drop=True)
    got = list(out.itertuples(index=False, name=None))
    # docs 0/1: the shared 10-token run -> 4-grams at positions
    # 0..6 (doc 0) / 3..9 (doc 1), each merging into ONE span
    # covering the run
    assert (0, 0, 10) in got
    assert (1, 3, 13) in got
    # doc 2: both copies of the repeated 8-token phrase flagged
    assert (2, 0, 8) in got and (2, 17, 25) in got
    assert not any(d == 3 for d, _, _ in got)

    out2 = dd.exact_substr_spans(ds.repartition(4), n=4).to_pandas() \
        .sort_values(["doc_id", "span_start"]).reset_index(drop=True)
    assert out.equals(out2)


def test_exact_substr_rewrite_planted():
    """The apply step cuts exactly the covered tokens and pins the
    surviving text by md5; a fully-duplicated doc hashes to md5('')."""
    import hashlib

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    base = [
        shared + " tail1 tail2 tail3",        # span tokens 0..8
        "head1 head2 " + shared,              # span tokens 2..10
        shared,                               # doc fully covered
        "u1 u2 u3 u4 u5 u6 u7 u8 u9",         # untouched
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(base)), pa.int64()),
        "text": pa.array(base, pa.string()),
    }))
    out = dd.exact_substr_rewrite(ds, n=8).to_pandas() \
        .set_index("doc_id").sort_index()
    assert list(out["n_tokens"]) == [11, 10, 8, 9]
    assert list(out["n_cut"]) == [8, 8, 8, 0]
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert out.loc[0, "clean_md5"] == md5("tail1 tail2 tail3")
    assert out.loc[1, "clean_md5"] == md5("head1 head2")
    assert out.loc[2, "clean_md5"] == md5("")
    assert out.loc[3, "clean_md5"] == md5(base[3])

    out2 = dd.exact_substr_rewrite(ds.repartition(4), n=8) \
        .to_pandas().set_index("doc_id").sort_index()
    assert out.equals(out2)


def test_cdc_chunks_edit_stability():
    """CDC's point: inserting tokens near the front only re-chunks
    the edited neighbourhood — chunks after the first boundary past
    the edit keep identical hashes (a fixed-size segmenter would
    shift every boundary). Also: chunks partition the token stream."""
    import hashlib
    import re

    rng_words = [f"w{i}" for i in range(200)]
    base = " ".join(rng_words)
    edited = "zzz qqq " + base
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array([base, edited], pa.string()),
    }))
    out = tx.cdc_chunks(ds, mod=8).to_pandas()
    a = out[out.doc_id == 0].sort_values("chunk_idx")
    b = out[out.doc_id == 1].sort_values("chunk_idx")
    # partition property: chunk sizes sum to the token count
    assert a.n_tokens.sum() == 200
    assert b.n_tokens.sum() == 202
    # md5 integrity: first chunk of doc 0 hashes its first tokens
    k0 = int(a.iloc[0].n_tokens)
    assert a.iloc[0].chunk_md5 == hashlib.md5(
        " ".join(rng_words[:k0]).encode()).hexdigest()
    # edit stability: the tail chunk hash sets agree past the edit
    shared = set(a.chunk_md5) & set(b.chunk_md5)
    assert len(shared) >= len(a) - 2  # only the head chunk differs

    out2 = tx.cdc_chunks(ds.repartition(2), mod=8).to_pandas()
    assert out.sort_values(["doc_id", "chunk_idx"]) \
        .reset_index(drop=True) \
        .equals(out2.sort_values(["doc_id", "chunk_idx"])
                .reset_index(drop=True))


def test_phrase_and_snippet_planted():
    """Phrase hits at exact positions (including overlapping /
    repeated); snippet picks the densest query window, ties to the
    smallest start."""
    import leidenalg_ray.pipelines.queries as Q
    from leidenalg_ray.pipelines.queries import BM25_TERMS, PHRASE

    phrase = " ".join(PHRASE)
    import tempfile, os
    import pyarrow.parquet as pq
    d = tempfile.mkdtemp()
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array([
            f"x {phrase} y {phrase} z",
            " ".join(sorted(BM25_TERMS)) + " filler filler",
        ], pa.string()),
        "lang": pa.array(["en", "en"]),
        "source": pa.array(["s", "s"]),
        "n_chars": pa.array([1, 1], pa.int64()),
    }), os.path.join(d, "documents.parquet"))
    hits = Q.QUERIES["phrase_search"](d).to_pandas() \
        .sort_values(["doc_id", "pos"]).reset_index(drop=True)
    assert list(hits.doc_id) == [0, 0]
    assert list(hits.pos) == [1, 5]
    snip = Q.QUERIES["snippet_windows"](d).to_pandas() \
        .set_index("doc_id")
    # doc 1: all 5 query terms in the first 5 tokens -> window at 0
    assert snip.loc[1, "win_start"] == 0
    assert snip.loc[1, "hits"] == len(BM25_TERMS)
