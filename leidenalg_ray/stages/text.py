"""Text-analysis operators over the documents table (token counting,
quality scoring, language id, fingerprinting) — the training-data-
pipeline layer the engine adds beyond the reference (task brief).

Every operator is a vectorised ``map_batches`` stage; tokenisation is
an explicit ASCII ``[A-Za-z0-9_]+`` regex so the DuckDB oracle
(``regexp_extract_all(text, '[A-Za-z0-9_]+')``) reproduces it exactly.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

from leidenalg_ray.util import round6
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = re.compile(r"[A-Za-z0-9_]+")

STOPWORDS = ("the", "and", "of", "a", "to", "is", "in", "it", "that",
             "for")

# tiny marker-word language id (deterministic, SQL-expressible);
# ties resolve en > de > fr
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "is", "value", "table", "row"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr": ("le", "la", "les", "et", "est", "pas", "une", "des"),
}


class TokenStats:
    """Actor-pool stage: doc_id, text -> token/char/stopword counts."""

    def __init__(self):
        self.token_re = TOKEN_RE
        self.stop = set(STOPWORDS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n_tok = np.empty(len(texts), dtype=np.int64)
        n_stop = np.empty(len(texts), dtype=np.int64)
        n_char = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = self.token_re.findall(t.lower())
            n_tok[i] = len(toks)
            n_stop[i] = sum(1 for w in toks if w in self.stop)
            n_char[i] = len(t)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tok),
            "n_stopwords": pa.array(n_stop),
            "n_chars": pa.array(n_char),
        })


def token_counts(docs_ds, concurrency=4):
    return docs_ds.map_batches(TokenStats, batch_format="pyarrow",
                               batch_size=2048, zero_copy_batch=True,
                               concurrency=(1, concurrency))


class QualityScore:
    """Length / punctuation / stopword-ratio quality heuristics.
    Ratios are rounded to 6 decimals (both here and in the SQL oracle)
    so the value-hash comparison is byte-stable."""

    def __init__(self):
        self.token_re = TOKEN_RE
        self.stop = set(STOPWORDS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        k = len(texts)
        n_tok = np.empty(k, dtype=np.int64)
        stop_ratio = np.empty(k)
        alpha_ratio = np.empty(k)
        for i, t in enumerate(texts):
            toks = self.token_re.findall(t.lower())
            n_tok[i] = len(toks)
            nt = max(1, len(toks))
            stop_ratio[i] = sum(1 for w in toks if w in self.stop) / nt
            nc = max(1, len(t))
            # ASCII-explicit so the SQL oracle's [A-Za-z0-9_ ] matches
            alpha_ratio[i] = sum(
                1 for ch in t
                if ch == " " or ch == "_" or "a" <= ch <= "z"
                or "A" <= ch <= "Z" or "0" <= ch <= "9") / nc
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tok),
            "stop_ratio": pa.array(round6(stop_ratio)),
            "alnum_ratio": pa.array(round6(alpha_ratio)),
        })


def quality_scores(docs_ds, concurrency=4):
    return docs_ds.map_batches(QualityScore, batch_format="pyarrow",
                               batch_size=2048, zero_copy_batch=True,
                               concurrency=(1, concurrency))


class LangId:
    """Marker-word language id; hit counts per language, argmax with
    deterministic tie order en > de > fr."""

    def __init__(self):
        self.token_re = TOKEN_RE
        self.markers = {k: set(v) for k, v in LANG_MARKERS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        pred = []
        for t in texts:
            toks = self.token_re.findall(t.lower())
            scores = {lang: sum(1 for w in toks if w in mk)
                      for lang, mk in self.markers.items()}
            best = max(("en", "de", "fr"), key=lambda l: (scores[l],))
            # max() keeps the FIRST maximal element in that order
            pred.append(best)
        return pa.table({
            "doc_id": batch["doc_id"],
            "pred_lang": pa.array(pred, pa.string()),
        })


def lang_id(docs_ds, concurrency=4):
    return docs_ds.map_batches(LangId, batch_format="pyarrow",
                               batch_size=2048, zero_copy_batch=True,
                               concurrency=(1, concurrency))


def md5_fingerprints(docs_ds):
    """Content fingerprint: md5 of the raw text (SQL: ``md5(text)``)."""
    def fp(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        return pa.table({
            "doc_id": batch["doc_id"],
            "fingerprint": pa.array(
                [hashlib.md5(t.encode("utf-8")).hexdigest()
                 for t in texts], pa.string()),
        })
    return docs_ds.map_batches(fp, batch_format="pyarrow",
                               zero_copy_batch=True)


def rolling_fingerprint(docs_ds, window=8, base=257,
                        mod=(1 << 61) - 1):
    """Document fingerprint via a rolling polynomial hash over the token
    stream: the minimum window-hash (a winnowing-style signature).
    SQL oracle: per-window polynomial sums over md5-derived token
    hashes in HUGEINT, min per document (``SQL_FINGERPRINT_ROLLING``)."""
    def fp(batch: pa.Table) -> pa.Table:
        out = np.empty(batch.num_rows, dtype=np.uint64)
        for i, t in enumerate(batch["text"].to_pylist()):
            toks = TOKEN_RE.findall(t.lower())
            hs = hash_tokens(toks)
            if len(hs) < window:
                h = np.uint64(0)
                for x in hs:
                    h = (h * np.uint64(base) + x) % np.uint64(mod)
                out[i] = h
                continue
            # rolling window hashes
            poww = pow(base, window - 1, mod)
            h = 0
            best = None
            for j, x in enumerate(hs):
                if j >= window:
                    h = (h - int(hs[j - window]) * poww) % mod
                h = (h * base + int(x)) % mod
                if j >= window - 1:
                    best = h if best is None else min(best, h)
            out[i] = best
        return pa.table({"doc_id": batch["doc_id"],
                         "fingerprint": pa.array(out, pa.uint64())})
    return docs_ds.map_batches(fp, batch_format="pyarrow",
                               zero_copy_batch=True)


def hash_token(w: str) -> int:
    """Stable 64-bit token hash: first 8 bytes of md5, big-endian —
    exactly ``('0x' || substr(md5(w), 1, 16))::UBIGINT`` in DuckDB, so
    every hash-derived operator (MinHash shingles, SimHash bits,
    rolling fingerprints) has an exact SQL oracle."""
    return int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")


def hash_tokens(words) -> np.ndarray:
    """``hash_token`` over a sequence, md5-hashing each DISTINCT
    string once (``np.unique`` + scatter-back). Natural-language
    batches repeat most tokens/shingles heavily, so this removes the
    md5-per-occurrence CPU floor of the dedup stages while producing
    bit-identical hashes (same md5, same SQL oracle)."""
    if len(words) == 0:
        return np.empty(0, np.uint64)
    uniq, inv = np.unique(np.asarray(words, dtype=object),
                          return_inverse=True)
    hs = np.fromiter(
        (int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
         for w in uniq), dtype=np.uint64, count=len(uniq))
    return hs[inv]


def vocab_top_terms(docs_ds, k=50):
    """Corpus vocabulary: token -> total frequency, top-k by
    (count desc, term asc). Tokens are ``[a-z0-9]+`` runs of the
    lowercased text, split with pyarrow's RE2 kernel — identical
    semantics to DuckDB ``regexp_split_to_array(lower(text),
    '[^a-z0-9]+')``, so the whole pipeline has an exact SQL oracle.
    Per-batch ``value_counts`` partials mean the vocabulary, not the
    token stream, is what shuffles into the final groupby."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]),
                                      "[^a-z0-9]+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = pc.value_counts(flat)
        return pa.table({"term": vc.field("values"),
                         "n": vc.field("counts")})

    pre = docs_ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    agg = pre.groupby("term").aggregate(Sum("n", alias_name="n"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"term": pc.cast(t["term"], pa.string()),
                         "n": pc.cast(t["n"], pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow") \
              .sort(["n", "term"], descending=[True, False]).limit(k)


def _doc_term_tf(t: pa.Table) -> pa.Table:
    """Vectorised per-doc term frequencies for one batch: RE2 split
    (same semantics as DuckDB ``regexp_split_to_array(lower(text),
    '[^a-z0-9]+')``), then one Arrow group_by over (doc, term) —
    exact because each row holds a complete document."""
    import pyarrow.compute as pc
    toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]),
                                  "[^a-z0-9]+")
    flat = pc.list_flatten(toks)
    par = pc.list_parent_indices(toks)
    ids = pc.take(t["doc_id"], par)
    keep = pc.not_equal(flat, "")
    pairs = pa.table({"doc_id": pc.filter(ids, keep),
                      "term": pc.filter(flat, keep)})
    tf = pairs.group_by(["doc_id", "term"]).aggregate([([], "count_all")])
    return tf.rename_columns(["doc_id", "term", "tf"])


def doc_frequencies(docs_ds):
    """Document frequency per term: per-batch distinct-terms-per-doc
    partials (the vocabulary, not the token stream, shuffles) -> one
    vocab-sized groupby. Output: (term, df)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        tf = _doc_term_tf(t)
        d = tf.group_by("term").aggregate([([], "count_all")])
        return d.rename_columns(["term", "df"])

    return docs_ds.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True) \
        .groupby("term").aggregate(Sum("df", alias_name="df"))


def tfidf_topk(docs_ds, k=5, concurrency=4):
    """Top-k terms per document by tf-idf (tf * ln(N/df)), ties broken
    term-ascending — fully deterministic and SQL-oracle-able.

    Shape: ONE vocab-sized shuffle (the df groupby, fed by per-batch
    partials) + a broadcast of the (term, df) table; scoring and the
    per-doc top-k then run embarrassingly parallel because a document
    is complete within its row — no second shuffle. When the
    vocabulary exceeds worker memory, swap the broadcast for a
    term-key hash join (groupby(term).map_groups) followed by a
    doc_id-key top-k shuffle — same semantics, two exchanges.
    """
    import ray
    import pyarrow.compute as pc

    n_docs = docs_ds.count()
    df_pd = doc_frequencies(docs_ds).to_pandas()
    terms = df_pd["term"].to_numpy(dtype=object).astype(str)
    order = np.argsort(terms)
    terms_sorted = terms[order]
    df_sorted = df_pd["df"].to_numpy(np.float64)[order]
    ref = ray.put((terms_sorted, df_sorted))

    def score(t: pa.Table) -> pa.Table:
        ts, dfs = ray.get(ref)
        tf = _doc_term_tf(t)
        d = tf["doc_id"].to_numpy(zero_copy_only=False)
        term = tf["term"].to_numpy(zero_copy_only=False).astype(str)
        f = tf["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        pos = np.searchsorted(ts, term)
        tfidf = f * np.log(np.float64(n_docs) / dfs[pos])
        o = np.lexsort((term, -tfidf, d))
        d, term, tfidf = d[o], term[o], tfidf[o]
        # rank within each doc run
        starts = np.flatnonzero(np.concatenate(([True], d[1:] != d[:-1])))
        rank = np.arange(len(d)) - np.repeat(starts, np.diff(
            np.concatenate((starts, [len(d)]))))
        m = rank < k
        return pa.table({"doc_id": pa.array(d[m].astype(np.int64)),
                         "term": pa.array(term[m], pa.string()),
                         "tfidf": pa.array(round6(tfidf[m]))})

    return docs_ds.map_batches(score, batch_format="pyarrow",
                               zero_copy_batch=True)


def bigram_top_terms(docs_ds, k=20):
    """Adjacent-token collocations: top-k (a, b) bigram pairs by
    (count desc, a, b). Same tokenizer as ``vocab_top_terms``
    (lowercase, ``[a-z0-9]+`` runs); pairs never cross a document
    boundary. Fully vectorised: flatten + parent indices, shift-by-one
    pairing, per-batch pair counts so only the (bounded) bigram
    vocabulary shuffles."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]),
                                      "[^a-z0-9]+")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False)
        keep = flat != ""
        f, p = flat[keep], par[keep]
        if len(f) < 2:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        same = p[:-1] == p[1:]
        tt = pa.table({"a": pa.array(f[:-1][same]),
                       "b": pa.array(f[1:][same])})
        return tt.group_by(["a", "b"]).aggregate([([], "count_all")]) \
            .rename_columns(["a", "b", "n"])

    pre = docs_ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    agg = pre.groupby(["a", "b"]).aggregate(Sum("n", alias_name="n"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"a": pc.cast(t["a"], pa.string()),
                         "b": pc.cast(t["b"], pa.string()),
                         "n": pc.cast(t["n"], pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow") \
              .sort(["n", "a", "b"], descending=[True, False, False]) \
              .limit(k)


class RepetitionStats:
    """Word-trigram repetition per document: total trigrams, distinct
    trigrams, and ``rep_ratio = 1 - distinct/total`` — the standard
    boilerplate/loop-spam quality signal for training-data curation.
    Docs with fewer than 3 tokens emit no row (mirrors the SQL oracle,
    whose trigram CTE has no rows for them)."""

    def __init__(self):
        self.token_re = TOKEN_RE

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        out_id, out_n, out_u = [], [], []
        for d, t in zip(ids, texts):
            toks = self.token_re.findall(t.lower())
            if len(toks) < 3:
                continue
            tris = set()
            n = len(toks) - 2
            for i in range(n):
                tris.add(" ".join(toks[i:i + 3]))
            out_id.append(d)
            out_n.append(n)
            out_u.append(len(tris))
        n_arr = np.asarray(out_n, dtype=np.float64)
        u_arr = np.asarray(out_u, dtype=np.float64)
        ratio = round6(1.0 - u_arr / n_arr) if len(out_n) else \
            np.empty(0, dtype=np.float64)
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "n_tri": pa.array(out_n, pa.int64()),
            "n_uniq": pa.array(out_u, pa.int64()),
            "rep_ratio": pa.array(ratio, pa.float64()),
        })


def repetition_stats(docs_ds, concurrency=4):
    return docs_ds.map_batches(RepetitionStats, batch_format="pyarrow",
                               batch_size=2048, zero_copy_batch=True,
                               concurrency=(1, concurrency))


class EntropyStats:
    """Word-unigram Shannon entropy per document (base-2), the
    perplexity-proxy quality score: low-entropy docs are repetitive /
    templated. Empty docs emit no row (no tokens -> no distribution)."""

    def __init__(self):
        self.token_re = TOKEN_RE

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        out_id, out_n, out_h = [], [], []
        for d, t in zip(ids, texts):
            toks = self.token_re.findall(t.lower())
            if not toks:
                continue
            _, counts = np.unique(np.asarray(toks), return_counts=True)
            p = counts / counts.sum()
            out_id.append(d)
            out_n.append(len(toks))
            out_h.append(float(-(p * np.log2(p)).sum()))
        h = round6(np.asarray(out_h, dtype=np.float64)) if out_h else \
            np.empty(0, dtype=np.float64)
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "n_tokens": pa.array(out_n, pa.int64()),
            "entropy": pa.array(h, pa.float64()),
        })


def entropy_stats(docs_ds, concurrency=4):
    return docs_ds.map_batches(EntropyStats, batch_format="pyarrow",
                               batch_size=2048, zero_copy_batch=True,
                               concurrency=(1, concurrency))


# ----------------------------------------------------------------------
# Benchmark-contamination check: fraction of each training document's
# word n-grams that appear in a designated (small) eval set. The eval
# side is the classic broadcast small side: its distinct grams are
# collected once (tiny — eval sets are a sliver of the corpus),
# ``ray.put`` once, and probed per batch; the training corpus streams.
# ----------------------------------------------------------------------
CONTAM_N = 5
CONTAM_MOD = 19  # doc_id % CONTAM_MOD == 0 -> eval-set member


def _word_ngrams(toks, n):
    return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]


def eval_gram_set(docs_ds, n=CONTAM_N, mod=CONTAM_MOD):
    """Distinct word n-grams of the eval slice (doc_id % mod == 0).
    Returns a frozenset; the caller broadcasts it with ``ray.put``."""
    token_re = TOKEN_RE

    def grams(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        keep = (ids % mod) == 0
        out = set()
        for txt in np.asarray(t["text"].to_pylist(), dtype=object)[keep]:
            out.update(_word_ngrams(token_re.findall(txt.lower()), n))
        return pa.table({"g": pa.array(sorted(out), pa.string())})

    acc = set()
    for b in docs_ds.map_batches(
            grams, batch_format="pyarrow",
            zero_copy_batch=True).iter_batches(batch_format="pyarrow"):
        acc.update(b["g"].to_pylist())
    return frozenset(acc)


class ContaminationCheck:
    """Actor-pool stage: per training doc (doc_id % mod != 0), the
    count and fraction of its word n-grams found in the eval-gram set
    (every occurrence counts, not just distinct grams — matches the
    oracle's LEFT JOIN). Docs with < n tokens emit no row."""

    def __init__(self, eval_grams_ref, n=CONTAM_N, mod=CONTAM_MOD):
        import ray
        self.eval = (ray.get(eval_grams_ref)
                     if isinstance(eval_grams_ref, ray.ObjectRef)
                     else eval_grams_ref)
        self.n = n
        self.mod = mod
        self.token_re = TOKEN_RE

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        out_id, out_n, out_hit = [], [], []
        for d, t in zip(ids, texts):
            if d % self.mod == 0:
                continue
            gs = _word_ngrams(self.token_re.findall(t.lower()), self.n)
            if not gs:
                continue
            out_id.append(d)
            out_n.append(len(gs))
            out_hit.append(sum(1 for g in gs if g in self.eval))
        frac = (round6(np.asarray(out_hit, dtype=np.float64)
                       / np.asarray(out_n, dtype=np.float64))
                if out_n else np.empty(0, dtype=np.float64))
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "n_grams": pa.array(out_n, pa.int64()),
            "n_hit": pa.array(out_hit, pa.int64()),
            "contamination": pa.array(frac, pa.float64()),
        })


def contamination_check(docs_ds, concurrency=4):
    import ray
    ref = ray.put(eval_gram_set(docs_ds))
    return docs_ds.map_batches(
        ContaminationCheck, batch_format="pyarrow", batch_size=2048,
        zero_copy_batch=True, concurrency=(1, concurrency),
        fn_constructor_kwargs={"eval_grams_ref": ref})


class ContaminationCheckBloom(ContaminationCheck):
    """``ContaminationCheck`` with a Bloom prefilter in front of the
    exact set: each doc's grams first pass the fixed-size filter
    (vectorised bit probes); only Bloom-positive grams touch the
    exact membership structure. No false negatives + exact verify =>
    output BIT-IDENTICAL to the unfiltered stage — which is exactly
    what the driver gate checks. At 100 TB the exact side becomes a
    partitioned/disk-backed index probed only ~fp-rate of the time;
    the broadcast filter stays a few MB however large the eval set."""

    def __init__(self, eval_grams_ref, bloom_ref, n=CONTAM_N,
                 mod=CONTAM_MOD):
        import ray
        super().__init__(eval_grams_ref, n=n, mod=mod)
        self.words = (ray.get(bloom_ref)
                      if isinstance(bloom_ref, ray.ObjectRef)
                      else bloom_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .sketch import bloom_probe_mask
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        out_id, out_n, out_hit = [], [], []
        for d, t in zip(ids, texts):
            if d % self.mod == 0:
                continue
            gs = _word_ngrams(self.token_re.findall(t.lower()), self.n)
            if not gs:
                continue
            cand = bloom_probe_mask(gs, self.words)
            out_id.append(d)
            out_n.append(len(gs))
            out_hit.append(sum(1 for g, ok in zip(gs, cand)
                               if ok and g in self.eval))
        frac = (round6(np.asarray(out_hit, dtype=np.float64)
                       / np.asarray(out_n, dtype=np.float64))
                if out_n else np.empty(0, dtype=np.float64))
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "n_grams": pa.array(out_n, pa.int64()),
            "n_hit": pa.array(out_hit, pa.int64()),
            "contamination": pa.array(frac, pa.float64()),
        })


def contamination_check_bloom(docs_ds, concurrency=4,
                              m_bits=1 << 18):
    import ray

    from .sketch import bloom_from_values
    ev = eval_gram_set(docs_ds)
    ref = ray.put(ev)
    bref = ray.put(bloom_from_values(ev, m_bits))
    return docs_ds.map_batches(
        ContaminationCheckBloom, batch_format="pyarrow",
        batch_size=2048, zero_copy_batch=True,
        concurrency=(1, concurrency),
        fn_constructor_kwargs={"eval_grams_ref": ref,
                               "bloom_ref": bref})


# ----------------------------------------------------------------------
# PII scrubbing (email / phone masking)
# ----------------------------------------------------------------------
# Both pyarrow and DuckDB use RE2, so the SQL oracle runs the SAME
# pattern strings verbatim — identical match semantics by construction.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+[0-9]{7,15}"


def pii_scrub(docs_ds):
    """Mask emails then phones (in that order — email local parts
    contain digits, so phones are counted on the email-scrubbed
    text); emit per-doc match counts and the md5 of the clean text.
    Pure vectorised RE2 kernels, no shuffle, no state."""
    import hashlib as _h

    def scrub(t: pa.Table) -> pa.Table:
        x = t["text"]
        n_email = pc.count_substring_regex(x, PII_EMAIL_RE)
        x = pc.replace_substring_regex(x, PII_EMAIL_RE, "[EMAIL]")
        n_phone = pc.count_substring_regex(x, PII_PHONE_RE)
        x = pc.replace_substring_regex(x, PII_PHONE_RE, "[PHONE]")
        return pa.table({
            "doc_id": t["doc_id"],
            "n_emails": pc.cast(n_email, pa.int64()),
            "n_phones": pc.cast(n_phone, pa.int64()),
            "clean_md5": pa.array(
                [_h.md5(s.encode("utf-8")).hexdigest()
                 for s in x.to_pylist()], pa.string()),
        })

    return docs_ds.map_batches(scrub, batch_format="pyarrow",
                               zero_copy_batch=True)


# ----------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, appendix A1.1)
# ----------------------------------------------------------------------
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_LEN = 3.0
GOPHER_MAX_MEAN_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_RATIO = 0.9
GOPHER_MAX_ELLIPSIS_RATIO = 0.3
GOPHER_MIN_ALPHA_RATIO = 0.8
GOPHER_MIN_STOP_HITS = 2


class GopherRules:
    """Gopher document-quality gate (Rae et al. 2021 §A1.1): word
    count bounds, mean word length bounds, symbol-to-word ratio
    ('#' + non-overlapping '...'), bullet-start / ellipsis-end line
    fractions, alphabetic-word fraction, and >=2 distinct stop words.
    Emits every signal plus the composite ``keep`` flag; ratios are
    rounded to 6 decimals on both engines. Words use the repo token
    convention (lowered text split on ``[^a-z0-9]+``) so the SQL
    oracle shares the tokenizer with every other text operator."""

    def __init__(self):
        self.token_re = TOKEN_RE
        self.stop = set(GOPHER_STOPS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        k = len(texts)
        n_words = np.zeros(k, dtype=np.int64)
        mean_len = np.zeros(k)
        sym_ratio = np.zeros(k)
        bullet_ratio = np.zeros(k)
        ellipsis_ratio = np.zeros(k)
        alpha_ratio = np.zeros(k)
        stop_hits = np.zeros(k, dtype=np.int64)
        for i, t in enumerate(texts):
            toks = self.token_re.findall(t.lower())
            nw = len(toks)
            n_words[i] = nw
            if nw:
                mean_len[i] = sum(len(w) for w in toks) / nw
                sym_ratio[i] = (t.count("#") + t.count("...")) / nw
                alpha_ratio[i] = sum(
                    1 for w in toks
                    if any("a" <= ch <= "z" for ch in w)) / nw
                stop_hits[i] = len(self.stop.intersection(toks))
            lines = t.split("\n")
            nl = len(lines)
            bullet_ratio[i] = sum(
                1 for ln in lines
                if ln.lstrip(" ").startswith(("-", "*"))) / nl
            ellipsis_ratio[i] = sum(
                1 for ln in lines
                if ln.rstrip(" ").endswith("...")) / nl
        keep = ((n_words >= GOPHER_MIN_WORDS)
                & (n_words <= GOPHER_MAX_WORDS)
                & (mean_len >= GOPHER_MIN_MEAN_LEN)
                & (mean_len <= GOPHER_MAX_MEAN_LEN)
                & (sym_ratio <= GOPHER_MAX_SYMBOL_RATIO)
                & (bullet_ratio <= GOPHER_MAX_BULLET_RATIO)
                & (ellipsis_ratio <= GOPHER_MAX_ELLIPSIS_RATIO)
                & (alpha_ratio >= GOPHER_MIN_ALPHA_RATIO)
                & (stop_hits >= GOPHER_MIN_STOP_HITS))
        from ..util import round6
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_words": pa.array(n_words),
            "mean_word_len": pa.array(round6(mean_len)),
            "symbol_ratio": pa.array(round6(sym_ratio)),
            "bullet_ratio": pa.array(round6(bullet_ratio)),
            "ellipsis_ratio": pa.array(round6(ellipsis_ratio)),
            "alpha_word_ratio": pa.array(round6(alpha_ratio)),
            "stop_hits": pa.array(stop_hits),
            "keep": pa.array(keep.astype(np.int64)),
        })


def gopher_rules(docs_ds, concurrency=4):
    return docs_ds.map_batches(GopherRules, batch_format="pyarrow",
                               batch_size=2048, zero_copy_batch=True,
                               concurrency=(1, concurrency))


def bm25_topk(docs_ds, query_terms, k=10, k1=1.2, b=0.75):
    """BM25 retrieval: score every document against a fixed bag of
    query terms, return the global top-k (rounded score desc, doc_id
    asc). Robertson idf = ln(1 + (N - df + 0.5) / (df + 0.5)), the
    Lucene form (non-negative for every df); tf saturation
    tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) with dl = the doc's
    non-empty token count under the shared tokenizer
    (``regexp_split_to_array(lower(text), '[^a-z0-9]+')``), so the
    whole score has an exact DuckDB twin.

    Shape (100-TB-safe): pass 1 is a streaming global reduction — one
    O(1)-row partial per batch carrying (n_docs, dl_sum, df per query
    term), combined by ``Dataset.sum`` with no shuffle and O(|q|)
    driver state. Pass 2 is embarrassingly parallel scoring (the
    query-term stats ride in the closure, |q| floats) emitting a
    per-batch partial top-k, so the final exchange sorts only
    k x n_batches rows. Ranking uses the ROUNDED score so the SQL
    twin's ORDER BY round(score, 6) can never diverge on a last-ulp
    libm difference.
    """
    q = sorted(set(query_terms))
    m = len(q)
    dfc = [f"df_{i}" for i in range(m)]

    def partial_stats(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]),
                                      "[^a-z0-9]+")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False)
        keep = flat != ""
        flat, par = flat[keep], par[keep]
        n = t.num_rows
        cols = {"n": pa.array([np.int64(n)]),
                "dl_sum": pa.array([np.int64(len(flat))])}
        pos = np.searchsorted(q, flat)
        hit = (pos < m) & (np.asarray(q, dtype=object)[
            np.minimum(pos, m - 1)] == flat)
        for i in range(m):
            # df = docs containing term i at least once
            docs_with = np.unique(par[hit & (pos == i)])
            cols[dfc[i]] = pa.array([np.int64(len(docs_with))])
        return pa.table(cols)

    stats = docs_ds.map_batches(partial_stats, batch_format="pyarrow",
                                zero_copy_batch=True) \
        .sum(["n", "dl_sum"] + dfc)
    n_docs = float(stats["sum(n)"])
    avgdl = float(stats["sum(dl_sum)"]) / max(n_docs, 1.0)
    df = np.array([float(stats[f"sum({c})"]) for c in dfc])
    idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))

    def score(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]),
                                      "[^a-z0-9]+")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False)
        keep = flat != ""
        flat, par = flat[keep], par[keep]
        n = t.num_rows
        dl = np.bincount(par, minlength=n).astype(np.float64)
        pos = np.searchsorted(q, flat)
        hit = (pos < m) & (np.asarray(q, dtype=object)[
            np.minimum(pos, m - 1)] == flat)
        tf = np.zeros((n, m))
        np.add.at(tf, (par[hit], pos[hit]), 1.0)
        denom = tf + k1 * (1.0 - b + b * (dl / avgdl))[:, None]
        sc = ((tf * (k1 + 1.0) / denom) * idf[None, :]).sum(axis=1)
        sc = round6(sc)
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        nz = sc > 0
        d, sc = d[nz], sc[nz]
        o = np.lexsort((d, -sc))[:k]
        return pa.table({"doc_id": pa.array(d[o].astype(np.int64)),
                         "score": pa.array(sc[o])})

    out = docs_ds.map_batches(score, batch_format="pyarrow",
                              zero_copy_batch=True)
    return out.sort(["score", "doc_id"],
                    descending=[True, False]).limit(k)


def cdc_chunks(docs_ds, mod=16):
    """Content-defined chunking (the FastCDC idea on the token
    stream): a chunk boundary falls AFTER token j+3 whenever the
    4-token gram hash (base-257 polynomial over md5 token hashes mod
    2^61-1 — the ``winnow_fingerprints`` family) is 0 mod ``mod``,
    so boundaries move with content, not offsets: an insertion only
    re-chunks its neighbourhood (the property that makes CDC dedup
    robust to edits, unlike fixed-size segmenting). Emits one row per
    chunk: (doc_id, chunk_idx, n_tokens, chunk_md5) with chunk_md5 =
    md5 of the chunk's tokens joined by spaces — feed it to any
    hash-keyed dedup stage. Embarrassingly parallel (a doc is
    complete within its row); expected chunk length = ``mod``
    tokens."""
    P3, P2, P1 = 257 ** 3, 257 ** 2, 257
    M61 = (1 << 61) - 1

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        all_toks, spans = [], []
        for t in texts:
            toks = TOKEN_RE.findall(t.lower())
            spans.append((len(all_toks), len(all_toks) + len(toks)))
            all_toks.extend(toks)
        hv = hash_tokens(all_toks)
        out_d, out_c, out_n, out_h = [], [], [], []
        for i, (lo, hi) in enumerate(spans):
            nt = hi - lo
            if nt == 0:
                continue
            toks = all_toks[lo:hi]
            if nt >= 4:
                h = hv[lo:hi].astype(object)
                g = ((h[:-3] * P3 + h[1:-2] * P2 + h[2:-1] * P1
                      + h[3:]) % M61).astype(np.int64)
                cuts = np.flatnonzero(g % mod == 0) + 4
                cuts = cuts[cuts < nt]
            else:
                cuts = np.empty(0, np.int64)
            prev = 0
            for ci, end in enumerate(list(cuts) + [nt]):
                part = toks[prev:end]
                out_d.append(int(ids[i]))
                out_c.append(ci)
                out_n.append(len(part))
                out_h.append(hashlib.md5(
                    " ".join(part).encode("utf-8")).hexdigest())
                prev = end
        return pa.table({
            "doc_id": pa.array(out_d, pa.int64()),
            "chunk_idx": pa.array(out_c, pa.int64()),
            "n_tokens": pa.array(out_n, pa.int64()),
            "chunk_md5": pa.array(out_h, pa.string()),
        })

    return docs_ds.map_batches(fn, batch_format="pyarrow",
                               zero_copy_batch=True)


# ----------------------------------------------------------------------
# Multinomial Naive-Bayes text classifier (fastText-style curation
# filter; the gate-verified twin is pipelines.queries.q_nb_lang_classify)
# ----------------------------------------------------------------------
def nb_train(docs_ds, label_col="lang", mask_fn=None):
    """One-pass multinomial-NB training over a documents Dataset:
    Laplace-smoothed ``logp(w|c) = ln((n_wc + 1)/(tot_c + V))`` and
    priors ``ln(docs_c/docs)``, every ln quantised to 1e-9 fixed
    point so downstream scores are exact integer sums at any
    partitioning. ``mask_fn(batch) -> bool mask`` selects the
    training rows (default: all rows with a non-null label).

    Driver state is vocab x |classes|-bounded (per-batch partials,
    pandas fold — at 100 TB this fold becomes one bounded groupby).
    Returns ``(classes, vocab_sorted, M, prior_q)`` with M the
    (V+1) x C int64 log-prob matrix (row V = unseen token)."""
    import pyarrow.compute as pc

    def partials(t: pa.Table) -> pa.Table:
        if mask_fn is not None:
            m = mask_fn(t)
        else:
            m = pc.is_valid(t[label_col]).to_numpy(
                zero_copy_only=False)
        t = t.filter(pa.array(m))
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]),
                                      "[^a-z0-9]+")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False)
        keep = flat != ""
        f, p = flat[keep], par[keep]
        labels = np.asarray(t[label_col].to_pylist(), dtype=object)
        out_l, out_w, out_n = [], [], []
        if len(f):
            ul_, lcode = np.unique(labels[p].astype(str),
                                   return_inverse=True)
            uw_, wcode = np.unique(f, return_inverse=True)
            key = lcode.astype(np.int64) * len(uw_) + wcode
            uk, cn = np.unique(key, return_counts=True)
            out_l += list(ul_[uk // len(uw_)])
            out_w += list(uw_[uk % len(uw_)])
            out_n += [int(c) for c in cn]
        ul, uc = np.unique(labels.astype(str), return_counts=True)
        out_l += list(ul)
        out_w += [None] * len(ul)
        out_n += [int(c) for c in uc]
        return pa.table({"lang": pa.array(out_l, pa.string()),
                         "w": pa.array(out_w, pa.string()),
                         "n": pa.array(out_n, pa.int64())})

    parts = docs_ds.map_batches(partials, batch_format="pyarrow",
                                zero_copy_batch=True).to_pandas()
    import pandas as pd
    doc_c = parts[parts["w"].isna()].groupby("lang")["n"].sum()
    tok_c = parts[parts["w"].notna()].groupby(
        ["lang", "w"])["n"].sum().reset_index()
    classes = np.sort(doc_c.index.to_numpy().astype(object))
    C = len(classes)
    n_train = int(doc_c.sum())
    prior_q = np.array([int(np.floor(np.log(
        float(doc_c[c]) / n_train) * 1e9 + 0.5)) for c in classes],
        dtype=np.int64)
    vocab = np.sort(tok_c["w"].unique().astype(object))
    V = len(vocab)
    tot_c = tok_c.groupby("lang")["n"].sum()
    M = np.empty((V + 1, C), dtype=np.int64)
    for j, c in enumerate(classes):
        denom = float(int(tot_c.get(c, 0)) + V)
        nw = np.zeros(V, dtype=np.int64)
        sub = tok_c[tok_c["lang"] == c]
        nw[np.searchsorted(vocab,
                           sub["w"].to_numpy(dtype=object))] = \
            sub["n"].to_numpy(np.int64)
        M[:V, j] = np.floor(
            np.log((nw + 1.0) / denom) * 1e9 + 0.5).astype(np.int64)
        M[V, j] = int(np.floor(np.log(1.0 / denom) * 1e9 + 0.5))
    return classes, vocab, M, prior_q


def nb_score_batch(model, t: pa.Table) -> pa.Table:
    """Score one Arrow batch against an ``nb_train`` model: returns
    (doc_id, pred_lang, score_q) for every row with >=1 token.
    Integer class scores; argmax ties break to the smallest class."""
    import pyarrow.compute as pc

    classes, vocab, M, prior_q = model
    C, V = len(classes), len(vocab)
    toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]),
                                  "[^a-z0-9]+")
    flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
    par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    keep = flat != ""
    f, p = flat[keep], par[keep]
    idx = np.searchsorted(vocab, f)
    known = (idx < V)
    known[known] &= vocab[idx[known]] == f[known]
    widx = np.where(known, idx, V)
    S = np.zeros((len(t), C), dtype=np.int64)
    for j in range(C):
        np.add.at(S[:, j], p, M[widx, j])
    ntok = np.zeros(len(t), dtype=np.int64)
    np.add.at(ntok, p, 1)
    S += prior_q[None, :]
    nz = ntok > 0
    pred = np.argmax(S[nz], axis=1)
    return pa.table({
        "doc_id": pa.array(
            t["doc_id"].to_numpy(zero_copy_only=False)[nz],
            pa.int64()),
        "pred_lang": pa.array(classes[pred], pa.string()),
        "score_q": pa.array(S[nz, pred], pa.int64()),
    })


def nb_score(docs_ds, model):
    """Dataset stage: pure scoring map against the broadcast model."""
    def fn(t: pa.Table) -> pa.Table:
        return nb_score_batch(model, t)
    return docs_ds.map_batches(fn, batch_format="pyarrow",
                               zero_copy_batch=True)
