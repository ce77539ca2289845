"""Deduplication catalogue rows — see queries.py."""

from .qcore import *  # noqa: F401,F403
from .qcore import (  # noqa: F401
    _M61_SQL,
    _SQL_TOKEN_HASHES,
    _SQL_TOKHASH,
    _docs,
    _emb,
)
_T64 = "18446744073709551616::HUGEINT"   # 2^64: numpy uint64 wrap


SUBSTR_N = 8


def q_dedup_exact_substr(sf_dir):
    """ExactSubstr duplicated-span detection (Lee et al. 2022): token
    8-grams occurring >= 2 times anywhere in the corpus, merged into
    maximal per-document spans. Pass 1 ships per-batch (gram,
    min_doc, max_doc, cnt) partials into one gram groupby; the dup
    set (bounded by the corpus's duplication volume, not its size)
    broadcasts for the parallel scoring/merge pass. The SQL twin
    groups by the gram STRING where the engine groups by its 61-bit
    polynomial hash — equal up to a ~2^-61 collision the value
    comparison would catch."""
    return dd.exact_substr_spans(_docs(sf_dir), n=SUBSTR_N)


SQL_DEDUP_EXACT_SUBSTR = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     t -> t <> '') AS ts
  FROM documents),
grams AS (
  SELECT doc_id,
         unnest([{{'pos': j - 1,
                  'g': array_to_string(ts[j : j + {SUBSTR_N - 1}], ' ')}}
                 FOR j IN range(1, len(ts) - {SUBSTR_N - 2})],
                recursive := true)
  FROM toks),
dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
hits AS (SELECT doc_id, pos FROM grams
         WHERE g IN (SELECT g FROM dup)),
brk AS (SELECT doc_id, pos,
          CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
                                         ORDER BY pos) <= {SUBSTR_N}
               THEN 0 ELSE 1 END AS b
        FROM hits),
isl AS (SELECT doc_id, pos,
          sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS gid
        FROM brk)
SELECT doc_id, min(pos) AS span_start,
       max(pos) + {SUBSTR_N} AS span_end
FROM isl GROUP BY doc_id, gid
"""


def q_dedup_substr_rewrite(sf_dir):
    """ExactSubstr apply step: cut duplicated-8-gram-covered tokens
    per document; output (doc_id, n_tokens, n_cut, clean_md5) — the
    md5 pins the full rewritten text so the oracle checks the rewrite
    byte-for-byte without shipping the corpus."""
    return dd.exact_substr_rewrite(_docs(sf_dir), n=SUBSTR_N)


SQL_DEDUP_SUBSTR_REWRITE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     t -> t <> '') AS ts
  FROM documents),
grams AS (
  SELECT doc_id,
         unnest([{{'pos': j - 1,
                  'g': array_to_string(ts[j : j + {SUBSTR_N - 1}], ' ')}}
                 FOR j IN range(1, len(ts) - {SUBSTR_N - 2})],
                recursive := true)
  FROM toks),
dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
hits AS (SELECT doc_id, pos FROM grams
         WHERE g IN (SELECT g FROM dup)),
cov AS (SELECT DISTINCT doc_id, cp FROM (
          SELECT doc_id, unnest(range(pos, pos + {SUBSTR_N})) AS cp
          FROM hits)),
tokpos AS (
  SELECT doc_id,
         unnest([{{'p': j - 1, 'w': ts[j]}}
                 FOR j IN range(1, len(ts) + 1)],
                recursive := true)
  FROM toks),
kept AS (SELECT tp.doc_id, tp.p, tp.w
         FROM tokpos tp LEFT JOIN cov c
           ON c.doc_id = tp.doc_id AND c.cp = tp.p
         WHERE c.cp IS NULL),
agg AS (SELECT doc_id, md5(string_agg(w, ' ' ORDER BY p)) AS h
        FROM kept GROUP BY 1),
nc AS (SELECT doc_id, count(*) AS nc FROM cov GROUP BY 1)
SELECT t.doc_id, len(t.ts) AS n_tokens,
       coalesce(nc.nc, 0) AS n_cut,
       coalesce(agg.h, md5('')) AS clean_md5
FROM toks t
LEFT JOIN nc USING (doc_id)
LEFT JOIN agg USING (doc_id)
"""


def q_dedup_exact(sf_dir):
    out = dd.exact_dedup(_docs(sf_dir))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "text_hash": t["text_hash"],
            "rep_doc_id": pc.cast(t["rep_doc_id"], pa.int64()),
            "n_dups": pc.cast(t["n_dups"], pa.int64()),
        })
    return out.map_batches(finish, batch_format="pyarrow")


SQL_DEDUP_EXACT = """
SELECT md5(text) AS text_hash, min(doc_id) AS rep_doc_id,
       count(*) AS n_dups
FROM documents GROUP BY md5(text)
"""


def q_dedup_minhash(sf_dir):
    return dd.minhash_dedup(_docs(sf_dir), threshold=0.8)


def _sql_dedup_minhash(num_hashes=64, bands=16, rows=4, seed=7,
                       threshold=0.8):
    """Exact DuckDB replica of the MinHash-LSH pipeline: word-3-gram
    shingles -> md5-derived 64-bit hashes -> per-permutation min of
    ((h*a) mod 2^64 + b) mod 2^64 mod M61 (numpy uint64 wrap semantics
    in HUGEINT) -> per-band polynomial fold bucket keys -> candidate
    pairs sharing a bucket -> exact Jaccard over the hash sets. The
    (a, b) permutation constants are inlined from the same seeded
    generator the engine uses. The engine's >2000-id bucket cap cannot
    trigger at oracle scale (500 docs) and is omitted."""
    a, b = dd._minhash_params(num_hashes, seed)
    params = ",".join(f"({i},{int(a[i])},{int(b[i])})"
                      for i in range(num_hashes))
    band_c = int(dd.MinHasher._BAND_C)
    fold = "l[1]"
    for r in range(2, rows + 1):
        fold = f"(({fold})*{band_c} + l[{r}]) % {_T64}"
    jac = """CASE WHEN len(ha.h) = 0 AND len(hb.h) = 0 THEN 1.0
      ELSE CAST(len(list_intersect(ha.h, hb.h)) AS DOUBLE)
           / (len(ha.h) + len(hb.h) - len(list_intersect(ha.h, hb.h)))
      END"""
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS tk
  FROM documents
),
sh_str AS (
  SELECT doc_id,
         CASE WHEN len(tk) < 3 THEN
              CASE WHEN len(tk) = 0 THEN CAST([] AS VARCHAR[])
                   ELSE [array_to_string(tk, ' ')] END
         ELSE list_distinct([array_to_string(tk[i:i+2], ' ')
                             for i in range(1, len(tk) - 1)])
         END AS shingles
  FROM toks
),
hs AS (
  SELECT doc_id,
         list_distinct([{_SQL_TOKHASH.format(w='s')}
                        for s in shingles]) AS h
  FROM sh_str
),
params(i, a, b) AS (VALUES {params}),
sig AS (
  SELECT t.doc_id, p.i,
         min(((t.hv::HUGEINT * p.a) % {_T64} + p.b) % {_T64}
             % {_M61_SQL}) AS v
  FROM (SELECT doc_id, unnest(h) AS hv FROM hs) t, params p
  GROUP BY t.doc_id, p.i
),
folds AS (
  SELECT doc_id, (i // {rows})::INT AS band_id, list(v ORDER BY i) AS l
  FROM sig GROUP BY doc_id, (i // {rows})::INT
),
allbands AS (
  SELECT doc_id, band_id, ({fold}) AS bh FROM folds
  UNION ALL
  SELECT doc_id, r.b::INT AS band_id, 0::HUGEINT AS bh
  FROM hs, range({bands}) r(b) WHERE len(h) = 0
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM allbands x JOIN allbands y
    ON x.band_id = y.band_id AND x.bh = y.bh AND x.doc_id < y.doc_id
)
SELECT c.a::BIGINT AS a, c.b::BIGINT AS b, round({jac}, 6) AS jaccard
FROM cand c JOIN hs ha ON ha.doc_id = c.a JOIN hs hb ON hb.doc_id = c.b
WHERE {jac} >= {threshold}
"""


SQL_DEDUP_MINHASH = _sql_dedup_minhash()


def q_dedup_cluster(sf_dir):
    """Near-dup clusters: MinHash-LSH pairs -> connected components
    over the dup graph (sharded min-label BSP on Dataset-built CSR
    blocks) -> canonical min-doc_id representative per cluster."""
    return dd.dedup_cluster(_docs(sf_dir), threshold=0.8)


# the component step as a recursive min-label CTE over the (already
# SQL-replicated) MinHash pair set
SQL_DEDUP_CLUSTER = f"""
WITH RECURSIVE pairs AS ({_sql_dedup_minhash()}),
ee AS (SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs),
verts AS (SELECT DISTINCT a AS v FROM ee),
reach(v, lab) AS (
  SELECT v, v FROM verts
  UNION
  SELECT ee.b, reach.lab FROM reach JOIN ee ON ee.a = reach.v
)
SELECT v AS doc_id, min(lab) AS rep_doc_id FROM reach GROUP BY v
"""


def q_dedup_jaccard(sf_dir):
    """Exact all-pairs word-3-gram Jaccard >= 0.3 — the SQL-verifiable
    form of the near-dup verify stage (the MinHash-LSH pipeline runs
    the same ``jaccard_verify`` on LSH candidates; here the candidate
    set is the full cross product so a DuckDB list-comprehension
    oracle reproduces it exactly)."""
    return dd.jaccard_all_pairs(_docs(sf_dir), threshold=0.3)


SQL_DEDUP_JACCARD = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS tk
  FROM documents
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(tk) < 3 THEN
              CASE WHEN len(tk) = 0 THEN CAST([] AS VARCHAR[])
                   ELSE [array_to_string(tk, ' ')] END
         ELSE list_distinct([array_to_string(tk[i:i+2], ' ')
                             for i in range(1, len(tk) - 1)])
         END AS shingles
  FROM toks
)
SELECT s1.doc_id AS a, s2.doc_id AS b,
       round(CASE WHEN len(s1.shingles) = 0 AND len(s2.shingles) = 0
                  THEN 1.0
             ELSE CAST(len(list_intersect(s1.shingles, s2.shingles))
                       AS DOUBLE)
                  / (len(s1.shingles) + len(s2.shingles)
                     - len(list_intersect(s1.shingles, s2.shingles)))
             END, 6) AS jaccard
FROM sh s1 JOIN sh s2 ON s1.doc_id < s2.doc_id
WHERE CASE WHEN len(s1.shingles) = 0 AND len(s2.shingles) = 0 THEN 1.0
      ELSE CAST(len(list_intersect(s1.shingles, s2.shingles)) AS DOUBLE)
           / (len(s1.shingles) + len(s2.shingles)
              - len(list_intersect(s1.shingles, s2.shingles)))
      END >= 0.3
"""


def q_dedup_jaccard_lsh(sf_dir):
    """THE scale path for near-dup Jaccard, registered as its own gate
    row (r4 verdict item 3): banded MinHash-LSH candidates (never
    all-pairs) -> ``jaccard_verify_candidates`` (semi-join + broadcast
    signatures) at threshold 0.5 — a different operating point from
    both ``dedup_minhash`` (0.8) and the all-pairs ``dedup_jaccard``
    (0.3). The SQL twin replicates the band bucket keys AND the
    verify, so the driver checks the candidate set exactly: pairs the
    LSH legitimately misses at J ~ 0.5 are missed identically on both
    sides (banding probability 1-(1-J^4)^16, Leskovec et al., Mining
    of Massive Datasets ch.3)."""
    cand = dd.minhash_candidates(_docs(sf_dir))
    return dd.jaccard_verify_candidates(cand, _docs(sf_dir),
                                        threshold=0.5)


SQL_DEDUP_JACCARD_LSH = _sql_dedup_minhash(threshold=0.5)


PPJOIN_TAU = 0.4


def q_dedup_ppjoin(sf_dir):
    """PPJoin-style prefix-filtered similarity self-join (bigram
    shingles, Jaccard >= PPJOIN_TAU): the oracle is deliberately the
    NAIVE all-pairs form — prefix filtering is provably lossless, so
    hash-equality against the brute-force SQL is the strongest
    possible check that the pruning never drops a qualifying pair."""
    return dd.ppjoin_pairs(_docs(sf_dir), threshold=PPJOIN_TAU,
                           shingle_k=2)


SQL_DEDUP_PPJOIN = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS tk
  FROM documents
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(tk) < 2 THEN
              CASE WHEN len(tk) = 0 THEN CAST([] AS VARCHAR[])
                   ELSE [array_to_string(tk, ' ')] END
         ELSE list_distinct([array_to_string(tk[i:i+1], ' ')
                             for i in range(1, len(tk))])
         END AS shingles
  FROM toks
),
nz AS (SELECT * FROM sh WHERE len(shingles) > 0)
SELECT s1.doc_id AS a, s2.doc_id AS b,
       round(CAST(len(list_intersect(s1.shingles, s2.shingles))
                  AS DOUBLE)
             / (len(s1.shingles) + len(s2.shingles)
                - len(list_intersect(s1.shingles, s2.shingles))), 6)
         AS jaccard
FROM nz s1 JOIN nz s2 ON s1.doc_id < s2.doc_id
WHERE CAST(len(list_intersect(s1.shingles, s2.shingles)) AS DOUBLE)
      / (len(s1.shingles) + len(s2.shingles)
         - len(list_intersect(s1.shingles, s2.shingles)))
      >= {PPJOIN_TAU}
"""


CONTAIN_TAU = 0.5


def q_dedup_containment(sf_dir):
    """Directed shingle containment |S_a ∩ S_b| / |S_a| >= tau
    (Broder 1997's asymmetric resemblance): catches quotes and subset
    documents that symmetric Jaccard dilutes away. All-pairs
    oracle-verifiable form of the shared double-hash-join verify; at
    scale the candidate side comes from ``minhash_candidates``."""
    return dd.containment_all_pairs(_docs(sf_dir),
                                    threshold=CONTAIN_TAU)


SQL_DEDUP_CONTAINMENT = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS tk
  FROM documents
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(tk) < 3 THEN
              CASE WHEN len(tk) = 0 THEN CAST([] AS VARCHAR[])
                   ELSE [array_to_string(tk, ' ')] END
         ELSE list_distinct([array_to_string(tk[i:i+2], ' ')
                             for i in range(1, len(tk) - 1)])
         END AS shingles
  FROM toks
)
SELECT s1.doc_id AS a, s2.doc_id AS b,
       round(CAST(len(list_intersect(s1.shingles, s2.shingles))
                  AS DOUBLE) / len(s1.shingles), 6) AS containment
FROM sh s1 JOIN sh s2 ON s1.doc_id <> s2.doc_id
WHERE len(s1.shingles) > 0
  AND CAST(len(list_intersect(s1.shingles, s2.shingles)) AS DOUBLE)
      / len(s1.shingles) >= {CONTAIN_TAU}
"""


def q_dedup_simhash(sf_dir):
    return dd.simhash_dedup(_docs(sf_dir), max_hamming=3)


_SQL_POW2 = ",".join(f"({j},{1 << j})" for j in range(64))

# Exact DuckDB replica of the SimHash pipeline: per-bit majority vote
# over md5-derived token hashes (occurrences, not distinct), 64-bit
# signature, 4x16-bit pigeonhole blocking, Hamming verify <= 3.
SQL_DEDUP_SIMHASH = f"""
WITH {_SQL_TOKEN_HASHES},
jtab(j, p) AS (VALUES {_SQL_POW2}),
bits AS (
  SELECT r.doc_id, jt.j, jt.p,
         sum(((r.hv >> jt.j) & 1)::BIGINT) AS ones
  FROM (SELECT doc_id, unnest(h) AS hv FROM th) r, jtab jt
  GROUP BY r.doc_id, jt.j, jt.p
),
sigs AS (
  SELECT b.doc_id,
         sum(CASE WHEN 2*b.ones > t.n THEN b.p::HUGEINT
                  ELSE 0::HUGEINT END)::UBIGINT AS s
  FROM bits b JOIN th t USING(doc_id)
  GROUP BY b.doc_id
  UNION ALL
  SELECT doc_id, 0::UBIGINT AS s FROM th WHERE n = 0
),
chunks AS (
  SELECT doc_id, s, t.c, (s >> (16*t.c)::INT) & 65535 AS cv
  FROM sigs, range(4) t(c)
)
SELECT DISTINCT x.doc_id::BIGINT AS a, y.doc_id::BIGINT AS b,
       bit_count(xor(x.s, y.s))::BIGINT AS hamming
FROM chunks x JOIN chunks y
  ON x.c = y.c AND x.cv = y.cv AND x.doc_id < y.doc_id
WHERE bit_count(xor(x.s, y.s)) <= 3
"""


SEMDEDUP_K = 16
SEMDEDUP_TAU = 0.4


def q_semdedup(sf_dir):
    """SemDeDup (Abbas et al. 2023): semantic dedup bucketed by
    nearest-centroid cluster — the pairwise pass is bounded by the
    cluster, never the corpus. Deterministic centroids (the first
    SEMDEDUP_K vectors by vec_id, the ``ann_ivf_fixed`` convention) so
    the DuckDB oracle replicates assignment, the per-cluster similar
    pairs and the keep-lowest-centroid-cosine election exactly."""
    emb = _emb(sf_dir)
    head = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"]) \
        .filter(expr=f"vec_id < {SEMDEDUP_K}").to_pandas() \
        .sort_values("vec_id")
    cent = np.stack([np.asarray(v, dtype=np.float64)
                     for v in head["embedding"]])
    return dd.semdedup(emb, cent, tau=SEMDEDUP_TAU)


SQL_SEMDEDUP = f"""
WITH cent AS (
  SELECT vec_id AS c, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id < {SEMDEDUP_K}
),
a AS (  -- every vector -> nearest centroid (ties: lowest c)
  SELECT vec_id, c AS bucket, ccos FROM (
    SELECT e.vec_id, cent.c,
           list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                  cent.cv) AS ccos,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(
                 CAST(e.embedding AS DOUBLE[]), cent.cv) DESC, cent.c)
             AS rn
    FROM embeddings e CROSS JOIN cent
  ) WHERE rn = 1
),
rm AS (  -- removed: a same-cluster member >= tau wins the keep rule
  SELECT DISTINCT x.vec_id
  FROM a x JOIN a y ON x.bucket = y.bucket AND x.vec_id <> y.vec_id
  JOIN embeddings ex ON ex.vec_id = x.vec_id
  JOIN embeddings ey ON ey.vec_id = y.vec_id
  WHERE list_cosine_similarity(CAST(ex.embedding AS DOUBLE[]),
                               CAST(ey.embedding AS DOUBLE[]))
          >= {SEMDEDUP_TAU}
    AND (y.ccos < x.ccos
         OR (y.ccos = x.ccos AND y.vec_id < x.vec_id))
)
SELECT a.vec_id, a.bucket, round(a.ccos, 6) AS ccos,
       CAST(CASE WHEN rm.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT)
         AS keep
FROM a LEFT JOIN rm ON rm.vec_id = a.vec_id
"""


DELTA_MOD = 8


def q_dedup_delta(sf_dir):
    """Incremental (delta) dedup: the 'new crawl' slice
    (doc_id % 8 == 0) is checked for near-duplicates AGAINST the
    existing corpus only — MinHash-LSH banding runs over corpus+delta
    and only cross (old, new) pairs survive. At 100 TB the corpus band
    buckets are a persisted index (the partitioned-parquet sink
    layout): each day's delta bands hash-join against it, so daily
    dedup costs O(delta), not O(corpus)."""
    pairs = dd.minhash_dedup(_docs(sf_dir), threshold=0.8)

    def cross(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        j = t["jaccard"].to_numpy(zero_copy_only=False)
        na = a % DELTA_MOD == 0
        nb = b % DELTA_MOD == 0
        keep = na != nb
        a, b, j, na = a[keep], b[keep], j[keep], na[keep]
        return pa.table({
            "old_id": pa.array(np.where(na, b, a)),
            "new_id": pa.array(np.where(na, a, b)),
            "jaccard": pa.array(j),
        })

    return pairs.map_batches(cross, batch_format="pyarrow")


SQL_DEDUP_DELTA = f"""
SELECT CASE WHEN a % {DELTA_MOD} = 0 THEN b ELSE a END AS old_id,
       CASE WHEN a % {DELTA_MOD} = 0 THEN a ELSE b END AS new_id,
       jaccard
FROM ({_sql_dedup_minhash()})
WHERE (a % {DELTA_MOD} = 0) <> (b % {DELTA_MOD} = 0)
"""


def q_dedup_provenance(sf_dir):
    """Provenance matrix of near-duplication: MinHash-LSH verified
    pairs counted by (source, source) — the 'which crawls/feeds
    duplicate each other' curation diagnostic. The doc->source map is
    the broadcast small side (one string per doc id; at corpus scale
    this is a hash-join of pairs to metadata); per-batch pair counts,
    one |sources|^2-bounded groupby."""
    import ray
    meta = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source"]).to_pandas()
    src = dict(zip(meta["doc_id"].astype(int), meta["source"]))
    sref = ray.put(src)
    pairs = dd.minhash_dedup(_docs(sf_dir), threshold=0.8)

    def tag(t: pa.Table) -> pa.Table:
        sm = ray.get(sref)
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        sa = [sm[int(x)] for x in a]
        sb = [sm[int(x)] for x in b]
        lo = [min(x, y) for x, y in zip(sa, sb)]
        hi = [max(x, y) for x, y in zip(sa, sb)]
        tt = pa.table({"src_a": pa.array(lo, pa.string()),
                       "src_b": pa.array(hi, pa.string())})
        return tt.group_by(["src_a", "src_b"]).aggregate(
            [([], "count_all")]).rename_columns(
                ["src_a", "src_b", "n_pairs"])

    out = pairs.map_batches(tag, batch_format="pyarrow") \
        .groupby(["src_a", "src_b"]).aggregate(
            Sum("n_pairs", alias_name="n_pairs"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "src_a": pc.cast(t["src_a"], pa.string()),
            "src_b": pc.cast(t["src_b"], pa.string()),
            "n_pairs": pc.cast(t["n_pairs"], pa.int64()),
        })
    return out.map_batches(finish, batch_format="pyarrow")


SQL_DEDUP_PROVENANCE = f"""
WITH prs AS ({_sql_dedup_minhash()})
SELECT least(da.source, db.source) AS src_a,
       greatest(da.source, db.source) AS src_b,
       count(*) AS n_pairs
FROM prs JOIN documents da ON da.doc_id = prs.a
         JOIN documents db ON db.doc_id = prs.b
GROUP BY 1, 2
"""


# ----------------------------------------------------------------------
# near-dup representative election by quality (the curation keep-list)
# ----------------------------------------------------------------------
def q_dedup_keep_best(sf_dir):
    """Quality-based representative election over near-dup clusters —
    the curation form of dedup where you KEEP the best copy, not the
    first: per MinHash-LSH cluster (``dedup_cluster``'s components),
    keep the member with the most characters (tie -> min doc_id).
    Cluster members are a tiny fraction of the corpus, so the quality
    join is a membership-filtered scan, never a full-corpus shuffle."""
    clusters = q_dedup_cluster(sf_dir)          # (doc_id, rep_doc_id)
    member = clusters["doc_id"].to_numpy()
    cid = clusters["rep_doc_id"].to_numpy()
    member_set = np.sort(member)

    def pick(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        keep = np.isin(ids, member_set)
        return pa.table({"doc_id": pa.array(ids[keep]),
                         "n_chars": pa.array(
                             t["n_chars"].to_numpy(
                                 zero_copy_only=False)[keep])})

    quality = _docs(sf_dir, columns=("doc_id", "n_chars")) \
        .map_batches(pick, batch_format="pyarrow",
                     zero_copy_batch=True).to_pandas()
    nc = quality.set_index("doc_id")["n_chars"]
    n_chars = nc.loc[member].to_numpy(np.int64)
    # best per cluster: n_chars desc, doc_id asc
    order = np.lexsort((member, -n_chars))
    c_o, m_o, q_o = cid[order], member[order], n_chars[order]
    first = np.unique(c_o, return_index=True)[1]
    counts = np.bincount(np.searchsorted(np.unique(c_o), c_o))
    return pa.table({
        "cluster_id": pa.array(np.unique(c_o)),
        "n_members": pa.array(counts.astype(np.int64)),
        "keep_doc_id": pa.array(m_o[first]),
        "keep_n_chars": pa.array(q_o[first]),
    })


SQL_DEDUP_KEEP_BEST = f"""
WITH clusters AS ({SQL_DEDUP_CLUSTER}),
m AS (SELECT c.rep_doc_id AS cluster_id, c.doc_id, d.n_chars
      FROM clusters c JOIN documents d ON d.doc_id = c.doc_id),
b AS (SELECT cluster_id, doc_id, n_chars,
             row_number() OVER (PARTITION BY cluster_id
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM m),
n AS (SELECT cluster_id, count(*) AS n_members FROM m GROUP BY 1)
SELECT n.cluster_id, CAST(n.n_members AS BIGINT) AS n_members,
       b.doc_id AS keep_doc_id,
       CAST(b.n_chars AS BIGINT) AS keep_n_chars
FROM n JOIN b USING (cluster_id) WHERE b.rn = 1
"""
