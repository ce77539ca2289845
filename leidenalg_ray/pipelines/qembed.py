"""Embedding / ANN catalogue rows — see queries.py."""

from .qcore import *  # noqa: F401,F403
from .qcore import (  # noqa: F401
    _emb,
)


def q_knn_eval(sf_dir):
    """Classifier-quality evaluation of the kNN label propagation
    (the model-eval op a labeling pipeline needs): per-class TP / FP /
    FN and F1 against the vectors' own labels, over exactly the
    ``knn_label_predict`` output. F1 = 2TP/(2TP+FP+FN) is one
    integer-ratio IEEE division per class; classes with no
    predictions and no truth among the PREDICTED vectors are absent
    on both engines. Fusion runs on the gate-identical predict
    output, driver state = the per-class table (the query RESULT)."""
    pred = q_knn_label_predict(sf_dir).to_pandas()
    truth = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "label"]).to_pandas()
    m = pred.merge(truth, on="vec_id")
    labels = np.union1d(m["pred_label"].unique(),
                        m["label"].unique()).astype(np.int64)
    rows = []
    for c in sorted(labels):
        tp = int(((m["pred_label"] == c) & (m["label"] == c)).sum())
        fp = int(((m["pred_label"] == c) & (m["label"] != c)).sum())
        fn = int(((m["pred_label"] != c) & (m["label"] == c)).sum())
        f1 = 2.0 * tp / (2 * tp + fp + fn) if (2 * tp + fp + fn)             else 0.0
        rows.append((int(c), tp, fp, fn, f1))
    return pa.table({
        "label": pa.array([r[0] for r in rows], pa.int64()),
        "tp": pa.array([r[1] for r in rows], pa.int64()),
        "fp": pa.array([r[2] for r in rows], pa.int64()),
        "fn": pa.array([r[3] for r in rows], pa.int64()),
        "f1": pa.array(round6([r[4] for r in rows])),
    })


def _sql_knn_eval():
    base = SQL_KNN_LABEL_PREDICT
    return f"""
WITH p AS (SELECT pr.vec_id, pr.pred_label, e.label
           FROM ({base}) pr
           JOIN embeddings e ON e.vec_id = pr.vec_id),
cls AS (SELECT DISTINCT pred_label AS label FROM p
        UNION SELECT DISTINCT label FROM p),
st AS (SELECT cls.label,
              (SELECT count(*) FROM p
               WHERE p.pred_label = cls.label
                 AND p.label = cls.label) AS tp,
              (SELECT count(*) FROM p
               WHERE p.pred_label = cls.label
                 AND p.label <> cls.label) AS fp,
              (SELECT count(*) FROM p
               WHERE p.pred_label <> cls.label
                 AND p.label = cls.label) AS fn
       FROM cls)
SELECT CAST(label AS BIGINT) AS label, CAST(tp AS BIGINT) AS tp,
       CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
       round(CASE WHEN 2 * tp + fp + fn = 0 THEN 0.0
                  ELSE 2.0 * tp / (2 * tp + fp + fn) END, 6) AS f1
FROM st
"""


def q_embed_cosine_pairs(sf_dir):
    """Exact all-pairs cosine >= 0.4 (threshold chosen so the synthetic
    embeddings produce a non-trivial pair set; max pairwise cosine in
    the test corpus is ~0.51). ``use_lsh=False`` so the DuckDB
    cross-join oracle computes the identical pair set; the LSH-bucketed
    scale path is exercised by tests."""
    return dd.embedding_cosine_pairs(_emb(sf_dir), threshold=0.4,
                                     use_lsh=False)


SQL_EMBED_COSINE_PAIRS = """
SELECT e1.vec_id AS a, e2.vec_id AS b,
       round(list_cosine_similarity(
           CAST(e1.embedding AS DOUBLE[]),
           CAST(e2.embedding AS DOUBLE[])), 6) AS cos
FROM embeddings e1 JOIN embeddings e2 ON e1.vec_id < e2.vec_id
WHERE list_cosine_similarity(CAST(e1.embedding AS DOUBLE[]),
                             CAST(e2.embedding AS DOUBLE[])) >= 0.4
"""


CENTROID_DIMS = 4
CENTROID_Q = 1 << 20

KMEANS_K = 8
KMEANS_ITERS = 2
KMEANS_DIM = 64


def q_kmeans_fixed(sf_dir):
    """Distributed Lloyd k-means, fixed KMEANS_ITERS=2 rounds — the
    SQL-verifiable twin of the iterative k-means behind ``ann_ivf``
    (same convention as ``ann_ivf_fixed``: deterministic anchors =
    first KMEANS_K vectors, cosine assignment with ties to the lowest
    centroid id). Each round is ONE shuffle-free map_batches pass:
    per-batch assignment against the broadcast centroid matrix plus
    fixed-point-quantised per-(cluster, dim) integer partials
    (round(x * 2^20), the ``embed_centroids`` trick) so the
    distributed mean is order-independent; the driver merges only
    K x (D+1) scalars per batch. Mean update mu_j = (sum_q / 2^20) / n
    is written identically in the oracle, so the round-2 assignment
    sees bit-identical centroids on both engines."""
    head = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"]) \
        .filter(expr=f"vec_id < {KMEANS_K}").to_pandas() \
        .sort_values("vec_id")
    cm = np.stack([np.asarray(v, dtype=np.float64)
                   for v in head["embedding"]])
    labels = head["vec_id"].to_numpy().astype(np.int64)

    def one_round(cm, labels):
        cn = np.linalg.norm(cm, axis=1)
        cn[cn == 0] = 1.0
        cmn = cm / cn[:, None]

        def partial(t: pa.Table) -> pa.Table:
            vec = np.stack([np.asarray(v, dtype=np.float64)
                            for v in t["embedding"].to_pylist()])
            norm = np.linalg.norm(vec, axis=1)
            norm[norm == 0] = 1.0
            b = np.argmax((vec / norm[:, None]) @ cmn.T, axis=1)
            qz = np.floor(vec * CENTROID_Q + 0.5).astype(np.int64)
            ub, inv = np.unique(b, return_inverse=True)
            n = np.zeros(len(ub), np.int64)
            np.add.at(n, inv, 1)
            s = np.zeros((len(ub), vec.shape[1]), np.int64)
            np.add.at(s, inv, qz)
            cols = {"bucket": pa.array(labels[ub]), "n": pa.array(n)}
            for j in range(vec.shape[1]):
                cols[f"s{j}"] = pa.array(s[:, j])
            return pa.table(cols)

        parts = _emb(sf_dir).map_batches(
            partial, batch_format="pyarrow",
            zero_copy_batch=True).to_pandas()
        agg = parts.groupby("bucket", sort=True).sum()
        n = agg["n"].to_numpy().astype(np.float64)
        s = agg[[f"s{j}" for j in range(KMEANS_DIM)]].to_numpy() \
            .astype(np.float64)
        new_cm = (s / CENTROID_Q) / n[:, None]
        return new_cm, agg.index.to_numpy().astype(np.int64), \
            agg["n"].to_numpy().astype(np.int64)

    for _ in range(KMEANS_ITERS):
        cm, labels, sizes = one_round(cm, labels)

    out = {"bucket": pa.array(labels), "n": pa.array(sizes)}
    for j in range(CENTROID_DIMS):
        out[f"c{j}"] = pa.array(round6(cm[:, j]))
    return pa.table(out)


SQL_KMEANS_FIXED = f"""
WITH dims AS (SELECT j FROM range({KMEANS_DIM}) t(j)),
cent0 AS (
  SELECT vec_id AS c, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id < {KMEANS_K}
),
a1 AS (
  SELECT vec_id, c AS bucket FROM (
    SELECT e.vec_id, cent0.c,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(
                 CAST(e.embedding AS DOUBLE[]), cent0.cv) DESC, cent0.c)
             AS rn
    FROM embeddings e CROSS JOIN cent0
  ) WHERE rn = 1
),
m1 AS (
  SELECT a1.bucket, dims.j,
         (sum(CAST(floor(e.embedding[dims.j + 1] * {CENTROID_Q} + 0.5)
                   AS BIGINT)) / {CENTROID_Q}.0) / count(*) AS mu
  FROM a1 JOIN embeddings e USING (vec_id) CROSS JOIN dims
  GROUP BY 1, 2
),
cent1 AS (
  SELECT bucket AS c, list(mu ORDER BY j) AS cv FROM m1 GROUP BY 1
),
a2 AS (
  SELECT vec_id, c AS bucket FROM (
    SELECT e.vec_id, cent1.c,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(
                 CAST(e.embedding AS DOUBLE[]), cent1.cv) DESC, cent1.c)
             AS rn
    FROM embeddings e CROSS JOIN cent1
  ) WHERE rn = 1
),
m2 AS (
  SELECT a2.bucket, dims.j,
         (sum(CAST(floor(e.embedding[dims.j + 1] * {CENTROID_Q} + 0.5)
                   AS BIGINT)) / {CENTROID_Q}.0) / count(*) AS mu,
         count(*) AS n
  FROM a2 JOIN embeddings e USING (vec_id) CROSS JOIN dims
  WHERE dims.j < {CENTROID_DIMS}
  GROUP BY 1, 2
)
SELECT bucket, CAST(max(n) AS BIGINT) AS n,
""" + ",\n".join(
    f"       round(max(CASE WHEN j = {j} THEN mu END), 6) AS c{j}"
    for j in range(4)) + """
FROM m2 GROUP BY bucket
"""


def q_ann_topk(sf_dir):
    """Brute-force cosine top-10 for the first 5 vectors as queries."""
    emb = _emb(sf_dir)
    qdf = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"]) \
        .filter(expr="vec_id < 5").to_pandas()
    qdf = qdf.sort_values("vec_id")
    qv = np.stack([np.asarray(v, dtype=np.float64)
                   for v in qdf["embedding"]])
    return annm.brute_force_topk(emb, qv, qdf["vec_id"].to_numpy(), k=10)


SQL_ANN_TOPK = """
SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
       round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                    CAST(e.embedding AS DOUBLE[])), 6)
           AS cos,
       CAST(row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(
               CAST(q.embedding AS DOUBLE[]),
               CAST(e.embedding AS DOUBLE[])) DESC, e.vec_id)
         AS BIGINT) AS rank
FROM embeddings q CROSS JOIN embeddings e
WHERE q.vec_id < 5
QUALIFY rank <= 10
"""


def q_ann_ivf(sf_dir):
    """IVF approximate top-k (scale path; rows-only check — recall vs
    brute force is asserted in tests)."""
    emb = _emb(sf_dir)
    qdf = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"]) \
        .filter(expr="vec_id < 5").to_pandas().sort_values("vec_id")
    qv = np.stack([np.asarray(v, dtype=np.float64)
                   for v in qdf["embedding"]])
    return annm.ivf_topk(emb, qv, qdf["vec_id"].to_numpy(), k=10)


def q_ann_ivf_fixed(sf_dir):
    """IVF with deterministic centroids (the first 16 vectors by
    vec_id) instead of k-means — the SQL-verifiable form: assignment
    argmax, probe ranking and bucketed top-k search are identical to
    the k-means path, but the coarse quantiser is closed-form so the
    DuckDB oracle reproduces the whole pipeline exactly."""
    emb = _emb(sf_dir)
    head = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"]) \
        .filter(expr="vec_id < 16").to_pandas().sort_values("vec_id")
    cent = np.stack([np.asarray(v, dtype=np.float64)
                     for v in head["embedding"]])
    qdf = head[head.vec_id < 5]
    qv = np.stack([np.asarray(v, dtype=np.float64)
                   for v in qdf["embedding"]])
    return annm.ivf_topk(emb, qv, qdf["vec_id"].to_numpy(), k=10,
                         nprobe=4, centroids=cent)


SQL_ANN_IVF_FIXED = """
WITH cent AS (
  SELECT vec_id AS c, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id < 16
),
assign AS (  -- every vector -> nearest centroid (ties: lowest c)
  SELECT vec_id, c AS bucket FROM (
    SELECT e.vec_id, cent.c,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(
                 CAST(e.embedding AS DOUBLE[]), cent.cv) DESC, cent.c)
             AS rn
    FROM embeddings e CROSS JOIN cent
  ) WHERE rn = 1
),
probes AS (  -- every query -> its nprobe=4 nearest centroids
  SELECT query_id, c FROM (
    SELECT q.vec_id AS query_id, cent.c,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(
                 CAST(q.embedding AS DOUBLE[]), cent.cv) DESC, cent.c)
             AS rn
    FROM embeddings q CROSS JOIN cent WHERE q.vec_id < 5
  ) WHERE rn <= 4
)
SELECT query_id, vec_id,
       round(list_cosine_similarity(qe, ee), 6) AS cos,
       CAST(row_number() OVER (
           PARTITION BY query_id
           ORDER BY list_cosine_similarity(qe, ee) DESC, vec_id)
         AS BIGINT) AS rank
FROM (
  SELECT p.query_id, e.vec_id,
         CAST(q.embedding AS DOUBLE[]) AS qe,
         CAST(e.embedding AS DOUBLE[]) AS ee
  FROM probes p
  JOIN assign a ON a.bucket = p.c
  JOIN embeddings e ON e.vec_id = a.vec_id
  JOIN embeddings q ON q.vec_id = p.query_id
)
QUALIFY rank <= 10
"""


PQ_M = 8          # subspaces (64 dims -> 8 x 8)
PQ_SUBDIM = 8
PQ_K = 16         # codewords per subspace (anchors: vec_id < 16)
PQ_TOPK = 10
PQ_NQ = 5


def q_ann_pq(sf_dir):
    """Product-quantization ANN (Jégou et al. 2011) with asymmetric
    distance computation: 64-dim embeddings split into M=8 subspaces,
    each encoded as the nearest of K=16 codewords (deterministic
    codebooks — the subvectors of the first 16 vectors by vec_id — so
    the DuckDB oracle reproduces the whole pipeline exactly, mirroring
    ``ann_ivf_fixed``). A query precomputes its M x K subspace
    distance table; the scan then reads ONE BYTE per (vector,
    subspace) instead of the raw floats — at 100 TB the code table is
    32x smaller than the embedding column, which is the point of PQ.

    Determinism: per-subspace query-to-codeword L2^2 distances are
    quantised to 1e-9 fixed point before the per-vector sum, so ADC
    totals are exact integers (order-free) and ranking ties break on
    vec_id. Encode + ADC + partial top-k run in one shuffle-free
    ``map_batches`` pass with the tiny codebook broadcast; the driver
    sees K_top rows per (query, batch)."""
    emb = _emb(sf_dir)
    head = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"]) \
        .filter(expr=f"vec_id < {PQ_K}").to_pandas() \
        .sort_values("vec_id")
    anchors = np.stack([np.asarray(v, dtype=np.float64)
                        for v in head["embedding"]])        # (K, 64)
    # cb[m]: (K, SUBDIM) codebook of subspace m
    cb = [anchors[:, m * PQ_SUBDIM:(m + 1) * PQ_SUBDIM]
          for m in range(PQ_M)]
    qdf = head[head.vec_id < PQ_NQ]
    qv = np.stack([np.asarray(v, dtype=np.float64)
                   for v in qdf["embedding"]])              # (Q, 64)
    qids = qdf["vec_id"].to_numpy(np.int64)
    # quantised query distance tables: (Q, M, K) int64
    qt = np.empty((len(qids), PQ_M, PQ_K), dtype=np.int64)
    for m in range(PQ_M):
        sub = qv[:, m * PQ_SUBDIM:(m + 1) * PQ_SUBDIM]
        d2 = ((sub[:, None, :] - cb[m][None, :, :]) ** 2).sum(-1)
        qt[:, m, :] = np.floor(d2 * 1e9 + 0.5).astype(np.int64)
    import ray as _ray
    cb_ref = _ray.put(cb)
    qt_ref = _ray.put(qt)

    def scan(t: pa.Table) -> pa.Table:
        import ray as _ray
        cbl = _ray.get(cb_ref)
        qtl = _ray.get(qt_ref)
        vec = annm._to_matrix(t["embedding"])
        ids = t["vec_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = len(ids)
        if n == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        adist = np.zeros((len(qtl), n), dtype=np.int64)
        for m in range(PQ_M):
            sub = vec[:, m * PQ_SUBDIM:(m + 1) * PQ_SUBDIM]
            d2 = ((sub[:, None, :] - cbl[m][None, :, :]) ** 2).sum(-1)
            codes = np.argmin(d2, axis=1)      # ties -> lowest k
            adist += qtl[:, m, codes]
        kk = min(PQ_TOPK, n)
        out_q, out_v, out_s = [], [], []
        for j in range(len(qtl)):
            order = np.lexsort((ids, adist[j]))[:kk]
            out_q.append(np.full(kk, j, dtype=np.int64))
            out_v.append(ids[order])
            out_s.append(adist[j][order])
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         "vec_id": pa.array(np.concatenate(out_v)),
                         "s": pa.array(np.concatenate(out_s))})

    parts = emb.map_batches(scan, batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas()
    frames = []
    for j in range(len(qids)):
        g = parts[parts["query_id"] == j]
        order = np.lexsort((g["vec_id"].to_numpy(),
                            g["s"].to_numpy()))[:PQ_TOPK]
        sel = g.iloc[order]
        frames.append(pa.table({
            "query_id": pa.array(np.full(len(sel), qids[j])),
            "vec_id": pa.array(sel["vec_id"].to_numpy(np.int64)),
            "adist": pa.array(round6(
                sel["s"].to_numpy(np.int64) / 1e9)),
            "rank": pa.array(np.arange(1, len(sel) + 1,
                                       dtype=np.int64)),
        }))
    return pa.concat_tables(frames)


_PQ_D2 = ("list_sum(list_transform(generate_series(1, {sd}), "
          "i -> (sv[i] - cv[i]) * (sv[i] - cv[i])))")

SQL_ANN_PQ = f"""
WITH ms AS (SELECT unnest(generate_series(0, {PQ_M - 1})) AS m),
anch AS (SELECT vec_id AS k, CAST(embedding AS DOUBLE[]) AS av
         FROM embeddings WHERE vec_id < {PQ_K}),
cbook AS (SELECT k, m,
                 list_slice(av, m * {PQ_SUBDIM} + 1,
                            m * {PQ_SUBDIM} + {PQ_SUBDIM}) AS cv
          FROM anch, ms),
vsub AS (SELECT vec_id, m,
                list_slice(CAST(embedding AS DOUBLE[]),
                           m * {PQ_SUBDIM} + 1,
                           m * {PQ_SUBDIM} + {PQ_SUBDIM}) AS sv
         FROM embeddings, ms),
cand AS (SELECT v.vec_id, v.m, c.k,
                {_PQ_D2.format(sd=PQ_SUBDIM).replace('sv', 'v.sv')
                 .replace('cv', 'c.cv')} AS d2
         FROM vsub v JOIN cbook c USING (m)),
codes AS (SELECT vec_id, m, k AS code FROM (
            SELECT vec_id, m, k,
                   row_number() OVER (PARTITION BY vec_id, m
                                      ORDER BY d2, k) AS rn
            FROM cand) WHERE rn = 1),
qtab AS (SELECT vec_id AS query_id, m, k,
                CAST(floor(d2 * 1000000000 + 0.5) AS BIGINT) AS dq
         FROM cand WHERE vec_id < {PQ_NQ}),
adc AS (SELECT q.query_id, c.vec_id, sum(q.dq) AS s
        FROM codes c JOIN qtab q ON q.m = c.m AND q.k = c.code
        GROUP BY 1, 2)
SELECT query_id, vec_id,
       round(CAST(s AS DOUBLE) / 1000000000, 6) AS adist,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY s, vec_id) AS BIGINT) AS rank
FROM adc QUALIFY rank <= {PQ_TOPK}
"""


IVFPQ_NPROBE = 4


def q_ann_ivfpq(sf_dir):
    """IVF-PQ composite ANN — the FAISS-style at-scale architecture:
    a coarse inverted index prunes the corpus to nprobe buckets (the
    ``ann_ivf_fixed`` quantiser: deterministic centroids = first 16
    vectors, cosine assignment, ties to the lowest id), then the PQ
    asymmetric-distance scan of ``ann_pq`` scores ONLY the surviving
    candidates from 1-byte-per-subspace codes. At 100 TB the probe
    filter cuts the scan ~K/nprobe-fold on top of PQ's 32x byte
    shrink. Same determinism contract: quantised integer ADC,
    (distance, vec_id) tie order; one shuffle-free map_batches pass
    with the codebooks + probe table broadcast."""
    emb = _emb(sf_dir)
    head = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])         .filter(expr=f"vec_id < {PQ_K}").to_pandas()         .sort_values("vec_id")
    anchors = np.stack([np.asarray(v, dtype=np.float64)
                        for v in head["embedding"]])
    cn = np.linalg.norm(anchors, axis=1)
    cn[cn == 0] = 1.0
    cmn = anchors / cn[:, None]
    cb = [anchors[:, m * PQ_SUBDIM:(m + 1) * PQ_SUBDIM]
          for m in range(PQ_M)]
    qdf = head[head.vec_id < PQ_NQ]
    qv = np.stack([np.asarray(v, dtype=np.float64)
                   for v in qdf["embedding"]])
    qids = qdf["vec_id"].to_numpy(np.int64)
    qt = np.empty((len(qids), PQ_M, PQ_K), dtype=np.int64)
    for m in range(PQ_M):
        sub = qv[:, m * PQ_SUBDIM:(m + 1) * PQ_SUBDIM]
        d2 = ((sub[:, None, :] - cb[m][None, :, :]) ** 2).sum(-1)
        qt[:, m, :] = np.floor(d2 * 1e9 + 0.5).astype(np.int64)
    # probe sets: nprobe nearest centroids per query (cosine desc, c)
    qn = np.linalg.norm(qv, axis=1)
    qn[qn == 0] = 1.0
    sim = (qv / qn[:, None]) @ cmn.T
    probes = np.argsort(-sim, kind="stable")[:, :IVFPQ_NPROBE]
    import ray as _ray
    cb_ref = _ray.put((cb, cmn))
    qt_ref = _ray.put((qt, probes))

    def scan(t: pa.Table) -> pa.Table:
        import ray as _ray
        cbl, cmnl = _ray.get(cb_ref)
        qtl, probesl = _ray.get(qt_ref)
        vec = annm._to_matrix(t["embedding"])
        ids = t["vec_id"].to_numpy(zero_copy_only=False)             .astype(np.int64)
        n = len(ids)
        if n == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        norm = np.linalg.norm(vec, axis=1)
        norm[norm == 0] = 1.0
        bucket = np.argmax((vec / norm[:, None]) @ cmnl.T, axis=1)
        adist = np.zeros((len(qtl), n), dtype=np.int64)
        for m in range(PQ_M):
            sub = vec[:, m * PQ_SUBDIM:(m + 1) * PQ_SUBDIM]
            d2 = ((sub[:, None, :] - cbl[m][None, :, :]) ** 2).sum(-1)
            codes = np.argmin(d2, axis=1)
            adist += qtl[:, m, codes]
        out_q, out_v, out_s = [], [], []
        for j in range(len(qtl)):
            cand = np.flatnonzero(np.isin(bucket, probesl[j]))
            if not len(cand):
                continue
            kk = min(PQ_TOPK, len(cand))
            order = cand[np.lexsort((ids[cand], adist[j][cand]))[:kk]]
            out_q.append(np.full(kk, j, dtype=np.int64))
            out_v.append(ids[order])
            out_s.append(adist[j][order])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         "vec_id": pa.array(np.concatenate(out_v)),
                         "s": pa.array(np.concatenate(out_s))})

    parts = emb.map_batches(scan, batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas()
    frames = []
    for j in range(len(qids)):
        g = parts[parts["query_id"] == j]
        order = np.lexsort((g["vec_id"].to_numpy(),
                            g["s"].to_numpy()))[:PQ_TOPK]
        sel = g.iloc[order]
        frames.append(pa.table({
            "query_id": pa.array(np.full(len(sel), qids[j])),
            "vec_id": pa.array(sel["vec_id"].to_numpy(np.int64)),
            "adist": pa.array(round6(
                sel["s"].to_numpy(np.int64) / 1e9)),
            "rank": pa.array(np.arange(1, len(sel) + 1,
                                       dtype=np.int64)),
        }))
    return pa.concat_tables(frames)


SQL_ANN_IVFPQ = f"""
WITH ms AS (SELECT unnest(generate_series(0, {PQ_M - 1})) AS m),
anch AS (SELECT vec_id AS k, CAST(embedding AS DOUBLE[]) AS av
         FROM embeddings WHERE vec_id < {PQ_K}),
assign AS (SELECT vec_id, k AS bucket FROM (
    SELECT e.vec_id, anch.k,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(
                 CAST(e.embedding AS DOUBLE[]), anch.av) DESC, anch.k)
             AS rn
    FROM embeddings e CROSS JOIN anch
  ) WHERE rn = 1),
probes AS (SELECT query_id, k FROM (
    SELECT q.vec_id AS query_id, anch.k,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(
                 CAST(q.embedding AS DOUBLE[]), anch.av) DESC, anch.k)
             AS rn
    FROM embeddings q CROSS JOIN anch WHERE q.vec_id < {PQ_NQ}
  ) WHERE rn <= {IVFPQ_NPROBE}),
cbook AS (SELECT k, m,
                 list_slice(av, m * {PQ_SUBDIM} + 1,
                            m * {PQ_SUBDIM} + {PQ_SUBDIM}) AS cv
          FROM anch, ms),
vsub AS (SELECT vec_id, m,
                list_slice(CAST(embedding AS DOUBLE[]),
                           m * {PQ_SUBDIM} + 1,
                           m * {PQ_SUBDIM} + {PQ_SUBDIM}) AS sv
         FROM embeddings, ms),
cand AS (SELECT v.vec_id, v.m, c.k,
                {_PQ_D2.format(sd=PQ_SUBDIM).replace('sv', 'v.sv')
                 .replace('cv', 'c.cv')} AS d2
         FROM vsub v JOIN cbook c USING (m)),
codes AS (SELECT vec_id, m, k AS code FROM (
            SELECT vec_id, m, k,
                   row_number() OVER (PARTITION BY vec_id, m
                                      ORDER BY d2, k) AS rn
            FROM cand) WHERE rn = 1),
qtab AS (SELECT vec_id AS query_id, m, k,
                CAST(floor(d2 * 1000000000 + 0.5) AS BIGINT) AS dq
         FROM cand WHERE vec_id < {PQ_NQ}),
adc AS (SELECT q.query_id, c.vec_id, sum(q.dq) AS s
        FROM codes c
        JOIN assign a ON a.vec_id = c.vec_id
        JOIN qtab q ON q.m = c.m AND q.k = c.code
        JOIN probes p ON p.query_id = q.query_id
                     AND p.k = a.bucket
        GROUP BY 1, 2)
SELECT query_id, vec_id,
       round(CAST(s AS DOUBLE) / 1000000000, 6) AS adist,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY s, vec_id) AS BIGINT) AS rank
FROM adc QUALIFY rank <= {PQ_TOPK}
"""




def q_embed_centroids(sf_dir):
    """Per-label embedding centroids (the k-means update step /
    class-prototype op, first 4 dims): per-batch fixed-point
    quantised integer sums (round(x * 2^20)) so the distributed
    accumulation is order-independent and the final float centroid is
    one deterministic IEEE expression — exactly reproducible in SQL,
    unlike a naive float mean whose value depends on reduce order."""
    em = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        arr = np.stack([np.asarray(v[:CENTROID_DIMS], dtype=np.float64)
                        for v in t["embedding"].to_pylist()])
        qz = np.floor(arr * CENTROID_Q + 0.5).astype(np.int64)
        cols = {"label": pa.array(lab),
                "n": pa.array(np.ones(len(lab), np.int64))}
        for j in range(CENTROID_DIMS):
            cols[f"s{j}"] = pa.array(qz[:, j])
        return pa.table(cols).group_by("label").aggregate(
            [(f"s{j}", "sum") for j in range(CENTROID_DIMS)]
            + [("n", "sum")]) \
            .rename_columns(["label"]
                            + [f"s{j}" for j in range(CENTROID_DIMS)]
                            + ["n"])

    agg = em.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("label").aggregate(
            *[Sum(f"s{j}", alias_name=f"s{j}")
              for j in range(CENTROID_DIMS)],
            Sum("n", alias_name="n"))

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        cols = {"label": pc.cast(t["label"], pa.int64()),
                "n": pc.cast(t["n"], pa.int64())}
        for j in range(CENTROID_DIMS):
            s = t[f"s{j}"].to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            cols[f"c{j}"] = pa.array(round6((s / CENTROID_Q) / n))
        return pa.table(cols)
    return agg.map_batches(finish, batch_format="pyarrow")


SQL_EMBED_CENTROIDS = f"""
WITH q AS (SELECT label,
""" + ",\n".join(
    f"        CAST(floor(embedding[{j + 1}] * {CENTROID_Q} + 0.5) "
    f"AS BIGINT) AS s{j}" for j in range(CENTROID_DIMS)) + f"""
           FROM embeddings)
SELECT CAST(label AS BIGINT) AS label, count(*) AS n,
""" + ",\n".join(
    f"       round((sum(s{j}) / {CENTROID_Q}.0) / count(*), 6) AS c{j}"
    for j in range(CENTROID_DIMS)) + """
FROM q GROUP BY label
"""


def q_knn_label_predict(sf_dir):
    """Semi-supervised kNN label inference over the exact cosine>=0.4
    similarity graph: each vector's predicted label is the plurality
    label of its neighbours (ties -> smallest label). Per-batch
    (vec_id, label) vote partials, one groupby, per-vertex vectorised
    argmax; the label map is the broadcast small side (one int per
    vector). ``correct`` compares against the vector's own label —
    the standard propagation-accuracy diagnostic."""
    import ray
    emb_full = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "label"]).to_pandas()
    nvec = int(emb_full["vec_id"].max()) + 1
    labels = np.full(nvec, -1, dtype=np.int64)
    labels[emb_full["vec_id"].to_numpy()] = \
        emb_full["label"].to_numpy().astype(np.int64)
    lab_ref = ray.put(labels)
    pairs = dd.embedding_cosine_pairs(
        _emb(sf_dir), threshold=FEATURE_PROP_THRESHOLD, use_lsh=False)

    def votes(t: pa.Table) -> pa.Table:
        lm = ray.get(lab_ref)
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = np.concatenate([b, a])
        u = np.concatenate([a, b])
        df = pd.DataFrame({"vec_id": v, "lbl": lm[u]})
        g = df.groupby(["vec_id", "lbl"], as_index=False).size()
        return pa.table({"vec_id": pa.array(g["vec_id"].to_numpy()),
                         "lbl": pa.array(g["lbl"].to_numpy()),
                         "c": pa.array(g["size"].to_numpy(np.int64))})

    agg = pairs.map_batches(votes, batch_format="pyarrow") \
        .groupby(["vec_id", "lbl"]).aggregate(Sum("c", alias_name="c"))

    def argmax(g: pd.DataFrame) -> pd.DataFrame:
        lm = ray.get(lab_ref)
        g = g.sort_values(["c", "lbl"], ascending=[False, True])
        vid = int(g["vec_id"].iloc[0])
        pred = int(g["lbl"].iloc[0])
        return pd.DataFrame({
            "vec_id": np.array([vid], np.int64),
            "pred_label": np.array([pred], np.int64),
            "n_nbrs": np.array([int(g["c"].sum())], np.int64),
            "correct": np.array([int(pred == lm[vid])], np.int64),
        })

    return agg.groupby("vec_id").map_groups(argmax,
                                            batch_format="pandas")


SQL_KNN_LABEL_PREDICT = """
WITH p AS (SELECT e1.vec_id AS a, e2.vec_id AS b
           FROM embeddings e1 JOIN embeddings e2
             ON e1.vec_id < e2.vec_id
           WHERE list_cosine_similarity(
                     CAST(e1.embedding AS DOUBLE[]),
                     CAST(e2.embedding AS DOUBLE[])) >= 0.4),
ed AS (SELECT a AS u, b AS v FROM p
       UNION ALL SELECT b AS u, a AS v FROM p),
votes AS (SELECT ed.v AS vec_id, e.label AS lbl, count(*) AS c
          FROM ed JOIN embeddings e ON e.vec_id = ed.u
          GROUP BY 1, 2),
best AS (SELECT vec_id, lbl, c,
                row_number() OVER (PARTITION BY vec_id
                                   ORDER BY c DESC, lbl) AS rk,
                sum(c) OVER (PARTITION BY vec_id) AS n_nbrs
         FROM votes)
SELECT b.vec_id, CAST(b.lbl AS BIGINT) AS pred_label,
       CAST(b.n_nbrs AS BIGINT) AS n_nbrs,
       CAST(CASE WHEN b.lbl = e.label THEN 1 ELSE 0 END AS BIGINT)
           AS correct
FROM best b JOIN embeddings e ON e.vec_id = b.vec_id
WHERE rk = 1
"""


def q_embed_quantize(sf_dir):
    """Per-vector int8 scalar quantization diagnostics (vector-store
    compression): scale = (max-min)/255, q = floor((x-min)/scale+0.5),
    reconstruction error = max |min + q*scale - x|. Pure map stage —
    each vector is complete within its row, nothing shuffles; every
    float op is written identically in the SQL oracle."""
    emb = _emb(sf_dir)

    def quant(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        arr = t["embedding"].combine_chunks()
        X = np.asarray(arr.flatten(), np.float64).reshape(len(arr), -1)
        mn = X.min(axis=1)
        mx = X.max(axis=1)
        sc = (mx - mn) / 255
        # constant vector: sc == 0 would give 0/0 NaN (and DuckDB's
        # 0/0 handling differs) — quantization is exact, err = 0
        safe = np.where(sc == 0, 1.0, sc)
        q = np.floor((X - mn[:, None]) / safe[:, None] + 0.5)
        err = np.abs(mn[:, None] + q * safe[:, None] - X).max(axis=1)
        err = np.where(sc == 0, 0.0, err)
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "vmin": pa.array(round6(mn)),
            "vmax": pa.array(round6(mx)),
            "max_err": pa.array(round6(err)),
        })

    return emb.map_batches(quant, batch_format="pyarrow",
                           zero_copy_batch=True)


SQL_EMBED_QUANTIZE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
s AS (SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx FROM e),
q AS (SELECT vec_id, mn, mx, (mx - mn) / 255 AS sc, v FROM s)
SELECT vec_id, round(mn, 6) AS vmin, round(mx, 6) AS vmax,
       CASE WHEN mx = mn THEN 0.0 ELSE
       round(list_max([abs(mn + floor((x - mn) / sc + 0.5) * sc - x)
                       for x in v]), 6) END AS max_err
FROM q
"""


def q_embed_components(sf_dir):
    """Embedding clustering via connected components of the exact
    cosine>=0.4 similarity graph: the vector analogue of near-dup
    clustering — pairs stream into Dataset-built CSR blocks and the
    sharded min-label BSP kernel runs as on any other graph (kernels
    are graph-source-agnostic). Output covers vectors with >= 1
    neighbour; component id = min vec_id in the component."""
    from ..dist.blocks import symmetrize_edges
    emb = _emb(sf_dir)
    nvec = int(rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id"]).max("vec_id")) + 1
    pairs = dd.embedding_cosine_pairs(
        emb, threshold=FEATURE_PROP_THRESHOLD, use_lsh=False)

    def as_edges(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["a"], "dst": t["b"]})

    edges = symmetrize_edges(pairs.map_batches(
        as_edges, batch_format="pyarrow", zero_copy_batch=True))
    g = DistGraph.from_dataset(edges, n=nvec, P=4, directed=False,
                               dedup=True)
    lab, _ = ss.connected_components(g)
    vids = np.flatnonzero(g.active_global()).astype(np.int64)
    return pa.table({"vec_id": pa.array(vids),
                     "component": pa.array(lab[vids].astype(np.int64))})


SQL_EMBED_COMPONENTS = """
WITH RECURSIVE
p AS (SELECT e1.vec_id AS a, e2.vec_id AS b
      FROM embeddings e1 JOIN embeddings e2 ON e1.vec_id < e2.vec_id
      WHERE list_cosine_similarity(
                CAST(e1.embedding AS DOUBLE[]),
                CAST(e2.embedding AS DOUBLE[])) >= 0.4),
e AS (SELECT a, b FROM p UNION SELECT b, a FROM p),
verts AS (SELECT DISTINCT a AS v FROM e),
reach(v, u) AS (
  SELECT v, v FROM verts
  UNION
  SELECT r.v, e.b FROM reach r JOIN e ON e.a = r.u
)
SELECT v AS vec_id, CAST(min(u) AS BIGINT) AS component
FROM reach GROUP BY v
"""


# ----------------------------------------------------------------------
# hard-negative mining (contrastive-training corpus prep)
# ----------------------------------------------------------------------
HARDNEG_NQ = 5


def q_ann_hard_negatives(sf_dir):
    """Hard-negative mining for contrastive training: for each query
    vector, the single most-similar vector with a DIFFERENT label —
    the negatives that actually move a contrastive loss. Same
    per-batch partial-top-k envelope as ``ann_topk`` (driver sees one
    winner per query per batch, never the corpus); the label-mismatch
    mask replaces the top-k cut."""
    import ray
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding", "label"])
    qdf = emb.filter(expr=f"vec_id < {HARDNEG_NQ}").to_pandas() \
        .sort_values("vec_id")
    qv = np.stack([np.asarray(v, dtype=np.float64)
                   for v in qdf["embedding"]])
    qn = np.linalg.norm(qv, axis=1)
    qn[qn == 0] = 1.0
    q_ref = ray.put(qv / qn[:, None])
    qid = qdf["vec_id"].to_numpy(np.int64)
    qlab = qdf["label"].to_numpy(np.int64)

    def partial(t: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        vec = annm._to_matrix(t["embedding"])
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        norm = np.linalg.norm(vec, axis=1)
        norm[norm == 0] = 1.0
        sim = (vec / norm[:, None]) @ qm.T
        out = {"qj": [], "vec_id": [], "cos": [], "neg_label": []}
        for j in range(qm.shape[0]):
            mask = lab != qlab[j]
            if not mask.any():
                continue
            s, i, l2 = sim[mask, j], ids[mask], lab[mask]
            w = np.lexsort((i, -s))[0]
            out["qj"].append(j)
            out["vec_id"].append(i[w])
            out["cos"].append(s[w])
            out["neg_label"].append(l2[w])
        return pa.table({k: pa.array(np.asarray(v, dtype=np.int64)
                                     if k != "cos"
                                     else np.asarray(v, np.float64))
                         for k, v in out.items()})

    parts = emb.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas()
    rows = {"query_id": [], "vec_id": [], "cos": [], "neg_label": []}
    for j in range(len(qid)):
        sub = parts[parts.qj == j]
        if not len(sub):
            continue
        w = np.lexsort((sub.vec_id.to_numpy(),
                        -sub.cos.to_numpy()))[0]
        rows["query_id"].append(int(qid[j]))
        rows["vec_id"].append(int(sub.vec_id.to_numpy()[w]))
        rows["cos"].append(float(round6(sub.cos.to_numpy()[w])))
        rows["neg_label"].append(int(sub.neg_label.to_numpy()[w]))
    return pa.table({
        "query_id": pa.array(rows["query_id"], pa.int64()),
        "vec_id": pa.array(rows["vec_id"], pa.int64()),
        "cos": pa.array(rows["cos"], pa.float64()),
        "neg_label": pa.array(rows["neg_label"], pa.int64()),
    })


SQL_ANN_HARD_NEGATIVES = f"""
WITH ranked AS (
  SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
         round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])), 6)
             AS cos,
         CAST(e.label AS BIGINT) AS neg_label,
         row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(
                 CAST(q.embedding AS DOUBLE[]),
                 CAST(e.embedding AS DOUBLE[])) DESC, e.vec_id) AS rn
  FROM embeddings q JOIN embeddings e ON q.label <> e.label
  WHERE q.vec_id < {HARDNEG_NQ})
SELECT query_id, vec_id, cos, neg_label FROM ranked WHERE rn = 1
"""


def q_ann_recall(sf_dir):
    """Recall@10 of the IVF index against brute-force ground truth,
    per query — the retrieval-quality eval every ANN deployment
    publishes (and the quantified answer to "what did probing
    nprobe buckets cost?"). Runs exactly the two gate-green
    pipelines (``ann_ivf_fixed``, ``ann_topk``) and joins their
    result sets; |Q| x k rows of driver state."""
    bf = q_ann_topk(sf_dir).to_pandas()
    ivf = q_ann_ivf_fixed(sf_dir).to_pandas()
    hit = bf.merge(ivf[["query_id", "vec_id"]],
                   on=["query_id", "vec_id"], how="left",
                   indicator=True)
    g = hit.groupby("query_id")["_merge"] \
        .apply(lambda s: int((s == "both").sum()))
    qids = np.sort(g.index.to_numpy())
    n_hit = g[qids].to_numpy(np.int64)
    return pa.table({
        "query_id": pa.array(qids.astype(np.int64)),
        "n_hit": pa.array(n_hit),
        "recall": pa.array(round6(n_hit / 10.0)),
    })


def _sql_ann_recall():
    return f"""
WITH bf AS (SELECT * FROM ({SQL_ANN_TOPK}) t),
ivf AS (SELECT * FROM ({SQL_ANN_IVF_FIXED}) t)
SELECT bf.query_id,
       CAST(count(ivf.vec_id) AS BIGINT) AS n_hit,
       ROUND(count(ivf.vec_id) / 10.0, 6) AS recall
FROM bf LEFT JOIN ivf ON ivf.query_id = bf.query_id
                     AND ivf.vec_id = bf.vec_id
GROUP BY bf.query_id
"""


PCA_DIM = 64
PCA_QSCALE = 1e6
PCA_ITERS = 3
RP_K = 16  # JL target dimensionality (sqrt(16) = 4 is float-exact)


def q_embed_rp(sf_dir):
    """Johnson-Lindenstrauss random projection of the embedding
    corpus to RP_K=16 dims with a deterministic ±1 sign matrix
    (Achlioptas 2003 database-friendly projection) — the cheap
    dimensionality-reduction front of LSH / ANN pipelines.
    ``y_k = (1/sqrt(K)) * sum_i s(k,i) * x_i`` with
    ``s(k,i) = ±1`` from ``md5("rp:k:i") % 2`` (the repo's shared
    hash convention, replicated bit-for-bit in the oracle).

    Exactness: with 1e6-quantised embeddings each projection is an
    exact integer dot product; ``y = round6(yq/1e6/4)`` (sqrt(16)=4
    exactly). ONE shuffle-free map_batches pass against the
    broadcast 16x64 sign matrix; output is long-format
    (vec_id, k, y)."""
    import hashlib

    S = np.empty((RP_K, PCA_DIM), dtype=np.int64)
    for k in range(RP_K):
        for i in range(1, PCA_DIM + 1):
            h = int(hashlib.md5(
                f"rp:{k}:{i}".encode()).hexdigest()[:16], 16)
            S[k, i - 1] = 1 if h % 2 == 0 else -1

    def project(t: pa.Table) -> pa.Table:
        X = np.stack([np.asarray(v, dtype=np.float64)
                      for v in t["embedding"].to_pylist()])
        xq = np.floor(X * PCA_QSCALE + 0.5).astype(np.int64)
        Y = xq @ S.T  # (B, K) exact ints
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        B = len(ids)
        return pa.table({
            "vec_id": pa.array(np.repeat(ids, RP_K)),
            "k": pa.array(np.tile(np.arange(RP_K, dtype=np.int64), B)),
            "y": pa.array(round6(Y.reshape(-1) / 1e6 / 4)),
        })

    return _emb(sf_dir).map_batches(project, batch_format="pyarrow",
                                    zero_copy_batch=True)


SQL_EMBED_RP = f"""
WITH emb AS (SELECT vec_id, i,
                    CAST(floor(CAST(embedding[i] AS DOUBLE)
                               * {PCA_QSCALE} + 0.5) AS BIGINT) AS xq
             FROM embeddings, generate_series(1, {PCA_DIM}) gs(i)),
s AS (SELECT k, i,
             CASE WHEN ('0x' || substr(md5('rp:' || k || ':' || i),
                                       1, 16))::UBIGINT % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM generate_series(0, {RP_K - 1}) g1(k),
           generate_series(1, {PCA_DIM}) g2(i)),
p AS (SELECT e.vec_id, s.k, CAST(sum(e.xq * s.sgn) AS BIGINT) AS yq
      FROM emb e JOIN s USING (i) GROUP BY 1, 2)
SELECT vec_id, CAST(k AS BIGINT) AS k,
       ROUND(CAST(yq AS DOUBLE) / 1e6 / 4, 6) AS y
FROM p
"""


def q_embed_pca(sf_dir):
    """Leading principal direction of the embedding corpus — the
    whitening / SemDeDup-preprocessing step of embedding pipelines —
    via a FIXED 3-step integer power iteration so the whole job is
    exactly SQL-expressible (the ``kmeans_fixed`` convention for
    iterative algorithms). The 3-step iterate is the *defined output*
    (bit-pinned by the oracle): it converges geometrically in the
    covariance eigengap, so on real anisotropic corpora it IS the top
    PC, while on gap-free isotropic noise it is the exact 3-step
    Rayleigh ascent from the all-ones start (monotone-improvement
    property pinned in pytest).

    Exactness: embeddings quantise to 1e6 fixed point; the
    covariance NUMERATOR ``N = n * Sxx - Sx Sxᵀ`` is an exact integer
    matrix (order-independent at any partitioning), and each power
    step ``u = N @ v`` stays in exact integers, renormalised by
    ``floor(double(u) * 1e9 / double(max|u|))`` — one identical IEEE
    expression per entry on both engines (scale-free, so no fixed
    divisor can underflow). The loading vector is reported as
    ``round6(s * r / sqrt(sum r^2))`` with the sign ``s`` fixed by
    the first nonzero entry. Plan: ONE map_batches pass emits
    per-batch integer ``(Sx, Sxx)`` partials (64 rows x 66 cols;
    driver folds O(D^2) scalars per batch — independent of corpus
    size); the 3 matvecs are 64x64 driver-side Python-int ops."""
    load = _pca_loadings(sf_dir)
    if load is None:
        return pa.table({"dim": pa.array([], pa.int64()),
                         "loading": pa.array([], pa.float64())})
    return pa.table({
        "dim": pa.array(np.arange(PCA_DIM, dtype=np.int64)),
        "loading": pa.array(load, pa.float64()),
    })


def _pca_loadings(sf_dir):
    """The 3-step integer power iterate of ``q_embed_pca`` as a
    round6 float64 loading list (None if the covariance is zero —
    the oracle's empty-result case)."""
    import math

    emb = _emb(sf_dir)
    D = PCA_DIM

    def partials(t: pa.Table) -> pa.Table:
        X = np.stack([np.asarray(v, dtype=np.float64)
                      for v in t["embedding"].to_pylist()])
        assert X.shape[1] == D
        xq = np.floor(X * PCA_QSCALE + 0.5).astype(np.int64)
        sxx = xq.T @ xq
        cols = {"i": pa.array(np.arange(D, dtype=np.int64)),
                "n": pa.array(np.full(D, len(xq), dtype=np.int64)),
                "sx": pa.array(xq.sum(axis=0))}
        for j in range(D):
            cols[f"s{j}"] = pa.array(sxx[:, j])
        return pa.table(cols)

    df = emb.map_batches(partials, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    g = df.groupby("i").sum()
    n = int(df[df["i"] == 0]["n"].sum())
    sx = [int(v) for v in g["sx"]]
    N = [[n * int(g[f"s{j}"].iloc[i]) - sx[i] * sx[j]
          for j in range(D)] for i in range(D)]

    v = [1] * D
    for _ in range(PCA_ITERS):
        u = [sum(N[i][j] * v[j] for j in range(D)) for i in range(D)]
        m = max(abs(x) for x in u)
        if m == 0:  # zero covariance: the oracle's r-CTEs go empty
            return None
        v = [math.floor((float(x) * 1e9) / float(m)) for x in u]

    n2 = sum(x * x for x in v)
    s = 1
    for x in v:
        if x != 0:
            s = -1 if x < 0 else 1
            break
    denom = math.sqrt(float(n2)) if n2 else 1.0
    return [round6(float(s * x) / denom) for x in v]


# shared CTE chain: quantised embeddings -> exact integer covariance
# numerator -> 3 scale-free integer power steps -> loading vector
_SQL_PCA_CTES = f"""emb AS (SELECT vec_id, i,
                    CAST(floor(CAST(embedding[i] AS DOUBLE)
                               * {PCA_QSCALE} + 0.5) AS BIGINT) AS xq
             FROM embeddings, generate_series(1, {PCA_DIM}) gs(i)),
nv AS (SELECT count(*) AS n FROM embeddings),
sx AS (SELECT i, CAST(sum(xq) AS HUGEINT) AS sx FROM emb GROUP BY i),
sxx AS (SELECT a.i AS i, b.i AS j,
               CAST(sum(a.xq * b.xq) AS HUGEINT) AS sxx
        FROM emb a JOIN emb b USING (vec_id) GROUP BY 1, 2),
cov AS (SELECT sxx.i, sxx.j,
               nv.n * sxx.sxx - sa.sx * sb.sx AS c
        FROM sxx JOIN sx sa ON sa.i = sxx.i
                 JOIN sx sb ON sb.i = sxx.j
        CROSS JOIN nv),
u1 AS (SELECT i, CAST(sum(c) AS HUGEINT) AS u FROM cov GROUP BY i),
m1 AS (SELECT max(abs(u)) AS m FROM u1),
r1 AS (SELECT i, CAST(floor((CAST(u AS DOUBLE) * 1e9)
                            / CAST(m AS DOUBLE)) AS HUGEINT) AS val
       FROM u1, m1 WHERE m <> 0),
u2 AS (SELECT cov.i, CAST(sum(cov.c * r1.val) AS HUGEINT) AS u
       FROM cov JOIN r1 ON r1.i = cov.j GROUP BY cov.i),
m2 AS (SELECT max(abs(u)) AS m FROM u2),
r2 AS (SELECT i, CAST(floor((CAST(u AS DOUBLE) * 1e9)
                            / CAST(m AS DOUBLE)) AS HUGEINT) AS val
       FROM u2, m2 WHERE m <> 0),
u3 AS (SELECT cov.i, CAST(sum(cov.c * r2.val) AS HUGEINT) AS u
       FROM cov JOIN r2 ON r2.i = cov.j GROUP BY cov.i),
m3 AS (SELECT max(abs(u)) AS m FROM u3),
r3 AS (SELECT i, CAST(floor((CAST(u AS DOUBLE) * 1e9)
                            / CAST(m AS DOUBLE)) AS HUGEINT) AS val
       FROM u3, m3 WHERE m <> 0),
n2 AS (SELECT CAST(sum(val * val) AS HUGEINT) AS n2 FROM r3),
sgn AS (SELECT COALESCE((SELECT CASE WHEN val < 0 THEN -1 ELSE 1 END
                         FROM r3 WHERE val <> 0 ORDER BY i LIMIT 1),
                        1) AS s),
pca AS (SELECT r3.i AS i,
               ROUND(CAST(sgn.s * r3.val AS DOUBLE)
                     / sqrt(CAST(n2.n2 AS DOUBLE)), 6) AS loading
        FROM r3, n2, sgn)"""

SQL_EMBED_PCA = f"""
WITH {_SQL_PCA_CTES}
SELECT CAST(i - 1 AS BIGINT) AS dim, loading FROM pca
"""


def q_embed_detop(sf_dir):
    """All-but-the-top common-component removal (Mu & Viswanath
    2018) — the embedding post-processing step that strips the
    corpus-wide dominant direction before similarity search: per
    vector, the projection coefficient onto the ``embed_pca``
    leading direction, ``coef = <x, v>``. Vectors with large |coef|
    are dominated by the common component; downstream ANN subtracts
    ``coef * v``.

    Exactness: the loading vector is the gate-pinned round6 output
    of ``q_embed_pca`` (identical on both engines), re-quantised to
    1e6 fixed point; with the 1e6-quantised embeddings the dot
    product is an exact integer sum — order-independent — and
    ``coef = round6(cq / 1e12)``. One shuffle-free map_batches pass
    against the broadcast 64-float direction."""
    load = _pca_loadings(sf_dir)
    if load is None:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "coef": pa.array([], pa.float64())})
    vq = np.floor(np.asarray(load) * 1e6 + 0.5).astype(np.int64)

    def coef(t: pa.Table) -> pa.Table:
        X = np.stack([np.asarray(v, dtype=np.float64)
                      for v in t["embedding"].to_pylist()])
        xq = np.floor(X * PCA_QSCALE + 0.5).astype(np.int64)
        cq = xq @ vq
        return pa.table({
            "vec_id": pc.cast(t["vec_id"], pa.int64()),
            "coef": pa.array(round6(cq / 1e12)),
        })

    return _emb(sf_dir).map_batches(coef, batch_format="pyarrow",
                                    zero_copy_batch=True)


SQL_EMBED_DETOP = f"""
WITH {_SQL_PCA_CTES},
vq AS (SELECT i, CAST(floor(loading * 1e6 + 0.5) AS BIGINT) AS vq
       FROM pca),
c AS (SELECT e.vec_id, CAST(sum(e.xq * v.vq) AS BIGINT) AS cq
      FROM emb e JOIN vq v USING (i) GROUP BY 1)
SELECT vec_id, ROUND(CAST(cq AS DOUBLE) / 1e12, 6) AS coef
FROM c
"""
