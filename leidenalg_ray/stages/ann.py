"""Similarity search over an embedding column (task brief).

- ``brute_force_topk``: baseline — the query matrix is broadcast once
  (``ray.put``), every batch does one numpy matmul against it, partial
  top-k per batch, final top-k in a tiny driver-side reduce. No
  shuffle at all; scales linearly in corpus size.
- ``ivf_topk``: the scale path — k-means coarse quantiser (trained on a
  sample), vectors bucketed by nearest centroid (one groupby), queries
  probe the ``nprobe`` nearest centroids only.

Cosine similarities are computed in float64 and rounded to 6 decimals,
matching the DuckDB oracle (``list_cosine_similarity``).
"""

from __future__ import annotations

import numpy as np

from leidenalg_ray.util import round6
import pyarrow as pa
import ray


def _to_matrix(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64)
                     for v in col.to_pylist()])


def brute_force_topk(emb_ds, query_vecs, query_ids, k=10):
    """Top-k cosine neighbours per query vector.

    Returns Dataset (query_id, vec_id, cos, rank) with rank 1..k,
    deterministic tie-break (higher cos first, then lower vec_id).
    Self-matches (same vec_id as the query id) are NOT excluded — the
    oracle keeps them too.
    """
    q = np.asarray(query_vecs, dtype=np.float64)
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    q_unit = q / qn[:, None]
    q_ref = ray.put(q_unit)
    qid = np.asarray(query_ids, dtype=np.int64)

    def partial(t: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        vec = _to_matrix(t["embedding"])
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        norm = np.linalg.norm(vec, axis=1)
        norm[norm == 0] = 1.0
        sim = (vec / norm[:, None]) @ qm.T  # (batch, Q)
        out_q, out_v, out_c = [], [], []
        kk = min(k, len(ids))
        for j in range(qm.shape[0]):
            s = sim[:, j]
            idx = np.lexsort((ids, -s))[:kk]
            out_q.append(np.full(kk, j, dtype=np.int64))
            out_v.append(ids[idx])
            out_c.append(s[idx])
        return pa.table({
            "qj": pa.array(np.concatenate(out_q)),
            "vec_id": pa.array(np.concatenate(out_v)),
            "cos": pa.array(np.concatenate(out_c)),
        })

    parts = emb_ds.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
    # final top-k per query (tiny: Q * k * n_batches rows)
    rows = {"query_id": [], "vec_id": [], "cos": [], "rank": []}
    for j in range(len(qid)):
        sub = parts[parts.qj == j]
        order = np.lexsort((sub.vec_id.to_numpy(),
                            -sub.cos.to_numpy()))[:k]
        rows["query_id"] += [int(qid[j])] * len(order)
        rows["vec_id"] += sub.vec_id.to_numpy()[order].tolist()
        rows["cos"] += round6(sub.cos.to_numpy()[order]).tolist()
        rows["rank"] += list(range(1, len(order) + 1))
    return pa.table({
        "query_id": pa.array(rows["query_id"], pa.int64()),
        "vec_id": pa.array(rows["vec_id"], pa.int64()),
        "cos": pa.array(rows["cos"], pa.float64()),
        "rank": pa.array(rows["rank"], pa.int64()),
    })


def ivf_topk(emb_ds, query_vecs, query_ids, k=10, n_centroids=16,
             nprobe=4, seed=3, sample_size=2048, kmeans_iters=10,
             centroids=None):
    """IVF approximate top-k: k-means centroids from a sample, vectors
    assigned to nearest centroid (groupby shuffle), queries search the
    nprobe nearest centroid buckets.

    Pass ``centroids`` (array, normalised or not) to skip the k-means
    training — with a deterministic centroid choice the whole pipeline
    (assignment argmax, probe ranking, bucketed search) has an exact
    SQL oracle (``SQL_ANN_IVF_FIXED``)."""
    if centroids is not None:
        cent = np.asarray(centroids, dtype=np.float64)
        cent = cent / np.maximum(np.linalg.norm(cent, axis=1),
                                 1e-12)[:, None]
    else:
        sample = emb_ds.limit(sample_size).to_pandas()
        X = np.stack([np.asarray(v, dtype=np.float64)
                      for v in sample["embedding"]])
        Xn = X / np.maximum(np.linalg.norm(X, axis=1), 1e-12)[:, None]
        rng = np.random.default_rng(seed)
        cent = Xn[rng.choice(len(Xn), min(n_centroids, len(Xn)),
                             replace=False)]
        for _ in range(kmeans_iters):
            assign = np.argmax(Xn @ cent.T, axis=1)
            for c in range(len(cent)):
                m = assign == c
                if m.any():
                    v = Xn[m].mean(axis=0)
                    cent[c] = v / max(np.linalg.norm(v), 1e-12)
    cent_ref = ray.put(cent)

    def bucketize(t: pa.Table) -> pa.Table:
        cm = ray.get(cent_ref)
        vec = _to_matrix(t["embedding"])
        norm = np.maximum(np.linalg.norm(vec, axis=1), 1e-12)
        unit = vec / norm[:, None]
        b = np.argmax(unit @ cm.T, axis=1)
        return pa.table({
            "bucket": pa.array(b.astype(np.int64)),
            "vec_id": pa.array(t["vec_id"].to_numpy(
                zero_copy_only=False).astype(np.int64)),
            "unit": pa.array(list(unit)),
        })

    q = np.asarray(query_vecs, dtype=np.float64)
    q_unit = q / np.maximum(np.linalg.norm(q, axis=1), 1e-12)[:, None]
    # lexsort: deterministic tie-break (higher dot first, lower
    # centroid id on ties) — matches the SQL oracle's ORDER BY
    qdots = q_unit @ cent.T
    probes = np.stack([
        np.lexsort((np.arange(cent.shape[0]), -qdots[j]))[:nprobe]
        for j in range(qdots.shape[0])])
    qid = np.asarray(query_ids, dtype=np.int64)
    q_ref = ray.put((q_unit, probes, qid))

    def search(t: pa.Table) -> pa.Table:
        qm, pr, qids = ray.get(q_ref)
        b = int(t["bucket"][0].as_py())
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        unit = np.stack([np.asarray(u, dtype=np.float64)
                         for u in t["unit"].to_pylist()])
        out_q, out_v, out_c = [], [], []
        for j in range(qm.shape[0]):
            if b not in pr[j]:
                continue
            s = unit @ qm[j]
            kk = min(k, len(ids))
            idx = np.lexsort((ids, -s))[:kk]
            out_q += [int(qids[j])] * kk
            out_v += ids[idx].tolist()
            out_c += s[idx].tolist()
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "cos": pa.array(out_c, pa.float64())})

    parts = emb_ds.map_batches(bucketize, batch_format="pyarrow") \
                  .groupby("bucket") \
                  .map_groups(search, batch_format="pyarrow").to_pandas()
    rows = {"query_id": [], "vec_id": [], "cos": [], "rank": []}
    for j in np.unique(parts.query_id):
        sub = parts[parts.query_id == j]
        order = np.lexsort((sub.vec_id.to_numpy(),
                            -sub.cos.to_numpy()))[:k]
        rows["query_id"] += [int(j)] * len(order)
        rows["vec_id"] += sub.vec_id.to_numpy()[order].tolist()
        rows["cos"] += round6(sub.cos.to_numpy()[order]).tolist()
        rows["rank"] += list(range(1, len(order) + 1))
    return pa.table({k2: pa.array(v) for k2, v in rows.items()})
