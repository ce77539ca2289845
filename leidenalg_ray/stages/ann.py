"""Similarity search over an embedding column (task brief).

- ``brute_force_topk``: baseline — the query matrix is broadcast once
  (``ray.put``), every batch does one numpy matmul against it, partial
  top-k per batch, final top-k in a tiny driver-side reduce. No
  shuffle at all; scales linearly in corpus size.
- ``ivf_topk``: the scale path — k-means coarse quantiser (trained on a
  sample, ~sqrt(n) centroids), queries probe the ``nprobe`` nearest
  centroids only; assignment + probed search fused into a single
  shuffle-free ``map_batches`` pass with per-batch partial top-k.

Cosine similarities are computed in float64 and rounded to 6 decimals,
matching the DuckDB oracle (``list_cosine_similarity``).
"""

from __future__ import annotations

import numpy as np

from leidenalg_ray.util import round6
import pyarrow as pa
import ray


def _to_matrix(col) -> np.ndarray:
    """Embedding list column -> (n, d) float64 matrix via the flat
    Arrow child buffer (one cast, no per-row Python)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
        else col
    if len(arr) == 0:
        return np.empty((0, 0))
    flat = np.asarray(arr.flatten(), dtype=np.float64)
    return flat.reshape(len(arr), -1)


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


def ivf_topk(emb_ds, query_vecs, query_ids, k=10, n_centroids=None,
             nprobe=4, seed=3, sample_size=2048, kmeans_iters=10,
             centroids=None):
    """IVF approximate top-k: k-means centroids from a sample, vectors
    assigned to nearest centroid, queries search only the ``nprobe``
    nearest centroid buckets.

    Scale plan: NO shuffle — assignment and probed search happen in
    one ``map_batches`` pass (each batch keeps the rows whose bucket
    is probed by each query and emits a per-batch partial top-k), so
    a hot bucket never lands in a single task and the driver reduce
    sees only Q*k*n_batches rows. ``n_centroids=None`` scales as
    ~sqrt(corpus) (IVF's classic balance point), floor 16.

    Pass ``centroids`` (array, normalised or not) to skip the k-means
    training — with a deterministic centroid choice the whole pipeline
    (assignment argmax, probe ranking, probed search) has an exact
    SQL oracle (``SQL_ANN_IVF_FIXED``)."""
    if centroids is not None:
        cent = np.asarray(centroids, dtype=np.float64)
        cent = cent / np.maximum(np.linalg.norm(cent, axis=1),
                                 1e-12)[:, None]
    else:
        if n_centroids is None:
            n_centroids = max(16, int(np.sqrt(emb_ds.count())))
        sample = emb_ds.limit(max(sample_size,
                                  4 * n_centroids)).to_pandas()
        X = _to_matrix(pa.chunked_array(
            [pa.array(list(sample["embedding"]))]))
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

    q = np.asarray(query_vecs, dtype=np.float64)
    q_unit = q / np.maximum(np.linalg.norm(q, axis=1), 1e-12)[:, None]
    # lexsort: deterministic tie-break (higher dot first, lower
    # centroid id on ties) — matches the SQL oracle's ORDER BY
    qdots = q_unit @ cent.T
    probes = np.stack([
        np.lexsort((np.arange(cent.shape[0]), -qdots[j]))[:nprobe]
        for j in range(qdots.shape[0])])
    qid = np.asarray(query_ids, dtype=np.int64)
    q_ref = ray.put((cent, q_unit, probes, qid))

    def search(t: pa.Table) -> pa.Table:
        cm, qm, pr, qids = ray.get(q_ref)
        vec = _to_matrix(t["embedding"])
        norm = np.maximum(np.linalg.norm(vec, axis=1), 1e-12)
        unit = vec / norm[:, None]
        b = np.argmax(unit @ cm.T, axis=1)
        ids = t["vec_id"].to_numpy(zero_copy_only=False) \
               .astype(np.int64)
        out_q, out_v, out_c = [], [], []
        for j in range(qm.shape[0]):
            m = np.isin(b, pr[j])
            if not m.any():
                continue
            s = unit[m] @ qm[j]
            mids = ids[m]
            kk = min(k, len(mids))
            idx = np.lexsort((mids, -s))[:kk]
            out_q += [int(qids[j])] * kk
            out_v += mids[idx].tolist()
            out_c += s[idx].tolist()
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "cos": pa.array(out_c, pa.float64())})

    parts = emb_ds.map_batches(search, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
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
