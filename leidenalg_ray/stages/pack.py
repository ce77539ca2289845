"""Training-set assembly operators: deterministic sampling, split
assignment, and sequence packing (the steps between a cleaned corpus
and a tokenised training shard; task-brief layer, no reference
counterpart).

All decisions derive from md5-based hashes or doc_id order so every
operator has an exact DuckDB oracle and reruns are reproducible
shard-by-shard.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .text import TokenStats


def _id_hash(ids) -> np.ndarray:
    """Stable 64-bit per-doc hash: first 8 bytes of
    ``md5(str(doc_id))`` big-endian — exactly
    ``('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT``
    in DuckDB (same construction as ``text.hash_token``)."""
    out = np.empty(len(ids), dtype=np.uint64)
    for i, d in enumerate(ids):
        out[i] = int.from_bytes(
            hashlib.md5(str(d).encode()).digest()[:8], "big")
    return out


def hash_sample(docs_ds, mod=10, keep=0):
    """Deterministic corpus sample: keep docs whose id-hash lands in
    residue ``keep`` mod ``mod`` (~1/mod of the corpus, stable across
    runs and shards — the reproducible alternative to random
    sampling). Output: (doc_id,) of kept docs."""

    def pick(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        h = _id_hash(ids)
        m = (h % np.uint64(mod)) == np.uint64(keep)
        return pa.table({"doc_id": pa.array(ids[m])})

    return docs_ds.map_batches(pick, batch_format="pyarrow",
                               zero_copy_batch=True)


def hash_split(docs_ds, train_pct=80, val_pct=10):
    """Deterministic train/val/test assignment by id-hash percentile:
    ``h % 100 < train_pct`` -> train, ``< train_pct+val_pct`` -> val,
    else test. Output: (doc_id, split)."""

    def assign(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        r = (_id_hash(ids) % np.uint64(100)).astype(np.int64)
        split = np.where(r < train_pct, "train",
                         np.where(r < train_pct + val_pct, "val",
                                  "test"))
        return pa.table({"doc_id": pa.array(ids),
                         "split": pa.array(split)})

    return docs_ds.map_batches(assign, batch_format="pyarrow",
                               zero_copy_batch=True)


def pack_chunks(docs_ds, budget=512, bucket_size=256, concurrency=4):
    """Sequence packing: assign each doc (in doc_id order) to the
    training chunk it starts in, ``chunk_id = (sum of n_tokens of all
    docs with smaller doc_id) // budget`` — the greedy concat-and-cut
    packing a pretraining pipeline runs, expressed as a DISTRIBUTED
    PREFIX SCAN:

    1. token counts per doc (actor-pool ``TokenStats``),
    2. per-batch partial sums per id-range bucket (``doc_id //
       bucket_size``) -> a bucket-count-sized groupby,
    3. the driver turns bucket totals into exclusive offsets (O(
       n_docs / bucket_size) — the only driver state) and broadcasts,
    4. one hash shuffle on bucket: each group sorts its own id range,
       local cumsum + bucket offset -> chunk assignment.

    Order semantics are by doc_id VALUE, not physical row order, so
    the result is independent of block arrival order. Output:
    (doc_id, n_tokens, chunk_id).
    """
    import ray
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    toks = docs_ds.map_batches(TokenStats, batch_format="pyarrow",
                               batch_size=2048, zero_copy_batch=True,
                               concurrency=(1, concurrency)) \
        .select_columns(["doc_id", "n_tokens"])

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.divide(t["doc_id"], bucket_size), pa.int64())
        tt = t.append_column("bucket", b)
        part = tt.group_by("bucket").aggregate([("n_tokens", "sum")]) \
            .rename_columns(["bucket", "n_tokens"])
        return part

    bucket_totals = toks.map_batches(add_bucket,
                                     batch_format="pyarrow",
                                     zero_copy_batch=True) \
        .groupby("bucket").aggregate(Sum("n_tokens", alias_name="tot")) \
        .to_pandas()
    bucket_totals = bucket_totals.sort_values("bucket")
    buckets = bucket_totals["bucket"].to_numpy(np.int64)
    offsets = np.concatenate(
        [[0], np.cumsum(bucket_totals["tot"].to_numpy(np.int64))[:-1]])
    off_ref = ray.put((buckets, offsets))

    def assign(t: pa.Table) -> pa.Table:
        bkts, offs = ray.get(off_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        n = t["n_tokens"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, n = ids[order], n[order]
        prev = np.concatenate([[0], np.cumsum(n)[:-1]])
        base = offs[np.searchsorted(bkts, ids[0] // bucket_size)] \
            if len(ids) else 0
        chunk = (base + prev) // budget
        return pa.table({"doc_id": pa.array(ids),
                         "n_tokens": pa.array(n),
                         "chunk_id": pa.array(chunk.astype(np.int64))})

    def per_bucket(t: pa.Table) -> pa.Table:
        # one group == one bucket (groupby key), so a single base
        # offset covers the whole table
        return assign(t)

    bucketed = toks.map_batches(
        lambda t: t.append_column(
            "bucket", pa.array(
                (t["doc_id"].to_numpy(zero_copy_only=False)
                 // bucket_size).astype(np.int64))),
        batch_format="pyarrow", zero_copy_batch=True)
    return bucketed.groupby("bucket").map_groups(
        per_bucket, batch_format="pyarrow") \
        .select_columns(["doc_id", "n_tokens", "chunk_id"])


def global_shuffle_rank(docs_ds, seed=17, B=None):
    """Seeded global training order: every doc gets a dense rank
    0..n-1 in the order of ``md5(seed || ':' || doc_id)`` — the
    deterministic, resumable equivalent of ``random_shuffle`` for
    fixing a training curriculum (same order on every rerun, any
    parallelism, any shard layout).

    Shape (100-TB path): the md5 keys are uniform, so the first two
    hex digits give ORDER-COMPATIBLE range buckets; one bucket-count
    groupby (B rows) -> exclusive driver offsets (O(B) state) -> a
    per-bucket key sort assigns ranks without ever sorting the corpus
    globally — the same distributed prefix-rank as
    ``graph_build.assign_ids``, but over a range partition so rank
    equals the global row_number of the SQL twin. B=None scales
    bucket count with the corpus (ceil(n/128Ki), floor 16, cap 256
    since the bucket key is one md5 byte)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    if B is None:
        docs_ds = docs_ds.materialize()
        B = int(min(256, max(16, -(-docs_ds.count() // (1 << 17)))))

    def with_key(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        keys = [hashlib.md5(f"{seed}:{d}".encode()).hexdigest()
                for d in ids]
        buckets = np.fromiter((int(k[:2], 16) * B // 256 for k in keys),
                              dtype=np.int64, count=len(keys))
        return pa.table({"doc_id": pa.array(ids.astype(np.int64)),
                         "key": pa.array(keys, pa.string()),
                         "bucket": pa.array(buckets)})

    keyed = docs_ds.select_columns(["doc_id"]) \
        .map_batches(with_key, batch_format="pyarrow",
                     zero_copy_batch=True).materialize()
    counts = keyed.groupby("bucket").aggregate(
        Count(alias_name="n")).to_pandas()
    offsets = np.zeros(B + 1, dtype=np.int64)
    for _, row in counts.iterrows():
        offsets[int(row["bucket"]) + 1] = int(row["n"])
    np.cumsum(offsets, out=offsets)
    offs = {b: int(offsets[b]) for b in range(B)}

    def rank_group(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:  # dataless shuffle partition
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "rank": pa.array([], pa.int64())})
        b = int(t["bucket"][0].as_py())
        order = pc.sort_indices(t["key"])
        ranks = pa.array(offs[b] + np.arange(len(order),
                                             dtype=np.int64))
        return pa.table({"doc_id": pc.take(t["doc_id"], order),
                         "rank": ranks})

    return keyed.groupby("bucket").map_groups(
        rank_group, batch_format="pyarrow")
