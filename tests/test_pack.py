"""Sampling / split / sequence-packing operators vs serial oracles."""

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

from leidenalg_ray.stages import pack as pk
from leidenalg_ray.stages.text import TOKEN_RE


def _h(d):
    return int.from_bytes(hashlib.md5(str(d).encode()).digest()[:8],
                          "big")


def _docs_ds(n=200, blocks=7):
    rng = np.random.default_rng(5)
    texts = [" ".join(f"w{rng.integers(0, 50)}"
                      for _ in range(rng.integers(1, 40)))
             for _ in range(n)]
    t = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                  "text": pa.array(texts)})
    return rd.from_arrow(t).repartition(blocks), texts


def test_hash_sample_matches_serial():
    ds, _ = _docs_ds()
    got = sorted(pk.hash_sample(ds, mod=7, keep=3).to_pandas()
                 ["doc_id"].tolist())
    expect = [d for d in range(200) if _h(d) % 7 == 3]
    assert got == expect


def test_hash_split_matches_serial():
    ds, _ = _docs_ds()
    got = pk.hash_split(ds).to_pandas().set_index("doc_id")["split"]
    for d in range(200):
        r = _h(d) % 100
        expect = "train" if r < 80 else ("val" if r < 90 else "test")
        assert got[d] == expect


def test_pack_chunks_matches_serial_scan():
    ds, texts = _docs_ds()
    got = pk.pack_chunks(ds, budget=64, bucket_size=16).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    n_tok = np.array([len(TOKEN_RE.findall(t.lower())) for t in texts],
                     dtype=np.int64)
    prev = np.concatenate([[0], np.cumsum(n_tok)[:-1]])
    assert got["n_tokens"].tolist() == n_tok.tolist()
    assert got["chunk_id"].tolist() == (prev // 64).tolist()
    # chunks are contiguous doc_id ranges and non-decreasing
    assert (np.diff(got["chunk_id"].to_numpy()) >= 0).all()


def test_pack_chunks_block_order_invariant():
    ds, texts = _docs_ds(blocks=3)
    a = pk.pack_chunks(ds, budget=64, bucket_size=16).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    ds2, _ = _docs_ds(blocks=13)
    b = pk.pack_chunks(ds2, budget=64, bucket_size=16).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_global_shuffle_rank_dense_and_stable(ray_session):
    """Ranks are a dense 0..n-1 permutation of md5-key order,
    invariant to partitioning and bucket count."""
    import hashlib

    import pyarrow as pa
    import ray.data as rd

    from leidenalg_ray.stages import pack as pk

    ids = list(range(37))
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())}))
    out = pk.global_shuffle_rank(ds, seed=5, B=16).to_pandas() \
        .sort_values("rank").reset_index(drop=True)
    assert sorted(out["rank"]) == ids
    exp = sorted(ids, key=lambda d: hashlib.md5(
        f"5:{d}".encode()).hexdigest())
    assert list(out["doc_id"]) == exp

    out2 = pk.global_shuffle_rank(ds.repartition(5), seed=5, B=4) \
        .to_pandas().sort_values("rank").reset_index(drop=True)
    assert out.equals(out2)
