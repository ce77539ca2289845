"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata (task brief).

The container has no image/audio codecs, so the decode kernels are
STUBBED: ``decode=\"fake\"`` produces a deterministic fake decode
(seeded by the content hash) with the real output schema, and
``decode=\"real\"`` raises ``NotImplementedError`` at actor
construction (where a real deployment would import PIL/libav). The
Ray-side plumbing — schema, batch sizing for large binary payloads,
actor-pool signature, partitioned output layout — is real and tested.

Schema convention:
``media(media_id: int64, kind: string, payload: binary,
        meta: string-json)`` ->
``features(media_id: int64, kind: string, width: int32, height: int32,
           n_frames: int32, feature: list<float>)``
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa


def synth_media_table(n=64, seed=42, payload_bytes=4096):
    """Deterministic fake media corpus for tests/bench."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {"media_id": [], "kind": [], "payload": [], "meta": []}
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, payload_bytes,
                               dtype=np.uint8).tobytes()
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["meta"].append(json.dumps({"codec": "fake", "kind": kind}))
    return pa.table({
        "media_id": pa.array(rows["media_id"], pa.int64()),
        "kind": pa.array(rows["kind"], pa.string()),
        "payload": pa.array(rows["payload"], pa.binary()),
        "meta": pa.array(rows["meta"], pa.string()),
    })


class MediaDecoder:
    """Actor-pool decode/feature-extract stage.

    ``decode="fake"``: deterministic pseudo-decode — dimensions and an
    8-dim feature vector derived from the payload's blake2b digest, so
    output is reproducible across runs and parallelism levels.
    ``decode="real"``: raises NotImplementedError (no codecs in this
    container) — the seam where PIL / torchaudio / PyAV would load,
    ONCE per actor.
    """

    def __init__(self, decode="fake", feature_dim=8):
        if decode == "real":
            raise NotImplementedError(
                "image/audio codecs are not available in this "
                "container; use decode='fake' (deterministic stub)")
        if decode != "fake":
            raise ValueError(f"unknown decode mode {decode!r}")
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        width = np.empty(len(ids), dtype=np.int32)
        height = np.empty(len(ids), dtype=np.int32)
        n_frames = np.empty(len(ids), dtype=np.int32)
        feats = []
        for i, (k, p) in enumerate(zip(kinds, payloads)):
            digest = hashlib.blake2b(p, digest_size=16).digest()
            h = np.frombuffer(digest, dtype=np.uint8).astype(np.float64)
            width[i] = 64 + int(digest[0]) * 4
            height[i] = 64 + int(digest[1]) * 4
            n_frames[i] = 1 if k == "image" else 1 + int(digest[2])
            f = h[: self.feature_dim]
            feats.append(np.round(f / 255.0, 6).astype(np.float32))
        return pa.table({
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "width": pa.array(width),
            "height": pa.array(height),
            "n_frames": pa.array(n_frames),
            "feature": pa.array([f.tolist() for f in feats],
                                pa.list_(pa.float32())),
        })


def decode_features(media_ds, concurrency=4, batch_size=32):
    """Small batch_size: binary payloads are wide rows — batch x
    concurrency must fit worker heaps (ray_guide.md 'Memory-aware')."""
    return media_ds.map_batches(MediaDecoder, batch_format="pyarrow",
                                batch_size=batch_size,
                                zero_copy_batch=True,
                                concurrency=(1, concurrency))


def frame_sample(media_ds, every=2, concurrency=4):
    """Frame sampling plumbing: one output row per sampled frame index
    of video rows (images pass through with frame 0)."""
    def sample(batch: pa.Table) -> pa.Table:
        ids, kinds, frames = [], [], []
        for mid, kind, payload in zip(batch["media_id"].to_pylist(),
                                      batch["kind"].to_pylist(),
                                      batch["payload"].to_pylist()):
            if kind == "video":
                n = 1 + hashlib.blake2b(payload,
                                        digest_size=16).digest()[2]
                for f in range(0, n, every):
                    ids.append(mid)
                    kinds.append(kind)
                    frames.append(f)
            else:
                ids.append(mid)
                kinds.append(kind)
                frames.append(0)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "frame": pa.array(frames, pa.int32()),
        })
    return media_ds.map_batches(sample, batch_format="pyarrow",
                                batch_size=32, zero_copy_batch=True)


class MediaDecoderMd5:
    """SQL-verifiable twin of ``MediaDecoder``: same actor-pool
    plumbing and output shape, but the fake decode derives from the
    payload's md5 digest so a DuckDB oracle reproduces it byte-for-
    byte (``('0x' || substr(md5(text), 2i+1, 2))::INT`` per digest
    byte). Feature components are flat float64 columns (f0..f3)
    because list<float32> renders differently across engines."""

    def __init__(self, decode="fake", feature_dim=4):
        if decode == "real":
            raise NotImplementedError(
                "image/audio codecs are not available in this "
                "container; use decode='fake' (deterministic stub)")
        if decode != "fake":
            raise ValueError(f"unknown decode mode {decode!r}")
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib as _h
        ids = batch["media_id"].to_pylist()
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        width = np.empty(len(ids), dtype=np.int64)
        height = np.empty(len(ids), dtype=np.int64)
        n_frames = np.empty(len(ids), dtype=np.int64)
        feats = np.empty((len(ids), self.feature_dim), dtype=np.float64)
        for i, (k, p) in enumerate(zip(kinds, payloads)):
            digest = _h.md5(p).digest()
            width[i] = 64 + digest[0] * 4
            height[i] = 64 + digest[1] * 4
            n_frames[i] = 1 if k == "image" else 1 + digest[2]
            for j in range(self.feature_dim):
                feats[i, j] = round(digest[j] / 255.0, 6)
        cols = {
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "width": pa.array(width),
            "height": pa.array(height),
            "n_frames": pa.array(n_frames),
        }
        for j in range(self.feature_dim):
            cols[f"f{j}"] = pa.array(feats[:, j])
        return pa.table(cols)


def docs_as_media(docs_ds):
    """Register the documents table as a media table (payload = utf8
    text bytes, kind by id residue) — gives the multimodal stages a
    driver-registered input so their plumbing is oracle-verifiable."""
    kinds = ("image", "audio", "video")

    def conv(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        import pyarrow.compute as pc
        return pa.table({
            "media_id": t["doc_id"],
            "kind": pa.array([kinds[i % 3] for i in ids], pa.string()),
            "payload": pc.cast(t["text"], pa.binary()),
        })
    return docs_ds.map_batches(conv, batch_format="pyarrow",
                               zero_copy_batch=True)
