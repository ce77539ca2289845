"""Multimodal plumbing: schema, determinism, stub seam."""

import numpy as np
import pytest
import ray.data as rd

from leidenalg_ray.stages import multimodal as mm


def test_decode_schema_and_determinism():
    t = mm.synth_media_table(n=30, seed=1)
    out1 = mm.decode_features(rd.from_arrow(t),
                              concurrency=2).to_pandas()
    out2 = mm.decode_features(rd.from_arrow(t),
                              concurrency=2).to_pandas()
    assert set(out1.columns) == {"media_id", "kind", "width", "height",
                                 "n_frames", "feature"}
    a = out1.sort_values("media_id").reset_index(drop=True)
    b = out2.sort_values("media_id").reset_index(drop=True)
    assert a.drop(columns="feature").equals(b.drop(columns="feature"))
    for x, y in zip(a.feature, b.feature):
        assert np.array_equal(x, y)
    assert (a[a.kind == "image"].n_frames == 1).all()


def test_real_decode_raises():
    with pytest.raises(NotImplementedError):
        mm.MediaDecoder(decode="real")


def test_frame_sampling():
    t = mm.synth_media_table(n=12, seed=2)
    out = mm.frame_sample(rd.from_arrow(t), every=2).to_pandas()
    vids = out[out.kind == "video"]
    assert (vids.frame % 2 == 0).all()
    imgs = out[out.kind == "image"]
    assert (imgs.frame == 0).all()
