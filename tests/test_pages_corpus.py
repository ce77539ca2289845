"""Synthetic web corpus generator (the bench's flagship input)."""

import numpy as np
import pytest
import ray.data as rd

from leidenalg_ray.sources.pages import (ensure_pages_corpus,
                                         synth_pages_shard)
from leidenalg_ray.stages.extract import extract_text


def test_shards_deterministic_and_consistent():
    a = synth_pages_shard(100, 150, 1000, seed=7)
    b = synth_pages_shard(100, 150, 1000, seed=7)
    assert a.equals(b)
    # stored text is the extractor ground truth
    for h, t in zip(a["html"].to_pylist(), a["text"].to_pylist()):
        assert extract_text(h) == t


def test_ensure_corpus_caches(tmp_path):
    p = str(tmp_path / "corpus")
    ensure_pages_corpus(p, 500, seed=3, shard_rows=128)
    ds = rd.read_parquet(p)
    assert ds.count() == 500
    import os
    mtimes = {f: os.path.getmtime(os.path.join(p, f))
              for f in os.listdir(p)}
    ensure_pages_corpus(p, 500, seed=3, shard_rows=128)  # no-op
    assert mtimes == {f: os.path.getmtime(os.path.join(p, f))
                      for f in os.listdir(p)}


def test_degree_skew_present():
    t = synth_pages_shard(0, 2000, 2000, seed=42)
    from leidenalg_ray.stages.extract import extract_links
    degs = [len(extract_links(h)) for h in t["html"].to_pylist()]
    degs = np.array(degs)
    assert degs.max() > 10 * max(1, int(np.median(degs)))  # heavy tail
