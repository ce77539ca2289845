"""scripts/gen_testdata.py — the scale-re-validation synthesizer must
be deterministic (same (sf, seed) -> byte-identical parquet) and
schema-identical to the shipped driver tables."""

import hashlib
import os
import subprocess
import sys

import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def _gen(out, sf="0.002"):
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/gen_testdata.py"),
         "--sf", sf, "--out", str(out)],
        check=True, capture_output=True)


def _digest(d):
    out = {}
    for t in TABLES:
        # hash the DATA (not the file bytes — parquet metadata can
        # embed creation info): canonical arrow ipc of the table
        tab = pq.read_table(os.path.join(d, f"{t}.parquet"))
        h = hashlib.sha256()
        for batch in tab.to_batches():
            for col in batch.columns:
                for buf in col.buffers():
                    if buf is not None:
                        h.update(buf)
        out[t] = h.hexdigest()
    return out


def test_generator_is_deterministic(tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    _gen(a)
    _gen(b)
    assert _digest(a) == _digest(b)


def test_generator_matches_driver_schema(tmp_path):
    d = tmp_path / "s"
    _gen(d)
    for t in TABLES:
        got = pq.read_schema(os.path.join(d, f"{t}.parquet"))
        want = pq.read_schema(f"/root/testdata/sf0.01/{t}.parquet")
        assert got.names == want.names, t
        assert [str(f.type) for f in got] == \
            [str(f.type) for f in want], t


def test_generator_scales_linearly(tmp_path):
    # sfs above the per-table minimum-row floors
    small, big = tmp_path / "s1", tmp_path / "s4"
    _gen(small, "0.01")
    _gen(big, "0.04")
    for t in ("orders", "events", "documents", "embeddings"):
        n_s = pq.read_metadata(
            os.path.join(small, f"{t}.parquet")).num_rows
        n_b = pq.read_metadata(
            os.path.join(big, f"{t}.parquet")).num_rows
        assert abs(n_b - 4 * n_s) <= max(4, 0.02 * n_b), t
