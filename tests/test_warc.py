"""WARC source: round-trips (plain and per-record-gzip Common-Crawl
layout), warcinfo skipping, timestamp fidelity, and the contract that
a WARC-ingested corpus feeds the extraction pipeline identically to
the parquet pages table."""

import gzip

import numpy as np
import pyarrow as pa
import pytest

from leidenalg_ray.sources import pages as pg
from leidenalg_ray.sources import warc as wa
from leidenalg_ray.stages.extract import extract_links


@pytest.fixture(scope="module")
def pages_table():
    rng = np.random.default_rng(11)
    src = rng.integers(0, 30, 120).astype(np.int64)
    dst = rng.integers(0, 30, 120).astype(np.int64)
    return pg.generate_pages_table(src, dst, 30, seed=3)


def _read_sorted(path, ray_session):
    ds = wa.read_pages_warc([str(path)])
    return ds.to_pandas().sort_values("url").reset_index(drop=True)


@pytest.mark.parametrize("gz", [False, True])
def test_warc_roundtrip_byte_identical(pages_table, tmp_path,
                                       ray_session, gz):
    p = tmp_path / ("x.warc.gz" if gz else "x.warc")
    wa.write_warc(pages_table, str(p), per_record_gzip=gz)
    if gz:  # the CC layout really is multi-member gzip
        raw = open(p, "rb").read()
        assert raw[:2] == b"\x1f\x8b"
        assert raw.count(b"\x1f\x8b\x08") > 1
    got = _read_sorted(p, ray_session)
    want = pages_table.to_pandas().sort_values("url") \
        .reset_index(drop=True)
    assert got["url"].tolist() == want["url"].tolist()
    assert (got["warc_ts"] == want["warc_ts"]).all()
    assert got["html"].tolist() == want["html"].tolist()  # byte-identical
    # warcinfo record did not leak into the rows
    assert len(got) == len(want)


def test_warc_feeds_extraction_identically(pages_table, tmp_path,
                                           ray_session):
    p = tmp_path / "y.warc"
    wa.write_warc(pages_table, str(p))
    got = _read_sorted(p, ray_session)
    for html in got["html"]:
        assert isinstance(html, bytes)
    links_got = sorted(
        (u, t) for u, h in zip(got["url"], got["html"])
        for t in extract_links(h))
    want = pages_table.to_pandas()
    links_want = sorted(
        (u, t) for u, h in zip(want["url"], want["html"])
        for t in extract_links(h))
    assert links_got == links_want


def test_warc_subsecond_timestamps(tmp_path, ray_session):
    t = pa.table({
        "url": pa.array(["https://a.example/x"]),
        "warc_ts": pa.array([1_600_000_000_123_456],
                            pa.timestamp("us")),
        "html": pa.array([b"<html></html>"], pa.binary()),
    })
    p = tmp_path / "sub.warc"
    wa.write_warc(t, str(p))
    got = _read_sorted(p, ray_session)
    assert got["warc_ts"].astype("int64").iloc[0] \
        == 1_600_000_000_123_456


def test_warc_malformed_raises(tmp_path):
    bad = b"WARC/0.9\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
    with pytest.raises(ValueError, match="bad WARC version"):
        list(wa.parse_warc_bytes(bad))


def test_warc_parse_skips_non_response():
    rec = wa._record([(b"WARC-Type", b"request"),
                      (b"WARC-Target-URI", b"https://x/"),
                      (b"WARC-Date", b"2020-09-13T12:26:40Z")], b"hi")
    assert list(wa.parse_warc_bytes(rec)) == []
    rec2 = wa._record([(b"WARC-Type", b"response"),
                       (b"WARC-Target-URI", b"https://x/"),
                       (b"WARC-Date", b"2020-09-13T12:26:40Z")],
                      b"payload")
    out = list(wa.parse_warc_bytes(gzip.compress(rec) +
                                   gzip.compress(rec2)))
    assert out == [("https://x/", 1_600_000_000_000_000, b"payload")]
