"""WARC ingestion: Common-Crawl-style web-archive shards as a Ray
Data source feeding the same (url, warc_ts, html) schema the pages
pipelines consume (BASELINE.json input_hint).

Format (WARC/1.0, ISO 28500): records of CRLF header lines —
``WARC-Type``, ``WARC-Target-URI``, ``WARC-Date``, ``Content-Length``
— a blank line, ``Content-Length`` payload bytes, then a CRLF CRLF
record separator. Common Crawl ships shards with EVERY RECORD ITS OWN
GZIP MEMBER concatenated into one ``.warc.gz`` file; Python's gzip
handles multi-member streams, so the same reader takes plain and
per-record-gzipped shards.

Scale shape: ``ray.data.read_binary_files`` streams one shard per
task (CC shards are ~1 GiB by construction — the format's own
parallelism unit), and record parsing is a ``map_batches`` stage, so
ingestion is block-streaming with no driver materialisation. The
writer exists for tests and synthetic corpora.

The reference has no file I/O at all (its graphs arrive in RAM);
this source is engine surface, cited for the input_hint contract
only.
"""
from __future__ import annotations

import gzip
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa
import ray.data as rd

_CRLF = b"\r\n"


def _warc_date(ts_us: int) -> bytes:
    dt = datetime.fromtimestamp(ts_us / 1e6, tz=timezone.utc)
    if ts_us % 1_000_000:
        return dt.strftime("%Y-%m-%dT%H:%M:%S.%fZ").encode()
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ").encode()


def _parse_warc_date(s: str) -> int:
    fmt = ("%Y-%m-%dT%H:%M:%S.%fZ" if "." in s
           else "%Y-%m-%dT%H:%M:%SZ")
    dt = datetime.strptime(s, fmt).replace(tzinfo=timezone.utc)
    return round(dt.timestamp() * 1e6)


def _record(headers: list[tuple[bytes, bytes]], payload: bytes) -> bytes:
    head = b"WARC/1.0" + _CRLF
    for k, v in headers:
        head += k + b": " + v + _CRLF
    head += b"Content-Length: " + str(len(payload)).encode() + _CRLF
    return head + _CRLF + payload + _CRLF + _CRLF


def write_warc(pages: pa.Table, path: str,
               per_record_gzip: bool = False) -> None:
    """Write a pages table (url, warc_ts, html[, ...]) as one WARC
    shard — a leading ``warcinfo`` record (readers must skip it), then
    one ``response`` record per page. ``per_record_gzip=True`` writes
    each record as its own gzip member (the Common Crawl layout)."""
    urls = pages["url"].to_pylist()
    ts = pages["warc_ts"].cast(pa.int64()).to_pylist()
    htmls = pages["html"].to_pylist()

    def emit(rec: bytes) -> bytes:
        return gzip.compress(rec) if per_record_gzip else rec

    with open(path, "wb") as f:
        f.write(emit(_record(
            [(b"WARC-Type", b"warcinfo"),
             (b"WARC-Date", _warc_date(ts[0] if ts else 0))],
            b"software: leidenalg-ray synthetic crawler\r\n")))
        for u, t, h in zip(urls, ts, htmls):
            f.write(emit(_record(
                [(b"WARC-Type", b"response"),
                 (b"WARC-Target-URI", u.encode()),
                 (b"WARC-Date", _warc_date(t))],
                h)))


def parse_warc_bytes(data: bytes):
    """Yield (url, warc_ts_us, html) from one WARC shard's bytes
    (plain or multi-member gzip). Non-``response`` records are
    skipped; a malformed record raises rather than silently
    truncating the shard."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)        # multi-member capable
    pos, n = 0, len(data)
    while pos < n:
        # tolerate stray separators between records
        while pos < n and data[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        end_head = data.index(b"\r\n\r\n", pos)
        head_lines = data[pos:end_head].split(_CRLF)
        if head_lines[0] != b"WARC/1.0":
            raise ValueError(
                f"bad WARC version line at offset {pos}: "
                f"{head_lines[0][:40]!r}")
        hdr = {}
        for line in head_lines[1:]:
            k, _, v = line.partition(b":")
            hdr[k.strip().lower()] = v.strip()
        length = int(hdr[b"content-length"])
        payload = data[end_head + 4:end_head + 4 + length]
        pos = end_head + 4 + length
        if hdr.get(b"warc-type") == b"response":
            yield (hdr[b"warc-target-uri"].decode(),
                   _parse_warc_date(hdr[b"warc-date"].decode()),
                   payload)


def read_pages_warc(paths) -> "rd.Dataset":
    """WARC shard(s) -> Dataset(url string, warc_ts timestamp[us],
    html binary) — the pages schema minus the derived text/lang
    columns, which the extraction stage computes downstream."""
    files = rd.read_binary_files(paths)

    def parse(t: pa.Table) -> pa.Table:
        urls, ts, htmls = [], [], []
        for blob in t["bytes"].to_pylist():
            for u, tt, h in parse_warc_bytes(blob):
                urls.append(u)
                ts.append(tt)
                htmls.append(h)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(np.asarray(ts, np.int64),
                                pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
        })

    return files.map_batches(parse, batch_format="pyarrow",
                             zero_copy_batch=True)
