"""Deterministic synthetic Common-Crawl-style pages (FIXTURES.md §1).

Schema (BASELINE.json input_hint):
``pages(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)``.

One page per graph vertex; the page's ``<a href>`` targets are exactly
the out-neighbours of that vertex, so extracting the pages must
reproduce the graph's edge multiset exactly, and the stored ``text``
column is the ground truth the extractor must reproduce byte-for-byte.

Edge cases baked in (FIXTURES.md): duplicate links on one page
(dedup -> weight), self-link pages (self-loops), links to absent urls
(dangling targets), non-ASCII text, empty body.

The reference has no file I/O at all (SURVEY.md §2.7) — graphs arrive
in RAM; this source is the engine's entry substrate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

EPOCH_US = 1_600_000_000_000_000  # deterministic base timestamp

_WORDS = [
    "graph", "community", "partition", "quality", "resolution", "vertex",
    "edge", "cluster", "modularity", "leiden", "louvain", "network",
    "aggregate", "refine", "move", "node", "weight", "degree", "crawl",
    "página", "übersicht", "naïve", "café", "日本語",
]


def url_of(v, n_sites=16):
    """Deterministic url for vertex v; zero-padded so lexicographic
    order == numeric order."""
    return f"https://s{v % n_sites:02d}.example/p{v:09d}.html"


def _page_text(v, rng):
    k = int(rng.integers(0, 12))
    if k == 0:
        return ""  # empty body page
    words = [_WORDS[int(rng.integers(0, len(_WORDS)))] for _ in range(k)]
    return " ".join(words)


def _page_html(v, text, targets, n_sites, rng):
    """Synthesize the page. The anchor list includes every out-neighbour
    (possibly repeated — duplicate links), plus occasionally a dangling
    absent-url link."""
    parts = [b"<html><head><title>page ", str(v).encode(),
             b"</title></head><body>"]
    if text:
        parts += [b"<p>", text.encode("utf-8"), b"</p>"]
    for t in targets:
        u = url_of(int(t), n_sites)
        parts += [b'<a href="', u.encode(), b'">to ', str(int(t)).encode(),
                  b"</a> "]
    if rng.random() < 0.05:
        parts += [b'<a href="https://absent.example/nowhere.html">gone</a>']
    parts += [b"</body></html>"]
    return b"".join(parts)


def generate_pages_table(src, dst, n, seed=42, n_sites=16, dup_prob=0.05):
    """pyarrow Table of pages for the graph (src, dst) on n vertices.

    Deterministic in (src, dst, n, seed). ``text`` holds the
    ground-truth extraction (what the engine's extractor must match
    byte-for-byte — see ``stages.extract.extract_text``).
    """
    from ..stages.extract import extract_text, extract_links

    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    order = np.argsort(src, kind="stable")
    src_s, dst_s = src[order], dst[order]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, src_s + 1, 1)
    np.cumsum(indptr, out=indptr)

    urls, htmls, texts, langs, ts = [], [], [], [], []
    for v in range(n):
        rng = np.random.default_rng(seed * 1_000_003 + v)
        targets = list(dst_s[indptr[v]:indptr[v + 1]])
        # duplicate a link sometimes (multiset edges -> weight on dedup)
        if targets and rng.random() < dup_prob:
            targets.append(targets[0])
        body = _page_text(v, rng)
        html = _page_html(v, body, targets, n_sites, rng)
        urls.append(url_of(v, n_sites))
        htmls.append(html)
        texts.append(extract_text(html))
        langs.append("en" if rng.random() > 0.06
                     else ("de" if rng.random() < 0.5 else "fr"))
        ts.append(EPOCH_US + v * 1_000_000)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(ts, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })


def write_pages_parquet(path, src, dst, n, seed=42, n_sites=16,
                        rows_per_file=65536):
    """Write the pages table as a directory of parquet files (the shape
    ``ray.data.read_parquet`` consumes)."""
    import os
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    table = generate_pages_table(src, dst, n, seed, n_sites)
    k = 0
    for off in range(0, max(table.num_rows, 1), rows_per_file):
        chunk = table.slice(off, rows_per_file)
        pq.write_table(chunk, os.path.join(path, f"pages-{k:05d}.parquet"))
        k += 1
    return path
