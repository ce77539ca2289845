"""HTML link + text extraction.

``extract_text`` / ``extract_links`` are pure functions of the ``html``
bytes of ONE page — no cross-row state — so the distributed
``map_batches`` output is byte-identical to running them serially
(the per-row invariant in BASELINE.json input_hint; SURVEY.md §2.7
"Parsers"). The serial oracle used in tests IS these same functions
applied row-by-row.

Extraction semantics (engine-defined; the reference has no parser —
graphs arrive pre-built, reference ``functions.py:15-16``):

- links: every ``href`` value of an ``<a ...>`` tag, in document order,
  absolute http(s) urls only, duplicates preserved (multiset).
- text: all character data outside tags, with the five basic HTML
  entities decoded, whitespace runs collapsed to single spaces,
  leading/trailing whitespace stripped.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_A_HREF = re.compile(rb'<a\s[^>]*?href="([^"]*)"', re.IGNORECASE | re.DOTALL)
_A_FULL = re.compile(rb'<a\s[^>]*?href="([^"]*)"[^>]*>(.*?)</a>',
                     re.IGNORECASE | re.DOTALL)
_TAG = re.compile(rb"<[^>]*>")
_WS = re.compile(r"\s+")
_ENTITIES = [(b"&lt;", b"<"), (b"&gt;", b">"), (b"&quot;", b'"'),
             (b"&#39;", b"'"), (b"&amp;", b"&")]  # &amp; last


def extract_links(html: bytes):
    """Absolute http(s) hrefs in document order (duplicates kept)."""
    out = []
    for m in _A_HREF.finditer(html):
        href = m.group(1)
        if href.startswith(b"http://") or href.startswith(b"https://"):
            out.append(href.decode("utf-8", "replace"))
    return out


def extract_text(html: bytes) -> str:
    """Visible text: strip tags, decode basic entities, collapse
    whitespace."""
    raw = _TAG.sub(b" ", html)
    for ent, ch in _ENTITIES:
        raw = raw.replace(ent, ch)
    return _WS.sub(" ", raw.decode("utf-8", "replace")).strip()


def extract_anchors(html: bytes):
    """(href, anchor_text) pairs in document order for absolute
    http(s) links: the anchor body up to the matching ``</a>``,
    processed exactly like ``extract_text`` (tags stripped, entities
    decoded, whitespace collapsed). Duplicates preserved."""
    out = []
    for m in _A_FULL.finditer(html):
        href = m.group(1)
        if href.startswith(b"http://") or href.startswith(b"https://"):
            out.append((href.decode("utf-8", "replace"),
                        extract_text(m.group(2))))
    return out


class ExtractAnchors:
    """Actor-pool stage: pages batch -> one row per anchor with its
    visible text — the inbound-anchor-text signal of a web link
    graph. Output schema: ``(src_url, dst_url, anchor: string,
    link_pos: int32)``."""

    def __init__(self):
        self._a_full = _A_FULL

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        src, dst, anc, pos = [], [], [], []
        for u, h in zip(urls, htmls):
            for i, (link, text) in enumerate(extract_anchors(h)):
                src.append(u)
                dst.append(link)
                anc.append(text)
                pos.append(i)
        return pa.table({
            "src_url": pa.array(src, pa.string()),
            "dst_url": pa.array(dst, pa.string()),
            "anchor": pa.array(anc, pa.string()),
            "link_pos": pa.array(pos, pa.int32()),
        })


def anchors_dataset(pages_ds, concurrency=8, batch_size=1024):
    """pages Dataset -> (src_url, dst_url, anchor, link_pos) Dataset
    via the ExtractAnchors actor pool."""
    return pages_ds.map_batches(ExtractAnchors, batch_format="pyarrow",
                                batch_size=batch_size,
                                zero_copy_batch=True,
                                concurrency=(1, concurrency))


class ExtractPages:
    """Actor-pool stage: pages batch -> one row per (src_url, dst_url)
    link plus the extracted text per url.

    Patterns are compiled once per actor in ``__init__`` (module import
    already compiles them; holding the callable class keeps the stage an
    actor pool so adding heavier parser state later is free).

    Output schema: ``(src_url: string, dst_url: string, text: string,
    link_pos: int32)`` — ``text`` repeated per link row would bloat the
    table, so text rows are emitted separately: one row per page with
    ``dst_url == ""`` carries the page text; link rows carry empty text.
    Use ``links_only`` / ``texts_only`` filters downstream.
    """

    def __init__(self):
        self._a_href = _A_HREF
        self._tag = _TAG

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        src, dst, text, pos = [], [], [], []
        for u, h in zip(urls, htmls):
            t = extract_text(h)
            src.append(u)
            dst.append("")
            text.append(t)
            pos.append(-1)
            for i, link in enumerate(extract_links(h)):
                src.append(u)
                dst.append(link)
                text.append("")
                pos.append(i)
        return pa.table({
            "src_url": pa.array(src, pa.string()),
            "dst_url": pa.array(dst, pa.string()),
            "text": pa.array(text, pa.string()),
            "link_pos": pa.array(pos, pa.int32()),
        })


def extract_dataset(pages_ds, concurrency=8, batch_size=1024):
    """pages Dataset -> extraction Dataset (links + texts interleaved;
    see ExtractPages). ``concurrency`` sizes the actor pool (callable
    class => stateful actors; parser state loads once per actor)."""
    return pages_ds.map_batches(ExtractPages, batch_format="pyarrow",
                                batch_size=batch_size,
                                zero_copy_batch=True,
                                concurrency=(1, concurrency))


def links_of(extracted_ds):
    import pyarrow.compute as pc
    return extracted_ds.map_batches(
        lambda t: t.filter(pc.not_equal(t["dst_url"], ""))
                   .select(["src_url", "dst_url"]),
        batch_format="pyarrow", zero_copy_batch=True)


def texts_of(extracted_ds):
    import pyarrow.compute as pc
    return extracted_ds.map_batches(
        lambda t: t.filter(pc.equal(t["dst_url"], ""))
                   .select(["src_url", "text"])
                   .rename_columns(["url", "text"]),
        batch_format="pyarrow", zero_copy_batch=True)
