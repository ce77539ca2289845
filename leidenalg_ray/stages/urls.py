"""URL canonicalization — the dedup/join key hygiene step of a web
crawl pipeline.

A fixed, ordered chain of RE2 kernels (``pyarrow.compute``; the same
regex engine class DuckDB uses) applied whole-column, zero Python per
row:

1. strip the fragment (``#...``),
2. lowercase the scheme and host (path/query case is preserved),
3. drop default ports (``:443`` for https, ``:80`` for http),
4. drop tracking query parameters (``utm_*``, ``gclid``, ``fbclid``)
   wherever they sit in the query string,
5. drop a dangling ``?``.

Inputs are assumed to be absolute ``scheme://host...`` urls (the
extractor only emits those); a string without ``://`` passes through
unchanged except for fragment/tracking rules.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

TRACKING_PARAMS = ("utm_[^&#]*", "gclid=[^&#]*", "fbclid=[^&#]*")
_TRACK = "|".join(TRACKING_PARAMS)
_SCHEME_HOST = "^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)"


def canonicalize_url_array(arr):
    """Canonicalize a string Array/ChunkedArray of absolute urls."""
    u = pc.replace_substring_regex(arr, "#.*$", "")
    head = pc.replace_substring_regex(u, _SCHEME_HOST + ".*$", "\\1")
    tail = pc.replace_substring_regex(u, _SCHEME_HOST, "")
    has_scheme = pc.match_substring_regex(u, _SCHEME_HOST)
    lowered = pc.binary_join_element_wise(pc.utf8_lower(head), tail, "")
    u = pc.if_else(has_scheme, lowered, u)
    u = pc.replace_substring_regex(
        u, "^(https://[^/:]+):443(/|$)", "\\1\\2")
    u = pc.replace_substring_regex(
        u, "^(http://[^/:]+):80(/|$)", "\\1\\2")
    u = pc.replace_substring_regex(u, "&(?:" + _TRACK + ")", "")
    u = pc.replace_substring_regex(u, "\\?(?:" + _TRACK + ")&", "?")
    u = pc.replace_substring_regex(u, "\\?(?:" + _TRACK + ")$", "")
    u = pc.replace_substring_regex(u, "\\?$", "")
    return u


def canonicalize_urls(ds, column="url", out="canon_url"):
    """Dataset stage: add ``out`` = canonicalized ``column``. Pure
    per-batch Arrow kernels — stateless tasks, no actor pool needed."""

    def fn(t: pa.Table) -> pa.Table:
        return t.append_column(out, canonicalize_url_array(t[column]))

    return ds.map_batches(fn, batch_format="pyarrow",
                          zero_copy_batch=True)
