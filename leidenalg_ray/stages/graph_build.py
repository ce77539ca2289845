"""Graph build: url canonicalisation, deterministic vid assignment,
edge dedup (SURVEY.md §7.1.2).

Id assignment is the classic two-pass deterministic scheme that avoids
a global sort: urls hash-partition into B buckets (a Ray Data groupby
shuffle); pass 1 counts per bucket (tiny driver-side array -> offsets);
pass 2 sorts *within* each bucket and assigns
``vid = bucket_offset + local_rank``. Deterministic in (urls, B),
contiguous, and every stage streams — no driver-side materialisation of
the url set.

Edge dedup: ``groupby(src, dst).sum(weight)`` with per-batch
pre-aggregation (the combiner) so the shuffle moves one row per
distinct pair per batch, not one per link occurrence.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum


def _bucket_of(urls: pa.ChunkedArray, B: int) -> np.ndarray:
    """Deterministic url -> bucket via FNV-1a, vectorised over the
    Arrow string buffers: one numpy pass per byte position (urls are
    short), no per-row Python. Stable across processes (unlike
    Python's salted hash). Changing this hash re-maps every assigned
    vid — bump ``dist.checkpoint.ID_FORMAT`` in lockstep so old
    vid-keyed checkpoints are rejected on resume, not mis-applied."""
    arr = urls.combine_chunks() if isinstance(urls, pa.ChunkedArray) \
        else urls
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    bufs = arr.buffers()
    odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    off = np.frombuffer(bufs[1], dtype=odt)[
        arr.offset:arr.offset + n + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    lens = np.diff(off)
    h = np.full(n, 0xcbf29ce484222325, dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    starts = off[:-1]
    with np.errstate(over="ignore"):
        for p in range(int(lens.max(initial=0))):
            active = lens > p
            h[active] = ((h[active]
                          ^ data[starts[active] + p].astype(np.uint64))
                         * prime)
    return (h % np.uint64(B)).astype(np.int64)


def canonicalize(url: str) -> str:
    """Url canonicalisation: lowercase scheme+host, strip fragment,
    strip trailing slash on bare paths."""
    u = url.split("#", 1)[0]
    if "://" in u:
        scheme, rest = u.split("://", 1)
        host, slash, path = rest.partition("/")
        u = scheme.lower() + "://" + host.lower() + slash + path
    if u.endswith("/") and u.count("/") > 3:
        u = u[:-1]
    return u


# target rows per id-assign bucket: caps the memory of the per-bucket
# rank sort regardless of corpus size (B grows with the data)
_IDS_BUCKET_ROWS = 1 << 17


def assign_ids(urls_ds, B=None):
    """Dataset with a ``url`` column (unique) -> Dataset
    ``(url, vid)`` with deterministic contiguous vids.

    ``B=None`` scales the bucket count with the corpus
    (ceil(n_urls / 128Ki), floor 32) so one bucket's rank sort never
    outgrows a task's heap; an explicit B is honoured (tests pin it).

    Returns (mapping Dataset, n)."""
    if B is None:
        urls_ds = urls_ds.materialize()
        n_urls = urls_ds.count()
        B = max(32, -(-n_urls // _IDS_BUCKET_ROWS))

    def with_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("bucket",
                               pa.array(_bucket_of(t["url"], B)))

    bucketed = urls_ds.map_batches(with_bucket, batch_format="pyarrow",
                                   zero_copy_batch=True).materialize()
    counts = bucketed.groupby("bucket").aggregate(Count(alias_name="n")) \
                     .to_pandas()
    offsets = np.zeros(B + 1, dtype=np.int64)
    for _, row in counts.iterrows():
        offsets[int(row["bucket"]) + 1] = int(row["n"])
    np.cumsum(offsets, out=offsets)
    n = int(offsets[-1])
    offs = {b: int(offsets[b]) for b in range(B)}

    def rank_group(t: pa.Table) -> pa.Table:
        b = int(t["bucket"][0].as_py())
        order = pc.sort_indices(t["url"])
        url_sorted = pc.take(t["url"], order)
        vids = pa.array(offs[b] + np.arange(len(order), dtype=np.int64))
        return pa.table({"url": url_sorted, "vid": vids})

    mapping = bucketed.groupby("bucket").map_groups(
        rank_group, batch_format="pyarrow")

    # map_groups emits ZERO-COLUMN empty blocks for shuffle partitions
    # holding no bucket; a later hash join against the mapping then
    # fails inside pyarrow ("no match for key field ... on right side")
    # whenever such a block lands alone in a join partition. Give every
    # block the declared schema.
    def norm(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.table({"url": pa.array([], pa.string()),
                             "vid": pa.array([], pa.int64())})
        return t

    return mapping.map_batches(norm, batch_format="pyarrow"), n


def dedup_edges(edges_ds, src="src", dst="dst", extra=()):
    """(src, dst[, extra...]) link rows -> (src, dst[, extra...],
    weight=count) with per-batch pre-aggregation before the groupby
    shuffle."""
    keys = [src, dst] + list(extra)

    def preagg(t: pa.Table) -> pa.Table:
        return t.group_by(keys).aggregate([([], "count_all")]) \
                .rename_columns(keys + ["weight"])
    pre = edges_ds.map_batches(preagg, batch_format="pyarrow",
                               zero_copy_batch=True)
    out = pre.groupby(keys).aggregate(Sum("weight",
                                          alias_name="weight"))
    def to_float(t: pa.Table) -> pa.Table:
        return t.set_column(t.schema.get_field_index("weight"), "weight",
                            pc.cast(t["weight"], pa.float64()))
    return out.map_batches(to_float, batch_format="pyarrow")


def preagg_edges(edges_ds, src="src", dst="dst", extra=()):
    """Per-batch combiner only — (src, dst, weight) multi-edge rows
    with duplicates possible ACROSS batches. For consumers that finish
    the dedup partition-locally (``DistGraph.from_dataset(dedup=True)``
    co-locates all copies of an edge by src%P) or whose math sums
    weights anyway; skips the groupby shuffle ``dedup_edges`` pays."""
    keys = [src, dst] + list(extra)

    def preagg(t: pa.Table) -> pa.Table:
        out = t.group_by(keys).aggregate([([], "count_all")]) \
               .rename_columns(keys + ["weight"])
        return out.set_column(
            out.schema.get_field_index("weight"), "weight",
            pc.cast(out["weight"], pa.float64()))
    return edges_ds.map_batches(preagg, batch_format="pyarrow",
                                zero_copy_batch=True)


_HOST_RE = r"^[^:/?#]+://(?P<host>[^/?#]+)"


def host_of(urls):
    """Vectorised url -> host (the authority between ``://`` and the
    first ``/``), lowercased: one Arrow regex kernel, no per-row
    Python. Scheme-relative or malformed urls (no ``://``) yield
    null."""
    got = pc.extract_regex(urls, _HOST_RE)
    return pc.utf8_lower(pc.struct_field(got, "host"))


def host_graph(links_ds, src="src_url", dst="dst_url"):
    """Contract the url->url link stream to the directed host->host
    graph (the Common-Crawl host-webgraph workflow). Pure streaming:
    hosts are extracted and pre-aggregated inside each batch, so the
    shuffle carries (host, host, count) partials — bounded by the host
    domain (~1e8 at crawl scale), never the 1e12 link rows. No id
    space, no driver state. Weight = link count including duplicate
    links (host-level mass); rows with an unparseable src or dst url
    are dropped. Returns Dataset(src_host, dst_host, weight:double)."""
    def partial(t: pa.Table) -> pa.Table:
        tt = pa.table({"src_host": host_of(t[src]),
                       "dst_host": host_of(t[dst])})
        tt = tt.drop_null()
        return tt.group_by(["src_host", "dst_host"]) \
                 .aggregate([([], "count_all")]) \
                 .rename_columns(["src_host", "dst_host", "weight"])

    pre = links_ds.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
    out = pre.groupby(["src_host", "dst_host"]) \
             .aggregate(Sum("weight", alias_name="weight"))

    def to_float(t: pa.Table) -> pa.Table:
        return t.set_column(t.schema.get_field_index("weight"),
                            "weight",
                            pc.cast(t["weight"], pa.float64()))
    return out.map_batches(to_float, batch_format="pyarrow")


def links_to_edges(links_ds, mapping_ds, n, num_partitions=16,
                   drop_dangling=True, dedup=True, carry=()):
    """(src_url, dst_url) -> (src, dst, weight) int edge table via two
    hash joins against the id mapping; links to urls outside the corpus
    are dropped (dangling targets, FIXTURES.md §1). ``dedup=False``
    returns per-batch pre-aggregated multi-edge rows instead of paying
    the global groupby (see ``preagg_edges``). ``carry`` names extra
    link columns (e.g. a crawl-slice tag) kept through the joins and
    folded into the dedup key, so ONE join pass can serve every
    slice."""
    carry = list(carry)

    # empty upstream datasets (e.g. a crawl window with no pages) can
    # contribute ZERO-COLUMN empty blocks that crash the pyarrow hash
    # join — rebuild the declared schema for them (carry columns are
    # int64 tags by contract)
    def _norm_links(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            cols = {"src_url": pa.array([], pa.string()),
                    "dst_url": pa.array([], pa.string())}
            for c in carry:
                cols[c] = pa.array([], pa.int64())
            return pa.table(cols)
        return t

    links_ds = links_ds.map_batches(_norm_links,
                                    batch_format="pyarrow")
    m_src = mapping_ds.map_batches(
        lambda t: t.rename_columns(["src_url", "src"]),
        batch_format="pyarrow")
    m_dst = mapping_ds.map_batches(
        lambda t: t.rename_columns(["dst_url", "dst"]),
        batch_format="pyarrow")
    j1 = links_ds.join(m_src, "inner", num_partitions, on=("src_url",))
    # Ray's join emits ZERO-COLUMN empty blocks for dataless hash
    # partitions, and map_batches passes empties through WITHOUT
    # calling fn (CLAUDE.md gotcha), so they would crash the second
    # join layout-dependently ("No match for FieldRef dst_url").
    # repartition coalesces blocks and drops the schema-less empties
    # — block-level only, no row shuffle.
    j1 = j1.repartition(num_partitions)
    j2 = j1.join(m_dst, "inner" if drop_dangling else "left_outer",
                 num_partitions, on=("dst_url",))
    ints = j2.select_columns(["src", "dst"] + carry)
    return dedup_edges(ints, extra=carry) if dedup \
        else preagg_edges(ints, extra=carry)


def pages_to_graph_arrays(pages_ds, B=32, concurrency=8):
    """pages -> (src, dst, weight arrays, mapping DataFrame, n).

    Small-side-broadcast variant: the url->vid mapping is broadcast
    once via ``ray.put`` and links resolve with a dict lookup inside
    ``map_batches`` — no join shuffle at all (ray_guide.md "Joins and
    lookups"). Right while the mapping fits a node's memory; beyond
    that use ``pages_to_graph`` (hash joins). Final dedup is a
    driver-side ``np.unique`` over per-batch pre-deduped pairs, since
    the caller consumes driver-side arrays anyway."""
    import ray

    from .extract import extract_dataset, links_of, texts_of

    import pandas as pd

    extracted = extract_dataset(pages_ds,
                                concurrency=concurrency).materialize()
    links = links_of(extracted)
    urls = texts_of(extracted).select_columns(["url"])
    # the mapping must fit in memory to be broadcast at all, so the
    # arrays path assigns ids with one driver-side sort (deterministic:
    # vid = rank in global url order); the Dataset path keeps the
    # distributed bucket-rank scheme (assign_ids) for corpora whose
    # url set exceeds a node
    parts = [b["url"].to_numpy(zero_copy_only=False)
             for b in urls.iter_batches(batch_format="pyarrow",
                                        batch_size=1 << 18)]
    all_urls = np.concatenate(parts) if parts else np.empty(0, object)
    sorted_urls = np.sort(all_urls.astype(np.str_))
    n = len(sorted_urls)
    vids_sorted = np.arange(n, dtype=np.int64)
    mdf = pd.DataFrame({"url": sorted_urls, "vid": vids_sorted})
    ref = ray.put((sorted_urls, vids_sorted))

    def resolve(t: pa.Table) -> pa.Table:
        sorted_urls, vids = ray.get(ref)
        su = t["src_url"].to_numpy(zero_copy_only=False).astype(np.str_)
        du = t["dst_url"].to_numpy(zero_copy_only=False).astype(np.str_)
        si = np.searchsorted(sorted_urls, su).clip(0, len(vids) - 1)
        di = np.searchsorted(sorted_urls, du).clip(0, len(vids) - 1)
        ok = (sorted_urls[di] == du)  # drop dangling targets
        src = vids[si[ok]]
        dst = vids[di[ok]]
        key = src * np.int64(n) + dst
        uniq, counts = np.unique(key, return_counts=True)
        return pa.table({
            "key": pa.array(uniq),
            "weight": pa.array(counts.astype(np.float64)),
        })

    keys, weights = [], []
    for batch in links.map_batches(resolve, batch_format="pyarrow",
                                   zero_copy_batch=True) \
                      .iter_batches(batch_format="pyarrow",
                                    batch_size=1 << 18):
        keys.append(batch["key"].to_numpy(zero_copy_only=False))
        weights.append(batch["weight"].to_numpy(zero_copy_only=False))
    key = np.concatenate(keys) if keys else np.empty(0, np.int64)
    wt = np.concatenate(weights) if weights else np.empty(0)
    uniq, inv = np.unique(key, return_inverse=True)
    w = np.zeros(len(uniq))
    np.add.at(w, inv, wt)
    return ((uniq // n).astype(np.int64), (uniq % n).astype(np.int64),
            w, mdf, n)


def pages_temporal_graph(pages_ds, n_slices, B=None,
                         num_partitions=16, spill_dir=None,
                         dedup=True):
    """Crawl-snapshot slicing: cut the pages table into ``n_slices``
    equal-width ``warc_ts`` windows and build one url->url edge table
    per window on ONE shared id space — the input form
    ``find_partition_temporal_dataset`` consumes (community evolution
    across crawl snapshots).

    Streaming shape: two column-pruned min/max scans for the window
    bounds, one pass tagging each page with its slice and spilling to
    slice-partitioned parquet (each page is extracted exactly once;
    re-running with the same ``spill_dir`` reuses a completed spill —
    a ``_SPILL_DONE`` marker guards against the double-append a naive
    rerun would silently produce), a single shared ``assign_ids`` over
    the corpus urls, then per-slice extract -> links -> id-join.
    Returns ``(slice_edge_datasets, mapping_ds, n, bounds_us)`` where
    ``bounds_us[t]`` is the first timestamp of slice t (consistent
    with the tagging: slice(ts) = floor((ts-lo)*T/span)).
    """
    import os
    import shutil
    import tempfile

    from .extract import extract_dataset, links_of, texts_of

    T = int(n_slices)
    if T < 1:
        raise ValueError("need at least one slice")
    # window bounds via int64 per-batch partials (timestamp-typed
    # Dataset.min/max support varies across Ray versions); empty
    # blocks yield null partials — drop them
    mm = pages_ds.select_columns(["warc_ts"]).map_batches(
        lambda t: pa.table({
            "lo": pa.array([pc.min(pc.cast(t["warc_ts"],
                                           pa.int64())).as_py()],
                           pa.int64()),
            "hi": pa.array([pc.max(pc.cast(t["warc_ts"],
                                           pa.int64())).as_py()],
                           pa.int64()),
        }), batch_format="pyarrow", zero_copy_batch=True).take_all()
    los = [r["lo"] for r in mm if r["lo"] is not None]
    if not los:
        raise ValueError("pages dataset is empty")
    lo = min(los)
    hi = max(r["hi"] for r in mm if r["hi"] is not None)
    span = max(hi - lo + 1, 1)
    # slice t starts at the first ts with floor((ts-lo)*T/span) == t,
    # i.e. lo + ceil(span*t/T) — matches the tag() assignment exactly
    bounds = [lo + (span * t + T - 1) // T for t in range(T)] \
        + [hi + 1]

    spill_dir = spill_dir or tempfile.mkdtemp(prefix="lray_slices_")
    os.makedirs(spill_dir, exist_ok=True)
    marker = os.path.join(spill_dir, "_SPILL_DONE")

    def tag(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["warc_ts"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        sl = np.minimum(((ts - lo) * T) // span, T - 1)
        return t.append_column("slice",
                               pa.array(sl.astype(np.int64)))

    if not os.path.exists(marker):
        # the marker only protects COMPLETED spills: a crash mid
        # write_parquet leaves partial slice=* files without it, and
        # Ray writes uuid-named files, so a blind re-spill would add
        # a full second copy alongside them (duplicated pages double
        # per-slice edge weights silently). Clear stale slice dirs
        # before re-spilling.
        for d in os.listdir(spill_dir):
            if d.startswith("slice="):
                shutil.rmtree(os.path.join(spill_dir, d),
                              ignore_errors=True)
        pages_ds.map_batches(tag, batch_format="pyarrow",
                             zero_copy_batch=True) \
            .write_parquet(spill_dir, partition_cols=["slice"])
        with open(marker, "w") as f:
            f.write("ok")

    # a window with zero pages writes no directory (clustered crawl
    # timestamps): such slices are tracked and get a typed empty edge
    # Dataset at the end — they must NOT enter the union/join pipeline
    # (Ray Data passes zero-column empty blocks through map_batches
    # untouched, and the pyarrow hash join crashes on them)
    present = [t for t in range(T)
               if os.path.isdir(os.path.join(spill_dir,
                                             f"slice={t}"))]
    slice_pages = {t: rd.read_parquet(os.path.join(spill_dir,
                                                   f"slice={t}"))
                   for t in present}
    # shared id space: every url in the corpus, whichever slice
    extracted = {t: extract_dataset(slice_pages[t]).materialize()
                 for t in present}
    urls = None
    for t in present:
        u = slice_pages[t].select_columns(["url"])
        urls = u if urls is None else urls.union(u)
    if urls is None:
        raise ValueError("pages dataset is empty")
    # a url recrawled in several snapshots must map to ONE vid:
    # per-batch dedup partials + one url shuffle before the ranking
    urls = urls.map_batches(
        lambda t: t.group_by(["url"]).aggregate([]),
        batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("url").aggregate(Count(alias_name="_n")) \
        .map_batches(lambda t: t.select(["url"]),
                     batch_format="pyarrow")
    mapping, n = assign_ids(urls, B=B)
    mapping = mapping.materialize()

    # ONE id-join pass for every slice (the slice tag rides through
    # the joins and the dedup key) instead of 2T mapping shuffles
    def tag_links(t_idx):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column(
                "slice_t", pa.array(np.full(t.num_rows, t_idx,
                                            np.int64)))
        return fn

    links_all = None
    for t_idx in present:
        tagged = links_of(extracted[t_idx]) \
            .map_batches(tag_links(t_idx), batch_format="pyarrow",
                         zero_copy_batch=True)
        links_all = tagged if links_all is None \
            else links_all.union(tagged)
    edges_all = links_to_edges(links_all, mapping, n,
                               num_partitions=num_partitions,
                               dedup=dedup,
                               carry=["slice_t"]).materialize()

    empty_edges = rd.from_arrow(pa.table({
        "src": pa.array([], pa.int64()),
        "dst": pa.array([], pa.int64()),
        "weight": pa.array([], pa.float64()),
    }))

    def take_slice(t_idx):
        def fn(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["slice_t"], t_idx)) \
                    .select(["src", "dst", "weight"])
        return fn

    slice_edges = [edges_all.map_batches(take_slice(t_idx),
                                         batch_format="pyarrow",
                                         zero_copy_batch=True)
                   if t_idx in extracted else empty_edges
                   for t_idx in range(T)]
    return slice_edges, mapping, n, bounds


def pages_to_graph(pages_ds, B=None, num_partitions=16, dedup=True,
                   extracted=None, canonicalize=False):
    """Full pipeline: pages -> extract -> id-assign -> dedup'd int edge
    table. Returns (edges Dataset(src,dst,weight), mapping Dataset, n).
    ``dedup=False`` leaves the exact dedup to the partition-local pass
    in ``DistGraph.from_dataset(dedup=True)``. Pass ``extracted`` (a
    materialised ``extract_dataset`` result) to share one extraction
    run with other consumers (host graph, text stages) instead of
    re-parsing the corpus.

    ``canonicalize=True`` runs `stages/urls.py` over page urls and
    both link endpoints before id assignment, so url variants (case,
    fragments, tracking params, default ports) merge into one vertex
    and their links resolve. Colliding page urls are globally deduped
    (one url shuffle — the canonical universe must be unique before
    `assign_ids`); off the default path because it changes vertex
    identity."""
    from .extract import extract_dataset, links_of, texts_of

    if extracted is None:
        extracted = extract_dataset(pages_ds).materialize()
    links = links_of(extracted)
    urls = texts_of(extracted).select_columns(["url"])
    if canonicalize:
        import pyarrow.compute as pc

        from .urls import canonicalize_url_array

        links = links.map_batches(
            lambda t: pa.table({
                "src_url": canonicalize_url_array(t["src_url"]),
                "dst_url": canonicalize_url_array(t["dst_url"])}),
            batch_format="pyarrow", zero_copy_batch=True)
        urls = urls.map_batches(
            lambda t: pa.table(
                {"url": pc.unique(canonicalize_url_array(t["url"]))}),
            batch_format="pyarrow", zero_copy_batch=True) \
            .groupby("url").map_groups(lambda df: df.head(1),
                                       batch_format="pandas")
    mapping, n = assign_ids(urls, B=B)
    mapping = mapping.materialize()
    edges = links_to_edges(links, mapping, n,
                           num_partitions=num_partitions, dedup=dedup)
    return edges, mapping, n
