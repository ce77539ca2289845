"""Document-corpus ingestion beyond parquet: JSONL and CSV readers
that land any raw text dump in the canonical ``documents`` schema
``(doc_id int64, text string, lang string, source string,
n_chars int64)`` — after which every text/dedup/retrieval stage is
format-agnostic (same contract as ``edgelists`` for graphs).

Web-text corpora are usually shipped as gzipped JSONL (one object per
document); ``ray.data.read_json`` handles both plain and ``.gz``
shards and streams block-by-block, so normalisation is a zero-copy
Arrow ``map_batches`` with no driver materialisation at any corpus
size. Missing columns get deterministic defaults (``n_chars`` is
recomputed from the text when absent so downstream length filters
never see nulls).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

DOC_SCHEMA_DOC = ("(doc_id int64, text string, lang string, "
                  "source string, n_chars int64)")


def _normalise(t: pa.Table, text="text", doc_id="doc_id",
               lang="lang", source="source") -> pa.Table:
    n = t.num_rows
    txt = pc.cast(t[text], pa.string())
    length = pc.cast(pc.utf8_length(txt), pa.int64())
    # a column can be absent from the shard OR null per row (JSON
    # readers unify schemas across objects) — default both ways
    cols = {
        "doc_id": pc.cast(t[doc_id], pa.int64()),
        "text": txt,
        "lang": (pc.fill_null(pc.cast(t[lang], pa.string()), "und")
                 if lang in t.column_names
                 else pa.array(["und"] * n, pa.string())),
        "source": (pc.fill_null(pc.cast(t[source], pa.string()),
                                "unknown")
                   if source in t.column_names
                   else pa.array(["unknown"] * n, pa.string())),
        "n_chars": (pc.coalesce(pc.cast(t["n_chars"], pa.int64()),
                                length)
                    if "n_chars" in t.column_names else length),
    }
    return pa.table(cols)


def read_documents_jsonl(paths, text="text", doc_id="doc_id",
                         lang="lang", source="source"):
    """JSONL shards -> documents Dataset. Column-name kwargs remap
    dumps that call the fields e.g. ``content``/``id``."""
    ds = rd.read_json(paths)
    return ds.map_batches(
        lambda t: _normalise(t, text=text, doc_id=doc_id, lang=lang,
                             source=source),
        batch_format="pyarrow", zero_copy_batch=True)


def read_documents_csv(paths, text="text", doc_id="doc_id",
                       lang="lang", source="source"):
    """CSV shards -> documents Dataset (same normalisation)."""
    ds = rd.read_csv(paths)
    return ds.map_batches(
        lambda t: _normalise(t, text=text, doc_id=doc_id, lang=lang,
                             source=source),
        batch_format="pyarrow", zero_copy_batch=True)


def write_documents_partitioned(docs_ds, out_dir, P=8):
    """Sink: documents Dataset -> ``out_dir/part=p/`` parquet,
    partitioned by ``doc_id % P`` so a re-run (or a downstream
    consumer wanting a single shard) addresses partitions
    independently — the corpus counterpart of
    ``edgelists.write_edges_partitioned``. Returns ``out_dir``."""
    import numpy as np

    def with_part(t: pa.Table) -> pa.Table:
        t = _normalise(t)
        part = (t["doc_id"].to_numpy(zero_copy_only=False)
                % P).astype("int32")
        return t.append_column("part", pa.array(part))

    docs_ds.map_batches(with_part, batch_format="pyarrow",
                        zero_copy_batch=True) \
        .write_parquet(out_dir, partition_cols=["part"])
    return out_dir


def read_documents_partitioned(out_dir):
    """Read a partitioned corpus sink back to a documents Dataset."""
    ds = rd.read_parquet(out_dir)
    return ds.map_batches(
        lambda t: _normalise(t), batch_format="pyarrow",
        zero_copy_batch=True)
