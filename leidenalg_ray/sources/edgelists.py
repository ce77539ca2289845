"""Edge-list ingestion beyond parquet (CSV, JSONL, whitespace text)
and the partitioned-parquet graph sink.

The reference consumes igraph objects already in RAM
(reference src/leidenalg/functions.py:1-40); this engine's graph
substrate is a Dataset of ``(src, dst[, weight])`` rows, so format
support is a reader that lands ANY edge serialisation in that schema —
after which every kernel (`DistGraph.from_dataset`, PageRank, CC,
Leiden) is format-agnostic.

Scale notes:
- Readers are Ray Data native (`read_csv` / `read_json` /
  `read_text`), so ingestion streams block-by-block and column
  normalisation is a zero-copy Arrow `map_batches` — no driver
  materialisation at any corpus size.
- The sink writes one directory per ``src % P`` partition — the same
  layout `DistGraph.from_dataset` spills to — so a sunk graph is
  directly resumable: a restarted job re-reads only the partitions it
  needs, and a failed write can skip finished directories.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

EDGE_SCHEMA_DOC = "(src int64, dst int64, weight float64)"


def _normalise(t: pa.Table, src="src", dst="dst",
               weight="weight") -> pa.Table:
    cols = {
        "src": pc.cast(t[src], pa.int64()),
        "dst": pc.cast(t[dst], pa.int64()),
        "weight": (pc.cast(t[weight], pa.float64())
                   if weight in t.column_names
                   else pa.array(np.ones(len(t)), pa.float64())),
    }
    return pa.table(cols)


def read_edges_csv(paths, src="src", dst="dst", weight="weight"):
    """CSV (with header) -> Dataset(src, dst, weight)."""
    ds = rd.read_csv(paths)
    return ds.map_batches(_normalise, batch_format="pyarrow",
                          zero_copy_batch=True,
                          fn_kwargs={"src": src, "dst": dst,
                                     "weight": weight})


def read_edges_jsonl(paths, src="src", dst="dst", weight="weight"):
    """JSON-lines ({"src": .., "dst": .., "weight": ..} per line)
    -> Dataset(src, dst, weight)."""
    ds = rd.read_json(paths)
    return ds.map_batches(_normalise, batch_format="pyarrow",
                          zero_copy_batch=True,
                          fn_kwargs={"src": src, "dst": dst,
                                     "weight": weight})


def read_edges_text(paths, delimiter=None):
    """Whitespace/delimiter-separated text edge list (``src dst
    [weight]`` per line, ``#`` comments) — the SNAP/Laboratory-style
    format. Parsing is vectorised per text block."""
    ds = rd.read_text(paths)

    def parse(t: pa.Table) -> pa.Table:
        lines = t["text"].to_pylist()
        src, dst, w = [], [], []
        for ln in lines:
            ln = ln.strip()
            if not ln or ln.startswith("#"):
                continue
            parts = ln.split(delimiter)
            src.append(int(parts[0]))
            dst.append(int(parts[1]))
            w.append(float(parts[2]) if len(parts) > 2 else 1.0)
        return pa.table({
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "weight": pa.array(w, pa.float64()),
        })

    return ds.map_batches(parse, batch_format="pyarrow",
                          zero_copy_batch=True)


def write_edges_partitioned(edges_ds, out_dir, P=8):
    """Sink: Dataset(src, dst[, weight]) -> ``out_dir/part=p/``
    parquet, partitioned by ``src % P`` (the block-build layout).
    Returns ``out_dir``."""
    def with_part(t: pa.Table) -> pa.Table:
        t = _normalise(t)
        part = (t["src"].to_numpy(zero_copy_only=False)
                % P).astype(np.int32)
        return t.append_column("part", pa.array(part))

    edges_ds.map_batches(with_part, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .write_parquet(out_dir, partition_cols=["part"])
    return out_dir


def read_edges_partitioned(out_dir):
    """Read a partitioned sink back to Dataset(src, dst, weight)."""
    ds = rd.read_parquet(out_dir)
    return ds.map_batches(
        lambda t: _normalise(t), batch_format="pyarrow",
        zero_copy_batch=True)


def read_edges_metis(paths):
    """METIS graph format (Karypis & Kumar, the partitioner-ecosystem
    interchange format): header ``n m [fmt]``, then line i holds the
    1-based neighbour list of vertex i (``%`` comment lines allowed);
    ``fmt`` bit 0 = edge weights as (v, w) pairs. Vertex-weighted /
    vertex-sized fmts (any bit beyond the edge-weight bit) raise
    ``NotImplementedError``. Emits 0-based ``(src, dst, weight)``
    rows — both directions, as stored in a valid METIS file;
    downstream dedup/symmetrise exactly as for any edge source.

    The format is line-position-dependent (the line NUMBER is the
    vertex id), so a FILE is the parse unit: one task per file
    (``read_binary_files``), parallelism across files — shard big
    corpora into many files, the WARC-reader convention."""
    ds = rd.read_binary_files(paths)

    def parse(t: pa.Table) -> pa.Table:
        src, dst, w = [], [], []
        for buf in t["bytes"].to_pylist():
            lines = [ln for ln in bytes(buf).decode().splitlines()
                     if ln.strip() and not ln.lstrip().startswith("%")]
            head = lines[0].split()
            fmt = head[2] if len(head) > 2 else "0"
            if int(fmt) not in (0, 1):
                raise NotImplementedError(
                    f"METIS fmt={fmt}: vertex weights/sizes are not "
                    "supported (edge-weight fmt 1 and plain 0 are)")
            ew = int(fmt) == 1
            n = int(head[0])
            if len(lines) - 1 != n:
                raise ValueError(
                    f"METIS file: header says n={n} but "
                    f"{len(lines) - 1} vertex lines found")
            for i, ln in enumerate(lines[1:]):
                parts = ln.split()
                step = 2 if ew else 1
                for j in range(0, len(parts), step):
                    src.append(i)
                    dst.append(int(parts[j]) - 1)
                    w.append(float(parts[j + 1]) if ew else 1.0)
        return pa.table({
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "weight": pa.array(w, pa.float64()),
        })

    return ds.map_batches(parse, batch_format="pyarrow",
                          zero_copy_batch=True)


def write_metis(path, n, src, dst, weight=None):
    """Serialise an undirected edge set (0-based numpy arrays, one
    row per edge) as a METIS file — the interchange/test helper
    counterpart of ``read_edges_metis`` (driver-side adjacency
    build; not a scale path)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    adj = [[] for _ in range(n)]
    for k in range(len(src)):
        a, b = int(src[k]), int(dst[k])
        wk = float(weight[k]) if weight is not None else None
        adj[a].append((b, wk))
        adj[b].append((a, wk))
    ew = weight is not None
    with open(path, "w") as f:
        f.write(f"{n} {len(src)}" + (" 1" if ew else "") + "\n")
        for nbrs in adj:
            toks = []
            for b, wk in sorted(nbrs):
                toks.append(str(b + 1))
                if ew:
                    toks.append(str(int(wk) if wk == int(wk) else wk))
            f.write(" ".join(toks) + "\n")
    return path
