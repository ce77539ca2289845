"""Edge-list format readers (CSV / JSONL / text) and the partitioned
graph sink: every format must land the same (src, dst, weight) rows,
and a graph built from any of them must produce identical kernel
results."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from leidenalg_ray.sources import edgelists as el
from leidenalg_ray.dist.blocks import DistGraph, symmetrize_edges
from leidenalg_ray.dist import superstep as ss


EDGES = [(0, 1, 1.0), (1, 2, 2.0), (2, 0, 1.0),
         (3, 4, 1.0), (4, 5, 1.0), (6, 6, 1.0)]


@pytest.fixture(scope="module")
def fmt_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edgefmt")
    pd.DataFrame(EDGES, columns=["src", "dst", "weight"]).to_csv(
        d / "edges.csv", index=False)
    with open(d / "edges.jsonl", "w") as f:
        for s, t, w in EDGES:
            f.write(json.dumps({"src": s, "dst": t, "weight": w}) + "\n")
    with open(d / "edges.txt", "w") as f:
        f.write("# comment line\n\n")
        for s, t, w in EDGES:
            f.write(f"{s} {t} {w}\n")
    return str(d)


def _rows(ds):
    df = ds.to_pandas().sort_values(["src", "dst"]).reset_index(
        drop=True)
    return list(map(tuple, df[["src", "dst", "weight"]].to_numpy()))


def test_formats_agree(fmt_dir):
    want = sorted(EDGES)
    assert _rows(el.read_edges_csv(
        os.path.join(fmt_dir, "edges.csv"))) == want
    assert _rows(el.read_edges_jsonl(
        os.path.join(fmt_dir, "edges.jsonl"))) == want
    assert _rows(el.read_edges_text(
        os.path.join(fmt_dir, "edges.txt"))) == want


def test_sink_roundtrip(fmt_dir, tmp_path):
    ds = el.read_edges_csv(os.path.join(fmt_dir, "edges.csv"))
    out = el.write_edges_partitioned(ds, str(tmp_path / "sunk"), P=4)
    # partitioned layout: one directory per src % P
    parts = sorted(p for p in os.listdir(out) if p.startswith("part="))
    assert parts == ["part=0", "part=1", "part=2", "part=3"]
    back = el.read_edges_partitioned(out)
    assert _rows(back) == sorted(EDGES)


def test_kernels_format_agnostic(fmt_dir):
    comps = {}
    for name, rdr in [("csv", el.read_edges_csv),
                      ("jsonl", el.read_edges_jsonl)]:
        ds = rdr(os.path.join(fmt_dir, f"edges.{name}" if name != "jsonl"
                              else "edges.jsonl"))
        g = DistGraph.from_dataset(symmetrize_edges(ds), n=7, P=4,
                                   directed=False)
        comps[name] = np.asarray(ss.connected_components(g)[0])
    assert (comps["csv"] == comps["jsonl"]).all()
    lab = comps["csv"]
    assert lab[0] == lab[1] == lab[2]
    assert lab[3] == lab[4] == lab[5]
    assert lab[6] not in (lab[0], lab[3])


def test_read_documents_jsonl_and_csv(ray_session, tmp_path):
    """JSONL/CSV document dumps normalise to the canonical documents
    schema (missing lang/source/n_chars get defaults) and feed the
    text stages unchanged."""
    import json

    import pyarrow as pa

    from leidenalg_ray.sources import docs as docsrc
    from leidenalg_ray.stages import text as tx

    rows = [
        {"doc_id": 0, "text": "the quick brown fox", "lang": "en"},
        {"doc_id": 1, "text": "der schnelle fuchs"},
    ]
    p = tmp_path / "d.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    ds = docsrc.read_documents_jsonl([str(p)])
    df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(df.columns) == ["doc_id", "text", "lang", "source",
                                "n_chars"]
    assert df.loc[1, "lang"] == "und"
    assert df.loc[0, "source"] == "unknown"
    assert df.loc[0, "n_chars"] == len(rows[0]["text"])
    # stages accept the normalised schema as-is
    out = tx.token_counts(ds).to_pandas()
    assert len(out) == 2

    c = tmp_path / "d.csv"
    c.write_text("doc_id,content\n0,alpha beta\n1,gamma\n")
    ds2 = docsrc.read_documents_csv([str(c)], text="content")
    df2 = ds2.to_pandas().sort_values("doc_id")
    assert list(df2["n_chars"]) == [10, 5]


def test_documents_partitioned_roundtrip(ray_session, tmp_path):
    """Corpus sink/round-trip: hash-partitioned by doc_id % P, read
    back equal (modulo row order)."""
    import pyarrow as pa
    import ray.data as rd

    from leidenalg_ray.sources import docs as docsrc

    t = pa.table({
        "doc_id": pa.array(range(10), pa.int64()),
        "text": pa.array([f"doc {i} words" for i in range(10)]),
        "lang": pa.array(["en"] * 10),
        "source": pa.array(["s"] * 10),
        "n_chars": pa.array([11] * 10, pa.int64()),
    })
    out = str(tmp_path / "corpus")
    docsrc.write_documents_partitioned(rd.from_arrow(t), out, P=4)
    import os
    parts = sorted(d for d in os.listdir(out) if d.startswith("part="))
    assert parts == ["part=0", "part=1", "part=2", "part=3"]
    back = docsrc.read_documents_partitioned(out).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert back.equals(t.to_pandas())


def test_metis_roundtrip_and_weighted(ray_session, tmp_path):
    import numpy as np
    from leidenalg_ray.sources import edgelists as el

    src = np.array([0, 0, 1, 2])
    dst = np.array([1, 2, 3, 3])
    w = np.array([1.0, 2.0, 3.0, 4.0])
    p1 = el.write_metis(str(tmp_path / "g.metis"), 4, src, dst)
    df = el.read_edges_metis([p1]).to_pandas()
    # both directions of every undirected edge
    got = set(zip(df["src"], df["dst"]))
    want = set()
    for a, b in zip(src, dst):
        want.add((a, b))
        want.add((b, a))
    assert got == want
    assert (df["weight"] == 1.0).all()

    p2 = el.write_metis(str(tmp_path / "gw.metis"), 4, src, dst, w)
    dfw = el.read_edges_metis([p2]).to_pandas()
    by_pair = {(r.src, r.dst): r.weight for r in dfw.itertuples()}
    for a, b, ww in zip(src, dst, w):
        assert by_pair[(a, b)] == ww
        assert by_pair[(b, a)] == ww


def test_metis_comments_and_seams(ray_session, tmp_path):
    import pytest
    from leidenalg_ray.sources import edgelists as el

    p = str(tmp_path / "c.metis")
    with open(p, "w") as f:
        f.write("% a comment\n2 1\n% inline comment\n2\n1\n")
    df = el.read_edges_metis([p]).to_pandas()
    assert set(zip(df["src"], df["dst"])) == {(0, 1), (1, 0)}

    bad = str(tmp_path / "vw.metis")
    with open(bad, "w") as f:
        f.write("2 1 11\n1 2\n1 1\n")  # vertex-weighted fmt
    with pytest.raises(Exception):
        el.read_edges_metis([bad]).to_pandas()


def test_metis_feeds_kernels(ray_session, tmp_path):
    import numpy as np
    from leidenalg_ray.sources import edgelists as el
    from leidenalg_ray.dist.blocks import DistGraph
    from leidenalg_ray.dist import superstep as ss

    # path 0-1-2-3: components and degree via the METIS source
    p = el.write_metis(str(tmp_path / "p.metis"), 4,
                       np.array([0, 1, 2]), np.array([1, 2, 3]))
    ds = el.read_edges_metis([p])
    g = DistGraph.from_dataset(ds, n=4, P=2, directed=False,
                               dedup=True)
    comp, _ = ss.connected_components(g)
    assert len(np.unique(comp)) == 1


def test_graph_job_end_to_end_metis(ray_session, tmp_path):
    """graph_job CLI: METIS file in -> pagerank/cc/leiden/anf sharded
    outputs + summary; components of the two planted cliques are
    recovered and Leiden finds exactly two communities."""
    import json
    import os
    import subprocess
    import sys

    import numpy as np
    import pyarrow.parquet as pq
    from leidenalg_ray.sources import edgelists as el

    # two disjoint K4 cliques over 8 vertices
    src, dst = [], []
    for base in (0, 4):
        for i in range(4):
            for j in range(i + 1, 4):
                src.append(base + i)
                dst.append(base + j)
    p = el.write_metis(str(tmp_path / "g.metis"), 8,
                       np.array(src), np.array(dst))
    out = str(tmp_path / "out")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, RAY_ADDRESS="local")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "graph_job.py"),
         "--edges", p, "--format", "metis", "--out", out,
         "--kernels", "pagerank,cc,leiden,anf", "--partitions", "4",
         "--num-cpus", "4", "--gamma", "0.5"],
        capture_output=True, text=True, env=env, cwd=repo,
        timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    summary = json.loads(open(os.path.join(out, "summary.json")).read())
    assert summary["n_vertices"] == 8
    comp = pq.read_table(os.path.join(out, "components")).to_pandas() \
        .sort_values("vid")
    assert len(set(comp["component"][:4])) == 1
    assert len(set(comp["component"][4:])) == 1
    assert comp["component"].nunique() == 2
    assert summary["leiden"]["n_communities"] == 2
    assert summary["anf"]["effective_diameter_90"] <= 1
    pr = pq.read_table(os.path.join(out, "pagerank")).to_pandas()
    assert len(pr) == 8
