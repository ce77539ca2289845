"""Synthetic web corpus generator (the bench's flagship input)."""

import numpy as np
import pytest
import ray.data as rd

from leidenalg_ray.sources.pages import (ensure_pages_corpus,
                                         synth_pages_shard)
from leidenalg_ray.stages.extract import extract_text


def test_shards_deterministic_and_consistent():
    a = synth_pages_shard(100, 150, 1000, seed=7)
    b = synth_pages_shard(100, 150, 1000, seed=7)
    assert a.equals(b)
    # stored text is the extractor ground truth
    for h, t in zip(a["html"].to_pylist(), a["text"].to_pylist()):
        assert extract_text(h) == t


def test_ensure_corpus_caches(tmp_path):
    p = str(tmp_path / "corpus")
    ensure_pages_corpus(p, 500, seed=3, shard_rows=128)
    ds = rd.read_parquet(p)
    assert ds.count() == 500
    import os
    mtimes = {f: os.path.getmtime(os.path.join(p, f))
              for f in os.listdir(p)}
    ensure_pages_corpus(p, 500, seed=3, shard_rows=128)  # no-op
    assert mtimes == {f: os.path.getmtime(os.path.join(p, f))
                      for f in os.listdir(p)}


def test_degree_skew_present():
    t = synth_pages_shard(0, 2000, 2000, seed=42)
    from leidenalg_ray.stages.extract import extract_links
    degs = [len(extract_links(h)) for h in t["html"].to_pylist()]
    degs = np.array(degs)
    assert degs.max() > 10 * max(1, int(np.median(degs)))  # heavy tail


def test_run_job_end_to_end_o_n_free_outputs(tmp_path):
    """Flagship job smoke: the per-vertex outputs land as shard-side
    partitioned parquet (pagerank/components/communities dirs), the
    summary carries the row counters, and rank/component values match
    an in-process recompute — all without the driver ever assembling
    an O(n) array (run_job uses result_out/membership_out only)."""
    import json
    import os
    import subprocess
    import sys

    import pyarrow.parquet as pq

    corpus = str(tmp_path / "pages")
    ensure_pages_corpus(corpus, 400, seed=5, shard_rows=128)
    out = str(tmp_path / "out")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, RAY_ADDRESS="local")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "run_job.py"),
         "--pages", corpus, "--out", out, "--partitions", "4",
         "--num-cpus", "4", "--build", "broadcast"],
        capture_output=True, text=True, env=env, cwd=repo,
        timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    summary = json.loads((
        open(os.path.join(out, "summary.json"))).read())
    n = summary["n_vertices"]
    assert summary["pagerank_rows"] == n
    assert summary["component_rows"] == n
    assert summary["membership_rows"] == n
    for sub, col in (("pagerank", "rank"), ("components", "component"),
                     ("communities", "comm")):
        t = pq.read_table(os.path.join(out, sub)).sort_by("vid")
        assert len(t) == n
        assert t["vid"].to_pylist() == list(range(n))
    # rank sums to 1 (dangling mass conserved end to end)
    ranks = pq.read_table(os.path.join(out, "pagerank"))
    assert abs(sum(ranks["rank"].to_pylist()) - 1.0) < 1e-6


def test_run_job_distributed_build_with_host_graph(tmp_path):
    """Flagship job through the >node-memory path (--build
    distributed: bucket-rank id assignment, hash-join edge resolve,
    Dataset-built CSR, parquet spill) plus --host-graph; shard-side
    outputs land and rank mass is conserved."""
    import json
    import os
    import subprocess
    import sys

    import pyarrow.parquet as pq

    corpus = str(tmp_path / "pages")
    ensure_pages_corpus(corpus, 400, seed=5, shard_rows=128)
    out = str(tmp_path / "out")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "run_job.py"),
         "--pages", corpus, "--out", out, "--partitions", "4",
         "--num-cpus", "4", "--build", "distributed", "--host-graph",
         "--canonicalize", "--anchors"],
        capture_output=True, text=True,
        env=dict(os.environ, RAY_ADDRESS="local"), cwd=repo,
        timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    summary = json.loads(open(os.path.join(out, "summary.json")).read())
    n = summary["n_vertices"]
    assert summary["pagerank_rows"] == n
    assert summary["membership_rows"] == n
    ranks = pq.read_table(os.path.join(out, "pagerank"))
    assert len(ranks) == n
    assert abs(sum(ranks["rank"].to_pylist()) - 1.0) < 1e-6
    hg = pq.read_table(os.path.join(out, "host_graph"))
    assert len(hg) > 0
    mapping = pq.read_table(os.path.join(out, "url_mapping"))
    assert len(mapping) == n
    # --canonicalize: the synthetic corpus is already canonical, so
    # vertex identity is unchanged (n matched above) but the url
    # column went through the rule chain (all lowercase hosts)
    assert all(u.startswith("https://s")
               for u in mapping["url"].to_pylist())
    # --anchors: per-target inbound anchor-term counts landed; the
    # corpus anchors are 'to {v}', so 'to' rows exist for real targets
    anc = pq.read_table(os.path.join(out, "anchor_terms"))
    assert len(anc) > 0
    terms = set(anc["term"].to_pylist())
    assert "to" in terms


def test_curate_corpus_end_to_end(tmp_path):
    """Curation job smoke: JSONL in -> exact dedup -> lang/quality
    filters -> ExactSubstr cut -> partitioned corpus + order table;
    the duplicated planted span is cut from BOTH carriers and the
    order table is a dense permutation of the survivors."""
    import json
    import os
    import subprocess
    import sys

    import pyarrow.parquet as pq

    shared = ("alpha beta gamma delta epsilon zeta eta theta "
              "iota kappa")
    filler = ("the and of to is value table row scan query merge "
              "hash spark stream window batch part")
    rows = [
        {"doc_id": 0, "text": shared + " " + filler},
        {"doc_id": 1, "text": filler + " " + shared},
        {"doc_id": 2, "text": filler + " " + filler},
        {"doc_id": 3, "text": filler + " " + filler},  # exact dup of 2
        {"doc_id": 4, "text": "tiny"},                 # fails quality
        {"doc_id": 5, "text": "der die das und ist nicht mit ein "
                              "der die das und ist"},  # fails lang
    ]
    inp = str(tmp_path / "in.jsonl")
    with open(inp, "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))
    out = str(tmp_path / "out")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, RAY_ADDRESS="local")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts",
                                      "curate_corpus.py"),
         "--in", inp, "--out", out, "--num-cpus", "4",
         "--partitions", "2"],
        capture_output=True, text=True, env=env, cwd=repo,
        timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["n_total"] == 6
    assert summary["n_after_exact_dedup"] == 5   # doc 3 collapsed
    assert summary["n_after_filters"] == 3       # 4 and 5 dropped
    # every copy of both repeated runs is cut: the 10-token shared
    # run in docs 0+1 (20) and the 17-token filler run carried by
    # docs 0, 1 and twice by doc 2 (17+17+34)
    assert summary["tokens_cut"] == 88

    corpus = pq.read_table(os.path.join(out, "corpus")).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(corpus["doc_id"]) == [0, 1, 2]
    # the shared run is gone from both docs 0 and 1
    assert not any("alpha" in t for t in corpus["text"])
    order = pq.read_table(os.path.join(out, "order")).to_pandas()
    assert sorted(order["rank"]) == [0, 1, 2]
    assert set(order["doc_id"]) == {0, 1, 2}


def test_curate_corpus_nb_lang_filter(tmp_path):
    """--lang-filter nb: the Naive-Bayes classifier is trained on the
    corpus's own lang labels and its predictions drive the language
    filter — the de-labeled German doc is dropped, the en docs
    survive."""
    import json
    import os
    import subprocess
    import sys

    import pyarrow.parquet as pq

    filler = ("the and of to is value table row scan query merge "
              "hash spark stream window batch part")
    de = ("der die das und ist nicht mit ein kein aber der die das "
          "und ist nicht mit ein kein aber")
    rows = [
        {"doc_id": 0, "text": filler + " alpha beta", "lang": "en"},
        {"doc_id": 1, "text": filler + " gamma delta", "lang": "en"},
        {"doc_id": 2, "text": de, "lang": "de"},
        {"doc_id": 3, "text": de + " extra", "lang": "de"},
    ]
    inp = str(tmp_path / "in.jsonl")
    with open(inp, "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))
    out = str(tmp_path / "out")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, RAY_ADDRESS="local")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts",
                                      "curate_corpus.py"),
         "--in", inp, "--out", out, "--num-cpus", "4",
         "--partitions", "2", "--lang-filter", "nb",
         "--min-words", "5", "--min-stop-hits", "1"],
        capture_output=True, text=True, env=env, cwd=repo,
        timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["n_total"] == 4
    corpus = pq.read_table(os.path.join(out, "corpus")).to_pandas()
    assert set(corpus["doc_id"]) == {0, 1}


def test_run_job_anf_summary(tmp_path):
    """--anf R: summary carries the neighbourhood function, the
    90%-effective diameter, and the shard-side ball-estimate rows;
    NF is monotone and the diameter is within the round budget."""
    import json
    import os
    import subprocess
    import sys

    import pyarrow.parquet as pq

    corpus = str(tmp_path / "pages")
    ensure_pages_corpus(corpus, 300, seed=9, shard_rows=128)
    out = str(tmp_path / "out")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, RAY_ADDRESS="local")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "run_job.py"),
         "--pages", corpus, "--out", out, "--partitions", "4",
         "--num-cpus", "4", "--build", "broadcast", "--anf", "6"],
        capture_output=True, text=True, env=env, cwd=repo,
        timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    summary = json.loads(open(os.path.join(out, "summary.json")).read())
    anf = summary["anf"]
    nf = anf["nf"]
    assert len(nf) == anf["rounds"] + 1
    assert all(b >= a for a, b in zip(nf, nf[1:]))
    assert 0 <= anf["effective_diameter_90"] <= anf["rounds"]
    assert anf["ball_rows"] == summary["n_vertices"]
    balls = pq.read_table(os.path.join(out, "ball_est")).to_pandas()
    assert len(balls) == summary["n_vertices"]
    assert (balls["ball_est"] >= 0).all()
