"""End-to-end web-text curation job — raw dump in, training corpus out.

    python scripts/curate_corpus.py --in dump.jsonl --out /tmp/corpus

Pipeline (every stage is the gate-verified operator, composed):

  1. read JSONL / CSV / parquet into the canonical documents schema
     (``sources/docs.py``; streaming, any shard count),
  2. exact dedup — keep the min-doc_id representative per text hash
     (one (hash, doc_id) shuffle; ``stages/dedup.exact_dedup``),
  3. language filter (``stages/text.lang_id``),
  4. quality gate on the Gopher signals (``stages/text.gopher_rules``:
     n_words floor + stopword-hit floor, the discriminating subset),
  5. ExactSubstr rewrite — cut corpus-duplicated 8-gram spans
     (``stages/dedup.exact_substr_rewrite(emit_text=True)``),
  6. seeded global shuffle rank (training order;
     ``stages/pack.global_shuffle_rank``),
  7. write the cleaned corpus as hash-partitioned parquet
     (``out/corpus/part=p/``) plus the (doc_id, rank) order table
     (``out/order/``).

Prints ONE JSON line: per-stage survivor counts + cut-token totals.
Driver state: per-stage counters, the broadcast keep-sets (bounded by
survivors/duplication volume — see the stage docstrings for the
at-scale semi-join swaps), never the corpus.

Standalone safety: initialises Ray only if no session exists.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def read_corpus(path):
    import ray.data as rd

    from leidenalg_ray.sources import docs as docsrc
    if path.endswith(".jsonl") or path.endswith(".jsonl.gz") \
            or path.endswith(".json"):
        return docsrc.read_documents_jsonl([path])
    if path.endswith(".csv"):
        return docsrc.read_documents_csv([path])
    ds = rd.read_parquet(path)
    return ds.map_batches(lambda t: docsrc._normalise(t),
                          batch_format="pyarrow", zero_copy_batch=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="inp", required=True,
                    help="corpus path (.jsonl/.csv/parquet dir)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--lang", default="en")
    ap.add_argument("--lang-filter", choices=("heuristic", "nb"),
                    default="heuristic",
                    help="'heuristic' = marker-word LangId; 'nb' = "
                    "one-pass Naive-Bayes classifier trained on the "
                    "corpus's own labeled rows (stages/text.nb_train)")
    ap.add_argument("--min-words", type=int, default=10)
    ap.add_argument("--min-stop-hits", type=int, default=1)
    ap.add_argument("--substr-n", type=int, default=8)
    ap.add_argument("--seed", type=int, default=17)
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, log_to_driver=False)
    import ray.data as rd

    from leidenalg_ray.sources import docs as docsrc
    from leidenalg_ray.stages import dedup as dd
    from leidenalg_ray.stages import pack as pk
    from leidenalg_ray.stages import text as tx

    t0 = time.time()
    docs = read_corpus(args.inp)
    n_total = docs.count()

    # 2. exact dedup: broadcast the representative doc_id set
    reps = dd.exact_dedup(docs).to_pandas()["rep_doc_id"] \
        .to_numpy(np.int64)
    reps_ref = ray.put(np.sort(reps))

    def keep_reps(t: pa.Table) -> pa.Table:
        keep = np.isin(t["doc_id"].to_numpy(zero_copy_only=False),
                       ray.get(reps_ref))
        return t.filter(pa.array(keep))

    docs = docs.map_batches(keep_reps, batch_format="pyarrow",
                            zero_copy_batch=True)
    n_dedup = len(reps)

    # 3+4. language + quality flags in ONE pass over survivors
    if args.lang_filter == "nb":
        model = tx.nb_train(docs)     # trains on rows with a label
        lang_t = tx.nb_score(docs, model)
    else:
        lang_t = tx.lang_id(docs)
    gq = tx.gopher_rules(docs)
    lang_ids = lang_t.to_pandas()
    good_lang = set(lang_ids.loc[lang_ids["pred_lang"] == args.lang,
                                 "doc_id"].astype(int))
    g = gq.to_pandas()
    good_q = set(g.loc[(g["n_words"] >= args.min_words)
                       & (g["stop_hits"] >= args.min_stop_hits),
                       "doc_id"].astype(int))
    survivors = np.sort(np.array(sorted(good_lang & good_q),
                                 dtype=np.int64))
    surv_ref = ray.put(survivors)

    def keep_surv(t: pa.Table) -> pa.Table:
        keep = np.isin(t["doc_id"].to_numpy(zero_copy_only=False),
                       ray.get(surv_ref))
        return t.filter(pa.array(keep))

    docs = docs.map_batches(keep_surv, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
    n_filtered = int(len(survivors))

    # 5. ExactSubstr rewrite over the filtered corpus
    rw = dd.exact_substr_rewrite(docs, n=args.substr_n,
                                 emit_text=True)

    def as_docs(t: pa.Table) -> pa.Table:
        txt = t["clean_text"]
        return pa.table({
            "doc_id": t["doc_id"],
            "text": txt,
            "lang": pa.array([args.lang] * t.num_rows, pa.string()),
            "source": pa.array(["curated"] * t.num_rows, pa.string()),
            "n_chars": pc.cast(pc.utf8_length(txt), pa.int64()),
        })

    stats = rw.map_batches(
        lambda t: pa.table({
            "one": pa.array([t.num_rows], pa.int64()),
            "cut": pa.array(
                [int(pc.sum(t["n_cut"]).as_py() or 0)], pa.int64()),
            "tok": pa.array(
                [int(pc.sum(t["n_tokens"]).as_py() or 0)],
                pa.int64()),
        }), batch_format="pyarrow").sum(["one", "cut", "tok"])
    clean = rw.map_batches(as_docs, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()

    # 6. training order
    order = pk.global_shuffle_rank(clean, seed=args.seed)
    order_dir = os.path.join(args.out, "order")
    order.write_parquet(order_dir)

    # 7. partitioned corpus sink
    corpus_dir = os.path.join(args.out, "corpus")
    docsrc.write_documents_partitioned(clean, corpus_dir,
                                       P=args.partitions)

    print(json.dumps({
        "n_total": int(n_total),
        "n_after_exact_dedup": int(n_dedup),
        "n_after_filters": n_filtered,
        "tokens_total": int(stats["sum(tok)"]),
        "tokens_cut": int(stats["sum(cut)"]),
        "out_corpus": corpus_dir,
        "out_order": order_dir,
        "wall_s": round(time.time() - t0, 3),
    }))


if __name__ == "__main__":
    main()
