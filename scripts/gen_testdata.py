"""Deterministic synthesizer of the driver's TPC-H-ish test tables at
arbitrary scale factor, for scale re-validation beyond the shipped
/root/testdata/sf{0.001,0.01,0.1} (TESTDATA.md — those are read-only
and top out at sf0.1).

Schema-identical to the driver tables (same columns, arrow types and
categorical domains, verified against sf0.1); distributions follow the
same shapes (uniform keys, lines/order ~ Poisson(4) clipped >=1,
documents drawn from the same 31-word vocab with ~0.3% planted exact
duplicates, unit-norm 64-dim embeddings with weak label structure).
Row counts scale linearly with sf exactly like the shipped tables
(lineitem ~ 6M*sf, part 200k*sf, supplier 10k*sf, ...).

Seeded (seed=42 by default) and pure-numpy: the same (sf, seed) always
produces byte-identical parquet, so correctness runs against a
generated dir are reproducible. The gate compares the Ray engine and
the DuckDB oracle over the SAME files, so the generator does not need
to replay the driver's exact rows — only its schema and shape.

Usage: python scripts/gen_testdata.py --sf 1 --out /tmp/testdata/sf1
"""

from __future__ import annotations

import argparse
import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ("a agg batch big column customer data dup fast filter group "
         "hash join key line merge order part query row scan slow small "
         "sort spark stream table the value vector window").split()
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
            "MACHINERY"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PCOLORS = ["large", "hot", "blue", "red", "green", "small", "dim",
           "plain", "shiny", "old"]
PNOUNS = ["ring", "bolt", "clip", "wheel", "cog", "pin", "rod", "cap"]
PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ETYPES = ["view", "click", "signup", "purchase", "error"]
LANGS = ["en", "de", "fr", "es", "zh"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]

EPOCH_1995 = np.datetime64("1995-01-01", "us")
EPOCH_2024 = np.datetime64("2024-01-01", "us")
DAY_US = 86_400_000_000


def _rng(seed, table):
    # crc32, not hash(): str hash is salted per-process (PYTHONHASHSEED)
    return np.random.default_rng(
        [seed, zlib.crc32(table.encode()) & 0x7FFFFFFF])


def _write(out_dir, name, table):
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))


def counts(sf):
    return {
        "supplier": max(25, int(10_000 * sf)),
        "part": max(100, int(200_000 * sf)),
        "customer": max(100, int(150_000 * sf)),
        "orders": max(100, int(1_500_000 * sf)),
        "events": max(100, int(1_000_000 * sf)),
        "documents": max(50, int(50_000 * sf)),
        "embeddings": max(50, int(20_000 * sf)),
    }


def generate(sf, out_dir, seed=42):
    os.makedirs(out_dir, exist_ok=True)
    n = counts(sf)

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
        "r_name": pa.array(REGIONS)}))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array(np.arange(25, dtype=np.int32) % 5)}))

    r = _rng(seed, "supplier")
    ns = n["supplier"]
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(ns, dtype=np.int64)),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(ns)]),
        "s_nationkey": pa.array(
            r.integers(0, 25, ns).astype(np.int32)),
        "s_acctbal": pa.array(
            np.round(r.uniform(-999.99, 9999.99, ns), 2))}))

    r = _rng(seed, "customer")
    nc = n["customer"]
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(nc, dtype=np.int64)),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(nc)]),
        "c_nationkey": pa.array(
            r.integers(0, 25, nc).astype(np.int32)),
        "c_acctbal": pa.array(
            np.round(r.uniform(-999.99, 9999.99, nc), 2)),
        "c_mktsegment": pa.array(
            [SEGMENTS[i] for i in r.integers(0, 5, nc)])}))

    r = _rng(seed, "part")
    np_parts = n["part"]
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(np_parts, dtype=np.int64)),
        "p_name": pa.array(
            [f"{PCOLORS[a]} {PNOUNS[b]}"
             for a, b in zip(r.integers(0, len(PCOLORS), np_parts),
                             r.integers(0, len(PNOUNS), np_parts))]),
        "p_brand": pa.array(
            [f"Brand#{i}" for i in r.integers(1, 26, np_parts)]),
        "p_type": pa.array(
            [PTYPES[i] for i in r.integers(0, len(PTYPES), np_parts)]),
        "p_size": pa.array(r.integers(1, 51, np_parts).astype(np.int32)),
        "p_retailprice": pa.array(
            np.round(r.uniform(900.0, 999.9, np_parts), 2))}))

    r = _rng(seed, "orders")
    no = n["orders"]
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(no, dtype=np.int64)),
        "o_custkey": pa.array(r.integers(0, nc, no)),
        "o_orderstatus": pa.array(
            [("O", "P", "F")[i]
             for i in r.choice(3, no, p=[0.49, 0.02, 0.49])]),
        "o_totalprice": pa.array(
            np.round(r.uniform(1000.0, 500000.0, no), 2)),
        "o_orderdate": pa.array(
            EPOCH_1995 + (r.integers(0, 2405, no) * DAY_US)
            .astype("timedelta64[us]")),
        "o_orderpriority": pa.array(
            [PRIOS[i] for i in r.integers(0, 5, no)])}))

    r = _rng(seed, "lineitem")
    lines = np.clip(r.poisson(4.0, no), 1, None)
    nl = int(lines.sum())
    okey = np.repeat(np.arange(no, dtype=np.int64), lines)
    lnum = (np.arange(nl, dtype=np.int64)
            - np.repeat(np.cumsum(lines) - lines, lines) + 1)
    qty = r.integers(1, 51, nl).astype(np.float64)
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(okey),
        "l_partkey": pa.array(r.integers(0, np_parts, nl)),
        "l_suppkey": pa.array(r.integers(0, ns, nl)),
        "l_linenumber": pa.array(lnum.astype(np.int32)),
        "l_quantity": pa.array(qty),
        "l_extendedprice": pa.array(
            np.round(qty * r.uniform(900.0, 2100.0, nl), 2)),
        "l_discount": pa.array(
            np.round(r.integers(0, 11, nl) * 0.01, 2)),
        "l_tax": pa.array(np.round(r.integers(0, 9, nl) * 0.01, 2)),
        "l_returnflag": pa.array(
            [("A", "N", "R")[i] for i in r.integers(0, 3, nl)]),
        "l_linestatus": pa.array(
            [("F", "O")[i] for i in r.integers(0, 2, nl)]),
        "l_shipdate": pa.array(
            EPOCH_1995 + (r.integers(1, 2500, nl) * DAY_US)
            .astype("timedelta64[us]"))}))

    r = _rng(seed, "events")
    ne = n["events"]
    n_users = max(15, int(15_000 * sf))
    ts = np.sort(r.integers(0, 30 * DAY_US, ne))
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(ne, dtype=np.int64)),
        "ts": pa.array(EPOCH_2024 + ts.astype("timedelta64[us]")),
        "user_id": pa.array(r.integers(0, n_users, ne)),
        "event_type": pa.array(
            [ETYPES[i] for i in r.integers(0, 5, ne)]),
        "value": pa.array(np.round(r.exponential(55.0, ne), 2)),
        "props": pa.array(
            ['{"k": %d}' % k for k in r.integers(0, 100, ne)])}))

    r = _rng(seed, "documents")
    nd = n["documents"]
    lens = r.integers(10, 101, nd)
    words = r.integers(0, len(VOCAB), int(lens.sum()))
    texts, pos = [], 0
    for ln in lens:
        texts.append(" ".join(VOCAB[w] for w in words[pos:pos + ln]))
        pos += ln
    # ~0.3% planted exact duplicates of an earlier doc (same rate as
    # the shipped tables: 8 dup pairs / 5000 docs at sf0.1)
    for i in r.choice(np.arange(nd // 2, nd), max(1, nd // 600),
                      replace=False):
        texts[i] = texts[int(i) // 2]
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(nd, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array([LANGS[i] for i in r.choice(
            5, nd, p=[0.42, 0.145, 0.145, 0.145, 0.145])]),
        "source": pa.array(
            [f"src{i}" for i in r.integers(0, 20, nd)]),
        "n_chars": pa.array(
            np.array([len(t) for t in texts], dtype=np.int64))}))

    r = _rng(seed, "embeddings")
    nv = n["embeddings"]
    labels = r.integers(0, 10, nv).astype(np.int32)
    centers = r.normal(0, 1, (10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = r.normal(0, 1, (nv, 64)) + 0.55 * centers[labels]
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(nv, dtype=np.int64)),
        "embedding": pa.array(
            list(vecs.astype(np.float32)),
            type=pa.list_(pa.float32())),
        "label": pa.array(labels)}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    generate(args.sf, args.out, args.seed)
    for f in sorted(os.listdir(args.out)):
        p = os.path.join(args.out, f)
        print(f, pq.read_metadata(p).num_rows, "rows",
              os.path.getsize(p) >> 20, "MiB")


if __name__ == "__main__":
    main()
