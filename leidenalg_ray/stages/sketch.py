"""Mergeable cardinality sketches for grouped distinct counting.

At 100 TB an exact ``count(DISTINCT x) GROUP BY k`` needs a shuffle of
every distinct (k, x) pair; the HyperLogLog sketch replaces it with a
fixed 64-register state per group that merges associatively — per-batch
partials, one tiny ``groupby`` on (group, register), driver-free merge.

The hash is the repo-standard deterministic md5 derivation
(``int(md5(str(x))[:4 bytes], big)`` == DuckDB
``('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 8))::UBIGINT``), and the
32-bit register layout keeps every floating-point partial a dyadic
rational with < 53 bits of spread, so the estimator is bit-identical
between numpy and an SQL replica regardless of summation order — the
whole sketch is driver-verifiable, not just "approximately right".

Flajolet et al., "HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm" (AofA 2007) — public algorithm.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow as pa

HLL_B = 6                    # 2^6 = 64 registers
HLL_M = 1 << HLL_B
HLL_REM_BITS = 32 - HLL_B    # 26-bit remainder -> rho in [1, 27]
HLL_RHO_MAX = HLL_REM_BITS + 1
# alpha_m * m^2, written with the exact parenthesisation the SQL
# oracle uses so both sides evaluate the identical IEEE expression
HLL_ALPHA_MM = (0.7213 / (1 + 1.079 / HLL_M)) * HLL_M * HLL_M
HLL_LC_THRESHOLD = 2.5 * HLL_M


def hash32(values) -> np.ndarray:
    """First 4 md5 bytes (big-endian) of ``str(v)`` per value."""
    return np.array(
        [int.from_bytes(hashlib.md5(str(v).encode()).digest()[:4],
                        "big") for v in values],
        dtype=np.int64)


def hll_partial(keys, values) -> pd.DataFrame:
    """Per-batch combiner: (key, bucket) -> max rho. Output is at
    most |keys-distinct| * 64 rows however large the batch is."""
    h = hash32(values)
    bucket = h >> HLL_REM_BITS
    rem = h & ((1 << HLL_REM_BITS) - 1)
    # rho = position of the leftmost 1-bit of rem (1-indexed);
    # rem == 0 -> REM_BITS + 1.  bit_length via log2 is unsafe at
    # 2^k boundaries; use the exact integer form.
    bl = np.zeros(len(rem), dtype=np.int64)
    x = rem.copy()
    while (x > 0).any():
        nz = x > 0
        bl[nz] += 1
        x = x >> 1
    rho = HLL_RHO_MAX - bl
    df = pd.DataFrame({"key": np.asarray(keys), "bucket": bucket,
                       "rho": rho})
    return df.groupby(["key", "bucket"], as_index=False)["rho"].max()


# linear-counting branch has only HLL_M possible inputs — precomputed
# with math.log so the vectorised path is bit-identical to the scalar
# one (and to DuckDB ln, proven by the hll oracle rows)
_HLL_LC_TABLE = np.array(
    [0.0] + [HLL_M * math.log(HLL_M / v) for v in range(1, HLL_M + 1)])


def hll_estimate_from_sums(s_present, n_present):
    """Vectorised estimator from the ADDITIVE per-key reductions:
    ``s_present`` = sum of 2^(27 - rho) over present registers,
    ``n_present`` = number of present registers. Single formula source
    (``hll_estimate`` delegates here)."""
    s_present = np.atleast_1d(np.asarray(s_present, dtype=np.int64))
    n_present = np.atleast_1d(np.asarray(n_present, dtype=np.int64))
    v_empty = HLL_M - n_present
    s_int = s_present + v_empty * (1 << HLL_RHO_MAX)
    raw = HLL_ALPHA_MM / (s_int / float(1 << HLL_RHO_MAX))
    lc = _HLL_LC_TABLE[v_empty]
    return np.where((raw <= HLL_LC_THRESHOLD) & (v_empty > 0),
                    lc, raw)


def hll_estimate(registers: dict[int, int]) -> float:
    """Estimate from a {bucket: max_rho} register map.

    Exact-integer inner sum: S = sum(2^(27 - rho)) over present
    registers + 2^27 per empty register (<= 2^33, exact in float64),
    then one IEEE division — deterministic across engines.
    """
    s = sum(1 << (HLL_RHO_MAX - r) for r in registers.values())
    return float(hll_estimate_from_sums(s, len(registers))[0])


CMS_D = 4                    # hash rows
CMS_W = 128                  # counters per row


def cms_cells(values, row: int) -> np.ndarray:
    """Count-Min cell for each value under hash row ``row``: first 4
    md5 bytes of ``str(v) + '#' + str(row)`` mod CMS_W — the exact
    expression the SQL oracle writes as
    ``('0x'||substr(md5(v::VARCHAR||'#r'),1,8))::UBIGINT % 128``."""
    return np.array(
        [int.from_bytes(
            hashlib.md5((str(v) + "#" + str(row)).encode()).digest()[:4],
            "big") for v in values],
        dtype=np.int64) % CMS_W


def cms_partial(values) -> pd.DataFrame:
    """Per-batch combiner: (row, cell) -> partial count. At most
    CMS_D * CMS_W rows out regardless of batch size."""
    vals, cnts = np.unique(np.asarray(values), return_counts=True)
    rows, cells, out = [], [], []
    for r in range(CMS_D):
        rows.append(np.full(len(vals), r, dtype=np.int64))
        cells.append(cms_cells(vals, r))
        out.append(cnts.astype(np.int64))
    df = pd.DataFrame({"row": np.concatenate(rows),
                       "cell": np.concatenate(cells),
                       "cnt": np.concatenate(out)})
    return df.groupby(["row", "cell"], as_index=False)["cnt"].sum()


def cms_estimate(counters: np.ndarray, values) -> np.ndarray:
    """Point-frequency estimates: min over the CMS_D row counters.
    ``counters`` is the dense (CMS_D, CMS_W) int64 sketch."""
    est = np.full(len(values), np.iinfo(np.int64).max, dtype=np.int64)
    for r in range(CMS_D):
        est = np.minimum(est, counters[r, cms_cells(values, r)])
    return est


def cms_frequencies(ds, col: str):
    """Count-Min frequency estimation as a Dataset pipeline: per-batch
    (row, cell) partials -> one tiny groupby over <= CMS_D*CMS_W cells
    -> the dense sketch broadcast once -> per-distinct-key estimates.
    The sketch is fixed-size however large the stream, and merges by
    addition (Cormode & Muthukrishnan, J. Algorithms 2005 — public
    algorithm). Returns a Dataset of (key, cms_est)."""
    import ray
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        df = cms_partial(t[col].to_pylist())
        return pa.Table.from_pandas(df, preserve_index=False)

    cells = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["row", "cell"]).aggregate(Sum("cnt", alias_name="cnt"))
    counters = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    for b in cells.iter_batches(batch_format="pyarrow"):
        counters[b["row"].to_numpy(zero_copy_only=False),
                 b["cell"].to_numpy(zero_copy_only=False)] = \
            b["cnt"].to_numpy(zero_copy_only=False)
    sk_ref = ray.put(counters)

    def dedup(t: pa.Table) -> pa.Table:
        return t.select([col]).group_by([col]).aggregate([])

    def estimate(t: pa.Table) -> pa.Table:
        sk = ray.get(sk_ref)
        keys = t[col].to_pylist()
        return pa.table({"key": pa.array(np.asarray(keys, np.int64)),
                         "cms_est": pa.array(cms_estimate(sk, keys))})

    # distinct keys = per-batch pyarrow dedup + ONE groupby-count
    # shuffle (a second map_groups shuffle with a Python call per key
    # was the old shape — one full exchange more than needed)
    from ray.data.aggregate import Count
    return ds.map_batches(dedup, batch_format="pyarrow") \
        .groupby(col).aggregate(Count(alias_name="_n")) \
        .map_batches(lambda t: t.select([col]),
                     batch_format="pyarrow") \
        .map_batches(estimate, batch_format="pyarrow")


def hll_count_distinct(ds, key: str, col: str):
    """Approximate distinct ``col`` per ``key`` as a Dataset pipeline:
    per-batch register partials -> groupby((key, bucket)).max ->
    per-key estimate. Returns a Dataset of (key, hll_est)."""
    from ray.data.aggregate import Max

    def partial(t: pa.Table) -> pa.Table:
        df = hll_partial(t[key].to_pylist(), t[col].to_pylist())
        return pa.Table.from_pandas(df, preserve_index=False)

    regs = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["key", "bucket"]).aggregate(Max("rho", alias_name="rho"))

    # the estimator is additive in (2^(27-rho) sum, register count):
    # per-batch integer partials + one tiny key groupby + a vectorised
    # finish — no per-key Python call, keys may split across blocks
    from ray.data.aggregate import Sum

    def sums(t: pa.Table) -> pa.Table:
        rho = t["rho"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = np.int64(1) << (HLL_RHO_MAX - rho)
        tt = pa.table({"key": t["key"], "s": pa.array(w),
                       "n": pa.array(np.ones(len(rho), np.int64))})
        return tt.group_by(["key"]).aggregate([("s", "sum"),
                                               ("n", "sum")]) \
                 .rename_columns(["key", "s", "n"])

    def estimate(t: pa.Table) -> pa.Table:
        est = hll_estimate_from_sums(
            t["s"].to_numpy(zero_copy_only=False),
            t["n"].to_numpy(zero_copy_only=False))
        return pa.table({"key": t["key"], "hll_est": pa.array(est)})

    return regs.map_batches(sums, batch_format="pyarrow") \
        .groupby("key").aggregate(Sum("s", alias_name="s"),
                                  Sum("n", alias_name="n")) \
        .map_batches(estimate, batch_format="pyarrow")


# ----------------------------------------------------------------------
# Bloom filter: mergeable bit-set membership (seen-set / frontier dedup)
# ----------------------------------------------------------------------
# At 100 TB the "have we seen this url/id before" test is the gate in
# front of every expensive verify stage; a Bloom filter answers it
# with a FIXED-size mergeable state (here 4096 bits = 64 uint64
# words, k=4 hashes) — per-batch partial word-ORs, driver state O(1),
# no false negatives. The bit positions are the repo-standard md5
# derivation over "j:value" strings, so the whole filter (build AND
# probe) has an exact DuckDB replica (``('0x' || substr(md5(...),
# 1, 16))::UBIGINT % 4096`` + ``bit_or``). Bloom (CACM 1970) —
# public algorithm.
BLOOM_M = 4096
BLOOM_K = 4
BLOOM_WORDS = BLOOM_M // 64


def _bloom_positions(values, j, m_bits=BLOOM_M):
    """Bit positions of hash j for a value sequence (md5 of
    'j:value', first 8 bytes big-endian, mod ``m_bits``) — one md5
    per distinct value via ``hash_tokens``."""
    from .text import hash_tokens
    keys = [f"{j}:{v}" for v in values]
    return (hash_tokens(keys).astype(np.int64) % m_bits)


def bloom_from_values(values, m_bits=BLOOM_M):
    """Filter words from an in-memory value sequence (the broadcast
    small side, e.g. an eval-gram set)."""
    words = np.zeros(m_bits // 64, dtype=np.uint64)
    values = list(values)
    for j in range(BLOOM_K):
        pos = _bloom_positions(values, j, m_bits)
        np.bitwise_or.at(words, pos // 64,
                         np.uint64(1) << (pos % 64).astype(np.uint64))
    return words


def bloom_probe_mask(values, words):
    """Vectorised membership mask of a value sequence against filter
    ``words`` (m inferred from the word count)."""
    m_bits = len(words) * 64
    ok = np.ones(len(values), dtype=bool)
    for j in range(BLOOM_K):
        pos = _bloom_positions(values, j, m_bits)
        ok &= ((words[pos // 64] >> (pos % 64).astype(np.uint64))
               & np.uint64(1)).astype(bool)
    return ok


def bloom_build(ds, col: str, m_bits=BLOOM_M):
    """Build the filter over a Dataset column: per-batch partial word
    arrays, OR-merged on the driver (m_bits/64 uint64 words — fixed
    driver state regardless of corpus size)."""
    import pyarrow as pa_

    n_words = m_bits // 64

    def partial(t: pa_.Table) -> pa_.Table:
        vals = t[col].to_pylist()
        words = np.zeros(n_words, dtype=np.uint64)
        for j in range(BLOOM_K):
            pos = _bloom_positions(vals, j, m_bits)
            np.bitwise_or.at(
                words, pos // 64,
                np.uint64(1) << (pos % 64).astype(np.uint64))
        return pa_.table({
            "w": pa_.array(np.arange(n_words, dtype=np.int64)),
            "bits": pa_.array(words),
        })

    words = np.zeros(n_words, dtype=np.uint64)
    for b in ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):
        np.bitwise_or.at(words,
                         b["w"].to_numpy(zero_copy_only=False),
                         b["bits"].to_numpy(zero_copy_only=False))
    return words


def bloom_contains(probe_ds, col: str, words):
    """Vectorised membership probe: the 64-word filter is broadcast
    once (``ray.put``); every batch checks all k bit positions with
    numpy shifts. Appends ``maybe_present`` (int64 0/1; no false
    negatives by construction)."""
    import pyarrow as pa_
    import ray

    ref = ray.put(np.asarray(words, dtype=np.uint64))

    def check(t: pa_.Table) -> pa_.Table:
        w = ray.get(ref)
        ok = bloom_probe_mask(t[col].to_pylist(), w)
        return t.append_column("maybe_present",
                               pa_.array(ok.astype(np.int64)))

    return probe_ds.map_batches(check, batch_format="pyarrow",
                                zero_copy_batch=True)


# ----------------------------------------------------------------------
# Misra-Gries heavy hitters (2-pass: sketch candidates, exact recount)
# ----------------------------------------------------------------------
def mg_reduce(counts: dict, k: int) -> dict:
    """Reduce a counter table to <= k entries by subtracting the
    (k+1)-th largest count from every entry and dropping the
    non-positive ones — the Misra-Gries merge step (Agarwal et al.,
    'Mergeable Summaries', PODS 2012). Each reduction adds at most
    its subtracted value to the summary's deficit, and the total
    deficit over any merge tree is bounded by N/(k+1)."""
    if len(counts) <= k:
        return counts
    vals = np.fromiter(counts.values(), dtype=np.int64)
    sub = int(np.partition(vals, len(vals) - k - 1)[len(vals) - k - 1])
    return {key: c - sub for key, c in counts.items() if c > sub}


def heavy_hitters(ds, col: str, k: int = 127):
    """Exact heavy hitters (keys with frequency > N/(k+1)) WITHOUT a
    full groupby shuffle: pass 1 folds per-batch exact counters
    reduced to <= k entries (Misra-Gries summaries — the merged
    summary provably retains every key above the N/(k+1) bar) into
    O(k) driver state; pass 2 broadcasts the <= k candidates and
    counts ONLY them exactly. Returns (keys, exact counts, N) with
    the guarantee filter applied — the 100-TB shape for 'top
    offenders' reports where a groupby over all keys would shuffle
    the world for a k-row answer."""
    counts: dict = {}
    n_total = ds.count()   # parquet metadata count — no compute pass

    def partial(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False)
        u, c = np.unique(v, return_counts=True)
        local = mg_reduce(dict(zip(u.tolist(),
                                   c.astype(np.int64).tolist())), k)
        return pa.table({
            "key": pa.array(list(local), pa.int64()),
            "cnt": pa.array([local[x] for x in local], pa.int64()),
        })

    for b in ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):
        if b.num_columns == 0:
            continue
        for key, c in zip(b["key"].to_pylist(), b["cnt"].to_pylist()):
            counts[key] = counts.get(key, 0) + int(c)
        counts = mg_reduce(counts, k)
    cand = np.array(sorted(counts), dtype=np.int64)

    def recount(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False)
        m = np.isin(v, cand)
        u, c = np.unique(v[m], return_counts=True)
        return pa.table({"key": pa.array(u.astype(np.int64)),
                         "cnt": pa.array(c.astype(np.int64))})

    exact: dict = {int(x): 0 for x in cand}
    for b in ds.map_batches(recount, batch_format="pyarrow",
                            zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):
        if b.num_columns == 0:
            continue
        for key, c in zip(b["key"].to_pylist(), b["cnt"].to_pylist()):
            exact[int(key)] += int(c)
    keys = sorted(key for key, c in exact.items()
                  if c * (k + 1) > n_total)
    return keys, [exact[key] for key in keys], n_total
