"""HyperLogLog sketch: estimator accuracy, merge associativity, and
SQL-replicable arithmetic (exact dyadic partial sums)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from leidenalg_ray.stages import sketch as sk


def _registers(values):
    df = sk.hll_partial(np.zeros(len(values), dtype=np.int64), values)
    return dict(zip(df["bucket"].astype(int), df["rho"].astype(int)))


@pytest.mark.parametrize("n_true", [10, 60, 500, 5000, 50_000])
def test_hll_estimate_accuracy(n_true):
    est = sk.hll_estimate(_registers([f"v{i}" for i in range(n_true)]))
    # m=64 -> ~13% std error; allow 3 sigma
    assert abs(est - n_true) / n_true < 0.4


def test_hll_partial_merge_equals_whole():
    vals = [f"x{i}" for i in range(2000)]
    whole = _registers(vals)
    a, b = _registers(vals[:700]), _registers(vals[700:])
    merged = dict(a)
    for k, v in b.items():
        merged[k] = max(merged.get(k, 0), v)
    assert merged == whole
    assert sk.hll_estimate(merged) == sk.hll_estimate(whole)


def test_hll_sum_is_exact_dyadic():
    # every register contribution is 2^(27-rho) with rho in [1,27]:
    # the scaled sum fits in < 53 mantissa bits, so float summation
    # order cannot change the estimate
    regs = {i: (i % 27) + 1 for i in range(64)}
    s = sum(1 << (sk.HLL_RHO_MAX - r) for r in regs.values())
    assert s < 2 ** 53
    assert float(s) == s


# ---- Count-Min sketch ----

def _cms_counters(values):
    df = sk.cms_partial(values)
    c = np.zeros((sk.CMS_D, sk.CMS_W), dtype=np.int64)
    c[df["row"].to_numpy(), df["cell"].to_numpy()] = df["cnt"].to_numpy()
    return c


def test_cms_never_underestimates_and_is_tight():
    rng = np.random.default_rng(7)
    stream = rng.integers(0, 300, size=20_000)
    c = _cms_counters(stream)
    keys, true = np.unique(stream, return_counts=True)
    est = sk.cms_estimate(c, keys)
    assert (est >= true).all()          # CMS one-sided error
    # eps = e/w per classic bound; with N=20k, w=128 the overestimate
    # stays well under N/10 for every key
    assert (est - true < 2_000).all()


def test_cms_partials_merge_by_addition():
    rng = np.random.default_rng(11)
    stream = rng.integers(0, 500, size=10_000)
    whole = _cms_counters(stream)
    merged = _cms_counters(stream[:4_000]) + _cms_counters(stream[4_000:])
    assert (whole == merged).all()


def test_cms_cells_match_sql_hash_derivation():
    import hashlib
    v, r = 12345, 3
    h = int.from_bytes(
        hashlib.md5(f"{v}#{r}".encode()).digest()[:4], "big")
    assert sk.cms_cells([v], r)[0] == h % sk.CMS_W


def test_bloom_no_false_negatives_and_mergeable(ray_session):
    """Bloom filter: every inserted value probes positive (no false
    negatives), the false-positive rate is near the analytic
    (1 - e^{-kn/m})^k, and building from two halves ORs to the same
    words as one pass (mergeable partials)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from leidenalg_ray.stages import sketch as sk

    members = np.arange(0, 600, 2, dtype=np.int64)
    ins = rd.from_arrow(pa.table({"x": pa.array(members)}))
    words = sk.bloom_build(ins, "x")
    half_a = sk.bloom_build(
        rd.from_arrow(pa.table({"x": pa.array(members[:150])})), "x")
    half_b = sk.bloom_build(
        rd.from_arrow(pa.table({"x": pa.array(members[150:])})), "x")
    assert np.array_equal(words, half_a | half_b)

    probes = rd.from_arrow(pa.table({
        "x": pa.array(np.arange(2000, dtype=np.int64))}))
    out = sk.bloom_contains(probes, "x", words).to_pandas() \
        .sort_values("x").reset_index(drop=True)
    is_member = (out.x % 2 == 0) & (out.x < 600)
    assert (out.maybe_present[is_member] == 1).all()
    fp = out.maybe_present[~is_member].mean()
    expect = (1 - np.exp(-sk.BLOOM_K * len(members)
                         / sk.BLOOM_M)) ** sk.BLOOM_K
    assert fp < 5 * expect + 0.01


def test_misra_gries_guarantee_adversarial(ray_session):
    """A heavy key spread thin across batches (never a batch-local
    top-1) must survive the merged summary; output equals the exact
    heavy-hitter set."""
    import ray.data as rd
    from leidenalg_ray.stages.sketch import heavy_hitters, mg_reduce

    rng = np.random.default_rng(11)
    # key 7 holds ~12% of a 40k stream; tail keys are uniform over
    # 5000 values so per-batch counts of 7 rarely dominate
    hh = np.full(4800, 7, dtype=np.int64)
    tail = rng.integers(100, 5100, size=35200)
    stream = np.concatenate([hh, tail])
    rng.shuffle(stream)
    ds = rd.from_arrow(pa.table({"k": pa.array(stream)}))
    k = 31
    keys, cnts, n = heavy_hitters(ds, "k", k=k)
    assert n == len(stream)
    u, c = np.unique(stream, return_counts=True)
    want = {int(x): int(y) for x, y in zip(u, c)
            if y * (k + 1) > len(stream)}
    assert dict(zip(keys, cnts)) == want
    assert 7 in keys


def test_mg_reduce_bounds():
    from leidenalg_ray.stages.sketch import mg_reduce
    counts = {i: i + 1 for i in range(100)}
    red = mg_reduce(dict(counts), 10)
    assert len(red) <= 10
    # reduction only ever lowers counts, never raises
    assert all(red[key] <= counts[key] for key in red)
