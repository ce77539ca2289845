"""Local replica of the driver's correctness gate: run every
``queries()`` entry at a given sf and compare against ``oracle_sql()``
via DuckDB — row count, column names, and order-insensitive values
(columns sorted by name, rows sorted by all columns).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd
import ray

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_df(res):
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name, mine, oracle):
    """Replicate the driver's strictness: it hashes rendered values
    after sorting columns by name, so an int64-vs-float64 dtype split
    or a last-bit float difference fails there even if values are
    'close'.  Fail on dtype-kind mismatch and require exact equality
    (both sides round floats to 6dp by repo rule)."""
    a, b = canon(mine), canon(oracle)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS {len(a)} vs {len(b)}"
    for c in a.columns:
        if a[c].dtype.kind != b[c].dtype.kind:
            return (f"DTYPE col {c}: engine {a[c].dtype} vs oracle "
                    f"{b[c].dtype} (driver hashes rendered values)")
        x, y = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(a[c].dtype, np.floating):
            xn, yn = np.isnan(x), np.isnan(y)
            ok = (xn == yn).all() and (x[~xn] == y[~yn]).all()
            if not ok:
                close = np.allclose(x, y, atol=1e-9, equal_nan=True)
                bad = np.flatnonzero(
                    ~np.isclose(x, y, atol=0, rtol=0, equal_nan=True))[:3]
                tag = ("VALUES-EXACT (within 1e-9 but driver hashes "
                       "exact values)" if close else "VALUES")
                return f"{tag} col {c} rows {bad.tolist()} " \
                       f"{x[bad]} vs {y[bad]}"
        else:
            if not (x == y).all():
                bad = np.flatnonzero(x != y)[:3]
                return f"VALUES col {c} rows {bad.tolist()} " \
                       f"{x[bad]} vs {y[bad]}"
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import logging
    import ray.data as rd
    rd.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from leidenalg_ray.pipelines.queries import QUERIES, ORACLE_SQL

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = n_rowsonly = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = to_df(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in ORACLE_SQL:
            print(f"rows-only {name}: {len(mine)} rows ({dt:.1f}s)")
            n_rowsonly += 1
            continue
        t0 = time.time()
        try:
            oracle = con.execute(ORACLE_SQL[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle raised {e}")
            n_fail += 1
            continue
        dto = time.time() - t0
        err = compare(name, mine, oracle)
        if err:
            print(f"FAIL {name}: {err} (ray {dt:.1f}s, sql {dto:.1f}s)")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(mine)} rows "
                  f"(ray {dt:.1f}s, sql {dto:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
