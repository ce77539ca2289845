"""Closed-form Leiden oracles on planted per-nation graphs
(reference ``tests/test_Optimiser.py:12-18,96-103``): at the chosen
gammas the unique optimum is one community per nation, so the full
distributed schedule (and the multiplex API) can be checked against a
plain SQL-equivalent grouping — the driver does the same via
``SQL_LEIDEN_NATIONS``.

sf0.001 is the degenerate edge case (every nation has one supplier:
empty planted graphs, all-singleton output); sf0.01 has real cliques
and stars (nation sizes up to 10).
"""

import duckdb
import numpy as np
import pytest

from leidenalg_ray.pipelines.queries import (
    QUERIES,
    SQL_LEIDEN_NATIONS,
)

PLANTED = ["leiden_cpm_cliques", "leiden_modularity_cliques",
           "leiden_cpm_stars", "leiden_multiplex_cliques",
           "leiden_surprise_cliques",
           "leiden_significance_cliques",
           "leiden_rbconfig_cliques", "leiden_rber_cliques"]


def nation_oracle(sf):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW supplier AS SELECT * FROM "
                f"read_parquet('{sf}/supplier.parquet')")
    return con.execute(SQL_LEIDEN_NATIONS).fetchdf() \
        .sort_values("vid").reset_index(drop=True)


@pytest.mark.parametrize("name", PLANTED)
@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001",
                                "/root/testdata/sf0.01"])
def test_planted_leiden_matches_nation_grouping(name, sf):
    out = QUERIES[name](sf).to_pandas().sort_values("vid") \
        .reset_index(drop=True)
    want = nation_oracle(sf)
    assert len(out) == len(want)
    assert (out["vid"].to_numpy() == want["vid"].to_numpy()).all()
    assert (out["comm"].to_numpy() == want["comm"].to_numpy()).all()


def test_planted_output_is_dense_renumbered():
    out = QUERIES["leiden_cpm_cliques"]("/root/testdata/sf0.01") \
        .to_pandas()
    comm = out["comm"].to_numpy()
    assert comm.min() == 0
    assert set(np.unique(comm)) == set(range(comm.max() + 1))
    # sizes non-increasing in community id (the renumber contract)
    sizes = np.bincount(comm)
    assert (np.diff(sizes) <= 0).all()
