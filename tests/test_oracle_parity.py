"""Oracle parity: every declared query with an oracle must match DuckDB
value-exactly at sf0.001 (the driver runs the same comparison at
sf0.01); rows-only queries must run and return ≥0 rows with a stable
schema.
"""

import pytest
from conftest import SF_DIR
from oracle_check import compare

from louvain_modularity_spark.registry import all_oracles, all_queries

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, name):
    ok, msg = compare(spark, QUERIES[name], ORACLES[name], SF_DIR, name)
    assert ok, msg


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_runs(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.columns, f"{name}: no columns"
    assert df.count() >= 0


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity_sf001(spark, name):
    """Same parity at sf0.01 — the scale the driver compares at;
    catches scale-dependent divergence (bin bounds, top-k ties) that
    sf0.001 can't."""
    from conftest import SF01_DIR

    ok, msg = compare(spark, QUERIES[name], ORACLES[name], SF01_DIR, name)
    assert ok, msg
