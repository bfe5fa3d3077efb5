"""Full two-scale sweep as ONE command (r6 VERDICT #8): every declared
query vs its DuckDB oracle at sf0.1.  The default test run covers
sf0.001 (test_declared_queries.py) and the driver re-checks sf0.01;
this marked tier makes the committed CHECK_sf0.1.json claim
reproducible via ``pytest -m sweep`` instead of a hand-run script.

Excluded from the default run by pytest.ini's ``-m "not sweep"``
addopts (a command-line ``-m sweep`` overrides it — last -m wins)."""

from __future__ import annotations

import pytest

from pyspec_spark import registry
from pyspec_spark.oracle import check_query, duckdb_connect

registry.load_all()

SF01 = "/root/testdata/sf0.1"

pytestmark = pytest.mark.sweep


@pytest.fixture(scope="module")
def duck01():
    return duckdb_connect(SF01)


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_query_matches_oracle_sf01(spark, duck01, name):
    res = check_query(spark, duck01, name, SF01)
    assert res.ok, str(res)
