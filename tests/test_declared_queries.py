"""Every declared query hash-matches its DuckDB oracle at sf0.001
(driver mimic; the driver itself re-checks at sf0.01)."""

from __future__ import annotations

import pytest

from pyspec_spark import registry
from pyspec_spark.oracle import check_query

registry.load_all()


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    res = check_query(spark, duck, name, sf_dir)
    assert res.ok, str(res)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(e.queries()).issuperset(set(e.oracle_sql()))
