"""Empty-input robustness: every declared query must execute cleanly
over zero-row tables with the production schemas.  At 100 TB scale empty
inputs are routine — empty partitions after pruning, empty groups after
filters, fresh streaming sinks — and an operator that divides by a
count or reduces an empty accumulator without a guard dies there."""

from __future__ import annotations

import os

import pytest

from pyspec_spark import registry
from pyspec_spark.tables import TABLES, table

SF = "/root/testdata/sf0.001"

registry.load_all()


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    """Zero-row copies of every table, exact same schemas."""
    base = str(tmp_path_factory.mktemp("empty_sf"))
    for name in TABLES:
        df = table(spark, SF, name).limit(0)
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(base, f"{name}.parquet")
        )
    return base


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_query_survives_empty_input(spark, empty_sf, name):
    builder = getattr(registry.QUERIES[name], "__wrapped__", registry.QUERIES[name])
    rows = builder(spark, empty_sf).collect()
    assert isinstance(rows, list)  # no exception, sane (possibly empty) result
