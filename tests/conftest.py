from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = os.environ.get("PYSPEC_SPARK_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from pyspec_spark.session import get_spark

    spark = get_spark("pyspec_spark_tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def duck():
    from pyspec_spark.oracle import duckdb_connect

    return duckdb_connect(SF_SMALL)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMALL
