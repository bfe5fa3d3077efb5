"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``pyspec_spark`` — the engine package.  The driver's
verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pyspec_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (q_pricing_summary, SURVEY.md §2 A1) on sf0.001."""
    registry.load_all()
    return registry.QUERIES["q_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    registry.load_all()
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    registry.load_all()
    return dict(registry.ORACLES)
