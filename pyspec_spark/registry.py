"""Central query registry — the t2 contract surface.

Every declared query from SURVEY.md §2 registers here with BOTH a
DataFrame builder and (when SQL-expressible) the equivalent DuckDB oracle
SQL.  ``__spark_entry__.py`` exposes these dicts to the driver verbatim.

Builder signature: ``fn(spark: SparkSession, sf_dir: str) -> DataFrame``.

Determinism rules (SURVEY.md §5.3) apply to every registered pair:
- floating aggregates via exact DECIMAL(18,6) sums, cast back to DOUBLE
- ratios rounded to 6 places
- every LIMIT preceded by a total order with a unique-key tiebreak
- no approximate / platform-defined functions
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

QUERIES: dict[str, Callable[[Any, str], Any]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a declared query; ``oracle=None`` → rows-only check."""

    def deco(fn):
        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        fn.__query_name__ = name
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registrations run (idempotent)."""
    import pyspec_spark.queries  # noqa: F401
