"""Cross-engine determinism helpers (SURVEY.md §5.3).

Float SUM is order-dependent; Spark's partial/final aggregation over
shuffled partitions and DuckDB's sequential scan add the same doubles in
different orders, so raw double sums drift in the last ulp and the
driver's value-hash check fails spuriously.  Fix: aggregate through
DECIMAL(18,6) (exact, associative, order-independent), then cast the
final result back to DOUBLE so both engines report the same schema.

These helpers are used ONLY in declared-query result columns.  Internal /
performance-path aggregations stay native double — decimal aggregation is
a correctness-check tool, not the engine's hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dsum(c: Column | str, alias: str | None = None) -> Column:
    """Order-independent sum: SUM(CAST(x AS DECIMAL(18,6))) :: DOUBLE."""
    out = F.sum(_col(c).cast(DEC)).cast("double")
    return out.alias(alias) if alias else out


def davg(c: Column | str, alias: str | None = None) -> Column:
    """Order-independent mean: round(decimal_sum / count, 6) :: DOUBLE."""
    col = _col(c)
    out = F.round(F.sum(col.cast(DEC)).cast("double") / F.count(col), 6)
    return out.alias(alias) if alias else out


def dround(c: Column, alias: str | None = None) -> Column:
    """Round a ratio/derived double to 6 places (rule b)."""
    out = F.round(c.cast("double"), 6)
    return out.alias(alias) if alias else out


# SQL-side equivalents, for building oracle strings consistently.
def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"
        f" / COUNT({expr}), 6) AS {alias}"
    )
