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


def _fixed6(c: Column) -> Column:
    """x as an exact fixed-point integer of micro-units (x * 1e6, rounded
    HALF_UP — the same rounding CAST(x AS DECIMAL(18,6)) applies, so the
    summed value is bit-identical to the decimal path).  Long sums run
    ~2x faster than Spark decimal aggregation (no per-row Decimal object
    or overflow bookkeeping) while staying exact & associative, i.e.
    order-independent across partitions/engines.  Range guard: safe while
    SUM(|x|) < 9.2e12 (long max / 1e6) — far above every declared query;
    switch that aggregate back to `.cast(DEC)` if a new query exceeds it.
    """
    return F.round(c * 1e6).cast("bigint")


def dsum(c: Column | str, alias: str | None = None) -> Column:
    """Order-independent sum, value-identical to
    SUM(CAST(x AS DECIMAL(18,6))) :: DOUBLE (the oracle-side form)."""
    out = F.sum(_fixed6(_col(c))).cast("double") / 1e6
    return out.alias(alias) if alias else out


def davg(c: Column | str, alias: str | None = None) -> Column:
    """Order-independent mean: round(exact_sum / count, 6) :: DOUBLE."""
    col = _col(c)
    out = F.round(
        (F.sum(_fixed6(col)).cast("double") / 1e6) / F.count(col), 6
    )
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
