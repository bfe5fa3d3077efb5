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

    HALF_UP is implemented arithmetically (sign-split floor(|x|*1e6+0.5))
    instead of F.round: Spark's round(double) routes every row through a
    java.math.BigDecimal allocation, which measured ~2.2x slower on the
    7-aggregate pricing summary; the floor form stays inside whole-stage
    codegen double arithmetic and is row-for-row identical on every
    declared column (verified at sf0.1 incl. negatives and 6-decimal
    products).
    """
    s = c * 1e6
    return (
        F.when(s >= 0, F.floor(s + 0.5)).otherwise(-F.floor(0.5 - s)).cast("bigint")
    )


def _fixed6_sql(expr: str) -> str:
    """The parsed-SQL face of :func:`_fixed6` — same operators, same
    values, one py4j round-trip however wide the operand (r13
    plan-construction note in queries/curation._replicate_copies)."""
    s = f"(({expr}) * 1E6)"
    return (
        f"CAST(CASE WHEN {s} >= 0 THEN floor({s} + 0.5D)"
        f" ELSE -floor(0.5D - {s}) END AS BIGINT)"
    )


def dsum(c: Column | str, alias: str | None = None) -> Column:
    """Order-independent sum, value-identical to
    SUM(CAST(x AS DECIMAL(18,6))) :: DOUBLE (the oracle-side form).

    r13: a str argument is treated as a SQL EXPRESSION (a bare column
    name is one) and the whole aggregate is emitted as parsed SQL —
    the Column construction of the _fixed6 chain cost ~140 py4j round
    trips per aggregate (measured), the expr string costs one.  Same
    operators, same values; Column arguments keep the Column path."""
    if isinstance(c, str):
        out = F.expr(f"CAST(SUM({_fixed6_sql(c)}) AS DOUBLE) / 1E6")
    else:
        out = F.sum(_fixed6(c)).cast("double") / 1e6
    return out.alias(alias) if alias else out


def davg(c: Column | str, alias: str | None = None) -> Column:
    """Order-independent mean: round(exact_sum / count, 6) :: DOUBLE."""
    if isinstance(c, str):
        out = F.expr(
            f"round((CAST(SUM({_fixed6_sql(c)}) AS DOUBLE) / 1E6)"
            f" / COUNT({c}), 6)"
        )
    else:
        out = F.round(
            (F.sum(_fixed6(c)).cast("double") / 1e6) / F.count(c), 6
        )
    return out.alias(alias) if alias else out


def dround(c: Column, alias: str | None = None) -> Column:
    """Round a ratio/derived double to 6 places (rule b)."""
    out = F.round(c.cast("double"), 6)
    return out.alias(alias) if alias else out


def dsum_split(c: Column | str, alias: str | None = None) -> Column:
    """Order-independent sum for LARGE-magnitude doubles (e.g. squared
    prices ~1e10) where `_fixed6` would overflow: split each value into
    integer part (long) and micro-rounded fraction (long), sum both
    exactly, recombine in plain IEEE double ops.

    Cross-engine gotchas baked in (all verified empirically):
    - FLOOR, not CAST(x AS BIGINT): DuckDB rounds double->int casts,
      Spark truncates.
    - final recombination must be double arithmetic (`shi + smic/1e6`):
      DuckDB's Int128-decimal -> DOUBLE conversion is off by one ulp for
      some values, so a decimal-typed final would hash-mismatch.
    Exact while per-group SUM(floor(x)) < 2^53 and deterministic until
    long overflow (~9e18).  SQL twin: :func:`sql_dsum_split`.
    """
    if isinstance(c, str):  # r13: parsed-SQL face, see dsum
        out = F.expr(
            f"CAST(SUM(CAST(floor({c}) AS BIGINT)) AS DOUBLE)"
            f" + CAST(SUM(CAST(floor(({c} - floor({c})) * 1E6 + 0.5D)"
            " AS BIGINT)) AS DOUBLE) / 1E6"
        )
        return out.alias(alias) if alias else out
    col = _col(c)
    hi = F.sum(F.floor(col).cast("bigint")).cast("double")
    # fractional part is always in [0, 1) -> unconditional floor(x+0.5)
    # is HALF_UP; avoids F.round's per-row BigDecimal (see _fixed6).
    mic = F.sum(F.floor((col - F.floor(col)) * 1e6 + 0.5).cast("bigint")).cast("double")
    out = hi + mic / 1e6
    return out.alias(alias) if alias else out


# SQL-side equivalents, for building oracle strings consistently.
def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) AS {alias}"


def sql_dsum_split(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST(FLOOR({expr}) AS BIGINT)) AS DOUBLE)"
        f" + CAST(SUM(CAST(ROUND(({expr} - FLOOR({expr})) * 1e6) AS BIGINT)) AS DOUBLE)"
        f" / 1e6 AS {alias}"
    )


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"
        f" / COUNT({expr}), 6) AS {alias}"
    )
