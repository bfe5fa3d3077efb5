"""Cascading time rollup (continuous-aggregate / hypertable pattern).

Multi-resolution event summaries where each coarser level derives from
the next finer one by MERGING partial aggregates — never rescanning the
raw table.  At 100 TB this is the difference between one O(raw) pass
that feeds every resolution and k independent O(raw) scans: the minute
level reads events once; hour merges ~60x fewer rows; day merges ~24x
fewer again.  The same shape backs a streaming deployment: the finest
level is a watermarked tumbling aggregation (`streaming/events.py`) and
coarser levels run over its sink.

Only mergeable statistics are carried (count, exact fixed-point sum,
min, max); means/rates derive at read time.  Sums are held as exact
micro-unit longs (``functions/determinism._fixed6``) so merge order —
which differs between cascade levels, partitions, and engines — can
never change a result.

Reference: the pyspec analog is re-binning an already-binned scan onto a
coarser grid (`pyspec/ccd/transformations.py` get1DSum/rebin utilities
[M] — SURVEY.md §2 A3/A5: re-aggregation of aggregated output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspec_spark.functions.determinism import _fixed6

#: supported resolutions, finest-to-coarsest, as date_trunc units
LEVELS = ("minute", "hour", "day", "week", "month")


def rollup_cascade(
    events: DataFrame,
    ts_col: str,
    keys: list[str],
    value_col: str,
    levels: tuple[str, ...] = ("minute", "hour", "day"),
) -> dict[str, DataFrame]:
    """Build the cascade; returns {level: DataFrame} with columns
    ``bucket, *keys, n, sum_micro, min_v, max_v``.

    ``sum_micro`` is the exact micro-unit long sum — convert with
    :func:`finalize` when presenting.  Each level's plan reads the
    previous level, so materializing one level (cache/write) also
    short-circuits every coarser one.
    """
    for lv in levels:
        if lv not in LEVELS:
            raise ValueError(f"unknown level {lv!r}; expected one of {LEVELS}")
    if "week" in levels and levels[0] == "week" and len(levels) > 1:
        raise ValueError(
            "'week' cannot be the finest level of a multi-level cascade: "
            "week buckets straddle month boundaries, so no coarser level "
            "can be derived from them"
        )

    out: dict[str, DataFrame] = {}
    finest = levels[0]
    cur = (
        events.groupBy(
            F.date_trunc(finest, F.col(ts_col)).alias("bucket"), *keys
        ).agg(
            F.count("*").alias("n"),
            F.sum(_fixed6(F.col(value_col))).alias("sum_micro"),
            F.min(value_col).alias("min_v"),
            F.max(value_col).alias("max_v"),
        )
    )
    out[finest] = cur
    # 'week' is a terminal branch: ISO weeks straddle month boundaries, so
    # date_trunc('month', week_bucket) would assign a straddling week's whole
    # totals to one month.  Coarser levels always merge from the last
    # non-week level instead of from week.
    for lv in levels[1:]:
        out[lv] = merge_level(cur, lv, keys)
        if lv != "week":
            cur = out[lv]
    return out


def merge_level(finer: DataFrame, level: str, keys: list[str]) -> DataFrame:
    """One cascade step: merge a finer level's mergeable partials
    (``bucket, *keys, n, sum_micro, min_v, max_v``) up to ``level``.
    Works identically over a batch cascade level or the sink of the
    streaming finest level (`streaming/events.py` rollup_minute)."""
    return (
        finer.groupBy(F.date_trunc(level, F.col("bucket")).alias("bucket"), *keys)
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_micro").alias("sum_micro"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
    )


def finalize(level_df: DataFrame, keys: list[str]) -> DataFrame:
    """Present a cascade level: exact sum and 6-dp mean from the merged
    micro-unit accumulator."""
    return level_df.select(
        "bucket",
        *keys,
        "n",
        (F.col("sum_micro").cast("double") / 1e6).alias("sum_v"),
        F.round(F.col("sum_micro").cast("double") / 1e6 / F.col("n"), 6).alias(
            "mean_v"
        ),
        "min_v",
        "max_v",
    )
