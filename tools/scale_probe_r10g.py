#!/usr/bin/env python
"""Weak-scaling probe for incremental rollup maintenance (r10, ST8b,
upsert_rollup): as the already-maintained history grows xk, merging a
FIXED-size raw delta must cost O(delta) + O(touched buckets of the
aggregate table), while the from-scratch alternative re-aggregates the
whole raw log.

Synthetic events: per history unit, 2M raw rows over 32 day-buckets x
8 event types (spark.range arithmetic, no RNG).  The delta is ONE more
unit's worth of rows landing in the LAST 4 buckets only (the steady-
state shape: new data is recent) — so maintenance reads 4 bucket
partitions of the aggregate table regardless of history size.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_probe import WORK  # noqa: E402

from pyspec_spark.session import get_spark  # noqa: E402

ROWS_PER_UNIT = 8_000_000
BUCKETS = 32
TYPES = 8
DELTA_BUCKETS = 4


def _raw(spark, unit: int, rows: int, bucket_lo: int, bucket_hi: int):
    """Deterministic raw events: ts spreads over [bucket_lo, bucket_hi)
    day buckets, value is exact-representable cents."""
    from pyspark.sql import functions as F

    lo = unit * rows
    nb = bucket_hi - bucket_lo
    return spark.range(lo, lo + rows).select(
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(
                days=(F.col("id") % nb + bucket_lo).cast("int"),
                hours=(F.col("id") % 24).cast("int"),
            )
        ).alias("ts"),
        F.concat(F.lit("t"), (F.col("id") % TYPES).cast("string")).alias(
            "event_type"
        ),
        ((F.col("id") % 10_000).cast("double") / 100.0).alias("value"),
    )


def main() -> None:
    from pyspec_spark.operators.rollup import upsert_rollup

    spark = get_spark("scale_probe_r10g")
    ks = (1, 4, 16)
    # raw history ON DISK (the cost a rebuild actually pays at 100 TB
    # is the raw scan, not driver arithmetic): one parquet dir per unit
    raw_base = f"{WORK}/roll_raw"
    shutil.rmtree(raw_base, ignore_errors=True)
    for u in range(max(ks)):
        _raw(spark, u, ROWS_PER_UNIT, 0, BUCKETS).write.parquet(
            f"{raw_base}/u={u}"
        )
    # the fixed-size delta, also from disk (same read path both arms)
    _raw(
        spark, max(ks), ROWS_PER_UNIT, BUCKETS - DELTA_BUCKETS, BUCKETS
    ).write.parquet(f"{raw_base}/delta")
    delta = spark.read.parquet(f"{raw_base}/delta")

    print(
        "| history units (raw rows) | from-scratch rollup wall | "
        "maintain-1-delta wall |"
    )
    print("|---|---|---|")
    for k in ks:
        full = spark.read.parquet(*[f"{raw_base}/u={u}" for u in range(k)])
        root = f"{WORK}/roll_inc_k{k}"
        shutil.rmtree(root, ignore_errors=True)
        t0 = time.time()
        upsert_rollup(spark, root, full, "ts", ["event_type"], "value")
        rebuild = time.time() - t0

        t0 = time.time()
        upsert_rollup(spark, root, delta, "ts", ["event_type"], "value")
        maintain = time.time() - t0
        print(
            f"| {k} ({k * ROWS_PER_UNIT / 1e6:.0f}M) | {rebuild:.2f} s "
            f"| {maintain:.2f} s |",
            flush=True,
        )


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"\ntotal {time.time() - t0:.0f}s", file=sys.stderr)
