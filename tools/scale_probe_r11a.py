#!/usr/bin/env python
"""Weak-scaling probe for the maintained rollup's mergeable QUANTILE
sketch (r11, ST8c, upsert_rollup quantile_col): incremental p50/p95
must stay O(delta + touched buckets) as maintained history grows xk,
while the only alternative for percentiles over a sum-mergeable table
— re-scanning the raw log — grows O(history).  Same synthetic shape as
r10g (2M rows/unit x 32 day-buckets x 8 types; delta lands in the last
4 buckets), with the KLL sketch column riding both arms:

- rebuild arm: percentile_approx over the FULL raw history (what
  serving p50/p95 without the sketch column costs every refresh);
- maintain arm: one upsert_rollup(quantile_col=...) of the fixed delta
  (merges delta sketches into the touched buckets' stored sketches).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_probe import WORK  # noqa: E402
from tools.scale_probe_r10g import (  # noqa: E402
    BUCKETS,
    DELTA_BUCKETS,
    ROWS_PER_UNIT,
    _raw,
)

from pyspec_spark.session import get_spark  # noqa: E402


def main() -> None:
    from pyspark.sql import functions as F

    from pyspec_spark.operators.rollup import read_rollup, upsert_rollup

    spark = get_spark("scale_probe_r11a")
    ks = (1, 4, 16)
    raw_base = f"{WORK}/qroll_raw"
    shutil.rmtree(raw_base, ignore_errors=True)
    for u in range(max(ks)):
        _raw(spark, u, ROWS_PER_UNIT, 0, BUCKETS).write.parquet(
            f"{raw_base}/u={u}"
        )
    _raw(
        spark, max(ks), ROWS_PER_UNIT, BUCKETS - DELTA_BUCKETS, BUCKETS
    ).write.parquet(f"{raw_base}/delta")
    delta = spark.read.parquet(f"{raw_base}/delta")

    print(
        "| history units (raw rows) | raw-rescan percentiles wall | "
        "maintain-1-delta wall (sketch merge) | p50/p95 read wall |"
    )
    print("|---|---|---|---|")
    for k in ks:
        full = spark.read.parquet(*[f"{raw_base}/u={u}" for u in range(k)])
        root = f"{WORK}/qroll_inc_k{k}"
        shutil.rmtree(root, ignore_errors=True)
        upsert_rollup(
            spark, root, full, "ts", ["event_type"], "value",
            quantile_col="value",
        )
        # rebuild arm: what p50/p95 cost WITHOUT the sketch column —
        # a raw-log rescan per refresh
        t0 = time.time()
        full.groupBy(
            F.date_trunc("day", "ts").alias("bucket"), "event_type"
        ).agg(
            F.percentile_approx("value", [0.5, 0.95]).alias("pq")
        ).write.mode("overwrite").parquet(f"{WORK}/qroll_scan_k{k}")
        rescan = time.time() - t0

        t0 = time.time()
        upsert_rollup(
            spark, root, delta, "ts", ["event_type"], "value",
            quantile_col="value",
        )
        maintain = time.time() - t0

        t0 = time.time()
        read_rollup(spark, root, ["event_type"]).select(
            "bucket", "event_type", "p50", "p95"
        ).write.mode("overwrite").parquet(f"{WORK}/qroll_read_k{k}")
        read_w = time.time() - t0
        print(
            f"| {k} ({k * ROWS_PER_UNIT / 1e6:.0f}M) | {rescan:.2f} s "
            f"| {maintain:.2f} s | {read_w:.2f} s |",
            flush=True,
        )


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"\ntotal {time.time() - t0:.0f}s", file=sys.stderr)
