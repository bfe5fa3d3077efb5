#!/usr/bin/env python
"""Scaling probe for ntile_exact (r11, W6/R15 rewrite): the naive
``NTILE(k) OVER (ORDER BY ...)`` is an Exchange SinglePartition →
Window funnel — the whole table sorts on ONE reducer regardless of
cluster size (Spark warns about it at plan time).  ntile_exact is the
two-level form: range exchange into 256 ordered buckets, per-bucket
row_number windows, prefix-sum offsets over bucket counts, closed-form
bucket arithmetic.  Both arms compute the identical quartile table
(asserted at the smallest size); walls at 1/4/16M rows show the funnel
growing one-core-bound while the two-level form scales with cores.
Same synthetic-from-range discipline as r10d.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from tools.scale_probe import WORK  # noqa: E402

from pyspec_spark.session import get_spark  # noqa: E402


def _tbl(spark, n: int):
    # unique tiebreak id, non-monotone sort key (hash-ish arithmetic)
    return spark.range(n).select(
        F.col("id"),
        ((F.col("id") * 2654435761) % 1_000_003).alias("bal"),
    )


def main() -> None:
    from pyspec_spark.operators.ordering import ntile_exact

    spark = get_spark("scale_probe_r11b")
    base = f"{WORK}/ntile_src"
    for n in (1_000_000, 4_000_000, 16_000_000):
        _tbl(spark, n).write.mode("overwrite").parquet(f"{base}/n={n}")

    def naive(df):
        w = Window.orderBy(F.desc("bal"), "id")
        return df.select(
            "id", "bal", F.ntile(4).over(w).alias("q")
        ).groupBy("q").agg(
            F.count("*").alias("n"), F.sum("bal").alias("s")
        )

    def twolevel(df):
        return ntile_exact(
            df, [F.desc("bal"), F.col("id")], 4, "q"
        ).groupBy("q").agg(
            F.count("*").alias("n"), F.sum("bal").alias("s")
        )

    # identical results at the smallest size (closed form == SQL NTILE)
    df0 = spark.read.parquet(f"{base}/n=1000000")
    a = sorted(tuple(r) for r in naive(df0).collect())
    b = sorted(tuple(r) for r in twolevel(df0).collect())
    assert a == b, (a, b)
    print("1M-row equality: naive NTILE == ntile_exact (asserted)")
    print("| rows | naive global-window NTILE wall | ntile_exact wall |")
    print("|---|---|---|")
    for n in (1_000_000, 4_000_000, 16_000_000):
        df = spark.read.parquet(f"{base}/n={n}")
        spark.catalog.clearCache()
        t0 = time.time()
        naive(df).write.format("noop").mode("overwrite").save()
        tn = time.time() - t0
        spark.catalog.clearCache()
        t0 = time.time()
        twolevel(df).write.format("noop").mode("overwrite").save()
        tt = time.time() - t0
        print(f"| {n/1e6:.0f}M | {tn:.2f} s | {tt:.2f} s |", flush=True)


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"\ntotal {time.time() - t0:.0f}s", file=sys.stderr)
