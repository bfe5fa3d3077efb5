#!/usr/bin/env python
"""Weak-scaling probe for training-order materialization (r10, L45):
the naive seeded global shuffle — ROW_NUMBER() OVER (ORDER BY
md5(seed||id)) — funnels the whole corpus through ONE reducer, while
global_order_index's two-level rank (256 md5-prefix buckets, parallel
per-bucket windows, 256-row offset prefix sum) keeps every
corpus-sized operation hash-partitioned.  Same exact output
(pytest-pinned permutation equality); this measures the wall gap as
rows grow on local[32]."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspec_spark.session import get_spark  # noqa: E402

ROWS_PER_UNIT = 2_000_000


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pyspec_spark.operators.ordering import global_order_index

    spark = get_spark("scale_probe_r10d")
    print("| rows | naive single-window wall | two-level wall |")
    print("|---|---|---|")
    for k in (1, 2, 4, 8):
        n = k * ROWS_PER_UNIT
        docs = spark.range(n).select(F.col("id").alias("doc_id"))

        key = F.md5(F.concat(F.lit("s"), F.col("doc_id").cast("string")))
        naive = docs.withColumn("_key", key).withColumn(
            "pos", F.row_number().over(Window.orderBy("_key", "doc_id")) - 1
        )
        t0 = time.time()
        a = naive.agg(F.sum("pos")).collect()[0][0]
        t_naive = time.time() - t0

        t0 = time.time()
        b = (
            global_order_index(docs, "doc_id", seed="s")
            .agg(F.sum("pos"))
            .collect()[0][0]
        )
        t_two = time.time() - t0
        assert a == b == n * (n - 1) // 2  # both are exact permutations

        print(f"| {n} | {t_naive:.2f} s | {t_two:.2f} s |", flush=True)


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"\ntotal {time.time() - t0:.0f}s", file=sys.stderr)
