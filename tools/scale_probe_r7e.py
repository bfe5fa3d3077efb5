#!/usr/bin/env python
"""Weak-scaling probe for the round-7e events-analytics additions.

Events replicas offset BOTH user_id and event_id per copy, so the user
population grows xk (the clean axis for user-keyed shuffles) while each
user's per-user history keeps its k=1 shape:

- q_twap: the lead window and per-user aggregation share one user-keyed
  shuffle — wall should track the shuffle linearly.
- q_value_outliers: stats aggregation + same-key join back — two keyed
  shuffles over xk users.
- q_ohlc: ONE (bucket, type)-keyed partial-aggregated shuffle whose key
  space is CONSTANT in k (hours x types) — map-side combine must absorb
  the growth (the q_gate_sweep shape).
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_probe import _best_of  # noqa: E402

from pyspec_spark import registry  # noqa: E402
from pyspec_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
WORK = "/tmp/pyspec_spark_scale"


def build_events_replica(spark, k: int) -> str:
    from functools import reduce

    from pyspark.sql import functions as F

    dest = f"{WORK}/events_x{k}"
    if os.path.exists(f"{dest}/events.parquet/_SUCCESS"):
        return dest
    shutil.rmtree(dest, ignore_errors=True)
    os.makedirs(dest, exist_ok=True)
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    u_off = ev.agg(F.max("user_id")).collect()[0][0] + 1
    e_off = ev.agg(F.max("event_id")).collect()[0][0] + 1
    parts = [
        ev.withColumn("user_id", F.col("user_id") + F.lit(i * u_off))
        .withColumn("event_id", F.col("event_id") + F.lit(i * e_off))
        for i in range(k)
    ]
    reduce(lambda a, b: a.unionAll(b), parts).repartition(k).write.mode(
        "overwrite"
    ).parquet(f"{dest}/events.parquet")
    return dest


def main() -> None:
    registry.load_all()
    spark = get_spark("scale_probe_r7e")
    ks = [1, 2, 4, 8]

    for qname in ("q_twap", "q_value_outliers", "q_ohlc"):
        print(f"| k | events | {qname} |")
        print("|---|---|---|")
        for k in ks:
            d = build_events_replica(spark, k)
            n = spark.read.parquet(f"{d}/events.parquet").count()
            fn = getattr(
                registry.QUERIES[qname], "__wrapped__", registry.QUERIES[qname]
            )

            def run():
                fn(spark, d).write.format("noop").mode("overwrite").save()

            t = _best_of(run)
            print(f"| {k} | {n:,} | {t * 1000:.0f} ms |", flush=True)


if __name__ == "__main__":
    main()
