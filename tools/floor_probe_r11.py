#!/usr/bin/env python
"""Same-shape zero-work floor measurement for the two round-10
perf-watch entrants (VERDICT r10 "What's wrong" #4): q_sem_decontam
(2.4x, 27 ms absolute) and q_events_rollup (2.1x, 36 ms) — the
q_html_extract adjudication recipe (BASELINE.md §9): time, on an idle
box, best-of-7 warm after an untimed warmup,

1. the bare input scan + collect of a same-cardinality result,
2. a same-shape floor that reads the SAME columns, performs the same
   number of exchanges, but does ZERO of the query's real work,
3. the full query,
4. the DuckDB oracle on the same box in the same process.

If (2) explains most of (3), the ratio is scheduling/collect floor and
the query is floor-class; if not, the plan owes a fix.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pyspec_spark import registry  # noqa: E402
from pyspec_spark.oracle import duckdb_connect  # noqa: E402
from pyspec_spark.session import get_spark  # noqa: E402
from pyspec_spark.tables import table  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def best7(fn):
    fn()  # untimed warmup
    ts = []
    for _ in range(7):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return min(ts), statistics.median(ts)


def best7_df(df):
    """bench.py's warm discipline: the plan is built once (the registry
    caches prepared plans), so warm timings are repeat COLLECTS —
    driver-side analysis is amortized, execution is what's timed."""
    return best7(lambda: df.collect())


def main() -> None:
    registry.load_all()
    spark = get_spark("floor_probe_r11")
    con = duckdb_connect(SF)
    rows = []

    # ---- q_sem_decontam ----
    e = table(spark, SF, "embeddings").select("vec_id", "embedding")
    b, _ = best7_df(e.select("vec_id").agg(F.count("*")))
    rows.append(("sem_decontam: bare embeddings scan+count", b))
    # same shape, zero work: scan both columns, same broadcast join
    # fan-out (8 bench rows), same groupBy exchange, but the "cosine"
    # is a constant — no dot product, no norms, no rounding
    bench = e.limit(8).select(
        F.col("vec_id").alias("bench_id"), F.col("embedding").alias("be")
    )
    h = (
        e.join(F.broadcast(bench))
        .select("vec_id", "bench_id",
                F.size("embedding").cast("double").alias("score"))
        .where(F.col("score") >= 1e9)  # same filter shape, 0 rows kept
    )
    floor_sem = h.groupBy("vec_id").agg(
        F.max(F.struct("score", "bench_id")).alias("top"),
        F.count("*").alias("n_hits"),
    )
    b, _ = best7_df(floor_sem)
    rows.append(("sem_decontam: same-shape ZERO-WORK floor", b))
    b, _ = best7_df(
        registry.QUERIES["q_sem_decontam"].__wrapped__(spark, SF)
    )
    rows.append(("q_sem_decontam FULL", b))
    b, _ = best7(
        lambda: con.execute(registry.ORACLES["q_sem_decontam"]).fetchall()
    )
    rows.append(("q_sem_decontam DuckDB oracle", b))

    # ---- q_events_rollup ----
    ev = table(spark, SF, "events").select("ts", "event_type", "value")
    b, _ = best7_df(ev.agg(F.count("*")))
    rows.append(("events_rollup: bare events scan+count", b))
    # same shape, zero work: the SAME three cascade exchanges
    # (minute->hour->day re-aggregation) but each level carries count
    # only — no fixed-point sum, no min/max, no finalize arithmetic
    lv = ev.groupBy(
        F.date_trunc("minute", "ts").alias("bucket"), "event_type"
    ).agg(F.count("*").alias("n"))
    for u in ("hour", "day"):
        lv = lv.groupBy(
            F.date_trunc(u, "bucket").alias("bucket"), "event_type"
        ).agg(F.sum("n").alias("n"))
    b, _ = best7_df(lv)
    rows.append(("events_rollup: same-shape ZERO-WORK floor (3 exchanges)", b))
    b, _ = best7_df(
        registry.QUERIES["q_events_rollup"].__wrapped__(spark, SF)
    )
    rows.append(("q_events_rollup FULL", b))
    b, _ = best7(
        lambda: con.execute(registry.ORACLES["q_events_rollup"]).fetchall()
    )
    rows.append(("q_events_rollup DuckDB oracle", b))

    print("| measurement | best-of-7 warm ms |")
    print("|---|---|")
    for name, t in rows:
        print(f"| {name} | {t * 1000:.0f} |")


if __name__ == "__main__":
    main()
