"""Structured Streaming execution of the event operators — SURVEY.md
§2.10 ST1-ST7, Stage 7.

The reference is batch-only; its append-only SPEC files polled by
`SpecDataFile.reload` (`pyspec/spec.py` [H]) are the manual ancestor of
Structured Streaming's file-source discovery.  Each transformation here
is the *same logical op* as its batch twin in queries/events.py; the
twin tests (tests/test_streaming.py) assert stream-end equality.

Scale notes: all stateful ops carry watermarks so state is bounded;
tumbling/sliding aggs keep one state row per (window, key); the
session-window op uses Spark's native session_window (merging state);
dedup uses dropDuplicatesWithinWatermark.  Sinks via foreachBatch or
parquet append (ST7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspec_spark.functions.determinism import dsum

EVENT_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = 1
) -> DataFrame:
    """File-source stream over parquet chunks of events (the SPEC
    append-pattern, ST7's source side)."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


# --- transformations (streaming-or-batch: same code path) -----------------
def tumbling(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """ST1: 1-hour tumbling windows per event_type."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value", "sum_value"))
        .select(F.col("w.start").alias("bucket"), "event_type", "n", "sum_value")
    )


def sliding(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """ST2: 1-hour windows sliding every 30 minutes."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value", "sum_value"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n", "sum_value")
    )


def session(events: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes") -> DataFrame:
    """ST3: session windows (gap-merged) per user — Spark's native
    session_window operator (the streaming form of the batch
    gap-and-island in queries/events.py)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), dsum("value", "sum_value"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            F.unix_micros("w.end").alias("session_end_us"),
            "n_events",
            "sum_value",
        )
    )


def rollup_minute(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """ST8 finest level as a stream: watermarked 1-minute tumbling
    aggregation carrying the rollup cascade's mergeable partials
    (count, exact micro-unit sum, min, max).  Coarser resolutions derive
    from this query's sink by batch merge
    (``operators.rollup.merge_level``) — the continuous-aggregate
    deployment shape: one streaming pass over raw events feeds every
    resolution."""
    from pyspec_spark.functions.determinism import _fixed6

    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", "1 minute").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(_fixed6(F.col("value"))).alias("sum_micro"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
        .select(
            F.col("w.start").alias("bucket"),
            "event_type",
            "n",
            "sum_micro",
            "min_v",
            "max_v",
        )
    )


def dedup(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """ST5: stateful dedup on (user_id, event_type)."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["user_id", "event_type"]
        )
    return events.dropDuplicates(["user_id", "event_type"])


def enrich(events: DataFrame, customer: DataFrame) -> DataFrame:
    """ST6: stream-static broadcast join with the customer dimension."""
    dim = F.broadcast(customer.select("c_custkey", "c_mktsegment"))
    return events.join(dim, events.user_id == dim.c_custkey).select(
        "event_id", "ts", "user_id", "event_type", "value", "c_mktsegment"
    )


# --- sinks (ST7) ----------------------------------------------------------
def run_to_memory(df: DataFrame, name: str, output_mode: str = "append") -> None:
    """Execute a streaming DF to a memory sink with availableNow, then
    stop.  Results: spark.table(name)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_to_parquet(df: DataFrame, path: str, checkpoint: str) -> None:
    """ST7 parquet sink (append) with availableNow."""
    q = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_foreach_batch(df: DataFrame, fn, output_mode: str = "update") -> None:
    """ST7 foreachBatch sink with availableNow."""
    q = (
        df.writeStream.foreachBatch(fn)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def interval_join(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """ST12 — stream-stream interval join (the one Structured Streaming
    join class the batch suite mirrors in q_view_purchase_join): views
    and purchases are two branches of the SAME event stream, each
    watermarked, joined per user with a time-range condition.  The
    range condition + both watermarks are what let Spark EVICT buffered
    rows — without them stream-stream join state grows forever; with
    them each side holds at most `window + watermark` of events."""
    v = (
        events.where(F.col("event_type") == "view")
        .select(
            "user_id",
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", watermark)
    )
    p = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    # how="leftOuter": a view with NO matching purchase emits once with
    # NULL purchase columns — but only after the watermark passes
    # v_ts + window (Spark must be sure no match can still arrive);
    # unmatched views inside the final watermark horizon are withheld
    # forever on a finite stream — the documented outer-join semantics
    # the twin test pins.
    joined = v.join(
        p,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {window}")),
        how,
    )
    return joined.select(
        "user_id",
        "view_id",
        "purchase_id",
        (F.col("p_ts").cast("long") - F.col("v_ts").cast("long"))
        .cast("bigint")
        .alias("gap_s"),
    )
