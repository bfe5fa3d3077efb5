"""Event-stream queries — batch twins of the streaming operators
(SURVEY.md §2.10, Stage 3).  The reference is batch-only; its
append-only SPEC files + manual `reload` polling (`pyspec/spec.py`) are
the moral ancestor of a file stream.  The actual Structured Streaming
executions of these live in ``pyspec_spark/streaming/`` and are
twin-tested against these batch forms (§5.4).

Scale notes: tumbling/sliding aggregations are keyed groupBys with
time-bucket keys — partial agg + bounded key space per watermark window.
Session windows are gap-and-island (two window passes over one
per-user shuffle).  The enrich join broadcasts the dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspec_spark.functions.determinism import dsum
from pyspec_spark.registry import query
from pyspec_spark.tables import table


# ---------------------------------------------------------------------------
# ST1 twin — tumbling 1-hour window aggregation, via the real window()
# operator (streaming-identical logical shape).
# ---------------------------------------------------------------------------
@query(
    "q_events_tumbling",
    oracle="""
SELECT date_trunc('hour', ts)::TIMESTAMP AS bucket, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value", "sum_value"))
        .select(
            F.col("w.start").alias("bucket"),
            "event_type",
            "n",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# ST2 twin — sliding window (1 hour every 30 minutes): each event belongs
# to two windows.  Oracle = union of the two shifted tumbling framings.
# ---------------------------------------------------------------------------
@query(
    "q_events_sliding",
    oracle="""
WITH starts AS (
  SELECT to_timestamp(CAST(FLOOR(epoch_us(ts::TIMESTAMP) / 1800000000) AS BIGINT) * 1800)::TIMESTAMP AS win_start,
         event_type, value
  FROM events
  UNION ALL
  SELECT to_timestamp(CAST(FLOOR(epoch_us(ts::TIMESTAMP) / 1800000000) AS BIGINT) * 1800 - 1800)::TIMESTAMP AS win_start,
         event_type, value
  FROM events
)
SELECT win_start, event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM starts
GROUP BY 1, 2
""",
)
def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value", "sum_value"))
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# ST3 twin — session windows (30-minute gap) as gap-and-island:
# lag -> new-session flag -> cumulative session index -> aggregate.
# Session bounds reported as integer epoch-microseconds (exact).
# ---------------------------------------------------------------------------
@query(
    "q_events_session",
    oracle="""
WITH marked AS (
  SELECT user_id, value, epoch_us(ts::TIMESTAMP) AS us,
         CASE WHEN epoch_us(ts::TIMESTAMP)
                   - LAG(epoch_us(ts::TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > 1800000000
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, value, us,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY us
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM marked
)
SELECT user_id, session_id,
       MIN(us) AS session_start_us, MAX(us) AS session_end_us,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM sessions
GROUP BY user_id, session_id
""",
)
def q_events_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = e.select(
        "user_id",
        "value",
        F.unix_micros("ts").alias("us"),
        F.when(
            (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w) > 1_800_000_000)
            | F.lag("ts").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = marked.withColumn("session_id", F.sum("new_session").over(w2))
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("us").alias("session_start_us"),
        F.max("us").alias("session_end_us"),
        F.count("*").alias("n_events"),
        dsum("value", "sum_value"),
    )


# ---------------------------------------------------------------------------
# ST5 twin — stateful dedup == distinct over the dedup key.
# ---------------------------------------------------------------------------
@query(
    "q_events_dedup",
    oracle="""
SELECT user_id, event_type, COUNT(*) AS n_dups,
       MIN(event_id) AS first_event
FROM events
GROUP BY user_id, event_type
""",
)
def q_events_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return e.groupBy("user_id", "event_type").agg(
        F.count("*").alias("n_dups"), F.min("event_id").alias("first_event")
    )


# ---------------------------------------------------------------------------
# ST6 twin — stream-static enrichment join: events x customer dimension
# (user_id shares the custkey domain).  Dimension broadcast.
# ---------------------------------------------------------------------------
@query(
    "q_events_enrich",
    oracle="""
SELECT c_mktsegment, event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1, 2
""",
)
def q_events_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    c = table(spark, sf_dir, "customer")
    return (
        e.join(F.broadcast(c), e.user_id == c.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(F.count("*").alias("n"), dsum("value", "sum_value"))
    )


# ---------------------------------------------------------------------------
# F8 — JSON extraction from events.props ('{"k": <int>}'), cast to
# BIGINT both sides to dodge quoting differences.
# ---------------------------------------------------------------------------
@query(
    "q_json_extract",
    oracle="""
SELECT event_type,
       CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events
GROUP BY 1, 2
""",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type", (F.col("k") % 10).alias("k_mod"))
        .agg(F.count("*").alias("n"), F.sum("k").alias("sum_k"))
    )


# ---------------------------------------------------------------------------
# Cascading rollup (continuous-aggregate / hypertable pattern) — the
# declared daily level is derived minute -> hour -> day purely by merging
# partial aggregates (operators/rollup.py); the oracle aggregates the raw
# table directly.  Equality proves the merge cascade is exact.
# ---------------------------------------------------------------------------
@query(
    "q_events_rollup",
    oracle="""
SELECT date_trunc('day', ts)::TIMESTAMP AS bucket, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_v,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
         AS mean_v,
       MIN(value) AS min_v, MAX(value) AS max_v
FROM events
GROUP BY 1, 2
""",
)
def q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.rollup import finalize, rollup_cascade

    e = table(spark, sf_dir, "events")
    cascade = rollup_cascade(e, "ts", ["event_type"], "value")
    return finalize(cascade["day"], ["event_type"])


# ---------------------------------------------------------------------------
# ST8b — INCREMENTAL rollup maintenance under the oracle gate (r10):
# the continuous-aggregate lifecycle.  q_events_rollup proves the
# cascade MATH; this proves the MAINTENANCE: a rollup lake table built
# from 80% of events, then brought current by merging two raw deltas
# (each spread across ALL ~30 day buckets — the late-data stress: every
# touched bucket is an old bucket) via upsert_rollup, which aggregates
# only the delta, reads only the touched buckets (manifest-pruned),
# and merge-upserts the combined partials.  The oracle is the SAME
# from-scratch day rollup over the FULL events table (q_events_rollup's
# oracle verbatim) — the spliced no-drift trick: base ⊕ delta1 ⊕ delta2
# must equal a rebuild exactly, bit-for-bit, because the maintained
# state carries only exact mergeable statistics (count, micro-unit
# long sum, min, max).  A maintenance path that dropped a bucket,
# double-merged a delta, or lost an existing key to the upsert's
# replace semantics flips the hash.
#
# 100 TB posture: maintenance cost is O(delta) + O(touched buckets of
# the AGGREGATE table); history is never rescanned (pinned in
# test_streaming.py: untouched-bucket files carry across versions by
# manifest reference).  Bounded side effect (fresh tmp root); exempt
# from the zero-jobs gate as a materializing round-trip.
# ---------------------------------------------------------------------------
@query(
    "q_rollup_incremental",
    oracle="""
SELECT date_trunc('day', ts)::TIMESTAMP AS bucket, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_v,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
         AS mean_v,
       MIN(value) AS min_v, MAX(value) AS max_v
FROM events
GROUP BY 1, 2
""",
)
def q_rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.rollup import read_rollup, upsert_rollup
    from pyspec_spark.queries.lake_queries import _tmp_root

    e = table(spark, sf_dir, "events")
    root = _tmp_root("pyspec_rollup_inc_")
    # the split must PARTITION the table even under NULL user_ids
    # (predicate + its negation both evaluate NULL and drop the row):
    # delta2 is the null-safe complement of delta1, not a re-derived
    # predicate
    is_delta = F.coalesce(F.col("event_id") % 5 == 0, F.lit(False))
    d1_pred = F.coalesce(F.col("user_id") % 2 == 0, F.lit(False))
    base = e.where(~is_delta)
    delta1 = e.where(is_delta & d1_pred)
    delta2 = e.where(is_delta & ~d1_pred)
    for chunk in (base, delta1, delta2):
        upsert_rollup(
            spark, root, chunk, "ts", ["event_type"], "value", level="day"
        )
    try:
        return read_rollup(spark, root, ["event_type"])
    except ValueError:
        # a zero-row corpus commits zero data files (the lake's empty-
        # version signal) — the rollup of nothing is nothing, typed to
        # match the oracle
        return spark.createDataFrame(
            [],
            "bucket TIMESTAMP, event_type STRING, n BIGINT, "
            "sum_v DOUBLE, mean_v DOUBLE, min_v DOUBLE, max_v DOUBLE",
        )


# ---------------------------------------------------------------------------
# ST12 batch face — view->purchase interval join (r7): every purchase
# paired with each of the same user's views in the preceding hour (the
# attribution-join shape; last-touch is one argmax on top).  This is
# the BATCH TWIN of the stream-stream interval join
# (streaming/events.py interval_join) — the one Structured Streaming
# join class the suite did not yet declare: both sides are streams,
# watermarks bound the buffered state, and the time-range condition is
# what lets Spark evict it.  Timestamp arithmetic is exact microsecond
# comparison in both engines; the output gap is integer seconds
# (boundary count == floor-epoch difference, identical cross-engine).
#
# 100 TB posture: the join keys on user_id with a time-range residual —
# at production key cardinality the shuffle is well-spread (the 15-user
# test corpus is the deliberately skewed small case); state in the
# streaming face is bounded by the 1 h window + watermark, one buffered
# row per in-window event per side.
# ---------------------------------------------------------------------------
@query(
    "q_view_purchase_join",
    oracle="""
SELECT v.user_id,
       v.event_id AS view_id,
       p.event_id AS purchase_id,
       CAST(date_diff('second', v.ts, p.ts) AS BIGINT) AS gap_s
FROM events v
JOIN events p
  ON p.user_id = v.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
ORDER BY view_id, purchase_id
""",
)
def q_view_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13 (second pass): projections / range condition as parsed SQL
    # (1:1 transliteration of the former Column chain)
    e = table(spark, sf_dir, "events")
    v = e.where("event_type = 'view'").selectExpr(
        "user_id", "event_id AS view_id", "ts AS v_ts"
    )
    p = e.where("event_type = 'purchase'").selectExpr(
        "user_id AS p_user", "event_id AS purchase_id", "ts AS p_ts"
    )
    joined = v.join(
        p,
        F.expr(
            "p_user = user_id AND p_ts >= v_ts"
            " AND p_ts <= v_ts + INTERVAL 1 HOUR"
        ),
    )
    return joined.selectExpr(
        "user_id",
        "view_id",
        "purchase_id",
        "CAST(CAST(p_ts AS BIGINT) - CAST(v_ts AS BIGINT) AS BIGINT)"
        " AS gap_s",
    ).orderBy("view_id", "purchase_id")


# ---------------------------------------------------------------------------
# ST1 under the driver gate (r7) — the STREAMING ENGINE itself as a
# declared oracle query: replay the events table's own parquet files as
# an availableNow micro-batch stream, run the ST1 tumbling aggregation
# through the real Structured Streaming runtime (watermark wider than
# the data span so nothing late-drops: the query verifies the engine's
# state machinery, not lateness policy), drain to a memory sink, and
# return the sink.  The oracle is the SAME SQL as q_events_tumbling —
# if the streaming runtime's incremental state produced anything
# different from the batch aggregation, the value hash flips.  Twin
# tests cover this per-operator at sf0.001; this row makes one of them
# driver-checkable at sf0.01.
#
# Bounded side effect: one availableNow drain per invocation (unique
# memory-sink name, so repeated driver runs never collide); exempted
# from the zero-jobs build gate as execution BY DESIGN.
# ---------------------------------------------------------------------------
@query(
    "q_stream_tumbling_rt",
    oracle="""
SELECT date_trunc('hour', ts)::TIMESTAMP AS bucket, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def q_stream_tumbling_rt(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    import uuid as _uuid

    from pyspec_spark.streaming.events import EVENT_SCHEMA, tumbling

    # the test tables are single parquet FILES; a file-source stream
    # needs a directory of arriving files — stage the events into 4
    # chunks so the drain runs 4 real micro-batches of incremental
    # state, not one degenerate batch
    src = tempfile.mkdtemp(prefix="pyspec_stream_rt_")
    table(spark, sf_dir, "events").repartition(4).write.mode(
        "overwrite"
    ).parquet(src)
    name = f"t_stream_rt_{_uuid.uuid4().hex[:10]}"
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        tumbling(stream, watermark="3650 days")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).orderBy("bucket", "event_type")
