"""Window functions (SURVEY.md §2.5, Stage 3 — north-star completions).

The reference has no window operator (numpy.cumsum / shifted-slice idioms
in user scripts, `pyspec/spec.py` usage patterns [H]); these complete the
relational surface over `events` / `customer` / `orders`.

Determinism: every ORDER BY inside a window carries a unique-key tiebreak
(event_id / custkey / orderkey); rank/dense_rank windows that deliberately
order by a tied expression are deterministic by definition of rank.
Moving/cumulative sums go through DECIMAL so frame-internal addition order
can't drift between engines.

Scale notes: window partitions are keyed by user/segment/priority — Spark
shuffles once per distinct (partitionBy, orderBy) pair and sorts within
partitions; all windows in one query share a single shuffle when keyed
alike.  Skewed partitions (one hot user) are the known scale risk of any
window op; the substrate here is bounded (per-user event streams).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspec_spark.functions.determinism import _fixed6, dsum
from pyspec_spark.registry import query
from pyspec_spark.tables import table


# ---------------------------------------------------------------------------
# W1 — ranking family.  row_number over a unique order; rank/dense_rank
# over a deliberately tied expression (acctbal bucket).
# ---------------------------------------------------------------------------
@query(
    "q_window_rank",
    oracle="""
SELECT c_mktsegment, c_custkey, bal_bucket, rn, rnk, drnk
FROM (
  SELECT c_mktsegment, c_custkey,
         CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY CAST(FLOOR(c_acctbal / 1000) AS BIGINT) DESC, c_custkey) AS rn,
         RANK() OVER (PARTITION BY c_mktsegment
                      ORDER BY CAST(FLOOR(c_acctbal / 1000) AS BIGINT) DESC) AS rnk,
         DENSE_RANK() OVER (PARTITION BY c_mktsegment
                            ORDER BY CAST(FLOOR(c_acctbal / 1000) AS BIGINT) DESC) AS drnk
  FROM customer
)
WHERE rn <= 10
""",
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").withColumn(
        "bal_bucket", F.expr("CAST(FLOOR(c_acctbal / 1000) AS BIGINT)")
    )
    w_unique = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("bal_bucket"), "c_custkey"
    )
    w_tied = Window.partitionBy("c_mktsegment").orderBy(F.desc("bal_bucket"))
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            "bal_bucket",
            F.row_number().over(w_unique).alias("rn"),
            F.rank().over(w_tied).alias("rnk"),
            F.dense_rank().over(w_tied).alias("drnk"),
        )
        .where(F.col("rn") <= 10)
    )


# ---------------------------------------------------------------------------
# W2 / J8 — lag/lead deltas == self-as-of join (nearest earlier event per
# user).  Deltas in integer microseconds — exact in both engines.
# ---------------------------------------------------------------------------
@query(
    "q_asof_lag",
    oracle="""
SELECT event_id, user_id, event_type,
       ROUND(value - COALESCE(prev_value, 0.0), 6) AS dvalue,
       epoch_us(ts::TIMESTAMP) - prev_us AS dt_us
FROM (
  SELECT event_id, user_id, event_type, value, ts,
         LAG(value) OVER w AS prev_value,
         LAG(epoch_us(ts::TIMESTAMP)) OVER w AS prev_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
WHERE user_id <= 30
""",
)
def q_asof_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            F.unix_micros("ts").alias("us"),
            F.lag("value").over(w).alias("prev_value"),
            F.lag(F.unix_micros("ts")).over(w).alias("prev_us"),
        )
        .where(F.col("user_id") <= 30)
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.round(F.col("value") - F.coalesce(F.col("prev_value"), F.lit(0.0)), 6).alias(
                "dvalue"
            ),
            (F.col("us") - F.col("prev_us")).alias("dt_us"),
        )
    )


# ---------------------------------------------------------------------------
# W3 — moving aggregate, row frame (-2..0), decimal-exact.
# ---------------------------------------------------------------------------
@query(
    "q_window_moving",
    oracle="""
SELECT event_id, event_type,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6)))
                  OVER w AS DOUBLE)
             / COUNT(value) OVER w, 6) AS moving_avg
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
QUALIFY event_id <= 3000
""",
)
def q_window_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    msum = F.sum(_fixed6(F.col("value"))).over(w).cast("double") / 1e6
    return (
        e.select(
            "event_id",
            "event_type",
            F.round(msum / F.count("value").over(w), 6).alias("moving_avg"),
        )
        .where(F.col("event_id") <= 3000)
    )


# ---------------------------------------------------------------------------
# W4 — cumulative sum (numpy.cumsum on monitor counts analog).
# ---------------------------------------------------------------------------
@query(
    "q_window_cumsum",
    oracle="""
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_value
FROM events
QUALIFY user_id <= 30
""",
)
def q_window_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.select(
            "event_id",
            "user_id",
            (F.sum(_fixed6(F.col("value"))).over(w).cast("double") / 1e6).alias(
                "cum_value"
            ),
        )
        .where(F.col("user_id") <= 30)
    )


# ---------------------------------------------------------------------------
# W5 — top-k per group with unique tiebreak.
# ---------------------------------------------------------------------------
@query(
    "q_topk_group",
    oracle="""
SELECT o_orderpriority, o_orderkey, o_totalprice
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 3
""",
)
def q_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# W6 — ntile quartiles over a deterministic total order, aggregated.
# ---------------------------------------------------------------------------
@query(
    "q_ntile",
    oracle="""
WITH t AS (
  SELECT c_custkey, c_acctbal,
         NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS quartile
  FROM customer
)
SELECT quartile, COUNT(*) AS n,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sum_bal,
       MIN(c_custkey) AS min_key
FROM t
GROUP BY quartile
""",
)
def q_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT F.ntile over a global window — that is an Exchange
    # SinglePartition funnel (Spark warns "No Partition Defined for
    # Window operation") whose unscalability SCALING r10d measured.
    # ntile_exact = two-level exact global rank (range exchange +
    # per-bucket windows + driver prefix-sum) + closed-form bucket
    # arithmetic reproducing SQL NTILE's remainder distribution.
    from pyspec_spark.operators.ordering import ntile_exact

    c = table(spark, sf_dir, "customer")
    t = ntile_exact(
        c.select("c_custkey", "c_acctbal"),
        [F.desc("c_acctbal"), F.col("c_custkey")],
        4,
        "quartile",
    )
    return t.groupBy("quartile").agg(
        F.count("*").alias("n"),
        dsum("c_acctbal", "sum_bal"),
        F.min("c_custkey").alias("min_key"),
    )


# ---------------------------------------------------------------------------
# W8 — time-weighted average (r7): per user, each event's value held
# until the NEXT event (zero-order hold) and averaged by holding time —
# the TWAP shape every metering/pricing/telemetry pipeline computes,
# and a different beast from the plain mean when events arrive
# irregularly (a value held for an hour must weigh 3600x one held for
# a second).  Last event per user has no holding interval and is
# excluded; single-event users drop out entirely.
#
# Determinism: holding times are exact integer milliseconds
# (unix_millis / epoch_ms agree exactly), values are exact milli-units
# (the _fixed6 idiom at 1e3 — the corpus carries 2 decimals, and the
# 1e3 scale keeps SUM(v * w) inside int64: 5.6e5 x 2.6e9 x 99 events
# per user ~ 1.4e17 < 2^63), and the TWAP is ONE bigint/bigint double
# division under the terminal ROUND.  Ordering ties on equal
# timestamps break by event_id in both engines.
#
# 100 TB posture: one user-keyed window shuffle (lead + the two sums
# share the partitioning), then the per-user aggregation reuses the
# same key — the q_inverted_index exchange-sharing shape.
# ---------------------------------------------------------------------------
@query(
    "q_twap",
    oracle="""
WITH e AS (
  SELECT user_id, event_id,
         epoch_ms(ts) AS ms,
         CAST(ROUND(value * 1e3) AS BIGINT) AS v3
  FROM events
),
h AS (
  SELECT user_id, v3,
         LEAD(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) - ms
           AS w_ms
  FROM e
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_held,
       CAST(SUM(w_ms) AS BIGINT) AS span_ms,
       ROUND(CAST(SUM(v3 * w_ms) AS DOUBLE)
             / CAST(SUM(w_ms) * 1000 AS DOUBLE), 6) AS twap
FROM h
WHERE w_ms IS NOT NULL
GROUP BY user_id
ORDER BY user_id
""",
)
def q_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_millis("ts").alias("ms"),
        F.round(F.col("value") * 1e3).cast("bigint").alias("v3"),
    )
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    h = e.select(
        "user_id",
        "v3",
        (F.lead("ms").over(w) - F.col("ms")).alias("w_ms"),
    ).where(F.col("w_ms").isNotNull())
    return (
        h.groupBy("user_id")
        .agg(
            F.count("*").alias("n_held"),
            F.sum("w_ms").alias("span_ms"),
            F.round(
                (F.sum(F.col("v3") * F.col("w_ms"))).cast("double")
                / (F.sum("w_ms") * 1000).cast("double"),
                6,
            ).alias("twap"),
        )
        .orderBy("user_id")
    )
