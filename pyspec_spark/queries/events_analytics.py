"""Event-stream analytics completions — sequential funnel, time-series
gap filling with LOCF, and cohort retention.

Reference loci (SURVEY.md §0 policy): absent from `stuwilkins/pyspec`
[H] — north-star event analytics over the `events` substrate, the batch
faces of operations a production events pipeline runs continuously (the
streaming faces of this family are §2.10; sessionization q_events_session
is the same gap-and-island machinery as the funnel ordering here).

Determinism: timestamps are microsecond-truncated identically in both
engines (tables._events); stage membership uses MIN(ts) per user/stage
(order-independent); all value sums go through fixed-point; day lattices
are exact DATE sequences.

Scale notes (100 TB posture):
- funnel: three user-keyed aggregations + two co-partitioned joins — all
  shuffles share the user_id key, so AQE/exchange-reuse keeps it to one
  physical repartitioning of the fact stream; the per-stage tables are
  |users|-sized, far smaller than the event stream.
- gap fill: the lattice is generated per user from (min_day, max_day) —
  never a global cross join; its size is bounded by users x days. LOCF is
  one window pass keyed by user.
- retention: two user-day dedups + a broadcast-sized cohort map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspec_spark.functions.determinism import _fixed6
from pyspec_spark.registry import query
from pyspec_spark.tables import table


# ---------------------------------------------------------------------------
# Sequential conversion funnel: signup -> view -> click -> purchase, each
# stage's timestamp strictly after the previous stage's first timestamp.
# ---------------------------------------------------------------------------
@query(
    "q_funnel",
    oracle="""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'click' AND e.ts > s2.t2 GROUP BY e.user_id
), s4 AS (
  SELECT e.user_id, MIN(e.ts) AS t4
  FROM events e JOIN s3 ON e.user_id = s3.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s3.t3 GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM s1) AS n_signup,
       (SELECT COUNT(*) FROM s2) AS n_view,
       (SELECT COUNT(*) FROM s3) AS n_click,
       (SELECT COUNT(*) FROM s4) AS n_purchase
""",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Single-scan formulation: the naive per-stage join chain scans the
    # fact 4x and shuffles 11x; here every stage's "first ts strictly
    # after the previous stage" is an unbounded MIN window over the SAME
    # partitionBy(user_id), so the whole funnel is ONE scan of events and
    # ONE user-keyed shuffle, then a per-user reduction + global count.
    # r13 (second pass): windows + aggregates as parsed SQL (1:1
    # transliteration of the former Column chain; CASE with no ELSE ==
    # F.when with no otherwise)
    ev = table(spark, sf_dir, "events").where(
        "event_type IN ('signup', 'view', 'click', 'purchase')"
    )
    df = ev.select("user_id", "event_type", "ts").selectExpr(
        "*",
        "MIN(CASE WHEN event_type = 'signup' THEN ts END)"
        " OVER (PARTITION BY user_id) AS t1",
    )
    for prev, etype, out in (
        ("t1", "view", "t2"),
        ("t2", "click", "t3"),
        ("t3", "purchase", "t4"),
    ):
        df = df.selectExpr(
            "*",
            f"MIN(CASE WHEN event_type = '{etype}' AND ts > {prev}"
            f" THEN ts END) OVER (PARTITION BY user_id) AS {out}",
        )
    per_user = df.groupBy("user_id").agg(
        F.expr("MAX(t1)").alias("t1"),
        F.expr("MAX(t2)").alias("t2"),
        F.expr("MAX(t3)").alias("t3"),
        F.expr("MAX(t4)").alias("t4"),
    )
    return per_user.agg(
        F.expr("COUNT(t1)").alias("n_signup"),
        F.expr("COUNT(t2)").alias("n_view"),
        F.expr("COUNT(t3)").alias("n_click"),
        F.expr("COUNT(t4)").alias("n_purchase"),
    )


# ---------------------------------------------------------------------------
# Time-series gap fill: per-user daily value sums on a complete day
# lattice (sequence per user, never a global cross join), missing days
# filled by LOCF (last observation carried forward).
# ---------------------------------------------------------------------------
@query(
    "q_gap_fill",
    oracle="""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS day_value
  FROM events GROUP BY user_id, CAST(ts AS DATE)
), spans AS (
  SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY user_id
), lattice AS (
  SELECT s.user_id, CAST(g.day AS DATE) AS day
  FROM spans s, UNNEST(generate_series(CAST(s.d0 AS TIMESTAMP),
                                       CAST(s.d1 AS TIMESTAMP),
                                       INTERVAL 1 DAY)) AS g(day)
)
SELECT l.user_id, l.day,
       (d.day_value IS NULL) AS is_gap,
       LAST_VALUE(d.day_value IGNORE NULLS) OVER (
           PARTITION BY l.user_id ORDER BY l.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
FROM lattice l LEFT JOIN daily d ON l.user_id = d.user_id AND l.day = d.day
""",
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Plan choice, MEASURED (sf0.1, warm, min-of-7): this lattice ⟕ daily
    # → running-last plan = 264 ms collect / 331 ms noop.  The "joinless"
    # alternative (one lag() window, each observed row explodes into
    # itself + its gap days carrying prev_value) has fewer exchanges on
    # paper (2 vs 3) but measured 722 ms / 1457 ms — the per-row
    # array<struct> construction + conditional date-sequence explode
    # costs far more than the extra small shuffle and breaks codegen.
    # Keep the join plan; don't re-attempt without re-measuring.
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.select("user_id", F.col("ts").cast("date").alias("day"), "value")
        .groupBy("user_id", "day")
        .agg((F.sum(_fixed6(F.col("value"))).cast("double") / 1e6).alias("day_value"))
    )
    lattice = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        lattice.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.col("day_value").isNull().alias("is_gap"),
            F.last("day_value", ignorenulls=True).over(w).alias("filled_value"),
        )
    )


# ---------------------------------------------------------------------------
# Cohort retention: day-0 = each user's first active day; retention curve
# = distinct users active d days after their day-0.
# ---------------------------------------------------------------------------
@query(
    "q_retention",
    oracle="""
WITH user_days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), cohort AS (
  SELECT user_id, MIN(day) AS day0 FROM user_days GROUP BY user_id
)
SELECT CAST(ud.day - c.day0 AS BIGINT) AS day_offset,
       COUNT(DISTINCT ud.user_id) AS n_active
FROM user_days ud JOIN cohort c ON ud.user_id = c.user_id
GROUP BY day_offset
""",
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    user_days = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    cohort = user_days.groupBy("user_id").agg(F.min("day").alias("day0"))
    # (user_id, day) is distinct and offset = day - day0 is injective per
    # user, so (day_offset, user_id) rows are already unique: plain COUNT
    # equals COUNT DISTINCT and skips the Expand-based distinct-agg plan.
    return (
        user_days.join(cohort, "user_id")
        .select(F.datediff("day", "day0").cast("bigint").alias("day_offset"))
        .groupBy("day_offset")
        .agg(F.count("*").alias("n_active"))
    )


# ---------------------------------------------------------------------------
# E4 (r5b) — event-transition matrix (first-order Markov counts): for
# each user's time-ordered event stream, count (prev_type -> next_type)
# transitions and the per-source transition probability.  The
# behavioral-analytics primitive next to the funnel: the funnel checks
# ONE prescribed path, the transition matrix measures ALL of them.
# Determinism: per-user ordering ties break on event_id; probabilities
# round to 6 after an integer count ratio.
# Scale: one user-keyed window pass (the same single repartitioning the
# funnel family shares) + a types^2-bounded aggregation — output is
# |event_type|^2 regardless of stream size.
# ---------------------------------------------------------------------------
@query(
    "q_event_transitions",
    oracle="""
WITH s AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events
),
c AS (
  SELECT prev, event_type, COUNT(*) AS n
  FROM s WHERE prev IS NOT NULL
  GROUP BY prev, event_type
),
t AS (SELECT prev, SUM(n) AS tot FROM c GROUP BY prev)
SELECT c.prev AS prev_type, c.event_type AS next_type,
       CAST(c.n AS BIGINT) AS n,
       ROUND(c.n * 1.0 / t.tot, 6) AS p
FROM c JOIN t ON t.prev = c.prev
""",
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).where(F.col("prev").isNotNull())
    c = s.groupBy("prev", "event_type").agg(F.count("*").alias("n"))
    t = c.groupBy("prev").agg(F.sum("n").alias("tot"))
    return c.join(F.broadcast(t), "prev").select(
        F.col("prev").alias("prev_type"),
        F.col("event_type").alias("next_type"),
        F.col("n"),
        F.round(F.col("n").cast("double") / F.col("tot"), 6).alias("p"),
    )


# ---------------------------------------------------------------------------
# E6 — OHLC bars (r7): open/high/low/close of `value` per (hour,
# event_type) — the candlestick rollup every market-data/metering
# pipeline materializes.  Open/close are PICKED values (first/last in
# (ts, event_id) order — the event_id tiebreak makes equal-timestamp
# bars deterministic in both engines), high/low are exact MIN/MAX; no
# arithmetic touches the doubles at all, so there is no float-sum
# caveat anywhere.
#
# 100 TB posture: ONE partial-aggregated shuffle on the (bucket, type)
# key — open/close ride as MIN/MAX of (ts, event_id, value) structs,
# so no window pass and no second shuffle exists.
# ---------------------------------------------------------------------------
@query(
    "q_ohlc",
    oracle="""
SELECT date_trunc('hour', ts)::TIMESTAMP AS bucket, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       (MIN(struct_pack(ts := ts, event_id := event_id,
                        value := value))).value AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       (MAX(struct_pack(ts := ts, event_id := event_id,
                        value := value))).value AS close
FROM events
GROUP BY 1, 2
ORDER BY bucket, event_type
""",
)
def q_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    key = F.struct(
        F.col("ts").alias("ts"),
        F.col("event_id").alias("event_id"),
        F.col("value").alias("value"),
    )
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("bucket"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            F.min(key).getField("value").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(key).getField("value").alias("close"),
        )
        .orderBy("bucket", "event_type")
    )


# ---------------------------------------------------------------------------
# E7 — exact 3-sigma outliers (r7): per user, flag events whose value
# sits more than 3 population standard deviations from that user's
# mean — WITHOUT ever computing a mean, a variance, or a square root.
# The float chain mean/std/z is the classic cross-engine minefield
# (libm sqrt, order-dependent sums); instead the z-test is multiplied
# through into pure int64 arithmetic on milli-unit values:
#
#     |x - S/n| > 3 * sqrt((Q/n) - (S/n)^2)
#  <=>  (n*x - S)^2  >  9 * (n*Q - S^2)
#
# (multiply the z-test through by n^2: d^2 > 9*sigma^2 with sigma^2 =
# (n*Q - S^2)/n^2).  S = SUM(v3), Q = SUM(v3^2) exact bigints; both
# sides stay inside int64 for this corpus shape (v3 <= ~5.6e5, n <=
# 99: LHS <= ~3e15, RHS <= ~3e16 — the in-code bound note is part of the
# contract; a corpus violating it routes through DECIMAL(38,0)
# comparisons, never through floats).  Every flagged row is EXACTLY
# the set a real-arithmetic z-test would flag — no epsilon anywhere.
#
# 100 TB posture: one user-keyed aggregation for (n, S, Q) joined back
# to the events (user-keyed equi-join, broadcastable per partition at
# small key widths), flag map-side; two shuffles total.
# ---------------------------------------------------------------------------
@query(
    "q_value_outliers",
    oracle="""
WITH v AS (
  SELECT user_id, event_id,
         CAST(ROUND(value * 1e3) AS BIGINT) AS v3
  FROM events
),
st AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v3) AS BIGINT) AS s,
         CAST(SUM(v3 * v3) AS BIGINT) AS q
  FROM v GROUP BY user_id
)
SELECT v.user_id, v.event_id,
       CAST(v.v3 AS DOUBLE) / 1e3 AS value_r
FROM v JOIN st USING (user_id)
WHERE st.n >= 3
  AND (st.n * v.v3 - st.s) * (st.n * v.v3 - st.s)
      > 9 * (st.n * st.q - st.s * st.s)
ORDER BY user_id, event_id
""",
)
def q_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.round(F.col("value") * 1e3).cast("bigint").alias("v3"),
    )
    st = e.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("v3").alias("s"),
        F.sum(F.col("v3") * F.col("v3")).alias("q"),
    )
    j = e.join(st, "user_id")
    dev = F.col("n") * F.col("v3") - F.col("s")
    return (
        j.where(
            (F.col("n") >= 3)
            & (dev * dev > 9 * (F.col("n") * F.col("q") - F.col("s") * F.col("s")))
        )
        .select(
            "user_id",
            "event_id",
            (F.col("v3").cast("double") / 1e3).alias("value_r"),
        )
        .orderBy("user_id", "event_id")
    )


# ---------------------------------------------------------------------------
# E8 — user growth curve (r7): per day, how many users appeared for the
# FIRST time and the cumulative total — the activation/growth table
# every events dashboard opens with.  Cumulative COUNT(DISTINCT) over a
# window is the naive (and quadratic-state) form; the standard scale
# rewrite computes each user's first-seen day with ONE user-keyed
# aggregation, then a |days|-sized daily rollup and a running sum over
# the tiny day table.
#
# 100 TB posture: the only corpus shuffle is the per-user MIN(day);
# everything after runs on |days| rows (the running-sum window is a
# single partition of a few thousand rows — fine BECAUSE the corpus
# never enters it).
# ---------------------------------------------------------------------------
@query(
    "q_user_growth",
    oracle="""
WITH first_seen AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
),
daily AS (
  SELECT d0 AS day, CAST(COUNT(*) AS BIGINT) AS new_users
  FROM first_seen GROUP BY d0
)
SELECT day, new_users,
       CAST(SUM(new_users) OVER (ORDER BY day
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS total_users
FROM daily
ORDER BY day
""",
)
def q_user_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("d0")
    )
    daily = first_seen.groupBy(F.col("d0").alias("day")).agg(
        F.count("*").alias("new_users")
    )
    w = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        daily.withColumn("total_users", F.sum("new_users").over(w))
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# E9 — inter-arrival percentiles (r7): p50/p90/p99 of the gap between
# consecutive events per event_type — the latency/cadence table a
# capacity planner reads (tail gaps are what page; the mean gap hides
# them).  Gaps are exact integer milliseconds on the proven
# unix_millis/epoch_ms basis with (ts, event_id) tie ordering;
# percentiles use the discrete CUME_DIST >= p selection (the
# q_percentile_disc idiom — a PICKED element, never an interpolation,
# so no float arithmetic exists anywhere).
#
# 100 TB posture: one type-keyed window shuffle for the lag (shared by
# the CUME_DIST pass — same partitioning), then a |types|-key
# aggregation; at production the per-type window is the watch-item for
# monster types, and the standard mitigation is per-(type, day)
# sub-windows (gaps never span days at metric granularity).
# ---------------------------------------------------------------------------
@query(
    "q_gap_percentiles",
    oracle="""
WITH e AS (
  SELECT event_type, epoch_ms(ts) AS ms, event_id FROM events
),
g AS (
  SELECT event_type,
         ms - LAG(ms) OVER (PARTITION BY event_type
                            ORDER BY ms, event_id) AS gap_ms
  FROM e
),
c AS (
  SELECT event_type, gap_ms,
         CUME_DIST() OVER (PARTITION BY event_type ORDER BY gap_ms) AS cd
  FROM g WHERE gap_ms IS NOT NULL
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(MIN(CASE WHEN cd >= 0.5 THEN gap_ms END) AS BIGINT) AS p50_ms,
       CAST(MIN(CASE WHEN cd >= 0.9 THEN gap_ms END) AS BIGINT) AS p90_ms,
       CAST(MIN(CASE WHEN cd >= 0.99 THEN gap_ms END) AS BIGINT) AS p99_ms
FROM c
GROUP BY event_type
ORDER BY event_type
""",
)
def q_gap_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select(
        "event_type", F.unix_millis("ts").alias("ms"), "event_id"
    )
    wl = Window.partitionBy("event_type").orderBy("ms", "event_id")
    g = e.select(
        "event_type",
        (F.col("ms") - F.lag("ms").over(wl)).alias("gap_ms"),
    ).where(F.col("gap_ms").isNotNull())
    wc = Window.partitionBy("event_type").orderBy("gap_ms")
    c = g.withColumn("cd", F.cume_dist().over(wc))

    def disc(p: float, alias: str):
        return (
            F.min(F.when(F.col("cd") >= p, F.col("gap_ms")))
            .cast("bigint")
            .alias(alias)
        )

    return (
        c.groupBy("event_type")
        .agg(
            F.count("*").alias("n_gaps"),
            disc(0.5, "p50_ms"),
            disc(0.9, "p90_ms"),
            disc(0.99, "p99_ms"),
        )
        .orderBy("event_type")
    )
