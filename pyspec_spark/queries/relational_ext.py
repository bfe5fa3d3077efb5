"""Relational completions round 2 — pivot/unpivot, ordered string agg,
exact correlation/regression, grouping sets, range-frame windows,
deterministic hash sampling, and discrete percentiles.

Reference loci (SURVEY.md §0 policy): none of these exist in
`stuwilkins/pyspec` [H] — they are north-star relational surface
(BASELINE.json) plus the sampling primitives a training-data pipeline
needs (deterministic, reproducible subsets of a 100 TB corpus can't use
`TABLESAMPLE`'s nondeterministic row picks; content-hash predicates give
the same sample on every engine, every run, every partitioning).

Determinism (SURVEY.md §5.3): every float aggregate goes through exact
fixed-point sums; every LIMIT/top-k has a unique-key order; sampling uses
md5 content hashes (identical hex in Spark and DuckDB); range frames are
keyed by integer order values so tie order can't matter.

Scale notes (100 TB posture):
- pivot compiles to a single partial+final hash aggregation (one shuffle)
  because the pivot values are given explicitly — never let Spark run the
  distinct-scan job to discover them at scale.
- hash sampling is a parquet-pushable-free rowwise predicate: it streams,
  never shuffles, and the sample is stable under repartitioning.
- stratified sampling is one window shuffle keyed by the stratum; k is
  bounded so the output is tiny regardless of input size.
- cume_dist percentiles sort within stratum partitions only (one
  shuffle); for a global percentile at 100 TB prefer the grid1d
  histogram-CDF route instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspec_spark.functions.determinism import (
    _fixed6,
    dround,
    dsum,
    sql_dsum,
)
from pyspec_spark.registry import query
from pyspec_spark.tables import table


# ---------------------------------------------------------------------------
# Pivot: long -> wide with explicit pivot values (single-shuffle plan).
# Oracle = conditional aggregation, the relational-algebra definition.
# ---------------------------------------------------------------------------
@query(
    "q_pivot",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(CASE WHEN l_linestatus = 'F' THEN l_quantity END
                     AS DECIMAL(18,6))) AS DOUBLE) AS qty_F,
       CAST(SUM(CAST(CASE WHEN l_linestatus = 'O' THEN l_quantity END
                     AS DECIMAL(18,6))) AS DOUBLE) AS qty_O,
       COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS n_F,
       COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS n_O
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    wide = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])  # explicit values: no discovery job
        .agg(
            F.sum(_fixed6(F.col("l_quantity"))).alias("q"),
            F.count("l_quantity").alias("n"),
        )
    )
    return wide.select(
        "l_returnflag",
        (F.col("F_q").cast("double") / 1e6).alias("qty_F"),
        (F.col("O_q").cast("double") / 1e6).alias("qty_O"),
        F.coalesce(F.col("F_n"), F.lit(0)).alias("n_F"),
        F.coalesce(F.col("O_n"), F.lit(0)).alias("n_O"),
    )


# ---------------------------------------------------------------------------
# Unpivot: wide -> long (Spark `DataFrame.unpivot`, the melt operator).
# Oracle = UNION ALL of per-metric selects.
# ---------------------------------------------------------------------------
@query(
    "q_unpivot",
    oracle=f"""
SELECT l_returnflag, 'sum_qty' AS metric, val FROM (
  SELECT l_returnflag, {sql_dsum('l_quantity', 'val')}
  FROM lineitem GROUP BY l_returnflag)
UNION ALL
SELECT l_returnflag, 'sum_price' AS metric, val FROM (
  SELECT l_returnflag, {sql_dsum('l_extendedprice', 'val')}
  FROM lineitem GROUP BY l_returnflag)
""",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_price"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price"],
        variableColumnName="metric",
        valueColumnName="val",
    )


# ---------------------------------------------------------------------------
# Ordered string aggregation (listagg): sorted CSV of nation names per
# region.  collect_list alone is partition-order-nondeterministic; the
# array_sort makes the result a pure set function.
# ---------------------------------------------------------------------------
@query(
    "q_listagg",
    oracle="""
SELECT r_name,
       COUNT(*) AS n_nations,
       STRING_AGG(n_name, ',' ORDER BY n_name) AS nations_csv
FROM region JOIN nation ON n_regionkey = r_regionkey
GROUP BY r_name
""",
)
def q_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = table(spark, sf_dir, "region")
    nation = table(spark, sf_dir, "nation")
    joined = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    )
    return joined.groupBy("r_name").agg(
        F.count("*").alias("n_nations"),
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
            "nations_csv"
        ),
    )


# ---------------------------------------------------------------------------
# Exact Pearson correlation + OLS slope from order-independent sums.
# Built-in corr() is a float stream reduction (order-dependent); deriving
# r from exact fixed-point sums of (x, y, xy, x2, y2) is deterministic
# cross-engine AND is the scalable form: one partial+final aggregation,
# identical to how a 1000-executor plan would compute it.
# ---------------------------------------------------------------------------
@query(
    "q_corr",
    oracle=f"""
SELECT l_returnflag, n,
       ROUND((n * sxy - sx * sy)
             / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)), 6)
         AS corr_qty_disc,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope_qty_disc
FROM (
  SELECT l_returnflag, COUNT(*) AS n,
         {sql_dsum('l_quantity', 'sx')},
         {sql_dsum('l_discount', 'sy')},
         {sql_dsum('l_quantity * l_discount', 'sxy')},
         {sql_dsum('l_quantity * l_quantity', 'sxx')},
         {sql_dsum('l_discount * l_discount', 'syy')}
  FROM lineitem GROUP BY l_returnflag)
""",
)
def q_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_discount")
    sums = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        dsum(x, "sx"),
        dsum(y, "sy"),
        dsum(x * y, "sxy"),
        dsum(x * x, "sxx"),
        dsum(y * y, "syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    cov_n = n * sxy - sx * sy
    return sums.select(
        "l_returnflag",
        "n",
        dround(
            cov_n / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
            "corr_qty_disc",
        ),
        dround(cov_n / (n * sxx - sx * sx), "slope_qty_disc"),
    )


# ---------------------------------------------------------------------------
# Grouping sets — the general form of rollup/cube (A11/A12 complete).
# ---------------------------------------------------------------------------
@query(
    "q_grouping_sets",
    oracle=f"""
SELECT r_name, n_name, COUNT(*) AS n_cust, {sql_dsum('c_acctbal', 'sum_bal')}
FROM region
JOIN nation ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
GROUP BY GROUPING SETS ((r_name, n_name), (n_name), ())
""",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = table(spark, sf_dir, "region")
    nation = table(spark, sf_dir, "nation")
    customer = table(spark, sf_dir, "customer")
    joined = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return joined.groupingSets(
        [["r_name", "n_name"], ["n_name"], []], "r_name", "n_name"
    ).agg(F.count("*").alias("n_cust"), dsum("c_acctbal", "sum_bal"))


# ---------------------------------------------------------------------------
# W7 — value-range window frame (RANGE BETWEEN on an integer order key).
# Frame membership depends only on the order VALUE, so tied rows share a
# frame and the decimal sum is deterministic regardless of tie order.
# ---------------------------------------------------------------------------
@query(
    "q_window_range",
    oracle="""
SELECT l_suppkey, l_orderkey, l_linenumber, qty_i,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) OVER (
            PARTITION BY l_suppkey ORDER BY qty_i
            RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS range_price,
       COUNT(*) OVER (
            PARTITION BY l_suppkey ORDER BY qty_i
            RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS range_n
FROM (SELECT l_suppkey, l_orderkey, l_linenumber,
             CAST(l_quantity AS BIGINT) AS qty_i, l_extendedprice
      FROM lineitem)
""",
)
def q_window_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("bigint").alias("qty_i"),
        "l_extendedprice",
    )
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("qty_i")
        .rangeBetween(-5, Window.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "qty_i",
        (F.sum(_fixed6(F.col("l_extendedprice"))).over(w).cast("double") / 1e6)
        .alias("range_price"),
        F.count("*").over(w).alias("range_n"),
    )


# ---------------------------------------------------------------------------
# Deterministic hash sample: keep rows whose md5(content key) falls in a
# hex-prefix band (~10.2 % here).  Reproducible across engines, runs, and
# partitionings — the only sane way to subset a 100 TB corpus.
# ---------------------------------------------------------------------------
@query(
    "q_hash_sample",
    oracle=f"""
SELECT l_returnflag, COUNT(*) AS n_sampled, {sql_dsum('l_quantity', 'sum_qty')}
FROM lineitem
WHERE SUBSTR(md5(CAST(l_orderkey AS VARCHAR)), 1, 2) < '1a'
GROUP BY l_returnflag
""",
)
def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    band = F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 2) < "1a"
    return (
        li.where(band)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_sampled"), dsum("l_quantity", "sum_qty"))
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sample: exactly k rows per stratum, picked by
# content-hash order (not storage order).  One window shuffle keyed by
# the stratum; output is k x |strata| regardless of input size.
# ---------------------------------------------------------------------------
@query(
    "q_sample_stratified",
    oracle="""
SELECT l_returnflag, l_orderkey, l_linenumber, pick
FROM (
  SELECT l_returnflag, l_orderkey, l_linenumber,
         md5(CONCAT(CAST(l_orderkey AS VARCHAR), '-',
                    CAST(l_linenumber AS VARCHAR))) AS pick,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY md5(CONCAT(CAST(l_orderkey AS VARCHAR), '-',
                                                CAST(l_linenumber AS VARCHAR)))) AS rn
  FROM lineitem)
WHERE rn <= 5
""",
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    pick = F.md5(
        F.concat(
            F.col("l_orderkey").cast("string"),
            F.lit("-"),
            F.col("l_linenumber").cast("string"),
        )
    )
    w = Window.partitionBy("l_returnflag").orderBy("pick")
    return (
        li.select("l_returnflag", "l_orderkey", "l_linenumber", pick.alias("pick"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Discrete percentiles (p25/p50/p75) via cume_dist — the value actually
# present in the data, unlike interpolating percentile_cont (q_median).
# Identical window+aggregate logic in both engines; cume_dist is
# tie-stable (counts rows <= current value / n).
# ---------------------------------------------------------------------------
@query(
    "q_percentile_disc",
    oracle="""
SELECT l_returnflag,
       ROUND(MIN(CASE WHEN cd >= 0.25 THEN l_quantity END), 6) AS p25,
       ROUND(MIN(CASE WHEN cd >= 0.5  THEN l_quantity END), 6) AS p50,
       ROUND(MIN(CASE WHEN cd >= 0.75 THEN l_quantity END), 6) AS p75
FROM (
  SELECT l_returnflag, l_quantity,
         CUME_DIST() OVER (PARTITION BY l_returnflag
                           ORDER BY l_quantity) AS cd
  FROM lineitem)
GROUP BY l_returnflag
""",
)
def q_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    cd = li.select(
        "l_returnflag", "l_quantity", F.cume_dist().over(w).alias("cd")
    )
    def disc(p: float, alias: str):
        return F.round(
            F.min(F.when(F.col("cd") >= p, F.col("l_quantity"))), 6
        ).alias(alias)

    return cd.groupBy("l_returnflag").agg(
        disc(0.25, "p25"), disc(0.5, "p50"), disc(0.75, "p75")
    )


# ---------------------------------------------------------------------------
# J10 — cross join, declared (tiny-dim product only; the parameter-grid
# sweep shape).  Guarded at scale: both sides are O(dims).
# ---------------------------------------------------------------------------
@query(
    "q_cross_join",
    oracle="""
SELECT r.r_name, n.n_name, r.r_regionkey + n.n_nationkey AS key_sum
FROM region r CROSS JOIN nation n
""",
)
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = table(spark, sf_dir, "region").select("r_name", "r_regionkey")
    nation = table(spark, sf_dir, "nation").select("n_name", "n_nationkey")
    return region.crossJoin(nation).select(
        "r_name",
        "n_name",
        (F.col("r_regionkey") + F.col("n_nationkey")).alias("key_sum"),
    )


# ---------------------------------------------------------------------------
# Scalar subquery in a projection: deviation of each customer's balance
# from the global mean — planner exercises ScalarSubquery (computed once,
# broadcast into the projection), not a per-row join.
# ---------------------------------------------------------------------------
@query(
    "q_scalar_subquery",
    oracle="""
SELECT c_custkey,
       ROUND(c_acctbal - (
         SELECT ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                      / COUNT(c_acctbal), 6)
         FROM customer), 6) AS bal_dev
FROM customer
""",
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.tables import register_views

    register_views(spark, sf_dir)
    # sign-split HALF_UP micro-units == _fixed6 == CAST(x AS DECIMAL(18,6))
    micro = (
        "CASE WHEN c_acctbal >= 0 THEN FLOOR(c_acctbal * 1e6 + 0.5) "
        "ELSE -FLOOR(0.5 - c_acctbal * 1e6) END"
    )
    return spark.sql(
        f"""
SELECT c_custkey,
       ROUND(c_acctbal - (
         SELECT ROUND(CAST(SUM(CAST({micro} AS BIGINT))
                           AS DOUBLE) / 1e6 / COUNT(c_acctbal), 6)
         FROM customer), 6) AS bal_dev
FROM customer
"""
    )


# ---------------------------------------------------------------------------
# W8 — first_value / last_value / nth_value over an unbounded frame:
# per-customer first, latest, and second order price in date order
# (unique o_orderkey tiebreak -> frame content is total-ordered, so the
# picked values — not aggregates — are bit-identical cross-engine).
# One row per customer via DISTINCT over the constant-per-partition
# projection (no second aggregation pass needed).
# ---------------------------------------------------------------------------
@query(
    "q_first_last",
    oracle="""
SELECT DISTINCT o_custkey,
       first_value(o_totalprice) OVER w AS first_price,
       last_value(o_totalprice)  OVER w AS last_price,
       nth_value(o_totalprice, 2) OVER w AS second_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def q_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.tables import table

    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    ).distinct()


# ---------------------------------------------------------------------------
# W9 — percent_rank / cume_dist: supplier account-balance position
# within nation.  The unique s_suppkey tiebreak removes peer groups, so
# both functions reduce to exact rank ratios of integers — deterministic
# cross-engine; rounded to 6 per §5.3.
# ---------------------------------------------------------------------------
@query(
    "q_percent_rank",
    oracle="""
SELECT s_suppkey, s_nationkey,
       ROUND(percent_rank() OVER w, 6) AS pr,
       ROUND(cume_dist() OVER w, 6) AS cd
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
""",
)
def q_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.tables import table

    s = table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


# ---------------------------------------------------------------------------
# A16 — grouped mode (most frequent value): the order-priority mode per
# order status, argmax-by-count with lexicographic value tiebreak (the
# deterministic form of SQL MODE(), which is tie-unspecified).
# ---------------------------------------------------------------------------
@query(
    "q_mode",
    oracle="""
SELECT o_orderstatus, o_orderpriority AS mode_priority, n FROM (
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                            ORDER BY COUNT(*) DESC, o_orderpriority) AS rk
  FROM orders
  GROUP BY o_orderstatus, o_orderpriority
) WHERE rk = 1
""",
)
def q_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.tables import table

    o = table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("n"), "o_orderpriority"
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            "n",
        )
    )


# ---------------------------------------------------------------------------
# L3 companion — corpus-level n-gram frequency: top-20 token bigrams
# with counts (duplicates kept — these are frequencies, not the dedup
# shingle sets), unique-bigram tiebreak under the LIMIT.
# Map-side explode -> one hash aggregation -> TakeOrdered.
# ---------------------------------------------------------------------------
@query(
    "q_ngram_freq",
    oracle="""
SELECT bigram, COUNT(*) AS n FROM (
  SELECT unnest(list_transform(range(1, greatest(len(string_split(text, ' ')), 2)),
                i -> string_split(text, ' ')[i] || ' ' ||
                     string_split(text, ' ')[i + 1])) AS bigram
  FROM documents
)
GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT 20
""",
)
def q_ngram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from pyspec_spark.tables import fanout, table

    # r13 (guide §2): the bigram build+explode ran single-core below
    # the one-split scan; fan the raw rows out first (counts only
    # downstream — order-safe; no-op at scale).  Cold re-exec
    # 3.7 -> 1.6 s at sf0.1.
    #
    # r13 session 3 (guide §4.2, the _grams8_md5 precedent): the former
    # transform(sequence, i -> concat(element_at(toks, i), ...)) form
    # carried the CollapseProject re-split hazard (toks inlined into
    # BOTH element_at references per position -> the text re-split
    # O(len) times per doc, interpreted) — and a latent crash:
    # element_at past the end THROWS in Spark 4, so any 1-token doc
    # killed the query while the DuckDB oracle returned a NULL bigram
    # for it.  The mapInArrow kernel splits each text ONCE and emits
    # the same "tok_i tok_{i+1}" strings (bigram construction is
    # associative-free string concat — identical bytes), and emits the
    # ORACLE's NULL-bigram semantics for sub-2-token docs instead of
    # crashing.  Measured (same-session A/B, whole cold query): JVM
    # executor CPU 26.6 -> 21.7 s at sf0.1 — the bigram-build share;
    # the kernel itself is ~0.3 s single-thread.  Oracle hash-green at
    # sf0.01 + sf0.1.
    def kernel(batches):
        for batch in batches:
            out: list[str | None] = []
            for txt in batch.column(0).to_pylist():
                if txt is None:
                    continue
                toks = txt.split(" ")
                if len(toks) < 2:
                    out.append(None)
                    continue
                out.extend(
                    toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)
                )
            yield pa.RecordBatch.from_arrays(
                [pa.array(out, type=pa.string())], names=["bigram"]
            )

    d = fanout(table(spark, sf_dir, "documents"), "doc_id")
    return (
        d.select("text")
        .mapInArrow(kernel, "bigram string")
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# A17 — robust outlier detection per stratum: median / MAD (median
# absolute deviation) on customer balances, outlier = |x - med| > 3*MAD.
# Both medians go through the verified Spark `percentile` == DuckDB
# `quantile_cont` parity (same linear interpolation), rounded before
# reuse so downstream arithmetic sees identical operands on both
# engines.  Scale: two grouped percentile passes + broadcast joins of
# the 5-row stats — no per-row shuffle beyond the groupBys.
# ---------------------------------------------------------------------------
@query(
    "q_mad_outliers",
    oracle="""
WITH med AS (
  SELECT c_mktsegment, ROUND(quantile_cont(c_acctbal, 0.5), 6) AS med,
         COUNT(*) AS n
  FROM customer GROUP BY 1
),
dev AS (
  SELECT c.c_mktsegment, ABS(c.c_acctbal - m.med) AS adev
  FROM customer c JOIN med m USING (c_mktsegment)
),
mad AS (
  SELECT c_mktsegment, ROUND(quantile_cont(adev, 0.5), 6) AS mad
  FROM dev GROUP BY 1
)
SELECT m.c_mktsegment, m.med, a.mad,
       COALESCE(o.n_outliers, 0) AS n_outliers, m.n
FROM med m
JOIN mad a USING (c_mktsegment)
LEFT JOIN (
  SELECT d.c_mktsegment, COUNT(*) AS n_outliers
  FROM dev d JOIN mad a2 USING (c_mktsegment)
  WHERE d.adev > 3 * a2.mad
  GROUP BY 1
) o USING (c_mktsegment)
""",
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.tables import table

    c = table(spark, sf_dir, "customer")
    med = c.groupBy("c_mktsegment").agg(
        F.round(F.expr("percentile(c_acctbal, 0.5)"), 6).alias("med"),
        F.count("*").alias("n"),
    )
    dev = c.join(F.broadcast(med), "c_mktsegment").withColumn(
        "adev", F.abs(F.col("c_acctbal") - F.col("med"))
    )
    mad = dev.groupBy("c_mktsegment").agg(
        F.round(F.expr("percentile(adev, 0.5)"), 6).alias("mad")
    )
    out = (
        dev.join(F.broadcast(mad), "c_mktsegment")
        .where(F.col("adev") > 3 * F.col("mad"))
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_outliers"))
    )
    return (
        med.join(mad, "c_mktsegment")
        .join(out, "c_mktsegment", "left")
        .select(
            "c_mktsegment",
            "med",
            "mad",
            F.coalesce("n_outliers", F.lit(0)).alias("n_outliers"),
            "n",
        )
    )


# ---------------------------------------------------------------------------
# R11 (r4) — Z-order clustering key, ORACLE-CHECKED: the Morton
# interleave behind write_zordered (sinks.py) replayed bit-for-bit in
# DuckDB (unrolled shift/mask terms, identical integer arithmetic).
# The layout effect itself (file skipping) is proven in
# tests/test_layout.py; this query pins the key math cross-engine.
# ---------------------------------------------------------------------------
_Z_BITS = 8


def _z_sql(xe: str, ye: str) -> str:
    # every term fully parenthesized: SQL gives << LOWER precedence
    # than +, so `a << 2 + b << 3` parses as a << (2 + b) << 3
    terms = []
    for b in range(_Z_BITS):
        terms.append(f"(((({xe}) >> {b}) & 1) << {2 * b})")
        terms.append(f"(((({ye}) >> {b}) & 1) << {2 * b + 1})")
    return " + ".join(terms)


_ZORDER_ORACLE = f"""
SELECT l_orderkey, l_linenumber,
       {_z_sql("CAST(l_partkey % 256 AS BIGINT)", "CAST(l_suppkey % 256 AS BIGINT)")} AS z
FROM lineitem
WHERE l_orderkey < 100
"""


@query("q_zorder_key", oracle=_ZORDER_ORACLE)
def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.sinks import zorder_value

    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        zorder_value(
            F.col("l_partkey") % 256, F.col("l_suppkey") % 256, bits=_Z_BITS
        ).alias("z"),
    )


# ---------------------------------------------------------------------------
# R12 (r5) — column profiling, the ANALYZE-TABLE statistics pass every
# warehouse runs before planning: per numeric lineitem column, row/null
# counts, exact distinct cardinality, min/max, and the exact
# fixed-point mean.  ONE scan + ONE 1-row aggregate computing all
# columns' stats simultaneously, then a map-side stack() unpivot into
# (col_name, ...) rows — at 100 TB this is a single pass with map-side
# partial aggregation, not a scan per column.  ORACLE-CHECKED.
# ---------------------------------------------------------------------------
_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_linenumber")

_PROFILE_ORACLE = f"""
WITH agg AS (
  SELECT COUNT(*) AS n_rows,
{','.join(f'''
         COUNT(*) - COUNT({c}) AS nulls_{c},
         COUNT(DISTINCT {c}) AS nd_{c},
         ROUND(MIN(CAST({c} AS DOUBLE)), 6) AS min_{c},
         ROUND(MAX(CAST({c} AS DOUBLE)), 6) AS max_{c},
         ROUND(CAST(SUM(CAST(ROUND(CAST({c} AS DOUBLE) * 1e6) AS BIGINT)) AS DOUBLE)
               / COUNT({c})) / 1e6 AS mean_{c}''' for c in _PROFILE_COLS)}
  FROM lineitem
)
{' UNION ALL '.join(f'''
SELECT '{c}' AS col_name, n_rows, nulls_{c} AS n_nulls, nd_{c} AS n_distinct,
       min_{c} AS min_v, max_{c} AS max_v, mean_{c} AS mean_v
FROM agg''' for c in _PROFILE_COLS)}
ORDER BY col_name
"""


@query("q_profile", oracle=_PROFILE_ORACLE)
def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    aggs = [F.count("*").alias("n_rows")]
    for c in _PROFILE_COLS:
        d = F.col(c).cast("double")
        aggs += [
            (F.count("*") - F.count(c)).alias(f"nulls_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            F.round(F.min(d), 6).alias(f"min_{c}"),
            F.round(F.max(d), 6).alias(f"max_{c}"),
            (
                F.round(
                    F.sum(_fixed6(d)).cast("double") / F.count(c)
                )
                / 1e6
            ).alias(f"mean_{c}"),
        ]
    agg = li.agg(*aggs)
    stack = ", ".join(
        f"'{c}', nulls_{c}, nd_{c}, min_{c}, max_{c}, mean_{c}"
        for c in _PROFILE_COLS
    )
    return agg.selectExpr(
        "n_rows",
        f"stack({len(_PROFILE_COLS)}, {stack}) AS "
        "(col_name, n_nulls, n_distinct, min_v, max_v, mean_v)",
    ).select(
        "col_name", "n_rows", "n_nulls", "n_distinct", "min_v", "max_v", "mean_v"
    ).orderBy("col_name")


# ---------------------------------------------------------------------------
# R13 (r5) — mergeable approximate quantiles (the sketch family's third
# member next to HLL distinct and CMS counts): per-group
# approx_percentile with bounded RANK error.  Spark's implementation is
# a mergeable KLL-style sketch — partial aggregation state is sketch
# bytes, so at 100 TB every map task contributes a bounded-size partial
# no matter how many rows it scans (an exact percentile would shuffle
# every value).  Rows-only by design (the sketch is approximate and
# engine-specific); the rank-error contract |rank(approx) - q*n| <=
# n/accuracy is pytest-asserted against the exact sorted data
# (test_relational_ext.py).
# ---------------------------------------------------------------------------
_AQ_ACCURACY = 10_000


@query("q_approx_quantile")
def q_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx(
                "l_extendedprice", [0.25, 0.5, 0.75], _AQ_ACCURACY
            ).alias("qs"),
            F.count("*").alias("n_rows"),
        )
        .select(
            "l_returnflag",
            "n_rows",
            F.col("qs")[0].alias("p25"),
            F.col("qs")[1].alias("p50"),
            F.col("qs")[2].alias("p75"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# R14 (r5) — deterministic WEIGHTED sampling (Efraimidis–Spirakis 2006:
# top-k by ln(u)/w with u uniform per row draws each row with
# probability proportional to its weight).  The uniform comes from the
# row's md5 (first 8 hex chars / 2^32) — content-derived, so the same
# sample materializes on any engine, run, or partition layout, exactly
# like the engine's other hash-based samplers.  Weight = n_chars: the
# size-proportional document sample a token-budget curation pass draws.
# Plan: map-side key computation + TakeOrderedAndProject — no shuffle
# beyond the global top-k.  ORACLE-CHECKED (key rounded to 6 before the
# ranked limit, doc_id tiebreak — the §5.3 ordering convention).
# ---------------------------------------------------------------------------
_WS_K = 25

_WEIGHTED_SAMPLE_ORACLE = f"""
SELECT doc_id, n_chars, es_key
FROM (
  SELECT doc_id, n_chars,
         ROUND(LN((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#ws'),
                    1, 8))::BIGINT + 1) / 4294967296.0)
               / n_chars, 6) AS es_key
  FROM documents
  WHERE n_chars > 0
)
ORDER BY es_key DESC, doc_id
LIMIT {_WS_K}
"""


@query("q_weighted_sample", oracle=_WEIGHTED_SAMPLE_ORACLE)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#ws"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        + 1
    ) / F.lit(4294967296.0)
    es_key = F.round(F.log(u) / F.col("n_chars"), 6)
    return (
        d.where(F.col("n_chars") > 0)
        .select("doc_id", "n_chars", es_key.alias("es_key"))
        .orderBy(F.desc("es_key"), "doc_id")
        .limit(_WS_K)
    )


# ---------------------------------------------------------------------------
# R15 (r5b) — RFM customer segmentation (recency / frequency /
# monetary), the classic behavioral bucketing: per-customer stats from
# orders, NTILE(5) scores on each axis with deterministic custkey
# tiebreaks, then the 5x5x5-bounded segment table.  Monetary sums are
# exact decimal so both engines order identically before the ntile.
# Scale note: the three ranking windows run over the |customers|-sized
# stats table, not the order stream; at extreme customer cardinality
# swap NTILE for histogram-CDF bucket assignment (the q_grid1d route)
# to avoid the single-partition global sort.
# ---------------------------------------------------------------------------
_RFM_ORACLE = """
WITH cust AS (
  SELECT o_custkey,
         COUNT(*) AS freq,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
           AS monetary,
         MAX(CAST(o_orderdate AS DATE)) AS last_order
  FROM orders GROUP BY o_custkey
),
mx AS (SELECT MAX(last_order) AS maxd FROM cust),
rfm AS (
  SELECT o_custkey, freq, monetary,
         date_diff('day', last_order, mx.maxd) AS recency_days
  FROM cust, mx
),
b AS (
  SELECT monetary,
    NTILE(5) OVER (ORDER BY recency_days, o_custkey) AS r_bucket,
    NTILE(5) OVER (ORDER BY freq DESC, o_custkey) AS f_bucket,
    NTILE(5) OVER (ORDER BY monetary DESC, o_custkey) AS m_bucket
  FROM rfm
)
SELECT r_bucket, f_bucket, m_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(monetary AS DECIMAL(18,6))) AS DOUBLE)
         AS total_monetary
FROM b GROUP BY r_bucket, f_bucket, m_bucket
"""


@query("q_rfm", oracle=_RFM_ORACLE)
def q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.count("*").alias("freq"),
        dsum("o_totalprice", "monetary"),
        F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
    )
    mx = cust.agg(F.max("last_order").alias("maxd"))
    rfm = cust.crossJoin(F.broadcast(mx)).select(
        "o_custkey",
        "freq",
        "monetary",
        F.datediff("maxd", "last_order").alias("recency_days"),
    )
    # three exact NTILE(5) passes WITHOUT global windows: each F.ntile
    # over an unpartitioned Window was an Exchange SinglePartition
    # funnel (three of them — the exact shape SCALING r10d measured as
    # one-core-bound); ntile_exact ranks two-level per dimension, so
    # every corpus-sized stage stays hash/range-partitioned
    from pyspec_spark.operators.ordering import ntile_exact

    b = rfm
    for out, order in (
        ("r_bucket", [F.col("recency_days"), F.col("o_custkey")]),
        ("f_bucket", [F.desc("freq"), F.col("o_custkey")]),
        ("m_bucket", [F.desc("monetary"), F.col("o_custkey")]),
    ):
        b = ntile_exact(b, order, 5, out)
    b = b.select("monetary", "r_bucket", "f_bucket", "m_bucket")
    return b.groupBy("r_bucket", "f_bucket", "m_bucket").agg(
        F.count("*").alias("n_customers"),
        dsum("monetary", "total_monetary"),
    )


# ---------------------------------------------------------------------------
# R16 (r5b) — market-basket co-occurrence (association-rule support /
# lift): part pairs appearing in the same order, the classic
# co-purchase primitive.  Pair expansion is a self-join keyed by
# orderkey whose fan-out is bounded by basket size (~items²/2 per
# order — cap baskets upstream at extreme sizes), one pair-keyed
# count, then TakeOrdered.  Lift = n_orders*pc/(ic_a*ic_b) computed
# from exact integer counts, rounded to 6.  Deterministic: top-20 on
# (count desc, part_a, part_b).
# ---------------------------------------------------------------------------
_BASKET_TOPK = 20

_COPURCHASE_ORACLE = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
n_ord AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM items),
ic AS (SELECT l_partkey, COUNT(*) AS c FROM items GROUP BY l_partkey),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS pc
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
)
SELECT p.part_a, p.part_b, CAST(p.pc AS BIGINT) AS n_together,
       ROUND(p.pc * 1.0 / n_ord.n, 6) AS support,
       ROUND(p.pc * 1.0 * n_ord.n / (ia.c * ib.c), 6) AS lift
FROM pairs p
JOIN ic ia ON ia.l_partkey = p.part_a
JOIN ic ib ON ib.l_partkey = p.part_b, n_ord
ORDER BY p.pc DESC, p.part_a, p.part_b
LIMIT {_BASKET_TOPK}
"""


@query("q_copurchase", oracle=_COPURCHASE_ORACLE)
def q_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    # Tracked persist (r14, VERDICT r13 item 5 — formerly a bare
    # .cache() that lived for the session): four consumers (both pair
    # sides, item counts, order count) would otherwise each re-run the
    # scan+distinct (measured 1.7 s -> 0.6 s warm at sf0.1); two long
    # columns, safely cacheable.  release_persisted() drains it.
    from pyspec_spark.registry import PERSIST_SEQ, track_persist

    items = track_persist(
        spark,
        f"q_copurchase#items#{next(PERSIST_SEQ)}",
        li.select("l_orderkey", "l_partkey").distinct(),
    )
    n_ord = items.select("l_orderkey").distinct().agg(
        F.count("*").alias("n")
    )
    ic = items.groupBy("l_partkey").agg(F.count("*").alias("c"))
    a = items.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = items.select(
        F.col("l_orderkey").alias("ok_b"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        a.join(
            b,
            (F.col("l_orderkey") == F.col("ok_b"))
            & (F.col("part_a") < F.col("part_b")),
        )
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("pc"))
    )
    ia = ic.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("ca"))
    ib = ic.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("cb"))
    # TakeOrdered FIRST: the ranking key (pc, part_a, part_b) needs no
    # model columns, so the lift/support joins run over 20 rows instead
    # of every distinct pair (measured 1.7 s -> 0.6 s warm at sf0.1)
    topk = pairs.orderBy(F.desc("pc"), "part_a", "part_b").limit(
        _BASKET_TOPK
    )
    return (
        topk.join(F.broadcast(ia), "part_a")
        .join(F.broadcast(ib), "part_b")
        .crossJoin(F.broadcast(n_ord))
        .select(
            "part_a",
            "part_b",
            F.col("pc").alias("n_together"),
            F.round(F.col("pc").cast("double") / F.col("n"), 6).alias(
                "support"
            ),
            F.round(
                F.col("pc").cast("double")
                * F.col("n")
                / (F.col("ca") * F.col("cb")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("n_together"), "part_a", "part_b")
    )
