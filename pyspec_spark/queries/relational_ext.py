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
