"""Relational core — SURVEY.md §2.2-2.4, 2.6, 2.7 (Stages 0-1).

Reference loci (public `stuwilkins/pyspec`; SURVEY.md §0 citation policy):
projection/filter = `pyspec/spec.py` SpecScan attribute access + numpy
masks; monitor normalization = `pyspec/spec.py` SpecPlot/getYE; the
multi-metric per-scan summary = the numpy `scan.<col>.sum()/.mean()` idiom
re-expressed as the flagship hash aggregation.

Scale notes (100 TB posture):
- Every aggregation is a keyed groupBy -> partial (map-side) + final
  HashAggregate; no driver-side loops anywhere.
- Small dimensions (part/supplier/nation/region/customer at TPC-H ratios)
  are explicitly `broadcast()` so the fact table never shuffles for them;
  the orders<->lineitem join shuffles on the shared key and AQE picks
  SMJ/shuffled-hash + handles skew.
- Filters are plain parquet-pushable predicates (verified via .explain:
  PushedFilters) and projections prune the scan to the referenced columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspec_spark.functions.determinism import davg, dround, dsum, sql_davg, sql_dsum
from pyspec_spark.registry import query
from pyspec_spark.tables import table


# ---------------------------------------------------------------------------
# A1 — flagship: multi-metric hash aggregation (pricing summary, TPC-H Q1
# shape).  pyspec analog: per-scan summary stats over counter columns.
# ---------------------------------------------------------------------------
@query(
    "q_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity', 'sum_qty')},
       {sql_dsum('l_extendedprice', 'sum_base_price')},
       {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
       {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
       {sql_davg('l_quantity', 'avg_qty')},
       {sql_davg('l_extendedprice', 'avg_price')},
       {sql_davg('l_discount', 'avg_disc')},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1998-09-03'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    # r13: SQL-string operands ride dsum's parsed-SQL path (one py4j
    # round trip per aggregate instead of ~140 — see determinism.dsum)
    disc_price = "(l_extendedprice * (1 - l_discount))"
    charge = f"({disc_price} * (1 + l_tax))"
    return (
        li.where(F.col("l_shipdate") < F.lit("1998-09-03").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# S2 — scan fetch by key (pyspec `SpecDataFile[n]` random access;
# `pyspec/spec.py` __getitem__).  Key-equality predicate -> parquet
# pushdown; at scale with scan_number partitioning this is pure pruning.
# ---------------------------------------------------------------------------
@query(
    "q_scan_select",
    oracle="""
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
       CAST(l_shipdate AS DATE) AS ship_date
FROM lineitem
WHERE l_orderkey <= 64
""",
)
def q_scan_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.where(F.col("l_orderkey") <= 64).select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        F.col("l_shipdate").cast("date").alias("ship_date"),
    )


# ---------------------------------------------------------------------------
# P1 — column projection (pyspec `scan.H` / `scan.values['Detector']`).
# Column pruning: the parquet scan reads only these five columns.
# ---------------------------------------------------------------------------
@query(
    "q_project",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
FROM lineitem
""",
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag"
    )


# ---------------------------------------------------------------------------
# P2 — compound predicate filter (numpy boolean-mask idiom `y[x>0]`).
# Numeric range + string equality + date range, all parquet-pushable.
# ---------------------------------------------------------------------------
@query(
    "q_filter_pred",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_discount
FROM lineitem
WHERE l_quantity BETWEEN 10 AND 24
  AND l_discount > 0.05
  AND l_returnflag = 'R'
  AND l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
""",
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.where(
        F.col("l_quantity").between(10, 24)
        & (F.col("l_discount") > 0.05)
        & (F.col("l_returnflag") == "R")
        & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


# ---------------------------------------------------------------------------
# P3+P4 — monitor normalization + Poisson error (pyspec getYE:
# y/Monitor, err = sqrt(counts)).  Testdata analog per SURVEY §1.3.
# Pure row-wise double arithmetic -> whole-stage codegen, no shuffle.
# ---------------------------------------------------------------------------
@query(
    "q_norm",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice * (1 - l_discount) / (1 + l_tax), 6) AS norm_price,
       ROUND(SQRT(l_quantity), 6) AS qty_err
FROM lineitem
WHERE l_orderkey <= 1000
""",
)
def q_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.where(F.col("l_orderkey") <= 1000).select(
        "l_orderkey",
        "l_linenumber",
        dround(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) / (1 + F.col("l_tax")),
            "norm_price",
        ),
        dround(F.sqrt(F.col("l_quantity")), "qty_err"),
    )


# ---------------------------------------------------------------------------
# P5 — guarded division (zero-monitor guard on normalization).
# ---------------------------------------------------------------------------
@query(
    "q_safe_div",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(COALESCE(l_extendedprice / NULLIF(l_discount, 0.0), -1.0), 6) AS price_per_disc
FROM lineitem
WHERE l_orderkey <= 1000
""",
)
def q_safe_div(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.where(F.col("l_orderkey") <= 1000).select(
        "l_orderkey",
        "l_linenumber",
        dround(
            F.coalesce(
                F.col("l_extendedprice") / F.nullif(F.col("l_discount"), F.lit(0.0)),
                F.lit(-1.0),
            ),
            "price_per_disc",
        ),
    )


# ---------------------------------------------------------------------------
# A2 — point-wise scan binning (pyspec `setMode('bin')`: repeated scans
# averaged point-by-point; `pyspec/spec.py`).  Point key -> groupBy avg.
# ---------------------------------------------------------------------------
@query(
    "q_bin_mode",
    oracle=f"""
SELECT l_linenumber AS point,
       {sql_davg('l_quantity', 'avg_qty')},
       {sql_davg('l_extendedprice', 'avg_price')},
       COUNT(*) AS n
FROM lineitem
GROUP BY l_linenumber
""",
)
def q_bin_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_linenumber").alias("point"))
        .agg(
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            F.count("*").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# A9 — count-distinct (expand + two-phase distinct aggregation in Spark).
# ---------------------------------------------------------------------------
@query(
    "q_count_distinct",
    oracle="""
SELECT COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       COUNT(DISTINCT l_orderkey) AS n_orders
FROM lineitem
""",
)
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# A11 — rollup over the region -> nation hierarchy.
# ---------------------------------------------------------------------------
@query(
    "q_rollup",
    oracle=f"""
SELECT r_name, n_name, COUNT(*) AS n_cust,
       {sql_dsum('c_acctbal', 'sum_bal')}
FROM region
JOIN nation ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
GROUP BY ROLLUP (r_name, n_name)
""",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = table(spark, sf_dir, "region")
    nation = table(spark, sf_dir, "nation")
    customer = table(spark, sf_dir, "customer")
    joined = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        F.count("*").alias("n_cust"), dsum("c_acctbal", "sum_bal")
    )


# ---------------------------------------------------------------------------
# A12 — cube over (returnflag, linestatus).
# ---------------------------------------------------------------------------
@query(
    "q_cube",
    oracle=f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       {sql_dsum('l_quantity', 'sum_qty')}
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), dsum("l_quantity", "sum_qty")
    )


# ---------------------------------------------------------------------------
# A13 — exact median / quantile (FWHM/resolution-analysis idiom).
# Spark exact `percentile` == DuckDB `quantile_cont` (linear interp).
# ---------------------------------------------------------------------------
@query(
    "q_median",
    oracle="""
SELECT l_returnflag,
       ROUND(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
       ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25_price,
       ROUND(quantile_cont(l_extendedprice, 0.75), 6) AS p75_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("median_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.25)"), 6).alias("p25_price"),
        F.round(F.expr("percentile(l_extendedprice, 0.75)"), 6).alias("p75_price"),
    )


# ---------------------------------------------------------------------------
# A14 — variance/stddev family, derived from exact decimal sums so both
# engines compute identical values (pyspec `bin`-mode stderr analog).
# ---------------------------------------------------------------------------
_STATS_SQL = """
WITH s AS (
  SELECT l_returnflag,
         COUNT(l_quantity) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sxx
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       ROUND(sx / n, 6) AS mean_qty,
       ROUND((sxx - sx * sx / n) / (n - 1), 6) AS var_qty,
       ROUND(SQRT((sxx - sx * sx / n) / (n - 1)), 6) AS std_qty
FROM s
"""


@query("q_stats", oracle=_STATS_SQL)
def q_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    s = li.groupBy("l_returnflag").agg(
        F.count("l_quantity").alias("n"),
        dsum("l_quantity", "sx"),
        dsum(F.col("l_quantity") * F.col("l_quantity"), "sxx"),
    )
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - 1)
    return s.select(
        "l_returnflag",
        "n",
        F.round(F.col("sx") / F.col("n"), 6).alias("mean_qty"),
        F.round(var, 6).alias("var_qty"),
        F.round(F.sqrt(var), 6).alias("std_qty"),
    )


# ---------------------------------------------------------------------------
# J1 — broadcast equi join (dark-frame subtraction pattern: every fact row
# aligned with a small dimension; `pyspec/ccd/transformations.py`
# FileProcessor dark correction).  Explicit broadcast() — at 100 TB the
# fact side never shuffles for a dimension this small.
# ---------------------------------------------------------------------------
@query(
    "q_join_bcast",
    oracle=f"""
SELECT p_brand,
       {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
""",
)
def q_join_bcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# J2 — shuffle equi join (frame <-> scan-metadata alignment pattern).
# orders x lineitem are both large at scale: shuffle on the shared key,
# AQE chooses SMJ/shuffled-hash and splits skewed partitions.
# ---------------------------------------------------------------------------
@query(
    "q_join_shuffle",
    oracle=f"""
SELECT o_orderpriority,
       COUNT(*) AS n_lines,
       {sql_dsum('l_extendedprice', 'sum_price')}
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
)
def q_join_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_lines"), dsum("l_extendedprice", "sum_price"))
    )


# ---------------------------------------------------------------------------
# J3 — multi-way star join: revenue by region/nation.  Dimension chain is
# broadcast end-to-end; only orders<->lineitem shuffles.
# ---------------------------------------------------------------------------
@query(
    "q_join_5way",
    oracle=f"""
SELECT r_name, n_name,
       {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
       COUNT(*) AS n_lines
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY r_name, n_name
""",
)
def q_join_5way(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = table(spark, sf_dir, "region")
    nation = table(spark, sf_dir, "nation")
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    dims = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "r_name", "n_name")
    )
    return (
        orders.join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("r_name", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# J4 — left outer join: customers with/without orders per segment.
# ---------------------------------------------------------------------------
@query(
    "q_join_left",
    oracle="""
SELECT c_mktsegment,
       COUNT(DISTINCT c_custkey) AS n_customers,
       COUNT(o_orderkey) AS n_orders,
       COUNT(DISTINCT CASE WHEN o_orderkey IS NULL THEN c_custkey END) AS n_orderless
FROM customer LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    joined = customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
    return joined.groupBy("c_mktsegment").agg(
        F.countDistinct("c_custkey").alias("n_customers"),
        F.count("o_orderkey").alias("n_orders"),
        F.countDistinct(
            F.when(F.col("o_orderkey").isNull(), F.col("c_custkey"))
        ).alias("n_orderless"),
    )


# ---------------------------------------------------------------------------
# J5 — left semi join (EXISTS): customers with >=1 urgent order.
# ---------------------------------------------------------------------------
@query(
    "q_join_semi",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n_cust
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
""",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
    return (
        customer.join(urgent, customer.c_custkey == urgent.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_cust"))
    )


# ---------------------------------------------------------------------------
# J6 — left anti join (NOT EXISTS): customers with no orders.
# ---------------------------------------------------------------------------
@query(
    "q_join_anti",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n_cust
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
""",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_cust"))
    )


# ---------------------------------------------------------------------------
# J7 — theta (inequality) join.  Both sides small -> broadcast
# nested-loop; at scale the pattern is bucket-and-overlap (SURVEY §4.3).
# ---------------------------------------------------------------------------
@query(
    "q_join_theta",
    oracle=f"""
SELECT n_name, COUNT(*) AS n_sup,
       {sql_dsum('s_acctbal', 'sum_bal')}
FROM supplier JOIN nation ON s_acctbal > 1000 * n_nationkey
GROUP BY n_name
""",
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    return (
        supplier.join(
            F.broadcast(nation),
            supplier.s_acctbal > 1000 * nation.n_nationkey,
        )
        .groupBy("n_name")
        .agg(F.count("*").alias("n_sup"), dsum("s_acctbal", "sum_bal"))
    )


# ---------------------------------------------------------------------------
# O2 — global top-k ("strongest N reflections" idiom) with unique
# tiebreak.  Spark plans TakeOrderedAndProject: per-partition heap + merge,
# no global sort — the right shape at any scale.
# ---------------------------------------------------------------------------
@query(
    "q_topk",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 10
""",
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# U1 — union/concatenate (pyspec `sf[[34,35,36]]` scan concatenation,
# `setMode('concatenate')`).
# ---------------------------------------------------------------------------
@query(
    "q_union_concat",
    oracle=f"""
SELECT l_linestatus, COUNT(*) AS n, {sql_dsum('l_quantity', 'sum_qty')}
FROM (
  SELECT l_linestatus, l_quantity FROM lineitem WHERE l_returnflag = 'A'
  UNION ALL
  SELECT l_linestatus, l_quantity FROM lineitem WHERE l_returnflag = 'R'
)
GROUP BY l_linestatus
""",
)
def q_union_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_returnflag") == "A").select("l_linestatus", "l_quantity")
    r = li.where(F.col("l_returnflag") == "R").select("l_linestatus", "l_quantity")
    return (
        a.unionByName(r)
        .groupBy("l_linestatus")
        .agg(F.count("*").alias("n"), dsum("l_quantity", "sum_qty"))
    )


# ---------------------------------------------------------------------------
# U2 — intersect: high-balance customers who actually placed orders.
# ---------------------------------------------------------------------------
@query(
    "q_intersect",
    oracle="""
SELECT o_custkey AS custkey FROM orders
INTERSECT
SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
""",
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    a = orders.select(F.col("o_custkey").alias("custkey"))
    b = customer.where(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("custkey")
    )
    return a.intersect(b)


# ---------------------------------------------------------------------------
# U3 — except (distinct): customer keys that never ordered.
# ---------------------------------------------------------------------------
@query(
    "q_except",
    oracle="""
SELECT c_custkey AS custkey FROM customer
EXCEPT
SELECT o_custkey AS custkey FROM orders
""",
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    a = customer.select(F.col("c_custkey").alias("custkey"))
    b = orders.select(F.col("o_custkey").alias("custkey"))
    return a.exceptAll(b).distinct()
