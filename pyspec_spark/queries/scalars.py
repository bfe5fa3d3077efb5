"""Scalar function families (SURVEY.md §2.8 F1-F6 + UD1, A10).

Reference loci: math = numpy ufuncs / `src/ctrans.c` rotation trig [M];
model functions = `pyspec/fitfuncs.py` `gauss, lor, pvoight, linear,
power` [H] (the f(x, p) protocol); strings/regexp = the SPEC control-line
parser idioms in `pyspec/spec.py` [H]; dates = `#D` header parsing [H].

Cross-engine caution: ln/exp/pow are libm functions whose last ulp can
differ between the JVM and DuckDB's C library; every such output is
ROUND(...,6) and the operand magnitudes keep the tie probability
negligible (SURVEY §5.3 rule b).  sqrt/abs/floor/ceil are IEEE-exact.

The UDF variant (q_model_gauss_udf) computes the same closed form with a
vectorized Arrow pandas UDF — the SQL-vs-UDF pair is its own cross-check
of the Python worker path (numpy exp vs JVM exp vs DuckDB exp).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from pyspec_spark.functions.determinism import dsum
from pyspec_spark.registry import query
from pyspec_spark.tables import table


# ---------------------------------------------------------------------------
# F1 — math functions over lineitem numerics.
# ---------------------------------------------------------------------------
@query(
    "q_math_funcs",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(SQRT(l_extendedprice), 6) AS r_sqrt,
       ROUND(LN(l_extendedprice + 1), 6) AS r_ln,
       ROUND(EXP(l_discount), 6) AS r_exp,
       ROUND(POW(l_quantity, 2), 6) AS r_pow,
       ABS(l_quantity - 25) AS r_abs,
       CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS r_floor,
       CAST(CEIL(l_discount * 100) AS BIGINT) AS r_ceil,
       ROUND(l_extendedprice, 2) AS r_round
FROM lineitem
WHERE l_orderkey <= 1500
""",
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 1500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_extendedprice"), 6).alias("r_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("r_ln"),
        F.round(F.exp("l_discount"), 6).alias("r_exp"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("r_pow"),
        F.abs(F.col("l_quantity") - 25).alias("r_abs"),
        F.floor(F.col("l_extendedprice") / 1000).alias("r_floor"),
        F.ceil(F.col("l_discount") * 100).alias("r_ceil"),
        F.round("l_extendedprice", 2).alias("r_round"),
    )


# ---------------------------------------------------------------------------
# F2 — Gaussian model evaluation in pure SQL (fitfuncs.gauss:
# f(x; A, mu, sigma) = A * exp(-(x-mu)^2 / (2 sigma^2))).
# ---------------------------------------------------------------------------
_GAUSS = "10.0 * EXP(-((l_quantity - 25.0) * (l_quantity - 25.0)) / (2.0 * 64.0))"


@query(
    "q_model_gauss",
    oracle=f"""
SELECT l_orderkey, l_linenumber, l_quantity AS x,
       ROUND({_GAUSS}, 6) AS g
FROM lineitem
WHERE l_orderkey <= 1500
""",
)
def q_model_gauss(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 1500)
    x = F.col("l_quantity")
    g = 10.0 * F.exp(-((x - 25.0) * (x - 25.0)) / (2.0 * 64.0))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        x.alias("x"),
        F.round(g, 6).alias("g"),
    )


# ---------------------------------------------------------------------------
# UD1 — the same Gaussian as a vectorized Arrow pandas UDF (fitfuncs
# model evaluation through the Python-worker path).
# ---------------------------------------------------------------------------
@pandas_udf(DoubleType())
def _gauss_udf(x: pd.Series) -> pd.Series:
    import numpy as np

    return pd.Series(10.0 * np.exp(-((x - 25.0) ** 2) / (2.0 * 64.0)))


@query(
    "q_model_gauss_udf",
    oracle=f"""
SELECT l_orderkey, l_linenumber,
       ROUND({_GAUSS}, 6) AS g_udf
FROM lineitem
WHERE l_orderkey <= 1500
""",
)
def q_model_gauss_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 1500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(_gauss_udf(F.col("l_quantity")), 6).alias("g_udf"),
    )


# ---------------------------------------------------------------------------
# F3 — string functions (scan-command / motor-name matching idioms).
# ---------------------------------------------------------------------------
@query(
    "q_string_funcs",
    oracle="""
SELECT p_partkey,
       UPPER(p_brand) AS u_brand,
       LOWER(p_type) AS l_type,
       SUBSTR(p_name, 1, 8) AS name8,
       LENGTH(p_name) AS name_len,
       TRIM(CONCAT(p_brand, ' ', p_type)) AS brand_type,
       CASE WHEN p_type LIKE '%BRASS%' THEN 1 ELSE 0 END AS is_brass,
       REPLACE(p_brand, '#', '_') AS brand_clean
FROM part
""",
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("u_brand"),
        F.lower("p_type").alias("l_type"),
        F.substring("p_name", 1, 8).alias("name8"),
        F.length("p_name").alias("name_len"),
        F.trim(F.concat(F.col("p_brand"), F.lit(" "), F.col("p_type"))).alias(
            "brand_type"
        ),
        F.when(F.col("p_type").like("%BRASS%"), 1).otherwise(0).alias("is_brass"),
        F.replace(F.col("p_brand"), F.lit("#"), F.lit("_")).alias("brand_clean"),
    )


# ---------------------------------------------------------------------------
# F4 — regexp extraction (`#S 12 ascan th 0 1 60 1` control-line parsing
# idiom, applied to o_orderpriority / p_type shapes).
# ---------------------------------------------------------------------------
@query(
    "q_regexp",
    oracle="""
SELECT o_orderkey,
       regexp_extract(o_orderpriority, '^([0-9]+)-([A-Z ]+)$', 1) AS prio_num,
       regexp_extract(o_orderpriority, '^([0-9]+)-([A-Z ]+)$', 2) AS prio_word,
       CASE WHEN regexp_matches(o_orderpriority, '^[12]-') THEN 1 ELSE 0 END AS is_high
FROM orders
WHERE o_orderkey <= 3000
""",
)
def q_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 3000)
    pat = r"^([0-9]+)-([A-Z ]+)$"
    return o.select(
        "o_orderkey",
        F.regexp_extract("o_orderpriority", pat, 1).alias("prio_num"),
        F.regexp_extract("o_orderpriority", pat, 2).alias("prio_word"),
        F.when(F.col("o_orderpriority").rlike(r"^[12]-"), 1)
        .otherwise(0)
        .alias("is_high"),
    )


# ---------------------------------------------------------------------------
# F5 — date/time functions (`#D` header parse; epoch columns).
# dayofweek is deliberately absent (engine-defined origin).
# ---------------------------------------------------------------------------
@query(
    "q_date_funcs",
    oracle="""
SELECT CAST(YEAR(o_orderdate) AS INT) AS y,
       CAST(MONTH(o_orderdate) AS INT) AS m,
       CAST(QUARTER(o_orderdate) AS INT) AS q,
       COUNT(*) AS n,
       MIN(CAST(o_orderdate AS DATE)) AS first_day,
       MAX(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')) AS max_days_to_2002
FROM orders
GROUP BY 1, 2, 3
""",
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
            F.quarter("o_orderdate").alias("q"),
        )
        .agg(
            F.count("*").alias("n"),
            F.min(F.col("o_orderdate").cast("date")).alias("first_day"),
            F.max(
                F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date"))
            ).alias("max_days_to_2002"),
        )
    )


# ---------------------------------------------------------------------------
# F6 — conditional expressions (mask-and-replace idioms).
# ---------------------------------------------------------------------------
@query(
    "q_case_when",
    oracle="""
SELECT CASE WHEN l_quantity < 10 THEN 'low'
            WHEN l_quantity < 30 THEN 'mid'
            ELSE 'high' END AS qty_band,
       CASE WHEN l_discount = 0 THEN 'none' ELSE 'some' END AS disc_band,
       COUNT(*) AS n,
       CAST(SUM(CAST(COALESCE(NULLIF(l_tax, 0.0), -1.0) AS DECIMAL(18,6))) AS DOUBLE) AS sum_tax_guarded
FROM lineitem
GROUP BY 1, 2
""",
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    qty_band = (
        F.when(F.col("l_quantity") < 10, "low")
        .when(F.col("l_quantity") < 30, "mid")
        .otherwise("high")
    )
    disc_band = F.when(F.col("l_discount") == 0, "none").otherwise("some")
    guarded = F.coalesce(F.nullif(F.col("l_tax"), F.lit(0.0)), F.lit(-1.0))
    return (
        li.groupBy(qty_band.alias("qty_band"), disc_band.alias("disc_band"))
        .agg(
            F.count("*").alias("n"),
            dsum(guarded, "sum_tax_guarded"),
        )
    )


# ---------------------------------------------------------------------------
# A10 — approximate count-distinct (HLL).  Approximate => never
# hash-compared; declared rows-only (driver records rows+schema).
# ---------------------------------------------------------------------------
@query("q_approx_distinct")
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
    )


# ---------------------------------------------------------------------------
# UD3 — the grouped-agg pandas UDAF surface under the oracle gate (r8).
# Float UDAF reducers stay unit-only by design (reduction order inside
# a group is engine-defined), but an EXACT reducer — per-element
# micro-unit quantization then an int64 sum — is order-independent, so
# the Arrow GROUPED_AGG mechanism itself (group transport, null
# handling, the long return path) becomes driver-checkable.  The
# oracle states the same quantized sum in plain SQL.
# ---------------------------------------------------------------------------
@query(
    "q_udaf_micro_sum",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(ROUND(l_extendedprice * 1e6) AS BIGINT)) AS BIGINT)
         AS price_micro,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q_udaf_micro_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.functions.udaf import exact_micro_sum

    li = table(spark, sf_dir, "lineitem")
    # Spark refuses to mix GROUPED_AGG pandas UDFs with built-in
    # aggregates in one agg() — the row count rides as a second UDAF
    return (
        li.groupBy("l_returnflag")
        .agg(
            exact_micro_sum(F.col("l_extendedprice").cast("double")).alias(
                "price_micro"
            ),
            exact_micro_sum(F.lit(1.0)).alias("n_micro"),
        )
        .select(
            "l_returnflag",
            "price_micro",
            (F.col("n_micro") / F.lit(1_000_000)).cast("long").alias("n"),
        )
        .orderBy("l_returnflag")
    )
