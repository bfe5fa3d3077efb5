"""Data-quality contract under the oracle gate (V1 — the Deequ/dbt
"unit tests for data" pattern; operators/expectations.py).

One contract over the lineitem/orders pair with every check class:
completeness, bound and set-membership row checks, composite-key
uniqueness, and child→parent referential integrity.  Deliberately a
MIXED scorecard on the real testdata: (l_orderkey, l_linenumber) is
NOT unique here and l_tax exceeds 0.05 on ~31% of rows — the contract
must REPORT failures exactly, not just bless clean data.  The oracle
recomputes every metric as plain SQL; fractions are exact integer
counts under one terminal ROUND(·, 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspec_spark.registry import query
from pyspec_spark.tables import table

_CONTRACT_ORACLE = """
WITH t AS (
  SELECT COUNT(*) AS total,
    SUM(CASE WHEN l_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS c0,
    SUM(CASE WHEN l_tax <= 0.05 THEN 1 ELSE 0 END) AS c1,
    SUM(CASE WHEN l_discount BETWEEN 0.0 AND 0.1 THEN 1 ELSE 0 END) AS c2,
    SUM(CASE WHEN l_returnflag IN ('A', 'N', 'R') THEN 1 ELSE 0 END) AS c3,
    SUM(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 1 ELSE 0 END) AS c4,
    COUNT(DISTINCT (l_orderkey, l_linenumber)) AS uq
  FROM lineitem
),
orph AS (
  SELECT COUNT(*) AS orphans
  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderkey IS NULL
),
rep AS (
  SELECT 'completeness_l_orderkey' AS chk,
         ROUND(c0 / CAST(total AS DOUBLE), 6) AS metric,
         1.0 AS threshold FROM t
  UNION ALL SELECT 'tax_le_5pct',
         ROUND(c1 / CAST(total AS DOUBLE), 6), 1.0 FROM t
  UNION ALL SELECT 'discount_in_0_10pct',
         ROUND(c2 / CAST(total AS DOUBLE), 6), 1.0 FROM t
  UNION ALL SELECT 'returnflag_accepted',
         ROUND(c3 / CAST(total AS DOUBLE), 6), 1.0 FROM t
  UNION ALL SELECT 'quantity_in_1_50',
         ROUND(c4 / CAST(total AS DOUBLE), 6), 1.0 FROM t
  UNION ALL SELECT 'unique_order_line',
         ROUND(uq / CAST(total AS DOUBLE), 6), 1.0 FROM t
  UNION ALL SELECT 'orders_referential',
         ROUND((t.total - orph.orphans) / CAST(t.total AS DOUBLE), 6), 1.0
         FROM t, orph
)
SELECT chk, metric, threshold, metric >= threshold AS ok
FROM rep
ORDER BY chk
"""


@query("q_data_contract", oracle=_CONTRACT_ORACLE)
def q_data_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.expectations import run_contract

    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").select("o_orderkey")
    report = run_contract(
        li,
        row_checks=[
            ("completeness_l_orderkey", F.col("l_orderkey").isNotNull(), 1.0),
            ("tax_le_5pct", F.col("l_tax") <= 0.05, 1.0),
            (
                "discount_in_0_10pct",
                F.col("l_discount").between(0.0, 0.1),
                1.0,
            ),
            (
                "returnflag_accepted",
                F.col("l_returnflag").isin("A", "N", "R"),
                1.0,
            ),
            ("quantity_in_1_50", F.col("l_quantity").between(1, 50), 1.0),
        ],
        unique_key=("unique_order_line", ["l_orderkey", "l_linenumber"], 1.0),
        referential=(
            "orders_referential",
            orders,
            F.col("l_orderkey") == F.col("o_orderkey"),
            1.0,
        ),
    )
    return report.select(
        F.col("check").alias("chk"), "metric", "threshold", "ok"
    ).orderBy("chk")


# ---------------------------------------------------------------------------
# V1b — row-level contract ENFORCEMENT under the oracle gate (r10):
# run_contract reports fractions; enforce_contract ROUTES — every row
# either passes all checks or lands in quarantine carrying the exact
# list of checks it failed (the DLT expect_or_drop / dbt
# store-failures shape).  The query reduces the routed corpus to the
# failure-mode scorecard: one row per violation COMBINATION (comma-
# joined in declaration order) with its row count, plus the passed
# rows under the empty-string combination — bounded by 2^|checks|
# regardless of corpus size (all 16 combinations genuinely occur on
# the testdata — the thresholds are picked to exercise every routing
# path), so the full routing decision of every
# row is hash-pinned without shipping the corpus.
#
# Null discipline (the semantics worth pinning cross-engine): a check
# predicate that evaluates to NULL is a VIOLATION.  The oracle spells
# that as COALESCE(pred, FALSE) per check; Spark's side is the same
# coalesce inside enforce_contract.
# ---------------------------------------------------------------------------
_ENFORCE_ORACLE = """
WITH flagged AS (
  SELECT CONCAT_WS(',',
    CASE WHEN NOT COALESCE(l_tax <= 0.05, FALSE) THEN 'tax_le_5pct' END,
    CASE WHEN NOT COALESCE(l_discount BETWEEN 0.0 AND 0.05, FALSE)
         THEN 'discount_le_5pct' END,
    CASE WHEN NOT COALESCE(l_quantity BETWEEN 1 AND 30, FALSE)
         THEN 'quantity_in_1_30' END,
    CASE WHEN NOT COALESCE(l_extendedprice >= l_quantity * 1000, FALSE)
         THEN 'unit_price_ge_1000' END
  ) AS violations
  FROM lineitem
)
SELECT violations, CAST(COUNT(*) AS BIGINT) AS n
FROM flagged
GROUP BY violations
ORDER BY violations
"""


@query("q_contract_enforce", oracle=_ENFORCE_ORACLE)
def q_contract_enforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.expectations import violation_flags

    li = table(spark, sf_dir, "lineitem")
    checks = [
        ("tax_le_5pct", F.col("l_tax") <= 0.05),
        ("discount_le_5pct", F.col("l_discount").between(0.0, 0.05)),
        ("quantity_in_1_30", F.col("l_quantity").between(1, 30)),
        (
            "unit_price_ge_1000",
            F.col("l_extendedprice") >= F.col("l_quantity") * 1000,
        ),
    ]
    # ONE scan: concat_ws of an EMPTY violations array is already ''
    # — exactly the passed-rows encoding — so the scorecard groups the
    # shared routing expression (violation_flags, the same definition
    # enforce_contract routes on) directly, instead of unioning the
    # passed and quarantine frames and scanning lineitem twice
    return (
        li.select(
            F.concat_ws(",", violation_flags(checks)).alias("violations")
        )
        .groupBy("violations")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("violations")
    )
