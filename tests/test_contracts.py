"""Data-quality contracts (operators/expectations.py, V1): planted
violations detected exactly, vacuous pass on empty input, and the
one-aggregation-pass scale shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspec_spark.operators.expectations import run_contract


def _report(df, **kw):
    rows = run_contract(df, **kw).collect()
    return {r["check"]: (r["metric"], r["ok"]) for r in rows}


def test_planted_violations_reported_exactly(spark):
    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 1, 20.0), (2, 1, -5.0), (None, 2, 30.0)],
        "k BIGINT, sub BIGINT, v DOUBLE",
    )
    parent = spark.createDataFrame([(1,)], "pk BIGINT")
    got = _report(
        df,
        row_checks=[
            ("k_complete", F.col("k").isNotNull(), 1.0),
            ("v_nonneg", F.col("v") >= 0, 1.0),
            ("v_nonneg_75pct", F.col("v") >= 0, 0.75),
        ],
        unique_key=("k_sub_unique", ["k", "sub"], 1.0),
        referential=(
            "k_in_parent", parent, F.col("k") == F.col("pk"), 1.0
        ),
    )
    assert got["k_complete"] == (0.75, False)
    assert got["v_nonneg"] == (0.75, False)
    assert got["v_nonneg_75pct"] == (0.75, True)  # threshold honored
    # 4 rows, distinct (k, sub) STRUCTS = {(1,1),(2,1),(NULL,2)} ->
    # 0.75 — the null key counts as a value (DuckDB/Deequ semantics;
    # bare countDistinct(a, b) would skip the NULL tuple and report
    # 0.5, silently diverging from the oracle)
    assert got["k_sub_unique"] == (0.75, False)
    # orphans: k=2 and k=NULL rows fail the anti-join -> 2/4 pass
    assert got["k_in_parent"] == (0.5, False)


def test_empty_table_passes_vacuously(spark):
    df = spark.createDataFrame([], "k BIGINT, v DOUBLE")
    got = _report(
        df,
        row_checks=[("v_pos", F.col("v") > 0, 1.0)],
        unique_key=("k_unique", ["k"], 1.0),
    )
    assert got == {"v_pos": (1.0, True), "k_unique": (1.0, True)}


def test_row_checks_share_one_aggregation_pass(spark):
    """Adding row checks must add EXPRESSIONS, not passes: the plan
    with 6 row checks has the same exchange count and the same single
    scan as the plan with 1."""
    from pyspec_spark.plans import count_exchanges, physical_plan

    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )

    def plan_for(n_checks):
        checks = [
            (f"c{i}", F.col("v") >= i, 1.0) for i in range(n_checks)
        ]
        return physical_plan(run_contract(df, row_checks=checks))

    p1, p6 = plan_for(1), plan_for(6)
    assert count_exchanges(p1) == count_exchanges(p6)
    assert p6.count("Scan") == p1.count("Scan")
