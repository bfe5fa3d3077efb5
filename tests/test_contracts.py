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


def test_enforce_contract_routes_rows_exactly(spark):
    """V1b enforcement: every row lands on exactly one side; quarantine
    names EVERY failed check in declaration order; a NULL predicate is
    a violation (a check that cannot evaluate must never pass the
    row); and the routing plan is map-only (no exchange — enforcement
    must not cost a shuffle at any scale)."""
    from pyspec_spark.operators.expectations import enforce_contract
    from pyspec_spark.plans import count_exchanges, physical_plan

    df = spark.createDataFrame(
        [
            (1, 10.0, "a"),     # clean
            (2, -1.0, "a"),     # fails v_nonneg
            (3, -2.0, "zz"),    # fails v_nonneg AND tag_known
            (4, None, "a"),     # NULL v -> v_nonneg is a violation
            (None, 5.0, "a"),   # fails k_complete
        ],
        "k BIGINT, v DOUBLE, tag STRING",
    )
    checks = [
        ("k_complete", F.col("k").isNotNull()),
        ("v_nonneg", F.col("v") >= 0),
        ("tag_known", F.col("tag").isin("a", "b")),
    ]
    passed, quar = enforce_contract(df, checks)

    assert {r["k"] for r in passed.collect()} == {1}
    got = {r["k"]: list(r["violations"]) for r in quar.collect()}
    assert got == {
        2: ["v_nonneg"],
        3: ["v_nonneg", "tag_known"],  # declaration order
        4: ["v_nonneg"],
        None: ["k_complete"],
    }
    # both sides partition the input: no row lost, none duplicated
    assert passed.count() + quar.count() == df.count()
    # map-only: enforcement adds expressions, never a shuffle
    assert count_exchanges(physical_plan(quar)) == 0
    assert count_exchanges(physical_plan(passed)) == 0


def test_enforce_contract_empty_and_all_pass(spark):
    """Empty input routes to two empty frames; an all-clean corpus
    quarantines nothing and preserves the input schema on the passed
    side (the violations column must not leak through)."""
    from pyspec_spark.operators.expectations import enforce_contract

    empty = spark.createDataFrame([], "k BIGINT, v DOUBLE")
    p, q = enforce_contract(empty, [("v_nonneg", F.col("v") >= 0)])
    assert p.count() == 0 and q.count() == 0

    clean = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k BIGINT, v DOUBLE")
    p, q = enforce_contract(clean, [("v_nonneg", F.col("v") >= 0)])
    assert q.count() == 0
    assert p.columns == clean.columns
    assert p.count() == 2


def test_enforce_contract_rejects_violations_column_loudly(spark):
    """Re-validating rows read back from a quarantine lake is a natural
    remediation flow — the operator must fail with a CLEAR error (drop
    or rename first), never an ambiguous-reference crash or a silent
    shadow of the original routing record."""
    import pytest

    from pyspec_spark.operators.expectations import enforce_contract

    df = spark.createDataFrame(
        [(1, ["old"])], "k BIGINT, violations ARRAY<STRING>"
    )
    with pytest.raises(ValueError, match="violations"):
        enforce_contract(df, [("k_pos", F.col("k") > 0)])
