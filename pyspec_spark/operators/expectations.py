"""Data-quality contracts — "unit tests for data" in one pass.

Reference loci (SURVEY.md §0 policy): absent from `stuwilkins/pyspec`
[H] — north-star: the production pattern of Deequ (Schelter et al.,
VLDB 2018) and dbt tests, re-expressed as plain aggregates.  A corpus
or warehouse pipeline gates every landing on a CONTRACT: completeness,
range/set membership, key uniqueness, referential integrity — and the
report must come from exact counts, not samples.

Scale shape (the whole point of the design):
- every ROW-LEVEL check is one SUM(CASE WHEN …) expression, so N
  checks share ONE aggregation pass over ONE scan (map-side partial
  aggregation; adding a check adds an expression, never a pass);
- key uniqueness rides the SAME pass as COUNT(DISTINCT keys);
- referential integrity is the only extra job: one LEFT ANTI join
  against the parent keys, reduced to one number;
- the report assembles driver-free: the 1-row count frame explodes
  into (check, metric, threshold, ok) rows in-plan.

Metrics are pass-fractions ROUND(ok/total, 6) — exact integer counts
under one terminal division, the repo's determinism rule — and an
empty table passes vacuously (the Deequ convention)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def run_contract(
    df: DataFrame,
    row_checks: list[tuple[str, Column, float]],
    unique_key: tuple[str, list[str], float] | None = None,
    referential: tuple[str, DataFrame, Column, float] | None = None,
) -> DataFrame:
    """Evaluate a contract against ``df``.

    ``row_checks``: (name, predicate, min_pass_fraction) — predicate
    is any boolean Column over df's row.
    ``unique_key``: (name, key_cols, min_distinct_fraction).
    ``referential``: (name, parent_df, join_condition,
    min_child_with_parent_fraction); parent_df should be the parent
    KEY table (projected — it is scanned once).

    Returns (check, metric, threshold, ok), one row per check, in
    declaration order (stable output for oracles and reports)."""
    aggs = [F.count(F.lit(1)).alias("_total")]
    for i, (_, pred, _) in enumerate(row_checks):
        aggs.append(
            F.sum(F.when(pred, 1).otherwise(0)).alias(f"_c{i}")
        )
    if unique_key is not None:
        # countDistinct over a STRUCT, not bare columns: SQL
        # COUNT(DISTINCT a, b) skips any tuple containing a NULL,
        # which both diverges from DuckDB's COUNT(DISTINCT (a, b))
        # (a struct with a null field is itself non-null) and is the
        # wrong uniqueness semantics for a contract — a null key that
        # appears twice IS a duplicate (the Deequ convention).
        aggs.append(
            F.countDistinct(F.struct(*unique_key[1])).alias("_uniq")
        )
    counts = df.agg(*aggs)
    if referential is not None:
        _, parent, cond, _ = referential
        orphans = (
            df.join(parent, cond, "left_anti")
            .agg(F.count(F.lit(1)).alias("_orphans"))
        )
        counts = counts.crossJoin(F.broadcast(orphans))

    def frac(num: Column) -> Column:
        # empty table -> vacuous pass (the Deequ convention); the
        # branch, not coalesce — ANSI mode (Spark 4 default) makes
        # x/0 an ERROR, not a null
        return F.when(F.col("_total") == 0, F.lit(1.0)).otherwise(
            F.round(num.cast("double") / F.col("_total"), 6)
        )

    entries = []
    for i, (name, _, thr) in enumerate(row_checks):
        entries.append((name, frac(F.col(f"_c{i}")), thr))
    if unique_key is not None:
        entries.append((unique_key[0], frac(F.col("_uniq")), unique_key[2]))
    if referential is not None:
        entries.append(
            (
                referential[0],
                frac(F.col("_total") - F.col("_orphans")),
                referential[3],
            )
        )
    report = F.array(
        *[
            F.struct(
                F.lit(name).alias("check"),
                metric.alias("metric"),
                F.lit(float(thr)).alias("threshold"),
            )
            for name, metric, thr in entries
        ]
    )
    return (
        counts.select(F.explode(report).alias("r"))
        .select("r.check", "r.metric", "r.threshold")
        .withColumn("ok", F.col("metric") >= F.col("threshold"))
    )


def violation_flags(row_checks: list[tuple[str, Column]]) -> Column:
    """The single definition of the routing expression: an array of the
    names of every FAILED check, declaration order, NULL-predicate-is-
    a-violation (COALESCE(pred, FALSE) — a check that cannot evaluate
    must never pass the row).  enforce_contract routes on it; callers
    that only need the combination (the q_contract_enforce scorecard)
    use it directly in one map-only pass."""
    return F.array_compact(
        F.array(
            *[
                F.when(~F.coalesce(pred, F.lit(False)), F.lit(name))
                for name, pred in row_checks
            ]
        )
    )


def enforce_contract(
    df: DataFrame,
    row_checks: list[tuple[str, Column]],
) -> tuple[DataFrame, DataFrame]:
    """Row-level contract ENFORCEMENT (r10 — the DLT-expectations /
    dbt-store-failures shape, the routing complement to
    :func:`run_contract`'s aggregate scorecard): returns
    ``(passed, quarantine)`` where quarantine rows carry a
    ``violations`` array naming every failed check in declaration
    order.

    Null semantics are the strict side, deliberately: a predicate that
    evaluates to NULL (a comparison against a NULL field) IS a
    violation — a check that cannot evaluate must never pass the row.
    (``run_contract`` counts the same way: SUM(CASE WHEN p THEN 1)
    treats NULL as fail.)

    Scale shape: ONE map-only projection computes every flag; both
    returned frames filter the same flagged plan (no shuffle, no
    second scan of a materialized upstream; adding a check adds an
    expression).  Route quarantine to a lake/stream sink and the
    landing stays a single pass — the q_jsonl_roundtrip quarantine
    discipline applied to SEMANTIC violations instead of parse
    failures."""
    if "violations" in df.columns:
        raise ValueError(
            "enforce_contract: input already has a 'violations' column "
            "— re-validating quarantined rows requires dropping or "
            "renaming it first (silently shadowing it would lose the "
            "original routing record)"
        )
    flagged = df.select("*", violation_flags(row_checks).alias("violations"))
    passed = flagged.where(F.size("violations") == 0).drop("violations")
    quarantine = flagged.where(F.size("violations") > 0)
    return passed, quarantine


def contract_sink(
    pass_root: str,
    quarantine_root: str,
    row_checks: list[tuple[str, Column]],
    partition_col: str | None = None,
    query_name: str = "contract_enforce",
):
    """The STREAMING face of enforce_contract — validate-on-ingest:
    build the function for ``writeStream.foreachBatch`` so every
    micro-batch routes exactly-once into TWO lakes — clean rows to
    ``pass_root``, violating rows (with their ``violations`` array) to
    ``quarantine_root`` — the q_jsonl_roundtrip quarantine discipline
    applied to SEMANTIC violations instead of parse failures.

    Each lake carries its own (query_name, batch_id) watermark, so a
    redelivered batch after a kill-and-restart is skipped per lake
    independently: if the crash landed between the two commits, the
    redelivery completes exactly the missing one (both sinks are
    append-only, so per-lake idempotence composes).  The batch is
    persisted across the two writes — the flag projection runs once,
    not once per sink."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from pyspec_spark.lake import lake_append_stream

        spark = batch_df.sparkSession
        batch_df = batch_df.persist()
        try:
            passed, quar = enforce_contract(batch_df, row_checks)
            lake_append_stream(
                spark, pass_root, passed, partition_col, query_name,
                int(batch_id),
            )
            lake_append_stream(
                spark, quarantine_root, quar, partition_col, query_name,
                int(batch_id),
            )
        finally:
            batch_df.unpersist()

    return _sink
