"""Physical-plan inspection helpers.

The scale contract of this engine is enforced, not hoped for: tests
assert that filters reach the parquet scan, projections prune the read
schema, small dims broadcast, top-k compiles to TakeOrderedAndProject,
and aggregations are partial->final with a single exchange.  These
helpers parse `.explain`-style plan text so those assertions are
one-liners (see tests/test_plan_quality.py).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, executed: bool = False) -> str:
    """The formatted physical plan (pre-AQE), or the final executed plan
    (post-AQE; runs the query) when ``executed=True``."""
    qe = df._jdf.queryExecution()  # noqa: SLF001
    if executed:
        df.collect()
        return qe.executedPlan().toString()
    jvm = df.sparkSession._jvm  # noqa: SLF001
    return jvm.PythonSQLUtils.explainString(qe, "formatted")


def simple_plan(df: DataFrame) -> str:
    """The simple-mode plan string, where whole-stage-codegen spans are
    marked with ``*(n)`` stage stars."""
    qe = df._jdf.queryExecution()  # noqa: SLF001
    jvm = df.sparkSession._jvm  # noqa: SLF001
    return jvm.PythonSQLUtils.explainString(qe, "simple")


def pushed_filters(plan: str) -> list[str]:
    """Filter names pushed into a parquet scan (PushedFilters: [...])."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out.extend(p.strip() for p in m.group(1).split(",") if p.strip())
    return out


def read_schemas(plan: str) -> list[list[str]]:
    """Column lists read from each parquet scan (ReadSchema pruning)."""
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def count_exchanges(plan: str) -> int:
    """Shuffle boundaries in the plan.  Handles both tree-style plans
    ("Exchange hashpartitioning(...)") and formatted-mode plans, where
    the operator header is "(5) Exchange" with arguments on a later
    line.  Broadcast exchanges are NOT counted (they're not shuffles)."""
    n = len(re.findall(r"\(\d+\) Exchange\b", plan))
    if n:
        return n
    return len(re.findall(r"\bExchange (?:hash|range|Single)", plan))


def has_broadcast_join(plan: str) -> bool:
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def has_sort_merge_join(plan: str) -> bool:
    return "SortMergeJoin" in plan


def has_take_ordered(plan: str) -> bool:
    return "TakeOrderedAndProject" in plan


def has_partial_aggregate(plan: str) -> bool:
    """Partial->final hash aggregation (map-side combine)."""
    return bool(re.search(r"partial_(?:sum|count|avg|min|max)", plan))


def wholestage_codegen_spans(plan: str) -> int:
    """Number of whole-stage-codegen regions (wider = fewer = better)."""
    ids = set(re.findall(r"\*\((\d+)\)", plan))
    return len(ids)
