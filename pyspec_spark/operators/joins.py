"""Join strategies Spark lacks as primitives — SURVEY.md §2.3 J8/J9 and
§4.3's bucket-and-overlap rewrite.

`range_join_bucketed` — interval (theta) joins naively become
BroadcastNestedLoopJoin (O(n*m) compares; fine for tiny range sides,
fatal at scale).  The rewrite adds an equi-join key: ranges explode into
the fixed-width buckets they overlap, facts key to the single bucket
containing their value, the join runs as a hash/sort-merge equi-join on
`bucket`, and the original predicate re-applies as a post-filter.  Exact
(each fact value lies in exactly one bucket, so no dedup is needed) and
shuffle-partitioned by bucket — the 100 TB plan.

`asof_join` — nearest-earlier match per key (J8) via the union+window
trick: tag both sides, union by key/time, per-key ordered window carries
the last-seen left-side payload forward (`last(..., ignorenulls)` over
rows UNBOUNDED PRECEDING..CURRENT), keep right-side rows.  One shuffle
on (key), no range explosion; ties at equal timestamps resolve
left-side-first so `<=` semantics match DuckDB's ASOF JOIN.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join_bucketed(
    facts: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 1000.0,
    how: str = "inner",
) -> DataFrame:
    """Join facts to [lo, hi) intervals via the bucket rewrite.

    ``ranges`` columns are preserved; interval semantics are
    lo <= value < hi.  ``how`` may be ``inner`` or ``left`` (facts
    preserved).  Range-preserving joins (right/outer) are rejected: the
    range side is exploded per overlapped bucket, so null-extension
    would duplicate unmatched ranges once per bucket.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"range_join_bucketed supports how='inner'|'left', got {how!r}"
        )
    b_lo = F.floor(F.col(lo_col) / bucket_width).cast("long")
    b_hi = F.floor((F.col(hi_col) - 1e-9) / bucket_width).cast("long")
    exploded = ranges.withColumn(
        "bucket", F.explode(F.sequence(b_lo, b_hi))
    )
    keyed = facts.withColumn(
        "bucket", F.floor(F.col(value_col) / bucket_width).cast("long")
    )
    in_interval = (F.col(value_col) >= F.col(lo_col)) & (
        F.col(value_col) < F.col(hi_col)
    )
    if how == "inner":
        # post-join .where lets Catalyst push the residual into the join
        joined = keyed.join(exploded, "bucket", "inner").where(in_interval)
    else:
        # for facts-preserving joins the interval predicate must live in the
        # join condition — a post-join filter would drop null-extended rows
        cond = (keyed["bucket"] == exploded["bucket"]) & in_interval
        joined = keyed.join(exploded, cond, "left").drop(exploded["bucket"])
    return joined.drop("bucket")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    right_id: str | None = None,
) -> DataFrame:
    """For each right row, attach the latest left row (same `key`,
    left_ts <= right_ts).  `payload` = left columns to carry.  Output =
    right columns + payload (null when no earlier left row exists).

    `right_id` should name a unique right-side column (used to rebind
    the carried payload to full right rows); without one a
    monotonically-increasing id is generated, which relies on the right
    plan producing a stable partition layout across the two subtrees —
    fine for parquet scans, not for nondeterministic sources.

    Ties within the left side at one (key, ts) must be pre-deduped by
    the caller — engines disagree on arbitrary-tie picks, so determinism
    rule (c) (SURVEY.md §5.3) applies.
    """
    from pyspark.sql import Window

    lt = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*payload).alias("_pay"),
        F.lit(None).cast("long").alias("_rid"),
    )
    rcols = right.columns
    if right_id is not None:
        rt = right.withColumn("_rid", F.col(right_id).cast("long"))
    else:
        rt = right.withColumn("_rid", F.monotonically_increasing_id())
    ru = rt.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(lt.schema["_pay"].dataType).alias("_pay"),
        "_rid",
    )
    u = lt.unionByName(ru)
    # one window pass: left rows sort before right rows at equal ts (<=);
    # right rows all carry null _pay so their mutual order is immaterial
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("_last_pay", F.last("_pay", ignorenulls=True).over(w))
    matched = carried.where(F.col("_side") == 1).select("_rid", "_last_pay")
    res = rt.join(matched, "_rid")
    keep = [F.col(c) for c in rcols] + [
        F.col("_last_pay").getField(p).alias(p) for p in payload
    ]
    return res.select(*keep)


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    dim_key: str | None = None,
    n_salts: int = 16,
    how: str = "inner",
    salt: Column | None = None,
) -> DataFrame:
    """Skew-resistant shuffle equi-join (the manual fallback when AQE's
    skew-join splitting can't apply, e.g. under a required distribution).

    A handful of hot keys (one Bragg peak's scan_number; one power-user's
    user_id) sends every hot row to a single reducer in a plain shuffle
    join.  Salting spreads them: the fact side gains
    ``_salt in [0, n_salts)`` (derived from non-key data, NOT the join
    key — same-key rows must scatter), the dim side is exploded
    ``n_salts``-fold with every salt value, and the join runs on
    ``(key, _salt)``.  Exact for inner/left joins: each fact row still
    matches exactly the dim rows its key matches, once.

    Cost model: dim side inflates n_salts-fold — use for skewed
    fact⨝small-dim joins (the common case), never dim⨝dim.  ``n_salts``
    should be ~the reducer-count you want the hottest key spread over.
    """
    dim_key = dim_key or key
    if salt is None:
        salt = F.floor(F.rand(seed=42) * n_salts).cast("int")
    f = facts.withColumn("_salt", salt)
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    joined = f.join(
        d, (f[key] == d[dim_key]) & (f["_salt"] == d["_salt"]), how
    )
    return joined.drop("_salt")
