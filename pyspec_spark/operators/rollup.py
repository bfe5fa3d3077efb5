"""Cascading time rollup (continuous-aggregate / hypertable pattern).

Multi-resolution event summaries where each coarser level derives from
the next finer one by MERGING partial aggregates — never rescanning the
raw table.  At 100 TB this is the difference between one O(raw) pass
that feeds every resolution and k independent O(raw) scans: the minute
level reads events once; hour merges ~60x fewer rows; day merges ~24x
fewer again.  The same shape backs a streaming deployment: the finest
level is a watermarked tumbling aggregation (`streaming/events.py`) and
coarser levels run over its sink.

Only mergeable statistics are carried (count, exact fixed-point sum,
min, max); means/rates derive at read time.  Sums are held as exact
micro-unit longs (``functions/determinism._fixed6``) so merge order —
which differs between cascade levels, partitions, and engines — can
never change a result.

Reference: the pyspec analog is re-binning an already-binned scan onto a
coarser grid (`pyspec/ccd/transformations.py` get1DSum/rebin utilities
[M] — SURVEY.md §2 A3/A5: re-aggregation of aggregated output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspec_spark.functions.determinism import _fixed6_sql

#: supported resolutions, finest-to-coarsest, as date_trunc units
LEVELS = ("minute", "hour", "day", "week", "month")


def rollup_cascade(
    events: DataFrame,
    ts_col: str,
    keys: list[str],
    value_col: str,
    levels: tuple[str, ...] = ("minute", "hour", "day"),
) -> dict[str, DataFrame]:
    """Build the cascade; returns {level: DataFrame} with columns
    ``bucket, *keys, n, sum_micro, min_v, max_v``.

    ``sum_micro`` is the exact micro-unit long sum — convert with
    :func:`finalize` when presenting.  Each level's plan reads the
    previous level, so materializing one level (cache/write) also
    short-circuits every coarser one.
    """
    for lv in levels:
        if lv not in LEVELS:
            raise ValueError(f"unknown level {lv!r}; expected one of {LEVELS}")
    if "week" in levels and levels[0] == "week" and len(levels) > 1:
        raise ValueError(
            "'week' cannot be the finest level of a multi-level cascade: "
            "week buckets straddle month boundaries, so no coarser level "
            "can be derived from them"
        )

    out: dict[str, DataFrame] = {}
    finest = levels[0]
    # r13 (second pass): trunc key + aggregates as parsed SQL (1:1
    # transliteration; _fixed6 == _fixed6_sql)
    cur = (
        events.groupBy(
            F.expr(f"date_trunc('{finest}', {ts_col})").alias("bucket"),
            *keys,
        ).agg(
            F.count("*").alias("n"),
            F.expr(f"SUM({_fixed6_sql(value_col)})").alias("sum_micro"),
            F.expr(f"MIN({value_col})").alias("min_v"),
            F.expr(f"MAX({value_col})").alias("max_v"),
        )
    )
    out[finest] = cur
    # 'week' is a terminal branch: ISO weeks straddle month boundaries, so
    # date_trunc('month', week_bucket) would assign a straddling week's whole
    # totals to one month.  Coarser levels always merge from the last
    # non-week level instead of from week.
    for lv in levels[1:]:
        out[lv] = merge_level(cur, lv, keys)
        if lv != "week":
            cur = out[lv]
    return out


def merge_level(finer: DataFrame, level: str, keys: list[str]) -> DataFrame:
    """One cascade step: merge a finer level's mergeable partials
    (``bucket, *keys, n, sum_micro, min_v, max_v``) up to ``level``.
    Works identically over a batch cascade level or the sink of the
    streaming finest level (`streaming/events.py` rollup_minute)."""
    return (
        finer.groupBy(
            F.expr(f"date_trunc('{level}', bucket)").alias("bucket"), *keys
        )
        .agg(
            F.expr("SUM(n)").alias("n"),
            F.expr("SUM(sum_micro)").alias("sum_micro"),
            F.expr("MIN(min_v)").alias("min_v"),
            F.expr("MAX(max_v)").alias("max_v"),
        )
    )


def finalize(
    level_df: DataFrame, keys: list[str], extra: tuple[str, ...] = ()
) -> DataFrame:
    """Present a cascade level: exact sum and 6-dp mean from the merged
    micro-unit accumulator.  ``extra`` names already-derived columns to
    carry through (read_rollup's n_distinct)."""
    return level_df.selectExpr(
        "bucket",
        *keys,
        "n",
        "(CAST(sum_micro AS DOUBLE) / 1E6) AS sum_v",
        "round(CAST(sum_micro AS DOUBLE) / 1E6 / n, 6) AS mean_v",
        "min_v",
        "max_v",
        *extra,
    )


# ---------------------------------------------------------------------------
# Incremental rollup maintenance (r10, ST8b) — the CONTINUOUS-AGGREGATE
# lifecycle for the cascade above: a maintained rollup table that new
# event deltas merge into without ever rescanning history (the
# TimescaleDB continuous-aggregate / materialized-view-maintenance
# shape, and the aggregate twin of append_term_index's index story).
# Correctness rests on the same mergeability contract the cascade
# uses: only (n, sum_micro, min_v, max_v) are stored, all exact and
# order-free, so base ⊕ delta must equal a from-scratch rebuild to the
# last bit — which is exactly what q_rollup_incremental's oracle pins.
# ---------------------------------------------------------------------------
_RK_SEP = "\x1f"
_PB_FMT = "yyyy-MM-dd HH:mm:ss"


_NULL_MARK = "\x00"  # null-component sentinel inside rk (a data column)
# the null-bucket PARTITION value must be filesystem-safe (it becomes a
# hive directory name; a NUL byte breaks mkdir) and unreachable by
# date_format, which never emits the literal string "null"
_NULL_BUCKET = "null"


def _rollup_partial(delta: DataFrame, ts_col: str, keys: list[str],
                    value_col: str, level: str,
                    distinct_col: str | None = None,
                    quantile_col: str | None = None) -> DataFrame:
    """Aggregate a delta to mergeable partials + the lake's key/partition
    columns: rk (opaque composite of bucket+keys) and pb (bucket string,
    the partition value — one lake partition per bucket, so maintenance
    rewrites only the buckets the delta touches).

    Both pb and every rk component are NULL-SAFE via the \\x00 sentinel:
    concat_ws silently SKIPS nulls, which would collide distinct key
    tuples like (NULL, 'x') and ('x', NULL) into one rk (a double-
    counting merge bug), and a NULL pb would defeat the partition
    equality scan (NULL = NULL is never true).  Residual assumption,
    deliberate and documented: key VALUES containing the \\x1f
    separator or a leading \\x00 can still collide — control bytes in
    group keys are outside this operator's contract."""
    b = F.date_trunc(level, F.col(ts_col))
    nn = lambda c: F.coalesce(c.cast("string"), F.lit(_NULL_MARK))  # noqa: E731
    aggs = [
        F.count("*").alias("n"),
        F.expr(f"SUM({_fixed6_sql(value_col)})").alias("sum_micro"),
        F.expr(f"MIN({value_col})").alias("min_v"),
        F.expr(f"MAX({value_col})").alias("max_v"),
    ]
    if distinct_col is not None:
        # mergeable distinct sketch (Datasketches HLL): registers are
        # MAX-merged, so base ⊕ delta estimates equal a from-scratch
        # sketch — the incremental-DAU statistic a naive COUNT(DISTINCT)
        # rollup cannot maintain (distinct is not sum-mergeable)
        aggs.append(F.hll_sketch_agg(distinct_col).alias("dsk"))
    if quantile_col is not None:
        # mergeable quantile sketch (Datasketches KLL, ST8c r11): the
        # OTHER statistic every telemetry rollup serves (p50/p95/p99)
        # that a sum-mergeable table cannot maintain — exact
        # percentiles are not mergeable, KLL sketches are.  Same
        # column pattern the HLL distinct sketch proved: a binary
        # column merged per group on upsert, estimates read off at
        # presentation time (read_rollup).
        aggs.append(
            F.kll_sketch_agg_double(
                F.col(quantile_col).cast("double")
            ).alias("qsk")
        )
    return (
        delta.groupBy(b.alias("bucket"), *keys)
        .agg(*aggs)
        .withColumn(
            "pb",
            F.coalesce(F.date_format("bucket", _PB_FMT), F.lit(_NULL_BUCKET)),
        )
        .withColumn(
            "rk",
            F.concat_ws(
                _RK_SEP, F.col("pb"), *[nn(F.col(k)) for k in keys]
            ),
        )
    )


def upsert_rollup(
    spark,
    root: str,
    delta: DataFrame,
    ts_col: str,
    keys: list[str],
    value_col: str,
    level: str = "day",
    max_pruned_parts: int = 64,
    stream_commit: tuple[str, int] | None = None,
    distinct_col: str | None = None,
    quantile_col: str | None = None,
) -> int:
    """Merge a raw-event delta into the maintained rollup at ``root``
    (self-initializing: the first call on an empty root IS the build).

    ``distinct_col`` additionally maintains a MERGEABLE distinct sketch
    per group (Datasketches HLL, column ``dsk``) — the incremental-DAU
    statistic: COUNT(DISTINCT) is not sum-mergeable, but HLL registers
    max-merge, so maintained estimates equal a from-scratch rollup's
    (pinned in tests).  A root built with ``distinct_col`` must always
    be maintained with it (and vice versa) — the merge join needs the
    column on both sides.

    Cost model at 100 TB: one bounded shuffle over the DELTA (its
    partial aggregation), then ONE manifest-pruned read of ONLY the
    buckets the delta touches (late data touches old buckets — only
    those are read and rewritten), a full-outer merge of delta partials
    onto the touched buckets' rows, and a partition REPLACE commit
    (lake_replace_partitions — every untouched bucket's files carry by
    reference; lake_upsert's survivors re-read would pay the touched-
    partition I/O twice).  History is never rescanned.  The touched-
    bucket list is collected driver-side (bounded by the delta's
    calendar span, the probe_term_index literal-list pattern); a delta
    spanning more than ``max_pruned_parts`` buckets falls back to one
    full read of the AGGREGATE table — still |buckets × keys| rows,
    never the raw log.  An empty delta still commits the
    ``stream_commit`` watermark (a data-less manifest), so the
    exactly-once ledger never shows a hole for a quiet micro-batch.

    Returns the committed lake version."""
    from pyspec_spark.lake import lake_read, lake_scan, latest_version

    if level not in LEVELS:
        raise ValueError(f"unknown level {level!r}; expected one of {LEVELS}")
    dp = _rollup_partial(
        delta, ts_col, keys, value_col, level,
        distinct_col=distinct_col, quantile_col=quantile_col,
    ).persist()
    # The transaction base is captured ONCE, here, and every read and
    # the final commit below pin it: lake writers re-resolving
    # latest_version at commit time would silently serialize this merge
    # against a base it never read (a lost update — e.g. a racing
    # replica or maintenance commit landing inside the read→merge
    # window would be double-merged instead of raising LakeConflict,
    # breaking rollup_sink's documented conflict-retry contract).
    base_version = latest_version(root)
    try:
        if base_version is None:
            from pyspec_spark.lake import lake_append

            return lake_append(
                spark, root, dp, partition_col="pb", bloom_cols=["rk"],
                stream_commit=stream_commit, base_version=None,
            )
        touched = sorted(
            r["pb"] for r in dp.select("pb").distinct().collect()
        )
        if not touched:
            if stream_commit is None:
                return base_version
            from pyspec_spark.lake import _commit, _load_manifest

            m = _load_manifest(root, base_version)
            return _commit(
                root, "upsert", m["files"], "pb", base_version,
                stream_commit=stream_commit, schema=m.get("schema"),
            )
        if len(touched) <= max_pruned_parts:
            scans = [
                lake_scan(spark, root, [("pb", "=", p)], version=base_version)
                for p in touched
            ]
            ex = scans[0]
            for p in scans[1:]:
                ex = ex.unionByName(p)
            replace_parts = set(touched)
        else:
            ex = lake_read(spark, root, version=base_version)
            # full-read fallback: the merge output covers EVERY bucket,
            # so the replace set is every live partition plus the new
            from pyspec_spark.lake import _load_manifest

            m = _load_manifest(root, base_version)
            replace_parts = {
                e["partition"] for e in m["files"] if e["partition"]
            } | set(touched)
        ex = ex.select(
            F.col("rk").alias("_rk"),
            F.col("bucket").alias("_bucket"),
            *[F.col(k).alias(f"_k_{k}") for k in keys],
            F.col("pb").alias("_pb"),
            F.col("n").alias("_n"),
            F.col("sum_micro").alias("_sm"),
            F.col("min_v").alias("_mn"),
            F.col("max_v").alias("_mx"),
            *(
                [F.col("dsk").alias("_dsk")]
                if distinct_col is not None
                else []
            ),
            *(
                [F.col("qsk").alias("_qsk")]
                if quantile_col is not None
                else []
            ),
        )
        # FULL OUTER on rk: delta-only keys insert, existing-only keys
        # (other groups in the touched buckets) pass through unchanged,
        # both-sides keys combine — the frame IS the touched buckets'
        # complete new content, so the commit never re-reads them
        merged = (
            dp.join(ex, dp["rk"] == ex["_rk"], "full_outer")
            .select(
                F.coalesce(dp["bucket"], F.col("_bucket")).alias("bucket"),
                *[
                    F.coalesce(dp[k], F.col(f"_k_{k}")).alias(k)
                    for k in keys
                ],
                (
                    F.coalesce(F.col("n"), F.lit(0))
                    + F.coalesce(F.col("_n"), F.lit(0))
                ).alias("n"),
                (
                    F.coalesce(F.col("sum_micro"), F.lit(0).cast("bigint"))
                    + F.coalesce(F.col("_sm"), F.lit(0).cast("bigint"))
                ).alias("sum_micro"),
                F.least("min_v", "_mn").alias("min_v"),
                F.greatest("max_v", "_mx").alias("max_v"),
                *(
                    [
                        # one-sided rows pass their sketch through;
                        # both-sides rows max-merge registers (hll_union
                        # on a NULL side would be an error, hence the
                        # explicit branch, not coalesce-into-union)
                        F.when(dp["dsk"].isNull(), F.col("_dsk"))
                        .when(F.col("_dsk").isNull(), dp["dsk"])
                        .otherwise(F.hll_union(dp["dsk"], F.col("_dsk")))
                        .alias("dsk")
                    ]
                    if distinct_col is not None
                    else []
                ),
                *(
                    [
                        # same null-branch discipline for the KLL
                        # quantile sketch (ST8c)
                        F.when(dp["qsk"].isNull(), F.col("_qsk"))
                        .when(F.col("_qsk").isNull(), dp["qsk"])
                        .otherwise(
                            F.kll_sketch_merge_double(
                                dp["qsk"], F.col("_qsk")
                            )
                        )
                        .alias("qsk")
                    ]
                    if quantile_col is not None
                    else []
                ),
                F.coalesce(dp["pb"], F.col("_pb")).alias("pb"),
                F.coalesce(dp["rk"], F.col("_rk")).alias("rk"),
            )
        )
        from pyspec_spark.lake import lake_replace_partitions, lake_upsert

        try:
            return lake_replace_partitions(
                spark, root, replace_parts, merged, partition_col="pb",
                bloom_cols=["rk"], stream_commit=stream_commit,
                base_version=base_version,
            )
        except ValueError:
            # partition-less files present (an external z-order
            # compaction): fall back to the survivors-re-reading upsert
            # — merged rows replace themselves plus combine, correct
            # either way, just 2x the touched I/O.  Still pinned to
            # base_version: the anti-join must read the SAME base the
            # merge was computed from, and the commit must conflict if
            # anything landed since.
            return lake_upsert(
                spark, root, merged, key="rk", partition_col="pb",
                bloom_cols=["rk"], stream_commit=stream_commit,
                base_version=base_version,
            )
    finally:
        dp.unpersist()


def read_rollup(spark, root: str, keys: list[str]) -> DataFrame:
    """Present the maintained rollup (drops the lake plumbing columns
    and finalizes the micro-unit accumulator).  A root maintained with
    ``distinct_col`` additionally presents ``n_distinct`` (HLL distinct
    estimate); one maintained with ``quantile_col`` presents ``p50``
    and ``p95`` read off the merged KLL sketch."""
    from pyspec_spark.lake import lake_read

    t = lake_read(spark, root)
    extra: list[str] = []
    if "dsk" in t.columns:
        t = t.withColumn("n_distinct", F.hll_sketch_estimate("dsk"))
        extra.append("n_distinct")
    if "qsk" in t.columns:
        t = t.withColumn(
            "p50", F.kll_sketch_get_quantile_double("qsk", F.lit(0.5))
        ).withColumn(
            "p95", F.kll_sketch_get_quantile_double("qsk", F.lit(0.95))
        )
        extra += ["p50", "p95"]
    return finalize(
        t.drop("rk", "pb", "dsk", "qsk"), keys, extra=tuple(extra)
    )


def rollup_sink(
    root: str,
    ts_col: str,
    keys: list[str],
    value_col: str,
    level: str = "day",
    query_name: str = "rollup_maintenance",
    distinct_col: str | None = None,
    quantile_col: str | None = None,
):
    """The STREAMING face of upsert_rollup (the continuous aggregate
    proper): build the function for ``writeStream.foreachBatch`` so
    every micro-batch of raw events merges into the maintained rollup
    exactly-once — the (query_name, batch_id) watermark commits
    ATOMICALLY with the merged data (the lake_append_stream
    discipline), so a redelivered batch after a kill-and-restart is
    skipped instead of double-counted.  Double-counting is the failure
    mode that makes naive streaming aggregation tables silently wrong:
    unlike an append sink, a re-merged SUM is not idempotent, so the
    watermark-in-the-same-commit property is load-bearing here, not
    belt-and-braces.

    LakeConflict (a maintenance commit — compact, vacuum-side rewrite —
    or a racing replica landing between the base read and the merge
    commit) RETRIES the whole merge against the fresh base, re-checking
    the watermark each attempt (the lake_append_stream discipline): a
    read-modify-write cannot simply re-link like an append, it must
    recompute."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from pyspec_spark.lake import LakeConflict, lake_last_batch

        for attempt in range(5):
            last = lake_last_batch(root, query_name)
            if last is not None and int(batch_id) <= last:
                return
            try:
                upsert_rollup(
                    batch_df.sparkSession,
                    root,
                    batch_df,
                    ts_col,
                    keys,
                    value_col,
                    level=level,
                    stream_commit=(query_name, int(batch_id)),
                    distinct_col=distinct_col,
                    quantile_col=quantile_col,
                )
                return
            except LakeConflict:
                continue
        raise LakeConflict(
            f"rollup_sink: batch {batch_id} of {query_name} lost 5 "
            "commit races; a concurrent writer is pinning the root"
        )

    return _sink
