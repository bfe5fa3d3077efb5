"""Deterministic global training order — the "global shuffle" of a
training-data pipeline, done the way it scales.

Reference loci (SURVEY.md §0 policy): absent from `stuwilkins/pyspec`
[H] — north-star: every training run consumes its mix in a seeded
pseudo-random order, and at corpus scale "shuffle the dataset" is a
famous bottleneck because the naive formulation —
ROW_NUMBER() OVER (ORDER BY hash) — is a SINGLE-PARTITION window: the
entire corpus funnels through one reducer.

The scalable formulation here is the standard two-level rank:

1. order key = md5(seed || doc_id) — seeded, reproducible, uniform;
2. bucket = the key's first byte (256 buckets).  Lowercase-hex md5
   ordering is monotone in the first byte's value, so the global key
   order equals (bucket, key) order by construction;
3. per-bucket dense ranks via a window PARTITIONED by bucket — 256
   parallel windows of ~n/256 rows each, never one global funnel;
4. bucket offsets via a prefix-sum window over the 256-row bucket
   count table (single-partition, but over 256 rows — constant);
5. global position = offset[bucket] + within-bucket rank.

EXACT (row_number semantics, doc_id tiebreak), deterministic across
engines (the DuckDB oracle replays it as one ROW_NUMBER), and every
corpus-sized operation is hash-partitioned.  n_buckets tunes reducer
fan-out: 256 suffices to 10^11 rows at ~4·10^8 rows/bucket-window;
use 65536 (two bytes) beyond that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_order_index(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "seed0",
    n_buckets: int = 256,
    tier_col: str | None = None,
) -> DataFrame:
    """Append ``pos`` — each row's 0-based position in the seeded
    global pseudo-random order — without a corpus-wide
    single-partition window.  ``n_buckets`` must be a power of 16
    divisor of the md5 prefix space (16, 256, 4096, 65536).

    ``tier_col`` (curriculum ordering, L46f): when given, the global
    order is (tier ASC, seeded key) — ascending-difficulty curriculum
    blocks, each internally a seeded pseudo-random permutation.  The
    two-level rank generalizes verbatim: buckets become (tier, bucket)
    pairs, the offsets prefix-sum runs over |tiers| x n_buckets rows
    (still constant-bounded), and per-(tier, bucket) windows stay
    hash-partitioned — the exact equivalence to
    ROW_NUMBER() OVER (ORDER BY tier, key, id) holds because lexical
    (tier, bucket, key) order IS (tier, key) order (md5-hex bucket
    monotonicity, as in the untiered case)."""
    # Integral derivation — float log(4096, 16) can land at 2.999…
    # on some libms and a truncation would spuriously reject a
    # legitimate power of 16.
    hex_digits = max((n_buckets.bit_length() - 1) // 4, 1)
    if 16 ** hex_digits != n_buckets:
        raise ValueError("n_buckets must be a power of 16")
    # r13: key+bucket as ONE parsed-SQL projection (plan-construction
    # cost — see _replicate_copies' note; same operators, same values)
    k = df.selectExpr(
        "*",
        f"md5(concat('{seed}', CAST({id_col} AS STRING))) AS _key",
    ).selectExpr(
        "*",
        f"CAST(conv(substring(_key, 1, {hex_digits}), 16, 10) AS INT)"
        " AS _bucket",
    )
    grp = ([tier_col] if tier_col is not None else []) + ["_bucket"]
    counts = k.groupBy(*grp).agg(F.count("*").alias("_n"))
    # r13 (second pass): windows + pos arithmetic as parsed SQL (1:1
    # transliteration of the former Column chain; same frames)
    grp_sql = ", ".join(grp)
    offsets = counts.selectExpr(
        *grp,
        f"coalesce(SUM(_n) OVER (ORDER BY {grp_sql}"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS _off",
    )
    return (
        k.selectExpr(
            "*",
            f"row_number() OVER (PARTITION BY {grp_sql}"
            f" ORDER BY _key, {id_col}) AS _r",
        )
        .join(F.broadcast(offsets), grp)
        .selectExpr("*", "CAST((_off + _r - 1) AS BIGINT) AS pos")
        .drop("_key", "_bucket", "_n", "_r", "_off")
    )


def assign_train_shards(
    ordered: DataFrame, shard_size: int
) -> DataFrame:
    """(…, pos) -> (…, shard, pos_in_shard): fixed-size dataloader
    shards in global-order sequence.  Map-only on top of the order."""
    return ordered.selectExpr(
        "*",
        f"CAST(pos / {shard_size} AS BIGINT) AS shard",
        f"pmod(pos, {shard_size}) AS pos_in_shard",
    )


def write_train_shards(
    ordered: DataFrame, path: str, shard_size: int
) -> None:
    """Materialize the training order as one directory per shard
    (shard=K/), rows carrying pos_in_shard so a dataloader replays
    the exact order with a partition-pruned read of only its shards.
    One repartition on the shard key — the write IS the shuffle."""
    (
        assign_train_shards(ordered, shard_size)
        .repartition(F.col("shard"))
        .sortWithinPartitions("pos_in_shard")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )


def extend_train_shards(
    ordered: DataFrame, path: str, shard_size: int
) -> None:
    """Append a mix VERSION's extension rows (L46d) — ``pos`` already
    offset past the consumed history — without touching any existing
    file: new files land only under the shard dirs the extension
    reaches (the boundary shard gains a second file whose rows sort
    after the existing ones by pos_in_shard; every earlier shard stays
    byte-identical — the consumed-prefix invariance a resumable
    training run needs).  Same one-repartition write as
    write_train_shards."""
    cols = [c for c in ("shard", "pos_in_shard") if c in ordered.columns]
    (
        assign_train_shards(ordered.drop(*cols), shard_size)
        .repartition(F.col("shard"))
        .sortWithinPartitions("pos_in_shard")
        .write.partitionBy("shard")
        .mode("append")
        .parquet(path)
    )


def resume_train_shards(
    spark, path: str, shard: int, pos_in_shard: int
) -> DataFrame:
    """Resume-from-(shard, pos): the exact unconsumed suffix of a
    materialized training order — every row strictly after the given
    coordinate, in order.  The shard predicate prunes partitions, so a
    resume deep into the run opens only the remaining shard dirs."""
    df = spark.read.parquet(path).where(
        (F.col("shard") > int(shard))
        | (
            (F.col("shard") == int(shard))
            & (F.col("pos_in_shard") > int(pos_in_shard))
        )
    )
    return df.orderBy("shard", "pos_in_shard")


def read_train_shards(
    spark, path: str, shards: list[int] | None = None
) -> DataFrame:
    """The dataloader face of :func:`write_train_shards`: read the
    materialized training order back IN ORDER — all shards, or only
    the requested ones (each worker passes its own shard list and the
    scan opens only those shard=K/ directories: partition-pruned, the
    layout's whole point).  Rows come back sorted (shard,
    pos_in_shard), i.e. exactly the seeded global order restricted to
    the requested shards.  The sort is a no-op-cheap range exchange
    over already-sorted runs; a single-shard read (the per-worker
    case) sorts one partition's rows."""
    df = spark.read.parquet(path)
    if shards is not None:
        df = df.where(F.col("shard").isin([int(s) for s in shards]))
    return df.orderBy("shard", "pos_in_shard")


def _idiv(a, b):
    """Exact integer division for non-negative longs: the numerator is
    reduced to a multiple of b first, and a double division of an exact
    multiple is exact below 2^53 — no float-rounding boundary cases."""
    return ((a - F.pmod(a, b)) / b).cast("long")


def global_rank_index(
    df: DataFrame,
    order_by: list,
    n_buckets: int | None = None,
    pos_col: str = "pos",
    total_col: str | None = None,
    freeze: bool = True,
) -> DataFrame:
    """Exact 0-based global rank under an ARBITRARY ``ORDER BY`` —
    the general-order sibling of :func:`global_order_index` (which is
    specialized to the seeded-md5 order where the bucket is readable
    off the key prefix).  With ``total_col``, the total row count also
    rides along (a broadcast 1-row aggregate — what closed-form NTILE
    needs).

    Same two-level shape, never a corpus-sized single-partition
    window, and fully LAZY (no driver-side jobs at plan build):

    1. range-exchange into ``n_buckets`` ORDERED buckets
       (``repartitionByRange`` — the partitioner is monotone in the
       sort key, and equal full keys never straddle a boundary);
    2. per-bucket ``row_number`` windows, each over ~n/n_buckets rows;
    3. bucket offsets via a prefix-sum window over the ≤ n_buckets-row
       bucket-count table (single-partition over a CONSTANT row count
       — the global_order_index precedent), broadcast-joined back.

    The bucket id is ``spark_partition_id()`` over the range exchange.
    No persist, no leak: bucket COUNTS derive from the WINDOWED frame
    itself (max row_number per bucket), so every consumer shares one
    subtree — Spark reuses the exchange, and even a recompute is
    deterministic (RangePartitioner samples with fixed per-partition
    seeds over a deterministic scan, and AQE decisions repeat given
    identical stats), so offsets can never desynchronize from bucket
    assignments.

    Rank is EXACT for any order whose full key is unique (callers pass
    a tiebreak column, exactly as they would under a window): bucket
    assignment is monotone in the key order, so offset + within-bucket
    row_number reproduces the global row_number.
    """
    from pyspark.sql import Column

    # r13 (optimization guide §2: derive partitioning from the input /
    # cluster, never a constant): the former fixed 256-bucket range
    # exchange meant every ntile/rank pass ran 256 tiny tasks per
    # stage regardless of scale — q_rfm's three passes scheduled ~4000
    # sub-MB tasks on a 32-core box (measured 49 stages x 256 tasks).
    # The default now follows the session's parallelism (buckets grow
    # with the cluster, so per-bucket window size stays ~n/cores at
    # every scale); positions are exact for ANY bucket count (offset +
    # within-bucket row_number), so results cannot move.  Callers with
    # a measured fan-out need still pass n_buckets explicitly.
    if n_buckets is None:
        n_buckets = max(df.sparkSession.sparkContext.defaultParallelism, 1)
    exprs = [e if isinstance(e, Column) else F.col(e) for e in order_by]
    k = df.repartitionByRange(n_buckets, *exprs).withColumn(
        "_bucket", F.spark_partition_id()
    )
    w_in = Window.partitionBy("_bucket").orderBy(*exprs)
    # Tracked persist: bucket ids and within-bucket ranks are FROZEN
    # after one materialization.  Without it, the offsets subtree and
    # the output subtree each re-evaluate the range exchange — and
    # RangePartitioner's reservoir sample depends on row ORDER within
    # input partitions (shuffle-fetch arrival order, nondeterministic
    # across evaluations), so two evaluations can draw different
    # boundaries and desynchronize offsets from bucket assignments.
    # The old docstring's reuse argument was unsound: stacked ntile
    # passes (q_rfm) measured 39 independent rangepartitioning
    # exchanges and ZERO ReusedExchange, and went value-wrong exactly
    # when the per-partition sample stopped covering whole partitions
    # — which at the former fixed 256 buckets merely required a bigger
    # input (a latent at-scale bug, exposed locally by the
    # parallelism-derived width).  persist() is lazy (the zero-jobs-at-
    # build gate holds; a lazy localCheckpoint would NOT — under AQE,
    # .toRdd executes the query stages at build), registry-tracked so
    # bench/check drain it, and MEMORY_AND_DISK spills rather than
    # evicts, so within one run both subtrees always read the one
    # materialization.  ``freeze=False`` exists for plan introspection
    # only — production callers MUST keep the default.
    r = k.withColumn("_r", F.row_number().over(w_in))
    if freeze:
        from pyspec_spark.registry import PERSIST_SEQ, track_persist

        r = track_persist(
            df.sparkSession,
            f"global_rank_index#{next(PERSIST_SEQ)}",
            r,
        )
    # bucket count == max row_number: derived from the SAME windowed
    # subtree the output reads, never a second evaluation of the input
    counts = r.groupBy("_bucket").agg(F.max("_r").alias("_n"))
    w_off = Window.orderBy("_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "_bucket",
        F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off"),
    )
    out = (
        r.join(F.broadcast(offsets), "_bucket")
        .withColumn(
            pos_col, (F.col("_off") + F.col("_r") - 1).cast("long")
        )
        .drop("_bucket", "_r", "_off")
    )
    if total_col is not None:
        totals = counts.agg(
            F.coalesce(F.sum("_n"), F.lit(0)).alias(total_col)
        )
        out = out.crossJoin(F.broadcast(totals))
    return out


def ntile_from_pos(pos, n, k: int):
    """SQL ``NTILE(k)`` as closed-form arithmetic on an exact 0-based
    global position and the total row count (int or 1-row-broadcast
    Column) — the remainder-distribution semantics exactly: with
    q, r = divmod(n, k), the first r buckets hold q+1 rows and the
    rest hold q.  Deterministic, engine-agnostic, and (unlike
    ``F.ntile``) never requires the corpus-sized single-partition
    window Spark warns about.  Exact for n below 2^53 (_idiv)."""
    pos = F.col(pos) if isinstance(pos, str) else pos
    n = (F.lit(n) if isinstance(n, int) else n).cast("long")
    kl = F.lit(k).cast("long")
    q = _idiv(n, kl)
    r = F.pmod(n, kl)
    cut = r * (q + 1)
    first = _idiv(pos, q + 1) + 1
    # CaseWhen evaluates branches lazily per row, so the q=0 division
    # (n < k: every pos falls in the first branch) never executes
    rest = F.when(q > 0, r + _idiv(pos - cut, q) + 1)
    return F.when(pos < cut, first).otherwise(rest).cast("int")


def ntile_exact(
    df: DataFrame,
    order_by: list,
    k: int,
    out_col: str,
    n_buckets: int | None = None,
) -> DataFrame:
    """``NTILE(k) OVER (ORDER BY ...)`` without the corpus-sized
    single-partition window: exact two-level global rank
    (:func:`global_rank_index`) plus the closed-form bucket arithmetic
    (:func:`ntile_from_pos`).  Fully lazy — no driver jobs at build."""
    ranked = global_rank_index(
        df, order_by, n_buckets=n_buckets,
        pos_col="_ntile_pos", total_col="_ntile_n",
    )
    return ranked.withColumn(
        out_col, ntile_from_pos("_ntile_pos", F.col("_ntile_n"), k)
    ).drop("_ntile_pos", "_ntile_n")
