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
) -> DataFrame:
    """Append ``pos`` — each row's 0-based position in the seeded
    global pseudo-random order — without a corpus-wide
    single-partition window.  ``n_buckets`` must be a power of 16
    divisor of the md5 prefix space (16, 256, 4096, 65536)."""
    import math

    hex_digits = int(math.log(n_buckets, 16))
    if 16 ** hex_digits != n_buckets:
        raise ValueError("n_buckets must be a power of 16")
    key = F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    k = df.withColumn("_key", key).withColumn(
        "_bucket",
        F.conv(F.substring("_key", 1, hex_digits), 16, 10).cast("int"),
    )
    counts = k.groupBy("_bucket").agg(F.count("*").alias("_n"))
    w_off = (
        Window.orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "_bucket",
        F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off"),
    )
    w_in = Window.partitionBy("_bucket").orderBy("_key", id_col)
    return (
        k.withColumn("_r", F.row_number().over(w_in))
        .join(F.broadcast(offsets), "_bucket")
        .withColumn("pos", (F.col("_off") + F.col("_r") - 1).cast("long"))
        .drop("_key", "_bucket", "_n", "_r", "_off")
    )


def assign_train_shards(
    ordered: DataFrame, shard_size: int
) -> DataFrame:
    """(…, pos) -> (…, shard, pos_in_shard): fixed-size dataloader
    shards in global-order sequence.  Map-only on top of the order."""
    return ordered.withColumn(
        "shard", (F.col("pos") / F.lit(shard_size)).cast("long")
    ).withColumn("pos_in_shard", F.pmod(F.col("pos"), F.lit(shard_size)))


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
