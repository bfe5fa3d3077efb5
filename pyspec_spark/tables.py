"""Testdata table loading.

Mirrors the reference's data-access layer (``pyspec/spec.py``
``SpecDataFile`` — open file, expose scans as tables; SURVEY.md §1 D1-D3)
over the driver's parquet star schema.  One DataFrame per table; reads are
plain ``spark.read.parquet`` so Catalyst gets full pushdown/pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# DataFrame cache keyed by (applicationId, sf_dir, name).  A fresh
# spark.read.parquet costs ~80 ms of driver work (file listing + footer
# schema read via py4j) on EVERY query build; the resolved read relation
# is immutable, so reusing it is free and exact.  applicationId scopes
# entries to a live SparkContext (a restarted session gets a new id, so
# stale DataFrames are never resurrected).
_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    key = (spark.sparkContext.applicationId, sf_dir, name)
    df = _CACHE.get(key)
    if df is None:
        if name == "events":
            df = _events(spark, sf_dir)
        else:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        _CACHE[key] = df
    return df


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize events.ts to TimestampType (LTZ) whatever the parquet
    flavor.  Depending on how the testdata generator wrote it, Spark reads
    ts as TIMESTAMP(NANOS) (rejected unless nanosAsLong), TIMESTAMP_NTZ
    (isAdjustedToUTC=false), or plain TIMESTAMP.  Downstream queries use
    unix_micros()/window() which require LTZ; with the session pinned to
    UTC, every branch below is wall-clock preserving and truncates to
    microseconds exactly as DuckDB does reading the same file.  (Integer
    division for nanos: epoch-nanos ~1.7e18 exceeds double's 2^53.)
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The NTZ branch below casts through the session timezone; pin UTC here
    # (not only in the get_spark factory) so a session created elsewhere on
    # a non-UTC host can't silently shift every event timestamp.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = dict(df.dtypes)["ts"]
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif ts_type != "timestamp":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register temp views so SQL-form queries can run via spark.sql."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


def fanout(df: DataFrame, *keys: str) -> DataFrame:
    """Hash-repartition a scan-rooted frame BEFORE an expensive map
    stage, only when the scan cannot feed every core.

    The r13 cold-path measurements traced most of the heavy corpus
    queries' re-execution cost to one place: the test corpus is a
    single sub-MB parquet file — ONE input split — so everything up to
    the first exchange (shingle builds + 64 per-shingle md5 partials,
    trigram/gram explodes, tokenize+aggregate passes) ran on one core
    while 31 idled.  Fanning the raw rows out first costs one exchange
    of the tiny input and lets the expensive stage behind it use the
    whole machine (measured: q_ngram_freq cold re-exec 3.7 -> 1.6 s).

    Scale posture (guide §2: derive partitioning from the input, never
    a constant): at real scale the scan already yields >= cores input
    splits and this exchange would be pure overhead — so the helper
    NO-OPS unless the frame's estimated split count is below the
    session's parallelism.  Splits are estimated driver-side from the
    frame's input files and spark.sql.files.maxPartitionBytes, the
    same quantities Spark's own FilePartition packing uses.

    Hash partitioning on a row key (never round-robin, which inserts a
    per-partition sort and, on retry, a full local materialization) is
    deterministic; callers route only order-insensitive consumers
    (integer counts, min/max, bit_or, collect_set+array_sort, windows
    with total order keys) through this, so results are byte-identical
    either way.
    """
    import math
    import os
    from urllib.parse import urlparse

    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    try:
        mpb_raw = spark.conf.get(
            "spark.sql.files.maxPartitionBytes", "134217728b"
        )
        mpb = int(str(mpb_raw).lower().rstrip("b")) or 1
        splits = 0
        for uri in df.inputFiles():
            p = urlparse(uri)
            path = p.path if p.scheme in ("file", "") else None
            if path is None:
                return df  # remote store: real layouts, never starved
            splits += max(1, math.ceil(os.path.getsize(path) / mpb))
            if splits >= par:
                return df
    except Exception:
        return df  # estimation failed: keep the plan untouched
    from pyspark.sql import functions as F

    return df.repartition(par, *[F.col(k) for k in keys])
