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
