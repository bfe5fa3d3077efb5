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
    """events.ts is parquet TIMESTAMP(NANOS) which Spark 4 rejects by
    default.  Read nanos as LONG (legacy conf, session-settable) and
    truncate to microsecond timestamps with integer division — the same
    truncation DuckDB applies reading NANOS into its us TIMESTAMP, so
    both engines see identical values.  (Float division would corrupt:
    epoch-nanos ~1.7e18 exceeds double's 2^53 integer range.)
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes)["ts"] == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register temp views so SQL-form queries can run via spark.sql."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
