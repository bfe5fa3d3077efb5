"""Declared queries for the advanced join strategies — SURVEY.md §2.3
J8 (cross-table as-of) and J9 (range/interval join), plus the
embedding-cosine near-dup completing the dedup family (§2.12).

Oracle notes:
- q_range_join's oracle is the plain BETWEEN theta join; the Spark side
  runs the bucket-and-overlap rewrite (§4.3) — exact by construction,
  so the results hash-match while the physical plan is an equi-join.
- q_asof_join's oracle is DuckDB's native ASOF JOIN; the Spark side is
  the union+window carry-forward.  Left side is pre-deduped to one row
  per (custkey, orderdate) — both engines, rule (c) — because ASOF tie
  picks are engine-defined.
- q_embed_neardup is the exact all-pairs cosine self-join (the
  correctness baseline; the LSH-blocked scale path is q_minhash/q_ann).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspec_spark.operators.joins import asof_join, range_join_bucketed
from pyspec_spark.registry import query
from pyspec_spark.tables import table


# ---------------------------------------------------------------------------
# J9 — interval join: customers matched to acctbal bands derived from
# region keys.  Bands are half-open [lo, hi); bucket rewrite on Spark.
# ---------------------------------------------------------------------------
@query(
    "q_range_join",
    oracle="""
WITH bands AS (
  SELECT r_regionkey AS band_id,
         -1000.0 + r_regionkey * 2200.0 AS lo,
         -1000.0 + (r_regionkey + 1) * 2200.0 AS hi
  FROM region
)
SELECT b.band_id, COUNT(*) AS n_cust,
       ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*), 6) AS avg_bal
FROM customer c JOIN bands b
  ON c.c_acctbal >= b.lo AND c.c_acctbal < b.hi
GROUP BY b.band_id
""",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.functions.determinism import davg

    cust = table(spark, sf_dir, "customer")
    bands = (
        table(spark, sf_dir, "region")
        .select(
            F.col("r_regionkey").alias("band_id"),
            (-1000.0 + F.col("r_regionkey") * 2200.0).alias("lo"),
            (-1000.0 + (F.col("r_regionkey") + 1) * 2200.0).alias("hi"),
        )
    )
    joined = range_join_bucketed(
        cust, bands, value_col="c_acctbal", bucket_width=1000.0
    )
    return joined.groupBy("band_id").agg(
        F.count("*").alias("n_cust"), davg("c_acctbal", "avg_bal")
    )


# ---------------------------------------------------------------------------
# J8 — cross-table as-of: each event matched to the customer's latest
# order at-or-before the event timestamp.  Aggregated per event_type so
# the declared output is compact and timestamp-free.
# ---------------------------------------------------------------------------
@query(
    "q_asof_join",
    oracle="""
WITH o AS (
  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS last_orderkey
  FROM orders GROUP BY 1, 2
)
SELECT e.event_type,
       COUNT(*) AS n_events,
       COUNT(o.last_orderkey) AS n_matched,
       CAST(SUM(CAST(o.last_orderkey AS DECIMAL(18,6))) AS BIGINT) AS sum_orderkey
FROM events e
ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
GROUP BY e.event_type
""",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    orders = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("last_orderkey"))
    )
    matched = asof_join(
        orders.withColumnRenamed("o_custkey", "user_id"),
        ev,
        key="user_id",
        left_ts="o_orderdate",
        right_ts="ts",
        payload=["last_orderkey"],
        right_id="event_id",
    )
    return matched.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.count("last_orderkey").alias("n_matched"),
        F.sum("last_orderkey").alias("sum_orderkey"),
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup: exact all-pairs self-join above a cosine
# threshold (completes the dedup method family; LSH variants cover the
# 100 TB path, this is the verifiable baseline).
# ---------------------------------------------------------------------------
@query(
    "q_embed_neardup",
    oracle="""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
FROM embeddings a
JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.45
""",
)
def q_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda v: v.cast("double") * v.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    cos = dot / (norm(F.col("va")) * norm(F.col("vb")))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos_raw", cos)
        .where(F.col("cos_raw") >= 0.45)
        .select("id_a", "id_b", F.round("cos_raw", 6).alias("cos_sim"))
    )
