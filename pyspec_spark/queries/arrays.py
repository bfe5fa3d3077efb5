"""Array-column queries — MCA-spectra analogs (SURVEY.md §2.8 F9-F10,
§2.12 L6; Stage 4).

Reference locus: `pyspec/spec.py` `@A` multichannel-analyzer handling [M]
— one fixed-length array per scan point; channel math (total counts,
channel slices, per-channel sums) is the idiom.  Substrate here:
`embeddings.embedding` (list<float>[64], verified).

Cross-engine notes:
- Spark `posexplode` is 0-based, DuckDB `generate_subscripts` 1-based:
  channel ids are normalized to 1-based.
- float32 elements are cast to DOUBLE before any arithmetic so neither
  engine does float32 math.
- Per-vector reductions use a DECIMAL accumulator inside Spark's
  higher-order `aggregate` (no shuffle, stays JVM-side, exact) and
  unnest+decimal-SUM in DuckDB — identical exact values.

Scale notes: per-row HOF reductions are embarrassingly parallel (no
shuffle); the per-channel aggregation shuffles on a 64-value key —
bounded cardinality, partial agg does the work map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspec_spark.functions.determinism import _fixed6
from pyspec_spark.registry import query
from pyspec_spark.tables import table


# ---------------------------------------------------------------------------
# F9 — array length (MCA channel count).
# ---------------------------------------------------------------------------
@query(
    "q_arr_len",
    oracle="""
SELECT CAST(len(embedding) AS INT) AS n_channels, COUNT(*) AS n_vecs,
       MIN(vec_id) AS min_vec
FROM embeddings
GROUP BY 1
""",
)
def q_arr_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    return e.groupBy(F.size("embedding").alias("n_channels")).agg(
        F.count("*").alias("n_vecs"), F.min("vec_id").alias("min_vec")
    )


# ---------------------------------------------------------------------------
# F9 — element access (channel slice: first/last/mid channel).
# ---------------------------------------------------------------------------
@query(
    "q_arr_elem",
    oracle="""
SELECT vec_id,
       ROUND(CAST(embedding[1]  AS DOUBLE), 6) AS ch1,
       ROUND(CAST(embedding[32] AS DOUBLE), 6) AS ch32,
       ROUND(CAST(embedding[64] AS DOUBLE), 6) AS ch64
FROM embeddings
WHERE vec_id <= 500
""",
)
def q_arr_elem(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    return e.where(F.col("vec_id") <= 500).select(
        "vec_id",
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("ch1"),
        F.round(F.element_at("embedding", 32).cast("double"), 6).alias("ch32"),
        F.round(F.element_at("embedding", 64).cast("double"), 6).alias("ch64"),
    )


# ---------------------------------------------------------------------------
# F9 — per-channel sums across all spectra (MCA accumulation).
# ---------------------------------------------------------------------------
@query(
    "q_arr_channel_sum",
    oracle="""
WITH ch AS (
  SELECT generate_subscripts(embedding, 1) AS channel,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
)
SELECT channel, COUNT(*) AS n,
       CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS sum_v
FROM ch
GROUP BY channel
""",
)
def q_arr_channel_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    ch = e.select(F.posexplode("embedding").alias("pos", "raw")).select(
        (F.col("pos") + 1).alias("channel"), F.col("raw").cast("double").alias("v")
    )
    return ch.groupBy("channel").agg(
        F.count("*").alias("n"),
        (F.sum(_fixed6(F.col("v"))).cast("double") / 1e6).alias("sum_v"),
    )


# ---------------------------------------------------------------------------
# F10 — per-vector L2 norm (MCA total-counts / similarity primitive).
# Spark: higher-order aggregate with DECIMAL accumulator — exact, no
# shuffle, whole-stage JVM.  DuckDB: unnest + decimal SUM.
# ---------------------------------------------------------------------------
@query(
    "q_arr_l2",
    oracle="""
WITH ch AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings
),
s AS (
  SELECT vec_id, SUM(CAST(v * v AS DECIMAL(28,10))) AS ss
  FROM ch
  GROUP BY vec_id
)
SELECT vec_id, ROUND(SQRT(CAST(ss AS DOUBLE)), 6) AS l2_norm
FROM s
""",
)
def q_arr_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    # exact 10-dp fixed point as a LONG accumulator: v*v >= 0 so
    # floor(x*1e10 + 0.5) is the same HALF_UP the oracle's
    # DECIMAL(28,10) cast applies, and long accumulation runs ~2.3x
    # faster than Spark's per-element decimal path (no overflow
    # bookkeeping).  Range guard: exact while sum(v^2) < 9.2e8 —
    # embeddings are unit-scale 64-dim vectors, orders of magnitude in.
    ss = F.aggregate(
        "embedding",
        F.lit(0).cast("bigint"),
        lambda acc, x: acc
        + F.floor(x.cast("double") * x.cast("double") * 1e10 + 0.5).cast("bigint"),
    )
    return e.select(
        "vec_id", F.round(F.sqrt(ss.cast("double") / 1e10), 6).alias("l2_norm")
    )


# ---------------------------------------------------------------------------
# L6 — per-label embedding centroid (posexplode -> bounded-key groupBy).
# ---------------------------------------------------------------------------
# Mean in exact integer micro-units, rounded to the nearest micro by one
# deterministic IEEE step.  The naive ROUND(decimal_sum/count, 6) form is
# a cross-engine trap here: per-element 6dp quantization makes the exact
# mean land ON half-micro boundaries systematically (small integer
# denominators), and the engines' decimal->double conversions differ by
# an ulp, flipping the rounding (observed at sf0.1).  With both engines
# computing fl(bigint)/fl(count) the inputs to ROUND are bit-identical.
@query(
    "q_embed_centroid",
    oracle="""
WITH ch AS (
  SELECT label, generate_subscripts(embedding, 1) AS channel,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
)
SELECT label, channel,
       ROUND(CAST(SUM(CAST(ROUND(v * 1e6) AS BIGINT)) AS DOUBLE) / COUNT(v))
         / 1e6 AS centroid_v,
       COUNT(*) AS n
FROM ch
GROUP BY label, channel
""",
)
def q_embed_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    ch = e.select("label", F.posexplode("embedding").alias("pos", "raw")).select(
        "label",
        (F.col("pos") + 1).alias("channel"),
        F.col("raw").cast("double").alias("v"),
    )
    micro_mean = F.round(
        F.sum(_fixed6(F.col("v"))).cast("double") / F.count("v")
    )
    return ch.groupBy("label", "channel").agg(
        (micro_mean / 1e6).alias("centroid_v"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# Embedding covariance matrix (PCA/whitening prep) over the first 16
# channels: exact first/second moments -> sample covariance.  The pair
# expansion is MAP-ONLY (nested transform + flatten + one explode — no
# self-join), so the only shuffle carries 136 keys x partial sums; at
# 100 TB the shuffle stays 136 rows per map partition regardless of
# vector count.  Products are cast to DOUBLE on BOTH engines before the
# fixed-point quantization (FLOAT x FLOAT stays float in DuckDB,
# widening rules differ — double-first makes the inputs bit-identical).
# ---------------------------------------------------------------------------
_COV_D = 16

# Named so q_pca_power (queries/ml.py) can reuse this oracle verbatim
# as its CTE prefix — the same composition trick as q_ann_ivf_det.
#
# r8: FULL-INTEGER output.  The r6/r7 driver reds traced to
# build-sensitive int128->double / float-chain rounding seams in the
# terminal ROUND: r7 moved the moments onto fl(SUM(BIGINT))/1e6 and the
# driver's DuckDB build STILL disagreed (local 1.0.0 passed both
# rounds).  So the declared result now carries ZERO float columns:
#   s_i, s_j = SUM(ROUND(x*1e6))           (micro-unit first moments)
#   m2       = SUM(ROUND(x_i*x_j*1e6))     (micro-unit second moment)
#   cov_num  = n*m2*1e6 - s_i*s_j          (sample-cov numerator, micro^2)
#   cov_den  = n*(n-1)                     (cov value = num/den/1e12)
# All arithmetic after the per-row quantization is exact integer math
# (HUGEINT in DuckDB, DECIMAL(38,0) in Spark, both re-cast to BIGINT —
# every value fits int64 by orders of magnitude at the declared scales).
# The per-row quantization itself is deterministic: float->double casts
# are exact, one double multiply is bit-identical IEEE on any build,
# and DuckDB ROUND = std::round = Spark _fixed6's sign-split floor
# (half away from zero).  Integers hash identically on every build.
_EMBED_COV_ORACLE = f"""
WITH idx AS (SELECT CAST(unnest(range(1, {_COV_D} + 1)) AS INT) AS i),
firsts AS (
  SELECT i,
         CAST(SUM(CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1e6) AS BIGINT))
              AS BIGINT) AS s,
         COUNT(*) AS n
  FROM embeddings, idx
  GROUP BY i
),
seconds AS (
  SELECT ii.i, jj.i AS j,
         CAST(SUM(CAST(ROUND(CAST(embedding[ii.i] AS DOUBLE)
                             * CAST(embedding[jj.i] AS DOUBLE) * 1e6) AS BIGINT))
              AS BIGINT) AS m2
  FROM embeddings, idx ii, idx jj
  WHERE jj.i >= ii.i
  GROUP BY ii.i, jj.i
)
SELECT s2.i, s2.j, fi.n,
       fi.s AS s_i, fj.s AS s_j, s2.m2,
       CAST(CAST(fi.n AS HUGEINT) * s2.m2 * 1000000
            - CAST(fi.s AS HUGEINT) * fj.s AS BIGINT) AS cov_num,
       fi.n * (fi.n - 1) AS cov_den
FROM seconds s2
JOIN firsts fi ON fi.i = s2.i
JOIN firsts fj ON fj.i = s2.j
"""


@query("q_embed_cov", oracle=_EMBED_COV_ORACLE)
def q_embed_cov(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    d = _COV_D
    # map-only (i, j, x_i * x_j) expansion for j >= i
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.lit(d)),
            lambda i: F.transform(
                F.sequence(i, F.lit(d)),
                lambda j: F.struct(
                    i.cast("int").alias("i"),
                    j.cast("int").alias("j"),
                    (
                        F.element_at("embedding", i).cast("double")
                        * F.element_at("embedding", j).cast("double")
                    ).alias("xx"),
                ),
            ),
        )
    )
    seconds = (
        e.select(F.explode(pairs).alias("p"))
        .select("p.i", "p.j", "p.xx")
        .groupBy("i", "j")
        .agg(F.sum(_fixed6(F.col("xx"))).alias("m2"))
    )
    firsts = (
        e.select(F.posexplode(F.slice("embedding", 1, d)).alias("pos", "raw"))
        .select((F.col("pos") + 1).cast("int").alias("i"),
                F.col("raw").cast("double").alias("v"))
        .groupBy("i")
        .agg(F.sum(_fixed6(F.col("v"))).alias("s"), F.count("*").alias("n"))
    )
    fi = firsts.select(F.col("i"), F.col("s").alias("s_i"), F.col("n"))
    fj = firsts.select(F.col("i").alias("j"), F.col("s").alias("s_j"))
    dec = "decimal(38,0)"
    cov_num = (
        F.col("n").cast(dec) * F.col("m2").cast(dec) * F.lit(1000000).cast(dec)
        - F.col("s_i").cast(dec) * F.col("s_j").cast(dec)
    ).cast("long")
    return (
        seconds.join(F.broadcast(fi), "i")
        .join(F.broadcast(fj), "j")
        .select(
            "i",
            "j",
            "n",
            "s_i",
            "s_j",
            "m2",
            cov_num.alias("cov_num"),
            (F.col("n") * (F.col("n") - 1)).alias("cov_den"),
        )
    )


# ---------------------------------------------------------------------------
# L-family extension — int8 embedding quantization quality (the 4x
# at-rest compression step of an embedding store): per-vector min/max
# affine scale to 0..255 codes, reconstruct, and report per-label
# reconstruction error.  Entirely map-side HOF arithmetic (identical
# double-precision ops in both engines, so the ROUND(.,6)ed errors
# hash-match); one bounded-key aggregation.  Constant vectors (span 0)
# quantize to code 0 with zero error by the scale guard.
# ---------------------------------------------------------------------------
@query(
    "q_embed_quant",
    oracle="""
WITH v AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
s AS (
  SELECT vec_id, label, e,
         list_min(e) AS lo,
         (list_max(e) - list_min(e)) / 255.0 AS scale
  FROM v
),
err AS (
  SELECT vec_id, label,
         list_max(list_transform(e,
             x -> abs(x - (lo + CASE WHEN scale = 0 THEN 0
                                     ELSE ROUND((x - lo) / scale) END
                           * scale)))) AS max_abs_err
  FROM s
)
SELECT label,
       COUNT(*) AS n_vecs,
       ROUND(CAST(SUM(CAST(ROUND(max_abs_err * 1e6) AS BIGINT)) AS DOUBLE)
             / COUNT(*) / 1e6, 6) AS avg_max_err,
       ROUND(MAX(max_abs_err), 6) AS worst_err
FROM err
GROUP BY label
""",
)
def q_embed_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    v = e.select("vec_id", "label", dbl.alias("e"))
    lo = F.array_min("e")
    scale = (F.array_max("e") - F.array_min("e")) / F.lit(255.0)
    s = v.select("vec_id", "label", "e", lo.alias("lo"), scale.alias("scale"))
    code = lambda x: F.when(  # noqa: E731
        F.col("scale") == 0, F.lit(0.0)
    ).otherwise(F.round((x - F.col("lo")) / F.col("scale")))
    max_abs_err = F.array_max(
        F.transform(
            "e",
            lambda x: F.abs(x - (F.col("lo") + code(x) * F.col("scale"))),
        )
    )
    err = s.select("vec_id", "label", max_abs_err.alias("max_abs_err"))
    return err.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.round(
            F.sum(_fixed6(F.col("max_abs_err"))).cast("double")
            / F.count("*")
            / 1e6,
            6,
        ).alias("avg_max_err"),
        F.round(F.max("max_abs_err"), 6).alias("worst_err"),
    )
