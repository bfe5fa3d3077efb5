"""Declared queries over the advanced LLM-pipeline operators
(`operators/dedup.py`, `operators/similarity.py`, `operators/text.py`,
`operators/multimodal.py`) — SURVEY.md §2.12 L2/L5/L7 and the
training-data north-star brief.

Oracle policy:
- `q_cosine_topk` (exact similarity search) IS SQL-expressible: DuckDB
  `list_cosine_similarity` on double-cast lists gives the bit-identical
  sequential sum; rounded to 6 places with a vec_id tiebreak under LIMIT.
- `q_token_counts` uses `regexp_extract_all` — same RE2/Java-compatible
  pattern class both engines.
- MinHash/SimHash/LSH/IVF and the pandas-UDF language model are
  approximate or engine-specific (xxhash64 has no DuckDB twin) →
  rows-only, as SURVEY.md §2 prescribes for L2/L5.

Scale notes: every rows-only query here still follows the 100 TB plan —
candidate generation is an equi-join (bands/cells), verification runs on
signatures not raw text, and no driver-side materialization beyond the
tiny IVF centroid model (n_cells × dim floats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspec_spark.operators.dedup import minhash_neardup, simhash_neardup
from pyspec_spark.operators.multimodal import extract_features, make_fake_media
from pyspec_spark.operators.similarity import cosine_topk, lsh_topk
from pyspec_spark.operators.text import BPE_ISH, fingerprint, token_counts
from pyspec_spark.registry import query
from pyspec_spark.tables import table


# ---------------------------------------------------------------------------
# L5 — exact cosine top-k (the similarity-search correctness baseline).
# Query vector = the embedding of vec_id 0, expressed IN-PLAN as a
# broadcast cross join so no vector ever rides through the driver.
# ---------------------------------------------------------------------------
@query(
    "q_cosine_topk",
    oracle="""
SELECT e.vec_id,
       ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    CAST(q.embedding AS DOUBLE[])), 6) AS score
FROM embeddings e
CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
ORDER BY score DESC, e.vec_id
LIMIT 10
""",
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    dot = F.aggregate(
        F.zip_with("embedding", "qv", lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda a: a.cast("double") * a.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return (
        e.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(dot / (norm(F.col("embedding")) * norm(F.col("qv"))), 6).alias(
                "score"
            ),
        )
        .orderBy(F.desc("score"), "vec_id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# L5 scale path — random-hyperplane LSH ANN top-k (rows-only: candidate
# set is approximate by construction).
# ---------------------------------------------------------------------------
@query("q_ann_lsh_topk")
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    row = e.where(F.col("vec_id") == 0).first()
    # empty input (pruned partition / fresh table): any probe vector
    # yields the correct empty top-k
    qvec = [float(v) for v in row["embedding"]] if row else [0.0] * 64
    return lsh_topk(e, qvec, k=10, max_hamming=6)


# ---------------------------------------------------------------------------
# L2 — MinHash-LSH near-dup pairs (rows-only: signature-estimated
# Jaccard; the exact-Jaccard twin is q_jaccard_neardup).
# ---------------------------------------------------------------------------
@query("q_minhash_neardup")
def q_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    return minhash_neardup(d, threshold=0.8).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# L2 — SimHash near-dup pairs (rows-only; 8×8-bit band blocking gives a
# recall guarantee to hamming 7).
# ---------------------------------------------------------------------------
@query("q_simhash_neardup")
def q_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    return simhash_neardup(d, max_hamming=6).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# Token counting: whitespace + BPE-ish regex pretokenizer, both engines.
# ---------------------------------------------------------------------------
@query(
    "q_token_counts",
    oracle=rf"""
SELECT doc_id,
       CAST(len(regexp_split_to_array(text, '\s+')) AS INT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '{BPE_ISH}')) AS INT) AS n_bpe_tokens
FROM documents
""",
)
def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    return token_counts(d).select("doc_id", "n_ws_tokens", "n_bpe_tokens")


# ---------------------------------------------------------------------------
# Document fingerprinting (winnowing-style min rolling hash) — xxhash64
# has no DuckDB twin → rows-only; determinism is pytest-asserted.
# ---------------------------------------------------------------------------
@query("q_fingerprint")
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    return fingerprint(d).select("doc_id", "fingerprint").orderBy("doc_id")


# ---------------------------------------------------------------------------
# L7 — multimodal feature-extraction plumbing over mapInPandas
# (rows-only; deterministic fake codec, real Spark batch shape).
# ---------------------------------------------------------------------------
@query("q_multimodal_features")
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = make_fake_media(spark, n=16, frames=4)
    return (
        extract_features(media, sample_every=2)
        .select(
            "media_id",
            "frame_id",
            F.round(F.element_at("features", 1), 6).alias("mean_r"),
        )
        .orderBy("media_id", "frame_id")
    )


# ---------------------------------------------------------------------------
# L5 scale path (variant B) — IVF ANN top-k: sample-trained centroids,
# map-only cell assignment, probe the nearest cells, exact re-rank inside
# (rows-only: the candidate set is approximate by construction; recall vs
# exact brute force is asserted in tests/test_llm_ops.py).  At rest the
# cell id is the partition key, so a probe touches n_probe/n_cells of the
# data — the IVF index IS the table layout at 100 TB.
# ---------------------------------------------------------------------------
@query("q_ann_ivf_topk")
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.similarity import (
        ivf_assign,
        ivf_topk,
        train_centroids,
    )

    e = table(spark, sf_dir, "embeddings")
    row = e.where(F.col("vec_id") == 0).first()
    if row is None:  # empty input: empty top-k with the right schema
        return e.select(
            "vec_id", F.lit(0.0).alias("score")
        ).limit(0)
    qvec = [float(v) for v in row["embedding"]]
    centroids = train_centroids(e, n_cells=16, sample=2000)
    assigned = ivf_assign(e, centroids)
    return ivf_topk(assigned, centroids, qvec, k=10, n_probe=4)
