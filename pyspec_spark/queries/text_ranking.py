"""Term-weighting / inverted-index operators — document frequency,
smoothed IDF, and per-document TF-IDF top-k.

Reference loci (SURVEY.md §0 policy): absent from `stuwilkins/pyspec`
[H] — north-star text-pipeline ranking over `documents`, the workload
shape of corpus indexing at training-data scale: tokenize -> explode ->
two keyed aggregations (doc-term, term) -> term-keyed join back.

Determinism: token split is single-space (verified identical
Spark/DuckDB on this corpus, see queries/llm.py); tf/df are exact
counts; idf = LN((N+1)/(df+1)) is rounded to 6 places BEFORE ranking so
a last-ulp libm difference between engines can neither reorder the
top-k nor leak into output values; top-k has a term-name tiebreak.

Scale notes (100 TB posture):
- the (doc_id, term) aggregation is the big shuffle — it is keyed and
  partial-aggregated (map-side combine collapses repeated terms within
  a document before the exchange).
- df is a second, |vocab|-sized aggregation; the tf<-df join is
  term-keyed and NOT forced to broadcast: a real corpus vocabulary
  (urls, ids, typos) does not fit in a broadcast table. AQE may still
  pick broadcast when the measured size is small.
- n_docs rides along as a broadcast of a 1-row aggregate, never a
  driver-side collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspec_spark.registry import query
from pyspec_spark.tables import table


def _tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )


def _n_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "documents").agg(F.count("*").alias("n_docs"))


# ---------------------------------------------------------------------------
# Vocabulary statistics: document frequency, collection frequency, and
# smoothed IDF per term.
# ---------------------------------------------------------------------------
@query(
    "q_term_stats",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
), n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS total_tf,
       ROUND(LN((n.n_docs + 1.0) / (COUNT(*) + 1.0)), 6) AS idf
FROM tf CROSS JOIN n
GROUP BY term, n.n_docs
""",
)
def q_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    tf = _tf(spark, sf_dir)
    return (
        tf.crossJoin(F.broadcast(_n_docs(spark, sf_dir)))
        .groupBy("term", "n_docs")
        .agg(F.count("*").alias("df"), F.sum("tf").alias("total_tf"))
        .select(
            "term",
            "df",
            "total_tf",
            F.round(
                F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 6
            ).alias("idf"),
        )
    )


# ---------------------------------------------------------------------------
# Per-document TF-IDF top-k terms (k=3, rounded-idf ranking, term
# tiebreak) — the retrieval-ranking shape.
# ---------------------------------------------------------------------------
@query(
    "q_tfidf_topk",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
), df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT t.doc_id, t.term, t.tf, d.df,
         ROUND(t.tf * ROUND(LN((n.n_docs + 1.0) / (d.df + 1.0)), 6), 6) AS tfidf
  FROM tf t JOIN df d ON t.term = d.term CROSS JOIN n
)
SELECT doc_id, term, tf, df, tfidf
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term) AS rn
  FROM scored)
WHERE rn <= 3
""",
)
def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    tf = _tf(spark, sf_dir)
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(_n_docs(spark, sf_dir)))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * F.round(F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 6),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# BM25 ranked retrieval (r4) — the Okapi BM25 scoring function
# (Robertson & Zaragoza 2009; the Lucene-style idf variant
# ln(1 + (N - df + 0.5)/(df + 0.5))), ORACLE-CHECKED end to end for a
# literal query-term set.  Shape mirrors q_tfidf_topk: tokenize ->
# per-(doc, term) tf restricted to the query terms (filter pushed below
# the big aggregation, so the shuffle carries query-term postings
# only), broadcast per-term idf + the 1-row (N, avgdl) aggregate,
# score sum per doc, TakeOrdered top-20.
#
# Determinism: idf and per-term partial scores round to 6 BEFORE the
# per-doc sum and ranking (the q_tfidf_topk rule); doc_id tiebreak.
# ---------------------------------------------------------------------------
_BM25_TERMS = ("spark", "hash", "window")
_BM25_K1, _BM25_B = 1.2, 0.75

_BM25_ORACLE = f"""
WITH q(term) AS (VALUES ('spark'), ('hash'), ('window')),
dl AS (
  SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
),
stats AS (
  SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term IN (SELECT term FROM q)
  GROUP BY doc_id, term
),
idf AS (
  SELECT term,
         ROUND(LN(1.0 + (stats.n_docs - COUNT(DISTINCT doc_id) + 0.5)
                        / (COUNT(DISTINCT doc_id) + 0.5)), 6) AS idf
  FROM tf CROSS JOIN stats
  GROUP BY term, stats.n_docs
),
scored AS (
  SELECT tf.doc_id,
         ROUND(idf.idf * (tf.tf * ({_BM25_K1} + 1.0))
               / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                  + {_BM25_B} * dl.dl / stats.avgdl)), 6) AS part
  FROM tf
  JOIN idf USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats
)
SELECT doc_id, ROUND(SUM(part), 6) AS bm25
FROM scored
GROUP BY doc_id
ORDER BY bm25 DESC, doc_id
LIMIT 20
"""


@query("q_bm25_topk", oracle=_BM25_ORACLE)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    dl = docs.select("doc_id", F.size(F.split("text", " ")).alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg(F.col("dl").cast("double")).alias("avgdl")
    )
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .where(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    idf = (
        tf.crossJoin(F.broadcast(stats))
        .groupBy("term", "n_docs")
        .agg(F.countDistinct("doc_id").alias("df"))
        .select(
            "term",
            F.round(
                F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                ),
                6,
            ).alias("idf"),
        )
    )
    part = F.round(
        F.col("idf")
        * (F.col("tf") * (_BM25_K1 + 1.0))
        / (
            F.col("tf")
            + _BM25_K1
            * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
        ),
        6,
    )
    return (
        tf.join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", part.alias("part"))
        .groupBy("doc_id")
        .agg(F.round(F.sum("part"), 6).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(20)
    )
