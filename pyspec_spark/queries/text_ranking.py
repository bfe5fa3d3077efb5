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

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspec_spark.registry import query
from pyspec_spark.tables import table


def _tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        docs.selectExpr("doc_id", "explode(split(text, ' ')) AS term")
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
    # r13 (second pass): score + rank as parsed SQL (1:1
    # transliteration of the former Column chain)
    tf = _tf(spark, sf_dir)
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(_n_docs(spark, sf_dir)))
        .selectExpr(
            "doc_id",
            "term",
            "tf",
            "df",
            "round(tf * round(ln((n_docs + 1.0D) / (df + 1.0D)), 6), 6)"
            " AS tfidf",
        )
    )
    return (
        scored.selectExpr(
            "*",
            "row_number() OVER (PARTITION BY doc_id"
            " ORDER BY tfidf DESC, term) AS rn",
        )
        .where("rn <= 3")
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
    # r13 (second pass): projections + BM25 arithmetic as parsed SQL
    # (1:1 transliteration; Python-folded float literals — 2.2 = k1+1,
    # 0.25 = 1-b — carried as 'D'-pinned doubles exactly as lit() did)
    dl = docs.selectExpr("doc_id", "size(split(text, ' ')) AS dl")
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        F.expr("AVG(CAST(dl AS DOUBLE))").alias("avgdl"),
    )
    terms_in = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    tf = (
        docs.selectExpr("doc_id", "explode(split(text, ' ')) AS term")
        .where(f"term IN ({terms_in})")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    idf = (
        tf.crossJoin(F.broadcast(stats))
        .groupBy("term", "n_docs")
        .agg(F.expr("COUNT(DISTINCT doc_id)").alias("df"))
        .selectExpr(
            "term",
            "round(ln(1.0D + (n_docs - df + 0.5D) / (df + 0.5D)), 6)"
            " AS idf",
        )
    )
    part = (
        f"round(idf * (tf * {_BM25_K1 + 1.0!r}D)"
        f" / (tf + {_BM25_K1!r}D * ({1.0 - _BM25_B!r}D"
        f" + {_BM25_B!r}D * dl / avgdl)), 6)"
    )
    return (
        tf.join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .selectExpr("doc_id", f"{part} AS part")
        .groupBy("doc_id")
        .agg(F.expr("round(SUM(part), 6)").alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval (r5) — reciprocal-rank fusion (Cormack et al. 2009)
# of the BM25 lexical ranking with a dense-side ranking over the
# feature-hash document embeddings (q_hash_embed's md5 vectors), both
# for the same literal query terms.  ORACLE-CHECKED end to end:
# - the query's hash-embedding is computed ONCE driver-side from the
#   term literals (md5 + integer counts + one sqrt/divide) and inlined
#   as float literals in BOTH engines (the _lsh_det_oracle precedent);
# - each system's top-20 comes from a TakeOrdered limit (scalable),
#   ranks are assigned by a window over those <= 20 rows only — no
#   global window ever runs over the corpus;
# - RRF = 1/(60+rank_bm25) + 1/(60+rank_cos) over the outer-joined
#   lists, ROUND(.,6), top-10 with doc_id tiebreak.
# This is the retrieval ensemble every modern RAG stack runs; here
# both legs and the fusion are replayed exactly in DuckDB.
# ---------------------------------------------------------------------------
_RRF_K = 60
_FH_DIM_R = 16


def _fh_query_vec(terms: tuple[str, ...]) -> list[float]:
    import hashlib

    raw = [0] * _FH_DIM_R
    for t in terms:
        b = int(hashlib.md5((t + "#fh").encode()).hexdigest()[:8], 16) % _FH_DIM_R
        s = 1 if int(hashlib.md5((t + "#sg").encode()).hexdigest()[:8], 16) % 2 == 0 else -1
        raw[b] += s
    n2 = sum(v * v for v in raw)
    n = n2 ** 0.5
    return [v / n if n > 0 else 0.0 for v in raw]


# Shared oracle CTE: per-doc dense feature-hash vectors (q_hash_embed's
# md5 arithmetic folded to LIST form).  ONE definition feeds both the
# hybrid-RRF and topic-bucketing oracles — a fix here cannot leave a
# silently-divergent twin.
_FH_DV_CTE = f"""
ex AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
h AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(tok || '#fh'), 1, 8))::BIGINT % {_FH_DIM_R}
              AS INT) AS dim,
         CASE WHEN ('0x' || substr(md5(tok || '#sg'), 1, 8))::BIGINT % 2 = 0
              THEN 1 ELSE -1 END AS s
  FROM ex
),
per AS (SELECT doc_id, dim, SUM(s) AS raw FROM h GROUP BY doc_id, dim),
folded AS (
  SELECT doc_id,
         LIST(raw ORDER BY dim) AS vals, LIST(dim ORDER BY dim) AS dims,
         sqrt(CAST(SUM(raw * raw) AS DOUBLE)) AS n2
  FROM per GROUP BY doc_id
),
dv AS (
  SELECT doc_id,
         list_transform(range(0, {_FH_DIM_R}),
             d -> CASE WHEN n2 > 0 AND len(list_filter(dims, x -> x = d)) > 0
                  THEN ROUND(vals[list_position(dims, d)] / n2, 6)
                  ELSE 0.0 END) AS v
  FROM folded
)
"""


def _hybrid_oracle() -> str:
    qv = ", ".join(repr(float(v)) for v in _fh_query_vec(_BM25_TERMS))
    bm25_body = _BM25_ORACLE.strip().removeprefix("WITH ")
    return f"""
WITH {_FH_DV_CTE.strip()},
cos20 AS (
  SELECT doc_id, ROUND(list_dot_product(v, [{qv}]), 6) AS cos
  FROM dv ORDER BY cos DESC, doc_id LIMIT 20
),
cr AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS rc
  FROM cos20
),
br AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rb
  FROM (WITH {bm25_body})
)
SELECT COALESCE(br.doc_id, cr.doc_id) AS doc_id,
       ROUND(COALESCE(1.0 / ({_RRF_K} + rb), 0)
             + COALESCE(1.0 / ({_RRF_K} + rc), 0), 6) AS rrf
FROM br FULL OUTER JOIN cr ON br.doc_id = cr.doc_id
ORDER BY rrf DESC, doc_id
LIMIT 10
"""


@query("q_hybrid_rrf", oracle=_hybrid_oracle())
def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.text import feature_hash_vectors

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    # the pre-explode vectors frame: no re-aggregation of exploded rows
    dv = feature_hash_vectors(docs, dim=_FH_DIM_R)
    qlit = F.array(*[F.lit(float(x)) for x in _fh_query_vec(_BM25_TERMS)])
    cos = F.round(
        F.aggregate(
            F.zip_with("v", qlit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    cos20 = (
        dv.select("doc_id", cos.alias("cos"))
        .orderBy(F.desc("cos"), "doc_id")
        .limit(20)
    )
    wc = Window.orderBy(F.desc("cos"), "doc_id")
    cr = cos20.select("doc_id", F.row_number().over(wc).alias("rc"))
    bm = q_bm25_topk.__wrapped__(spark, sf_dir)
    wb = Window.orderBy(F.desc("bm25"), "doc_id")
    br = bm.select("doc_id", F.row_number().over(wb).alias("rb"))
    fused = br.join(cr, "doc_id", "full_outer").select(
        "doc_id",
        F.round(
            F.coalesce(1.0 / (_RRF_K + F.col("rb")), F.lit(0.0))
            + F.coalesce(1.0 / (_RRF_K + F.col("rc")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    return fused.orderBy(F.desc("rrf"), "doc_id").limit(10)


# ---------------------------------------------------------------------------
# Topic bucketing (r5) — the end-to-end composition the curation stack
# actually runs: hash-embed every document (q_hash_embed's md5
# vectors), then assign each to its nearest seed document's vector
# (docs 0..K-1, the q_kmeans2 deterministic-init discipline) — the
# cluster id that downstream mixing/balancing keys on.  ORACLE-CHECKED:
# the embedding CTE, the explicit fixed-order 16-term distances, and
# the MIN(struct(dist, cid)) tiebreak all replay exactly.  Scale: the
# K seed vectors broadcast; assignment is map-side argmin + one keyed
# count — the same posture as q_kmeans2 per round.
# ---------------------------------------------------------------------------
_TOPIC_K = 4


def _topic_oracle() -> str:
    dist = " + ".join(
        f"(d.v[{i}] - c.v[{i}]) * (d.v[{i}] - c.v[{i}])"
        for i in range(1, _FH_DIM_R + 1)
    )
    return f"""
WITH {_FH_DV_CTE.strip()},
seeds AS (
  SELECT doc_id AS cid, v FROM dv WHERE doc_id < {_TOPIC_K}
),
asg AS (
  SELECT d.doc_id,
         MIN(struct_pack(dd := ({dist}), cid := c.cid)) AS best
  FROM dv d, seeds c
  GROUP BY d.doc_id
)
SELECT a.doc_id, (a.best).cid AS topic
FROM asg a
ORDER BY a.doc_id
"""


@query("q_doc_topics", oracle=_topic_oracle())
def q_doc_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.text import feature_hash_vectors

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    dv = feature_hash_vectors(docs, dim=_FH_DIM_R)
    seeds = dv.where(F.col("doc_id") < _TOPIC_K).select(
        F.col("doc_id").alias("cid"), F.col("v").alias("cv")
    )
    dist: Column = None
    for d in range(1, _FH_DIM_R + 1):
        t = (F.element_at("v", d) - F.element_at("cv", d)) * (
            F.element_at("v", d) - F.element_at("cv", d)
        )
        dist = t if dist is None else dist + t
    return (
        dv.crossJoin(F.broadcast(seeds))
        .groupBy("doc_id")
        .agg(
            F.min(F.struct(dist.alias("dd"), F.col("cid").alias("cid"))).alias(
                "best"
            )
        )
        .select("doc_id", F.col("best.cid").alias("topic"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# L40 inverted index materialization (r7) — the posting lists BM25 and
# TF-IDF imply but never write: per term, document frequency, collection
# frequency, and the delta-encoded posting list "docgap:tf,docgap:tf,…"
# (gaps over sorted doc_ids — the standard index compression basis,
# because gap distributions are small and skewed while raw ids are not).
# Same single-space token basis as q_term_stats so the vocabulary rows
# line up 1:1 with the stats table.
#
# Determinism: postings are strings built from exact integers; order
# inside each list is pinned by doc_id both engine-side (array_sort of
# (doc_id, entry) structs) and oracle-side (STRING_AGG ... ORDER BY).
#
# 100 TB posture: one corpus scan; the (doc,term) aggregation is the
# big shuffle (partial-aggregated); the gap window and the final
# per-term aggregation share the SAME hash partitioning on term, so the
# window's exchange is the only vocabulary shuffle — the groupBy reuses
# it (plan-gated: 3 exchanges total incl. presentation sort).  Monster
# posting lists (stopwords: df ≈ n_docs) are the known skew axis; the
# mitigation is IMPLEMENTED r8 as operators/text.sharded_postings —
# a (term, doc_id DIV shard_size) grouping with gaps delta-encoded from
# the shard base, so decode_postings replays absolute ids losslessly
# (equality-pytested against this flat format, with the <= shard_size
# per-group bound asserted).  The flat format here stays the
# oracle-pinned declaration.
# ---------------------------------------------------------------------------
@query(
    "q_inverted_index",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
), g AS (
  SELECT term, doc_id, tf,
         doc_id - COALESCE(LAG(doc_id) OVER (
             PARTITION BY term ORDER BY doc_id), 0) AS gap
  FROM tf
)
SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS cf,
       STRING_AGG(CONCAT(CAST(gap AS VARCHAR), ':', CAST(tf AS VARCHAR)),
                  ',' ORDER BY doc_id) AS postings
FROM g
GROUP BY term
ORDER BY term
""",
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    tf = _tf(spark, sf_dir)
    w = Window.partitionBy("term").orderBy("doc_id")
    g = tf.withColumn(
        "gap",
        F.col("doc_id") - F.coalesce(F.lag("doc_id").over(w), F.lit(0)),
    ).withColumn("entry", F.concat_ws(":", F.col("gap"), F.col("tf")))
    return (
        g.groupBy("term")
        .agg(
            F.count("*").alias("df"),
            F.sum("tf").alias("cf"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "entry"))),
                    lambda s: s.getField("entry"),
                ),
                ",",
            ).alias("postings"),
        )
        .orderBy("term")
    )


# ---------------------------------------------------------------------------
# L40b index READ path (r7) — term lookup THROUGH the delta-encoded
# posting lists: select terms from the materialized index, decode the
# "docgap:tf" strings back to doc_ids in-plan (cumulative gap sum over
# the posting order), and join document metadata — the round-trip that
# proves the index format is usable inside the engine, not just
# emitted.  The oracle SPLICES the registered q_inverted_index SQL as
# its CTE (the q_decontam_report trick) so the two declarations can
# never drift.
#
# 100 TB posture: in production the index is WRITTEN once, partitioned
# by a stable md5 term bucket, and lookups open only the probed terms'
# bucket directories — IMPLEMENTED r8 as operators/text.write_term_index
# / probe_term_index (path-pruning pinned by test_layout.py); here the
# CTE rebuilds the index in-plan so the oracle stays drift-free, and
# the measured cost is build + decode.  The
# decode itself is term-local: explode = posting length, cumsum window
# partitions by term — no corpus-wide shuffle beyond the index build's
# own exchanges.
# ---------------------------------------------------------------------------
_LOOKUP_TERMS = ("data", "spark")


def _index_lookup_oracle() -> str:
    from pyspec_spark.registry import ORACLES

    terms = ", ".join(f"'{t}'" for t in _LOOKUP_TERMS)
    return f"""
WITH idx AS ({ORACLES["q_inverted_index"]}),
sel AS (
  SELECT term, string_split(postings, ',') AS es
  FROM idx WHERE term IN ({terms})
),
x AS (
  SELECT term, i AS pos,
         CAST(string_split(es[i], ':')[1] AS BIGINT) AS gap,
         CAST(string_split(es[i], ':')[2] AS BIGINT) AS tf
  FROM sel, LATERAL (SELECT CAST(unnest(range(1, len(es) + 1)) AS INT) AS i) t
),
y AS (
  SELECT term, tf,
         CAST(SUM(gap) OVER (PARTITION BY term ORDER BY pos) AS BIGINT) AS did
  FROM x
)
SELECT y.term, y.did AS doc_id, y.tf, d.n_chars
FROM y JOIN documents d ON d.doc_id = y.did
ORDER BY term, doc_id
"""


@query("q_index_lookup", oracle=_index_lookup_oracle())
def q_index_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = q_inverted_index.__wrapped__(spark, sf_dir)
    sel = idx.where(F.col("term").isin(*_LOOKUP_TERMS)).select(
        "term", F.split("postings", ",").alias("es")
    )
    x = sel.select(
        "term",
        F.posexplode("es").alias("pos", "entry"),
    ).select(
        "term",
        "pos",
        F.split("entry", ":").getItem(0).cast("bigint").alias("gap"),
        F.split("entry", ":").getItem(1).cast("bigint").alias("tf"),
    )
    w = (
        Window.partitionBy("term")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    y = x.select("term", "tf", F.sum("gap").over(w).alias("doc_id"))
    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return (
        y.join(d, "doc_id")
        .select("term", "doc_id", "tf", "n_chars")
        .orderBy("term", "doc_id")
    )


# ---------------------------------------------------------------------------
# L40c term-bucketed index READ path under the oracle gate (r9) — the
# physical layout r8 implemented (operators/text.write_term_index /
# probe_term_index) exercised end-to-end as a declared query: build
# the flat inverted index, MATERIALIZE it partitioned by md5 term
# bucket into a tmp root, probe a fixed term set through ONLY the
# probed bucket directories (path list computed driver-side from the
# md5 twin — the FS analogue of partition pruning), decode the
# delta-encoded postings in-plan, and join document metadata.  The
# oracle splices the registered q_inverted_index SQL filtered to the
# same terms, so the bucketed round-trip must reproduce the flat
# declaration byte-for-byte.  The touched-file bound (every file
# opened lives under a probed tb= dir; probed dirs < total dirs) is
# pinned by test_layout.py's FS gate on this query's probe.
#
# 100 TB posture: the write adds one vocabulary-sized re-bucketing to
# the index build (never a corpus pass); the lookup opens |probed
# buckets| directories regardless of vocabulary size; decode windows
# are term-local.  Same bounded-side-effect contract as the other
# round-trip rows (fresh tmp root per invocation, zero-jobs exempt).
# ---------------------------------------------------------------------------
_BUCKET_TERMS = ("scan", "column", "window")


def _index_bucket_lookup_oracle() -> str:
    from pyspec_spark.registry import ORACLES

    terms = ", ".join(f"'{t}'" for t in _BUCKET_TERMS)
    return f"""
WITH idx AS ({ORACLES["q_inverted_index"]}),
sel AS (
  SELECT term, string_split(postings, ',') AS es
  FROM idx WHERE term IN ({terms})
),
x AS (
  SELECT term, i AS pos,
         CAST(string_split(es[i], ':')[1] AS BIGINT) AS gap,
         CAST(string_split(es[i], ':')[2] AS BIGINT) AS tf
  FROM sel, LATERAL (SELECT CAST(unnest(range(1, len(es) + 1)) AS INT) AS i) t
),
y AS (
  SELECT term, tf,
         CAST(SUM(gap) OVER (PARTITION BY term ORDER BY pos) AS BIGINT) AS did
  FROM x
)
SELECT y.term, y.did AS doc_id, y.tf, d.n_chars
FROM y JOIN documents d ON d.doc_id = y.did
ORDER BY term, doc_id
"""


@query("q_index_bucket_lookup", oracle=_index_bucket_lookup_oracle())
def q_index_bucket_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.text import (
        decode_postings,
        probe_term_index,
        write_term_index,
    )
    from pyspec_spark.queries.lake_queries import _tmp_root

    # the UNSORTED index body (q_inverted_index minus its presentation
    # sort — write_term_index re-buckets anyway, and inheriting a
    # corpus-wide sort into a composed query is the documented trap)
    tf = _tf(spark, sf_dir)
    w = Window.partitionBy("term").orderBy("doc_id")
    g = tf.withColumn(
        "gap",
        F.col("doc_id") - F.coalesce(F.lag("doc_id").over(w), F.lit(0)),
    ).withColumn("entry", F.concat_ws(":", F.col("gap"), F.col("tf")))
    idx = g.groupBy("term").agg(
        F.count("*").alias("df"),
        F.sum("tf").alias("cf"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "entry"))),
                lambda s: s.getField("entry"),
            ),
            ",",
        ).alias("postings"),
    )
    root = _tmp_root("pyspec_term_idx_")
    write_term_index(idx, root)
    probed = probe_term_index(spark, root, list(_BUCKET_TERMS))
    decoded = decode_postings(probed.select("term", "postings"))
    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return (
        decoded.join(d, "doc_id")
        .select("term", "doc_id", "tf", "n_chars")
        .orderBy("term", "doc_id")
    )


# ---------------------------------------------------------------------------
# L40d incremental index maintenance under the oracle gate (r9) — the
# append-only production story for L40: the base corpus (doc_id < C)
# is indexed in the SHARDED layout (doc-range shards, gaps
# delta-encoded from the shard base) and bucketed by term; the delta
# (doc_id >= C) is then folded in with append_term_index — ONE groupBy
# over the delta plus a vocabulary-sized bucketed append, no rebuild.
# C is deliberately NOT a shard-boundary multiple, so the boundary
# shard is split across the base write and the increment (two rows for
# the same (term, shard)); decode_postings handles that by windowing
# per stored row (gaps are shard-base-relative).  The oracle is the
# spliced FULL-corpus q_inverted_index lookup: increment + base must
# equal a from-scratch rebuild exactly.
#
# 100 TB posture: indexing cost per increment scales with the
# increment; the probed read stays |probed buckets|/64 of the layout
# (SCALING.md r9b); per-row decode windows keep boundary shards merge-
# free.  Bounded-side-effect round-trip (tmp root, zero-jobs exempt).
# ---------------------------------------------------------------------------
_INC_SPLIT, _INC_SHARD = 130, 64


def _index_incremental_oracle() -> str:
    from pyspec_spark.registry import ORACLES

    terms = ", ".join(f"'{t}'" for t in _BUCKET_TERMS)
    return f"""
WITH idx AS ({ORACLES["q_inverted_index"]}),
sel AS (
  SELECT term, string_split(postings, ',') AS es
  FROM idx WHERE term IN ({terms})
),
x AS (
  SELECT term, i AS pos,
         CAST(string_split(es[i], ':')[1] AS BIGINT) AS gap,
         CAST(string_split(es[i], ':')[2] AS BIGINT) AS tf
  FROM sel, LATERAL (SELECT CAST(unnest(range(1, len(es) + 1)) AS INT) AS i) t
),
y AS (
  SELECT term, tf,
         CAST(SUM(gap) OVER (PARTITION BY term ORDER BY pos) AS BIGINT) AS did
  FROM x
)
SELECT y.term, y.did AS doc_id, y.tf
FROM y
ORDER BY term, doc_id
"""


@query("q_index_incremental", oracle=_index_incremental_oracle())
def q_index_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.text import (
        append_term_index,
        decode_postings,
        probe_term_index,
        sharded_postings,
        write_term_index,
    )
    from pyspec_spark.queries.lake_queries import _tmp_root

    tf = _tf(spark, sf_dir)
    base_tf = tf.where(F.col("doc_id") < _INC_SPLIT)
    delta_tf = tf.where(F.col("doc_id") >= _INC_SPLIT)
    root = _tmp_root("pyspec_inc_idx_")
    write_term_index(sharded_postings(base_tf, _INC_SHARD), root)
    append_term_index(delta_tf, root, _INC_SHARD)
    probed = probe_term_index(
        spark,
        root,
        list(_BUCKET_TERMS),
        empty_schema="term STRING, shard BIGINT, df_shard BIGINT, "
        "cf_shard BIGINT, postings STRING",
    )
    decoded = decode_postings(
        probed.select("term", "shard", "postings"), shard_size=_INC_SHARD
    )
    return decoded.select(
        "term", "doc_id", F.col("tf").cast("long").alias("tf")
    ).orderBy("term", "doc_id")


# ---------------------------------------------------------------------------
# L40e index document DELETION under the oracle gate (r10) — the last
# leg of the index lifecycle (build r7, bucketed layout r8, incremental
# append + compaction r9): the engine's own curation output deletes
# documents, and removing them from a built index must not force a
# rebuild.  The query indexes the FULL corpus in the sharded bucketed
# layout, tombstones every doc with doc_id % 5 == 2
# (operators/text.delete_term_index — one bounded doc-id write, no
# index row touched), probes the fixed term set through bucket pruning,
# decodes, and filters through the broadcast tombstone anti-join
# (apply_tombstones).  The oracle is the spliced q_inverted_index SQL
# evaluated over the POST-delete corpus — the no-drift trick: the
# tombstoned read must equal a from-scratch rebuild over the surviving
# documents exactly.  (compact_term_index's physical purge is pinned
# equal to the same rebuild in test_layout.py.)
#
# 100 TB posture: delete cost = the doc-id delta write; read cost adds
# one broadcast anti-join bounded by deletes-since-compact; probe
# stays |probed buckets|/64 of the layout.  Bounded-side-effect
# round-trip (fresh tmp root, zero-jobs exempt).
# ---------------------------------------------------------------------------
_DEL_SHARD = 64
_DEL_PRED_SQL = "doc_id % 5 <> 2"  # survivors; tombstones are the rest


def _index_delete_oracle() -> str:
    from pyspec_spark.registry import ORACLES

    inv = ORACLES["q_inverted_index"]
    assert inv.count("FROM documents") == 1  # the splice rewrites exactly it
    terms = ", ".join(f"'{t}'" for t in _BUCKET_TERMS)
    return f"""
WITH live AS (SELECT * FROM documents WHERE {_DEL_PRED_SQL}),
idx AS ({inv.replace("FROM documents", "FROM live")}),
sel AS (
  SELECT term, string_split(postings, ',') AS es
  FROM idx WHERE term IN ({terms})
),
x AS (
  SELECT term, i AS pos,
         CAST(string_split(es[i], ':')[1] AS BIGINT) AS gap,
         CAST(string_split(es[i], ':')[2] AS BIGINT) AS tf
  FROM sel, LATERAL (SELECT CAST(unnest(range(1, len(es) + 1)) AS INT) AS i) t
),
y AS (
  SELECT term, tf,
         CAST(SUM(gap) OVER (PARTITION BY term ORDER BY pos) AS BIGINT) AS did
  FROM x
)
SELECT y.term, y.did AS doc_id, y.tf
FROM y
ORDER BY term, doc_id
"""


@query("q_index_delete", oracle=_index_delete_oracle())
def q_index_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.text import (
        apply_tombstones,
        decode_postings,
        delete_term_index,
        probe_term_index,
        read_tombstones,
        sharded_postings,
        write_term_index,
    )
    from pyspec_spark.queries.lake_queries import _tmp_root

    tf = _tf(spark, sf_dir)
    root = _tmp_root("pyspec_del_idx_")
    write_term_index(sharded_postings(tf, _DEL_SHARD), root)
    docs = table(spark, sf_dir, "documents")
    delete_term_index(docs.where("doc_id % 5 = 2").select("doc_id"), root)
    probed = probe_term_index(
        spark,
        root,
        list(_BUCKET_TERMS),
        empty_schema="term STRING, shard BIGINT, df_shard BIGINT, "
        "cf_shard BIGINT, postings STRING",
    )
    decoded = decode_postings(
        probed.select("term", "shard", "postings"), shard_size=_DEL_SHARD
    )
    live = apply_tombstones(decoded, read_tombstones(spark, root))
    return live.select(
        "term", "doc_id", F.col("tf").cast("long").alias("tf")
    ).orderBy("term", "doc_id")


# ---------------------------------------------------------------------------
# L40f positional postings + phrase lookup under the oracle gate (r10)
# — the inverted index gains token positions (gap delta-encoded inside
# each posting entry, the same compression discipline as the doc-id
# gaps), and a phrase query runs THROUGH the materialized index: build
# the positional sharded index over the corpus, write it term-bucketed
# to a tmp root, probe ONLY the phrase terms' buckets, decode postings
# + positions in-plan, and intersect the offset-shifted position sets
# per candidate doc (operators/text.phrase_match).  The oracle is the
# DIRECT text scan (tokenize with ordinality, self-join on pos+1) —
# deliberately NOT a splice: the index round-trip must reproduce the
# ground truth a full scan computes, which pins the position encoding,
# the shard windows, and the adjacency math all at once.
#
# 100 TB posture: the index build is the same two exchanges as
# sharded_postings (positions add bytes, not shuffles); the phrase
# probe opens |phrase-term buckets| dirs regardless of vocabulary; the
# intersection is per-candidate-doc array math on already-probed rows.
# Bounded-side-effect round-trip (tmp root, zero-jobs exempt).
# ---------------------------------------------------------------------------
_PHRASE = ("scan", "query")
_PHRASE_SHARD = 64


def _phrase_lookup_oracle() -> str:
    joins = []
    for i, t in enumerate(_PHRASE[1:], start=1):
        joins.append(
            f"JOIN tok t{i} ON t{i}.doc_id = t0.doc_id "
            f"AND t{i}.pos = t0.pos + {i} AND t{i}.term = '{t}'"
        )
    return f"""
WITH tok AS (
  SELECT doc_id, i AS pos, toks[i] AS term
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       LATERAL (SELECT CAST(unnest(range(1, len(toks) + 1)) AS INT) AS i) t
)
SELECT t0.doc_id AS doc_id, CAST(COUNT(*) AS INT) AS n_occ
FROM tok t0 {' '.join(joins)}
WHERE t0.term = '{_PHRASE[0]}'
GROUP BY t0.doc_id
ORDER BY t0.doc_id
"""


@query("q_phrase_lookup", oracle=_phrase_lookup_oracle())
def q_phrase_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.text import (
        decode_positional,
        phrase_match,
        positional_postings,
        probe_term_index,
        write_term_index,
    )
    from pyspec_spark.operators.text import _POSITIONAL_SCHEMA
    from pyspec_spark.queries.lake_queries import _tmp_root

    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("p0", "term")
    ).select("doc_id", "term", (F.col("p0") + 1).alias("pos"))
    root = _tmp_root("pyspec_pos_idx_")
    write_term_index(positional_postings(tok, _PHRASE_SHARD), root)
    probed = probe_term_index(
        spark, root, sorted(set(_PHRASE)), empty_schema=_POSITIONAL_SCHEMA
    )
    decoded = decode_positional(
        probed.select("term", "shard", "postings"), shard_size=_PHRASE_SHARD
    )
    return (
        phrase_match(decoded, list(_PHRASE))
        .select("doc_id", F.col("n_occ").cast("int").alias("n_occ"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# L40f+ proximity lookup under the oracle gate (r10) — the second
# retrieval mode positions unlock: docs where two terms co-occur
# within a token window, with the count of anchor positions that have
# a neighbor (n_near) and the minimum absolute distance (min_dist) —
# the proximity signals rankers consume.  Same round-trip shape as
# q_phrase_lookup (positional index in a tmp root, bucket-pruned
# probe, in-plan array math via operators/text.proximity_match); the
# oracle is again the DIRECT text scan, so the index path must
# reproduce ground truth.
# ---------------------------------------------------------------------------
_PROX_A, _PROX_B, _PROX_WIN = "hash", "join", 3


def _proximity_oracle() -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, i AS pos, toks[i] AS term
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       LATERAL (SELECT CAST(unnest(range(1, len(toks) + 1)) AS INT) AS i) t
),
a AS (SELECT doc_id, pos FROM tok WHERE term = '{_PROX_A}'),
b AS (SELECT doc_id, pos FROM tok WHERE term = '{_PROX_B}'),
p AS (
  SELECT a.doc_id AS doc_id, a.pos AS pa, b.pos AS pb
  FROM a JOIN b ON b.doc_id = a.doc_id
)
SELECT doc_id,
       CAST(COUNT(DISTINCT CASE WHEN ABS(pb - pa) <= {_PROX_WIN}
                 THEN pa END) AS INT) AS n_near,
       CAST(MIN(ABS(pb - pa)) AS BIGINT) AS min_dist
FROM p
GROUP BY doc_id
HAVING COUNT(DISTINCT CASE WHEN ABS(pb - pa) <= {_PROX_WIN} THEN pa END) > 0
ORDER BY doc_id
"""


@query("q_proximity_lookup", oracle=_proximity_oracle())
def q_proximity_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.text import (
        _POSITIONAL_SCHEMA,
        decode_positional,
        positional_postings,
        probe_term_index,
        proximity_match,
        write_term_index,
    )
    from pyspec_spark.queries.lake_queries import _tmp_root

    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("p0", "term")
    ).select("doc_id", "term", (F.col("p0") + 1).alias("pos"))
    root = _tmp_root("pyspec_prox_idx_")
    write_term_index(positional_postings(tok, _PHRASE_SHARD), root)
    probed = probe_term_index(
        spark, root, [_PROX_A, _PROX_B], empty_schema=_POSITIONAL_SCHEMA
    )
    decoded = decode_positional(
        probed.select("term", "shard", "postings"), shard_size=_PHRASE_SHARD
    )
    return (
        proximity_match(decoded, _PROX_A, _PROX_B, _PROX_WIN)
        .select(
            "doc_id",
            F.col("n_near").cast("int").alias("n_near"),
            F.col("min_dist").cast("long").alias("min_dist"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# L40g top-k retrieval WITH SKIPPING (r10) — the serving-side answer
# to "why build an index at all": the previous L40 rows prove the
# lifecycle (build/bucket/append/delete/positions); these two prove
# the index makes QUERIES cheaper than a corpus scan, the block-max
# retrieval family of the public literature (Ding & Suel, SIGIR 2011;
# Broder et al. WAND, CIKM 2003) re-expressed on doc-range shards.
#
# Doc-range sharding changes the classical game: a document d lives in
# shard d÷size for EVERY term it contains, so per-shard statistics sum
# to per-DOCUMENT bounds and the skip argument is exact per doc — no
# cursor alignment, no pointer movement, just relational joins over
# shard ids.  Both queries are EXACT top-k (oracle = straight BM25
# over the corpus in DuckDB); skipping changes what gets decoded,
# never what is returned:
#
# - q_index_topk_and (conjunctive): candidates must contain the
#   RAREST term (min df, read off the probed shard rows without any
#   decode), so only shards where that term appears are decoded for
#   ANY term.  Decode cost scales with df(rarest), not df(frequent) —
#   'dup' appears in 5% of documents, so ~95% of the frequent terms'
#   postings are never exploded.
# - q_index_topk_or (disjunctive): phase 1 scores the rare-term docs
#   exactly (their shards carry all their terms); the k-th best seeds
#   the threshold θ.  Phase 2 keeps only shards whose block-max score
#   bound Σ_t idf·max_tf·(k1+1)/(max_tf+k1·(1−b)) can reach θ−margin
#   (the _blockmax sidecar, probed bucket-pruned; margin 1e-5 covers
#   the round-6 slop, bounds are vs UNROUNDED parts otherwise).  A doc
#   in a dropped shard has total score ≤ the shard bound < θ ≤ the
#   true k-th best, so it cannot enter the top-k — exactness by
#   arithmetic, verified by the oracle.
#
# 100 TB posture: SERVING touches only index artifacts — probe opens
# |query-term buckets|/64 of the layout; df/idf come from shard
# metadata (no decode); doc lengths + (n_docs, avgdl) come from the
# _norms sidecar written at build (the Lucene-norms shape), so no
# retrieval plan ever scans the corpus (test_layout.py pins
# documents.parquet out of inputFiles); the decode explode + cumsum
# window — the only corpus-proportional work — runs over the kept
# shards only.  test_layout.py pins kept ⊂ probed on a skewed
# synthetic corpus; SCALING.md r10b measures the decoded fraction.
# Bounded-side-effect round-trip (fresh tmp root, zero-jobs exempt).
# ---------------------------------------------------------------------------
_TOPK_TERMS = ("dup", "filter", "spark")
_TOPK_SHARD = 64
_TOPK_K = 10
_SHARDED_SCHEMA = (
    "term STRING, shard BIGINT, df_shard BIGINT, "
    "cf_shard BIGINT, postings STRING"
)


def _topk_oracle(conjunctive: bool) -> str:
    terms = ", ".join(f"('{t}')" for t in _TOPK_TERMS)
    cand = (
        f"""
cand AS (
  SELECT doc_id FROM tf GROUP BY doc_id
  HAVING COUNT(DISTINCT term) = {len(_TOPK_TERMS)}
),"""
        if conjunctive
        else ""
    )
    cand_join = "JOIN cand USING (doc_id)" if conjunctive else ""
    return f"""
WITH q(term) AS (VALUES {terms}),
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
),{cand}
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
  {cand_join}
  JOIN idf USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats
)
SELECT doc_id, ROUND(SUM(part), 6) AS bm25
FROM scored
GROUP BY doc_id
ORDER BY bm25 DESC, doc_id
LIMIT {_TOPK_K}
"""


def _build_topk_index(spark: SparkSession, sf_dir: str, prefix: str) -> str:
    """Index build for the retrieval queries: sharded postings +
    the ``_norms`` length sidecar, so SERVING afterwards touches only
    index artifacts (the corpus-scan-free gate in test_layout.py pins
    documents.parquet out of the retrieval plan's inputFiles)."""
    from pyspec_spark.operators.text import (
        sharded_postings,
        write_norms,
        write_term_index,
    )
    from pyspec_spark.queries.lake_queries import _tmp_root

    root = _tmp_root(prefix)
    write_term_index(sharded_postings(_tf(spark, sf_dir), _TOPK_SHARD), root)
    docs = table(spark, sf_dir, "documents")
    # norms bucketed at the posting shards' own doc-range granularity
    # (candidate ranges map 1:1 onto norm buckets) + the 1-row
    # collection stats — serving never aggregates the corpus again
    write_norms(
        docs.select("doc_id", F.size(F.split("text", " ")).alias("dl")),
        root,
        shard_size=_TOPK_SHARD,
    )
    return root


def _topk_index_parts(
    spark: SparkSession,
    root: str,
    terms: tuple[str, ...] = _TOPK_TERMS,
    empty_schema: str = _SHARDED_SCHEMA,
):
    """Shared retrieval plumbing over a built index root — EVERY input
    is an index artifact: probed shard rows, full-corpus per-term df
    (summed off shard metadata — no decode), round-6 idf, the rarest
    term (min df, term tiebreak), and doc lengths + the 1-row
    (n_docs, avgdl) stats from the _norms sidecar (one narrow
    index-local scan, never the corpus).  ONE definition of the idf /
    stats arithmetic for every retrieval family (L40g and the L40h
    reranker), so the rounding discipline cannot drift between them."""
    from pyspec_spark.operators.text import (
        assert_norms_current,
        probe_term_index,
        read_norm_stats,
        read_norms,
    )

    # the stale-norms gate (r11, L40j): refuse to serve if a postings
    # append landed without its norms — the dl inner join below would
    # otherwise silently drop every appended document from top-k
    assert_norms_current(root)
    # and the tombstone gate: this fast path does NOT tombstone-filter
    # or live-correct df/idf/avgdl, so serving a deleted-from index
    # here would silently return deleted documents with stale stats —
    # q_index_maintained_topk's serve path handles tombstones exactly;
    # compaction retires them
    from pyspec_spark.operators.text import _TOMBSTONE_DIR, _existing_paths

    if _existing_paths(spark, [f"{root}/{_TOMBSTONE_DIR}"]):
        raise RuntimeError(
            f"tombstones present under {root}: this serving path does "
            "not filter deletes — serve via the maintained-index path "
            "(tombstone-corrected stats) or compact_maintained_index "
            "first"
        )
    dl = read_norms(spark, root)
    # (n_docs, avgdl) from the build-time stats sidecar: sum_dl is an
    # exact bigint, so sum/count equals the corpus aggregate to the
    # last bit (integer-valued doubles below 2^53 add exactly) — and
    # the per-query corpus-length reduction is gone
    stats = read_norm_stats(spark, root)
    probed = probe_term_index(
        spark, root, list(terms), empty_schema=empty_schema
    )
    dfs = probed.groupBy("term").agg(F.sum("df_shard").alias("df"))
    rare = dfs.orderBy("df", "term").limit(1).select("term")
    idf = dfs.crossJoin(F.broadcast(stats)).select(
        "term",
        F.round(
            F.log(
                1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
            6,
        ).alias("idf"),
    )
    return probed, dfs, rare, idf, dl, stats


def _bm25_part() -> Column:
    return F.round(
        F.col("idf")
        * (F.col("tf") * (_BM25_K1 + 1.0))
        / (
            F.col("tf")
            + _BM25_K1
            * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
        ),
        6,
    )


def _score_decoded(
    decoded: DataFrame,
    idf: DataFrame,
    dl: DataFrame,
    stats: DataFrame,
    group_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """(term, [extra group cols,] doc_id, tf) -> (*group_cols, n_terms,
    bm25): round-6 parts (idf broadcast, dl join, 1-row stats
    broadcast), summed per group.  The single-query retrieval family
    groups per doc; batch retrieval (L40i) passes
    ("query_id", "doc_id") so the SAME scoring definition serves the
    whole workload — the arithmetic cannot drift between the faces."""
    return (
        decoded.join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(*group_cols, _bm25_part().alias("part"))
        .groupBy(*group_cols)
        .agg(
            F.count("*").alias("n_terms"),
            F.round(F.sum("part"), 6).alias("bm25"),
        )
    )


@query("q_index_topk_and", oracle=_topk_oracle(conjunctive=True))
def q_index_topk_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.text import decode_postings, probe_norms

    root = _build_topk_index(spark, sf_dir, "pyspec_topk_and_")
    probed, dfs, rare, idf, dl, stats = _topk_index_parts(spark, root)
    # conjunctive skip: every candidate doc contains the rarest term,
    # and doc-range sharding puts a doc in the SAME shard id for every
    # term — so restricting ALL terms to the rare term's shard set
    # loses no candidate while skipping the frequent terms' postings
    # everywhere the rare term is absent.  The shard set is resolved
    # DRIVER-side (two bounded collects over the probed metadata —
    # |terms| rows, then ≤ df(rarest)÷shard_size shard ids, the
    # probe_term_index literal-list pattern): candidate NORM buckets
    # are then literal directories too, so doc lengths are read
    # bucket-pruned (probe_norms) instead of corpus-length.  The rare
    # term comes from the helper's ONE definition of the min-df/term
    # tiebreak (collected, not re-derived — two copies of that logic
    # could silently desynchronize the AND pruning from the OR
    # phase-1 seeding).
    rare_rows = rare.collect()
    shard_ids = (
        sorted(
            r["shard"]
            for r in probed.where(F.col("term") == rare_rows[0]["term"])
            .select("shard")
            .distinct()
            .collect()
        )
        if rare_rows
        else []
    )
    cand_shards = spark.createDataFrame(
        [(int(s),) for s in shard_ids], "shard BIGINT"
    )
    kept = probed.join(F.broadcast(cand_shards), "shard", "left_semi")
    decoded = decode_postings(
        kept.select("term", "shard", "postings"), shard_size=_TOPK_SHARD
    )
    dl_pruned = probe_norms(spark, root, shard_ids)
    return (
        _score_decoded(decoded, idf, dl_pruned, stats)
        .where(F.col("n_terms") == len(_TOPK_TERMS))
        .select("doc_id", "bm25")
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(_TOPK_K)
    )


_BM_MARGIN = 1e-5  # covers round-6 slop: ≤3 parts x 5e-7 + final 5e-7


@query("q_index_topk_or", oracle=_topk_oracle(conjunctive=False))
def q_index_topk_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.text import (
        decode_postings,
        probe_block_max,
        write_block_max,
    )

    root = _build_topk_index(spark, sf_dir, "pyspec_topk_or_")
    # sidecar derives from the WRITTEN rows (vocabulary-sized re-scan,
    # never a second corpus pass); explicit schema so an EMPTY corpus
    # (index root with no bucket files) reads as an empty frame
    # instead of failing schema inference
    write_block_max(
        spark.read.schema(_SHARDED_SCHEMA).parquet(root), root
    )
    probed, dfs, rare, idf, dl, stats = _topk_index_parts(spark, root)

    # ---- phase 1: exact scores for every doc containing the rare term
    cand_shards = (
        probed.join(F.broadcast(rare), "term", "left_semi")
        .select("shard")
        .distinct()
    )
    kept1 = probed.join(F.broadcast(cand_shards), "shard", "left_semi")
    decoded1 = decode_postings(
        kept1.select("term", "shard", "postings"), shard_size=_TOPK_SHARD
    )
    scores1 = _score_decoded(decoded1, idf, dl, stats)
    rare_docs = (
        decoded1.join(F.broadcast(rare), "term", "left_semi")
        .select("doc_id")
        .distinct()
    )
    seed = scores1.join(F.broadcast(rare_docs), "doc_id", "left_semi")
    # θ = k-th best seed score; fewer than k seeds → -inf (no skip,
    # still exact)
    top_seed = seed.orderBy(F.desc("bm25"), "doc_id").limit(_TOPK_K)
    theta = top_seed.agg(
        F.when(F.count("*") >= _TOPK_K, F.min("bm25"))
        .otherwise(F.lit(float("-inf")))
        .alias("theta")
    )

    # ---- phase 2: block-max shard bounds for the non-rare terms.
    # The bound table LEFT-joins the sidecar onto the PROBED shard
    # rows: a posting row with no sidecar coverage (sidecar missing
    # after a compaction, or a failed sidecar write) has an UNKNOWN
    # bound and must be KEPT — probe_block_max's contract is that a
    # degraded sidecar costs decode work, never correctness.  Dropping
    # a shard is only legal when EVERY non-rare posting row in it has
    # a known bound and their sum still misses θ.
    bm = probe_block_max(spark, root, list(_TOPK_TERMS))
    ub = (
        probed.join(F.broadcast(rare), "term", "left_anti")
        .select("term", "shard")
        .join(bm, ["term", "shard"], "left")
        .join(F.broadcast(idf), "term")
        .select(
            "shard",
            (
                F.col("idf")
                * (F.col("max_tf") * (_BM25_K1 + 1.0))
                / (F.col("max_tf") + _BM25_K1 * (1.0 - _BM25_B))
            ).alias("ub"),
        )
        .groupBy("shard")
        .agg(
            F.sum("ub").alias("tot_ub"),
            F.sum(F.when(F.col("ub").isNull(), 1).otherwise(0)).alias(
                "n_unknown"
            ),
        )
    )
    kept2_shards = (
        ub.crossJoin(F.broadcast(theta))
        .where(
            (F.col("n_unknown") > 0)
            | (F.col("tot_ub") >= F.col("theta") - _BM_MARGIN)
        )
        .select("shard")
        .join(F.broadcast(cand_shards), "shard", "left_anti")
    )
    decoded2 = decode_postings(
        probed.join(F.broadcast(rare), "term", "left_anti")
        .join(F.broadcast(kept2_shards), "shard", "left_semi")
        .select("term", "shard", "postings"),
        shard_size=_TOPK_SHARD,
    )
    # docs without the rare term: exact OR scores.  In cand shards they
    # were already decoded (scores1 minus the seed set); in kept2
    # shards they come from decoded2; in dropped shards their score is
    # ≤ tot_ub < θ and cannot place.
    others = scores1.join(
        F.broadcast(rare_docs), "doc_id", "left_anti"
    ).unionByName(_score_decoded(decoded2, idf, dl, stats))
    return (
        seed.unionByName(others)
        .select("doc_id", "bm25")
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(_TOPK_K)
    )


# ---------------------------------------------------------------------------
# L40h retrieve-then-rerank (r10) — the full modern LEXICAL serving
# pipeline composed from the index family: BM25 retrieval scored
# entirely off ONE positional index (tf = position-list length, dl +
# corpus stats from the _norms sidecar — corpus-scan-free like L40g),
# then a proximity RERANK of the candidate pool: docs where the two
# query terms sit near each other get boosted by
# score = ROUND(bm25 · (1 + 1/(2 + min_dist)), 6)
# (min_dist from the same decoded positions — one index serves both
# stages, which is exactly why production indexes store positions).
# Docs lacking either term keep score = bm25 (no positions, no
# boost).  Pool = top-20 by bm25 with doc_id tiebreak, output =
# top-10 by reranked score — both cutoffs deterministic round-6
# (the q_tfidf_topk rule), so DuckDB replays the whole pipeline.
#
# 100 TB posture: identical to L40g serving (bucket-pruned probe, no
# corpus scan) + the rerank stage runs on ≤20 rows — the candidate
# pool is where reranking cost lives no matter how fancy the second
# stage gets, and the pool size is a constant.
# ---------------------------------------------------------------------------
_RR_A, _RR_B = "hash", "join"
_RR_POOL, _RR_K = 20, 10


def _rerank_oracle() -> str:
    return f"""
WITH q(term) AS (VALUES ('{_RR_A}'), ('{_RR_B}')),
dl AS (
  SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
),
stats AS (
  SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl
),
tok AS (
  SELECT doc_id, i AS pos, toks[i] AS term
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       LATERAL (SELECT CAST(unnest(range(1, len(toks) + 1)) AS INT) AS i) t
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok
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
  FROM tf JOIN idf USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
),
pool AS (
  SELECT doc_id, ROUND(SUM(part), 6) AS bm25
  FROM scored GROUP BY doc_id
  ORDER BY bm25 DESC, doc_id LIMIT {_RR_POOL}
),
a AS (SELECT doc_id, pos FROM tok WHERE term = '{_RR_A}'),
b AS (SELECT doc_id, pos FROM tok WHERE term = '{_RR_B}'),
mind AS (
  SELECT a.doc_id AS doc_id, CAST(MIN(ABS(b.pos - a.pos)) AS BIGINT) AS md
  FROM a JOIN b ON b.doc_id = a.doc_id GROUP BY a.doc_id
)
SELECT pool.doc_id, pool.bm25,
       COALESCE(mind.md, -1) AS min_dist,
       ROUND(pool.bm25 * (1.0 + CASE WHEN mind.md IS NULL THEN 0.0
             ELSE 1.0 / (2.0 + mind.md) END), 6) AS score
FROM pool LEFT JOIN mind USING (doc_id)
ORDER BY score DESC, doc_id
LIMIT {_RR_K}
"""


@query("q_proximity_rerank", oracle=_rerank_oracle())
def q_proximity_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.text import (
        _POSITIONAL_SCHEMA,
        decode_positional,
        positional_postings,
        write_norms,
        write_term_index,
    )
    from pyspec_spark.queries.lake_queries import _tmp_root

    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("p0", "term")
    ).select("doc_id", "term", (F.col("p0") + 1).alias("pos"))
    root = _tmp_root("pyspec_rerank_idx_")
    write_term_index(positional_postings(tok, _TOPK_SHARD), root)
    write_norms(
        docs.select("doc_id", F.size(F.split("text", " ")).alias("dl")),
        root,
        shard_size=_TOPK_SHARD,
    )
    # Unlike q_index_topk_and, the pool stage here scores EVERY doc
    # holding either (frequent) query term, so the candidate shard set
    # is ~all shards and the norms read stays the full (narrow,
    # column-pruned) sidecar — the bucket-pruned probe_norms path is
    # the rare-term story; a serving deployment composes both.

    # ---- retrieval stage, index artifacts only (shared plumbing:
    # idf/stats arithmetic is _topk_index_parts', never re-derived)
    probed, dfs, _rare, idf, dl, stats = _topk_index_parts(
        spark, root, terms=(_RR_A, _RR_B), empty_schema=_POSITIONAL_SCHEMA
    )
    decoded = decode_positional(
        probed.select("term", "shard", "postings"), shard_size=_TOPK_SHARD
    )
    pool = (
        _score_decoded(decoded.select("term", "doc_id", "tf"), idf, dl, stats)
        .select("doc_id", "bm25")
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(_RR_POOL)
    )

    # ---- rerank stage: min term distance from the SAME decoded
    # positions.  Both position streams are FIRST restricted to the
    # ≤20-row pool (broadcast semi-join) — without that, the pairwise
    # |pa|×|pb| distance expansion and the broadcast of its result
    # would be corpus-proportional for common terms, exactly the cost
    # the constant-size pool exists to cap.
    pool_ids = pool.select("doc_id")
    a = decoded.where(F.col("term") == _RR_A).join(
        F.broadcast(pool_ids), "doc_id", "left_semi"
    ).select("doc_id", F.col("positions").alias("_pa"))
    b = decoded.where(F.col("term") == _RR_B).join(
        F.broadcast(pool_ids), "doc_id", "left_semi"
    ).select("doc_id", F.col("positions").alias("_pb"))
    mind = (
        a.join(b, "doc_id")
        .select(
            "doc_id",
            F.array_min(
                F.flatten(
                    F.transform(
                        "_pa",
                        lambda pa: F.transform(
                            "_pb", lambda pb: F.abs(pb - pa)
                        ),
                    )
                )
            ).alias("md"),
        )
    )
    boost = F.when(F.col("md").isNull(), F.lit(0.0)).otherwise(
        1.0 / (2.0 + F.col("md"))
    )
    return (
        pool.join(F.broadcast(mind), "doc_id", "left")
        .select(
            "doc_id",
            "bm25",
            F.coalesce(F.col("md"), F.lit(-1)).cast("long").alias("min_dist"),
            F.round(F.col("bm25") * (1.0 + boost), 6).alias("score"),
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(_RR_K)
    )


# ---------------------------------------------------------------------------
# L40i — BATCH multi-query retrieval (r10): the offline-serving shape
# that is genuinely Spark's home turf at 100 TB.  Online serving
# probes per query (q_index_topk_*); but training-data pipelines score
# query WORKLOADS — relevance mining, eval-set construction, hard-
# negative harvesting — where thousands of queries arrive as a TABLE
# and per-query probing would launch thousands of jobs.  The batch
# plan scores every query in ONE pass:
#
#   union of query terms -> ONE bucket-pruned probe + ONE decode
#   (each posting decoded once, shared by every query containing its
#   term) -> fan-out via a BROADCAST join onto the (query_id, term)
#   map (map-side: the corpus-proportional side never shuffles for
#   the fan-out) -> one (query_id, doc_id) aggregation -> per-query
#   top-k window.
#
# Cost model vs a per-query loop: the loop pays |Q| probes and decodes
# shared terms |Q_t| times; the batch plan pays ONE decode of the term
# union and one shuffle of the scored pairs — decode work scales with
# |union terms|, not |Q| (SCALING r10f measures the crossover).  idf /
# (n_docs, avgdl) come from shard metadata + the _norms sidecar
# (corpus-scan-free, the L40g gate), and are query-independent, so
# they are computed once for the union.
#
# Exact, not approximate: every (query, doc) pair containing any query
# term is scored — the oracle replays the same BM25 per query in SQL.
# Bounded side effect (index build into a fresh tmp root); exempt from
# the zero-jobs gate as a materializing round-trip.
# ---------------------------------------------------------------------------
_BATCH_QUERIES: dict[int, tuple[str, ...]] = {
    1: ("dup", "filter"),
    2: ("spark", "hash"),
    3: ("window", "dup"),
    4: ("filter", "spark", "hash"),
}
_BATCH_K = 10


def _batch_oracle() -> str:
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, ts in sorted(_BATCH_QUERIES.items()) for t in ts
    )
    return f"""
WITH q(query_id, term) AS (VALUES {vals}),
dl AS (
  SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
),
stats AS (
  SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term IN (SELECT DISTINCT term FROM q)
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
  SELECT q.query_id, tf.doc_id,
         ROUND(idf.idf * (tf.tf * ({_BM25_K1} + 1.0))
               / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                  + {_BM25_B} * dl.dl / stats.avgdl)), 6) AS part
  FROM tf
  JOIN q USING (term)
  JOIN idf USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats
),
agg AS (
  SELECT query_id, doc_id, COUNT(*) AS n_terms, ROUND(SUM(part), 6) AS bm25
  FROM scored GROUP BY query_id, doc_id
)
SELECT CAST(query_id AS INT) AS query_id, doc_id,
       CAST(n_terms AS BIGINT) AS n_terms, bm25
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY bm25 DESC, doc_id) AS rn
      FROM agg)
WHERE rn <= {_BATCH_K}
"""


@query("q_batch_retrieval", oracle=_batch_oracle())
def q_batch_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.text import decode_postings

    root = _build_topk_index(spark, sf_dir, "pyspec_batch_idx_")
    union_terms = tuple(
        sorted({t for ts in _BATCH_QUERIES.values() for t in ts})
    )
    probed, _dfs, _rare, idf, dl, stats = _topk_index_parts(
        spark, root, terms=union_terms
    )
    # ONE decode of the term union — each posting shard explodes once,
    # shared by every query that references its term
    decoded = decode_postings(
        probed.select("term", "shard", "postings"), shard_size=_TOPK_SHARD
    )
    qmap = spark.createDataFrame(
        [(qid, t) for qid, ts in sorted(_BATCH_QUERIES.items()) for t in ts],
        "query_id INT, term STRING",
    )
    # fan-out to queries is a BROADCAST join: the workload table is
    # the small side by construction (queries fit one executor; the
    # corpus-proportional decoded stream never shuffles here).  Scoring
    # is the retrieval family's ONE definition, grouped per (query,
    # doc) instead of per doc.
    scored = _score_decoded(
        decoded.join(F.broadcast(qmap), "term"),
        idf,
        dl,
        stats,
        group_cols=("query_id", "doc_id"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("bm25"), "doc_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _BATCH_K)
        .select("query_id", "doc_id", "n_terms", "bm25")
    )


# ---------------------------------------------------------------------------
# L40j (r11) — MAINTAINED-index retrieval: the integration of the
# maintenance family (L40d append / L40e delete) with BM25 serving
# (L40g), closing round-10's declared gap: append_term_index left the
# _norms/_blockmax sidecars stale, and _score_decoded's dl INNER join
# silently excluded every appended document from top-k — a
# wrong-answer trap, not a slowdown.  This query runs the full
# production lifecycle on one root — base build (3/4 of the corpus)
# via build_maintained_index, append of the remaining 1/4 via
# append_maintained_index (postings + blockmax + norms + lockstep
# markers in one call), tombstone deletion of doc_id % 7 == 2 across
# BOTH generations — and then SERVES top-k from index artifacts only:
#
# - candidates: probe + decode the query terms' shards, tombstones
#   anti-joined out (broadcast, bounded by deletes-since-compact);
# - df per term: counted off the decoded LIVE rows (the disjunctive
#   serve decodes the probed terms fully anyway, so live df is free —
#   the block-max skip variants stay for compacted roots);
# - collection stats: the _norms_stats row MINUS the tombstoned docs'
#   contribution (deleted_corpus_stats — exact bigint subtraction over
#   ≤|tombstones| norm buckets), so n_docs/avgdl/idf equal a
#   from-scratch rebuild over the live corpus to the last bit;
# - doc lengths: probe_norms over the probed shards' id list (bucket-
#   pruned; appended docs present because the facade appended their
#   norms — the exact rows the round-10 gap lost).
#
# Oracle: the disjunctive BM25 SQL spliced onto the LIVE corpus
# (base ∪ appended = all documents, minus the deletes) — the L40d/e
# no-drift trick: maintained serving must equal a clean rebuild
# exactly.  Bounded-side-effect round-trip (fresh tmp root,
# zero-jobs exempt).  100 TB posture: build/append costs are the
# delta-sized maintenance passes; serving reads only probed buckets,
# probed-shard norm buckets, tombstones, and two 1-row stats frames.
# ---------------------------------------------------------------------------
_MAINT_DEL_SQL = "doc_id % 7 <> 2"  # survivors


def _maintained_topk_oracle() -> str:
    base = _topk_oracle(conjunctive=False)
    assert base.count("FROM documents") == 2  # dl + tf CTEs — splice both
    return base.replace(
        "FROM documents",
        f"FROM (SELECT * FROM documents WHERE {_MAINT_DEL_SQL})",
    )


@query("q_index_maintained_topk", oracle=_maintained_topk_oracle())
def q_index_maintained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.text import (
        append_maintained_index,
        build_maintained_index,
        delete_term_index,
    )
    from pyspec_spark.queries.lake_queries import _tmp_root

    docs = table(spark, sf_dir, "documents")
    tf = _tf(spark, sf_dir)
    dl = docs.select("doc_id", F.size(F.split("text", " ")).alias("dl"))
    root = _tmp_root("pyspec_maint_idx_")
    gen = F.col("doc_id") % 4 == 3  # the appended generation
    build_maintained_index(
        spark, tf.where(~gen), dl.where(~gen), root, _TOPK_SHARD
    )
    append_maintained_index(
        spark, tf.where(gen), dl.where(gen), root, _TOPK_SHARD
    )
    delete_term_index(docs.where("doc_id % 7 = 2").select("doc_id"), root)
    return serve_maintained_topk(
        spark, root, list(_TOPK_TERMS), _TOPK_K, _TOPK_SHARD
    )


def serve_maintained_topk(
    spark: SparkSession,
    root: str,
    terms: list[str],
    k: int,
    shard_size: int,
) -> DataFrame:
    """Disjunctive BM25 top-k over a MAINTAINED index root (appends +
    pending tombstones) — index artifacts only, corpus-scan-free, and
    EXACTLY equal to a from-scratch rebuild over the live corpus:

    - candidates: probe + decode the query terms' shards, tombstones
      anti-joined out (broadcast, bounded by deletes-since-compact);
    - per-term df counted off the decoded LIVE rows (the disjunctive
      serve decodes the probed terms fully anyway, so live df is free
      — the block-max skip variants remain for compacted roots);
    - collection stats: the exact bigint `_norms_stats` totals MINUS
      the tombstoned docs' contribution (`deleted_corpus_stats`), so
      n_docs/avgdl/idf match the post-delete corpus bit-for-bit;
    - doc lengths: probe_norms over the probed shards' id list
      (bucket-pruned; the driver-side shard list is bounded by the
      probed terms' shard metadata, the probe_term_index pattern).

    This is the operator behind q_index_maintained_topk; bench.py's
    `serving` block tracks its warm path round-over-round."""
    from pyspec_spark.operators.text import (
        apply_tombstones,
        assert_norms_current,
        decode_postings,
        deleted_corpus_stats,
        probe_norms,
        probe_term_index,
        read_norm_stats_raw,
        read_tombstones,
    )

    assert_norms_current(root)
    probed = probe_term_index(
        spark, root, terms, empty_schema=_SHARDED_SCHEMA
    )
    decoded = decode_postings(
        probed.select("term", "shard", "postings"), shard_size=shard_size
    )
    # NOT persisted: the two consumers (live df below, scoring) each
    # re-decode the probed shards — bounded work (SCALING r10b) —
    # whereas a persist here would leak one cached candidate frame per
    # serve call in a long-lived session (no post-action unpersist
    # hook exists on a returned plan); callers wanting single-decode
    # latency can persist/unpersist around the call
    live = apply_tombstones(decoded, read_tombstones(spark, root))
    # live collection stats: build-time totals minus the tombstoned
    # contribution — both exact bigints, so the division reproduces
    # the post-delete corpus aggregate bit-for-bit
    stats = (
        read_norm_stats_raw(spark, root)
        .crossJoin(
            F.broadcast(deleted_corpus_stats(spark, root, shard_size))
        )
        .select(
            (F.col("n_docs") - F.col("n_deleted")).alias("n_docs"),
            (
                (F.col("sum_dl") - F.col("dl_deleted")).cast("double")
                / (F.col("n_docs") - F.col("n_deleted"))
            ).alias("avgdl"),
        )
    )
    idf = (
        live.groupBy("term")
        .agg(F.count("*").alias("df"))
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            F.round(
                F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                ),
                6,
            ).alias("idf"),
        )
    )
    # bounded driver-side collect: |probed (term, shard) metadata rows|
    shard_ids = sorted(
        r["shard"] for r in probed.select("shard").distinct().collect()
    )
    dl_pruned = probe_norms(spark, root, shard_ids)
    return (
        _score_decoded(live, idf, dl_pruned, stats)
        .select("doc_id", "bm25")
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(k)
    )
