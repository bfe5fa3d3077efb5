"""LLM-data-pipeline queries over `documents` (SURVEY.md §2.12, Stage 4).

Pure north-star extensions (no reference analog — the reference is an
x-ray toolkit); these are the operations a 100 TB training-data pipeline
needs, declared with oracles where SQL-expressible.  The heavier
operators (MinHash-LSH, SimHash, ANN search) live in
``pyspec_spark/operators/`` and surface here as rows-only queries.

Scale notes:
- Exact dedup is groupBy(md5) — hash-partitioned, no skew (uniform hash).
- The n-gram Jaccard near-dup is the *inverted-index* self-join: explode
  distinct shingles, equi-join on shingle, count co-occurrences.  Its
  scale failure mode is hot shingles (stopword bigrams appearing in most
  docs); production mitigation = drop shingles with document frequency
  above a cutoff (same trick as stop-word removal), which also bounds
  the join fan-out.  A df-cutoff is applied here for exactly that reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspec_spark.registry import query
from pyspec_spark.tables import table


# ---------------------------------------------------------------------------
# L1 — exact dedup: canonical doc per text hash.
# ---------------------------------------------------------------------------
@query(
    "q_dedup_docs",
    oracle="""
SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
FROM documents
GROUP BY 1
""",
)
def q_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.groupBy(F.md5(F.col("text").cast("binary")).alias("text_hash")).agg(
        F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies")
    )


# ---------------------------------------------------------------------------
# L1+/L2 — cross-source duplication matrix (r7): which sources copy
# from which, measured at the token-n-gram level (the Lee et al. 2022
# granularity, since verbatim whole-document sharing is rare while
# shared spans are the actual double-counting a mixture designer pays
# for).  One row per unordered source pair with the number of DISTINCT
# 8-gram hashes both emit.
#
# Plan: map-only gram expansion, ONE corpus shuffle on gram hash
# (groupBy md5 + collect_set of sources — the set is bounded by
# |sources|, never by occurrence count), then a MAP-SIDE pair expansion
# of each sorted source set (<= |sources|²/2 structs per gram) and a
# tiny aggregation on source-pair keys.  The naive form is a gram
# self-join — a second corpus-sized shuffle plus a join — which the
# oracle uses because DuckDB handles it fine at oracle scale, while the
# set-expansion form is the one that survives 100 TB.
# ---------------------------------------------------------------------------
_OVL_N = 8


def _grams8_md5(d: DataFrame) -> DataFrame:
    """(source, h) — md5 of every position's 8-token gram.

    r13 session 3 (guide §4.2, offsets over one buffer): because the
    tokenizer is a SINGLE-SPACE split and the gram joiner is a single
    space, the 8-token gram at position i is exactly the BYTE SLICE of
    the original UTF-8 text between token i's first byte and token
    (i+7)'s last byte — space (0x20) can never appear inside a
    multi-byte UTF-8 sequence, so byte positions of spaces ARE the
    token boundaries.  The former zip_with chain materialized every
    gram string (allocation + copy per gram was the measured 4.7 s
    stage CPU at sf0.1 — the r13 session-1 entry recorded that cost as
    the construction itself); this mapInArrow kernel materializes
    NOTHING: one np.flatnonzero over the text's byte buffer finds the
    boundaries and each digest is md5 over a memoryview slice.
    Digests are bit-identical (md5 over the same bytes; verified as an
    identical (source, h) MULTISET against the zip_with form over the
    full sf0.1 corpus, and oracle hash-green), so every downstream
    aggregate is unchanged.  Measured: 235 704 grams in 0.38 s
    single-thread vs 4.7 s JVM stage CPU — ~12x less CPU per corpus
    byte for the gram+hash term, the 100 TB lever this family needed;
    whole-query same-session A/B (cold noop exec, sf0.1): JVM executor
    CPU 34.3 -> 23.7 s, wall flat (floor-bound at this scale).
    Columns are pruned to (source, text) by the caller per guide §4.1
    so the Python boundary ships only what the kernel reads.

    Input: (source, text).  Sub-n-token and NULL texts emit nothing
    (same as the former size(w) >= n guard / null-split semantics).
    """
    import pyarrow as pa

    n = _OVL_N

    def kernel(batches):
        import hashlib

        import numpy as np

        md5 = hashlib.md5
        for batch in batches:
            srcs = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            out_s: list[str] = []
            out_h: list[str] = []
            for s, txt in zip(srcs, texts):
                if txt is None:
                    continue
                b = txt.encode("utf-8")
                arr = np.frombuffer(b, dtype=np.uint8)
                sp = np.flatnonzero(arr == 32)
                n_tok = len(sp) + 1
                if n_tok < n:
                    continue
                starts = np.empty(n_tok, dtype=np.int64)
                starts[0] = 0
                starts[1:] = sp + 1
                ends = np.empty(n_tok, dtype=np.int64)
                ends[:-1] = sp
                ends[-1] = len(b)
                mv = memoryview(b)
                for i in range(n_tok - n + 1):
                    out_s.append(s)
                    out_h.append(md5(mv[starts[i] : ends[i + n - 1]]).hexdigest())
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_s, type=pa.string()), pa.array(out_h, type=pa.string())],
                names=["source", "h"],
            )

    return d.select("source", "text").mapInArrow(kernel, "source string, h string")


@query(
    "q_source_overlap",
    oracle=f"""
WITH t AS (SELECT source, string_split(text, ' ') AS w FROM documents),
g AS (
  SELECT DISTINCT source,
         md5(array_to_string(w[i:i+{_OVL_N - 1}], ' ')) AS h
  FROM t, unnest(range(1, len(w) - {_OVL_N - 2})) AS u(i)
)
SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_shared_grams
FROM g a JOIN g b ON a.h = b.h AND a.source < b.source
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.tables import fanout

    # r13 (guide §2): fanout first — the gram build ran single-core
    # below the one-split scan (downstream: counts + array_sort(
    # collect_set) — order-safe; no-op at scale).  Gram build via the
    # shared byte-slice mapInArrow kernel (_grams8_md5).
    d = fanout(table(spark, sf_dir, "documents"), "doc_id").select(
        "source", "text"
    )
    grams = _grams8_md5(d)
    ss = (
        grams.groupBy("h")
        .agg(F.array_sort(F.collect_set("source")).alias("ss"))
        .where(F.size("ss") >= 2)
    )
    # r13 (second pass): pair expansion as parsed SQL (same tree;
    # named_struct == struct(x.alias(...), ...)).
    pairs = (
        "flatten(transform(ss, (x, i) ->"
        " transform(slice(ss, i + 2, size(ss)),"
        " y -> named_struct('src_a', x, 'src_b', y))))"
    )
    return (
        ss.selectExpr(f"explode({pairs}) AS p")
        .groupBy(F.col("p.src_a").alias("src_a"), F.col("p.src_b").alias("src_b"))
        .agg(F.count("*").alias("n_shared_grams"))
        .orderBy("src_a", "src_b")
    )


# ---------------------------------------------------------------------------
# L1++/L2 — source-overlap via THETA SKETCHES (r11): the sketch-family
# completion — CMS (frequency), HLL (distinct), KLL (quantiles), Bloom
# (membership) were already in; Theta (Datasketches) adds mergeable SET
# OPERATIONS: |A ∩ B| / |A \ B| estimates between distinct-gram sets,
# which HLL cannot serve (union-only registers).  Same question as
# q_source_overlap (which sources share 8-gram content) at the scale
# where the exact answer's corpus-keyed shuffle is the bottleneck:
#
#   exact form:  ONE corpus shuffle on gram hash (collect_set sources)
#   sketch form: ZERO corpus-keyed shuffles — theta_sketch_agg folds
#     map-side per partition, the only exchange carries |sources| ×
#     |partitions| sketch blobs (KBs each), and the pairwise
#     intersections run over |sources|² rows.
#
# Rows-only by SURVEY §2 policy (theta estimates are randomized);
# correctness pinned in pytest: pairwise estimates within the sketch's
# relative-error bound of the exact n_shared_grams, and the per-source
# distinct-gram estimates within bound of exact counts.  Also the
# maintained story: theta sketches merge (theta_union), so per-source
# sketches maintained incrementally serve any FUTURE pair's overlap
# without re-reading either corpus — the rollup-sketch argument
# applied to set algebra.
# ---------------------------------------------------------------------------
@query("q_source_overlap_sketch")
def q_source_overlap_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("source", "text")
    grams = _grams8_md5(d)  # r13: shared byte-slice gram kernel (see helper)
    sk = grams.groupBy("source").agg(F.theta_sketch_agg("h").alias("sk"))
    a = sk.select(
        F.col("source").alias("src_a"), F.col("sk").alias("sk_a")
    )
    b = sk.select(
        F.col("source").alias("src_b"), F.col("sk").alias("sk_b")
    )
    # |sources|² pair table — bounded metadata, broadcast by size
    return (
        a.join(F.broadcast(b), F.col("src_a") < F.col("src_b"))
        .select(
            "src_a",
            "src_b",
            F.theta_sketch_estimate(
                F.theta_intersection("sk_a", "sk_b")
            ).cast("long").alias("est_shared_grams"),
            F.theta_sketch_estimate("sk_a").cast("long").alias("est_a"),
            F.theta_sketch_estimate("sk_b").cast("long").alias("est_b"),
        )
        .orderBy("src_a", "src_b")
    )


# ---------------------------------------------------------------------------
# L3 — per-document text statistics (token counting via single-space
# split, verified identical semantics cross-engine on this corpus).
# ---------------------------------------------------------------------------
@query(
    "q_text_stats",
    oracle="""
SELECT doc_id,
       length(text) AS n_char,
       CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_uniq_tokens,
       ROUND(CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
             / len(string_split(text, ' ')), 6) AS avg_token_len
FROM documents
""",
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    return d.select(
        "doc_id",
        F.length("text").alias("n_char"),
        n_tokens.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq_tokens"),
        F.round(
            (F.length("text") - n_tokens + 1).cast("double") / n_tokens, 6
        ).alias("avg_token_len"),
    )


# ---------------------------------------------------------------------------
# L4 — language / source distribution.
# ---------------------------------------------------------------------------
@query(
    "q_lang_dist",
    oracle="""
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       COUNT(DISTINCT source) AS n_sources
FROM documents
GROUP BY lang
""",
)
def q_lang_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


# ---------------------------------------------------------------------------
# L4 — language identification, fully declarative (Cavnar–Trenkle
# character-n-gram profiles, the classic n-gram language-ID scheme):
# train per-language top-50 character-trigram profiles on the 80% split
# (doc_id % 5 != 0), classify the held-out 20% by distinct-trigram
# overlap with each profile, argmax with lexicographic tiebreak.  All
# counts/ranks are integers -> exactly hash-comparable cross-engine.
#
# Scale posture: the profile is tiny (n_langs x 50 rows) and broadcast;
# trigram expansion is map-side; the only large shuffles are the
# training groupBy and the per-(doc,lang) score aggregation — both
# keyed, no driver-side model materialization (contrast the pandas-UDF
# `operators/text.py lang_id`, which collects the profile to the
# driver; that variant remains the unit-tested scale alternative).
# ---------------------------------------------------------------------------
_LANG_ID_ORACLE = """
WITH tri AS (
  SELECT doc_id, lang,
         unnest(list_transform(range(1, greatest(length(text) - 2, 1) + 1),
                               i -> substr(text, i, 3))) AS tri
  FROM documents
),
prof AS (
  SELECT lang AS cand_lang, tri FROM (
    SELECT lang, tri,
           ROW_NUMBER() OVER (PARTITION BY lang
                              ORDER BY COUNT(*) DESC, tri) AS rk
    FROM tri WHERE doc_id % 5 <> 0
    GROUP BY lang, tri
  ) WHERE rk <= 50
),
test AS (
  SELECT DISTINCT doc_id, tri FROM tri WHERE doc_id % 5 = 0
),
scores AS (
  SELECT doc_id, cand_lang, COUNT(*) AS score
  FROM test JOIN prof USING (tri)
  GROUP BY 1, 2
)
SELECT doc_id, cand_lang AS lang_pred, score FROM (
  SELECT doc_id, cand_lang, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, cand_lang) AS rk
  FROM scores
) WHERE rk = 1
"""


@query("q_lang_id", oracle=_LANG_ID_ORACLE)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.tables import fanout

    # r13 (guide §2): the character-trigram explode (~300 rows/doc,
    # run twice: train + test) sat single-core below the one-split
    # scan; fanout first.  Downstream: integer counts + row_number
    # over fully-keyed deterministic orders — order-safe; no-op at
    # scale.
    # r13 (second pass): trigram build / rank windows as parsed SQL
    # (1:1 transliteration of the former Column chain)
    d = fanout(table(spark, sf_dir, "documents"), "doc_id")
    tri_rows = d.selectExpr(
        "doc_id",
        "lang",
        "explode(transform(sequence(1, greatest(length(text) - 2, 1)),"
        " i -> substr(text, i, 3))) AS tri",
    )
    counts = (
        tri_rows.where("doc_id % 5 != 0")
        .groupBy("lang", "tri")
        .agg(F.count("*").alias("n"))
    )
    prof = (
        counts.selectExpr(
            "*",
            "row_number() OVER (PARTITION BY lang"
            " ORDER BY n DESC, tri) AS rk",
        )
        .where("rk <= 50")
        .selectExpr("lang AS cand_lang", "tri")
    )
    test = (
        tri_rows.where("doc_id % 5 = 0").select("doc_id", "tri").distinct()
    )
    scores = (
        test.join(F.broadcast(prof), "tri")
        .groupBy("doc_id", "cand_lang")
        .agg(F.count("*").alias("score"))
    )
    return (
        scores.selectExpr(
            "*",
            "row_number() OVER (PARTITION BY doc_id"
            " ORDER BY score DESC, cand_lang) AS rk",
        )
        .where("rk = 1")
        .selectExpr("doc_id", "cand_lang AS lang_pred", "score")
    )


# ---------------------------------------------------------------------------
# Quality scoring: common-token ratio + length features (higher-order
# filter over the token array; lambda runs JVM-side in Spark).
# ---------------------------------------------------------------------------
_COMMON = ("the", "a", "data", "row", "table", "value")
_COMMON_SQL = ", ".join(f"'{w}'" for w in _COMMON)


@query(
    "q_doc_quality",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks, length(text) AS n_char
  FROM documents
)
SELECT doc_id, lang,
       CAST(len(toks) AS INT) AS n_tokens,
       ROUND(CAST(len(list_filter(toks, x -> x IN ({_COMMON_SQL}))) AS DOUBLE)
             / len(toks), 6) AS common_ratio,
       ROUND(CAST(n_char AS DOUBLE) / len(toks), 6) AS chars_per_token
FROM t
""",
)
def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    common = F.filter(
        toks, lambda x: x.isin(*_COMMON)
    )
    return d.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_tokens"),
        F.round(F.size(common).cast("double") / F.size(toks), 6).alias(
            "common_ratio"
        ),
        F.round(F.length("text").cast("double") / F.size(toks), 6).alias(
            "chars_per_token"
        ),
    )


# ---------------------------------------------------------------------------
# L2 (exact form) — n-gram Jaccard near-dup via shingle inverted-index
# self-join.  Token-bigram shingles; document-frequency cutoff bounds the
# fan-out of hot shingles (the production scale mitigation).  The
# approximate MinHash-LSH variant is `operators/dedup.py` (rows-only).
# ---------------------------------------------------------------------------
_JACCARD_ORACLE = """
WITH sh AS (
  SELECT DISTINCT doc_id, shingle
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(string_split(text, ' '))),
                                 i -> string_split(text, ' ')[i] || ' ' ||
                                      string_split(text, ' ')[i + 1])) AS shingle
    FROM documents
    WHERE doc_id < 500
  )
),
filtered AS (
  SELECT doc_id, shingle FROM sh
  WHERE shingle IN (SELECT shingle FROM sh GROUP BY shingle
                    HAVING COUNT(*) <= 50)
),
sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM filtered GROUP BY doc_id
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM filtered a JOIN filtered b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ROUND(CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter), 6) AS jaccard
FROM pairs
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.2
"""


def jaccard_pairs(
    spark: SparkSession, sf_dir: str, max_doc_id: int | None = 500
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs (threshold 0.2) — shared by
    q_jaccard_neardup and the q_dedup_clusters component labeling.

    ``max_doc_id`` bounds the declared-query slice so the DuckDB oracle
    can replay the pair join at interactive speed; the weak-scaling
    probe (tools/scale_probe_r5b.py --pipelines) passes None to run the
    UNCAPPED composition over replicated corpora — the df<=50 hot-
    shingle cutoff, not the slice, is what bounds join fan-out at
    scale."""
    from pyspec_spark.operators.dedup import shingles as _zip_shingles

    d = table(spark, sf_dir, "documents")
    if max_doc_id is not None:
        d = d.where(F.col("doc_id") < max_doc_id)
    # r13 (optimization guide §1.2, the dedup.shingles rationale): the
    # former transform(sequence(...), i -> element_at(toks, i) ...)
    # build inlined the split() into every element_at reference — the
    # text re-parsed once per shingle position, per lambda, interpreted.
    # The shared zip_with builder references the split a constant
    # number of times and stays in codegen; bigram values are identical
    # (concat_ws(' ', a, b) == element_at(i) || ' ' || element_at(i+1)
    # for the same non-null tokens), so the pair set cannot move.
    # No .distinct() after the explode (guide §2.4 "a distinct on data
    # that is already unique"): array_distinct makes each doc's shingle
    # array duplicate-free, so the exploded (doc_id, shingle) pairs are
    # globally unique by construction — the former distinct() was a
    # full extra exchange that could never remove a row.
    # r13 (second pass): projections/filters as parsed SQL (1:1
    # transliteration of the former Column chain)
    sh = _zip_shingles(d, "text", 2).selectExpr(
        "doc_id", "explode(_shingles) AS shingle"
    )
    # document-frequency cutoff: drop hot shingles (bounds join fan-out)
    df_ok = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .where("df <= 50")
        .select("shingle")
    )
    filtered = sh.join(F.broadcast(df_ok), "shingle")
    sizes = filtered.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = filtered.selectExpr("doc_id AS doc_a", "shingle")
    b = filtered.selectExpr("doc_id AS doc_b", "shingle")
    pairs = (
        a.join(b, "shingle")
        .where("doc_a < doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.selectExpr("doc_id AS doc_a", "n_sh AS na")
    sb = sizes.selectExpr("doc_id AS doc_b", "n_sh AS nb")
    jac = "CAST(inter AS DOUBLE) / (na + nb - inter)"
    return (
        pairs.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .where(f"{jac} >= 0.2D")
        .selectExpr("doc_a", "doc_b", f"round({jac}, 6) AS jaccard")
    )


@query("q_jaccard_neardup", oracle=_JACCARD_ORACLE)
def q_jaccard_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return jaccard_pairs(spark, sf_dir)


# ---------------------------------------------------------------------------
# Dedup clustering: connected components over the exact-Jaccard near-dup
# pair graph — the transitive-closure step that turns pairs into "keep
# one per cluster" groups.  Spark side is iterative min-label
# propagation (operators/dedup.py connected_components); the DuckDB
# oracle computes the same fixpoint with a recursive CTE.  Component id
# = smallest doc_id in the component; docs with no near-dup partner are
# excluded (singletons are the uninteresting 99%).
# ---------------------------------------------------------------------------
_CLUSTERS_ORACLE = f"""
WITH RECURSIVE
edges AS ({_JACCARD_ORACLE}),
adj AS (
  SELECT doc_a AS src, doc_b AS dst FROM edges
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM edges
),
reach(src, dst) AS (
  SELECT src, dst FROM adj
  UNION
  SELECT r.src, a.dst FROM reach r JOIN adj a ON r.dst = a.src
)
SELECT src AS doc_id,
       LEAST(src, MIN(dst)) AS cluster_id
FROM reach
GROUP BY src
"""


@query("q_dedup_clusters", oracle=_CLUSTERS_ORACLE)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.dedup import connected_components

    edges = jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    cc = connected_components(edges, src="doc_a", dst="doc_b")
    return cc.select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )


# ---------------------------------------------------------------------------
# Dedup SELECTION (r4) — the curation decision that consumes the
# clusters: keep exactly one doc per near-dup cluster, chosen by a
# quality signal (unique-token ratio; rounded BEFORE ranking for
# cross-engine order stability, tiebreak doc_id).  This closes the
# pairs -> clusters -> keep-best pipeline declaratively; the oracle
# nests the recursive-CTE cluster fixpoint as a subquery and replays
# the ranked choice.  Build runs the CC loop's jobs (same documented
# zero-jobs-gate exemption as q_dedup_clusters).
# ---------------------------------------------------------------------------
_KEEP_BEST_ORACLE = f"""
SELECT c.cluster_id,
       d.doc_id AS kept_doc,
       n_members,
       kept_uniq_ratio
FROM (
  SELECT cluster_id, doc_id,
         ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / len(string_split(text, ' ')), 6) AS kept_uniq_ratio,
         COUNT(*) OVER (PARTITION BY cluster_id) AS n_members,
         ROW_NUMBER() OVER (
           PARTITION BY cluster_id
           ORDER BY ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                          / len(string_split(text, ' ')), 6) DESC,
                    doc_id
         ) AS rn
  FROM ({_CLUSTERS_ORACLE}) c
  JOIN documents USING (doc_id)
) d
JOIN ({_CLUSTERS_ORACLE}) c
  ON c.doc_id = d.doc_id AND c.cluster_id = d.cluster_id
WHERE d.rn = 1
"""


@query("q_dedup_keep_best", oracle=_KEEP_BEST_ORACLE)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from pyspec_spark.operators.dedup import connected_components

    edges = jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    cc = connected_components(edges, src="doc_a", dst="doc_b").select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    toks = F.split("text", " ")
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.round(
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 6
        ).alias("kept_uniq_ratio"),
    )
    j = cc.join(d, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("kept_uniq_ratio"), "doc_id"
    )
    wc = Window.partitionBy("cluster_id")
    return (
        j.select(
            "cluster_id",
            F.col("doc_id").alias("kept_doc"),
            F.count("*").over(wc).alias("n_members"),
            "kept_uniq_ratio",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Document chunking (r4) — RAG/context-window ingestion: fixed-size
# character chunks with overlap, map-only explode over computed
# offsets.  ORACLE-CHECKED: substring arithmetic is identical in both
# engines.  n_chunks = ceil((len - overlap) / step) with a 1-chunk
# floor, so every doc (even shorter than one chunk) yields its text.
# Scale: explode fan-out is len/step per doc — bounded, map-only, no
# shuffle (plan-gated).
# ---------------------------------------------------------------------------
_CHUNK_SIZE, _CHUNK_OVERLAP = 200, 50
_CHUNK_STEP = _CHUNK_SIZE - _CHUNK_OVERLAP

_CHUNK_ORACLE = f"""
SELECT doc_id, chunk_id,
       substr(text, chunk_id * {_CHUNK_STEP} + 1, {_CHUNK_SIZE}) AS chunk,
       length(substr(text, chunk_id * {_CHUNK_STEP} + 1, {_CHUNK_SIZE})) AS chunk_len
FROM (
  SELECT doc_id, text,
         CAST(unnest(range(0, GREATEST(
             CAST(CEIL(CAST(length(text) - {_CHUNK_OVERLAP} AS DOUBLE)
                       / {_CHUNK_STEP}) AS BIGINT), 1))) AS INT) AS chunk_id
  FROM documents
)
"""


@query("q_chunk_docs", oracle=_CHUNK_ORACLE)
def q_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    n_chunks = F.greatest(
        F.ceil(
            (F.length("text") - F.lit(_CHUNK_OVERLAP)).cast("double")
            / F.lit(_CHUNK_STEP)
        ).cast("bigint"),
        F.lit(1).cast("bigint"),
    )
    chunk = F.substring(
        F.col("text"), F.col("chunk_id") * _CHUNK_STEP + 1, _CHUNK_SIZE
    )
    return (
        d.select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias(
                "chunk_id"
            ),
        )
        .select(
            "doc_id",
            "chunk_id",
            chunk.alias("chunk"),
            F.length(chunk).alias("chunk_len"),
        )
    )


# ---------------------------------------------------------------------------
# Sequence packing (r4) — assign docs to fixed-token-budget bins per
# source, the packing step before training batches are materialized.
# Contiguous first-fit by doc_id order: bin = floor(cum_tokens_before /
# budget) via one cumulative window per source — ORACLE-CHECKED (the
# window SQL is identical in DuckDB).  One source-keyed shuffle; the
# window partitions by source, so skewed sources are the scale
# watch-item (same note as q_token_budget).
# ---------------------------------------------------------------------------
_PACK_BUDGET = 2048

_SEQ_PACK_ORACLE = f"""
SELECT doc_id, source, n_tokens,
       CAST(FLOOR(CAST(cum_before AS DOUBLE) / {_PACK_BUDGET}) AS INT) AS bin_id
FROM (
  SELECT doc_id, source,
         len(string_split(text, ' ')) AS n_tokens,
         COALESCE(SUM(len(string_split(text, ' '))) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM documents
)
"""


@query("q_seq_pack", oracle=_SEQ_PACK_ORACLE)
def q_seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return d.select(
        "doc_id",
        "source",
        "n_tokens",
        F.floor(cum_before.cast("double") / _PACK_BUDGET).cast("int").alias("bin_id"),
    )


# ---------------------------------------------------------------------------
# L35 — split-leakage audit (r7): the check every eval pipeline needs
# and few run — do any NEAR-DUP clusters straddle the train/val/test
# boundary?  Content-keyed split hashing (L16, md5 of doc_id) prevents
# EXACT-dup leakage by construction, but near-dups hash to independent
# buckets, so a cluster can land members on both sides — silently
# inflating eval scores.  Composes the L2 jaccard cluster fixpoint
# with L16's split rule: per cluster, member counts by split and a
# leaky flag (>= 2 splits represented).  The split is a closed-form
# function of doc_id, so NO join back to the corpus exists — the
# audit costs one |clusters|-key aggregation on top of the CC output
# (clustered docs only; singletons cannot leak).
#
# 100 TB posture: inherits q_dedup_clusters' checkpointed large-star/
# small-star CC; the post-CC audit is one shuffle over cluster
# members (a vanishing fraction of the corpus), and the leaky-rows
# output is what the curation run quarantines before training.
# ---------------------------------------------------------------------------
_SPLIT_LEAK_ORACLE = f"""
WITH cc AS ({{__CLUSTERS__}}),
s AS (
  SELECT cluster_id,
         CASE WHEN b < 96 THEN 'train' WHEN b < 98 THEN 'val'
              ELSE 'test' END AS split
  FROM (
    SELECT cluster_id,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#split'), 1, 8))
             ::BIGINT % 100 AS b
    FROM cc
  )
)
SELECT cluster_id,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(COUNT(CASE WHEN split = 'train' THEN 1 END) AS BIGINT)
         AS n_train,
       CAST(COUNT(CASE WHEN split = 'val' THEN 1 END) AS BIGINT) AS n_val,
       CAST(COUNT(CASE WHEN split = 'test' THEN 1 END) AS BIGINT) AS n_test,
       (COUNT(DISTINCT split) >= 2) AS leaky
FROM s
GROUP BY cluster_id
ORDER BY cluster_id
"""


@query(
    "q_split_leakage",
    oracle=_SPLIT_LEAK_ORACLE.replace("{__CLUSTERS__}", _CLUSTERS_ORACLE),
)
def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.dedup import connected_components

    edges = jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    cc = connected_components(edges, src="doc_a", dst="doc_b").select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    b = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"), F.lit("#split")
                    ).cast("binary")
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    split = F.when(b < 96, "train").when(b < 98, "val").otherwise("test")
    return (
        cc.select("cluster_id", split.alias("split"))
        .groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_members"),
            F.count(F.when(F.col("split") == "train", 1)).alias("n_train"),
            F.count(F.when(F.col("split") == "val", 1)).alias("n_val"),
            F.count(F.when(F.col("split") == "test", 1)).alias("n_test"),
            (F.count_distinct("split") >= 2).alias("leaky"),
        )
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------------------
# L35b — split-leakage REPAIR (r7): the fix for what q_split_leakage
# detects.  Quarantine rule: a near-dup cluster is reassigned wholesale
# to its MOST RESTRICTIVE represented split — test if ANY member fell
# in test, else val if any in val, else train — because a near-dup of
# a test document must never be trained on (moving it the other way
# would contaminate eval; moving the whole cluster to the eval side
# only costs a few training docs).  Deterministic by construction: the
# rule is a max over the cluster, no tiebreak needed.  Output = one
# row per clustered doc with original split, repaired split, and the
# moved flag — the changelist a curation run applies before writing
# final splits (singletons cannot leak, so they never move and never
# appear here).
#
# 100 TB posture: inherits the checkpointed CC; the repair is ONE
# cluster-keyed window over CC output (the same vanishing corpus
# fraction as the audit), map-side split hashing, no corpus join.
# ---------------------------------------------------------------------------
_SPLIT_REPAIR_ORACLE = f"""
WITH cc AS ({_CLUSTERS_ORACLE}),
s AS (
  SELECT cluster_id, doc_id,
         CASE WHEN b < 96 THEN 'train' WHEN b < 98 THEN 'val'
              ELSE 'test' END AS split
  FROM (
    SELECT cluster_id, doc_id,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#split'), 1, 8))
             ::BIGINT % 100 AS b
    FROM cc
  )
),
r AS (
  SELECT *,
         MAX(CASE WHEN split = 'test' THEN 1 ELSE 0 END)
           OVER (PARTITION BY cluster_id) AS has_test,
         MAX(CASE WHEN split = 'val' THEN 1 ELSE 0 END)
           OVER (PARTITION BY cluster_id) AS has_val
  FROM s
)
SELECT doc_id, cluster_id, split,
       CASE WHEN has_test = 1 THEN 'test'
            WHEN has_val = 1 THEN 'val'
            ELSE 'train' END AS repaired,
       (CASE WHEN has_test = 1 THEN 'test'
             WHEN has_val = 1 THEN 'val'
             ELSE 'train' END) <> split AS moved
FROM r
ORDER BY doc_id
"""


@query("q_split_repair", oracle=_SPLIT_REPAIR_ORACLE)
def q_split_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from pyspec_spark.operators.dedup import connected_components

    edges = jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    cc = connected_components(edges, src="doc_a", dst="doc_b").select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    b = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"), F.lit("#split")
                    ).cast("binary")
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    split = F.when(b < 96, "train").when(b < 98, "val").otherwise("test")
    s = cc.select("doc_id", "cluster_id", split.alias("split"))
    w = Window.partitionBy("cluster_id")
    has_test = F.max(F.when(F.col("split") == "test", 1).otherwise(0)).over(w)
    has_val = F.max(F.when(F.col("split") == "val", 1).otherwise(0)).over(w)
    repaired = (
        F.when(has_test == 1, "test")
        .when(has_val == 1, "val")
        .otherwise("train")
    )
    return (
        s.select(
            "doc_id",
            "cluster_id",
            "split",
            repaired.alias("repaired"),
            (repaired != F.col("split")).alias("moved"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# L13b — overlapping document chunking (r13): the RAG/embedding
# ingestion front-end — every retrieval deployment splits documents
# into fixed-size token windows with overlap before embedding, and the
# chunk boundary arithmetic must be EXACT (an off-by-one here silently
# drops the tail of every document from the index).  Chunk i of a doc
# covers tokens [i*STRIDE+1 .. i*STRIDE+CHUNK] (1-based, clamped);
# n_chunks = 1 + ceil(max(n - CHUNK, 0) / STRIDE) so every token
# lands in >= 1 chunk, short docs produce exactly one chunk, and the
# last window is allowed to be short rather than re-reading earlier
# tokens (deterministic — no "snap back" heuristic).
#
# Scale posture: map-only — split, a bounded sequence explode
# (~n/STRIDE chunks per doc), and slices of the already-materialized
# token array; no shuffle at all until a consumer aggregates.  The
# ceil is integer arithmetic (pmod), not float division.
# ---------------------------------------------------------------------------
_CHUNK = 32
_STRIDE = 24

_DOC_CHUNKS_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n
  FROM documents
),
c AS (
  SELECT doc_id, toks, n,
         CAST(unnest(range(
           1 + greatest(0, (greatest(n - {_CHUNK}, 0) + {_STRIDE} - 1)
                           // {_STRIDE})
         )) AS INT) AS chunk_id
  FROM t
)
SELECT doc_id, chunk_id,
       CAST(chunk_id * {_STRIDE} AS INT) AS chunk_start,
       CAST(len(list_slice(toks, chunk_id * {_STRIDE} + 1,
                           chunk_id * {_STRIDE} + {_CHUNK})) AS INT)
         AS n_tokens,
       array_to_string(list_slice(toks, chunk_id * {_STRIDE} + 1,
                                  chunk_id * {_STRIDE} + {_CHUNK}), ' ')
         AS chunk_text
FROM c
ORDER BY doc_id, chunk_id
"""


@query("q_doc_chunks", oracle=_DOC_CHUNKS_ORACLE)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.operators.text import chunk_tokens

    docs = table(spark, sf_dir, "documents")
    return chunk_tokens(docs, chunk=_CHUNK, stride=_STRIDE).orderBy(
        "doc_id", "chunk_id"
    )
