"""Training-data quality analytics — SURVEY.md §2.12 L3 extensions.

Reference loci (SURVEY §0 policy): absent from `stuwilkins/pyspec` [H]
— north-star training-data-pipeline operators modeled on the published
corpus-filtering heuristics (C4, Raffel et al. 2020; Gopher quality
signals, Rae et al. 2021; PMI collocations, Church & Hanks 1990).

Three declared, oracle-checked queries:
- `q_repetition`    — per-doc repetition signals (duplicate-token
  fraction, most-frequent-bigram fraction).  One repartition(doc_id)
  exchange, then explode + two exchange-free hash aggregations: the
  doc_id partitioning satisfies both groupBy distributions, so the
  whole per-doc mode runs in whole-stage codegen.  (Round 3 shipped a
  map-only array-HOF form; correct and linear, but the interpreted
  aggregate() lambda cost 2.0–2.5× the DuckDB oracle warm — the
  codegen reformulation here is the round-3 VERDICT's prescribed fix.)
- `q_quality_gate`  — apply explicit pass/fail thresholds over the
  repetition + shape signals and report survival rates per (lang,
  source): one partial+final aggregation over map-only signals (the
  shape of a corpus-filter run: score, gate, count — no second scan).
- `q_pmi_bigrams`   — top-20 bigram collocations by pointwise mutual
  information with a min-count support cutoff.  Unigram and bigram
  count tables reduce map-side; the unigram side is broadcast (vocab ≪
  corpus) so the only shuffles are the two count aggregations.

Determinism: all ratios ROUND(...,6); PMI's ln() is rounded to 6
places and tiebroken by the bigram string under LIMIT (SURVEY §5.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspec_spark.registry import query
from pyspec_spark.tables import table


def _toks():
    return F.split("text", " ")


def _bigrams(toks):
    """Token-bigram array (empty for sub-2-token docs, same guard as
    operators/dedup.py shingles).

    Built with zip_with(toks, toks[2:]) rather than indexing
    element_at(toks, i) inside a transform lambda: an expression-valued
    ``toks`` (a split() call) would be re-evaluated per lambda
    invocation — O(n) splits of O(n) each per row.  zip_with references
    it a constant number of times, keeping the build linear."""
    shifted = F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(1)))
    zipped = F.zip_with(
        toks,
        shifted,
        lambda a, b: F.when(b.isNotNull(), F.concat(a, F.lit(" "), b)),
    )
    grams = F.filter(zipped, lambda x: x.isNotNull())
    return F.when(F.size(toks) >= 2, grams).otherwise(
        F.array().cast("array<string>")
    )


def _bigrams_sql(toks: str = "split(text, ' ')") -> str:
    """The parsed-SQL face of :func:`_bigrams` — same operators, same
    values, ONE py4j round-trip however wide (r13 plan-construction
    note in curation._replicate_copies)."""
    zipped = (
        f"zip_with({toks}, slice({toks}, 2, greatest(size({toks}) - 1, 1)),"
        " (a, b) -> CASE WHEN b IS NOT NULL THEN concat(a, ' ', b) END)"
    )
    return (
        f"CASE WHEN size({toks}) >= 2 THEN"
        f" filter({zipped}, x -> x IS NOT NULL)"
        " ELSE CAST(array() AS ARRAY<STRING>) END"
    )


# ---------------------------------------------------------------------------
# Per-doc repetition signals (Gopher-style): one doc_id repartition,
# then codegen aggregation — no interpreted HOF lambdas in the plan.
# ---------------------------------------------------------------------------
@query(
    "q_repetition",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks
  FROM documents
),
g AS (
  SELECT doc_id, toks,
         CASE WHEN len(toks) >= 2
              THEN list_transform(range(1, len(toks)),
                                  i -> toks[i] || ' ' || toks[i + 1])
              ELSE [] END AS grams
  FROM t
)
SELECT doc_id,
       CAST(len(toks) AS INT) AS n_tokens,
       ROUND(1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks),
             6) AS dup_token_frac,
       CASE WHEN len(grams) = 0 THEN 0.0
            ELSE ROUND(CAST(list_max(list_transform(list_distinct(grams),
                     d -> len(list_filter(grams, x -> x = d)))) AS DOUBLE)
                 / len(grams), 6) END AS top_bigram_frac
FROM g
""",
)
def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Top-bigram count via explode + groupBy(doc_id, gram) + max —
    # full whole-stage codegen.  The round-3 map-only form computed
    # the per-doc mode with an interpreted aggregate() lambda over
    # array_sort(grams); correct, but the non-codegen HOF machinery
    # cost 2.0–2.5× the DuckDB warm baseline (687 ms vs 289 ms at
    # sf0.1).  This shape measures 160–180 ms warm — under the oracle.
    #
    # Two load-bearing structural choices:
    # 1. The doc-level signals (n_tokens, dup_token_frac) and the gram
    #    array are projected in a SEPARATE select BELOW the explode, so
    #    Generate is the projection barrier: with a single combined
    #    select, CollapseProject hoists the split/array_distinct/
    #    zip_with expressions ABOVE Generate and re-evaluates them once
    #    per exploded gram instead of once per doc (measured 9.3 s vs
    #    0.18 s here — the operators/text.py HOF-inlining trap again).
    # 2. The ONLY exchange is an up-front repartition(parallelism,
    #    "doc_id") of the raw documents: text bytes shuffle once,
    #    cheaper than shuffling the ~2×-larger exploded gram stream
    #    twice, and HashPartitioning(doc_id) satisfies the clustered
    #    distribution of BOTH downstream groupBys, so neither
    #    aggregation adds a shuffle.  The explicit partition count
    #    keeps AQE from coalescing the tiny test shuffle to one task
    #    (scale-irrelevant, local-parallelism-critical).  Gate:
    #    tests/test_plan_quality.py::test_repetition_single_exchange.
    # n_grams is recovered as sum(cnt) in the final aggregation rather
    # than carried as a group key; explode_outer keeps sub-2-token docs
    # (gram NULL → both aggregates NULL → guarded 0.0).
    # r13 (second pass): the two projections + aggregates as parsed SQL
    # (1:1 transliteration of the former Column chain; the two-step
    # select structure around Generate is preserved — see note 1 above)
    d = table(spark, sf_dir, "documents")
    toks = "split(text, ' ')"
    docs = d.repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    ).selectExpr(
        "doc_id",
        f"size({toks}) AS n_tokens",
        f"round(1.0D - CAST(size(array_distinct({toks})) AS DOUBLE)"
        f" / size({toks}), 6) AS dup_token_frac",
        f"{_bigrams_sql(toks)} AS grams",
    )
    exploded = docs.selectExpr(
        "doc_id",
        "n_tokens",
        "dup_token_frac",
        "explode_outer(grams) AS gram",
    )
    per_gram = exploded.groupBy(
        "doc_id", "n_tokens", "dup_token_frac", "gram"
    ).agg(F.count("*").alias("cnt"))
    nn_cnt = "CASE WHEN gram IS NOT NULL THEN cnt END"
    return (
        per_gram.groupBy("doc_id", "n_tokens", "dup_token_frac")
        .agg(
            F.expr(f"MAX({nn_cnt})").alias("top_cnt"),
            F.expr(f"SUM({nn_cnt})").alias("n_grams"),
        )
        .selectExpr(
            "doc_id",
            "n_tokens",
            "dup_token_frac",
            "CASE WHEN n_grams IS NULL THEN 0.0D"
            " ELSE round(CAST(top_cnt AS DOUBLE) / n_grams, 6)"
            " END AS top_bigram_frac",
        )
    )


# ---------------------------------------------------------------------------
# Corpus quality gate: thresholds over the signals, survival per
# (lang, source).  The thresholds are explicit constants (C4/Gopher
# shape adapted to this corpus) — the point is the gate PATTERN:
# map-only scoring, one aggregation, no second scan.
# ---------------------------------------------------------------------------
_MIN_TOKENS, _MAX_TOKENS = 20, 1000
_MAX_DUP_FRAC = 0.6
_MIN_CPT, _MAX_CPT = 3.0, 12.0  # chars per token


@query(
    "q_quality_gate",
    oracle=f"""
WITH s AS (
  SELECT lang, source,
         len(string_split(text, ' ')) AS n_tokens,
         1.0 - CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / len(string_split(text, ' ')) AS dup_frac,
         CAST(length(text) AS DOUBLE)
             / len(string_split(text, ' ')) AS cpt
  FROM documents
),
gated AS (
  SELECT lang, source,
         CASE WHEN n_tokens BETWEEN {_MIN_TOKENS} AND {_MAX_TOKENS}
               AND dup_frac <= {_MAX_DUP_FRAC}
               AND cpt BETWEEN {_MIN_CPT} AND {_MAX_CPT}
              THEN 1 ELSE 0 END AS pass
  FROM s
)
SELECT lang, source,
       COUNT(*) AS n_docs,
       CAST(SUM(pass) AS BIGINT) AS n_pass,
       ROUND(CAST(SUM(pass) AS DOUBLE) / COUNT(*), 6) AS pass_rate
FROM gated
GROUP BY lang, source
""",
)
def q_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13 (second pass): gate + aggregates as parsed SQL (1:1
    # transliteration; 'D' suffixes pin the former float literals)
    d = table(spark, sf_dir, "documents")
    toks = "split(text, ' ')"
    n_tokens = f"size({toks})"
    dup_frac = (
        f"1.0D - CAST(size(array_distinct({toks})) AS DOUBLE) / {n_tokens}"
    )
    cpt = f"CAST(length(text) AS DOUBLE) / {n_tokens}"
    passes = (
        f"CAST(({n_tokens} BETWEEN {_MIN_TOKENS} AND {_MAX_TOKENS})"
        f" AND (({dup_frac}) <= {_MAX_DUP_FRAC}D)"
        f" AND (({cpt}) BETWEEN {_MIN_CPT!r}D AND {_MAX_CPT!r}D) AS INT)"
    )
    return (
        d.selectExpr("lang", "source", f"{passes} AS pass")
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.expr("CAST(SUM(pass) AS BIGINT)").alias("n_pass"),
            F.expr(
                "round(CAST(SUM(pass) AS DOUBLE) / COUNT(*), 6)"
            ).alias("pass_rate"),
        )
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination: flag corpus documents whose bigram-shingle
# CONTAINMENT in a benchmark set exceeds a threshold (the test-set-leak
# check every training pipeline runs; containment, not Jaccard, because
# a short benchmark item buried in a long document must still flag).
# Benchmark stand-in: doc_id < 10.  Scale shape: the benchmark shingle
# set is small by construction -> broadcast semi-join against the
# exploded corpus shingles; the corpus side is one explode + two keyed
# aggregations, never a self-join.
# ---------------------------------------------------------------------------
_BENCH_MAX_ID = 10
# On this shared-small-vocab synthetic corpus the containment
# distribution centers ~0.4; 0.6 flags the genuinely-overlapping tail
# (~5% of docs at sf0.01) instead of everything.
_CONTAM_MIN = 0.6


@query(
    "q_decontaminate",
    oracle=f"""
WITH sh AS (
  SELECT doc_id,
         CASE WHEN len(string_split(text, ' ')) >= 2
              THEN list_distinct(list_transform(
                  range(1, len(string_split(text, ' '))),
                  i -> string_split(text, ' ')[i] || ' ' ||
                       string_split(text, ' ')[i + 1]))
              ELSE [] END AS shingles
  FROM documents
),
bench AS (
  SELECT DISTINCT unnest(shingles) AS shingle FROM sh
  WHERE doc_id < {_BENCH_MAX_ID}
),
corpus AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM sh
  WHERE doc_id >= {_BENCH_MAX_ID} AND len(shingles) > 0
),
hits AS (
  SELECT c.doc_id, COUNT(*) AS n_hit
  FROM corpus c JOIN bench USING (shingle)
  GROUP BY c.doc_id
),
sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM corpus GROUP BY doc_id
)
SELECT s.doc_id, s.n_sh,
       COALESCE(h.n_hit, 0) AS n_hit,
       ROUND(CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / s.n_sh, 6) AS containment
FROM sizes s LEFT JOIN hits h USING (doc_id)
WHERE ROUND(CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / s.n_sh, 6) >= {_CONTAM_MIN}
""",
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13 (second pass): shingle build + containment as parsed SQL
    # (1:1 transliteration of the former Column chain)
    d = table(spark, sf_dir, "documents")
    sh = d.selectExpr(
        "doc_id", f"explode(array_distinct({_bigrams_sql()})) AS shingle"
    )
    bench = (
        sh.where(f"doc_id < {_BENCH_MAX_ID}").select("shingle").distinct()
    )
    corpus = sh.where(f"doc_id >= {_BENCH_MAX_ID}")
    hits = (
        corpus.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit"))
    )
    sizes = corpus.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    containment = (
        "round(CAST(coalesce(n_hit, 0) AS DOUBLE) / n_sh, 6)"
    )
    return (
        sizes.join(hits, "doc_id", "left")
        .selectExpr(
            "doc_id",
            "n_sh",
            "coalesce(n_hit, 0) AS n_hit",
            f"{containment} AS containment",
        )
        .where(f"containment >= {_CONTAM_MIN}D")
    )


# ---------------------------------------------------------------------------
# Per-source token-budget sampling (data mixing): deterministically
# order each source's documents by content hash, keep documents while
# the source's running token count stays under budget, report the mix.
# One window shuffle (source-keyed cumsum) + one aggregation — the
# sampling decision never leaves the partition of its source.
# ---------------------------------------------------------------------------
_TOKEN_BUDGET = 3000


@query(
    "q_token_budget",
    oracle=f"""
WITH t AS (
  SELECT source, doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
),
c AS (
  SELECT source, doc_id, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens_kept
FROM c
WHERE cum <= {_TOKEN_BUDGET}
GROUP BY source
""",
)
def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    t = d.select(
        "source",
        "doc_id",
        F.size(_toks()).alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string").cast("binary")).alias("h"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum", F.sum("n_tokens").over(w))
    return (
        c.where(F.col("cum") <= _TOKEN_BUDGET)
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_kept"),
            F.sum("n_tokens").cast("bigint").alias("tokens_kept"),
        )
    )


# ---------------------------------------------------------------------------
# Unigram LM scoring (the CCNet-style perplexity-proxy quality filter):
# train unigram probabilities on the corpus in one aggregation, score
# every document by its mean negative log-probability.  The vocabulary
# table broadcasts (vocab ≪ corpus); per-token ln() values are rounded
# to micro-units BEFORE the mean so the sum is order-independent and
# cross-engine exact (the q_embed_centroid fixed-point idiom).
# ---------------------------------------------------------------------------
@query(
    "q_unigram_logprob",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
uni AS (
  SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
),
n_tot AS (SELECT SUM(c) AS n FROM uni),
scored AS (
  SELECT t.doc_id,
         CAST(ROUND(ln(CAST(u.c AS DOUBLE) / n_tot.n) * 1e6) AS BIGINT)
             AS lp_micro
  FROM toks t JOIN uni u USING (tok), n_tot
)
SELECT doc_id,
       CAST(COUNT(*) AS INT) AS n_tokens,
       ROUND(-CAST(SUM(lp_micro) AS DOUBLE) / COUNT(*) / 1e6, 6) AS xent
FROM scored
GROUP BY doc_id
""",
)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspec_spark.functions.determinism import _fixed6

    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(_toks()).alias("tok"))
    uni = toks.groupBy("tok").agg(F.count("*").alias("c"))
    n_tot = uni.agg(F.sum("c").alias("n"))
    scored = (
        toks.join(F.broadcast(uni), "tok")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "doc_id",
            _fixed6(F.log(F.col("c").cast("double") / F.col("n"))).alias(
                "lp_micro"
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_tokens"),
        F.round(
            -F.sum("lp_micro").cast("double") / F.count("*") / 1e6, 6
        ).alias("xent"),
    )


# ---------------------------------------------------------------------------
# PMI collocations: pmi(a,b) = ln( p(ab) / (p(a) p(b)) ) with counts
# from one corpus pass each for unigrams and bigrams.
# ---------------------------------------------------------------------------
_MIN_PAIR_COUNT = 5


@query(
    "q_pmi_bigrams",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
uni AS (
  SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
),
n_uni AS (SELECT SUM(c) AS n FROM uni),
big AS (
  SELECT unnest(CASE WHEN len(toks) >= 2
                     THEN list_transform(range(1, len(toks)),
                                         i -> toks[i] || ' ' || toks[i + 1])
                     ELSE [] END) AS bigram
  FROM (SELECT string_split(text, ' ') AS toks FROM documents)
),
bc AS (
  SELECT bigram, COUNT(*) AS c_ab FROM big GROUP BY bigram
),
n_big AS (SELECT SUM(c_ab) AS n FROM bc)
SELECT bigram, c_ab,
       ROUND(ln( (CAST(c_ab AS DOUBLE) / n_big.n)
                 / ( (CAST(ua.c AS DOUBLE) / n_uni.n)
                   * (CAST(ub.c AS DOUBLE) / n_uni.n) ) ), 6) AS pmi
FROM bc, n_big, n_uni
JOIN uni ua ON ua.tok = string_split(bigram, ' ')[1]
JOIN uni ub ON ub.tok = string_split(bigram, ' ')[2]
WHERE c_ab >= {_MIN_PAIR_COUNT}
ORDER BY pmi DESC, bigram
LIMIT 20
""",
)
def q_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = _toks()
    uni = (
        d.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    n_uni = uni.agg(F.sum("c").alias("n_uni"))
    bc = (
        d.select(F.explode(_bigrams(toks)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("c_ab"))
        .where(F.col("c_ab") >= _MIN_PAIR_COUNT)
    )
    n_big = (
        d.select(F.size(_bigrams(toks)).alias("nb"))
        .agg(F.sum("nb").alias("n_big"))
    )
    parts = F.split("bigram", " ")
    ua = uni.select(F.col("tok").alias("tok_a"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("tok").alias("tok_b"), F.col("c").alias("c_b"))
    joined = (
        bc.withColumn("tok_a", F.element_at(parts, 1))
        .withColumn("tok_b", F.element_at(parts, 2))
        .join(F.broadcast(ua), "tok_a")
        .join(F.broadcast(ub), "tok_b")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_big))
    )
    pmi = F.round(
        F.log(
            (F.col("c_ab").cast("double") / F.col("n_big"))
            / (
                (F.col("c_a").cast("double") / F.col("n_uni"))
                * (F.col("c_b").cast("double") / F.col("n_uni"))
            )
        ),
        6,
    )
    return (
        joined.select("bigram", "c_ab", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), "bigram")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# PII redaction (SURVEY §2.12 L3 extension) — the scrub step every
# training-data pipeline runs before anything else.  The synthetic
# documents table contains no organic PII, so the query INJECTS
# deterministic PII in-plan (email / phone / IPv4 keyed on doc_id —
# identical arithmetic in both engines) and then scrubs it: the oracle
# replays injection + redaction and the md5 of the scrubbed text is
# compared hash-exactly.  Map-only (no exchange): regex machinery runs
# where the scan runs, which is what survives 100 TB.
#
# Regex notes: patterns restricted to the Java-regex ∩ RE2 common
# dialect (char classes, bounded repeats, \b word boundaries,
# non-capturing groups, alternation — both engines match alternatives
# leftmost-first); DuckDB regexp_replace needs the 'g' flag for global
# replacement, Spark replaces globally by default.
#
# Round-5 reformulation (the round-4 VERDICT's prescribed fix): the
# three per-type replace passes collapse into ONE alternation replace
# to a generic <PII> marker, and the per-type counts come from ONE
# regexp_extract_all pass over the *tainted* text (classified with
# cheap non-regex array predicates: '@' → email, '555-' prefix →
# phone).  Counting on the tainted text — not on markers in the
# scrubbed text — also removes the latent cross-engine divergence when
# an input document already contains a literal marker string.  Total
# regex scans: 3 (extract_all + replace + residual count), down from 5.
# The three patterns are start-disjoint (email requires '@', phone a
# '-' after the 555, IP neither), so leftmost-first alternation visits
# exactly the matches the sequential passes did.
#
# Java-engine tuning (measured at sf0.1, one 5000-doc row group):
# - leading \b on the email head lets the backtracking engine reject
#   every mid-word start position O(1) instead of consuming the rest of
#   the word before failing at '@' (replace pass 198 -> 130 ms);
# - the Spark-side pattern additionally uses possessive quantifiers
#   (`++`, Java-only syntax, absent from RE2 so the oracle keeps the
#   plain form).  Semantically identical here: no character in any
#   quantified class can also start the required successor (the classes
#   exclude '@' / '<' etc.), so backtracking into the run can never
#   succeed — proven corpus-wide by test_pii_possessive_equals_plain
#   (130 -> 122 ms).
# An Arrow/RE2 mapInArrow variant was measured at 273 ms — the
# Python-worker round trip costs more than RE2 saves — so the scrub
# stays whole-stage codegen.
# ---------------------------------------------------------------------------
_PII_EMAIL = "\\b[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z][a-z]+"
_PII_PHONE = "\\b555-[0-9]{4}\\b"
_PII_IP = "\\b[0-9]{1,3}(?:[.][0-9]{1,3}){3}\\b"
_PII_ANY = _PII_EMAIL + "|" + _PII_PHONE + "|" + _PII_IP
# Java-only possessive twin of _PII_ANY (oracle keeps the RE2 form).
# Possessive (`++`) ONLY where the quantified class excludes the
# required successor: the email local part (successor '@' not in the
# class) and the digit runs (successor '.' / \b not a digit).  The
# email DOMAIN part must stay backtracking-greedy — its class contains
# '.', so a possessive run would swallow the final dot and the trailing
# `[.][a-z][a-z]+` could never match.
_PII_ANY_JAVA = (
    "\\b[a-z0-9._%+-]++@[a-z0-9.-]+[.][a-z][a-z]++"
    + "|\\b555-[0-9]{4}\\b"
    + "|\\b[0-9]{1,3}+(?:[.][0-9]{1,3}+){3}\\b"
)

_PII_ORACLE = (
    """
WITH tainted AS (
  SELECT doc_id,
         text || ' contact user' || doc_id
              || '@example.com or call 555-'
              || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')
              || ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1'
           AS text
  FROM documents
),
scanned AS (
  SELECT doc_id,
         ' ' || array_to_string(regexp_extract_all(text, '"""
    + _PII_ANY
    + """'), ' ') AS joined,
         regexp_replace(text, '"""
    + _PII_ANY
    + """', '<PII>', 'g') AS clean
  FROM tainted
)
SELECT doc_id,
       len(string_split(joined, '@')) - 1 AS n_email,
       len(string_split(joined, ' 555-')) - 1 AS n_phone,
       len(regexp_extract_all(clean, '"""
    + _PII_ANY
    + """')) AS n_left,
       md5(clean) AS clean_md5
FROM scanned
"""
)


def _widen_if_narrow(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Round-robin repartition a regex-bound map stage ONLY when the
    scan yields fewer partitions than the session's default parallelism
    (a small corpus packed into one parquet row group cannot be split
    below row-group granularity, so Spark would otherwise pay the whole
    per-byte regex constant on a single core).  The check is metadata
    only (no job); at production scale the scan already yields at least
    one task per core, the condition is false, and the returned plan is
    the unchanged map-only scan."""
    cores = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < cores:
        return df.repartition(cores)
    return df


@query("q_pii_scrub", oracle=_PII_ORACLE)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Perf note: this query is regex-bound and runs exactly 3 regex
    # scans: one alternation extract_all over the tainted text, one
    # alternation replace producing the scrubbed text, one residual
    # alternation count over the scrubbed text.  The per-type counts
    # come from the joined hits string with pure codegen string ops
    # (split on '@' → emails, split on ' 555-' → phone-prefixed hits)
    # — NOT array HOF lambdas: F.filter's interpreted lambda evaluator
    # re-ran the extract_all per filter (measured 437 ms vs 320 ms, the
    # q_repetition lesson again).  Classification caveat, shared
    # verbatim by the oracle so the two engines cannot diverge: a hit
    # is 'phone' iff it STARTS with 555- (an email whose local part
    # starts with 555- would count as phone; no such doc exists in any
    # corpus both engines see, and both engines would agree anyway).
    # `tainted` and `clean` each evaluate once via whole-stage codegen
    # subexpression elimination.
    # Parallelism: the sf0.1 corpus is ONE parquet row group → one scan
    # task, so the regex constant was paid single-threaded while DuckDB
    # scanned with 32 threads (320 ms vs 41 ms warm).  _widen_if_narrow
    # round-robin repartitions ONLY when the scan yields fewer
    # partitions than the session parallelism (measured 320 → 82 ms);
    # at 100 TB the scan yields thousands of tasks, the condition is
    # false, and the plan stays map-only with zero exchanges.
    d = _widen_if_narrow(
        spark, table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    tainted = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call 555-"),
        F.lpad(((F.col("doc_id") * 7) % 10000).cast("string"), 4, "0"),
        F.lit(" from 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0.1"),
    )
    hits = F.regexp_extract_all(tainted, F.lit(_PII_ANY_JAVA), F.lit(0))
    joined = F.concat(F.lit(" "), F.array_join(hits, " "))
    clean = F.regexp_replace(tainted, _PII_ANY_JAVA, "<PII>")
    return d.select(
        "doc_id",
        (F.size(F.split(joined, "@", -1)) - 1).alias("n_email"),
        (F.size(F.split(joined, " 555-", -1)) - 1).alias("n_phone"),
        F.regexp_count(clean, F.lit(_PII_ANY_JAVA)).alias("n_left"),
        F.md5(clean).alias("clean_md5"),
    )


# ---------------------------------------------------------------------------
# L3 extension (r5) — text normalization, the stage-0 of every curation
# pipeline (C4/CCNet both normalize before ANY dedup or scoring, since
# near-dup recall collapses when byte-identical content differs only in
# case/whitespace).  ORACLE-CHECKED md5-exact: lowercase (Unicode-aware
# in both engines), control-character strip, whitespace collapse, trim.
# Map-only — the normalized text md5 is compared hash-exactly, so both
# engines must produce byte-identical output on every doc.
# ---------------------------------------------------------------------------
_NORM_ORACLE = r"""
WITH n AS (
  SELECT doc_id, text,
         trim(regexp_replace(
             regexp_replace(lower(text),
                 '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
             '\s+', ' ', 'g')) AS norm
  FROM documents
)
SELECT doc_id,
       md5(norm) AS norm_md5,
       length(norm) AS norm_len,
       length(text) - length(norm) AS shrunk,
       CAST(length(norm) = length(text) AS INT) AS unchanged
FROM n
ORDER BY doc_id
"""


@query("q_normalize_text", oracle=_NORM_ORACLE)
def q_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.lower("text"), r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", ""
            ),
            r"\s+",
            " ",
        )
    )
    return (
        d.select(
            "doc_id",
            F.md5(norm).alias("norm_md5"),
            F.length(norm).alias("norm_len"),
            (F.length("text") - F.length(norm)).alias("shrunk"),
            (F.length(norm) == F.length("text")).cast("int").alias("unchanged"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Bigram LM with stupid backoff (r5b, Brants et al. 2007 "Large
# Language Models in Machine Translation"): the next step up from the
# q_unigram_logprob perplexity proxy.  Train on the md5-60% document
# split, score the held-out 40% so the backoff path actually fires:
#   lp(b|a) = ln(c_ab/c_a)          bigram seen in train
#           = ln(0.4 * c_b / N)     else, unigram b seen
#           = ln(0.4 * 0.4 / V)     else (double backoff to uniform)
# Per-bigram ln values snap to micro-units BEFORE the per-doc mean
# (order-independent integer sums, the unigram-LM idiom).  Model
# tables (bigram counts, unigram counts, scalars) are vocabulary-
# bounded broadcasts onto the held-out bigram stream; corpus-sized
# shuffles are the two count aggregations and the per-doc mean.
# ---------------------------------------------------------------------------
_BB_TRAIN_PCT = 60

_BB_CTES = f"""
WITH d AS (
  SELECT doc_id, text,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#nb'), 1, 8))::BIGINT
           % 100 AS bkt,
         CASE WHEN len(string_split(text, ' ')) >= 2
              THEN list_transform(range(1, len(string_split(text, ' '))),
                                  i -> string_split(text, ' ')[i] || ' ' ||
                                       string_split(text, ' ')[i + 1])
              ELSE [] END AS bigrams
  FROM documents
),
bc AS (
  SELECT bg, COUNT(*) AS c FROM (
    SELECT unnest(bigrams) AS bg FROM d WHERE bkt < {_BB_TRAIN_PCT}
  ) GROUP BY bg
),
uni AS (
  SELECT tok, COUNT(*) AS c FROM (
    SELECT unnest(string_split(text, ' ')) AS tok
    FROM d WHERE bkt < {_BB_TRAIN_PCT}
  ) GROUP BY tok
),
n_tot AS (SELECT SUM(c) AS n FROM uni),
v_tot AS (SELECT COUNT(*) AS v FROM uni),
te AS (
  SELECT doc_id, unnest(bigrams) AS bg
  FROM d WHERE bkt >= {_BB_TRAIN_PCT} AND len(bigrams) > 0
),
scored AS (
  SELECT t.doc_id,
         CAST(ROUND(CASE
             WHEN bc.c IS NOT NULL
               THEN ln(CAST(bc.c AS DOUBLE) / ua.c)
             WHEN ub.c IS NOT NULL
               THEN ln(0.4 * ub.c / n_tot.n)
             ELSE ln(0.16 / v_tot.v) END * 1e6) AS BIGINT) AS lp_micro
  FROM te t
  LEFT JOIN bc ON bc.bg = t.bg
  LEFT JOIN uni ua ON ua.tok = string_split(t.bg, ' ')[1]
  LEFT JOIN uni ub ON ub.tok = string_split(t.bg, ' ')[2],
  n_tot, v_tot
)"""

_BB_ORACLE = _BB_CTES + """
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(-CAST(SUM(lp_micro) AS DOUBLE) / COUNT(*) / 1e6, 6) AS xent
FROM scored
GROUP BY doc_id
"""


def _bigram_xent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-held-out-doc bigram-backoff cross-entropy (doc_id, n_bigrams,
    xent) — the q_bigram_backoff body, factored so q_ppl_gate can reuse
    the identical scoring chain (same model tables, same micro-unit
    rounding) without re-registering it."""
    from pyspec_spark.functions.determinism import _fixed6
    from pyspec_spark.queries.curation import _hash_mod100
    from pyspec_spark.tables import fanout

    # r13 (guide §2): the bigram build + both model-table explodes and
    # the held-out scoring explode all ran single-core below the
    # one-split scan; fanout first.  Everything downstream is integer
    # counts / _fixed6 micro-unit sums / min-max (q_ppl_gate's ntile
    # orders by the full (xent, doc_id) key) — order-safe; no-op at
    # scale.
    # r13: bucket + bigram build as ONE parsed-SQL projection (see
    # curation._replicate_copies' plan-construction note) — the exact
    # SQL faces of _hash_mod100 and _bigrams; oracle hash-green.
    d = fanout(table(spark, sf_dir, "documents"), "doc_id").selectExpr(
        "doc_id",
        "text",
        "CAST(conv(substring(md5(CAST(CAST(doc_id AS STRING) || '#nb'"
        " AS BINARY)), 1, 8), 16, 10) AS BIGINT) % 100 AS bkt",
        f"{_bigrams_sql()} AS bigrams",
    )
    train = d.where(f"bkt < {_BB_TRAIN_PCT}")
    # r13 optimization (guide §1.2/§5): the unigram table is consumed
    # four ways (n_tot, v_tot, and both join aliases ua/ub) and the
    # bigram table twice (q_ppl_gate layers more consumers on top) —
    # unpersisted, each reference re-ran the train-split tokenize +
    # explode + groupBy (12-14 document scans in the as-built plans).
    # Both are vocabulary-sized model tables; persisting them makes
    # the train pass run once per build.
    from pyspec_spark.registry import PERSIST_SEQ as _PERSIST_SEQ
    from pyspec_spark.registry import track_persist

    bc = track_persist(
        spark,
        f"_bigram_xent#bc#{next(_PERSIST_SEQ)}",
        train.selectExpr("explode(bigrams) AS bg")
        .groupBy("bg")
        .agg(F.count("*").alias("c")),
    )
    uni = track_persist(
        spark,
        f"_bigram_xent#uni#{next(_PERSIST_SEQ)}",
        train.selectExpr("explode(split(text, ' ')) AS tok")
        .groupBy("tok")
        .agg(F.count("*").alias("c")),
    )
    n_tot = uni.agg(F.expr("SUM(c)").alias("n"))
    v_tot = uni.agg(F.count("*").alias("v"))
    te = d.where(
        f"bkt >= {_BB_TRAIN_PCT} AND size(bigrams) > 0"
    ).selectExpr("doc_id", "explode(bigrams) AS bg")
    ua = uni.selectExpr("tok AS _ta", "c AS c_a")
    ub = uni.selectExpr("tok AS _tb", "c AS c_b")
    # (join conditions below index split(bg, ' ') directly — the former
    # shared `parts` Column is now inside the parsed strings)
    # r13: the backoff CASE + micro-unit snap as one parsed-SQL
    # projection (the exact SQL face of the former Column chain;
    # F.log == ln, _fixed6 == _fixed6_sql)
    from pyspec_spark.functions.determinism import _fixed6_sql

    lp = (
        "CASE WHEN c_ab IS NOT NULL THEN ln(CAST(c_ab AS DOUBLE) / c_a)"
        " WHEN c_b IS NOT NULL THEN ln(0.4D * c_b / n)"
        " ELSE ln(0.16D / v) END"
    )
    scored = (
        te.join(
            F.broadcast(bc.selectExpr("bg", "c AS c_ab")),
            "bg",
            "left",
        )
        .join(F.broadcast(ua), F.expr("split(bg, ' ')[0] = _ta"), "left")
        .join(F.broadcast(ub), F.expr("split(bg, ' ')[1] = _tb"), "left")
        .crossJoin(F.broadcast(n_tot))
        .crossJoin(F.broadcast(v_tot))
        .selectExpr("doc_id", f"{_fixed6_sql(lp)} AS lp_micro")
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.expr(
            "round(-CAST(SUM(lp_micro) AS DOUBLE) / COUNT(*) / 1E6, 6)"
        ).alias("xent"),
    )


@query("q_bigram_backoff", oracle=_BB_ORACLE)
def q_bigram_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _bigram_xent(spark, sf_dir)


# ---------------------------------------------------------------------------
# Gopher quality rules (r6) — the published document-filter heuristics
# of Rae et al. 2021 ("Scaling Language Models: ... Gopher", §A1.1 /
# MassiveWeb filtering), the ruleset most corpus pipelines quote:
#   word count in [50, 100k]; mean word length in [3, 10]; <= 90% of
#   lines starting with a bullet; <= 30% of lines ending in an
#   ellipsis; >= 80% of words containing an alphabetic character; >= 2
#   of the 8 "stop words" (the/be/to/of/and/that/have/with) present;
#   symbol-to-word ratio (# or ...) <= 0.1.
# Complements q_quality_gate (token bounds / dup-fraction / chars-per-
# token): these are the RULE-LEVEL flags, one row per document, so a
# curation pipeline can report per-rule kill rates, not just a pass
# bit.  (On the synthetic word-salad testdata the stopword rule kills
# ~everything — avg 0.76 of the 8 stop words present vs the >= 2
# threshold — which is the published rule behaving correctly on
# non-natural text; the per-rule metric columns are the informative
# output there.)  All map-only whole-stage-codegen expressions; exact integer
# counts with ratios rounded at the edge — one scan, no shuffle (the
# output is the per-doc table itself).
# ---------------------------------------------------------------------------
_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")

_GOPHER_ORACLE = f"""
WITH s AS (
  SELECT doc_id,
         string_split(text, ' ') AS w,
         string_split(text, chr(10)) AS lines,
         (length(text) - length(replace(text, '#', '')))
         + (length(text) - length(replace(text, '...', ''))) // 3 AS n_sym
  FROM documents
),
m AS (
  SELECT doc_id,
         len(w) AS n_words,
         CAST(len(array_to_string(w, '')) AS DOUBLE) / len(w) AS mwl,
         CAST(len(list_filter(lines, x -> trim(x) LIKE '-%'
                  OR trim(x) LIKE '*%' OR trim(x) LIKE chr(8226) || '%'))
              AS DOUBLE) / len(lines) AS bullet_ratio,
         CAST(len(list_filter(lines, x -> x LIKE '%...')) AS DOUBLE)
             / len(lines) AS ellipsis_ratio,
         CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
              AS DOUBLE) / len(w) AS alpha_frac,
         {" + ".join(f"CAST(list_contains(w, '{t}') AS INT)" for t in _GOPHER_STOPS)}
           AS n_stops,
         CAST(n_sym AS DOUBLE) / len(w) AS sym_ratio
  FROM s
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       ROUND(mwl, 6) AS mean_word_len,
       ROUND(sym_ratio, 6) AS symbol_word_ratio,
       ROUND(alpha_frac, 6) AS frac_alpha_words,
       CAST(n_stops AS INT) AS n_stopwords_present,
       ROUND(bullet_ratio, 6) AS bullet_ratio,
       ROUND(ellipsis_ratio, 6) AS ellipsis_ratio,
       CAST((n_words BETWEEN 50 AND 100000 AND mwl BETWEEN 3 AND 10
             AND bullet_ratio <= 0.9 AND ellipsis_ratio <= 0.3
             AND alpha_frac >= 0.8 AND n_stops >= 2
             AND sym_ratio <= 0.1) AS INT) AS passes
FROM m
ORDER BY doc_id
"""


def _gopher_metrics(
    spark: SparkSession, sf_dir: str, extra: tuple[str, ...] = ()
) -> DataFrame:
    """q_gopher_rules' per-doc metric table WITHOUT the presentation
    sort — the composable form (q_filter_attribution and
    q_source_scorecard build on it; a global doc_id sort before a
    downstream aggregation would be a wasted corpus shuffle).  `extra`
    passes through additional document columns as SQL expression
    strings (e.g. "source") so composers never need a doc_id join back
    to the corpus."""
    d = table(spark, sf_dir, "documents")
    # r13: the whole metric block as ONE parsed-SQL projection — the
    # former per-Column py4j construction cost ~150 round-trips per
    # build across this helper's three consumers (plan-construction
    # note in curation._replicate_copies).  Function-by-function
    # transliteration of the old Column chain ('D' suffixes pin the
    # former lit(float) operands to DoubleType); oracle hash-green.
    w = "split(text, ' ')"
    lines = "split(text, '\\n')"
    n_words = f"size({w})"
    mwl = f"CAST(length(array_join({w}, '')) AS DOUBLE) / {n_words}"
    n_hash = "(length(text) - length(replace(text, '#', '')))"
    n_ell = "((length(text) - length(replace(text, '...', ''))) / 3)"
    sym_ratio = f"CAST({n_hash} + floor({n_ell}) AS DOUBLE) / {n_words}"
    bullet = (
        f"CAST(size(filter({lines}, x -> startswith(trim(x), '-')"
        " OR startswith(trim(x), '*') OR startswith(trim(x), '•')))"
        f" AS DOUBLE) / size({lines})"
    )
    ellipsis = (
        f"CAST(size(filter({lines}, x -> endswith(x, '...')))"
        f" AS DOUBLE) / size({lines})"
    )
    alpha = (
        f"CAST(size(filter({w}, x -> x RLIKE '[A-Za-z]'))"
        f" AS DOUBLE) / {n_words}"
    )
    n_stops = " + ".join(
        f"CAST(array_contains({w}, '{t}') AS INT)" for t in _GOPHER_STOPS
    )
    passes = (
        f"CAST(({n_words} BETWEEN 50 AND 100000)"
        f" AND ({mwl} BETWEEN 3.0D AND 10.0D)"
        f" AND ({bullet} <= 0.9D) AND ({ellipsis} <= 0.3D)"
        f" AND ({alpha} >= 0.8D) AND ({n_stops} >= 2)"
        f" AND ({sym_ratio} <= 0.1D) AS INT)"
    )
    return d.selectExpr(
        "doc_id",
        *extra,
        f"CAST({n_words} AS BIGINT) AS n_words",
        f"round({mwl}, 6) AS mean_word_len",
        f"round({sym_ratio}, 6) AS symbol_word_ratio",
        f"round({alpha}, 6) AS frac_alpha_words",
        f"CAST({n_stops} AS INT) AS n_stopwords_present",
        f"round({bullet}, 6) AS bullet_ratio",
        f"round({ellipsis}, 6) AS ellipsis_ratio",
        f"{passes} AS passes",
    )


@query("q_gopher_rules", oracle=_GOPHER_ORACLE)
def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _gopher_metrics(spark, sf_dir).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Filter attribution (r7) — per-rule kill accounting over the Gopher
# ruleset: for every rule, how many documents fail it, how many fail it
# AND NOTHING ELSE (solo kills — the marginal cost of keeping the rule:
# drop the rule, and exactly those documents come back), and the failed
# fraction.  The diagnostic every curation stack reads before tuning
# thresholds — per-doc flags (q_gopher_rules) answer "why did MY doc
# die"; this answers "what is each rule doing to the corpus".
#
# Flags are derived from the ROUNDED metric columns q_gopher_rules
# emits (identical in both engines by its own oracle proof), so this
# query composes on that contract — the same CTE-prefix reuse trick as
# q_pca_power on q_embed_cov.  Plan: one corpus scan (map-only metric
# expressions), a 7x map-side struct expansion, ONE aggregation on a
# 7-key space.  No shuffle carries more than |rules| x partial rows.
# ---------------------------------------------------------------------------
_ATTR_RULES = (
    "alpha", "bullet", "ellipsis", "mwl", "stops", "symbol", "words",
)

_ATTR_FLAG_SQL = {
    "words": "CAST(NOT (n_words BETWEEN 50 AND 100000) AS INT)",
    "mwl": "CAST(NOT (mean_word_len BETWEEN 3 AND 10) AS INT)",
    "bullet": "CAST(bullet_ratio > 0.9 AS INT)",
    "ellipsis": "CAST(ellipsis_ratio > 0.3 AS INT)",
    "alpha": "CAST(frac_alpha_words < 0.8 AS INT)",
    "stops": "CAST(n_stopwords_present < 2 AS INT)",
    "symbol": "CAST(symbol_word_ratio > 0.1 AS INT)",
}

_ATTR_ORACLE = f"""
WITH g AS ({_GOPHER_ORACLE}),
f AS (
  SELECT doc_id,
         {", ".join(f"{sql} AS {r}" for r, sql in _ATTR_FLAG_SQL.items())}
  FROM g
),
u AS (
  SELECT r.rule,
         CASE r.rule {" ".join(f"WHEN '{r}' THEN {r}" for r in _ATTR_RULES)} END
           AS failed,
         {" + ".join(_ATTR_RULES)} AS n_fails
  FROM f, (SELECT unnest({list(_ATTR_RULES)}) AS rule) r
)
SELECT rule,
       CAST(SUM(failed) AS BIGINT) AS n_failed,
       CAST(SUM(CASE WHEN failed = 1 AND n_fails = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_solo_failed,
       ROUND(CAST(SUM(failed) AS DOUBLE) / COUNT(*), 6) AS frac_failed
FROM u
GROUP BY rule
ORDER BY rule
"""


@query("q_filter_attribution", oracle=_ATTR_ORACLE)
def q_filter_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _gopher_metrics(spark, sf_dir)
    # r13: flags / struct array / aggregates as parsed SQL — the former
    # per-Column construction (7 structs + 3 agg chains) cost ~800 py4j
    # round trips per build (plan-construction note in
    # curation._replicate_copies).  1:1 transliteration of the former
    # Column chain ('D' suffixes pin the former lit(float) operands).
    flags = {
        "words": "NOT (n_words BETWEEN 50 AND 100000)",
        "mwl": "NOT (mean_word_len BETWEEN 3.0D AND 10.0D)",
        "bullet": "bullet_ratio > 0.9D",
        "ellipsis": "ellipsis_ratio > 0.3D",
        "alpha": "frac_alpha_words < 0.8D",
        "stops": "n_stopwords_present < 2",
        "symbol": "symbol_word_ratio > 0.1D",
    }
    arr = ", ".join(
        f"named_struct('rule', '{r}', 'failed', CAST(({flags[r]}) AS INT))"
        for r in _ATTR_RULES
    )
    n_fails = " + ".join(f"CAST(({flags[r]}) AS INT)" for r in _ATTR_RULES)
    ex = g.selectExpr(
        f"explode(array({arr})) AS r", f"({n_fails}) AS n_fails"
    )
    return (
        ex.groupBy(F.col("r.rule").alias("rule"))
        .agg(
            F.expr("SUM(r.failed)").alias("n_failed"),
            F.expr(
                "SUM(CASE WHEN r.failed = 1 AND n_fails = 1"
                " THEN 1 ELSE 0 END)"
            ).alias("n_solo_failed"),
            F.expr(
                "round(CAST(SUM(r.failed) AS DOUBLE) / COUNT(*), 6)"
            ).alias("frac_failed"),
        )
        .orderBy("rule")
    )


# ---------------------------------------------------------------------------
# Source scorecard (r7) — the per-source crawl-triage rollup a mixture
# designer reads FIRST: volume (docs, tokens), redundancy (within-
# source exact-dup fraction), and quality (Gopher pass fraction), one
# row per source.  Composes the dedup and quality families over a
# SINGLE corpus scan: _gopher_metrics passes `source` and the text
# hash through, so no join back to the corpus is ever needed.  The
# per-source COUNT(DISTINCT hash) is the only 2-phase aggregation
# (Spark's distinct-expand); everything else rides the same shuffle.
# ---------------------------------------------------------------------------
_SCORECARD_ORACLE = f"""
WITH g AS ({_GOPHER_ORACLE}),
d AS (SELECT doc_id, source, md5(text) AS h FROM documents)
SELECT d.source,
       COUNT(*) AS n_docs,
       CAST(COUNT(*) - COUNT(DISTINCT d.h) AS BIGINT) AS n_dup_docs,
       ROUND(1.0 - CAST(COUNT(DISTINCT d.h) AS DOUBLE) / COUNT(*), 6)
         AS dup_frac,
       CAST(SUM(g.passes) AS BIGINT) AS n_pass,
       ROUND(CAST(SUM(g.passes) AS DOUBLE) / COUNT(*), 6) AS pass_frac,
       CAST(SUM(g.n_words) AS BIGINT) AS total_tokens,
       ROUND(CAST(SUM(g.n_words) AS DOUBLE) / COUNT(*), 6) AS mean_tokens
FROM g JOIN d USING (doc_id)
GROUP BY d.source
ORDER BY d.source
"""


@query("q_source_scorecard", oracle=_SCORECARD_ORACLE)
def q_source_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _gopher_metrics(
        spark,
        sf_dir,
        extra=(
            "source",
            "md5(CAST(text AS BINARY)) AS text_h",
        ),
    )
    return (
        g.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            (F.count("*") - F.countDistinct("text_h")).alias("n_dup_docs"),
            F.round(
                1.0
                - F.countDistinct("text_h").cast("double") / F.count("*"),
                6,
            ).alias("dup_frac"),
            F.sum("passes").alias("n_pass"),
            F.round(
                F.sum("passes").cast("double") / F.count("*"), 6
            ).alias("pass_frac"),
            F.sum("n_words").alias("total_tokens"),
            F.round(
                F.sum("n_words").cast("double") / F.count("*"), 6
            ).alias("mean_tokens"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# CCNet-style perplexity gate (r6b, Wenzek et al. 2020 "CCNet:
# Extracting High Quality Monolingual Datasets from Web Crawl Data"):
# score every held-out document with the bigram-backoff LM, then bucket
# it into head / middle / tail perplexity TERCILES **per language** —
# the published CCNet recipe (per-lang KenLM perplexity thirds; head =
# cleanest).  Output is the per-(lang, bucket) audit table a curation
# run reports: document count and avg/min/max cross-entropy.
#
# Scale posture: the scoring chain is q_bigram_backoff's (vocabulary-
# bounded broadcast model tables; corpus shuffles = two count aggs +
# the per-doc mean).  The tercile label is NTILE(3) over (lang) — one
# range-sort exchange partitioned by language, the same shape as any
# per-group ranking; at 100 TB a production run would snap the two
# tercile cut points per lang from a sketch and broadcast them, but the
# declared query keeps the exact window so DuckDB can replay it
# bit-for-bit.  Per-bucket means sum micro-unit integers (order-
# independent) before the single rounded divide.
# ---------------------------------------------------------------------------
_PPL_ORACLE = _BB_CTES + """,
xent AS (
  SELECT doc_id,
         ROUND(-CAST(SUM(lp_micro) AS DOUBLE) / COUNT(*) / 1e6, 6) AS xent
  FROM scored GROUP BY doc_id
),
lab AS (
  SELECT dd.lang, x.xent,
         NTILE(3) OVER (PARTITION BY dd.lang
                        ORDER BY x.xent, x.doc_id) AS bucket
  FROM xent x JOIN documents dd ON dd.doc_id = x.doc_id
)
SELECT lang, bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(CAST(ROUND(xent * 1e6) AS BIGINT)) AS DOUBLE)
             / COUNT(*) / 1e6, 6) AS avg_xent,
       MIN(xent) AS min_xent,
       MAX(xent) AS max_xent
FROM lab
GROUP BY lang, bucket
ORDER BY lang, bucket
"""


@query("q_ppl_gate", oracle=_PPL_ORACLE)
def q_ppl_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    xent = _bigram_xent(spark, sf_dir).select("doc_id", "xent")
    langs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    # r13: ntile window + micro-unit mean as parsed SQL (1:1
    # transliteration of the former Column chain; see
    # curation._replicate_copies' plan-construction note).
    lab = xent.join(langs, "doc_id").selectExpr(
        "lang",
        "xent",
        "ntile(3) OVER (PARTITION BY lang ORDER BY xent, doc_id) AS bucket",
    )
    return (
        lab.groupBy("lang", "bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.expr(
                "round(CAST(SUM(CAST(round(xent * 1E6) AS BIGINT))"
                " AS DOUBLE) / COUNT(*) / 1E6, 6)"
            ).alias("avg_xent"),
            F.min("xent").alias("min_xent"),
            F.max("xent").alias("max_xent"),
        )
        .orderBy("lang", "bucket")
    )


# ---------------------------------------------------------------------------
# Per-document token entropy (r6b) — Shannon entropy of the in-doc
# unigram distribution, the lexical-diversity face of the repetition
# family (dup_token_frac says how MUCH repeats; entropy says how
# concentrated the distribution is).  Plan: ONE up-front doc_id
# repartition satisfies both the (doc_id, tok) count aggregation and
# the per-doc window/final agg (the q_repetition single-exchange
# idiom).  Per-term p*ln(p) snaps to micro-units before the order-
# independent integer sum.
# ---------------------------------------------------------------------------
_ENT_ORACLE = """
WITH c AS (
  SELECT doc_id, tok, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents)
  GROUP BY doc_id, tok
),
n AS (SELECT doc_id, SUM(c) AS n, COUNT(*) AS v FROM c GROUP BY doc_id)
SELECT c.doc_id,
       CAST(ANY_VALUE(n.n) AS BIGINT) AS n_tokens,
       CAST(ANY_VALUE(n.v) AS BIGINT) AS n_distinct,
       ROUND(-CAST(SUM(CAST(ROUND(
             (CAST(c.c AS DOUBLE) / n.n) * ln(CAST(c.c AS DOUBLE) / n.n)
             * 1e6) AS BIGINT)) AS DOUBLE) / 1e6, 6) AS entropy
FROM c JOIN n USING (doc_id)
GROUP BY c.doc_id
"""


@query("q_token_entropy", oracle=_ENT_ORACLE)
def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    cnt = (
        d.select("doc_id", F.explode(_toks()).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    w = Window.partitionBy("doc_id")
    p = F.col("c").cast("double") / F.col("n")
    term = F.round(p * F.log(p) * 1e6).cast("long")
    return (
        cnt.withColumn("n", F.sum("c").over(w))
        .withColumn("v", F.count("*").over(w))
        .groupBy("doc_id")
        .agg(
            F.first("n").alias("n_tokens"),
            F.first("v").cast("long").alias("n_distinct"),
            F.round(-F.sum(term).cast("double") / 1e6, 6).alias("entropy"),
        )
    )


# ---------------------------------------------------------------------------
# Per-source KL divergence vs the corpus unigram distribution (r6b) —
# the domain-shift audit a mixture designer reads next to the DSIR
# weights: KL(p_source || p_corpus) = sum_t p_st * ln(p_st / q_t).
# The per-source totals (ns) and grand total (big_n) are
# source-count-bounded and broadcast; the corpus token distribution
# (tot) is VOCABULARY-sized — at web scale that is too big to
# broadcast, so it joins on `tok` via an ordinary shuffle (AQE may
# still broadcast it when it measures small).  Same micro-unit
# integer-sum determinism as the entropy/LM family.
# ---------------------------------------------------------------------------
_KL_ORACLE = """
WITH st AS (
  SELECT source, tok, COUNT(*) AS c
  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
        FROM documents)
  GROUP BY source, tok
),
tot AS (SELECT tok, SUM(c) AS ct FROM st GROUP BY tok),
big_n AS (SELECT SUM(c) AS n FROM st),
ns AS (SELECT source, SUM(c) AS ns FROM st GROUP BY source)
SELECT st.source,
       CAST(ANY_VALUE(ns.ns) AS BIGINT) AS n_tokens,
       ROUND(CAST(SUM(CAST(ROUND(
             (CAST(st.c AS DOUBLE) / ns.ns) *
             ln((CAST(st.c AS DOUBLE) / ns.ns) /
                (CAST(tot.ct AS DOUBLE) / big_n.n)) * 1e6) AS BIGINT))
             AS DOUBLE) / 1e6, 6) AS kl
FROM st
JOIN ns USING (source)
JOIN tot USING (tok), big_n
GROUP BY st.source
ORDER BY st.source
"""


@query("q_source_kl", oracle=_KL_ORACLE)
def q_source_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    # Tracked persist (r14 — formerly a bare .cache()): st is consumed
    # three times (tot, ns, main join); without it Spark re-scans and
    # re-explodes the whole corpus per consumer — the dominant cost at
    # 100 TB.  Lazy, so zero jobs at build (gate); release_persisted
    # drains.
    from pyspec_spark.registry import PERSIST_SEQ, track_persist

    st = track_persist(
        spark,
        f"q_source_kl#st#{next(PERSIST_SEQ)}",
        d.select("source", F.explode(_toks()).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").alias("c")),
    )
    tot = st.groupBy("tok").agg(F.sum("c").alias("ct"))
    ns = st.groupBy("source").agg(F.sum("c").alias("ns"))
    # grand total from the source totals (|sources| rows), not a fourth
    # pass over st
    big_n = ns.agg(F.sum("ns").alias("n"))
    p = F.col("c").cast("double") / F.col("ns")
    q = F.col("ct").cast("double") / F.col("n")
    term = F.round(p * F.log(p / q) * 1e6).cast("long")
    return (
        st.join(F.broadcast(ns), "source")
        .join(tot, "tok")
        .crossJoin(F.broadcast(big_n))
        .groupBy("source")
        .agg(
            F.first("ns").alias("n_tokens"),
            F.round(F.sum(term).cast("double") / 1e6, 6).alias("kl"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# L33 — tokenizer fertility (r7): the per-language bytes/token and
# subwords/word table a team reads when choosing a tokenizer for a
# multilingual corpus (high fertility = a language pays more sequence
# positions per word; the reason BPE vocabularies get rebalanced).
# "Subword" here = the GPT-2-style pre-tokenizer classes both engines
# regex identically: letter runs merge, DIGITS SPLIT ONE PER TOKEN
# (the Llama-style digit rule), punctuation one per token.  All
# per-doc counts are exact ints; the two ratios are single
# bigint/bigint double divisions under terminal ROUNDs.  Map-only scan
# then ONE |langs|-key shuffle.
# ---------------------------------------------------------------------------
_FERTILITY_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"

_FERTILITY_ORACLE = f"""
WITH d AS (
  SELECT lang,
         len(string_split(text, ' ')) AS n_words,
         len(regexp_extract_all(text, '{_FERTILITY_RE}')) AS n_sub,
         strlen(text) AS n_bytes
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS n_words,
       CAST(SUM(n_sub) AS BIGINT) AS n_subwords,
       ROUND(CAST(SUM(n_sub) AS DOUBLE) / SUM(n_words), 6) AS fertility,
       ROUND(CAST(SUM(n_bytes) AS DOUBLE) / SUM(n_sub), 6)
         AS bytes_per_subword
FROM d
GROUP BY lang
ORDER BY lang
"""


@query("q_token_fertility", oracle=_FERTILITY_ORACLE)
def q_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13 (second pass): projections/aggregates as parsed SQL (1:1
    # transliteration of the former Column chain)
    d = table(spark, sf_dir, "documents").selectExpr(
        "lang",
        "size(split(text, ' ')) AS n_words",
        f"size(regexp_extract_all(text, '{_FERTILITY_RE}', 0)) AS n_sub",
        "octet_length(text) AS n_bytes",
    )
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.expr("SUM(n_words)").alias("n_words"),
            F.expr("SUM(n_sub)").alias("n_subwords"),
            F.expr("SUM(n_bytes)").alias("n_bytes"),
        )
        .selectExpr(
            "lang",
            "n_docs",
            "n_words",
            "n_subwords",
            "round(CAST(n_subwords AS DOUBLE) / n_words, 6) AS fertility",
            "round(CAST(n_bytes AS DOUBLE) / n_subwords, 6)"
            " AS bytes_per_subword",
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# L34 — filter operating-point sweep (r7): the threshold-tuning table
# behind every "we set the quality gate at X" decision — for a grid of
# candidate thresholds on the alpha-word ratio (fraction of words
# containing a letter, the Gopher 80%-rule axis), how many docs and
# what fraction of the token mass survive.  Produced BEFORE committing
# to a gate, this is how the operating point gets chosen; the solo-kill
# complement (q_filter_attribution) audits the gate AFTER.
#
# Determinism: the kept-predicate is exact integer arithmetic
# (100*n_alpha >= t100*n_words — no float ratio compare), and every
# output ratio is one bigint/bigint double division under a terminal
# ROUND.  Plan: ONE corpus scan -> map-side 20x grid explode ->
# 20-key shuffle; the denominators are MAX() OVER () on the 20-row
# aggregate itself (threshold 0 keeps everything, so the maxima ARE
# the totals) — a single-partition window over 20 rows instead of a
# second corpus pass (a tot-row self-join measurably re-scanned the
# corpus: Spark does not dedup the shared subtree across the join's
# branches here, even under AQE).
# ---------------------------------------------------------------------------
_SWEEP_STEPS = 20  # t100 = 0,5,...,95

_GATE_SWEEP_ORACLE = f"""
WITH d AS (
  SELECT len(string_split(text, ' ')) AS n_words,
         len(list_filter(string_split(text, ' '),
                         x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha
  FROM documents
),
sweep AS (
  SELECT CAST(5 * range AS INT) AS t100,
         CAST(COUNT(CASE WHEN 100 * d.n_alpha >= 5 * range * d.n_words
                         THEN 1 END) AS BIGINT) AS n_kept,
         CAST(COALESCE(SUM(CASE WHEN 100 * d.n_alpha >= 5 * range * d.n_words
                       THEN d.n_words END), 0) AS BIGINT) AS w_kept
  FROM d, range({_SWEEP_STEPS})
  GROUP BY 1
),
tot AS (SELECT n_kept AS n_all, w_kept AS w_all FROM sweep WHERE t100 = 0)
SELECT t100, n_kept,
       ROUND(CAST(n_kept AS DOUBLE) / n_all, 6) AS kept_frac,
       ROUND(CAST(w_kept AS DOUBLE) / w_all, 6) AS words_kept_frac,
       ROUND(CAST(w_kept AS DOUBLE) / n_kept, 6) AS mean_words_kept
FROM sweep, tot
ORDER BY t100
"""


@query("q_gate_sweep", oracle=_GATE_SWEEP_ORACLE)
def q_gate_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13 (second pass): grid / gate / windows as parsed SQL (1:1
    # transliteration of the former Column chain)
    d = table(spark, sf_dir, "documents").selectExpr(
        "size(split(text, ' ')) AS n_words",
        "size(filter(split(text, ' '), x -> x RLIKE '[A-Za-z]'))"
        " AS n_alpha",
    )
    grid = ", ".join(str(5 * i) for i in range(_SWEEP_STEPS))
    kept = "t100 * n_words <= 100 * n_alpha"
    sweep = (
        d.selectExpr("n_words", "n_alpha", f"explode(array({grid})) AS t100")
        .groupBy("t100")
        .agg(
            F.expr(f"COUNT(CASE WHEN {kept} THEN 1 END)").alias("n_kept"),
            F.expr(
                f"coalesce(SUM(CASE WHEN {kept} THEN n_words END), 0)"
            ).alias("w_kept"),
        )
    )
    return (
        sweep.selectExpr("*", "MAX(n_kept) OVER () AS n_all")
        .selectExpr("*", "MAX(w_kept) OVER () AS w_all")
        .selectExpr(
            "t100",
            "n_kept",
            "round(CAST(n_kept AS DOUBLE) / n_all, 6) AS kept_frac",
            "round(CAST(w_kept AS DOUBLE) / w_all, 6) AS words_kept_frac",
            "round(CAST(w_kept AS DOUBLE) / n_kept, 6) AS mean_words_kept",
        )
        .orderBy("t100")
    )


# ---------------------------------------------------------------------------
# L42 — blocklist word filter (r7): the C4 "bad words" gate (Raffel et
# al. 2020 drop any page containing ANY word from a fixed blocklist) —
# distinct from the ratio-based Gopher rules (L23): this is membership,
# not statistics, and it kills on a single occurrence.  Per doc: the
# occurrence count, the (deterministic, lexicographically-first)
# matching word for audit attribution, and the kill flag.  Token basis
# = the proven single-space split.
#
# 100 TB posture: the blocklist is a constant array folded into the
# plan (a real blocklist is a few thousand words — still a plan
# literal or a tiny broadcast, never a shuffle side); the whole filter
# is ONE map-only codegen projection, no shuffle beyond the
# presentation sort (plan-gated).
# ---------------------------------------------------------------------------
_BADWORDS = ["dup", "slow", "leak"]

_BADWORD_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '),
                     w -> list_contains({_BADWORDS}, w)) AS hits
  FROM documents
)
SELECT doc_id,
       CAST(len(hits) AS BIGINT) AS n_bad,
       list_min(hits) AS first_bad,
       len(hits) > 0 AS killed
FROM t
ORDER BY doc_id
"""


@query("q_badword_filter", oracle=_BADWORD_ORACLE)
def q_badword_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    bl = F.array(*[F.lit(w) for w in _BADWORDS])
    hits = F.filter(_toks(), lambda w: F.array_contains(bl, w))
    return (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.size(hits).cast("bigint").alias("n_bad"),
            F.array_min(hits).alias("first_bad"),
            (F.size(hits) > 0).alias("killed"),
        )
        .orderBy("doc_id")
    )
