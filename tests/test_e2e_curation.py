"""End-to-end training-corpus curation workflow — the complete pipeline
a data-engineering user would run with this engine, composed from the
declared operators:

    raw docs -> exact dedup (md5) -> near-dup clustering (MinHash-LSH
    pairs -> connected components -> keep min per cluster) -> quality
    gate -> benchmark decontamination -> per-source token budget

Asserts the invariants that make the pipeline trustworthy: monotone
shrinkage at every stage, no surviving exact duplicates, every survivor
passes the gate, no survivor is contaminated, per-source token budgets
hold, and the whole run is deterministic."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
TOKEN_BUDGET = 3000


def _curate(spark):
    from pyspec_spark.operators.dedup import connected_components, minhash_neardup
    from pyspec_spark.tables import table

    docs = table(spark, SF, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    n0 = docs.count()

    # 1. exact dedup: keep the smallest doc_id per md5(text)
    keep_exact = (
        docs.groupBy(F.md5(F.col("text").cast("binary")).alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    d1 = docs.join(keep_exact, "doc_id")
    n1 = d1.count()

    # 2. near-dup clustering: pairs -> components -> keep cluster min
    pairs = minhash_neardup(d1, threshold=0.8).select("id_a", "id_b")
    comp = connected_components(pairs, src="id_a", dst="id_b")
    drop = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    d2 = d1.join(drop, "doc_id", "left_anti")
    n2 = d2.count()

    # 3. quality gate (same thresholds as q_quality_gate)
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    dup_frac = F.lit(1.0) - F.size(F.array_distinct(toks)).cast("double") / n_tokens
    cpt = F.length("text").cast("double") / n_tokens
    d3 = d2.where(
        n_tokens.between(20, 1000) & (dup_frac <= 0.6) & cpt.between(3.0, 12.0)
    ).withColumn("n_tokens", n_tokens)
    n3 = d3.count()

    # 4. decontamination: drop docs flagged against the benchmark set
    from pyspec_spark.queries.quality import q_decontaminate

    flagged = q_decontaminate.__wrapped__(spark, SF).select("doc_id")
    d4 = d3.join(flagged, "doc_id", "left_anti")
    n4 = d4.count()

    # 5. per-source token budget (hash order, cumulative cutoff)
    w = (
        Window.partitionBy("source")
        .orderBy(F.md5(F.col("doc_id").cast("string").cast("binary")), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d5 = d4.withColumn("cum", F.sum("n_tokens").over(w)).where(
        F.col("cum") <= TOKEN_BUDGET
    )
    return docs, (n0, n1, n2, n3, n4), d5


def test_curation_pipeline_invariants(spark):
    docs, (n0, n1, n2, n3, n4), final = _curate(spark)
    rows = final.collect()
    n5 = len(rows)
    # monotone shrinkage, nothing degenerate
    assert n0 >= n1 >= n2 >= n3 >= n4 >= n5 > 0
    # no exact duplicates survive
    texts = [r["text"] for r in rows]
    assert len(set(texts)) == len(texts)
    # every survivor passes the gate
    for r in rows:
        toks = r["text"].split(" ")
        assert 20 <= len(toks) <= 1000
        assert 1 - len(set(toks)) / len(toks) <= 0.6
        assert 3.0 <= len(r["text"]) / len(toks) <= 12.0
    # per-source budget holds
    per_source: dict = {}
    for r in rows:
        per_source.setdefault(r["source"], 0)
        per_source[r["source"]] += r["n_tokens"]
    assert all(v <= TOKEN_BUDGET for v in per_source.values())


def test_curation_pipeline_r5b_extension(spark):
    """Round-5b stages wired around the core pipeline: the HTML front
    door recovers every document's text, the Bloom pre-screen's drop
    set contains the exact decontaminator's drop set (one-sided error,
    so pre-screening can only over-drop within the FPR), and the
    split accounting partitions the survivors exactly."""
    from pyspec_spark.operators.text import html_to_text
    from pyspec_spark.queries.curation import (
        _HTML_POST,
        _HTML_PRE,
        _HTML_SEP,
        _hash_mod100,
        q_bloom_decontam,
    )
    from pyspec_spark.queries.quality import q_decontaminate
    from pyspec_spark.tables import table

    docs = table(spark, SF, "documents")
    # 0. HTML front door: extract(wrap(text)) == text + fixed chrome
    # (whitespace-collapsed — empty docs collapse the chrome seam)
    html = F.concat(
        F.lit(_HTML_PRE),
        F.replace(F.col("text"), F.lit(" "), F.lit(_HTML_SEP)),
        F.lit(_HTML_POST),
    )
    expected = F.trim(
        F.regexp_replace(
            F.concat(
                F.lit("Doc "), F.col("text"), F.lit(" \"cite' © 2026 <corp>")
            ),
            r"\s+",
            " ",
        )
    )
    mismatches = (
        docs.select(html_to_text(html).alias("t"), expected.alias("e"))
        .where(F.col("t") != F.col("e"))
        .count()
    )
    assert mismatches == 0
    # 4b. Bloom pre-screen ⊇ exact decontaminate at the same threshold
    bloom_ids = {
        r["doc_id"]
        for r in q_bloom_decontam.__wrapped__(spark, SF).collect()
    }
    exact_ids = {
        r["doc_id"] for r in q_decontaminate.__wrapped__(spark, SF).collect()
    }
    assert exact_ids <= bloom_ids
    # 6. split accounting partitions the pipeline survivors exactly
    _, _, final = _curate(spark)
    surv = final.select("doc_id", "n_tokens")
    n_surv = surv.count()
    b = _hash_mod100(F.col("doc_id"), "#split")
    split = F.when(b < 96, "train").when(b < 98, "val").otherwise("test")
    acct = (
        surv.select(split.alias("split"), "n_tokens")
        .groupBy("split")
        .agg(F.count("*").alias("n"), F.sum("n_tokens").alias("tok"))
        .collect()
    )
    assert sum(r["n"] for r in acct) == n_surv > 0
    assert (
        sum(r["tok"] for r in acct)
        == surv.agg(F.sum("n_tokens")).collect()[0][0]
    )


def test_curation_pipeline_deterministic(spark):
    _, counts_a, final_a = _curate(spark)
    _, counts_b, final_b = _curate(spark)
    assert counts_a == counts_b
    ka = sorted(r["doc_id"] for r in final_a.collect())
    kb = sorted(r["doc_id"] for r in final_b.collect())
    assert ka == kb
