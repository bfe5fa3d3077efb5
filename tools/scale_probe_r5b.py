#!/usr/bin/env python
"""Weak-scaling probe for the round-5b curation/graph family.

Reuses tools/scale_probe.py's replica builders: salted document
replicas (vocabulary bijection per replica — corpus structure
isomorphic, cross-replica similarity ~zero) for the curation queries,
and an offset-key lineitem replica (k disjoint graph components) for
PageRank.  noop sink = full re-execution, warm best-of-3, local[32].

Prints SCALING.md-ready markdown lines.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_probe import (  # noqa: E402
    SRC,
    WORK,
    _best_of,
    build_neardup_replica,
)

from pyspec_spark import registry  # noqa: E402
from pyspec_spark.session import get_spark  # noqa: E402

CURATION = [
    "q_bloom_decontam",
    "q_nb_classify",
    "q_split_assign",
    "q_mix_temperature",
    "q_html_extract",
]


def build_graph_replica(spark, k: int) -> str:
    """lineitem ×k with offset part/supp keys: k disjoint isomorphic
    graph components — nodes, edges and PageRank work all grow ×k
    while per-component structure (and the rank values) stay fixed."""
    from functools import reduce

    from pyspark.sql import functions as F

    dest = f"{WORK}/graph_x{k}"
    if os.path.exists(f"{dest}/lineitem.parquet/_SUCCESS"):
        return dest
    shutil.rmtree(dest, ignore_errors=True)
    os.makedirs(dest, exist_ok=True)
    li = spark.read.parquet(f"{SRC}/lineitem.parquet").select(
        "l_partkey", "l_suppkey"
    )
    p_off = li.agg(F.max("l_partkey")).collect()[0][0] + 1
    s_off = li.agg(F.max("l_suppkey")).collect()[0][0] + 1
    parts = [
        li.withColumn("l_partkey", F.col("l_partkey") + F.lit(i * p_off))
        .withColumn("l_suppkey", F.col("l_suppkey") + F.lit(i * s_off))
        for i in range(k)
    ]
    reduce(lambda a, b: a.unionAll(b), parts).repartition(k).write.mode(
        "overwrite"
    ).parquet(f"{dest}/lineitem.parquet")
    return dest


def build_embed_replica(spark, k: int) -> str:
    """embeddings ×k with offset vec_ids (documents symlinked): vector
    count grows ×k while the k-means init stays the first 4 ids, so
    cluster sizes grow ×k and the SemDeDup pair scan grows ×k² — the
    honest signature of running the method with a FIXED cluster count;
    the method's own prescription is to grow k with n."""
    from functools import reduce

    from pyspark.sql import functions as F

    dest = f"{WORK}/embed_x{k}"
    if os.path.exists(f"{dest}/embeddings.parquet/_SUCCESS"):
        return dest
    shutil.rmtree(dest, ignore_errors=True)
    os.makedirs(dest, exist_ok=True)
    e = spark.read.parquet(f"{SRC}/embeddings.parquet")
    off = e.agg(F.max("vec_id")).collect()[0][0] + 1
    parts = [
        e.withColumn("vec_id", F.col("vec_id") + F.lit(i * off))
        for i in range(k)
    ]
    reduce(lambda a, b: a.unionAll(b), parts).repartition(k).write.mode(
        "overwrite"
    ).parquet(f"{dest}/embeddings.parquet")
    for t in ("documents",):
        dst = f"{dest}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)
    return dest


def probe_semdedup_bigram(spark, ks_sem, ks_big) -> None:
    from pyspec_spark import registry

    print("| k | vecs | q_semdedup |")
    print("|---|---|---|")
    for k in ks_sem:
        d = build_embed_replica(spark, k)
        n = spark.read.parquet(f"{d}/embeddings.parquet").count()
        fn = registry.QUERIES["q_semdedup"]

        def run():
            spark.catalog.clearCache()  # semdedup cache()s its members
            fn(spark, d).write.format("noop").mode("overwrite").save()

        t = _best_of(run)
        print(f"| {k} | {n:,} | {t * 1000:.0f} ms |")
    print("| k | docs | q_bigram_backoff |")
    print("|---|---|---|")
    for k in ks_big:
        d = build_neardup_replica(spark, k)
        n = spark.read.parquet(f"{d}/documents.parquet").count()
        fn = registry.QUERIES["q_bigram_backoff"]
        t = _best_of(
            lambda: fn(spark, d).write.format("noop").mode("overwrite").save()
        )
        print(f"| {k} | {n:,} | {t * 1000:.0f} ms |")


def probe_pipelines(spark, ks) -> None:
    """r6 VERDICT #5: weak-scale the two MULTI-STAGE compositions —
    q_curation_pipeline (dedup→gate→decontaminate→budget) and
    q_dedup_clusters (shingle→jaccard→connected components) — which the
    per-stage probes don't cover (stage interactions: shuffle reuse,
    cached intermediates, CC iteration count growth).  Per k: wall time
    (noop, caches cleared — both compositions cache interiors), output
    rows (linearity check: salted replicas ⇒ output ~×k), and whether
    AQE's runtime skew-split fired anywhere in the FINAL adaptive plan
    (`skew=...` markers scraped from the executed plan after a
    collect)."""
    from pyspark.sql import functions as F  # noqa: F401

    def dedup_clusters_uncapped(spark, d):
        # the q_dedup_clusters composition WITHOUT the doc_id<500
        # oracle-replayability slice — otherwise replicas (offset ids)
        # add zero work and the probe measures nothing
        from pyspec_spark.operators.dedup import connected_components
        from pyspec_spark.queries.llm import jaccard_pairs

        edges = jaccard_pairs(spark, d, max_doc_id=None).select(
            "doc_a", "doc_b"
        )
        return connected_components(edges, src="doc_a", dst="doc_b")

    subjects = [
        ("q_curation_pipeline", lambda s, d: registry.QUERIES[
            "q_curation_pipeline"](s, d)),
        ("dedup_clusters (uncapped)", dedup_clusters_uncapped),
    ]
    for name, build in subjects:
        print(f"| k | docs | {name} wall | out rows | AQE skew joins |")
        print("|---|---|---|---|---|")
        for k in ks:
            d = build_neardup_replica(spark, k)
            n = spark.read.parquet(f"{d}/documents.parquet").count()

            def run():
                spark.catalog.clearCache()
                build(spark, d).write.format("noop").mode("overwrite").save()

            t = _best_of(run)
            # separate run for rows + final adaptive plan: collect()
            # finalizes AdaptiveSparkPlan so skew=true markers (runtime
            # skew-splits) are visible in the executed plan string
            spark.catalog.clearCache()
            df = build(spark, d)
            rows = len(df.collect())
            plan = df._jdf.queryExecution().executedPlan().toString()
            n_skew = plan.count("skew=true")
            print(f"| {k} | {n:,} | {t * 1000:.0f} ms | {rows:,} | {n_skew} |")


def main() -> None:
    args = sys.argv[1:]
    spark = get_spark("scale_probe_r5b")
    registry.load_all()
    if args and args[0] == "--semdedup-bigram":
        probe_semdedup_bigram(spark, ks_sem=[1, 2, 4], ks_big=[1, 4, 16])
        return
    if args and args[0] == "--pipelines":
        ks = [int(x) for x in (args[1:] or ["1", "2", "4", "8"])]
        probe_pipelines(spark, ks)
        return
    ks = [int(x) for x in (args or ["1", "4", "16"])]
    header = "| k | docs | " + " | ".join(CURATION) + " | q_pagerank |"
    print(header)
    print("|---|---|" + "---|" * (len(CURATION) + 1))
    for k in ks:
        d = build_neardup_replica(spark, k)
        n_docs = spark.read.parquet(f"{d}/documents.parquet").count()
        per_q = {}
        for name in CURATION:
            fn = registry.QUERIES[name]
            per_q[name] = _best_of(
                lambda: fn(spark, d)
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
        g = build_graph_replica(spark, k)
        fn = registry.QUERIES["q_pagerank"]

        def run_pr():
            spark.catalog.clearCache()  # pagerank cache()s its edges
            fn(spark, g).write.format("noop").mode("overwrite").save()

        per_q["q_pagerank"] = _best_of(run_pr)
        cells = " | ".join(
            f"{per_q[n] * 1000:.0f} ms" for n in CURATION + ["q_pagerank"]
        )
        print(f"| {k} | {n_docs:,} | {cells} |")


if __name__ == "__main__":
    main()
