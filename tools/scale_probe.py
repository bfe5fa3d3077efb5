#!/usr/bin/env python
"""Scale probe — measure how the engine's headline aggregations scale
when the input grows past the toy testdata and the scan actually
parallelizes.

The driver's sf0.1 parquet is a single file with ONE row group, so every
scan is a single task regardless of cluster size — the bench numbers
measure the single-core path plus fixed overhead.  This probe replicates
lineitem k times into k separate files under /tmp (k tasks -> real
parallel scan, the shape a 100 TB table has), runs the lineitem-only
headline queries at each size, and writes SCALING.md with rows/sec so
sublinear scaling (the thing that kills you at 1000 executors) is
visible immediately.

Replication preserves query semantics for self-contained aggregations
(pricing summary, gridder, top-k): group keys keep their domains, so
result cardinality is constant while input rows grow k-fold.

    python tools/scale_probe.py [k ...]     # default 1 2 4 8
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, ".")

from pyspec_spark import registry
from pyspec_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
WORK = "/tmp/pyspec_spark_scale"
QUERIES = ["q_pricing_summary", "q_grid3d", "q_topk", "q_grid1d"]


def build_replica(spark, k: int) -> str:
    """k copies of sf0.1 lineitem as k parquet files (k-task scans)."""
    dest = f"{WORK}/x{k}"
    if os.path.exists(f"{dest}/lineitem.parquet/_SUCCESS"):
        return dest
    shutil.rmtree(dest, ignore_errors=True)
    os.makedirs(dest, exist_ok=True)
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    reps = li
    for _ in range(k - 1):
        reps = reps.unionAll(li)
    reps.repartition(k).write.mode("overwrite").parquet(f"{dest}/lineitem.parquet")
    # the lineitem-only queries still resolve sibling tables lazily via
    # table(); only lineitem is read, but keep the layout uniform.
    for t in ("orders", "customer", "supplier", "part", "nation", "region",
              "events", "documents", "embeddings"):
        src = f"{SRC}/{t}.parquet"
        dst = f"{dest}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(src, dst)
    return dest


def build_join_replica(spark, k: int) -> str:
    """lineitem+orders replicated k-fold with offset orderkeys — join
    semantics (1:N fan-out per key) preserved while both sides grow."""
    from functools import reduce

    from pyspark.sql import functions as F

    dest = f"{WORK}/join_x{k}"
    if os.path.exists(f"{dest}/lineitem.parquet/_SUCCESS"):
        return dest
    shutil.rmtree(dest, ignore_errors=True)
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    od = spark.read.parquet(f"{SRC}/orders.parquet")
    maxk = od.agg(F.max("o_orderkey")).collect()[0][0] + 1
    lis = [li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * maxk)) for i in range(k)]
    ods = [od.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * maxk)) for i in range(k)]
    reduce(lambda a, b: a.unionAll(b), lis).repartition(k).write.mode(
        "overwrite"
    ).parquet(f"{dest}/lineitem.parquet")
    reduce(lambda a, b: a.unionAll(b), ods).repartition(max(1, k // 2)).write.mode(
        "overwrite"
    ).parquet(f"{dest}/orders.parquet")
    return dest


def _best_of(fn, n=3):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return min(ts)


def probe_joins(spark, ks) -> list[str]:
    """Shuffle-join scaling + skew strategies; returns SCALING.md lines."""
    from pyspark.sql import functions as F

    from pyspec_spark.operators.joins import salted_join

    lines = [
        "",
        "## Shuffle-join scaling (orders ⨝ lineitem, revenue rollup)",
        "",
        "Both sides replicated with offset keys (join fan-out per key",
        "constant).  `auto` = planner's choice (broadcast at these sizes),",
        "`smj` = broadcast disabled, true shuffle path.",
        "",
        "| k | lineitem rows | auto | forced SMJ |",
        "|---|---|---|---|",
    ]
    for k in ks:
        d = build_join_replica(spark, k)
        li = spark.read.parquet(f"{d}/lineitem.parquet")
        od = spark.read.parquet(f"{d}/orders.parquet")

        def q():
            return (
                od.join(li, od.o_orderkey == li.l_orderkey)
                .groupBy("o_orderpriority")
                .agg(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
                    F.count("*").alias("n"),
                )
                .collect()
            )

        t_auto = _best_of(q)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        t_smj = _best_of(q)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        lines.append(f"| {k} | {600_000*k:,} | {t_auto*1000:.0f} ms | {t_smj*1000:.0f} ms |")
        print(f"join x{k}: auto={t_auto*1000:.0f}ms smj={t_smj*1000:.0f}ms")

    # skew: ~30% of fact rows on ONE hot key, at the largest k
    d = build_join_replica(spark, ks[-1])
    li = spark.read.parquet(f"{d}/lineitem.parquet")
    od = spark.read.parquet(f"{d}/orders.parquet")
    hot = li.withColumn(
        "l_orderkey",
        F.when(F.col("l_linenumber") <= 2, F.lit(1)).otherwise(F.col("l_orderkey")),
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def q_aqe():
        return (
            hot.join(od, hot.l_orderkey == od.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
            .collect()
        )

    def q_salted():
        return (
            salted_join(hot, od, "l_orderkey", "o_orderkey", n_salts=32)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
            .collect()
        )

    t_aqe = _best_of(q_aqe)
    t_salted = _best_of(q_salted)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    print(f"skew: aqe={t_aqe*1000:.0f}ms salted={t_salted*1000:.0f}ms")
    lines += [
        "",
        "## Skewed join (~30% of fact rows on one hot key, largest k)",
        "",
        f"- AQE skew-split (the default): {t_aqe*1000:.0f} ms",
        f"- `salted_join(n_salts=32)`: {t_salted*1000:.0f} ms",
        "",
        "AQE wins here because the dim side (orders) is large — salting",
        "inflates it 32-fold.  `salted_join`'s documented cost model",
        "(skewed fact ⨝ SMALL dim only) is confirmed by measurement;",
        "AQE skew handling is the engine default, salting the targeted",
        "fallback when a required distribution disables AQE's rewrite.",
    ]
    return lines


def build_wide_replica(spark, k: int) -> str:
    """documents + events replicated k-fold with offset ids — weak-scaling
    substrate for the explode-shuffle (TF-IDF) and user-window (funnel)
    shapes: per-document/per-user work is constant while cardinality
    grows k-fold."""
    from functools import reduce

    from pyspark.sql import functions as F

    dest = f"{WORK}/wide_x{k}"
    if os.path.exists(f"{dest}/events.parquet/_SUCCESS"):
        return dest
    shutil.rmtree(dest, ignore_errors=True)
    os.makedirs(dest, exist_ok=True)
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    d_off = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    u_off = ev.agg(F.max("user_id")).collect()[0][0] + 1
    e_off = ev.agg(F.max("event_id")).collect()[0][0] + 1
    dd = [docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * d_off)) for i in range(k)]
    ee = [
        ev.withColumn("user_id", F.col("user_id") + F.lit(i * u_off))
        .withColumn("event_id", F.col("event_id") + F.lit(i * e_off))
        for i in range(k)
    ]
    reduce(lambda a, b: a.unionAll(b), dd).repartition(k).write.mode(
        "overwrite"
    ).parquet(f"{dest}/documents.parquet")
    reduce(lambda a, b: a.unionAll(b), ee).repartition(k).write.mode(
        "overwrite"
    ).parquet(f"{dest}/events.parquet")
    for t in ("orders", "customer", "supplier", "part", "nation", "region",
              "lineitem", "embeddings"):
        dst = f"{dest}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)
    return dest


def probe_text_events(spark, ks) -> list[str]:
    """Weak scaling of the TF-IDF explode-shuffle and the single-shuffle
    funnel/gap-fill window shapes; returns SCALING.md lines."""
    names = ["q_term_stats", "q_tfidf_topk", "q_funnel", "q_gap_fill"]
    lines = [
        "",
        "## Text & event shapes (weak scaling: k× docs / k× users)",
        "",
        "documents and events replicated with offset ids: per-doc and",
        "per-user work constant, cardinality ×k.  The TF-IDF pipeline is",
        "the explode→(doc,term) agg→term agg→join-back shape; funnel and",
        "gap-fill are one user-keyed shuffle each.  Consumed via the noop",
        "sink, which measures FULL re-execution: tfidf/gap-fill outputs",
        "grow ×k (collect would time row serialization), and re-collecting",
        "a cached DataFrame lets Spark skip already-materialized shuffle",
        "stages — the write path rebuilds the plan, so every shuffle",
        "recomputes (sink overhead itself: ~65 ms).  Sub-linear growth in",
        "ms as rows grow ×k = the keyed shuffles parallelize.",
        "",
        "| k | docs | events | " + " | ".join(names) + " |",
        "|---|---|---|" + "---|" * len(names),
    ]
    for k in ks:
        d = build_wide_replica(spark, k)
        per_q = {}
        for name in names:
            fn = registry.QUERIES[name]
            per_q[name] = _best_of(
                lambda: fn(spark, d)
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
        cells = " | ".join(f"{per_q[n]*1000:.0f} ms" for n in names)
        lines.append(f"| {k} | {50_000*k:,} | {100_000*k:,} | {cells} |")
        print(f"wide x{k}: " + "  ".join(f"{n}={t*1000:.0f}ms" for n, t in per_q.items()))
    return lines


def build_neardup_replica(spark, k: int) -> str:
    """documents replicated k-fold with offset ids AND per-replica token
    salting: every token gets an `r{i}_` prefix, a vocabulary bijection
    per replica.  Within-replica shingle/simhash/winnow structure is
    isomorphic to the original corpus (planted near-dups preserved),
    while cross-replica similarity drops to ~zero — so near-dup OUTPUT
    grows linearly with k and the probe times the pipeline, not a
    quadratic everything-matches-its-clone explosion (replicating text
    verbatim makes every doc an exact dup of k-1 clones, which is a
    dedup correctness property, not a scaling shape)."""
    from functools import reduce

    from pyspark.sql import functions as F

    dest = f"{WORK}/neardup_x{k}"
    if os.path.exists(f"{dest}/documents.parquet/_SUCCESS"):
        return dest
    shutil.rmtree(dest, ignore_errors=True)
    os.makedirs(dest, exist_ok=True)
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    d_off = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    dd = [
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * d_off))
        .withColumn("text", F.regexp_replace("text", r"(^| )", f"$1r{i}_"))
        for i in range(k)
    ]
    reduce(lambda a, b: a.unionAll(b), dd).repartition(k).write.mode(
        "overwrite"
    ).parquet(f"{dest}/documents.parquet")
    for t in ("orders", "customer", "supplier", "part", "nation", "region",
              "lineitem", "events", "embeddings"):
        dst = f"{dest}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)
    return dest


def probe_neardup(spark, ks) -> list[str]:
    """Weak scaling of the md5 near-dup / text-analysis family; returns
    SCALING.md lines."""
    names = ["q_minhash_neardup", "q_simhash_neardup", "q_fingerprint",
             "q_lang_id"]
    lines = [
        "",
        "## Near-dup & text-analysis shapes (weak scaling: k× salted docs)",
        "",
        "documents replicated with offset ids and a per-replica token-",
        "vocabulary bijection (`r{i}_` prefix): per-doc signature work and",
        "within-replica near-dup structure constant, corpus cardinality ×k,",
        "cross-replica similarity ~0 (output grows ×k, not ×k²).  noop",
        "sink = full re-execution of signatures, band joins, winnowing,",
        "and the trigram-profile train/classify pipeline.  Sub-linear ms",
        "growth = the map-side signature computation and the band-bucket",
        "shuffles parallelize.",
        "",
        "MEASURED LIMIT — q_simhash_neardup scales super-linearly (the",
        "other three are flat/sub-linear): the oracle-checked 32-bit",
        "simhash has 4×8-bit bands = only 256 values per band, so bucket",
        "occupancy grows ~k and within-bucket candidate pairs ~k² once",
        "the corpus passes ~10^4–10^5 docs.  That is a band-capacity",
        "property, not a plan defect: at corpus scale use the 64-bit",
        "pandas-UDF simhash (`operators/dedup.py simhash`) with 4×16-bit",
        "bands (65k values/band) — same pipeline shape, bucket sizes back",
        "to O(corpus/65k); the 32-bit md5 variant exists to make the",
        "pipeline hash-verifiable cross-engine at test scale.",
        "",
        "| k | docs | " + " | ".join(names) + " |",
        "|---|---|" + "---|" * len(names),
    ]
    from pyspec_spark.operators.dedup import simhash_neardup64
    from pyspec_spark.tables import table as _table

    def sim64(d):
        docs = _table(spark, d, "documents").select("doc_id", "text")
        return simhash_neardup64(docs, max_hamming=3)

    all_names = names + ["simhash64(op)"]
    lines[-2] = "| k | docs | " + " | ".join(all_names) + " |"
    lines[-1] = "|---|---|" + "---|" * len(all_names)
    for k in ks:
        d = build_neardup_replica(spark, k)
        n_docs = spark.read.parquet(f"{d}/documents.parquet").count()
        per_q = {}
        for name in names:
            fn = registry.QUERIES[name]
            per_q[name] = _best_of(
                lambda: fn(spark, d)
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
        per_q["simhash64(op)"] = _best_of(
            lambda: sim64(d).write.format("noop").mode("overwrite").save()
        )
        cells = " | ".join(f"{per_q[n]*1000:.0f} ms" for n in all_names)
        lines.append(f"| {k} | {n_docs:,} | {cells} |")
        print(f"neardup x{k}: "
              + "  ".join(f"{n}={t*1000:.0f}ms" for n, t in per_q.items()))
    return lines


def probe_quality(spark, ks) -> list[str]:
    """Weak scaling of the corpus-quality family (round 3) over the
    salted doc replicas; returns SCALING.md lines."""
    names = ["q_repetition", "q_quality_gate", "q_pmi_bigrams",
             "q_decontaminate", "q_token_budget", "q_unigram_logprob",
             "q_pii_scrub"]
    lines = [
        "",
        "## Corpus-quality family (weak scaling: k× salted docs)",
        "",
        "Same salted replicas as the near-dup probe.  Shapes under test:",
        "q_repetition is explode→groupBy(doc_id, gram) codegen counting",
        "(post r4 reformulation — one doc-keyed exchange that",
        "parallelizes); q_quality_gate is map-only scoring (flat ms =",
        "scan parallelized); q_pmi_bigrams' vocabulary grows ×k (count",
        "tables ×k, broadcast side still tiny); q_decontaminate's",
        "benchmark set stays 10 docs while the corpus grows ×k (broadcast",
        "semi-join: corpus-side work ×k, output ~constant);",
        "q_token_budget's per-source window grows ×k with constant",
        "output (budget cutoff); q_unigram_logprob scores docs against a",
        "corpus-wide unigram LM via broadcast-vocab join (vocab ×k from",
        "salting — the broadcast stays far under the 10 MB threshold);",
        "q_pii_scrub is regex-bound map-only work whose warm gap vs",
        "DuckDB at sf0.1 is the RE2-vs-JVM-regex constant on a",
        "single-task scan — the k-file replicas here show the plan",
        "parallelizing per scan task.",
        "",
        "| k | docs | " + " | ".join(names) + " |",
        "|---|---|" + "---|" * len(names),
    ]
    for k in ks:
        d = build_neardup_replica(spark, k)
        n_docs = spark.read.parquet(f"{d}/documents.parquet").count()
        per_q = {}
        for name in names:
            fn = registry.QUERIES[name]
            per_q[name] = _best_of(
                lambda: fn(spark, d)
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
        cells = " | ".join(f"{per_q[n]*1000:.0f} ms" for n in names)
        lines.append(f"| {k} | {n_docs:,} | {cells} |")
        print(f"quality x{k}: "
              + "  ".join(f"{n}={t*1000:.0f}ms" for n, t in per_q.items()))
    return lines


def main() -> None:
    args = sys.argv[1:]
    if args and args[0] == "--only-quality":
        # Re-run ONLY the corpus-quality section (e.g. at k=16/32, where
        # rebuilding every other replica family would dominate runtime)
        # and splice it into SCALING.md, which ends with that section.
        ks = [int(a) for a in args[1:]] or [1, 8, 16, 32]
        registry.load_all()
        spark = get_spark("pyspec_spark_scale")
        section = probe_quality(spark, ks)
        with open("SCALING.md") as f:
            doc = f.read()
        head = doc[: doc.index("\n## Corpus-quality family")]
        with open("SCALING.md", "w") as f:
            f.write(head + "\n".join(section) + "\n")
        print("wrote SCALING.md (quality section)")
        return
    ks = [int(a) for a in args] or [1, 2, 4, 8]
    registry.load_all()
    spark = get_spark("pyspec_spark_scale")
    base_rows = spark.read.parquet(f"{SRC}/lineitem.parquet").count()

    rows = []
    for k in ks:
        sf_dir = build_replica(spark, k)
        n_rows = base_rows * k
        per_q = {}
        for name in QUERIES:
            fn = registry.QUERIES[name]
            fn(spark, sf_dir).collect()  # warm (plan cache + JIT)
            ts = []
            for _ in range(3):
                t0 = time.time()
                fn(spark, sf_dir).collect()
                ts.append(time.time() - t0)
            per_q[name] = min(ts)
        rows.append((k, n_rows, per_q))
        print(f"x{k}: " + "  ".join(f"{q}={t*1000:.0f}ms" for q, t in per_q.items()))

    lines = [
        "# Scaling probe — parallel-scan throughput",
        "",
        "`tools/scale_probe.py`: sf0.1 lineitem replicated k-fold into k",
        "parquet files (k-task scans — the multi-row-group shape real",
        "tables have; the driver's single-row-group testdata pins every",
        "scan to one task).  Lineitem-only headline queries, warm best-of-3,",
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}].  Flat ms as",
        "rows grow k-fold = the scan parallelized; rising Mrows/s =",
        "fixed overhead amortizing — the curve that matters at 100 TB.",
        "",
        "| k | rows | " + " | ".join(QUERIES) + " | Mrows/s (pricing) |",
        "|---|---|" + "---|" * (len(QUERIES) + 1),
    ]
    for k, n, per_q in rows:
        cells = " | ".join(f"{per_q[q]*1000:.0f} ms" for q in QUERIES)
        mrps = n / per_q["q_pricing_summary"] / 1e6
        lines.append(f"| {k} | {n:,} | {cells} | {mrps:.1f} |")
    lines.extend(probe_joins(spark, ks))
    lines.extend(probe_text_events(spark, ks))
    lines.extend(probe_neardup(spark, [k for k in ks if k <= 4]))
    lines.extend(probe_quality(spark, [k for k in ks if k <= 4]))
    lines.append("")
    with open("SCALING.md", "w") as f:
        f.write("\n".join(lines))
    print("wrote SCALING.md")


if __name__ == "__main__":
    main()
