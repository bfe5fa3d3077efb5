"""Scale smoke (SURVEY.md §5.2 layer 5): run partition-sensitive queries
under a REAL multi-executor local-cluster and assert identical results
to the in-process local session.  Catches partition-boundary bugs
(window frames, as-of carry-forward, partial-agg merges) that local[N]
single-JVM execution can hide.

The cluster run happens in a subprocess because one JVM can only host
one Spark master."""

from __future__ import annotations

import json
import subprocess
import sys
import textwrap

import pytest

SF = "/root/testdata/sf0.01"
# queries whose correctness depends on cross-partition merge logic
QUERIES = ["q_pricing_summary", "q_grid3d", "q_window_cumsum", "q_asof_join"]

_RUNNER = textwrap.dedent(
    """
    import json, sys
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local-cluster[2,4,2048]")
             .appName("scale-smoke")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
    from pyspec_spark import registry
    registry.load_all()
    out = {}
    for name in %(queries)r:
        rows = registry.QUERIES[name](spark, %(sf)r).collect()
        out[name] = sorted(str(sorted(r.asDict().items())) for r in rows)
    print("RESULT:" + json.dumps(out))
    spark.stop()
    """
)


@pytest.mark.slow
def test_multi_executor_matches_local(spark):
    from pyspec_spark import registry

    registry.load_all()
    local = {
        name: sorted(
            str(sorted(r.asDict().items()))
            for r in registry.QUERIES[name](spark, SF).collect()
        )
        for name in QUERIES
    }
    script = _RUNNER % {"queries": QUERIES, "sf": SF}
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=480,
    )
    marker = [l for l in proc.stdout.splitlines() if l.startswith("RESULT:")]
    assert marker, f"cluster run failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    cluster = json.loads(marker[0][len("RESULT:"):])
    for name in QUERIES:
        assert cluster[name] == local[name], f"{name} differs across executors"


@pytest.mark.slow
def test_gridder_bragg_peak_skew(spark):
    """SURVEY §4.2's named domain skew risk: a Bragg peak concentrates
    a huge fraction of all points in ONE voxel.  For an AGGREGATION the
    scale answer is map-side partial aggregation — the hot voxel
    collapses to one row per input partition before the shuffle, so
    the shuffle carries <= partitions x touched-voxels rows no matter
    how skewed the input.  This test plants a 50%-in-one-voxel corpus
    at sf0.1-scale row counts (600 k), proves the result against local
    numpy, pins the partial-agg plan shape, and bounds the wall-clock
    penalty vs a uniform corpus of identical size."""
    import time

    import numpy as np
    from pyspark.sql import functions as F

    from pyspec_spark.operators.gridder import GridSpec, grid3d
    from pyspec_spark.plans import has_partial_aggregate, physical_plan

    n = 600_000
    spec = GridSpec((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), (16, 16, 16))

    def corpus(skewed: bool):
        base = spark.range(n).select(
            "id",
            F.rand(42).alias("ux"), F.rand(43).alias("uy"),
            F.rand(44).alias("uz"), (F.rand(45) * 100).alias("intensity"),
        )
        if skewed:
            hot = F.col("id") % 2 == 0  # 50% of points -> one voxel
            return base.select(
                F.when(hot, 0.5).otherwise(F.col("ux")).alias("qx"),
                F.when(hot, 0.5).otherwise(F.col("uy")).alias("qy"),
                F.when(hot, 0.5).otherwise(F.col("uz")).alias("qz"),
                "intensity",
            )
        return base.select(
            F.col("ux").alias("qx"), F.col("uy").alias("qy"),
            F.col("uz").alias("qz"), "intensity",
        )

    # plan shape: partial+final aggregation present (the skew defense)
    plan = physical_plan(grid3d(corpus(True), spec))
    assert has_partial_aggregate(plan)

    def run(skewed: bool):
        df = grid3d(corpus(skewed), spec).cache()
        t0 = time.time()
        rows = df.collect()
        dt = time.time() - t0
        df.unpersist()
        return rows, dt

    rows_u, dt_u = run(False)
    rows_s, dt_s = run(True)

    # correctness vs local numpy over the identical deterministic data
    pts = corpus(True).toPandas()
    g = np.clip((pts[["qx", "qy", "qz"]].values * 16).astype(int), 0, 15)
    key = g[:, 0] * 256 + g[:, 1] * 16 + g[:, 2]
    v = pts["intensity"].values
    got = {(r["gx"], r["gy"], r["gz"]): r for r in rows_s}
    assert sum(r["n"] for r in rows_s) == n
    hot = got[(8, 8, 8)]
    assert hot["n"] >= n // 2  # the planted Bragg peak
    for k in np.unique(key)[:50]:
        m = v[key == k]
        r = got[(k // 256, (k // 16) % 16, k % 16)]
        assert r["n"] == len(m)
        assert abs(r["mean_i"] - m.mean()) < 1e-9 * max(1.0, abs(m.mean()))
    # hot voxel exact too (the largest float-sum reassociation surface)
    mhot = v[key == 8 * 256 + 8 * 16 + 8]
    assert abs(hot["mean_i"] - mhot.mean()) < 1e-9 * abs(mhot.mean())

    # boundedness: the skewed corpus must not blow past the uniform
    # run (partial agg makes both shuffle ~|voxels| rows).  Generous 3x
    # bound: this guards against an accidental combine-less plan, not
    # scheduler jitter.
    assert dt_s < max(3 * dt_u, dt_u + 2.0), (dt_s, dt_u)


def test_substr_dup_hot_gram_skew(spark):
    """The duplicated-substring pipeline's scale risk: a boilerplate
    5-gram shared by EVERY document makes one gram key hold the whole
    corpus.  The defense is the same as the gridder's — the deciding
    groupBy(g) computes countDistinct(doc_id) with map-side partial
    aggregation, so the hot key's shuffle payload is bounded by
    (partitions x distinct-docs-per-partition-partial), and the per-doc
    interval fold never joins tokens back.  This plants a 100%-shared
    gram across 40k docs, pins the partial-agg plan, proves the stats
    against closed-form expectations, and bounds the skew penalty vs a
    boilerplate-free corpus of identical size."""
    import time

    from pyspark.sql import functions as F

    from pyspec_spark.operators.text import duplicated_span_stats
    from pyspec_spark.plans import has_partial_aggregate, physical_plan

    n = 40_000
    boiler = "terms of service apply here"  # one 5-gram, in EVERY doc

    def corpus(with_boiler: bool):
        uniq = F.concat_ws(
            " ",
            *[
                F.concat(F.lit(f"w{i}x"), (F.col("id") * (i + 1)).cast("string"))
                for i in range(6)
            ],
        )
        text = (
            F.concat_ws(" ", F.lit(boiler), uniq) if with_boiler else uniq
        )
        return spark.range(n).select(
            F.col("id").alias("doc_id"), text.alias("text")
        )

    plan = physical_plan(duplicated_span_stats(corpus(True), n=5))
    assert has_partial_aggregate(plan)

    def run(with_boiler: bool):
        df = duplicated_span_stats(corpus(with_boiler), n=5)
        t0 = time.time()
        rows = df.collect()
        return rows, time.time() - t0

    rows_u, dt_u = run(False)
    rows_s, dt_s = run(True)

    # closed-form: every doc has 11 tokens; exactly the one boilerplate
    # 5-gram is cross-doc duplicated -> dup_ngrams=1, cover=5, frac=5/11
    assert len(rows_s) == n
    for r in rows_s[:100] + rows_s[-100:]:
        assert r["n_tokens"] == 11
        assert r["dup_ngrams"] == 1
        assert r["dup_cover"] == 5
        assert r["dup_frac"] == round(5 / 11, 6)
    # boilerplate-free twin: nothing duplicated
    assert all(r["dup_ngrams"] == 0 for r in rows_u[:200])
    # the hot gram must not blow up wall-clock: <= 5x the uniform twin
    assert dt_s <= max(5 * dt_u, dt_u + 5.0), (dt_s, dt_u)


def test_pagerank_hot_hub_skew(spark):
    """Graph skew stress for the iteration join (SCALING.md's AQE
    skew-join posture): a hub node carries 50% of all edges, so the
    src-keyed rank join concentrates half the stream on one key.
    Proves the integer fixed point against a pure-python reference on
    the identical edge set and bounds the wall-clock penalty vs a
    uniform graph of the same size."""
    import math
    import time

    from pyspark.sql import functions as F

    from pyspec_spark.queries.graph import _PR_D, _PR_ITERS, _pr_iteration

    n_edges = 200_000

    def edges_df(skewed: bool):
        base = spark.range(n_edges)
        if skewed:
            hot = F.col("id") % 2 == 0
            src = F.when(hot, F.lit("HUB")).otherwise(
                F.concat(F.lit("u"), (F.col("id") % 997).cast("string"))
            )
        else:
            src = F.concat(F.lit("u"), (F.col("id") % 997).cast("string"))
        dst = F.concat(F.lit("v"), (F.col("id") % 983).cast("string"))
        e = base.select(src.alias("src"), dst.alias("dst")).distinct()
        return e.union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )

    def run(skewed: bool):
        e = edges_df(skewed)
        deg = e.groupBy("src").agg(F.count("*").alias("deg"))
        edges_deg = e.join(deg, "src").select("src", "dst", "deg").cache()
        nodes = edges_deg.select(F.col("src").alias("node")).distinct()
        n = nodes.agg(F.count("*").alias("n"))
        pr = nodes.crossJoin(F.broadcast(n)).select(
            "node", F.floor(F.lit(1e9) / F.col("n")).alias("pr")
        )
        for _ in range(_PR_ITERS):
            pr = _pr_iteration(edges_deg, pr, n)
        t0 = time.time()
        rows = pr.collect()
        dt = time.time() - t0
        edges_deg.unpersist()
        return rows, dt

    rows_u, dt_u = run(False)
    rows_s, dt_s = run(True)

    # exact fixed point vs pure python on the identical skewed edges
    e_local = [
        (r["src"], r["dst"])
        for r in edges_df(True).collect()
    ]
    nodes = sorted({s for s, _ in e_local})
    deg = {}
    for s, _ in e_local:
        deg[s] = deg.get(s, 0) + 1
    nn = len(nodes)
    pr = {v: math.floor(1e9 / nn) for v in nodes}
    for _ in range(_PR_ITERS):
        acc = {v: 0 for v in nodes}
        for u, v in e_local:
            acc[v] += math.floor(pr[u] / deg[u])
        pr = {
            v: math.floor(0.15e9 / nn) + math.floor(_PR_D * acc[v])
            for v in nodes
        }
    got = {r["node"]: r["pr"] for r in rows_s}
    assert got == pr
    assert got["HUB"] == max(got.values())  # the hub dominates
    # boundedness vs the uniform graph (AQE splits the hot key's join
    # work; generous bound guards a degenerate single-task plan)
    assert dt_s < max(3 * dt_u, dt_u + 2.0), (dt_s, dt_u)

def test_aqe_skew_join_split_fires(spark):
    """The session factory claims AQE skew-join mitigation is the
    designed answer to hot keys (session.py); prove the mechanism
    actually FIRES under a planted hot key: ~70% of rows on one key
    must show `SortMergeJoin(skew=true)` + a skewed AQEShuffleRead in
    the FINAL adaptive plan of the executed join, with correct results.

    Two probe facts pinned while writing this (both bit real runs):
    the executedPlan must come from the SAME QueryExecution that ran
    (a .count() builds its own), and a groupBy directly after the join
    SUPPRESSES the split — AQE declines to break the co-partitioning
    the aggregation needs, so per-key post-aggregation there relies on
    the partial-agg path instead.  The engine's declared queries
    aggregate after joins, which is why their plans legitimately show
    zero skew events (SCALING.md) while the mitigation stays armed for
    the join-heavy shapes."""
    from pyspark.sql import functions as F

    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        # shrink the byte thresholds so test-sized skew trips them
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "16KB",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ

        n = 100_000
        left = spark.range(n).select(
            F.when(F.col("id") % 10 < 7, F.lit(0))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.concat(
                F.lit("payload_"), F.repeat(F.col("id").cast("string"), 10)
            ).alias("v"),
        )
        right = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        joined = left.join(right, "k")
        rows = joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
        assert "skewed" in plan  # the AQEShuffleRead marker
        # results survive the split: hot key count + every key joined
        from collections import Counter

        per_key = Counter(r.k for r in rows)
        assert per_key[0] == n * 7 // 10
        assert len(rows) == n
        assert all(r.w == r.k * 2 for r in rows[:1000])
    finally:
        for k, v in saved.items():
            conf.set(k, v)
