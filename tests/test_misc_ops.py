"""Tests for the coverage-closing surfaces: UDTF (UD4), grouped-agg
UDAF (UD3), range/as-of join operators (J8/J9), sinks (S6), sampling
(O3), range frames (W7), cross join (J10)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

SPEC_BLOCK = """#S 7 ascan th 0 1 5 1
#D Sat Aug 09 12:00:00 2025
#T 1 (Seconds)
#L th Detector Monitor
0.0 10 100
0.25 20 100
0.5 40 100
0.75 20 100
1.0 10 100
"""


def test_spec_udtf_explodes_block(spark):
    from pyspec_spark.sources.spec_udtf import register_spec_udtf

    register_spec_udtf(spark)
    spark.createDataFrame([(SPEC_BLOCK,)], "block_text string").createOrReplaceTempView(
        "blocks"
    )
    rows = spark.sql(
        "SELECT s.* FROM blocks, LATERAL spec_points(block_text) s ORDER BY point"
    ).collect()
    assert len(rows) == 5
    assert rows[0]["scan_number"] == 7
    assert rows[0]["command"] == "ascan th 0 1 5 1"
    assert rows[2]["values"]["Detector"] == 40.0
    assert [r["values"]["th"] for r in rows] == [0.0, 0.25, 0.5, 0.75, 1.0]


def test_spec_udtf_skips_garbage(spark):
    from pyspec_spark.sources.spec_udtf import register_spec_udtf

    register_spec_udtf(spark)
    spark.createDataFrame(
        [("not a scan",), ("",), (SPEC_BLOCK,)], "block_text string"
    ).createOrReplaceTempView("blocks2")
    n = spark.sql(
        "SELECT count(*) AS n FROM blocks2, LATERAL spec_points(block_text)"
    ).collect()[0]["n"]
    assert n == 5


def test_grouped_agg_udafs(spark):
    from pyspec_spark.functions.udaf import median_abs_deviation, trimmed_mean_10

    vals = list(range(1, 21)) + [1000]  # one gross outlier
    df = spark.createDataFrame([(1, float(v)) for v in vals], "g int, v double")
    # grouped-agg pandas UDFs can't mix with JVM aggregates in one agg()
    row = df.groupBy("g").agg(
        trimmed_mean_10("v").alias("tm"),
        median_abs_deviation("v").alias("mad"),
    ).collect()[0]
    raw_mean = df.groupBy("g").agg(F.avg("v").alias("m")).collect()[0]["m"]
    a = np.sort(np.array(vals, dtype=float))
    k = int(a.size * 0.1)
    assert row["tm"] == pytest.approx(a[k:-k].mean())
    med = np.median(a)
    assert row["mad"] == pytest.approx(np.median(np.abs(a - med)))
    assert row["tm"] < raw_mean  # robust to the outlier


def test_range_join_bucketed_equals_naive(spark):
    from pyspec_spark.operators.joins import range_join_bucketed
    from pyspec_spark.tables import table

    cust = table(spark, SF, "customer").select("c_custkey", "c_acctbal")
    bands = spark.createDataFrame(
        [(i, -1000.0 + i * 2200.0, -1000.0 + (i + 1) * 2200.0) for i in range(5)],
        "band_id int, lo double, hi double",
    )
    got = (
        range_join_bucketed(cust, bands, "c_acctbal", bucket_width=700.0)
        .select("c_custkey", "band_id")
        .collect()
    )
    naive = (
        cust.join(
            bands,
            (cust.c_acctbal >= bands.lo) & (cust.c_acctbal < bands.hi),
        )
        .select("c_custkey", "band_id")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, naive))
    assert len(naive) == cust.count()  # bands tile the acctbal domain


def test_asof_join_semantics(spark):
    from pyspec_spark.operators.joins import asof_join

    quotes = spark.createDataFrame(
        [(1, 10, 1.0), (1, 20, 2.0), (1, 30, 3.0), (2, 15, 9.0)],
        "k int, t int, px double",
    )
    trades = spark.createDataFrame(
        [(100, 1, 5), (101, 1, 20), (102, 1, 25), (103, 1, 99), (104, 2, 14), (105, 3, 50)],
        "tid long, k int, t int",
    )
    out = {
        r["tid"]: r["px"]
        for r in asof_join(
            quotes, trades, key="k", left_ts="t", right_ts="t",
            payload=["px"], right_id="tid",
        ).collect()
    }
    assert out[100] is None        # before any quote
    assert out[101] == 2.0         # equal ts -> <= matches
    assert out[102] == 2.0
    assert out[103] == 3.0         # latest
    assert out[104] is None        # other key, too early
    assert out[105] is None        # key with no quotes at all
    assert len(out) == 6           # left join keeps every right row


def test_sinks_roundtrip(spark, tmp_path):
    from pyspec_spark import sinks
    from pyspec_spark import registry

    registry.load_all()
    grid = registry.QUERIES["q_grid3d"](spark, SF)
    p = str(tmp_path / "grid")
    sinks.write_grid(grid, p)
    back = sinks.read_grid(spark, p)
    assert back.count() == grid.count()
    # partition pruning on the cut axis: only one directory scanned
    pruned = back.where(F.col("gx") == 1)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert pruned.count() == grid.where(F.col("gx") == 1).count()
    assert "PartitionFilters: [isnotnull(gx" in plan or "gx#" in plan


def test_sampling_and_cross_join(spark):
    from pyspec_spark.tables import table

    cust = table(spark, SF, "customer")
    n = cust.count()
    s = cust.sample(fraction=0.2, seed=42).count()
    assert 0 < s < n
    # J10: parameter-grid cross join (tiny dims only — the fit-sweep idiom)
    params = spark.range(4).select(F.col("id").alias("p"))
    grid = spark.range(3).select(F.col("id").alias("q")).crossJoin(params)
    assert grid.count() == 12


def test_range_frame_window(spark):
    """W7: RANGE frame over a numeric order key."""
    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 20.0), (1, 4, 40.0), (1, 8, 80.0)],
        "g int, x int, v double",
    )
    w = Window.partitionBy("g").orderBy("x").rangeBetween(-2, 0)
    out = {r["x"]: r["s"] for r in df.withColumn("s", F.sum("v").over(w)).collect()}
    assert out == {1: 10.0, 2: 30.0, 4: 60.0, 8: 80.0}


def test_twap_matches_pandas_zero_order_hold(spark):
    """TWAP equals an independent pandas recompute of the zero-order
    hold (value held until the next event, weighted by holding ms)."""
    from pyspec_spark.queries.windows import q_twap
    from pyspec_spark.tables import table

    sf = "/root/testdata/sf0.001"
    got = {r["user_id"]: r for r in q_twap.__wrapped__(spark, sf).collect()}
    pdf = (
        table(spark, sf, "events")
        .select("user_id", "event_id", "ts", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    import math

    for uid, g in pdf.groupby("user_id"):
        ms = (g["ts"].astype("int64") // 1_000_000).tolist()
        v3 = [round(v * 1e3) for v in g["value"]]
        ws = [b - a for a, b in zip(ms, ms[1:])]
        if not ws:
            assert uid not in got
            continue
        num = sum(v * w for v, w in zip(v3, ws))
        den = sum(ws)
        r = got[uid]
        assert r["n_held"] == len(ws)
        assert r["span_ms"] == den
        want = num / (den * 1000)
        assert math.isclose(r["twap"], round(want, 6), abs_tol=1e-9)
