"""Invariants for the events-analytics completions
(`pyspec_spark/queries/events_analytics.py`)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from pyspec_spark import registry
from pyspec_spark.tables import table

SF = "/root/testdata/sf0.001"

registry.load_all()


def _run(spark, name):
    builder = getattr(registry.QUERIES[name], "__wrapped__", registry.QUERIES[name])
    return builder(spark, SF)


def test_funnel_is_monotone_nonincreasing(spark):
    (r,) = _run(spark, "q_funnel").collect()
    assert r["n_signup"] >= r["n_view"] >= r["n_click"] >= r["n_purchase"] >= 0
    n_users_with_signup = (
        table(spark, SF, "events")
        .where(F.col("event_type") == "signup")
        .select("user_id")
        .distinct()
        .count()
    )
    assert r["n_signup"] == n_users_with_signup


def test_gap_fill_lattice_is_contiguous_per_user(spark):
    pdf = pd.DataFrame(r.asDict() for r in _run(spark, "q_gap_fill").collect())
    for _, g in pdf.groupby("user_id"):
        days = sorted(g["day"])
        assert (days[-1] - days[0]).days + 1 == len(days)  # no holes
        assert len(set(days)) == len(days)  # no dupes
        gsorted = g.sort_values("day")
        # first day is observed by construction; LOCF leaves no null after it
        assert not bool(gsorted.iloc[0]["is_gap"])
        assert gsorted["filled_value"].notna().all()
        # non-gap rows keep their own value: filled == day value where observed
        obs = gsorted[~gsorted["is_gap"]]
        assert (obs["filled_value"] == obs["filled_value"]).all()


def test_gap_fill_locf_carries_previous_value(spark):
    pdf = pd.DataFrame(r.asDict() for r in _run(spark, "q_gap_fill").collect())
    for _, g in pdf.groupby("user_id"):
        gsorted = g.sort_values("day").reset_index(drop=True)
        for i in range(1, len(gsorted)):
            if gsorted.loc[i, "is_gap"]:
                assert (
                    gsorted.loc[i, "filled_value"]
                    == gsorted.loc[i - 1, "filled_value"]
                )


def test_retention_day0_counts_every_user(spark):
    rows = {r["day_offset"]: r["n_active"] for r in _run(spark, "q_retention").collect()}
    n_users = table(spark, SF, "events").select("user_id").distinct().count()
    assert rows[0] == n_users  # every user is active on their own day-0
    assert all(v <= n_users for v in rows.values())
    assert min(rows) == 0 and all(k >= 0 for k in rows)


def test_value_outliers_equal_float_z_test(spark):
    """The integer inequality flags EXACTLY the rows a real-arithmetic
    3-sigma z-test (population std over milli-unit values) flags."""
    from collections import defaultdict

    from pyspec_spark.queries.events_analytics import q_value_outliers
    from pyspec_spark.tables import table

    sf = "/root/testdata/sf0.001"
    got = {
        (r["user_id"], r["event_id"])
        for r in q_value_outliers.__wrapped__(spark, sf).collect()
    }
    rows = table(spark, sf, "events").select(
        "user_id", "event_id", "value"
    ).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append((r["event_id"], round(r["value"] * 1e3)))
    from fractions import Fraction

    want = set()
    for uid, vs in by_user.items():
        n = len(vs)
        if n < 3:
            continue
        s = sum(v for _, v in vs)
        q = sum(v * v for _, v in vs)
        mean = Fraction(s, n)
        var = Fraction(q, n) - mean * mean
        for eid, v in vs:
            if (v - mean) ** 2 > 9 * var:  # exact rational z-test
                want.add((uid, eid))
    assert got == want
    assert 0 < len(got) < len(rows) // 10


def test_ohlc_bars_match_pandas(spark):
    """Every bar's O/H/L/C equals a pandas recompute with the same
    (ts, event_id) pick order."""
    from pyspec_spark.queries.events_analytics import q_ohlc
    from pyspec_spark.tables import table

    sf = "/root/testdata/sf0.001"
    got = {
        (r["bucket"], r["event_type"]): r
        for r in q_ohlc.__wrapped__(spark, sf).collect()
    }
    pdf = table(spark, sf, "events").toPandas()
    pdf["bucket"] = pdf["ts"].dt.floor("h")
    for (b, t), g in pdf.groupby(["bucket", "event_type"]):
        g = g.sort_values(["ts", "event_id"])
        r = got[(b.to_pydatetime(), t)]
        assert r["n"] == len(g)
        assert r["open"] == g["value"].iloc[0]
        assert r["close"] == g["value"].iloc[-1]
        assert r["high"] == g["value"].max()
        assert r["low"] == g["value"].min()


def test_gap_percentiles_match_numpy(spark):
    """p50/p90/p99 equal a numpy discrete-percentile recompute (element
    at ceil(p*n) in sorted order) of the same integer-ms gaps."""
    import math
    from collections import defaultdict

    from pyspec_spark.queries.events_analytics import q_gap_percentiles
    from pyspec_spark.tables import table

    sf = "/root/testdata/sf0.001"
    got = {
        r["event_type"]: r
        for r in q_gap_percentiles.__wrapped__(spark, sf).collect()
    }
    rows = table(spark, sf, "events").select(
        "event_type", "ts", "event_id"
    ).collect()
    import calendar

    seqs = defaultdict(list)
    for r in rows:
        ts = r["ts"]
        # exact epoch-ms (unix_millis semantics: floor of microseconds),
        # never through float .timestamp()
        us = calendar.timegm(ts.timetuple()) * 1_000_000 + ts.microsecond
        seqs[r["event_type"]].append((us // 1000, r["event_id"]))
    for t, es in seqs.items():
        es.sort()
        gaps = sorted(b[0] - a[0] for a, b in zip(es, es[1:]))
        r = got[t]
        assert r["n_gaps"] == len(gaps)
        for p, col in ((0.5, "p50_ms"), (0.9, "p90_ms"), (0.99, "p99_ms")):
            want = gaps[math.ceil(p * len(gaps)) - 1]
            assert r[col] == want, (t, col)
