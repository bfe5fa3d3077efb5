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
