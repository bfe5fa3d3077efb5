"""Curve-fitting golden tests (FIXTURES.md B3 / SURVEY.md §5.2):
known-parameter synthetic series; fitted params within 5 stderr of truth
for >= 19/20 series."""

from __future__ import annotations

import numpy as np
import pytest

from tests.fixtures import make_fit_targets


def test_lm_recovers_gaussian_locally():
    from pyspec_spark.functions.fitfuncs import fit_series, gauss

    rng = np.random.default_rng(7)
    x = np.linspace(-5, 5, 101)
    p_true = np.array([100.0, 0.5, 1.2])
    y = gauss(x, p_true) + rng.normal(0, 1.0, x.size)
    r = fit_series(["gauss"], x, y)
    assert r["converged"]
    np.testing.assert_allclose(r["p"], p_true, rtol=0.05)


def test_composite_linear_plus_gauss():
    from pyspec_spark.functions.fitfuncs import composite, fit_series

    rng = np.random.default_rng(11)
    x = np.linspace(-10, 10, 201)
    f, _ = composite(["linear", "gauss"])
    p_true = np.array([0.8, 5.0, 80.0, -1.0, 1.5])
    y = f(x, p_true) + rng.normal(0, 0.5, x.size)
    r = fit_series(["linear", "gauss"], x, y)
    assert r["converged"]
    np.testing.assert_allclose(r["p"], p_true, rtol=0.15)


def test_fit_groups_golden_suite(spark):
    """20 series x 4 model kinds via applyInPandas; >=19/20 within 5 sigma."""
    from pyspec_spark.operators.fitting import fit_groups

    rows, truth = make_fit_targets()
    df = spark.createDataFrame(
        [(str(s), x, y, e, kind) for (s, x, y, e, kind) in rows],
        "series_id string, x double, y double, e double, kind string",
    )
    kinds_by_name = {
        "gauss": ["gauss"],
        "lor": ["lor"],
        "pvoight": ["pvoight"],
        "linear+gauss": ["linear", "gauss"],
    }
    ok = 0
    total = 0
    for kind_name, kinds in kinds_by_name.items():
        sub = df.where(f"kind = '{kind_name}'").drop("kind")
        fits = {r["series_id"]: r for r in fit_groups(sub, kinds).collect()}
        for sid, t in truth.items():
            if t["model"] != kind_name:
                continue
            total += 1
            r = fits[str(sid)]
            if not r["converged"] or r["p"] is None:
                continue
            p = np.array(r["p"])
            se = np.array(r["stderr"])
            pt = np.array(t["p"])
            # allow sign/width ambiguity on sigma
            if len(p) >= 3 and kind_name != "linear+gauss":
                p[2] = abs(p[2])
            if kind_name == "linear+gauss":
                p[4] = abs(p[4])
            if np.all(np.abs(p - pt) <= np.maximum(5 * se, 0.05 * np.abs(pt) + 1e-6)):
                ok += 1
    assert total == 20
    assert ok >= 19, f"only {ok}/20 fits within tolerance"


def test_fit_groups_degenerate_group(spark):
    from pyspec_spark.operators.fitting import fit_groups

    df = spark.createDataFrame(
        [("a", 1.0, 2.0, 1.0), ("a", 2.0, 3.0, 1.0)],
        "series_id string, x double, y double, e double",
    )
    r = fit_groups(df, ["gauss"]).collect()[0]
    assert r["converged"] is False and r["n_points"] == 2
