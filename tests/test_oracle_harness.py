"""Planted-fault meta-tests for the oracle harness itself (r6 VERDICT
#6).  The whole evidence chain — pytest driver-mimic, tools/check.py,
the committed CHECK_sf*.json sweeps — rests on ``compare_frames``
actually failing when results differ.  These tests plant each fault
class the comparison claims to catch and assert the checker goes RED,
plus the two tolerances that are BY DESIGN (row order, column order)
stay green, so a future "optimization" that widens a tolerance into a
blind spot fails here first."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspec_spark.oracle import compare_frames


def _base() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "k": [1, 2, 3, 4],
            "name": ["a", "b", "c", "d"],
            "v": [1.5, 2.5, -0.0, float("nan")],
        }
    )


def test_identical_frames_pass():
    res = compare_frames("meta", _base(), _base())
    assert res.ok, str(res)


def test_single_value_perturbation_fails():
    bad = _base()
    bad.loc[1, "v"] = 2.5000001  # one value, one ulp-ish nudge
    assert not compare_frames("meta", _base(), bad).ok
    assert not compare_frames("meta", bad, _base()).ok  # both directions


def test_dropped_row_fails():
    bad = _base().iloc[:-1]
    res = compare_frames("meta", _base(), bad)
    assert not res.ok
    assert any("row count" in i or "mismatch" in i for i in res.issues)


def test_duplicated_row_fails():
    """Multiset semantics: a duplicated row must not hide behind a
    dropped one (count 4 == count 4 but values differ)."""
    base = _base()
    bad = pd.concat([base.iloc[:-1], base.iloc[[0]]], ignore_index=True)
    assert len(bad) == len(base)
    assert not compare_frames("meta", base, bad).ok


def test_renamed_column_fails():
    bad = _base().rename(columns={"v": "value"})
    res = compare_frames("meta", _base(), bad)
    assert not res.ok
    assert any("columns differ" in i for i in res.issues)


def test_values_swapped_between_columns_fails():
    """Column sort-by-name must not let per-column values migrate."""
    bad = _base()
    bad[["k", "v"]] = bad[["v", "k"]].to_numpy()
    assert not compare_frames("meta", _base(), bad).ok


def test_row_order_permutation_passes_by_design():
    shuffled = _base().sample(frac=1.0, random_state=7).reset_index(drop=True)
    assert compare_frames("meta", _base(), shuffled).ok


def test_column_order_permutation_passes_by_design():
    reordered = _base()[["v", "k", "name"]]
    assert compare_frames("meta", _base(), reordered).ok


def test_negative_zero_vs_zero_tolerated_by_design():
    """repr(v + 0.0) canonicalization: -0.0 == 0.0 (documented)."""
    a, b = _base(), _base()
    b.loc[2, "v"] = 0.0  # a has -0.0
    assert compare_frames("meta", a, b).ok


def test_nan_position_is_value_checked():
    """NaN is a sentinel, not a wildcard: moving it to a different row
    (with a different key) must fail."""
    a = _base()
    b = _base()
    b.loc[3, "v"] = 9.0
    b.loc[0, "v"] = float("nan")
    assert not compare_frames("meta", a, b).ok


def test_int_float_dtype_drift_fails():
    """int64 1 vs float64 1.0 must NOT silently compare equal (the
    row key carries the canonical type tag)."""
    a = _base()
    b = _base()
    b["k"] = b["k"].astype("float64")
    assert not compare_frames("meta", a, b).ok


def test_array_column_element_perturbation_fails():
    a = pd.DataFrame({"k": [1, 2], "emb": [np.array([1.0, 2.0]), np.array([3.0, 4.0])]})
    b = pd.DataFrame({"k": [1, 2], "emb": [np.array([1.0, 2.0]), np.array([3.0, 4.5])]})
    assert compare_frames("meta", a, a.copy()).ok
    assert not compare_frames("meta", a, b).ok
