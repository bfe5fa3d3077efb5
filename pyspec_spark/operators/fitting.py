"""Distributed per-group curve fitting — SURVEY.md §2 X4/UD2, §3.1 E3.

Reference: `pyspec/fit.py` [H] — fit one (x, y, e) series in-process.
Distributed form: `groupBy(keys).applyInPandas(fit_fn, schema)` — one
Arrow batch per series, numpy LM inside the Python worker, a small
fit-record row out.  The driver never sees raw points.

Scale notes: per-series work is independent (embarrassingly parallel);
the only shuffle is the groupBy that co-locates each series.  Empty and
degenerate groups return a row with converged=false rather than
raising (the applyInPandas empty-group trap, SURVEY §7 risk 3).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

FIT_SCHEMA = StructType(
    [
        StructField("series_id", StringType()),
        StructField("models", StringType()),
        StructField("p", ArrayType(DoubleType())),
        StructField("stderr", ArrayType(DoubleType())),
        StructField("chi2", DoubleType()),
        StructField("n_points", IntegerType()),
        StructField("n_iter", IntegerType()),
        StructField("converged", BooleanType()),
    ]
)


def fit_groups(
    df: DataFrame,
    kinds: list[str],
    key: str = "series_id",
    x: str = "x",
    y: str = "y",
    e: str | None = "e",
    x_err: str | None = None,
    p0: list[float] | None = None,
    fixed: list[int] | None = None,
    limits: dict[int, tuple[float, float]] | None = None,
) -> DataFrame:
    """Fit `kinds` (e.g. ["gauss"] or ["linear","gauss"]) to every group.

    ``x_err`` names an optional per-point x-uncertainty column; when
    given, the fit switches from plain least squares to the weighted
    errors-in-x (ODR / effective-variance) backend — pyspec's `fit.py`
    offered the same choice of leastsq vs ODR backends per fit.

    ``p0`` / ``fixed`` / ``limits`` mirror fit.py's fixed-params and
    limits surface, applied to every group: ``fixed`` lists parameter
    indices held at their ``p0`` value (p0 required in that case),
    ``limits`` maps parameter index -> (lo, hi) box bounds."""
    import numpy as np

    from pyspec_spark.functions.fitfuncs import (
        MODELS,
        fit_series,
        fit_series_odr,
    )

    if fixed and p0 is None:
        raise ValueError("fixed parameter indices require an explicit p0")
    n_all = sum(MODELS[k][1] for k in kinds)
    fixed_mask = None
    if fixed:
        fixed_mask = np.zeros(n_all, dtype=bool)
        fixed_mask[list(fixed)] = True
    lo_arr = hi_arr = None
    if limits:
        lo_arr = np.full(n_all, -np.inf)
        hi_arr = np.full(n_all, np.inf)
        for idx, (lo, hi) in limits.items():
            lo_arr[idx], hi_arr[idx] = lo, hi

    def fit_one(pdf: pd.DataFrame) -> pd.DataFrame:
        sid = str(pdf[key].iloc[0]) if len(pdf) else ""
        xs = pdf[x].to_numpy(dtype=float)
        order = np.argsort(xs)
        xs = xs[order]
        ys = pdf[y].to_numpy(dtype=float)[order]
        es = pdf[e].to_numpy(dtype=float)[order] if e and e in pdf else None
        sxs = (
            pdf[x_err].to_numpy(dtype=float)[order]
            if x_err and x_err in pdf
            else None
        )
        if len(xs) <= n_all:
            return pd.DataFrame(
                [
                    {
                        "series_id": sid,
                        "models": "+".join(kinds),
                        "p": None,
                        "stderr": None,
                        "chi2": float("nan"),
                        "n_points": int(len(xs)),
                        "n_iter": 0,
                        "converged": False,
                    }
                ]
            )
        kw = dict(p0=p0, fixed=fixed_mask, lower=lo_arr, upper=hi_arr)
        if sxs is not None:
            r = fit_series_odr(kinds, xs, ys, es, sxs, **kw)
        else:
            r = fit_series(kinds, xs, ys, es, **kw)
        return pd.DataFrame(
            [
                {
                    "series_id": sid,
                    "models": "+".join(kinds),
                    "p": [float(v) for v in r["p"]],
                    "stderr": [float(v) for v in r["stderr"]],
                    "chi2": r["chi2"],
                    "n_points": int(len(xs)),
                    "n_iter": int(r["n_iter"]),
                    "converged": bool(r["converged"]),
                }
            ]
        )

    return df.groupBy(key).applyInPandas(fit_one, FIT_SCHEMA)


def solve_linear_probe(stats, ridge: float = 0.0) -> dict:
    """Solve the ridge normal equations from q_linreg_stats' exact
    bigint sufficient statistics (SURVEY.md §2 L41).

    ``stats`` is the single row of ``q_linreg_stats`` as a mapping:
    counts n, first moments s_*, and the Gram entries ss_*_* of the
    feature vector [b, sp, dg] and target y.  The design is
    [1, b, sp, dg]; the intercept is never penalized.  Returns the
    weights, the residual sum of squares reconstructed FROM the same
    statistics (rss = y'y - 2 w'X'y + w'X'X w — no second corpus pass),
    and n.  This is the whole point of the sufficient-statistics
    pattern: refitting with any ridge costs a 4x4 solve on 15 numbers.
    """
    import numpy as np

    names = ["b", "sp", "dg"]
    A = np.zeros((4, 4))
    v = np.zeros(4)
    A[0, 0] = float(stats["n"])
    v[0] = float(stats["s_y"])
    for i, ni in enumerate(names, start=1):
        A[0, i] = A[i, 0] = float(stats[f"s_{ni}"])
        v[i] = float(stats[f"ss_{ni}_y"])
        for j, nj in enumerate(names, start=1):
            key = f"ss_{ni}_{nj}"
            if key not in stats:
                key = f"ss_{nj}_{ni}"
            A[i, j] = float(stats[key])
    pen = np.eye(4) * ridge
    pen[0, 0] = 0.0
    try:
        w = np.linalg.solve(A + pen, v)
    except np.linalg.LinAlgError:
        # Collinear/constant feature (e.g. a corpus slice with no
        # digits) makes the Gram singular at ridge 0 — take the
        # minimal-norm least-squares solution instead.
        w = np.linalg.pinv(A + pen) @ v
    rss = float(stats["ss_y_y"] - 2.0 * w @ v + w @ A @ w)
    return {
        "weights": {"intercept": w[0], "b": w[1], "sp": w[2], "dg": w[3]},
        "rss": rss,
        "n": int(stats["n"]),
    }
