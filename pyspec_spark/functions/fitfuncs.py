"""Peak-model functions + least-squares fitting — SURVEY.md §2 F2/X4.

Reference: `pyspec/fitfuncs.py` [H] — the `f(x, p, mode)` protocol with
closed-form peak shapes (`gauss, lor, pvoight, linear, constant, power`)
and a 'guess' mode producing initial parameters from moments (A7/A8);
`pyspec/fit.py` [H] — Levenberg-Marquardt least squares over a composite
model (scipy.leastsq / mpfit backends), returning params, stderr, chi^2.

This environment has no scipy, so the optimizer is a self-contained
numpy Levenberg-Marquardt with numerical Jacobians — deterministic
(fixed damping schedule, no randomness), adequate for the peak models'
smooth residuals.  All models are vectorized numpy; the same closed
forms back the SQL variants in queries/scalars.py (q_model_gauss).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np

Model = Callable[[np.ndarray, np.ndarray], np.ndarray]


# --- model functions (f(x, p) -> y), pyspec/fitfuncs.py parity ------------
def constant(x, p):
    return np.full_like(x, p[0])


def linear(x, p):
    return p[0] * x + p[1]


def power(x, p):
    return p[0] * np.power(np.abs(x) + 1e-300, p[1])


def gauss(x, p):
    a, mu, sig = p
    return a * np.exp(-((x - mu) ** 2) / (2.0 * sig**2))


def lor(x, p):
    a, mu, sig = p
    return a / (1.0 + ((x - mu) / sig) ** 2)


def pvoight(x, p):
    a, mu, sig, eta = p
    return a * (
        eta / (1.0 + ((x - mu) / sig) ** 2)
        + (1.0 - eta) * np.exp(-((x - mu) ** 2) / (2.0 * sig**2))
    )


MODELS: dict[str, tuple[Model, int]] = {
    "constant": (constant, 1),
    "linear": (linear, 2),
    "power": (power, 2),
    "gauss": (gauss, 3),
    "lor": (lor, 3),
    "pvoight": (pvoight, 4),
}


def guess(kind: str, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Moment-based initial parameters (fitfuncs guess mode: centroid =
    sum(x w)/sum(w), width from second moment, amplitude from argmax)."""
    w = np.clip(y - y.min(), 0, None) + 1e-12
    mu = float((x * w).sum() / w.sum())
    var = float(((x - mu) ** 2 * w).sum() / w.sum())
    sig = max(np.sqrt(var), 1e-6)
    a = float(y.max() - y.min())
    if kind == "constant":
        return np.array([float(y.mean())])
    if kind == "linear":
        m = (y[-1] - y[0]) / (x[-1] - x[0] + 1e-300)
        return np.array([m, float(y.mean() - m * x.mean())])
    if kind == "power":
        return np.array([1.0, 1.0])
    if kind == "gauss":
        return np.array([a, mu, sig])
    if kind == "lor":
        return np.array([a, mu, sig])
    if kind == "pvoight":
        return np.array([a, mu, sig, 0.5])
    raise KeyError(kind)


def composite(kinds: list[str]) -> tuple[Model, list[int]]:
    """Concatenate models (fit.py's funcs=[linear, gauss] protocol)."""
    parts = [MODELS[k] for k in kinds]
    sizes = [n for _, n in parts]

    def f(x, p):
        out = np.zeros_like(np.asarray(x, dtype=np.float64))
        off = 0
        for (m, n) in parts:
            out = out + m(x, p[off : off + n])
            off += n
        return out

    return f, sizes


def leastsq_lm(
    f: Model,
    x: np.ndarray,
    y: np.ndarray,
    e: np.ndarray,
    p0: np.ndarray,
    max_iter: int = 200,
    tol: float = 1e-10,
    fixed: np.ndarray | None = None,
    lower: np.ndarray | None = None,
    upper: np.ndarray | None = None,
) -> dict:
    """Levenberg-Marquardt with numeric Jacobian.

    Returns {p, stderr, chi2, n_iter, converged} — the fit-result record
    of `pyspec/fit.py` (params, per-param stderr from the covariance,
    chi-square).  ``fixed`` is a boolean mask of parameters held at
    their p0 value (excluded from the optimization and from dof);
    ``lower``/``upper`` are box limits enforced by step projection
    (pyspec fit.py's fixed/limits surface)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    e = np.where(np.asarray(e, dtype=np.float64) > 0, e, 1.0)
    p = np.asarray(p0, dtype=np.float64).copy()
    fixed = (
        np.zeros(p.size, dtype=bool)
        if fixed is None
        else np.asarray(fixed, dtype=bool)
    )
    free = np.flatnonzero(~fixed)
    lo = np.full(p.size, -np.inf) if lower is None else np.asarray(lower, float)
    hi = np.full(p.size, np.inf) if upper is None else np.asarray(upper, float)
    p = np.clip(p, lo, hi)
    lam = 1e-3
    res = (y - f(x, p)) / e
    cost = float(res @ res)
    converged = free.size == 0  # nothing to optimize is trivially converged
    it = 0
    H = np.zeros((free.size, free.size))
    for it in range(1, max_iter + 1) if free.size else []:
        # numeric Jacobian of residuals wrt the FREE params
        J = np.empty((x.size, free.size))
        for col, j in enumerate(free):
            h = 1e-7 * max(abs(p[j]), 1e-3)
            pj = p.copy()
            pj[j] += h
            J[:, col] = ((y - f(x, pj)) / e - res) / h
        g = J.T @ res
        H = J.T @ J
        step_ok = False
        for _ in range(30):
            try:
                dpf = np.linalg.solve(H + lam * np.diag(np.diag(H) + 1e-12), -g)
            except np.linalg.LinAlgError:
                lam *= 10
                continue
            p_new = p.copy()
            p_new[free] += dpf
            p_new = np.clip(p_new, lo, hi)
            res_new = (y - f(x, p_new)) / e
            cost_new = float(res_new @ res_new)
            if cost_new < cost:
                dp_eff = p_new - p
                p, res, cost = p_new, res_new, cost_new
                lam = max(lam / 3, 1e-12)
                step_ok = True
                break
            lam *= 10
        if not step_ok:
            converged = True
            break
        if abs(float(dp_eff @ dp_eff)) < tol * (1 + float(p @ p)):
            converged = True
            break
    dof = max(x.size - free.size, 1)
    chi2 = cost / dof
    stderr = np.zeros(p.size)
    if free.size:
        try:
            cov = np.linalg.inv(H) * chi2
            stderr[free] = np.sqrt(np.clip(np.diag(cov), 0, None))
        except np.linalg.LinAlgError:
            stderr[free] = np.nan
    return {
        "p": p,
        "stderr": stderr,
        "chi2": float(chi2),
        "n_iter": it,
        "converged": bool(converged),
    }


def fit_series(
    kinds: list[str],
    x: np.ndarray,
    y: np.ndarray,
    e: np.ndarray | None = None,
    p0: np.ndarray | None = None,
    fixed: np.ndarray | None = None,
    lower: np.ndarray | None = None,
    upper: np.ndarray | None = None,
) -> dict:
    """fit(x, y, funcs=[...]).go() equivalent: guess -> LM -> record.

    ``p0`` overrides the moment guess (required for meaningful
    ``fixed`` masks — a held parameter keeps its p0 value); ``fixed``/
    ``lower``/``upper`` mirror pyspec fit.py's fixed-params and limits."""
    if e is None:
        e = np.maximum(np.sqrt(np.abs(y)), 1.0)
    f, sizes = composite(kinds)
    if p0 is not None:
        out = leastsq_lm(
            f, x, y, e, np.asarray(p0, dtype=np.float64),
            fixed=fixed, lower=lower, upper=upper,
        )
        out["models"] = list(kinds)
        return out
    # Sequential guessing (fitfuncs guess-mode behavior for composites):
    # estimate baseline terms first (closed-form polyfit), subtract, then
    # moment-guess the peak terms on the residual — a raw moment guess on
    # baseline+peak data skews the centroid/width badly.
    resid = y.astype(np.float64).copy()
    guesses: list[np.ndarray] = []
    for k in kinds:
        if k == "constant":
            g = np.array([float(np.median(resid))])
            resid = resid - constant(x, g)
        elif k == "linear":
            m, b = np.polyfit(x, resid, 1)
            g = np.array([m, b])
            resid = resid - linear(x, g)
        else:
            g = guess(k, x, resid)
            resid = resid - MODELS[k][0](x, g)
        guesses.append(g)
    p0 = np.concatenate(guesses)
    out = leastsq_lm(f, x, y, e, p0, fixed=fixed, lower=lower, upper=upper)
    out["models"] = list(kinds)
    return out


def fit_series_odr(
    kinds: list[str],
    x: np.ndarray,
    y: np.ndarray,
    sy: np.ndarray | None = None,
    sx: np.ndarray | None = None,
    p0: np.ndarray | None = None,
    fixed: np.ndarray | None = None,
    lower: np.ndarray | None = None,
    upper: np.ndarray | None = None,
) -> dict:
    """Weighted errors-in-x fit (pyspec's `fit.py` ODR backend surface,
    SURVEY §2 X4) via the effective-variance method: minimize
    sum (y_i - f(x_i))^2 / (sy_i^2 + (f'(x_i) sx_i)^2)  over p
    (Orear, Am. J. Phys. 50, 1982 — the standard published reduction of
    orthogonal distance regression; EXACT for linear models, where it
    coincides with Deming regression, and the small-error approximation
    otherwise).

    The whole objective — including the parameter dependence of the
    denominator through f' — is minimized in ONE LM pass by treating
    r_i(p) = (y_i - f(x_i, p)) / sqrt(sy_i^2 + (f'(x_i, p) sx_i)^2)
    as the residual vector; the numeric Jacobian then carries the
    weight-derivative term that a naive iterate-the-weights loop drops
    (that fixed point is NOT the Deming minimizer — measured ~2% slope
    bias on noisy lines).
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    sy = (
        np.maximum(np.sqrt(np.abs(y)), 1.0)
        if sy is None
        else np.where(np.asarray(sy, dtype=np.float64) > 0, sy, 1.0)
    )
    if sx is None:
        sx = np.zeros_like(x)
    sx = np.asarray(sx, dtype=np.float64)

    f, _sizes = composite(kinds)
    # ordinary fit seeds p (under the same fixed/limit constraints)
    seed = fit_series(kinds, x, y, sy, p0=p0, fixed=fixed, lower=lower, upper=upper)
    p_seed = np.asarray(seed["p"], dtype=np.float64)
    hx = 1e-6 * (np.abs(x) + 1.0)

    def ev_model(_x, p):
        # leastsq_lm computes (y - model)/e with e=1; return
        # y - r(p) so the residual IS the effective-variance residual.
        fx = f(x, p)
        fprime = (f(x + hx, p) - f(x - hx, p)) / (2.0 * hx)
        denom = np.sqrt(sy**2 + (fprime * sx) ** 2)
        return y - (y - fx) / denom

    out = leastsq_lm(
        ev_model, x, y, np.ones_like(x), p_seed,
        fixed=fixed, lower=lower, upper=upper,
    )
    out["n_iter"] += int(seed["n_iter"])
    out["models"] = list(kinds)
    return out
