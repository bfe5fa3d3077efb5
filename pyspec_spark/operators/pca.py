"""PCA over embedding columns — SURVEY §2.12 L11 extension (r4).

The covariance matrix is already a declared, oracle-checked distributed
aggregate (`q_embed_cov`: map-only (i, j, x_i*x_j) pair expansion, no
self-join).  PCA adds the two bounded steps around it:

- ``pca_components``: eigendecomposition of the dim x dim covariance on
  the driver — a bounded model materialization (64x64 = 4 KB of
  doubles), the same documented policy as the IVF centroid trainer
  (operators/similarity.py).  The corpus itself never leaves executors.
- ``pca_project``: projection of every embedding onto the top-k
  components, map-only — components ride as literal arrays in the plan
  (no driver round-trip at execution time), the dot products run as
  zip_with/aggregate column expressions in the JVM.

Determinism: numpy ``eigh`` on a fixed symmetric matrix is stable, and
the sign ambiguity of eigenvectors is fixed by forcing the
largest-|coordinate| entry positive — projections are then a pure
function of the data.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def covariance_matrix(
    emb: DataFrame, vec_col: str = "embedding", dim: int | None = None
) -> np.ndarray:
    """Exact sample covariance of the embedding column as a numpy
    matrix.  Distributed: one map-only pair expansion + one bounded
    aggregation over the UPPER TRIANGLE only (dim*(dim+1)/2 keys —
    covariance is symmetric, so the lower triangle would double the
    shuffle for no information); only the aggregated matrix is
    collected (bounded model, not data).

    Raises ``ValueError`` on an empty input or a single row (the
    (n-1) sample denominator needs n >= 2)."""
    if dim is None:
        first = emb.select(F.size(vec_col).alias("d")).first()
        if first is None:
            raise ValueError(
                "covariance_matrix: empty input and no explicit dim — "
                "a covariance needs at least 2 rows"
            )
        d = int(first["d"])
    else:
        d = int(dim)
    if d == 0:
        # degenerate but explicit: 0-dim vectors have a 0x0 covariance
        # (F.sequence(0, -1) would yield a DESCENDING index sequence)
        return np.zeros((0, 0))
    v = F.col(vec_col)
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(d - 1)),
            lambda i: F.transform(
                # j ranges over i..d-1: upper triangle inclusive of the
                # diagonal (diagonal rows also carry x_i for the mean)
                F.sequence(i, F.lit(d - 1)),
                lambda j: F.struct(
                    i.alias("i"),
                    j.alias("j"),
                    (
                        F.element_at(v, i + 1).cast("double")
                        * F.element_at(v, j + 1).cast("double")
                    ).alias("xx"),
                    # xi rides only for the diagonal rows' means; a
                    # matching xj would double the shuffled payload for
                    # nothing (means for every j come from (j, j))
                    F.element_at(v, i + 1).cast("double").alias("xi"),
                ),
            ),
        )
    )
    agg = (
        emb.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.i").alias("i"), F.col("p.j").alias("j"))
        .agg(
            F.sum("p.xx").alias("sxx"),
            F.sum("p.xi").alias("sxi"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    if not agg:
        raise ValueError(
            "covariance_matrix: empty input — a covariance needs at "
            "least 2 rows"
        )
    n = agg[0]["n"]
    if n < 2:
        raise ValueError(
            f"covariance_matrix: got {n} row(s); the (n-1) sample "
            "denominator needs n >= 2"
        )
    C = np.zeros((d, d))
    mean = np.zeros(d)
    for r in agg:
        if r["j"] == r["i"]:
            mean[r["i"]] = r["sxi"] / n
    for r in agg:
        i, j = r["i"], r["j"]
        C[i, j] = (r["sxx"] - n * mean[i] * mean[j]) / (n - 1)
        C[j, i] = C[i, j]
    return C


def pca_components(cov: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Top-k eigenpairs of a covariance matrix, deterministically
    sign-fixed.  Returns (components [k, dim], eigenvalues [k])."""
    w, V = np.linalg.eigh(np.asarray(cov, dtype=np.float64))
    order = np.argsort(w)[::-1][:k]
    comps = V[:, order].T.copy()
    for r in range(comps.shape[0]):
        j = int(np.abs(comps[r]).argmax())
        if comps[r, j] < 0:
            comps[r] = -comps[r]
    return comps, w[order]


def pca_project(
    emb: DataFrame,
    components: np.ndarray,
    vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> DataFrame:
    """Project embeddings onto the components: map-only, components as
    in-plan literals, JVM-side dot products."""
    cols = []
    for r, comp in enumerate(np.asarray(components, dtype=np.float64)):
        lit = F.array(*[F.lit(float(c)) for c in comp])
        dot = F.aggregate(
            F.zip_with(vec_col, lit, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cols.append(
            (
                F.round(dot, round_digits)
                if round_digits is not None
                else dot
            ).alias(f"pc{r + 1}")
        )
    return emb.select("*", *cols)
