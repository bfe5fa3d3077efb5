"""PCA operator tests — operators/pca.py (r4).  Golden strategy: the
distributed covariance and projections must equal local numpy on the
collected embeddings (bounded test data), and the component model must
satisfy PCA's defining identities (eigenvalue = score variance)."""

from __future__ import annotations

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb_local(spark):
    rows = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .orderBy("vec_id")
        .collect()
    )
    X = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    return rows, X


def test_covariance_matrix_matches_numpy(spark, emb_local):
    from pyspec_spark.operators.pca import covariance_matrix

    _, X = emb_local
    C = covariance_matrix(
        spark.read.parquet(f"{SF}/embeddings.parquet")
    )
    np.testing.assert_allclose(C, np.cov(X, rowvar=False), rtol=1e-9, atol=1e-12)


def test_pca_components_identities(emb_local):
    from pyspec_spark.operators.pca import pca_components

    _, X = emb_local
    C = np.cov(X, rowvar=False)
    comps, evals = pca_components(C, k=4)
    assert comps.shape == (4, X.shape[1])
    # eigenvalues descending, components orthonormal
    assert all(evals[i] >= evals[i + 1] for i in range(3))
    np.testing.assert_allclose(comps @ comps.T, np.eye(4), atol=1e-10)
    # sign convention: largest-|coordinate| entry is positive
    for r in range(4):
        assert comps[r, np.abs(comps[r]).argmax()] > 0
    # defining identity: variance of scores along comp r == eval r
    scores = (X - X.mean(0)) @ comps.T
    np.testing.assert_allclose(scores.var(0, ddof=1), evals, rtol=1e-9)


def test_pca_project_distributed_matches_local(spark, emb_local):
    from pyspec_spark.operators.pca import (
        covariance_matrix,
        pca_components,
        pca_project,
    )

    rows, X = emb_local
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    comps, evals = pca_components(covariance_matrix(emb), k=2)
    got = {
        r["vec_id"]: (r["pc1"], r["pc2"])
        for r in pca_project(emb, comps).collect()
    }
    local = X @ comps.T
    ids = [r["vec_id"] for r in rows]
    for i, vid in enumerate(ids):
        assert got[vid][0] == pytest.approx(round(local[i, 0], 6), abs=2e-6)
        assert got[vid][1] == pytest.approx(round(local[i, 1], 6), abs=2e-6)
    # projections are centered-data variance maximizers: pc1 sample
    # variance (over uncentered dots, shifted by a constant) == eval1
    v1 = np.var([got[v][0] for v in ids], ddof=1)
    assert v1 == pytest.approx(evals[0], rel=1e-4)


def test_pca_power_equals_numpy_iterate(spark, emb_local):
    """q_pca_power's contract is the exact 2-round iterate: v2 =
    normalize(C @ normalize(C @ v0)) with v0 uniform — the iteration
    count is part of the query (the oracle replays the same rounds).
    The synthetic embeddings have a near-degenerate spectrum
    (lambda2/lambda1 ~ 0.96 at sf0.001, measured), so NO small fixed
    round count can align with the top eigenvector — the meaningful
    checks are exact agreement with numpy's same iterate and the
    monotone Rayleigh-quotient improvement every power step guarantees."""
    from pyspec_spark.queries.ml import q_pca_power

    _, X = emb_local

    def q6_sum(terms):
        # HALF_UP like the engines' DECIMAL/_fixed6 quantization —
        # np.round's half-even flips the 1e-6 digit on exact halves,
        # which the tiny x magnitudes here amplify after normalization
        t = np.asarray(terms) * 1e6
        return float((np.floor(np.abs(t) + 0.5) * np.sign(t)).sum()) / 1e6

    def r6_up(x):
        return float(np.floor(abs(x) * 1e6 + 0.5) * np.sign(x)) / 1e6

    # mirror q_embed_cov's exact r8 arithmetic: integer micro-unit
    # moment sums -> exact integer numerator/denominator -> the one
    # double chain fl(num)/fl(den)/1e6 -> scale-0 HALF-AWAY round.
    # np.cov differs at rounding boundaries by 1e-6, which the tiny
    # first-round x magnitudes amplify, so the mirror must be exact.
    def q6_isum(terms):
        t = np.asarray(terms) * 1e6
        # integer-valued floats, sum < 2^53 -> exact
        return int((np.floor(np.abs(t) + 0.5) * np.sign(t)).sum())

    def r0_up(t):
        return float(np.floor(abs(t) + 0.5) * np.sign(t))

    Xd = X[:, :16]
    n = Xd.shape[0]
    s_int = [q6_isum(Xd[:, i]) for i in range(16)]
    C = np.zeros((16, 16))
    for i in range(16):
        for j in range(i, 16):
            m2 = q6_isum(Xd[:, i] * Xd[:, j])
            num = n * m2 * 10**6 - s_int[i] * s_int[j]  # exact python int
            den = n * (n - 1)
            C[i, j] = C[j, i] = r0_up(float(num) / float(den) / 1e6) / 1e6

    v_ref = np.full(16, 0.125)
    for _ in range(2):
        x = np.array([q6_sum(C[i] * v_ref) for i in range(16)])
        x /= np.sqrt(q6_sum(x * x))
        v_ref = x
    got_rows = q_pca_power.__wrapped__(spark, SF).collect()
    v = np.zeros(16)
    for r in got_rows:
        v[r["i"] - 1] = r["pc1"]
    # exact same quantized arithmetic -> agree to the output rounding
    np.testing.assert_allclose(v, np.round(v_ref, 6), atol=1.1e-6)
    # unit up to the micro-unit quantization of the tiny x*x terms
    assert np.linalg.norm(v) == pytest.approx(1.0, abs=5e-3)

    def rayleigh(u):
        u = u / np.linalg.norm(u)
        return float(u @ C @ u)

    assert rayleigh(v) > rayleigh(np.full(16, 0.125))


def test_covariance_edge_cases_raise_cleanly(spark):
    """ADVICE r4: explicit-dim empty input and single-row input must be
    clean ValueErrors (not IndexError / inf-filled matrices), and
    round_digits=0 must round to integers, not silently disable."""
    from pyspark.sql import functions as F

    from pyspec_spark.operators.pca import covariance_matrix, pca_project

    empty = spark.createDataFrame([], "embedding array<float>")
    with pytest.raises(ValueError, match="empty"):
        covariance_matrix(empty, dim=4)
    one = spark.createDataFrame([([1.0, 2.0, 3.0, 4.0],)],
                                "embedding array<float>")
    with pytest.raises(ValueError, match="n >= 2"):
        covariance_matrix(one)
    # round_digits=0 -> integer-rounded projections (not un-rounded)
    comps = np.eye(1, 4)
    got = pca_project(one, comps, round_digits=0).collect()[0]["pc1"]
    assert got == 1.0
    # dim=0 honored as an explicit (degenerate) dimension, not ignored
    two = spark.createDataFrame(
        [([],), ([],)], "embedding array<float>"
    )
    C = covariance_matrix(two, dim=0)
    assert C.shape == (0, 0)
