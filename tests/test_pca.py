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
