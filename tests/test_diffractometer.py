"""Golden tests for Busing-Levy UB algebra (SURVEY.md §2.9 X3) and its
integration with the Spark-side HKL projection."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspec_spark.operators.diffractometer import (
    TWO_PI,
    b_matrix,
    hkl_to_q,
    q_to_hkl,
    reciprocal_lattice,
    u_matrix,
    ub_matrix,
    wavelength_to_k,
)

CUBIC = (4.0, 4.0, 4.0, 90.0, 90.0, 90.0)


def test_reciprocal_cubic():
    a_s, b_s, c_s, al, be, ga = reciprocal_lattice(*CUBIC)
    assert np.allclose([a_s, b_s, c_s], 1 / 4.0)
    assert np.allclose([al, be, ga], 90.0)


def test_b_matrix_cubic_diagonal():
    B = b_matrix(*CUBIC)
    assert np.allclose(B, np.diag([TWO_PI / 4.0] * 3), atol=1e-12)


def test_b_matrix_hexagonal():
    # hexagonal a=b=3, c=5, gamma=120: |Q(100)| = 4*pi/(sqrt(3)*a)
    B = b_matrix(3.0, 3.0, 5.0, 90.0, 90.0, 120.0)
    q100 = B @ np.array([1.0, 0, 0])
    assert math.isclose(np.linalg.norm(q100), 4 * math.pi / (math.sqrt(3) * 3.0),
                        rel_tol=1e-12)
    q001 = B @ np.array([0, 0, 1.0])
    assert math.isclose(np.linalg.norm(q001), TWO_PI / 5.0, rel_tol=1e-12)


def test_u_is_rotation_and_aligns():
    B = b_matrix(*CUBIC)
    # crystal physically rotated 30 deg about z
    th = math.radians(30)
    R = np.array([[math.cos(th), -math.sin(th), 0],
                  [math.sin(th), math.cos(th), 0],
                  [0, 0, 1.0]])
    h1, h2 = np.array([1.0, 0, 0]), np.array([0, 1.0, 0])
    U = u_matrix(h1, R @ B @ h1, h2, R @ B @ h2, B)
    assert np.allclose(U @ U.T, np.eye(3), atol=1e-12)
    assert math.isclose(np.linalg.det(U), 1.0, rel_tol=1e-12)
    assert np.allclose(U, R, atol=1e-12)


def test_ub_roundtrip_triclinic():
    lat = (5.1, 6.2, 7.3, 88.0, 95.0, 103.0)
    B = b_matrix(*lat)
    th = math.radians(-47.0)
    R = np.array([[1, 0, 0],
                  [0, math.cos(th), -math.sin(th)],
                  [0, math.sin(th), math.cos(th)]])
    h1, h2 = np.array([1.0, 1.0, 0]), np.array([0, 0, 2.0])
    UB = ub_matrix(lat, h1, R @ B @ h1, h2, R @ B @ h2)
    hkl = np.array([[1.0, 2.0, 3.0], [-1.0, 0.5, 0.25]])
    assert np.allclose(q_to_hkl(UB, hkl_to_q(UB, hkl)), hkl, atol=1e-10)
    # UB reproduces the observed reflections
    assert np.allclose(UB @ h1, R @ B @ h1, atol=1e-10)


def test_wavelength():
    assert math.isclose(wavelength_to_k(1.54), TWO_PI / 1.54, rel_tol=1e-15)


@pytest.mark.spark
def test_hkl_transform_integration(spark):
    """Driver-side UB broadcast into the Spark HKL projection inverts
    hkl_to_q exactly (SURVEY §2 X3 -> X1 wiring)."""
    from pyspec_spark.operators.transform import hkl_transform

    lat = (4.0, 5.0, 6.0, 90.0, 90.0, 90.0)
    B = b_matrix(*lat)
    h1, h2 = np.array([2.0, 0, 0]), np.array([0, 1.0, 1.0])
    UB = ub_matrix(lat, h1, B @ h1, h2, B @ h2)  # untilted: U = I
    hkl = np.array([[1.0, 0, 0], [0, 2.0, 0], [1.0, 1.0, 1.0], [0.5, -1.5, 2.0]])
    qs = hkl_to_q(UB, hkl)
    df = spark.createDataFrame(
        [(float(q[0]), float(q[1]), float(q[2])) for q in qs], "qx double, qy double, qz double"
    )
    out = hkl_transform(df, [float(v) for v in UB.ravel()])
    got = np.array([[r["h"], r["k"], r["l"]] for r in out.collect()])
    assert np.allclose(np.sort(got, axis=0), np.sort(hkl, axis=0), atol=1e-9)
