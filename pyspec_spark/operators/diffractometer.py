"""UB / orientation-matrix algebra — SURVEY.md §2.9 X3.

Re-expresses the reference's diffractometer module (`pyspec/diffractometer.py`,
Busing & Levy 1967 formalism — public algorithm) as a small driver-side
numpy library.  The UB matrix is 9 numbers: it is NOT a data-parallel
object, so the Spark design is to compute it on the driver and broadcast
it as literals into the per-pixel `ccdToQ`/HKL projections
(`operators/transform.py::hkl_transform`), exactly as SURVEY.md §2 X3
prescribes.

Conventions:
- Lattice (a, b, c, alpha, beta, gamma) in angstroms / degrees.
- B in the Busing-Levy convention WITH the 2*pi factor folded in, so
  Q = UB @ hkl is in inverse-angstrom momentum-transfer units.
- U built from two observed reflections via the orthonormal-triple
  construction (Busing-Levy eq. 27).
"""

from __future__ import annotations

import math

import numpy as np

TWO_PI = 2.0 * math.pi


def reciprocal_lattice(
    a: float, b: float, c: float, alpha: float, beta: float, gamma: float
) -> tuple[float, float, float, float, float, float]:
    """Reciprocal lattice parameters (a*, b*, c*, alpha*, beta*, gamma*)
    from the direct cell; angles in degrees, lengths in 1/angstrom
    (WITHOUT the 2*pi factor — that lives in :func:`b_matrix`)."""
    al, be, ga = (math.radians(x) for x in (alpha, beta, gamma))
    v = (
        a
        * b
        * c
        * math.sqrt(
            1
            - math.cos(al) ** 2
            - math.cos(be) ** 2
            - math.cos(ga) ** 2
            + 2 * math.cos(al) * math.cos(be) * math.cos(ga)
        )
    )
    a_s = b * c * math.sin(al) / v
    b_s = a * c * math.sin(be) / v
    c_s = a * b * math.sin(ga) / v
    cos_al_s = (math.cos(be) * math.cos(ga) - math.cos(al)) / (
        math.sin(be) * math.sin(ga)
    )
    cos_be_s = (math.cos(al) * math.cos(ga) - math.cos(be)) / (
        math.sin(al) * math.sin(ga)
    )
    cos_ga_s = (math.cos(al) * math.cos(be) - math.cos(ga)) / (
        math.sin(al) * math.sin(be)
    )
    return (
        a_s,
        b_s,
        c_s,
        math.degrees(math.acos(cos_al_s)),
        math.degrees(math.acos(cos_be_s)),
        math.degrees(math.acos(cos_ga_s)),
    )


def b_matrix(
    a: float, b: float, c: float, alpha: float, beta: float, gamma: float
) -> np.ndarray:
    """Busing-Levy B (3x3), 2*pi convention: Q = 2*pi * B_bl @ hkl for an
    untilted crystal (U = I)."""
    a_s, b_s, c_s, al_s, be_s, ga_s = reciprocal_lattice(a, b, c, alpha, beta, gamma)
    al = math.radians(alpha)
    be_sr, ga_sr = math.radians(be_s), math.radians(ga_s)
    B = np.array(
        [
            [a_s, b_s * math.cos(ga_sr), c_s * math.cos(be_sr)],
            [0.0, b_s * math.sin(ga_sr), -c_s * math.sin(be_sr) * math.cos(al)],
            [0.0, 0.0, 1.0 / c],
        ]
    )
    return TWO_PI * B


def _triple(t1: np.ndarray, t2: np.ndarray) -> np.ndarray:
    """Orthonormal right-handed triple with u1 || t1 and u2 in the
    (t1, t2) plane (Busing-Levy 'TC' construction); columns are the
    basis vectors."""
    u1 = t1 / np.linalg.norm(t1)
    u3 = np.cross(t1, t2)
    u3 = u3 / np.linalg.norm(u3)
    u2 = np.cross(u3, u1)
    return np.column_stack([u1, u2, u3])


def u_matrix(
    h1: np.ndarray,
    q1_obs: np.ndarray,
    h2: np.ndarray,
    q2_obs: np.ndarray,
    B: np.ndarray,
) -> np.ndarray:
    """Orientation U from two reflections: hkl h1/h2 and their observed
    Cartesian Q vectors (lab frame).  U @ (B @ h) aligns with q_obs."""
    Tc = _triple(B @ np.asarray(h1, float), B @ np.asarray(h2, float))
    Tphi = _triple(np.asarray(q1_obs, float), np.asarray(q2_obs, float))
    return Tphi @ Tc.T


def ub_matrix(
    lattice: tuple[float, float, float, float, float, float],
    h1: tuple[float, float, float],
    q1_obs: tuple[float, float, float],
    h2: tuple[float, float, float],
    q2_obs: tuple[float, float, float],
) -> np.ndarray:
    """Full Busing-Levy UB from a lattice and two observed reflections."""
    B = b_matrix(*lattice)
    U = u_matrix(np.asarray(h1), np.asarray(q1_obs), np.asarray(h2), np.asarray(q2_obs), B)
    return U @ B


def hkl_to_q(UB: np.ndarray, hkl: np.ndarray) -> np.ndarray:
    """Q (lab frame, 1/angstrom) for row-stacked hkl triples."""
    return np.asarray(hkl, float) @ np.asarray(UB, float).T


def q_to_hkl(UB: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Inverse map: hkl for row-stacked Cartesian Q vectors."""
    return np.asarray(q, float) @ np.linalg.inv(np.asarray(UB, float)).T


def wavelength_to_k(wavelength: float) -> float:
    """|k| = 2*pi / lambda."""
    return TWO_PI / wavelength
