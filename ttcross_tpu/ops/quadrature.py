"""Quadrature rule generation.

Maps quad.f90: Gauss-Legendre nodes/weights by Newton iteration on the
Legendre recurrence (lgwt, quad.f90:97-131) and the exp-sinh quadrature
approximating 1/t as a sum of Gaussians (quad_rinv1, quad.f90:8-46).

Rule generation is setup-time host work (the reference also computes it
serially before the distributed cross), so it runs in numpy float64; the
results ship to device as constant arrays.
"""

from __future__ import annotations

import numpy as np

__all__ = ["lgwt", "gauss_legendre", "map_to_interval", "quad_rinv", "quad_rinv_error"]

_TWO_PI = 6.283185307179586476925286766559005768394338798750211641949889184615632812572418


def lgwt(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Gauss-Legendre nodes and weights on [-1, 1].

    Newton iteration on the three-term Legendre recurrence, vectorized over
    the upper half of the nodes (lgwt, quad.f90:97-131)."""
    small = 5 * np.finfo(np.float64).eps
    m = (n + 1) // 2
    i = np.arange(1, m + 1)
    z = np.cos(_TWO_PI * (4 * i - 1) / (8 * n + 4))
    for _ in range(100):
        p1 = np.ones_like(z)
        p2 = np.zeros_like(z)
        for j in range(1, n + 1):
            p3 = p2
            p2 = p1
            p1 = ((2 * j - 1) * z * p2 - (j - 1) * p3) / j
        pp = n * (z * p1 - p2) / (z * z - 1)
        z1 = z
        z = z1 - p1 / pp
        if np.all(np.abs(z - z1) <= small):
            break
    x = np.empty(n)
    w = np.empty(n)
    x[:m] = -z
    x[n - m:] = z[::-1]
    w[:m] = 2.0 / ((1 - z * z) * pp * pp)
    w[n - m:] = w[:m][::-1]
    return x, w


gauss_legendre = lgwt


def map_to_interval(x: np.ndarray, w: np.ndarray, a: float, b: float) -> tuple[np.ndarray, np.ndarray]:
    """Affine map of a [-1,1] rule to [a,b] (pattern of test_crs_stdnorm.f90:92-95)."""
    return 0.5 * ((b - a) * x + (a + b)), 0.5 * (b - a) * w


def quad_rinv(n: int) -> np.ndarray:
    """Exp-sinh quadrature approximating 1/t ~= sum_i w_i exp(-a_i t^2)
    (quad_rinv1, quad.f90:8-46).  Returns q of shape (2, m): weights row 0,
    exponents row 1."""
    nq = (n - 3) // 2
    h = np.log(_TWO_PI * nq) / nq
    log_huge = np.log(np.finfo(np.float64).max)
    rows = [(0.0, 0.0)]
    for i in range(-nq, nq + 1):
        t = i * h
        sinh_t, cosh_t = np.sinh(t), np.cosh(t)
        if abs(sinh_t) > log_huge:
            continue
        exp_sinh = np.exp(-sinh_t)
        weight = 2.0 * cosh_t * h / (np.sqrt(_TWO_PI / 2.0) * (1.0 + exp_sinh))
        alpha = np.log(1.0 + 1.0 / exp_sinh) ** 2
        rows.append((weight, alpha))
    return np.asarray(rows, dtype=np.float64).T


def quad_rinv_error(q: np.ndarray, a: float, b: float, n: int) -> float:
    """Max relative error of the 1/t quadrature on a log grid of [a,b]
    (testquad_rinv, quad.f90:48-95; file output dropped, value returned)."""
    if a <= 0 or b <= 0:
        raise ValueError(f"illegal interval: {a}, {b}")
    ts = np.exp(np.linspace(np.log(min(a, b)), np.log(max(a, b)), n))
    approx = (q[0][None, :] * np.exp(-q[1][None, :] * ts[:, None] ** 2)).sum(axis=1)
    return float(np.max(ts * np.abs(1.0 / ts - approx)))
