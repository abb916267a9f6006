"""Quantics TT-cross: a 1-D function on a virtual 2^K grid crossed as a
K-dimensional binary tensor (the exponential-grid regime that dtt_value
serves in the reference, tt.f90:702-728; SURVEY.md §5 long-context item b)."""

import jax.numpy as jnp
import numpy as np
import pytest

import ttcross_tpu.tt as tt
from ttcross_tpu.cross import cross


def make_quantics_problem(K):
    """f(x) = sin(2 pi x) + 0.5 cos(6 pi x), sampled on the 2^K dyadic grid.
    Bit order follows tt.value / dtt_value (tt.f90:702-728): the LAST mode
    holds the most significant bit, x = sum_k b_k 2^{-(K-k)}."""
    pows = jnp.asarray(2.0 ** -(K - np.arange(K)))

    def x_of(ind):
        return jnp.asarray(ind, jnp.float64) @ pows

    def f(x):
        return jnp.sin(2 * np.pi * x) + 0.5 * jnp.cos(6 * np.pi * x)

    def fun(ind):
        return f(x_of(ind))

    return fun, f


def test_quantics_cross_20_bits():
    """Cross a 2^20-point grid (a million virtual samples) at tiny rank."""
    K = 20
    fun, f = make_quantics_problem(K)
    # quantics bond spectra decay geometrically with the bit position:
    # relax the relative pivot-acceptance floor (reference hard-codes 1e-5)
    res = cross(fun, [2] * K, max_rank=8, pivoting=1, accuracy=1e-13,
                small_pivot=1e-14)
    assert max(res.ranks) <= 8
    # trigonometric functions have exact quantics rank <= ~4ish; evals tiny
    assert res.neval < 60_000

    # evaluate the quantics train at exact dyadic points via tt.value
    xs = np.arange(64) / 64.0
    got = np.asarray(tt.value(res.tt, jnp.asarray(xs)[:, None], dd=1))
    tru = np.sin(2 * np.pi * xs) + 0.5 * np.cos(6 * np.pi * xs)
    np.testing.assert_allclose(got, tru, atol=1e-9)


def test_quantics_integral():
    """Riemann sum over the virtual grid == contract with uniform weights:
    integral of f over [0,1) ~ 0 + 0 for the pure trig f."""
    K = 16
    fun, f = make_quantics_problem(K)
    w = [np.array([0.5, 0.5])] * K  # uniform product measure = 2^-K per point
    res = cross(fun, [2] * K, max_rank=8, pivoting=1, accuracy=1e-13,
                quad=w, truth=None)
    # mean of sin(2 pi x) + 0.5 cos(6 pi x) over the dyadic grid is ~0 (exact
    # cancellation of full periods on a power-of-two grid)
    assert abs(res.values[-1]) < 1e-10


def test_quantics_2d():
    """Two coordinates interleaved over 2x8 binary modes (dd=2 of
    tt.value; dtt_value's multi-coordinate mode, tt.f90:702-728)."""
    K = 8  # bits per coordinate
    d = 2 * K
    powsx = jnp.asarray(2.0 ** -(K - np.arange(K)))

    def fun(ind):
        ind = jnp.asarray(ind, jnp.float64)
        x = ind[:, :K] @ powsx
        y = ind[:, K:] @ powsx
        return jnp.sin(2 * np.pi * x) * jnp.cos(2 * np.pi * y)

    res = cross(fun, [2] * d, max_rank=6, pivoting=1, accuracy=1e-12,
                small_pivot=1e-14)
    xs = np.stack([np.arange(16) / 16.0, np.arange(16)[::-1] / 16.0], axis=1)
    got = np.asarray(tt.value(res.tt, jnp.asarray(xs), dd=2))
    tru = np.sin(2 * np.pi * xs[:, 0]) * np.cos(2 * np.pi * xs[:, 1])
    np.testing.assert_allclose(got, tru, atol=1e-8)
