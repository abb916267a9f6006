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


def test_quantics_app_exp_integral():
    """apps.quantics convenience layer: exp(x) on [0,1) is exactly rank 1
    in quantics (exp of a sum of bit contributions factorizes), and the
    Riemann sum matches the midpoint-free left sum of e - 1."""
    from ttcross_tpu.apps import quantics_cross

    K = 16
    prob, res = quantics_cross(jnp.exp, K, max_rank=4, pivoting=1,
                               accuracy=1e-13)
    assert max(res.ranks) <= 2  # rank-1 function (+1 padding headroom)
    # left Riemann sum of exp on 2^K cells (exact closed form)
    h = 2.0 ** -K
    tru = h * (np.e - 1.0) / (np.exp(h) - 1.0)
    assert abs(1.0 - res.values[-1] / tru) < 1e-10
    # point evaluation through the domain mapping
    xs = np.arange(32) / 32.0
    got = np.asarray(prob.value(res.tt, xs[:, None]))
    np.testing.assert_allclose(got, np.exp(xs), rtol=1e-10)


def test_quantics_greedy_plateau_cured_by_refine():
    """Deep-grid conditioning regression: exp(x) sin(6 pi x) at K=20 has
    exact quantics rank 2, yet GREEDY pivots plateau near 4e-7 point
    error at any rank or pivoting (full pivoting included — measured,
    BENCH_NOTES 'Quantics pivot conditioning'); one maxvol replacement
    sweep restores machine precision."""
    from ttcross_tpu.apps import quantics_cross

    K = 20
    f = lambda x: jnp.exp(x) * jnp.sin(6 * np.pi * x)  # noqa: E731
    xs = np.arange(64) / 64.0
    tru = np.asarray(f(jnp.asarray(xs)))

    prob, res = quantics_cross(f, K, max_rank=10, pivoting=2,
                               accuracy=1e-13)
    e_greedy = np.abs(np.asarray(prob.value(res.tt, xs[:, None])) - tru).max()
    assert e_greedy > 1e-9  # the plateau is real (else drop the refine)

    prob, res = quantics_cross(f, K, max_rank=10, pivoting=2,
                               accuracy=1e-13, refine_sweeps=1)
    e_ref = np.abs(np.asarray(prob.value(res.tt, xs[:, None])) - tru).max()
    assert e_ref < 1e-12


def test_quantics_app_domain_and_2d():
    """Non-unit domain + dd=2: f(x, y) = exp(-(x^2 + y^2)) on [-3, 3)^2;
    the weighted contraction approximates the Gaussian mass and grid_x
    maps indices to coordinates consistently with tt.value."""
    from ttcross_tpu.apps import make_quantics
    from ttcross_tpu.cross import cross as _cross

    K = 10
    prob = make_quantics(lambda x: jnp.exp(-(x[:, 0] ** 2 + x[:, 1] ** 2)),
                         K, dd=2, domain=(-3.0, 3.0))
    assert prob.d == 2 * K and prob.n == 2
    res = _cross(prob.fun, [prob.n] * prob.d, max_rank=8, pivoting=1,
                 accuracy=1e-12, small_pivot=1e-14,
                 quad=prob.quad_weights)
    from math import erf

    tru = (np.sqrt(np.pi) * erf(3.0)) ** 2  # (int_-3^3 e^{-x^2} dx)^2
    # left-Riemann on 2^10 cells per axis: O(h) error ~ 6e-3; the cross
    # itself is exact to ~1e-10 (checked via point values below)
    assert abs(1.0 - res.values[-1] / tru) < 2e-2
    xs = np.stack([np.linspace(-3, 2.9, 13), np.linspace(-2.9, 2.8, 13)],
                  axis=1)
    # snap to the dyadic grid like tt.value does
    h = 6.0 / 2 ** K
    snap = -3.0 + np.floor((xs + 3.0) / h) * h
    got = np.asarray(prob.value(res.tt, snap))
    tru_pt = np.exp(-(snap[:, 0] ** 2 + snap[:, 1] ** 2))
    np.testing.assert_allclose(got, tru_pt, atol=1e-8)
