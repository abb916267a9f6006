"""Extended-precision refinement tests: the dd/__float128 tier must deliver
accuracy far beyond f64 (the MPFUN tier's role, SURVEY.md §2.3)."""

from fractions import Fraction

import numpy as np
import pytest

import ttcross_tpu.tt as tt
from ttcross_tpu import native
from ttcross_tpu.cross import cross
from ttcross_tpu.cross.refine import refine_dd

pytestmark = pytest.mark.skipif(not native.available(), reason="no native toolchain")


def test_refine_exact_rank_rational(rng):
    """Exact-rank tensor with dyadic-rational entries: the refined
    quadrature must match exact rational arithmetic to ~1e-30."""
    d, n = 3, 5
    cores = [np.round(rng.standard_normal((r1, n, r2)) * 16) / 16
             for (r1, r2) in [(1, 2), (2, 2), (2, 1)]]
    T = tt.from_cores(cores)
    dense = np.asarray(tt.full(T))

    def fun(ind):
        return tt.gather(T, ind)

    def fun_dd(ind):
        # dyadic products are exact in f64 chains -> evaluate via Fractions
        vals = np.array([float(dense[tuple(i)]) for i in ind])
        return vals, np.zeros_like(vals)

    res = cross(fun, [n] * d, max_rank=3, pivoting=1, accuracy=1e-12,
                return_state=True)
    w = [np.full(n, 0.125)] * d
    hi, lo, neval = refine_dd(res.state, [n] * d, fun_dd, w)
    exact = Fraction(0)
    for idx in np.ndindex(*dense.shape):
        term = Fraction(float(dense[idx]))
        for c, j in enumerate(idx):
            term *= Fraction(1, 8)
        exact += term
    err = abs(float(Fraction(hi) + Fraction(lo) - exact))
    assert err < 1e-27, (hi, lo, float(exact), err)
    # f64 contraction is ~1e-16-limited; refined must be far better or both tiny
    assert neval > 0


def test_refine_stdnorm_beyond_f64():
    """Product Gaussian (exact TT rank 1): refinement with dd Gauss-Legendre
    rules reaches ~28+ digits vs pi^(d/2), far beyond any f64 pipeline."""
    from ttcross_tpu.apps import make_stdnorm
    from ttcross_tpu.ops.dd import DD, dd_from_string, dd_to_string

    d, nq = 4, 101
    (xh, xl), (wh, wl) = native.gauss_legendre_dd(nq)
    # map to [-8.5, 8.5] IN DD ARITHMETIC (a plain f64 multiply would
    # destroy the lo parts and cap accuracy at ~1e-16)
    import jax.numpy as jnp

    from ttcross_tpu.ops.dd import DD, dd, dd_mul

    scale = 8.5
    X = dd_mul(DD(jnp.asarray(xh), jnp.asarray(xl)), dd(scale))
    W = dd_mul(DD(jnp.asarray(wh), jnp.asarray(wl)), dd(scale))
    xh, xl = np.asarray(X.hi), np.asarray(X.lo)
    wh, wl = np.asarray(W.hi), np.asarray(W.lo)

    prob = make_stdnorm(d=d, n=nq, a=-scale, b=scale)

    def fun_dd(ind):
        return native.stdnorm_dd(ind, xh, xl)

    res = cross(prob.fun, [nq] * d, max_rank=4, pivoting=1, accuracy=25e-16,
                return_state=True)
    hi, lo, _ = refine_dd(res.state, [nq] * d, fun_dd, [wh] * d, [wl] * d)

    from decimal import Decimal, getcontext

    getcontext().prec = 60
    pi = Decimal("3.14159265358979323846264338327950288419716939937510582097494")
    tru = pi ** 2  # pi^(d/2) with d=4
    got = Decimal(hi) + Decimal(lo)
    rel = abs(1 - got / tru)
    digits = -float(rel.ln() / Decimal(10).ln()) if rel != 0 else 60.0
    assert digits >= 25, (str(got), str(tru), digits)
