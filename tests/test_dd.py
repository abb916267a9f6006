"""Double-double tier tests: error-free transforms verified against exact
rational arithmetic, and the dd TT contraction recovering digits far beyond
f64 (the role of the reference's MPFUN tier, SURVEY.md §2.3)."""

from fractions import Fraction

import jax.numpy as jnp
import numpy as np
import pytest

import ttcross_tpu  # noqa: F401
import ttcross_tpu.tt as tt
from ttcross_tpu.ops.dd import (
    DD,
    dd,
    dd_add,
    dd_contract,
    dd_div,
    dd_dot,
    dd_from_string,
    dd_matmul,
    dd_mul,
    dd_sum,
    dd_to_float,
    dd_to_string,
    two_prod,
    two_sum,
)


def test_two_sum_exact(rng):
    for _ in range(50):
        a = float(rng.standard_normal() * 10.0 ** rng.integers(-10, 10))
        b = float(rng.standard_normal() * 10.0 ** rng.integers(-10, 10))
        s, e = two_sum(np.float64(a), np.float64(b))
        assert Fraction(float(s)) + Fraction(float(e)) == Fraction(a) + Fraction(b)


def test_two_prod_exact(rng):
    for _ in range(50):
        a = float(rng.standard_normal())
        b = float(rng.standard_normal())
        p, e = two_prod(np.float64(a), np.float64(b))
        assert Fraction(float(p)) + Fraction(float(e)) == Fraction(a) * Fraction(b)


def test_dd_cancellation():
    # (1e16 + 1) - 1e16 = 1 exactly in dd, 0-ish garbage in f64
    x = dd_add(dd(1e16), dd(1.0))
    y = dd_add(x, dd(-1e16))
    assert float(dd_to_float(y)) == 1.0


def test_dd_mul_div(rng):
    a = dd_from_string("1.00000000000000000000000000000001")
    b = dd_from_string("2.99999999999999999999999999999997")
    x = DD(np.float64(a[0]), np.float64(a[1]))
    y = DD(np.float64(b[0]), np.float64(b[1]))
    prod = dd_mul(x, y)
    back = dd_div(prod, y)
    assert abs(float(dd_to_float(dd_add(back, DD(-x.hi, -x.lo))))) < 1e-30


def test_dd_sum_ill_conditioned():
    import jax.numpy as jnp

    vals = np.array([1.0, 1e-18, -1.0, 1e-19] * 100)
    s = dd_sum(DD(jnp.asarray(vals), jnp.zeros_like(jnp.asarray(vals))))
    exact = 100 * (Fraction(1e-18) + Fraction(1e-19))  # exact over the f64 values
    err = abs(float(Fraction(float(s.hi)) + Fraction(float(s.lo)) - exact))
    assert err < 1e-29  # ~400 dd adds of magnitude-1 values, err ~ n*eps^2; f64 sum returns 0.0
    assert np.sum(vals) == 0.0


def test_dd_dot_vs_fraction(rng):
    import jax.numpy as jnp

    x = rng.standard_normal(32)
    y = rng.standard_normal(32)
    got = dd_dot(jnp.asarray(x), jnp.zeros(32), jnp.asarray(y), jnp.zeros(32))
    exact = sum(Fraction(a) * Fraction(b) for a, b in zip(x, y))
    err = Fraction(float(got.hi)) + Fraction(float(got.lo)) - exact
    assert abs(float(err)) < 1e-30 * abs(float(exact))


def test_dd_matmul(rng):
    import jax.numpy as jnp

    A = rng.standard_normal((3, 4))
    B = rng.standard_normal((4, 2))
    got = dd_matmul(jnp.asarray(A), jnp.zeros_like(jnp.asarray(A)),
                    jnp.asarray(B), jnp.zeros_like(jnp.asarray(B)))
    np.testing.assert_allclose(np.asarray(dd_to_float(got)), A @ B, rtol=1e-15)


def test_dd_contract_beats_f64(rng):
    """dd TT contraction vs exact Fraction arithmetic on an ill-conditioned
    weight set: dd must deliver ~30 digits where f64 caps at ~16."""
    d, n = 3, 4
    cores = [np.round(rng.standard_normal((r1, n, r2)) * 8) / 8 for (r1, r2) in
             [(1, 2), (2, 2), (2, 1)]]  # dyadic rationals: exact in f64
    T = tt.from_cores(cores)
    w = [np.array([1.0, 1e-14, -1.0, 2e-14])] * d  # cancelling weights
    got = dd_contract(T, w)
    # exact reference in rational arithmetic
    v = [Fraction(1)]
    for c in range(d):
        m = [[sum(Fraction(float(cores[c][i, k, j])) * Fraction(float(w[c][k]))
                  for k in range(n)) for j in range(cores[c].shape[2])]
             for i in range(cores[c].shape[0])]
        v = [sum(v[i] * m[i][j] for i in range(len(v))) for j in range(len(m[0]))]
    exact = v[0]
    err = abs(float(Fraction(float(got.hi)) + Fraction(float(got.lo)) - exact))
    f64 = float(tt.contract(T, w))
    f64_err = abs(float(Fraction(f64) - exact))
    assert err < 1e-12 * f64_err or err < 1e-40  # dd crushes the f64 error
    assert err < 1e-28 * max(abs(float(exact)), 1e-10)


def test_dd_string_roundtrip():
    hi, lo = dd_from_string("0.648634209031007075263149843450351690889772509481627995615")
    s = dd_to_string(DD(np.float64(hi), np.float64(lo)), digits=30)
    assert s.startswith("6.4863420903100707526314984345")


def test_dd_exp_accuracy():
    """Device dd exponential: full dd accuracy on the CPU backend
    (range reduction + Taylor + 9 squarings + exact 2^k construction —
    jnp.exp2 is inexact on this stack, see ops/dd.py)."""
    from decimal import Decimal, getcontext

    from ttcross_tpu.ops.dd import dd, dd_exp

    getcontext().prec = 50
    rng = np.random.default_rng(3)
    xs = rng.uniform(-300, 10, size=100)
    r = dd_exp(dd(jnp.asarray(xs)))
    for i, x in enumerate(xs):
        exact = Decimal(x).exp()
        got = Decimal(float(r.hi[i])) + Decimal(float(r.lo[i]))
        assert abs(float((got - exact) / exact)) < 1e-28, x


def test_dd_log_accuracy():
    from decimal import Decimal, getcontext

    from ttcross_tpu.ops.dd import dd, dd_log

    getcontext().prec = 50
    rng = np.random.default_rng(4)
    xs = rng.uniform(1e-10, 1e10, size=100)
    r = dd_log(dd(jnp.asarray(xs)))
    for i, x in enumerate(xs):
        exact = Decimal(x).ln()
        got = Decimal(float(r.hi[i])) + Decimal(float(r.lo[i]))
        assert abs(float((got - exact) / exact)) < 1e-29, x


def test_dd_exp_log_roundtrip():
    from ttcross_tpu.ops.dd import dd, dd_exp, dd_log, dd_sub, dd_to_float

    xs = jnp.asarray([0.5, 2.0, 10.0, 100.0])
    back = dd_log(dd_exp(dd(xs)))
    err = np.abs(np.asarray(dd_to_float(dd_sub(back, dd(xs)))))
    assert err.max() < 1e-28


@pytest.mark.slow
def test_stdnorm_dd_defect_pipeline():
    """Defect correction with a transcendental dd integrand (device dd exp):
    beyond-f64 accuracy on the product Gaussian."""
    from decimal import Decimal, getcontext

    from ttcross_tpu import native

    if not native.available():
        pytest.skip("no native toolchain")
    from ttcross_tpu.apps.stdnorm import make_stdnorm_dd
    from ttcross_tpu.apps.truths import TPI_STR
    from ttcross_tpu.cross.defect import cross_defect_corrected

    getcontext().prec = 60
    d = 4
    prob, fun_dd, wh, wl = make_stdnorm_dd(d=d, n=65)
    hi, lo, info = cross_defect_corrected(
        prob.fun, fun_dd, [prob.n] * d, wh, wl,
        max_rank=6, accuracy=5 * 2.2e-16, pivoting=1)
    tru = (Decimal(TPI_STR) / 2) ** (d // 2)
    rel = abs(1 - (Decimal(hi) + Decimal(lo)) / tru)
    assert float(-rel.log10()) >= 14.5
