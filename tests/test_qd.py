"""Quad-double arithmetic (ops/qd.py): the ~62-digit tier between dd and
the mpmath engine, verified limb-exactly against mpmath (the role of the
reference's MPFUN self-checks, mpfun-mpfr-v08/)."""

import jax.numpy as jnp
import numpy as np
import pytest

import ttcross_tpu  # noqa: F401  (x64)
import ttcross_tpu.tt as tt
from ttcross_tpu.ops.qd import (QD, qd, qd_add, qd_contract, qd_div,
                                qd_dot, qd_from_mp, qd_from_string,
                                qd_gather_tt, qd_mul, qd_mul_f64, qd_sub,
                                qd_sum, qd_to_mp)

mpmath = pytest.importorskip("mpmath")
from mpmath import mp, mpf, workdps  # noqa: E402


def _to_mp(x: QD, i):
    return qd_to_mp(np.asarray(x.e0)[i], np.asarray(x.e1)[i],
                    np.asarray(x.e2)[i], np.asarray(x.e3)[i])


def _rand_qd(rng, B, scale=1.0):
    """Random qd values with genuinely populated low limbs."""
    e0 = rng.standard_normal(B) * scale
    e1 = e0 * rng.standard_normal(B) * 1e-17
    e2 = e1 * rng.standard_normal(B) * 1e-17
    e3 = e2 * rng.standard_normal(B) * 1e-17
    return QD(jnp.asarray(e0), jnp.asarray(e1), jnp.asarray(e2),
              jnp.asarray(e3))


def _relerr(got, want):
    return abs((got - want) / want) if want != 0 else abs(got)


@pytest.mark.parametrize("op,mpop", [
    (qd_add, lambda a, b: a + b),
    (qd_sub, lambda a, b: a - b),
    (qd_mul, lambda a, b: a * b),
    (qd_div, lambda a, b: a / b),
])
def test_qd_binary_ops_vs_mpmath(rng, op, mpop):
    with workdps(90):
        x = _rand_qd(rng, 64)
        y = _rand_qd(rng, 64, scale=3.0)
        z = op(x, y)
        for i in range(64):
            want = mpop(_to_mp(x, i), _to_mp(y, i))
            err = _relerr(_to_mp(z, i), want)
            assert err < mpf("1e-60"), (i, err)


def test_qd_cancellation(rng):
    """Massive cancellation: (x + tiny) - x recovers tiny to qd accuracy
    (the distillation sweeps must drain it, not lose it)."""
    with workdps(90):
        x = _rand_qd(rng, 16)
        tiny = _rand_qd(rng, 16, scale=1e-40)
        z = qd_sub(qd_add(x, tiny), x)
        for i in range(16):
            want = _to_mp(tiny, i)
            assert _relerr(_to_mp(z, i), want) < mpf("1e-18"), i


def test_qd_mul_f64(rng):
    with workdps(90):
        x = _rand_qd(rng, 32)
        b = rng.standard_normal(32)
        z = qd_mul_f64(x, jnp.asarray(b))
        for i in range(32):
            want = _to_mp(x, i) * mpf(b[i])
            assert _relerr(_to_mp(z, i), want) < mpf("1e-60"), i


def test_qd_sum_dot_vs_mpmath(rng):
    with workdps(90):
        x = _rand_qd(rng, 101)
        y = _rand_qd(rng, 101)
        s = qd_sum(x)
        want = sum(_to_mp(x, i) for i in range(101))
        assert _relerr(qd_to_mp(float(s.e0), float(s.e1), float(s.e2),
                                float(s.e3)), want) < mpf("1e-58")
        d = qd_dot(x, y)
        want = sum(_to_mp(x, i) * _to_mp(y, i) for i in range(101))
        assert _relerr(qd_to_mp(float(d.e0), float(d.e1), float(d.e2),
                                float(d.e3)), want) < mpf("1e-58")


def test_qd_exp_vs_mpmath(rng):
    """qd_exp matches mpmath exp to ~2e-62 wherever all four result limbs
    are normal (|exp(x)| >= ~1e-260); saturates to 0/inf outside the f64
    range."""
    from ttcross_tpu.ops.qd import qd_exp

    xs = np.concatenate([rng.uniform(-500, 5, 40), rng.uniform(-3, 3, 40),
                         [0.0, -650.0, 700.0, -710.0, 710.0]])
    x = qd(xs)
    x = QD(x.e0, x.e0 * 1e-17 * rng.standard_normal(len(xs)), x.e1, x.e3)
    y = qd_exp(x)
    with workdps(90):
        for i in range(len(xs)):
            want = mpmath.exp(_to_mp(x, i))
            got = _to_mp(y, i)
            if xs[i] < -708:
                assert got == 0
            elif xs[i] > 709:
                assert float(y.e0[i]) == float("inf")
            elif xs[i] > -590:          # all four limbs normal
                assert _relerr(got, want) < mpf("5e-61"), (xs[i],)
            else:                        # subnormal-limb taper, still f64-true
                assert _relerr(got, want) < mpf("1e-15"), (xs[i],)


def test_qd_from_string_roundtrip():
    with workdps(90):
        s = "3.14159265358979323846264338327950288419716939937510582097494"
        limbs = qd_from_string(s)
        got = qd_to_mp(*limbs)
        assert _relerr(got, mpf(s)) < mpf("1e-63")
        assert _relerr(got, mp.pi) < mpf("5e-60")  # string itself is 60-digit


def test_qd_gather_tt_matches_mp(rng):
    """Chain-evaluating an f64 TT in qd matches the exact product of the
    stored cores computed in mpmath."""
    d, n, r = 4, 5, 3
    cores = [rng.standard_normal((1 if c == 0 else r, n,
                                  1 if c == d - 1 else r)) for c in range(d)]
    T = tt.from_cores(cores)
    ind = rng.integers(0, n, size=(7, d))
    got = qd_gather_tt(T, jnp.asarray(ind))
    with workdps(90):
        for b in range(7):
            v = mpmath.matrix([[mpf(1)]])
            for c in range(d):
                g = np.asarray(cores[c][:, ind[b, c], :])
                v = v * mpmath.matrix(g.tolist())
            want = v[0, 0]
            assert _relerr(_to_mp(got, b), want) < mpf("1e-58"), b


def test_qd_contract_matches_mp(rng):
    d, n, r = 3, 4, 2
    cores = [rng.standard_normal((1 if c == 0 else r, n,
                                  1 if c == d - 1 else r)) for c in range(d)]
    T = tt.from_cores(cores)
    w = rng.standard_normal((d, n))
    weights = [qd(jnp.asarray(w[c])) for c in range(d)]
    got = qd_contract(T, weights)
    with workdps(90):
        v = mpmath.matrix([[mpf(1)]])
        for c in range(d):
            m = sum(mpf(w[c][j]) * mpmath.matrix(
                np.asarray(cores[c][:, j, :]).tolist()) for j in range(n))
            v = v * m
        want = v[0, 0]
        assert _relerr(qd_to_mp(float(got.e0), float(got.e1),
                                float(got.e2), float(got.e3)),
                       want) < mpf("1e-55")
