"""Native C++ component tests (quad-precision GL rules, quad contraction,
binary IO).  Skipped if the g++ toolchain is unavailable."""

from fractions import Fraction

import numpy as np
import pytest

import ttcross_tpu.tt as tt
from ttcross_tpu import native

pytestmark = pytest.mark.skipif(not native.available(), reason="no native toolchain")


def test_gauss_legendre_dd_beats_f64():
    (xh, xl), (wh, wl) = native.gauss_legendre_dd(9)
    # weights sum to exactly 2 at dd precision
    total = sum(Fraction(h) + Fraction(l) for h, l in zip(wh, wl))
    assert abs(float(total - 2)) < 1e-30
    # hi parts agree with the f64 generator
    from ttcross_tpu.ops.quadrature import lgwt

    x, w = lgwt(9)
    np.testing.assert_allclose(xh, x, atol=1e-15)
    # lo parts are genuine sub-ulp corrections
    assert 0 < np.abs(xl).max() < 1e-15


def test_gl_dd_integrates_high_degree():
    # degree-15 monomial with an 8-point rule: exact to dd precision
    (xh, xl), (wh, wl) = native.gauss_legendre_dd(8)
    acc = Fraction(0)
    for i in range(8):
        x = Fraction(xh[i]) + Fraction(xl[i])
        w = Fraction(wh[i]) + Fraction(wl[i])
        acc += w * x**14
    assert abs(float(acc - Fraction(2, 15))) < 1e-29


def test_contract_q_matches_fraction(rng):
    cores = [np.round(rng.standard_normal((r1, 4, r2)) * 8) / 8 for (r1, r2) in
             [(1, 2), (2, 2), (2, 1)]]
    T = tt.from_cores(cores)
    w = [np.array([1.0, 1e-14, -1.0, 2e-14])] * 3
    hi, lo = native.contract_q(T, w)
    # exact rational reference
    v = [Fraction(1)]
    for c in range(3):
        m = [[sum(Fraction(float(cores[c][i, k, j])) * Fraction(float(w[c][k]))
                  for k in range(4)) for j in range(cores[c].shape[2])]
             for i in range(cores[c].shape[0])]
        v = [sum(v[i] * m[i][j] for i in range(len(v))) for j in range(len(m[0]))]
    err = abs(float(Fraction(hi) + Fraction(lo) - v[0]))
    assert err < 1e-28


def test_native_io_roundtrip(rng, tmp_path):
    cores = [rng.standard_normal((r1, n, r2)) for (r1, n, r2) in
             [(1, 4, 3), (3, 5, 2), (2, 3, 1)]]
    T = tt.from_cores(cores)
    p = str(tmp_path / "t.ttn")
    native.tt_write_native(T, p)
    T2 = native.tt_read_native(p)
    assert T2.n == T.n and T2.r == T.r
    np.testing.assert_array_equal(np.asarray(tt.full(T2)), np.asarray(tt.full(T)))


def test_native_io_complex_roundtrip(rng, tmp_path):
    cores = [rng.standard_normal((1, 3, 2)) + 1j * rng.standard_normal((1, 3, 2)),
             rng.standard_normal((2, 3, 1)) + 1j * rng.standard_normal((2, 3, 1))]
    T = tt.from_cores(cores)
    p = str(tmp_path / "t.ttn")
    native.tt_write_native(T, p)
    T2 = native.tt_read_native(p)
    np.testing.assert_array_equal(np.asarray(tt.full(T2)), np.asarray(tt.full(T)))


def test_native_io_rejects_garbage(tmp_path):
    p = tmp_path / "bad.ttn"
    p.write_bytes(b"JUNKJUNKJUNK" + b"\0" * 64)
    with pytest.raises(ValueError):
        native.tt_read_native(str(p))


def test_chf_cross_language(rng):
    """JAX CHF vs the independent C++ long-double CHF (test_chf_equal
    parity)."""
    from ttcross_tpu.apps import gaussian_chf

    d = 4
    mu = rng.standard_normal(d)
    A = rng.standard_normal((d, d))
    sigma = A @ A.T / d
    omega = rng.standard_normal((81, d))
    ours = np.asarray(gaussian_chf(omega, mu, sigma))
    cpp = native.gaussian_chf_native(omega, mu, sigma)
    np.testing.assert_allclose(ours, cpp, atol=1e-14)
