"""Application-layer tests: integrands vs independent scalar implementations
and dense-grid integrals vs analytic truths (the reference's correct-digits
methodology, SURVEY.md §4)."""

import numpy as np
import pytest

from ttcross_tpu.apps import (
    cos_approximate,
    gaussian_chf,
    ising_truth,
    make_cos_coefficients,
    make_ising,
    make_mvn,
    make_stdnorm,
    s_vectors,
)


def ising_scalar(ind, nodes, weights, kind):
    """Independent O(d^2) scalar implementation of the Ising integrand
    following its mathematical definition (nested products u_ij and
    telescoping sums), used to cross-check the vectorized version."""
    x = nodes[ind]
    d = len(ind)
    kid = {"C": 1, "D": 2, "E": 3}[kind]
    f = 2.0
    if kid in (2, 3):
        a = 1.0
        for i in range(0, d + 1):
            u = 1.0
            for j in range(i + 1, d + 1):
                u *= x[j - 1]
                a *= ((u - 1.0) / (u + 1.0)) ** 2
        f *= a
    if kid in (1, 2):
        v = w_ = 1.0
        vk = wk = 1.0
        for i in range(1, d + 1):
            vk *= x[d - i]
            wk *= x[i - 1]
            v += vk
            w_ += wk
        f /= v * w_
    for i in range(d):
        f *= weights[ind[i]]
    return f


@pytest.mark.parametrize("kind", ["C", "D", "E"])
def test_ising_integrand_vs_scalar(rng, kind):
    prob = make_ising(kind, m=6, n=17)
    ind = rng.integers(0, prob.n, size=(20, prob.d))
    got = np.asarray(prob.fun(ind))
    expect = np.array([ising_scalar(i, prob.nodes, prob.weights, kind) for i in ind])
    np.testing.assert_allclose(got, expect, rtol=1e-13)


@pytest.mark.parametrize("kind,m,digits", [("C", 2, 10), ("C", 3, 7), ("D", 2, 7), ("E", 2, 7)])
def test_ising_dense_integral(kind, m, digits):
    """Dense contraction of the full integrand tensor vs Bailey's truths."""
    prob = make_ising(kind, m=m, n=65)
    d = prob.d
    grids = np.meshgrid(*[np.arange(prob.n)] * d, indexing="ij")
    ind = np.stack([g.ravel() for g in grids], axis=1)
    vals = np.asarray(prob.fun(ind))
    # rank-1 quad weights product
    qw = np.ones_like(vals)
    for c in range(d):
        qw *= prob.quad_weights[ind[:, c]]
    val = float((vals * qw).sum())
    tru = ising_truth(kind, m)
    got_digits = -np.log10(abs(1 - val / tru))
    assert got_digits >= digits, (val, tru, got_digits)


def test_stdnorm_dense_integral():
    prob = make_stdnorm(d=3, n=65)
    grids = np.meshgrid(*[np.arange(prob.n)] * 3, indexing="ij")
    ind = np.stack([g.ravel() for g in grids], axis=1)
    vals = np.asarray(prob.fun(ind))
    qw = np.ones_like(vals)
    for c in range(3):
        qw *= prob.quad_weights[ind[:, c]]
    val = float((vals * qw).sum())
    digits = -np.log10(abs(1 - val / prob.truth))
    assert digits >= 8, (val, prob.truth, digits)


def test_mvn_dense_mass():
    prob = make_mvn(d=2, n=65)
    grids = np.meshgrid(*[np.arange(prob.n)] * 2, indexing="ij")
    ind = np.stack([g.ravel() for g in grids], axis=1)
    vals = np.asarray(prob.fun(ind))
    qw = prob.quad_weights[ind[:, 0]] * prob.quad_weights[ind[:, 1]]
    val = float((vals * qw).sum())
    digits = -np.log10(abs(1 - val / 1.0))
    assert digits >= 8, (val, digits)


def test_s_vectors():
    s = s_vectors(4)
    assert s.shape == (8, 4)
    assert np.all(s[:, 0] == 1)
    assert np.all(np.abs(s) == 1)
    assert len({tuple(row) for row in s}) == 8


def test_gaussian_chf_vs_numpy(rng):
    d = 3
    mu = rng.standard_normal(d)
    A = rng.standard_normal((d, d))
    sigma = A @ A.T
    om = rng.standard_normal((5, d))
    got = np.asarray(gaussian_chf(om, mu, sigma))
    expect = np.exp(1j * om @ mu - 0.5 * np.einsum("bi,ij,bj->b", om, sigma, om))
    np.testing.assert_allclose(got, expect, rtol=1e-12)


def test_cos_approximate_recovers_gaussian():
    # 1-D N(5, 1): reconstruct pdf from analytic CHF values on [0, 10]
    a, b, K = 0.0, 10.0, 64
    k = np.arange(K)
    omega = k * np.pi / (b - a)
    phis = np.exp(1j * omega * 5.0 - 0.5 * omega**2)
    xs = np.linspace(1.0, 9.0, 33)
    pdf = np.asarray(cos_approximate(xs, phis, a, b))
    tru = np.exp(-0.5 * (xs - 5.0) ** 2) / np.sqrt(2 * np.pi)
    np.testing.assert_allclose(pdf, tru, atol=1e-7)  # COS truncation with K=64


def test_cos_coefficients_1d():
    # d=1: coefficient_k = 2/(b-a) Re[e^{-i a t} phi(t)], t = pi k/(b-a);
    # integrating the COS expansion against the pdf must reproduce it.
    mu, var = np.array([5.0]), np.array([[1.0]])
    cc = make_cos_coefficients(1, mu, var, 0.0, 10.0)
    ind = np.arange(32)[:, None]
    coeffs = np.asarray(cc.fun(ind))
    omega = np.pi * np.arange(32) / 10.0
    expect = 2.0 / 10.0 * np.real(np.exp(1j * omega * 5.0 - 0.5 * omega**2) * np.exp(-1j * 0.0 * omega))
    np.testing.assert_allclose(coeffs, expect, rtol=1e-10)
