"""Large-dimension Ising runs: the chain-length scaling of the engine
(C_m for m up to 1024 is the reference's long-chain regime, SURVEY.md §5)."""

import numpy as np
import pytest

from ttcross_tpu.apps import make_ising
from ttcross_tpu.apps.ising import ising_integrand
from ttcross_tpu.cross import cross
from ttcross_tpu.ops.quadrature import lgwt


def ising_scalar_de(ind, nodes, weights, kind):
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
        v = w_ = vk = wk = 1.0
        for i in range(1, d + 1):
            vk *= x[d - i]
            wk *= x[i - 1]
            v += vk
            w_ += wk
        f /= v * w_
    for i in range(d):
        f *= weights[ind[i]]
    return f


def test_scan_path_matches_scalar(rng):
    """The O(B d) scan form of the a-term (d > 96) must match the direct
    nested-product definition."""
    d, n = 120, 9
    x, w = lgwt(n)
    nodes = (x + 1.0) / 2.0
    weights = 0.5 * w
    ind = rng.integers(0, n, size=(4, d))
    import jax.numpy as jnp

    got = np.asarray(ising_integrand(ind, jnp.asarray(nodes), jnp.asarray(weights), "E"))
    expect = np.array([ising_scalar_de(i, nodes, weights, "E") for i in ind])
    np.testing.assert_allclose(got, expect, rtol=1e-10)


@pytest.mark.slow
def test_ising_c64():
    """C_64 (d = 63): long-chain end-to-end vs Bailey's constant."""
    prob = make_ising("C", m=64, n=33)
    res = cross(prob.fun, [prob.n] * prob.d, max_rank=8, accuracy=500 * 2.2e-16,
                pivoting=1, quad=[prob.quad_weights] * prob.d, truth=prob.truth)
    digits = -np.log10(res.errors[-1])
    assert digits >= 5, (res.errors[-1], digits)


def test_geo_rescale_long_chain(rng):
    """m >= 32 switches to max weight normalization so per-entry products
    are bounded by 1 (no overflow, ever — critical on the f32-pair f64
    platform whose range ends ~3.4e38); the 1/val quad factors exactly
    undo it, so C_64 still converges to Bailey's constant."""
    import jax.numpy as jnp

    prob = make_ising("C", m=64, n=17)
    assert prob.rescale
    # scaled weights are max-normalized: every product of them is <= 1
    np.testing.assert_allclose(np.max(prob.weights), 1.0, rtol=1e-12)
    ind = rng.integers(0, prob.n, size=(16, prob.d)).astype(np.int32)
    vals = np.asarray(prob.fun(jnp.asarray(ind)))
    assert np.all(np.abs(vals) <= 2.0), np.abs(vals).max()  # bounded above
    res = cross(prob.fun, [prob.n] * prob.d, max_rank=6,
                accuracy=500 * 2.2e-16, pivoting=1,
                quad=[prob.quad_weights] * prob.d, truth=prob.truth)
    assert -np.log10(res.errors[-1]) >= 5
