"""Differentiable frozen-skeleton re-evaluation (cross/skeleton.py).

Validates the new-capability module against analytic derivatives (a
rank-2 separable family with a closed-form value and d/da), the cross's
own quadrature value at the nominal parameter, finite differences of the
skeleton value itself, vmap'd parameter sweeps, and the TT-form
interpolant.  The reference has no analogue (its `par` argument,
dmrgg.f90:18, is evaluate-only)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttcross_tpu.apps.mvn import MVN_BOX, make_mvn_density
from ttcross_tpu.cross.engine import cross
from ttcross_tpu.cross.skeleton import (extract_skeleton, skeleton_tt_fn,
                                        skeleton_value_fn)
from ttcross_tpu.ops.quadrature import lgwt, map_to_interval
from ttcross_tpu.tt.ops import contract


# --- a rank-2 parameterized family with closed forms --------------------
# f(x; a) = prod_c (x_c + a)  +  prod_c (sin(3 x_c)/2 + a^2)

D, N = 4, 17


def _grid():
    x, w = lgwt(N)
    x, w = map_to_interval(x, w, 0.0, 1.0)
    return jnp.asarray(x), jnp.asarray(w)


def _rank2_fun(nodes):
    def fun(ind, a):
        x = jnp.take(nodes, ind, axis=0)            # (B, d)
        t1 = jnp.prod(x + a, axis=1)
        t2 = jnp.prod(jnp.sin(3.0 * x) / 2.0 + a * a, axis=1)
        return t1 + t2
    return fun


def _rank2_truth(w, x, a):
    s1 = jnp.sum(w * (x + a))
    s2 = jnp.sum(w * (jnp.sin(3.0 * x) / 2.0 + a * a))
    return s1 ** D + s2 ** D


@pytest.fixture(scope="module")
def rank2_skel():
    nodes, w = _grid()
    fun = _rank2_fun(nodes)
    a0 = 0.7
    res = cross(lambda ind: fun(ind, a0), [N] * D, max_rank=6,
                accuracy=1e-12, pivoting=1, quad=[np.asarray(w)] * D,
                key=3, return_state=True)
    skel = extract_skeleton(res, [N] * D)
    return nodes, w, fun, a0, res, skel


def test_value_matches_cross_and_truth(rank2_skel):
    nodes, w, fun, a0, res, skel = rank2_skel
    vfn = skeleton_value_fn(fun, skel, weights=[w] * D)
    v = float(vfn(jnp.float64(a0)))
    assert abs(v / float(res.values[-1]) - 1.0) < 1e-11
    assert abs(v / float(_rank2_truth(w, nodes, a0)) - 1.0) < 1e-10


def test_grad_matches_analytic(rank2_skel):
    nodes, w, fun, a0, res, skel = rank2_skel
    vfn = skeleton_value_fn(fun, skel, weights=[w] * D)
    g = float(jax.grad(vfn)(jnp.float64(a0)))
    ga = float(jax.grad(lambda a: _rank2_truth(w, nodes, a))(jnp.float64(a0)))
    assert abs(g / ga - 1.0) < 1e-8


def test_value_and_grad_away_from_nominal(rank2_skel):
    # the family stays rank 2 for every a, so the frozen skeleton is
    # exact across the whole parameter range, not just at a0
    nodes, w, fun, a0, res, skel = rank2_skel
    vfn = skeleton_value_fn(fun, skel, weights=[w] * D)
    for a in (0.2, 1.3):
        v = float(vfn(jnp.float64(a)))
        assert abs(v / float(_rank2_truth(w, nodes, a)) - 1.0) < 1e-9
        g = float(jax.grad(vfn)(jnp.float64(a)))
        ga = float(jax.grad(lambda t: _rank2_truth(w, nodes, t))(jnp.float64(a)))
        assert abs(g / ga - 1.0) < 1e-7


def test_vmap_parameter_sweep(rank2_skel):
    nodes, w, fun, a0, res, skel = rank2_skel
    vfn = skeleton_value_fn(fun, skel, weights=[w] * D)
    a_batch = jnp.asarray([0.3, 0.7, 1.1])
    swept = jax.vmap(vfn)(a_batch)
    looped = jnp.stack([vfn(a) for a in a_batch])
    np.testing.assert_allclose(np.asarray(swept), np.asarray(looped),
                               rtol=1e-12)


def test_skeleton_tt_contract_agrees(rank2_skel):
    nodes, w, fun, a0, res, skel = rank2_skel
    vfn = skeleton_value_fn(fun, skel, weights=[w] * D)
    tfn = skeleton_tt_fn(fun, skel)
    tt = tfn(jnp.float64(a0))
    assert tt.ready()
    assert tt.r == skel.ranks
    v_tt = float(contract(tt, [w] * D))
    assert abs(v_tt / float(vfn(jnp.float64(a0))) - 1.0) < 1e-11


# --- MVN correlation Greek ----------------------------------------------

def _mvn_rho_fun(nodes, d, sigma=0.4, T=1.0, X0=np.log(100.0)):
    """MVN pdf with the equicorrelation rho as the TRACED parameter:
    inverse covariance and determinant in closed form so AD flows
    (cov = s2*((1-rho) I + rho 11^T), Sherman-Morrison inverse)."""
    s2 = sigma * sigma * T
    mu = jnp.full((d,), X0 - 0.5 * sigma * sigma * T)

    def fun(ind, rho):
        x = jnp.take(jnp.asarray(nodes), ind, axis=0)
        diff = x - mu
        a = s2 * (1.0 - rho)
        denom = 1.0 + (d - 1.0) * rho
        q = (jnp.sum(diff * diff, axis=1)
             - rho / denom * jnp.sum(diff, axis=1) ** 2) / a
        det = (s2 ** d) * ((1.0 - rho) ** (d - 1)) * denom
        norm = jnp.sqrt((2.0 * jnp.pi) ** d * det)
        return jnp.exp(-0.5 * q) / norm

    return fun


def test_mvn_rho_greek():
    """d(mass)/d(rho) of the equicorrelated MVN on the cumulant box:
    grad of the skeleton value vs central differences of the skeleton
    value AND a sanity re-cross at a shifted rho."""
    d, n, rho0 = 4, 33, 0.5
    a, b = MVN_BOX
    x, w = lgwt(n)
    x, w = map_to_interval(x, w, a, b)
    x, w = jnp.asarray(x), jnp.asarray(w)
    fun = _mvn_rho_fun(x, d)

    # consistency with the classic app at rho0
    dens = make_mvn_density(d, corr=rho0)
    ind = np.random.default_rng(0).integers(0, n, size=(64, d))
    ref = dens.pdf(np.asarray(x)[ind])
    np.testing.assert_allclose(np.asarray(fun(jnp.asarray(ind), rho0)),
                               np.asarray(ref), rtol=1e-10)

    res = cross(lambda i: fun(i, rho0), [n] * d, max_rank=14,
                accuracy=1e-10, pivoting=1, quad=[np.asarray(w)] * d,
                key=5, return_state=True)
    skel = extract_skeleton(res, [n] * d)
    vfn = skeleton_value_fn(fun, skel, weights=[w] * d)

    v0 = float(vfn(jnp.float64(rho0)))
    assert abs(v0 / float(res.values[-1]) - 1.0) < 1e-10

    g = float(jax.grad(vfn)(jnp.float64(rho0)))
    h = 1e-5
    fd = (float(vfn(jnp.float64(rho0 + h)))
          - float(vfn(jnp.float64(rho0 - h)))) / (2 * h)
    assert abs(g - fd) < 1e-5 * max(1.0, abs(g))

    # the frozen-skeleton Greek approximates the true sensitivity:
    # compare against a FRESH cross at rho0 + dr (loose: interpolation
    # error + pivot-path noise enter the fresh-cross difference)
    dr = 1e-3
    res2 = cross(lambda i: fun(i, rho0 + dr), [n] * d, max_rank=14,
                 accuracy=1e-10, pivoting=1, quad=[np.asarray(w)] * d, key=5)
    fd_cross = (float(res2.values[-1]) - v0) / dr
    assert abs(g - fd_cross) < 2e-2 * max(1.0, abs(g), abs(fd_cross))


def test_pytree_params_vector_greek():
    """params as a pytree: gradient w.r.t. the whole mean VECTOR of the
    MVN mass (a d-component Greek in one jax.grad), each component
    checked against central differences."""
    d, n = 3, 21
    a, b = MVN_BOX
    x, w = lgwt(n)
    x, w = map_to_interval(x, w, a, b)
    x, w = jnp.asarray(x), jnp.asarray(w)
    dens = make_mvn_density(d, corr=0.5)
    inv_cov = jnp.asarray(dens.inv_cov)
    norm = float(np.sqrt((2 * np.pi) ** d * dens.det_cov))

    def fun(ind, par):
        xx = jnp.take(x, ind, axis=0)
        diff = xx - par["mu"]
        q = jnp.einsum("bi,ij,bj->b", diff, inv_cov, diff)
        return jnp.exp(-0.5 * q) / norm

    mu0 = jnp.asarray(dens.mu)
    res = cross(lambda i: fun(i, {"mu": mu0}), [n] * d, max_rank=10,
                accuracy=1e-10, pivoting=1, quad=[np.asarray(w)] * d,
                key=2, return_state=True)
    skel = extract_skeleton(res, [n] * d)
    vfn = skeleton_value_fn(fun, skel, weights=[w] * d)

    g = jax.grad(vfn)({"mu": mu0})["mu"]
    assert g.shape == (d,)
    h = 1e-6
    for c in range(d):
        e = jnp.zeros(d).at[c].set(h)
        fd = (float(vfn({"mu": mu0 + e})) - float(vfn({"mu": mu0 - e}))) / (2 * h)
        assert abs(float(g[c]) - fd) < 1e-6 * max(1.0, abs(fd))


def test_calibration_newton():
    """Inverse problem through the surrogate: recover the correlation
    that produces an observed mass by Newton iteration on the frozen-
    skeleton value — every step is one re-evaluation + one jax.grad,
    no new crosses (the reference would need a full cross per function
    AND per derivative probe)."""
    d, n, rho0 = 4, 33, 0.5
    a, b = MVN_BOX
    x, w = lgwt(n)
    x, w = map_to_interval(x, w, a, b)
    x, w = jnp.asarray(x), jnp.asarray(w)
    fun = _mvn_rho_fun(x, d)
    res = cross(lambda i: fun(i, rho0), [n] * d, max_rank=14,
                accuracy=1e-10, pivoting=1, quad=[np.asarray(w)] * d,
                key=5, return_state=True)
    skel = extract_skeleton(res, [n] * d)
    vfn = skeleton_value_fn(fun, skel, weights=[w] * d)
    gfn = jax.grad(vfn)

    rho_true = 0.62
    target = float(vfn(jnp.float64(rho_true)))
    rho = jnp.float64(0.45)
    for _ in range(30):
        r = float(vfn(rho)) - target
        if abs(r) < 1e-14:
            break
        # clamp into the valid equicorrelation range: the mass is very
        # flat at small rho, so a raw Newton step can overshoot past 1
        rho = jnp.clip(rho - r / float(gfn(rho)), 0.05, 0.74)
    assert abs(float(rho) - rho_true) < 1e-9


@pytest.mark.slow
def test_basket_density_vega():
    """Greeks of the full finance pipeline: d pdf(x) / d sigma of the
    basket-sum density (skeleton TT -> batched CHF pair chain -> COS
    reconstruction, all traced) vs central differences."""
    from ttcross_tpu.apps.chf import basket_pdf, basket_pdf_pair

    d, n, sig0 = 4, 33, 0.4
    a, b = MVN_BOX
    x, w = lgwt(n)
    x, w = map_to_interval(x, w, a, b)
    x, w = jnp.asarray(x), jnp.asarray(w)
    T, rho = 1.0, 0.5
    mu_base = np.log(100.0)

    def fun(ind, sigma):
        xx = jnp.take(x, ind, axis=0)
        s2 = sigma * sigma * T
        diff = xx - (mu_base - 0.5 * s2)
        denom = 1.0 + (d - 1.0) * rho
        q = (jnp.sum(diff * diff, axis=1)
             - rho / denom * jnp.sum(diff, axis=1) ** 2) / (s2 * (1.0 - rho))
        det = (s2 ** d) * ((1.0 - rho) ** (d - 1)) * denom
        return jnp.exp(-0.5 * q) / jnp.sqrt((2.0 * jnp.pi) ** d * det)

    res = cross(lambda i: fun(i, sig0), [n] * d, max_rank=12,
                accuracy=1e-10, pivoting=1, quad=[np.asarray(w)] * d,
                key=7, return_state=True)
    skel = extract_skeleton(res, [n] * d)
    tfn = skeleton_tt_fn(fun, skel)
    xs = jnp.asarray([80.0, 100.0, 130.0])

    def pdf_at(sigma):
        return basket_pdf_pair(tfn(sigma), np.asarray(x), np.asarray(w), xs,
                               n_terms=32)

    # the traced pair pipeline agrees with the host-complex one
    ref_pdf = np.asarray(basket_pdf(res.tt, np.asarray(x), np.asarray(w),
                                    np.asarray(xs), n_terms=32))
    np.testing.assert_allclose(np.asarray(pdf_at(jnp.float64(sig0))),
                               ref_pdf, rtol=1e-8)

    vega = jax.jacfwd(pdf_at)(jnp.float64(sig0))
    h = 1e-5
    fd = (np.asarray(pdf_at(jnp.float64(sig0 + h)))
          - np.asarray(pdf_at(jnp.float64(sig0 - h)))) / (2 * h)
    np.testing.assert_allclose(np.asarray(vega), fd, rtol=5e-4, atol=1e-9)
    assert np.max(np.abs(np.asarray(vega))) > 1e-4  # non-trivial sensitivity


def test_reevaluate_host_pipeline():
    """Host re-evaluation at a frozen skeleton + all-host rounding (the
    bench headline pipeline): numpy integrand twin agrees with the
    traced one, and the host-rebuilt rounded train reproduces the Ising
    C_4 truth to the oversample envelope."""
    from ttcross_tpu.apps import make_ising
    from ttcross_tpu.apps.ising import ising_integrand_np
    from ttcross_tpu.cross.skeleton import reevaluate_host
    from ttcross_tpu.tt.ortho import svd_round_host

    prob = make_ising("C", m=4, n=33)
    ind = np.random.default_rng(1).integers(0, prob.n, size=(128, prob.d))
    np.testing.assert_allclose(
        np.asarray(prob.fun(jnp.asarray(ind, jnp.int32))),
        ising_integrand_np(ind, prob.nodes, prob.weights, "C"), rtol=1e-13)

    res = cross(prob.fun, [prob.n] * prob.d, max_rank=14,
                accuracy=500 * 2.2e-16, pivoting=1,
                quad=[prob.quad_weights] * prob.d, truth=prob.truth,
                return_state=True)
    skel = extract_skeleton(res, [prob.n] * prob.d)
    cores = reevaluate_host(prob.fun_np, skel)
    cs = svd_round_host(cores, rmax=10)
    assert max(c.shape[0] for c in cs) <= 10
    v = np.ones((1, 1))
    for g in cs:
        v = v @ np.einsum("inj,n->ij", g, prob.quad_weights)
    digits = -np.log10(abs(1.0 - v[0, 0] / prob.truth))
    assert digits >= 11.5, digits

    # the unrounded host rebuild must match the engine's own value to
    # f64 round-off (same pivots, same data source on CPU)
    v = np.ones((1, 1))
    for g in cores:
        v = v @ np.einsum("inj,n->ij", g, prob.quad_weights)
    assert abs(v[0, 0] / res.values[-1] - 1.0) < 1e-11

    # return_pivots (the bench headline hookup) keeps the fast path and
    # yields the identical skeleton
    res_p = cross(prob.fun, [prob.n] * prob.d, max_rank=14,
                  accuracy=500 * 2.2e-16, pivoting=1,
                  quad=[prob.quad_weights] * prob.d, truth=prob.truth,
                  return_pivots=True)
    skel_p = extract_skeleton(res_p, [prob.n] * prob.d)
    np.testing.assert_array_equal(skel_p.ind_all, skel.ind_all)
    with pytest.raises(ValueError, match="return_pivots"):
        cross(prob.fun, [prob.n] * prob.d, max_rank=14, oversample=2,
              return_pivots=True)


def test_cross_host_reeval_kwarg():
    """cross(oversample=k, host_reeval=fun_np): the one-call form of the
    device-pivots/host-data pipeline — digits match the manual pipeline,
    telemetry gets the 'hr' record, counters include the re-samples."""
    from ttcross_tpu.apps import make_ising

    prob = make_ising("C", m=4, n=33)
    base = dict(max_rank=10, accuracy=500 * 2.2e-16, pivoting=1,
                quad=[prob.quad_weights] * prob.d, truth=prob.truth)
    res = cross(prob.fun, [prob.n] * prob.d, oversample=4,
                host_reeval=prob.fun_np, **base)
    assert max(res.ranks) <= 10
    assert res.history[-1].direction == "hr"
    assert -np.log10(res.errors[-1]) >= 11.5
    assert res.state is None
    # plain (no oversample) host_reeval keeps ranks, improves nothing on
    # CPU but must be value-consistent with the engine
    res2 = cross(prob.fun, [prob.n] * prob.d, host_reeval=prob.fun_np,
                 **base)
    assert abs(res2.values[-1] / res2.values[-2] - 1.0) < 1e-11
    with pytest.raises(ValueError, match="host_reeval"):
        cross(prob.fun, [prob.n] * prob.d, host_reeval=prob.fun_np,
              rank_chunks=[4, 10], **base)


def test_cross_host_reeval_auto():
    """cross(host_reeval=True) auto-derives the host twin by running the
    SAME traced integrand on the CPU x64 backend — no hand-written numpy
    integrand needed, identical result to the explicit fun_np form."""
    from ttcross_tpu.apps import make_ising
    from ttcross_tpu.cross.skeleton import derive_host_fun

    prob = make_ising("C", m=4, n=33)
    base = dict(max_rank=10, accuracy=500 * 2.2e-16, pivoting=1,
                quad=[prob.quad_weights] * prob.d, truth=prob.truth)
    res_auto = cross(prob.fun, [prob.n] * prob.d, oversample=4,
                     host_reeval=True, **base)
    res_np = cross(prob.fun, [prob.n] * prob.d, oversample=4,
                   host_reeval=prob.fun_np, **base)
    assert res_auto.history[-1].direction == "hr"
    assert -np.log10(res_auto.errors[-1]) >= 11.5
    # same pivots (same run), same host data up to reduction-order noise
    assert abs(res_auto.values[-1] / res_np.values[-1] - 1.0) < 1e-13

    # the derived twin agrees with the hand-written numpy twin pointwise
    fun_np = derive_host_fun(prob.fun)
    ind = np.random.default_rng(0).integers(
        0, prob.n, size=(128, prob.d)).astype(np.int32)
    a, b = fun_np(ind), prob.fun_np(ind)
    assert np.max(np.abs(a - b) / np.abs(b)) < 5e-15

    # host_reeval=False behaves as None (no 'hr' record)
    res_off = cross(prob.fun, [prob.n] * prob.d, host_reeval=False, **base)
    assert all(rec.direction != "hr" for rec in res_off.history)


def test_extract_requires_state():
    nodes, w = _grid()
    fun = _rank2_fun(nodes)
    res = cross(lambda ind: fun(ind, 0.7), [N] * D, max_rank=4, key=1)
    with pytest.raises(ValueError, match="return_state"):
        extract_skeleton(res, [N] * D)
