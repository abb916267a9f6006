"""Chain-structured integrand evaluation (cross/chain_eval.py).

The interface-state evaluators must reproduce the full integrand to
rounding order on every hunt-candidate geometry, and the chain-enabled
jacobi cross must match the plain jacobi cross on counts and accuracy
(same pivots up to rounding-order ties in the hunt)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ttcross_tpu.apps.ising import make_ising
from ttcross_tpu.cross import cross
from ttcross_tpu.cross.chain_eval import ChainEvaluator, chain_fun
from ttcross_tpu.cross.chains import (all_left_tables, all_right_tables,
                                      assemble_indices)

pytestmark = pytest.mark.smoke

ACC = 500 * 2.2e-16


@pytest.fixture(scope="module")
def prob():
    return make_ising("C", m=32, n=17)


def test_chain_fun_matches_integrand(prob):
    rng = np.random.default_rng(0)
    ind = rng.integers(0, prob.n, size=(300, prob.d)).astype(np.int32)
    ref = np.asarray(prob.fun(ind))
    got = np.asarray(chain_fun(prob.chain, prob.d)(ind))
    np.testing.assert_allclose(got, ref, rtol=1e-13)


def test_evaluators_match_assembled_fun(prob):
    d, n = prob.d, prob.n
    R, nb = 6, d - 1
    rng = np.random.default_rng(1)
    vip = rng.integers(0, n, size=(nb, R, 4)).astype(np.int32)
    vip[:, :, 0] %= R
    vip[:, :, 3] %= R
    vip = jnp.asarray(vip)
    LT = all_left_tables(vip, d)
    RT = all_right_tables(vip, d)
    ev = ChainEvaluator(prob.chain, d)
    Ls, Rs = ev.states(LT, RT)
    psw = jnp.arange(nb)
    iN = jnp.arange(n)
    B = 5
    i = jnp.asarray(rng.integers(0, R, (nb, B)).astype(np.int32))
    j = jnp.asarray(rng.integers(0, n, (nb, B)).astype(np.int32))
    k = jnp.asarray(rng.integers(0, n, (nb, B)).astype(np.int32))
    q = jnp.asarray(rng.integers(0, R, (nb, B)).astype(np.int32))
    vals = np.asarray(ev.eval_cand(Ls, Rs, psw, i, j, k, q))
    for b in (0, nb // 2, nb - 1):
        ind = assemble_indices(LT[b], RT[b], b, i[b], j[b], k[b], q[b], d)
        np.testing.assert_allclose(vals[b], np.asarray(prob.fun(ind)),
                                   rtol=1e-13)

    kk = jnp.asarray(rng.integers(0, n, (nb,)).astype(np.int32))
    qq = jnp.asarray(rng.integers(0, R, (nb,)).astype(np.int32))
    ii = jnp.asarray(rng.integers(0, R, (nb,)).astype(np.int32))
    jj = jnp.asarray(rng.integers(0, n, (nb,)).astype(np.int32))
    colv = np.asarray(ev.eval_col(Ls, Rs, psw, kk, qq, iN))
    rowv = np.asarray(ev.eval_row(Ls, Rs, psw, ii, jj, iN))
    ccv = np.asarray(ev.eval_corner_col(Ls, Rs, psw, ii, kk, qq, iN))
    crv = np.asarray(ev.eval_corner_row(Ls, Rs, psw, ii, jj, qq, iN))
    b = nb // 3
    ig, jg = jnp.repeat(jnp.arange(R), n), jnp.tile(iN, R)
    ind = assemble_indices(LT[b], RT[b], b, ig, jg, jnp.full_like(ig, kk[b]),
                           jnp.full_like(ig, qq[b]), d)
    np.testing.assert_allclose(colv[b].reshape(-1), np.asarray(prob.fun(ind)),
                               rtol=1e-13)
    kg, qg = jnp.repeat(iN, R), jnp.tile(jnp.arange(R), n)
    ind = assemble_indices(LT[b], RT[b], b, jnp.full_like(kg, ii[b]),
                           jnp.full_like(kg, jj[b]), kg, qg, d)
    np.testing.assert_allclose(rowv[b].reshape(-1), np.asarray(prob.fun(ind)),
                               rtol=1e-13)
    ind = assemble_indices(LT[b], RT[b], b, jnp.full((n,), ii[b]), iN,
                           jnp.full((n,), kk[b]), jnp.full((n,), qq[b]), d)
    np.testing.assert_allclose(ccv[b], np.asarray(prob.fun(ind)), rtol=1e-13)
    ind = assemble_indices(LT[b], RT[b], b, jnp.full((n,), ii[b]),
                           jnp.full((n,), jj[b]), iN,
                           jnp.full((n,), qq[b]), d)
    np.testing.assert_allclose(crv[b], np.asarray(prob.fun(ind)), rtol=1e-13)


def test_states_scan_matches_tables(prob):
    """interface_states_scan (operator scan, no index tables — the hot
    path) equals the table+lift+reduce route on random vip chains."""
    from ttcross_tpu.cross.chain_eval import (interface_states,
                                              interface_states_scan)

    d, n = prob.d, prob.n
    R, nb = 6, d - 1
    rng = np.random.default_rng(3)
    vip = rng.integers(0, n, size=(nb, R, 4)).astype(np.int32)
    vip[:, :, 0] %= R
    vip[:, :, 3] %= R
    vip = jnp.asarray(vip)
    LT = all_left_tables(vip, d)
    RT = all_right_tables(vip, d)
    Ls1, Rs1 = interface_states(prob.chain, LT, RT, d)
    Ls2, Rs2 = interface_states_scan(prob.chain, vip, d)
    for k in Ls1:
        np.testing.assert_allclose(np.asarray(Ls2[k]), np.asarray(Ls1[k]),
                                   rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(np.asarray(Rs2[k]), np.asarray(Rs1[k]),
                                   rtol=1e-12, atol=1e-14)


def test_packed_hs_scan_matches_tables(prob):
    """ChainEvaluator.states_from_vip (packed Hillis-Steele operator
    scan — the hot path) equals the packed table route states() on
    random vip chains."""
    d, n = prob.d, prob.n
    R, nb = 6, d - 1
    rng = np.random.default_rng(7)
    vip = rng.integers(0, n, size=(nb, R, 4)).astype(np.int32)
    vip[:, :, 0] %= R
    vip[:, :, 3] %= R
    vip = jnp.asarray(vip)
    ev = ChainEvaluator(prob.chain, d)
    Ls1, Rs1 = ev.states(all_left_tables(vip, d), all_right_tables(vip, d))
    Ls2, Rs2 = ev.states_from_vip(vip)
    np.testing.assert_allclose(np.asarray(Ls2), np.asarray(Ls1),
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(np.asarray(Rs2), np.asarray(Rs1),
                               rtol=1e-12, atol=1e-14)


def test_jacobi_chain_matches_plain():
    p = make_ising("C", m=16, n=17)
    args = dict(max_rank=6, accuracy=ACC, pivoting=1,
                quad=[p.quad_weights] * p.d, truth=p.truth,
                sweep_mode="jacobi")
    r_plain = cross(p.fun, [p.n] * p.d, **args)
    r_chain = cross(p.fun, [p.n] * p.d, chain=p.chain, **args)
    assert r_chain.neval == r_plain.neval
    assert r_chain.sweeps == r_plain.sweeps
    d_plain = -np.log10(r_plain.errors[-1])
    d_chain = -np.log10(r_chain.errors[-1])
    assert abs(d_chain - d_plain) < 0.5


def test_redblack_beats_plain_jacobi():
    """The rb two-phase sweep must close (most of) the jacobi digits gap:
    at equal rank it lands at sequential-grade accuracy (measured C_32
    r8: jacobi 8.11, sequential 9.22, rb 9.43)."""
    p = make_ising("C", m=16, n=17)
    args = dict(max_rank=6, accuracy=ACC, pivoting=1,
                quad=[p.quad_weights] * p.d, truth=p.truth)
    r_j = cross(p.fun, [p.n] * p.d, sweep_mode="jacobi", chain=p.chain,
                **args)
    r_rb = cross(p.fun, [p.n] * p.d, sweep_mode="jacobi-rb", chain=p.chain,
                 **args)
    d_j = -np.log10(r_j.errors[-1])
    d_rb = -np.log10(r_rb.errors[-1])
    assert d_rb > d_j - 0.3        # never materially worse
    assert d_rb > 5.5              # and converged (rank-6 envelope ~6)


def test_redblack_plain_fun_works():
    """rb without a chain spec (black-box integrand path)."""
    p = make_ising("C", m=8, n=17)
    r = cross(p.fun, [p.n] * p.d, max_rank=6, accuracy=ACC, pivoting=1,
              quad=[p.quad_weights] * p.d, truth=p.truth,
              sweep_mode="jacobi-rb")
    assert -np.log10(r.errors[-1]) > 5.5
