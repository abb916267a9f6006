"""Alternating-maxvol TT-cross refinement (cross/maxvol.py): the pivot-
REPLACEMENT pass that breaks the greedy-append fixed-rank quality ceiling
(BENCH_NOTES "Pivot-quality ceiling"; the quasioptimality theory is the
2014 maxvol paper the reference cites, README.md:6-7)."""

import jax.numpy as jnp
import numpy as np
import pytest

import ttcross_tpu  # noqa: F401
import ttcross_tpu.tt as tt
from ttcross_tpu.cross.engine import cross
from ttcross_tpu.cross.maxvol import cross_maxvol, maxvol_refine, maxvol_select


def _dense_fun(dense):
    dj = jnp.asarray(dense)
    return lambda ind: dj[tuple(ind.T)]


def test_maxvol_select_matches_inverse(rng):
    """sel/B invariants: B = M inv(M[sel]), B[sel] = I, and the selection
    is (1+tol)-dominant after the exchange iterations."""
    M = rng.standard_normal((40, 4))
    sel, B = maxvol_select(jnp.asarray(M), jnp.ones(40, bool), jnp.asarray(4))
    sel, B = np.asarray(sel), np.asarray(B)
    np.testing.assert_allclose(B[sel], np.eye(4), atol=1e-12)
    np.testing.assert_allclose(B, M @ np.linalg.inv(M[sel]), atol=1e-10)
    assert np.abs(B).max() <= 1.01 + 1e-9


def test_maxvol_select_masked_strided_rows(rng):
    """Active rows may be strided (the padded fiber-cross layout)."""
    P, R = 30, 5
    mask = np.zeros(P, bool)
    mask[::3] = True
    M = np.zeros((P, R))
    M[np.ix_(mask, range(3))] = rng.standard_normal((mask.sum(), 3))
    sel, B = maxvol_select(jnp.asarray(M), jnp.asarray(mask), jnp.asarray(3))
    sel, B = np.asarray(sel), np.asarray(B)
    assert mask[sel[:3]].all()
    np.testing.assert_allclose(
        B[:, :3], np.where(mask[:, None],
                           M[:, :3] @ np.linalg.inv(M[sel[:3], :3]), 0.0),
        atol=1e-10)
    assert np.abs(B[:, 3:]).max() == 0.0


def test_exact_rank_recovery(rng):
    """Classic TT-cross from random init recovers an exact-rank tensor to
    machine precision (the interpolation formula telescopes exactly)."""
    d, n, r = 4, 8, 3
    cores = [rng.standard_normal((1 if c == 0 else r, n,
                                  1 if c == d - 1 else r)) for c in range(d)]
    dense = np.asarray(tt.full(tt.from_cores(cores)))
    res = cross_maxvol(_dense_fun(dense), [n] * d, max_rank=r, sweeps=3)
    err = np.abs(np.asarray(tt.full(res.tt)) - dense).max()
    assert err < 1e-10 * np.abs(dense).max(), err
    assert res.ranks == (1, r, r, r, 1)


def test_exact_rank_recovery_ragged_modes(rng):
    d, r = 4, 2
    ns = [5, 7, 4, 6]
    cores = [rng.standard_normal((1 if c == 0 else r, ns[c],
                                  1 if c == d - 1 else r)) for c in range(d)]
    dense = np.asarray(tt.full(tt.from_cores(cores)))
    res = cross_maxvol(_dense_fun(dense), ns, max_rank=r, sweeps=3)
    err = np.abs(np.asarray(tt.full(res.tt)) - dense).max()
    assert err < 1e-10 * np.abs(dense).max(), err


def test_maxvol_beats_greedy_ceiling():
    """MVN d=6 rank 20: the greedy envelope is 5.9-6.5 digits and even
    full pivoting caps at ~6.7; maxvol replacement clears the greedy run
    it starts from (BENCH_NOTES 'Pivot-quality ceiling')."""
    from ttcross_tpu.apps import make_mvn

    prob = make_mvn(d=6, n=65)
    quad = [prob.quad_weights] * prob.d
    g = cross(prob.fun, [prob.n] * prob.d, max_rank=20, pivoting=1,
              quad=quad, truth=prob.truth)
    mv = cross_maxvol(prob.fun, [prob.n] * prob.d, max_rank=20, sweeps=3,
                      quad=quad, truth=prob.truth)
    dg = -np.log10(g.errors[-1])
    dm = -np.log10(mv.errors[-1])
    assert dm > dg + 0.3, (dg, dm)
    assert dm >= 6.4, dm
    assert mv.ranks == g.ranks == (1, 20, 20, 20, 20, 20, 1)


def test_cross_refine_sweeps_integration():
    """cross(refine_sweeps=k) seeds the refinement with the greedy pivot
    sets; telemetry stays consistent (one 'mv' record, summed nevals)."""
    from ttcross_tpu.apps import make_mvn

    prob = make_mvn(d=4, n=33)
    quad = [prob.quad_weights] * prob.d
    g = cross(prob.fun, [prob.n] * prob.d, max_rank=10, pivoting=1,
              quad=quad, truth=prob.truth, key=3)
    r = cross(prob.fun, [prob.n] * prob.d, max_rank=10, pivoting=1,
              quad=quad, truth=prob.truth, key=3, refine_sweeps=1)
    assert r.neval > g.neval
    assert r.history[-1].direction == "mv"
    assert len(r.values) == len(r.errors) + 1  # values has the it-0 entry
    assert -np.log10(r.errors[-1]) >= -np.log10(g.errors[-1]) - 0.2
    assert r.state is None
    assert r.ranks == g.ranks


def test_refine_composes_with_oversample():
    """cross(oversample=k, refine_sweeps=j): cross at R+k, maxvol-replace
    the pivots at the inflated rank, round back to R — the quality sweet
    spot (C_6 8-key floors: greedy 12.1, oversample 13.1, composed 13.5;
    BENCH_NOTES 'Pivot-quality ceiling')."""
    from ttcross_tpu.apps import make_mvn

    prob = make_mvn(d=4, n=33)
    args = dict(quad=[prob.quad_weights] * prob.d, truth=1.0,
                accuracy=500 * 2.2e-16)
    res = cross(prob.fun, [prob.n] * prob.d, max_rank=6, oversample=2,
                refine_sweeps=1, **args)
    assert max(res.ranks) <= 6  # rounded back to the requested rank
    greedy = cross(prob.fun, [prob.n] * prob.d, max_rank=6, **args)
    # rank-6 truncation bounds this problem near 3 digits; the composed
    # pass must land there and beat plain greedy (measured 2.88 vs 2.00)
    assert -np.log10(res.errors[-1]) > 2.5
    assert res.errors[-1] < greedy.errors[-1]


@pytest.mark.slow
def test_ising_c6_oversample_headline():
    """The bench headline recipe: C_6 rank 24 with oversample=6 reaches
    >= 13.9 correct digits at <= 1.6x the greedy evaluations (measured
    14.29 at 1.49x on CPU)."""
    from ttcross_tpu.apps import make_ising

    prob = make_ising("C", m=6, n=64)
    quad = [prob.quad_weights] * prob.d
    res = cross(prob.fun, [prob.n] * prob.d, max_rank=24, pivoting=1,
                quad=quad, truth=prob.truth, oversample=6)
    digits = -np.log10(res.errors[-1])
    assert digits >= 13.5, digits
    assert res.neval <= 210000, res.neval


def test_refine_fast_path_matches_state_path():
    """refine_sweeps must NOT force the engine off the fused fast path:
    the packed output carries vip, and seeding the refinement from it
    gives the identical result to the full-state (return_state=True)
    route (same pivots -> bit-identical refined train)."""
    from ttcross_tpu.apps import make_mvn

    prob = make_mvn(d=4, n=17)
    kw = dict(max_rank=6, accuracy=5e-13, pivoting=1,
              quad=[prob.quad_weights] * prob.d, truth=prob.truth)
    fast = cross(prob.fun, [prob.n] * prob.d, refine_sweeps=2, **kw)
    slow = cross(prob.fun, [prob.n] * prob.d, refine_sweeps=2,
                 return_state=True, **kw)
    assert fast.state is None          # fast path (no state materialized)
    assert slow.state is not None
    assert fast.neval == slow.neval
    assert fast.ranks == slow.ranks
    np.testing.assert_allclose(fast.values[-1], slow.values[-1], rtol=0, atol=0)
