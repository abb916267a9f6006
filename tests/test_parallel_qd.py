"""Distributed quad-double cross (parallel/engine_qd.py): the ~62-digit
tier's bond-slab host-worker path — the qd sibling of test_parallel_mp
(reference model: mptt_dmrgg's MPI mode, dmrggmp.f90:518-629)."""

import numpy as np
import pytest

import ttcross_tpu  # noqa: F401  (x64)

mpmath = pytest.importorskip("mpmath")
from mpmath import mp, mpf, workdps  # noqa: E402

from ttcross_tpu.cross.engine_qd import cross_qd  # noqa: E402
from ttcross_tpu.ops.qd import qd, qd_add, qd_mul, qd_to_mp  # noqa: E402
from ttcross_tpu.parallel.engine_qd import cross_qd_parallel  # noqa: E402


def _rank2_fun_qd(g1, g2, d):
    """Separable-plus-separable tensor from f64 factor vectors evaluated
    in qd (exact TT rank 2) — fork-inheritable by worker processes."""

    def fun_qd(ind):
        ind = np.asarray(ind)
        p1 = qd(np.ones(ind.shape[0]))
        p2 = qd(np.ones(ind.shape[0]))
        for c in range(d):
            p1 = qd_mul(p1, qd(g1[c][ind[:, c]]))
            p2 = qd_mul(p2, qd(g2[c][ind[:, c]]))
        return qd_add(p1, p2)

    return fun_qd


def _truth_mp(g1, g2, d):
    s1 = s2 = mpf(1)
    for c in range(d):
        s1 *= sum(mpf(v) for v in g1[c])
        s2 *= sum(mpf(v) for v in g2[c])
    return s1 + s2


def test_qd_parallel_single_worker_matches_serial(rng):
    """n_workers=1 reproduces cross_qd exactly (same rng stream, same
    visit order, same accepts)."""
    d, n = 4, 6
    g1 = [1.0 + rng.random(n) for _ in range(d)]
    g2 = [0.5 + rng.random(n) for _ in range(d)]
    fun_qd = _rank2_fun_qd(g1, g2, d)
    w = [qd(np.ones(n)) for _ in range(d)]
    ser = cross_qd(fun_qd, [n] * d, max_rank=4, quad=w, seed=5)
    par = cross_qd_parallel(fun_qd, [n] * d, max_rank=4, quad=w, seed=5,
                            n_workers=1)
    assert par.ranks == ser.ranks
    assert par.neval == ser.neval
    with workdps(80):
        vs = qd_to_mp(*(np.asarray(e) for e in ser.value))
        vp = qd_to_mp(*(np.asarray(e) for e in par.value))
        assert abs(1 - vp / vs) < mpf("1e-55")


def test_qd_parallel_two_workers_exact_rank(rng):
    """2 workers over 3 bonds recover the rank-2 tensor to ~qd digits;
    boundary fibers and corner evaluations cross the slab edge."""
    d, n = 4, 6
    g1 = [1.0 + rng.random(n) for _ in range(d)]
    g2 = [0.5 + rng.random(n) for _ in range(d)]
    fun_qd = _rank2_fun_qd(g1, g2, d)
    w = [qd(np.ones(n)) for _ in range(d)]
    with workdps(80):
        tru = _truth_mp(g1, g2, d)
    res = cross_qd_parallel(fun_qd, [n] * d, max_rank=4, quad=w,
                            truth=tru, n_workers=2)
    assert max(res.ranks[1:-1]) == 2
    with workdps(80):
        got = qd_to_mp(*(np.asarray(e) for e in res.value))
        assert abs(1 - got / tru) < mpf("1e-50")
    # per-sweep distributed qd value telemetry (dmrggmp.f90:655-672)
    assert res.history[-1]["value"] is not None
    assert res.history[-1]["err"] is not None


def test_qd_parallel_three_workers_ragged_slabs(rng):
    d, n = 5, 5
    g1 = [1.0 + rng.random(n) for _ in range(d)]
    g2 = [0.5 + rng.random(n) for _ in range(d)]
    fun_qd = _rank2_fun_qd(g1, g2, d)
    w = [qd(np.ones(n)) for _ in range(d)]
    with workdps(80):
        tru = _truth_mp(g1, g2, d)
    res = cross_qd_parallel(fun_qd, [n] * d, max_rank=4, quad=w,
                            truth=tru, n_workers=3, mybonds=[0, 1, 3, 4])
    with workdps(80):
        got = qd_to_mp(*(np.asarray(e) for e in res.value))
        assert abs(1 - got / tru) < mpf("1e-50")


def test_qd_parallel_rejects_too_many_workers(rng):
    d, n = 3, 4
    g1 = [1.0 + rng.random(n) for _ in range(d)]
    g2 = [0.5 + rng.random(n) for _ in range(d)]
    fun_qd = _rank2_fun_qd(g1, g2, d)
    with pytest.raises(ValueError, match="n_workers"):
        cross_qd_parallel(fun_qd, [n] * d, n_workers=3)


@pytest.mark.slow
def test_qd_parallel_c4_fifty_digits_two_workers():
    """A >= 50-digit C_4 on >= 2 workers through the qd tier (the
    distributed counterpart of test_qd_ising_c4_deep; the mp tier's
    VERDICT criterion, now met at 4x the speed per digit)."""
    from ttcross_tpu.apps.ising import make_ising_qd
    from ttcross_tpu.apps.truths import ISING_C_STR

    prob, fun_qd, wq = make_ising_qd(m=4, n=65)
    res = cross_qd_parallel(fun_qd, [prob.n] * prob.d, max_rank=48,
                            quad=wq, truth=ISING_C_STR[4], n_workers=2)
    with workdps(70):
        got = qd_to_mp(*(np.asarray(e) for e in res.value))
        rel = abs(1 - got / mpf(ISING_C_STR[4]))
        digits = float(-mp.log10(rel)) if rel != 0 else 70.0
    assert digits >= 50, (digits, res.ranks)
