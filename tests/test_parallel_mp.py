"""Distributed arbitrary-precision cross (parallel/engine_mp.py): the
reference's MPI-parallel mp path (mptt_dmrgg, dmrggmp.f90:518-629)
rendered as bond-slab host worker processes."""

import numpy as np
import pytest
from mpmath import mp, mpf

import ttcross_tpu  # noqa: F401
from ttcross_tpu.cross.engine_mp import cross_mp
from ttcross_tpu.ops.mp import workdps
from ttcross_tpu.parallel.engine_mp import cross_mp_parallel


def _rank2_tensor(d, n, dps):
    with workdps(dps):
        rng = np.random.default_rng(42)
        g1 = [np.array([mpf(x) for x in rng.standard_normal(n)], dtype=object)
              for _ in range(d)]
        g2 = [np.array([mpf(x) for x in rng.standard_normal(n)], dtype=object)
              for _ in range(d)]

    def fun_mp(ind):
        ind = np.asarray(ind)
        out = np.empty(len(ind), dtype=object)
        for t in range(len(ind)):
            p1 = mpf(1)
            p2 = mpf(1)
            for c in range(d):
                p1 *= g1[c][ind[t, c]]
                p2 *= g2[c][ind[t, c]]
            out[t] = p1 + p2
        return out

    return fun_mp, g1, g2


def test_mp_parallel_single_worker_matches_serial():
    """n_workers=1 reproduces cross_mp exactly (same rng, same visit
    order, same accepts)."""
    d, n, dps = 4, 6, 50
    fun_mp, g1, g2 = _rank2_tensor(d, n, dps)
    with workdps(dps):
        w = [np.array([mpf(1)] * n, dtype=object)] * d
        ser = cross_mp(fun_mp, [n] * d, max_rank=4, pivoting=1, quad=w,
                       dps=dps, seed=5)
        par = cross_mp_parallel(fun_mp, [n] * d, max_rank=4, pivoting=1,
                                quad=w, dps=dps, seed=5, n_workers=1)
        assert par.ranks == ser.ranks
        assert par.neval == ser.neval
        assert abs(par.value - ser.value) <= abs(ser.value) * mpf(10) ** (-dps + 6)


def test_mp_parallel_two_workers_exact_rank():
    """2 workers over 3 bonds recover the rank-2 tensor to ~dps digits;
    boundary fibers and corner evaluations cross the slab edge."""
    d, n, dps = 4, 6, 50
    fun_mp, g1, g2 = _rank2_tensor(d, n, dps)
    with workdps(dps):
        w = [np.array([mpf(1)] * n, dtype=object)] * d
        s1, s2 = mpf(1), mpf(1)
        for c in range(d):
            s1 *= sum(g1[c])
            s2 *= sum(g2[c])
        tru = s1 + s2
        res = cross_mp_parallel(fun_mp, [n] * d, max_rank=4, pivoting=1,
                                quad=w, truth=tru, dps=dps, n_workers=2)
        assert max(res.ranks[1:-1]) == 2
        rel = abs(1 - res.value / tru)
        assert rel < mpf(10) ** (-dps + 8), rel
        # per-sweep distributed value telemetry (dmrggmp.f90:655-672)
        assert res.history[-1]["value"] is not None
        assert res.history[-1]["err"] is not None


def test_mp_parallel_three_workers_ragged_slabs():
    d, n, dps = 5, 5, 40
    fun_mp, g1, g2 = _rank2_tensor(d, n, dps)
    with workdps(dps):
        w = [np.array([mpf(1)] * n, dtype=object)] * d
        s1, s2 = mpf(1), mpf(1)
        for c in range(d):
            s1 *= sum(g1[c])
            s2 *= sum(g2[c])
        tru = s1 + s2
        res = cross_mp_parallel(fun_mp, [n] * d, max_rank=4, pivoting=1,
                                quad=w, truth=tru, dps=dps, n_workers=3,
                                mybonds=[0, 1, 3, 4])
        rel = abs(1 - res.value / tru)
        assert rel < mpf(10) ** (-dps + 8), rel


def test_mp_parallel_rejects_too_many_workers():
    fun_mp, _, _ = _rank2_tensor(3, 4, 30)
    with pytest.raises(ValueError, match="n_workers"):
        cross_mp_parallel(fun_mp, [4] * 3, n_workers=3)


@pytest.mark.slow
def test_mp_parallel_c4_fifty_digits_two_workers():
    """The VERDICT round-2 'missing #1' criterion: a >= 50-digit C_4
    computed on >= 2 workers, digits matching the single-process engine
    (dps-limited, not decomposition-limited)."""
    from ttcross_tpu.apps.ising import make_ising_mp
    from ttcross_tpu.apps.truths import ising_truth_mp

    dps = 80
    d, n, fun_mp, quad_w, truth = make_ising_mp("C", m=4, n=65, dps=dps)
    res = cross_mp_parallel(fun_mp, [n] * d, max_rank=52, pivoting=1,
                            quad=quad_w, truth=truth, dps=dps, n_workers=2)
    with workdps(dps):
        tru = ising_truth_mp("C", 4, dps)
        rel = abs(1 - res.value / tru)
        digits = float(-mp.log10(rel))
    assert digits >= 50.0, digits
