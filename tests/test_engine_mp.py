"""Arbitrary-precision cross engine tests (mptt_dmrgg analogue,
cross/engine_mp.py) — host/mpmath tier, no device work."""

import numpy as np
import pytest
from mpmath import mp, mpf, workdps

from ttcross_tpu.apps.ising import make_ising_mp
from ttcross_tpu.apps.truths import ising_truth_mp
from ttcross_tpu.cross.engine_mp import cross_mp, mp_tt_value
from ttcross_tpu.ops.mp import mp_lgwt


def test_mp_lgwt_matches_f64():
    x, w = mp_lgwt(9, 40)
    xf, wf = np.polynomial.legendre.leggauss(9)
    np.testing.assert_allclose([float(v) for v in x], xf, atol=1e-14)
    np.testing.assert_allclose([float(v) for v in w], wf, atol=1e-14)
    # integrates x^16 on [-1,1] exactly at mp precision (degree 17 rule)
    with workdps(40):
        got = sum(wi * xi**16 for xi, wi in zip(x, w))
        assert abs(got - mpf(2) / 17) < mpf(10) ** -35


def _rank2_tensor(d, n, dps):
    """Separable-plus-separable mp tensor: exact TT rank 2."""
    with workdps(dps):
        g1 = [np.array([mpf(2 + j) / (3 + c) for j in range(n)], dtype=object)
              for c in range(d)]
        g2 = [np.array([1 / mpf(1 + j + 2 * c) for j in range(n)], dtype=object)
              for c in range(d)]

    def fun_mp(ind):
        out = np.empty(ind.shape[0], dtype=object)
        for t in range(ind.shape[0]):
            p1, p2 = mpf(1), mpf(1)
            for c in range(d):
                p1 *= g1[c][ind[t, c]]
                p2 *= g2[c][ind[t, c]]
            out[t] = p1 + p2
        return out

    return fun_mp, g1, g2


def test_mp_exact_rank_recovery():
    """Rank-2 mp tensor recovered to ~dps digits; value telemetry matches
    the separable closed form."""
    d, n, dps = 4, 6, 60
    fun_mp, g1, g2 = _rank2_tensor(d, n, dps)
    with workdps(dps):
        w = [np.array([mpf(1) for _ in range(n)], dtype=object)] * d
        tru = mpf(1)
        for c in range(d):
            tru = tru  # placeholder; computed below
        s1, s2 = mpf(1), mpf(1)
        for c in range(d):
            s1 *= sum(g1[c])
            s2 *= sum(g2[c])
        tru = s1 + s2
        res = cross_mp(fun_mp, [n] * d, max_rank=4, pivoting=1, quad=w,
                       truth=tru, dps=dps)
        assert max(res.ranks[1:-1]) == 2
        rel = abs(1 - res.value / tru)
        assert rel < mpf(10) ** (-dps + 8), rel
        # per-sweep telemetry present (dmrggmp.f90:667 parity)
        assert res.history[-1]["value"] is not None
        assert res.history[-1]["err"] is not None
        # interpolation is exact at every probed entry
        rng = np.random.default_rng(0)
        ind = rng.integers(0, n, (20, d))
        vals = fun_mp(ind)
        for t in range(20):
            v = None
            for c in range(d):
                M = res.cores[c][:, ind[t, c], :]
                v = M if v is None else v @ M
            assert abs(v[0, 0] - vals[t]) < abs(vals[t]) * mpf(10) ** (-dps + 8)


def test_mp_log_domain_extreme_scale():
    """Tensor scaled by 1e-400 (beyond f64 underflow): the log-domain
    thresholds (dmrggmp.f90:50-53) keep the cross converging."""
    d, n, dps = 3, 5, 50
    fun0, g1, g2 = _rank2_tensor(d, n, dps)
    with workdps(dps):
        scale = mpf(10) ** -400

        def fun_mp(ind):
            return fun0(ind) * scale

        w = [np.array([mpf(1)] * n, dtype=object)] * d
        res = cross_mp(fun_mp, [n] * d, max_rank=4, pivoting=1, quad=w, dps=dps)
        s1, s2 = mpf(1), mpf(1)
        for c in range(d):
            s1 *= sum(g1[c])
            s2 *= sum(g2[c])
        tru = (s1 + s2) * scale
        assert res.value != 0
        assert abs(1 - res.value / tru) < mpf(10) ** (-dps + 10)


@pytest.mark.slow
def test_mp_ising_c4_fifty_digits():
    """C_4 through the mp engine beats the dd tier's ~31-digit ceiling:
    >= 50 correct digits vs Bailey's constant (VERDICT round-1 item 4)."""
    dps = 80
    d, n, fun_mp, quad_w, truth = make_ising_mp("C", m=4, n=65, dps=dps)
    res = cross_mp(fun_mp, [n] * d, max_rank=52, pivoting=1, quad=quad_w,
                   truth=truth, dps=dps)
    with workdps(dps):
        tru = ising_truth_mp("C", 4, dps)
        rel = abs(1 - res.value / tru)
        digits = float(-mp.log10(rel))
    assert digits >= 50.0, digits
