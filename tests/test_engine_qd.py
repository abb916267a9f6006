"""Quad-double cross engine tests (cross/engine_qd.py) — the vectorized
~62-digit host tier between the dd engine (~31 digits, test_engine_dd)
and the mpmath engine (120 digits, test_engine_mp)."""

import numpy as np
import pytest

import ttcross_tpu  # noqa: F401  (x64)

mpmath = pytest.importorskip("mpmath")
from mpmath import mp, mpf, workdps  # noqa: E402

from ttcross_tpu.apps.truths import ISING_C_STR  # noqa: E402
from ttcross_tpu.cross.engine_qd import QD_DPS, cross_qd  # noqa: E402
from ttcross_tpu.ops.qd import QD, qd, qd_add, qd_mul, qd_to_mp  # noqa: E402


def _rank2_fun_qd(g1, g2, d):
    """Separable-plus-separable tensor from f64 factor vectors, evaluated
    in qd (exact TT rank 2; the mp suite's _rank2_tensor twin)."""

    def fun_qd(ind):
        ind = np.asarray(ind)
        p1 = qd(np.ones(ind.shape[0]))
        p2 = qd(np.ones(ind.shape[0]))
        for c in range(d):
            p1 = qd_mul(p1, qd(g1[c][ind[:, c]]))
            p2 = qd_mul(p2, qd(g2[c][ind[:, c]]))
        return qd_add(p1, p2)

    return fun_qd


def test_qd_exact_rank_recovery(rng):
    """Rank-2 tensor recovered to ~qd precision: the quadrature value
    matches the mpmath closed form (exact f64 factors) to ~1e-55."""
    d, n = 4, 6
    g1 = [1.0 + rng.random(n) for _ in range(d)]
    g2 = [0.5 + rng.random(n) for _ in range(d)]
    fun_qd = _rank2_fun_qd(g1, g2, d)
    w = [qd(np.ones(n)) for _ in range(d)]
    res = cross_qd(fun_qd, [n] * d, max_rank=5, quad=w, seed=1)
    assert max(res.ranks) >= 2
    with workdps(80):
        s1 = s2 = mpf(1)
        for c in range(d):
            s1 *= sum(mpf(v) for v in g1[c])
            s2 *= sum(mpf(v) for v in g2[c])
        tru = s1 + s2
        got = qd_to_mp(*(np.asarray(e) for e in res.value))
        assert abs(1 - got / tru) < mpf("1e-55"), mp.nstr(abs(1 - got / tru), 5)


def test_qd_ising_c4_converges(rng):
    """C_4 n=17 rank 10: per-sweep telemetry decreasing, final err at the
    rank-10 interpolation floor (~4e-13 measured) — already past f64's
    practical floor, in under a second of host time."""
    from ttcross_tpu.apps.ising import make_ising_qd

    prob, fun_qd, wq = make_ising_qd(m=4, n=17)
    res = cross_qd(fun_qd, [prob.n] * prob.d, max_rank=10, quad=wq,
                   truth=ISING_C_STR[4])
    errs = [float(r["err"]) for r in res.history if r["err"] is not None]
    assert errs[-1] < 1e-11, errs
    assert errs[-1] < errs[0]
    assert res.ranks == (1, 10, 10, 1)
    # values are mpf-convertible QD telemetry every sweep
    assert all(r["value"] is not None for r in res.history)


def test_qd_log_domain_thresholds():
    """A tensor scaled to ~1e-30 |A| still crosses (log10-domain accept
    thresholds; a linear small_element * amax product would underflow the
    f32-pair platform's exponent range)."""
    d, n = 3, 5
    rng = np.random.default_rng(3)
    g1 = [1e-10 * (1.0 + rng.random(n)) for _ in range(d)]
    g2 = [1e-10 * (0.5 + rng.random(n)) for _ in range(d)]
    fun_qd = _rank2_fun_qd(g1, g2, d)
    w = [qd(np.ones(n)) for _ in range(d)]
    res = cross_qd(fun_qd, [n] * d, max_rank=4, quad=w, seed=5)
    with workdps(80):
        s1 = s2 = mpf(1)
        for c in range(d):
            s1 *= sum(mpf(v) for v in g1[c])
            s2 *= sum(mpf(v) for v in g2[c])
        tru = s1 + s2          # ~1e-30
        got = qd_to_mp(*(np.asarray(e) for e in res.value))
        assert abs(1 - got / tru) < mpf("1e-50")


def test_qd_stdnorm_62_digits():
    """Product standard normal through the qd engine: pi^(d/2) to >= 60
    correct digits in under a second (the engine keeps the separable
    integrand at exact rank 1, like the f64 tier; box [-12.5, 12.5] and
    n=201 put rule + truncation error at ~6e-70, below qd noise —
    measured 62.3 digits).  Exercises qd_exp end-to-end."""
    from ttcross_tpu.apps.stdnorm import make_stdnorm_qd

    prob, fun_qd, wq = make_stdnorm_qd(d=4, n=201)
    res = cross_qd(fun_qd, [prob.n] * prob.d, max_rank=4, quad=wq)
    assert res.ranks == (1, 1, 1, 1, 1)
    with workdps(80):
        tru = mpmath.pi ** mpf(2)
        got = qd_to_mp(*(np.asarray(e) for e in res.value))
        rel = abs(1 - got / tru)
        digits = float(-mp.log10(rel)) if rel != 0 else 80.0
    assert digits >= 60, digits


@pytest.mark.slow
def test_qd_ising_c4_deep():
    """C_4 n=65 rank 40: >= 42 correct digits — far past the dd engine's
    ~31-digit arithmetic limit and the qd defect pipeline's 33.7 (full
    measured envelope: 64.0 digits at rank 55, ~500 s)."""
    from ttcross_tpu.apps.ising import make_ising_qd

    prob, fun_qd, wq = make_ising_qd(m=4, n=65)
    res = cross_qd(fun_qd, [prob.n] * prob.d, max_rank=40, quad=wq,
                   truth=ISING_C_STR[4])
    with workdps(70):
        got = qd_to_mp(*(np.asarray(e) for e in res.value))
        rel = abs(1 - got / mpf(ISING_C_STR[4]))
        digits = float(-mp.log10(rel)) if rel != 0 else 70.0
    assert digits >= 42, (digits, res.ranks)
