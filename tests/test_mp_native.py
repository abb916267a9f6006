"""Native MPFR cross engine (native/src/mpfr_cross.cpp).

The compiled >=100-digit tier: ABI selftest, accuracy against tabulated
truths, and agreement with the mpmath reference engine (cross_mp) on the
same config — different pivot paths (different RNG), same converged
value to the cross accuracy."""

import numpy as np
import pytest

from ttcross_tpu import native

pytestmark = pytest.mark.smoke

needs_mpfr = pytest.mark.skipif(not native.mpfr_available(),
                                reason="libmpfr/g++ unavailable")


@needs_mpfr
def test_abi_selftest():
    assert native._load_mpfr().mp_selftest() == 27182818


@needs_mpfr
def test_ising_c4_120_digits():
    from ttcross_tpu.cross.engine_mp_native import ising_cross_mp_native

    r = ising_cross_mp_native("C", m=4, n=33, max_rank=16, dps=120)
    assert r.digits is not None and r.digits > 18     # rank-16 envelope ~20
    assert r.neval > 5000
    assert r.ranks[1] == 16


@needs_mpfr
def test_matches_mpmath_engine():
    pytest.importorskip("mpmath")
    from mpmath import mp, workdps

    from ttcross_tpu.apps.ising import make_ising_mp
    from ttcross_tpu.cross.engine_mp import cross_mp
    from ttcross_tpu.cross.engine_mp_native import ising_cross_mp_native

    dps = 60
    d, n, fun_mp, quad_w, truth = make_ising_mp("C", m=4, n=21, dps=dps)
    r_py = cross_mp(fun_mp, [n] * d, quad=quad_w, truth=truth,
                    max_rank=10, dps=dps)
    r_nat = ising_cross_mp_native("C", m=4, n=21, max_rank=10, dps=dps)
    with workdps(dps):
        rel = abs(1 - r_nat.value / r_py.value)
        # both crosses converge to the same tensor's quadrature at the
        # rank-10 envelope (~11-13 digits); pivot paths differ by RNG
        assert rel < 1e-9, f"native vs mpmath rel diff {mp.nstr(rel, 5)}"


@needs_mpfr
def test_callback_integrand():
    pytest.importorskip("mpmath")
    from mpmath import mp, workdps

    from ttcross_tpu.apps.ising import make_ising_mp
    from ttcross_tpu.cross.engine_mp_native import cross_mp_native

    dps = 60
    d, n, fun_mp, quad_w, truth = make_ising_mp("C", m=4, n=21, dps=dps)
    r = cross_mp_native(fun_mp, [n] * d, max_rank=10, quad=quad_w,
                        truth=truth, dps=dps)
    with workdps(dps):
        digits = float(-mp.log10(abs(1 - r.value / truth)))
    assert digits > 9


@needs_mpfr
@pytest.mark.parametrize("kind", ["D", "E"])
def test_de_kinds_run(kind):
    from ttcross_tpu.cross.engine_mp_native import ising_cross_mp_native

    r = ising_cross_mp_native(kind, m=4, n=17, max_rank=8, dps=60)
    # D_4/E_4 have mpmath closed-form truths -> digits reported
    assert r.sweeps >= 3
    assert r.digits is None or r.digits > 6
