"""dd pivot-selection engine tests (cross/engine_dd.py): the full mp-tier
cross.  C_4 at rank 32 reaches ~31 digits — the dd arithmetic limit."""

from decimal import Decimal, getcontext

import numpy as np
import pytest

import ttcross_tpu  # noqa: F401
from ttcross_tpu import native
from ttcross_tpu.apps.ising import make_ising_dd
from ttcross_tpu.apps.truths import ISING_C_STR
from ttcross_tpu.cross.engine_dd import cross_dd

pytestmark = pytest.mark.skipif(not native.available(), reason="no native toolchain")


def _digits(value, tru_str):
    getcontext().prec = 60
    got = Decimal(value[0]) + Decimal(value[1])
    rel = abs(1 - got / Decimal(tru_str))
    return float(-rel.log10()) if rel != 0 else 60.0


def test_dd_engine_c4_beyond_f64():
    """C_4 at rank 16: ~18 digits — already past the f64 ceiling."""
    prob, fun_dd, wh, wl = make_ising_dd(m=4, n=33)
    res = cross_dd(fun_dd, [prob.n] * prob.d, wh, wl, max_rank=16, pivoting=1)
    digits = _digits(res.value, ISING_C_STR[4])
    assert digits >= 16, digits


@pytest.mark.slow
def test_dd_engine_c4_full_precision():
    """C_4 at n=65 rank 32: ~31 digits (dd arithmetic limit; measured 31.1)."""
    prob, fun_dd, wh, wl = make_ising_dd(m=4, n=65)
    res = cross_dd(fun_dd, [prob.n] * prob.d, wh, wl, max_rank=32, pivoting=1)
    digits = _digits(res.value, ISING_C_STR[4])
    assert digits >= 28, digits


@pytest.mark.slow
def test_dd_engine_c6():
    prob, fun_dd, wh, wl = make_ising_dd(m=6, n=65)
    res = cross_dd(fun_dd, [prob.n] * prob.d, wh, wl, max_rank=48, pivoting=1)
    digits = _digits(res.value, ISING_C_STR[6])
    assert digits >= 17, digits


def test_dd_log_domain_thresholds_wide_range():
    """A D/E-style wide-dynamic-range integrand (values ~1e-280) crosses
    correctly: acceptance and stopping compare log10 magnitudes
    (dmrggmp.f90:50-53), so no threshold product underflows.  In the
    linear domain small_element * amax = 1e-30 * 1e-280 flushes to 0 and
    the quiet test accuracy * amax = 0 never fires."""
    from decimal import Decimal, localcontext

    from ttcross_tpu.ops.dd import DD

    prob, fun_dd, wh, wl = make_ising_dd(m=4, n=33)
    s = 2.0 ** -930                       # ~1.12e-280, exact in binary64

    def fun_scaled(ind):
        v = fun_dd(ind)
        return DD(v.hi * s, v.lo * s)     # exact power-of-2 scaling

    res = cross_dd(fun_scaled, [prob.n] * prob.d, wh, wl, max_rank=16,
                   pivoting=1, accuracy=1e-8)
    assert res.sweeps < 15                # the quiet-strike stop FIRED
    with localcontext() as ctx:
        ctx.prec = 60
        got = Decimal(res.value[0]) + Decimal(res.value[1])
        tru = Decimal(ISING_C_STR[4]) * (Decimal(2) ** -930)
        rel = abs(1 - got / tru)
        digits = float(-rel.log10()) if rel != 0 else 60.0
    assert digits >= 9, digits


def test_dd_per_sweep_value_matches_final(capsys):
    """The in-loop dd value (mptt_dmrgg's per-iteration line,
    dmrggmp.f90:655-672) must converge to the finalized train's quadrature
    value."""
    prob, fun_dd, wh, wl = make_ising_dd(m=4, n=17)
    res = cross_dd(fun_dd, [prob.n] * prob.d, wh, wl, max_rank=8,
                   pivoting=1, verbose=True, truth=ISING_C_STR[4])
    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if "err" in ln and "val" in ln]
    assert len(lines) >= 5           # one line per sweep
    last_val = float(lines[-1].split("val")[-1])
    assert abs(last_val - (res.value[0] + res.value[1])) < 1e-12
