"""Defect-corrected high-precision cross integration.

The TPU-first answer to the reference's multiprecision CROSS (mptt_dmrgg,
dmrggmp.f90): instead of running the whole greedy engine in software
arbitrary precision, exploit that pivot SELECTION only ever needs the
resolution of the current residual scale:

  1. cross the integrand A in the fast f64 engine         -> TT1 (err ~1e-14 |A|)
  2. cross the DEFECT g = A_dd - TT1, where A is evaluated in device
     double-double arithmetic and TT1 is chain-evaluated in dd
     (ops/dd.dd_gather_tt); g fits f64 with full precision because it is
     ~1e-14 |A| in magnitude                              -> TT2 (err ~1e-14 |g| ~ 1e-28 |A|)
  3. total = quad(TT1) + quad(TT2), both contracted against double-double
     quadrature weights in __float128 on host (native.contract_q)

Every expensive step (both crosses) runs in the ordinary f64 device engine;
dd arithmetic appears only inside the defect integrand.  The final accuracy
is limited by the quadrature rule and the second-level rank truncation —
~25-30 correct digits for the shipped integrands.

The integrand must supply a device-dd evaluation fun_dd(ind) -> DD.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .. import native
from ..ops.dd import DD, dd_gather_tt, dd_sub, dd_to_float
from .engine import cross

__all__ = ["cross_defect_corrected"]


def cross_defect_corrected(
    fun, fun_dd, n, weights_hi, weights_lo,
    max_rank: int = 24, max_rank2: int | None = None,
    accuracy: float = 1e-13, pivoting: int = 1, key: int = 0,
    verbose: bool = False,
):
    """Two-level defect-corrected cross quadrature.

    fun: f64 batched integrand (first cross).  fun_dd: the same integrand
    in device dd arithmetic (ind -> DD).  weights_*: per-mode dd
    quadrature weights.  Returns (hi, lo, info)."""
    n = [int(x) for x in n]
    d = len(n)
    max_rank2 = max_rank2 or max_rank

    res1 = cross(fun, n, max_rank=max_rank, accuracy=accuracy,
                 pivoting=pivoting, key=key, verbose=verbose)
    tt1 = res1.tt

    class _Defect:
        """Pinned callable so the engine cache keys it stably."""

        def __init__(self, tt1):
            self.tt1 = tt1

        def __call__(self, ind):
            f = fun_dd(ind)
            t = dd_gather_tt(self.tt1, ind)
            return dd_to_float(dd_sub(f, t))

    g = _Defect(tt1)
    res2 = cross(g, n, max_rank=max_rank2, accuracy=accuracy,
                 pivoting=pivoting, key=key + 1 if isinstance(key, int) else key,
                 verbose=verbose)
    tt2 = res2.tt

    h1, l1 = native.contract_q(tt1, weights_hi, weights_lo)
    h2, l2 = native.contract_q(tt2, weights_hi, weights_lo)
    # dd addition of the two (hi, lo) results on host
    from decimal import Decimal, getcontext

    getcontext().prec = 50
    total = Decimal(h1) + Decimal(l1) + Decimal(h2) + Decimal(l2)
    hi = float(total)
    lo = float(total - Decimal(hi))
    info = {
        "neval1": res1.neval, "neval2": res2.neval,
        "ranks1": res1.ranks, "ranks2": res2.ranks,
        "defect_scale": float(np.max(np.abs(np.asarray(
            tt2.cores[0])))) if tt2.d else 0.0,
        "q1": (h1, l1), "q2": (h2, l2),
    }
    return hi, lo, info
