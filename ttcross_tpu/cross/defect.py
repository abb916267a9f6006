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

from .. import native
from ..ops.dd import DD, dd_gather_tt, dd_sub, dd_to_float
from .engine import cross

__all__ = ["cross_defect_corrected"]


class _Defect:
    """Residual integrand g = A_dd - sum of previous trains, evaluated in
    device dd arithmetic and returned as f64 (pinned callable so the engine
    cache keys it stably)."""

    def __init__(self, fun_dd, trains):
        self.fun_dd = fun_dd
        self.trains = tuple(trains)

    def __call__(self, ind):
        acc = self.fun_dd(ind)
        for t in self.trains:
            acc = dd_sub(acc, dd_gather_tt(t, ind))
        return dd_to_float(acc)


def cross_defect_corrected(
    fun, fun_dd, n, weights_hi, weights_lo,
    max_rank: int = 24, max_rank2: int | None = None,
    levels: int = 2,
    accuracy: float = 1e-13, pivoting: int = 1, key: int = 0,
    verbose: bool = False, mesh=None,
):
    """Multi-level defect-corrected cross quadrature.

    fun: f64 batched integrand (first cross).  fun_dd: the same integrand
    in device dd arithmetic (ind -> DD).  weights_*: per-mode dd
    quadrature weights.  levels: number of crosses (2 = classic defect
    correction; 3 adds a second correction over A - TT1 - TT2, limited
    by the ~1e-31 absolute noise of dd evaluation).
    mesh: optional 1-D bond mesh — every level's cross then runs on the
    distributed engine (the reference's mp tier is MPI-parallel,
    dmrggmp.f90:518-629; this is its defect-corrected analogue).
    Returns (hi, lo, info)."""
    n = [int(x) for x in n]
    max_rank2 = max_rank2 or max_rank

    trains = []
    nevals, ranks = [], []
    k = key
    for lvl in range(levels):
        if lvl == 0:
            f = fun
            r = max_rank
        else:
            f = _Defect(fun_dd, trains)
            r = max_rank2
        if mesh is not None:
            from ..parallel import cross_parallel

            res = cross_parallel(f, n, max_rank=r, accuracy=accuracy,
                                 pivoting=pivoting, key=k, mesh=mesh,
                                 verbose=verbose)
        else:
            res = cross(f, n, max_rank=r, accuracy=accuracy,
                        pivoting=pivoting, key=k, verbose=verbose)
        trains.append(res.tt)
        nevals.append(res.neval)
        ranks.append(res.ranks)
        k = k + 1 if isinstance(k, int) else k

    from decimal import Decimal, localcontext

    with localcontext() as ctx:
        ctx.prec = 50
        qs = []
        total = Decimal(0)
        for t in trains:
            h, l = native.contract_q(t, weights_hi, weights_lo)
            qs.append((h, l))
            total += Decimal(h) + Decimal(l)
        hi = float(total)
        lo = float(total - Decimal(hi))
    info = {
        "neval1": nevals[0], "neval2": sum(nevals[1:]),
        "nevals": nevals, "ranks": ranks,
        "ranks1": ranks[0], "ranks2": ranks[-1],
        "q1": qs[0], "q2": qs[-1], "qs": qs,
    }
    return hi, lo, info
