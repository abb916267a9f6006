"""Double-double (compensated) arithmetic: the beyond-f64 precision tier.

TPU-native replacement for the reference's vendored MPFUN-MPFR stack
(mpfun-mpfr-v08/: mp_real with 120 decimal digits via GNU MPFR C shims,
mpfunf.f90:63, mpinterface.c) and the hand-rolled OpenMP mp BLAS
(mpblas.f90).  Arbitrary-precision software arithmetic is hostile to TPU
vector units; double-double arithmetic (~32 significant digits) covers the
reference's practical use — high-precision quadrature accumulation and TT
contraction (mptt_quad) — with every operation built from error-free
transforms (two_sum / two_prod with Dekker splitting) that vectorize on the
VPU in pure f64.

A DD value is a pair (hi, lo) with |lo| <= ulp(hi)/2; arrays of DD values
are pairs of equal-shape f64 arrays (struct-of-arrays, TPU friendly).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["DD", "dd", "two_sum", "two_prod", "dd_add", "dd_sub", "dd_mul",
           "dd_div", "dd_neg", "dd_abs", "dd_sum", "dd_dot", "dd_matvec",
           "dd_matmul", "dd_to_float", "dd_from_string", "dd_to_string",
           "dd_contract", "dd_gather_tt"]

_SPLIT = 134217729.0  # 2^27 + 1, Dekker splitting constant for binary64


class DD(NamedTuple):
    hi: jax.Array
    lo: jax.Array

    @property
    def shape(self):
        return jnp.shape(self.hi)


def dd(hi, lo=0.0) -> DD:
    hi = jnp.asarray(hi, jnp.float64)
    return DD(hi, jnp.broadcast_to(jnp.asarray(lo, jnp.float64), hi.shape))


def two_sum(a, b):
    """Error-free sum: a + b = s + e exactly (Knuth)."""
    s = a + b
    v = s - a
    e = (a - (s - v)) + (b - v)
    return s, e


def _quick_two_sum(a, b):
    """Error-free sum assuming |a| >= |b|."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    t = _SPLIT * a
    ahi = t - (t - a)
    return ahi, a - ahi


def two_prod(a, b):
    """Error-free product: a * b = p + e exactly (Dekker splitting; no FMA
    dependency, IEEE-correct f64 suffices)."""
    p = a * b
    ahi, alo = _split(a)
    bhi, blo = _split(b)
    e = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, e


def dd_add(x: DD, y: DD) -> DD:
    s, e = two_sum(x.hi, y.hi)
    e = e + x.lo + y.lo
    s, e = _quick_two_sum(s, e)
    return DD(s, e)


def dd_neg(x: DD) -> DD:
    return DD(-x.hi, -x.lo)


def dd_sub(x: DD, y: DD) -> DD:
    return dd_add(x, dd_neg(y))


def dd_abs(x: DD) -> DD:
    neg = x.hi < 0
    return DD(jnp.where(neg, -x.hi, x.hi), jnp.where(neg, -x.lo, x.lo))


def dd_mul(x: DD, y: DD) -> DD:
    p, e = two_prod(x.hi, y.hi)
    e = e + x.hi * y.lo + x.lo * y.hi
    p, e = _quick_two_sum(p, e)
    return DD(p, e)


def dd_div(x: DD, y: DD) -> DD:
    q1 = x.hi / y.hi
    r = dd_sub(x, dd_mul(dd(q1), y))
    q2 = r.hi / y.hi
    r = dd_sub(r, dd_mul(dd(q2), y))
    q3 = r.hi / y.hi
    s, e = _quick_two_sum(q1, q2)
    s, e2 = _quick_two_sum(s, e + q3)
    return DD(s, e2)


def dd_sum(x: DD, axis=None) -> DD:
    """Reduction by pairwise compensated accumulation over a flattened axis
    (replaces mpblas sum loops; sequential scan keeps full dd accuracy)."""
    hi = jnp.moveaxis(x.hi, axis, 0) if axis is not None else x.hi.reshape(-1)
    lo = jnp.moveaxis(x.lo, axis, 0) if axis is not None else x.lo.reshape(-1)

    def body(carry, t):
        return dd_add(carry, DD(t[0], t[1])), None

    init = dd(jnp.zeros(hi.shape[1:]))
    out, _ = jax.lax.scan(body, init, jnp.stack([hi, lo], axis=1))
    return out


def dd_dot(xh, xl, yh, yl) -> DD:
    """Compensated dot product of dd vectors (mpdot, mpblas.f90)."""
    prods = dd_mul(DD(xh, xl), DD(yh, yl))
    return dd_sum(prods)


def dd_matvec(Ah, Al, xh, xl) -> DD:
    """(m, n) dd matrix times dd vector (mpgemv, mpblas.f90)."""
    prods = dd_mul(DD(Ah, Al), DD(xh[None, :], xl[None, :]))
    return dd_sum(prods, axis=1)


def dd_matmul(Ah, Al, Bh, Bl) -> DD:
    """Small dd GEMM by contraction over the shared axis (mpgemm,
    mpblas.f90); shapes (m, k) x (k, n)."""
    prods = dd_mul(DD(Ah[:, :, None], Al[:, :, None]), DD(Bh[None], Bl[None]))
    return dd_sum(prods, axis=1)


def dd_to_float(x: DD):
    return x.hi + x.lo


def dd_from_string(s: str) -> tuple[float, float]:
    """Parse a decimal string into (hi, lo) on host — for the ~500-digit
    truth constants (apps/truths.py)."""
    from decimal import Decimal, getcontext

    getcontext().prec = 80
    v = Decimal(s)
    hi = float(v)
    lo = float(v - Decimal(hi))
    return hi, lo


def dd_to_string(x, digits: int = 32) -> str:
    """Render a (scalar) DD to `digits` decimal digits (mpsay analogue,
    mpfung1.f90:526)."""
    from decimal import Decimal, getcontext

    getcontext().prec = digits + 10
    v = Decimal(float(np.asarray(x.hi))) + Decimal(float(np.asarray(x.lo)))
    return f"{v:.{digits}e}"


def dd_gather_tt(t, ind) -> DD:
    """Evaluate an f64 TT at (B, d) indices with all accumulation in dd:
    the chain of matvecs runs through dd_mul/dd_sum so the result carries
    ~32 significant digits of the exact product of the stored f64 cores.
    Jittable; used by the defect-correction pipeline (cross/defect.py)."""
    import jax.numpy as jnp

    ind = jnp.asarray(ind)
    B = ind.shape[0]
    v = DD(jnp.ones((B, 1)), jnp.zeros((B, 1)))
    for c in range(t.d):
        g = jnp.take(t.cores[c], ind[:, c], axis=1)          # (r, B, r2)
        g = jnp.moveaxis(g, 1, 0)                            # (B, r, r2)
        prod = dd_mul(DD(v.hi[:, :, None], v.lo[:, :, None]),
                      DD(g, jnp.zeros_like(g)))              # (B, r, r2)
        v = dd_sum(prod, axis=1)                             # (B, r2)
    return DD(v.hi[:, 0], v.lo[:, 0])


def dd_contract(t, weights_hi, weights_lo=None) -> DD:
    """TT contraction against per-mode weights carried in dd: the
    high-precision quadrature path (mptt_quad, dmrggmp.f90:778-888).  The TT
    cores are f64 (exact when promoted to dd); all accumulation is dd."""
    d = t.d
    if weights_lo is None:
        weights_lo = [np.zeros_like(np.asarray(w)) for w in weights_hi]
    R = max(t.r)
    vh = jnp.zeros((1,), jnp.float64).at[0].set(1.0)
    vl = jnp.zeros((1,), jnp.float64)
    for c in range(d):
        g = t.cores[c]                       # (r, n, r')
        wh = jnp.asarray(weights_hi[c])
        wl = jnp.asarray(weights_lo[c])
        # m[i, j] = sum_n g[i, n, j] * w[n]  in dd
        prods = dd_mul(DD(g, jnp.zeros_like(g)),
                       DD(wh[None, :, None], wl[None, :, None]))
        m = dd_sum(prods, axis=1)            # DD (r, r')
        # v' = v @ m in dd
        prods = dd_mul(DD(vh[:, None], vl[:, None]), m)
        v = dd_sum(prods, axis=0)
        vh, vl = v.hi, v.lo
    return DD(vh[0], vl[0])
