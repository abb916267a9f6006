"""Product standard-normal integrand: exp(-sum x^2) on [-10, 10]^d.

Maps the smoke-test driver test_crs_stdnorm.f90 (integrand at lines 154-170,
truth pi^(d/2) at line 83).  The integrand does not apply weights; they live
in the rank-1 quad tensor (lines 100-107).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..ops.quadrature import lgwt, map_to_interval

__all__ = ["StdnormProblem", "make_stdnorm", "make_stdnorm_dd",
           "stdnorm_integrand_dd"]


@dataclass(frozen=True)
class StdnormProblem:
    d: int
    n: int
    nodes: np.ndarray
    quad_weights: np.ndarray
    truth: float

    def fun(self, ind):
        from ..ops.dense import table_lookup

        x = table_lookup(self.nodes, ind)     # (B, d); exact MXU one-hot lookup
        return jnp.exp(-jnp.sum(x * x, axis=1))


def make_stdnorm(d: int = 6, n: int = 65, a: float = -10.0, b: float = 10.0) -> StdnormProblem:
    if n % 2 == 0:
        n += 1
    x, w = lgwt(n)
    x, w = map_to_interval(x, w, a, b)
    return StdnormProblem(d=d, n=n, nodes=x, quad_weights=w, truth=float(np.pi) ** (d / 2))


def stdnorm_integrand_dd(ind, nodes_dd):
    """exp(-sum x^2) evaluated in DEVICE double-double arithmetic via the
    dd exponential (ops.dd.dd_exp) — the fun_dd for defect correction.
    Returns DD (B,)."""
    from ..ops.dd import DD, dd_exp, dd_mul, dd_neg, dd_sum

    ind = jnp.asarray(ind)
    x = DD(nodes_dd.hi[ind], nodes_dd.lo[ind])     # (B, d)
    s = dd_sum(dd_mul(x, x), axis=1)
    return dd_exp(dd_neg(s))


def make_stdnorm_dd(d: int = 6, n: int = 65, a: float = -10.0, b: float = 10.0):
    """stdnorm problem with dd quadrature data (__float128 GL rule):
    returns (prob_f64, fun_dd, weights_hi, weights_lo) for the
    defect-correction pipeline — the beyond-f64 tier for a transcendental
    (non-rational) integrand, exercising the device dd exp."""
    from .. import native
    from ..ops.dd import DD, dd, dd_add, dd_mul

    if n % 2 == 0:
        n += 1
    (xh, xl), (wh, wl) = native.gauss_legendre_dd(n)
    half_len = dd(0.5 * (b - a))
    mid = dd(0.5 * (b + a))
    Xn = dd_add(dd_mul(DD(jnp.asarray(xh), jnp.asarray(xl)), half_len),
                DD(jnp.broadcast_to(mid.hi, (n,)), jnp.broadcast_to(mid.lo, (n,))))
    Wn = dd_mul(DD(jnp.asarray(wh), jnp.asarray(wl)), half_len)

    prob = StdnormProblem(d=d, n=n, nodes=np.asarray(Xn.hi),
                          quad_weights=np.asarray(Wn.hi),
                          truth=float(np.pi) ** (d / 2))

    def fun_dd(ind):
        return stdnorm_integrand_dd(ind, Xn)

    weights_hi = [np.asarray(Wn.hi)] * d
    weights_lo = [np.asarray(Wn.lo)] * d
    return prob, fun_dd, weights_hi, weights_lo
