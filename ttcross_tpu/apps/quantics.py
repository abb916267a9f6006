"""Quantics problem builder: 1-D/dd-D functions on virtual base^K grids.

The engine already crosses quantics tensors (a function on a 2^K grid as
a K-dimensional binary tensor) and `tt.ops.value` evaluates the train at
real coordinates with the reference's digit convention (dtt_value,
tt.f90:702-728).  This module packages the remaining boilerplate the
reference leaves to the caller: the bit packing of the integrand, the
domain mapping, the uniform product quadrature, and the relaxed
pivot-acceptance floor geometric quantics spectra need.

Digit convention (shared with tt.ops.value): coordinate `i` owns modes
[i*K, (i+1)*K); within a block the LAST mode holds the MOST significant
digit, u = sum_k ind[k] * base**(k - K) for k = 0..K-1.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["QuanticsProblem", "make_quantics", "quantics_cross"]


@dataclass
class QuanticsProblem:
    """A dd-dimensional function on the virtual (base^K)^dd grid, packed
    as a (dd*K)-dimensional base-sized tensor for the cross engine."""

    fun: Callable          # batched ind (B, dd*K) int32 -> (B,)
    f: Callable            # the underlying x-space function
    K: int                 # digits per coordinate
    dd: int                # number of real coordinates
    base: int
    domain: tuple          # (lo, hi), applied per coordinate
    d: int = field(init=False)      # total tensor dimensionality = dd*K
    n: int = field(init=False)      # mode size = base

    def __post_init__(self):
        self.d = self.dd * self.K
        self.n = self.base

    @property
    def quad_weights(self) -> list:
        """Per-mode weight vectors whose TT contraction is the Riemann sum
        (the uniform product measure): integral ~ contract(tt, w).  The
        cell volume ((hi-lo)/base^K)^dd rides the first mode of each
        coordinate block so the contraction needs no post-scaling."""
        lo, hi = self.domain
        w_plain = np.full(self.base, 1.0 / self.base)
        w_first = w_plain * (hi - lo)
        w = []
        for i in range(self.dd):
            w.append(w_first.copy())
            w.extend(w_plain.copy() for _ in range(self.K - 1))
        return w

    def grid_x(self, ind) -> jax.Array:
        """Map index rows (B, dd*K) to coordinates (B, dd) in the domain."""
        lo, hi = self.domain
        ind = jnp.asarray(ind)
        pows = jnp.asarray(
            float(self.base) ** (np.arange(self.K) - self.K))
        cols = [ind[:, i * self.K: (i + 1) * self.K].astype(jnp.float64)
                @ pows for i in range(self.dd)]
        return lo + (hi - lo) * jnp.stack(cols, axis=1)

    def value(self, t, x) -> jax.Array:
        """Evaluate a crossed train at real coordinates x (B, dd) or (dd,)
        in the domain (nearest dyadic grid point, like dtt_value)."""
        from ..tt.ops import value as tt_value

        lo, hi = self.domain
        u = (jnp.asarray(x, jnp.float64) - lo) / (hi - lo)
        return tt_value(t, u, dd=self.dd)


def make_quantics(f: Callable, K: int, dd: int = 1, base: int = 2,
                  domain: Sequence[float] = (0.0, 1.0)) -> QuanticsProblem:
    """Package f for the cross engine on a virtual base^K grid per
    coordinate.  f is batched over x: (B,) -> (B,) when dd == 1, else
    (B, dd) -> (B,)."""
    if K < 2:
        raise ValueError("K must be >= 2 (need at least one bond)")
    if dd < 1 or base < 2:
        raise ValueError("dd >= 1 and base >= 2 required")
    lo, hi = (float(domain[0]), float(domain[1]))
    if not hi > lo:
        raise ValueError(f"empty domain {domain}")

    prob_holder = []

    def fun(ind):
        x = prob_holder[0].grid_x(ind)
        return f(x[:, 0]) if dd == 1 else f(x)

    prob = QuanticsProblem(fun=fun, f=f, K=K, dd=dd, base=base,
                           domain=(lo, hi))
    prob_holder.append(prob)
    return prob


def quantics_cross(f: Callable, K: int, dd: int = 1, base: int = 2,
                   domain: Sequence[float] = (0.0, 1.0),
                   max_rank: int = 8, quad: bool = True,
                   small_pivot: float = 1e-14, **kw):
    """Cross f on the virtual grid and return (problem, CrossResult).

    Defaults encode the quantics regime: geometric bond-spectrum decay
    needs a relaxed relative pivot floor (the per-dtype default rejects
    pivots 5+ orders below amax, truncating the train early), and the
    Riemann-sum weights give per-sweep integral telemetry.

    Deep grids (K ~ 18+) with non-trivial amplitude structure can hit a
    greedy-pivot CONDITIONING plateau that no rank or hunt upgrade fixes
    (exp(x)sin(6 pi x), K=20: ~4e-7 point error at any rank/pivoting,
    growing ~4x per 2 bits; BENCH_NOTES "Quantics pivot conditioning").
    Pass refine_sweeps=1: one maxvol pivot-replacement sweep restores
    ~1e-14 for ~2x the evaluations."""
    from ..cross import cross

    prob = make_quantics(f, K, dd=dd, base=base, domain=domain)
    res = cross(prob.fun, [prob.n] * prob.d, max_rank=max_rank,
                quad=prob.quad_weights if quad else None,
                small_pivot=small_pivot, **kw)
    return prob, res
