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

__all__ = ["StdnormProblem", "make_stdnorm"]


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
