"""Weighted candidate sampling.

Maps rnd.f90's lottery machinery: `lottery2(npnt, m, n, wcol, wrow, points)`
draws (row, col) candidate pairs proportionally to weight vectors via
inverse-CDF binary search (rnd.f90:105-144).  Here the same draw is one
`jax.random.categorical` per axis — the CDF search is the device's sampling
primitive.  The cross engine inlines this; the standalone form is for
library users and tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["weighted_lottery"]


def weighted_lottery(key, wcol, wrow, npnt: int):
    """Draw npnt (row, col) index pairs with probabilities proportional to
    |wcol| and |wrow| (zero-weight entries are never drawn)."""
    wcol = jnp.abs(jnp.asarray(wcol))
    wrow = jnp.abs(jnp.asarray(wrow))
    k1, k2 = jax.random.split(jnp.asarray(key) if not isinstance(key, int)
                              else jax.random.PRNGKey(key))
    logit_c = jnp.where(wcol > 0, jnp.log(jnp.where(wcol > 0, wcol, 1.0)), -jnp.inf)
    logit_r = jnp.where(wrow > 0, jnp.log(jnp.where(wrow > 0, wrow, 1.0)), -jnp.inf)
    rows = jax.random.categorical(k1, logit_c, shape=(npnt,))
    cols = jax.random.categorical(k2, logit_r, shape=(npnt,))
    return jnp.stack([rows, cols], axis=1)
