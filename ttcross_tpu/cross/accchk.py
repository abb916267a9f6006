"""Randomized statistical accuracy verification of a cross result.

Maps dtt_accchk (dmrgg.f90:1081-1166): sample nlot random multi-indices,
compare the black-box fun against the TT interpolant, and report inf /
Frobenius error norms plus the worst index.  One batched gather instead of
the reference's per-sample matmul chain; on a mesh the sampling shards
trivially by splitting nlot (the reference divides nlot over MPI ranks).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..tt import TT, gather

__all__ = ["accchk"]


def accchk(tt: TT, fun, nlot: int = 2**16, key=0):
    """Returns dict(einf, efro, ainf, afro, worst_index)."""
    if isinstance(key, int):
        key = jax.random.PRNGKey(key)
    keys = jax.random.split(key, tt.d)
    cols = [jax.random.randint(keys[c], (nlot,), 0, tt.n[c]) for c in range(tt.d)]
    ind = jnp.stack(cols, axis=1).astype(jnp.int32)
    aval = fun(ind)
    bval = gather(tt, ind)
    err = jnp.abs(aval - bval)
    worst = int(jnp.argmax(err))
    return {
        "einf": float(jnp.max(err)),
        "efro": float(jnp.sqrt(jnp.sum(err**2))),
        "ainf": float(jnp.max(jnp.abs(aval))),
        "afro": float(jnp.sqrt(jnp.sum(aval**2))),
        "worst_index": tuple(int(x) for x in np.asarray(ind[worst])),
    }
