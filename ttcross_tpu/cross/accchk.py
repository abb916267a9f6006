"""Randomized statistical accuracy verification of a cross result.

Maps dtt_accchk (dmrgg.f90:1081-1166): sample nlot random multi-indices,
compare the black-box fun against the TT interpolant, and report inf /
Frobenius error norms plus the worst index.  One batched gather instead of
the reference's per-sample matmul chain; on a mesh the sampling shards by
splitting nlot over the devices (the reference divides nlot over MPI ranks
the same way, dmrgg.f90:1092-1096) with psum/all_gather reductions in ONE
shard_map'd call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..tt import TT, gather

__all__ = ["accchk"]


def _stats(tt_cores, fun, ind):
    t = TT(tuple(tt_cores))
    aval = fun(ind)
    bval = gather(t, ind)
    err = jnp.abs(aval - bval)
    worst = jnp.argmax(err)
    return (jnp.max(err), jnp.sum(err**2), jnp.max(jnp.abs(aval)),
            jnp.sum(aval**2), worst, err[worst])


def accchk(tt: TT, fun, nlot: int = 2**16, key=0, mesh: Mesh | None = None):
    """Returns dict(einf, efro, ainf, afro, worst_index).

    mesh: optional 1-D device mesh — the nlot samples are split evenly over
    the devices (each evaluates fun + the interpolant on its shard; the
    norms come back through psum/pmax-style reductions).  Statistically
    identical to the single-device run; the draw itself differs only in
    sample order.
    """
    if isinstance(key, int):
        key = jax.random.PRNGKey(key)
    if mesh is not None:
        ndev = int(np.prod(list(mesh.shape.values())))
        nlot = -(-nlot // ndev) * ndev  # pad up to a multiple of ndev
    keys = jax.random.split(key, tt.d)
    cols = [jax.random.randint(keys[c], (nlot,), 0, tt.n[c]) for c in range(tt.d)]
    ind = jnp.stack(cols, axis=1).astype(jnp.int32)

    if mesh is None:
        einf, e2, ainf, a2, worst, _ = _stats(tt.cores, fun, ind)
        worst_ind = ind[worst]
    else:
        axis = list(mesh.shape.keys())[0]

        def shard(cores, ind):
            einf, e2, ainf, a2, w, werr = _stats(cores, fun, ind)
            # global reductions: einf/ainf as max, e2/a2 as sum; the worst
            # sample rides an all_gather of (err, local index row)
            e2 = jax.lax.psum(e2, axis)
            a2 = jax.lax.psum(a2, axis)
            einf_g = jax.lax.pmax(einf, axis)
            ainf_g = jax.lax.pmax(ainf, axis)
            cand = jax.lax.all_gather(
                jnp.concatenate([werr[None], ind[w].astype(werr.dtype)]), axis)
            best = cand[jnp.argmax(cand[:, 0])]
            return einf_g, e2, ainf_g, a2, best[1:]

        mapped = jax.shard_map(
            shard, mesh=mesh,
            in_specs=(P(), P(axis)), out_specs=(P(), P(), P(), P(), P()),
            check_vma=False)
        einf, e2, ainf, a2, worst_ind = mapped(tt.cores, ind)

    return {
        "einf": float(einf),
        "efro": float(jnp.sqrt(e2)),
        "ainf": float(ainf),
        "afro": float(jnp.sqrt(a2)),
        "worst_index": tuple(int(x) for x in np.asarray(worst_ind)),
    }
