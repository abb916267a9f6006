"""Distributed alternating-maxvol refinement over the 1-D bond mesh.

Extends the pivot-REPLACEMENT engine (cross/maxvol.py) to the same
dimension-parallel model as the greedy distributed cross
(parallel/engine.py; the reference's mpirun path, dmrgg.f90:120-131):
each device owns a contiguous slab of bonds and runs the sequential
maxvol bond visits over its own slab, then the per-bond index tables are
merged with ONE psum of disjointly-owned rows.

Within a slab the iteration is Gauss-Seidel (each visit sees the row set
the previous bond just selected, exactly like the single-device sweep);
across slab boundaries it is block-Jacobi — the first bond of a slab
reads the neighbouring slab's table from the previous merge.  Each
exchange step still monotonically grows its own bond's cross volume, so
the stationary points are the same (1+tol)-dominant crosses as the
sequential iteration; slab staleness only changes the path, and one or
two extra sweeps recover any loss (asserted by the parity test).

Per half-sweep traffic: one psum of the (d-1, R, d) int table (+ the two
eval counters); the interpolation cores are merged once at the end with
an owner-masked psum, like the greedy engine's authoritative gather.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..cross.maxvol import (MaxvolKit, _get_refine_engine,
                            _prepare_refine_sets)
from .mesh import BOND_AXIS, bond_mesh, share

__all__ = ["maxvol_refine_parallel"]

_PMV_CACHE: dict = {}
_PMV_PINS: list = []


def _make_parallel_refine(fun: Callable, n: tuple, R: int, n_exchange: int,
                          tol: float, mesh: Mesh, mybonds=None):
    kit: MaxvolKit = _get_refine_engine(fun, n, R, n_exchange, tol)
    d = len(n)
    N = max(n)
    nb = d - 1
    ndev = mesh.devices.size
    if mybonds is None:
        own = share(nb, ndev)
    else:
        own = np.asarray(mybonds, dtype=np.int32)
        if (own.shape != (ndev + 1,) or own[0] != 0 or own[-1] != nb
                or np.any(np.diff(own) < 1)):
            raise ValueError(
                f"mybonds must be {ndev + 1} increasing slab boundaries "
                f"from 0 to {nb}, got {own.tolist()}")
    own_lo_tbl = jnp.asarray(own[:-1], jnp.int32)
    own_hi_tbl = jnp.asarray(own[1:], jnp.int32)
    max_cnt = int(np.max(own[1:] - own[:-1]))
    bonds = jnp.arange(nb)
    c_idx = jnp.arange(d)

    def run_body(LI, RJ, rr, n_sweeps):
        me = jax.lax.axis_index(BOND_AXIS)
        own_lo = own_lo_tbl[me]
        own_hi = own_hi_tbl[me]
        ownm = (bonds >= own_lo) & (bonds < own_hi)        # (nb,)
        neval = jnp.zeros((), jnp.int64)
        padded = jnp.zeros((), jnp.int64)
        cores = jnp.zeros((d, R, N, R))

        def merge_table(T):
            """Replicate a (nb, R, d) table whose rows are disjointly
            owned: one psum of the owner-masked rows."""
            return jax.lax.psum(
                jnp.where(ownm[:, None, None], T, 0), BOND_AXIS)

        def one_sweep(s, carry):
            LI, RJ, neval, padded = carry

            def lr_body(u, c):
                # int64 bond id: the visit kernels build dynamic_update
                # slice index tuples with weak python ints (int64 on x64)
                b = jnp.minimum(own_lo + u, nb - 1).astype(jnp.int_)
                live = own_lo + u < own_hi

                # dead lanes (uneven slabs) SKIP the visit: the kernel has
                # no collectives, and an unconditional call would pay its
                # full fiber-cross integrand batch just to discard it
                def do(c):
                    LI, neval, padded = c
                    LI2, _, nev2, pad2 = kit.visit_lr(b, LI, RJ, rr,
                                                      neval, padded)
                    return LI2, nev2, pad2

                return jax.lax.cond(live, do, lambda c: c, c)

            LI, neval, padded = jax.lax.fori_loop(
                0, max_cnt, lr_body, (LI, neval, padded))
            LI = merge_table(LI)

            def rl_body(u, c):
                b = jnp.maximum(own_hi - 1 - u, 0).astype(jnp.int_)
                live = own_hi - 1 - u >= own_lo

                def do(c):
                    RJ, neval, padded = c
                    RJ2, _, nev2, pad2 = kit.visit_rl(b, LI, RJ, rr,
                                                      neval, padded)
                    return RJ2, nev2, pad2

                return jax.lax.cond(live, do, lambda c: c, c)

            RJ, neval, padded = jax.lax.fori_loop(
                0, max_cnt, rl_body, (RJ, neval, padded))
            RJ = merge_table(RJ)
            return LI, RJ, neval, padded

        LI, RJ, neval, padded = jax.lax.fori_loop(
            0, n_sweeps, one_sweep, (LI, RJ, neval, padded))

        # Final core-emission pass over the FROZEN merged tables.  The
        # free cores visit_rl emits are inconsistent across slab
        # boundaries (a boundary bond read the neighbour's previous
        # column set), so each device re-evaluates its own bonds' cores
        # from the final tables — the CUR-chain identity is exact for
        # any frozen sets (cross/maxvol.py emit_core).
        def core_body(u, c):
            b = jnp.minimum(own_lo + u, nb - 1).astype(jnp.int_)
            live = own_lo + u < own_hi

            def do(c):
                cores, neval, padded = c
                core, nev2, pad2 = kit.emit_core(b, LI, RJ, rr, neval,
                                                 padded)
                cores = jax.lax.dynamic_update_slice(
                    cores, core[None], (b + 1, 0, 0, 0))
                return cores, nev2, pad2

            return jax.lax.cond(live, do, lambda c: c, c)

        cores, neval, padded = jax.lax.fori_loop(
            0, max_cnt, core_body, (cores, neval, padded))

        # core 0 = A(grid_0, J_0): J_0 is replicated after the merge, so
        # every device evaluates it identically; count it once (owner of
        # bond 0), like the greedy engine's corner accounting.
        firstc, nev2, pad2 = kit.first_core(RJ, rr, neval, padded)
        first_owner = me == 0
        neval = jnp.where(first_owner, nev2, neval)
        padded = jnp.where(first_owner, pad2, padded)
        cores = jax.lax.dynamic_update_slice(
            cores, firstc[None, :, :][None], (0, 0, 0, 0))

        # owner-masked gather: device s is authoritative for cores b+1 of
        # its bonds; core 0 comes from the bond-0 owner.
        auth = ((c_idx - 1 >= own_lo) & (c_idx - 1 < own_hi)) | \
               ((c_idx == 0) & first_owner)
        cores = jax.lax.psum(
            jnp.where(auth[:, None, None, None], cores, 0.0), BOND_AXIS)
        neval = jax.lax.psum(neval, BOND_AXIS)
        padded = jax.lax.psum(padded, BOND_AXIS)
        return cores, LI, RJ, neval, padded

    mapped = jax.shard_map(
        run_body, mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def _get_parallel_refine(fun, n, R, n_exchange, tol, mesh, mybonds):
    target = getattr(fun, "__self__", fun)
    mb = None if mybonds is None else tuple(int(x) for x in mybonds)
    ck = (id(target), getattr(fun, "__name__", None), n, R, n_exchange,
          tol, id(mesh), mb)
    eng = _PMV_CACHE.get(ck)
    if eng is None:
        _PMV_PINS.append((target, mesh))
        eng = _PMV_CACHE[ck] = _make_parallel_refine(
            fun, n, R, n_exchange, tol, mesh, mybonds)
    return eng


def maxvol_refine_parallel(fun, n: Sequence[int], ranks=None,
                           init_sets=None, sweeps: int = 2, quad=None,
                           truth=None, key=0, n_exchange: int = 8,
                           tol: float = 1.01, max_rank: int | None = None,
                           mesh: Mesh | None = None, mybonds=None):
    """Distributed maxvol_refine: same contract as
    cross.maxvol.maxvol_refine plus a bond mesh (and optional custom slab
    boundaries, the reference's mybonds argument).  On one device it is
    exactly the sequential iteration; on ndev devices each half-sweep
    costs ceil((d-1)/ndev) bond visits of wall time."""
    from ..cross.engine import CrossResult
    from ..tt.types import TT

    n = tuple(int(x) for x in n)
    d = len(n)
    if d < 2:
        raise ValueError("maxvol_refine_parallel requires d >= 2")
    if sweeps < 1:
        raise ValueError("sweeps must be >= 1")
    if mesh is None:
        mesh = bond_mesh()
    t0 = time.perf_counter()

    LI, RJ, rr, R = _prepare_refine_sets(init_sets, ranks, n, d, max_rank,
                                         key)

    run = _get_parallel_refine(fun, n, R, n_exchange, tol, mesh, mybonds)
    cores, _, _, neval, padded = run(
        jnp.asarray(LI), jnp.asarray(RJ), jnp.asarray(rr),
        jnp.asarray(int(sweeps), jnp.int32))
    rk = np.concatenate([[1], np.asarray(rr), [1]])
    tt = TT(tuple(cores[c, : rk[c], : n[c], : rk[c + 1]] for c in range(d)))

    values, errors = [], []
    if quad is not None:
        from ..tt.ops import contract

        val = float(contract(tt, list(quad)))
        values.append(val)
        if truth is not None:
            errors.append(abs(1.0 - val / truth))
    return CrossResult(
        tt=tt, neval=int(neval), sweeps=int(sweeps),
        ranks=tuple(int(x) for x in rk), values=values, errors=errors,
        time=time.perf_counter() - t0, converged=True,
        history=None, padded_evals=int(padded),
    )
