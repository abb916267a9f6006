"""Distributed double-double cross over the 1-D 'bond' device mesh.

The dd analogue of parallel/engine.py, covering the reference's
MPI-parallel multiprecision engine (mptt_dmrgg, dmrggmp.f90:11-704, whose
bond-slab distribution and boundary shipping live at dmrggmp.f90:518-629).
Each device owns a contiguous bond slab and runs the single-device dd bond
visit (cross/engine_dd.py); global consistency per sweep comes from the
same collective scheme as the f64 distributed engine:

  * psum of disjoint per-bond tapes — ints (accepted, i, j, k, q) plus the
    dd LU borders and pivot (hi and lo planes), so every device replays
    vip / rk / maintained triangular inverses exactly;
  * boundary fibers re-evaluated locally instead of shipped (the reference
    ships both directions in the mp engine, dmrggmp.f90:518-629; here each
    edge device re-evaluates the one fiber it needs);
  * gathered max reductions for amax / pivotmax.

The whole multi-sweep run (with the strike stopping rule) is ONE
shard_map'd device call; finalization and the dd quadrature reuse the
single-device paths on the replicated result.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..cross.chains import (advance_left, advance_right, all_left_tables,
                            all_right_tables, left_table, right_table)
from ..cross.engine_dd import (DD, DDConfig, DDCrossResult, DDKit, DDState,
                               _at, _at_dd, _dus, _mm_left, _mm_right,
                               dd_quad_cores, get_dd_engine)
from ..ops.dd import dd, dd_div, dd_mul, dd_neg, dd_sum
from .mesh import BOND_AXIS, bond_mesh, share

__all__ = ["cross_dd_parallel"]

_PDD_CACHE: dict = {}
_PDD_PINS: list = []


def get_parallel_dd_engine(fun_dd: Callable, cfg: DDConfig, mesh: Mesh,
                           mybonds=None):
    target = getattr(fun_dd, "__self__", fun_dd)
    mb = None if mybonds is None else tuple(int(x) for x in mybonds)
    key = (id(target), getattr(fun_dd, "__name__", None), cfg, id(mesh), mb)
    eng = _PDD_CACHE.get(key)
    if eng is None:
        _PDD_PINS.append((target, mesh))
        eng = _PDD_CACHE[key] = make_parallel_dd_engine(fun_dd, cfg, mesh, mybonds)
    return eng


def make_parallel_dd_engine(fun_dd: Callable, cfg: DDConfig, mesh: Mesh,
                            mybonds=None):
    kit: DDKit = get_dd_engine(fun_dd, cfg)
    d, N, R = cfg.d, cfg.N, cfg.R
    ndev = mesh.devices.size
    if mybonds is None:
        own = share(d - 1, ndev)
    else:
        own = np.asarray(mybonds, dtype=np.int32)
        if (own.shape != (ndev + 1,) or own[0] != 0 or own[-1] != d - 1
                or np.any(np.diff(own) < 1)):
            raise ValueError(f"bad mybonds {own.tolist()}")
    own_lo_tbl = jnp.asarray(own[:-1], jnp.int32)
    own_hi_tbl = jnp.asarray(own[1:], jnp.int32)
    max_cnt = int(np.max(own[1:] - own[:-1]))
    iR = jnp.arange(R)
    TFW = 4 * R + 2   # tape row: c hi/lo, u hi/lo, pivot hi/lo

    def local_sweep(st: DDState, it, own_lo, own_hi):
        cnt = own_hi - own_lo
        dir_fwd = (it % 2) == 1
        st = st._replace(pivotmax=jnp.full((), -jnp.inf))
        tape_i = jnp.zeros((d - 1, 5), jnp.int32)
        tape_f = jnp.zeros((d - 1, TFW), jnp.float64)
        LT = all_left_tables(st.vip, d)
        RT = all_right_tables(st.vip, d)
        first = jnp.where(dir_fwd, own_lo, own_hi - 1).astype(jnp.int32)
        tab0 = jnp.where(dir_fwd, _at(LT, first), _at(RT, first))

        def body(idx, carry):
            st, ti, tf, tab = carry
            off = jnp.where(dir_fwd, idx, cnt - 1 - idx)
            p = (own_lo + jnp.clip(off, 0, jnp.maximum(cnt - 1, 0))).astype(jnp.int32)
            valid = idx < cnt

            def do(args):
                st, ti, tf, tab = args
                ltab = jnp.where(dir_fwd, tab, _at(LT, p))
                rtab = jnp.where(dir_fwd, _at(RT, p), tab)
                st2, row_i, row_f = kit.visit_bond(st, p, dir_fwd, ltab, rtab,
                                                   own_lo, own_hi)
                ti = jax.lax.dynamic_update_slice(ti, row_i[None], (p, jnp.int32(0)))
                tf = jax.lax.dynamic_update_slice(tf, row_f[None], (p, jnp.int32(0)))
                vip_p = _at(st2.vip, p)
                tab = jnp.where(dir_fwd, advance_left(tab, vip_p, p),
                                advance_right(tab, vip_p, p - 1))
                return st2, ti, tf, tab

            return jax.lax.cond(valid, do, lambda a: a, (st, ti, tf, tab))

        st, tape_i, tape_f, _ = jax.lax.fori_loop(0, max_cnt, body,
                                                  (st, tape_i, tape_f, tab0))
        return st, tape_i, tape_f

    def replay(st: DDState, TI, TF, own_lo, own_hi):
        """Non-owned bonds replay the tape into vip / rk / maintained
        inverses (the dd rendering of dmrgg.f90:822-850; the inverses are
        the mp engine's replicated LU state)."""

        def body(b, st):
            owned = (b >= own_lo) & (b < own_hi)
            acc = TI[b, 0] > 0

            def app(st):
                bz = jnp.asarray(b, jnp.int32)
                z = jnp.int32(0)
                s = st.rk[b + 1].astype(jnp.int32)
                c_new = DD(TF[b, :R], TF[b, R:2 * R])
                u_new = DD(TF[b, 2 * R:3 * R], TF[b, 3 * R:4 * R])
                pivot = DD(TF[b, 4 * R], TF[b, 4 * R + 1])
                vip = jax.lax.dynamic_update_slice(
                    st.vip, TI[b, 1:5][None, None, :], (bz, s, z))
                one_hot = (iR == s)
                itl_b = _at_dd(st.itl, bz)
                row_raw = dd_neg(dd_sum(dd_mul(
                    DD(c_new.hi[:, None], c_new.lo[:, None]), itl_b), axis=0))
                new_row = DD(jnp.where(one_hot, 1.0, row_raw.hi),
                             jnp.where(one_hot, 0.0, row_raw.lo))
                itl_bn = _dus(itl_b, DD(new_row.hi[None, :], new_row.lo[None, :]), (s, z))
                itl = _dus(st.itl, DD(itl_bn.hi[None], itl_bn.lo[None]), (bz, z, z))
                itt_b = _at_dd(st.itt, bz)
                col_raw = dd_sum(dd_mul(itt_b, DD(u_new.hi[None, :], u_new.lo[None, :])),
                                 axis=1)
                pivB = DD(jnp.broadcast_to(pivot.hi, (R,)),
                          jnp.broadcast_to(pivot.lo, (R,)))
                col_raw = dd_div(dd_neg(col_raw), pivB)
                inv_piv = dd_div(dd(1.0), pivot)
                new_col = DD(jnp.where(one_hot, inv_piv.hi, col_raw.hi),
                             jnp.where(one_hot, inv_piv.lo, col_raw.lo))
                itt_bn = _dus(itt_b, DD(new_col.hi[:, None], new_col.lo[:, None]), (z, s))
                itt = _dus(st.itt, DD(itt_bn.hi[None], itt_bn.lo[None]), (bz, z, z))
                # log10-domain pivot magnitude (dmrggmp.f90:50-53)
                pivotmax = jnp.maximum(st.pivotmax, jnp.log10(jnp.abs(pivot.hi)))
                return st._replace(vip=vip, itl=itl, itt=itt,
                                   rk=st.rk.at[b + 1].add(1), pivotmax=pivotmax)

            return jax.lax.cond(acc & ~owned, app, lambda s: s, st)

        return jax.lax.fori_loop(0, d - 1, body, st)

    def fixup(st: DDState, TI, own_lo, own_hi):
        """Boundary fiber repairs (the mp engine's both-direction boundary
        shipping, dmrggmp.f90:518-629, rendered as local re-evaluation)."""
        z = jnp.int32(0)

        bR = jnp.clip(own_hi, 0, d - 2).astype(jnp.int32)
        do_r = (own_hi <= d - 2) & (TI[bR, 0] > 0)

        def fix_right(st):
            kk, qq = TI[bR, 3], TI[bR, 4]
            ltab = left_table(st.vip, bR, d)
            rtab = right_table(st.vip, bR, d)
            fiber, amax, neval = kit.eval_col(st, bR, ltab, rtab, kk, qq)
            st = st._replace(amax=amax, neval=neval)
            slc = _mm_left(_at_dd(st.itl, jnp.maximum(bR - 1, 0)), fiber)
            s = (st.rk[bR + 1] - 1).astype(jnp.int32)
            rowf_b = _dus(_at_dd(st.rowf, bR),
                          DD(slc.hi[:, :, None], slc.lo[:, :, None]), (z, z, s))
            rowf = _dus(st.rowf, DD(rowf_b.hi[None], rowf_b.lo[None]), (bR, z, z, z))
            return st._replace(rowf=rowf)

        st = jax.lax.cond(do_r, fix_right, lambda s: s, st)

        bL = jnp.clip(own_lo - 1, 0, d - 2).astype(jnp.int32)
        do_l = (own_lo >= 1) & (TI[bL, 0] > 0)

        def fix_left(st):
            ii, jj = TI[bL, 1], TI[bL, 2]
            ltab = left_table(st.vip, bL, d)
            rtab = right_table(st.vip, bL, d)
            fiber, amax, neval = kit.eval_row(st, bL, ltab, rtab, ii, jj)  # (N, R)
            st = st._replace(amax=amax, neval=neval)
            c0 = (bL + 1).astype(jnp.int32)
            s = (st.rk[c0] - 1).astype(jnp.int32)
            cores_c = _dus(_at_dd(st.cores, c0),
                           DD(fiber.hi[None], fiber.lo[None]), (s, z, z))
            cores = _dus(st.cores, DD(cores_c.hi[None], cores_c.lo[None]),
                         (c0, z, z, z))
            slc = _mm_right(fiber, _at_dd(st.itt, c0))
            colf_c = _dus(_at_dd(st.colf, c0),
                          DD(slc.hi[None], slc.lo[None]), (s, z, z))
            colf = _dus(st.colf, DD(colf_c.hi[None], colf_c.lo[None]),
                        (c0, z, z, z))
            return st._replace(cores=cores, colf=colf)

        return jax.lax.cond(do_l, fix_left, lambda s: s, st)

    def _gmax(x):
        return jnp.max(jax.lax.all_gather(x, BOND_AXIS))

    def psweep(st: DDState, it, own_lo, own_hi):
        st, tape_i, tape_f = local_sweep(st, it, own_lo, own_hi)
        TI = jax.lax.psum(tape_i, BOND_AXIS)
        TF = jax.lax.psum(tape_f, BOND_AXIS)
        st = replay(st, TI, TF, own_lo, own_hi)
        st = fixup(st, TI, own_lo, own_hi)
        amax = _gmax(st.amax)
        pivotmax = _gmax(st.pivotmax)
        return st._replace(amax=amax, pivotmax=pivotmax, pivotmax_prev=pivotmax)

    init_neval = cfg.snum * int(min(cfg.n)) + int(sum(cfg.n))

    def dist_value(st: DDState, wh, wl, own_lo, own_hi, me) -> DD:
        """Distributed per-sweep dd quadrature value (the mp tier's in-loop
        value line, dmrggmp.f90:655-672 + the mptt_quad tree reduction,
        778-888): each device chains the LU-solved (R, R) dd mats of its
        AUTHORITATIVE cores, the per-device partial products are
        all-gathered in bond order, and the ordered fold finishes on every
        device (replicated scalar)."""
        c_idx = jnp.arange(d)
        authority = (c_idx >= own_lo) & (c_idx < own_hi)
        authority = authority | ((c_idx == d - 1) & (me == ndev - 1))

        def body(c, acc):
            m = kit.value_mat(st, wh, wl, c)
            prod = dd_sum(dd_mul(DD(acc.hi[:, :, None], acc.lo[:, :, None]),
                                 DD(m.hi[None], m.lo[None])), axis=1)
            keep = authority[c]
            return DD(jnp.where(keep, prod.hi, acc.hi),
                      jnp.where(keep, prod.lo, acc.lo))

        eyeR = jnp.eye(R)
        acc = jax.lax.fori_loop(0, d, body, DD(eyeR, jnp.zeros((R, R))))
        parts = DD(jax.lax.all_gather(acc.hi, BOND_AXIS),
                   jax.lax.all_gather(acc.lo, BOND_AXIS))    # (ndev, R, R)

        def fold(w, v):
            m = _at_dd(parts, w)
            prod = dd_mul(DD(v.hi[:, None], v.lo[:, None]), m)
            return dd_sum(prod, axis=0)

        v0 = DD(jnp.zeros((R,)).at[0].set(1.0), jnp.zeros((R,)))
        v = jax.lax.fori_loop(0, ndev, fold, v0)
        return DD(v.hi[0], v.lo[0])

    def make_run_fn(max_sweeps: int, accuracy: float, with_value: bool = False):
        lacc = float(np.log10(accuracy))

        def run_body(st: DDState, wh, wl):
            me = jax.lax.axis_index(BOND_AXIS)
            own_lo, own_hi = own_lo_tbl[me], own_hi_tbl[me]
            st = st._replace(key=jax.random.fold_in(st.key, me))
            pmax0 = jnp.zeros((max_sweeps + 1,))
            nev0 = jnp.zeros((max_sweeps + 1,), jnp.int64)
            valh0 = jnp.zeros((max_sweeps + 1,))
            vall0 = jnp.zeros((max_sweeps + 1,))

            def cond(carry):
                return ~carry[-1]

            def body(carry):
                st, it, strike, pmax, nev, valh, vall, done = carry
                st = psweep(st, it, own_lo, own_hi)
                pmax = pmax.at[it].set(st.pivotmax)
                nev = nev.at[it].set(jax.lax.psum(st.neval - init_neval, BOND_AXIS)
                                     + init_neval)
                if with_value:
                    v = dist_value(st, wh, wl, own_lo, own_hi, me)
                    valh = valh.at[it].set(v.hi)
                    vall = vall.at[it].set(v.lo)
                # quiet test in log10 (dmrggmp.f90:50-53)
                quiet = st.pivotmax <= lacc + st.amax
                strike = jnp.where(quiet, strike + 1, 0)
                ready = (it + 1 >= max_sweeps + 1) | (strike >= 3)
                return (st, it + 1, strike, pmax, nev, valh, vall, ready)

            init = (st, jnp.asarray(1, jnp.int32), jnp.asarray(0, jnp.int32),
                    pmax0, nev0, valh0, vall0, jnp.asarray(max_sweeps < 1))
            st, it, _, pmax, nev, valh, vall, _ = jax.lax.while_loop(cond, body, init)

            # authoritative cores -> replicated (hi and lo planes)
            c_idx = jnp.arange(d)
            authority = (c_idx >= own_lo) & (c_idx < own_hi)
            authority = authority | ((c_idx == d - 1) & (me == ndev - 1))
            am = authority[:, None, None, None]
            cores = DD(jax.lax.psum(jnp.where(am, st.cores.hi, 0.0), BOND_AXIS),
                       jax.lax.psum(jnp.where(am, st.cores.lo, 0.0), BOND_AXIS))
            neval = jax.lax.psum(st.neval - init_neval, BOND_AXIS) + init_neval
            st = st._replace(cores=cores, neval=neval)
            return st, it - 1, pmax, nev, valh, vall

        mapped = jax.shard_map(
            run_body, mesh=mesh, in_specs=(P(), P(), P()),
            out_specs=(P(), P(), P(), P(), P(), P()), check_vma=False,
        )
        return jax.jit(mapped)

    return kit, make_run_fn


def cross_dd_parallel(
    fun_dd: Callable,
    n: Sequence[int],
    weights_hi, weights_lo,
    max_rank: int = 32,
    accuracy: float = 1e-28,
    pivoting: int = 1,
    key: int = 0,
    small_element: float = 1e-30,
    small_pivot: float = 1e-12,
    mesh: Mesh | None = None,
    mybonds=None,
    verbose: bool = False,
    truth=None,
) -> DDCrossResult:
    """Distributed dd cross over a bond mesh (the `mpirun -np N` path of the
    reference's multiprecision engine, dmrggmp.f90).  Same contract as
    cross_dd; requires len(mesh devices) <= d-1.

    With verbose, each sweep prints the distributed dd quadrature value of
    the CURRENT cross with err vs `truth` (string/float) or cnv vs the
    previous sweep — the mp tier's in-loop value line (dmrggmp.f90:655-672)
    computed by an ordered cross-device fold (dist_value)."""
    n = tuple(int(x) for x in n)
    d = len(n)
    if mesh is None:
        mesh = bond_mesh()
    cfg = DDConfig(d=d, n=n, N=max(n), R=max_rank, piv=int(pivoting),
                   small_element=small_element, small_pivot=small_pivot)
    kit, make_run_fn = get_parallel_dd_engine(fun_dd, cfg, mesh, mybonds)

    wh_pad = np.zeros((d, cfg.N))
    wl_pad = np.zeros((d, cfg.N))
    for c in range(d):
        wh_pad[c, : n[c]] = np.asarray(weights_hi[c])
        wl_pad[c, : n[c]] = np.asarray(weights_lo[c])
    wh_pad = jnp.asarray(wh_pad)
    wl_pad = jnp.asarray(wl_pad)

    st = kit.init_fn(jax.random.PRNGKey(key) if isinstance(key, int) else key)
    run_fn = make_run_fn(max_rank - 1, accuracy, with_value=verbose)
    st, last_it, pmax, nev, valh, vall = run_fn(st, wh_pad, wl_pad)
    last_it = int(last_it)
    if verbose:
        from decimal import Decimal, localcontext

        pmax = np.asarray(pmax)
        nev = np.asarray(nev)
        valh = np.asarray(valh)
        vall = np.asarray(vall)
        val_prev = None
        with localcontext() as ctx:
            ctx.prec = 50
            for it in range(1, last_it + 1):
                val = Decimal(float(valh[it])) + Decimal(float(vall[it]))
                if truth is not None:
                    rel = abs(1 - val / Decimal(truth if isinstance(truth, str)
                                                else float(truth)))
                    tag = f"err {float(rel):9.3e}"
                elif val_prev not in (None, 0):
                    tag = f"cnv {float(abs(1 - val / val_prev)):9.3e}"
                else:
                    tag = ""
                val_prev = val
                print(f"{it:3d}{'>>' if it % 2 == 1 else '<<'} dd "
                      f"lg(pivotmax) {pmax[it]:8.2f} n_evals {int(nev[it])} "
                      f"{tag} val {val:.32e}")

    solved = kit.finalize_fn(st)
    rk = np.asarray(st.rk)
    sh = np.asarray(solved.hi)
    sl = np.asarray(solved.lo)
    cores_hi = [sh[c][: rk[c], : n[c], : rk[c + 1]] for c in range(d)]
    cores_lo = [sl[c][: rk[c], : n[c], : rk[c + 1]] for c in range(d)]
    value = dd_quad_cores(cores_hi, cores_lo, weights_hi, weights_lo)
    return DDCrossResult(cores_hi=cores_hi, cores_lo=cores_lo, value=value,
                         neval=int(st.neval), sweeps=last_it,
                         ranks=tuple(int(x) for x in rk))
