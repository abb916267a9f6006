"""Double-double DMRG-greedy cross engine (pivot selection beyond f64).

The full mptt_dmrgg analogue (dmrggmp.f90:11-704): every value the engine
touches — fibers, factors, residuals, the growing-LU — is a double-double
pair, so the greedy residual hunt keeps finding pivots far below the f64
noise floor (~1e-16 |A|), where the f64 engine (and hence defect
correction, cross/defect.py) stalls.  Selection decisions (argmax,
thresholds) compare the hi parts: f64 *resolution* is ample once the
*values* carry ~32 digits.

v1 scope: single device, rook pivoting (the reference's default), stopping
on maxrank / quiet-pivot strikes; per-sweep values via dd contraction of
the finalized train.  The integrand must be a device-dd function
fun_dd(ind (B, d)) -> DD — e.g. apps.ising.ising_c_integrand_dd.

Default thresholds are the dd analogues of the reference's per-precision
dispatch (dmrgg.f90:62-84): small_element ~ 100 * 1e-32, small_pivot 1e-12
(the relative floor is wider than f64's 1e-5 because dd crosses chase many
more orders of magnitude).

Thresholds and magnitude tracking live in the LOG10 DOMAIN, exactly like
the reference's mp engine (dmrggmp.f90:50-53, 107, 364): DDState.amax /
pivotmax / pivotmax_prev hold log10 magnitudes, and acceptance compares
log10|pivot| > log10(small) + log10(amax).  A linear-domain product
small_element * amax underflows (flushes to 0, accepting everything and
never stopping) once amax drops below ~1e-278 on binary64 — or ~1e-8 (!)
on the f32-pair emulated-f64 platform whose exponent range is f32's —
while integrand families like the rescaled Ising D/E span exactly such
ranges."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.dd import DD, dd, dd_div, dd_mul, dd_neg, dd_sub, dd_sum
from .chains import (advance_left, advance_right, all_left_tables,
                     all_right_tables, assemble_indices)

__all__ = ["cross_dd", "DDCrossResult"]


@dataclass(frozen=True)
class DDConfig:
    d: int
    n: tuple
    N: int
    R: int
    piv: int
    small_element: float
    small_pivot: float
    snum: int = 8


class DDState(NamedTuple):
    cores: DD   # (d, R, N, R)
    colf: DD
    rowf: DD
    itl: DD     # (d-1, R, R) maintained L^-1
    itt: DD     # (d-1, R, R) maintained T^-1
    rk: jax.Array
    vip: jax.Array
    amax: jax.Array           # LOG10 of the max |entry| seen (dmrggmp.f90:107)
    pivotmax: jax.Array       # LOG10 of the sweep's max accepted |pivot|
    pivotmax_prev: jax.Array  # LOG10; -inf marks "nothing yet"
    neval: jax.Array
    key: jax.Array


@dataclass
class DDCrossResult:
    cores_hi: list
    cores_lo: list
    value: tuple              # (hi, lo) quadrature value
    neval: int
    sweeps: int
    ranks: tuple


class DDKit(NamedTuple):
    """Compiled dd-engine phases + the per-bond kernels the distributed dd
    engine (parallel/engine_dd.py) builds on."""

    init_fn: Callable
    sweep_fn: Callable
    finalize_fn: Callable
    visit_bond: Callable
    eval_col: Callable
    eval_row: Callable
    cfg: "DDConfig"
    value_fn: Callable = None
    value_mat: Callable = None


def _ddz(shape):
    return DD(jnp.zeros(shape), jnp.zeros(shape))


def _dus(a: DD, upd: DD, idx) -> DD:
    return DD(jax.lax.dynamic_update_slice(a.hi, upd.hi, idx),
              jax.lax.dynamic_update_slice(a.lo, upd.lo, idx))


def _at(a, c):
    return jax.lax.dynamic_index_in_dim(a, c, 0, keepdims=False)


def _at_dd(a: DD, c) -> DD:
    return DD(_at(a.hi, c), _at(a.lo, c))


def _mv_rank(mat: DD, u: DD) -> DD:
    """(..., R) x (R,) contraction in dd: sum_t mat[..., t] u[t]."""
    nd = mat.hi.ndim - 1
    uh = u.hi.reshape((1,) * nd + (-1,))
    ul = u.lo.reshape((1,) * nd + (-1,))
    return dd_sum(dd_mul(mat, DD(jnp.broadcast_to(uh, mat.hi.shape),
                                 jnp.broadcast_to(ul, mat.hi.shape))),
                  axis=mat.hi.ndim - 1)


def _vm_rank(c: DD, mat: DD) -> DD:
    """(R,) x (R, ...) contraction in dd: sum_t c[t] mat[t, ...]."""
    nd = mat.hi.ndim - 1
    ch = c.hi.reshape((-1,) + (1,) * nd)
    cl = c.lo.reshape((-1,) + (1,) * nd)
    return dd_sum(dd_mul(DD(jnp.broadcast_to(ch, mat.hi.shape),
                            jnp.broadcast_to(cl, mat.hi.shape)), mat), axis=0)


def _mm_left(itl: DD, X: DD) -> DD:
    """(R, R) @ (R, N) in dd."""
    prod = dd_mul(DD(itl.hi[:, :, None], itl.lo[:, :, None]),
                  DD(X.hi[None, :, :], X.lo[None, :, :]))
    return dd_sum(prod, axis=1)


def _mm_right(X: DD, itt: DD) -> DD:
    """(N, R) @ (R, R) in dd."""
    prod = dd_mul(DD(X.hi[:, :, None], X.lo[:, :, None]),
                  DD(itt.hi[None, :, :], itt.lo[None, :, :]))
    return dd_sum(prod, axis=1)


def _l10max(x) -> jax.Array:
    """log10(max|x|); -inf for an all-zero block (log10(0) lowers to -inf,
    no NaN) — magnitudes stay in the log domain end to end so no threshold
    product can underflow (dmrggmp.f90:50-53)."""
    return jnp.log10(jnp.max(jnp.abs(x)))


def _make_engine(fun_dd: Callable, cfg: DDConfig):
    d, N, R = cfg.d, cfg.N, cfg.R
    n_arr = jnp.asarray(cfg.n, jnp.int32)
    NLOT = 2 * (R + N)
    iR = jnp.arange(R)
    iN = jnp.arange(N)
    # acceptance thresholds in log10 (dmrggmp.f90:50-53); the public API
    # keeps linear small_element / small_pivot for parity with the f64 tier
    lse = float(np.log10(cfg.small_element))
    lsp = float(np.log10(cfg.small_pivot))

    def mask2(st, p, rows_rank: bool):
        if rows_rank:
            return (iR[:, None] < st.rk[p]) & (iN[None, :] < n_arr[p])
        return (iN[:, None] < n_arr[p + 1]) & (iR[None, :] < st.rk[p + 2])

    def _zero_masked(x: DD, m) -> DD:
        return DD(jnp.where(m, x.hi, 0.0), jnp.where(m, x.lo, 0.0))

    @jax.jit
    def init_fn(key) -> DDState:
        nn = int(min(cfg.n))
        ks = jnp.arange(nn)[None, :, None]
        ss = jnp.arange(cfg.snum)[:, None, None]
        ps = jnp.arange(d)[None, None, :]
        cand = jnp.reshape((ks + ss * ps) % n_arr[None, None, :], (-1, d)).astype(jnp.int32)
        vals = fun_dd(cand)
        best = jnp.argmax(jnp.abs(vals.hi))
        amax = jnp.log10(jnp.abs(vals.hi[best]))
        ind0 = cand[best]

        vip = jnp.zeros((d - 1, R, 4), jnp.int32)
        vip = vip.at[:, 0, 1].set(ind0[:-1]).at[:, 0, 2].set(ind0[1:])

        fib_ind = jnp.broadcast_to(ind0, (d, N, d)).reshape(-1, d)
        mode_pos = jnp.repeat(jnp.arange(d), N)
        mode_val = jnp.tile(iN, d)
        col = jnp.arange(d)
        fib_ind = jnp.where(col[None, :] == mode_pos[:, None],
                            jnp.minimum(mode_val, n_arr[mode_pos] - 1)[:, None], fib_ind)
        fv = fun_dd(fib_ind.astype(jnp.int32))
        fvals = DD(fv.hi.reshape(d, N), fv.lo.reshape(d, N))
        fmask = iN[None, :] < n_arr[:, None]
        fvals = _zero_masked(fvals, fmask)
        amax = jnp.maximum(amax, _l10max(fvals.hi))

        cores = _ddz((d, R, N, R))
        cores = DD(cores.hi.at[:, 0, :, 0].set(fvals.hi),
                   cores.lo.at[:, 0, :, 0].set(fvals.lo))
        delta = DD(fvals.hi[0, ind0[0]], fvals.lo[0, ind0[0]])
        colf0 = dd_div(fvals, DD(jnp.broadcast_to(delta.hi, fvals.hi.shape),
                                 jnp.broadcast_to(delta.lo, fvals.hi.shape)))
        colf = _ddz((d, R, N, R))
        colf = DD(colf.hi.at[:, 0, :, 0].set(colf0.hi),
                  colf.lo.at[:, 0, :, 0].set(colf0.lo))
        rowf = DD(cores.hi, cores.lo)
        eye = jnp.broadcast_to(jnp.eye(R), (d - 1, R, R))
        itl = DD(eye, jnp.zeros_like(eye))
        inv_delta = dd_div(dd(1.0), delta)
        itt = DD(eye.at[:, 0, 0].set(inv_delta.hi),
                 jnp.zeros_like(eye).at[:, 0, 0].set(inv_delta.lo))
        neval = jnp.asarray(cfg.snum * nn + int(sum(cfg.n)), jnp.int64)
        return DDState(cores=cores, colf=colf, rowf=rowf, itl=itl, itt=itt,
                       rk=jnp.ones((d + 1,), jnp.int32), vip=vip,
                       amax=amax, pivotmax=jnp.full((), -jnp.inf),
                       pivotmax_prev=amax, neval=neval, key=key)

    def eval_col(st, p, ltab, rtab, kk, qq):
        ind = assemble_indices(ltab, rtab, p, jnp.repeat(iR, N), jnp.tile(iN, R),
                               jnp.full((R * N,), kk), jnp.full((R * N,), qq), d)
        v = fun_dd(ind)
        vals = _zero_masked(DD(v.hi.reshape(R, N), v.lo.reshape(R, N)),
                            mask2(st, p, True))
        amax = jnp.maximum(st.amax, _l10max(vals.hi))
        neval = st.neval + (st.rk[p] * n_arr[p]).astype(jnp.int64)
        return vals, amax, neval

    def eval_row(st, p, ltab, rtab, ii, jj):
        ind = assemble_indices(ltab, rtab, p, jnp.full((N * R,), ii),
                               jnp.full((N * R,), jj), jnp.repeat(iN, R),
                               jnp.tile(iR, N), d)
        v = fun_dd(ind)
        vals = _zero_masked(DD(v.hi.reshape(N, R), v.lo.reshape(N, R)),
                            mask2(st, p, False))
        amax = jnp.maximum(st.amax, _l10max(vals.hi))
        neval = st.neval + (n_arr[p + 1] * st.rk[p + 2]).astype(jnp.int64)
        return vals, amax, neval

    def rmasked(st, p, x: DD) -> DD:
        m = (iR < st.rk[p + 1]).astype(x.hi.dtype)
        return DD(x.hi * m, x.lo * m)

    def visit_bond(st: DDState, p, dir_fwd, ltab, rtab, own_lo=0, own_hi=d - 1):
        key, sub1, sub2 = jax.random.split(st.key, 3)
        colmask = ((iR[:, None] < st.rk[p]) & (iN[None, :] < n_arr[p])).reshape(-1)
        rowmask = ((iR[:, None] < st.rk[p + 2]) & (iN[None, :] < n_arr[p + 1])).reshape(-1)
        vb = _at(st.vip, p)
        smask = iR < st.rk[p + 1]
        used_col = jnp.zeros((R * N,), bool).at[vb[:, 0] * N + vb[:, 1]].max(smask)
        used_row = jnp.zeros((N * R,), bool).at[vb[:, 3] * N + vb[:, 2]].max(smask)
        cdf_c = jnp.cumsum((colmask & ~used_col).astype(jnp.int32))
        cdf_r = jnp.cumsum((rowmask & ~used_row).astype(jnp.int32))
        u_c = jax.random.randint(sub1, (NLOT,), 0, jnp.maximum(cdf_c[-1], 1))
        u_r = jax.random.randint(sub2, (NLOT,), 0, jnp.maximum(cdf_r[-1], 1))
        lin_c = jnp.searchsorted(cdf_c, u_c, side="right").astype(jnp.int32)
        lin_r = jnp.searchsorted(cdf_r, u_r, side="right").astype(jnp.int32)
        i_c, j_c = lin_c // N, lin_c % N
        q_c, k_c = lin_r // N, lin_r % N
        nlot_act = st.rk[p] + n_arr[p] + n_arr[p + 1] + st.rk[p + 2]
        candmask = jnp.arange(NLOT) < nlot_act

        ind = assemble_indices(ltab, rtab, p, i_c, j_c, k_c, q_c, d)
        b = fun_dd(ind)
        amax = jnp.maximum(st.amax,
                           _l10max(jnp.where(candmask, jnp.abs(b.hi), 0.0)))
        neval = st.neval + nlot_act.astype(jnp.int64)
        st = st._replace(amax=amax, neval=neval, key=key)

        colf_p = _at_dd(st.colf, p)
        rowf_p1 = _at_dd(st.rowf, p + 1)
        cf = DD(colf_p.hi[i_c, j_c, :], colf_p.lo[i_c, j_c, :])      # (B, R)
        rf = DD(rowf_p1.hi[:, k_c, q_c].T, rowf_p1.lo[:, k_c, q_c].T)  # (B, R)
        m = (iR < st.rk[p + 1]).astype(cf.hi.dtype)[None, :]
        dot = dd_sum(dd_mul(DD(cf.hi * m, cf.lo * m), rf), axis=1)
        resid = dd_sub(b, dot)
        best = jnp.argmax(jnp.where(candmask, jnp.abs(resid.hi), -1.0))
        ii = i_c[best].astype(jnp.int32)
        jj = j_c[best].astype(jnp.int32)
        kk = k_c[best].astype(jnp.int32)
        qq = q_c[best].astype(jnp.int32)
        pivot = DD(resid.hi[best], resid.lo[best])

        # rook passes (fixed 2*piv alternating passes; the f64 engine's
        # early-stationarity exit is an optimization, not a semantic)
        acol = _ddz((R, N))
        arow = _ddz((N, R))
        carry = (st.amax, st.neval, ii, jj, kk, qq, pivot, acol, arow)

        n_passes = 2 * max(cfg.piv, 1)

        def passes(t, carry):
            amax, neval, ii, jj, kk, qq, pivot, acol, arow = carry
            col_turn = jnp.where(dir_fwd, t % 2 == 0, t % 2 == 1)
            # the LAST pass evaluates the fiber DATA at the already-chosen
            # indices but must not move them (otherwise the stored
            # transverse fiber would belong to a different pivot - the
            # role of the reference's done/stationarity guard,
            # dmrgg.f90:534-579)
            last = t == n_passes - 1

            def do_col(args):
                amax, neval, ii, jj, kk, qq, pivot, acol, arow = args
                stv = st._replace(amax=amax, neval=neval)
                acol, amax, neval = eval_col(stv, p, ltab, rtab, kk, qq)
                u = rmasked(st, p, DD(rowf_p1.hi[:, kk, qq], rowf_p1.lo[:, kk, qq]))
                bcol = dd_sub(acol, _mv_rank(colf_p, u))
                score = jnp.where(mask2(st, p, True), jnp.abs(bcol.hi), -1.0)
                flat = jnp.argmax(score.reshape(-1))
                i2 = jnp.where(last, ii, (flat // N).astype(jnp.int32))
                j2 = jnp.where(last, jj, (flat % N).astype(jnp.int32))
                piv2 = DD(jnp.where(last, pivot.hi, bcol.hi[i2, j2]),
                          jnp.where(last, pivot.lo, bcol.lo[i2, j2]))
                return (amax, neval, i2, j2, kk, qq, piv2, acol, arow)

            def do_row(args):
                amax, neval, ii, jj, kk, qq, pivot, acol, arow = args
                stv = st._replace(amax=amax, neval=neval)
                arow, amax, neval = eval_row(stv, p, ltab, rtab, ii, jj)
                c = rmasked(st, p, DD(colf_p.hi[ii, jj, :], colf_p.lo[ii, jj, :]))
                brow = dd_sub(arow, _vm_rank(c, rowf_p1))
                score = jnp.where(mask2(st, p, False), jnp.abs(brow.hi), -1.0)
                flat = jnp.argmax(score.reshape(-1))
                k2 = jnp.where(last, kk, (flat // R).astype(jnp.int32))
                q2 = jnp.where(last, qq, (flat % R).astype(jnp.int32))
                piv2 = DD(jnp.where(last, pivot.hi, brow.hi[k2, q2]),
                          jnp.where(last, pivot.lo, brow.lo[k2, q2]))
                return (amax, neval, ii, jj, k2, q2, piv2, acol, arow)

            return jax.lax.cond(col_turn, do_col, do_row, carry)

        carry = jax.lax.fori_loop(0, n_passes, passes, carry)
        amax, neval, ii, jj, kk, qq, pivot, acol, arow = carry
        st = st._replace(amax=amax, neval=neval)

        # two-threshold acceptance in log10 (dmrggmp.f90:50-53, 364):
        # log10|pivot| must clear lse + lg(amax) and lsp + lg(pivotmax');
        # an exact-zero pivot gives -inf and is always rejected
        lpiv = jnp.log10(jnp.abs(pivot.hi))
        upd = ((lpiv > lse + st.amax)
               & (lpiv > lsp + st.pivotmax_prev)
               & (st.rk[p + 1] < R))

        # tape rows for the distributed engine (parallel/engine_dd.py):
        # (accepted, i, j, k, q) ints + dd borders and pivot so replicas
        # replay vip / rk / maintained inverses exactly (the dd analogue of
        # the f64 engine's extended tape; reference: dmrgg.f90:598-604)
        s0 = st.rk[p + 1].astype(jnp.int32)
        rmask0 = (iR < s0).astype(jnp.float64)
        c_b = DD(colf_p.hi[ii, jj, :] * rmask0, colf_p.lo[ii, jj, :] * rmask0)
        u_b = DD(rowf_p1.hi[:, kk, qq] * rmask0, rowf_p1.lo[:, kk, qq] * rmask0)
        tape_i = jnp.where(upd, jnp.stack([1, ii, jj, kk, qq]).astype(jnp.int32), 0)
        tape_f = jnp.where(upd, jnp.concatenate(
            [c_b.hi, c_b.lo, u_b.hi, u_b.lo, pivot.hi[None], pivot.lo[None]]), 0.0)

        def accept(st: DDState) -> DDState:
            z = jnp.int32(0)
            pz = jnp.asarray(p, jnp.int32)
            s = st.rk[p + 1].astype(jnp.int32)
            rmask = (iR < s).astype(jnp.float64)
            vip = jax.lax.dynamic_update_slice(
                st.vip, jnp.stack([ii, jj, kk, qq]).astype(jnp.int32)[None, None, :],
                (pz, s, z))
            c_new = DD(colf_p.hi[ii, jj, :] * rmask, colf_p.lo[ii, jj, :] * rmask)
            u_new = DD(rowf_p1.hi[:, kk, qq] * rmask, rowf_p1.lo[:, kk, qq] * rmask)

            cores_p = _dus(_at_dd(st.cores, p), DD(acol.hi[:, :, None], acol.lo[:, :, None]), (z, z, s))
            cores_p1 = _dus(_at_dd(st.cores, p + 1), DD(arow.hi[None], arow.lo[None]), (s, z, z))
            cores = _dus(st.cores, DD(cores_p.hi[None], cores_p.lo[None]), (pz, z, z, z))
            cores = _dus(cores, DD(cores_p1.hi[None], cores_p1.lo[None]), (pz + 1, z, z, z))

            pivB = lambda shape: DD(jnp.broadcast_to(pivot.hi, shape),
                                    jnp.broadcast_to(pivot.lo, shape))
            new_colf = dd_div(dd_sub(acol, _mv_rank(colf_p, u_new)), pivB(acol.hi.shape))
            colf_pn = _dus(colf_p, DD(new_colf.hi[:, :, None], new_colf.lo[:, :, None]), (z, z, s))
            colf = _dus(st.colf, DD(colf_pn.hi[None], colf_pn.lo[None]), (pz, z, z, z))
            new_rowf = dd_sub(arow, _vm_rank(c_new, rowf_p1))
            rowf_p1n = _dus(rowf_p1, DD(new_rowf.hi[None], new_rowf.lo[None]), (s, z, z))
            rowf = _dus(st.rowf, DD(rowf_p1n.hi[None], rowf_p1n.lo[None]), (pz + 1, z, z, z))

            # maintained inverses in dd
            itl_p = _at_dd(st.itl, p)
            row_raw = dd_neg(_vm_rank(c_new, itl_p))     # (R,)
            one_hot = (iR == s)
            new_row = DD(jnp.where(one_hot, 1.0, row_raw.hi),
                         jnp.where(one_hot, 0.0, row_raw.lo))
            itl_pn = _dus(itl_p, DD(new_row.hi[None, :], new_row.lo[None, :]), (s, z))
            itl = _dus(st.itl, DD(itl_pn.hi[None], itl_pn.lo[None]), (pz, z, z))
            itt_p = _at_dd(st.itt, p)
            col_raw = dd_div(dd_neg(_mv_rank(itt_p, u_new)), pivB((R,)))
            inv_piv = dd_div(dd(1.0), pivot)
            new_col = DD(jnp.where(one_hot, inv_piv.hi, col_raw.hi),
                         jnp.where(one_hot, inv_piv.lo, col_raw.lo))
            itt_pn = _dus(itt_p, DD(new_col.hi[:, None], new_col.lo[:, None]), (z, s))
            itt = _dus(st.itt, DD(itt_pn.hi[None], itt_pn.lo[None]), (pz, z, z))

            def left_rows(rowf):
                slc = _mm_left(_at_dd(itl, jnp.maximum(pz - 1, 0)), acol)
                rfp = _dus(_at_dd(rowf, p), DD(slc.hi[:, :, None], slc.lo[:, :, None]), (z, z, s))
                return _dus(rowf, DD(rfp.hi[None], rfp.lo[None]), (pz, z, z, z))

            rowf = jax.lax.cond(pz > own_lo, left_rows, lambda r: r, rowf)

            def right_cols(colf):
                slc = _mm_right(arow, _at_dd(itt, jnp.minimum(pz + 1, d - 2)))
                cfp = _dus(_at_dd(colf, p + 1), DD(slc.hi[None], slc.lo[None]), (s, z, z))
                return _dus(colf, DD(cfp.hi[None], cfp.lo[None]), (pz + 1, z, z, z))

            colf = jax.lax.cond(pz < own_hi - 1, right_cols, lambda c: c, colf)

            pivotmax = jnp.maximum(st.pivotmax, lpiv)
            return st._replace(cores=cores, colf=colf, rowf=rowf, itl=itl, itt=itt,
                               rk=st.rk.at[p + 1].add(1), vip=vip, pivotmax=pivotmax)

        return jax.lax.cond(upd, accept, lambda s: s, st), tape_i, tape_f

    @jax.jit
    def sweep_fn(st: DDState, it) -> DDState:
        dir_fwd = (it % 2) == 1
        st = st._replace(pivotmax=jnp.full((), -jnp.inf))
        LT = all_left_tables(st.vip, d)
        RT = all_right_tables(st.vip, d)
        tab0 = jnp.zeros((R, d), st.vip.dtype)

        def body(idx, carry):
            s, tab = carry
            p = jnp.where(dir_fwd, idx, d - 2 - idx)
            ltab = jnp.where(dir_fwd, tab, _at(LT, p))
            rtab = jnp.where(dir_fwd, _at(RT, p), tab)
            s = visit_bond(s, p, dir_fwd, ltab, rtab)[0]
            vip_p = _at(s.vip, p)
            tab = jnp.where(dir_fwd, advance_left(tab, vip_p, p),
                            advance_right(tab, vip_p, p - 1))
            return s, tab

        st, _ = jax.lax.fori_loop(0, d - 1, body, (st, tab0))
        return st._replace(pivotmax_prev=st.pivotmax)

    def value_mat(st: DDState, wh, wl, c) -> DD:
        """LU-solved (R, R) dd contraction matrix of core c against dd
        weights (wh, wl)[c] — the ttqq core + mptt_lua application
        (dmrggmp.f90:655-672).  Shared by value_fn and the distributed
        per-sweep value (parallel/engine_dd.py)."""
        g = _at_dd(st.cores, c)                              # (R, N, R)
        w = DD(_at(wh, c), _at(wl, c))                       # (N,)
        prod = dd_mul(g, DD(w.hi[None, :, None], w.lo[None, :, None]))
        m = dd_sum(prod, axis=1)                             # (R, R)
        itl_c = _at_dd(st.itl, jnp.maximum(c - 1, 0))
        solved = dd_sum(dd_mul(DD(itl_c.hi[:, :, None], itl_c.lo[:, :, None]),
                               DD(m.hi[None], m.lo[None])), axis=1)
        m = DD(jnp.where(c > 0, solved.hi, m.hi),
               jnp.where(c > 0, solved.lo, m.lo))
        itt_c = _at_dd(st.itt, jnp.minimum(c, d - 2))
        solved = dd_sum(dd_mul(DD(m.hi[:, :, None], m.lo[:, :, None]),
                               DD(itt_c.hi[None], itt_c.lo[None])), axis=1)
        return DD(jnp.where(c < d - 1, solved.hi, m.hi),
                  jnp.where(c < d - 1, solved.lo, m.lo))

    @jax.jit
    def value_fn(st: DDState, wh, wl) -> DD:
        """Per-sweep dd quadrature value of the CURRENT cross (the mp
        tier's in-loop value line, dmrggmp.f90:655-672): contract each raw
        core against the dd weights, apply the maintained inverses, chain
        the (R, R) mats — all in dd."""

        def body(c, v):
            m = value_mat(st, wh, wl, c)
            prod = dd_mul(DD(v.hi[:, None], v.lo[:, None]), m)
            return dd_sum(prod, axis=0)

        v0 = DD(jnp.zeros((R,)).at[0].set(1.0), jnp.zeros((R,)))
        v = jax.lax.fori_loop(0, d, body, v0)
        return DD(v.hi[0], v.lo[0])

    @jax.jit
    def finalize_fn(st: DDState) -> DD:
        def one(c, out):
            g = _at_dd(st.cores, c)
            itl_c = _at_dd(st.itl, jnp.maximum(c - 1, 0))
            prod = dd_mul(DD(itl_c.hi[:, :, None, None], itl_c.lo[:, :, None, None]),
                          DD(g.hi[None], g.lo[None]))
            solved = dd_sum(prod, axis=1)
            g = DD(jnp.where(c > 0, solved.hi, g.hi), jnp.where(c > 0, solved.lo, g.lo))
            itt_c = _at_dd(st.itt, jnp.minimum(c, d - 2))
            prod = dd_mul(DD(g.hi[:, :, :, None], g.lo[:, :, :, None]),
                          DD(itt_c.hi[None, None], itt_c.lo[None, None]))
            solved = dd_sum(prod, axis=2)
            g = DD(jnp.where(c < d - 1, solved.hi, g.hi), jnp.where(c < d - 1, solved.lo, g.lo))
            return _dus(out, DD(g.hi[None], g.lo[None]),
                        (jnp.asarray(c, jnp.int32),) + (jnp.int32(0),) * 3)

        return jax.lax.fori_loop(0, d, one, _ddz((d, R, N, R)))

    return DDKit(init_fn=init_fn, sweep_fn=sweep_fn, finalize_fn=finalize_fn,
                 visit_bond=visit_bond, eval_col=eval_col, eval_row=eval_row,
                 cfg=cfg, value_fn=value_fn, value_mat=value_mat)


_DD_CACHE: dict = {}
_DD_PINS: list = []


def get_dd_engine(fun_dd: Callable, cfg: DDConfig) -> "DDKit":
    target = getattr(fun_dd, "__self__", fun_dd)
    ck = (id(target), getattr(fun_dd, "__name__", None), cfg)
    if ck not in _DD_CACHE:
        _DD_PINS.append(target)
        _DD_CACHE[ck] = _make_engine(fun_dd, cfg)
    return _DD_CACHE[ck]


def dd_quad_cores(cores_hi, cores_lo, weights_hi, weights_lo) -> tuple:
    """dd quadrature of a dd train (mptt_quad, dmrggmp.f90:778-888):
    contract each core against its dd weight vector and chain the (r, r)
    products left to right."""
    vh = jnp.ones((1,))
    vl = jnp.zeros((1,))
    for c in range(len(cores_hi)):
        G = DD(jnp.asarray(cores_hi[c]), jnp.asarray(cores_lo[c]))
        W = DD(jnp.asarray(weights_hi[c]), jnp.asarray(weights_lo[c]))
        prod = dd_mul(G, DD(W.hi[None, :, None], W.lo[None, :, None]))
        M = dd_sum(prod, axis=1)
        prod = dd_mul(DD(vh[:, None], vl[:, None]), M)
        v = dd_sum(prod, axis=0)
        vh, vl = v.hi, v.lo
    return (float(vh[0]), float(vl[0]))


def cross_dd(
    fun_dd: Callable,
    n: Sequence[int],
    weights_hi, weights_lo,
    max_rank: int = 32,
    accuracy: float = 1e-28,
    pivoting: int = 1,
    key: int = 0,
    small_element: float = 1e-30,
    small_pivot: float = 1e-12,
    verbose: bool = False,
    truth=None,
) -> DDCrossResult:
    """Cross interpolation with dd pivot selection; returns the dd train and
    its quadrature value against dd weights (computed in dd on device).

    With verbose, prints the mp tier's per-iteration value line
    (dmrggmp.f90:655-672): the CURRENT cross contracted against the dd
    weights each sweep, with err vs `truth` (a Decimal-compatible string
    or float) or cnv vs the previous sweep."""
    n = tuple(int(x) for x in n)
    d = len(n)
    cfg = DDConfig(d=d, n=n, N=max(n), R=max_rank, piv=int(pivoting),
                   small_element=small_element, small_pivot=small_pivot)
    kit = get_dd_engine(fun_dd, cfg)
    init_fn, sweep_fn, finalize_fn = kit.init_fn, kit.sweep_fn, kit.finalize_fn

    st = init_fn(jax.random.PRNGKey(key) if isinstance(key, int) else key)
    from decimal import Decimal, localcontext

    wh_pad = wl_pad = None
    if verbose:   # per-sweep value telemetry only; skip the transfer otherwise
        wh_pad = np.zeros((d, cfg.N))
        wl_pad = np.zeros((d, cfg.N))
        for c in range(d):
            wh_pad[c, : n[c]] = np.asarray(weights_hi[c])
            wl_pad[c, : n[c]] = np.asarray(weights_lo[c])
        wh_pad = jnp.asarray(wh_pad)
        wl_pad = jnp.asarray(wl_pad)
    lacc = float(np.log10(accuracy))
    val_prev = None
    strike = 0
    it = 0
    while it + 1 < max_rank:
        it += 1
        st = sweep_fn(st, jnp.asarray(it))
        pm = float(st.pivotmax)     # log10 magnitudes (dmrggmp.f90:50-53)
        am = float(st.amax)
        if verbose:
            v = kit.value_fn(st, wh_pad, wl_pad)
            with localcontext() as ctx:
                ctx.prec = 50
                val = Decimal(float(v.hi)) + Decimal(float(v.lo))
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
                      f"lg(pivotmax) {pm:8.2f} lg(amax) {am:8.2f} "
                      f"n_evals {int(st.neval)} {tag} val {val:.32e}")
        if pm <= lacc + am:
            strike += 1
        else:
            strike = 0
        if strike >= 3:
            break

    solved = finalize_fn(st)
    rk = np.asarray(st.rk)
    sh = np.asarray(solved.hi)
    sl = np.asarray(solved.lo)
    cores_hi = [sh[c][: rk[c], : n[c], : rk[c + 1]] for c in range(d)]
    cores_lo = [sl[c][: rk[c], : n[c], : rk[c + 1]] for c in range(d)]

    # dd quadrature of the dd train (mptt_quad)
    value = dd_quad_cores(cores_hi, cores_lo, weights_hi, weights_lo)

    return DDCrossResult(cores_hi=cores_hi, cores_lo=cores_lo, value=value,
                         neval=int(st.neval), sweeps=it,
                         ranks=tuple(int(x) for x in rk))
