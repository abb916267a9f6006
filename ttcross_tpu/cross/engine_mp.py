"""Arbitrary-precision DMRG-greedy cross engine (the mptt_dmrgg analogue).

Full-precision mirror of the reference's multiprecision tier
(dmrggmp.f90:11-704): every value — fibers, factors, residuals, the
bordered triangular inverses, the per-sweep quadrature — is an mpmath mpf
at a configurable working precision (default 120 decimal digits, the
reference's compile-time `mpipl`, mpfunf.f90:63).  Like the reference's
MPFUN tier this path is host/CPU-bound; the TPU tiers (f64 engine,
double-double engine, defect correction) cover the accelerated regimes.

Reference-fidelity notes:
  * thresholds and `amax` live in the log10 domain (dmrggmp.f90:50-53,
    107, 364): `small_element = -dps + 2`, `small_pivot = -7`, so crosses
    survive dynamic ranges far beyond f64 exponents (the D/E rescaling
    regime, test_crs_ising.f90:135-144).
  * a per-iteration quadrature value and err/cnv line is produced
    (dmrggmp.f90:655-672), unlike cross_dd which only reports pivots.
  * ragged host arrays grow rank-by-rank exactly like the Fortran
    reallocate-on-accept pattern — on the host there is no reason to pad.

The hunt is rook pivoting (lottery seed + alternating column/row
maximization with stationarity exit, dmrggmp.f90 mirror of
dmrgg.f90:410-582).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Sequence

import numpy as np
from mpmath import mp, mpf

from ..ops.mp import mag10, mp_zeros, workdps

__all__ = ["cross_mp", "MpCrossResult", "mp_tt_value"]


@dataclass
class MpCrossResult:
    cores: list              # solved ragged object arrays (r, n, r')
    value: object            # mpf quadrature value (None without quad)
    neval: int
    sweeps: int
    ranks: tuple
    history: list            # per-sweep dicts {it, dir, pivotmax_log10, value, err}


def _walk_index(vip, b, d, i, j, k, q):
    """Full multi-index for candidate (i, j, k, q) at bond b by walking the
    pivot chains (dmrgg_fun / mp_dmrgg_fun, dmrggmp.f90:706-718)."""
    ind = [0] * d
    t = i
    for s in range(b - 1, -1, -1):
        ind[s] = vip[s][t][1]
        t = vip[s][t][0]
    ind[b] = j
    ind[b + 1] = k
    t = q
    for s in range(b + 1, d - 1):
        ind[s + 1] = vip[s][t][2]
        t = vip[s][t][3]
    return ind


def _value_chain(G, itl, itt, w, d):
    """LU-solved quadrature contraction: prod_c itl[c-1] (sum_j G_c w_cj)
    itt[c] (ttqq + mptt_lua + mptt_quad, dmrggmp.f90:640-672)."""
    v = None
    for c in range(d):
        M = np.tensordot(G[c], w[c][: G[c].shape[1]], axes=[[1], [0]])
        if c > 0:
            M = itl[c - 1] @ M
        if c < d - 1:
            M = M @ itt[c]
        v = M if v is None else v @ M
    return v[0, 0]


def mp_tt_value(cores, w):
    """Plain quadrature contraction of a solved mp train (mptt_quad)."""
    v = None
    for c, G in enumerate(cores):
        M = np.tensordot(G, w[c][: G.shape[1]], axes=[[1], [0]])
        v = M if v is None else v @ M
    return v[0, 0]


def cross_mp(
    fun_mp: Callable,
    n: Sequence[int],
    max_rank: int = 24,
    pivoting: int = 1,
    quad: Sequence | None = None,
    truth=None,
    dps: int = 120,
    accuracy_log10: float | None = None,
    small_element_log10: float | None = None,
    small_pivot_log10: float = -7.0,
    snum: int = 8,
    seed: int = 0,
    verbose: bool = False,
) -> MpCrossResult:
    """Arbitrary-precision TT-cross (mptt_dmrgg, dmrggmp.f90:11-704).

    fun_mp: batched integrand ind (B, d) int -> (B,) object array of mpf,
    evaluated at mp.dps = dps.  quad: per-mode mp weight vectors.  truth:
    optional mpf for per-sweep err reporting.  Thresholds are log10-domain:
    small_element defaults to -dps + 2 (dmrggmp.f90:50)."""
    with workdps(dps):
        return _cross_mp_impl(fun_mp, n, max_rank, pivoting, quad, truth,
                              dps, accuracy_log10, small_element_log10,
                              small_pivot_log10, snum, seed, verbose)


def _cross_mp_impl(fun_mp, n, max_rank, pivoting, quad, truth, dps,
                   accuracy_log10, small_element_log10, small_pivot_log10,
                   snum, seed, verbose):
    n = tuple(int(x) for x in n)
    d = len(n)
    if d < 2:
        raise ValueError("cross_mp requires d >= 2")
    piv = max(int(pivoting), 0)
    lse = small_element_log10 if small_element_log10 is not None else -dps + 2
    lacc = accuracy_log10 if accuracy_log10 is not None else -dps + 4
    rng = np.random.default_rng(seed)
    neval = 0

    # ------------------------------------------------ initial pivot search
    # shifted diagonals (dmrgg.f90:151-217)
    nn = min(n)
    cand = np.zeros((snum * nn, d), dtype=np.int64)
    for s in range(snum):
        for k in range(nn):
            cand[s * nn + k] = [(k + s * p) % n[p] for p in range(d)]
    vals = fun_mp(cand)
    neval += len(cand)
    best = int(max(range(len(vals)), key=lambda i: abs(vals[i])))
    log_amax = mag10(vals[best])
    ind0 = cand[best]

    vip = [[(0, int(ind0[b]), int(ind0[b + 1]), 0)] for b in range(d - 1)]
    r = [1] * (d + 1)

    # rank-1 fibers (dmrgg.f90:220-248)
    G = []
    for c in range(d):
        fib = np.tile(ind0, (n[c], 1))
        fib[:, c] = np.arange(n[c])
        fv = fun_mp(fib)
        neval += n[c]
        log_amax = max(log_amax, max(mag10(v) for v in fv))
        G.append(fv.reshape(1, n[c], 1))
    delta = G[0][0, ind0[0], 0]
    Cf = [G[b] / delta for b in range(d - 1)]
    Rf = [G[b + 1].copy() for b in range(d - 1)]
    itl = [np.array([[mpf(1)]], dtype=object) for _ in range(d - 1)]
    itt = [np.array([[1 / delta]], dtype=object) for _ in range(d - 1)]

    if quad is not None:
        w = [np.array([mpf(v) for v in np.asarray(quad[c], dtype=object)],
                      dtype=object) for c in range(d)]
    else:
        w = None

    def eval_col(b, kk, qq):
        """Raw column fiber (r[b], n[b]) at fixed (kk, qq)."""
        idx = np.array([_walk_index(vip, b, d, i, j, kk, qq)
                        for i in range(r[b]) for j in range(n[b])], dtype=np.int64)
        v = fun_mp(idx)
        return v.reshape(r[b], n[b])

    def eval_row(b, ii, jj):
        idx = np.array([_walk_index(vip, b, d, ii, jj, k, q)
                        for k in range(n[b + 1]) for q in range(r[b + 2])], dtype=np.int64)
        v = fun_mp(idx)
        return v.reshape(n[b + 1], r[b + 2])

    def argmax_abs(a):
        flat = a.reshape(-1)
        bi = int(max(range(flat.size), key=lambda i: abs(flat[i])))
        return np.unravel_index(bi, a.shape)

    history = []
    strike = 0
    it = 0
    log_pivotmax_prev = log_amax
    while it + 1 < max_rank:
        it += 1
        dir_fwd = it % 2 == 1
        bonds = range(d - 1) if dir_fwd else range(d - 2, -1, -1)
        log_pivotmax = None
        for b in bonds:
            # ---- lottery seed over unused (i,j) x (k,q) (dmrgg.f90:410-487)
            used_c = {(pv[0], pv[1]) for pv in vip[b]}
            used_r = {(pv[2], pv[3]) for pv in vip[b]}
            all_c = [(i, j) for i in range(r[b]) for j in range(n[b])
                     if (i, j) not in used_c]
            all_r = [(k, q) for k in range(n[b + 1]) for q in range(r[b + 2])
                     if (k, q) not in used_r]
            if not all_c or not all_r:
                continue
            nlot = r[b] + n[b] + n[b + 1] + r[b + 2]
            sel_c = [all_c[i] for i in rng.integers(0, len(all_c), nlot)]
            sel_r = [all_r[i] for i in rng.integers(0, len(all_r), nlot)]
            idx = np.array([_walk_index(vip, b, d, i, j, k, q)
                            for (i, j), (k, q) in zip(sel_c, sel_r)], dtype=np.int64)
            bvals = fun_mp(idx)
            neval += nlot
            log_amax = max(log_amax, max(mag10(v) for v in bvals))
            # residual scoring against Cf . Rf
            resid = [bvals[t]
                     - np.dot(Cf[b][sel_c[t][0], sel_c[t][1], :],
                              Rf[b][:, sel_r[t][0], sel_r[t][1]])
                     for t in range(nlot)]
            bi = int(max(range(nlot), key=lambda t: abs(resid[t])))
            (ii, jj), (kk, qq) = sel_c[bi], sel_r[bi]
            pivot = resid[bi]

            # ---- rook passes (dmrgg.f90:515-582)
            acol = arow = None
            havecol = haverow = False
            crs = 0
            skipcol = not dir_fwd
            done = piv == 0
            if piv == 0:
                acol = eval_col(b, kk, qq)
                arow = eval_row(b, ii, jj)
                neval += r[b] * n[b] + n[b + 1] * r[b + 2]
                havecol = haverow = True
            while not done:
                if not skipcol:
                    acol = eval_col(b, kk, qq)
                    neval += r[b] * n[b]
                    havecol = True
                    crs += 1
                    if not (havecol and haverow and crs >= 2 * piv):
                        bcol = acol - np.tensordot(Cf[b], Rf[b][:, kk, qq],
                                                   axes=[[2], [0]])
                        i2, j2 = argmax_abs(bcol)
                        stat = havecol and haverow and (i2, j2) == (ii, jj)
                        ii, jj, pivot = int(i2), int(j2), bcol[i2, j2]
                        if stat:
                            break
                    else:
                        break
                skipcol = False
                arow = eval_row(b, ii, jj)
                neval += n[b + 1] * r[b + 2]
                haverow = True
                crs += 1
                if not (havecol and haverow and crs >= 2 * piv):
                    brow = arow - np.tensordot(Cf[b][ii, jj, :], Rf[b],
                                               axes=[[0], [0]])
                    k2, q2 = argmax_abs(brow)
                    stat = havecol and haverow and (k2, q2) == (kk, qq)
                    kk, qq, pivot = int(k2), int(q2), brow[k2, q2]
                    if stat:
                        break
                else:
                    break
            if not havecol:
                acol = eval_col(b, kk, qq)
                neval += r[b] * n[b]
            if not haverow:
                arow = eval_row(b, ii, jj)
                neval += n[b + 1] * r[b + 2]
            log_amax = max(log_amax,
                           max(mag10(v) for v in acol.reshape(-1)),
                           max(mag10(v) for v in arow.reshape(-1)))

            # ---- two-threshold accept, log domain (dmrggmp.f90:364)
            lp = mag10(pivot)
            if not (lp > lse + log_amax and lp > small_pivot_log10 + log_pivotmax_prev
                    and r[b + 1] < max_rank):
                continue
            log_pivotmax = lp if log_pivotmax is None else max(log_pivotmax, lp)
            s = r[b + 1]
            c_new = Cf[b][ii, jj, :].copy()
            u_new = Rf[b][:, kk, qq].copy()
            vip[b].append((ii, jj, kk, qq))

            # raw fibers into cores
            G[b] = np.concatenate([G[b], acol[:, :, None]], axis=2)
            G[b + 1] = np.concatenate([G[b + 1], arow[None, :, :]], axis=0)
            # factor borders (d2_lual/d2_luar incremental, lr.f90:124-154)
            new_colf = (acol - np.tensordot(Cf[b], u_new, axes=[[2], [0]])) / pivot
            Cf[b] = np.concatenate([Cf[b], new_colf[:, :, None]], axis=2)
            new_rowf = arow - np.tensordot(c_new, Rf[b], axes=[[0], [0]])
            Rf[b] = np.concatenate([Rf[b], new_rowf[None, :, :]], axis=0)
            # bordered inverses
            row_new = np.concatenate([-(c_new @ itl[b]), [mpf(1)]])
            itl[b] = np.block([[itl[b], mp_zeros((s, 1))], [row_new[None, :]]])
            col_new = np.concatenate([-(itt[b] @ u_new) / pivot, [1 / pivot]])
            itt[b] = np.block([[itt[b], col_new[:s, None]],
                               [mp_zeros((1, s)), col_new[s:, None]]])
            # neighbour factor slices (dmrgg.f90:715-749)
            if b > 0:
                slc = itl[b - 1] @ acol
                Rf[b - 1] = np.concatenate([Rf[b - 1], slc[:, :, None]], axis=2)
            if b < d - 2:
                slc = arow @ itt[b + 1]
                Cf[b + 1] = np.concatenate([Cf[b + 1], slc[None, :, :]], axis=0)
            r[b + 1] += 1

        # ---- per-iteration value / telemetry (dmrggmp.f90:655-672)
        rec = {"it": it, "dir": ">>" if dir_fwd else "<<",
               "pivotmax_log10": log_pivotmax, "n_evals": neval,
               "value": None, "err": None}
        if w is not None:
            val = _value_chain(G, itl, itt, w, d)
            rec["value"] = val
            if truth is not None:
                rel = abs(1 - val / mpf(truth))
                rec["err"] = rel
        history.append(rec)
        if verbose:
            line = (f"{it:3d}{rec['dir']} n_evals {neval:9d} "
                    f"log10|pivot| {log_pivotmax if log_pivotmax is not None else float('-inf'):8.2f}")
            if rec["err"] is not None:
                line += f" err {mp.nstr(rec['err'], 5)} val {mp.nstr(rec['value'], min(dps, 40))}"
            print(line)

        if log_pivotmax is not None:
            log_pivotmax_prev = log_pivotmax
        quiet = log_pivotmax is None or log_pivotmax <= lacc + log_amax
        strike = strike + 1 if quiet else 0
        if strike >= 3:
            break

    # ---- finalize: apply the triangular inverses (mptt_lua, dmrggmp.f90:720)
    solved = []
    for c in range(d):
        g = G[c]
        if c > 0:
            g = np.tensordot(itl[c - 1], g, axes=[[1], [0]])
        if c < d - 1:
            g = np.tensordot(g, itt[c], axes=[[2], [0]])
        solved.append(g)
    value = mp_tt_value(solved, w) if w is not None else None
    return MpCrossResult(cores=solved, value=value, neval=neval, sweeps=it,
                         ranks=tuple(r), history=history)
