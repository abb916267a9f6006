"""Distributed arbitrary-precision cross over host worker processes.

The reference's multiprecision engine is MPI-parallel: each rank owns a
bond slab, mp_real words travel over MPI as raw integer words, and
boundary blocks ship BOTH directions (mptt_dmrgg, dmrggmp.f90:518-629).
This module is that path for the rebuild's 120-digit tier: `cross_mp` is
a host/mpmath engine (like MPFUN itself), so the distribution unit is the
HOST PROCESS — a pool of workers, each running the shared MpEngine
(cross/engine_mp.py) over its own bond slab, exchanging per-sweep tapes
through a parent hub (pickled mpf payloads stand in for the reference's
mpwds6-word MPI messages).

Consistency model (the reference's own staleness license,
dmrgg.f90:822-850):
  * vip / ranks / bordered triangular inverses are REPLICATED — every
    worker replays every accept from the tape (pivot tuple + LU border
    vectors), in bond order, so these structures are bit-identical across
    workers;
  * cores and col/row factors are OWNER-authoritative; cross-slab updates
    arrive as the accepted raw fibers in the tape (the reference's
    boundary block exchange), padded with a freshly evaluated missing
    row/column when the adjacent bond also accepted this sweep (the
    reference's corner-fiber evaluation, dmrgg.f90:928-932);
  * non-owned accepts land after the sweep, one iteration late from the
    hunting worker's perspective — exactly the reference's semantics.

Workers are forked (closures need no pickling); they use only
mpmath/numpy, never JAX, so the parent's device runtime is untouched.
"""

from __future__ import annotations

import multiprocessing as _mp
from typing import Callable, Sequence

import numpy as np
from mpmath import mp, mpf

from ..cross.engine_mp import (MpCrossResult, MpEngine, _walk_index,
                               mp_tt_value)
from ..ops.mp import mag10, workdps
from .mesh import share

__all__ = ["cross_mp_parallel"]


def _owned_bonds(own, w):
    return range(int(own[w]), int(own[w + 1]))


def _owned_cores(own, w, d, nw):
    cores = set(range(int(own[w]), int(own[w + 1])))
    if w == nw - 1:
        cores.add(d - 1)
    return cores


def _fixup_fiber_row(eng: MpEngine, rec):
    """Pad a remote acol with the missing row when bond b-1 accepted this
    sweep after the owner evaluated it (corner fiber, dmrgg.f90:928-932)."""
    b = rec["b"]
    acol = rec["acol"]
    _, _, kk, qq = rec["ijkq"]
    r_cur = eng.r[b]                      # post-replay rank of bond b-1
    if acol.shape[0] == r_cur:
        return acol
    rows = []
    for i in range(acol.shape[0], r_cur):
        idx = np.array([_walk_index(eng.vip, b, eng.d, i, j, kk, qq)
                        for j in range(eng.n[b])], dtype=np.int64)
        v = eng.fun_mp(idx)
        eng.neval += len(idx)
        rows.append(v.reshape(1, eng.n[b]))
    return np.concatenate([acol] + rows, axis=0)


def _fixup_fiber_col(eng: MpEngine, rec):
    """Pad a remote arow with the missing column when bond b+1 accepted
    this sweep (the other boundary direction — the reference's mp engine
    ships both, dmrggmp.f90:518-629)."""
    b = rec["b"]
    arow = rec["arow"]
    ii, jj, _, _ = rec["ijkq"]
    r_cur = eng.r[b + 2]
    if arow.shape[1] == r_cur:
        return arow
    cols = []
    for q in range(arow.shape[1], r_cur):
        idx = np.array([_walk_index(eng.vip, b, eng.d, ii, jj, k, q)
                        for k in range(eng.n[b + 1])], dtype=np.int64)
        v = eng.fun_mp(idx)
        eng.neval += len(idx)
        cols.append(v.reshape(eng.n[b + 1], 1))
    return np.concatenate([arow] + cols, axis=1)


def _worker_value_partial(eng: MpEngine, w, own_cores):
    """Ordered product of the LU-solved (r, r) quadrature mats of the
    locally-owned cores (the local half of mptt_quad's tree reduce,
    dmrggmp.f90:778-888)."""
    v = None
    for c in sorted(own_cores):
        M = np.tensordot(eng.G[c], w[c][: eng.G[c].shape[1]], axes=[[1], [0]])
        if c > 0:
            M = eng.itl[c - 1] @ M
        if c < eng.d - 1:
            M = M @ eng.itt[c]
        v = M if v is None else v @ M
    return v


def _worker_main(conn, wid, nw, own, fun_mp, n, max_rank, pivoting, dps,
                 small_element_log10, small_pivot_log10, snum, seed, quad):
    try:
        with workdps(dps):
            d = len(n)
            my_bonds = list(_owned_bonds(own, wid))
            my_cores = _owned_cores(own, wid, d, nw)
            eng = MpEngine(fun_mp, n, max_rank, pivoting, dps,
                           small_element_log10, small_pivot_log10, snum,
                           seed + 7919 * wid)
            eng.init_state()
            if nw > 1:
                eng.own_cores = my_cores
            init_neval = eng.neval
            if quad is not None:
                w = [np.array([mpf(v) for v in np.asarray(quad[c], dtype=object)],
                              dtype=object) for c in range(d)]
            else:
                w = None
            conn.send(("ready", init_neval))

            while True:
                msg = conn.recv()
                if msg[0] == "stop":
                    break
                assert msg[0] == "sweep"
                it = msg[1]
                dir_fwd = it % 2 == 1
                bonds = my_bonds if dir_fwd else list(reversed(my_bonds))
                recs = []
                for b in bonds:
                    rec = eng.visit_bond(b, dir_fwd)
                    if rec is None:
                        continue
                    # owner-local neighbour slices (serial path does the
                    # same right after the visit)
                    if b - 1 in my_bonds:
                        eng.apply_left_slice(b, rec["acol"])
                    if b + 1 in my_bonds:
                        eng.apply_right_slice(b, rec["arow"])
                    recs.append(rec)
                conn.send(("tape", recs, eng.log_amax,
                           eng.neval - init_neval))

                all_recs, g_amax = conn.recv()
                eng.log_amax = max(eng.log_amax, g_amax)
                # replay every REMOTE accept (vip / rank / inverses),
                # sorted by bond so replicated state is identical
                remote = [r for r in all_recs if r["b"] not in my_bonds]
                for rec in sorted(remote, key=lambda r: r["b"]):
                    eng.replay_remote(rec)
                # boundary fixups with post-replay chains: raw fibers into
                # owned cores, factor slices for slab-adjacent bonds
                for rec in sorted(remote, key=lambda r: r["b"]):
                    b = rec["b"]
                    # pad each boundary fiber only if THIS worker consumes
                    # it (the pad evaluates n[b] mp integrand points per
                    # missing row/col — wasted work on the unused side)
                    if (b in my_cores) or (b - 1 in my_bonds):
                        acol = _fixup_fiber_row(eng, rec)
                        if b in my_cores:
                            eng.G[b] = np.concatenate(
                                [eng.G[b], acol[:, :, None]], axis=2)
                        if b - 1 in my_bonds:
                            eng.apply_left_slice(b, acol)
                    if (b + 1 in my_cores) or (b + 1 in my_bonds
                                               and b + 1 <= d - 2):
                        arow = _fixup_fiber_col(eng, rec)
                        if b + 1 in my_cores:
                            eng.G[b + 1] = np.concatenate(
                                [eng.G[b + 1], arow[None, :, :]], axis=0)
                        if b + 1 in my_bonds and b + 1 <= d - 2:
                            eng.apply_right_slice(b, arow)
                # update pivotmax_prev from the global sweep max
                lps = [r["lp"] for r in all_recs]
                if lps:
                    eng.log_pivotmax_prev = max(lps)
                part = None
                if w is not None:
                    part = _worker_value_partial(eng, w, my_cores)
                conn.send(("done", eng.neval - init_neval, part))

            solved = {c: eng.solve_core(c) for c in sorted(my_cores)}
            conn.send(("cores", solved, eng.neval - init_neval,
                       tuple(eng.r)))
    except Exception as e:  # pragma: no cover - surfaced by the parent
        import traceback

        conn.send(("error", f"{e!r}\n{traceback.format_exc()}"))
    finally:
        conn.close()


def cross_mp_parallel(
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
    n_workers: int = 2,
    mybonds=None,
) -> MpCrossResult:
    """Bond-slab-distributed arbitrary-precision TT-cross: the rebuild's
    `mpirun -np N` path for the mp tier (mptt_dmrgg's MPI mode,
    dmrggmp.f90:11-704).  Same contract as cross_mp plus n_workers /
    mybonds; requires n_workers <= d-1 (dmrgg.f90:114-117).

    fun_mp must be fork-inheritable (any host-side callable is; it is
    never pickled)."""
    n = tuple(int(x) for x in n)
    d = len(n)
    if d < 2:
        raise ValueError("cross_mp_parallel requires d >= 2")
    nw = int(n_workers)
    if nw < 1 or nw > d - 1:
        raise ValueError(f"n_workers must be in [1, d-1]; got {nw} for d={d}")
    if mybonds is None:
        own = share(d - 1, nw)
    else:
        own = np.asarray(mybonds, dtype=np.int64)
        if (own.shape != (nw + 1,) or own[0] != 0 or own[-1] != d - 1
                or np.any(np.diff(own) < 1)):
            raise ValueError(f"bad mybonds {own.tolist()}")
    lacc = accuracy_log10 if accuracy_log10 is not None else -dps + 4

    ctx = _mp.get_context("fork")
    conns, procs = [], []
    for wid in range(nw):
        pc, cc = ctx.Pipe()
        p = ctx.Process(target=_worker_main,
                        args=(cc, wid, nw, own, fun_mp, n, max_rank,
                              pivoting, dps, small_element_log10,
                              small_pivot_log10, snum, seed, quad),
                        daemon=True)
        p.start()
        cc.close()
        conns.append(pc)
        procs.append(p)

    def _recv(c):
        msg = c.recv()
        if msg[0] == "error":
            raise RuntimeError(f"mp worker failed:\n{msg[1]}")
        return msg

    try:
        with workdps(dps):
            init_neval = None
            for c in conns:
                msg = _recv(c)
                assert msg[0] == "ready"
                init_neval = msg[1]

            if quad is not None:
                w = [np.array([mpf(v) for v in np.asarray(quad[c], dtype=object)],
                              dtype=object) for c in range(d)]
            else:
                w = None
            if truth is not None:
                truth = mpf(truth) if not isinstance(truth, mpf) else truth

            history = []
            strike = 0
            it = 0
            neval = init_neval
            while it + 1 < max_rank:
                it += 1
                for c in conns:
                    c.send(("sweep", it))
                all_recs, log_amax = [], -mp.inf
                for c in conns:
                    msg = _recv(c)
                    assert msg[0] == "tape"
                    all_recs.extend(msg[1])
                    log_amax = max(log_amax, msg[2])
                all_recs.sort(key=lambda r: r["b"])
                for c in conns:
                    c.send((all_recs, log_amax))
                parts = []
                neval = init_neval
                for c in conns:
                    msg = _recv(c)
                    assert msg[0] == "done"
                    neval += msg[1]
                    parts.append(msg[2])

                lps = [r["lp"] for r in all_recs]
                log_pivotmax = max(lps) if lps else None
                rec = {"it": it, "dir": ">>" if it % 2 == 1 else "<<",
                       "pivotmax_log10": log_pivotmax, "n_evals": neval,
                       "value": None, "err": None}
                if w is not None:
                    v = None
                    for part in parts:       # ordered product over slabs
                        v = part if v is None else v @ part
                    rec["value"] = v[0, 0]
                    if truth is not None:
                        rec["err"] = abs(1 - rec["value"] / truth)
                history.append(rec)
                if verbose:
                    line = (f"{it:3d}{rec['dir']} [{nw}w] n_evals {neval:9d} "
                            f"log10|pivot| "
                            f"{log_pivotmax if log_pivotmax is not None else float('-inf'):8.2f}")
                    if rec["err"] is not None:
                        line += (f" err {mp.nstr(rec['err'], 5)} "
                                 f"val {mp.nstr(rec['value'], min(dps, 40))}")
                    print(line)

                quiet = log_pivotmax is None or log_pivotmax <= lacc + log_amax
                strike = strike + 1 if quiet else 0
                if strike >= 3:
                    break

            for c in conns:
                c.send(("stop",))
            cores = [None] * d
            ranks = None
            neval = init_neval
            for c in conns:
                msg = _recv(c)
                assert msg[0] == "cores"
                for ci, g in msg[1].items():
                    cores[ci] = g
                neval += msg[2]
                ranks = msg[3]
            assert all(g is not None for g in cores)
            value = mp_tt_value(cores, w) if w is not None else None
            return MpCrossResult(cores=cores, value=value, neval=neval,
                                 sweeps=it, ranks=ranks, history=history)
    finally:
        for p in procs:
            if p.is_alive():
                p.terminate()
        for p in procs:
            p.join(timeout=10)
