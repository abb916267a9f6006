"""Distributed quad-double cross over host worker processes.

The qd sibling of the distributed mp tier (parallel/engine_mp.py — the
reference's MPI-parallel multiprecision path, dmrggmp.f90:518-629):
`cross_qd` (cross/engine_qd.py) is a host/numpy engine, so the
distribution unit is the HOST PROCESS — a pool of forked workers, each
running the shared QdEngine over its own bond slab, exchanging
per-sweep tapes through a parent hub.  Tape payloads are QD
structs-of-arrays (four f64 limb arrays), pickled over pipes — the
limb-array analogue of the reference's mpwds6-word MPI messages and of
the mp tier's pickled-mpf tapes.

Consistency model: identical to the mp tier (see parallel/engine_mp.py
module doc) — replicated vip/ranks/inverses via tape replay,
owner-authoritative cores/factors, corner-fiber padding at slab edges,
non-owned accepts landing one iteration late (the reference's own
staleness license, dmrgg.f90:822-850).

Workers use only numpy, never JAX, so forking from the jax-initialized
parent is safe (same license as cross_mp_parallel)."""

from __future__ import annotations

import multiprocessing as _mp
from typing import Callable, Sequence

import numpy as np

from ..cross.engine_mp import _walk_index
from ..cross.engine_qd import (QD_DPS, QdCrossResult, QdEngine, _expand,
                               _np_qd)
from ..ops.qd import (QD, qd_concat, qd_get, qd_matmul, qd_to_mp,
                      qd_tt_value, qd_vdot_axis)
from .mesh import share

__all__ = ["cross_qd_parallel"]


def _owned_bonds(own, w):
    return range(int(own[w]), int(own[w + 1]))


def _owned_cores(own, w, d, nw):
    cores = set(range(int(own[w]), int(own[w + 1])))
    if w == nw - 1:
        cores.add(d - 1)
    return cores


def _fixup_fiber_row(eng: QdEngine, rec):
    """Pad a remote acol with the missing row when bond b-1 accepted this
    sweep after the owner evaluated it (corner fiber, dmrgg.f90:928-932)."""
    b = rec["b"]
    acol = rec["acol"]
    _, _, kk, qq = rec["ijkq"]
    r_cur = eng.r[b]                      # post-replay rank of bond b-1
    if acol.e0.shape[0] == r_cur:
        return acol
    rows = []
    for i in range(acol.e0.shape[0], r_cur):
        idx = np.array([_walk_index(eng.vip, b, eng.d, i, j, kk, qq)
                        for j in range(eng.n[b])], dtype=np.int64)
        v = eng._eval(idx)
        rows.append(QD(*(e.reshape(1, eng.n[b]) for e in v)))
    return qd_concat([acol] + rows, axis=0)


def _fixup_fiber_col(eng: QdEngine, rec):
    """Pad a remote arow with the missing column when bond b+1 accepted
    this sweep (the other boundary direction)."""
    b = rec["b"]
    arow = rec["arow"]
    ii, jj, _, _ = rec["ijkq"]
    r_cur = eng.r[b + 2]
    if arow.e0.shape[1] == r_cur:
        return arow
    cols = []
    for q in range(arow.e0.shape[1], r_cur):
        idx = np.array([_walk_index(eng.vip, b, eng.d, ii, jj, k, q)
                        for k in range(eng.n[b + 1])], dtype=np.int64)
        v = eng._eval(idx)
        cols.append(QD(*(e.reshape(eng.n[b + 1], 1) for e in v)))
    return qd_concat([arow] + cols, axis=1)


def _worker_value_partial(eng: QdEngine, w, own_cores):
    """Ordered product of the LU-solved (r, r) quadrature mats of the
    locally-owned cores (the local half of mptt_quad's tree reduce)."""
    v = None
    for c in sorted(own_cores):
        M = qd_vdot_axis(eng.G[c], qd_get(w[c], slice(0, eng.G[c].e0.shape[1])), 1)
        if c > 0:
            M = qd_matmul(eng.itl[c - 1], M)
        if c < eng.d - 1:
            M = qd_matmul(M, eng.itt[c])
        v = M if v is None else qd_matmul(v, M)
    return v


def _worker_main(conn, wid, nw, own, fun_qd, n, max_rank, pivoting,
                 small_element_log10, small_pivot_log10, snum, seed):
    try:
        d = len(n)
        my_bonds = list(_owned_bonds(own, wid))
        my_cores = _owned_cores(own, wid, d, nw)
        eng = QdEngine(fun_qd, n, max_rank, pivoting,
                       small_element_log10, small_pivot_log10, snum,
                       seed + 7919 * wid)
        eng.init_state()
        if nw > 1:
            eng.own_cores = my_cores
        init_neval = eng.neval
        conn.send(("ready", init_neval))
        # quadrature arrives over the pipe as numpy-limb QDs, converted by
        # the parent AFTER forking: converting pre-fork would initialize
        # the jax runtime in the parent for a jax-backed quad (fork-after-
        # jax-init deadlock class), converting in the child would touch
        # jax-backed arrays from a forked copy of it
        msg = conn.recv()
        assert msg[0] == "quad"
        w = msg[1]

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
                if b - 1 in my_bonds:
                    eng.apply_left_slice(b, rec["acol"])
                if b + 1 in my_bonds:
                    eng.apply_right_slice(b, rec["arow"])
                recs.append(rec)
            conn.send(("tape", recs, eng.log_amax,
                       eng.neval - init_neval))

            all_recs, g_amax = conn.recv()
            eng.log_amax = max(eng.log_amax, g_amax)
            remote = [r for r in all_recs if r["b"] not in my_bonds]
            for rec in sorted(remote, key=lambda r: r["b"]):
                eng.replay_remote(rec)
            for rec in sorted(remote, key=lambda r: r["b"]):
                b = rec["b"]
                # pad each boundary fiber only if THIS worker consumes it
                # (the pad evaluates n[b] qd integrand points per missing
                # row/col — wasted work on the unused side)
                if (b in my_cores) or (b - 1 in my_bonds):
                    acol = _fixup_fiber_row(eng, rec)
                    if b in my_cores:
                        eng.G[b] = qd_concat([eng.G[b], _expand(acol, 2)],
                                             axis=2)
                    if b - 1 in my_bonds:
                        eng.apply_left_slice(b, acol)
                if (b + 1 in my_cores) or (b + 1 in my_bonds and
                                           b + 1 <= d - 2):
                    arow = _fixup_fiber_col(eng, rec)
                    if b + 1 in my_cores:
                        eng.G[b + 1] = qd_concat(
                            [eng.G[b + 1], _expand(arow, 0)], axis=0)
                    if b + 1 in my_bonds and b + 1 <= d - 2:
                        eng.apply_right_slice(b, arow)
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


def cross_qd_parallel(
    fun_qd: Callable,
    n: Sequence[int],
    max_rank: int = 24,
    pivoting: int = 1,
    quad: Sequence | None = None,
    truth=None,
    accuracy_log10: float | None = None,
    small_element_log10: float | None = None,
    small_pivot_log10: float = -7.0,
    snum: int = 8,
    seed: int = 0,
    verbose: bool = False,
    n_workers: int = 2,
    mybonds=None,
) -> QdCrossResult:
    """Bond-slab-distributed quad-double TT-cross: the ~62-digit tier's
    `mpirun -np N` path (mptt_dmrgg's MPI mode, dmrggmp.f90:518-629).
    Same contract as cross_qd plus n_workers / mybonds; requires
    n_workers <= d-1 (dmrgg.f90:114-117).  fun_qd must be
    fork-inheritable (any host-side callable is; it is never pickled)."""
    from mpmath import mp, mpf, workdps

    n = tuple(int(x) for x in n)
    d = len(n)
    if d < 2:
        raise ValueError("cross_qd_parallel requires d >= 2")
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
    lacc = accuracy_log10 if accuracy_log10 is not None else -QD_DPS + 4

    ctx = _mp.get_context("fork")
    conns, procs = [], []
    for wid in range(nw):
        pc, cc = ctx.Pipe()
        p = ctx.Process(target=_worker_main,
                        args=(cc, wid, nw, own, fun_qd, n, max_rank,
                              pivoting, small_element_log10,
                              small_pivot_log10, snum, seed),
                        daemon=True)
        p.start()
        cc.close()
        conns.append(pc)
        procs.append(p)

    def _recv(c):
        msg = c.recv()
        if msg[0] == "error":
            raise RuntimeError(f"qd worker failed:\n{msg[1]}")
        return msg

    try:
        init_neval = None
        for c in conns:
            msg = _recv(c)
            assert msg[0] == "ready"
            init_neval = msg[1]

        # NOW (post-fork) convert the quadrature to numpy limb arrays and
        # ship it: no jax state existed when the workers forked, and the
        # children never touch jax-backed objects
        w = [_np_qd(quad[c]) for c in range(d)] if quad is not None else None
        for c in conns:
            c.send(("quad", w))

        history = []
        strike = 0
        it = 0
        neval = init_neval
        while it + 1 < max_rank:
            it += 1
            for c in conns:
                c.send(("sweep", it))
            all_recs, log_amax = [], -float("inf")
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
                    v = part if v is None else qd_matmul(v, part)
                rec["value"] = qd_get(v, (0, 0))
                if truth is not None:
                    with workdps(QD_DPS + 15):
                        rec["err"] = abs(
                            1 - qd_to_mp(*(np.asarray(e)
                                           for e in rec["value"]))
                            / mpf(truth))
            history.append(rec)
            if verbose:
                line = (f"{it:3d}{rec['dir']} qd[{nw}w] n_evals {neval:9d} "
                        f"log10|pivot| "
                        f"{log_pivotmax if log_pivotmax is not None else float('-inf'):8.2f}")
                if rec["err"] is not None:
                    with workdps(QD_DPS + 15):
                        line += (f" err {mp.nstr(rec['err'], 5)} "
                                 f"val {mp.nstr(qd_to_mp(*(np.asarray(e) for e in rec['value'])), 40)}")
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
        value = qd_tt_value(cores, w) if w is not None else None
        return QdCrossResult(cores=cores, value=value, neval=neval,
                             sweeps=it, ranks=ranks, history=history)
    finally:
        for p in procs:
            if p.is_alive():
                p.terminate()
        for p in procs:
            p.join(timeout=10)
