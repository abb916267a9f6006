"""Shared bond-slab host-worker hub for the beyond-f64 tiers.

The mp (120-digit mpmath) and qd (quad-double) engines are host-bound,
so their distribution unit is the HOST PROCESS: a pool of forked workers,
each running its tier's engine over an owned bond slab, exchanging
per-sweep tapes through this parent hub.  The consistency model is the
reference's MPI mp mode (mptt_dmrgg, dmrggmp.f90:518-629):

  * vip / ranks / bordered triangular inverses are REPLICATED — every
    worker replays every remote accept from the tape in bond order;
  * cores and col/row factors are OWNER-authoritative; cross-slab
    updates arrive as the accepted raw fibers in the tape, padded with
    freshly evaluated corner rows/columns when the adjacent bond also
    accepted this sweep (dmrgg.f90:928-932) — and only on the side this
    worker actually consumes;
  * non-owned accepts land after the sweep, one iteration late — the
    staleness license of dmrgg.f90:822-850.

The two tiers share this protocol verbatim and differ only in their
arithmetic (object-mpf ndarrays vs QD limb structs-of-arrays); a
TierAdapter supplies the dozen type-specific operations.  Workers are
forked (closures and adapters need no pickling) and never touch JAX; the
quadrature is converted by the parent AFTER forking and shipped over the
pipes, so neither the pre-fork parent nor any child converts jax-backed
arrays (fork-after-jax-init hazard).
"""

from __future__ import annotations

import multiprocessing as _mp
from contextlib import nullcontext

import numpy as np

from .mesh import share

__all__ = ["TierAdapter", "run_hub"]


class TierAdapter:
    """Type-specific operations a tier plugs into the hub protocol.

    Subclasses (one per tier, in engine_mp/engine_qd) override everything
    below; the base class documents the contract."""

    tag = ""             # verbose-line prefix inside [..w], e.g. "qd"

    def worker_ctx(self):
        """Context manager active for the whole worker lifetime (mp wraps
        workdps; qd needs nothing)."""
        return nullcontext()

    def parent_ctx(self):
        """Context manager active for the parent driver loop."""
        return nullcontext()

    def make_engine(self, fun, n, max_rank, pivoting, snum, seed):
        raise NotImplementedError

    def prep_quad(self, quad, n):
        """Convert the caller's quadrature to the tier's host
        representation (runs in the PARENT, post-fork)."""
        raise NotImplementedError

    def prep_truth(self, truth):
        return truth

    def fixup_row(self, eng, rec):
        """Return rec's acol padded with any missing corner rows."""
        raise NotImplementedError

    def fixup_col(self, eng, rec):
        """Return rec's arow padded with any missing corner columns."""
        raise NotImplementedError

    def append_core_right(self, eng, b, arow):
        raise NotImplementedError

    def value_partial(self, eng, w, own_cores):
        """Ordered product of the LU-solved (r, r) quadrature mats of the
        locally-owned cores (the local half of mptt_quad's tree reduce,
        dmrggmp.f90:778-888)."""
        raise NotImplementedError

    def combine_parts(self, v, part):
        """Ordered product fold of two slab partials (None = identity)."""
        raise NotImplementedError

    def value_scalar(self, v):
        """Extract the (0, 0) scalar of the folded product."""
        raise NotImplementedError

    def err(self, value, truth):
        """|1 - value/truth| in the tier's precision (truth prepped)."""
        raise NotImplementedError

    def fmt_err_val(self, rec):
        """' err ... val ...' suffix for the verbose per-sweep line."""
        raise NotImplementedError

    def tt_value(self, cores, w):
        """Full-train quadrature value from the solved cores."""
        raise NotImplementedError

    def make_result(self, cores, value, neval, sweeps, ranks, history):
        raise NotImplementedError


def _owned_bonds(own, w):
    return range(int(own[w]), int(own[w + 1]))


def _owned_cores(own, w, d, nw):
    cores = set(range(int(own[w]), int(own[w + 1])))
    if w == nw - 1:
        cores.add(d - 1)
    return cores


def _worker_main(ad: TierAdapter, conn, wid, nw, own, fun, n, max_rank,
                 pivoting, snum, seed):
    try:
        with ad.worker_ctx():
            d = len(n)
            my_bonds = list(_owned_bonds(own, wid))
            my_cores = _owned_cores(own, wid, d, nw)
            eng = ad.make_engine(fun, n, max_rank, pivoting, snum,
                                 seed + 7919 * wid)
            eng.init_state()
            if nw > 1:
                eng.own_cores = my_cores
            init_neval = eng.neval
            conn.send(("ready", init_neval))
            # quadrature arrives over the pipe, converted by the parent
            # post-fork (see module doc)
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
                # owned cores, factor slices for slab-adjacent bonds; pad
                # each side only if THIS worker consumes it (the pad costs
                # n[b] integrand evals per missing row/col)
                for rec in sorted(remote, key=lambda r: r["b"]):
                    b = rec["b"]
                    # a remote bond's LEFT core b is never owner-local
                    # here (b <= d-2 and b not in my_bonds imply b not in
                    # my_cores — the +d-1 tail core is the only extra),
                    # so the left fixup only feeds the slab-adjacent
                    # factor slice
                    if b - 1 in my_bonds:
                        acol = ad.fixup_row(eng, rec)
                        eng.apply_left_slice(b, acol)
                    if (b + 1 in my_cores) or (b + 1 in my_bonds
                                               and b + 1 <= d - 2):
                        arow = ad.fixup_col(eng, rec)
                        if b + 1 in my_cores:
                            ad.append_core_right(eng, b, arow)
                        if b + 1 in my_bonds and b + 1 <= d - 2:
                            eng.apply_right_slice(b, arow)
                # update pivotmax_prev from the global sweep max
                lps = [r["lp"] for r in all_recs]
                if lps:
                    eng.log_pivotmax_prev = max(lps)
                part = None
                if w is not None:
                    part = ad.value_partial(eng, w, my_cores)
                conn.send(("done", eng.neval - init_neval, part))

            solved = {c: eng.solve_core(c) for c in sorted(my_cores)}
            conn.send(("cores", solved, eng.neval - init_neval,
                       tuple(eng.r)))
    except Exception as e:  # pragma: no cover - surfaced by the parent
        import traceback

        conn.send(("error", f"{e!r}\n{traceback.format_exc()}"))
    finally:
        conn.close()


def run_hub(ad: TierAdapter, fun, n, max_rank, pivoting, quad, truth,
            lacc, snum, seed, verbose, n_workers, mybonds, name: str):
    """The parent driver: spawn workers, run the sweep/tape/replay loop to
    the strike-3 stop, gather solved cores, return the tier's result."""
    n = tuple(int(x) for x in n)
    d = len(n)
    if d < 2:
        raise ValueError(f"{name} requires d >= 2")
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

    ctx = _mp.get_context("fork")
    conns, procs = [], []
    for wid in range(nw):
        pc, cc = ctx.Pipe()
        p = ctx.Process(target=_worker_main,
                        args=(ad, cc, wid, nw, own, fun, n, max_rank,
                              pivoting, snum, seed),
                        daemon=True)
        p.start()
        cc.close()
        conns.append(pc)
        procs.append(p)

    def _recv(c):
        msg = c.recv()
        if msg[0] == "error":
            raise RuntimeError(f"{name} worker failed:\n{msg[1]}")
        return msg

    try:
        with ad.parent_ctx():
            init_neval = None
            for c in conns:
                msg = _recv(c)
                assert msg[0] == "ready"
                init_neval = msg[1]

            # post-fork: now it is safe to touch possibly-jax-backed quad
            w = ad.prep_quad(quad, n) if quad is not None else None
            for c in conns:
                c.send(("quad", w))
            if truth is not None:
                truth = ad.prep_truth(truth)

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
                        v = ad.combine_parts(v, part)
                    rec["value"] = ad.value_scalar(v)
                    if truth is not None:
                        rec["err"] = ad.err(rec["value"], truth)
                history.append(rec)
                if verbose:
                    line = (f"{it:3d}{rec['dir']} {ad.tag}[{nw}w] "
                            f"n_evals {neval:9d} log10|pivot| "
                            f"{log_pivotmax if log_pivotmax is not None else float('-inf'):8.2f}")
                    if rec["err"] is not None:
                        line += ad.fmt_err_val(rec)
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
            value = ad.tt_value(cores, w) if w is not None else None
            return ad.make_result(cores=cores, value=value, neval=neval,
                                  sweeps=it, ranks=ranks, history=history)
    finally:
        for p in procs:
            if p.is_alive():
                p.terminate()
        for p in procs:
            p.join(timeout=10)
