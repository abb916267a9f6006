"""Distributed quad-double cross over host worker processes.

The qd sibling of the distributed mp tier (parallel/engine_mp.py — the
reference's MPI-parallel multiprecision path, dmrggmp.f90:518-629):
`cross_qd` (cross/engine_qd.py) is a host/numpy engine, so the
distribution unit is the HOST PROCESS — a pool of forked workers, each
running the shared QdEngine over its own bond slab, exchanging
per-sweep tapes through the shared parent hub (parallel/_hub.py).  Tape
payloads are QD structs-of-arrays (four f64 limb arrays), pickled over
pipes — the limb-array analogue of the reference's mpwds6-word MPI
messages and of the mp tier's pickled-mpf tapes.

Protocol, consistency model and process management live in _hub.py and
are shared verbatim with the mp tier; this module supplies only the
QD-limb arithmetic via a TierAdapter.  Workers use only numpy, never
JAX, so forking from the jax-initialized parent is safe (the quadrature
is converted post-fork in the parent and shipped over the pipes)."""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

from ..cross.hostwalk import walk_index as _walk_index
from ..cross.engine_qd import (QD_DPS, QdCrossResult, QdEngine, _expand,
                               _np_qd)
from ..ops.qd import (QD, qd_concat, qd_get, qd_matmul, qd_to_mp,
                      qd_tt_value, qd_vdot_axis)
from ._hub import TierAdapter, run_hub

__all__ = ["cross_qd_parallel"]


class _QdAdapter(TierAdapter):
    """QD limb-struct-of-arrays operations for the hub protocol."""

    tag = "qd"

    def __init__(self, small_element_log10, small_pivot_log10):
        self.se = small_element_log10
        self.sp = small_pivot_log10

    def make_engine(self, fun, n, max_rank, pivoting, snum, seed):
        return QdEngine(fun, n, max_rank, pivoting, self.se, self.sp,
                        snum, seed)

    def prep_quad(self, quad, n):
        return [_np_qd(quad[c]) for c in range(len(n))]

    def fixup_row(self, eng, rec):
        """Pad a remote acol with the missing row when bond b-1 accepted
        this sweep after the owner evaluated it (corner fiber,
        dmrgg.f90:928-932)."""
        b = rec["b"]
        acol = rec["acol"]
        _, _, kk, qq = rec["ijkq"]
        r_cur = eng.r[b]                  # post-replay rank of bond b-1
        if acol.e0.shape[0] == r_cur:
            return acol
        rows = []
        for i in range(acol.e0.shape[0], r_cur):
            idx = np.array([_walk_index(eng.vip, b, eng.d, i, j, kk, qq)
                            for j in range(eng.n[b])], dtype=np.int64)
            v = eng._eval(idx)
            rows.append(QD(*(e.reshape(1, eng.n[b]) for e in v)))
        return qd_concat([acol] + rows, axis=0)

    def fixup_col(self, eng, rec):
        """Pad a remote arow with the missing column when bond b+1
        accepted this sweep (the other boundary direction)."""
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

    def append_core_right(self, eng, b, arow):
        eng.G[b + 1] = qd_concat([eng.G[b + 1], _expand(arow, 0)], axis=0)

    def value_partial(self, eng, w, own_cores):
        v = None
        for c in sorted(own_cores):
            M = qd_vdot_axis(eng.G[c],
                             qd_get(w[c], slice(0, eng.G[c].e0.shape[1])), 1)
            if c > 0:
                M = qd_matmul(eng.itl[c - 1], M)
            if c < eng.d - 1:
                M = qd_matmul(M, eng.itt[c])
            v = M if v is None else qd_matmul(v, M)
        return v

    def combine_parts(self, v, part):
        return part if v is None else qd_matmul(v, part)

    def value_scalar(self, v):
        return qd_get(v, (0, 0))

    def err(self, value, truth):
        from mpmath import workdps

        with workdps(QD_DPS + 15):
            return abs(1 - qd_to_mp(*(np.asarray(e) for e in value)) / truth)

    def prep_truth(self, truth):
        from mpmath import mpf, workdps

        # convert at qd-plus precision: the ~1000-digit truth strings must
        # not be truncated at the ambient (default 15-digit) mp.dps
        with workdps(QD_DPS + 15):
            return mpf(truth) if not isinstance(truth, mpf) else truth

    def fmt_err_val(self, rec):
        from mpmath import mp, workdps

        with workdps(QD_DPS + 15):
            return (f" err {mp.nstr(rec['err'], 5)} val "
                    f"{mp.nstr(qd_to_mp(*(np.asarray(e) for e in rec['value'])), 40)}")

    def tt_value(self, cores, w):
        return qd_tt_value(cores, w)

    def make_result(self, cores, value, neval, sweeps, ranks, history):
        return QdCrossResult(cores=cores, value=value, neval=neval,
                             sweeps=sweeps, ranks=ranks, history=history)


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
    lacc = accuracy_log10 if accuracy_log10 is not None else -QD_DPS + 4
    ad = _QdAdapter(small_element_log10, small_pivot_log10)
    return run_hub(ad, fun_qd, n, max_rank, pivoting, quad, truth, lacc,
                   snum, seed, verbose, n_workers, mybonds,
                   name="cross_qd_parallel")
