"""Observability: structured per-sweep metrics and profiler hooks.

The reference's telemetry is a per-iteration text line from rank 0
(`it, dir, rank, time, n_evals[, err|cnv, val]`, dmrgg.f90:291-301,
969-1008) plus a total-evaluations counter.  Here the same signals come
back as structured records (JSONL-able) from the fused device run, and the
XLA profiler can be wrapped around any phase.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import asdict, dataclass

__all__ = ["SweepRecord", "history_from_run", "write_jsonl", "profile_trace", "Timer"]


@dataclass
class SweepRecord:
    it: int
    direction: str        # '>>' or '<<'
    n_evals: int
    pivotmax: float
    value: float | None = None
    err: float | None = None      # |1 - val/tru| when truth known
    cnv: float | None = None      # |1 - val/val_prev| otherwise


def history_from_run(last_it, vals, pmax, nev, truth=None, with_quad=False):
    """Build SweepRecords from the fused run's history arrays."""
    recs = []
    for i in range(1, int(last_it) + 1):
        rec = SweepRecord(
            it=i, direction=">>" if i % 2 == 1 else "<<",
            n_evals=int(nev[i]), pivotmax=float(pmax[i]),
        )
        if with_quad:
            rec.value = float(vals[i])
            if truth is not None:
                rec.err = abs(1.0 - rec.value / truth)
            elif vals[i - 1] != 0:
                rec.cnv = abs(1.0 - rec.value / float(vals[i - 1]))
        recs.append(rec)
    return recs


def write_jsonl(records, path: str) -> None:
    with open(path, "w") as f:
        for r in records:
            f.write(json.dumps({k: v for k, v in asdict(r).items() if v is not None}) + "\n")


@contextlib.contextmanager
def profile_trace(logdir: str):
    """XLA profiler capture around a phase (the profiler hook the reference
    lacks — SURVEY.md §5 'tracing/profiling')."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timer (timef analogue, timef.f90:25)."""

    def __init__(self):
        self.t0 = time.perf_counter()

    def __call__(self) -> float:
        return time.perf_counter() - self.t0
