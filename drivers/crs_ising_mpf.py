#!/usr/bin/env python
"""Arbitrary-precision Ising integrals with the full mp cross engine:
`crs_ising_mpf.py KIND INDEX N RANK DPS WORKERS` (the reference's
test_mpf_ising role, README.md:52, backed by cross/engine_mp.py = the
mptt_dmrgg analogue, dmrggmp.f90:11-704).  Host-bound by design, like the
reference's MPFUN-MPFR tier; defaults to the reference's 120 decimal
digits (mpipl, mpfunf.f90:63).  WORKERS > 1 runs the bond-slab
DISTRIBUTED mp engine (parallel/engine_mp.py — the `mpirun -np N` mode of
dmrggmp.f90:518-629) over host worker processes."""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from mpmath import mp, workdps

from ttcross_tpu.apps.ising import make_ising_mp
from ttcross_tpu.apps.truths import ising_truth_mp
from ttcross_tpu.cross.engine_mp import cross_mp
from ttcross_tpu.utils import print_config, readarg


def main():
    kind = readarg(1, "C")
    m = readarg(2, 4)
    n = readarg(3, 65)
    rank = readarg(4, 48)
    dps = readarg(5, 120)
    workers = readarg(6, 1)

    d, n, fun_mp, quad_w, truth = make_ising_mp(kind, m=m, n=n, dps=dps)
    print_config(integral=f"{kind}_{m}", quadratur=n, TT_ranks=rank,
                 precision=f"{dps} decimal digits (mpmath)",
                 workers=workers)
    if workers > 1:
        from ttcross_tpu.parallel.engine_mp import cross_mp_parallel

        res = cross_mp_parallel(fun_mp, [n] * d, max_rank=rank, pivoting=1,
                                quad=quad_w, truth=truth, dps=dps,
                                verbose=True, n_workers=workers)
    else:
        res = cross_mp(fun_mp, [n] * d, max_rank=rank, pivoting=1,
                       quad=quad_w, truth=truth, dps=dps, verbose=True)
    with workdps(dps):
        print(f"computed value: {mp.nstr(res.value, dps)}")
        print(f"...with {res.neval} mp evaluations, ranks {res.ranks}")
        tru = ising_truth_mp(kind, m, dps)
        rel = abs(1 - res.value / tru)
        digits = float(-mp.log10(rel)) if rel != 0 else float(dps)
        print(f"analytic value: {mp.nstr(tru, dps)}")
        print(f"correct digits: {digits:7.2f}")
    print("Good bye.")


if __name__ == "__main__":
    main()
