#!/usr/bin/env python
"""High-precision Ising C_m with the double-double ENGINE:
`crs_ising_mp.py INDEX N RANK` (the test_mpf_ising role, README.md:52,
backed by the full mptt_dmrgg analogue cross/engine_dd.py — every fiber,
factor, and residual hunt runs in double-double arithmetic).

Measured vs Bailey's 500-digit constants: C_4 n=65 rank 32 -> 31.1 correct
digits (the dd arithmetic limit); C_6 rank 48 -> 18.3, rank 64 -> deeper."""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from decimal import Decimal, getcontext

import ttcross_tpu  # noqa: F401
from ttcross_tpu import native
from ttcross_tpu.apps.ising import make_ising_dd
from ttcross_tpu.apps.truths import ISING_C_STR
from ttcross_tpu.cross.engine_dd import cross_dd
from ttcross_tpu.utils import print_config, readarg


def main():
    m = readarg(1, 4)
    n = readarg(2, 65)
    rank = readarg(3, 32)
    if not native.available():
        print("native toolchain unavailable; the dd tier needs it")
        return 1

    prob, fun_dd, wh, wl = make_ising_dd(m=m, n=n)
    print_config(integral=f"C_{m}", quadratur=prob.n, TT_ranks=rank,
                 tier="double-double engine")
    res = cross_dd(fun_dd, [prob.n] * prob.d, wh, wl, max_rank=rank,
                   pivoting=1, verbose=True)
    getcontext().prec = 60
    got = Decimal(res.value[0]) + Decimal(res.value[1])
    print(f"computed value: {got}")
    print(f"...with {res.neval} dd evaluations, ranks {res.ranks}")
    if m in ISING_C_STR:
        tru = Decimal(ISING_C_STR[m])
        rel = abs(1 - got / tru)
        digits = float(-rel.log10()) if rel != 0 else 60.0
        print(f"analytic value: {tru}")
        print(f"correct digits: {digits:7.2f}")
    print("Good bye.")


if __name__ == "__main__":
    main()
