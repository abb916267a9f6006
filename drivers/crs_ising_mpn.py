#!/usr/bin/env python
"""Ising C/D/E at arbitrary precision via the NATIVE MPFR engine:
`crs_ising_mpn.py KIND INDEX N RANK PIV DPS` (the test_mpf_ising role,
README.md:52, at compiled speed — the reference's MPFUN-MPFR tier,
mpinterface.c:4-85 / dmrggmp.f90:11-704, played by
native/src/mpfr_cross.cpp).

Measured: C_4 n=33 rank 16 dps=120 -> 20 digits in ~0.1 s;
C_4 n=129 rank 48 dps=120 -> 54 digits in ~7 s (the same configs in the
pure-Python mpmath engine, drivers/crs_ising_mpf.py, run ~100x longer)."""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import ttcross_tpu  # noqa: F401
from ttcross_tpu import native
from ttcross_tpu.utils import print_config, readarg


def main():
    kind = str(readarg(1, "C")).upper()
    m = readarg(2, 4)
    n = readarg(3, 33)
    rank = readarg(4, 16)
    piv = readarg(5, 1)
    dps = readarg(6, 120)
    if not native.mpfr_available():
        print("native MPFR engine unavailable (needs g++ + libmpfr.so.6); "
              "use crs_ising_mpf.py (mpmath) instead")
        return 1

    from ttcross_tpu.cross.engine_mp_native import ising_cross_mp_native

    print("Hi, this is NATIVE-MPFR TT cross interpolation...")
    print_config(integral=f"{kind}_{m}", quadratur=n, TT_ranks=rank,
                 pivoting=piv, decimal_digits=dps)
    import time

    t0 = time.time()
    res = ising_cross_mp_native(kind, m=m, n=n, max_rank=rank, pivoting=piv,
                                dps=dps)
    el = time.time() - t0
    for h in res.history:
        line = (f"{h['it']:3d}  log10|pivot| {h['pivotmax_log10']:8.2f}")
        if h["err_log10"] is not None:
            line += f"  log10 err {h['err_log10']:8.2f}"
        print(line)
    print(f"...with {res.neval} evaluations completed in {el:.4e} sec.")
    print(f"computed value: {res.value_str[:dps // 2 + 8]}")
    if res.digits is not None:
        print(f"correct digits: {res.digits:7.2f}")
    print("Good bye.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
