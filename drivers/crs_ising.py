#!/usr/bin/env python
"""Ising susceptibility integrals by TT-cross: `crs_ising.py KIND INDEX N RANK PIV`.

CLI parity with test_crs_ising.exe (README.md:28-39, test_crs_ising.f90):
KIND in {C, D, E}, INDEX = m of C_m/D_m/E_m, N quadrature size (adjusted to
odd), RANK max TT rank, PIV pivoting (-1 full / 0 lottery / k rook).
Prints per-sweep progress and correct digits vs the Bailey truths.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

import ttcross_tpu  # noqa: F401
from ttcross_tpu.apps import make_ising
from ttcross_tpu.cross import cross
from ttcross_tpu.utils import print_config, readarg
from ttcross_tpu.utils.cli import maybe_accchk


def main():
    kind = readarg(1, "c")
    m = readarg(2, 6)
    n = readarg(3, 65)
    rank = readarg(4, 20)
    piv = readarg(5, 1)

    print("Hi, this is TT cross interpolation computing Ising integral...")
    prob = make_ising(kind, m=m, n=n)
    print_config(integral=kind.upper(), dimension=m, quadratur=prob.n,
                 TT_ranks=rank, pivoting=piv)
    acc = 500 * np.finfo(np.float64).eps

    res = cross(prob.fun, [prob.n] * prob.d, max_rank=rank, accuracy=acc,
                pivoting=piv, quad=[prob.quad_weights] * prob.d,
                truth=prob.truth, verbose=True)
    print(f"...with {res.neval} evaluations completed in {res.time:.4e} sec.")
    val = res.values[-1]
    print(f"computed value: {val:.40e}")
    if prob.truth:
        print(f"analytic value: {prob.truth:.40e}")
        print(f"correct digits: {-np.log10(abs(1 - val / prob.truth)):7.2f}")
    maybe_accchk(res, prob.fun)
    print("Good bye.")


if __name__ == "__main__":
    main()
