#!/usr/bin/env python
"""Golden-table print of COS coefficients over an index grid
(test_print_cos_coeff.f90 parity: serial table for manual inspection)."""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

import ttcross_tpu  # noqa: F401
from ttcross_tpu.apps import make_cos_coefficients, make_mvn_density
from ttcross_tpu.utils import readarg


def main():
    d = readarg(1, 4)
    kmax = readarg(2, 32)

    dens = make_mvn_density(d)
    cc = make_cos_coefficients(d, dens.mu, dens.cov, 0.52517, 8.52517)
    ind = np.zeros((kmax, d), dtype=np.int64)
    ind[:, -1] = np.arange(kmax)  # grid 1 x 1 x ... x kmax
    vals = np.asarray(cc.fun(ind))
    for k in range(kmax):
        print(f"  ind={tuple(int(x) for x in ind[k])}  coeff={vals[k]: .16e}")


if __name__ == "__main__":
    main()
