#!/usr/bin/env python
"""Cross the COS coefficient tensor: `crs_coscoeff.py D N RANK PIV CORR`
(test_crs_coscoeff.f90 parity: the black box is the d-dim COS coefficient
of a Gaussian CHF; result saved to out/coeff-tt-<d>-<n>-10-<corr>.h5)."""

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

import ttcross_tpu  # noqa: F401
from ttcross_tpu.apps import make_cos_coefficients, make_mvn_density
from ttcross_tpu.cross import cross
from ttcross_tpu.tt.serialize import save_hdf5
from ttcross_tpu.utils import print_config, readarg
from ttcross_tpu.utils.cli import maybe_accchk


def main():
    d = readarg(1, 6)
    n = readarg(2, 65)
    rank = readarg(3, 20)
    piv = readarg(4, 1)
    corr = readarg(5, 0.5)

    dens = make_mvn_density(d, corr=corr)
    lower, upper = 0.52517, 8.52517
    cc = make_cos_coefficients(d, dens.mu, dens.cov, lower, upper)
    print_config(dimension=d, modes=n, TT_ranks=rank, pivoting=piv, corr=corr)
    acc = 500 * np.finfo(np.float64).eps

    res = cross(cc.fun, [n] * d, max_rank=rank, accuracy=acc, pivoting=piv,
                verbose=True)
    maybe_accchk(res, cc.fun)
    print(f"...with {res.neval} evaluations completed in {res.time:.4e} sec.")

    os.makedirs("out", exist_ok=True)
    path = f"out/coeff-tt-{d}-{n}-10-{corr}.h5"
    try:
        save_hdf5(res.tt, path)
        print(f"wrote {path}")
    except ImportError:
        print("(h5py unavailable; skipping HDF5)")
    print("Good bye.")


if __name__ == "__main__":
    main()
