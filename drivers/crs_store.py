#!/usr/bin/env python
"""crs_pdf + persistence: `crs_store.py D N RANK PIV`
(test_crs_store.f90 parity: additionally saves the crossed TT to
out/tensor_train.h5 in the reference's HDF5 schema, and to the binary
stream format)."""

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

import ttcross_tpu  # noqa: F401
from ttcross_tpu.apps import make_mvn
from ttcross_tpu.apps.chf import basket_pdf
from ttcross_tpu.cross import cross
from ttcross_tpu.tt.serialize import save_hdf5, save_ttbin
from ttcross_tpu.utils import print_config, readarg
from ttcross_tpu.utils.cli import maybe_accchk


def main():
    d = readarg(1, 6)
    n = readarg(2, 65)
    rank = readarg(3, 20)
    piv = readarg(4, 1)

    prob = make_mvn(d=d, n=n)
    print_config(dimension=d, quadratur=prob.n, TT_ranks=rank, pivoting=piv)
    acc = 500 * np.finfo(np.float64).eps
    res = cross(prob.fun, [prob.n] * d, max_rank=rank, accuracy=acc, pivoting=piv)
    maybe_accchk(res, prob.fun)
    print(f"...with {res.neval} evaluations completed in {res.time:.4e} sec.")

    os.makedirs("out", exist_ok=True)
    try:
        save_hdf5(res.tt, "out/tensor_train.h5")
        print("wrote out/tensor_train.h5")
    except ImportError:
        print("(h5py unavailable; skipping HDF5)")
    save_ttbin(res.tt, "out/tensor_train.ttx")
    print("wrote out/tensor_train.ttx")

    xs = np.linspace(0.0, 300.0, 200)
    pdf = np.asarray(basket_pdf(res.tt, prob.nodes, prob.quad_weights, xs, n_terms=32))
    with open("out/tt-cross-pdf.txt", "w") as f:
        for x, y in zip(xs, pdf):
            f.write(f"{x:.10e} {y:.10e}\n")
    print("wrote out/tt-cross-pdf.txt")
    print("Good bye.")


if __name__ == "__main__":
    main()
