#!/usr/bin/env python
"""Basket-sum density via TT-cross + COS: `crs_pdf.py D N RANK PIV`
(test_crs_pdf.f90 parity): cross the MVN pdf, compute 32 CHF values,
reconstruct the density on [0, 300], write out/tt-cross-pdf.txt, and plot
with matplotlib if available (the reference shells out to a Python venv,
test_crs_pdf.f90:219-223)."""

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

import ttcross_tpu  # noqa: F401
from ttcross_tpu.apps import make_mvn
from ttcross_tpu.apps.chf import basket_pdf
from ttcross_tpu.cross import cross
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

    xs = np.linspace(0.0, 300.0, 200)
    pdf = np.asarray(basket_pdf(res.tt, prob.nodes, prob.quad_weights, xs, n_terms=32))

    os.makedirs("out", exist_ok=True)
    path = "out/tt-cross-pdf.txt"
    with open(path, "w") as f:
        for x, y in zip(xs, pdf):
            f.write(f"{x:.10e} {y:.10e}\n")
    print(f"wrote {path}")

    try:
        from plot_ttcross_data import plot_pdf

        plot_pdf(path, "out/tt-cross-pdf.png")
        print("wrote out/tt-cross-pdf.png")
    except Exception as e:  # matplotlib optional
        print(f"(plotting skipped: {e})")
    print("Good bye.")


if __name__ == "__main__":
    main()
