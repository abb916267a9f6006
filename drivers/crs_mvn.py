#!/usr/bin/env python
"""MVN probability mass by TT-cross: `crs_mvn.py D N RANK PIV`
(test_crs_mvn.f90 parity; equicorrelated lognormal model, truth = 1)."""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

import ttcross_tpu  # noqa: F401
from ttcross_tpu.apps import make_mvn
from ttcross_tpu.cross import cross
from ttcross_tpu.utils import print_config, readarg
from ttcross_tpu.utils.cli import maybe_accchk


def main():
    d = readarg(1, 6)
    n = readarg(2, 65)
    rank = readarg(3, 20)
    piv = readarg(4, 1)

    print("Hi, this is TT cross interpolation for computing integrals...")
    prob = make_mvn(d=d, n=n)
    print_config(dimension=d, quadratur=prob.n, TT_ranks=rank, pivoting=piv)
    if d < 10:
        print("Mean vector (mu):")
        print(prob.density.mu)
        print("Covariance matrix:")
        print(prob.density.cov)
    acc = 500 * np.finfo(np.float64).eps

    res = cross(prob.fun, [prob.n] * d, max_rank=rank, accuracy=acc,
                pivoting=piv, quad=[prob.quad_weights] * d, truth=1.0, verbose=True)
    print(f"...with {res.neval} evaluations completed in {res.time:.4e} sec.")
    val = res.values[-1]
    print(f"computed value: {val:.40e}")
    print(f"analytic value: {1.0:.40e}")
    print(f"correct digits: {-np.log10(abs(1 - val)):7.2f}")
    maybe_accchk(res, prob.fun)
    print("Good bye.")


if __name__ == "__main__":
    main()
