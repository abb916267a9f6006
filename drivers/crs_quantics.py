#!/usr/bin/env python
"""Quantics TT-cross demo: `crs_quantics.py K RANK PIV`.

Crosses f(x) = exp(x) sin(6 pi x) on a virtual 2^K grid (K binary modes
— the exponential-grid regime dtt_value serves in the reference,
tt.f90:702-728) and prints the Riemann integral vs the closed form plus
a point-evaluation check.  No reference CLI counterpart: the reference
exposes quantics only through dtt_value on hand-built trains.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

import ttcross_tpu  # noqa: F401
import jax.numpy as jnp
from ttcross_tpu.apps import quantics_cross
from ttcross_tpu.utils import print_config, readarg


def main():
    K = readarg(1, 20)
    rank = readarg(2, 10)
    piv = readarg(3, 1)
    refine = readarg(4, 1)

    print("Hi, this is quantics TT cross interpolation...")
    print_config(bits=K, virtual_grid=f"2^{K} = {2 ** K}", TT_ranks=rank,
                 pivoting=piv, refine_sweeps=refine)

    def f(x):
        return jnp.exp(x) * jnp.sin(6 * np.pi * x)

    # refine_sweeps=1 by default: deep quantics grids hit a greedy-pivot
    # conditioning plateau (~4e-7 at K=20) that one maxvol replacement
    # sweep removes (see apps/quantics.py::quantics_cross)
    prob, res = quantics_cross(f, K, max_rank=rank, pivoting=piv,
                               accuracy=1e-13, refine_sweeps=refine,
                               verbose=True)
    # exact left-Riemann sum of exp(x) sin(6 pi x) via the geometric sum
    # of exp((1 + 6 pi i) x) over the dyadic grid
    h = 2.0 ** -K
    z = complex(1.0, 6 * np.pi)
    tru = (h * (np.exp(z) - 1.0) / (np.exp(z * h) - 1.0)).imag
    val = res.values[-1]
    err = abs(1.0 - val / tru)
    print(f"...with {res.neval} evaluations "
          f"(of {2 ** K} virtual grid points) in {res.time:.4e} sec.")
    print(f"computed value: {val:.15e}")
    print(f"analytic value: {tru:.15e}")
    print(f"correct digits: {-np.log10(err) if err > 0 else 16.0:7.2f}")

    xs = np.arange(64) / 64.0
    got = np.asarray(prob.value(res.tt, xs[:, None]))
    e_pt = np.abs(got - np.asarray(f(jnp.asarray(xs)))).max()
    print(f"max point-eval error on the 64-point dyadic probe: {e_pt:.2e}")
    print(f"TT ranks: {res.ranks}")
    print("Good bye.")


if __name__ == "__main__":
    main()
