#!/usr/bin/env python
"""Basket-sum characteristic function: `crs_chf.py D N RANK PIV`
(test_crs_chf.f90 parity: cross the MVN pdf once, then 32 complex
contractions with Fourier weights; compares against the reference's
golden values — see tests/test_chf.py for the known offset in those)."""

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

import ttcross_tpu  # noqa: F401
from ttcross_tpu.apps import CHF_REFERENCE, CHF_RHO05, make_mvn
from ttcross_tpu.apps.chf import basket_chf
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
    print("   Running TT-cross...")
    res = cross(prob.fun, [prob.n] * d, max_rank=rank, accuracy=acc, pivoting=piv)
    maybe_accchk(res, prob.fun)
    print(f"...with {res.neval} evaluations completed in {res.time:.4e} sec.")

    print("   Preparing quadrature tensor...")
    ndev_s = os.environ.get("TTCROSS_MESH", "")
    if ndev_s:
        # distributed ztt_quad: all 32 Fourier contractions in ONE meshed
        # collective (parallel/quad.py::pcontract) instead of 32 sequential
        # ones (test_crs_chf.f90:153-168)
        import jax

        from ttcross_tpu.parallel import pcontract
        from ttcross_tpu.parallel.mesh import bond_mesh

        omega = np.arange(32) * np.pi / 300.0
        phase = omega[:, None] * np.exp(prob.nodes)[None, :] / d
        w_k = prob.quad_weights[None, :] * np.exp(1j * phase)
        mesh = bond_mesh(jax.devices()[: int(ndev_s)])
        phis = pcontract(res.tt, [w_k] * d, mesh)
    else:
        phis = np.asarray(basket_chf(res.tt, prob.nodes, prob.quad_weights, 32))
    for k in range(32):
        print(f"computed value: {phis[k].real:.16e} {phis[k].imag:.16e}")
        if d == 6:  # the goldens are d=6 values (test_crs_chf.f90:232-271)
            ref = CHF_RHO05[k]   # regenerated at the source's parameters;
            stale = CHF_REFERENCE[k]  # the reference's table is stale (~0.552 fit)
            print(f"golden  value: {ref.real:.16e} {ref.imag:.16e}")
            print(f"agreement digits: {-np.log10(abs(1 - phis[k] / ref)):7.2f}"
                  f"  (vs stale reference table: "
                  f"{-np.log10(abs(1 - phis[k] / stale)):5.2f})")
    print(f"phi_0 (mass) = {phis[0].real:.8f} (should be ~1)")
    print("Good bye.")


if __name__ == "__main__":
    main()
