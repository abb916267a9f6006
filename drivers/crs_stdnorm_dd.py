#!/usr/bin/env python
"""Extended-precision tier demo: `crs_stdnorm_dd.py D N RANK`.

The role of the reference's MPFUN pipeline (test_mpf_* with mptt_dmrgg,
README.md:52): cross in the f64 device engine, then re-evaluate the cross
data and the quadrature in __float128 with double-double Gauss-Legendre
rules (cross/refine.py).  For the rank-exact product Gaussian this reaches
~30 correct digits vs pi^(D/2)."""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from decimal import Decimal, getcontext

import numpy as np

import ttcross_tpu  # noqa: F401
from ttcross_tpu import native
from ttcross_tpu.cross import cross
from ttcross_tpu.cross.refine import refine_dd
from ttcross_tpu.apps import make_stdnorm
from ttcross_tpu.utils import print_config, readarg


def main():
    d = readarg(1, 4)
    n = readarg(2, 101)
    rank = readarg(3, 4)
    if n % 2 == 0:
        n += 1
    if not native.available():
        print("native toolchain unavailable; the dd tier needs it")
        return 1

    import jax.numpy as jnp

    from ttcross_tpu.ops.dd import DD, dd, dd_mul

    print_config(dimension=d, quadratur=n, TT_ranks=rank, tier="double-double")
    scale = 8.5
    (xh, xl), (wh, wl) = native.gauss_legendre_dd(n)
    X = dd_mul(DD(jnp.asarray(xh), jnp.asarray(xl)), dd(scale))
    W = dd_mul(DD(jnp.asarray(wh), jnp.asarray(wl)), dd(scale))
    xh, xl = np.asarray(X.hi), np.asarray(X.lo)
    wh, wl = np.asarray(W.hi), np.asarray(W.lo)

    prob = make_stdnorm(d=d, n=n, a=-scale, b=scale)
    res = cross(prob.fun, [n] * d, max_rank=rank, pivoting=1,
                accuracy=25e-16, return_state=True)
    print(f"cross: {res.neval} evaluations, ranks {res.ranks}")

    hi, lo, nev = refine_dd(res.state, [n] * d,
                            lambda ind: native.stdnorm_dd(ind, xh, xl),
                            [wh] * d, [wl] * d)
    getcontext().prec = 60
    pi = Decimal("3.14159265358979323846264338327950288419716939937510582097494")
    tru = pi ** (Decimal(d) / 2)
    got = Decimal(hi) + Decimal(lo)
    rel = abs(1 - got / tru)
    digits = float(-rel.log10()) if rel != 0 else 60.0
    print(f"refined value : {got}")
    print(f"analytic value: {tru}")
    print(f"correct digits: {digits:7.2f}   (+{nev} extended-precision evals)")
    print("Good bye.")


if __name__ == "__main__":
    main()
