#!/usr/bin/env python
"""Benchmark driver: Ising C_6 north-star config (test_crs_ising.exe C 6 64 24 1).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

The reference publishes no throughput numbers (BASELINE.md: "published": {});
vs_baseline is therefore measured against NOMINAL_REF_EVALS_PER_SEC, a stated
nominal for the reference Fortran MPI+OpenMP build on a 64-core node
(O(0.1-1 us) per integrand eval across 64 threads, derated for MPI sync).
"""

import json
import sys
import time

import numpy as np

NOMINAL_REF_EVALS_PER_SEC = 1.0e6


def main_parallel(ndevs):
    """`bench.py --parallel [ndev ...]`: distributed-engine scaling on the
    virtual CPU mesh (the `mpirun -np N` benchmark channel; real multi-chip
    hardware is not available in this image — virtual devices share the
    host's cores, so this measures collective/sharding overhead and
    correctness at scale, not true speedup).  Default ndevs: 1 2 4 8."""
    import os

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        from jax._src import xla_bridge

        if xla_bridge.backends_are_initialized():
            xla_bridge._clear_backends()
    except Exception:
        pass
    import ttcross_tpu  # noqa: F401
    from ttcross_tpu.apps import make_ising
    from ttcross_tpu.cross import cross
    from ttcross_tpu.parallel import cross_parallel
    from ttcross_tpu.parallel.mesh import bond_mesh

    prob = make_ising("C", m=32, n=16)   # d=31: 30 bonds, divisible slabs
    args = dict(max_rank=8, accuracy=500 * 2.2e-16, pivoting=1,
                quad=[prob.quad_weights] * prob.d, truth=prob.truth)
    rows = []
    for ndev in ndevs:
        for rep in range(2):             # second call = steady (cached compile)
            t0 = time.time()
            if ndev == 1:
                res = cross(prob.fun, [prob.n] * prob.d, **args)
            else:
                res = cross_parallel(prob.fun, [prob.n] * prob.d,
                                     mesh=bond_mesh(jax.devices()[:ndev]), **args)
            wall = time.time() - t0
        digits = -np.log10(res.errors[-1]) if res.errors else float("nan")
        rows.append({"ndev": ndev, "wall_s": round(wall, 3),
                     "sweep_ms": round(1e3 * wall / max(res.sweeps, 1), 1),
                     "digits": round(float(digits), 2),
                     "n_evals": int(res.neval), "sweeps": res.sweeps})
        print(json.dumps({"metric": "ising_c32_parallel_scaling", **rows[-1]}))
    return 0


def main():
    import ttcross_tpu  # noqa: F401  (x64)
    import jax
    from ttcross_tpu.apps import make_ising
    from ttcross_tpu.cross import cross

    prob = make_ising("C", m=6, n=64)  # driver adjusts to 65
    args = dict(max_rank=24, accuracy=500 * 2.2e-16, pivoting=1,
                quad=[prob.quad_weights] * prob.d, truth=prob.truth)

    # warm-up run: pays compilation
    t0 = time.time()
    res = cross(prob.fun, [prob.n] * prob.d, **args)
    warm = time.time() - t0

    # timed run with cached compilation
    t0 = time.time()
    res = cross(prob.fun, [prob.n] * prob.d, **args)
    elapsed = time.time() - t0

    digits = -np.log10(res.errors[-1]) if res.errors else float("nan")
    evals_per_sec = res.neval / elapsed
    # sweep index where rel err first dropped below 1e-10
    t_hit = next((i for i, e in enumerate(res.errors) if e <= 1e-10), None)
    out = {
        "metric": "ising_c6_evals_per_sec",
        "value": round(evals_per_sec, 1),
        "unit": "evals/sec",
        "vs_baseline": round(evals_per_sec / NOMINAL_REF_EVALS_PER_SEC, 3),
        "device": str(jax.devices()[0]),
        "correct_digits": round(float(digits), 2),
        "n_evals": int(res.neval),
        "wall_time_s": round(elapsed, 3),
        "warmup_time_s": round(warm, 3),
        "sweeps": res.sweeps,
        "first_sweep_below_1e-10": t_hit,
        "max_rank": max(res.ranks),
        # honesty metrics: n_evals counts ACTIVE entries (the reference's
        # bookkeeping, dmrgg.f90:372,465,...); padded_evals counts every
        # integrand call including masked padding slots (see BENCH_NOTES
        # "n_evals parity")
        "padded_evals": int(res.padded_evals),
        "padded_ratio": round(res.padded_evals / res.neval, 2),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--parallel":
        nd = [int(x) for x in sys.argv[2:]] or [1, 2, 4, 8]
        sys.exit(main_parallel(nd))
    sys.exit(main())
