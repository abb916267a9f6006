"""Seeded configuration-matrix fuzz for the DISTRIBUTED engine: random
low-rank TT tensors crossed on 1/2/4-device virtual bond meshes under
randomized LEGAL mode combinations (pivoting x sweep_mode x quad x
mybonds x adaptive x oversample/refine post-passes), with exact dense
recovery as the oracle — the mesh analogue of tests/test_fuzz_matrix.py.

Every tensor is exactly representable at the padded rank, so whichever
slab decomposition / hunt path / post-pass executed, the distributed
cross must recover it to ~f64 round-off.  A regression in any mode
interaction on the mesh (tape replay, boundary fixup, replicated
acceptance, gated-bond zero tapes) trips a seed here rather than a user."""

import numpy as np
import pytest
import jax
from jax.sharding import Mesh

import ttcross_tpu.tt as tt
from ttcross_tpu.parallel import cross_parallel, share


def _random_config(rng):
    d = int(rng.integers(3, 6))
    n = [int(rng.integers(3, 9)) for _ in range(d)]
    rmax_true = int(rng.integers(1, 4))
    ranks = [1] + [int(rng.integers(1, rmax_true + 1))
                   for _ in range(d - 1)] + [1]
    cores = [rng.standard_normal((ranks[i], n[i], ranks[i + 1]))
             for i in range(d)]
    T = tt.from_cores(cores)

    R = max(max(ranks) + int(rng.integers(1, 3)), 2)
    legal_ndev = [nd for nd in (1, 2, 4) if nd <= d - 1]
    ndev = int(rng.choice(legal_ndev))
    mode = str(rng.choice(["sequential", "jacobi"]))
    piv = int(rng.choice([0, 1, 2] if mode == "jacobi" else [-1, 0, 1, 2]))
    kw = dict(max_rank=R, pivoting=piv, accuracy=1e-11,
              key=int(rng.integers(0, 100)), sweep_mode=mode)
    if rng.random() < 0.5:
        kw["quad"] = [np.abs(rng.standard_normal(m)) + 0.1 for m in n]
    if rng.random() < 0.3 and ndev > 1 and d - 1 >= ndev + 1:
        # a deliberately uneven slab split (first slab gets 1 bond)
        bounds = [0, 1] + list(share(d - 1 - 1, ndev - 1)[1:] + 1)
        kw["mybonds"] = bounds
    if rng.random() < 0.25 and mode == "sequential" and piv >= 0:
        kw["adaptive"] = True
    post = rng.random()
    if post < 0.2:
        kw["oversample"] = int(rng.integers(1, 3))
    elif post < 0.4:
        kw["refine_sweeps"] = 1
    elif post < 0.5:
        kw["oversample"] = 1
        kw["refine_sweeps"] = 1
    return T, n, ndev, kw


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(200, 206))
def test_fuzz_parallel_exact_recovery(seed):
    rng = np.random.default_rng(seed)
    for _ in range(2):
        T, n, ndev, kw = _random_config(rng)
        dense = np.asarray(tt.full(T))

        def fun(ind):
            return tt.gather(T, ind)

        mesh = Mesh(np.asarray(jax.devices()[:ndev]), ("bond",))
        res = cross_parallel(fun, n, mesh=mesh, **kw)
        err = float(np.abs(np.asarray(tt.full(res.tt)) - dense).max())
        scale = max(1.0, float(np.abs(dense).max()))
        assert err < 1e-7 * scale, (ndev, kw, err)
