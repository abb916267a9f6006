"""Seeded configuration-matrix fuzz: random low-rank TT tensors crossed
under randomized LEGAL combinations of the engine's modes (pivoting x
sweep_mode x quad x weighted_lottery x rank_caps x adaptive x
rank_chunks x oversample/refine post-passes), with exact recovery of
the dense tensor as the oracle.

The generator mirrors the interactive wide-sweep harness used during
development (60-config sweeps per seed); here a bounded deterministic
slice runs in CI so a regression in any mode interaction trips a test
rather than a user.  Tensors are exactly representable at the padded
rank, so the cross must recover them to ~f64 round-off regardless of
which hunt/post-pass path executed."""

import numpy as np
import pytest

import ttcross_tpu.tt as tt
from ttcross_tpu.cross import cross


def _random_config(rng):
    d = int(rng.integers(2, 5))
    n = [int(rng.integers(3, 9)) for _ in range(d)]
    rmax_true = int(rng.integers(1, 4))
    ranks = [1] + [int(rng.integers(1, rmax_true + 1))
                   for _ in range(d - 1)] + [1]
    cores = [rng.standard_normal((ranks[i], n[i], ranks[i + 1]))
             for i in range(d)]
    T = tt.from_cores(cores)

    R = max(max(ranks) + int(rng.integers(1, 3)), 2)
    mode = str(rng.choice(["sequential", "jacobi"]))
    piv = int(rng.choice([0, 1, 2] if mode == "jacobi" else [-1, 0, 1, 2]))
    kw = dict(max_rank=R, pivoting=piv, accuracy=1e-11,
              key=int(rng.integers(0, 100)), sweep_mode=mode)
    if rng.random() < 0.6:
        kw["quad"] = [np.abs(rng.standard_normal(m)) + 0.1 for m in n]
    if rng.random() < 0.3 and "quad" in kw and piv >= 0:
        kw["weighted_lottery"] = True
    if rng.random() < 0.25 and mode == "sequential" and piv >= 0:
        kw["rank_caps"] = [int(min(R, max(ranks[i + 1] + 1,
                                          rng.integers(2, R + 1))))
                           for i in range(d - 1)]
    if rng.random() < 0.25 and mode == "sequential" and piv >= 0 \
            and "rank_caps" not in kw:
        kw["adaptive"] = True
    if rng.random() < 0.25 and R >= 3 and "rank_caps" not in kw:
        ch = sorted(set([int(x) for x in rng.integers(2, R, size=2)] + [R]))
        if ch[0] >= 2 and len(ch) > 1:
            kw["rank_chunks"] = ch
    post = rng.random()
    if post < 0.2:
        kw["oversample"] = int(rng.integers(1, 3))
    elif post < 0.4:
        kw["refine_sweeps"] = 1
    elif post < 0.5:
        kw["oversample"] = 1
        kw["refine_sweeps"] = 1
    return T, n, kw


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(100, 106))
def test_fuzz_matrix_exact_recovery(seed):
    rng = np.random.default_rng(seed)
    for _ in range(2):
        T, n, kw = _random_config(rng)
        dense = np.asarray(tt.full(T))

        def fun(ind):
            return tt.gather(T, ind)

        res = cross(fun, n, **kw)
        err = float(np.abs(np.asarray(tt.full(res.tt)) - dense).max())
        scale = max(1.0, float(np.abs(dense).max()))
        assert err < 1e-7 * scale, (kw, err)
