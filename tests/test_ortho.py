import numpy as np

import ttcross_tpu.tt as tt


def random_tt(rng, n=(4, 5, 3, 6), r=(1, 3, 4, 2, 1)):
    cores = [rng.standard_normal((r[i], n[i], r[i + 1])) for i in range(len(n))]
    return tt.from_cores(cores)


def test_orthogonalize_preserves_tensor(rng):
    t = random_tt(rng)
    dense = np.asarray(tt.full(t))
    q = tt.orthogonalize(t)
    np.testing.assert_allclose(np.asarray(tt.full(q)), dense, rtol=1e-11, atol=1e-12)


def test_orthogonalize_left_orthogonal(rng):
    t = random_tt(rng)
    q = tt.orthogonalize(t)
    # All cores but the last are left-orthogonal up to the common balancing scale
    scales = []
    for c in q.cores[:-1]:
        m = np.asarray(c).reshape(-1, c.shape[2])
        g = m.T @ m
        s = g[0, 0]
        scales.append(s)
        np.testing.assert_allclose(g, s * np.eye(g.shape[0]), atol=1e-10 * max(1.0, s))
    # geometric balancing: all core scales equal
    np.testing.assert_allclose(scales, scales[0], rtol=1e-10)


def test_svd_round_exact_rank_recovery(rng):
    # Build a tensor of exact TT rank (1,2,2,1), inflate its ranks, round back.
    t = random_tt(rng, n=(4, 4, 4), r=(1, 2, 2, 1))
    dense = np.asarray(tt.full(t))
    inflated = tt.add(t, tt.scale(t, 1.0))  # ranks double, tensor = 2*t
    rounded = tt.svd_round(inflated, tol=1e-12)
    assert rounded.r == (1, 2, 2, 1)
    np.testing.assert_allclose(np.asarray(tt.full(rounded)), 2 * dense, rtol=1e-10, atol=1e-12)


def test_from_dense_roundtrip(rng):
    t = random_tt(rng, n=(3, 4, 5), r=(1, 2, 3, 1))
    dense = np.asarray(tt.full(t))
    t2 = tt.from_dense(dense, tol=1e-13)
    assert t2.r == (1, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(tt.full(t2)), dense, rtol=1e-10, atol=1e-12)


def test_from_dense_rmax_cap(rng):
    a = rng.standard_normal((4, 4, 4, 4))
    t = tt.from_dense(a, rmax=2)
    assert max(t.r) <= 4 and all(x <= 2 or i in (0, len(t.r) - 1) for i, x in enumerate(t.r))
