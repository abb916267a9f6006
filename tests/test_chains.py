"""Chain-table recurrences vs the direct per-bond scans."""

import jax.numpy as jnp
import numpy as np

from ttcross_tpu.cross.chains import (
    all_left_tables,
    all_right_tables,
    left_table,
    right_table,
)


def test_all_tables_match_direct(rng):
    d, R = 6, 4
    vip = jnp.asarray(rng.integers(0, 3, size=(d - 1, R, 4)), jnp.int32)
    LT = all_left_tables(vip, d)
    RT = all_right_tables(vip, d)
    for p in range(d - 1):
        np.testing.assert_array_equal(np.asarray(LT[p]), np.asarray(left_table(vip, p, d)))
        np.testing.assert_array_equal(np.asarray(RT[p]), np.asarray(right_table(vip, p, d)))


def test_all_tables_match_direct_long_chain(rng):
    # non-power-of-two d exercises the associative-scan odd-tail handling;
    # links in [0, R), modes in [0, N) as the engine lays vip out
    d, R, N = 37, 7, 11
    vip = np.zeros((d - 1, R, 4), np.int32)
    vip[:, :, 0] = rng.integers(0, R, size=(d - 1, R))
    vip[:, :, 1] = rng.integers(0, N, size=(d - 1, R))
    vip[:, :, 2] = rng.integers(0, N, size=(d - 1, R))
    vip[:, :, 3] = rng.integers(0, R, size=(d - 1, R))
    vip = jnp.asarray(vip)
    LT = all_left_tables(vip, d)
    RT = all_right_tables(vip, d)
    for p in range(d - 1):
        np.testing.assert_array_equal(np.asarray(LT[p]), np.asarray(left_table(vip, p, d)))
        np.testing.assert_array_equal(np.asarray(RT[p]), np.asarray(right_table(vip, p, d)))
