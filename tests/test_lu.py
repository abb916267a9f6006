"""Growing-LU unit tests: the incremental CUR factors must match the dense
C @ Ahat^{-1} @ R cross built from the same pivot sequence (the kernel-level
check the reference never had, SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np

from ttcross_tpu.ops.lu import (
    GrowingLU,
    apply_new_col,
    apply_new_row,
    lu_append,
    lu_empty,
    solve_cols,
    solve_rows,
)


def grow_cross(A, pivots, R):
    """Run the incremental CUR machinery on dense A over a pivot list."""
    m, n = A.shape
    Cf = np.zeros((m, R))
    Rf = np.zeros((R, n))
    lu = lu_empty(R)
    for r, (i, j) in enumerate(pivots):
        resid = A - Cf[:, :r] @ Rf[:r, :]
        delta = resid[i, j]
        c_new = np.pad(Cf[i, :r], (0, R - r))
        u_new = np.pad(Rf[:r, j], (0, R - r))
        acol = A[:, j]
        arow = A[i, :]
        Cf[:, r] = np.asarray(apply_new_col(jnp.asarray(Cf), jnp.asarray(u_new), delta, jnp.asarray(acol), r))
        Rf[r, :] = np.asarray(apply_new_row(jnp.asarray(Rf), jnp.asarray(c_new), jnp.asarray(arow), r))
        lu = lu_append(lu, r, jnp.asarray(c_new), jnp.asarray(u_new), delta)
    return Cf, Rf, lu


def test_cur_matches_dense_inverse(rng):
    m, n, R, r = 8, 7, 6, 4
    A = rng.standard_normal((m, n))
    pivots = [(0, 0), (3, 2), (5, 6), (2, 4)]
    Cf, Rf, lu = grow_cross(A, pivots, R)
    I = [p[0] for p in pivots]
    J = [p[1] for p in pivots]
    Ahat = A[np.ix_(I, J)]
    expect = A[:, J] @ np.linalg.inv(Ahat) @ A[I, :]
    got = Cf[:, :r] @ Rf[:r, :]
    np.testing.assert_allclose(got, expect, rtol=1e-10, atol=1e-12)
    # interpolation property: exact on crossed rows and columns
    np.testing.assert_allclose(got[I, :], A[I, :], rtol=1e-10)
    np.testing.assert_allclose(got[:, J], A[:, J], rtol=1e-10)


def test_solves_match_incremental(rng):
    """Full triangular-solve application == the incrementally built factors."""
    m, n, R = 8, 7, 6
    A = rng.standard_normal((m, n))
    pivots = [(1, 1), (4, 3), (6, 0), (2, 5)]
    r = len(pivots)
    Cf, Rf, lu = grow_cross(A, pivots, R)
    J = [p[1] for p in pivots]
    I = [p[0] for p in pivots]
    C_raw = np.zeros((m, R))
    C_raw[:, :r] = A[:, J]
    R_raw = np.zeros((R, n))
    R_raw[:r, :] = A[I, :]
    Cf2 = np.asarray(solve_cols(lu, r, jnp.asarray(C_raw)))
    Rf2 = np.asarray(solve_rows(lu, r, jnp.asarray(R_raw)))
    np.testing.assert_allclose(Cf2[:, :r], Cf[:, :r], rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(Rf2[:r, :], Rf[:r, :], rtol=1e-10, atol=1e-12)
    # padded region passes through untouched by the identity masking
    np.testing.assert_allclose(Cf2[:, r:], 0.0, atol=1e-14)
    np.testing.assert_allclose(Rf2[r:, :], 0.0, atol=1e-14)


def test_masking_is_rank_exact(rng):
    """Solves at active rank r must ignore junk stored beyond r."""
    m, n, R = 6, 6, 5
    A = rng.standard_normal((m, n))
    pivots = [(0, 1), (2, 3)]
    r = len(pivots)
    Cf, Rf, lu = grow_cross(A, pivots, R)
    # poison the padded region of the LU arrays
    lu_poison = GrowingLU(
        c=lu.c.at[r:, :].set(99.0), u=lu.u.at[r:, :].set(-7.0), d=lu.d.at[r:].set(3.0),
    )
    C_raw = np.zeros((m, R))
    C_raw[:, 0] = A[:, 1]
    C_raw[:, 1] = A[:, 3]
    a = np.asarray(solve_cols(lu, r, jnp.asarray(C_raw)))
    b = np.asarray(solve_cols(lu_poison, r, jnp.asarray(C_raw)))
    np.testing.assert_allclose(a[:, :r], b[:, :r], rtol=1e-12)
