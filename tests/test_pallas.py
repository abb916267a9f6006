"""Pallas scoring kernel vs the jnp reference (kernel runs in interpret/
fallback mode on CPU; real-TPU execution is covered by the bench drive)."""

import jax.numpy as jnp
import numpy as np

from ttcross_tpu.ops.pallas_kernels import (
    score_residual_argmax,
    score_residual_argmax_ref,
)


def test_fallback_matches_ref(rng):
    M, K, R = 48, 80, 6
    vals = rng.standard_normal((M, K))
    colf = rng.standard_normal((M, R))
    rowf = rng.standard_normal((R, K))
    mask = rng.random((M, K)) > 0.2
    idx, val = score_residual_argmax(jnp.asarray(vals), jnp.asarray(colf),
                                     jnp.asarray(rowf), jnp.asarray(mask),
                                     use_pallas=False)
    ref_idx, ref_val = score_residual_argmax_ref(
        jnp.asarray(vals, jnp.float32), jnp.asarray(colf, jnp.float32),
        jnp.asarray(rowf, jnp.float32), jnp.asarray(mask))
    assert int(idx) == int(ref_idx)
    np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-6)


def test_selected_pivot_is_true_max(rng):
    M, K, R = 24, 40, 4
    vals = rng.standard_normal((M, K))
    colf = rng.standard_normal((M, R))
    rowf = rng.standard_normal((R, K))
    mask = np.ones((M, K), bool)
    mask[:, 30:] = False
    idx, val = score_residual_argmax(jnp.asarray(vals), jnp.asarray(colf),
                                     jnp.asarray(rowf), jnp.asarray(mask),
                                     use_pallas=False)
    resid = np.abs(vals - colf @ rowf)
    resid[:, 30:] = -1
    assert int(idx) == int(np.argmax(resid.reshape(-1)))


def test_small_table_lookup_limbs_interpret(rng):
    """The Pallas lookup kernel (interpret mode on CPU) reproduces the
    gather and the exact 3-limb recombination bit-for-bit."""
    import jax.numpy as jnp

    from ttcross_tpu.ops.dense import _f32_split3, _pow2_rescale
    from ttcross_tpu.ops.pallas_kernels import small_table_lookup_limbs

    n, B, d = 7, 13, 5
    table = jnp.asarray(rng.standard_normal(n) * 1e3)
    ind = rng.integers(0, n, size=(B, d)).astype(np.int32)
    s, sinv = _pow2_rescale(table)
    a, b, c = small_table_lookup_limbs(
        _f32_split3(table * s), jnp.asarray(ind), interpret=True)
    got = (a.astype(jnp.float64) + b.astype(jnp.float64)
           + c.astype(jnp.float64)) * sinv
    want = np.asarray(table)[ind]
    assert np.array_equal(np.asarray(got), want)
