"""Pallas TPU kernels for the pivot-hunt hot path.

The full-pivoting hunt scores the residual of the whole (r n x n r)
superblock (dmrgg.f90:341-408): residual = vals - colf @ rowf followed by a
masked |.|-argmax.  In XLA-f64 this is an emulated multi-pass matmul plus an
HBM round trip of the residual tensor.  Pivot SELECTION only needs the
argmax location — f32 is ample (the pivot value itself is recomputed in f64
by the engine) — so this kernel runs the matmul on the MXU in f32 and fuses
the masked abs-argmax so the residual never leaves VMEM.

TPU Mosaic has no f64 (probed on TPU v5e), which is exactly why the
scoring/selection split exists.  Falls back to a pure-jnp path off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["score_residual_argmax", "score_residual_argmax_ref",
           "small_table_lookup_limbs"]

_TK = 256  # column tile (lanes)


def score_residual_argmax_ref(vals, colf, rowf, mask):
    """Reference implementation: flat argmax of the masked |residual|.

    vals (M, K), colf (M, R), rowf (R, K), mask (M, K) boolean."""
    resid = vals - colf @ rowf
    score = jnp.where(mask, jnp.abs(resid), -1.0)
    flat = jnp.argmax(score.reshape(-1))
    return flat, score.reshape(-1)[flat]


def _kernel(vals_ref, colf_ref, rowf_ref, mask_ref, val_out, idx_out):
    from jax.experimental import pallas as pl

    g = pl.program_id(0)
    tile = vals_ref[:, :] - jnp.dot(colf_ref[:, :], rowf_ref[:, :],
                                    preferred_element_type=jnp.float32)
    score = jnp.where(mask_ref[:, :] > 0, jnp.abs(tile), jnp.float32(-1.0))
    Mp, TK = score.shape
    mval = jnp.max(score)
    # argmax via one-hot + 2-D i32 iota maxima (Mosaic: 2-D ops, i32 only,
    # no 1-D reshape / dynamic gather / scatter)
    hit = score >= mval
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (Mp, TK), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (Mp, TK), 1)
    li = jnp.max(jnp.where(hit, row_ids, jnp.int32(-1)))
    lj = jnp.max(jnp.where(hit & (row_ids == li), col_ids, jnp.int32(-1)))
    best = li * jnp.int32(TK) + lj
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    # the whole (G, 128) outputs are resident; each grid step fills row g
    val_out[pl.ds(g, 1), :] = jnp.where(lane == 0, mval, jnp.float32(-1.0))
    idx_out[pl.ds(g, 1), :] = jnp.where(lane == 0, best, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("use_pallas",))
def score_residual_argmax(vals, colf, rowf, mask, use_pallas: bool = True):
    """Fused f32 scoring: returns (flat_index, score) of the best pivot over
    the masked superblock residual.  Shapes: vals (M, K), colf (M, R),
    rowf (R, K); M must be a multiple of 8 (the caller's R*N padding
    guarantees it for even mode sizes; we pad here otherwise)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    vals = vals.astype(jnp.float32)
    colf = colf.astype(jnp.float32)
    rowf = rowf.astype(jnp.float32)
    M, K = vals.shape
    R = colf.shape[1]

    if not use_pallas:
        idx, val = score_residual_argmax_ref(vals, colf, rowf, mask)
        return idx.astype(jnp.int32), val

    # pad to hardware tiles
    Mp = -(-M // 8) * 8
    Kp = -(-K // _TK) * _TK
    Rp = -(-R // 128) * 128
    vals = jnp.pad(vals, ((0, Mp - M), (0, Kp - K)))
    colf = jnp.pad(colf, ((0, Mp - M), (0, Rp - R)))
    rowf = jnp.pad(rowf, ((0, Rp - R), (0, Kp - K)))
    maskf = jnp.pad(mask.astype(jnp.float32), ((0, Mp - M), (0, Kp - K)))
    G = Kp // _TK

    # index maps derive every component from j so all stay i32 under x64
    grid_spec = pl.GridSpec(
        grid=(G,),
        in_specs=[
            pl.BlockSpec((Mp, _TK), lambda j: (j * 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((Mp, Rp), lambda j: (j * 0, j * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Rp, _TK), lambda j: (j * 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((Mp, _TK), lambda j: (j * 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G, 128), lambda j: (j * 0, j * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 128), lambda j: (j * 0, j * 0), memory_space=pltpu.VMEM),
        ],
    )
    tile_vals, tile_idx = pl.pallas_call(
        _kernel,
        out_shape=[jax.ShapeDtypeStruct((G, 128), jnp.float32),
                   jax.ShapeDtypeStruct((G, 128), jnp.int32)],
        grid_spec=grid_spec,
    )(vals, colf, rowf, maskf)

    per_tile_val = tile_vals[:, 0]           # (G,)
    per_tile_idx = tile_idx[:, 0]            # flat index within padded tile
    g = jnp.argmax(per_tile_val)
    local = per_tile_idx[g]
    # local indexes the (Mp, _TK) tile in row-major; convert to (M, K) flat
    li, lj = local // _TK, local % _TK
    col = g * _TK + lj
    flat = li * K + col
    return flat.astype(jnp.int32), per_tile_val[g]


# ---------------------------------------------------------------- lookups
_TB = 512    # batch-rows tile (sublanes)


def _lookup_kernel(tab_ref, ind_ref, a_out, b_out, c_out):
    """Small-table lookup tile: out_l[b, j] = tab[l, ind[b, j]] by a
    compare-select loop over the table entries — each limb selection is
    EXACT (0/1 select of an f32 value), and the (B, d, n) one-hot tensor
    the XLA MXU path materializes in HBM (3.4 GB per C_256-wide integrand
    call) never exists: the whole tile stays in VMEM/registers."""
    idx = ind_ref[:, :]
    n = tab_ref.shape[1]
    tab = tab_ref[:, :]                        # (3, n) VMEM tile
    z = jnp.zeros(idx.shape, jnp.float32)
    # statically unrolled over the (small) table: a traced fori_loop
    # counter is promoted to i64 under the x64 rewrite, which Mosaic's
    # comparison lowering rejects (RecursionError observed on axon)
    a, b, c = z, z, z
    for k in range(n):
        m = idx == jnp.int32(k)
        a = jnp.where(m, tab[0, k], a)
        b = jnp.where(m, tab[1, k], b)
        c = jnp.where(m, tab[2, k], c)
    a_out[:, :] = a
    b_out[:, :] = b
    c_out[:, :] = c


def small_table_lookup_limbs(parts, ind, interpret: bool = False):
    """Pallas path of ops.dense.table_lookup: parts = three (n,) f32 limb
    tables (the exact _f32_split3 of the pow2-rescaled f64 table), ind
    (B, d) int32.  Returns the three (B, d) f32 per-limb selections; the
    caller recombines them in f64 (exact: non-overlapping mantissa limbs)
    exactly like _onehot_select.  Out-of-range indices select 0 in every
    limb (same contract as the one-hot / mode="fill" paths).

    Measured on the live v5e (2026-08-19, tools/mb_lookup.py): bitwise
    equal to the one-hot MXU path; at (100584, 255) x n=33 the one-hot
    path materializes a 3.15 GiB tensor (~3.3 ms device, bandwidth) vs
    ~1.7 ms here — the win scales with n (reference-default n=65 ~2x
    again).  interpret=True runs the Pallas interpreter (CPU tests)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ind = jnp.asarray(ind)
    B, d = ind.shape
    n = int(parts[0].shape[0])
    Bp = -(-B // _TB) * _TB
    Dp = -(-d // 128) * 128
    # pad with n: matches no table entry -> limb 0 (and keeps the pad
    # lanes harmless)
    indp = jnp.pad(ind.astype(jnp.int32), ((0, Bp - B), (0, Dp - d)),
                   constant_values=n)
    tab = jnp.stack([p.astype(jnp.float32) for p in parts])     # (3, n)

    # index maps derive every component from i so all stay i32 under x64
    # (a literal 0 becomes an i64 constant, which Mosaic rejects)
    grid_spec = pl.GridSpec(
        grid=(Bp // _TB,),
        in_specs=[
            pl.BlockSpec((3, n), lambda i: (i * 0, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TB, Dp), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((_TB, Dp), lambda i: (i, i * 0),
                                memory_space=pltpu.VMEM)] * 3,
    )
    a, b, c = pl.pallas_call(
        _lookup_kernel,
        out_shape=[jax.ShapeDtypeStruct((Bp, Dp), jnp.float32)] * 3,
        grid_spec=grid_spec,
        interpret=interpret,
    )(tab, indp)
    return a[:B, :d], b[:B, :d], c[:B, :d]
