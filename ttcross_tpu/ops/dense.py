"""Dense linear-algebra kernels.

Maps the reference's L3 layer: mat.f90 (svd wrapper with rank chopping,
matinv, eye/laplace, power-iteration norm), ort.f90 (QR orthogonalization,
Gram-Schmidt with re-orthogonalization), lr.f90's dense routines (ACA to
tolerance lr_d2, greedy CUR d2_lrg), and trans.f90 (2-D/3-D permutations).
All dense factorizations lower to XLA's MXU kernels; iterative routines use
lax control flow so they stay jittable.
"""

from __future__ import annotations

import contextlib
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..tt.ortho import chop_rank

__all__ = [
    "svd_chopped", "matinv", "eye", "laplace", "norm2p",
    "qr_ort", "gram_schmidt", "orto_block",
    "aca", "greedy_cur", "transpose2d", "transpose3d",
    "table_lookup", "onehot_rows", "row_lookup",
]


def onehot_rows(ind, n: int, dtype=jnp.float32):
    """Exact one-hot encoding of integer indices: (..., n)."""
    ind = jnp.asarray(ind)
    return (ind[..., None] == jnp.arange(n)).astype(dtype)


_LOOKUP_BACKEND_OVERRIDE: list = []   # stack; "cpu" forces gather paths


@contextlib.contextmanager
def lookup_backend(name: str):
    """Force the table-lookup dispatch for code traced inside the context.

    ``jax.default_backend()`` reports the process default platform even
    when a computation is being staged for another device (verified on
    jax 0.9: jit under ``jax.default_device(cpu)`` from a TPU session
    still sees "tpu"), so code compiled FOR the CPU from a TPU session
    would bake the one-hot MXU path.  The auto-derived host integrand
    twin (cross/skeleton.py::derive_host_fun) traces under
    ``lookup_backend("cpu")`` so its CPU executable uses native gathers."""
    _LOOKUP_BACKEND_OVERRIDE.append(str(name))
    try:
        yield
    finally:
        _LOOKUP_BACKEND_OVERRIDE.pop()


def _mxu_backend() -> bool:
    """True when the default backend has a matrix unit (TPU/axon): the
    one-hot lookup trick trades gathers (the TPU slow path, ~ns/element)
    for MXU matmuls; on CPU the trade INVERTS (three matmuls + f32 splits
    cost ~30% of a C_32 sweep vs a native gather).  Resolved at trace
    time — by then the backend is already selected and initialized."""
    if _LOOKUP_BACKEND_OVERRIDE:
        return _LOOKUP_BACKEND_OVERRIDE[-1] != "cpu"
    try:
        return jax.default_backend() != "cpu"
    except Exception:
        return True


def _f32_split3(x):
    """Exact 3-term f32 decomposition of normal-range f64: x = a + b + c
    bit-for-bit (24+24+5 mantissa bits cover f64's 53; each residual is
    f32-representable for |x| within f32's exponent range)."""
    a = x.astype(jnp.float32)
    r = x - a.astype(jnp.float64)
    b = r.astype(jnp.float32)
    c = (r - b.astype(jnp.float64)).astype(jnp.float32)
    return a, b, c


def _pow2_rescale(x):
    """(scale, inv_scale) power-of-2 pair centring max|x| near 1, so the
    f32 split never overflows to inf (one inf entry would 0*inf = NaN the
    WHOLE one-hot contraction) and entries within ~75 orders of the max
    keep full precision.  Power-of-2 multiplies are exact, so the rescale
    does not perturb the lookup."""
    from .dd import _exact_pow2

    m = jnp.max(jnp.abs(x))
    e = jnp.floor(jnp.log2(jnp.where((m > 0) & jnp.isfinite(m), m, 1.0)))
    e = jnp.where(jnp.isfinite(e), e, 0.0)
    return _exact_pow2(-e), _exact_pow2(e)


def _onehot_select(parts, oh, axis):
    """Sum of exact one-hot contractions against the f32 split parts.
    HIGHEST keeps each f32 contraction exact on the MXU's bf16-split
    passes: the one-hot factor is 0/1 (exact at every split level), so
    each pass contributes one exact addend and the accumulation of
    non-overlapping mantissa splits never rounds."""
    P = jax.lax.Precision.HIGHEST
    out = None
    for part in parts:
        t = jnp.tensordot(oh, part, axes=[[-1], [axis]], precision=P)
        out = t.astype(jnp.float64) if out is None else out + t.astype(jnp.float64)
    return out


def table_lookup(table, ind):
    """Gather-free table lookup: out[...] = table[ind[...]] for a small 1-D
    f64 table, computed EXACTLY as three f32 one-hot matmuls on the MXU.

    TPU row-gathers run at a few ns/element, and integrand-style lookups
    (nodes[ind] on a (B, d) index batch) dominated sweep traces (~75%).
    A one-hot contraction instead streams at matmul speed, and is exact:
    each one-hot dot picks one addend of the 3-term f32 split with no
    rounding, and the f64 sum reassembles the original value bit-for-bit.
    A power-of-2 rescale keeps arbitrary-magnitude tables inside f32's
    exponent range (entries more than ~75 orders below the table max
    round toward zero — the only precision caveat)."""
    table = jnp.asarray(table)
    if not _mxu_backend():
        # CPU: a native gather beats three one-hot matmuls (~30% of the
        # C_32 sweep on the 1-core fallback host); mode="fill" reproduces
        # the one-hot's out-of-range -> 0 contract exactly
        return jnp.take(table, ind, axis=0, mode="fill", fill_value=0)
    ind = jnp.asarray(ind)
    s, sinv = _pow2_rescale(table)
    parts = _f32_split3(table * s)
    # big 2-D batches (long-chain integrands): a Pallas compare-select
    # kernel does the per-limb selection entirely in VMEM — the one-hot
    # tensor below costs ind.size * n f32 of HBM traffic (3.15 GiB per
    # C_256-wide integrand call; measured 2x device win at n=33,
    # tools/mb_lookup.py).  OPT-IN (TTCROSS_PALLAS_LOOKUP=1): embedding
    # the Mosaic kernel inside the fused while_loop run program pushed
    # the axon remote AOT compile past 25 min (standalone it compiles in
    # seconds) — on this deployment the compile cost buries the ~1.6
    # ms/call win, so the default stays on the XLA one-hot path
    if (ind.ndim == 2 and ind.size * table.shape[0] >= (1 << 24)
            and os.environ.get("TTCROSS_PALLAS_LOOKUP", "0")
            in ("1", "true")):
        from .pallas_kernels import small_table_lookup_limbs

        a, b, c = small_table_lookup_limbs(parts, ind)
        return ((a.astype(jnp.float64) + b.astype(jnp.float64)
                 + c.astype(jnp.float64)) * sinv)
    oh = onehot_rows(ind, table.shape[0])
    return _onehot_select(parts, oh, 0) * sinv


def row_lookup(mat, lin, axis: int = 0):
    """Gather-free row (axis=0) / column (axis=1) selection from a 2-D f64
    matrix: out[b, :] = mat[lin[b], :] (or mat[:, lin[b]]), exact via the
    same one-hot split-f32 MXU contraction (and power-of-2 range rescale)
    as table_lookup."""
    mat = jnp.asarray(mat)
    if not _mxu_backend():
        out = jnp.take(mat, lin, axis=axis, mode="fill", fill_value=0)
        return out if axis == 0 else out.T
    oh = onehot_rows(lin, mat.shape[axis])
    s, sinv = _pow2_rescale(mat)
    return _onehot_select(_f32_split3(mat * s), oh, axis) * sinv


def batched_row_lookup(tabs, lin):
    """Gather-free BATCHED row selection: out[b, l, :] = tabs[b, lin[b, l], :]
    (lin may also be (B,), returning (B, K)).  vmap of row_lookup over the
    leading axis — the one-hot contraction becomes one batched MXU matmul,
    replacing per-bond take_along_axis row-gathers (the TPU slow path) in
    the all-bonds jacobi sweep."""
    lin = jnp.asarray(lin)
    single = lin.ndim == 1
    if single:
        lin = lin[:, None]
    out = jax.vmap(row_lookup)(jnp.asarray(tabs), lin)
    return out[:, 0] if single else out


def svd_chopped(a, tol: float | None = None, rmax: int | None = None):
    """SVD with rank truncation: returns (u, s, vh, err) with the chopped
    rank from the reference's tail-energy rule (svd + chop,
    mat.f90:340-458)."""
    a = np.asarray(a)
    u, s, vh = np.linalg.svd(a, full_matrices=False)
    r = chop_rank(s, tol=tol, rmax=rmax)
    err = float(np.linalg.norm(s[r:]))
    return u[:, :r], s[:r], vh[:r], err


def matinv(a, method: str = "svd", tol: float = 0.0):
    """Matrix (pseudo-)inverse via SVD with small-singular-value cutoff or
    plain LU solve (matinv, mat.f90:23-236)."""
    a = jnp.asarray(a)
    if method == "lu":
        return jnp.linalg.inv(a)
    u, s, vh = jnp.linalg.svd(a, full_matrices=False)
    cutoff = jnp.maximum(tol * jnp.max(s), 0.0)
    sinv = jnp.where(s > cutoff, 1.0 / jnp.where(s > cutoff, s, 1.0), 0.0)
    return (vh.T.conj() * sinv) @ u.T.conj()


def eye(m: int, n: int | None = None, dtype=jnp.float64):
    """Rectangular identity (eye, mat.f90:239-258)."""
    return jnp.eye(m, n or m, dtype=dtype)


def laplace(n: int, dtype=jnp.float64):
    """1-D Laplacian stencil matrix tridiag(-1, 2, -1) (laplace, mat.f90)."""
    return (2.0 * jnp.eye(n, dtype=dtype)
            - jnp.eye(n, k=1, dtype=dtype) - jnp.eye(n, k=-1, dtype=dtype))


def norm2p(a, iters: int = 32, key=0):
    """Spectral norm by power iteration on A^T A (norm2p_d,
    mat.f90:474-507); jittable."""
    a = jnp.asarray(a)
    if isinstance(key, int):
        key = jax.random.PRNGKey(key)
    v = jax.random.normal(key, (a.shape[1],), dtype=a.real.dtype)
    v = v / jnp.linalg.norm(v)

    def body(_, v):
        w = a.conj().T @ (a @ v)
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-300)

    v = jax.lax.fori_loop(0, iters, body, v)
    return jnp.linalg.norm(a @ v)


def qr_ort(a):
    """Orthonormalize columns, returning (Q, R) with economy shapes
    (ort0, ort.f90:17-149 — dgeqrf/dorgqr replaced by XLA QR)."""
    return jnp.linalg.qr(jnp.asarray(a), mode="reduced")


def gram_schmidt(basis, v, passes: int = 3, tol: float = 0.5):
    """Orthogonalize vector v against orthonormal columns of `basis` with
    up-to-`passes` re-orthogonalization passes, stopping early once the
    norm stops collapsing (ort1, ort.f90:152-228).  Returns (v_ortho,
    coeffs)."""
    basis = jnp.asarray(basis)
    v = jnp.asarray(v)
    coeffs = jnp.zeros((basis.shape[1],), v.dtype)

    def body(carry):
        v, coeffs, it, prev = carry
        c = basis.conj().T @ v
        v = v - basis @ c
        nrm = jnp.linalg.norm(v)
        return v, coeffs + c, it + 1, nrm

    def cond(carry):
        v, _, it, prev = carry
        return (it < passes) & (jnp.linalg.norm(v) < tol * prev)

    c0 = basis.conj().T @ v
    v1 = v - basis @ c0
    out = jax.lax.while_loop(cond, body, (v1, c0, 1, jnp.linalg.norm(v)))
    return out[0], out[1]


def orto_block(basis, block):
    """Orthogonalize the columns of `block` against `basis` then among
    themselves (orto, ort.f90:231-361)."""
    basis = jnp.asarray(basis)
    block = jnp.asarray(block)
    block = block - basis @ (basis.conj().T @ block)
    block = block - basis @ (basis.conj().T @ block)  # one re-orthogonalization
    q, _ = jnp.linalg.qr(block, mode="reduced")
    return q


def aca(a, tol: float = 1e-12, rmax: int | None = None):
    """Adaptive cross approximation of a dense matrix to tolerance:
    returns (u, v, err) with a ~= u @ v (lr_d2, lr.f90:11-70; greedy
    column-max pivoting with rank-1 deflation)."""
    a = np.asarray(a)
    m, n = a.shape
    rmax = min(rmax or min(m, n), min(m, n))
    z = a.copy()
    nrm = np.linalg.norm(a)
    us, vs = [], []
    err = nrm
    while len(us) < rmax and err > tol * max(nrm, 1e-300):
        j = np.argmax(np.abs(z).max(axis=0))
        i = np.argmax(np.abs(z[:, j]))
        piv = z[i, j]
        if piv == 0:
            break
        u = z[:, j].copy()
        v = z[i, :] / piv
        z -= np.outer(u, v)
        us.append(u)
        vs.append(v)
        err = np.linalg.norm(z)
    u = np.stack(us, axis=1) if us else np.zeros((m, 0))
    v = np.stack(vs, axis=0) if vs else np.zeros((0, n))
    return u, v, err / max(nrm, 1e-300)


def greedy_cur(a, r: int):
    """Greedy rank-r CUR by global residual max: returns (u, v, rows, cols)
    with a ~= u @ v (d2_lrg, lr.f90:73-96)."""
    a = np.asarray(a)
    m, n = a.shape
    e = a.copy()
    u = np.zeros((m, r))
    v = np.zeros((r, n))
    rows, cols = [], []
    for p in range(r):
        i, j = np.unravel_index(np.argmax(np.abs(e)), e.shape)
        rows.append(int(i))
        cols.append(int(j))
        u[:, p] = e[:, j]
        v[p, :] = e[i, :] / e[i, j]
        e -= np.outer(u[:, p], v[p, :])
    return u, v, rows, cols


def transpose2d(a):
    """2-D transpose (trans.f90:19-70; on TPU a relayout XLA handles)."""
    return jnp.asarray(a).T


_PRM3 = {1: (0, 1, 2), 2: (0, 2, 1), 3: (1, 0, 2), 4: (2, 1, 0), 5: (1, 2, 0), 6: (2, 0, 1)}


def transpose3d(p: int, a):
    """The six 3-D permutations keyed like the reference's prm3 table
    (d3_trans + prm3, trans.f90:72-240)."""
    return jnp.transpose(jnp.asarray(a), _PRM3[p])


def pow2_balance_mats(x):
    """Batched pow2_balance over a (K, R, R) stack: per-matrix EXACT
    power-of-2 rescale.  Returns (x * 2^-e, e) with e (K,) and
    max|x * 2^-e| per matrix near 1 (zero / non-finite matrices pass
    through with e = 0)."""
    from .dd import _exact_pow2

    m = jnp.max(jnp.abs(x), axis=(-2, -1))
    e = jnp.floor(jnp.log2(jnp.where((m > 0) & jnp.isfinite(m), m, 1.0)))
    e = jnp.where(jnp.isfinite(e), e, 0.0)
    return x * _exact_pow2(-e)[..., None, None], e


def balanced_matmul_chain(mats):
    """Ordered product of a (K, R, R) matrix stack as a log2(K)-depth
    pairwise tree — identity-padded to a power of two, one batched
    matmul + exact power-of-2 rebalance per level — instead of a K-step
    serial chain.  Returns (P, e) with  mats[0] @ ... @ mats[K-1] =
    P * 2^e  and max|P| ~ 1: long chains (d ~ 256+) overflow the raw
    partial products (see engine.value_fn), so the exponent rides
    separately.  Matrix association is exact; only rounding order
    changes (pairwise is O(log K) rounding growth vs O(K) serial).

    Serial chains of dependent small matmuls are latency-bound on TPU
    (~33 ms at K=255, measured 2026-08-19); the tree is log2(K) batched
    kernels."""
    K, R = mats.shape[0], mats.shape[-1]
    mats, ex = pow2_balance_mats(mats)
    P = 1 << max(K - 1, 1).bit_length()        # next power of two >= K
    if P > K:
        pad_eye = jnp.broadcast_to(jnp.eye(R, dtype=mats.dtype),
                                   (P - K, R, R))
        mats = jnp.concatenate([mats, pad_eye], axis=0)
        ex = jnp.concatenate([ex, jnp.zeros((P - K,), ex.dtype)])
    while mats.shape[0] > 1:
        # broadcast-multiply + reduce-sum, NOT einsum: a batched f64
        # dot_general lowers to a SERIAL while loop on this platform's
        # pair-emulated f64 (~1.3 ms per einsum at C_256, traced
        # 2026-08-21); the elementwise product + reduce fuses into
        # ordinary VPU kernels.  R is small (~10-25) so the (k, R, R, R)
        # intermediate stays tiny.
        prod = jnp.sum(mats[0::2][:, :, :, None] * mats[1::2][:, None],
                       axis=2)
        prod, e = pow2_balance_mats(prod)
        mats, ex = prod, ex[0::2] + ex[1::2] + e
    return mats[0], ex[0]
