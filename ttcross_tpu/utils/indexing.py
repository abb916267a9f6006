"""Multi-index arithmetic over TT mode grids.

Maps ttind.f90: linear <-> multi-index conversion (ttindex,
ttind.f90:91-105), flattening to scalars (dble/int, ttind.f90:108-129), and
lexicographic comparison / sorted search / insertion (ttind.f90:132-212).
Vectorized over (B, d) index matrices.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["lin_to_multi", "multi_to_lin", "lex_compare", "lex_sort", "lex_find", "lex_push"]


def lin_to_multi(lin, n) -> jnp.ndarray:
    """Linear index -> multi-index (0-based, first mode fastest, matching
    the reference's Fortran column-major convention, ttind.f90:91-105)."""
    n = jnp.asarray(n)
    lin = jnp.asarray(lin)
    out = []
    for c in range(n.shape[0]):
        out.append(lin % n[c])
        lin = lin // n[c]
    return jnp.stack(out, axis=-1)


def multi_to_lin(ind, n) -> jnp.ndarray:
    n = np.asarray(n)
    ind = jnp.asarray(ind)
    stride = np.concatenate([[1], np.cumprod(n[:-1])])
    return jnp.tensordot(ind, jnp.asarray(stride), axes=[[-1], [0]])


def lex_compare(a, b) -> int:
    """-1 / 0 / +1 lexicographic comparison, last mode most significant
    (ttind comparison operators, ttind.f90:132-168)."""
    a, b = np.asarray(a), np.asarray(b)
    for c in range(a.shape[0] - 1, -1, -1):
        if a[c] != b[c]:
            return -1 if a[c] < b[c] else 1
    return 0


def lex_sort(inds) -> np.ndarray:
    inds = np.asarray(inds)
    order = np.lexsort(inds.T)
    return inds[order]


def lex_find(sorted_inds, ind) -> int:
    """Binary search in a lexicographically sorted index list; returns the
    position of the match, or -1 (find, ttind.f90:170-196)."""
    lo, hi = 0, len(sorted_inds)
    while lo < hi:
        mid = (lo + hi) // 2
        c = lex_compare(sorted_inds[mid], ind)
        if c == 0:
            return mid
        if c < 0:
            lo = mid + 1
        else:
            hi = mid
    return -1


def lex_push(sorted_inds, ind) -> np.ndarray:
    """Insert keeping lexicographic order, dropping duplicates
    (push, ttind.f90:198-212)."""
    sorted_inds = np.asarray(sorted_inds)
    if len(sorted_inds) and lex_find(sorted_inds, ind) >= 0:
        return sorted_inds
    out = np.concatenate([sorted_inds.reshape(-1, len(ind)), np.asarray(ind)[None]], axis=0)
    return lex_sort(out)
