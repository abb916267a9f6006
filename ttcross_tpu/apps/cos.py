"""Fang-Oosterlee COS method pipeline: sign vectors, Gaussian characteristic
function, COS coefficient tensors, and density reconstruction.

Maps s_vectors.f90 (generate_s_vectors), funcs.f90 (gaussian_chf_nd),
coefficients.f90 (calc_coefficient), and cos_approx.f90 (cos_approximate /
cos_approximate_array).  The reference builds these on module-global state
one entry at a time; here everything is a pure batched function closed over
an immutable problem bundle — the coefficient tensor entry evaluation is a
(B, 2^{d-1}, d) vectorized sweep suitable for the cross engine's batched
integrand protocol.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

__all__ = [
    "s_vectors",
    "gaussian_chf",
    "CosCoefficients",
    "make_cos_coefficients",
    "cos_approximate",
]


def s_vectors(d: int) -> np.ndarray:
    """All 2^(d-1) sign vectors with first component +1, shape (2^(d-1), d)
    (generate_s_vectors, s_vectors.f90:7-29)."""
    k = np.arange(2 ** (d - 1))
    bits = (k[:, None] >> np.arange(d - 1)[None, :]) & 1
    s = np.concatenate([np.ones((k.size, 1), dtype=np.int64), 1 - 2 * bits], axis=1)
    return s


def gaussian_chf(omega, mu, sigma):
    """phi(omega) = exp(i omega.mu - 1/2 omega^T Sigma omega), batched over
    leading axes of omega (gaussian_chf_nd, funcs.f90:8-26)."""
    omega = jnp.asarray(omega)
    mu = jnp.asarray(mu)
    sigma = jnp.asarray(sigma)
    dot_mu = jnp.tensordot(omega, mu, axes=[[-1], [0]])
    quad = jnp.einsum("...i,ij,...j->...", omega, sigma, omega)
    return jnp.exp(1j * dot_mu - 0.5 * quad)


@dataclass(frozen=True)
class CosCoefficients:
    """COS coefficient tensor of a Gaussian: the black-box integrand crossed
    by test_crs_coscoeff (calc_coefficient, coefficients.f90:33-65)."""

    d: int
    mu: np.ndarray
    sigma: np.ndarray
    lower: float
    upper: float

    def fun(self, ind):
        """Batched entry evaluation: ind (B, d) int -> (B,) f64.

        f(ind) = 2/(b-a)^d  sum_s  Re[ e^{-i a sum_j t_j} phi(t) ],
        with t_j = pi s_j (ind_j) / (b - a)  (0-based ind; the reference's
        ind_j - 1 with 1-based indices, coefficients.f90:52-57)."""
        ind = jnp.asarray(ind)
        sv = jnp.asarray(s_vectors(self.d), dtype=jnp.float64)  # (S, d)
        one_over = 1.0 / (self.upper - self.lower)
        t = (np.pi * one_over) * sv[None, :, :] * ind[:, None, :].astype(jnp.float64)
        phi = gaussian_chf(t, self.mu, self.sigma)               # (B, S)
        phase = jnp.exp(-1j * self.lower * jnp.sum(t, axis=-1))  # (B, S)
        real_sum = jnp.sum(jnp.real(phase * phi), axis=-1)
        return 2.0 * one_over**self.d * real_sum


def make_cos_coefficients(d: int, mu, sigma, lower: float, upper: float) -> CosCoefficients:
    return CosCoefficients(d=d, mu=np.asarray(mu, dtype=np.float64),
                           sigma=np.asarray(sigma, dtype=np.float64),
                           lower=float(lower), upper=float(upper))


def cos_approximate(xs, phis, lower: float, upper: float, n_terms: int | None = None):
    """COS density reconstruction from characteristic-function values,
    vectorized over xs (cos_approximate_array, cos_approx.f90:88-127):

      pdf(x) = sum_{k=0}^{K-1} c_k cos(omega_k (x - a)),
      c_k = 2/(b-a) Re[phi_k e^{-i omega_k a}],  c_0 halved.
    """
    xs = jnp.atleast_1d(jnp.asarray(xs, dtype=jnp.float64))
    phis = jnp.asarray(phis)
    K = phis.shape[0] if n_terms is None else n_terms
    if K > phis.shape[0]:
        raise ValueError("n_terms exceeds the number of CHF values")
    k = jnp.arange(K, dtype=jnp.float64)
    omega = k * np.pi / (upper - lower)
    coeff = 2.0 / (upper - lower) * jnp.real(phis[:K] * jnp.exp(-1j * omega * lower))
    coeff = coeff.at[0].multiply(0.5)
    return jnp.cos(omega[None, :] * (xs[:, None] - lower)) @ coeff
