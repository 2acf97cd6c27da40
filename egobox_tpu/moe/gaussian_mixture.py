"""GaussianMixture: x-marginal MVN mixture for expert recombination.

Behavioral parity with crates/moe/src/gaussian_mixture.rs:30-299: cluster
responsibilities (predict_probas), hard assignment (predict), and the
heaviside factor — a smoothing knob that scales every covariance by ``f``
(implemented exactly as the reference does, by scaling the precision
Cholesky factors by f^{-1/2}). Derivatives of the responsibilities come
from jax.jacfwd instead of the hand-written formulas
(gaussian_mixture.rs:127-170), which remain test oracles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from .gmm import GmmParams, gmm_log_prob


@struct.dataclass
class GaussianMixture:
    weights: jnp.ndarray  # (k,)
    means: jnp.ndarray  # (k, nx)
    covariances: jnp.ndarray  # (k, nx, nx)
    precisions_chol: jnp.ndarray  # (k, nx, nx): C^-T with cov = C C^T
    heaviside_factor: jnp.ndarray  # scalar

    @property
    def n_clusters(self) -> int:
        return self.means.shape[0]

    def with_heaviside(self, factor) -> "GaussianMixture":
        return self.replace(
            heaviside_factor=jnp.asarray(factor, self.means.dtype)
        )


def from_gmm_x_marginal(gmm: GmmParams, nx: int) -> GaussianMixture:
    """Marginalize a joint (x, y) GMM onto x
    (ref: moe/src/algorithm.rs derive gmx from GMM on (x,y))."""
    covs_x = gmm.covariances[:, :nx, :nx]
    from .gmm import _precision_chol

    pchol = jax.vmap(lambda c: _precision_chol(c, 1e-10))(covs_x)
    return GaussianMixture(
        weights=gmm.weights,
        means=gmm.means[:, :nx],
        covariances=covs_x,
        precisions_chol=pchol,
        heaviside_factor=jnp.asarray(1.0, gmm.means.dtype),
    )


def _scaled_pchol(gmx: GaussianMixture) -> jnp.ndarray:
    """heaviside factor f scales covariances by f, i.e. precision chol by
    f^{-1/2} (ref: gaussian_mixture.rs compute_log_det / heaviside_factor)."""
    return gmx.precisions_chol * gmx.heaviside_factor ** (-0.5)


def predict_probas(gmx: GaussianMixture, x: jnp.ndarray) -> jnp.ndarray:
    """Cluster responsibilities at x (n, nx) -> (n, k)
    (ref: gaussian_mixture.rs:230-253)."""
    if gmx.n_clusters == 1:
        return jnp.ones((x.shape[0], 1), x.dtype)
    logp = gmm_log_prob(x, gmx.means, _scaled_pchol(gmx)) + jnp.log(
        jnp.maximum(gmx.weights, 1e-300)
    )
    lse = jax.scipy.special.logsumexp(logp, axis=1, keepdims=True)
    return jnp.exp(logp - lse)


def predict_cluster(gmx: GaussianMixture, x: jnp.ndarray) -> jnp.ndarray:
    """Hard cluster assignment = argmax responsibility, (n,)
    (ref: gaussian_mixture.rs:302-316)."""
    if gmx.n_clusters == 1:
        return jnp.zeros((x.shape[0],), jnp.int32)
    logp = gmm_log_prob(x, gmx.means, _scaled_pchol(gmx)) + jnp.log(
        jnp.maximum(gmx.weights, 1e-300)
    )
    return jnp.argmax(logp, axis=1).astype(jnp.int32)


def predict_probas_derivatives(gmx: GaussianMixture,
                               x: jnp.ndarray) -> jnp.ndarray:
    """d probas / dx per row: (n, k, nx) (ref: analytic derivation
    gaussian_mixture.rs:127-170 — here exact via jax.jacfwd)."""
    jac = jax.jacfwd(lambda xi: predict_probas(gmx, xi[None, :])[0])
    return jax.vmap(jac)(x)
