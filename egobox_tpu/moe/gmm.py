"""Gaussian mixture model fitting via EM, TPU-native.

Replaces linfa-clustering's GMM (used at crates/moe/src/algorithm.rs:120-123
with n_runs=20): k-means++ seeded EM with full covariances, where the
``n_runs`` random restarts execute as ONE vmapped batch on-chip and the best
run is selected by final log-likelihood. All loops are lax.fori_loop /
lax.scan with fixed trip counts — compile-once, shape-static.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular


class GmmParams(NamedTuple):
    weights: jnp.ndarray  # (k,)
    means: jnp.ndarray  # (k, d)
    covariances: jnp.ndarray  # (k, d, d)
    precisions_chol: jnp.ndarray  # (k, d, d) lower L with L L^T = Sigma^-1
    log_likelihood: jnp.ndarray  # scalar mean log-likelihood


def _precision_chol(cov: jnp.ndarray, reg: float) -> jnp.ndarray:
    """Lower Cholesky of the precision matrix from a covariance matrix:
    Sigma = C C^T  =>  Sigma^-1 = C^-T C^-1, precision chol = C^-T (lower)."""
    d = cov.shape[-1]
    c = jnp.linalg.cholesky(cov + reg * jnp.eye(d, dtype=cov.dtype))
    ci = solve_triangular(c, jnp.eye(d, dtype=cov.dtype), lower=True)
    return ci.T  # upper? we store as the transpose-inverse; see log_prob


def gmm_log_prob(x: jnp.ndarray, means: jnp.ndarray,
                 precisions_chol: jnp.ndarray) -> jnp.ndarray:
    """Per-component multivariate normal log-density, (n, k).

    ``precisions_chol[k]`` is C_k^-T where cov = C_k C_k^T, so
    (x - mu) @ precisions_chol has squared norm (x-mu)^T Sigma^-1 (x-mu).
    (Same contract as the reference's GaussianMixture log-gaussian prob,
    moe/src/gaussian_mixture.rs:257-282.)"""
    n, d = x.shape
    diffs = x[:, None, :] - means[None, :, :]  # (n, k, d)
    z = jnp.einsum("nkd,kde->nke", diffs, precisions_chol)
    maha = jnp.sum(z**2, axis=-1)  # (n, k)
    # log|Sigma^-1|^{1/2} = sum log diag of the inverse-chol factor
    logdet = jnp.sum(
        jnp.log(jnp.abs(jnp.diagonal(precisions_chol, axis1=1, axis2=2))),
        axis=1,
    )  # (k,)
    c = -0.5 * d * jnp.log(2.0 * jnp.pi)
    return c + logdet[None, :] - 0.5 * maha


def _kmeanspp_init(key, x, k):
    """k-means++ seeding, fixed k iterations."""
    n = x.shape[0]
    k0, key = jax.random.split(key)
    first = jax.random.randint(k0, (), 0, n)
    centers0 = jnp.tile(x[first], (k, 1))

    def body(i, carry):
        centers, key = carry
        d2 = jnp.min(
            jnp.sum((x[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
            + jnp.where(jnp.arange(k)[None, :] < i, 0.0, jnp.inf),
            axis=1,
        )
        key, sub = jax.random.split(key)
        probs = d2 / jnp.maximum(jnp.sum(d2), 1e-30)
        idx = jax.random.choice(sub, n, p=probs)
        return centers.at[i].set(x[idx]), key

    centers, _ = lax.fori_loop(1, k, body, (centers0, key))
    return centers


def _kmeans(key, x, k, n_iter=10):
    centers = _kmeanspp_init(key, x, k)

    def step(centers, _):
        d2 = jnp.sum((x[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
        assign = jnp.argmin(d2, axis=1)  # (n,)
        onehot = jax.nn.one_hot(assign, k, dtype=x.dtype)  # (n, k)
        counts = onehot.sum(axis=0)  # (k,)
        sums = onehot.T @ x  # (k, d)
        new = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)[:, None],
            centers,
        )
        return new, None

    centers, _ = lax.scan(step, centers, None, length=n_iter)
    return centers


def _em_fit(key, x, k, n_iter, reg):
    n, d = x.shape
    dtype = x.dtype
    centers = _kmeans(key, x, k)
    # init responsibilities by nearest center
    d2 = jnp.sum((x[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
    resp = jax.nn.one_hot(jnp.argmin(d2, axis=1), k, dtype=dtype)

    def m_step(resp):
        nk = resp.sum(axis=0) + 10.0 * jnp.finfo(dtype).eps  # (k,)
        weights = nk / n
        means = (resp.T @ x) / nk[:, None]
        diffs = x[:, None, :] - means[None, :, :]  # (n, k, d)
        covs = jnp.einsum("nk,nkd,nke->kde", resp, diffs, diffs) / nk[
            :, None, None
        ]
        pchol = jax.vmap(lambda c: _precision_chol(c, reg))(covs)
        return weights, means, covs, pchol

    def e_step(weights, means, pchol):
        logp = gmm_log_prob(x, means, pchol) + jnp.log(
            jnp.maximum(weights, 1e-30)
        )
        lse = jax.scipy.special.logsumexp(logp, axis=1, keepdims=True)
        return jnp.exp(logp - lse), jnp.mean(lse)

    def step(carry, _):
        resp, _ = carry
        weights, means, covs, pchol = m_step(resp)
        resp, ll = e_step(weights, means, pchol)
        return (resp, ll), None

    (resp, ll), _ = lax.scan(step, (resp, jnp.asarray(-jnp.inf, dtype)),
                             None, length=n_iter)
    weights, means, covs, pchol = m_step(resp)
    _, ll = e_step(weights, means, pchol)
    return GmmParams(weights, means, covs, pchol, ll)


@partial(jax.jit, static_argnames=("k", "n_runs", "n_iter"))
def fit_gmm(key, x: jnp.ndarray, k: int, n_runs: int = 20,
            n_iter: int = 50, reg: float = 1e-6) -> GmmParams:
    """Fit a k-component GMM; best of n_runs vmapped random restarts
    (ref: linfa GMM n_runs=20 at moe/src/algorithm.rs:120-123)."""
    if k == 1:
        # single cluster: closed form, no EM needed
        n, d = x.shape
        mean = x.mean(axis=0)
        diff = x - mean
        cov = (diff.T @ diff) / n
        pchol = _precision_chol(cov, reg)[None]
        lp = gmm_log_prob(x, mean[None], pchol)
        return GmmParams(
            weights=jnp.ones((1,), x.dtype),
            means=mean[None],
            covariances=cov[None],
            precisions_chol=pchol,
            log_likelihood=jnp.mean(lp),
        )
    keys = jax.random.split(key, n_runs)
    runs = jax.vmap(lambda kk: _em_fit(kk, x, k, n_iter, reg))(keys)
    lls = jnp.where(jnp.isfinite(runs.log_likelihood),
                    runs.log_likelihood, -jnp.inf)
    best = jnp.argmax(lls)
    return jax.tree_util.tree_map(lambda a: a[best], runs)
