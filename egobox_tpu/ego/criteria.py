"""Infill criteria: EI, LogEI (default), WB2, WB2S, and probability of
feasibility — all smooth jittable functions of the surrogate posterior.

Behavioral parity with crates/ego/src/criteria/{ei.rs,wb2.rs} and
utils/{logei_helper.rs,cstr_pof.rs}. Gradients come from jax.grad (the
reference's hand-written grads are test oracles). The numerically-stable
log_ei_helper follows the same three-branch scheme as the reference
(logei_helper.rs:22-37) but with an asymptotic-series erfcx for very large
|u| where exp(u^2)*erfc(u) would degenerate.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import erfc, log_ndtr, ndtr

_SQRT_2PI = 2.5066282746310007
_INV_SQRT_2 = 0.7071067811865475
_LOG_2PI_OVER_2 = 0.9189385332046727  # log(2*pi)/2
_LOG_PI_OVER_2_OVER_2 = 0.2257913526447274  # log(pi/2)/2
_SQRT_PI = 1.7724538509055159


def norm_pdf(u):
    return jnp.exp(-0.5 * u * u) / _SQRT_2PI


def norm_cdf(u):
    return ndtr(u)


def erfcx(z):
    """Scaled complementary error function exp(z^2) erfc(z) for z >= 0,
    switching to the asymptotic series where the product under/overflows."""
    z_small = jnp.minimum(z, 25.0)
    direct = jnp.exp(z_small * z_small) * erfc(z_small)
    zs = jnp.maximum(z, 25.0)
    inv2 = 1.0 / (zs * zs)
    series = (1.0 - 0.5 * inv2 + 0.75 * inv2 * inv2) / (zs * _SQRT_PI)
    return jnp.where(z < 25.0, direct, series)


def _log1mexp(x):
    """log(1 - exp(x)) for x <= 0, numerically stable."""
    log2 = 0.6931471805599453
    # branch at -log 2 (standard Maechler 2012 scheme, same as reference)
    a = jnp.log(-jnp.expm1(jnp.minimum(x, -1e-300)))
    b = jnp.log1p(-jnp.exp(x))
    return jnp.where(x > -log2, a, b)


def log_ei_helper(u):
    """log(phi(u) + u * Phi(u)), stable over the whole real line
    (ref: logei_helper.rs:22-37)."""
    u = jnp.asarray(u)
    # branch 1: u > -1 — direct
    direct_arg = norm_pdf(u) + u * norm_cdf(u)
    b1 = jnp.log(jnp.maximum(direct_arg, 1e-300))

    # branch 2: -1e6 < u <= -1 — log phi + log1mexp(w)
    log_phi_u = -0.5 * u * u - _LOG_2PI_OVER_2
    um = jnp.minimum(u, -1.0)  # keep branch-2 math in its valid region
    w = (
        jnp.log(erfcx(-_INV_SQRT_2 * um) * jnp.abs(um))
        + _LOG_PI_OVER_2_OVER_2
    )
    b2 = log_phi_u + _log1mexp(jnp.minimum(w, -1e-300))

    # branch 3: u <= -1e6 — asymptotic
    b3 = log_phi_u - 2.0 * jnp.log(jnp.maximum(jnp.abs(u), 1.0))

    return jnp.where(u > -1.0, b1, jnp.where(u > -1e6, b2, b3))


def ei(mean, var, fmin, sigma_weight=1.0):
    """Expected improvement (ref: criteria/ei.rs:15-92). Returns 0 where the
    variance vanishes (training points)."""
    sigma = sigma_weight * jnp.sqrt(jnp.maximum(var, 0.0))
    safe = sigma > jnp.finfo(jnp.asarray(var).dtype).eps
    s = jnp.where(safe, sigma, 1.0)
    u = (fmin - mean) / s
    val = s * (u * norm_cdf(u) + norm_pdf(u))
    return jnp.where(safe, val, 0.0)


def log_ei(mean, var, fmin, sigma_weight=1.0):
    """log(EI), numerically stable (ref: criteria/ei.rs:99-174). Returns a
    large negative constant where the variance vanishes."""
    dtype = jnp.asarray(var).dtype
    sigma = sigma_weight * jnp.sqrt(jnp.maximum(var, 0.0))
    safe = sigma > jnp.finfo(dtype).eps
    s = jnp.where(safe, sigma, 1.0)
    u = (fmin - mean) / s
    val = jnp.log(s) + log_ei_helper(u)
    return jnp.where(safe, val, -700.0)


def wb2(mean, var, fmin, scale=1.0, sigma_weight=1.0):
    """WB2(S) = scale * EI - predicted mean (ref: criteria/wb2.rs:14-93)."""
    return scale * ei(mean, var, fmin, sigma_weight) - mean


def wb2s_scale(means, vars, fmin, sigma_weight=1.0):
    """Auto scale for WB2S: ratio 100 at the EI argmax over a scaling cloud
    (ref: wb2.rs compute_wb2s_scale)."""
    ratio = 100.0
    ei_x = ei(means, vars, fmin, sigma_weight)
    i_max = jnp.argmax(ei_x)
    ei_max = ei_x[i_max]
    pred_max = means[i_max]
    ok = jnp.abs(ei_max) > 100.0 * jnp.finfo(jnp.asarray(means).dtype).eps
    return jnp.where(ok, ratio * jnp.abs(pred_max) / jnp.where(ok, ei_max, 1.0), 1.0)


def pof(mean, var, cstr_tol=0.0):
    """Probability of feasibility Phi((tol - mean)/sigma)
    (ref: utils/cstr_pof.rs:9-33). 0 where variance vanishes."""
    dtype = jnp.asarray(var).dtype
    sigma = jnp.sqrt(jnp.maximum(var, 0.0))
    safe = sigma > jnp.finfo(dtype).eps
    s = jnp.where(safe, sigma, 1.0)
    return jnp.where(safe, norm_cdf((cstr_tol - mean) / s), 0.0)


def log_pof(mean, var, cstr_tol=0.0):
    """log Phi((tol - mean)/sigma), stable via log_ndtr."""
    dtype = jnp.asarray(var).dtype
    sigma = jnp.sqrt(jnp.maximum(var, 0.0))
    safe = sigma > jnp.finfo(dtype).eps
    s = jnp.where(safe, sigma, 1.0)
    return jnp.where(safe, log_ndtr((cstr_tol - mean) / s), -700.0)
