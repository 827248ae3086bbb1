"""Order-independent-transmittance alpha blending.

The reference CUDA render loop (`forward.cu:323-383`) walks Gaussians
front-to-back per pixel, maintaining transmittance T with early exit. On TPU
that sequential dependence becomes a *parallel scan*: with alphas sorted
front-to-back,

    T_i        = exp( Σ_{j<i} log(1-α_j) )          (exclusive cumsum)
    w_i        = α_i · T_i · [not done before i]
    done at i* = first index where T·(1-α) < 1e-4   (cumulative-or)

which reproduces the CUDA semantics exactly — including the α<1/255 skip,
the α≤0.99 clamp, and the T<1e-4 stop — while being fully vectorisable and
(unlike CUDA's atomics-based backward) deterministic under autodiff.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

ALPHA_EPS = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4
_LOG_T_EPS = math.log(1e-4)


def alpha_from_power(power, opacity):
    """α = min(0.99, opacity·exp(power)); zero where power>0 or α<1/255
    (CUDA skip rules). `power` is the negative quadratic form. exp is taken on
    min(power, 0) so masked-out entries cannot produce inf/NaN (and their
    cotangents stay finite)."""
    alpha = jnp.minimum(ALPHA_MAX, opacity * jnp.exp(jnp.minimum(power, 0.0)))
    return jnp.where((power > 0.0) | (alpha < ALPHA_EPS), 0.0, alpha)


def blend_weights(alphas, axis=-1):
    """Front-to-back compositing weights for depth-sorted alphas.

    Returns (weights, log_T_final): weights has alphas' shape, log_T_final the
    shape with `axis` reduced. Differentiable; the stop mask is treated as a
    constant (matching the CUDA backward, which replays the same early exit).
    """
    log1m = jnp.log1p(-alphas)
    s_incl = jnp.cumsum(log1m, axis=axis)
    s_excl = s_incl - log1m
    crossed = s_incl < _LOG_T_EPS
    done = jnp.cumsum(crossed.astype(jnp.int32), axis=axis) > 0
    contribute = jnp.logical_not(done)
    contribute = jax.lax.stop_gradient(contribute)
    weights = alphas * jnp.exp(s_excl) * contribute
    log_t_final = jnp.sum(jnp.where(contribute, log1m, 0.0), axis=axis)
    return weights, log_t_final


def blend_weights_chunked(alphas, carry_log_t, carry_done):
    """Chunk-wise variant for scanned rendering: blends one front-to-back
    chunk given carried-in (log_T, done) state; returns weights and updated
    carry. alphas: (..., K); carries: (...)."""
    log1m = jnp.log1p(-alphas)
    s_incl = carry_log_t[..., None] + jnp.cumsum(log1m, axis=-1)
    s_excl = s_incl - log1m
    crossed = s_incl < _LOG_T_EPS
    done = (jnp.cumsum(crossed.astype(jnp.int32), axis=-1) > 0) | carry_done[..., None]
    contribute = jax.lax.stop_gradient(jnp.logical_not(done))
    weights = alphas * jnp.exp(s_excl) * contribute
    new_log_t = carry_log_t + jnp.sum(jnp.where(contribute, log1m, 0.0), axis=-1)
    new_done = done[..., -1]
    return weights, new_log_t, new_done
