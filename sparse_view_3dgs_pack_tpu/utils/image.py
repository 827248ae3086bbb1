"""Image metrics helpers (reference `utils/image_utils.py`)."""

from __future__ import annotations

import jax.numpy as jnp


def mse(img1, img2):
    """Per-image MSE; inputs (..., C, H, W) or (..., H, W, C) — reduced over
    all but the leading batch axis if present."""
    d = (img1 - img2) ** 2
    if d.ndim <= 3:
        return d.mean()
    return d.reshape(d.shape[0], -1).mean(axis=1, keepdims=True)


def psnr(img1, img2, data_range: float = 1.0):
    m = mse(img1, img2)
    return 20.0 * jnp.log10(data_range / jnp.sqrt(jnp.maximum(m, 1e-12)))
