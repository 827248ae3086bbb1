"""Photometric losses (reference `utils/loss_utils.py:40-46,100-104`).

Images are (H, W, C) float32 in [0, 1] throughout this framework.
"""

from __future__ import annotations

import jax.numpy as jnp


def l1_loss(pred, gt):
    return jnp.abs(pred - gt).mean()


def l1_loss_mask(pred, gt, mask=None):
    if mask is None:
        return l1_loss(pred, gt)
    return (jnp.abs(pred - gt) * mask).sum() / jnp.maximum(mask.sum(), 1e-8)


def l2_loss(pred, gt):
    return ((pred - gt) ** 2).mean()


def charbonnier_loss(pred, gt, epsilon: float = 1e-3):
    diff = pred - gt
    return jnp.sqrt(diff * diff + epsilon * epsilon).mean()
