"""Multispectral (RGB+NIR) losses — mult-dwtgs
(reference `LGDWT-GS/mult-dwtgs/utils/loss_utils.py:93-171`).

NIR images are (H, W) single-channel; SSIM follows the reference's
repeat-to-3-channels trick (numerically identical to 1-channel SSIM with a
shared window, kept for parity).
"""

from __future__ import annotations

import jax.numpy as jnp

from .photometric import l1_loss
from .ssim import ssim


def l1_loss_nir(pred, gt):
    return l1_loss(pred, gt)


def ssim_loss_nir(pred, gt):
    if pred.ndim == 2:
        pred = pred[..., None]
        gt = gt[..., None]
    pred3 = jnp.repeat(pred, 3, axis=-1)
    gt3 = jnp.repeat(gt, 3, axis=-1)
    return 1.0 - ssim(pred3, gt3)


def combined_nir_loss(pred, gt, l1_weight: float = 1.0,
                      ssim_weight: float = 0.2):
    return l1_weight * l1_loss_nir(pred, gt) + ssim_weight * ssim_loss_nir(pred, gt)


def compute_combined_residuals(rgb_pred, rgb_gt, nir_pred=None, nir_gt=None):
    """(H, W) max of RGB/NIR mean-abs residuals (densification guidance)."""
    rgb_res = jnp.abs(rgb_pred - rgb_gt).mean(axis=-1)
    if nir_pred is not None and nir_gt is not None:
        nir_res = jnp.abs(nir_pred - nir_gt)
        if nir_res.ndim == 3:
            nir_res = nir_res[..., 0]
        return jnp.maximum(rgb_res, nir_res)
    return rgb_res
