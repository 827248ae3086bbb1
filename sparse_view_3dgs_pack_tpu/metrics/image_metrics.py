"""Evaluation metrics (reference `metrics.py:36-91` semantics)."""

from __future__ import annotations

import jax.numpy as jnp

from ..losses.ssim import ssim as _ssim
from ..utils.image import psnr as _psnr


def psnr_metric(img1, img2):
    """img: (H, W, C) in [0,1]."""
    return _psnr(img1, img2)


def ssim_metric(img1, img2):
    return _ssim(img1, img2)
