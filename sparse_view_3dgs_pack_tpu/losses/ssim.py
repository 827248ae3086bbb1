"""SSIM with an 11×11 σ=1.5 Gaussian window, zero-padded 'same' convs.

Matches the conv-SSIM used throughout the reference
(`LGDWT-GS/utils/loss_utils.py:48-90`) and the contract of its fused CUDA
kernel (`fused-ssim/ssim.cu`). On TPU the five window convolutions compile to
fused XLA convolutions; `fused_ssim` is the same math (the reference's
fused kernel is a performance alias, `train.py:182-185`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

C1 = 0.01 ** 2
C2 = 0.03 ** 2


def _gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-((np.arange(window_size) - window_size // 2) ** 2)
               / (2.0 * sigma ** 2))
    g = g / g.sum()
    w = np.outer(g, g).astype(np.float32)
    return w


def _band_matrix(n: int, taps: np.ndarray) -> np.ndarray:
    """(n, n) banded matrix B with B[i, j] = taps[j - i + r] (zero outside
    the band) — multiplying by B applies a zero-padded 'same' 1-D conv."""
    r = len(taps) // 2
    idx = np.arange(n)
    B = np.zeros((n, n), np.float32)
    for o in range(-r, r + 1):
        j = idx + o
        m = (j >= 0) & (j < n)
        B[idx[m], j[m]] = taps[o + r]
    return B


def _conv_same(img, window):
    """Depthwise separable 'same' conv as two banded MXU matmuls.

    TPU depthwise convolutions lower poorly (VPU loops); the separable
    Gaussian window as (H,H)@(H,WC) and (W,W) banded matmuls rides the MXU
    and is ~10× faster at 800p. Zero padding matches torch conv2d 'same'.
    """
    H, W, C = img.shape
    k = window.shape[0]
    g = window[:, k // 2]
    taps = np.asarray(g / g.sum(), np.float32)  # 1-D taps (window = g ⊗ g)
    BH = jnp.asarray(_band_matrix(H, taps))
    BW = jnp.asarray(_band_matrix(W, taps))
    tmp = jnp.einsum("hk,kwc->hwc", BH, img,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("wv,hvc->hwc", BW, tmp,
                      precision=jax.lax.Precision.HIGHEST)


@partial(jax.jit, static_argnames=("window_size", "size_average"))
def ssim(img1, img2, window_size: int = 11, size_average: bool = True,
         mask=None):
    """img1, img2: (H, W, C). Returns scalar mean SSIM (or the map if
    size_average=False)."""
    window = _gaussian_window(window_size)
    mu1 = _conv_same(img1, window)
    mu2 = _conv_same(img2, window)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = _conv_same(img1 * img1, window) - mu1_sq
    sigma2_sq = _conv_same(img2 * img2, window) - mu2_sq
    sigma12 = _conv_same(img1 * img2, window) - mu1_mu2

    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))
    if mask is not None:
        ssim_map = ssim_map * mask
    if size_average:
        return ssim_map.mean()
    return ssim_map


def fused_ssim(img1, img2, padding: str = "same", train: bool = True):
    """API twin of the reference fused-ssim wrapper
    (`fused_ssim/__init__.py:9-41`). padding='valid' crops the window
    half-width border before averaging."""
    m = ssim(img1, img2, size_average=False)
    if padding == "valid":
        m = m[5:-5, 5:-5]
    return m.mean()
