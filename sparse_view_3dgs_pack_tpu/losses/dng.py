"""DNGaussian depth-normalisation losses
(reference `DNGaussian/utils/loss_utils.py:18-103`).

Patch-normalised margin losses: depth maps are cut into non-overlapping
patches, each patch standardised (local: per-patch std; global: whole-map
std), and an L2/L1 applied only where |diff| exceeds the margin
(`error_tolerance`). Masked selection becomes a where-weighted mean to keep
shapes static.
"""

from __future__ import annotations

import jax.numpy as jnp


def patchify(x, patch_size: int):
    """(H, W) or (H, W, 1) → (L, patch_size²), non-overlapping."""
    if x.ndim == 3:
        x = x[..., 0]
    H, W = x.shape
    ny, nx = H // patch_size, W // patch_size
    x = x[:ny * patch_size, :nx * patch_size]
    x = x.reshape(ny, patch_size, nx, patch_size)
    return x.transpose(0, 2, 1, 3).reshape(ny * nx, patch_size * patch_size)


def _safe_std(sq_dev_mean):
    """sqrt with a variance floor: `std = sqrt(var)` has a NaN gradient at
    exactly-constant input (sqrt'(0)·0), which a rendered depth map hits on
    empty/constant patches; sqrt(var + eps²) is smooth and ≥ eps."""
    return jnp.sqrt(sq_dev_mean + 1e-12)


def normalize_patches(p, std=None, eps_scale: float = 1e-2):
    """Standardise each row; reference `normalize` adds 1e-2·global-std to the
    denominator for stability. Constant patches (zero variance — e.g. the
    zero placeholder map when no depth prior exists, or an empty region of a
    rendered depth) are handled with a smooth variance floor: the reference
    divides by exact zero there (its real DPT maps are never constant)."""
    n = p.shape[1]
    mean = p.mean(axis=1, keepdims=True)
    if std is None:
        var = ((p - mean) ** 2).sum(axis=1, keepdims=True) / (n - 1)
        row_std = _safe_std(var)
    else:
        row_std = std
    gmean = p.mean()
    gvar = ((p - gmean) ** 2).sum() / (p.size - 1)
    global_std = _safe_std(gvar)
    return (p - mean) / (row_std + eps_scale * global_std)


def margin_l2_loss(x, y, margin: float):
    d = x - y
    mask = (jnp.abs(d) > margin).astype(x.dtype)
    return (d * d * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def margin_l1_loss(x, y, margin: float):
    d = jnp.abs(x - y)
    mask = (d > margin).astype(x.dtype)
    return (d * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def patch_norm_mse_loss(pred, gt, patch_size: int, margin: float):
    """'Local' variant: per-patch standardisation."""
    return margin_l2_loss(normalize_patches(patchify(pred, patch_size)),
                          normalize_patches(patchify(gt, patch_size)),
                          margin)


def patch_norm_mse_loss_global(pred, gt, patch_size: int, margin: float):
    """'Global' variant: whole-map std (detached in the reference)."""
    import jax
    ps = jax.lax.stop_gradient(_safe_std(pred.reshape(-1).var(ddof=1)))
    gs = jax.lax.stop_gradient(_safe_std(gt.reshape(-1).var(ddof=1)))
    return margin_l2_loss(
        normalize_patches(patchify(pred, patch_size), std=ps),
        normalize_patches(patchify(gt, patch_size), std=gs),
        margin)


def loss_depth_smoothness(depth, img):
    """Edge-aware smoothness (reference `loss_depth_smoothness`).
    depth: (H, W) or (H, W, 1); img: (H, W, C)."""
    if depth.ndim == 2:
        depth = depth[..., None]
    img_gx = img[:, :-1, :] - img[:, 1:, :]
    img_gy = img[:-1, :, :] - img[1:, :, :]
    wx = jnp.exp(-jnp.abs(img_gx).mean(-1, keepdims=True))
    wy = jnp.exp(-jnp.abs(img_gy).mean(-1, keepdims=True))
    dx = jnp.abs(depth[:, :-1, :] - depth[:, 1:, :])
    dy = jnp.abs(depth[:-1, :, :] - depth[1:, :, :])
    return ((dx * wx).sum() + (dy * wy).sum()) / (wx.sum() + wy.sum())
