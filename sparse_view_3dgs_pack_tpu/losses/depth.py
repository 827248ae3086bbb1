"""Depth supervision losses.

- `depth_l1_loss`: masked L1 between rendered inverse depth and scaled mono
  inverse depth (reference `LGDWT-GS/train.py:204-216`; mean over ALL pixels,
  the mask zeroes unreliable ones).
- `pearson_corrcoef` + `fsgs_depth_loss`: FSGS's Pearson-correlation depth
  prior vs MiDaS (`FSGS/train.py:100-108`), the min over the negated-depth and
  reciprocal-depth parameterisations.
- `pseudo_depth_loss`: FSGS pseudo-view distillation term (`train.py:116-131`).
"""

from __future__ import annotations

import jax.numpy as jnp


def depth_l1_loss(rendered_invdepth, mono_invdepth, depth_mask=None):
    d = jnp.abs(rendered_invdepth - mono_invdepth)
    if depth_mask is not None:
        d = d * depth_mask
    return d.mean()


def pearson_corrcoef(x, y, eps: float = 1e-8):
    x = x.reshape(-1)
    y = y.reshape(-1)
    xm = x - x.mean()
    ym = y - y.mean()
    denom = jnp.sqrt((xm * xm).sum()) * jnp.sqrt((ym * ym).sum())
    return (xm * ym).sum() / jnp.maximum(denom, eps)


def pearson_corrcoef_masked(x, y, mask, eps: float = 1e-8):
    """Pearson over masked pixels only (used with warped pseudo priors,
    whose coverage is partial)."""
    w = mask.reshape(-1).astype(x.dtype)
    x = x.reshape(-1)
    y = y.reshape(-1)
    n = jnp.maximum(w.sum(), 1.0)
    xm = (x - (x * w).sum() / n) * w
    ym = (y - (y * w).sum() / n) * w
    denom = jnp.sqrt((xm * xm).sum()) * jnp.sqrt((ym * ym).sum())
    return (xm * ym).sum() / jnp.maximum(denom, eps)


def warped_pseudo_depth_loss(rendered_depth, warped_depth, valid):
    """Pseudo-view distillation against a WARPED metric prior (offline
    substitute for MiDaS-on-render; positive correlation since both are
    depths, unlike `pseudo_depth_loss`'s disparity input)."""
    return 1.0 - pearson_corrcoef_masked(rendered_depth, warped_depth, valid)


def fsgs_depth_loss(rendered_depth, midas_depth):
    """min(1 - ρ(-midas, rendered), 1 - ρ(1/(midas+200), rendered))."""
    a = 1.0 - pearson_corrcoef(-midas_depth, rendered_depth)
    b = 1.0 - pearson_corrcoef(1.0 / (midas_depth + 200.0), rendered_depth)
    return jnp.minimum(a, b)


def pseudo_depth_loss(rendered_depth_pseudo, midas_depth_pseudo):
    return 1.0 - pearson_corrcoef(rendered_depth_pseudo,
                                  -midas_depth_pseudo)
