"""Dense O(P·pixels) reference renderer — the correctness oracle.

Evaluates every Gaussian at every pixel (no tile culling), with exactly the
blending semantics of the CUDA renderer. Used as the golden model for the
tiled/Pallas rasterizers (the same role conv-SSIM plays for fused-ssim in the
reference, `fused-ssim/tests/test.py:58-91`). Differentiable end-to-end via
jax.grad. Only for small scenes/tests.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .blending import alpha_from_power, blend_weights
from .projection import Projected


class RenderOutputs(NamedTuple):
    color: jnp.ndarray      # (H, W, C)
    alpha: jnp.ndarray      # (H, W)
    invdepth: jnp.ndarray   # (H, W) expected inverse depth
    depth: jnp.ndarray      # (H, W) expected depth (ashawkey-style)


def rasterize_dense(proj: Projected, width: int, height: int,
                    background: jnp.ndarray,
                    tile_cull: bool = True,
                    match_binning_order: bool = True) -> RenderOutputs:
    """proj: outputs of project_gaussians. background: (C,).

    With tile_cull=True (default) a Gaussian only covers pixels whose 16×16
    tile intersects its 3σ rect — the same truncation the CUDA binning applies
    — so outputs are bit-comparable with the tiled rasterizer. tile_cull=False
    gives the mathematically exact untruncated splat.

    match_binning_order=True blends in the production binning's depth order
    (truncated-f32-bit keys, ties broken by index — see
    `binning._key_bits`); False uses exact f32 depth order (the CUDA
    reference's 32-bit depth key, `rasterizer_impl.cu:306-311`). The two
    differ only in the blend order of near-equal-depth Gaussians."""
    if match_binning_order:
        from .binning import _key_bits, tile_grid
        gx, gy = tile_grid(width, height)
        _, depth_bits = _key_bits(gx * gy)
        dkey = jax.lax.shift_right_logical(
            jax.lax.bitcast_convert_type(
                jnp.where(jnp.isfinite(proj.depths),
                          proj.depths, 0.0).astype(jnp.float32), jnp.uint32),
            jnp.uint32(32 - depth_bits))
        order = jnp.argsort(dkey, stable=True)
    else:
        order = jnp.argsort(proj.depths, stable=True)
    means2d = proj.means2d[order]
    conics = proj.conics[order]
    colors = proj.colors[order]
    opac = proj.opacities[order]
    depths = proj.depths[order]
    live = (proj.radii[order] > 0) & jnp.isfinite(depths)

    px = jnp.arange(width, dtype=jnp.float32)
    py = jnp.arange(height, dtype=jnp.float32)
    dx = px[None, None, :] - means2d[:, 0, None, None]   # (P, 1, W)
    dy = py[None, :, None] - means2d[:, 1, None, None]   # (P, H, 1)
    a = conics[:, 0, None, None]
    b = conics[:, 1, None, None]
    c = conics[:, 2, None, None]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy  # (P, H, W)
    alphas = alpha_from_power(power, opac[:, None, None])
    alphas = jnp.where(live[:, None, None], alphas, 0.0)

    if tile_cull:
        from .binning import gaussian_rects
        min_x, max_x, min_y, max_y = gaussian_rects(
            means2d, proj.radii[order], width, height)
        tx = (jnp.arange(width) // 16)[None, None, :]
        ty = (jnp.arange(height) // 16)[None, :, None]
        in_rect = ((tx >= min_x[:, None, None]) & (tx < max_x[:, None, None])
                   & (ty >= min_y[:, None, None]) & (ty < max_y[:, None, None]))
        alphas = jnp.where(in_rect, alphas, 0.0)

    # front-to-back over axis 0
    alphas_hw = jnp.moveaxis(alphas, 0, -1)               # (H, W, P)
    weights, log_t = blend_weights(alphas_hw, axis=-1)    # (H, W, P)
    color = jnp.einsum("hwp,pc->hwc", weights, colors)
    t_final = jnp.exp(log_t)
    color = color + t_final[..., None] * background[None, None, :]
    safe_depth = jnp.where(jnp.isfinite(depths), depths, 1.0)
    invdepth = jnp.einsum("hwp,p->hw", weights, 1.0 / safe_depth)
    depth = jnp.einsum("hwp,p->hw", weights, safe_depth)
    return RenderOutputs(color=color, alpha=1.0 - t_final,
                         invdepth=invdepth, depth=depth)
