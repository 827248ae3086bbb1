"""Tiled differentiable rasterizer — the production TPU path.

TPU-first reformulation of the CUDA per-pixel blend loop
(`forward.cu:276-414`, backward `backward.cu:454-637`):

* Per 16×16 tile, the Gaussian quadratic `power = -½ dᵀΣ⁻¹d` for all 256
  pixels × K list entries is ONE MXU matmul: `F (256×6) @ W (6×K)`, where F
  holds tile-local pixel monomials [x², y², xy, x, y, 1] and W packs
  (conic, mean) per Gaussian.
* Front-to-back compositing is the parallel-scan formulation in
  `blending.py` (deterministic; no atomics anywhere).
* The blend itself is a second MXU matmul: `weights (256×K) @ [colors,
  1/depth, depth, 1] (K×(C+3))` — color, expected inverse depth, expected
  depth, and alpha in one contraction.
* Tiles are processed in scanned batches under jax.checkpoint, so backward
  recomputes per-batch activations instead of saving O(tiles·K·256) arrays.

Gradients flow to means/conics/colors/opacities by jax.grad through gathers
(scatter-add in the transpose — XLA's deterministic equivalent of the CUDA
atomicAdd backward `backward.cu:593-635`).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .binning import TILE, Binning, bin_gaussians, tile_grid
from .blending import ALPHA_EPS, ALPHA_MAX, blend_weights
from .projection import Projected
from .rasterize_ref import RenderOutputs


def _pixel_features(tile: int) -> jnp.ndarray:
    """(tile², 6) tile-local monomials [x², y², xy, x, y, 1] at pixel centers."""
    xs = jnp.arange(tile, dtype=jnp.float32)
    ys = jnp.arange(tile, dtype=jnp.float32)
    x = jnp.tile(xs[None, :], (tile, 1)).reshape(-1)
    y = jnp.repeat(ys, tile, total_repeat_length=tile * tile)
    return jnp.stack([x * x, y * y, x * y, x, y, jnp.ones_like(x)], axis=-1)


def _gauss_coeffs(means_local, conics):
    """Pack per-Gaussian quadratic coefficients so power = F @ W.

    power(x,y) = -½a(x-mx)² - ½c(y-my)² - b(x-mx)(y-my)
    → w = [-½a, -½c, -b, a·mx+b·my, c·my+b·mx, -½a·mx²-½c·my²-b·mx·my]
    means_local: (..., 2) tile-local; conics: (..., 3) = (a, b, c).
    """
    a, b, c = conics[..., 0], conics[..., 1], conics[..., 2]
    mx, my = means_local[..., 0], means_local[..., 1]
    return jnp.stack([
        -0.5 * a,
        -0.5 * c,
        -b,
        a * mx + b * my,
        c * my + b * mx,
        -0.5 * a * mx * mx - 0.5 * c * my * my - b * mx * my,
    ], axis=-1)


class RasterConfig(NamedTuple):
    max_pairs: int = 1 << 20
    max_per_tile: int = 1024
    tile_batch: int = 64     # tiles per scanned/checkpointed batch
    tile: int = TILE
    # Pallas training-path tile width (height stays `tile`); 0 → square.
    # Wider tiles cut (tile, gaussian) pair counts at the cost of larger
    # per-chunk pixel blocks. The pure-XLA path always uses square tiles.
    train_tile_x: int = 0


@partial(jax.jit, static_argnames=("width", "height", "config"))
def rasterize_binned(proj: Projected, binning: Binning, width: int,
                     height: int, background: jnp.ndarray,
                     config: RasterConfig = RasterConfig()) -> RenderOutputs:
    """Render given precomputed binning. background: (C,)."""
    tile = config.tile
    K = config.max_per_tile
    grid_x, grid_y = tile_grid(width, height, tile)
    num_tiles = grid_x * grid_y
    C = proj.colors.shape[-1]

    safe_depth = jnp.where(jnp.isfinite(proj.depths), proj.depths, 1.0)
    # blend payload per gaussian: C colors, invdepth, depth
    payload = jnp.concatenate([
        proj.colors,
        (1.0 / safe_depth)[:, None],
        safe_depth[:, None],
    ], axis=-1)                                          # (P, C+2)

    F = _pixel_features(tile)                             # (t², 6)
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    origin_x = (tile_ids % grid_x) * tile
    origin_y = (tile_ids // grid_x) * tile

    counts = jnp.minimum(binning.tile_counts, K)
    ksl = jnp.arange(K, dtype=jnp.int32)

    TB = config.tile_batch
    n_batches = (num_tiles + TB - 1) // TB
    pad_tiles = n_batches * TB

    def render_batch(batch_idx):
        t0 = batch_idx * TB
        tsel = t0 + jnp.arange(TB, dtype=jnp.int32)
        tsel = jnp.minimum(tsel, num_tiles - 1)
        starts = binning.tile_starts[tsel]                 # (TB,)
        cnt = counts[tsel]                                 # (TB,)
        gidx = binning.ids[jnp.minimum(
            starts[:, None] + ksl[None, :],
            binning.ids.shape[0] - 1)]                     # (TB, K)
        valid = ksl[None, :] < cnt[:, None]                # (TB, K)

        means = proj.means2d[gidx]                         # (TB, K, 2)
        local = means - jnp.stack(
            [origin_x[tsel], origin_y[tsel]], -1)[:, None, :].astype(jnp.float32)
        W = _gauss_coeffs(local, proj.conics[gidx])        # (TB, K, 6)
        power = jnp.einsum("pf,tkf->tpk", F, W,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)  # (TB, t², K)

        opac = proj.opacities[gidx]                        # (TB, K)
        alpha = jnp.minimum(
            ALPHA_MAX,
            opac[:, None, :] * jnp.exp(jnp.minimum(power, 0.0)))
        alpha = jnp.where((power > 0.0) | (alpha < ALPHA_EPS)
                          | ~valid[:, None, :], 0.0, alpha)

        weights, log_t = blend_weights(alpha, axis=-1)     # (TB, t², K)
        out = jnp.einsum("tpk,tkc->tpc", weights, payload[gidx],
                         preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)  # (TB, t², C+2)
        t_final = jnp.exp(log_t)                           # (TB, t²)
        color = out[..., :C] + t_final[..., None] * background
        return jnp.concatenate(
            [color, out[..., C:C + 2], (1.0 - t_final)[..., None]], axis=-1)

    body = jax.checkpoint(render_batch)
    batches = jax.lax.map(body, jnp.arange(n_batches, dtype=jnp.int32))
    # (n_batches, TB, t², C+3) → image
    flat = batches.reshape(pad_tiles, tile, tile, C + 3)[:num_tiles]
    img = flat.reshape(grid_y, grid_x, tile, tile, C + 3)
    img = img.transpose(0, 2, 1, 3, 4).reshape(grid_y * tile, grid_x * tile,
                                               C + 3)
    img = img[:height, :width]
    return RenderOutputs(color=img[..., :C], alpha=img[..., C + 2],
                         invdepth=img[..., C], depth=img[..., C + 1])


def rasterize(proj: Projected, width: int, height: int,
              background: jnp.ndarray,
              config: RasterConfig = RasterConfig()) -> RenderOutputs:
    rect = proj.rect_radii if proj.rect_radii is not None else proj.radii
    binning = bin_gaussians(proj.means2d, proj.depths, rect,
                            width, height, config.max_pairs, config.tile)
    return rasterize_binned(proj, binning, width, height, background, config)
