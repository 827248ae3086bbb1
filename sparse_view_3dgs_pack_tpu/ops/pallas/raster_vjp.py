"""Differentiable Pallas rasterizer: custom VJP wiring forward and backward
kernels, with a deterministic segment-sum pairs→Gaussians reduction.

`make_pallas_rasterizer(width, height)` returns a function
  f(means2d, depths, conics, colors, opacities, ids, starts, counts, bg)
    → (color (H,W,C), invdepth, depth, alpha)
differentiable in all float inputs (ids/starts/counts are integer binning
outputs). The residuals saved for backward are just the inputs plus the
per-pixel (log_T_final, n_contrib) maps — everything else is recomputed in
the backward kernel (CUDA-style, `backward.cu:454-637`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..binning import tile_grid
from .raster import (TILE, pack_fields, rasterize_forward_pallas,
                     unpack_tiles)
from .raster_bwd import rasterize_backward_pallas


def _tile_pack(img, width, height, channels,
               tile_x: int = TILE, tile_y: int = TILE):
    """(H, W, K) image → (num_tiles, tile_x·tile_y, K), zero-padded to tile
    multiples."""
    grid_x, grid_y = tile_grid(width, height, tile_x, tile_y)
    Hp, Wp = grid_y * tile_y, grid_x * tile_x
    img = jnp.pad(img, ((0, Hp - height), (0, Wp - width), (0, 0)))
    img = img.reshape(grid_y, tile_y, grid_x, tile_x, channels)
    return img.transpose(0, 2, 1, 3, 4).reshape(grid_y * grid_x,
                                                tile_x * tile_y, channels)


@functools.lru_cache(maxsize=None)
def make_pallas_rasterizer(width: int, height: int, channels: int,
                           inference: bool = False,
                           tile_x: int = TILE, tile_y: int = TILE):
    """Differentiable rasterizer closure for one image size.

    inference=True returns a NON-differentiable variant that skips the
    n_contrib bookkeeping (only the backward replay needs it) and runs the
    transmittance-cumsum / blend matmuls at DEFAULT (single-pass bf16)
    precision — their inputs (log1p(-α) ∈ [-7, 0], colors ∈ [0, 1]) are
    insensitive, unlike the quadratic form, which stays exact elementwise
    in both variants.

    tile_x/tile_y select the kernel tile shape and MUST match the binning
    that produced ids/starts/counts (both fwd and bwd kernels are
    tile-shape generic)."""
    C = channels

    def fwd_impl(means2d, depths, conics, colors, opacities, ids, starts,
                 counts, bg):
        pd = pack_fields(means2d, depths, conics, colors, opacities, ids)
        raw = rasterize_forward_pallas(
            pd, starts, counts, bg, width, height, ids.shape[0], C + 2,
            # training: "split" = 3-pass hand-split transmittance cumsum
            # (~HIGHEST accuracy at half the MXU passes, see
            # raster.split_dot) + HIGHEST blend contraction
            mm_precision=(jax.lax.Precision.DEFAULT if inference
                          else "split"),
            compute_n_contrib=not inference,
            tile_x=tile_x, tile_y=tile_y)
        u = unpack_tiles(raw, width, height, C, tile_x, tile_y)
        outs = (u["color"], u["invdepth"], u["depth"],
                1.0 - jnp.exp(u["log_t"]))
        return outs, raw, pd

    if inference:
        def rasterize_inf(means2d, depths, conics, colors, opacities, ids,
                          starts, counts, bg):
            return fwd_impl(means2d, depths, conics, colors, opacities, ids,
                            starts, counts, bg)[0]
        return rasterize_inf

    @jax.custom_vjp
    def rasterize(means2d, depths, conics, colors, opacities, ids, starts,
                  counts, bg):
        return fwd_impl(means2d, depths, conics, colors, opacities, ids,
                        starts, counts, bg)[0]

    def fwd(means2d, depths, conics, colors, opacities, ids, starts, counts,
            bg):
        outs, raw, pd = fwd_impl(means2d, depths, conics, colors, opacities,
                                 ids, starts, counts, bg)
        aux = raw[:, :, 8:10]   # (num_tiles, pix, 2): log_t, n_contrib
        # pd kept as residual: repacking in bwd would cost a second big
        # row-gather
        res = (depths, ids, starts, counts, bg, aux, pd)
        return outs, res

    def bwd(res, cot):
        (depths, ids, starts, counts, bg, aux, pd) = res
        d_color, d_invd, d_depth, d_alpha = cot

        g_img = jnp.concatenate([
            d_color,
            d_invd[..., None],
            d_depth[..., None],
            jnp.zeros((height, width, 8 - C - 2), d_color.dtype),
        ], axis=-1)                                     # (H, W, 8)
        g_tiles = _tile_pack(g_img, width, height, 8,
                             tile_x, tile_y)            # (T, pix, 8)
        ga_tiles = _tile_pack(d_alpha[..., None], width, height, 1,
                              tile_x, tile_y)
        aux3 = jnp.concatenate([aux, ga_tiles], axis=-1)  # (T, pix, 3)

        bg_row = jnp.zeros((1, 8), jnp.float32).at[0, :C].set(bg)
        d_pairs = rasterize_backward_pallas(pd, starts, counts, g_tiles,
                                            aux3, bg_row, width, height,
                                            tile_x=tile_x, tile_y=tile_y)

        P = depths.shape[0]
        # slots past the last tile's end were never written by the backward
        # kernel (uninitialized HBM) — and with unaligned binning the id
        # array's tail padding carries REAL gaussian ids, so position is the
        # only safe mask
        nbuf = ids.shape[0]
        slot = jnp.arange(nbuf, dtype=jnp.int32)
        valid = (slot < jnp.max(starts + counts)) & (ids >= 0)
        seg_ids = jnp.where(valid, ids, P)  # dropped bucket
        # (NC, 16, CHUNK) chunk-major → (NBUF, 14) pair-major. Note: the
        # (N, 14) form is tile-padded to 128 lanes on TPU (8× bytes) — the
        # trainer caps max_pairs at 2^23 so this stays bounded.
        d_rows = d_pairs[:, :14, :].transpose(0, 2, 1).reshape(-1, 14)
        contrib = jnp.where(valid[:, None], d_rows[:nbuf], 0.0)
        per_gauss = jax.ops.segment_sum(contrib, seg_ids,
                                        num_segments=P + 1)[:P]  # (P, 14)

        d_means2d = per_gauss[:, 0:2]
        d_conics = per_gauss[:, 2:5]
        d_opac = per_gauss[:, 5]
        d_colors = per_gauss[:, 6:6 + C]
        d_invd_row = per_gauss[:, 6 + C]
        d_depth_row = per_gauss[:, 7 + C]
        finite = jnp.isfinite(depths)
        safe_depth = jnp.where(finite, depths, 1.0)
        d_depths = jnp.where(
            finite,
            -d_invd_row / (safe_depth * safe_depth) + d_depth_row, 0.0)

        # d_bg = Σ_pixels T_final · d_color (per channel), within-image only
        t_final = jnp.exp(aux[:, :, 0])                 # (T, pix)
        g_color_tiles = g_tiles[..., :C]
        d_bg = jnp.einsum("tp,tpc->c", t_final, g_color_tiles)

        return (d_means2d, d_depths, d_conics, d_colors, d_opac,
                None, None, None, d_bg)

    rasterize.defvjp(fwd, bwd)
    return rasterize
