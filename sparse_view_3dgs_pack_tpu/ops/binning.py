"""Tile binning with static shapes.

Replaces the CUDA pipeline `duplicateWithKeys → cub radix sort →
identifyTileRanges` (`rasterizer_impl.cu:70-138,306-317`) with an XLA-native
equivalent: bounded pair expansion via `jnp.repeat(total_repeat_length=...)`,
a lexicographic `lax.sort` on (tile, depth), and `searchsorted` tile ranges.
Capacity is a static bucket (`max_pairs`); the returned `total_pairs` lets the
host grow the bucket and re-jit on overflow — the static-shape analogue of the
reference's dynamically resized binning buffers (`rasterize_points.cu:27`).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import Projected

TILE = 16
CHUNK = 128  # kernel chunk size; aligned-binning align MUST equal this


class Binning(NamedTuple):
    ids: jnp.ndarray          # (max_pairs,) int32 gaussian index, sorted by (tile, depth)
    tile_starts: jnp.ndarray  # (num_tiles,) int32
    tile_counts: jnp.ndarray  # (num_tiles,) int32
    total_pairs: jnp.ndarray  # () int32 — actual pairs; > max_pairs means overflow
    pair_tiles: jnp.ndarray = None  # (max_pairs,) int32 tile of each sorted pair


def tile_grid(width: int, height: int, tile: int = TILE):
    return (width + tile - 1) // tile, (height + tile - 1) // tile


def gaussian_rects(means2d, radii, width, height, tile: int = TILE):
    """Clamped tile rect per Gaussian (reference `getRect`,
    `cuda_rasterizer/auxiliary.h`)."""
    grid_x, grid_y = tile_grid(width, height, tile)
    r = radii.astype(jnp.float32)
    min_x = jnp.clip(((means2d[:, 0] - r) / tile).astype(jnp.int32), 0, grid_x)
    max_x = jnp.clip(((means2d[:, 0] + r + tile - 1) / tile).astype(jnp.int32), 0, grid_x)
    min_y = jnp.clip(((means2d[:, 1] - r) / tile).astype(jnp.int32), 0, grid_y)
    max_y = jnp.clip(((means2d[:, 1] + r + tile - 1) / tile).astype(jnp.int32), 0, grid_y)
    return min_x, max_x, min_y, max_y


@partial(jax.jit, static_argnames=("width", "height", "max_pairs", "tile"))
def bin_gaussians(means2d, depths, radii, width: int, height: int,
                  max_pairs: int, tile: int = TILE) -> Binning:
    P = means2d.shape[0]
    grid_x, grid_y = tile_grid(width, height, tile)
    num_tiles = grid_x * grid_y

    min_x, max_x, min_y, max_y = gaussian_rects(means2d, radii, width, height, tile)
    rect_w = max_x - min_x
    touched = jnp.where(radii > 0, rect_w * (max_y - min_y), 0)

    offsets = jnp.cumsum(touched) - touched        # exclusive
    total = offsets[-1] + touched[-1]

    gauss_ids = jnp.repeat(jnp.arange(P, dtype=jnp.int32), touched,
                           total_repeat_length=max_pairs)
    # ONE row-gather for all per-pair gaussian attributes (five separate
    # element-gathers cost ~5× more on TPU). Small ints are exact in f32.
    table = jnp.stack([min_x.astype(jnp.float32),
                       min_y.astype(jnp.float32),
                       jnp.maximum(rect_w, 1).astype(jnp.float32),
                       offsets.astype(jnp.float32),
                       depths.astype(jnp.float32),
                       jnp.zeros((P,), jnp.float32),
                       jnp.zeros((P,), jnp.float32),
                       jnp.zeros((P,), jnp.float32)], axis=1)   # (P, 8)
    g = table[gauss_ids]                                        # (MP, 8)
    slot = jnp.arange(max_pairs, dtype=jnp.int32)
    pair_valid = slot < total
    j = slot - g[:, 3].astype(jnp.int32)
    rw = g[:, 2].astype(jnp.int32)
    tx = g[:, 0].astype(jnp.int32) + j % rw
    ty = g[:, 1].astype(jnp.int32) + j // rw
    tile_id = jnp.where(pair_valid, ty * grid_x + tx, num_tiles)

    sorted_tile, _, sorted_ids = jax.lax.sort(
        (tile_id, g[:, 4], gauss_ids), num_keys=2, is_stable=True)

    tile_range = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_tile, tile_range, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sorted_tile, tile_range, side="right").astype(jnp.int32)
    return Binning(ids=sorted_ids, tile_starts=starts,
                   tile_counts=ends - starts,
                   total_pairs=total.astype(jnp.int32),
                   pair_tiles=sorted_tile)


@partial(jax.jit, static_argnames=("width", "height", "max_pairs", "tile",
                                   "align"))
def bin_gaussians_aligned(means2d, depths, radii, width: int, height: int,
                          max_pairs: int, tile: int = TILE,
                          align: int = CHUNK) -> Binning:
    """Binning with every tile's range start aligned to `align` pairs.

    Each tile's pair count is padded up to a multiple of `align` with
    sentinel id -1 (rendered with opacity 0), so tile starts are all
    `align`-multiples — the Pallas kernel can then DMA contiguous aligned
    slices. Output capacity is max_pairs + align·num_tiles. `tile_counts`
    are the PADDED counts; sentinels are inert in blending.

    `align` must be ≥ the kernel CHUNK so the backward kernel's full-chunk
    gradient write-outs stay inside the owning tile's slot range (a 128
    alignment under a 256 chunk lets tile t's last write clobber tile t+1's
    first 128 pair gradients).
    """
    grid_x, grid_y = tile_grid(width, height, tile)
    num_tiles = grid_x * grid_y
    b = bin_gaussians(means2d, depths, radii, width, height, max_pairs, tile)

    pad = (-b.tile_counts) % align
    cum_pad = jnp.cumsum(pad) - pad                     # exclusive
    # pad budget: alignment padding is ≤ align·(nonempty tiles) but typically
    # ~align/2 per active tile; a max_pairs-sized budget keeps the buffer
    # (and the row-gather over it) small. Overflow → pairs dropped at the
    # tail → total_pairs (returned vs buffer size) lets the host grow.
    out_size = max_pairs + min(align * num_tiles, max_pairs)

    # tile of each sorted pair comes straight from the sort (a 2M-probe
    # searchsorted here costs ~300ms on TPU — it lowers to serialized
    # binary-search gathers)
    slot = jnp.arange(max_pairs, dtype=jnp.int32)
    in_range = slot < b.total_pairs
    pair_tile = jnp.clip(b.pair_tiles, 0, num_tiles - 1)
    new_idx = jnp.where(in_range, slot + cum_pad[pair_tile], out_size)

    new_ids = jnp.full((out_size,), -1, jnp.int32).at[new_idx].set(
        b.ids, mode="drop")
    new_starts = (b.tile_starts + cum_pad).astype(jnp.int32)
    new_counts = (b.tile_counts + pad).astype(jnp.int32)
    # guard against pad-budget overflow: clamp ranges into the buffer and
    # report an inflated total so the host grows max_pairs
    new_starts = jnp.minimum(new_starts, out_size)
    new_counts = jnp.minimum(new_counts,
                             jnp.maximum(out_size - new_starts, 0))
    total_padded = b.total_pairs + jnp.sum(pad)
    reported = jnp.maximum(b.total_pairs,
                           total_padded - (out_size - max_pairs))
    return Binning(ids=new_ids, tile_starts=new_starts,
                   tile_counts=new_counts,
                   total_pairs=reported.astype(jnp.int32))


def count_pairs(means2d, depths, radii, width, height, tile: int = TILE):
    """Host-callable exact pair count (for choosing `max_pairs` buckets)."""
    min_x, max_x, min_y, max_y = gaussian_rects(means2d, radii, width, height, tile)
    touched = jnp.where(radii > 0, (max_x - min_x) * (max_y - min_y), 0)
    return jnp.sum(touched)
