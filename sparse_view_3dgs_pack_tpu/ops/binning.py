"""Tile binning with static shapes.

Replaces the CUDA pipeline `duplicateWithKeys → cub radix sort →
identifyTileRanges` (`rasterizer_impl.cu:70-138,306-317`) with an XLA-native
equivalent: bounded pair expansion via `jnp.repeat(total_repeat_length=...)`,
a single-u32-key `lax.sort` on packed [tileID | depth-bits] keys (the exact
analogue of CUDA's radix sort on [tileID|depth] 64-bit keys — TPU sorts get
~2× cheaper per dropped operand/key), and `searchsorted` tile ranges.
Capacity is a static bucket (`max_pairs`); the returned `total_pairs` lets the
host grow the bucket and re-jit on overflow — the static-shape analogue of the
reference's dynamically resized binning buffers (`rasterize_points.cu:27`).

Tile ranges are NOT aligned: the Pallas kernels DMA from the 128-aligned
floor of each tile's start and mask the head lanes (see
`pallas/raster.py`), which avoids an expensive 2M-element scatter pass here.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import Projected

TILE = 16
CHUNK = 128  # kernel chunk size (DMA alignment quantum)


class Binning(NamedTuple):
    ids: jnp.ndarray          # (max_pairs,) int32 gaussian index, sorted by (tile, depth)
    tile_starts: jnp.ndarray  # (num_tiles,) int32
    tile_counts: jnp.ndarray  # (num_tiles,) int32
    total_pairs: jnp.ndarray  # () int32 — actual pairs; > max_pairs means overflow
    pair_tiles: jnp.ndarray = None  # (max_pairs,) int32 tile of each sorted pair


def tile_grid(width: int, height: int, tile: int = TILE,
              tile_y: int = None):
    """Tile grid dims; rectangular tiles via `tile_y` (x size = `tile`).
    Wider tiles cut horizontal duplication (fewer pairs) and halve the
    per-tile program count of the Pallas kernel — the inference renderer
    uses 32x16."""
    ty = tile if tile_y is None else tile_y
    return (width + tile - 1) // tile, (height + ty - 1) // ty


def _split_radii(radii):
    """radii as (P,) square half-side or (P, 2) per-axis [rx, ry] (the AABB
    rect from `projection.Projected.rect_radii`). Returns f32 rx, ry and the
    per-gaussian liveness mask (every axis must be positive)."""
    if radii.ndim == 2:
        rx = radii[:, 0].astype(jnp.float32)
        ry = radii[:, 1].astype(jnp.float32)
        return rx, ry, jnp.min(radii, axis=1) > 0
    r = radii.astype(jnp.float32)
    return r, r, radii > 0


def gaussian_rects(means2d, radii, width, height, tile: int = TILE,
                   tile_y: int = None):
    """Clamped tile rect per Gaussian (reference `getRect`,
    `cuda_rasterizer/auxiliary.h`); radii may be per-axis (P, 2)."""
    ty = tile if tile_y is None else tile_y
    grid_x, grid_y = tile_grid(width, height, tile, ty)
    rx, ry, _ = _split_radii(radii)
    min_x = jnp.clip(((means2d[:, 0] - rx) / tile).astype(jnp.int32), 0, grid_x)
    max_x = jnp.clip(((means2d[:, 0] + rx + tile - 1) / tile).astype(jnp.int32), 0, grid_x)
    min_y = jnp.clip(((means2d[:, 1] - ry) / ty).astype(jnp.int32), 0, grid_y)
    max_y = jnp.clip(((means2d[:, 1] + ry + ty - 1) / ty).astype(jnp.int32), 0, grid_y)
    return min_x, max_x, min_y, max_y


def _key_bits(num_tiles: int):
    """Bit split for the packed sort key: [tile_id | depth_bits].

    depth bits come from the monotone bit pattern of positive f32 depths
    (sign 0, so integer compare == float compare), truncated. Capped at 22
    so the quantized value is exact in an f32 table row (ints < 2^24)."""
    tile_bits = max(1, (num_tiles + 1 - 1).bit_length())
    depth_bits = min(32 - tile_bits, 22)
    return tile_bits, depth_bits


def _expand_by_offsets(col, offsets, max_pairs: int):
    """Repeat-expand an int32 per-gaussian column to per-pair slots WITHOUT
    a gather: scatter boundary DIFFS at each gaussian's first slot, then
    cumsum. A TPU general gather runs at ~1 element / 12 cycles (25 ms for
    2M rows); this is two streaming passes (~0.6 ms). Coinciding offsets
    (touched==0 gaussians) telescope correctly under scatter-ADD."""
    diffs = jnp.diff(col, prepend=jnp.zeros((1,), col.dtype))
    buf = jnp.zeros((max_pairs,), col.dtype).at[offsets].add(diffs,
                                                             mode="drop")
    return jnp.cumsum(buf)


def tile_range_bounds(sorted_key, num_tiles: int, depth_bits: int,
                      block: int = CHUNK):
    """bounds[t] = #{sorted_key < t << depth_bits} for t in 0..num_tiles,
    i.e. the tile range boundaries (starts = bounds[:-1]).

    Replaces a (num_tiles+1)-probe `searchsorted` over the full pair bucket
    — which lowers to ~log2(max_pairs) SERIALIZED element gathers per probe
    (1.8 ms at the 1080p bench config) — with an exact two-level count:

    1. Split the sorted keys into `block`-sized rows. Because the keys are
       globally sorted, every row before the first row whose LAST key
       reaches the probe is entirely below it. A (num_tiles)-bin histogram
       of the rows' last-key tiles + cumsum counts those full rows per
       probe in two streaming passes over just max_pairs/block elements.
    2. One (num_tiles+1, block) row gather pulls each probe's straddling
       row; an elementwise compare+reduce counts the in-row remainder.

    Both levels are vector work (~0.15 ms at the bench config). Unaligned
    buckets are padded up to a `block` multiple with 0xFFFFFFFF sentinels —
    every probe is at most (num_tiles << depth_bits) < 2^32, so sentinel
    lanes are never counted and the bounds stay exact.
    """
    mp = sorted_key.shape[0]
    if mp % block:
        pad = block - mp % block
        sorted_key = jnp.pad(sorted_key, (0, pad),
                             constant_values=jnp.uint32(0xFFFFFFFF))
        mp += pad
    nrows = mp // block
    keys2d = sorted_key.reshape(nrows, block)
    # tile of each row's last (max) key; tail sentinels carry tile=num_tiles
    row_last_tile = (keys2d[:, -1] >> depth_bits).astype(jnp.int32)
    # rows entirely below probe t: row_last < t<<db  ⟺  tile(row_last) < t
    hist = jnp.zeros((num_tiles + 1,), jnp.int32).at[row_last_tile].add(
        1, mode="drop")
    rows_full = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(hist[:num_tiles])])
    idx = jnp.minimum(rows_full, nrows - 1)             # straddling row
    straddle = keys2d[idx]                              # (T+1, block) gather
    # depth_bits ≤ 22 and tile ids ≤ num_tiles, so t << depth_bits fits u32
    probes = jnp.arange(num_tiles + 1, dtype=jnp.uint32) << depth_bits
    in_row = jnp.sum((straddle < probes[:, None]).astype(jnp.int32), axis=1)
    return idx * block + in_row


@partial(jax.jit, static_argnames=("width", "height", "max_pairs", "tile",
                                   "tile_y"))
def bin_gaussians(means2d, depths, radii, width: int, height: int,
                  max_pairs: int, tile: int = TILE,
                  tile_y: int = None) -> Binning:
    P = means2d.shape[0]
    grid_x, grid_y = tile_grid(width, height, tile, tile_y)
    num_tiles = grid_x * grid_y
    _, depth_bits = _key_bits(num_tiles)

    min_x, max_x, min_y, max_y = gaussian_rects(means2d, radii, width,
                                                height, tile, tile_y)
    _, _, r_live = _split_radii(radii)
    rect_w = max_x - min_x
    touched = jnp.where(r_live, rect_w * (max_y - min_y), 0)

    offsets = jnp.cumsum(touched) - touched        # exclusive
    total = offsets[-1] + touched[-1]

    # monotone depth→int quantization: positive-f32 bit patterns sort like
    # the floats; keep the top `depth_bits` bits (ties broken by the stable
    # sort in expansion order, like CUB radix on equal keys)
    dbits = jax.lax.shift_right_logical(
        jax.lax.bitcast_convert_type(
            jnp.where(jnp.isfinite(depths), depths, 0.0).astype(jnp.float32),
            jnp.uint32),
        jnp.uint32(32 - depth_bits)).astype(jnp.int32)

    # expand per-gaussian attributes to per-pair slots via scatter+cumsum
    # (no gathers anywhere on the 2M side before the sort). Each expansion
    # is a full streaming pass over the pair bucket, so the base-tile and
    # depth-key columns ride ONE fused expansion: K0 = (base_tile << db) |
    # dbits in int32 with two's-complement wraparound — diff/scatter/cumsum
    # are exact mod 2^32, and the final reinterpretation as u32 recovers
    # the packed key.
    gauss_ids = _expand_by_offsets(jnp.arange(P, dtype=jnp.int32), offsets,
                                   max_pairs)
    # rect width and pair offset share one expansion: rw needs
    # ceil(log2(grid_x+1)) bits, offs gets the rest of the i32
    rw_bits = grid_x.bit_length()
    assert max_pairs < 1 << (31 - rw_bits), \
        "pair bucket too large for the fused offs|rw expansion"
    offs_rw = _expand_by_offsets(
        (offsets << rw_bits) | jnp.maximum(rect_w, 1), offsets, max_pairs)
    offs = offs_rw >> rw_bits
    rw = offs_rw & ((1 << rw_bits) - 1)
    base_tile = min_y * grid_x + min_x
    k0 = jax.lax.bitcast_convert_type(
        (base_tile.astype(jnp.uint32) << depth_bits)
        | jax.lax.bitcast_convert_type(dbits, jnp.uint32), jnp.int32)
    k0_pairs = _expand_by_offsets(k0, offsets, max_pairs)

    slot = jnp.arange(max_pairs, dtype=jnp.int32)
    pair_valid = slot < total
    j = slot - offs
    # j // rw via correctly-rounded f32 division: exact for
    # 0 <= j < 2^24, rw <= 2^rw_bits — an exact multiple k·rw divides to
    # exactly k, and k + r/rw with r <= rw-1 sits at least 1/rw below k+1,
    # far outside one rounding step. (A reciprocal-multiply would round
    # twice and can cross the boundary.) Integer div/mod lowers to a much
    # slower sequence on the VPU.
    jq = jnp.floor(j.astype(jnp.float32) /
                   rw.astype(jnp.float32)).astype(jnp.int32)
    delta_tile = jq * grid_x + (j - jq * rw)   # tile offset within the rect

    # single packed u32 key (CUDA: 64-bit [tile|depth] radix sort,
    # `rasterizer_impl.cu:306-311`); invalid pairs get the max tile id and
    # sort to the tail, outside every tile's range
    key = jnp.where(
        pair_valid,
        jax.lax.bitcast_convert_type(
            k0_pairs + (delta_tile << depth_bits), jnp.uint32),
        jnp.uint32(num_tiles) << depth_bits)
    sorted_key, sorted_ids = jax.lax.sort((key, gauss_ids), num_keys=1,
                                          is_stable=True)

    bounds = tile_range_bounds(sorted_key, num_tiles, depth_bits)
    starts = bounds[:-1]
    counts = bounds[1:] - starts
    return Binning(ids=sorted_ids, tile_starts=starts,
                   tile_counts=counts,
                   total_pairs=total.astype(jnp.int32),
                   pair_tiles=None)


@partial(jax.jit, static_argnames=("width", "height", "max_pairs", "tile",
                                   "tile_y"))
def bin_gaussians_with_tiles(means2d, depths, radii, width: int, height: int,
                             max_pairs: int, tile: int = TILE,
                             tile_y: int = None) -> Binning:
    """bin_gaussians + the per-pair tile id (needed by the aligned variant
    and some diagnostics)."""
    b = bin_gaussians(means2d, depths, radii, width, height, max_pairs, tile,
                      tile_y)
    grid_x, grid_y = tile_grid(width, height, tile, tile_y)
    num_tiles = grid_x * grid_y
    slot = jnp.arange(max_pairs, dtype=jnp.int32)
    # recover each sorted pair's tile from the range structure: tile of slot
    # = searchsorted(starts, slot) - 1 is another big op; cheapest exact
    # recovery is a boundary scatter + cumsum like the expansion trick
    marks = jnp.zeros((max_pairs + 1,), jnp.int32).at[b.tile_starts].add(1)
    pair_tile = jnp.cumsum(marks[:-1]) - 1
    pair_tile = jnp.where(slot < b.total_pairs,
                          jnp.clip(pair_tile, 0, num_tiles - 1), num_tiles)
    return b._replace(pair_tiles=pair_tile)


@partial(jax.jit, static_argnames=("width", "height", "max_pairs", "tile",
                                   "tile_y", "align"))
def bin_gaussians_aligned(means2d, depths, radii, width: int, height: int,
                          max_pairs: int, tile: int = TILE,
                          tile_y: int = None, align: int = CHUNK) -> Binning:
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
    grid_x, grid_y = tile_grid(width, height, tile, tile_y)
    num_tiles = grid_x * grid_y
    b = bin_gaussians_with_tiles(means2d, depths, radii, width, height,
                                 max_pairs, tile, tile_y)

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


def count_pairs(means2d, depths, radii, width, height, tile: int = TILE,
                tile_y: int = None):
    """Host-callable exact pair count (for choosing `max_pairs` buckets)."""
    min_x, max_x, min_y, max_y = gaussian_rects(means2d, radii, width,
                                                height, tile, tile_y)
    _, _, r_live = _split_radii(radii)
    touched = jnp.where(r_live, (max_x - min_x) * (max_y - min_y), 0)
    return jnp.sum(touched)
