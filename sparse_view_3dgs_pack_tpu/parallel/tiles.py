"""Tile-parallel (image-space) multi-chip rendering.

For large frames, image tiles are sharded across the mesh against a
REPLICATED Gaussian set (SURVEY §5.7's image-space decomposition): every
device bins against its own tile-row slice of the image and rasterises only
those tiles; the final image is the concatenation (an all-gather XLA inserts
at the output sharding boundary).

Decomposition is by horizontal bands of tile rows, so each device's slice is
a contiguous image region with its own (smaller) pair set — binning cost also
scales down per device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.binning import TILE, bin_gaussians
from ..ops.projection import Projected
from ..ops.rasterize_tiles import RasterConfig, rasterize_binned


def render_tile_parallel(proj: Projected, width: int, height: int,
                         background, mesh: Mesh,
                         config: RasterConfig, axis: str = "data"):
    """proj replicated → (H, W, C+3ish) image computed band-parallel.

    Returns the same outputs as rasterize_binned. Requires height to cut into
    `n_devices` bands of whole 16-px tile rows (pad the frame if not)."""
    n_dev = mesh.devices.size
    grid_y = (height + TILE - 1) // TILE
    assert grid_y % n_dev == 0, (
        f"tile rows ({grid_y}) must divide evenly across {n_dev} devices; "
        "pad the image")
    band_rows = grid_y // n_dev
    band_h = band_rows * TILE

    def render_band(band_idx, proj):
        # shift means into band-local coordinates: band b covers image rows
        # [b·band_h, (b+1)·band_h)
        y0 = band_idx * band_h
        local = proj._replace(
            means2d=proj.means2d - jnp.stack(
                [jnp.zeros_like(proj.means2d[:, 0]),
                 jnp.full_like(proj.means2d[:, 1], 1.0) * y0], axis=-1))
        rect = (local.rect_radii if local.rect_radii is not None
                else local.radii)
        binning = bin_gaussians(local.means2d, local.depths, rect,
                                width, band_h, config.max_pairs, config.tile)
        out = rasterize_binned(local, binning, width, band_h,
                               jnp.asarray(background), config)
        return out

    band_ids = jnp.arange(n_dev, dtype=jnp.int32)

    @partial(jax.shard_map, mesh=mesh, in_specs=(P(axis), None),
             out_specs=P(axis), check_vma=False)
    def sharded(band_ids, proj):
        out = render_band(band_ids[0], proj)
        return jax.tree.map(lambda a: a[None], out)

    outs = sharded(band_ids, proj)
    # (n_dev, band_h, W, ...) → (H, W, ...)
    return jax.tree.map(
        lambda a: a.reshape((n_dev * a.shape[1],) + a.shape[2:])[:height],
        outs)
