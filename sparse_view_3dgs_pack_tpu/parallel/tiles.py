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
                         config: RasterConfig, axis: str = "data",
                         return_pairs: bool = False):
    """proj replicated → (H, W, C+3ish) image computed band-parallel.

    Returns the same outputs as rasterize_binned. A height whose tile rows
    don't divide evenly across devices is padded with empty bands (cropped
    from the output). With `return_pairs`, also returns the max per-band
    pair count (each band's bucket is `config.max_pairs`; > that signals
    overflow, same protocol as the single-device renderer)."""
    n_dev = mesh.devices.size
    grid_y = (height + TILE - 1) // TILE
    band_rows = -(-grid_y // n_dev)            # ceil: pad trailing bands
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
        return out, binning.total_pairs

    band_ids = jnp.arange(n_dev, dtype=jnp.int32)

    @partial(jax.shard_map, mesh=mesh, in_specs=(P(axis), None),
             out_specs=(P(axis), P(axis)), check_vma=False)
    def sharded(band_ids, proj):
        out, pairs = render_band(band_ids[0], proj)
        return jax.tree.map(lambda a: a[None], out), pairs[None]

    outs, pairs = sharded(band_ids, proj)
    # (n_dev, band_h, W, ...) → (H, W, ...)
    image = jax.tree.map(
        lambda a: a.reshape((n_dev * a.shape[1],) + a.shape[2:])[:height],
        outs)
    if return_pairs:
        return image, jnp.max(pairs)
    return image


def make_tile_parallel_render_fn(mesh: Mesh, width: int, height: int,
                                 axis: str = "data"):
    """CLI-level band-parallel render (``render.py --tile_parallel``).

    Returns a drop-in for ``renderer.render``: fn(state, camera, bg_color,
    sh_degree_active=, antialiasing=, config=) → RenderResult. The Gaussian
    set is replicated; each device projects + bins + rasterises its own
    horizontal band of tile rows (SURVEY §5.8 image-space decomposition)."""
    from ..renderer import (RenderResult, default_raster_config)
    from ..ops.projection import project_gaussians

    @partial(jax.jit, static_argnames=("sh_degree_active", "antialiasing",
                                       "config"))
    def _jit(params, alive, cam, bg_color, sh_degree_active, antialiasing,
             config):
        xyz = params["xyz"]
        opacity = jax.nn.sigmoid(params["opacity"][:, 0]) * alive
        sh = jnp.concatenate([params["features_dc"],
                              params["features_rest"]], axis=1)
        proj = project_gaussians(
            means3d=xyz, scales=jnp.exp(params["scaling"]),
            quats=params["rotation"], opacities=opacity,
            viewmat=cam.viewmat, full_proj=cam.full_proj,
            cam_center=cam.cam_center,
            tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
            width=width, height=height, sh=sh,
            sh_degree=sh_degree_active, antialiasing=antialiasing)
        out, n_pairs = render_tile_parallel(proj, width, height, bg_color,
                                            mesh, config, axis=axis,
                                            return_pairs=True)
        return RenderResult(
            render=jnp.clip(out.color, 0.0, 1.0),
            viewspace_points=jnp.zeros((xyz.shape[0], 2), xyz.dtype),
            radii=proj.radii, depth=out.invdepth, alpha=out.alpha,
            expected_depth=out.depth, n_pairs=n_pairs)

    def fn(state, camera, bg_color, sh_degree_active=None,
           antialiasing=False, config=None, **_ignored):
        if config is None:
            config = default_raster_config(state.capacity, width, height)
        if sh_degree_active is None:
            sh_degree_active = state.max_sh_degree
        return _jit(state.params, state.alive.astype(jnp.float32),
                    camera.params(), jnp.asarray(bg_color, jnp.float32),
                    sh_degree_active, antialiasing, config)

    return fn
