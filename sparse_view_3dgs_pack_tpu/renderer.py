"""High-level render entry point (reference
`gaussian_renderer/__init__.py:18-128`).

Connects a GaussianState + camera to the projection and tiled rasterizer ops.
Returns the reference's output contract: render / viewspace_points /
visibility_filter / radii / depth (expected inverse depth), plus alpha and
expected depth (the FSGS/DNGaussian rasterizer variants' extra outputs,
`dgr_fsgs/__init__.py:98` — here they're always available; confidence
gradient scaling is a first-class option).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .data.cameras import CameraParams
from .models import gaussians as gm
from .ops.binning import bin_gaussians
from .ops.projection import project_gaussians
from .ops.rasterize_tiles import RasterConfig, rasterize_binned


class RenderResult(NamedTuple):
    render: jnp.ndarray             # (H, W, C) clamped to [0,1]
    viewspace_points: jnp.ndarray   # (CAP, 2) the zero offset param
    radii: jnp.ndarray              # (CAP,) int32
    depth: jnp.ndarray              # (H, W) expected inverse depth
    alpha: jnp.ndarray              # (H, W)
    expected_depth: jnp.ndarray     # (H, W)
    n_pairs: jnp.ndarray            # () int32 — actual (tile,gaussian) pairs;
                                    # > config.max_pairs signals bucket overflow


def render_core(params: dict, alive, exposure_mat, cam: CameraParams,
                width: int, height: int, bg_color,
                sh_degree_active: int,
                config: RasterConfig,
                scaling_modifier: float = 1.0,
                antialiasing: bool = False,
                use_trained_exp: bool = False,
                override_color=None,
                confidence=None,
                opacity_override=None,
                viewspace_offset=None,
                clamp: bool = True,
                use_pallas: bool = False,
                inference: bool = False) -> RenderResult:
    """Differentiable core — fully traceable; all array args may be traced.

    `confidence`: per-Gaussian gradient scale (FSGS N2 semantics) applied via
    the straight-through trick g·c + stop_grad(g·(1-c)) — forward identical,
    backward scaled.
    `opacity_override`: activated (CAP,) opacities (DNGaussian's neural
    opacity or frozen-opacity depth passes).
    """
    xyz = params["xyz"]
    if viewspace_offset is None:
        viewspace_offset = jnp.zeros((xyz.shape[0], 2), xyz.dtype)

    scales = jnp.exp(params["scaling"]) * 1.0
    quats = params["rotation"]
    if opacity_override is not None:
        opacity = opacity_override * alive
    else:
        opacity = jax.nn.sigmoid(params["opacity"][:, 0]) * alive

    if confidence is not None:
        def scale_grad(p):
            c = confidence.reshape((-1,) + (1,) * (p.ndim - 1))
            return p * c + jax.lax.stop_gradient(p * (1.0 - c))
        xyz = scale_grad(xyz)
        scales = scale_grad(scales)
        quats = scale_grad(quats)
        opacity = scale_grad(opacity)

    sh = None
    colors_precomp = None
    if override_color is not None:
        colors_precomp = override_color
    else:
        sh = jnp.concatenate([params["features_dc"],
                              params["features_rest"]], axis=1)
        if confidence is not None:
            sh = sh * confidence[:, None, None] + jax.lax.stop_gradient(
                sh * (1.0 - confidence[:, None, None]))

    proj = project_gaussians(
        means3d=xyz, scales=scales, quats=quats, opacities=opacity,
        viewmat=cam.viewmat, full_proj=cam.full_proj,
        cam_center=cam.cam_center,
        tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
        width=width, height=height,
        sh=sh, sh_degree=sh_degree_active,
        colors_precomp=colors_precomp,
        scale_modifier=scaling_modifier,
        antialiasing=antialiasing)
    proj = proj._replace(means2d=proj.means2d + viewspace_offset)
    # per-axis AABB rect (exactly output-preserving, strictly fewer pairs —
    # see projection.py); fall back to the 3σ square for hand-built proj
    rect = proj.rect_radii if proj.rect_radii is not None else proj.radii

    if use_pallas:
        from .ops.pallas.raster_vjp import make_pallas_rasterizer
        C = proj.colors.shape[-1]
        # inference uses 32x16 tiles: ~30% fewer pairs (less horizontal
        # duplication) and half the per-tile kernel programs; the training
        # tile width is configurable (both kernels are tile-shape generic)
        if inference:
            tx, ty = 32, 16
        else:
            tx = getattr(config, "train_tile_x", 0) or config.tile
            ty = config.tile
        ba = bin_gaussians(
            jax.lax.stop_gradient(proj.means2d),
            jax.lax.stop_gradient(proj.depths), rect,
            width, height, config.max_pairs, tx, ty)
        raster_fn = make_pallas_rasterizer(width, height, C,
                                           inference=inference,
                                           tile_x=tx, tile_y=ty)
        color, invdepth, depth, alpha = raster_fn(
            proj.means2d, proj.depths, proj.conics, proj.colors,
            proj.opacities, ba.ids, ba.tile_starts, ba.tile_counts,
            jnp.asarray(bg_color))
        from .ops.rasterize_ref import RenderOutputs
        out = RenderOutputs(color=color, alpha=alpha, invdepth=invdepth,
                            depth=depth)
        # n_pairs == max_pairs+1 is reserved for the XLA path's per-tile
        # clip sentinel; a true pallas demand of exactly that value must
        # not trigger the host's max_per_tile response (it would never
        # grow the bucket) — nudge to +2
        binning = ba._replace(total_pairs=jnp.where(
            ba.total_pairs == config.max_pairs + 1,
            ba.total_pairs + 1, ba.total_pairs))
    else:
        binning = bin_gaussians(
            jax.lax.stop_gradient(proj.means2d),
            jax.lax.stop_gradient(proj.depths), rect,
            width, height, config.max_pairs, config.tile)
        out = rasterize_binned(proj, binning, width, height,
                               jnp.asarray(bg_color), config)
        # The XLA path clamps each tile's list to max_per_tile; a clipped
        # tile silently drops its back-most Gaussians. Surface it through
        # the pair-overflow protocol with a distinguishable encoding:
        #   n_pairs == max_pairs + 1 EXACTLY → per-tile clip with room in
        #     the bucket (host response: double max_per_tile, keep bucket);
        #   n_pairs >  max_pairs otherwise → true bucket overflow (host
        #     grows max_pairs).
        # Without the distinction the host doubles the wrong knob forever:
        # a dense few-shot scene at 128px holds >8k pairs in its central
        # tiles, and growing the bucket never unclips them (observed: the
        # bucket ran to the 8M hard cap on a 67k-pair frame).
        clipped = jnp.max(binning.tile_counts) > config.max_per_tile
        total = binning.total_pairs
        # a TRUE demand of exactly max_pairs+1 must not read as the clip
        # sentinel: nudge it to +2 (overstates bucket demand by one pair)
        total = jnp.where(jnp.logical_not(clipped)
                          & (total == config.max_pairs + 1),
                          total + 1, total)
        binning = binning._replace(total_pairs=jnp.where(
            clipped & (total <= config.max_pairs),
            jnp.int32(config.max_pairs + 1), total))

    image = out.color
    if use_trained_exp:
        image = image @ exposure_mat[:3, :3] + exposure_mat[:3, 3]
    if clamp:
        image = jnp.clip(image, 0.0, 1.0)

    return RenderResult(render=image, viewspace_points=viewspace_offset,
                        radii=proj.radii, depth=out.invdepth,
                        alpha=out.alpha, expected_depth=out.depth,
                        n_pairs=binning.total_pairs)


def render(state: gm.GaussianState, camera, bg_color,
           sh_degree_active: Optional[int] = None,
           scaling_modifier: float = 1.0, antialiasing: bool = False,
           use_trained_exp: bool = False, exposure_idx: int = 0,
           config: Optional[RasterConfig] = None,
           override_color=None, use_pallas: Optional[bool] = None) -> RenderResult:
    """Host-friendly wrapper: takes a data.cameras.Camera (or MiniCam).

    Inference rendering defaults to the Pallas kernel on TPU and the XLA
    tiled path elsewhere."""
    if use_pallas is None:
        import jax as _jax
        use_pallas = _jax.default_backend() not in ("cpu",)
    if config is None:
        config = default_raster_config(state.capacity, camera.width,
                                       camera.height)
    if sh_degree_active is None:
        sh_degree_active = state.max_sh_degree
    exposure_mat = state.exposure[min(exposure_idx,
                                      state.exposure.shape[0] - 1)]
    return _render_jit(state.params, state.alive.astype(jnp.float32),
                       exposure_mat, camera.params(),
                       camera.width, camera.height,
                       jnp.asarray(bg_color, jnp.float32),
                       sh_degree_active, config, scaling_modifier,
                       antialiasing, use_trained_exp, override_color,
                       use_pallas)


@partial(jax.jit, static_argnames=("width", "height", "sh_degree_active",
                                   "config", "scaling_modifier",
                                   "antialiasing", "use_trained_exp",
                                   "use_pallas"))
def _render_jit(params, alive, exposure_mat, cam, width, height, bg_color,
                sh_degree_active, config, scaling_modifier, antialiasing,
                use_trained_exp, override_color, use_pallas=False):
    # host-level render() is eval/viewer-only → inference kernel variant
    return render_core(params, alive, exposure_mat, cam, width, height,
                       bg_color, sh_degree_active, config, scaling_modifier,
                       antialiasing, use_trained_exp, override_color,
                       use_pallas=use_pallas, inference=True)


def render_neural(state: gm.GaussianState, camera, bg_color,
                  neural_params=None, neural_cfg=None,
                  sh_degree_active: Optional[int] = None,
                  scaling_modifier: float = 1.0, antialiasing: bool = False,
                  use_trained_exp: bool = False,
                  config: Optional[RasterConfig] = None,
                  use_pallas: Optional[bool] = None,
                  override_color=None) -> RenderResult:
    """DNGaussian inference render: per-Gaussian color and opacity come
    from the hash-grid neural field, exactly as in training (the reference
    reloads the GridRenderer at render time, `DNGaussian/render.py:138-147`
    — rendering its PLY with SH would show init colors). Signature matches
    `render` so CLIs can swap the two."""
    if use_pallas is None:
        import jax as _jax
        use_pallas = _jax.default_backend() not in ("cpu",)
    if config is None:
        config = default_raster_config(state.capacity, camera.width,
                                       camera.height)
    if sh_degree_active is None:
        sh_degree_active = state.max_sh_degree
    return _render_neural_jit(state.params, state.alive.astype(jnp.float32),
                              neural_params, camera.params(),
                              camera.width, camera.height,
                              jnp.asarray(bg_color, jnp.float32),
                              sh_degree_active, config, neural_cfg,
                              scaling_modifier, antialiasing, use_pallas)


@partial(jax.jit, static_argnames=("width", "height", "sh_degree_active",
                                   "config", "neural_cfg",
                                   "scaling_modifier", "antialiasing",
                                   "use_pallas"))
def _render_neural_jit(params, alive, neural_params, cam, width, height,
                       bg_color, sh_degree_active, config, neural_cfg,
                       scaling_modifier, antialiasing, use_pallas):
    from .models.neural_field import neural_forward

    xyz = params["xyz"]
    dirs = xyz - cam.cam_center[None, :]
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True),
                              1e-12)
    sigma, color = neural_forward(neural_params, xyz, dirs, neural_cfg)
    # final opacity = sigmoid(sigma) · sigmoid(point opacity)
    # (reference `DNGaussian/scene/gaussian_model.py:141-157`)
    opacity = jax.nn.sigmoid(sigma) * jax.nn.sigmoid(params["opacity"][:, 0])
    return render_core(params, alive, jnp.eye(3, 4), cam, width, height,
                       bg_color, sh_degree_active, config, scaling_modifier,
                       antialiasing, override_color=color,
                       opacity_override=opacity, use_pallas=use_pallas,
                       inference=True)


def default_raster_config(capacity: int, width: int, height: int,
                          max_pairs: int = 0, max_per_tile: int = 0,
                          tile_batch: int = 64) -> RasterConfig:
    """Heuristic static buckets: pairs ≈ 8×capacity (grown on overflow by the
    training loop), per-tile list capped by pairs and tile count."""
    num_tiles = ((width + 15) // 16) * ((height + 15) // 16)
    if max_pairs <= 0:
        # start modest: the training loop grows on overflow and shrinks when
        # oversized; every binning/pack cost scales with this bucket
        max_pairs = max(1 << 17, _next_pow2(capacity * 4))
    if max_per_tile <= 0:
        max_per_tile = min(4096, max(256, _next_pow2(max_pairs // max(num_tiles // 8, 1))))
    # the XLA path materializes (tile_batch, 256, max_per_tile) blend
    # buffers; when the per-tile list grows past the default ceiling (host
    # response to the tile-clip sentinel), shrink the batch to bound peak
    # memory at ~32M elements per buffer
    if max_per_tile > 4096:
        tile_batch = min(tile_batch, max(1, (1 << 25) // (256 * max_per_tile)))
    tile_batch = max(1, min(tile_batch, num_tiles))
    return RasterConfig(max_pairs=max_pairs, max_per_tile=max_per_tile,
                        tile_batch=tile_batch)


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p
