"""DNGaussian training (reference `DNGaussian/train_llff.py:39-213`).

Per iteration, THREE optimisation passes over the same view:
  1. hard depth — render with frozen opacity (0.95) and unit colors, grads
     flow to positions only; patch-normalised margin-MSE local (×0.1) +
     global (×1) + smoothness (×0.1, after iter 3000) against the mono
     depth map (255 − DPT).
  2. soft depth — same depth losses, positions/scales frozen, grads flow to
     opacity (and the neural opacity field), after `soft_depth_start`.
  3. photometric — L1 + λ·(1−SSIM) + shape/scale/opacity penalties, with the
     neural color/opacity field (hash-grid + MLPs) providing per-Gaussian
     colors and opacity-sigma.
Every 25 iters after iter 2000, Gaussians within `near_range` of any spiral
render camera are pruned (`train_llff.py:206-213`).

Static-shape note: the reference samples a fresh random patch size from
(5, 17) for each of the four patch-norm losses; here ONE size per iteration
is drawn (shared by the four uses) so the jit cache stays at ~12 variants —
statistically equivalent.
"""

from __future__ import annotations

import os
import random
import time
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..losses.dng import (loss_depth_smoothness, patch_norm_mse_loss,
                          patch_norm_mse_loss_global)
from ..losses.photometric import l1_loss
from ..losses.ssim import ssim
from ..models import gaussians as gm
from ..models.neural_field import (NeuralFieldConfig, init_neural_field,
                                   neural_forward, save_neural_npz)
from ..ops.rasterize_tiles import RasterConfig
from ..renderer import default_raster_config, render_core
from ..scene import Scene
from ..utils.pose_utils import generate_spiral_path
from . import capacity
from . import precompile
from . import debug
from .densify import (add_densification_stats, densify_and_prune, prune_only)
from .optim import (adam_update, init_adam, init_tree_adam,
                    make_lr_schedules, tree_adam_update)
from .step import CameraBank, sh_band_mask


class DNGConfig(NamedTuple):
    width: int
    height: int
    sh_degree: int
    raster: RasterConfig
    lambda_dssim: float = 0.2
    error_tolerance: float = 0.2
    shape_pena: float = 0.001
    scale_pena: float = 0.001
    opa_pena: float = 0.01
    use_neural: bool = True
    neural: NeuralFieldConfig = NeuralFieldConfig()
    patch_range: tuple = (5, 17)
    use_smooth: bool = False
    use_soft: bool = False
    use_mask: bool = False   # DTU: mask photometric loss (train_dtu.py:84-105)
    use_pallas: bool = False


def _neural_outputs(neural_params, params, cam_center, cfg: DNGConfig):
    xyz = params["xyz"]
    dirs = xyz - cam_center[None, :]
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True),
                              1e-12)
    sigma, color = neural_forward(neural_params, xyz, dirs, cfg.neural)
    # final opacity = sigmoid(sigma) · sigmoid(point opacity)
    # (reference `gaussian_model.py:141-157`)
    opacity = jax.nn.sigmoid(sigma) * jax.nn.sigmoid(params["opacity"][:, 0])
    return color, opacity


@partial(jax.jit, static_argnames=("cfg",))
def _dng_eval_view(params, alive_f, neural_params, cam, gt, bg,
                   cfg: DNGConfig):
    """(psnr, l1, ssim) for one test view, reduced ON DEVICE, rendered
    exactly like training pass 3 (neural color/opacity when use_neural)."""
    from ..utils.image import psnr as psnr_fn

    if cfg.use_neural:
        color, opac = _neural_outputs(neural_params, params,
                                      cam.cam_center, cfg)
    else:
        color, opac = None, jax.nn.sigmoid(params["opacity"][:, 0])
    res = render_core(params, alive_f, jnp.eye(3, 4), cam, cfg.width,
                      cfg.height, bg, sh_degree_active=cfg.sh_degree,
                      config=cfg.raster, override_color=color,
                      opacity_override=opac, use_pallas=cfg.use_pallas,
                      inference=True)
    return (psnr_fn(res.render, gt), jnp.mean(jnp.abs(res.render - gt)),
            ssim(res.render, gt))


def _dng_evaluate(state, neural_params, cameras, bg, active_sh, raster_cfg,
                  cfg: DNGConfig) -> dict:
    """In-training report over a camera list (reference training_report)."""
    if not cameras:
        return {}
    alive_f = state.alive.astype(jnp.float32)
    outs = [_dng_eval_view(state.params, alive_f, neural_params,
                           cam.params(),
                           jnp.asarray(cam.image[..., :3], jnp.float32), bg,
                           cfg._replace(raster=raster_cfg))
            for cam in cameras]
    return {"psnr": float(np.mean([float(p) for p, _, _ in outs])),
            "l1": float(np.mean([float(l) for _, l, _ in outs])),
            "ssim": float(np.mean([float(s) for _, _, s in outs])),
            "n_views": len(cameras)}


def _depth_losses(depth, depth_mono, image_like, patch_idx,
                  cfg: DNGConfig):
    """Random per-iteration patch size (reference draws from (5, 17)) is a
    traced index into a lax.switch over all sizes, so the step compiles
    once. The per-size losses are tiny relative to rendering."""
    lo, hi = cfg.patch_range

    def branch(ps):
        def f(_):
            return (0.1 * patch_norm_mse_loss(depth, depth_mono, ps,
                                              cfg.error_tolerance)
                    + patch_norm_mse_loss_global(depth, depth_mono, ps,
                                                 cfg.error_tolerance))
        return f

    loss = jax.lax.switch(patch_idx, [branch(ps) for ps in range(lo, hi)],
                          None)
    if cfg.use_smooth:
        loss = loss + 0.1 * loss_depth_smoothness(depth, image_like)
    return loss


@partial(jax.jit, static_argnames=("cfg",))
def dng_step(state, neural_params, adam, neural_adam, bank: CameraBank,
             cam_idx, patch_idx, lrs, neural_lrs, active_degree, bg,
             cfg: DNGConfig):
    cam = bank.camera(cam_idx)
    gt = bank.gt[cam_idx]
    depth_mono = bank.invdepth[cam_idx]       # slot holds 255 − DPT map
    has_depth = bank.has_depth[cam_idx]
    alive_f = state.alive.astype(jnp.float32)
    cap = state.capacity
    band = sh_band_mask(active_degree, cfg.sh_degree)

    def render_with(params, neural_p, opacity_value=None,
                    unit_colors=False, freeze_geom=False, offset=None):
        p = dict(params)
        p["features_rest"] = p["features_rest"] * band[1:][None]
        if freeze_geom:
            p = {k: (jax.lax.stop_gradient(v)
                     if k in ("xyz", "scaling", "rotation") else v)
                 for k, v in p.items()}
        if unit_colors and opacity_value is not None:
            # pure-depth pass: the neural field is not evaluated at all
            color = jnp.ones((cap, 3))
            opac = jnp.full((cap,), opacity_value)
        elif cfg.use_neural:
            color, opac = _neural_outputs(neural_p, p, cam.cam_center, cfg)
        else:
            color, opac = None, jax.nn.sigmoid(p["opacity"][:, 0])
        return render_core(
            p, alive_f, jnp.eye(3, 4), cam, cfg.width, cfg.height, bg,
            sh_degree_active=cfg.sh_degree, config=cfg.raster,
            override_color=color, opacity_override=opac,
            viewspace_offset=offset, use_pallas=cfg.use_pallas)

    # ---- pass 1: hard depth (opacity frozen at 0.95, geometry trains)
    def hard_loss(params):
        res = render_with(
            {**params, "scaling": jax.lax.stop_gradient(params["scaling"]),
             "rotation": jax.lax.stop_gradient(params["rotation"])},
            neural_params, opacity_value=0.95, unit_colors=True)
        return has_depth * _depth_losses(res.expected_depth, depth_mono, gt,
                                         patch_idx, cfg)

    g_hard = jax.grad(hard_loss)(state.params)
    new_params, adam = adam_update(state.params, g_hard, adam, lrs)
    state = state._replace(params=new_params)

    # ---- pass 2: soft depth (geometry frozen, opacity trains)
    if cfg.use_soft:
        def soft_loss(params, neural_p):
            res = render_with(params, neural_p, freeze_geom=True)
            return has_depth * _depth_losses(res.expected_depth, depth_mono,
                                             gt, patch_idx, cfg)

        g_soft, g_soft_n = jax.grad(soft_loss, argnums=(0, 1))(
            state.params, neural_params)
        new_params, adam = adam_update(state.params, g_soft, adam, lrs)
        state = state._replace(params=new_params)
        neural_params, neural_adam = tree_adam_update(
            neural_params, g_soft_n, neural_adam, neural_lrs)

    # ---- pass 3: photometric + regularisers
    alpha_mask = bank.alpha_mask[cam_idx]

    def photo_loss(params, neural_p, offset):
        res = render_with(params, neural_p, offset=offset)
        image = res.render
        gt_eff = gt
        if cfg.use_mask:
            image = image * alpha_mask
            gt_eff = gt * alpha_mask
        ll1 = l1_loss(image, gt_eff)
        loss = ll1 + cfg.lambda_dssim * (1.0 - ssim(image, gt_eff))

        scaling = jnp.exp(params["scaling"])
        smax = jnp.max(scaling, axis=-1)
        smin = jnp.min(scaling, axis=-1)
        mask = alive_f
        shape_pena = jnp.sum(smax / jnp.maximum(smin, 1e-12) * mask) / \
            jnp.maximum(mask.sum(), 1.0)
        scale_pena = jnp.sum(smax ** 2 * mask) / jnp.maximum(mask.sum(), 1.0)
        if cfg.use_neural:
            _, opac = _neural_outputs(neural_p, params, cam.cam_center, cfg)
        else:
            opac = jax.nn.sigmoid(params["opacity"][:, 0])
        hi = ((opac > 0.2) & state.alive).astype(jnp.float32)
        lo = ((opac < 0.2) & state.alive).astype(jnp.float32)
        opa_pena = (1.0
                    - jnp.sum(opac ** 2 * hi) / jnp.maximum(hi.sum(), 1.0)
                    + jnp.sum((1 - opac) ** 2 * lo)
                    / jnp.maximum(lo.sum(), 1.0))
        loss = loss + (cfg.shape_pena * shape_pena
                       + cfg.scale_pena * scale_pena
                       + cfg.opa_pena * opa_pena)
        return loss, {"loss": loss, "l1": ll1, "radii": res.radii,
                      "n_pairs": res.n_pairs}

    offset0 = jnp.zeros((cap, 2), jnp.float32)
    (gp, gn, go), metrics = jax.grad(photo_loss, argnums=(0, 1, 2),
                                     has_aux=True)(state.params,
                                                   neural_params, offset0)
    radii = metrics.pop("radii")
    new_params, adam = adam_update(state.params, gp, adam, lrs)
    state = state._replace(params=new_params)
    neural_params, neural_adam = tree_adam_update(neural_params, gn,
                                                  neural_adam, neural_lrs)
    state = add_densification_stats(state, go, radii, cfg.width, cfg.height)
    return state, neural_params, adam, neural_adam, metrics


def neural_lr_tree(params, grid_lr: float, net_lr: float):
    """Per-leaf LR: hash table at `neural_grid` LR, MLPs at `neural_net` LR
    (reference `GridRenderer.get_params`, `neural_renderer.py:126-134`);
    coord_center frozen."""
    def assign(path, leaf):
        name = jax.tree_util.keystr(path)
        if "encoder" in name:
            return jnp.asarray(grid_lr, jnp.float32)
        if "coord_center" in name:
            return jnp.zeros((), jnp.float32)
        return jnp.asarray(net_lr, jnp.float32)

    return jax.tree_util.tree_map_with_path(assign, params)


def train_dngaussian(dataset, opt, pipe, args, near_range: float = 0.0,
                     dataset_type: str = "llff"):
    """dataset_type: 'llff' (default) | 'dtu' (black bg + masked loss,
    reference `train_dtu.py`) | 'blender' (white bg, `train_blender.py`)."""
    scene = Scene(dataset, sh_degree=dataset.sh_degree)
    cams = scene.getTrainCameras()
    W, H = cams[0].width, cams[0].height

    from ..depth.estimator import get_depth_estimator
    estimator = get_depth_estimator(getattr(args, "depth_estimator", "auto"),
                                    dataset.source_path)
    for c in cams:
        d = estimator.depth_for_camera(c)
        if d is not None:
            c.invdepthmap = (255.0 - d).astype(np.float32)
            c.depth_mask = np.ones_like(d, np.float32)
            c.depth_reliable = True
    bank = CameraBank.from_cameras(cams)

    state = scene.gaussians
    adam = init_adam(state.params)
    neural_cfg = NeuralFieldConfig(bound=max(scene.cameras_extent, 1.0))
    neural_params = init_neural_field(jax.random.PRNGKey(0), neural_cfg)
    neural_adam = init_tree_adam(neural_params)

    lr_scheds = make_lr_schedules(opt, scene.cameras_extent)
    neural_lrs = neural_lr_tree(neural_params,
                                getattr(opt, "neural_grid", 5e-3),
                                getattr(opt, "neural_net", 5e-4))

    white = dataset.white_background or dataset_type == "blender"
    bg = jnp.asarray([1, 1, 1] if white else [0, 0, 0], jnp.float32)
    raster_cfg = default_raster_config(state.capacity, W, H,
                                       getattr(pipe, "max_pairs", 0),
                                       getattr(pipe, "max_per_tile", 0),
                                       getattr(pipe, "tile_batch", 64))
    pair_bucket = capacity.PairBucket(raster_cfg.max_pairs)
    compiler = precompile.SpeculativeCompiler(
        precompile.speculation_enabled(), quiet=True)
    shapes_dirty = True

    def rebuild_cfg(pairs=None):
        nonlocal raster_cfg, shapes_dirty
        raster_cfg = default_raster_config(
            state.capacity, W, H,
            pair_bucket.max_pairs if pairs is None else pairs,
            getattr(pipe, "max_per_tile", 0),
            getattr(pipe, "tile_batch", 64))
        pair_bucket.max_pairs = raster_cfg.max_pairs
        shapes_dirty = True

    def speculate(cfg, lrs):
        """Background-compile the growth-edge dng_steps (precompile.py).
        The use_smooth/use_soft flags are speculated AT CURRENT VALUE — a
        flag flip before the growth costs one wasted background compile,
        the same foreground compile as today, never correctness."""
        others = precompile.specs_of(
            (neural_params, neural_adam, bank, jnp.asarray(0, jnp.int32),
             jnp.asarray(0, jnp.int32), lrs, neural_lrs,
             jnp.asarray(0, jnp.int32), bg))

        def lower_with(s, a, c, n):
            np_s, na_s, bank_s, i_s, p_s, lrs_s, nlrs_s, deg_s, bg_s = others
            dng_step.lower(s, np_s, a, na_s, bank_s, i_s, p_s, lrs_s,
                           nlrs_s, deg_s, bg_s, c).compile()

        precompile.speculate_growth_edges(
            compiler, state, adam, raster_cfg.max_pairs,
            capacity.PAIR_HARD_CAP,
            cfg_for=lambda cp, mp=None: cfg._replace(
                raster=default_raster_config(
                    cp, W, H, mp if mp is not None else pair_bucket.max_pairs,
                    getattr(pipe, "max_per_tile", 0),
                    getattr(pipe, "tile_batch", 64))),
            lower_with=lower_with,
            mark_current=(state.capacity, cfg))

    spiral_cams = generate_spiral_path(cams, n_frames=120)

    active_sh = 0
    viewpoint_stack = []
    t0 = time.time()
    save_iters = set(args.save_iterations)
    test_iters = set(getattr(args, "test_iterations", None) or [])
    pair_lag = capacity.LaggedScalar()

    for it in range(1, opt.iterations + 1):
        if it % 1000 == 0 and active_sh < dataset.sh_degree:
            active_sh += 1
        if not viewpoint_stack:
            viewpoint_stack = list(range(len(cams)))
        cam_idx = viewpoint_stack.pop(
            random.randint(0, len(viewpoint_stack) - 1))

        patch_idx = random.randint(0, 11)
        cfg = DNGConfig(
            width=W, height=H, sh_degree=dataset.sh_degree,
            raster=raster_cfg, lambda_dssim=opt.lambda_dssim,
            error_tolerance=opt.error_tolerance,
            shape_pena=opt.shape_pena, scale_pena=opt.scale_pena,
            opa_pena=opt.opa_pena, use_mask=(dataset_type == "dtu"),
            use_neural=bool(getattr(opt, "use_neural", 1)),
            use_pallas=jax.default_backend() not in ("cpu",),
            use_smooth=(it > 3000), use_soft=(it > opt.soft_depth_start))

        lrs = {k: jnp.asarray(f(it), jnp.float32)
               for k, f in lr_scheds.items() if k in state.params}
        state, neural_params, adam, neural_adam, metrics = dng_step(
            state, neural_params, adam, neural_adam, bank,
            jnp.asarray(cam_idx, jnp.int32),
            jnp.asarray(patch_idx, jnp.int32), lrs, neural_lrs,
            jnp.asarray(active_sh, jnp.int32), bg, cfg)
        if shapes_dirty:
            shapes_dirty = False
            speculate(cfg, lrs)

        if (it < opt.densify_until_iter and it > opt.densify_from_iter
                and it % opt.densification_interval == 0):
            state, adam, grew = capacity.ensure_headroom(state, adam)
            if grew:
                rebuild_cfg()
            res = densify_and_prune(state, adam, jax.random.PRNGKey(it),
                                    opt.densify_grad_threshold,
                                    getattr(opt, "prune_threshold", 0.01),
                                    scene.cameras_extent, max_screen_size=0,
                                    percent_dense=opt.percent_dense)
            state, adam = res.state, res.opt_state
            if capacity.dropped_appends(res, it, state.capacity):
                state, adam = capacity.grow_state(state, adam)
                rebuild_cfg()

        if near_range > 0 and it > 2000 and (it - 1) % 25 == 0:
            centers = jnp.asarray(np.stack(
                [c.camera_center for c in spiral_cams]))
            xyz = state.params["xyz"]
            d = jnp.linalg.norm(xyz[:, None, :] - centers[None, :, :],
                                axis=-1)
            mask = (d < near_range).any(axis=1) & state.alive
            state, adam = prune_only(state, adam, mask)

        # debug snapshot on non-finite loss (reference CHECK_CUDA dump path)
        debug.check_step(pipe, it, metrics, state, dataset.model_path)

        # pair-bucket overflow drops tail pairs; check every iteration via
        # the one-step-lagged readback (no async-dispatch stall — see
        # capacity.LaggedScalar)
        prev_pairs = pair_lag.swap(metrics["n_pairs"])
        if prev_pairs is not None and capacity.pair_signal(
                prev_pairs, pair_bucket, pipe, raster_cfg.max_per_tile):
            rebuild_cfg()

        if it % 100 == 0:
            print(f"[{it}/{opt.iterations}] loss="
                  f"{float(metrics['loss']):.5f}", flush=True)
        if it in test_iters or it == opt.iterations:
            # in-training PSNR/SSIM on test views, on device, rendered the
            # way the model actually trains — through the neural field when
            # use_neural (reference `DNGaussian/train_llff.py` training
            # report renders via the GridRenderer)
            from .loop import format_eval
            stats = _dng_evaluate(state, neural_params, scene.getTestCameras(),
                                  bg, active_sh, raster_cfg, cfg)
            if stats:
                print(f"\n[ITER {it}] Evaluating test: "
                      f"{format_eval(stats)}", flush=True)
        if it in save_iters or it == opt.iterations:
            scene.gaussians = state
            scene.save(it)
            if cfg.use_neural:
                # the PLY alone cannot reproduce DNG renders — color and
                # opacity-sigma live in the field; persist it beside the
                # PLY so render.py reconstructs training-time output
                # (reference `train_llff.py:232-235` chkpnt_latest.pth)
                save_neural_npz(
                    os.path.join(dataset.model_path, "point_cloud",
                                 f"iteration_{it}", "neural_renderer.npz"),
                    neural_params, neural_cfg)

    elapsed = time.time() - t0
    print(f"DNGaussian training took {elapsed:.1f}s "
          f"({opt.iterations / max(elapsed, 1e-9):.2f} it/s)")
    scene.gaussians = state
    return scene
