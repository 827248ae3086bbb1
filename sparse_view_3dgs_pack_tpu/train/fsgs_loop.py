"""FSGS training (reference `FSGS/train.py:38-176`).

Differences from the base loop: masked L1 + SSIM, Pearson-correlation depth
prior against a mono-depth map per view, pseudo-view depth distillation every
`sample_pseudo_interval` iters (the pseudo target comes from a pluggable
depth estimator — the reference loads MiDaS from torch.hub in-loop, which is
impossible offline; see `depth/estimator.py`), proximity-guided densification
until iter 2000 using the KNN indices, distance-based extra split mask, SH
degree up every 500, opacity reset offset from `start_sample_pseudo`.
"""

from __future__ import annotations

import os
import random
import time
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.cameras import CameraParams
from ..depth.estimator import get_depth_estimator
from ..losses.depth import fsgs_depth_loss, pseudo_depth_loss
from ..losses.photometric import l1_loss_mask
from ..losses.ssim import ssim
from ..models import gaussians as gm
from ..ops.knn import knn3
from ..ops.rasterize_tiles import RasterConfig
from ..renderer import default_raster_config, render_core
from ..scene import Scene
from ..utils.general import get_expon_lr_func
from ..utils.pose_utils import (generate_random_poses_360,
                                generate_random_poses_llff)
from . import capacity
from . import debug
from . import precompile
from .densify import (add_densification_stats, densify_and_prune,
                      proximity_densify, reset_opacity)
from .optim import init_adam, make_lr_schedules, adam_update
from .step import CameraBank, sh_band_mask


class FSGSConfig(NamedTuple):
    width: int
    height: int
    sh_degree: int
    raster: RasterConfig
    lambda_dssim: float = 0.2
    use_pallas: bool = False
    use_confidence: bool = False


@partial(jax.jit, static_argnames=("cfg",))
def fsgs_step(state, adam, bank: CameraBank, cam_idx, lrs, depth_weight,
              active_degree, bg, cfg: FSGSConfig, confidence=None):
    """confidence: (CAP,) per-Gaussian gradient scale (reference keeps an
    all-ones tensor carried through densification, gated by
    `pipe.use_confidence` — `FSGS/gaussian_renderer/__init__.py:42`,
    `dgr_fsgs/__init__.py:146-158`)."""
    cam = bank.camera(cam_idx)
    gt = bank.gt[cam_idx]
    alpha_mask = bank.alpha_mask[cam_idx]
    midas_depth = bank.invdepth[cam_idx]     # bank slot reused for mono depth
    has_depth = bank.has_depth[cam_idx]
    band = sh_band_mask(active_degree, cfg.sh_degree)
    alive_f = state.alive.astype(jnp.float32)
    cap = state.capacity

    def loss_fn(params, offset):
        p = dict(params)
        p["features_rest"] = params["features_rest"] * band[1:][None]
        res = render_core(p, alive_f, jnp.eye(3, 4), cam, cfg.width,
                          cfg.height, bg, sh_degree_active=cfg.sh_degree,
                          config=cfg.raster, viewspace_offset=offset,
                          confidence=(confidence if cfg.use_confidence
                                      else None),
                          use_pallas=cfg.use_pallas)
        image = res.render * alpha_mask
        ll1 = l1_loss_mask(image, gt)
        loss = ((1.0 - cfg.lambda_dssim) * ll1
                + cfg.lambda_dssim * (1.0 - ssim(image, gt)))
        dterm = fsgs_depth_loss(res.expected_depth, midas_depth)
        loss = loss + depth_weight * has_depth * dterm
        return loss, {"loss": loss, "l1": ll1, "depth": dterm,
                      "radii": res.radii, "n_pairs": res.n_pairs}

    offset0 = jnp.zeros((cap, 2), jnp.float32)
    (gp, go), metrics = jax.grad(loss_fn, argnums=(0, 1), has_aux=True)(
        state.params, offset0)
    radii = metrics.pop("radii")
    new_params, new_adam = adam_update(state.params, gp, adam, lrs)
    new_state = state._replace(params=new_params)
    new_state = add_densification_stats(new_state, go, radii, cfg.width,
                                        cfg.height)
    return new_state, new_adam, metrics


@partial(jax.jit, static_argnames=("cfg",))
def fsgs_render_pseudo(state, cam: CameraParams, active_degree, bg,
                       cfg: FSGSConfig):
    band = sh_band_mask(active_degree, cfg.sh_degree)
    p = dict(state.params)
    p["features_rest"] = state.params["features_rest"] * band[1:][None]
    res = render_core(p, state.alive.astype(jnp.float32), jnp.eye(3, 4), cam,
                      cfg.width, cfg.height, bg,
                      sh_degree_active=cfg.sh_degree, config=cfg.raster,
                      use_pallas=cfg.use_pallas)
    return res.render, res.expected_depth


@partial(jax.jit, static_argnames=("cfg",))
def fsgs_warped_pseudo_step(state, adam, src_cam: CameraParams, src_prior,
                            dst_cam: CameraParams, lrs, weight,
                            active_degree, bg, cfg: FSGSConfig):
    """Offline pseudo-view distillation: align the nearest train view's
    precomputed prior to metric scale against its own rendered depth, warp
    it into the pseudo camera, and apply a masked Pearson loss there (the
    substitute for reference MiDaS-on-render, `FSGS/train.py:116-131`)."""
    from ..depth.warp import metric_depth_from_prior, warp_depth
    from ..losses.depth import warped_pseudo_depth_loss

    band = sh_band_mask(active_degree, cfg.sh_degree)
    alive_f = state.alive.astype(jnp.float32)

    def render_view(params, cam):
        p = dict(params)
        p["features_rest"] = params["features_rest"] * band[1:][None]
        return render_core(p, alive_f, jnp.eye(3, 4), cam, cfg.width,
                           cfg.height, bg, sh_degree_active=cfg.sh_degree,
                           config=cfg.raster, use_pallas=cfg.use_pallas)

    # warp target is built OUTSIDE the grad (a fixed distillation target)
    src = render_view(state.params, src_cam)
    z_src, src_valid = metric_depth_from_prior(src_prior, src.depth,
                                               src.alpha)
    warped, valid = warp_depth(z_src, src_valid, src_cam, dst_cam,
                               cfg.width, cfg.height)
    coverage = valid.mean()

    def loss_fn(params):
        res = render_view(params, dst_cam)
        return warped_pseudo_depth_loss(res.expected_depth, warped, valid)

    loss, gp = jax.value_and_grad(loss_fn)(state.params)
    # skip on non-finite loss or negligible coverage
    ok = jnp.isfinite(loss) & (coverage > 0.05)
    gp = jax.tree.map(lambda g: jnp.where(ok, g, 0.0), gp)
    lrs_eff = {k: v * weight * ok for k, v in lrs.items()}
    new_params, new_adam = adam_update(state.params, gp, adam, lrs_eff)
    return state._replace(params=new_params), new_adam, loss


@partial(jax.jit, static_argnames=("cfg",))
def fsgs_pseudo_step(state, adam, cam: CameraParams, midas_pseudo, lrs,
                     weight, active_degree, bg, cfg: FSGSConfig):
    """Distillation: pseudo-view rendered depth vs estimated depth
    (`FSGS/train.py:116-131`)."""
    band = sh_band_mask(active_degree, cfg.sh_degree)
    alive_f = state.alive.astype(jnp.float32)

    def loss_fn(params):
        p = dict(params)
        p["features_rest"] = params["features_rest"] * band[1:][None]
        res = render_core(p, alive_f, jnp.eye(3, 4), cam, cfg.width,
                          cfg.height, bg, sh_degree_active=cfg.sh_degree,
                          config=cfg.raster, use_pallas=cfg.use_pallas)
        return pseudo_depth_loss(res.expected_depth, midas_pseudo)

    loss, gp = jax.value_and_grad(loss_fn)(state.params)
    finite = jnp.isfinite(loss)
    gp = jax.tree.map(lambda g: jnp.where(finite, g, 0.0), gp)
    lrs_eff = {k: v * weight * finite for k, v in lrs.items()}
    new_params, new_adam = adam_update(state.params, gp, adam, lrs_eff)
    return state._replace(params=new_params), new_adam, loss


@jax.jit
def proximity_candidates(state, scene_extent):
    """FSGS `proximity` (`FSGS/scene/gaussian_model.py:405-421`): for
    outlier Gaussians (3NN-dist > 5·extent and scale > extent), propose
    midpoints to their 3 nearest neighbours. Returns (mask, nn_idx, dist)."""
    xyz = state.params["xyz"]
    dist, idx = knn3(xyz, valid=state.alive)
    scaling = jnp.max(gm.get_scaling(state), axis=-1)
    mask = (state.alive & (dist > 5.0 * scene_extent)
            & (scaling > scene_extent))
    return mask, idx, dist


@jax.jit
def fsgs_densify_masks(state, scene_extent, dist_thres):
    """One KNN pass serving both FSGS densification extras:
    * proximity mask (dist > 5·extent ∧ scale > extent,
      `FSGS/scene/gaussian_model.py:405-408`) + 3-NN indices;
    * distance-based extra SPLIT mask (dist > dist_thres·extent ∧
      scale > extent, `gaussian_model.py:434-437`)."""
    xyz = state.params["xyz"]
    dist, idx = knn3(xyz, valid=state.alive)
    scaling = jnp.max(gm.get_scaling(state), axis=-1)
    big = state.alive & (scaling > scene_extent)
    prox_mask = big & (dist > 5.0 * scene_extent)
    split_mask = big & (dist > dist_thres * scene_extent)
    return prox_mask, idx, split_mask


def train_fsgs(dataset, opt, pipe, args):
    from ..viewer import network_gui

    scene = Scene(dataset, sh_degree=dataset.sh_degree)
    cams = scene.getTrainCameras()
    W, H = cams[0].width, cams[0].height

    estimator = get_depth_estimator(
        getattr(args, "depth_estimator", "auto"), dataset.source_path)
    # attach mono depth priors to the camera bank via the invdepth slot
    for c in cams:
        d = estimator.depth_for_camera(c)
        if d is not None:
            c.invdepthmap = d.astype(np.float32)
            c.depth_mask = np.ones_like(d, np.float32)
            c.depth_reliable = True
    bank = CameraBank.from_cameras(cams)

    state = scene.gaussians
    adam = init_adam(state.params)
    lr_scheds = make_lr_schedules(opt, scene.cameras_extent)
    bg = jnp.asarray([1, 1, 1] if dataset.white_background else [0, 0, 0],
                     jnp.float32)

    raster_cfg = default_raster_config(state.capacity, W, H,
                                       getattr(pipe, "max_pairs", 0),
                                       getattr(pipe, "max_per_tile", 0),
                                       getattr(pipe, "tile_batch", 64))
    cfg = FSGSConfig(width=W, height=H, sh_degree=dataset.sh_degree,
                     raster=raster_cfg, lambda_dssim=opt.lambda_dssim,
                     use_pallas=jax.default_backend() not in ("cpu",),
                     use_confidence=bool(getattr(pipe, "use_confidence",
                                                 False)))
    pair_bucket = capacity.PairBucket(raster_cfg.max_pairs)
    compiler = precompile.SpeculativeCompiler(
        precompile.speculation_enabled(), quiet=True)
    shapes_dirty = True

    def rebuild_cfg():
        nonlocal raster_cfg, cfg, shapes_dirty
        raster_cfg = default_raster_config(state.capacity, W, H,
                                           pair_bucket.max_pairs,
                                           getattr(pipe, "max_per_tile", 0),
                                           getattr(pipe, "tile_batch", 64))
        pair_bucket.max_pairs = raster_cfg.max_pairs
        cfg = cfg._replace(raster=raster_cfg)
        shapes_dirty = True

    def speculate(lrs):
        """Background-compile the growth-edge fsgs_steps (precompile.py)."""
        others = precompile.specs_of(
            (bank, jnp.asarray(0, jnp.int32), lrs,
             jnp.asarray(0.0, jnp.float32), jnp.asarray(0, jnp.int32), bg))
        precompile.speculate_growth_edges(
            compiler, state, adam, raster_cfg.max_pairs,
            capacity.PAIR_HARD_CAP,
            cfg_for=lambda c, mp=None: cfg._replace(
                raster=default_raster_config(
                    c, W, H, mp if mp is not None else pair_bucket.max_pairs,
                    getattr(pipe, "max_per_tile", 0),
                    getattr(pipe, "tile_batch", 64))),
            lower_with=lambda s, a, c, n: fsgs_step.lower(
                s, a, *others, c,
                jax.ShapeDtypeStruct((n,), jnp.float32)).compile(),
            mark_current=(state.capacity, cfg))
    # per-Gaussian confidence: ones, carried across densification like the
    # reference (`gaussian_model.py:158,351,402` keeps it all-ones)
    confidence = jnp.ones((state.capacity,), jnp.float32)

    # pseudo poses (reference `scene/__init__.py:83-95`)
    if "360" in dataset.source_path:
        pseudo_cams = generate_random_poses_360(cams, n_poses=1000)
    else:
        pseudo_cams = generate_random_poses_llff(cams, n_poses=1000)
    pseudo_stack = []

    depth_weight = float(opt.depth_weight)
    active_sh = 0
    viewpoint_stack = []
    pair_lag = capacity.LaggedScalar()
    t0 = time.time()
    save_iters = set(args.save_iterations)
    test_iters = set(getattr(args, "test_iterations", None) or [])

    for it in range(1, opt.iterations + 1):
        if it % 500 == 0 and active_sh < dataset.sh_degree:
            active_sh += 1
        if it > opt.end_sample_pseudo:
            depth_weight = 0.001

        if not viewpoint_stack:
            viewpoint_stack = list(range(len(cams)))
        cam_idx = viewpoint_stack.pop(
            random.randint(0, len(viewpoint_stack) - 1))

        lrs = {k: jnp.asarray(f(it), jnp.float32)
               for k, f in lr_scheds.items() if k in state.params}
        if confidence.shape[0] != state.capacity:
            confidence = jnp.ones((state.capacity,), jnp.float32)
        state, adam, metrics = fsgs_step(
            state, adam, bank, jnp.asarray(cam_idx, jnp.int32), lrs,
            jnp.asarray(depth_weight, jnp.float32),
            jnp.asarray(active_sh, jnp.int32), bg, cfg,
            confidence=confidence)
        if shapes_dirty:
            shapes_dirty = False
            speculate(lrs)

        # pseudo-view depth distillation
        if (estimator.available and it % opt.sample_pseudo_interval == 0
                and opt.start_sample_pseudo < it < opt.end_sample_pseudo):
            if not pseudo_stack:
                pseudo_stack = list(pseudo_cams)
            pcam = pseudo_stack.pop(random.randint(0, len(pseudo_stack) - 1))
            pparams = CameraParams(*(jnp.asarray(a) for a in pcam.params()))
            scale = min((it - opt.start_sample_pseudo) / 500.0, 1.0)
            w = scale * opt.depth_pseudo_weight
            if estimator.can_estimate:
                # reference path: mono-depth network scores the render
                img, _ = fsgs_render_pseudo(
                    state, pparams, jnp.asarray(active_sh, jnp.int32), bg,
                    cfg)
                midas = estimator.estimate(np.asarray(img))
                if midas is not None:
                    state, adam, _ = fsgs_pseudo_step(
                        state, adam, pparams, jnp.asarray(midas, jnp.float32),
                        lrs, jnp.asarray(w, jnp.float32),
                        jnp.asarray(active_sh, jnp.int32), bg, cfg)
            else:
                # offline path: warp the nearest train view's precomputed
                # prior into the pseudo view (no wasted render when the
                # provider cannot score novel images)
                pc = np.asarray(pcam.params().cam_center)
                dists = [float(np.linalg.norm(
                    np.asarray(c.params().cam_center) - pc)) for c in cams]
                j = int(np.argmin(dists))
                if float(bank.has_depth[j]) > 0:
                    state, adam, _ = fsgs_warped_pseudo_step(
                        state, adam, bank.camera(jnp.asarray(j, jnp.int32)),
                        bank.invdepth[j], pparams, lrs,
                        jnp.asarray(w, jnp.float32),
                        jnp.asarray(active_sh, jnp.int32), bg, cfg)

        # densification (reference `FSGS/scene/gaussian_model.py:475-482`:
        # clone → split(+dist mask) → proximity until iter 2000 → prune;
        # here the prune happens inside densify_and_prune before proximity —
        # a one-event ordering deviation on the appended midpoints)
        if it < opt.densify_until_iter:
            if (it > opt.densify_from_iter
                    and it % opt.densification_interval == 0):
                state, adam, grew = capacity.ensure_headroom(state, adam)
                if grew:
                    rebuild_cfg()
                prox_mask, nn_idx, extra_split = fsgs_densify_masks(
                    state, scene.cameras_extent,
                    jnp.asarray(getattr(opt, "dist_thres", 10.0)))
                res = densify_and_prune(state, adam, jax.random.PRNGKey(it),
                                        opt.densify_grad_threshold, 0.005,
                                        scene.cameras_extent,
                                        max_screen_size=0,
                                        percent_dense=opt.percent_dense,
                                        extra_split_mask=extra_split)
                state, adam = res.state, res.opt_state
                if capacity.dropped_appends(res, it, state.capacity):
                    state, adam = capacity.grow_state(state, adam)
                    rebuild_cfg()
                if it < getattr(opt, "proximity_until_iter", 2000):
                    # recompute on the post-prune state (compaction moved
                    # slots, so the pre-densify indices are stale)
                    prox_mask, nn_idx, _ = fsgs_densify_masks(
                        state, scene.cameras_extent,
                        jnp.asarray(getattr(opt, "dist_thres", 10.0)))
                    pres = proximity_densify(state, adam, nn_idx, prox_mask)
                    state, adam = pres.state, pres.opt_state
                    if capacity.dropped_appends(pres, it, state.capacity):
                        state, adam = capacity.grow_state(state, adam)
                        rebuild_cfg()
            if (it > opt.start_sample_pseudo
                    and (it - opt.start_sample_pseudo - 1)
                    % opt.opacity_reset_interval == 0):
                state, adam = reset_opacity(state, adam)

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
            # in-training report on test views + a train-view sample, PSNR/
            # SSIM(+LPIPS) on device (reference `FSGS/train.py:210-239`)
            from .loop import evaluate_cameras, format_eval
            for name, vs in (("test", scene.getTestCameras()),
                             ("train", cams[:5])):
                stats = evaluate_cameras(state, vs, bg, active_sh,
                                         raster_cfg, cfg.use_pallas)
                if stats:
                    print(f"\n[ITER {it}] Evaluating {name}: "
                          f"{format_eval(stats)}", flush=True)
        if it in save_iters or it == opt.iterations:
            scene.gaussians = state
            scene.save(it)

    elapsed = time.time() - t0
    print(f"FSGS training took {elapsed:.1f}s "
          f"({opt.iterations / max(elapsed, 1e-9):.2f} it/s)")
    scene.gaussians = state
    return scene
