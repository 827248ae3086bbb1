"""mult-dwtgs multispectral RGB+NIR training (reference
`mult-dwtgs/train_nir.py:32-151`).

RGB follows the LGDWT step (L1 + SSIM + DWT terms); the NIR pass re-renders
the same Gaussians with per-Gaussian NIR albedo·gain as the color payload and
adds `nir_weight · combined_nir_loss` (L1 + 0.2·SSIM on the single channel).
Unlike the reference — which tiles the albedo to 3 channels to satisfy the
CUDA NUM_CHANNELS=3 rasterizer and keeps channel 0
(`mult-dwtgs/gaussian_renderer/__init__.py:185-258`) — the TPU rasterizer is
channel-generic and renders C=1 natively.
"""

from __future__ import annotations

import random
import time
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..losses.nir import combined_nir_loss
from ..losses.photometric import l1_loss
from ..losses.ssim import ssim
from ..losses.dwt import (compute_elf_map, compute_patch_dwt_loss,
                          dwt_subband_loss)
from ..ops.rasterize_tiles import RasterConfig
from ..renderer import default_raster_config, render_core
from ..scene import Scene
from . import capacity
from . import precompile
from . import debug
from .densify import add_densification_stats, densify_and_prune, reset_opacity
from .optim import adam_update, init_adam, make_lr_schedules
from .step import CameraBank, StepConfig, sh_band_mask, _DWT_KEYS


class NIRConfig(NamedTuple):
    base: StepConfig
    nir_weight: float = 0.5


@partial(jax.jit, static_argnames=("cfg",))
def nir_step(state, adam, carry_dwt, bank: CameraBank, cam_idx, lrs,
             active_degree, bg, cfg: NIRConfig):
    b = cfg.base
    cam = bank.camera(cam_idx)
    gt = bank.gt[cam_idx]
    alpha_mask = bank.alpha_mask[cam_idx]
    nir_gt = bank.nir[cam_idx]
    band = sh_band_mask(active_degree, b.sh_degree)
    alive_f = state.alive.astype(jnp.float32)
    cap = state.capacity

    def loss_fn(params, offset):
        p = dict(params)
        p["features_rest"] = params["features_rest"] * band[1:][None]
        res = render_core(p, alive_f, jnp.eye(3, 4), cam, b.width, b.height,
                          bg, sh_degree_active=b.sh_degree, config=b.raster,
                          viewspace_offset=offset, use_pallas=b.use_pallas)
        image = res.render * alpha_mask
        ll1 = l1_loss(image, gt)
        loss = ((1.0 - b.lambda_dssim) * ll1
                + b.lambda_dssim * (1.0 - ssim(image, gt)))

        new_running = carry_dwt
        if b.dwt_enable:
            weights = {k + "_weight": w
                       for k, w in zip(_DWT_KEYS, b.dwt_weights)}
            dwt_loss, _ = dwt_subband_loss(image, gt, weights)
            ratio = jax.lax.stop_gradient(loss) / (
                jax.lax.stop_gradient(dwt_loss) + 1e-8)
            new_running = 0.95 * carry_dwt + 0.05 * ratio
            loss = loss + jax.lax.stop_gradient(
                jnp.clip(new_running, 0.1, 10.0)) * dwt_loss
        if b.patch_dwt_enable:
            elf = compute_elf_map(gt)
            loss = loss + b.patch_dwt_weight * compute_patch_dwt_loss(
                image, gt, elf, patch_size=b.patch_size,
                percentile=b.patch_percentile,
                lh1_weight=b.patch_dwt_lh1_weight,
                hl1_weight=b.patch_dwt_hl1_weight)

        # NIR pass: 1-channel render with albedo·gain as payload
        nir_colors = (jax.nn.sigmoid(params["nir_albedo"])
                      * params["nir_gain"][0])        # (CAP, 1)
        nres = render_core(p, alive_f, jnp.eye(3, 4), cam, b.width, b.height,
                           jnp.zeros((1,)), sh_degree_active=b.sh_degree,
                           config=b.raster, override_color=nir_colors,
                           use_pallas=b.use_pallas)
        nir_pred = nres.render[..., 0] * alpha_mask[..., 0]
        nloss = combined_nir_loss(nir_pred, nir_gt)
        loss = loss + cfg.nir_weight * nloss

        return loss, {"loss": loss, "l1": ll1, "nir": nloss,
                      "radii": res.radii, "n_pairs": res.n_pairs,
                      "carry": new_running}

    offset0 = jnp.zeros((cap, 2), jnp.float32)
    (gp, go), metrics = jax.grad(loss_fn, argnums=(0, 1), has_aux=True)(
        state.params, offset0)
    radii = metrics.pop("radii")
    carry = metrics.pop("carry")
    new_params, adam = adam_update(state.params, gp, adam, lrs)
    state = state._replace(params=new_params)
    state = add_densification_stats(state, go, radii, b.width, b.height)
    return state, adam, carry, metrics


def train_nir(dataset, opt, pipe, args):
    scene = Scene(dataset, sh_degree=dataset.sh_degree, use_nir=True)
    cams = scene.getTrainCameras()
    W, H = cams[0].width, cams[0].height
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
    base = StepConfig(
        width=W, height=H, sh_degree=dataset.sh_degree, raster=raster_cfg,
        lambda_dssim=opt.lambda_dssim,
        use_pallas=jax.default_backend() not in ("cpu",),
        dwt_enable=getattr(opt, "dwt_enable", True),
        dwt_weights=(opt.dwt_ll1_weight, opt.dwt_lh1_weight,
                     opt.dwt_hl1_weight, opt.dwt_hh1_weight,
                     opt.dwt_ll2_weight, opt.dwt_lh2_weight,
                     opt.dwt_hl2_weight, opt.dwt_hh2_weight),
        patch_dwt_enable=getattr(opt, "patch_dwt_enable", True),
        patch_dwt_weight=opt.patch_dwt_weight, patch_size=opt.patch_size,
        patch_percentile=opt.patch_percentile,
        patch_dwt_lh1_weight=opt.patch_dwt_lh1_weight,
        patch_dwt_hl1_weight=opt.patch_dwt_hl1_weight)
    cfg = NIRConfig(base=base, nir_weight=getattr(args, "nir_weight", 0.5))
    pair_bucket = capacity.PairBucket(raster_cfg.max_pairs)
    compiler = precompile.SpeculativeCompiler(
        precompile.speculation_enabled(), quiet=True)
    shapes_dirty = True

    def rebuild_cfg():
        nonlocal raster_cfg, base, cfg, shapes_dirty
        raster_cfg = default_raster_config(state.capacity, W, H,
                                           pair_bucket.max_pairs,
                                           getattr(pipe, "max_per_tile", 0),
                                           getattr(pipe, "tile_batch", 64))
        pair_bucket.max_pairs = raster_cfg.max_pairs
        base = base._replace(raster=raster_cfg)
        cfg = cfg._replace(base=base)
        shapes_dirty = True

    def speculate(carry, lrs):
        """Background-compile the growth-edge nir_steps (precompile.py)."""
        others = precompile.specs_of(
            (carry, bank, jnp.asarray(0, jnp.int32), lrs,
             jnp.asarray(0, jnp.int32), bg))
        precompile.speculate_growth_edges(
            compiler, state, adam, raster_cfg.max_pairs,
            capacity.PAIR_HARD_CAP,
            cfg_for=lambda c, mp=None: cfg._replace(base=base._replace(
                raster=default_raster_config(
                    c, W, H, mp if mp is not None else pair_bucket.max_pairs,
                    getattr(pipe, "max_per_tile", 0),
                    getattr(pipe, "tile_batch", 64)))),
            lower_with=lambda s, a, c, n: nir_step.lower(
                s, a, *others, c).compile(),
            mark_current=(state.capacity, cfg))

    carry = jnp.ones(())
    active_sh = 0
    viewpoint_stack = []
    pair_lag = capacity.LaggedScalar()
    save_iters = set(args.save_iterations)
    t0 = time.time()

    for it in range(1, opt.iterations + 1):
        if it % 1000 == 0 and active_sh < dataset.sh_degree:
            active_sh += 1
        if not viewpoint_stack:
            viewpoint_stack = list(range(len(cams)))
        cam_idx = viewpoint_stack.pop(
            random.randint(0, len(viewpoint_stack) - 1))
        lrs = {k: jnp.asarray(f(it), jnp.float32)
               for k, f in lr_scheds.items() if k in state.params}
        state, adam, carry, metrics = nir_step(
            state, adam, carry, bank, jnp.asarray(cam_idx, jnp.int32), lrs,
            jnp.asarray(active_sh, jnp.int32), bg, cfg)
        if shapes_dirty:
            shapes_dirty = False
            speculate(carry, lrs)

        if it < opt.densify_until_iter:
            if (it > opt.densify_from_iter
                    and it % opt.densification_interval == 0):
                state, adam, grew = capacity.ensure_headroom(state, adam)
                if grew:
                    rebuild_cfg()
                res = densify_and_prune(state, adam, jax.random.PRNGKey(it),
                                        opt.densify_grad_threshold, 0.005,
                                        scene.cameras_extent,
                                        max_screen_size=(
                                            20 if it > opt.opacity_reset_interval
                                            else 0),
                                        percent_dense=opt.percent_dense)
                state, adam = res.state, res.opt_state
                if capacity.dropped_appends(res, it, state.capacity):
                    state, adam = capacity.grow_state(state, adam)
                    rebuild_cfg()
            if it % opt.opacity_reset_interval == 0:
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
                  f"{float(metrics['loss']):.5f} "
                  f"nir={float(metrics['nir']):.5f}", flush=True)
        if it in save_iters or it == opt.iterations:
            scene.gaussians = state
            scene.save(it)

    elapsed = time.time() - t0
    print(f"mult-dwtgs training took {elapsed:.1f}s "
          f"({opt.iterations / max(elapsed, 1e-9):.2f} it/s)")
    scene.gaussians = state
    return scene
