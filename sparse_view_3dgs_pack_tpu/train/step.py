"""The jitted train step for the 3DGS / LGDWT-GS family.

One XLA program per iteration: render → losses (L1 + SSIM + DWT subbands +
ELF-patch DWT + depth) → grad → per-group Adam + exposure Adam →
densification statistics. The host loop only samples cameras, evaluates LR
schedules, and fires densify/reset/save events (reference hot loop
`LGDWT-GS/train.py:81-292`).

Dynamic-but-traced quantities: camera index, LRs, depth-loss weight, active
SH degree (as a coefficient band mask, so growing the degree doesn't
recompile), the DWT running-mean carry, background color. Static: image
size, raster buckets, loss toggles, method weights.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.cameras import CameraParams
from ..losses.depth import depth_l1_loss
from ..losses.dwt import (compute_elf_map, compute_patch_dwt_loss,
                          dwt_subband_loss)
from ..losses.photometric import l1_loss
from ..losses.ssim import ssim
from ..models.gaussians import GaussianState
from ..ops.rasterize_tiles import RasterConfig
from ..renderer import render_core
from .densify import add_densification_stats
from .optim import (AdamState, ExposureAdam, adam_update,
                    exposure_adam_update)


class CameraBank(NamedTuple):
    """All training views stacked on device; the step indexes it by cam_idx."""
    viewmat: jnp.ndarray      # (N, 4, 4)
    full_proj: jnp.ndarray    # (N, 4, 4)
    cam_center: jnp.ndarray   # (N, 3)
    tan_fovx: jnp.ndarray     # (N,)
    tan_fovy: jnp.ndarray     # (N,)
    gt: jnp.ndarray           # (N, H, W, C)
    alpha_mask: jnp.ndarray   # (N, H, W, 1)
    invdepth: jnp.ndarray     # (N, H, W)
    depth_mask: jnp.ndarray   # (N, H, W)
    has_depth: jnp.ndarray    # (N,) float32
    nir: jnp.ndarray          # (N, H, W) or (N, 1, 1) dummy

    @classmethod
    def from_cameras(cls, cams, channels=3):
        H, W = cams[0].height, cams[0].width
        n = len(cams)
        gt = np.zeros((n, H, W, channels), np.float32)
        am = np.ones((n, H, W, 1), np.float32)
        inv = np.zeros((n, H, W), np.float32)
        dm = np.zeros((n, H, W), np.float32)
        hd = np.zeros((n,), np.float32)
        any_nir = any(c.nir is not None for c in cams)
        nir = np.zeros((n, H, W) if any_nir else (n, 1, 1), np.float32)
        vm = np.zeros((n, 4, 4), np.float32)
        fp = np.zeros((n, 4, 4), np.float32)
        cc = np.zeros((n, 3), np.float32)
        tx = np.zeros((n,), np.float32)
        ty = np.zeros((n,), np.float32)
        for i, c in enumerate(cams):
            p = c.params()
            vm[i], fp[i], cc[i] = p.viewmat, p.full_proj, p.cam_center
            tx[i], ty[i] = p.tan_fovx, p.tan_fovy
            if c.image is not None:
                gt[i] = c.image[..., :channels]
            if c.alpha_mask is not None:
                am[i, ..., 0] = c.alpha_mask
            if c.invdepthmap is not None and c.depth_reliable:
                inv[i] = c.invdepthmap
                dm[i] = c.depth_mask if c.depth_mask is not None else 1.0
                hd[i] = 1.0
            if any_nir and c.nir is not None:
                nir[i] = c.nir
        return cls(*(jnp.asarray(a) for a in
                     (vm, fp, cc, tx, ty, gt, am, inv, dm, hd, nir)))

    def camera(self, idx) -> CameraParams:
        return CameraParams(viewmat=self.viewmat[idx],
                            full_proj=self.full_proj[idx],
                            cam_center=self.cam_center[idx],
                            tan_fovx=self.tan_fovx[idx],
                            tan_fovy=self.tan_fovy[idx])


class StepConfig(NamedTuple):
    """Static per-compile config (hashable)."""
    width: int
    height: int
    channels: int = 3
    sh_degree: int = 3
    raster: RasterConfig = RasterConfig()
    lambda_dssim: float = 0.2
    antialiasing: bool = False
    train_test_exp: bool = False
    sparse_adam: bool = False
    use_pallas: bool = False   # Pallas fwd+bwd kernels (TPU hot path)
    # LGDWT: global DWT subband loss
    dwt_enable: bool = False
    dwt_weights: tuple = (1.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0)  # LL1..HH2
    # LGDWT: ELF patch DWT loss
    patch_dwt_enable: bool = False
    patch_dwt_weight: float = 0.1
    patch_size: int = 128
    patch_percentile: float = 0.2
    patch_dwt_lh1_weight: float = 1.0
    patch_dwt_hl1_weight: float = 1.0


class StepCarry(NamedTuple):
    dwt_running_mean: jnp.ndarray  # () — reference train.py:77,190-198


class StepOut(NamedTuple):
    state: GaussianState
    adam: AdamState
    exp_adam: ExposureAdam
    carry: StepCarry
    metrics: dict


def sh_band_mask(active_degree, max_degree: int):
    """(K, 1) mask of SH coefficients for bands ≤ active_degree (traced)."""
    K = (max_degree + 1) ** 2
    idx = jnp.arange(K)
    band = jnp.floor(jnp.sqrt(idx.astype(jnp.float32))).astype(jnp.int32)
    return (band <= active_degree).astype(jnp.float32)[:, None]


_DWT_KEYS = ("ll1", "lh1", "hl1", "hh1", "ll2", "lh2", "hl2", "hh2")


def view_losses(p, alive_f, exposure_mat, cam: CameraParams, gt, alpha_mask,
                mono_invdepth, depth_mask, has_depth, bg_color, depth_weight,
                dwt_running_mean, cfg: StepConfig, offset):
    """Full per-view training loss for the 3DGS/LGDWT family.

    `p` must already carry the SH band mask. Returns (loss, metrics,
    new_running) — shared verbatim between the single-view `train_step` and
    the multi-chip DP step (`parallel/dp.py`), so DP trains the REAL
    objective, not a demo subset."""
    res = render_core(
        p, alive_f, exposure_mat, cam, cfg.width, cfg.height, bg_color,
        sh_degree_active=cfg.sh_degree, config=cfg.raster,
        antialiasing=cfg.antialiasing,
        use_trained_exp=cfg.train_test_exp,
        viewspace_offset=offset, use_pallas=cfg.use_pallas)
    image = res.render * alpha_mask

    ll1 = l1_loss(image, gt)
    ssim_value = ssim(image, gt)
    base = (1.0 - cfg.lambda_dssim) * ll1 + cfg.lambda_dssim * (
        1.0 - ssim_value)

    metrics = {"l1": ll1, "ssim": ssim_value, "n_pairs": res.n_pairs,
               "radii": res.radii}

    loss = base
    new_running = dwt_running_mean
    if cfg.dwt_enable:
        weights = {k + "_weight": w
                   for k, w in zip(_DWT_KEYS, cfg.dwt_weights)}
        dwt_loss, _ = dwt_subband_loss(image, gt, weights)
        ratio = jax.lax.stop_gradient(base) / (
            jax.lax.stop_gradient(dwt_loss) + 1e-8)
        new_running = 0.95 * dwt_running_mean + 0.05 * ratio
        dwt_scale = jnp.clip(new_running, 0.1, 10.0)
        loss = loss + jax.lax.stop_gradient(dwt_scale) * dwt_loss
        metrics["dwt"] = dwt_loss
        metrics["dwt_scale"] = dwt_scale

    if cfg.patch_dwt_enable:
        elf = compute_elf_map(gt)
        patch_loss = compute_patch_dwt_loss(
            image, gt, elf, patch_size=cfg.patch_size,
            percentile=cfg.patch_percentile,
            lh1_weight=cfg.patch_dwt_lh1_weight,
            hl1_weight=cfg.patch_dwt_hl1_weight)
        loss = loss + cfg.patch_dwt_weight * patch_loss
        metrics["patch_dwt"] = patch_loss

    depth_term = depth_l1_loss(res.depth, mono_invdepth, depth_mask)
    loss = loss + depth_weight * has_depth * depth_term
    metrics["depth_l1"] = depth_term * has_depth

    metrics["loss"] = loss
    return loss, metrics, new_running


@partial(jax.jit, static_argnames=("cfg",))
def train_step(state: GaussianState, adam: AdamState,
               exp_adam: ExposureAdam, carry: StepCarry, bank: CameraBank,
               cam_idx, lrs: dict, exposure_lr, depth_weight, active_degree,
               bg_color, cfg: StepConfig) -> StepOut:
    cam = bank.camera(cam_idx)
    gt = bank.gt[cam_idx]
    alpha_mask = bank.alpha_mask[cam_idx]
    mono_invdepth = bank.invdepth[cam_idx]
    depth_mask = bank.depth_mask[cam_idx]
    has_depth = bank.has_depth[cam_idx]

    band_mask = sh_band_mask(active_degree, cfg.sh_degree)  # (K,1)
    cap = state.capacity
    alive_f = state.alive.astype(jnp.float32)

    def loss_fn(params, exposure, offset):
        p = dict(params)
        # active-degree masking of higher SH bands (zero coeff == truncated
        # eval; also zeroes their gradients)
        p["features_rest"] = params["features_rest"] * band_mask[1:][None]
        exposure_mat = exposure[jnp.minimum(cam_idx,
                                            exposure.shape[0] - 1)]
        loss, metrics, new_running = view_losses(
            p, alive_f, exposure_mat, cam, gt, alpha_mask, mono_invdepth,
            depth_mask, has_depth, bg_color, depth_weight,
            carry.dwt_running_mean, cfg, offset)
        return loss, (metrics, new_running)

    offset0 = jnp.zeros((cap, 2), jnp.float32)
    grad_fn = jax.grad(loss_fn, argnums=(0, 1, 2), has_aux=True)
    (g_params, g_exposure, g_offset), (metrics, new_running) = grad_fn(
        state.params, state.exposure, offset0)

    radii = metrics.pop("radii")
    visibility = (radii > 0) if cfg.sparse_adam else None
    new_params, new_adam = adam_update(state.params, g_params, adam, lrs,
                                       visibility=visibility)
    new_exposure, new_exp_adam = exposure_adam_update(
        state.exposure, g_exposure, exp_adam, exposure_lr)

    new_state = state._replace(params=new_params, exposure=new_exposure)
    new_state = add_densification_stats(new_state, g_offset, radii,
                                        cfg.width, cfg.height)
    return StepOut(state=new_state, adam=new_adam, exp_adam=new_exp_adam,
                   carry=StepCarry(dwt_running_mean=new_running),
                   metrics=metrics)
