"""Multi-chip scaling via `jax.sharding` over an ICI mesh.

The reference is single-GPU (SURVEY §5.8 — no distributed backend exists);
this module adds the TPU-native scale-out the rebuild is specified to have:

* **Data parallel (views)**: each device renders a different training view of
  the replicated Gaussian set; per-view losses are averaged, so XLA inserts
  one gradient all-reduce (psum) over ICI. Batch-of-views SGD is the natural
  multi-chip generalisation of the reference's one-view-per-iteration loop.
* **Tile parallel (pixels)**: for large frames, image tiles are sharded
  across devices against replicated Gaussians (image-space decomposition);
  each device rasterises its tile slice and the image is all-gathered
  (`parallel/tiles.py`).

The DP step is the REAL training step: it reuses `train.step.view_losses`
(L1 + SSIM + DWT subbands + ELF-patch DWT + depth), per-image exposure
optimization, sparse-adam visibility masking, and densification statistics —
not a demo subset. Densify/prune events run host-side on the replicated
state exactly as in the single-chip loop (the stats are psum'd by the mean
reduction, and `densify_and_prune` is deterministic, so every replica stays
bit-identical).

Shardings are expressed with `NamedSharding` constraints inside jit — XLA
chooses the collectives; nothing NCCL-like is hand-written.

Semantics vs the sequential reference (documented deviations):
* one DP step with B views == one SGD step on the MEAN of B per-view losses
  (reference does B sequential steps); LRs may need the usual batch scaling.
* the DWT running-mean EMA advances once per step using the mean ratio of
  the batch (reference: once per view).
* densification stats accumulate the SUM of per-view viewspace-gradient
  NORMS and per-view visibility counts — identical to B sequential
  reference iterations (`gaussian_model.py:471-473`), NOT the norm of the
  summed gradient (which cancels across views).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.gaussians import GaussianState
from ..train.densify import add_densification_stats
from ..train.optim import (AdamState, ExposureAdam, adam_update,
                           exposure_adam_update)
from ..train.step import (CameraBank, StepCarry, StepConfig, sh_band_mask,
                          view_losses)


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


class ViewBatch(NamedTuple):
    """One training view per device (leading axis = mesh 'data' axis)."""
    viewmat: jnp.ndarray     # (B, 4, 4)
    full_proj: jnp.ndarray   # (B, 4, 4)
    cam_center: jnp.ndarray  # (B, 3)
    tan_fovx: jnp.ndarray    # (B,)
    tan_fovy: jnp.ndarray    # (B,)
    gt: jnp.ndarray          # (B, H, W, C)
    alpha_mask: jnp.ndarray  # (B, H, W, 1)
    invdepth: jnp.ndarray    # (B, H, W)
    depth_mask: jnp.ndarray  # (B, H, W)
    has_depth: jnp.ndarray   # (B,)
    cam_idx: jnp.ndarray     # (B,) int32 — exposure row per view

    @classmethod
    def gather(cls, bank: CameraBank, idxs):
        idxs = jnp.asarray(idxs, jnp.int32)
        return cls(viewmat=bank.viewmat[idxs], full_proj=bank.full_proj[idxs],
                   cam_center=bank.cam_center[idxs],
                   tan_fovx=bank.tan_fovx[idxs],
                   tan_fovy=bank.tan_fovy[idxs], gt=bank.gt[idxs],
                   alpha_mask=bank.alpha_mask[idxs],
                   invdepth=bank.invdepth[idxs],
                   depth_mask=bank.depth_mask[idxs],
                   has_depth=bank.has_depth[idxs],
                   cam_idx=idxs)


def shard_batch(batch: ViewBatch, mesh: Mesh, axis: str = "data"):
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda a: jax.device_put(a, sh), batch)


def replicate(tree, mesh: Mesh):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)


def add_densification_stats_batch(state: GaussianState, go, radii,
                                  width: int, height: int) -> GaussianState:
    """Per-VIEW gradient norms summed (go: (B, CAP, 2), radii: (B, CAP)).

    Matches B sequential reference iterations; summing gradient VECTORS
    before the norm would cancel across views and understate the stat."""
    scale = jnp.array([width * 0.5, height * 0.5], jnp.float32)
    g = jnp.linalg.norm(go[..., :2] * scale, axis=-1)       # (B, CAP)
    visible = radii > 0                                      # (B, CAP)
    g = jnp.where(visible, g, 0.0).sum(axis=0)
    return state._replace(
        xyz_gradient_accum=state.xyz_gradient_accum + g,
        denom=state.denom + visible.astype(jnp.float32).sum(axis=0),
        max_radii2d=jnp.maximum(state.max_radii2d,
                                jnp.where(visible, radii, 0.0)
                                .astype(jnp.float32).max(axis=0)),
    )


def build_dp_train_step(cfg: StepConfig, mesh: Mesh, axis: str = "data"):
    """Returns a jitted DP step:
      (state, adam, exp_adam, carry, batch, lrs, exposure_lr, depth_weight,
       active_degree, bg) → (state, adam, exp_adam, carry, metrics).
    Gaussians replicated; views sharded on `axis`; the mean over views makes
    XLA psum the parameter gradients over ICI."""

    batch_sharding = jax.tree.map(
        lambda _: NamedSharding(mesh, P(axis)),
        ViewBatch(*(0,) * len(ViewBatch._fields)))

    from ..data.cameras import CameraParams

    def step(state: GaussianState, adam: AdamState, exp_adam: ExposureAdam,
             carry: StepCarry, batch: ViewBatch, lrs: dict, exposure_lr,
             depth_weight, active_degree, bg):
        band = sh_band_mask(active_degree, cfg.sh_degree)
        alive_f = state.alive.astype(jnp.float32)
        B = batch.gt.shape[0]

        def loss_fn(params, exposure, offsets):
            p = dict(params)
            p["features_rest"] = params["features_rest"] * band[1:][None]

            def one(off, view):
                cam = CameraParams(
                    viewmat=view.viewmat, full_proj=view.full_proj,
                    cam_center=view.cam_center, tan_fovx=view.tan_fovx,
                    tan_fovy=view.tan_fovy)
                exposure_mat = exposure[jnp.minimum(view.cam_idx,
                                                    exposure.shape[0] - 1)]
                loss, metrics, new_running = view_losses(
                    p, alive_f, exposure_mat, cam, view.gt, view.alpha_mask,
                    view.invdepth, view.depth_mask, view.has_depth, bg,
                    depth_weight, carry.dwt_running_mean, cfg, off)
                return loss, (metrics, new_running)

            losses, (metrics, new_running) = jax.vmap(one)(offsets, batch)
            return losses.mean(), (metrics, new_running.mean())

        offsets = jnp.zeros((B, state.capacity, 2))
        grad_fn = jax.grad(loss_fn, argnums=(0, 1, 2), has_aux=True)
        (gp, ge, go), (metrics, new_running) = grad_fn(
            state.params, state.exposure, offsets)

        radii = metrics.pop("radii")                         # (B, CAP)
        visibility = ((radii > 0).any(axis=0) if cfg.sparse_adam else None)
        new_params, new_adam = adam_update(state.params, gp, adam, lrs,
                                           visibility=visibility)
        new_exposure, new_exp_adam = exposure_adam_update(
            state.exposure, ge, exp_adam, exposure_lr)

        new_state = state._replace(params=new_params, exposure=new_exposure)
        new_state = add_densification_stats_batch(new_state, go, radii,
                                                  cfg.width, cfg.height)
        out_metrics = {k: v.mean() for k, v in metrics.items()
                       if k != "n_pairs"}
        out_metrics["n_pairs"] = metrics["n_pairs"].max()
        return (new_state, new_adam, new_exp_adam,
                StepCarry(dwt_running_mean=new_running), out_metrics)

    return jax.jit(
        step,
        in_shardings=(None, None, None, None, batch_sharding,
                      None, None, None, None, None))
