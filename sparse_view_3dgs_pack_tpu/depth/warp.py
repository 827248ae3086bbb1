"""Pseudo-view depth priors without an in-loop mono-depth network.

The reference runs MiDaS on every rendered pseudo view
(`FSGS/train.py:116-131`, `FSGS/utils/depth_utils.py:14`) — impossible in an
offline deployment. The faithful substitute implemented here WARPS the
nearest train view's precomputed mono prior into the pseudo view:

1. the train view's relative prior is affine-aligned to metric inverse depth
   against that view's RENDERED inverse depth (least squares, the same
   scale/offset model as `make_depth_scale.py:8-50`);
2. the resulting metric depth is unprojected to world points and re-projected
   into the pseudo camera with a z-buffer scatter-min;
3. the pseudo distillation step then applies the Pearson loss on covered
   pixels only.

All steps are jitted; the z-buffer scatter is deterministic (min-reduce).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..data.cameras import CameraParams
from ..ops.projection import NEAR_CULL_Z, ndc2pix


def fit_inv_affine(prior, rendered_inv, mask):
    """Least-squares (a, b): a·prior + b ≈ rendered_inv over mask."""
    w = mask.astype(jnp.float32)
    n = jnp.maximum(w.sum(), 1.0)
    mx = (prior * w).sum() / n
    my = (rendered_inv * w).sum() / n
    cov = ((prior - mx) * (rendered_inv - my) * w).sum() / n
    var = ((prior - mx) ** 2 * w).sum() / n
    a = cov / jnp.maximum(var, 1e-12)
    b = my - a * mx
    return a, b


@partial(jax.jit, static_argnames=("width", "height"))
def warp_depth(z_src, src_valid, src_cam: CameraParams,
               dst_cam: CameraParams, width: int, height: int):
    """Forward-warp per-pixel metric depth z_src (H, W) from src_cam into
    dst_cam → (warped_z (H, W), valid (H, W) bool). Splat conflicts resolve
    to the nearest surface (z-buffer min)."""
    H, W = height, width
    u = jnp.arange(W, dtype=jnp.float32)[None, :]
    v = jnp.arange(H, dtype=jnp.float32)[:, None]
    # invert ndc2pix(v, S) = ((v+1)·S − 1)/2 → ndc = (2·pix + 1)/S − 1
    ndc_x = (2.0 * u + 1.0) / W - 1.0
    ndc_y = (2.0 * v + 1.0) / H - 1.0
    z = z_src
    x_cam = ndc_x * src_cam.tan_fovx * z
    y_cam = ndc_y * src_cam.tan_fovy * z
    cam_pts = jnp.stack([jnp.broadcast_to(x_cam, (H, W)),
                         jnp.broadcast_to(y_cam, (H, W)),
                         jnp.broadcast_to(z, (H, W)),
                         jnp.ones((H, W))], axis=-1).reshape(-1, 4)
    world = cam_pts @ jnp.linalg.inv(src_cam.viewmat).T       # (HW, 4)

    p_hom = world @ dst_cam.full_proj.T
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    ndc = p_hom[:, :3] * p_w[:, None]
    px = ndc2pix(ndc[:, 0], W)
    py = ndc2pix(ndc[:, 1], H)
    # destination depth = z in dst camera frame
    z_dst = (world @ dst_cam.viewmat.T)[:, 2]

    iu = jnp.round(px).astype(jnp.int32)
    iv = jnp.round(py).astype(jnp.int32)
    ok = (src_valid.reshape(-1) & (z_dst > NEAR_CULL_Z)
          & (iu >= 0) & (iu < W) & (iv >= 0) & (iv < H))
    flat = jnp.where(ok, iv * W + iu, H * W)
    zbuf = jnp.full((H * W + 1,), jnp.inf).at[flat].min(
        jnp.where(ok, z_dst, jnp.inf), mode="drop")[:H * W]
    valid = jnp.isfinite(zbuf)
    return jnp.where(valid, zbuf, 0.0).reshape(H, W), valid.reshape(H, W)


def metric_depth_from_prior(prior, rendered_invdepth, rendered_alpha):
    """Affine-align a relative mono prior to the rendered inverse depth →
    (metric z (H, W), valid mask)."""
    mask = (rendered_alpha > 0.5) & (rendered_invdepth > 1e-6)
    a, b = fit_inv_affine(prior, rendered_invdepth, mask)
    inv = a * prior + b
    valid = mask & (inv > 1e-6)
    return 1.0 / jnp.maximum(inv, 1e-6), valid
