"""Gaussian preprocess: projection, EWA cov2D, conic, radius, SH color.

Pure-JAX, batched over all Gaussians (embarrassingly parallel; XLA fuses this
whole stage). Numerics follow the reference CUDA preprocess
(`gaussian-splatting/submodules/diff-gaussian-rasterization/cuda_rasterizer/forward.cu:74-260`):
1.3·tan_fov frustum clamp in the Jacobian, +0.3 pixel dilation, optional
antialiasing opacity rescale sqrt(det/det_dilated), 3σ radius from the larger
eigenvalue, near-cull at z ≤ 0.2.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..utils.general import build_scaling_rotation
from ..utils.sh import eval_sh

NEAR_CULL_Z = 0.2
DILATION = 0.3


class Projected(NamedTuple):
    means2d: jnp.ndarray    # (P, 2) pixel coords
    depths: jnp.ndarray     # (P,) camera z
    radii: jnp.ndarray      # (P,) int32 pixel radius (0 = culled)
    conics: jnp.ndarray     # (P, 3) inverse 2D covariance (a, b, c)
    colors: jnp.ndarray     # (P, C)
    opacities: jnp.ndarray  # (P,) after optional antialias scaling
    # (P, 2) int32 per-axis binning rect radius — the AABB of the
    # alpha >= 1/255 level-set ellipse, clamped to the 3σ square. Strictly
    # tighter than `radii` with term-identical render output (see
    # project_gaussians); `radii` keeps the reference's 3σ semantics for
    # densification stats / the visibility filter.
    rect_radii: jnp.ndarray = None


def compute_cov3d(scales, quats, scale_modifier=1.0):
    """Σ = (R S)(R S)ᵀ packed as (P, 6) upper-triangular [xx,xy,xz,yy,yz,zz].

    Flat (P,)-vector arithmetic (no per-point 3×3 matmuls): Σ_ik =
    Σ_j R_ij R_kj s_j²."""
    # +1e-24 inside the sqrt: finite gradient at q=0 (see build_rotation)
    q = quats / jnp.maximum(
        jnp.sqrt(jnp.sum(quats * quats, axis=-1, keepdims=True) + 1e-24),
        1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = [
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ]
    s2 = (scale_modifier * scales) ** 2  # (P, 3)

    def sig(i, k):
        return (R[i][0] * R[k][0] * s2[..., 0]
                + R[i][1] * R[k][1] * s2[..., 1]
                + R[i][2] * R[k][2] * s2[..., 2])

    return jnp.stack([sig(0, 0), sig(0, 1), sig(0, 2),
                      sig(1, 1), sig(1, 2), sig(2, 2)], -1)


def _cov2d(p_view, cov3d, viewmat, focal_x, focal_y, tan_fovx, tan_fovy):
    """EWA projection of 3D covariance to screen space. p_view: (P,3).

    Written as flat (P,)-vector arithmetic rather than batched (P,2,3)
    einsums — tiny per-point matmuls lower poorly on TPU, and this form is a
    handful of fused VPU ops."""
    tz = p_view[:, 2]
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    tx = jnp.clip(p_view[:, 0] / tz, -limx, limx) * tz
    ty = jnp.clip(p_view[:, 1] / tz, -limy, limy) * tz

    inv_z = 1.0 / tz
    # J rows: jx = [fx/z, 0, -fx·tx/z²], jy = [0, fy/z, -fy·ty/z²]
    jx0 = focal_x * inv_z
    jx2 = -focal_x * tx * inv_z * inv_z
    jy1 = focal_y * inv_z
    jy2 = -focal_y * ty * inv_z * inv_z

    W = viewmat[:3, :3]  # world→cam rotation (static per call)
    # rows of T = J @ W, as (P,) components
    t0 = [jx0 * W[0, k] + jx2 * W[2, k] for k in range(3)]
    t1 = [jy1 * W[1, k] + jy2 * W[2, k] for k in range(3)]

    c00, c01, c02 = cov3d[:, 0], cov3d[:, 1], cov3d[:, 2]
    c11, c12, c22 = cov3d[:, 3], cov3d[:, 4], cov3d[:, 5]

    def sigma_dot(a, b):
        """aᵀ Σ b with packed symmetric Σ."""
        return (a[0] * (c00 * b[0] + c01 * b[1] + c02 * b[2])
                + a[1] * (c01 * b[0] + c11 * b[1] + c12 * b[2])
                + a[2] * (c02 * b[0] + c12 * b[1] + c22 * b[2]))

    return sigma_dot(t0, t0), sigma_dot(t0, t1), sigma_dot(t1, t1)


def ndc2pix(v, size):
    return ((v + 1.0) * size - 1.0) * 0.5


def project_gaussians(
    means3d: jnp.ndarray,          # (P, 3)
    scales: jnp.ndarray,           # (P, 3) activated (exp applied)
    quats: jnp.ndarray,            # (P, 4)
    opacities: jnp.ndarray,        # (P,) activated (sigmoid applied)
    viewmat: jnp.ndarray,          # (4, 4) world→cam
    full_proj: jnp.ndarray,        # (4, 4) world→clip
    cam_center: jnp.ndarray,       # (3,)
    tan_fovx, tan_fovy,
    width: int, height: int,
    sh: Optional[jnp.ndarray] = None,        # (P, K, C)
    sh_degree: int = 0,
    colors_precomp: Optional[jnp.ndarray] = None,  # (P, C)
    cov3d_precomp: Optional[jnp.ndarray] = None,   # (P, 6)
    scale_modifier: float = 1.0,
    antialiasing: bool = False,
) -> Projected:
    P = means3d.shape[0]
    focal_x = width / (2.0 * tan_fovx)
    focal_y = height / (2.0 * tan_fovy)

    ones = jnp.ones((P, 1), means3d.dtype)
    homog = jnp.concatenate([means3d, ones], axis=1)
    p_view = homog @ viewmat.T            # (P, 4)
    p_hom = homog @ full_proj.T           # (P, 4)
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    p_proj = p_hom[:, :3] * p_w[:, None]

    in_front = p_view[:, 2] > NEAR_CULL_Z
    safe_z = jnp.where(in_front, p_view[:, 2], 1.0)
    p_view_safe = p_view[:, :3].at[:, 2].set(safe_z)

    if cov3d_precomp is not None:
        cov3d = cov3d_precomp
    else:
        cov3d = compute_cov3d(scales, quats, scale_modifier)
    cxx, cxy, cyy = _cov2d(p_view_safe, cov3d, viewmat,
                           focal_x, focal_y, tan_fovx, tan_fovy)

    det_cov = cxx * cyy - cxy * cxy
    cxx_d = cxx + DILATION
    cyy_d = cyy + DILATION
    det_dil = cxx_d * cyy_d - cxy * cxy
    if antialiasing:
        h_scale = jnp.sqrt(jnp.maximum(2.5e-5, det_cov / det_dil))
    else:
        h_scale = jnp.ones_like(det_cov)

    valid = in_front & (det_dil != 0.0)
    det_inv = 1.0 / jnp.where(det_dil == 0, 1.0, det_dil)
    conics = jnp.stack([cyy_d * det_inv, -cxy * det_inv, cxx_d * det_inv], -1)

    mid = 0.5 * (cxx_d + cyy_d)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det_dil))
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(mid + disc, mid - disc)))

    means2d = jnp.stack([ndc2pix(p_proj[:, 0], width),
                         ndc2pix(p_proj[:, 1], height)], -1)

    # cull Gaussians whose tile rect is empty (reference getRect semantics)
    grid_x = (width + 15) // 16
    grid_y = (height + 15) // 16
    rect_min_x = jnp.clip(((means2d[:, 0] - radius) / 16).astype(jnp.int32), 0, grid_x)
    rect_max_x = jnp.clip(((means2d[:, 0] + radius + 15) / 16).astype(jnp.int32), 0, grid_x)
    rect_min_y = jnp.clip(((means2d[:, 1] - radius) / 16).astype(jnp.int32), 0, grid_y)
    rect_max_y = jnp.clip(((means2d[:, 1] + radius + 15) / 16).astype(jnp.int32), 0, grid_y)
    nonempty = (rect_max_x - rect_min_x) * (rect_max_y - rect_min_y) > 0
    valid = valid & nonempty

    if colors_precomp is not None:
        colors = colors_precomp
    else:
        dirs = means3d - cam_center[None, :]
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
        colors = jnp.maximum(eval_sh(sh_degree, sh, dirs) + 0.5, 0.0)

    # NaN/Inf radii (corrupt params) cast to garbage ints that can claim
    # every tile — force them culled instead of exploding the pair count
    radii = jnp.where(valid & jnp.isfinite(radius),
                      jnp.minimum(radius, 1e7), 0.0).astype(jnp.int32)

    # Exact-conservative per-axis binning rect: the rasterizer zeroes
    # alpha < 1/255 (kernel, XLA tiles and oracle all apply the CUDA skip
    # rule), so pixels outside the level-set ellipse {d : ½·dᵀQd ≤ L},
    # L = ln(255·op), contribute exactly nothing. Its AABB has semiaxes
    # √(2L·Σxx), √(2L·Σyy) (Σ = Q⁻¹ = the dilated 2D covariance).
    # Intersected with the reference's 3σ square (which hard-cuts the pair
    # list in both designs), this shrinks the binned rect of low-opacity
    # and anisotropic Gaussians with term-identical output — forward and
    # gradients (dropped pairs have alpha masked to 0 in fwd and bwd; only
    # f32 summation order can shift). +1 px absorbs f32 rounding at the
    # level-set boundary.
    op_final = jnp.where(valid, opacities * h_scale, 0.0)
    two_l = 2.0 * jnp.log(jnp.maximum(op_final, 1e-12) * 255.0)
    rx = jnp.ceil(jnp.sqrt(jnp.maximum(two_l * cxx_d, 0.0))) + 1.0
    ry = jnp.ceil(jnp.sqrt(jnp.maximum(two_l * cyy_d, 0.0))) + 1.0
    rect = jnp.stack([jnp.minimum(radius, rx), jnp.minimum(radius, ry)], -1)
    keep = (valid & (op_final >= 1.0 / 255.0) & jnp.isfinite(radius)
            & jnp.isfinite(rect[:, 0]) & jnp.isfinite(rect[:, 1]))
    rect_radii = jnp.where(keep[:, None],
                           jnp.minimum(rect, 1e7), 0.0).astype(jnp.int32)
    return Projected(
        means2d=means2d,
        depths=jnp.where(valid, p_view[:, 2], jnp.inf),
        radii=radii,
        conics=conics,
        colors=colors,
        opacities=op_final,
        rect_radii=rect_radii,
    )


def mark_visible(means3d, viewmat):
    """Frustum-culling visibility mask — the debug utility the reference
    exposes as `GaussianRasterizer.markVisible`
    (`dgr_3dgs/__init__.py:163-172` → `auxiliary.h in_frustum`): a point is
    visible when its view-space depth exceeds 0.2 (the NDC xy bound is
    disabled upstream, and `prefiltered` is never used)."""
    p_view = means3d @ viewmat[:3, :3].T + viewmat[:3, 3]
    return p_view[:, 2] > 0.2
