#!/usr/bin/env python3
"""Stage-by-stage honest timing at 800p/100k: projection, binning, pack,
fwd kernel, bwd kernel, ssim, full render grad. Dependent chains with small
input mutations; one materialization per chain."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

import numpy as np, jax, jax.numpy as jnp
log("devices:", jax.devices())

from sparse_view_3dgs_pack_tpu.testing import make_gaussian_cloud, make_orbit_cameras
from sparse_view_3dgs_pack_tpu.ops.projection import project_gaussians
from sparse_view_3dgs_pack_tpu.ops.binning import bin_gaussians
from sparse_view_3dgs_pack_tpu.ops.pallas import raster as pr
from sparse_view_3dgs_pack_tpu.ops.pallas.raster_bwd import rasterize_backward_pallas
from sparse_view_3dgs_pack_tpu.ops.pallas.raster_vjp import make_pallas_rasterizer, _tile_pack
from sparse_view_3dgs_pack_tpu.losses.ssim import ssim

W = H = 800
N = 100_000
MP = 1 << 21
cloud = make_gaussian_cloud(0, N, extent=2.0, scale_range=(0.004, 0.02))
cam = make_orbit_cameras(1, radius=6.0, width=W, height_px=H)[0]
p = cam.params()
c0 = {k: jnp.asarray(v) for k, v in cloud.items()}

proj_fn = jax.jit(lambda c: project_gaussians(
    means3d=c["xyz"], scales=jnp.exp(c["scales"]), quats=c["quats"],
    opacities=jax.nn.sigmoid(c["opacity"][:, 0]),
    viewmat=jnp.asarray(p.viewmat), full_proj=jnp.asarray(p.full_proj),
    cam_center=jnp.asarray(p.cam_center), tan_fovx=float(p.tan_fovx),
    tan_fovy=float(p.tan_fovy), width=W, height=H, sh=c["features"],
    sh_degree=0))

def chain_time(step, init, n=10, out_probe=None, label=""):
    """step: state -> state (device); mutate so requests differ."""
    s = step(init)
    _ = np.asarray(jax.tree_util.tree_leaves(s)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        s = step(s)
    _ = np.asarray(jax.tree_util.tree_leaves(s)[0].ravel()[0])
    log(f"{label}: {(time.perf_counter()-t0)/n*1000:7.1f} ms")
    return s

# (d) projection chained: mutate xyz a hair each iter
@jax.jit
def proj_chain(c):
    pr_ = proj_fn(c)
    c2 = dict(c)
    c2["xyz"] = c["xyz"] + 1e-6 * pr_.depths[:, None].clip(0, 1)
    return c2
chain_time(proj_chain, c0, label="projection (+mutate)")

proj0 = proj_fn(c0)
# (e) binning chained: perturb means2d
@jax.jit
def bin_chain(m2):
    ba = bin_gaussians(m2, proj0.depths, proj0.radii, W, H, MP)
    # consume ids/starts/counts so XLA cannot DCE the sort
    probe = (ba.ids[0] + ba.tile_starts[17] + ba.tile_counts[33]
             + ba.total_pairs).astype(jnp.float32)
    return m2 + 1e-6 * (probe % 3)
chain_time(bin_chain, proj0.means2d, label="binning (u32-key sort)")

ba0 = bin_gaussians(proj0.means2d, proj0.depths, proj0.radii, W, H, MP)
log("pairs: %d padded: %d" % (int(ba0.total_pairs), int(ba0.tile_counts.sum())))

# (f) pack chained
@jax.jit
def pack_chain(col):
    pd = pr.pack_fields(proj0.means2d, proj0.depths, proj0.conics, col,
                        proj0.opacities, ba0.ids)
    return col + 1e-7 * pd[6, :col.shape[0]][:, None]
chain_time(pack_chain, proj0.colors, label="pack (13-row gather)")

pd0 = pr.pack_pair_data(proj0, ba0.ids)
bg = jnp.zeros(3)

# (g) fwd kernel chained: mutate bg slightly (payload constant)
@jax.jit
def fwd_chain(bgv):
    out = pr.rasterize_forward_pallas(pd0, ba0.tile_starts, ba0.tile_counts,
                                      bgv, W, H, MP, 5,
                                      mm_precision=jax.lax.Precision.DEFAULT)
    return bgv + 1e-7 * out[0, 0, 0:3]
chain_time(fwd_chain, bg, label="fwd kernel (DEFAULT prec)")

@jax.jit
def fwd_chain_h(bgv):
    out = pr.rasterize_forward_pallas(pd0, ba0.tile_starts, ba0.tile_counts,
                                      bgv, W, H, MP, 5,
                                      mm_precision=jax.lax.Precision.HIGHEST)
    return bgv + 1e-7 * out[0, 0, 0:3]
chain_time(fwd_chain_h, bg, label="fwd kernel (HIGHEST prec)")

raw0 = pr.rasterize_forward_pallas(pd0, ba0.tile_starts, ba0.tile_counts, bg,
                                   W, H, MP, 5)
aux0 = jnp.concatenate([raw0[:, :, 8:10],
                        jnp.zeros((raw0.shape[0], 256, 1))], axis=-1)
gt0 = jnp.ones((raw0.shape[0], 256, 8)) * 0.1
bgrow = jnp.zeros((1, 8))

# (h) bwd kernel chained: mutate g
@jax.jit
def bwd_chain(g):
    d = rasterize_backward_pallas(pd0, ba0.tile_starts, ba0.tile_counts, g,
                                  aux0, bgrow, W, H)
    return g + 1e-7 * d[0, 0]
chain_time(bwd_chain, gt0, label="bwd kernel")

# (c) ssim fwd+bwd
img0 = jax.random.uniform(jax.random.PRNGKey(0), (H, W, 3))
tgt = jax.random.uniform(jax.random.PRNGKey(1), (H, W, 3))
@jax.jit
def ssim_chain(img):
    g = jax.grad(lambda a: ssim(a, tgt))(img)
    return img + 1e-6 * g
chain_time(ssim_chain, img0, label="ssim fwd+bwd 800p")

# (b) full render fwd+bwd via custom vjp (incl. projection, bin, pack x2)
fn = make_pallas_rasterizer(W, H, 3)
tgt_img = jax.random.uniform(jax.random.PRNGKey(2), (H, W, 3))
@jax.jit
def render_grad_chain(c):
    def loss(cc):
        pr_ = project_gaussians(
            means3d=cc["xyz"], scales=jnp.exp(cc["scales"]), quats=cc["quats"],
            opacities=jax.nn.sigmoid(cc["opacity"][:, 0]),
            viewmat=jnp.asarray(p.viewmat), full_proj=jnp.asarray(p.full_proj),
            cam_center=jnp.asarray(p.cam_center), tan_fovx=float(p.tan_fovx),
            tan_fovy=float(p.tan_fovy), width=W, height=H, sh=cc["features"],
            sh_degree=0)
        ba = bin_gaussians(pr_.means2d, pr_.depths, pr_.radii, W, H, MP)
        col, _, _, _ = fn(pr_.means2d, pr_.depths, pr_.conics, pr_.colors,
                          pr_.opacities, ba.ids, ba.tile_starts,
                          ba.tile_counts, jnp.zeros(3))
        return jnp.abs(col - tgt_img).mean()
    g = jax.grad(loss)(c)
    return jax.tree.map(lambda a, b: a - 1e-5 * b, c, g)
chain_time(render_grad_chain, c0, label="render fwd+bwd e2e")
log("done")
