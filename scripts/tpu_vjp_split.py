#!/usr/bin/env python3
"""Split render loss into vjp fwd / bwd halves and time each."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

import numpy as np, jax, jax.numpy as jnp
log("devices:", jax.devices())

from sparse_view_3dgs_pack_tpu.testing import make_gaussian_cloud, make_orbit_cameras
from sparse_view_3dgs_pack_tpu.ops.projection import project_gaussians
from sparse_view_3dgs_pack_tpu.ops.binning import bin_gaussians_aligned
from sparse_view_3dgs_pack_tpu.ops.pallas.raster_vjp import make_pallas_rasterizer

W = H = 800
N = 100_000
MP = 1 << 21
cloud = make_gaussian_cloud(0, N, extent=2.0, scale_range=(0.004, 0.02))
cam = make_orbit_cameras(1, radius=6.0, width=W, height_px=H)[0]
p = cam.params()
c0 = {k: jnp.asarray(v) for k, v in cloud.items()}
fn = make_pallas_rasterizer(W, H, 3)
tgt = jax.random.uniform(jax.random.PRNGKey(2), (H, W, 3))

def loss(cc):
    pr_ = project_gaussians(
        means3d=cc["xyz"], scales=jnp.exp(cc["scales"]), quats=cc["quats"],
        opacities=jax.nn.sigmoid(cc["opacity"][:, 0]),
        viewmat=jnp.asarray(p.viewmat), full_proj=jnp.asarray(p.full_proj),
        cam_center=jnp.asarray(p.cam_center), tan_fovx=float(p.tan_fovx),
        tan_fovy=float(p.tan_fovy), width=W, height=H, sh=cc["features"],
        sh_degree=0)
    ba = bin_gaussians_aligned(pr_.means2d, pr_.depths, pr_.radii, W, H, MP)
    col, _, _, _ = fn(pr_.means2d, pr_.depths, pr_.conics, pr_.colors,
                      pr_.opacities, ba.ids, ba.tile_starts, ba.tile_counts,
                      jnp.zeros(3))
    return jnp.abs(col - tgt).mean()

@jax.jit
def fwd_only_chain(c):
    v = loss(c)
    return jax.tree.map(lambda a: a + 1e-9 * v, c)

def chain(f, init, label, n=8):
    s = f(init)
    _ = np.asarray(jax.tree_util.tree_leaves(s)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        s = f(s)
    _ = np.asarray(jax.tree_util.tree_leaves(s)[0].ravel()[0])
    log(f"{label}: {(time.perf_counter()-t0)/n*1000:7.1f} ms")

chain(fwd_only_chain, c0, "loss fwd only")

@jax.jit
def vjp_full_chain(c):
    val, pull = jax.vjp(loss, c)
    (g,) = pull(jnp.ones(()))
    return jax.tree.map(lambda a, b: a - 1e-6 * b, c, g)
chain(vjp_full_chain, c0, "loss fwd+bwd")
log("done")
