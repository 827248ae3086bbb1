#!/usr/bin/env python3
"""Find the composition cliff: proj → +bin → +pack → +kernel, one jit each."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

import numpy as np, jax, jax.numpy as jnp
log("devices:", jax.devices())

from sparse_view_3dgs_pack_tpu.testing import make_gaussian_cloud, make_orbit_cameras
from sparse_view_3dgs_pack_tpu.ops.projection import project_gaussians
from sparse_view_3dgs_pack_tpu.ops.binning import bin_gaussians_aligned, bin_gaussians
from sparse_view_3dgs_pack_tpu.ops.pallas import raster as pr

W = H = 800
N = 100_000
MP = 1 << int(os.environ.get("MPLOG", "21"))
cloud = make_gaussian_cloud(0, N, extent=2.0, scale_range=(0.004, 0.02))
cam = make_orbit_cameras(1, radius=6.0, width=W, height_px=H)[0]
p = cam.params()
c0 = {k: jnp.asarray(v) for k, v in cloud.items()}

def proj_of(cc):
    return project_gaussians(
        means3d=cc["xyz"], scales=jnp.exp(cc["scales"]), quats=cc["quats"],
        opacities=jax.nn.sigmoid(cc["opacity"][:, 0]),
        viewmat=jnp.asarray(p.viewmat), full_proj=jnp.asarray(p.full_proj),
        cam_center=jnp.asarray(p.cam_center), tan_fovx=float(p.tan_fovx),
        tan_fovy=float(p.tan_fovy), width=W, height=H, sh=cc["features"],
        sh_degree=0)

def chain(f, init, label, n=8):
    s = f(init)
    _ = np.asarray(jax.tree_util.tree_leaves(s)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        s = f(s)
    _ = np.asarray(jax.tree_util.tree_leaves(s)[0].ravel()[0])
    log(f"{label}: {(time.perf_counter()-t0)/n*1000:7.1f} ms")

def mut(cc, v):
    out = dict(cc)
    out["xyz"] = cc["xyz"] + 1e-9 * v
    return out

@jax.jit
def s1(cc):
    pr_ = proj_of(cc)
    return mut(cc, jnp.sum(pr_.means2d[0]))
chain(s1, c0, "proj")

@jax.jit
def s2(cc):
    pr_ = proj_of(cc)
    bu = bin_gaussians(pr_.means2d, pr_.depths, pr_.radii, W, H, MP)
    return mut(cc, bu.total_pairs.astype(jnp.float32))
chain(s2, c0, "proj+bin(unaligned)")

@jax.jit
def s3(cc):
    pr_ = proj_of(cc)
    ba = bin_gaussians_aligned(pr_.means2d, pr_.depths, pr_.radii, W, H, MP)
    return mut(cc, ba.total_pairs.astype(jnp.float32))
chain(s3, c0, "proj+bin(aligned)")

@jax.jit
def s4(cc):
    pr_ = proj_of(cc)
    ba = bin_gaussians_aligned(pr_.means2d, pr_.depths, pr_.radii, W, H, MP)
    pd = pr.pack_pair_data(pr_, ba.ids)
    return mut(cc, jnp.sum(pd[0, ::65536]))
chain(s4, c0, "proj+bin+pack")

@jax.jit
def s5(cc):
    pr_ = proj_of(cc)
    ba = bin_gaussians_aligned(pr_.means2d, pr_.depths, pr_.radii, W, H, MP)
    pd = pr.pack_pair_data(pr_, ba.ids)
    out = pr.rasterize_forward_pallas(pd, ba.tile_starts, ba.tile_counts,
                                      jnp.zeros(3), W, H, MP, 5,
                                      mm_precision=jax.lax.Precision.DEFAULT)
    return mut(cc, out[0, 0, 0])
chain(s5, c0, "proj+bin+pack+kernel")
log("done")
