#!/usr/bin/env python3
"""Bisect the fwd-kernel TPU fault: run the new unaligned kernel at small
size, then progressively larger."""
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
from sparse_view_3dgs_pack_tpu.ops.rasterize_ref import rasterize_dense

for (W, H, N, MP) in [(64, 48, 250, 1 << 13), (256, 256, 5000, 1 << 16),
                      (800, 800, 100_000, 1 << 21)]:
    cloud = make_gaussian_cloud(0, N, extent=1.0 if N < 1000 else 2.0,
                                scale_range=(0.02, 0.1) if N < 1000 else (0.004, 0.02))
    cam = make_orbit_cameras(1, radius=4.0 if N < 1000 else 6.0, width=W,
                             height_px=H)[0]
    p = cam.params()
    proj = project_gaussians(
        means3d=jnp.asarray(cloud["xyz"]), scales=jnp.exp(jnp.asarray(cloud["scales"])),
        quats=jnp.asarray(cloud["quats"]),
        opacities=jax.nn.sigmoid(jnp.asarray(cloud["opacity"][:, 0])),
        viewmat=jnp.asarray(p.viewmat), full_proj=jnp.asarray(p.full_proj),
        cam_center=jnp.asarray(p.cam_center), tan_fovx=float(p.tan_fovx),
        tan_fovy=float(p.tan_fovy), width=W, height=H,
        sh=jnp.asarray(cloud["features"]), sh_degree=0)
    ba = bin_gaussians(proj.means2d, proj.depths, proj.radii, W, H, MP)
    log(f"{W}x{H} N={N}: pairs={int(ba.total_pairs)} maxcnt={int(ba.tile_counts.max())}")
    pd = pr.pack_pair_data(proj, ba.ids)
    bg = jnp.array([0.1, 0.2, 0.3])
    raw = pr.rasterize_forward_pallas(pd, ba.tile_starts, ba.tile_counts, bg,
                                      W, H, MP, 5)
    u = pr.unpack_tiles(raw, W, H, 3)
    col = np.asarray(u["color"])
    log(f"  fwd OK mean={col.mean():.5f}")
    if W <= 256:
        ref = rasterize_dense(proj, W, H, bg)
        err = np.abs(col - np.asarray(ref.color)).max()
        log(f"  vs oracle max err {err:.2e}")
log("all good")

# compare pallas vs XLA tiled path on the same 256x256 scene
from sparse_view_3dgs_pack_tpu.ops.rasterize_tiles import rasterize_binned, RasterConfig
W, H, N, MP = 256, 256, 5000, 1 << 16
cloud = make_gaussian_cloud(0, N, extent=2.0, scale_range=(0.004, 0.02))
cam = make_orbit_cameras(1, radius=6.0, width=W, height_px=H)[0]
p = cam.params()
proj = project_gaussians(
    means3d=jnp.asarray(cloud["xyz"]), scales=jnp.exp(jnp.asarray(cloud["scales"])),
    quats=jnp.asarray(cloud["quats"]),
    opacities=jax.nn.sigmoid(jnp.asarray(cloud["opacity"][:, 0])),
    viewmat=jnp.asarray(p.viewmat), full_proj=jnp.asarray(p.full_proj),
    cam_center=jnp.asarray(p.cam_center), tan_fovx=float(p.tan_fovx),
    tan_fovy=float(p.tan_fovy), width=W, height=H,
    sh=jnp.asarray(cloud["features"]), sh_degree=0)
ba = bin_gaussians(proj.means2d, proj.depths, proj.radii, W, H, MP)
pd = pr.pack_pair_data(proj, ba.ids)
bg = jnp.array([0.1, 0.2, 0.3])
raw = pr.rasterize_forward_pallas(pd, ba.tile_starts, ba.tile_counts, bg, W, H, MP, 5)
col = np.asarray(pr.unpack_tiles(raw, W, H, 3)["color"])
out = rasterize_binned(proj, ba, W, H, bg, RasterConfig(max_pairs=MP, max_per_tile=512, tile_batch=16))
colx = np.asarray(out.color)
ref = rasterize_dense(proj, W, H, bg)
colr = np.asarray(ref.color)
log("pallas vs tiles:", np.abs(col - colx).max())
log("tiles  vs oracle:", np.abs(colx - colr).max())
log("pallas vs oracle:", np.abs(col - colr).max())
bad = np.argwhere(np.abs(col - colr).max(-1) > 1e-3)
log("bad pixels:", bad.shape[0], bad[:5].tolist())
