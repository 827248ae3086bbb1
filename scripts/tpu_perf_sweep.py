#!/usr/bin/env python3
"""Forward-kernel perf sweep on TPU: precision × early-exit × alignment."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

import numpy as np, jax, jax.numpy as jnp
log("devices:", jax.devices())
from sparse_view_3dgs_pack_tpu.testing import make_gaussian_cloud, make_orbit_cameras
from sparse_view_3dgs_pack_tpu.ops.projection import project_gaussians
from sparse_view_3dgs_pack_tpu.ops.binning import bin_gaussians_aligned
from sparse_view_3dgs_pack_tpu.ops.pallas import raster as pr

W, H = 1920, 1080
cloud = make_gaussian_cloud(0, 200_000, extent=2.5, scale_range=(0.004, 0.02))
cam = make_orbit_cameras(1, radius=6.0, width=W, height_px=H)[0]
p = cam.params()
c = {k: jnp.asarray(v) for k, v in cloud.items()}
proj = jax.jit(lambda c: project_gaussians(
    means3d=c["xyz"], scales=jnp.exp(c["scales"]), quats=c["quats"],
    opacities=jax.nn.sigmoid(c["opacity"][:, 0]),
    viewmat=jnp.asarray(p.viewmat), full_proj=jnp.asarray(p.full_proj),
    cam_center=jnp.asarray(p.cam_center), tan_fovx=float(p.tan_fovx),
    tan_fovy=float(p.tan_fovy), width=W, height=H, sh=c["features"],
    sh_degree=0))(c)
jax.block_until_ready(proj)
MP = 1 << 21
ba = bin_gaussians_aligned(proj.means2d, proj.depths, proj.radii, W, H, MP)
pd = pr.pack_pair_data(proj, ba.ids)
jax.block_until_ready(pd)
log("pairs:", int(ba.total_pairs), "padded:", int(ba.tile_counts.sum()))
bg = jnp.zeros(3)

import itertools
for prec, ee in itertools.product(
        [jax.lax.Precision.HIGHEST, jax.lax.Precision.DEFAULT], [True, False]):
    def run():
        return pr.rasterize_forward_pallas(
            pd, ba.tile_starts, ba.tile_counts, bg, W, H, MP, 5,
            early_exit=ee, mm_precision=prec)
    out = run(); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(20):
        out = run()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 20
    log(f"prec={str(prec):26s} early_exit={ee}: {dt*1000:7.2f} ms")

# timing of pack + unpack + binning separately
t0 = time.perf_counter()
for _ in range(20):
    ba2 = bin_gaussians_aligned(proj.means2d, proj.depths, proj.radii, W, H, MP)
jax.block_until_ready(ba2.ids)
log("binning aligned: %.2f ms" % ((time.perf_counter()-t0)/20*1000))
t0 = time.perf_counter()
for _ in range(20):
    pd2 = pr.pack_pair_data(proj, ba.ids)
jax.block_until_ready(pd2)
log("pack: %.2f ms" % ((time.perf_counter()-t0)/20*1000))
log("done")
