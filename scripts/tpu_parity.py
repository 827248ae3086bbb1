#!/usr/bin/env python3
"""TPU parity probe for the Pallas kernel (verbose, flushes every step)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

import numpy as np, jax, jax.numpy as jnp
log("jax imported; devices:", jax.devices())
from sparse_view_3dgs_pack_tpu.testing import make_gaussian_cloud, make_orbit_cameras
from sparse_view_3dgs_pack_tpu.ops.projection import project_gaussians
from sparse_view_3dgs_pack_tpu.ops.binning import bin_gaussians, bin_gaussians_aligned
from sparse_view_3dgs_pack_tpu.ops.pallas import raster as pr
from sparse_view_3dgs_pack_tpu.ops.rasterize_tiles import RasterConfig, rasterize_binned

W,H,N = 64,48,300
cloud = make_gaussian_cloud(0, N, extent=1.0, scale_range=(0.02,0.1))
cam = make_orbit_cameras(1, radius=4.0, width=W, height_px=H)[0]
p = cam.params()
proj = project_gaussians(
    means3d=jnp.asarray(cloud["xyz"]), scales=jnp.exp(jnp.asarray(cloud["scales"])),
    quats=jnp.asarray(cloud["quats"]), opacities=jax.nn.sigmoid(jnp.asarray(cloud["opacity"][:,0])),
    viewmat=jnp.asarray(p.viewmat), full_proj=jnp.asarray(p.full_proj),
    cam_center=jnp.asarray(p.cam_center), tan_fovx=float(p.tan_fovx),
    tan_fovy=float(p.tan_fovy), width=W, height=H, sh=jnp.asarray(cloud["features"]), sh_degree=0)
jax.block_until_ready(proj); log("projected")
MP = 1<<13
b = bin_gaussians(proj.means2d, proj.depths, proj.radii, W, H, MP)
ba = bin_gaussians_aligned(proj.means2d, proj.depths, proj.radii, W, H, MP)
jax.block_until_ready(ba.ids); log("binned; counts:", np.asarray(ba.tile_counts).tolist())
pd = pr.pack_pair_data(proj, ba.ids)
jax.block_until_ready(pd); log("packed")
bg = jnp.array([0.1,0.2,0.3])
ref = rasterize_binned(proj, b, W, H, bg, RasterConfig(max_pairs=MP, max_per_tile=256, tile_batch=4))
jax.block_until_ready(ref.color); log("xla tiled done")

for label, kwargs in [("early-exit ON", dict(early_exit=True)),
                      ("early-exit OFF", dict(early_exit=False))]:
    out = pr.rasterize_forward_pallas(pd, ba.tile_starts, ba.tile_counts, bg, W, H, MP, 5, **kwargs)
    jax.block_until_ready(out); log("kernel done:", label)
    imgs = pr.unpack_tiles(out, W, H, 3)
    d = np.abs(np.asarray(imgs["color"]) - np.asarray(ref.color)).max(-1)
    log(label, "maxdiff %.4g frac>1e-3 %.5f" % (d.max(), (d>1e-3).mean()))
    if d.max() > 1e-3:
        gx = (W+15)//16
        bad = sorted({(y//16)*gx + x//16 for y,x in zip(*np.where(d>1e-3))})
        cts = np.asarray(ba.tile_counts)
        log("  bad tiles:", bad, "counts:", [int(cts[t]) for t in bad])
        t = bad[0]
        log("  tile", t, "kernel row0:", np.asarray(out[t,0,:11]).round(4).tolist())

# run kernel twice, check determinism across invocations
o1 = pr.rasterize_forward_pallas(pd, ba.tile_starts, ba.tile_counts, bg, W, H, MP, 5)
o2 = pr.rasterize_forward_pallas(pd, ba.tile_starts, ba.tile_counts, bg, W, H, MP, 5)
log("repeat determinism maxdiff:", float(jnp.abs(o1-o2).max()))

