#!/usr/bin/env python3
"""1080p render stage breakdown (200k gaussians, 1.44M bucket)."""
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

W, H, N, MP = 1920, 1080, 200_000, 1_441_792
cloud = make_gaussian_cloud(0, N, extent=2.5, scale_range=(0.004, 0.02))
cams = make_orbit_cameras(8, radius=6.0, width=W, height_px=H)
projs = []
for cam in cams:
    p = cam.params()
    projs.append(project_gaussians(
        means3d=jnp.asarray(cloud["xyz"]), scales=jnp.exp(jnp.asarray(cloud["scales"])),
        quats=jnp.asarray(cloud["quats"]),
        opacities=jax.nn.sigmoid(jnp.asarray(cloud["opacity"][:, 0])),
        viewmat=jnp.asarray(p.viewmat), full_proj=jnp.asarray(p.full_proj),
        cam_center=jnp.asarray(p.cam_center), tan_fovx=float(p.tan_fovx),
        tan_fovy=float(p.tan_fovy), width=W, height=H,
        sh=jnp.asarray(cloud["features"]), sh_degree=0))
jax.block_until_ready([p.means2d for p in projs])

def bench(fn, inputs, label, n=8):
    out = fn(inputs[0]); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(inputs[i % len(inputs)])
    jax.block_until_ready(out)
    log(f"{label}: {(time.perf_counter()-t0)/n*1000:.2f} ms")

ba0 = bin_gaussians(projs[0].means2d, projs[0].depths, projs[0].radii, W, H, MP)
log("pairs:", int(ba0.total_pairs))

def binfull(pr_):
    b = bin_gaussians(pr_.means2d, pr_.depths, pr_.radii, W, H, MP)
    return b.ids[0] + b.tile_starts[17] + b.tile_counts[33] + b.total_pairs
bench(jax.jit(binfull), projs, "binning FULL 1080p")

# searchsorted isolated at 8161 probes
from sparse_view_3dgs_pack_tpu.ops.binning import _key_bits, tile_grid
gx, gy = tile_grid(W, H)
_, db = _key_bits(gx * gy)
keys = [jax.random.randint(jax.random.PRNGKey(i), (MP,), 0, 1 << 30,
                           dtype=jnp.int32).astype(jnp.uint32)
        for i in range(4)]
skeys = [jax.lax.sort((k,))[0] for k in keys]
jax.block_until_ready(skeys)
probes = (jnp.arange(gx * gy + 1, dtype=jnp.uint32) << db)
bench(jax.jit(lambda sk: jnp.searchsorted(sk, probes, side="left",
                                          method="scan_unrolled")),
      skeys, "searchsorted 8161 probes scan_unrolled")
bench(jax.jit(lambda sk: jnp.searchsorted(sk, probes, side="left")),
      skeys, "searchsorted 8161 probes scan")

bas = [bin_gaussians(p.means2d, p.depths, p.radii, W, H, MP) for p in projs[:4]]
jax.block_until_ready([b.ids for b in bas])
def packf(args):
    p, b = args
    pd = pr.pack_fields(p.means2d, p.depths, p.conics, p.colors, p.opacities,
                        b.ids)
    return pd[6, 1234]
bench(jax.jit(packf), [(projs[i], bas[i]) for i in range(4)], "pack 1080p")

pds = [pr.pack_pair_data(projs[i], bas[i].ids) for i in range(4)]
jax.block_until_ready(pds)
def fwdf(args):
    pd, b = args
    raw = pr.rasterize_forward_pallas(pd, b.tile_starts,
                                      b.tile_counts, jnp.zeros(3),
                                      W, H, MP, 5)
    return raw[0, 0, 0]
bench(jax.jit(fwdf), [(pds[i], bas[i]) for i in range(4)], "fwd kernel 1080p")

def unpackf(args):
    pd, b = args
    raw = pr.rasterize_forward_pallas(pd, b.tile_starts,
                                      b.tile_counts, jnp.zeros(3),
                                      W, H, MP, 5)
    u = pr.unpack_tiles(raw, W, H, 3)
    return u["color"][0, 0, 0]
bench(jax.jit(unpackf), [(pds[i], bas[i]) for i in range(4)],
      "fwd + unpack 1080p")
