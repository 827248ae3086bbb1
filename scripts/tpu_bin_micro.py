#!/usr/bin/env python3
"""Micro-timing of the binning internals + pack at the bench shape
(1080p, 32x16 tiles, 200k gaussians, 1M-pair bucket)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from sparse_view_3dgs_pack_tpu.ops import binning as B
from sparse_view_3dgs_pack_tpu.ops.pallas.raster import pack_fields
from sparse_view_3dgs_pack_tpu.ops.projection import project_gaussians
from sparse_view_3dgs_pack_tpu.testing import (make_gaussian_cloud,
                                               make_orbit_cameras)

W, H, N, MP = 1920, 1080, 200_000, 1_048_576
TX, TY = 32, 16

cloud = make_gaussian_cloud(0, N, extent=2.5, scale_range=(0.004, 0.02),
                            sh_degree=0)
params = dict(
    xyz=jnp.asarray(cloud["xyz"]), scales=jnp.exp(jnp.asarray(cloud["scales"])),
    quats=jnp.asarray(cloud["quats"]),
    opac=jax.nn.sigmoid(jnp.asarray(cloud["opacity"][:, 0])),
    sh=jnp.asarray(cloud["features"]))
cams = make_orbit_cameras(64, radius=6.0, width=W, height_px=H)
projs = []
for c in cams:
    cp = c.params()
    projs.append(project_gaussians(
        means3d=params["xyz"], scales=params["scales"], quats=params["quats"],
        opacities=params["opac"], viewmat=jnp.asarray(cp.viewmat),
        full_proj=jnp.asarray(cp.full_proj),
        cam_center=jnp.asarray(cp.cam_center), tan_fovx=float(cp.tan_fovx),
        tan_fovy=float(cp.tan_fovy), width=W, height=H, sh=params["sh"],
        sh_degree=0))
jax.block_until_ready([p.means2d for p in projs])
print("devices:", jax.devices(), flush=True)

bas = [B.bin_gaussians(p.means2d, p.depths, p.radii, W, H, MP, TX, TY)
       for p in projs[:8]]
jax.block_until_ready([b.ids for b in bas])
print("pairs:", [int(b.total_pairs) for b in bas[:4]], flush=True)


def bench(fn, inputs, label, frames=8, trials=4):
    jfn = jax.jit(fn)
    out = jfn(inputs[0])
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    best = float("inf")
    for t in range(trials):
        t0 = time.perf_counter()
        for i in range(frames):
            out = jfn(inputs[(t * frames + i) % len(inputs)])
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / frames)
    print(f"{label}: {best * 1000:.2f} ms", flush=True)
    return best


# full binning
bench(lambda p: B.bin_gaussians(p.means2d, p.depths, p.radii, W, H, MP,
                                TX, TY).ids[0],
      projs, "binning full")

# sort alone at MP: synthetic u32 keys + i32 values
keys = [jax.random.randint(jax.random.PRNGKey(i), (MP,), 0, 1 << 30,
                           jnp.int32).astype(jnp.uint32) for i in range(8)]
vals = jnp.arange(MP, dtype=jnp.int32)
bench(lambda k: jax.lax.sort((k, vals), num_keys=1)[1][0], keys,
      "sort u32 key + i32 carry @1M")
bench(lambda k: jax.lax.sort((k,), num_keys=1)[0][0], keys,
      "sort u32 key alone @1M")

# pack at MP
bench(lambda p: pack_fields(p.means2d, p.depths, p.conics, p.colors,
                            p.opacities, bas[0].ids)[0, 0, 0],
      projs, "pack_fields (row gather, 1M)")

# kernel alone (pre-binned, pre-packed inputs)
from sparse_view_3dgs_pack_tpu.ops.pallas.raster_vjp import \
    make_pallas_rasterizer
raster = make_pallas_rasterizer(W, H, 3, inference=True, tile_x=TX,
                                tile_y=TY)
pairs_in = list(zip(projs[:8], bas))
bench(lambda pb: raster(pb[0].means2d, pb[0].depths, pb[0].conics,
                        pb[0].colors, pb[0].opacities, pb[1].ids,
                        pb[1].tile_starts, pb[1].tile_counts,
                        jnp.zeros(3))[0][0, 0, 0],
      pairs_in, "pack+kernel (raster fn)")
