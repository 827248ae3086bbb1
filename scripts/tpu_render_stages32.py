#!/usr/bin/env python3
"""Stage breakdown of the INFERENCE render path exactly as bench.py times it
(1080p, 200k gaussians, 32x16 tiles, 1M-pair bucket): projection alone,
projection+binning, and the full frame — differences isolate each stage
under the same jit/dedupe discipline (distinct cameras per call, forced
materialization)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from sparse_view_3dgs_pack_tpu.ops.binning import bin_gaussians
from sparse_view_3dgs_pack_tpu.ops.pallas.raster_vjp import \
    make_pallas_rasterizer
from sparse_view_3dgs_pack_tpu.ops.projection import project_gaussians
from sparse_view_3dgs_pack_tpu.testing import (make_gaussian_cloud,
                                               make_orbit_cameras)

W, H, N, MP = 1920, 1080, 200_000, 786_432
TX, TY = 32, 16

cloud = make_gaussian_cloud(0, N, extent=2.5, scale_range=(0.004, 0.02),
                            sh_degree=0)
params = {
    "xyz": jnp.asarray(cloud["xyz"]),
    "scales": jnp.exp(jnp.asarray(cloud["scales"])),
    "quats": jnp.asarray(cloud["quats"]),
    "opac": jax.nn.sigmoid(jnp.asarray(cloud["opacity"][:, 0])),
    "sh": jnp.asarray(cloud["features"]),
}
cams = make_orbit_cameras(64, radius=6.0, width=W, height_px=H)
camps = [c.params() for c in cams]
raster = make_pallas_rasterizer(W, H, 3, inference=True, tile_x=TX,
                                tile_y=TY)


def proj_of(p, cp):
    return project_gaussians(
        means3d=p["xyz"], scales=p["scales"], quats=p["quats"],
        opacities=p["opac"], viewmat=cp[0], full_proj=cp[1],
        cam_center=cp[2], tan_fovx=cp[3], tan_fovy=cp[4],
        width=W, height=H, sh=p["sh"], sh_degree=0)


def stage_proj(p, *cp):
    pr = proj_of(p, cp)
    return pr.means2d[0, 0] + pr.depths[0] + pr.conics[0, 0]


def stage_bin(p, *cp):
    pr = proj_of(p, cp)
    ba = bin_gaussians(pr.means2d, pr.depths, pr.radii, W, H, MP, TX, TY)
    return ba.ids[0] + ba.tile_starts[7] + ba.tile_counts[7] + ba.total_pairs


def stage_full(p, *cp):
    pr = proj_of(p, cp)
    ba = bin_gaussians(pr.means2d, pr.depths, pr.radii, W, H, MP, TX, TY)
    color, _, _, _ = raster(pr.means2d, pr.depths, pr.conics, pr.colors,
                            pr.opacities, ba.ids, ba.tile_starts,
                            ba.tile_counts, jnp.zeros(3))
    return color[0, 0, 0]


def args(i):
    p = camps[i % len(camps)]
    return (jnp.asarray(p.viewmat), jnp.asarray(p.full_proj),
            jnp.asarray(p.cam_center), jnp.asarray(p.tan_fovx),
            jnp.asarray(p.tan_fovy))


def bench(fn, label, frames=10, trials=4):
    jfn = jax.jit(fn)
    out = jfn(params, *args(0))
    _ = np.asarray(out)
    best = float("inf")
    for trial in range(trials):
        t0 = time.perf_counter()
        for i in range(frames):
            out = jfn(params, *args(1 + trial * frames + i))
        _ = np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / frames)
    print(f"{label}: {best * 1000:.2f} ms", flush=True)
    return best


print("devices:", jax.devices(), flush=True)
tp = bench(stage_proj, "projection only")
tb = bench(stage_bin, "projection+binning")
tf = bench(stage_full, "full frame")
print(f"=> binning ~{(tb - tp) * 1000:.2f} ms, "
      f"pack+kernel ~{(tf - tb) * 1000:.2f} ms, "
      f"fps {1.0 / tf:.1f}")
