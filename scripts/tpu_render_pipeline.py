#!/usr/bin/env python3
"""Marginal cost of each 1080p render stage inside ONE jitted pipeline
(the composition bench.py times), plus bucket-size sensitivity."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

log("devices:", jax.devices())

from sparse_view_3dgs_pack_tpu.testing import (make_gaussian_cloud,  # noqa
                                               make_orbit_cameras)
from sparse_view_3dgs_pack_tpu.ops.projection import project_gaussians  # noqa
from sparse_view_3dgs_pack_tpu.ops.binning import bin_gaussians  # noqa
from sparse_view_3dgs_pack_tpu.ops.pallas import raster as pr  # noqa
from sparse_view_3dgs_pack_tpu.ops.pallas.raster_vjp import \
    make_pallas_rasterizer  # noqa

W, H, N = 1920, 1080, 200_000
cloud = make_gaussian_cloud(0, N, extent=2.5, scale_range=(0.004, 0.02))
cams = make_orbit_cameras(32, radius=6.0, width=W, height_px=H)
camps = [c.params() for c in cams]
c = {k: jnp.asarray(v) for k, v in cloud.items()}
params = {
    "xyz": c["xyz"], "scales": jnp.exp(c["scales"]), "quats": c["quats"],
    "opac": jax.nn.sigmoid(c["opacity"][:, 0]), "sh": c["features"],
}


def cam_args(i):
    p = camps[i % len(camps)]
    return (jnp.asarray(p.viewmat), jnp.asarray(p.full_proj),
            jnp.asarray(p.cam_center), jnp.asarray(p.tan_fovx),
            jnp.asarray(p.tan_fovy))


def proj_fn(p, viewmat, full_proj, cam_center, tanx, tany):
    return project_gaussians(
        means3d=p["xyz"], scales=p["scales"], quats=p["quats"],
        opacities=p["opac"], viewmat=viewmat, full_proj=full_proj,
        cam_center=cam_center, tan_fovx=tanx, tan_fovy=tany,
        width=W, height=H, sh=p["sh"], sh_degree=0)


def _materialize(out):
    # block_until_ready does not sync this tunneled backend; a host
    # transfer of one element is the only true completion barrier
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(leaf.reshape(-1)[0])


def bench(fn, label, n=12):
    jfn = jax.jit(fn)
    out = jfn(params, *cam_args(0))
    _materialize(out)
    best = float("inf")
    for trial in range(3):
        t0 = time.perf_counter()
        for i in range(n):
            out = jfn(params, *cam_args(trial * n + i + 1))
        _materialize(out)
        best = min(best, (time.perf_counter() - t0) / n)
    log(f"{label}: {best * 1000:.2f} ms  ({1.0 / best:.1f} fps)")
    return best


# stage-cumulative pipelines
def f_proj(p, *ca):
    pj = proj_fn(p, *ca)
    return pj.means2d, pj.colors


bench(f_proj, "project only")

for MP in (1_441_792, 1_179_648):
    def f_bin(p, *ca, MP=MP):
        pj = proj_fn(p, *ca)
        ba = bin_gaussians(pj.means2d, pj.depths, pj.radii, W, H, MP)
        return ba.ids[0], ba.tile_starts[7], ba.total_pairs

    bench(f_bin, f"project+bin MP={MP}")

    def f_pack(p, *ca, MP=MP):
        pj = proj_fn(p, *ca)
        ba = bin_gaussians(pj.means2d, pj.depths, pj.radii, W, H, MP)
        pd = pr.pack_pair_data(pj, ba.ids)
        return pd[0, 0, 0], ba.tile_starts[7]

    bench(f_pack, f"project+bin+pack MP={MP}")

    raster_fn = make_pallas_rasterizer(W, H, 3, inference=True)

    def f_full(p, *ca, MP=MP, raster_fn=raster_fn):
        pj = proj_fn(p, *ca)
        ba = bin_gaussians(pj.means2d, pj.depths, pj.radii, W, H, MP)
        color, _, _, _ = raster_fn(pj.means2d, pj.depths, pj.conics,
                                   pj.colors, pj.opacities, ba.ids,
                                   ba.tile_starts, ba.tile_counts,
                                   jnp.zeros(3))
        return color

    bench(f_full, f"FULL render MP={MP}")
