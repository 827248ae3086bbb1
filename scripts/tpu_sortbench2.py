#!/usr/bin/env python3
"""Timing with VARYING inputs per iteration (the axon tunnel appears to
dedupe identical requests, which poisons identical-input timing loops)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

import numpy as np, jax, jax.numpy as jnp
log("devices:", jax.devices())

N = 1 << 21
T = 8160
OUT = N + (1 << 21)

keys_list = [jax.random.randint(jax.random.PRNGKey(i), (N,), 0, T,
                                dtype=jnp.int32) for i in range(8)]
vals = [jax.random.normal(jax.random.PRNGKey(100 + i), (N,))
        for i in range(13)]
jax.block_until_ready(keys_list); jax.block_until_ready(vals)

def bench_vary(fn, inputs, label="", n=8):
    out = fn(inputs[0]); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(inputs[i % len(inputs)])
    jax.block_until_ready(out)
    log(f"{label}: {(time.perf_counter()-t0)/n*1000:.2f} ms")

f_sort2 = jax.jit(lambda k: jax.lax.sort((k, vals[0]), num_keys=1))
bench_vary(f_sort2, keys_list, label="sort 2-op 2M varying")

f_sort14 = jax.jit(lambda k: jax.lax.sort((k,) + tuple(vals), num_keys=1))
bench_vary(f_sort14, keys_list, label="sort 14-op 2M varying")

big_table = vals[0]
idxs = [jax.random.randint(jax.random.PRNGKey(200 + i), (OUT,), 0, N,
                           dtype=jnp.int32) for i in range(8)]
jax.block_until_ready(idxs)
f_gather = jax.jit(lambda i: big_table[i])
bench_vary(f_gather, idxs, label="gather 4M from 2M varying")

idxs_sc = [jax.random.randint(jax.random.PRNGKey(300 + i), (N,), 0, OUT,
                              dtype=jnp.int32) for i in range(8)]
jax.block_until_ready(idxs_sc)
f_scat = jax.jit(lambda i: jnp.full(OUT, -1.0).at[i].set(big_table,
                                                         mode="drop"))
bench_vary(f_scat, idxs_sc, label="scatter 2M into 4M varying")

# the real aligned binning on varying inputs
from sparse_view_3dgs_pack_tpu.testing import make_gaussian_cloud, make_orbit_cameras
from sparse_view_3dgs_pack_tpu.ops.projection import project_gaussians
from sparse_view_3dgs_pack_tpu.ops.binning import bin_gaussians, bin_gaussians_aligned
from sparse_view_3dgs_pack_tpu.ops.pallas import raster as pr

W, H = 1920, 1080
projs = []
for s in range(4):
    cloud = make_gaussian_cloud(s, 200_000, extent=2.5,
                                scale_range=(0.004, 0.02))
    cam = make_orbit_cameras(4, radius=6.0, width=W, height_px=H)[s]
    p = cam.params()
    c = {k: jnp.asarray(v) for k, v in cloud.items()}
    pr_ = jax.jit(lambda c, vm, fp, cc, tx, ty: project_gaussians(
        means3d=c["xyz"], scales=jnp.exp(c["scales"]), quats=c["quats"],
        opacities=jax.nn.sigmoid(c["opacity"][:, 0]),
        viewmat=vm, full_proj=fp, cam_center=cc, tan_fovx=tx, tan_fovy=ty,
        width=W, height=H, sh=c["features"], sh_degree=0))(
        c, jnp.asarray(p.viewmat), jnp.asarray(p.full_proj),
        jnp.asarray(p.cam_center), jnp.asarray(p.tan_fovx),
        jnp.asarray(p.tan_fovy))
    projs.append(pr_)
jax.block_until_ready(projs)
MP = 1 << 21

f_bin = jax.jit(lambda m, d, r: bin_gaussians(m, d, r, W, H, MP))
bench_vary(lambda pj: f_bin(pj.means2d, pj.depths, pj.radii), projs,
           label="bin_gaussians (unaligned) varying", n=8)
f_bina = jax.jit(lambda m, d, r: bin_gaussians_aligned(m, d, r, W, H, MP))
bench_vary(lambda pj: f_bina(pj.means2d, pj.depths, pj.radii), projs,
           label="bin_gaussians_aligned varying", n=8)

bas = [f_bina(pj.means2d, pj.depths, pj.radii) for pj in projs]
jax.block_until_ready(bas)
f_pack = jax.jit(pr.pack_pair_data)
bench_vary(lambda i: f_pack(projs[i], bas[i].ids), [0, 1, 2, 3],
           label="pack varying", n=8)

bg = jnp.zeros(3)
f_kern = lambda i: pr.rasterize_forward_pallas(
    f_pack(projs[i], bas[i].ids), bas[i].tile_starts, bas[i].tile_counts,
    bg, W, H, MP, 5, mm_precision=jax.lax.Precision.DEFAULT)
bench_vary(f_kern, [0, 1, 2, 3], label="pack+kernel varying", n=8)
log("done")
