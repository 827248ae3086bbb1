#!/usr/bin/env python3
"""Micro-benchmark / parity harness for the Pallas rasterizer.

Usage: python scripts/bench_kernel.py [--cpu] [--n 200000] [--w 1920]
       [--h 1080] [--check]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--w", type=int, default=1920)
    ap.add_argument("--h", type=int, default=1080)
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--scale", type=float, nargs=2, default=(0.004, 0.02))
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from sparse_view_3dgs_pack_tpu.ops.binning import (bin_gaussians,
                                                       bin_gaussians_aligned)
    from sparse_view_3dgs_pack_tpu.ops.pallas import raster as pr
    from sparse_view_3dgs_pack_tpu.ops.projection import project_gaussians
    from sparse_view_3dgs_pack_tpu.ops.rasterize_tiles import (
        RasterConfig, rasterize_binned)
    from sparse_view_3dgs_pack_tpu.testing import (make_gaussian_cloud,
                                                   make_orbit_cameras)

    W, H = args.w, args.h
    cloud = make_gaussian_cloud(0, args.n, extent=2.5,
                                scale_range=tuple(args.scale))
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

    MP = 1 << max(14, (int(args.n * 12)).bit_length())
    ba = bin_gaussians_aligned(proj.means2d, proj.depths, proj.radii,
                               W, H, MP)
    jax.block_until_ready(ba.ids)
    print("pairs:", int(ba.total_pairs), "padded:",
          int(ba.tile_counts.sum()), "bucket:", MP)
    bg = jnp.zeros(3)

    def full(proj, ba):
        pd = pr.pack_pair_data(proj, ba.ids)
        out = pr.rasterize_forward_pallas(pd, ba.tile_starts, ba.tile_counts,
                                          bg, W, H, MP, 5)
        return pr.unpack_tiles(out, W, H, 3)

    jfull = jax.jit(lambda proj, ba: full(proj, ba)["color"])
    t0 = time.perf_counter()
    img = jfull(proj, ba)
    jax.block_until_ready(img)
    print("compile+1st: %.0f ms" % ((time.perf_counter() - t0) * 1000))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        img = jfull(proj, ba)
    jax.block_until_ready(img)
    dt = (time.perf_counter() - t0) / args.iters
    print("pallas fwd steady: %.2f ms  (%.1f fps)" % (dt * 1000, 1 / dt))

    if args.check:
        b = bin_gaussians(proj.means2d, proj.depths, proj.radii, W, H, MP)
        cfg = RasterConfig(max_pairs=MP,
                           max_per_tile=min(4096, int(b.tile_counts.max())
                                            + 1),
                           tile_batch=64)
        ref = rasterize_binned(proj, b, W, H, bg, cfg)
        print("color maxdiff vs XLA tiled:",
              float(jnp.abs(img - ref.color).max()))


if __name__ == "__main__":
    main()
