#!/usr/bin/env python3
"""Full 30k-iteration reference-schedule run at 800px on the real TPU:
scene generation → train.py → render.py → metrics.py (the complete CLI
pipeline). Records the PSNR curve, it/s, capacity growth events and the
final results.json. VERDICT round-2 item #4."""
import json
import math
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = "/tmp/fullrun"
SCENE = os.path.join(ROOT, "scene")
MODEL = os.path.join(ROOT, "model")
W = H = 800


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def build_scene():
    import numpy as np
    import jax, jax.numpy as jnp
    from PIL import Image as PILImage
    from sparse_view_3dgs_pack_tpu import testing
    from sparse_view_3dgs_pack_tpu.ops.projection import project_gaussians
    from sparse_view_3dgs_pack_tpu.ops.binning import bin_gaussians
    from sparse_view_3dgs_pack_tpu.ops.pallas.raster_vjp import \
        make_pallas_rasterizer
    from sparse_view_3dgs_pack_tpu.data.ply import store_point_cloud

    os.makedirs(os.path.join(SCENE, "train"), exist_ok=True)
    # a rich ground-truth cloud: fine structure everywhere keeps photometric
    # gradients alive → sustained densification over the full schedule
    cloud = testing.make_gaussian_cloud(11, 60_000, extent=1.2,
                                        scale_range=(0.002, 0.02))
    cams = testing.make_orbit_cameras(24, radius=3.5, width=W, height_px=H)
    raster = make_pallas_rasterizer(W, H, 3, inference=True)

    def render(cam):
        p = cam.params()
        proj = project_gaussians(
            means3d=jnp.asarray(cloud["xyz"]),
            scales=jnp.exp(jnp.asarray(cloud["scales"])),
            quats=jnp.asarray(cloud["quats"]),
            opacities=jax.nn.sigmoid(jnp.asarray(cloud["opacity"][:, 0])),
            viewmat=jnp.asarray(p.viewmat), full_proj=jnp.asarray(p.full_proj),
            cam_center=jnp.asarray(p.cam_center), tan_fovx=float(p.tan_fovx),
            tan_fovy=float(p.tan_fovy), width=W, height=H,
            sh=jnp.asarray(cloud["features"]), sh_degree=0)
        ba = bin_gaussians(proj.means2d, proj.depths, proj.radii, W, H,
                           1 << 21)
        color, _, _, _ = raster(proj.means2d, proj.depths, proj.conics,
                                proj.colors, proj.opacities, ba.ids,
                                ba.tile_starts, ba.tile_counts, jnp.zeros(3))
        return np.asarray(jnp.clip(color, 0, 1))

    frames = []
    for i, cam in enumerate(cams):
        img = render(cam)
        PILImage.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(SCENE, f"train/r_{i}.png"))
        w2c = np.eye(4)
        w2c[:3, :3] = cam.R.T
        w2c[:3, 3] = cam.T
        c2w = np.linalg.inv(w2c)
        c2w[:3, 1:3] *= -1
        frames.append({"file_path": f"./train/r_{i}",
                       "transform_matrix": c2w.tolist()})
        log(f"scene view {i} done")
    meta = {"camera_angle_x": cams[0].fovx, "frames": frames}
    for split in ("train", "test"):
        with open(os.path.join(SCENE, f"transforms_{split}.json"), "w") as f:
            json.dump(meta, f)
    rng = np.random.default_rng(0)
    sel = rng.choice(len(cloud["xyz"]), 5000, replace=False)
    store_point_cloud(os.path.join(SCENE, "points3d.ply"),
                      cloud["xyz"][sel] + rng.normal(0, 0.02, (5000, 3)),
                      rng.random((5000, 3)))
    log("scene written")


def run(cmd, logname):
    log("RUN", " ".join(cmd))
    t0 = time.time()
    with open(os.path.join(ROOT, logname), "w") as f:
        rc = subprocess.call(cmd, stdout=f, stderr=subprocess.STDOUT,
                             cwd="/root/repo")
    log(f"{logname}: rc={rc} in {time.time()-t0:.0f}s")
    return rc


def main():
    os.makedirs(ROOT, exist_ok=True)
    if not os.path.exists(os.path.join(SCENE, "transforms_train.json")):
        build_scene()
    py = sys.executable
    rc = run([py, "train.py", "--method", "lgdwt", "-s", SCENE, "-m", MODEL,
              "--iterations", "30000", "--test_iterations", "1000", "7000",
              "15000", "30000", "--save_iterations", "30000", "--eval",
              "--quiet", "--disable_viewer"], "train.log")
    if rc != 0:
        sys.exit(rc)
    run([py, "render.py", "-m", MODEL, "--skip_train"], "render.log")
    run([py, "metrics.py", "-m", MODEL], "metrics.log")
    for f in ("results.json",):
        p = os.path.join(MODEL, f)
        if os.path.exists(p):
            log(f, open(p).read())
    # PSNR curve + throughput scrape
    for line in open(os.path.join(ROOT, "train.log")):
        if "Evaluating" in line or "it/s" in line or "capacity" in line \
                or "bucket" in line:
            print(line.rstrip())


if __name__ == "__main__":
    main()
