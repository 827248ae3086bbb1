#!/usr/bin/env python3
"""Full 4-method `gs_benchmark runall` sweep on the real TPU (BASELINE
config #5 shape): two synthetic scenes x {3dgs, lgdwt, fsgs, dngaussian},
train -> render -> metrics through the real harness subprocess pipeline
(`benchmark/benchmark.py`), then summary.csv + LaTeX/PNG tables.

The harness contract was previously e2e'd on CPU only; this exercises it
at real-TPU scale and records the artifacts for PARITY.md.

Usage: python scripts/tpu_runall_sweep.py [workdir] [--iters N] [--size W]
"""
import argparse
import json
import math
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def build_scene(root, seed, size, n_train=12, n_test=4):
    """Renderable synthetic Blender-format scene: ground-truth gaussian
    cloud rendered from orbit cameras (train + offset test ring), sparse
    init PLY, and precomputed depth priors for the few-shot methods."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from PIL import Image as PILImage

    from sparse_view_3dgs_pack_tpu import testing
    from sparse_view_3dgs_pack_tpu.data.ply import store_point_cloud
    from sparse_view_3dgs_pack_tpu.ops.binning import bin_gaussians
    from sparse_view_3dgs_pack_tpu.ops.pallas.raster_vjp import \
        make_pallas_rasterizer
    from sparse_view_3dgs_pack_tpu.ops.projection import project_gaussians

    W = H = size
    cloud = testing.make_gaussian_cloud(seed, 20_000, extent=1.1,
                                        scale_range=(0.004, 0.03))
    raster = make_pallas_rasterizer(W, H, 3, inference=True)

    def render(cam):
        p = cam.params()
        proj = project_gaussians(
            means3d=jnp.asarray(cloud["xyz"]),
            scales=jnp.exp(jnp.asarray(cloud["scales"])),
            quats=jnp.asarray(cloud["quats"]),
            opacities=jax.nn.sigmoid(jnp.asarray(cloud["opacity"][:, 0])),
            viewmat=jnp.asarray(p.viewmat),
            full_proj=jnp.asarray(p.full_proj),
            cam_center=jnp.asarray(p.cam_center),
            tan_fovx=float(p.tan_fovx), tan_fovy=float(p.tan_fovy),
            width=W, height=H, sh=jnp.asarray(cloud["features"]),
            sh_degree=0)
        ba = bin_gaussians(proj.means2d, proj.depths, proj.radii, W, H,
                           1 << 19)
        color, _, depth, alpha = raster(
            proj.means2d, proj.depths, proj.conics, proj.colors,
            proj.opacities, ba.ids, ba.tile_starts, ba.tile_counts,
            jnp.zeros(3))
        return (np.asarray(jnp.clip(color, 0, 1)), np.asarray(depth),
                np.asarray(alpha))

    os.makedirs(os.path.join(root, "depth_maps"), exist_ok=True)
    metas = {}
    for split, n, phase in (("train", n_train, 0.0), ("test", n_test, 0.26)):
        os.makedirs(os.path.join(root, split), exist_ok=True)
        frames = []
        cams = testing.make_orbit_cameras(n, radius=3.5, width=W,
                                          height_px=H, phase=phase)
        for i, cam in enumerate(cams):
            img, depth, alpha = render(cam)
            name = f"r_{i}"
            PILImage.fromarray((img * 255).astype(np.uint8)).save(
                os.path.join(root, split, name + ".png"))
            if split == "train":
                # a real mono-style prior: the true rendered depth where
                # covered, median elsewhere (what DPT would roughly give)
                d = np.where(alpha > 0.3, depth,
                             np.median(depth[alpha > 0.3]))
                np.save(os.path.join(root, "depth_maps", name + ".npy"),
                        d.astype(np.float32))
            w2c = np.eye(4)
            w2c[:3, :3] = cam.R.T
            w2c[:3, 3] = cam.T
            c2w = np.linalg.inv(w2c)
            c2w[:3, 1:3] *= -1
            frames.append({"file_path": f"./{split}/{name}",
                           "transform_matrix": c2w.tolist()})
        metas[split] = {"camera_angle_x": cams[0].fovx, "frames": frames}
        log(f"{root}: {split} x{n} rendered")
    for split, meta in metas.items():
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump(meta, f)
    rng = np.random.default_rng(seed)
    sel = rng.choice(len(cloud["xyz"]), 4000, replace=False)
    store_point_cloud(
        os.path.join(root, "points3d.ply"),
        np.asarray(cloud["xyz"])[sel],
        np.asarray(jax.nn.sigmoid(jnp.asarray(
            cloud["features"][:, 0, :])) )[sel])


CONFIG_TMPL = """\
defaults:
  env: {{}}
  common_args:
    disable_viewer: true
    quiet: true
  dataset_root: {data_root}
  out_root: {out_root}
  seeds: [42]
  run_render: true
  run_metrics: true
  run_desc: "tpu-runall-r3"

scenes:
  - name: "orb_a"
    source_path: "${{defaults.dataset_root}}/orb_a"
  - name: "orb_b"
    source_path: "${{defaults.dataset_root}}/orb_b"

models:
  - name: "3dgs"
    repo_dir: {repo}
    entry: ./train.py
    render_entry: ./render.py
    metrics_entry: ./metrics.py
    method: 3dgs
    needs_cfg_args_file: false
    arg_map: &argmap
      source_path: source_path
      model_path: model_path
      sh_degree: sh_degree
      iterations: iterations
      test_iterations: test_iterations
      save_iterations: save_iterations
      eval: eval
      n_views: n_views
      quiet: quiet
      disable_viewer: disable_viewer
      densify_grad_threshold: densify_grad_threshold
      depth_estimator: depth_estimator
    args: &baseargs
      iterations: {iters}
      sh_degree: 2
      test_iterations: [{iters}]
      save_iterations: [{iters}]
      eval: true
      densify_grad_threshold: {grad_thresh}

  - name: "lgdwt"
    repo_dir: {repo}
    entry: ./train.py
    render_entry: ./render.py
    metrics_entry: ./metrics.py
    method: lgdwt
    arg_map: *argmap
    args: *baseargs

  - name: "fsgs"
    repo_dir: {repo}
    entry: ./train.py
    render_entry: ./render.py
    metrics_entry: ./metrics.py
    method: fsgs
    arg_map: *argmap
    args:
      <<: *baseargs
      n_views: 3
      depth_estimator: precomputed

  - name: "dngaussian"
    repo_dir: {repo}
    entry: ./train.py
    render_entry: ./render.py
    metrics_entry: ./metrics.py
    method: dngaussian
    arg_map: *argmap
    args:
      <<: *baseargs
      n_views: 3
      depth_estimator: precomputed

grid: {{}}
overrides: {{}}
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default="/tmp/runall_r3")
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--skip_scenes", action="store_true")
    args = ap.parse_args()

    data_root = os.path.join(args.workdir, "data")
    out_root = os.path.join(args.workdir, "runs")
    os.makedirs(data_root, exist_ok=True)

    if not args.skip_scenes:
        for name, seed in (("orb_a", 11), ("orb_b", 23)):
            build_scene(os.path.join(data_root, name), seed, args.size)

    # viewspace grads scale ~1/H: 0.0002 is the reference default at ~800px
    grad_thresh = 0.0002 * 800.0 / args.size
    cfg_path = os.path.join(args.workdir, "sweep.yaml")
    with open(cfg_path, "w") as f:
        f.write(CONFIG_TMPL.format(data_root=data_root, out_root=out_root,
                                   repo=REPO, iters=args.iters,
                                   grad_thresh=grad_thresh))
    log("config written:", cfg_path)

    t0 = time.time()
    out_dir = os.path.join(out_root, "r3_sweep")
    rc = subprocess.call(
        [sys.executable, "-m", "sparse_view_3dgs_pack_tpu.benchmark.cli",
         "runall", "-c", cfg_path, "--python", sys.executable,
         "--out_dir", out_dir, "--resume"], cwd=REPO)
    log(f"runall rc={rc} in {time.time() - t0:.0f}s")

    summary = os.path.join(out_dir, "summary.csv")
    if os.path.exists(summary):
        print(open(summary).read())
    return rc


if __name__ == "__main__":
    sys.exit(main())
