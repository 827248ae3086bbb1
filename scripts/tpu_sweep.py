#!/usr/bin/env python3
"""Full 4-method `gs_benchmark runall` sweep on the real TPU.

Builds two synthetic scenes whose images are *real renders* of a known
Gaussian cloud (so training has a consistent multi-view signal), writes a
harness YAML covering {3dgs, lgdwt, fsgs, dngaussian}, and runs the
subprocess train→render→metrics pipeline exactly as a user would
(reference contract: `fs3dgs_benchmark/benchmark.py:283-474`). Results
land in <workdir>/bench_runs/<run_id>/{summary.csv,tables/}.

Usage: python scripts/tpu_sweep.py [workdir] [--iters N] [--dry]
"""
import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def build_scene(root, seed, w=256, n_train=12, n_test=4, n_gauss=1500,
                depth_priors=False, extent=0.9, scale_range=(0.04, 0.12),
                use_pallas=False, init_points=400, init_noise=0.04,
                init_colors="random", depth_style="invdepth_affine",
                progress=None):
    """Renderable synthetic Blender-format scene: a ground-truth Gaussian
    cloud rendered from orbit cameras (train + azimuth-offset test ring),
    a sparse init PLY, and optionally mono-style depth priors.

    The single scene builder for every sweep/A-B script (tpu_sweep,
    tpu_runall_sweep, fsgs_ab). `use_pallas` renders through the Pallas
    kernel (TPU) instead of the XLA reference path; `depth_style` picks the
    prior flavour — both are DPT-style relative disparity (higher = closer,
    0..255, zero where uncovered): "invdepth_affine" additionally applies an
    affine distortion (the scale/shift ambiguity a real MiDaS prior has,
    which alignment must undo), "depth_median" is the plain normalized map.
    `init_colors`: "random" or "from_sh" (the cloud's own dc colors)."""
    import jax
    import jax.numpy as jnp
    from PIL import Image as PILImage

    from sparse_view_3dgs_pack_tpu import testing
    from sparse_view_3dgs_pack_tpu.data.ply import store_point_cloud
    from sparse_view_3dgs_pack_tpu.ops.projection import project_gaussians

    cloud = testing.make_gaussian_cloud(seed, n_gauss, extent=extent,
                                        scale_range=scale_range)

    if use_pallas:
        from sparse_view_3dgs_pack_tpu.ops.binning import bin_gaussians
        from sparse_view_3dgs_pack_tpu.ops.pallas.raster_vjp import \
            make_pallas_rasterizer
        raster = make_pallas_rasterizer(w, w, 3, inference=True)
    else:
        from sparse_view_3dgs_pack_tpu.ops.rasterize_tiles import (
            RasterConfig, rasterize)

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
            width=w, height=w, sh=jnp.asarray(cloud["features"]),
            sh_degree=0)
        if use_pallas:
            ba = bin_gaussians(proj.means2d, proj.depths, proj.radii, w, w,
                               1 << 19)
            color, _, depth, alpha = raster(
                proj.means2d, proj.depths, proj.conics, proj.colors,
                proj.opacities, ba.ids, ba.tile_starts, ba.tile_counts,
                jnp.zeros(3))
            return np.asarray(color), np.asarray(depth), np.asarray(alpha)
        out = rasterize(proj, w, w, jnp.zeros(3),
                        RasterConfig(max_pairs=1 << 17, max_per_tile=512,
                                     tile_batch=16))
        return (np.asarray(out.color), np.asarray(out.depth),
                np.asarray(out.alpha))

    def prior(depth, alpha):
        """Mono prior in the MiDaS/DPT convention the consumers expect:
        relative DISPARITY (higher = closer). `fsgs_depth_loss` correlates
        -prior (and 1/(prior+200)) against rendered depth, and `dng_loop`
        ingests 255 - prior — a true-DEPTH prior here ANTI-correlates and
        makes the Pearson term destructive (this exact bug made FSGS score
        below DNGaussian in the round-3 sweep)."""
        cov = alpha > 0.3
        disp = np.where(cov, 1.0 / np.maximum(depth, 1e-3), 0.0)
        dmin = disp[cov].min() if cov.any() else 0.0
        dmax = disp.max() if cov.any() else 1.0
        disp255 = np.where(cov, 255.0 * (disp - dmin)
                           / max(dmax - dmin, 1e-6), 0.0)
        if depth_style == "invdepth_affine":
            # keep the affine scale/shift ambiguity a real MiDaS map has
            # (alignment must undo it); still disparity-monotone
            return 2.3 * disp255 + 0.7
        return disp255

    meta = {}
    for split, n, phase in (("train", n_train, 0.0), ("test", n_test, 0.26)):
        os.makedirs(os.path.join(root, split), exist_ok=True)
        # offset test azimuths so splits don't coincide
        cams = testing.make_orbit_cameras(n, radius=3.5, height=1.2,
                                          width=w, height_px=w, phase=phase)
        frames = []
        for i, cam in enumerate(cams):
            img, d, alpha = render(cam)
            if depth_priors and split == "train":
                ddir = os.path.join(root, "depth_maps")
                os.makedirs(ddir, exist_ok=True)
                np.save(os.path.join(ddir, f"r_{i}.npy"),
                        prior(d, alpha).astype(np.float32))
            arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
            PILImage.fromarray(arr).save(
                os.path.join(root, f"{split}/r_{i}.png"))
            w2c = np.eye(4)
            w2c[:3, :3] = cam.R.T
            w2c[:3, 3] = cam.T
            c2w = np.linalg.inv(w2c)
            c2w[:3, 1:3] *= -1
            frames.append({"file_path": f"./{split}/r_{i}",
                           "transform_matrix": c2w.tolist()})
        meta[split] = {"camera_angle_x": cams[0].fovx, "frames": frames}
        if progress:
            progress(f"{root}: {split} x{n} rendered")
    for split in ("train", "test"):
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump(meta[split], f)
    rng = np.random.default_rng(seed)
    init_points = min(init_points, n_gauss)
    sel = rng.choice(n_gauss, init_points, replace=False)
    if init_colors == "from_sh":
        import jax.nn
        colors = np.asarray(jax.nn.sigmoid(
            jnp.asarray(cloud["features"][:, 0, :])))[sel]
    else:
        colors = rng.random((init_points, 3))
    store_point_cloud(
        os.path.join(root, "points3d.ply"),
        cloud["xyz"][sel] + rng.normal(0, init_noise, (init_points, 3)),
        colors)
    return root


def write_config(workdir, scene_dirs, iters):
    import yaml

    common_argmap = {
        "source_path": "source_path", "model_path": "model_path",
        "sh_degree": "sh_degree", "iterations": "iterations",
        "test_iterations": "test_iterations",
        "save_iterations": "save_iterations", "eval": "eval",
        "quiet": "quiet", "disable_viewer": "disable_viewer",
        "method": "method", "dataset_type": "dataset_type",
    }

    def model(name, method, extra_args=None):
        args = {"iterations": iters, "sh_degree": 2, "eval": True}
        args.update(extra_args or {})
        it = args["iterations"]
        args.setdefault("test_iterations", [it])
        args.setdefault("save_iterations", [it])
        return {"name": name, "repo_dir": REPO, "entry": "./train.py",
                "render_entry": "./render.py",
                "metrics_entry": "./metrics.py", "method": method,
                "arg_map": dict(common_argmap), "args": args}

    cfg = {
        "defaults": {
            "env": {},
            "common_args": {"disable_viewer": True, "quiet": True,
                            "method": None},
            "dataset_root": os.path.join(workdir, "data"),
            "out_root": os.path.join(workdir, "bench_runs"),
            "seeds": [42],
            "run_render": True,
            "run_metrics": True,
            "run_desc": "tpu-4method-sweep",
        },
        "scenes": [{"name": os.path.basename(d), "source_path": d}
                   for d in scene_dirs],
        "models": [
            model("3dgs", "3dgs"),
            model("lgdwt", "lgdwt"),
            model("fsgs", "fsgs",
                  {"iterations": max(iters // 2, 500)}),
            model("dngaussian", "dngaussian",
                  {"iterations": max(iters // 2, 500),
                   "dataset_type": "blender"}),
        ],
        "grid": {},
        "overrides": {},
    }
    path = os.path.join(workdir, "sweep.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default="/tmp/tpu_sweep")
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--dry", action="store_true")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    scene_dirs = []
    for name, seed in (("syntha", 7), ("synthb", 23)):
        d = os.path.join(args.workdir, "data", name)
        if not os.path.exists(os.path.join(d, "transforms_train.json")):
            os.makedirs(d, exist_ok=True)
            print(f"[sweep] building scene {name}", flush=True)
            build_scene(d, seed)
        scene_dirs.append(d)

    cfg_path = write_config(args.workdir, scene_dirs, args.iters)
    from sparse_view_3dgs_pack_tpu.benchmark.benchmark import main as runall
    runall(["-c", cfg_path] + (["--dry"] if args.dry else []))


if __name__ == "__main__":
    main()
