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
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def build_scene(root, seed, size, n_train=12, n_test=4):
    """Dense TPU-scale variant of the shared synthetic scene builder
    (`tpu_sweep.build_scene`): 20k-Gaussian cloud rendered through the
    Pallas kernel, mono-style depth priors, true-color dense init PLY."""
    from tpu_sweep import build_scene as shared_build_scene

    shared_build_scene(
        root, seed, w=size, n_train=n_train, n_test=n_test, n_gauss=20_000,
        depth_priors=True, extent=1.1, scale_range=(0.004, 0.03),
        use_pallas=True, init_points=4000, init_noise=0.0,
        init_colors="from_sh", depth_style="depth_median", progress=log)


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
