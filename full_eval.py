#!/usr/bin/env python3
"""Full-evaluation driver — role of the reference `full_eval.py`: trains,
renders, and evaluates every scene of the standard benchmark sets
(MipNeRF360 / Tanks&Temples / DeepBlending layout) through the same
train/render/metrics CLIs."""

import os
import subprocess
import sys
from argparse import ArgumentParser

mipnerf360_outdoor_scenes = ["bicycle", "flowers", "garden", "stump",
                             "treehill"]
mipnerf360_indoor_scenes = ["room", "counter", "kitchen", "bonsai"]
tanks_and_temples_scenes = ["truck", "train"]
deep_blending_scenes = ["drjohnson", "playroom"]


def run(cmd):
    print(" ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)


def main(argv=None):
    parser = ArgumentParser(description="Full evaluation script parameters")
    parser.add_argument("--skip_training", action="store_true")
    parser.add_argument("--skip_rendering", action="store_true")
    parser.add_argument("--skip_metrics", action="store_true")
    parser.add_argument("--output_path", default="./eval")
    parser.add_argument("--mipnerf360", "-m360", type=str, default=None)
    parser.add_argument("--tanksandtemples", "-tat", type=str, default=None)
    parser.add_argument("--deepblending", "-db", type=str, default=None)
    parser.add_argument("--method", type=str, default="lgdwt")
    args, _ = parser.parse_known_args(argv)

    here = os.path.dirname(os.path.abspath(__file__))
    py = sys.executable

    jobs = []
    if args.mipnerf360:
        for s in mipnerf360_outdoor_scenes:
            jobs.append((os.path.join(args.mipnerf360, s), s, ["-i",
                                                               "images_4"]))
        for s in mipnerf360_indoor_scenes:
            jobs.append((os.path.join(args.mipnerf360, s), s, ["-i",
                                                               "images_2"]))
    if args.tanksandtemples:
        for s in tanks_and_temples_scenes:
            jobs.append((os.path.join(args.tanksandtemples, s), s, []))
    if args.deepblending:
        for s in deep_blending_scenes:
            jobs.append((os.path.join(args.deepblending, s), s, []))

    if not jobs:
        print("no dataset roots given; use -m360/-tat/-db")
        return

    all_model_paths = []
    for source, scene, extra in jobs:
        model_path = os.path.join(args.output_path, scene)
        all_model_paths.append(model_path)
        if not args.skip_training:
            run([py, os.path.join(here, "train.py"), "--method", args.method,
                 "-s", source, "-m", model_path, "--eval", "--quiet",
                 "--disable_viewer"] + extra)
        if not args.skip_rendering:
            run([py, os.path.join(here, "render.py"), "-m", model_path,
                 "--quiet", "--eval", "--skip_train"])
    if not args.skip_metrics:
        run([py, os.path.join(here, "metrics.py"), "-m"] + all_model_paths)


if __name__ == "__main__":
    main()
