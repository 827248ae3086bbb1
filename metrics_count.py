#!/usr/bin/env python3
"""Gaussian-count reporting (reference `DNGaussian/metrics_count.py`): counts
points in each saved point_cloud/iteration_N/point_cloud.ply."""

import json
import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--model_paths", "-m", required=True, nargs="+")
    args = parser.parse_args(argv)

    from sparse_view_3dgs_pack_tpu.data.ply import read_ply

    for model in args.model_paths:
        counts = {}
        pc_root = os.path.join(model, "point_cloud")
        if not os.path.isdir(pc_root):
            print(f"{model}: no point_cloud dir")
            continue
        for sub in sorted(os.listdir(pc_root)):
            ply_path = os.path.join(pc_root, sub, "point_cloud.ply")
            if os.path.exists(ply_path):
                counts[sub] = int(len(read_ply(ply_path)["x"]))
        print(model, counts)
        with open(os.path.join(model, "gaussian_counts.json"), "w") as f:
            json.dump(counts, f, indent=2)


if __name__ == "__main__":
    main()
