#!/usr/bin/env python3
"""COLMAP conversion CLI — flag-compatible with the reference `convert.py`
(`gaussian-splatting/convert.py:1-124`): runs the full reconstruction on
`<source>/input` images and lays out images/ + sparse/0 (+ optional resized
pyramids)."""

import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    parser = ArgumentParser("Colmap converter")
    parser.add_argument("--no_gpu", action="store_true")
    parser.add_argument("--skip_matching", action="store_true")
    parser.add_argument("--source_path", "-s", required=True, type=str)
    parser.add_argument("--camera", default="OPENCV", type=str)
    parser.add_argument("--colmap_executable", default="", type=str)
    parser.add_argument("--resize", action="store_true")
    parser.add_argument("--magick_executable", default="", type=str)
    args = parser.parse_args(argv)

    from sparse_view_3dgs_pack_tpu.preprocessing.full_colmap import \
        run_full_colmap

    colmap = args.colmap_executable or "colmap"
    run_full_colmap(args.source_path, "input", colmap, args.camera,
                    use_gpu=not args.no_gpu,
                    skip_matching=args.skip_matching, resize=args.resize)


if __name__ == "__main__":
    main()
