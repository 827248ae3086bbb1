#!/usr/bin/env python3
"""Training CLI — flag-compatible with the reference `train.py`
(`LGDWT-GS/train.py:356-384`), with `--method {3dgs,lgdwt,fsgs,dngaussian,
mult-dwtgs}` selecting the recipe (the reference ships these as four forked
repos; here they are configs over one TPU core)."""

import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    parser = ArgumentParser(description="Training script parameters")
    parser.add_argument("--method", type=str, default=os.environ.get(
        "GS_METHOD", "lgdwt"),
        choices=["3dgs", "lgdwt", "fsgs", "dngaussian", "mult-dwtgs"])
    # parse method first to pick defaults
    known, _ = parser.parse_known_args(argv)

    from sparse_view_3dgs_pack_tpu.config import (ModelParams,
                                                  OptimizationParams,
                                                  PipelineParams,
                                                  write_cfg_args)

    lp = ModelParams(parser)
    op = OptimizationParams(parser, method=known.method)
    pp = PipelineParams(parser)
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--debug_from", type=int, default=-1)
    parser.add_argument("--detect_anomaly", action="store_true", default=False)
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[7_000, 30_000])
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[7_000, 30_000])
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int,
                        default=[])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--disable_viewer", action="store_true", default=False)
    parser.add_argument("--dataset_type", type=str, default="llff",
                        choices=["llff", "dtu", "blender"],
                        help="DNGaussian trainer variant")
    parser.add_argument("--near_range", type=float, default=0.0,
                        help="DNGaussian spiral near-range pruning distance")
    parser.add_argument("--depth_estimator", type=str, default="auto",
                        choices=["auto", "precomputed", "midas", "none"])
    parser.add_argument("--profile", type=str, default="",
                        help="write a jax.profiler trace to this directory")
    parser.add_argument("--data_parallel", type=str, default="1",
                        help="views-per-step data parallelism over the "
                             "device mesh: an int, or 'auto' for every "
                             "visible device (3dgs/lgdwt methods)")
    args = parser.parse_args(argv)
    args.save_iterations.append(args.iterations)

    print("Optimizing " + args.model_path)

    import jax
    if args.data_device == "cpu" or os.environ.get("GS_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    if args.detect_anomaly:
        jax.config.update("jax_debug_nans", True)

    from sparse_view_3dgs_pack_tpu.utils.compile_cache import \
        enable_compile_cache
    enable_compile_cache()

    from sparse_view_3dgs_pack_tpu.utils.general import safe_state
    safe_state(args.quiet)

    os.makedirs(args.model_path, exist_ok=True)
    write_cfg_args(args.model_path, args)

    from sparse_view_3dgs_pack_tpu.train.recipes import train_method
    if args.profile:
        try:
            jax.profiler.start_trace(args.profile)
        except Exception as e:
            print(f"[profiler] disabled ({e})")
            args.profile = ""
    train_method(known.method, lp.extract(args), op.extract(args),
                 pp.extract(args), args)
    if args.profile:
        jax.profiler.stop_trace()

    print("\nTraining complete.")


if __name__ == "__main__":
    main()
