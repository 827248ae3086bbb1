#!/usr/bin/env python3
"""Masked DTU evaluation (reference `DNGaussian/metrics_dtu.py:28-41`):
metrics are computed only inside the object masks (`idr_masks/`), with the
background forced to black in both render and GT."""

import json
import os
import sys
from argparse import ArgumentParser
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def evaluate_dtu(model_paths, source_path):
    import numpy as np
    from PIL import Image as PILImage

    import jax.numpy as jnp
    from sparse_view_3dgs_pack_tpu.metrics.lpips import lpips_is_proxy
    from sparse_view_3dgs_pack_tpu.metrics import (lpips, psnr_metric,
                                                   ssim_metric)

    for scene_dir in model_paths:
        results = {}
        test_dir = Path(scene_dir) / "test"
        if not test_dir.exists():
            print(f"{scene_dir}: no test renders")
            continue
        for method in os.listdir(test_dir):
            renders_dir = test_dir / method / "renders"
            gt_dir = test_dir / method / "gt"
            mask_dir = Path(source_path) / "idr_masks"
            import jax
            fused = jax.jit(lambda r, g: (ssim_metric(r, g),
                                          psnr_metric(r, g), lpips(r, g)))
            outs = []
            for fname in sorted(os.listdir(renders_dir)):
                render = np.asarray(PILImage.open(renders_dir / fname),
                                    np.float32)[..., :3] / 255
                gt = np.asarray(PILImage.open(gt_dir / fname),
                                np.float32)[..., :3] / 255
                mask_path = mask_dir / fname
                if mask_path.exists():
                    mask = np.asarray(
                        PILImage.open(mask_path).resize(
                            (render.shape[1], render.shape[0])),
                        np.float32)
                    if mask.ndim == 3:
                        mask = mask[..., 0]
                    mask = (mask > 127.5)[..., None].astype(np.float32)
                else:
                    mask = np.ones_like(render[..., :1])
                render = render * mask
                gt = gt * mask
                # one fused dispatch per view, fetched after the loop
                # (same pipelining as metrics.py)
                outs.append(fused(jnp.asarray(render), jnp.asarray(gt)))
            psnrs = [float(p) for _, p, _ in outs]
            ssims = [float(s) for s, _, _ in outs]
            lpipss = [float(l) for _, _, l in outs]
            lpips_key = "LPIPS_proxy" if lpips_is_proxy() else "LPIPS"
            results[method] = {
                "PSNR": sum(psnrs) / len(psnrs),
                "SSIM": sum(ssims) / len(ssims),
                lpips_key: sum(lpipss) / len(lpipss),
            }
            print(f"{scene_dir} {method}: PSNR {results[method]['PSNR']:.3f} "
                  f"SSIM {results[method]['SSIM']:.4f} "
                  f"{lpips_key} {results[method][lpips_key]:.4f}")
        with open(os.path.join(scene_dir, "results_dtu.json"), "w") as f:
            json.dump(results, f, indent=2)


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--model_paths", "-m", required=True, nargs="+")
    parser.add_argument("--source_path", "-s", required=True)
    args = parser.parse_args(argv)
    from sparse_view_3dgs_pack_tpu.utils.compile_cache import \
        enable_compile_cache
    enable_compile_cache()
    evaluate_dtu(args.model_paths, args.source_path)


if __name__ == "__main__":
    main()
