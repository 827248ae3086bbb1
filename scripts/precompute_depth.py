#!/usr/bin/env python3
"""Precompute mono-depth priors for FSGS/DNGaussian.

The reference runs MiDaS (torch.hub) in-process
(`FSGS/utils/depth_utils.py:3-11`) and DPT offline
(`DNGaussian/dpt/get_depth_map_for_llff_dtu.py:23-30`). In a zero-egress TPU
deployment the hub download is impossible, so depth maps are produced
offline by this script (on any machine with the cached weights) and written
to `<scene>/depth_maps/<stem>.npy`, where `depth/estimator.py` picks them up.

Usage:  python scripts/precompute_depth.py --source <scene> [--model DPT_Hybrid]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True)
    ap.add_argument("--images", default="images")
    ap.add_argument("--model", default="DPT_Hybrid")
    args = ap.parse_args()

    try:
        import torch
        midas = torch.hub.load("intel-isl/MiDaS", args.model,
                               skip_validation=True)
    except Exception as e:
        raise SystemExit(
            f"cannot load MiDaS ({e}); run on a machine with the torch.hub "
            "cache or network access, then copy depth_maps/ next to images/")
    midas.eval()

    from PIL import Image as PILImage

    img_dir = os.path.join(args.source, args.images)
    out_dir = os.path.join(args.source, "depth_maps")
    os.makedirs(out_dir, exist_ok=True)
    for name in sorted(os.listdir(img_dir)):
        stem, ext = os.path.splitext(name)
        if ext.lower() not in (".png", ".jpg", ".jpeg"):
            continue
        img = np.asarray(PILImage.open(os.path.join(img_dir, name)),
                         np.float32)[..., :3] / 255.0
        t = torch.tensor(img).permute(2, 0, 1)[None]
        t = (t - 0.5) / 0.5
        t = torch.nn.functional.interpolate(t, size=(384, 512),
                                            mode="bicubic",
                                            align_corners=False)
        with torch.no_grad():
            pred = midas(t)
            pred = torch.nn.functional.interpolate(
                pred.unsqueeze(1), size=img.shape[:2], mode="bicubic",
                align_corners=False)[0, 0]
        np.save(os.path.join(out_dir, stem + ".npy"),
                pred.numpy().astype(np.float32))
        print("wrote", stem)


if __name__ == "__main__":
    main()
