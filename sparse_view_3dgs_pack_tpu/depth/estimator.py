"""Mono-depth prior providers.

The reference loads MiDaS DPT_Hybrid from torch.hub at import time
(`FSGS/utils/depth_utils.py:3-11`) and DNGaussian ships a DPT checkpoint
(`DNGaussian/dpt/get_depth_map_for_llff_dtu.py:23-30`). In an offline TPU
deployment, hub downloads are unavailable, so depth priors are pluggable:

* ``precomputed`` — loads `<source>/depth_maps/<image-stem>.{npy,png}` (the
  output of `scripts/precompute_depth.py`, which runs MiDaS/DPT offline on a
  machine that has the weights).
* ``midas`` — in-process torch.hub MiDaS when the hub cache exists.
* ``none`` — disables depth priors (losses gated by has_depth=0).
* ``auto`` — precomputed if the directory exists, else midas if cached,
  else none (with a warning).
"""

from __future__ import annotations

import os
import warnings

import numpy as np


class DepthEstimator:
    available = False
    can_estimate = False   # can score arbitrary (novel) rendered images

    def depth_for_camera(self, cam):
        """(H, W) float mono depth for a training camera, or None."""
        return None

    def estimate(self, image_hwc: np.ndarray):
        """(H, W) mono depth for an arbitrary rendered image, or None."""
        return None


class NoDepth(DepthEstimator):
    pass


class PrecomputedDepth(DepthEstimator):
    available = True      # per-camera priors only
    can_estimate = False  # cannot score novel renders from disk

    def __init__(self, depth_dir: str):
        self.depth_dir = depth_dir

    def depth_for_camera(self, cam):
        stem = os.path.splitext(cam.image_name)[0]
        for ext in (".npy", ".png"):
            path = os.path.join(self.depth_dir, stem + ext)
            if os.path.exists(path):
                if ext == ".npy":
                    d = np.load(path)
                else:
                    import cv2
                    d = cv2.imread(path, -1).astype(np.float32)
                if d.shape != (cam.height, cam.width):
                    import cv2
                    d = cv2.resize(d, (cam.width, cam.height))
                return d.astype(np.float32)
        return None

    def estimate(self, image_hwc):
        return None  # cannot estimate novel renders from disk


class MidasDepth(DepthEstimator):
    """torch.hub MiDaS DPT_Hybrid — only usable when the hub cache already
    holds the weights (no downloads are attempted)."""

    def __init__(self):
        import torch
        self._torch = torch
        self.midas = torch.hub.load("intel-isl/MiDaS", "DPT_Hybrid",
                                    skip_validation=True)
        self.midas.eval()
        for p in self.midas.parameters():
            p.requires_grad = False
        self.available = True
        self.can_estimate = True

    def estimate(self, image_hwc):
        torch = self._torch
        h, w = image_hwc.shape[:2]
        img = torch.tensor(image_hwc, dtype=torch.float32).permute(2, 0, 1)
        norm = (img[None] - 0.5) / 0.5
        norm = torch.nn.functional.interpolate(
            norm, size=(384, 512), mode="bicubic", align_corners=False)
        with torch.no_grad():
            pred = self.midas(norm)
            pred = torch.nn.functional.interpolate(
                pred.unsqueeze(1), size=(h, w), mode="bicubic",
                align_corners=False)
        return pred[0, 0].numpy()

    def depth_for_camera(self, cam):
        if cam.image is None:
            return None
        return self.estimate(cam.image)


def get_depth_estimator(kind: str, source_path: str) -> DepthEstimator:
    depth_dir = os.path.join(source_path, "depth_maps")
    if kind == "precomputed" or (kind == "auto" and os.path.isdir(depth_dir)):
        return PrecomputedDepth(depth_dir)
    if kind in ("midas", "auto"):
        try:
            hub_dir = os.path.join(os.path.expanduser("~"), ".cache", "torch",
                                   "hub")
            if kind == "auto" and not os.path.isdir(hub_dir):
                raise RuntimeError("no torch.hub cache")
            return MidasDepth()
        except Exception as e:
            if kind == "midas":
                raise
            warnings.warn(f"depth priors disabled ({e}); run "
                          "scripts/precompute_depth.py to enable them")
    return NoDepth()
