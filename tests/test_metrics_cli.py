"""Metrics CLIs in proxy-LPIPS mode (the default in this weightless env).

Regression: `metrics_dtu.py` keyed the results dict `LPIPS_proxy` but its
progress print read `results[method]['LPIPS']` — a guaranteed KeyError on
every DTU evaluation whenever `lpips_is_proxy()` is True (reference
contract: `DNGaussian/metrics_dtu.py:28-41`).
"""

import json

import numpy as np
import pytest
from PIL import Image


def _write_pair(dirpath, n=2, size=16, seed=0):
    rng = np.random.default_rng(seed)
    (dirpath / "renders").mkdir(parents=True)
    (dirpath / "gt").mkdir(parents=True)
    for i in range(n):
        img = (rng.random((size, size, 3)) * 255).astype(np.uint8)
        noisy = np.clip(img.astype(np.int32)
                        + rng.integers(-8, 8, img.shape), 0, 255)
        Image.fromarray(img).save(dirpath / "renders" / f"{i:05d}.png")
        Image.fromarray(noisy.astype(np.uint8)).save(
            dirpath / "gt" / f"{i:05d}.png")


@pytest.mark.timeout(300)
def test_evaluate_dtu_proxy_mode_no_crash(tmp_path):
    from metrics_dtu import evaluate_dtu
    from sparse_view_3dgs_pack_tpu.metrics.lpips import lpips_is_proxy

    model = tmp_path / "model"
    _write_pair(model / "test" / "ours_100")
    source = tmp_path / "scene"
    (source / "idr_masks").mkdir(parents=True)  # empty: full-image masks

    evaluate_dtu([str(model)], str(source))

    results = json.loads((model / "results_dtu.json").read_text())
    key = "LPIPS_proxy" if lpips_is_proxy() else "LPIPS"
    assert set(results["ours_100"]) == {"PSNR", "SSIM", key}
    assert np.isfinite(results["ours_100"]["PSNR"])


@pytest.mark.timeout(300)
def test_evaluate_proxy_key_in_results(tmp_path):
    from metrics import evaluate
    from sparse_view_3dgs_pack_tpu.metrics.lpips import lpips_is_proxy

    model = tmp_path / "model"
    _write_pair(model / "test" / "ours_100", seed=3)
    evaluate([str(model)])

    results = json.loads((model / "results.json").read_text())
    key = "LPIPS_proxy" if lpips_is_proxy() else "LPIPS"
    assert key in results["ours_100"]
