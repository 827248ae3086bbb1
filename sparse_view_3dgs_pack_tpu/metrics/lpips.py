"""LPIPS in JAX — VGG16 backbone + linear heads (reference `lpipsPyTorch/`,
`modules/networks.py:12-89`, `modules/lpips.py`).

Pretrained torchvision VGG16 weights cannot be downloaded in this offline
environment. Behaviour:

* If an npz with the converted weights exists (``LPIPS_WEIGHTS_NPZ`` env var,
  or ``lpips_vgg.npz`` next to this file), the metric is the true LPIPS(VGG)
  and matches the reference numerically.
* Otherwise the same architecture runs with fixed-seed He-initialised
  weights and unit linear heads — a deterministic perceptual *proxy*
  (random-feature LPIPS correlates with perceptual distance but does NOT
  match published LPIPS values). ``lpips_backend()`` reports which one is in
  use; harness outputs record it.

To convert weights on a machine with torchvision::

    import numpy as np, torchvision, lpips  # reference env
    vgg = torchvision.models.vgg16(weights='IMAGENET1K_V1').features
    heads = lpips.LPIPS(net='vgg')  # for lin weights
    np.savez('lpips_vgg.npz',
             **{f'conv{i}': vgg[j].weight.detach().numpy() for i, j in
                enumerate([0,2,5,7,10,12,14,17,19,21,24,26,28])},
             **{f'bias{i}': vgg[j].bias.detach().numpy() for i, j in
                enumerate([0,2,5,7,10,12,14,17,19,21,24,26,28])},
             **{f'lin{i}': heads.lins[i].model[1].weight.detach().numpy()
                for i in range(5)})
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 feature config: (out_channels, pool_before) per conv
_VGG_CFG = [(64, False), (64, False),
            (128, True), (128, False),
            (256, True), (256, False), (256, False),
            (512, True), (512, False), (512, False),
            (512, True), (512, False), (512, False)]
# LPIPS taps the activations after convs 1, 3, 6, 9, 12 (relu1_2 … relu5_3)
_TAPS = [1, 3, 6, 9, 12]

_MEAN = np.array([-0.030, -0.088, -0.188], np.float32)
_STD = np.array([0.458, 0.448, 0.450], np.float32)


def _weights_path():
    cand = os.environ.get("LPIPS_WEIGHTS_NPZ")
    if cand and os.path.exists(cand):
        return cand
    local = os.path.join(os.path.dirname(__file__), "lpips_vgg.npz")
    return local if os.path.exists(local) else None


@lru_cache(maxsize=1)
def _load_weights():
    path = _weights_path()
    if path:
        data = np.load(path)
        convs = []
        in_c = 3
        for i, (out_c, _) in enumerate(_VGG_CFG):
            w = data[f"conv{i}"]          # torch (out, in, kh, kw)
            b = data[f"bias{i}"]
            convs.append((jnp.asarray(w.transpose(2, 3, 1, 0)),
                          jnp.asarray(b)))
            in_c = out_c
        lins = [jnp.asarray(data[f"lin{i}"][:, :, 0, 0][0])  # (C,)
                for i in range(5)]
        return convs, lins, "vgg16-pretrained"

    # deterministic random-feature fallback
    key = jax.random.PRNGKey(1234)
    convs = []
    in_c = 3
    for out_c, _ in _VGG_CFG:
        key, k1 = jax.random.split(key)
        fan_in = in_c * 9
        w = jax.random.normal(k1, (3, 3, in_c, out_c)) * np.sqrt(2.0 / fan_in)
        convs.append((w, jnp.zeros(out_c)))
        in_c = out_c
    lins = [jnp.ones(_VGG_CFG[t][0]) / _VGG_CFG[t][0] for t in _TAPS]
    return convs, lins, "random-features-proxy"


def lpips_backend() -> str:
    return _load_weights()[2]


def _vgg_features(x, convs):
    """x: (H, W, 3) in [0,1] → list of tapped activations."""
    h = (x * 2.0 - 1.0 - _MEAN) / _STD
    h = h[None]  # NHWC
    feats = []
    for i, ((w, b), (out_c, pool)) in enumerate(zip(convs, _VGG_CFG)):
        if pool:
            h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        h = jax.lax.conv_general_dilated(
            h, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        h = jax.nn.relu(h)
        if i in _TAPS:
            feats.append(h[0])
    return feats


@jax.jit
def _lpips_jit(x, y):
    convs, lins, _ = _load_weights()
    fx = _vgg_features(x, convs)
    fy = _vgg_features(y, convs)
    total = jnp.zeros(())
    for f1, f2, lin in zip(fx, fy, lins):
        n1 = f1 / jnp.maximum(jnp.linalg.norm(f1, axis=-1, keepdims=True),
                              1e-10)
        n2 = f2 / jnp.maximum(jnp.linalg.norm(f2, axis=-1, keepdims=True),
                              1e-10)
        d = (n1 - n2) ** 2
        total = total + (d * lin).sum(-1).mean()
    return total


def lpips(img1, img2, net_type: str = "vgg"):
    """img: (H, W, 3) float in [0, 1]. Only the vgg backbone is provided (the
    reference defaults to vgg, `lpipsPyTorch/__init__.py:7-21`)."""
    assert net_type == "vgg", "only vgg LPIPS is implemented"
    return _lpips_jit(jnp.asarray(img1), jnp.asarray(img2))
