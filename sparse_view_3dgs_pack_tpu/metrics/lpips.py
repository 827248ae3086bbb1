"""LPIPS in JAX — VGG16 / AlexNet / SqueezeNet backbones + linear heads
(reference `lpipsPyTorch/modules/networks.py:12-89`, `modules/lpips.py`,
`lpipsPyTorch/__init__.py:7-21`).

Input scaling matches the reference EXACTLY: its `BaseNet.z_score` applies
`(x - mean) / std` directly to the [0, 1] tensors `metrics.py` feeds it —
it does NOT rescale to [-1, 1] first (a known quirk of that implementation;
published numbers like DNGaussian's LLFF LPIPS 0.228 were produced with it).

Pretrained torchvision weights cannot be downloaded in this offline
environment. Behaviour:

* If an npz with converted weights exists (``LPIPS_WEIGHTS_NPZ`` env var —
  a path, or a ``{net}``-templated path — or ``lpips_{net}.npz`` next to
  this file), the metric is the true LPIPS for that backbone and matches
  the reference numerically (golden-tested against an independent torch
  implementation in ``tests/test_lpips.py``).
* Otherwise the same architecture runs with fixed-seed He-initialised
  weights and uniform linear heads — a deterministic perceptual *proxy*
  (random-feature LPIPS correlates with perceptual distance but does NOT
  match published LPIPS values). ``lpips_backend()`` reports which one is
  in use; harness outputs record it and keep proxy values in a separate
  ``LPIPS_proxy`` column.

To convert weights on a machine with torchvision (vgg shown; alex uses
``alexnet(...).features`` convs 0,3,6,8,10; squeeze uses
``squeezenet1_1(...).features`` — see ``_SQUEEZE_FIRES`` for the key
schema)::

    import numpy as np, torchvision, lpips  # reference env
    vgg = torchvision.models.vgg16(weights='IMAGENET1K_V1').features
    heads = lpips.LPIPS(net='vgg')
    idx = [0,2,5,7,10,12,14,17,19,21,24,26,28]
    np.savez('lpips_vgg.npz',
             **{f'conv{i}': vgg[j].weight.detach().numpy()
                for i, j in enumerate(idx)},
             **{f'bias{i}': vgg[j].bias.detach().numpy()
                for i, j in enumerate(idx)},
             **{f'lin{i}': heads.lins[i].model[1].weight.detach().numpy()
                for i in range(5)})
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------- configs
# VGG16 feature stack: (out_channels, pool_before) per 3x3 conv
_VGG_CFG = [(64, False), (64, False),
            (128, True), (128, False),
            (256, True), (256, False), (256, False),
            (512, True), (512, False), (512, False),
            (512, True), (512, False), (512, False)]
# LPIPS taps after convs 1, 3, 6, 9, 12 (relu1_2 … relu5_3)
_VGG_TAPS = [1, 3, 6, 9, 12]

# AlexNet features: (out_c, kernel, stride, padding, pool_before)
_ALEX_CFG = [(64, 11, 4, 2, False),
             (192, 5, 1, 2, True),
             (384, 3, 1, 1, True),
             (256, 3, 1, 1, False),
             (256, 3, 1, 1, False)]
# taps after every relu (reference target_layers [2,5,8,10,12])

# SqueezeNet1_1 fire modules: (squeeze_c, expand_c) — out = 2*expand_c
_SQUEEZE_FIRES = [(16, 64), (16, 64), (32, 128), (32, 128),
                  (48, 192), (48, 192), (64, 256), (64, 256)]
# pools (ceil mode, k3 s2) come before fire indices 0, 2, 4; taps after
# conv0-relu and fires 1, 3, 4, 5, 6, 7 (reference [2,5,8,10,11,12,13] over
# the flattened squeezenet1_1 features, 1-based)
_SQUEEZE_POOL_BEFORE = {0, 2, 4}
_SQUEEZE_TAP_FIRES = [1, 3, 4, 5, 6, 7]

_CHANNELS = {"vgg": [64, 128, 256, 512, 512],
             "alex": [64, 192, 384, 256, 256],
             "squeeze": [64, 128, 256, 384, 384, 512, 512]}

_MEAN = np.array([-0.030, -0.088, -0.188], np.float32)
_STD = np.array([0.458, 0.448, 0.450], np.float32)

NET_TYPES = ("vgg", "alex", "squeeze")


# ---------------------------------------------------------------- weights
def _weights_path(net_type):
    cand = os.environ.get("LPIPS_WEIGHTS_NPZ")
    if cand:
        cand = cand.replace("{net}", net_type)
        if os.path.exists(cand):
            return cand
    local = os.path.join(os.path.dirname(__file__),
                         f"lpips_{net_type}.npz")
    if os.path.exists(local):
        return local
    return None


def _he_conv(key, kh, kw, in_c, out_c):
    fan_in = in_c * kh * kw
    return jax.random.normal(key, (kh, kw, in_c, out_c)) * np.sqrt(
        2.0 / fan_in)


def _torch2hwio(w):
    """torch conv weight (out, in, kh, kw) → HWIO."""
    return jnp.asarray(np.asarray(w).transpose(2, 3, 1, 0))


def _load_lins(data, n):
    return [jnp.asarray(data[f"lin{i}"][:, :, 0, 0][0]) for i in range(n)]


@lru_cache(maxsize=3)
def _load_weights(net_type: str):
    """→ (params, backend_tag). params layout depends on the backbone."""
    path = _weights_path(net_type)
    if net_type == "vgg":
        if path:
            data = np.load(path)
            convs = [(_torch2hwio(data[f"conv{i}"]),
                      jnp.asarray(data[f"bias{i}"]))
                     for i in range(len(_VGG_CFG))]
            return (convs, _load_lins(data, 5)), "vgg16-pretrained"
        key = jax.random.PRNGKey(1234)
        convs, in_c = [], 3
        for out_c, _ in _VGG_CFG:
            key, k1 = jax.random.split(key)
            convs.append((_he_conv(k1, 3, 3, in_c, out_c),
                          jnp.zeros(out_c)))
            in_c = out_c
        lins = [jnp.ones(c) / c for c in _CHANNELS["vgg"]]
        return (convs, lins), "random-features-proxy"

    if net_type == "alex":
        if path:
            data = np.load(path)
            convs = [(_torch2hwio(data[f"conv{i}"]),
                      jnp.asarray(data[f"bias{i}"]))
                     for i in range(len(_ALEX_CFG))]
            return (convs, _load_lins(data, 5)), "alexnet-pretrained"
        key = jax.random.PRNGKey(2345)
        convs, in_c = [], 3
        for out_c, k, _, _, _ in _ALEX_CFG:
            key, k1 = jax.random.split(key)
            convs.append((_he_conv(k1, k, k, in_c, out_c),
                          jnp.zeros(out_c)))
            in_c = out_c
        lins = [jnp.ones(c) / c for c in _CHANNELS["alex"]]
        return (convs, lins), "random-features-proxy"

    assert net_type == "squeeze"
    if path:
        data = np.load(path)
        conv0 = (_torch2hwio(data["conv0"]), jnp.asarray(data["bias0"]))
        fires = []
        for j in range(len(_SQUEEZE_FIRES)):
            fires.append(tuple(
                (_torch2hwio(data[f"f{j}_{part}_w"]),
                 jnp.asarray(data[f"f{j}_{part}_b"]))
                for part in ("squeeze", "e1", "e3")))
        return (conv0, fires, _load_lins(data, 7)), "squeezenet-pretrained"
    key = jax.random.PRNGKey(3456)
    key, k0 = jax.random.split(key)
    conv0 = (_he_conv(k0, 3, 3, 3, 64), jnp.zeros(64))
    fires, in_c = [], 64
    for sq_c, ex_c in _SQUEEZE_FIRES:
        key, ks, k1, k3 = jax.random.split(key, 4)
        fires.append(((_he_conv(ks, 1, 1, in_c, sq_c), jnp.zeros(sq_c)),
                      (_he_conv(k1, 1, 1, sq_c, ex_c), jnp.zeros(ex_c)),
                      (_he_conv(k3, 3, 3, sq_c, ex_c), jnp.zeros(ex_c))))
        in_c = 2 * ex_c
    lins = [jnp.ones(c) / c for c in _CHANNELS["squeeze"]]
    return (conv0, fires, lins), "random-features-proxy"


def lpips_backend(net_type: str = "vgg") -> str:
    return _load_weights(net_type)[1]


def lpips_is_proxy(net_type: str = "vgg") -> bool:
    return lpips_backend(net_type) == "random-features-proxy"


# ---------------------------------------------------------------- layers
def _conv(h, w, b, stride=1, padding="SAME"):
    return jax.lax.conv_general_dilated(
        h, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b


def _maxpool(h, k, s, ceil_mode=False):
    """torch MaxPool2d(k, s) with optional ceil_mode, NHWC."""
    if ceil_mode:
        pads = []
        for dim in (1, 2):
            size = h.shape[dim]
            out = -(-(size - k) // s) + 1          # ceil
            need = max((out - 1) * s + k - size, 0)
            # torch never lets a ceil-mode window start in the padding;
            # with k > s that cannot happen here (windows overlap)
            pads.append((0, need))
        padding = [(0, 0), pads[0], pads[1], (0, 0)]
    else:
        padding = "VALID"
    return jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                 (1, k, k, 1), (1, s, s, 1), padding)


def _z_score(x):
    """Reference BaseNet.z_score on the raw [0,1] input (NO 2x-1 rescale —
    `modules/networks.py:50-51` with metrics.py's to_tensor inputs)."""
    return ((x - _MEAN) / _STD)[None]      # NHWC with batch 1


def _vgg_features(x, convs):
    h = _z_score(x)
    feats = []
    for i, ((w, b), (_, pool)) in enumerate(zip(convs, _VGG_CFG)):
        if pool:
            h = _maxpool(h, 2, 2)
        h = jax.nn.relu(_conv(h, w, b))
        if i in _VGG_TAPS:
            feats.append(h[0])
    return feats


def _alex_features(x, convs):
    h = _z_score(x)
    feats = []
    for (w, b), (_, k, stride, pad, pool) in zip(convs, _ALEX_CFG):
        if pool:
            h = _maxpool(h, 3, 2)
        h = jax.nn.relu(_conv(h, w, b, stride,
                              [(pad, pad), (pad, pad)]))
        feats.append(h[0])                 # tap after every relu
    return feats


def _squeeze_features(x, params):
    conv0, fires = params
    h = jax.nn.relu(_conv(_z_score(x), conv0[0], conv0[1], stride=2,
                          padding="VALID"))
    feats = [h[0]]                         # tap 1: after conv0-relu
    for j, ((sw, sb), (e1w, e1b), (e3w, e3b)) in enumerate(fires):
        if j in _SQUEEZE_POOL_BEFORE:
            h = _maxpool(h, 3, 2, ceil_mode=True)
        sq = jax.nn.relu(_conv(h, sw, sb))
        h = jnp.concatenate([jax.nn.relu(_conv(sq, e1w, e1b)),
                             jax.nn.relu(_conv(sq, e3w, e3b,
                                               padding=[(1, 1), (1, 1)]))],
                            axis=-1)
        if j in _SQUEEZE_TAP_FIRES:
            feats.append(h[0])
    return feats


def _distance(fx, fy, lins):
    total = jnp.zeros(())
    for f1, f2, lin in zip(fx, fy, lins):
        n1 = f1 / jnp.maximum(jnp.linalg.norm(f1, axis=-1, keepdims=True),
                              1e-10)
        n2 = f2 / jnp.maximum(jnp.linalg.norm(f2, axis=-1, keepdims=True),
                              1e-10)
        total = total + (((n1 - n2) ** 2) * lin).sum(-1).mean()
    return total


@jax.jit
def _lpips_vgg(x, y):
    (convs, lins), _ = _load_weights("vgg")
    return _distance(_vgg_features(x, convs), _vgg_features(y, convs), lins)


@jax.jit
def _lpips_alex(x, y):
    (convs, lins), _ = _load_weights("alex")
    return _distance(_alex_features(x, convs), _alex_features(y, convs),
                     lins)


@jax.jit
def _lpips_squeeze(x, y):
    (conv0, fires, lins), _ = _load_weights("squeeze")
    return _distance(_squeeze_features(x, (conv0, fires)),
                     _squeeze_features(y, (conv0, fires)), lins)


_FNS = {"vgg": _lpips_vgg, "alex": _lpips_alex, "squeeze": _lpips_squeeze}


def reset_lpips_cache():
    """Drop cached weights AND the jitted executables that captured them as
    constants — without this, swapping LPIPS_WEIGHTS_NPZ mid-process would
    silently keep serving the old weights for already-seen image shapes."""
    _load_weights.cache_clear()
    for fn in _FNS.values():
        fn.clear_cache()


def lpips(img1, img2, net_type: str = "vgg"):
    """img: (H, W, 3) float in [0, 1]. net_type: 'vgg' | 'alex' | 'squeeze'
    (reference `lpipsPyTorch/__init__.py:7-21`; its metrics.py passes
    net_type='vgg')."""
    if net_type not in _FNS:
        raise NotImplementedError(
            "choose net_type from [alex, squeeze, vgg].")
    return _FNS[net_type](jnp.asarray(img1), jnp.asarray(img2))
