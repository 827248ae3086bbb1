"""Golden tests for the JAX LPIPS (`metrics/lpips.py`) against an
INDEPENDENT torch implementation of the reference architecture
(`lpipsPyTorch/modules/networks.py:12-89`, `modules/lpips.py:30-36`),
using synthetic npz weights — proving the weight loader + all three
backbones are numerically faithful, so dropping in real converted
torchvision weights yields the true metric."""

import os

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import importlib

# the package re-exports the lpips() function under the same name, so a
# plain `import ... as L` would bind the function, not the module
L = importlib.import_module("sparse_view_3dgs_pack_tpu.metrics.lpips")

H, W = 33, 47   # odd sizes exercise the ceil/floor pooling paths

_MEAN = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
_STD = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)


def _norm_act(x):
    return x / torch.sqrt((x ** 2).sum(1, keepdim=True)).clamp_min(1e-10)


def _torch_dist(fx, fy, lins):
    total = 0.0
    for f1, f2, lin in zip(fx, fy, lins):
        d = (_norm_act(f1) - _norm_act(f2)) ** 2
        w = torch.as_tensor(lin).view(1, -1, 1, 1)
        total = total + (d * w).sum(1).mean()
    return float(total)


# ---------------------------------------------------------------- torch nets

def _torch_vgg_feats(x, data):
    h = (x - _MEAN) / _STD
    cfg = L._VGG_CFG
    feats = []
    for i, (_, pool) in enumerate(cfg):
        if pool:
            h = F.max_pool2d(h, 2, 2)
        h = F.relu(F.conv2d(h, torch.as_tensor(data[f"conv{i}"]),
                            torch.as_tensor(data[f"bias{i}"]), padding=1))
        if i in L._VGG_TAPS:
            feats.append(h)
    return feats


def _torch_alex_feats(x, data):
    h = (x - _MEAN) / _STD
    feats = []
    for i, (_, k, stride, pad, pool) in enumerate(L._ALEX_CFG):
        if pool:
            h = F.max_pool2d(h, 3, 2)
        h = F.relu(F.conv2d(h, torch.as_tensor(data[f"conv{i}"]),
                            torch.as_tensor(data[f"bias{i}"]),
                            stride=stride, padding=pad))
        feats.append(h)
    return feats


def _torch_squeeze_feats(x, data):
    h = (x - _MEAN) / _STD
    h = F.relu(F.conv2d(h, torch.as_tensor(data["conv0"]),
                        torch.as_tensor(data["bias0"]), stride=2))
    feats = [h]
    for j in range(len(L._SQUEEZE_FIRES)):
        if j in L._SQUEEZE_POOL_BEFORE:
            h = F.max_pool2d(h, 3, 2, ceil_mode=True)
        sq = F.relu(F.conv2d(h, torch.as_tensor(data[f"f{j}_squeeze_w"]),
                             torch.as_tensor(data[f"f{j}_squeeze_b"])))
        e1 = F.relu(F.conv2d(sq, torch.as_tensor(data[f"f{j}_e1_w"]),
                             torch.as_tensor(data[f"f{j}_e1_b"])))
        e3 = F.relu(F.conv2d(sq, torch.as_tensor(data[f"f{j}_e3_w"]),
                             torch.as_tensor(data[f"f{j}_e3_b"]),
                             padding=1))
        h = torch.cat([e1, e3], 1)
        if j in L._SQUEEZE_TAP_FIRES:
            feats.append(h)
    return feats


# ---------------------------------------------------------------- weights

def _synth(rng, *shape):
    return (rng.standard_normal(shape) * 0.2).astype(np.float32)


def _make_npz(net, path, rng):
    data = {}
    if net == "vgg":
        in_c = 3
        for i, (out_c, _) in enumerate(L._VGG_CFG):
            data[f"conv{i}"] = _synth(rng, out_c, in_c, 3, 3)
            data[f"bias{i}"] = _synth(rng, out_c)
            in_c = out_c
        chans = L._CHANNELS["vgg"]
    elif net == "alex":
        in_c = 3
        for i, (out_c, k, _, _, _) in enumerate(L._ALEX_CFG):
            data[f"conv{i}"] = _synth(rng, out_c, in_c, k, k)
            data[f"bias{i}"] = _synth(rng, out_c)
            in_c = out_c
        chans = L._CHANNELS["alex"]
    else:
        data["conv0"] = _synth(rng, 64, 3, 3, 3)
        data["bias0"] = _synth(rng, 64)
        in_c = 64
        for j, (sq_c, ex_c) in enumerate(L._SQUEEZE_FIRES):
            data[f"f{j}_squeeze_w"] = _synth(rng, sq_c, in_c, 1, 1)
            data[f"f{j}_squeeze_b"] = _synth(rng, sq_c)
            data[f"f{j}_e1_w"] = _synth(rng, ex_c, sq_c, 1, 1)
            data[f"f{j}_e1_b"] = _synth(rng, ex_c)
            data[f"f{j}_e3_w"] = _synth(rng, ex_c, sq_c, 3, 3)
            data[f"f{j}_e3_b"] = _synth(rng, ex_c)
            in_c = 2 * ex_c
        chans = L._CHANNELS["squeeze"]
    for i, c in enumerate(chans):
        # torch lin conv weight layout (1, C, 1, 1), non-negative like the
        # trained heads
        data[f"lin{i}"] = np.abs(_synth(rng, 1, c, 1, 1))
    np.savez(path, **data)
    return data


_TORCH_FEATS = {"vgg": _torch_vgg_feats, "alex": _torch_alex_feats,
                "squeeze": _torch_squeeze_feats}


@pytest.mark.parametrize("net", ["vgg", "alex", "squeeze"])
def test_lpips_matches_independent_torch(net, tmp_path, monkeypatch):
    rng = np.random.default_rng(hash(net) % 2**31)
    npz = str(tmp_path / f"lpips_{net}.npz")
    data = _make_npz(net, npz, rng)

    monkeypatch.setenv("LPIPS_WEIGHTS_NPZ", str(tmp_path / "lpips_{net}.npz"))
    L.reset_lpips_cache()
    try:
        assert "pretrained" in L.lpips_backend(net)
        assert not L.lpips_is_proxy(net)

        x = rng.random((H, W, 3)).astype(np.float32)
        y = np.clip(x + rng.normal(0, 0.1, x.shape), 0, 1).astype(np.float32)
        ours = float(L.lpips(x, y, net_type=net))

        xt = torch.from_numpy(x.transpose(2, 0, 1))[None]
        yt = torch.from_numpy(y.transpose(2, 0, 1))[None]
        with torch.no_grad():
            fx = _TORCH_FEATS[net](xt, data)
            fy = _TORCH_FEATS[net](yt, data)
            lins = [data[f"lin{i}"][0, :, 0, 0]
                    for i in range(len(L._CHANNELS[net]))]
            ref = _torch_dist(fx, fy, lins)

        assert ours == pytest.approx(ref, rel=2e-4, abs=1e-6)
        assert float(L.lpips(x, x, net_type=net)) == pytest.approx(0.0,
                                                                   abs=1e-6)
    finally:
        L.reset_lpips_cache()


def test_lpips_proxy_fallback_tagged(monkeypatch):
    monkeypatch.delenv("LPIPS_WEIGHTS_NPZ", raising=False)
    L.reset_lpips_cache()
    try:
        for net in L.NET_TYPES:
            assert L.lpips_is_proxy(net)
            rng = np.random.default_rng(0)
            x = rng.random((H, W, 3)).astype(np.float32)
            y = rng.random((H, W, 3)).astype(np.float32)
            d = float(L.lpips(x, y, net_type=net))
            assert np.isfinite(d) and d > 0
            assert float(L.lpips(x, x, net_type=net)) == pytest.approx(
                0.0, abs=1e-6)
    finally:
        L.reset_lpips_cache()


def test_lpips_rejects_unknown_net():
    with pytest.raises(NotImplementedError):
        L.lpips(np.zeros((8, 8, 3), np.float32),
                np.zeros((8, 8, 3), np.float32), net_type="resnet")
