"""Haar DWT subbands, ELF maps, patch-wise DWT loss, WEF visualisation.

Replaces the reference's per-call `pytorch_wavelets.DWTForward` construction
(`LGDWT-GS/utils/loss_utils.py:106-153` — rebuilt twice per iteration there)
with a fixed jitted Haar lifting step: orthonormal 2×2 analysis, identical
coefficients to db1 with symmetric padding on even-sized inputs (odd sizes are
edge-replicated to even first, as symmetric padding does for length-2
filters).

Subband keys and weighting semantics follow the reference exactly:
`get_dwt_subbands` → {LL1..HH2}; `compute_elf_map` (`loss_utils.py:336`);
`compute_patch_dwt_loss` with top-percentile ELF patch selection
(`loss_utils.py:368-441`); WEF heatmaps (`loss_utils.py:165-327`).

Images here are (H, W, C); a leading batch dim is also accepted.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .photometric import l1_loss


def _pad_to_even(x):
    H, W = x.shape[-3], x.shape[-2]
    pads = [(0, 0)] * x.ndim
    if H % 2:
        pads[-3] = (0, 1)
    if W % 2:
        pads[-2] = (0, 1)
    if H % 2 or W % 2:
        x = jnp.pad(x, pads, mode="edge")
    return x


@__import__("functools").lru_cache(maxsize=None)
def _haar_matrix_np(n: int):
    import numpy as np
    s = np.float32(1.0 / np.sqrt(2.0))
    M = np.zeros((n, n), np.float32)
    i = np.arange(n // 2)
    M[2 * i, i] = s
    M[2 * i + 1, i] = s
    M[2 * i, n // 2 + i] = s
    M[2 * i + 1, n // 2 + i] = -s
    return M


def _haar_matrix(n: int) -> jnp.ndarray:
    """(n, n) orthonormal Haar analysis step: columns [0, n/2) produce the
    low band (pair sums · 1/√2), columns [n/2, n) the high band (pair
    diffs · 1/√2, even +, odd −)."""
    return jnp.asarray(_haar_matrix_np(n))


def haar_dwt_level(x):
    """One orthonormal Haar analysis level.

    x: (..., H, W, C) → (LL, LH, HL, HH) each (..., H/2, W/2, C).
    LH = detail along x (horizontal), HL = detail along y (matching the
    pytorch_wavelets Yh[:,:,0]=LH, [:,:,1]=HL ordering used by the reference).

    Implemented as two banded MXU matmuls instead of stride-2 slicing:
    (H, W, 3) images put C on the lane dimension, so sliced adds run at
    3/128 lane efficiency (~21 ms per image pair at 800p); the matmul form
    runs in ~1 ms. Coefficients are identical up to f32 rounding
    ((1/√2)² vs 0.5)."""
    x = _pad_to_even(x)
    H, W = x.shape[-3], x.shape[-2]
    Mh = _haar_matrix(H)
    Mw = _haar_matrix(W)
    y = jnp.einsum("...hwc,hk->...kwc", x, Mh,
                   precision=jax.lax.Precision.HIGHEST)
    z = jnp.einsum("...kwc,wm->...kmc", y, Mw,
                   precision=jax.lax.Precision.HIGHEST)
    H2, W2 = H // 2, W // 2
    ll = z[..., :H2, :W2, :]
    lh = z[..., :H2, W2:, :]
    hl = z[..., H2:, :W2, :]
    hh = z[..., H2:, W2:, :]
    return ll, lh, hl, hh


def get_dwt_subbands(x) -> dict:
    """Two-level Haar subbands: {'LL1','LH1','HL1','HH1','LL2','LH2','HL2','HH2'}."""
    ll1, lh1, hl1, hh1 = haar_dwt_level(x)
    ll2, lh2, hl2, hh2 = haar_dwt_level(ll1)
    return {"LL1": ll1, "LH1": lh1, "HL1": hl1, "HH1": hh1,
            "LL2": ll2, "LH2": lh2, "HL2": hl2, "HH2": hh2}


def dwt_subband_loss(pred, gt, weights: dict):
    """Weighted per-subband L1 (the `dwt_enable` block of
    `LGDWT-GS/train.py:130-163`). weights keys: ll1, lh1, hl1, hh1, ll2, ...
    Returns (total, per-band dict) — per-band only for bands with weight≠0."""
    pb = get_dwt_subbands(pred)
    gb = get_dwt_subbands(gt)
    total = jnp.zeros(())
    per_band = {}
    for key in ("LL1", "LH1", "HL1", "HH1", "LL2", "LH2", "HL2", "HH2"):
        w = float(weights.get(key.lower() + "_weight", weights.get(key, 0.0)))
        if w != 0.0:
            band = l1_loss(pb[key], gb[key])
            per_band[key] = band
            total = total + w * band
    return total, per_band


def _upsample_bilinear(x, H, W):
    """(..., h, w, C) → (..., H, W, C), half-pixel centers (align_corners=False)."""
    shape = x.shape[:-3] + (H, W, x.shape[-1])
    return jax.image.resize(x, shape, method="bilinear")


def compute_elf_map(image):
    """ELF = ‖LL1‖₁ / (‖LL1‖₁ + ‖HF1‖₁), channel-summed, upsampled to (H, W, 1)."""
    bands = get_dwt_subbands(image)

    def l1c(v):
        return jnp.sum(jnp.abs(v), axis=-1, keepdims=True)

    ll = l1c(bands["LL1"])
    hf = l1c(bands["LH1"]) + l1c(bands["HL1"]) + l1c(bands["HH1"])
    elf_low = ll / (ll + hf + 1e-8)
    H, W = image.shape[-3], image.shape[-2]
    return _upsample_bilinear(elf_low, H, W)


@partial(jax.jit, static_argnames=("patch_size", "percentile"))
def compute_patch_dwt_loss(pred, gt, elf_map, patch_size: int = 128,
                           percentile: float = 0.2, lh1_weight: float = 1.0,
                           hl1_weight: float = 1.0):
    """L1 on level-1 HF subbands of the top-`percentile` highest-ELF
    non-overlapping patches. Static-shape version of the reference's unfold +
    kthvalue + boolean-select: patches are kept dense and selection becomes a
    weighted mean over a mask."""
    H, W, C = pred.shape[-3], pred.shape[-2], pred.shape[-1]
    if H < patch_size or W < patch_size:
        return jnp.zeros(())
    ny, nx = H // patch_size, W // patch_size
    L = ny * nx

    def to_patches(x):
        x = x[:ny * patch_size, :nx * patch_size]
        x = x.reshape(ny, patch_size, nx, patch_size, x.shape[-1])
        return x.transpose(0, 2, 1, 3, 4).reshape(L, patch_size, patch_size,
                                                  x.shape[-1])

    pp = to_patches(pred)
    gp = to_patches(gt)
    ep = to_patches(elf_map)

    means = ep.mean(axis=(1, 2, 3))                     # (L,)
    k = min(max(int(L * (1.0 - percentile)), 1), L)
    threshold = jnp.sort(means)[k - 1]                  # kthvalue (1-indexed)
    mask = (means >= threshold).astype(pred.dtype)      # (L,)

    pb = get_dwt_subbands(pp)
    gb = get_dwt_subbands(gp)

    def sel_l1(a, b):
        per_patch = jnp.abs(a - b).mean(axis=(1, 2, 3))  # (L,)
        return (per_patch * mask).sum() / jnp.maximum(mask.sum(), 1.0)

    loss_lh = sel_l1(pb["LH1"], gb["LH1"])
    loss_hl = sel_l1(pb["HL1"], gb["HL1"])
    loss_hh = sel_l1(pb["HH1"], gb["HH1"])
    return (lh1_weight * loss_lh + hl1_weight * loss_hl
            + 0.5 * (lh1_weight + hl1_weight) * loss_hh)


# --------------------------------------------------------------- WEF heatmaps

def _normalize_01(x, eps=1e-8):
    mn = x.min(axis=(-3, -2), keepdims=True)
    mx = x.max(axis=(-3, -2), keepdims=True)
    return (x - mn) / (mx - mn + eps)


def compute_wef_maps(pred, gt) -> dict:
    """Level-2 Wavelet Error Field heatmaps (reference `compute_wef_maps`)."""
    residual = pred - gt
    b = get_dwt_subbands(residual)
    H, W = pred.shape[-3], pred.shape[-2]
    out = {}
    for key, scale in (("LL2", 4.0), ("LH2", 2.0), ("HL2", 2.0)):
        e = (b[key] * b[key] * scale).mean(axis=-1, keepdims=True)
        out[key] = _normalize_01(_upsample_bilinear(e, H, W))
    out["WEF"] = _normalize_01((out["LL2"] + out["LH2"] + out["HL2"]) / 3.0)
    return out


def compute_wef_all_subbands(pred, gt) -> dict:
    residual = pred - gt
    b = get_dwt_subbands(residual)
    H, W = pred.shape[-3], pred.shape[-2]
    scales = {"LL1": 1.0, "LH1": 1.0, "HL1": 1.0, "HH1": 1.0,
              "LL2": 4.0, "LH2": 2.0, "HL2": 2.0, "HH2": 2.0}
    maps = {}
    for key, s in scales.items():
        e = (b[key] * b[key] * s).mean(axis=-1, keepdims=True)
        maps[key] = _normalize_01(_upsample_bilinear(e, H, W))
    combo = sum(maps[k] for k in scales) / 8.0
    maps["COMBINED"] = _normalize_01(combo)
    return maps


def make_heatmap_rgb(x01):
    """(…, H, W, 1) in [0,1] → jet-like (…, H, W, 3)."""
    x = jnp.clip(x01[..., 0], 0, 1)
    r = x
    g = jnp.clip(1.0 - jnp.abs(x - 0.5) * 2.0, 0, 1)
    b = 1.0 - x
    return jnp.stack([r, g, b], axis=-1)
