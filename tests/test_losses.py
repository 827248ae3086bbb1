import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_view_3dgs_pack_tpu import losses
from sparse_view_3dgs_pack_tpu.losses.dwt import (
    compute_elf_map, compute_patch_dwt_loss, dwt_subband_loss,
    get_dwt_subbands, haar_dwt_level, compute_wef_maps, make_heatmap_rgb)


def _rand_img(key, h=64, w=64, c=3):
    return jax.random.uniform(jax.random.PRNGKey(key), (h, w, c))


def test_l1_l2():
    a = jnp.zeros((4, 4, 3))
    b = jnp.ones((4, 4, 3)) * 0.5
    assert float(losses.l1_loss(a, b)) == pytest.approx(0.5)
    assert float(losses.l2_loss(a, b)) == pytest.approx(0.25)
    # reference semantics (FSGS loss_utils.py:21-25): channel sum ÷ mask sum,
    # so a (H,W,1) mask counts each pixel once but sums C channels
    mask = jnp.zeros((4, 4, 1)).at[0, 0].set(1.0)
    assert float(losses.l1_loss_mask(a, b, mask)) == pytest.approx(1.5)
    mask3 = jnp.zeros((4, 4, 3)).at[0, 0].set(1.0)
    assert float(losses.l1_loss_mask(a, b, mask3)) == pytest.approx(0.5)


def test_ssim_identity_and_range():
    img = _rand_img(0)
    assert float(losses.ssim(img, img)) == pytest.approx(1.0, abs=1e-5)
    other = _rand_img(1)
    v = float(losses.ssim(img, other))
    assert -1.0 <= v < 0.5


def test_ssim_matches_torch_reference():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from math import exp

    def torch_ssim(img1, img2, window_size=11):
        # reference implementation (utils/loss_utils.py:48-90 semantics)
        sigma = 1.5
        gauss = torch.tensor([exp(-(x - window_size // 2) ** 2 /
                                  (2 * sigma ** 2))
                              for x in range(window_size)])
        g = (gauss / gauss.sum()).unsqueeze(1)
        w2 = g.mm(g.t()).unsqueeze(0).unsqueeze(0)
        channel = img1.size(0)
        window = w2.expand(channel, 1, window_size, window_size).contiguous()
        i1 = img1.unsqueeze(0)
        i2 = img2.unsqueeze(0)
        pad = window_size // 2
        mu1 = F.conv2d(i1, window, padding=pad, groups=channel)
        mu2 = F.conv2d(i2, window, padding=pad, groups=channel)
        mu1_sq, mu2_sq, mu12 = mu1 ** 2, mu2 ** 2, mu1 * mu2
        s1 = F.conv2d(i1 * i1, window, padding=pad, groups=channel) - mu1_sq
        s2 = F.conv2d(i2 * i2, window, padding=pad, groups=channel) - mu2_sq
        s12 = F.conv2d(i1 * i2, window, padding=pad, groups=channel) - mu12
        C1, C2 = 0.01 ** 2, 0.03 ** 2
        m = ((2 * mu12 + C1) * (2 * s12 + C2)) / (
            (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
        return m.mean().item()

    a = np.asarray(_rand_img(2, 32, 40))
    b = np.asarray(_rand_img(3, 32, 40))
    mine = float(losses.ssim(jnp.asarray(a), jnp.asarray(b)))
    ref = torch_ssim(torch.tensor(a).permute(2, 0, 1),
                     torch.tensor(b).permute(2, 0, 1))
    assert mine == pytest.approx(ref, abs=2e-5)


def test_haar_energy_conservation():
    x = _rand_img(4, 32, 32)
    ll, lh, hl, hh = haar_dwt_level(x)
    e_in = float((x ** 2).sum())
    e_out = float((ll ** 2).sum() + (lh ** 2).sum() + (hl ** 2).sum()
                  + (hh ** 2).sum())
    assert e_in == pytest.approx(e_out, rel=1e-5)


def test_haar_constant_image():
    x = jnp.full((16, 16, 1), 0.7)
    ll, lh, hl, hh = haar_dwt_level(x)
    np.testing.assert_allclose(np.asarray(ll), 1.4, atol=1e-6)  # 0.7*2
    np.testing.assert_allclose(np.asarray(lh), 0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hl), 0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hh), 0, atol=1e-6)


def test_haar_direction_selectivity():
    # vertical stripes (variation along x) → energy in LH, none in HL
    x = jnp.tile(jnp.array([1.0, 0.0]), (16, 8))[..., None]
    ll, lh, hl, hh = haar_dwt_level(x)
    assert float(jnp.abs(lh).sum()) > 1.0
    assert float(jnp.abs(hl).sum()) == pytest.approx(0.0, abs=1e-6)
    # horizontal stripes → energy in HL only
    y = jnp.tile(jnp.array([[1.0], [0.0]]), (8, 16))[..., None]
    ll, lh, hl, hh = haar_dwt_level(y)
    assert float(jnp.abs(hl).sum()) > 1.0
    assert float(jnp.abs(lh).sum()) == pytest.approx(0.0, abs=1e-6)


def test_haar_matches_pywt_convention():
    torch = pytest.importorskip("torch")
    # cross-check a single level against hand-computed Haar on a 4x4
    x = np.arange(16, dtype=np.float32).reshape(4, 4)
    ll, lh, hl, hh = haar_dwt_level(jnp.asarray(x)[..., None])
    # block (0,0): a=0 b=1 c=4 d=5 → LL=(0+1+4+5)/2=5
    # matmul-form Haar: (1/sqrt2)^2 rounds to 0.5 only to f32 precision
    assert float(ll[0, 0, 0]) == pytest.approx(5.0, abs=1e-5)
    assert float(lh[0, 0, 0]) == pytest.approx((0 - 1 + 4 - 5) / 2, abs=1e-5)
    assert float(hl[0, 0, 0]) == pytest.approx((0 + 1 - 4 - 5) / 2, abs=1e-5)
    assert float(hh[0, 0, 0]) == pytest.approx((0 - 1 - 4 + 5) / 2, abs=1e-5)


def test_dwt_subbands_shapes_odd():
    x = _rand_img(5, 33, 65)
    b = get_dwt_subbands(x)
    assert b["LL1"].shape == (17, 33, 3)
    assert b["LL2"].shape == (9, 17, 3)


def test_dwt_subband_loss():
    pred, gt = _rand_img(6), _rand_img(7)
    weights = {"ll1_weight": 1.0, "lh1_weight": 1.0, "hl1_weight": 1.0,
               "hh1_weight": 0.0}
    total, bands = dwt_subband_loss(pred, gt, weights)
    assert set(bands) == {"LL1", "LH1", "HL1"}
    assert float(total) > 0
    t0, _ = dwt_subband_loss(pred, pred, weights)
    assert float(t0) == pytest.approx(0.0, abs=1e-7)


def test_elf_map():
    flat = jnp.full((64, 64, 3), 0.5)
    elf = compute_elf_map(flat)
    assert elf.shape == (64, 64, 1)
    np.testing.assert_allclose(np.asarray(elf), 1.0, atol=1e-5)
    noisy = _rand_img(8)
    elf_noisy = compute_elf_map(noisy)
    assert float(elf_noisy.mean()) < 0.95


def test_patch_dwt_loss():
    pred = _rand_img(9, 64, 64)
    gt = _rand_img(10, 64, 64)
    elf = compute_elf_map(gt)
    loss = compute_patch_dwt_loss(pred, gt, elf, patch_size=16,
                                  percentile=0.25)
    assert float(loss) > 0
    z = compute_patch_dwt_loss(gt, gt, elf, patch_size=16, percentile=0.25)
    assert float(z) == pytest.approx(0.0, abs=1e-7)
    # image smaller than patch → 0
    small = compute_patch_dwt_loss(pred[:32, :32], gt[:32, :32],
                                   elf[:32, :32], patch_size=128)
    assert float(small) == 0.0


def test_pearson():
    x = jnp.arange(100.0)
    assert float(losses.pearson_corrcoef(x, 2 * x + 3)) == pytest.approx(1.0, abs=1e-5)
    assert float(losses.pearson_corrcoef(x, -x)) == pytest.approx(-1.0, abs=1e-5)


def test_fsgs_depth_loss_correlated():
    key = jax.random.PRNGKey(0)
    depth = jax.random.uniform(key, (32, 32)) * 5 + 1
    # rendered depth perfectly anti-correlated with -midas → loss near 0
    loss = losses.fsgs_depth_loss(depth, -depth)
    assert float(loss) < 1e-4


def test_margin_losses_match_torch_semantics():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    a = rng.normal(size=(50,)).astype(np.float32)
    b = rng.normal(size=(50,)).astype(np.float32)
    margin = 0.5
    ta, tb = torch.tensor(a), torch.tensor(b)
    mask = (ta - tb).abs() > margin
    ref2 = ((ta - tb)[mask] ** 2).mean().item()
    ref1 = (ta - tb)[mask].abs().mean().item()
    assert float(losses.margin_l2_loss(jnp.asarray(a), jnp.asarray(b),
                                       margin)) == pytest.approx(ref2, rel=1e-5)
    assert float(losses.margin_l1_loss(jnp.asarray(a), jnp.asarray(b),
                                       margin)) == pytest.approx(ref1, rel=1e-5)


def test_patch_norm_losses():
    d1 = _rand_img(11, 32, 32, 1)[..., 0]
    # identical depths → 0 (no element exceeds margin)
    assert float(losses.patch_norm_mse_loss(d1, d1, 8, 0.1)) == 0.0
    d2 = d1 + jax.random.normal(jax.random.PRNGKey(12), d1.shape) * 0.5
    assert float(losses.patch_norm_mse_loss(d1, d2, 8, 0.1)) > 0
    assert float(losses.patch_norm_mse_loss_global(d1, d2, 8, 0.1)) > 0


def test_depth_smoothness():
    img = _rand_img(13, 16, 16)
    flat_depth = jnp.ones((16, 16))
    assert float(losses.loss_depth_smoothness(flat_depth, img)) == pytest.approx(0.0, abs=1e-7)
    noisy_depth = jax.random.uniform(jax.random.PRNGKey(14), (16, 16))
    assert float(losses.loss_depth_smoothness(noisy_depth, img)) > 0.01


def test_nir_losses():
    nir1 = jax.random.uniform(jax.random.PRNGKey(15), (32, 32))
    nir2 = jax.random.uniform(jax.random.PRNGKey(16), (32, 32))
    assert float(losses.combined_nir_loss(nir1, nir1)) == pytest.approx(0.0, abs=1e-5)
    assert float(losses.combined_nir_loss(nir1, nir2)) > 0.1
    rgb1, rgb2 = _rand_img(17, 32, 32), _rand_img(18, 32, 32)
    res = losses.compute_combined_residuals(rgb1, rgb2, nir1, nir2)
    assert res.shape == (32, 32)
    res_rgb_only = losses.compute_combined_residuals(rgb1, rgb2)
    assert (np.asarray(res) >= np.asarray(res_rgb_only) - 1e-7).all()


def test_wef_maps():
    pred, gt = _rand_img(19), _rand_img(20)
    maps = compute_wef_maps(pred, gt)
    assert set(maps) == {"LL2", "LH2", "HL2", "WEF"}
    for v in maps.values():
        assert v.shape == (64, 64, 1)
        assert 0 <= float(v.min()) and float(v.max()) <= 1.0 + 1e-6
    hm = make_heatmap_rgb(maps["WEF"])
    assert hm.shape == (64, 64, 3)
