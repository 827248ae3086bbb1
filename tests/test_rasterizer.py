import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_view_3dgs_pack_tpu import testing
from sparse_view_3dgs_pack_tpu.ops import binning as binning_mod
from sparse_view_3dgs_pack_tpu.ops.blending import blend_weights
from sparse_view_3dgs_pack_tpu.ops.projection import project_gaussians
from sparse_view_3dgs_pack_tpu.ops.rasterize_ref import rasterize_dense
from sparse_view_3dgs_pack_tpu.ops.rasterize_tiles import RasterConfig, rasterize

W, H = 64, 48


def _scene(n=200, seed=0, channels=3):
    cloud = testing.make_gaussian_cloud(seed, n, extent=1.0,
                                        channels=channels)
    cam = testing.make_orbit_cameras(3, radius=4.0, width=W, height_px=H)[0]
    return cloud, cam


def _project(cloud, cam, antialiasing=False):
    p = cam.params()
    return project_gaussians(
        means3d=jnp.asarray(cloud["xyz"]),
        scales=jnp.exp(jnp.asarray(cloud["scales"])),
        quats=jnp.asarray(cloud["quats"]),
        opacities=jax.nn.sigmoid(jnp.asarray(cloud["opacity"][:, 0])),
        viewmat=jnp.asarray(p.viewmat), full_proj=jnp.asarray(p.full_proj),
        cam_center=jnp.asarray(p.cam_center),
        tan_fovx=float(p.tan_fovx), tan_fovy=float(p.tan_fovy),
        width=W, height=H,
        sh=jnp.asarray(cloud["features"]), sh_degree=0,
        antialiasing=antialiasing)


def test_blend_weights_matches_sequential():
    rng = np.random.default_rng(0)
    alphas = rng.uniform(0, 0.9, size=(17,)).astype(np.float32)
    alphas[alphas < 1 / 255] = 0
    w, log_t = blend_weights(jnp.asarray(alphas))
    # sequential reference
    T = 1.0
    ws = np.zeros_like(alphas)
    for i, a in enumerate(alphas):
        test_T = T * (1 - a)
        if test_T < 1e-4:
            break
        ws[i] = a * T
        T = test_T
    np.testing.assert_allclose(np.asarray(w), ws, atol=1e-6)
    np.testing.assert_allclose(np.exp(float(log_t)), T, rtol=1e-5)


def test_blend_early_stop():
    # large alphas force the T<1e-4 stop: later entries contribute nothing
    alphas = jnp.full((40,), 0.9)
    w, log_t = blend_weights(alphas)
    assert float(w[-1]) == 0.0
    assert float(w[0]) == pytest.approx(0.9)
    assert float(jnp.exp(log_t)) >= 1e-4 * (1 - 0.9) - 1e-9


def test_projection_basic():
    cloud, cam = _scene()
    proj = _project(cloud, cam)
    n_valid = int((proj.radii > 0).sum())
    assert n_valid > 100  # most of the cloud is visible
    m = np.asarray(proj.means2d)[np.asarray(proj.radii) > 0]
    assert (m[:, 0] > -W) .all() and (m[:, 0] < 2 * W).all()
    d = np.asarray(proj.depths)[np.asarray(proj.radii) > 0]
    assert (d > 0.2).all()


def test_projection_center_point():
    # a gaussian at the look-at target lands at the image center
    cloud, cam = _scene(n=1)
    cloud["xyz"][:] = 0.0
    proj = _project(cloud, cam)
    np.testing.assert_allclose(np.asarray(proj.means2d)[0],
                               [(W - 1) / 2, (H - 1) / 2], atol=1e-3)
    assert float(proj.depths[0]) == pytest.approx(
        np.linalg.norm(cam.camera_center), rel=1e-5)


def test_binning_covers_radii():
    cloud, cam = _scene()
    proj = _project(cloud, cam)
    b = binning_mod.bin_gaussians(proj.means2d, proj.depths, proj.radii,
                                  W, H, max_pairs=1 << 14)
    total = int(b.total_pairs)
    assert 0 < total < 1 << 14
    assert int(b.tile_counts.sum()) == total
    # every tile's ids are sorted by the packed depth key (truncated f32
    # bits — exact order up to the key's quantization step, ties by id)
    ids = np.asarray(b.ids)
    depths = np.asarray(proj.depths)
    gx, gy = binning_mod.tile_grid(W, H)
    _, depth_bits = binning_mod._key_bits(gx * gy)
    dkey = (np.where(np.isfinite(depths), depths, 0.0)
            .astype(np.float32).view(np.uint32) >> (32 - depth_bits))
    starts, counts = np.asarray(b.tile_starts), np.asarray(b.tile_counts)
    for t in range(len(starts)):
        seg = ids[starts[t]:starts[t] + counts[t]]
        k = dkey[seg]
        assert (np.diff(k.astype(np.int64)) >= 0).all()
        # and therefore nearly depth-sorted in float terms
        d = depths[seg]
        assert (np.diff(d) >= -np.maximum(d[:-1], 1.0) * 2 ** -9).all()


def test_rect_radii_exact_and_tighter():
    """The per-axis AABB rect (`Projected.rect_radii`) must bin strictly
    fewer pairs than the reference 3σ square on a low-opacity/anisotropic
    scene, with term-identical render output and gradients — dropped pairs
    are exactly the ones whose alpha < 1/255 the rasterizer zeroes anyway
    (CUDA skip rule, `forward.cu:342-383`). Only f32 summation ORDER can
    differ (surviving pairs shift position in the padded tile lists), so
    equality is asserted at a few-ulp tolerance."""
    cloud, cam = _scene(n=300, seed=3)
    # widen the opacity range downwards (incl. below 1/255 → fully culled)
    # and stretch scales for anisotropy — both feed the AABB tightening
    cloud["opacity"] = (cloud["opacity"] * 3.0 - 3.0).astype(np.float32)
    cloud["scales"][:, 0] += 1.0
    proj = _project(cloud, cam)

    n_square = int(binning_mod.count_pairs(proj.means2d, proj.depths,
                                           proj.radii, W, H))
    n_rect = int(binning_mod.count_pairs(proj.means2d, proj.depths,
                                         proj.rect_radii, W, H))
    assert 0 < n_rect < n_square

    bg = jnp.array([0.1, 0.2, 0.3])
    cfg = RasterConfig(max_pairs=1 << 15, max_per_tile=512, tile_batch=4)

    def render_with(radii, opac):
        p = proj._replace(opacities=opac, rect_radii=radii)
        out = rasterize(p, W, H, bg, cfg)
        return out

    out_sq = render_with(proj.radii, proj.opacities)
    out_re = render_with(proj.rect_radii, proj.opacities)
    for field in ("color", "alpha", "invdepth", "depth"):
        np.testing.assert_allclose(np.asarray(getattr(out_sq, field)),
                                   np.asarray(getattr(out_re, field)),
                                   atol=2e-6)

    g_sq = jax.grad(lambda o: jnp.sum(
        render_with(proj.radii, o).color ** 2))(proj.opacities)
    g_re = jax.grad(lambda o: jnp.sum(
        render_with(proj.rect_radii, o).color ** 2))(proj.opacities)
    np.testing.assert_allclose(np.asarray(g_sq), np.asarray(g_re),
                               rtol=1e-5, atol=2e-6)


def test_tiled_matches_oracle():
    cloud, cam = _scene(n=300)
    proj = _project(cloud, cam)
    bg = jnp.array([0.1, 0.2, 0.3])
    ref = rasterize_dense(proj, W, H, bg)
    cfg = RasterConfig(max_pairs=1 << 15, max_per_tile=512, tile_batch=4)
    out = rasterize(proj, W, H, bg, cfg)
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref.color),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(ref.alpha),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.invdepth),
                               np.asarray(ref.invdepth), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.depth),
                               np.asarray(ref.depth), atol=1e-4)


def test_tiled_matches_oracle_antialiasing():
    cloud, cam = _scene(n=150, seed=3)
    proj = _project(cloud, cam, antialiasing=True)
    bg = jnp.zeros(3)
    ref = rasterize_dense(proj, W, H, bg)
    out = rasterize(proj, W, H, bg,
                    RasterConfig(max_pairs=1 << 15, max_per_tile=512,
                                 tile_batch=8))
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref.color),
                               atol=2e-5)


def test_nchannel_rendering():
    cloud, cam = _scene(n=100, channels=4)
    proj = _project(cloud, cam)
    bg = jnp.zeros(4)
    out = rasterize(proj, W, H, bg,
                    RasterConfig(max_pairs=1 << 14, max_per_tile=256,
                                 tile_batch=8))
    assert out.color.shape == (H, W, 4)
    ref = rasterize_dense(proj, W, H, bg)
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref.color),
                               atol=2e-5)


def test_gradients_match_oracle():
    cloud, cam = _scene(n=60, seed=1)
    p = cam.params()
    target = jax.random.uniform(jax.random.PRNGKey(0), (H, W, 3))
    bg = jnp.zeros(3)
    cfg = RasterConfig(max_pairs=1 << 13, max_per_tile=256, tile_batch=8)

    def loss_fn(params, tiled):
        proj = project_gaussians(
            means3d=params["xyz"],
            scales=jnp.exp(params["scales"]),
            quats=params["quats"],
            opacities=jax.nn.sigmoid(params["opacity"][:, 0]),
            viewmat=jnp.asarray(p.viewmat),
            full_proj=jnp.asarray(p.full_proj),
            cam_center=jnp.asarray(p.cam_center),
            tan_fovx=float(p.tan_fovx), tan_fovy=float(p.tan_fovy),
            width=W, height=H, sh=params["features"], sh_degree=0)
        if tiled:
            out = rasterize(proj, W, H, bg, cfg)
        else:
            out = rasterize_dense(proj, W, H, bg)
        return jnp.abs(out.color - target).mean()

    params = {k: jnp.asarray(v) for k, v in cloud.items()}
    g_ref = jax.grad(lambda q: loss_fn(q, False))(params)
    g_tile = jax.grad(lambda q: loss_fn(q, True))(params)
    for k in params:
        np.testing.assert_allclose(np.asarray(g_tile[k]),
                                   np.asarray(g_ref[k]),
                                   atol=5e-6, rtol=1e-3, err_msg=k)
    # gradients are nonzero somewhere
    assert float(jnp.abs(g_tile["xyz"]).max()) > 0


def test_optimize_single_gaussian_position():
    # end-to-end gradient sanity: recover a translated gaussian by SGD
    cloud, cam = _scene(n=1, seed=5)
    cloud["xyz"][:] = np.array([[0.3, -0.2, 0.1]], np.float32)
    cloud["scales"][:] = np.log(0.3)
    cloud["opacity"][:] = 3.0
    p = cam.params()
    bg = jnp.zeros(3)

    def render(xyz):
        proj = project_gaussians(
            means3d=xyz, scales=jnp.exp(jnp.asarray(cloud["scales"])),
            quats=jnp.asarray(cloud["quats"]),
            opacities=jax.nn.sigmoid(jnp.asarray(cloud["opacity"][:, 0])),
            viewmat=jnp.asarray(p.viewmat),
            full_proj=jnp.asarray(p.full_proj),
            cam_center=jnp.asarray(p.cam_center),
            tan_fovx=float(p.tan_fovx), tan_fovy=float(p.tan_fovy),
            width=W, height=H, sh=jnp.asarray(cloud["features"]),
            sh_degree=0)
        return rasterize(proj, W, H, bg,
                         RasterConfig(max_pairs=1 << 12, max_per_tile=64,
                                      tile_batch=12)).color

    import optax

    target = render(jnp.asarray(cloud["xyz"]))
    x = jnp.asarray(cloud["xyz"]) + jnp.array([[0.08, -0.05, 0.06]])
    loss = jax.jit(lambda x: ((render(x) - target) ** 2).mean())
    gfn = jax.jit(jax.grad(lambda x: ((render(x) - target) ** 2).mean()))
    opt = optax.adam(0.02)
    state = opt.init(x)
    l0 = float(loss(x))
    for _ in range(80):
        upd, state = opt.update(gfn(x), state)
        x = optax.apply_updates(x, upd)
    assert float(loss(x)) < 0.05 * l0


def test_mark_visible_frustum():
    """`mark_visible` == reference `markVisible`/`in_frustum`: view-space
    z > 0.2 (`auxiliary.h:151-167`; xy NDC bound disabled upstream)."""
    import numpy as np

    from sparse_view_3dgs_pack_tpu.ops.projection import mark_visible
    from sparse_view_3dgs_pack_tpu.testing import make_orbit_cameras

    cam = make_orbit_cameras(1, radius=3.0, width=32, height_px=32)[0]
    p = cam.params()
    viewmat = np.asarray(p.viewmat)
    pts = np.array([[0.0, 0.0, 0.0],      # scene center: in front
                    [6.0, 0.0, 1.2],      # behind the camera
                    [100.0, 100.0, 100.0]], np.float32)   # far off-axis
    vis = np.asarray(mark_visible(pts, viewmat))
    pv = pts @ viewmat[:3, :3].T + viewmat[:3, 3]
    np.testing.assert_array_equal(vis, pv[:, 2] > 0.2)
    assert vis[0] and not vis[1]


def test_tile_range_bounds_matches_searchsorted():
    """The two-level tile-range counter must equal `searchsorted` exactly
    for every probe, across edge cases: empty tiles, empty buckets,
    all-sentinel tails, single-tile pileups, full buckets."""
    num_tiles, depth_bits, block = 23, 12, 128
    sentinel = np.uint32(num_tiles) << depth_bits
    rng = np.random.default_rng(0)

    def check(keys_np):
        keys = jnp.asarray(keys_np)
        got = np.asarray(binning_mod.tile_range_bounds(
            keys, num_tiles, depth_bits, block))
        probes = (np.arange(num_tiles + 1, dtype=np.uint64) << depth_bits)
        want = np.searchsorted(keys_np.astype(np.uint64), probes, "left")
        np.testing.assert_array_equal(got, want)

    mp = 8 * block
    # random occupancy with empty tiles and a sentinel tail
    for frac in (0.0, 0.33, 0.97, 1.0):
        n = int(mp * frac)
        tiles = rng.integers(0, num_tiles, n, dtype=np.uint32)
        tiles[tiles % 5 == 2] = 7          # force some empty / piled tiles
        d = rng.integers(0, 1 << depth_bits, n, dtype=np.uint32)
        keys = np.full(mp, sentinel, np.uint32)
        keys[:n] = np.sort((tiles << depth_bits) | d)
        check(keys)
    # everything in one tile; boundary-exact depths (0 and max)
    keys = np.sort(rng.integers(0, 2, mp, dtype=np.uint32)
                   * ((1 << depth_bits) - 1)
                   + (np.uint32(11) << depth_bits)).astype(np.uint32)
    check(keys)
    # UNALIGNED buckets (not a multiple of block): the internal sentinel
    # pad must keep every bound exact — external callers with arbitrary
    # bucket sizes used to work via searchsorted and must keep working
    for mp_odd in (block - 1, 3 * block + 17, 5):
        n = min(mp_odd, 2 * block)
        tiles = rng.integers(0, num_tiles, n, dtype=np.uint32)
        d = rng.integers(0, 1 << depth_bits, n, dtype=np.uint32)
        keys = np.full(mp_odd, sentinel, np.uint32)
        keys[:n] = np.sort((tiles << depth_bits) | d)
        check(keys)


def test_tile_clip_sentinel_and_growth_routing():
    """XLA-path per-tile clipping must surface as EXACTLY max_pairs+1 (the
    clip sentinel), and the host router must double max_per_tile for it
    while routing true bucket overflow to the pair bucket. Regression for
    the dense-scene pathology where the bucket grew to its 8M hard cap on
    a 67k-pair frame without ever unclipping the tile lists."""
    from sparse_view_3dgs_pack_tpu.data.cameras import CameraParams
    from sparse_view_3dgs_pack_tpu.renderer import render_core
    from sparse_view_3dgs_pack_tpu.train import capacity

    # a compact cloud so central tiles hold many gaussians
    cloud, cam = _scene(n=400, seed=3)
    cloud["xyz"][:] *= 0.18                       # pile into few tiles
    params = {
        "xyz": jnp.asarray(cloud["xyz"]),
        "scaling": jnp.asarray(cloud["scales"]),
        "rotation": jnp.asarray(cloud["quats"]),
        "opacity": jnp.asarray(cloud["opacity"]),
        "features_dc": jnp.asarray(cloud["features"][:, :1]),
        "features_rest": jnp.asarray(cloud["features"][:, 1:]),
    }
    alive = jnp.ones((400,), jnp.float32)
    p = cam.params()
    camp = CameraParams(viewmat=jnp.asarray(p.viewmat),
                        full_proj=jnp.asarray(p.full_proj),
                        cam_center=jnp.asarray(p.cam_center),
                        tan_fovx=float(p.tan_fovx),
                        tan_fovy=float(p.tan_fovy))
    mp = 1 << 14
    res = render_core(params, alive, jnp.eye(3, 4), camp, W, H,
                      jnp.zeros(3), sh_degree_active=0,
                      config=RasterConfig(max_pairs=mp, max_per_tile=16,
                                          tile_batch=8))
    n_pairs = int(res.n_pairs)
    assert n_pairs == mp + 1, n_pairs      # clip sentinel, bucket has room

    # an UNCLIPPED render of the same frame must report the true count
    res2 = render_core(params, alive, jnp.eye(3, 4), camp, W, H,
                       jnp.zeros(3), sh_degree_active=0,
                       config=RasterConfig(max_pairs=mp, max_per_tile=1024,
                                           tile_batch=8))
    assert int(res2.n_pairs) <= mp
    assert int(res2.n_pairs) > 0

    # host routing: sentinel doubles max_per_tile, leaves the bucket alone
    class P:
        max_pairs = mp
        max_per_tile = 16
    bucket = capacity.PairBucket(mp, quiet=True)
    assert capacity.pair_signal(mp + 1, bucket, P, 16)
    assert P.max_per_tile == 32
    assert bucket.max_pairs == mp
    # true overflow grows the bucket, not the tile knob
    assert capacity.pair_signal(mp + 2, bucket, P, 32)
    assert bucket.max_pairs > mp
    assert P.max_per_tile == 32
