import math

import jax
import jax.numpy as jnp
import numpy as np

from sparse_view_3dgs_pack_tpu.utils import graphics, sh
from sparse_view_3dgs_pack_tpu.utils.general import (
    build_rotation, build_scaling_rotation, get_expon_lr_func, inverse_sigmoid)
from sparse_view_3dgs_pack_tpu.utils.image import psnr


def test_fov_focal_roundtrip():
    assert math.isclose(graphics.focal2fov(graphics.fov2focal(0.8, 640), 640), 0.8)


def test_world2view_inverse():
    rng = np.random.default_rng(0)
    # random rotation via QR
    Q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    t = rng.normal(size=3)
    W = graphics.get_world2view(Q, t)
    # camera center maps to origin
    C = np.linalg.inv(W)[:3, 3]
    p = W @ np.array([*C, 1.0])
    np.testing.assert_allclose(p[:3], 0.0, atol=1e-5)
    # orthonormal rotation block
    np.testing.assert_allclose(W[:3, :3] @ W[:3, :3].T, np.eye(3), atol=1e-5)


def test_projection_matrix_corners():
    znear, zfar = 0.01, 100.0
    fovx, fovy = 1.2, 0.9
    P = graphics.get_projection_matrix(znear, zfar, fovx, fovy)
    # point on the right edge of the near plane → ndc x = 1
    x = math.tan(fovx / 2) * znear
    p = P @ np.array([x, 0, znear, 1.0])
    assert math.isclose(p[0] / p[3], 1.0, rel_tol=1e-5)
    # far plane → ndc z = 1, near plane → 0
    pf = P @ np.array([0, 0, zfar, 1.0])
    assert math.isclose(pf[2] / pf[3], 1.0, rel_tol=1e-4)
    pn = P @ np.array([0, 0, znear, 1.0])
    assert abs(pn[2] / pn[3]) < 1e-5


def test_sh_degree0_is_constant():
    coeffs = jnp.zeros((5, 16, 3)).at[:, 0, :].set(1.0)
    dirs = jax.random.normal(jax.random.PRNGKey(0), (5, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    out = sh.eval_sh(3, coeffs, dirs)
    np.testing.assert_allclose(out, sh.C0, atol=1e-6)


def test_sh_rgb_roundtrip():
    rgb = jnp.array([[0.2, 0.5, 0.9]])
    np.testing.assert_allclose(sh.sh2rgb(sh.rgb2sh(rgb)), rgb, atol=1e-6)


def test_sh_orthogonality_parseval():
    # integrating |Y_lm|^2 over the sphere ≈ 1 for each basis fn (MC check)
    key = jax.random.PRNGKey(1)
    dirs = jax.random.normal(key, (50000, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    for k in range(9):
        coeffs = jnp.zeros((1, 16, 1)).at[0, k, 0].set(1.0)
        vals = sh.eval_sh(2, jnp.broadcast_to(coeffs, (dirs.shape[0], 16, 1)), dirs)
        integral = 4 * jnp.pi * jnp.mean(vals[..., 0] ** 2)
        assert abs(float(integral) - 1.0) < 0.05, (k, float(integral))


def test_build_rotation_orthonormal():
    q = jax.random.normal(jax.random.PRNGKey(2), (7, 4))
    R = build_rotation(q)
    eye = jnp.einsum('nij,nkj->nik', R, R)
    np.testing.assert_allclose(eye, jnp.broadcast_to(jnp.eye(3), (7, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-5)


def test_build_scaling_rotation_covariance_psd():
    q = jax.random.normal(jax.random.PRNGKey(3), (4, 4))
    s = jnp.abs(jax.random.normal(jax.random.PRNGKey(4), (4, 3))) + 0.1
    L = build_scaling_rotation(s, q)
    cov = jnp.einsum('nij,nkj->nik', L, L)
    evals = jnp.linalg.eigvalsh(cov)
    assert (evals > 0).all()
    # eigenvalues are s^2
    np.testing.assert_allclose(jnp.sort(evals, axis=-1),
                               jnp.sort(s ** 2, axis=-1), rtol=1e-4)


def test_expon_lr():
    f = get_expon_lr_func(1e-2, 1e-4, max_steps=100)
    assert math.isclose(float(f(0)), 1e-2, rel_tol=1e-5)
    assert math.isclose(float(f(100)), 1e-4, rel_tol=1e-5)
    assert math.isclose(float(f(50)), 1e-3, rel_tol=1e-4)
    g = get_expon_lr_func(0.0, 0.0)
    assert float(g(10)) == 0.0


def test_inverse_sigmoid():
    x = jnp.array([0.1, 0.5, 0.9])
    np.testing.assert_allclose(jax.nn.sigmoid(inverse_sigmoid(x)), x, atol=1e-6)


def test_psnr_identity():
    img = jnp.ones((3, 8, 8)) * 0.5
    assert float(psnr(img, img)) > 50
    noisy = img + 0.1
    assert 19 < float(psnr(img, noisy)) < 21


def test_ellipse_path_const_speed():
    """const_speed=True (reference default, `FSGS/utils/pose_utils.py:180`)
    resamples angles with `stepfun.sample_np` so per-frame arc lengths are
    near uniform even on an eccentric path with height variation."""
    from sparse_view_3dgs_pack_tpu.testing import make_orbit_cameras
    from sparse_view_3dgs_pack_tpu.utils.pose_utils import (
        generate_ellipse_path)

    from sparse_view_3dgs_pack_tpu.testing import look_at_rt
    cams = make_orbit_cameras(8, radius=3.0, width=32, height_px=32)
    # vary camera heights so the fitted path has real z variation (an
    # ellipse with height wobble has non-uniform naive arc speed)
    for i, c in enumerate(cams):
        a = 2 * np.pi * i / 8
        c.R, c.T = look_at_rt((3.0 * np.cos(a), 3.0 * np.sin(a),
                               1.2 + 0.8 * np.sin(a)), (0, 0, 0))

    def step_cv(path):
        pos = np.stack([np.linalg.inv(
            np.block([[c.R.T, c.T[:, None]], [np.zeros(3), 1.0]]))[:3, 3]
            for c in path])
        d = np.linalg.norm(np.diff(pos, axis=0), axis=-1)
        return d.std() / d.mean()

    fast = generate_ellipse_path(cams, n_frames=60, z_variation=0.8,
                                 const_speed=True)
    slow = generate_ellipse_path(cams, n_frames=60, z_variation=0.8,
                                 const_speed=False)
    assert len(fast) == len(slow) == 60
    assert step_cv(fast) < step_cv(slow)
