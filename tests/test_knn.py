import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_view_3dgs_pack_tpu.ops.knn import (
    dist2_for_scale_init, knn3, knn3_bruteforce, morton_codes)


def test_morton_locality():
    pts = jnp.array([[0.0, 0, 0], [0.01, 0, 0], [1.0, 1, 1]])
    c = np.asarray(morton_codes(pts), dtype=np.uint32)
    assert abs(int(c[0]) - int(c[1])) < abs(int(c[0]) - int(c[2]))


def test_knn_matches_bruteforce_uniform():
    pts = jax.random.uniform(jax.random.PRNGKey(0), (500, 3))
    approx, idx = knn3(pts, window=48)
    exact, _ = knn3_bruteforce(pts)
    rel = np.abs(np.asarray(approx) - np.asarray(exact)) / np.asarray(exact)
    # windowed Morton scan: near-exact for the vast majority of points
    assert np.median(rel) < 1e-5
    assert np.mean(rel) < 0.05
    assert (np.asarray(approx) >= np.asarray(exact) - 1e-6).all()  # never undershoots


def test_knn_indices_reasonable():
    pts = jax.random.uniform(jax.random.PRNGKey(1), (200, 3))
    d2, idx = knn3(pts, window=64)
    exact, idx_exact = knn3_bruteforce(pts)
    # indices must never include self
    assert not (np.asarray(idx) == np.arange(200)[:, None]).any()
    # most nearest-index sets agree with brute force
    agree = np.mean([len(set(a) & set(b)) / 3.0
                     for a, b in zip(np.asarray(idx), np.asarray(idx_exact))])
    assert agree > 0.9


def test_knn_clustered():
    # two tight clusters far apart: distances should reflect intra-cluster NN
    rng = np.random.default_rng(0)
    a = rng.normal(0, 0.01, (100, 3))
    b = rng.normal(10, 0.01, (100, 3))
    pts = jnp.asarray(np.vstack([a, b]), dtype=jnp.float32)
    d2, _ = knn3(pts, window=32)
    assert float(jnp.max(d2)) < 0.01  # all NNs intra-cluster


def test_scale_init_clamped():
    pts = jnp.zeros((10, 3))  # degenerate: all same point
    d2 = dist2_for_scale_init(pts)
    assert (np.asarray(d2) >= 1e-7).all()


def test_native_exact_knn_matches_bruteforce():
    """Native grid search (`native/fastio.cpp knn3_exact`) is EXACT — it must
    match the O(N²) oracle bit-for-bit on indices (reference exactness class:
    `simple-knn/simple_knn.cu:133-183` box-rejection search)."""
    from sparse_view_3dgs_pack_tpu.ops.knn import NATIVE_KNN, knn3_exact
    if not NATIVE_KNN:
        import pytest
        pytest.skip("fastio extension not built")
    rng = np.random.default_rng(7)
    for pts in (
        rng.uniform(size=(997, 3)).astype(np.float32),          # uniform
        np.vstack([rng.normal(0, 0.01, (300, 3)),               # clusters
                   rng.normal(5, 0.01, (300, 3))]).astype(np.float32),
        rng.normal(size=(800, 3)).astype(np.float32)
        * np.array([1, 1, 1e-4], np.float32),                   # thin slab
    ):
        d2, idx = knn3_exact(pts)
        bd2, bidx = knn3_bruteforce(jnp.asarray(pts))
        np.testing.assert_allclose(d2, np.asarray(bd2), rtol=0, atol=1e-5)
        assert (np.sort(idx, 1) == np.sort(np.asarray(bidx), 1)).all()


def test_native_exact_knn_degenerate_and_tiny():
    from sparse_view_3dgs_pack_tpu.ops.knn import NATIVE_KNN, knn3_exact
    if not NATIVE_KNN:
        import pytest
        pytest.skip("fastio extension not built")
    d2, idx = knn3_exact(np.zeros((50, 3), np.float32))
    assert (d2 == 0).all() and not (idx == np.arange(50)[:, None]).any()
    d2, idx = knn3_exact(np.zeros((2, 3), np.float32))  # n-1 < k
    assert idx.shape == (2, 3) and (idx[:, 1:] == -1).all()
    d2, idx = knn3_exact(np.zeros((0, 3), np.float32))
    assert d2.shape == (0,)


def test_scale_init_numpy_routes_native():
    """numpy input → exact native path (same clamp semantics as the JAX
    fallback); both paths agree on a random cloud.

    Requires the fastio extension: without it, numpy input falls back to the
    windowed approximation at the DEFAULT window, and comparing two
    different-window approximations makes the never-undershoots assertion
    meaningless (observed as a spurious failure when the .so was absent)."""
    from sparse_view_3dgs_pack_tpu.ops.knn import NATIVE_KNN
    if not NATIVE_KNN:
        pytest.skip("fastio extension not built")
    pts = np.random.default_rng(3).uniform(size=(400, 3)).astype(np.float32)
    d_np = np.asarray(dist2_for_scale_init(pts))
    d_jx = np.asarray(dist2_for_scale_init(jnp.asarray(pts), window=64))
    assert (d_np >= 1e-7).all()
    # windowed JAX path never undershoots the exact distances
    assert (d_jx >= d_np - 1e-6).all()
    rel = np.abs(d_jx - d_np) / d_np
    assert np.median(rel) < 1e-5
