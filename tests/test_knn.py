import jax
import jax.numpy as jnp
import numpy as np

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
