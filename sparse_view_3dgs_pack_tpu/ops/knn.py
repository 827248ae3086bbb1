"""3-nearest-neighbour mean squared distance (scale initialisation).

TPU-native replacement for `simple-knn` (reference
`gaussian-splatting/submodules/simple-knn/simple_knn.cu:45-186`): Morton-code
sort via `lax.sort` + a ±window candidate scan over the sorted order, instead
of CUDA's 1024-point boxes with AABB rejection. Also returns the 3 nearest
indices, matching the FSGS variant's API
(`FSGS/submodules/simple-knn/spatial.cu:15-26`) used by proximity-guided
densification. The windowed scan is approximate in the same accuracy class as
the reference's box search; `knn3_bruteforce` is the exact oracle for tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _expand_bits(v):
    """Spread 10 bits to every 3rd position (Morton interleave, the classic
    bit-twiddling used by the reference's `coord2Morton`)."""
    u = jnp.uint32
    v = (v * u(0x00010001)) & u(0xFF0000FF)
    v = (v * u(0x00000101)) & u(0x0F00F00F)
    v = (v * u(0x00000011)) & u(0xC30C30C3)
    v = (v * u(0x00000005)) & u(0x49249249)
    return v


def morton_codes(points, valid=None):
    """(N, 3) float → 30-bit Morton codes over the (valid-)point bbox.

    Invalid points get the all-ones code, sorting them past every valid
    point (out of all windows but each other's)."""
    if valid is None:
        lo = points.min(axis=0)
        hi = points.max(axis=0)
    else:
        v = valid[:, None]
        lo = jnp.where(v, points, jnp.inf).min(axis=0)
        hi = jnp.where(v, points, -jnp.inf).max(axis=0)
    scale = 1023.0 / jnp.maximum(hi - lo, 1e-9)
    q = jnp.clip((points - lo) * scale, 0, 1023).astype(jnp.uint32)
    codes = (_expand_bits(q[:, 0])
             | (_expand_bits(q[:, 1]) << 1)
             | (_expand_bits(q[:, 2]) << 2))
    if valid is not None:
        codes = jnp.where(valid, codes, jnp.uint32(0xFFFFFFFF))
    return codes


# Fixed orthonormal rotations (QR of a seeded normal): each pass Morton-sorts
# the ROTATED cloud, which decorrelates space-filling-curve cell boundaries
# across passes far better than axis permutations/shifts do.
_ROTATIONS = (
    None,
    ((-0.30565725, 0.94407778, -0.12365595),
     (-0.94346673, -0.31779850, -0.09420534),
     (-0.12823484, 0.08787073, 0.98784339)),
    ((-0.70347648, -0.24703727, -0.66640335),
     (0.05445328, -0.95362565, 0.29602863),
     (-0.70862944, 0.17196133, 0.68430521)),
)


def _pass_candidates(points, window, rotation, valid=None):
    """One Morton ordering (of the rotated cloud) → (candidate_d2 (N, 2w),
    candidate_idx (N, 2w)) in ORIGINAL point order; d2 in original space."""
    N = points.shape[0]
    if rotation is None:
        key_pts = points
    else:
        key_pts = points @ jnp.asarray(rotation, points.dtype).T
    codes = morton_codes(key_pts, valid)
    _, order = jax.lax.sort((codes, jnp.arange(N, dtype=jnp.int32)),
                            num_keys=1)
    sorted_pts = points[order]

    offsets = jnp.concatenate([jnp.arange(-window, 0),
                               jnp.arange(1, window + 1)]).astype(jnp.int32)
    pos = jnp.arange(N, dtype=jnp.int32)[:, None]
    cand = pos + offsets[None, :]                       # (N, 2w)
    in_range = (cand >= 0) & (cand < N)
    cand_c = jnp.clip(cand, 0, N - 1)
    diff = sorted_pts[:, None, :] - sorted_pts[cand_c]  # (N, 2w, 3)
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where(in_range, d2, jnp.inf)
    if valid is not None:
        # exclude invalid candidates (padded/dead capacity slots)
        d2 = jnp.where(valid[order][cand_c], d2, jnp.inf)
    cand_orig = order[cand_c]
    # back to original order via the inverse permutation + row gathers: a
    # direct 2-D scatter `.at[order].set(d2)` trips an XLA:TPU emitter
    # assert at row width 128 (SortedScatterEmitter gather-type check,
    # observed SIGABRT at window=64); the 1-D iota scatter + row gather
    # lowers cleanly at every width and row gathers are the fast gather
    # form on TPU anyway.
    inv_order = jnp.zeros_like(order).at[order].set(
        jnp.arange(N, dtype=order.dtype))
    return d2[inv_order], cand_orig[inv_order]


@partial(jax.jit, static_argnames=("window", "k", "passes"))
def knn3(points: jnp.ndarray, window: int = 32, k: int = 3, passes: int = 3,
         valid=None):
    """→ (mean of k smallest squared distances (N,), indices (N, k) int32).

    Multi-pass windowed Morton search: each pass sorts the cloud along a
    differently-rotated Morton curve and contributes ±window candidates;
    the k-NN are selected over the de-duplicated union. `valid` (N,) bool
    restricts both the bbox and the neighbour set (dead capacity slots).
    """
    d2s, idxs = [], []
    for rotation in _ROTATIONS[:passes]:
        d2, idx = _pass_candidates(points, window, rotation, valid)
        d2s.append(d2)
        idxs.append(idx)
    d2 = jnp.concatenate(d2s, axis=1)
    idx = jnp.concatenate(idxs, axis=1)

    # Each true neighbour can be found by up to `passes` passes, so to keep k
    # unique after de-duplication we must over-select k·passes candidates.
    m = k * passes
    neg_top, top_i = jax.lax.top_k(-d2, m)
    kd2 = -neg_top                                      # ascending d2
    kidx = jnp.take_along_axis(idx, top_i, axis=1)      # (N, m)

    # mask duplicate indices (keep first occurrence, left-to-right)
    dup = jnp.zeros(kidx.shape, bool)
    for j in range(1, m):
        dup = dup.at[:, j].set(
            jnp.any(kidx[:, :j] == kidx[:, j:j + 1], axis=1))
    kd2 = jnp.where(dup, jnp.inf, kd2)
    order2 = jnp.argsort(kd2, axis=1)[:, :k]
    kd2 = jnp.take_along_axis(kd2, order2, axis=1)
    kidx = jnp.take_along_axis(kidx, order2, axis=1)

    mean_d2 = jnp.mean(jnp.where(jnp.isfinite(kd2), kd2, 0.0), axis=1)
    return mean_d2, kidx.astype(jnp.int32)


def knn3_bruteforce(points, k: int = 3):
    """Exact O(N²) oracle."""
    d2 = jnp.sum((points[:, None, :] - points[None, :, :]) ** 2, axis=-1)
    d2 = jnp.where(jnp.eye(points.shape[0], dtype=bool), jnp.inf, d2)
    neg_top, idx = jax.lax.top_k(-d2, k)
    return jnp.mean(-neg_top, axis=1), idx


try:
    import fastio as _fastio
    NATIVE_KNN = hasattr(_fastio, "knn3_exact")
except ImportError:
    _fastio = None
    NATIVE_KNN = False


def knn3_exact(points, k: int = 3):
    """Exact k-NN on the host via the native grid search (`native/fastio.cpp`
    `knn3_exact`), the counterpart of the reference's box-rejection search
    (`simple-knn/simple_knn.cu:133-183`). → (mean_d2 (N,) f32, idx (N, k)
    i32, nearest first). Requires the fastio extension."""
    import numpy as np
    pts = np.ascontiguousarray(points, dtype=np.float32)
    n = pts.shape[0]
    bd2, bidx = _fastio.knn3_exact(pts.tobytes(), n, k)
    return (np.frombuffer(bd2, dtype=np.float32).copy(),
            np.frombuffer(bidx, dtype=np.int32).reshape(n, k).copy())


def dist2_for_scale_init(points, window: int = 32):
    """clamp_min(mean-3NN-d², 1e-7), the scale init used by
    `create_from_pcd` (reference `gaussian_model.py:149-176`).

    Host numpy input + available native extension → exact grid search;
    otherwise the on-device windowed-Morton approximation."""
    import numpy as np
    if NATIVE_KNN and isinstance(points, np.ndarray):
        d2, _ = knn3_exact(points)
        return np.maximum(d2, 1e-7)
    d2, _ = knn3(jnp.asarray(points), window=window)
    return jnp.maximum(d2, 1e-7)
