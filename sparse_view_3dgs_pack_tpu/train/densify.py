"""Densification (clone / split / prune) on padded buffers.

Functional, jitted version of the reference optimizer-surgery densification
(`LGDWT-GS/scene/gaussian_model.py:316-473`):

* stats: screen-space positional gradient norms accumulated per visible
  Gaussian (`add_densification_stats`, `gaussian_model.py:471-473`). The CUDA
  backward reports d/d(mean2D) in ndc·size/2 units (`backward.cu` ddelx_dx =
  0.5·W), so pixel-space grads are rescaled by (W/2, H/2) to keep the
  reference's 0.0002 threshold semantics.
* clone: grad ≥ τ and max-scale ≤ percent_dense·extent → copy.
* split: grad ≥ τ and max-scale > percent_dense·extent → 2 samples from
  N(0, S) rotated into world, scale ÷ (0.8·2); original pruned.
* prune: opacity < min_opacity, plus (when size-screening) screen radius or
  world size caps.

Static-shape strategy: alive slots form a compacted prefix; appends scatter
into [n_alive, …) (overflowing appends are DROPPED and reported via
`requested`, so the host can grow capacity — the static analogue of the
reference's dynamic reallocation); pruning compacts by a stable sort on the
keep mask. Adam moments ride along (permuted / zeroed for new slots) and the
densification statistics reset to zero after every event, exactly like
`densification_postfix`.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.gaussians import GaussianState, get_opacity, get_scaling
from ..utils.general import build_rotation, inverse_sigmoid
from .optim import AdamState, permute_adam, zero_adam_param, zero_adam_slots


def add_densification_stats(state: GaussianState, viewspace_grad_pixels,
                            radii, width: int, height: int) -> GaussianState:
    """viewspace_grad_pixels: (CAP, 2) d(loss)/d(means2d in pixels)."""
    scale = jnp.array([width * 0.5, height * 0.5], jnp.float32)
    g = jnp.linalg.norm(viewspace_grad_pixels[:, :2] * scale, axis=-1)
    visible = radii > 0
    return state._replace(
        xyz_gradient_accum=state.xyz_gradient_accum + jnp.where(visible, g, 0.0),
        denom=state.denom + visible.astype(jnp.float32),
        max_radii2d=jnp.where(visible,
                              jnp.maximum(state.max_radii2d,
                                          radii.astype(jnp.float32)),
                              state.max_radii2d),
    )


class DensifyResult(NamedTuple):
    state: GaussianState
    opt_state: AdamState
    requested: jnp.ndarray  # () int32 — appends requested (may exceed room)
    appended: jnp.ndarray   # () int32 — appends actually written
    pruned: jnp.ndarray     # () int32


@partial(jax.jit, static_argnames=("max_screen_size",))
def densify_and_prune(state: GaussianState, opt_state: AdamState,
                      key: jax.Array, max_grad: float, min_opacity: float,
                      extent, max_screen_size: int = 0,
                      percent_dense: float = 0.01,
                      extra_split_mask=None) -> DensifyResult:
    cap = state.capacity
    params = state.params
    alive = state.alive
    n_alive = state.n_alive

    grads = jnp.where(state.denom > 0,
                      state.xyz_gradient_accum / jnp.maximum(state.denom, 1.0),
                      0.0)
    max_scale = jnp.max(get_scaling(state), axis=-1)

    selected = alive & (grads >= max_grad)
    clone_mask = selected & (max_scale <= percent_dense * extent)
    split_mask = selected & (max_scale > percent_dense * extent)
    if extra_split_mask is not None:
        # FSGS adds a distance-based split criterion independent of the
        # gradient stats (`FSGS/scene/gaussian_model.py:434-437`)
        split_mask = split_mask | (alive & extra_split_mask)
        clone_mask = clone_mask & ~split_mask

    # ---------------------------------------------------------- appends
    n_new_per = clone_mask * 1 + split_mask * 2
    offs = jnp.cumsum(n_new_per) - n_new_per          # exclusive
    requested = offs[-1] + n_new_per[-1]
    base = n_alive

    # clone values: exact copies (aligned full-array scatter; cap → dropped)
    dst_clone = jnp.where(clone_mask, base + offs, cap)
    new_params = {}
    for k, a in params.items():
        if a.ndim >= 1 and a.shape[0] == cap:
            new_params[k] = a.at[dst_clone].set(a, mode="drop")
        else:
            new_params[k] = a

    # split values: 2 samples per split Gaussian
    stds = get_scaling(state)                           # (CAP, 3)
    R = build_rotation(params["rotation"])              # (CAP, 3, 3)
    new_scaling = jnp.log(stds / (0.8 * 2))
    for j in range(2):
        key, sub = jax.random.split(key)
        samples = jax.random.normal(sub, (cap, 3)) * stds
        new_xyz = jnp.einsum("nij,nj->ni", R, samples) + params["xyz"]
        dst = jnp.where(split_mask, base + offs + clone_mask * 1 + j, cap)
        for k, a in list(new_params.items()):
            if not (a.ndim >= 1 and a.shape[0] == cap):
                continue
            if k == "xyz":
                val = new_xyz
            elif k == "scaling":
                val = new_scaling
            else:
                val = params[k]
            new_params[k] = a.at[dst].set(val, mode="drop")

    appended = jnp.minimum(requested, cap - n_alive)
    slot_ids = jnp.arange(cap, dtype=jnp.int32)
    new_alive = alive | ((slot_ids >= base) & (slot_ids < base + appended))
    # zero Adam moments on appended slots
    opt_state = zero_adam_slots(opt_state,
                                (slot_ids >= base) & (slot_ids < base + appended))

    mid_state = state._replace(params=new_params, alive=new_alive,
                               n_alive=n_alive + appended)

    # ------------------------------------------------------------- prune
    opac = get_opacity(mid_state)
    prune = new_alive & (opac < min_opacity)
    if max_screen_size:
        big_vs = mid_state.max_radii2d > max_screen_size
        big_ws = jnp.max(get_scaling(mid_state), axis=-1) > 0.1 * extent
        prune = prune | (new_alive & (big_vs | big_ws))
    # split originals are pruned (reference prune_filter concat)
    prune = prune | split_mask
    keep = new_alive & ~prune

    # compact: stable sort keeps relative order of kept slots
    perm = jnp.argsort(~keep, stable=True).astype(jnp.int32)
    final_params = {k: (a[perm] if a.ndim >= 1 and a.shape[0] == cap else a)
                    for k, a in mid_state.params.items()}
    opt_state = permute_adam(opt_state, perm)

    n_final = jnp.sum(keep).astype(jnp.int32)
    final_state = GaussianState(
        params=final_params,
        alive=slot_ids < n_final,
        n_alive=n_final,
        exposure=mid_state.exposure,
        xyz_gradient_accum=jnp.zeros(cap),
        denom=jnp.zeros(cap),
        max_radii2d=jnp.zeros(cap),
    )
    pruned = jnp.sum(prune).astype(jnp.int32)
    return DensifyResult(final_state, opt_state, requested.astype(jnp.int32),
                         appended.astype(jnp.int32), pruned)


@jax.jit
def proximity_densify(state: GaussianState, opt_state: AdamState,
                      nn_idx, mask) -> DensifyResult:
    """FSGS proximity densification (`FSGS/scene/gaussian_model.py:405-421`):
    for each selected outlier Gaussian, append 3 midpoints to its nearest
    neighbours, taking the neighbour's scale and opacity, identity rotation,
    and black (zero) SH features. `nn_idx` is (CAP, 3) neighbour indices and
    `mask` the (CAP,) selection (dist > 5·extent and max-scale > extent,
    restricted to alive sources with alive neighbours)."""
    cap = state.capacity
    params = state.params
    base = state.n_alive

    n_new_per = mask * 3
    offs = jnp.cumsum(n_new_per) - n_new_per          # exclusive
    requested = offs[-1] + n_new_per[-1]

    new_params = dict(params)
    ident_quat = jnp.zeros_like(params["rotation"]).at[:, 0].set(1.0)
    for j in range(3):
        nb = nn_idx[:, j]
        dst = jnp.where(mask, base + offs + j, cap)
        for k, a in list(new_params.items()):
            if not (a.ndim >= 1 and a.shape[0] == cap):
                continue
            if k == "xyz":
                val = 0.5 * (params["xyz"] + params["xyz"][nb])
            elif k == "rotation":
                val = ident_quat
            elif k in ("features_dc", "features_rest"):
                val = jnp.zeros_like(a)
            else:                       # scaling, opacity, NIR extras
                val = params[k][nb]
            new_params[k] = a.at[dst].set(val, mode="drop")

    appended = jnp.minimum(requested, cap - base)
    slot_ids = jnp.arange(cap, dtype=jnp.int32)
    newmask = (slot_ids >= base) & (slot_ids < base + appended)
    opt_state = zero_adam_slots(opt_state, newmask)
    new_state = state._replace(
        params=new_params, alive=state.alive | newmask,
        n_alive=base + appended,
        xyz_gradient_accum=jnp.zeros(cap),
        denom=jnp.zeros(cap),
        max_radii2d=jnp.zeros(cap))
    return DensifyResult(new_state, opt_state, requested.astype(jnp.int32),
                         appended.astype(jnp.int32),
                         jnp.zeros((), jnp.int32))


@jax.jit
def reset_opacity(state: GaussianState, opt_state: AdamState):
    """opacity ← min(opacity, 0.01) pre-activation, moments zeroed
    (reference `reset_opacity`, `gaussian_model.py:258-261`)."""
    new_op = inverse_sigmoid(
        jnp.minimum(jax.nn.sigmoid(state.params["opacity"]), 0.01))
    params = dict(state.params)
    params["opacity"] = new_op
    return state._replace(params=params), zero_adam_param(opt_state, "opacity")


@partial(jax.jit, static_argnames=())
def prune_only(state: GaussianState, opt_state: AdamState, mask):
    """Prune an arbitrary mask (DNGaussian's spiral near-range pruning,
    reference `train_llff.py:206-213`)."""
    cap = state.capacity
    keep = state.alive & ~mask
    perm = jnp.argsort(~keep, stable=True).astype(jnp.int32)
    params = {k: (a[perm] if a.ndim >= 1 and a.shape[0] == cap else a)
              for k, a in state.params.items()}
    opt_state = permute_adam(opt_state, perm)
    n = jnp.sum(keep).astype(jnp.int32)
    slot_ids = jnp.arange(cap, dtype=jnp.int32)
    return state._replace(
        params=params, alive=slot_ids < n, n_alive=n,
        xyz_gradient_accum=state.xyz_gradient_accum[perm],
        denom=state.denom[perm],
        max_radii2d=state.max_radii2d[perm]), opt_state
