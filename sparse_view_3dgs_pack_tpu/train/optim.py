"""Per-group Adam with schedules, moment surgery, and visibility masking.

Functional equivalent of the reference's `torch.optim.Adam(l, lr=0.0,
eps=1e-15)` param groups + `get_expon_lr_func` xyz schedule
(`gaussian_model.py:178-223`), plus the optional SparseGaussianAdam
(visibility-masked update, `train.py:281-287`). Moments live in the same
padded buffers as parameters so densification events can permute/zero them
(the reference's `cat_tensors_to_optimizer` / `_prune_optimizer` surgery,
`gaussian_model.py:316-407`).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..utils.general import get_expon_lr_func

BETA1, BETA2 = 0.9, 0.999
EPS = 1e-15


class AdamState(NamedTuple):
    m: dict       # name → first moment (same shape as param)
    v: dict       # name → second moment
    step: jnp.ndarray  # () int32


def init_adam(params: dict) -> AdamState:
    zeros = {k: jnp.zeros_like(p) for k, p in params.items()}
    return AdamState(m=zeros,
                     v={k: jnp.zeros_like(p) for k, p in params.items()},
                     step=jnp.zeros((), jnp.int32))


def make_lr_schedules(opt_args, spatial_lr_scale: float) -> dict:
    """name → lr(step). Mirrors `training_setup` (`gaussian_model.py:183-211`)."""
    xyz_sched = get_expon_lr_func(
        lr_init=opt_args.position_lr_init * spatial_lr_scale,
        lr_final=opt_args.position_lr_final * spatial_lr_scale,
        lr_delay_mult=opt_args.position_lr_delay_mult,
        max_steps=opt_args.position_lr_max_steps)
    consts = {
        "features_dc": opt_args.feature_lr,
        "features_rest": opt_args.feature_lr / 20.0,
        "opacity": opt_args.opacity_lr,
        "scaling": opt_args.scaling_lr,
        "rotation": opt_args.rotation_lr,
        "nir_albedo": getattr(opt_args, "nir_albedo_lr", 0.0025),
        "nir_gain": getattr(opt_args, "nir_gain_lr", 0.001),
    }
    scheds = {"xyz": xyz_sched}
    for k, lr in consts.items():
        scheds[k] = (lambda lr_: lambda step: jnp.asarray(lr_, jnp.float32))(lr)
    return scheds


def adam_update(params: dict, grads: dict, state: AdamState, lrs: dict,
                visibility: Optional[jnp.ndarray] = None):
    """One Adam step. `lrs`: name → scalar lr (already evaluated for this
    step). `visibility`: optional (CAP,) mask — masked entries keep params AND
    moments unchanged (SparseGaussianAdam semantics)."""
    step = state.step + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - BETA1 ** t
    bc2 = 1.0 - BETA2 ** t

    new_params, new_m, new_v = {}, {}, {}
    for k, p in params.items():
        g = grads[k]
        m = BETA1 * state.m[k] + (1 - BETA1) * g
        v = BETA2 * state.v[k] + (1 - BETA2) * (g * g)
        update = lrs[k] * (m / bc1) / (jnp.sqrt(v / bc2) + EPS)
        p_new = p - update
        if visibility is not None and p.ndim >= 1 and p.shape[0] == visibility.shape[0]:
            vis = visibility.reshape((-1,) + (1,) * (p.ndim - 1))
            p_new = jnp.where(vis, p_new, p)
            m = jnp.where(vis, m, state.m[k])
            v = jnp.where(vis, v, state.v[k])
        new_params[k] = p_new
        new_m[k] = m
        new_v[k] = v
    return new_params, AdamState(m=new_m, v=new_v, step=step)


def permute_adam(state: AdamState, perm: jnp.ndarray,
                 capacity_axis_names=None) -> AdamState:
    """Apply a slot permutation to the moment buffers (prune compaction)."""
    def apply(d):
        out = {}
        for k, a in d.items():
            if a.ndim >= 1 and a.shape[0] == perm.shape[0]:
                out[k] = a[perm]
            else:
                out[k] = a
        return out

    return AdamState(m=apply(state.m), v=apply(state.v), step=state.step)


def zero_adam_slots(state: AdamState, mask: jnp.ndarray) -> AdamState:
    """Zero moments where mask is True (new densified slots / opacity reset)."""
    def apply(d):
        out = {}
        for k, a in d.items():
            if a.ndim >= 1 and a.shape[0] == mask.shape[0]:
                mm = mask.reshape((-1,) + (1,) * (a.ndim - 1))
                out[k] = jnp.where(mm, 0.0, a)
            else:
                out[k] = a
        return out

    return AdamState(m=apply(state.m), v=apply(state.v), step=state.step)


def zero_adam_param(state: AdamState, name: str) -> AdamState:
    m = dict(state.m)
    v = dict(state.v)
    m[name] = jnp.zeros_like(m[name])
    v[name] = jnp.zeros_like(v[name])
    return AdamState(m=m, v=v, step=state.step)


class TreeAdam(NamedTuple):
    """Generic pytree Adam (neural-field params etc.)."""
    m: object
    v: object
    step: jnp.ndarray


def init_tree_adam(params) -> TreeAdam:
    return TreeAdam(m=jax.tree.map(jnp.zeros_like, params),
                    v=jax.tree.map(jnp.zeros_like, params),
                    step=jnp.zeros((), jnp.int32))


def tree_adam_update(params, grads, state: TreeAdam, lr_tree,
                     eps: float = EPS):
    """lr_tree: matching pytree of scalars, or a single scalar."""
    step = state.step + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - BETA1 ** t
    bc2 = 1.0 - BETA2 ** t
    new_m = jax.tree.map(lambda m, g: BETA1 * m + (1 - BETA1) * g,
                         state.m, grads)
    new_v = jax.tree.map(lambda v, g: BETA2 * v + (1 - BETA2) * g * g,
                         state.v, grads)
    if jax.tree_util.treedef_is_leaf(jax.tree.structure(lr_tree)):
        lr_tree = jax.tree.map(lambda _: lr_tree, params)
    new_params = jax.tree.map(
        lambda p, m, v, lr: p - lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps),
        params, new_m, new_v, lr_tree)
    return new_params, TreeAdam(m=new_m, v=new_v, step=step)


class ExposureAdam(NamedTuple):
    m: jnp.ndarray
    v: jnp.ndarray
    step: jnp.ndarray


def init_exposure_adam(exposure) -> ExposureAdam:
    return ExposureAdam(m=jnp.zeros_like(exposure),
                        v=jnp.zeros_like(exposure),
                        step=jnp.zeros((), jnp.int32))


def make_exposure_schedule(opt_args) -> Callable:
    return get_expon_lr_func(
        lr_init=getattr(opt_args, "exposure_lr_init", 0.01),
        lr_final=getattr(opt_args, "exposure_lr_final", 0.001),
        lr_delay_steps=getattr(opt_args, "exposure_lr_delay_steps", 0),
        lr_delay_mult=getattr(opt_args, "exposure_lr_delay_mult", 0.0),
        max_steps=getattr(opt_args, "iterations", 30000))


def exposure_adam_update(exposure, grad, state: ExposureAdam, lr):
    step = state.step + 1
    t = step.astype(jnp.float32)
    m = BETA1 * state.m + (1 - BETA1) * grad
    v = BETA2 * state.v + (1 - BETA2) * grad * grad
    update = lr * (m / (1 - BETA1 ** t)) / (
        jnp.sqrt(v / (1 - BETA2 ** t)) + 1e-8)
    return exposure - update, ExposureAdam(m=m, v=v, step=step)
