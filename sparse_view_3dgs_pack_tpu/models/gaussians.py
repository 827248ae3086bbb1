"""GaussianState: the optimizable point set as a padded functional pytree.

Role of the reference `scene/gaussian_model.py` (`LGDWT-GS/scene/gaussian_model.py:50-473`)
re-designed for XLA's static shapes: parameters live in fixed-capacity buffers
with a compacted alive prefix (`n_alive` is a device scalar; `capacity` is
static). Densify/clone/split/prune (in `train/densify.py`) permute and append
within the buffers; capacity growth doubles the buffers on the host and
re-jits. Dead slots render as radii-0/opacity-0 and cost nothing past the
preprocess stage.

Parameter storage conventions match the reference exactly (pre-activation):
  xyz           (CAP, 3)
  features_dc   (CAP, 1, C)      SH degree-0 coefficients
  features_rest (CAP, K-1, C)    higher SH coefficients
  scaling       (CAP, 3)         log-scale
  rotation      (CAP, 4)         unnormalised quaternion (w, x, y, z)
  opacity       (CAP, 1)         inverse-sigmoid
plus optional mult-dwtgs NIR params (`mult-dwtgs/scene/gaussian_model.py:51-77`):
  nir_albedo    (CAP, 1)         inverse-sigmoid
  nir_gain      (1,)             scalar gain

PLY export is byte-compatible with the reference schema
(`gaussian_model.py:225-256`) so SIBR and downstream tools keep working.
"""

from __future__ import annotations

import json
import os
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import ply as ply_io
from ..ops.knn import dist2_for_scale_init
from ..utils.general import build_scaling_rotation, inverse_sigmoid
from ..utils.sh import rgb2sh


class GaussianState(NamedTuple):
    params: dict            # name → array (see module docstring)
    alive: jnp.ndarray      # (CAP,) bool
    n_alive: jnp.ndarray    # () int32
    exposure: jnp.ndarray   # (n_images, 3, 4)
    # densification statistics (reference train.py:265-276)
    xyz_gradient_accum: jnp.ndarray  # (CAP,)
    denom: jnp.ndarray               # (CAP,)
    max_radii2d: jnp.ndarray         # (CAP,)

    @property
    def capacity(self) -> int:
        return self.params["xyz"].shape[0]

    @property
    def sh_channels(self) -> int:
        return self.params["features_dc"].shape[-1]

    @property
    def max_sh_degree(self) -> int:
        k = self.params["features_dc"].shape[1] + self.params["features_rest"].shape[1]
        return int(round(k ** 0.5)) - 1


# ------------------------------------------------------------ activations

def get_xyz(state):
    return state.params["xyz"]


def get_scaling(state):
    return jnp.exp(state.params["scaling"])


def get_rotation(state):
    q = state.params["rotation"]
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)


def get_opacity(state):
    """(CAP,) activated opacity, zeroed on dead slots."""
    return jax.nn.sigmoid(state.params["opacity"][:, 0]) * state.alive


def get_features(state):
    return jnp.concatenate([state.params["features_dc"],
                            state.params["features_rest"]], axis=1)


def get_nir_albedo(state):
    return jax.nn.sigmoid(state.params["nir_albedo"][:, 0])


def get_covariance(state, scale_modifier=1.0):
    L = build_scaling_rotation(scale_modifier * get_scaling(state),
                               state.params["rotation"])
    return jnp.einsum("...ij,...kj->...ik", L, L)


# ------------------------------------------------------------ construction

def create_from_pcd(points: np.ndarray, colors: np.ndarray, n_images: int,
                    sh_degree: int = 3, capacity: Optional[int] = None,
                    channels: int = 3, use_nir: bool = False,
                    init_opacity: float = 0.1) -> GaussianState:
    """Initialise from a point cloud (reference `create_from_pcd`,
    `gaussian_model.py:149-176`): SH-DC from colors, log-scale from
    mean-3NN distance, identity rotations, opacity 0.1."""
    n = points.shape[0]
    cap = capacity or _next_capacity(n)
    K = (sh_degree + 1) ** 2

    xyz = np.zeros((cap, 3), np.float32)
    xyz[:n] = points
    f_dc = np.zeros((cap, 1, channels), np.float32)
    f_dc[:n, 0, :] = np.asarray(rgb2sh(jnp.asarray(colors[:, :channels])))
    f_rest = np.zeros((cap, K - 1, channels), np.float32)

    # numpy input routes to the native exact grid search when built
    d2 = np.asarray(dist2_for_scale_init(np.asarray(points, np.float32)))
    scaling = np.full((cap, 3), -10.0, np.float32)
    scaling[:n] = np.log(np.sqrt(d2))[:, None]

    rotation = np.zeros((cap, 4), np.float32)
    rotation[:, 0] = 1.0
    opacity = np.full((cap, 1),
                      float(inverse_sigmoid(jnp.asarray(init_opacity))),
                      np.float32)

    params = {
        "xyz": jnp.asarray(xyz),
        "features_dc": jnp.asarray(f_dc),
        "features_rest": jnp.asarray(f_rest),
        "scaling": jnp.asarray(scaling),
        "rotation": jnp.asarray(rotation),
        "opacity": jnp.asarray(opacity),
    }
    if use_nir:
        params["nir_albedo"] = jnp.full((cap, 1),
                                        float(inverse_sigmoid(jnp.asarray(0.5))))
        params["nir_gain"] = jnp.ones((1,))

    alive = jnp.arange(cap) < n
    exposure = jnp.broadcast_to(jnp.eye(3, 4), (max(n_images, 1), 3, 4))
    return GaussianState(
        params=params, alive=alive,
        n_alive=jnp.asarray(n, jnp.int32),
        exposure=jnp.asarray(exposure, jnp.float32),
        xyz_gradient_accum=jnp.zeros(cap),
        denom=jnp.zeros(cap),
        max_radii2d=jnp.zeros(cap),
    )


def _next_capacity(n: int, minimum: int = 1 << 12) -> int:
    cap = minimum
    while cap < n * 1.5:
        cap *= 2
    return cap


def grow_capacity(state: GaussianState, new_capacity: int) -> GaussianState:
    """Host-side buffer doubling (triggers re-jit downstream).

    Pad values matter: a zero-padded quaternion has zero norm, and the
    normalisation's sqrt has an INFINITE gradient at 0 — autodiff turns the
    dead slots' zero cotangents into NaN (0·inf), Adam writes NaN params,
    and the NaN conics cast to garbage radii that can make every dead slot
    touch every tile (a 20M-pair explosion at the first capacity growth of
    a long run). Dead slots get identity rotations and log-scale/-opacity
    floors, exactly like create_from_pcd's initial padding."""
    cap = state.capacity
    assert new_capacity > cap

    _FILL = {"rotation": None, "scaling": -10.0, "opacity": -10.0}

    def pad(a, k=None):
        pads = [(0, new_capacity - cap)] + [(0, 0)] * (a.ndim - 1)
        fill = _FILL.get(k, 0.0)
        if k == "rotation":
            ident = jnp.zeros((new_capacity - cap, 4), a.dtype).at[:, 0].set(1.0)
            return jnp.concatenate([a, ident], axis=0)
        return jnp.pad(a, pads, constant_values=fill)

    params = {k: (pad(v, k) if v.shape and v.shape[0] == cap else v)
              for k, v in state.params.items()}
    return state._replace(
        params=params,
        alive=pad(state.alive),
        xyz_gradient_accum=pad(state.xyz_gradient_accum),
        denom=pad(state.denom),
        max_radii2d=pad(state.max_radii2d),
    )


# ------------------------------------------------------------ PLY IO

def save_ply(state: GaussianState, path: str) -> None:
    """Reference-schema PLY (x,y,z,nx,ny,nz,f_dc_*,f_rest_*,opacity,
    scale_*,rot_*), alive points only, binary little-endian."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    n = int(state.n_alive)
    p = {k: np.asarray(v)[:n] for k, v in state.params.items()
         if k != "nir_gain"}

    props = {}
    xyz = p["xyz"]
    props["x"], props["y"], props["z"] = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    zeros = np.zeros(n, np.float32)
    props["nx"], props["ny"], props["nz"] = zeros, zeros.copy(), zeros.copy()
    f_dc = p["features_dc"].transpose(0, 2, 1).reshape(n, -1)  # channel-major
    for i in range(f_dc.shape[1]):
        props[f"f_dc_{i}"] = np.ascontiguousarray(f_dc[:, i])
    f_rest = p["features_rest"].transpose(0, 2, 1).reshape(n, -1)
    for i in range(f_rest.shape[1]):
        props[f"f_rest_{i}"] = np.ascontiguousarray(f_rest[:, i])
    props["opacity"] = p["opacity"][:, 0]
    for i in range(3):
        props[f"scale_{i}"] = p["scaling"][:, i]
    for i in range(4):
        props[f"rot_{i}"] = p["rotation"][:, i]
    if "nir_albedo" in p:
        props["nir_albedo"] = p["nir_albedo"][:, 0]
    ply_io.write_ply(path, {k: np.asarray(v, np.float32)
                            for k, v in props.items()})


def load_ply(path: str, sh_degree: int = 3, capacity: Optional[int] = None,
             n_images: int = 1) -> GaussianState:
    v = ply_io.read_ply(path)
    n = len(v["x"])
    cap = capacity or _next_capacity(n)

    xyz = np.stack([v["x"], v["y"], v["z"]], axis=1)
    opacity = v["opacity"][:, None]
    n_dc = len([k for k in v if k.startswith("f_dc_")])
    channels = n_dc
    rest_names = sorted([k for k in v if k.startswith("f_rest_")],
                        key=lambda s: int(s.split("_")[-1]))
    K = (sh_degree + 1) ** 2
    if rest_names:
        f_rest = np.stack([v[k] for k in rest_names], axis=1)
        f_rest = f_rest.reshape(n, channels, K - 1).transpose(0, 2, 1)
    else:
        f_rest = np.zeros((n, K - 1, channels), np.float32)
    f_dc = np.stack([v[f"f_dc_{i}"] for i in range(n_dc)],
                    axis=1).reshape(n, channels, 1).transpose(0, 2, 1)
    scaling = np.stack([v[f"scale_{i}"] for i in range(3)], axis=1)
    rotation = np.stack([v[f"rot_{i}"] for i in range(4)], axis=1)

    def padded(a, fill=0.0):
        out = np.full((cap,) + a.shape[1:], fill, np.float32)
        out[:n] = a
        return jnp.asarray(out)

    params = {
        "xyz": padded(xyz),
        "features_dc": padded(f_dc),
        "features_rest": padded(f_rest),
        "scaling": padded(scaling, -10.0),
        "rotation": padded(rotation),
        "opacity": padded(opacity, -10.0),
    }
    if "nir_albedo" in v:
        params["nir_albedo"] = padded(v["nir_albedo"][:, None])
        params["nir_gain"] = jnp.ones((1,))
    return GaussianState(
        params=params,
        alive=jnp.arange(cap) < n,
        n_alive=jnp.asarray(n, jnp.int32),
        exposure=jnp.broadcast_to(jnp.eye(3, 4), (n_images, 3, 4)).astype(jnp.float32),
        xyz_gradient_accum=jnp.zeros(cap),
        denom=jnp.zeros(cap),
        max_radii2d=jnp.zeros(cap),
    )


def save_exposure_json(state: GaussianState, image_names, path: str) -> None:
    """`exposure.json` sidecar (reference `scene/__init__.py:86-95`)."""
    exp = np.asarray(state.exposure)
    out = {name: exp[min(i, len(exp) - 1)].tolist()
           for i, name in enumerate(image_names)}
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
