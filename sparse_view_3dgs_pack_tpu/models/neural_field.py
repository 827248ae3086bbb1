"""Neural color/opacity field — DNGaussian's GridRenderer in pure JAX
(reference `DNGaussian/scene/neural_renderer.py:33-134`).

sigma_net: MLP(hash(32) → 64 → 64 → 1+64); color_net: MLP(sh_dir(16)+geo(64)
→ 64 → 3). Color activation sigmoid·(1+2ε)−ε with ε=1e-3. The per-Gaussian
final opacity in the DNG model is sigmoid(sigma) · sigmoid(point_opacity)
(reference `DNGaussian/scene/gaussian_model.py:141-157`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.hashgrid import HashGridConfig, hashgrid_encode, init_hashgrid
from ..ops.shencode import sh_encode


class NeuralFieldConfig(NamedTuple):
    grid: HashGridConfig = HashGridConfig()
    hidden_dim: int = 64
    geo_feat_dim: int = 64
    num_layers_sigma: int = 3
    hidden_dim_color: int = 64
    num_layers_color: int = 2
    sh_degree: int = 4
    bound: float = 1.0


def _init_mlp(key, dims):
    params = []
    for i in range(len(dims) - 1):
        key, k = jax.random.split(key)
        # kaiming-uniform fan_in (torch Linear default)
        lim = (1.0 / dims[i]) ** 0.5
        w = jax.random.uniform(k, (dims[i], dims[i + 1]), minval=-lim,
                               maxval=lim)
        key, k = jax.random.split(key)
        b = jax.random.uniform(k, (dims[i + 1],), minval=-lim, maxval=lim)
        params.append({"w": w, "b": b})
    return params


def _mlp(params, x):
    for i, layer in enumerate(params):
        x = x @ layer["w"] + layer["b"]
        if i < len(params) - 1:
            x = jax.nn.relu(x)
    return x


def init_neural_field(key, cfg: NeuralFieldConfig = NeuralFieldConfig()):
    k1, k2, k3 = jax.random.split(key, 3)
    in_x = cfg.grid.output_dim
    sigma_dims = ([in_x] + [cfg.hidden_dim] * (cfg.num_layers_sigma - 1)
                  + [1 + cfg.geo_feat_dim])
    in_c = cfg.sh_degree ** 2 + cfg.geo_feat_dim
    color_dims = ([in_c] + [cfg.hidden_dim_color] * (cfg.num_layers_color - 1)
                  + [3])
    return {
        "encoder": init_hashgrid(k1, cfg.grid),
        "sigma_net": _init_mlp(k2, sigma_dims),
        "color_net": _init_mlp(k3, color_dims),
        "coord_center": jnp.zeros(3),
    }


def neural_density(params, x, cfg: NeuralFieldConfig = NeuralFieldConfig()):
    """x: (N, 3) → (sigma (N,), geo_feat (N, geo_feat_dim))."""
    enc = hashgrid_encode(params["encoder"], x - params["coord_center"],
                          cfg.grid, cfg.bound)
    h = _mlp(params["sigma_net"], enc)
    return h[:, 0], h[:, 1:]


def neural_color(params, geo_feat, dirs,
                 cfg: NeuralFieldConfig = NeuralFieldConfig()):
    enc_d = sh_encode(dirs, cfg.sh_degree)
    h = _mlp(params["color_net"], jnp.concatenate([enc_d, geo_feat], -1))
    return jax.nn.sigmoid(h) * (1 + 2 * 0.001) - 0.001


def neural_forward(params, x, dirs,
                   cfg: NeuralFieldConfig = NeuralFieldConfig()):
    """(sigma (N,), color (N, 3)) — `GridRenderer.forward`."""
    sigma, geo = neural_density(params, x, cfg)
    return sigma, neural_color(params, geo, dirs, cfg)


def save_neural_npz(path: str, params, cfg: NeuralFieldConfig) -> None:
    """Persist the field so render-time reconstruction matches training —
    the reference reloads the whole GridRenderer from `chkpnt_latest.pth`
    before rendering (`DNGaussian/train_llff.py:232-235`,
    `render.py:138-147`); here the npz travels with the PLY."""
    import os

    import numpy as np

    leaves, _ = jax.tree_util.tree_flatten_with_path(params)
    flat = {"p" + jax.tree_util.keystr(kp): np.asarray(leaf)
            for kp, leaf in leaves}
    flat["__cfg__"] = np.asarray(
        [cfg.grid.num_levels, cfg.grid.level_dim, cfg.grid.base_resolution,
         cfg.grid.log2_hashmap_size, cfg.grid.desired_resolution,
         cfg.hidden_dim, cfg.geo_feat_dim, cfg.num_layers_sigma,
         cfg.hidden_dim_color, cfg.num_layers_color, cfg.sh_degree],
        np.int64)
    flat["__bound__"] = np.asarray(cfg.bound, np.float32)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)


def load_neural_npz(path: str):
    """→ (params, cfg). Leaves are matched by pytree key-path against a
    template of the saved architecture, so loading is shape-checked."""
    import numpy as np

    data = np.load(path)
    c = [int(v) for v in data["__cfg__"]]
    cfg = NeuralFieldConfig(
        grid=HashGridConfig(*c[:5]), hidden_dim=c[5], geo_feat_dim=c[6],
        num_layers_sigma=c[7], hidden_dim_color=c[8], num_layers_color=c[9],
        sh_degree=c[10], bound=float(data["__bound__"]))
    template = init_neural_field(jax.random.PRNGKey(0), cfg)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    loaded = []
    for kp, leaf in leaves:
        arr = jnp.asarray(data["p" + jax.tree_util.keystr(kp)])
        if arr.shape != leaf.shape:
            raise ValueError(f"neural npz leaf {jax.tree_util.keystr(kp)}: "
                             f"shape {arr.shape} != expected {leaf.shape}")
        loaded.append(arr)
    return jax.tree_util.tree_unflatten(treedef, loaded), cfg
