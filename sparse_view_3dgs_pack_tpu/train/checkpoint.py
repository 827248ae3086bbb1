"""Training checkpoints: (GaussianState, AdamState, ExposureAdam, carry,
iteration) — the role of the reference's `torch.save((gaussians.capture(),
iteration), chkpntN.pth)` (`LGDWT-GS/train.py:290-292`,
`gaussian_model.py:68-100`). Stored as a compressed npz of the flattened
pytree (host-portable; no framework pickle)."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..models.gaussians import GaussianState
from .optim import AdamState, ExposureAdam
from .step import StepCarry


def save_checkpoint(path: str, state: GaussianState, adam: AdamState,
                    exp_adam: ExposureAdam, carry: StepCarry,
                    iteration: int) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = {}

    def put(prefix, tree):
        leaves, _ = jax.tree_util.tree_flatten_with_path(tree)
        for keypath, leaf in leaves:
            key = prefix + "/" + jax.tree_util.keystr(keypath)
            flat[key] = np.asarray(leaf)

    put("state", state._asdict())
    put("adam", adam._asdict())
    put("exp_adam", exp_adam._asdict())
    put("carry", carry._asdict())
    flat["iteration"] = np.asarray(iteration)
    np.savez_compressed(path, **flat)


def load_checkpoint(path: str):
    data = np.load(path, allow_pickle=False)
    iteration = int(data["iteration"])

    def get(prefix, template):
        leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
        vals = []
        for keypath, _ in leaves:
            key = prefix + "/" + jax.tree_util.keystr(keypath)
            vals.append(jnp.asarray(data[key]))
        return jax.tree_util.tree_unflatten(treedef, vals)

    # templates need matching structure: reconstruct dict skeletons from keys
    def skeleton(prefix):
        tree = {}
        plen = len(prefix) + 1
        for key in data.files:
            if not key.startswith(prefix + "/"):
                continue
            # keystr for dicts looks like ['a']['b']; parse the bracket path
            parts = [p.strip("[]'\"") for p in
                     key[plen:].replace("']['", "|").strip("[']").split("|")]
            node = tree
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(data[key])
        return tree

    sd = skeleton("state")
    state = GaussianState(params=sd["params"], alive=sd["alive"].astype(bool),
                          n_alive=sd["n_alive"].astype(jnp.int32),
                          exposure=sd["exposure"],
                          xyz_gradient_accum=sd["xyz_gradient_accum"],
                          denom=sd["denom"], max_radii2d=sd["max_radii2d"])
    ad = skeleton("adam")
    adam = AdamState(m=ad["m"], v=ad["v"], step=ad["step"].astype(jnp.int32))
    ea = skeleton("exp_adam")
    exp_adam = ExposureAdam(m=ea["m"], v=ea["v"],
                            step=ea["step"].astype(jnp.int32))
    ca = skeleton("carry")
    carry = StepCarry(dwt_running_mean=ca["dwt_running_mean"])
    return state, adam, exp_adam, carry, iteration
