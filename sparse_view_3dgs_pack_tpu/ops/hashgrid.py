"""Instant-NGP multiresolution hash-grid encoding, pure JAX.

Replaces DNGaussian's CUDA `gridencoder`
(`DNGaussian/gridencoder/src/gridencoder.cu`, wrapper `grid.py`): 16 levels ×
2 features, 2^19 table, growth factor from base→desired resolution, trilinear
interpolation, xor-prime hashing. On TPU this is gathers + FMAs — XLA fuses
the whole stack; no custom kernel needed (SURVEY §2 N6 plan).

Gradients flow to the table via the gather transpose (deterministic
scatter-add), matching the CUDA backward's atomicAdd semantics.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861)


class HashGridConfig(NamedTuple):
    num_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    desired_resolution: int = 512

    @property
    def output_dim(self):
        return self.num_levels * self.level_dim

    def resolutions(self):
        if self.num_levels == 1:
            return [self.base_resolution]
        b = np.exp(np.log(self.desired_resolution / self.base_resolution)
                   / (self.num_levels - 1))
        return [int(np.floor(self.base_resolution * b ** l))
                for l in range(self.num_levels)]


def init_hashgrid(key, cfg: HashGridConfig = HashGridConfig(),
                  scale: float = 1e-4) -> jnp.ndarray:
    """(num_levels, 2^log2_size, level_dim) uniform in [-scale, scale]
    (torch-ngp init)."""
    size = 1 << cfg.log2_hashmap_size
    return jax.random.uniform(key, (cfg.num_levels, size, cfg.level_dim),
                              minval=-scale, maxval=scale)


def _corner_index(ix, iy, iz, res, table_size):
    """Dense index when the level fits; else xor-prime hash."""
    if (res + 1) ** 3 <= table_size:
        stride = jnp.uint32(res + 1)
        return (ix * stride + iy) * stride + iz
    h = ((ix * jnp.uint32(_PRIMES[0]))
         ^ (iy * jnp.uint32(_PRIMES[1]))
         ^ (iz * jnp.uint32(_PRIMES[2])))
    return h & jnp.uint32(table_size - 1)


@partial(jax.jit, static_argnames=("cfg",))
def hashgrid_encode(table: jnp.ndarray, x: jnp.ndarray,
                    cfg: HashGridConfig = HashGridConfig(),
                    bound: float = 1.0) -> jnp.ndarray:
    """x: (N, 3) in [-bound, bound] → (N, num_levels·level_dim)."""
    table_size = 1 << cfg.log2_hashmap_size
    u = jnp.clip((x + bound) / (2.0 * bound), 0.0, 1.0)   # (N, 3) in [0,1]

    outs = []
    for l, res in enumerate(cfg.resolutions()):
        pos = u * res                                      # (N, 3)
        pos0 = jnp.floor(pos).astype(jnp.int32)
        pos0 = jnp.clip(pos0, 0, res - 1)
        frac = pos - pos0

        feat = jnp.zeros((x.shape[0], cfg.level_dim), x.dtype)
        for cx in (0, 1):
            wx = (1 - frac[:, 0]) if cx == 0 else frac[:, 0]
            for cy in (0, 1):
                wy = (1 - frac[:, 1]) if cy == 0 else frac[:, 1]
                for cz in (0, 1):
                    wz = (1 - frac[:, 2]) if cz == 0 else frac[:, 2]
                    idx = _corner_index(
                        (pos0[:, 0] + cx).astype(jnp.uint32),
                        (pos0[:, 1] + cy).astype(jnp.uint32),
                        (pos0[:, 2] + cz).astype(jnp.uint32),
                        res, table_size).astype(jnp.int32)
                    w = (wx * wy * wz)[:, None]
                    feat = feat + w * table[l, idx]
        outs.append(feat)
    return jnp.concatenate(outs, axis=-1)
