#!/usr/bin/env python3
"""Standalone Mosaic primitive probes: iota layout, triu-matmul cumsum,
dynamic-offset DMA — find which one miscompiles on this TPU."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
log("devices:", jax.devices())

PIX, CHUNK, TILE = 256, 256, 16

# ---------------- probe 1: iota + pixel coords ----------------
def k_iota(out_ref):
    t = pl.program_id(0)
    tx = (t % 4) * TILE
    ty = (t // 4) * TILE
    pidx = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    px = (tx + pidx % TILE).astype(jnp.float32)
    py = (ty + pidx // TILE).astype(jnp.float32)
    out_ref[0] = jnp.concatenate([px, py], axis=1)

out = pl.pallas_call(
    k_iota, grid=(8,),
    out_specs=pl.BlockSpec((1, PIX, 2), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((8, PIX, 2), jnp.float32))()
out = np.asarray(out)
ok = True
for t in range(8):
    tx, ty = (t % 4) * 16, (t // 4) * 16
    p = np.arange(256)
    exp_px, exp_py = tx + p % 16, ty + p // 16
    if not (np.array_equal(out[t,:,0], exp_px) and np.array_equal(out[t,:,1], exp_py)):
        ok = False
        bad = np.where(out[t,:,0] != exp_px)[0]
        log(f"iota tile {t} BAD at {bad[:8]} got {out[t,bad[:4],0]} want {exp_px[bad[:4]]}")
log("probe1 iota:", "OK" if ok else "FAILED")

# ---------------- probe 2: triu-ones matmul cumsum ----------------
def k_cumsum(in_ref, out_ref):
    x = in_ref[:]
    row_i = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    triu = (row_i <= col_i).astype(jnp.float32)
    out_ref[:] = jax.lax.dot_general(x, triu, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)

x = jax.random.uniform(jax.random.PRNGKey(0), (PIX, CHUNK), minval=-0.1, maxval=0.0)
out = pl.pallas_call(
    k_cumsum,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((PIX, CHUNK), jnp.float32))(x)
ref = np.cumsum(np.asarray(x), axis=1)
err = np.abs(np.asarray(out) - ref).max()
log("probe2 triu-cumsum maxerr:", float(err), "OK" if err < 1e-4 else "FAILED")

# ---------------- probe 3: dynamic-offset DMA via scalar prefetch ----------------
MP = 1 << 13
data = (np.arange(16 * MP, dtype=np.float32).reshape(16, MP) % 977).astype(np.float32)
data_j = jnp.asarray(data)
starts = jnp.asarray([0, 256, 384, 512, 1024, 2048, 4096, 7680], jnp.int32)

def k_dma(starts_ref, counts_ref, hbm, out_ref, buf, sem):
    t = pl.program_id(0)
    off = pl.multiple_of(starts_ref[t], 128)
    cp = pltpu.make_async_copy(hbm.at[:, pl.ds(off, CHUNK)], buf, sem)
    cp.start(); cp.wait()
    out_ref[0] = buf[:, :]

gs = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=2, grid=(8,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
    out_specs=pl.BlockSpec((1, 16, CHUNK), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((16, CHUNK), jnp.float32), pltpu.SemaphoreType.DMA])
out = pl.pallas_call(k_dma, grid_spec=gs,
    out_shape=jax.ShapeDtypeStruct((8, 16, CHUNK), jnp.float32))(starts, starts, data_j)
out = np.asarray(out)
ok = True
for t, s in enumerate(np.asarray(starts)):
    exp = data[:, s:s+CHUNK]
    if not np.array_equal(out[t], exp):
        ok = False
        bad = np.argwhere(out[t] != exp)
        log(f"dma tile {t} start {s} BAD at {bad[:3].tolist()} got {out[t][tuple(bad[0])]} want {exp[tuple(bad[0])]}")
log("probe3 DMA:", "OK" if ok else "FAILED")

# ---------------- probe 4: full alpha computation on fixed data ----------------
def k_alpha(in_ref, out_ref):
    d = in_ref[:]                      # (16, CHUNK)
    mx = d[0:1, :]; my = d[1:2, :]
    ca = d[2:3, :]; cb = d[3:4, :]; cc = d[4:5, :]; op = d[5:6, :]
    pidx = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    px = (pidx % TILE).astype(jnp.float32)
    py = (pidx // TILE).astype(jnp.float32)
    dx = px - mx; dy = py - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    G = jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.minimum(0.99, op * G)
    out_ref[:] = alpha

rng = np.random.default_rng(0)
d = np.zeros((16, CHUNK), np.float32)
d[0] = rng.uniform(0, 16, CHUNK); d[1] = rng.uniform(0, 16, CHUNK)
d[2] = rng.uniform(0.05, 0.5, CHUNK); d[3] = rng.uniform(-0.05, 0.05, CHUNK)
d[4] = rng.uniform(0.05, 0.5, CHUNK); d[5] = rng.uniform(0.3, 0.95, CHUNK)
out = pl.pallas_call(
    k_alpha,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((PIX, CHUNK), jnp.float32))(jnp.asarray(d))
p = np.arange(256)
px = (p % 16).astype(np.float32)[:, None]; py = (p // 16).astype(np.float32)[:, None]
dx = px - d[0][None]; dy = py - d[1][None]
power = -0.5 * (d[2][None]*dx*dx + d[4][None]*dy*dy) - d[3][None]*dx*dy
ref = np.minimum(0.99, d[5][None] * np.exp(np.minimum(power, 0)))
err = np.abs(np.asarray(out) - ref).max()
log("probe4 alpha maxerr:", float(err), "OK" if err < 1e-5 else "FAILED")
log("all probes done")
