#!/usr/bin/env python3
"""Cost of sort variants for binning at 2M pairs: single u32 key vs
2-key (u32 quantized + f32 exact tiebreak) vs legacy (i32 tile, f32 depth)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

import numpy as np, jax, jax.numpy as jnp
log("devices:", jax.devices())

N = 1 << 21
keys = [jax.random.randint(jax.random.PRNGKey(i), (N,), 0, 1 << 30,
                           dtype=jnp.int32).astype(jnp.uint32) for i in range(6)]
dep = jax.random.uniform(jax.random.PRNGKey(77), (N,), minval=1.0, maxval=9.0)
ids = jnp.arange(N, dtype=jnp.int32)
jax.block_until_ready([keys, dep, ids])

def bench(fn, label, n=6):
    out = fn(keys[0]); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(keys[i % len(keys)])
    jax.block_until_ready(out)
    log(f"{label}: {(time.perf_counter()-t0)/n*1000:.2f} ms")

bench(jax.jit(lambda k: jax.lax.sort((k, ids), num_keys=1, is_stable=True)),
      "1-key u32 + ids (2 ops)")
bench(jax.jit(lambda k: jax.lax.sort((k, dep, ids), num_keys=2,
                                     is_stable=True)),
      "2-key (u32, f32) + ids (3 ops)")
bench(jax.jit(lambda k: jax.lax.sort((k.astype(jnp.int32), dep, ids),
                                     num_keys=2, is_stable=True)),
      "2-key (i32, f32) + ids (3 ops)")
bench(jax.jit(lambda k: jax.lax.sort((k, dep, ids), num_keys=2,
                                     is_stable=False)),
      "2-key unstable")
bench(jax.jit(lambda k: jax.lax.sort((k, ids), num_keys=1, is_stable=False)),
      "1-key unstable")
