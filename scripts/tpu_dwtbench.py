#!/usr/bin/env python3
"""DWT loss fwd+bwd timing at 800p (varying inputs)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

import numpy as np, jax, jax.numpy as jnp
log("devices:", jax.devices())

from sparse_view_3dgs_pack_tpu.losses.dwt import (dwt_subband_loss,
                                                  compute_elf_map,
                                                  compute_patch_dwt_loss,
                                                  get_dwt_subbands)

H = W = 800
gt = jax.random.uniform(jax.random.PRNGKey(1), (H, W, 3))
imgs = [jax.random.uniform(jax.random.PRNGKey(i), (H, W, 3))
        for i in range(6)]
jax.block_until_ready([gt, imgs])
weights = {k + "_weight": 1.0 for k in
           ("ll1", "lh1", "hl1", "hh1", "ll2", "lh2", "hl2", "hh2")}

def bench(fn, label, n=6):
    out = fn(imgs[0]); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(imgs[i % len(imgs)])
    jax.block_until_ready(out)
    log(f"{label}: {(time.perf_counter()-t0)/n*1000:.2f} ms")

bench(jax.jit(lambda x: get_dwt_subbands(x)["HH2"].sum()), "subbands fwd")
bench(jax.jit(lambda x: dwt_subband_loss(x, gt, weights)[0]), "dwt loss fwd")
bench(jax.jit(jax.grad(lambda x: dwt_subband_loss(x, gt, weights)[0])),
      "dwt loss fwd+bwd")
bench(jax.jit(jax.grad(lambda x: compute_patch_dwt_loss(
    x, gt, compute_elf_map(gt), patch_size=128))), "patch dwt fwd+bwd")
