"""Pallas backward kernel + custom-VJP wrapper for the rasterizer.

The CUDA backward (`backward.cu:454-637`) walks pairs back-to-front per pixel
and scatters per-Gaussian gradients with atomicAdd. The TPU version is
deterministic by construction:

* per tile, chunks are visited in REVERSE order; within a chunk the
  back-to-front recurrences become reverse cumulative sums (one MXU matmul
  with a lower-triangular ones matrix):
      T_j        = exp(log_T_final − revcumsum_incl(log1m)_j − carry)
      suffix_j   = revcumsum_excl(w·⟨g,payload⟩)_j + carry
      dL/dα_j    = T_j·⟨g,payload_j⟩ − (suffix_j + T_final·(⟨g,bg⟩ − gα))/(1−α_j)
* the forward's early-stop is replayed exactly from the saved per-pixel
  `n_contrib` (contribution is a prefix property because log T is monotone).
* per-PAIR gradients go to disjoint slots of the sorted pair array (each pair
  belongs to exactly one tile), and a single `jax.ops.segment_sum` outside
  the kernel reduces pairs → Gaussians. No atomics anywhere.
* tile ranges are UNALIGNED: a 128-chunk at a tile boundary is shared with
  the previous tile(s), which already wrote their gradients there (the grid
  is sequential and each step drains its write DMAs). The first chunk of a
  tile therefore does a read-modify-write: existing grads are DMA'd in at
  grid-step START (latency hidden behind the tile's other chunks) and added
  to this tile's masked contribution before write-out. All other chunks are
  owned exclusively and written directly (zeros in any trailing foreign
  lanes, which the NEXT tile's RMW then accumulates into).

Gradient convention notes: the α=0.99 clamp and the α<1/255 / power>0 skips
carry zero gradient (clamp-aware; the CUDA kernel leaks gradient through the
0.99 clamp — a negligible, documented divergence).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..binning import Binning, tile_grid
from .raster import (ALPHA_EPS, ALPHA_MAX, CHUNK, DROWS, LOG_T_EPS,
                     TILE, pack_pair_data, rasterize_forward_pallas,
                     split_dot, tile_pixel_coords, unpack_tiles)

GROWS = 16  # grad rows: mx,my,a,b,c,op,payload(8),pad,pad

# Which split_dot sites are active (comma list of rincl,suffix; "none"/
# "all" also accepted). Unknown names are an error, not a silent fallback,
# and any non-default value is logged once: gradients must never be
# silently environment-dependent. (gc/dpayload are HIGHEST unconditionally
# — raw-depth contractions, see chunk_core.)
import os as _os  # noqa: E402
_KNOWN_SITES = frozenset(("rincl", "suffix"))
_sites_env = _os.environ.get("RASTER_BWD_SPLIT", "all")
if _sites_env == "none":
    _SPLIT_SITES = frozenset()
elif _sites_env == "all":
    _SPLIT_SITES = _KNOWN_SITES
else:
    _SPLIT_SITES = frozenset(s for s in _sites_env.split(",") if s)
    _bad = _SPLIT_SITES - _KNOWN_SITES
    if _bad:
        raise ValueError(
            f"RASTER_BWD_SPLIT names unknown site(s) {sorted(_bad)}; "
            f"known: {sorted(_KNOWN_SITES)} (or 'all'/'none')")
if _sites_env != "all":
    import sys as _sys
    print(f"[raster_bwd] non-default RASTER_BWD_SPLIT={_sites_env!r}: "
          f"split-precision sites limited to {sorted(_SPLIT_SITES)}",
          file=_sys.stderr)


def _maybe_split(site, a, b, dims, a_parts, b_parts=1):
    if site in _SPLIT_SITES:
        return split_dot(a, b, dims, a_parts=a_parts, b_parts=b_parts)
    return jax.lax.dot_general(a, b, dims,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _bwd_kernel(num_tiles, grid_x, max_chunks, tile_x, tile_y, pix,
                # scalar prefetch
                starts_ref, counts_ref,
                # inputs
                pairs_hbm, g_ref, aux_ref, gbg_ref, pix_ref,
                # outputs
                grads_hbm,
                # scratch
                buf, gbuf, rbuf, sems, osem, rsem):
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]
    base = (start // CHUNK) * CHUNK
    head = start - base
    # count==0 must give 0 chunks even when head>0 (no DMA is issued then)
    n_chunks = jnp.where(
        count > 0,
        jnp.minimum((head + count + CHUNK - 1) // CHUNK, max_chunks), 0)

    blk0 = start // CHUNK   # first chunk block (chunk-major pair layout)

    # RMW prefetch: the first (shared) chunk's existing gradients, written by
    # previous grid steps (their out-DMAs are drained per step → no race)
    @pl.when((head > 0) & (count > 0))
    def _():
        pltpu.make_async_copy(grads_hbm.at[blk0], rbuf, rsem).start()

    # tile-LOCAL pixel coordinates (precomputed input): keeps the moment
    # expansion Σq·dx² = R0 − 2m·R3 + m²·R5 well conditioned (global coords
    # lose ~3 digits to cancellation at 1080p)
    px = pix_ref[:, 0:1]                               # (pix, 1)
    py = pix_ref[:, 1:2]
    txf = ((t % grid_x) * tile_x).astype(jnp.float32)
    tyf = ((t // grid_x) * tile_y).astype(jnp.float32)

    g = g_ref[0]                      # (256, 8) payload cotangent
    log_tf = aux_ref[0, :, 0:1]       # (256, 1)
    n_contrib = aux_ref[0, :, 1:2]    # (256, 1) float
    g_alpha = aux_ref[0, :, 2:3]      # (256, 1) cotangent of out_alpha
    t_final = jnp.exp(log_tf)
    gb = gbg_ref[0:1, :]              # (1, 8) g·bg already contracted? no:
    gbg = jax.lax.dot_general(g, gbg_ref[:, :],
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)  # (256,1)
    B = t_final * (gbg - g_alpha)     # (256, 1)

    # pixel monomials for the gradient reductions: [x², y², xy, x, y, 1]
    Fpix = jnp.concatenate([px * px, py * py, px * py, px, py,
                            jnp.ones_like(px)], axis=1)  # (256, 6)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    tril_incl = (row_i >= col_i).astype(jnp.float32)   # reverse-cumsum incl
    tril_excl = (row_i > col_i).astype(jnp.float32)    # reverse-cumsum excl

    first = n_chunks - 1  # reverse order
    # 2-chunk DMA units (see the forward kernel: per-DMA issue + loop
    # overhead dominate at production tile counts; the backward pays it
    # TWICE per chunk — in-copy and grad write-out). Unit u covers chunks
    # (hi, hi-1) with hi = first - 2u, processed hi first (back-to-front);
    # its window is blocks [hi-1, hi+1) — row 0 = lo, row 1 = hi — except
    # hi == 0, whose window is blocks [0, 2) with chunk 0 at row 0. Chunk 0
    # therefore always sits at window row 0 (the RMW merge relies on this).
    n_units = (n_chunks + 1) // 2

    def unit_ws(hi):
        return blk0 + jnp.maximum(hi - 1, 0)

    def dma_in(slot, hi):
        return pltpu.make_async_copy(
            pairs_hbm.at[pl.ds(unit_ws(hi), 2)],
            buf.at[pl.ds(slot * 2, 2)], sems.at[slot])

    # the first-processed unit (the tile's LAST chunks) was prefetched by
    # the previous grid step into the tile-parity slot; prefetch the next
    # tile's now (its slot is idle throughout this step)
    slot0 = 2 + (t % 2)

    @pl.when((t == 0) & (count > 0))
    def _():
        dma_in(slot0, first).start()

    @pl.when(t + 1 < num_tiles)
    def _():
        ncount = counts_ref[t + 1]

        @pl.when(ncount > 0)
        def _():
            nstart = starts_ref[t + 1]
            nblk0 = nstart // CHUNK
            nchunks = jnp.minimum(
                (nstart - nblk0 * CHUNK + ncount + CHUNK - 1) // CHUNK,
                max_chunks)
            nslot = 2 + ((t + 1) % 2)
            pltpu.make_async_copy(
                pairs_hbm.at[pl.ds(nblk0 + jnp.maximum(nchunks - 2, 0), 2)],
                buf.at[pl.ds(nslot * 2, 2)], sems.at[nslot]).start()

    def chunk_core(d, k, c_log, s_carry):
        """Pure per-chunk gradient compute: → ((16, CHUNK) grad rows,
        new carries). Kept side-effect free so the second (lo) chunk of a
        unit can run under `lax.cond`."""
        mx = d[0:1, :] - txf             # tile-local means
        my = d[1:2, :] - tyf
        ca = d[2:3, :]
        cb = d[3:4, :]
        cc = d[4:5, :]
        op = d[5:6, :]
        payload = d[6:14, :]             # (8, CHUNK)

        # quadratic form via MXU (see fwd kernel — VPU-issue-bound otherwise)
        Wq = jnp.concatenate([
            -0.5 * ca,
            -0.5 * cc,
            -cb,
            ca * mx + cb * my,
            cc * my + cb * mx,
            -(0.5 * ca * mx * mx + 0.5 * cc * my * my + cb * mx * my),
        ], axis=0)                       # (6, CHUNK)
        power = jax.lax.dot_general(
            Fpix, Wq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)  # (256, CHUNK)
        G = jnp.exp(jnp.minimum(power, 0.0))
        alpha_raw = op * G
        clamped = alpha_raw > ALPHA_MAX
        alpha = jnp.minimum(ALPHA_MAX, alpha_raw)
        gidx = lane + k * CHUNK - head   # index within the tile's own pairs
        contrib = ((gidx.astype(jnp.float32) < n_contrib)
                   & (power <= 0.0) & (alpha >= ALPHA_EPS)
                   & (gidx >= 0) & (gidx < count))
        alpha = jnp.where(contrib, alpha, 0.0)
        log1m = jnp.log1p(-alpha)

        # reverse cumsums along lanes via MXU. Hand-split bf16 passes
        # (split_dot) replace 6-pass HIGHEST where one operand is an exact
        # 0/1 triangular mask: a 3-part split of the data operand leaves
        # ~2^-24 (f32-class) error in 3 passes, a 2-part split ~2^-16 in 2.
        # `rincl` feeds exp() (relative T error ≈ |r_incl| · operand error,
        # |r_incl| up to ~9.2) so it gets 3 parts; `suffix` errors enter
        # dalpha relatively and 2 parts (~2^-16) is inside gradient
        # tolerance. Data×data contractions (`gc`, `d_payload`: the payload
        # rows carry raw depth/invdepth) stay at HIGHEST — a 2×2 split is
        # only ~2^-16 (see raster.split_dot) which exceeds the forward's
        # own ~2^-18 depth budget. `power` (expanded-quadratic
        # cancellation) and the R moment reduction (tile-coordinate
        # cancellation in s_qdx2) keep HIGHEST as well.
        cum_dims = (((1,), (0,)), ((), ()))
        r_incl = _maybe_split("rincl", log1m, tril_incl, cum_dims, a_parts=3)
        T = jnp.exp(log_tf - r_incl - c_log)            # (256, CHUNK)
        w = alpha * T

        gc = jax.lax.dot_general(g, payload, cum_dims,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
        wgc = w * gc                                     # (256, CHUNK)
        suffix = _maybe_split("suffix", wgc, tril_excl, cum_dims,
                              a_parts=2) + s_carry
        one_m = jnp.maximum(1.0 - alpha, 1e-6)
        dalpha = jnp.where(contrib, T * gc - (suffix + B) / one_m, 0.0)

        # α = min(0.99, op·G): clamp-aware
        live = contrib & ~clamped
        d_op = jnp.where(live, dalpha * G, 0.0)
        q = jnp.where(live, dalpha * alpha, 0.0)         # dL/dpower

        # per-pair reductions over pixels (MXU): R = Fᵀ q → (6, CHUNK)
        R = jax.lax.dot_general(Fpix, q, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        R0, R1, R2 = R[0:1, :], R[1:2, :], R[2:3, :]    # (1, CHUNK)
        R3, R4, R5 = R[3:4, :], R[4:5, :], R[5:6, :]
        s_qdx = R3 - mx * R5
        s_qdy = R4 - my * R5
        s_qdx2 = R0 - 2 * mx * R3 + mx * mx * R5
        s_qdy2 = R1 - 2 * my * R4 + my * my * R5
        s_qdxdy = R2 - my * R3 - mx * R4 + mx * my * R5

        d_mx = ca * s_qdx + cb * s_qdy
        d_my = cc * s_qdy + cb * s_qdx
        d_a = -0.5 * s_qdx2
        d_b = -s_qdxdy
        d_c = -0.5 * s_qdy2
        d_opacity = jnp.sum(d_op, axis=0, keepdims=True)  # (1, CHUNK)
        d_payload = jax.lax.dot_general(g, w, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32,
                                        precision=jax.lax.Precision.HIGHEST)

        gout = jnp.concatenate([
            d_mx, d_my, d_a, d_b, d_c, d_opacity, d_payload,
            jnp.zeros((2, CHUNK), jnp.float32)], axis=0)  # (16, CHUNK)
        new_c_log = c_log + jnp.sum(jnp.where(contrib, log1m, 0.0), axis=1,
                                    keepdims=True)
        new_s = s_carry + jnp.sum(wgc, axis=1, keepdims=True)
        return gout, new_c_log, new_s

    def out_full(s, hi):
        """Write a full unit window (2 blocks) of gradients."""
        return pltpu.make_async_copy(
            gbuf.at[pl.ds(s * 2, 2)],
            grads_hbm.at[pl.ds(unit_ws(hi), 2)], osem.at[s])

    def out_partial(s):
        """Write only chunk 0's block (odd-chunk-count final unit)."""
        return pltpu.make_async_copy(
            gbuf.at[pl.ds(s * 2, 1)],
            grads_hbm.at[pl.ds(blk0, 1)], osem.at[s])

    def body(state):
        u, c_log, s_carry = state        # u counts processed units
        hi = first - 2 * u               # unit's first chunk (reverse order)
        lo = hi - 1
        slot = jnp.where(u == 0, slot0, u % 2)
        oslot = u % 2

        @pl.when(u + 1 < n_units)
        def _():
            dma_in((u + 1) % 2, hi - 2).start()

        dma_in(slot, hi).wait()
        # drain the out-copy issued 2 units ago (same slot) before
        # overwriting its buffer rows; unit u-2 has hi >= 2, always full
        @pl.when(u >= 2)
        def _():
            out_full(oslot, hi + 4).wait()

        # chunk hi first (back-to-front blend order), then lo with hi's
        # updated carries. lo's compute is pure and runs under lax.cond
        # (lo < 0 only in the final, odd-chunk-count unit).
        hrow = jnp.minimum(hi, 1)        # window row of chunk hi
        g_hi, c_log, s_carry = chunk_core(buf[slot * 2 + hrow], hi,
                                          c_log, s_carry)
        gbuf[oslot * 2 + hrow] = g_hi

        d_lo = buf[slot * 2]             # window row 0 (always in bounds)
        g_lo, clo, slo = jax.lax.cond(
            lo >= 0,
            lambda cl, sc: chunk_core(d_lo, lo, cl, sc),
            lambda cl, sc: (jnp.zeros((GROWS, CHUNK), jnp.float32), cl, sc),
            c_log, s_carry)

        @pl.when(lo >= 0)
        def _():
            gbuf[oslot * 2] = g_lo

        # shared boundary chunk: accumulate previous tiles' gradients
        # (prefetched at step start; our own lanes are zero there and theirs
        # are zero in our mask, so a plain add merges exactly). Chunk 0 is
        # always window row 0 and always in this tile's final unit.
        @pl.when((lo <= 0) & (head > 0))
        def _():
            pltpu.make_async_copy(grads_hbm.at[blk0], rbuf, rsem).wait()
            gbuf[oslot * 2] = gbuf[oslot * 2] + rbuf[:, :]

        @pl.when(lo >= 0)
        def _():
            out_full(oslot, hi).start()

        @pl.when(lo < 0)
        def _():
            out_partial(oslot).start()

        return u + 1, clo, slo

    def cond(state):
        return state[0] < n_units

    init = (jnp.asarray(0, jnp.int32),
            jnp.zeros((pix, 1), jnp.float32),
            jnp.zeros((pix, 1), jnp.float32))
    u, _, _ = jax.lax.while_loop(cond, body, init)

    # drain outstanding OUTPUT copies (the last up-to-2 units)
    for j in (2, 1):
        @pl.when(u >= j)
        def _(j=j):
            uj = u - j                   # unit index still in flight
            hi_j = first - 2 * uj
            s = uj % 2

            @pl.when(hi_j >= 1)
            def _():
                out_full(s, hi_j).wait()

            @pl.when(hi_j < 1)
            def _():
                out_partial(s).wait()


@functools.partial(jax.jit, static_argnames=("width", "height", "max_chunks",
                                              "tile_x", "tile_y"))
def rasterize_backward_pallas(pair_data, tile_starts, tile_counts,
                              g_payload, aux, g_bg_rows,
                              width: int, height: int,
                              max_chunks: int = 1 << 22,
                              tile_x: int = TILE, tile_y: int = TILE):
    """→ per-pair grads (NC, 16, CHUNK) chunk-major: rows [mx, my, a, b, c,
    opacity, payload(8), 0, 0].

    pair_data: (NC, 16, CHUNK) from pack_fields.
    g_payload: (num_tiles, pix, 8) cotangents of the blend channels.
    aux: (num_tiles, pix, 3) = [log_T_final, n_contrib, g_alpha].
    g_bg_rows: (1, 8) bg row. tile_x/tile_y must match the binning."""
    grid_x, grid_y = tile_grid(width, height, tile_x, tile_y)
    num_tiles = grid_x * grid_y
    pix = tile_x * tile_y

    kernel = functools.partial(_bwd_kernel, num_tiles, grid_x, max_chunks,
                               tile_x, tile_y, pix)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                  # pairs
            pl.BlockSpec((1, pix, 8), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),              # g
            pl.BlockSpec((1, pix, 3), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),              # aux
            pl.BlockSpec(memory_space=pltpu.VMEM),              # bg row
            pl.BlockSpec(memory_space=pltpu.VMEM),              # pixel xy
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            # 2-chunk unit slots (2 rows each): 0/1 interior double-buffer,
            # 2/3 per-parity first-processed unit
            pltpu.VMEM((8, DROWS, CHUNK), jnp.float32),
            pltpu.VMEM((4, GROWS, CHUNK), jnp.float32),  # out units 0/1
            pltpu.VMEM((GROWS, CHUNK), jnp.float32),            # RMW buffer
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),                        # RMW sem
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((pair_data.shape[0], GROWS, CHUNK),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(tile_starts, tile_counts, pair_data, g_payload, aux, g_bg_rows,
      tile_pixel_coords(tile_x, tile_y))
    return out
