"""Pallas TPU rasterizer — the speed-of-light render path.

Replaces the padded pure-XLA tile renderer for the hot loop. Per the CUDA
reference's architecture (`forward.cu:276-414`) but TPU-shaped:

* Pair data is pre-gathered into a depth-sorted (16, max_pairs) array, so
  every tile's working set is a CONTIGUOUS slice — the kernel double-buffers
  (16, CHUNK) slices HBM→VMEM with async DMA.
* Tile ranges are UNALIGNED (the binning does no alignment pass): each tile
  DMAs from the 128-aligned floor of its start and masks the `head` lanes
  that belong to the previous tile. This trades a handful of masked lanes
  for the removal of an entire 2M-element scatter in binning.
* Grid = one program per 16×16 tile; the chunk loop bound is that tile's
  ACTUAL pair count (scalar-prefetched), so work ∝ Σ pairs, not
  tiles × max_per_tile. An all-pixels-saturated early exit skips trailing
  chunks (the T < 1e-4 stop of the CUDA loop).
* Each grid step prefetches the NEXT tile's first chunk into a dedicated
  slot pair, so a tile never stalls on its first-chunk DMA latency (at 1080p
  there are 8160 tiles; un-hidden, those stalls alone cost ~10 ms).
* Blending uses the log-transmittance form: s = cumsum(log1p(-α)); within a
  chunk s is non-increasing so the CUDA stop is `s ≥ log(1e-4)`, and a sticky
  per-pixel `done` flag makes the stop PERMANENT across chunks (contribution
  must be a per-pixel prefix — the backward replays it from `n_contrib`).
* Per-chunk blend contraction (w @ payload) rides the MXU.

Outputs per tile: (num_tiles, 256, 16) columns = [blend(8) with background
composited into the first C, log_T, n_contrib, zeros]; `unpack_tiles`
reshapes to images.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..binning import CHUNK, Binning, tile_grid

TILE = 16
PIX = TILE * TILE           # 256 pixels per tile
DROWS = 16                  # pair-data rows (mx,my,a,b,c,op,payload[<=8],...)
ALPHA_EPS = 1.0 / 255.0
ALPHA_MAX = 0.99
LOG_T_EPS = math.log(1e-4)


def pack_pair_data(proj, ids) -> jnp.ndarray:
    return pack_fields(proj.means2d, proj.depths, proj.conics, proj.colors,
                       proj.opacities, ids)


def n_chunk_blocks(n_pairs_buf: int) -> int:
    """Chunk blocks covering the pair buffer + one slack chunk."""
    return (n_pairs_buf + CHUNK - 1) // CHUNK + 1


def pack_fields(means2d, depths, conics, colors, opacities,
                ids) -> jnp.ndarray:
    """Gather per-pair Gaussian data → (NC, 16, CHUNK) f32, chunk-major.

    Rows: 0 mx, 1 my, 2 conic a, 3 conic b, 4 conic c, 5 opacity,
          6..6+C-1 colors, 6+C invdepth, 7+C depth, rest zero.

    Performance notes: assembled as a (P, 16) row matrix and gathered with
    ONE row gather — on TPU a row gather of 16-float rows is ~8× faster than
    13 per-column element gathers. The result is laid out CHUNK-MAJOR
    (NC, 16, CHUNK) so every kernel chunk is ONE contiguous 8 KB DMA; the
    previous (16, NBUF) layout made each chunk 16 strided 512 B segments
    (row stride = 4·NBUF), which dominated the kernel at ~0.9 µs/chunk.
    """
    C = colors.shape[-1]
    assert C <= 8, "payload supports up to 8 color channels"
    safe_depth = jnp.where(jnp.isfinite(depths), depths, 1.0)
    cols = [means2d[:, 0], means2d[:, 1],
            conics[:, 0], conics[:, 1], conics[:, 2],
            opacities]
    for c in range(C):
        cols.append(colors[:, c])
    cols.append(1.0 / safe_depth)
    cols.append(safe_depth)
    while len(cols) < DROWS:
        cols.append(jnp.zeros_like(safe_depth))
    rows = jnp.stack(cols, axis=1)                     # (P, 16)
    # sentinel row (id -1 → opacity 0): append one zero row at index P
    rows = jnp.concatenate([rows, jnp.zeros((1, DROWS), rows.dtype)], axis=0)
    nc = n_chunk_blocks(ids.shape[0])
    pad = nc * CHUNK - ids.shape[0]
    ids_c = jnp.where(ids >= 0, ids, rows.shape[0] - 1)
    ids_c = jnp.concatenate(
        [ids_c, jnp.full((pad,), rows.shape[0] - 1, ids_c.dtype)])
    # Gather DIRECTLY into chunk-major (NC, 16, CHUNK): a plain (NBUF, 16)
    # row gather would materialize with the minor dim tile-padded 16→128 —
    # 8× the logical bytes (a 33M-pair bucket would be a 17 GB allocation).
    # offset_dims=(1,) places the row's 16 values on the MIDDLE output dim,
    # keeping CHUNK=128 minor (exact lane tile, no padding).
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))
    return jax.lax.gather(
        rows, ids_c.reshape(nc, CHUNK, 1), dnums, slice_sizes=(1, DROWS),
        mode=jax.lax.GatherScatterMode.CLIP)


UNIT = 2  # chunks per DMA unit (consecutive chunk blocks are contiguous)


def _bf16_parts(x, n):
    parts = []
    r = x
    for _ in range(n):
        p = r.astype(jnp.bfloat16)
        parts.append(p)
        r = r - p.astype(jnp.float32)
    return parts


def split_dot(a, b, dims, a_parts: int = 2, b_parts: int = 1):
    """f32 dot_general via hand-split bf16 passes (f32 MXU accumulation).

    Mosaic supports only DEFAULT (1 bf16 pass) and HIGHEST (6 passes) dot
    precisions; this builds the missing middle tiers. bf16 carries 8
    significand bits, so each extracted part reduces the residual by ~2^-8:
    after n parts the un-represented remainder is ~2^(-8n) of the operand.
      a_parts=2, b_parts=1 — 2 passes; exact-side b (0/1 triangular masks
        are bf16-representable), ~2^-16 relative operand error;
      a_parts=3, b_parts=1 — 3 passes, ~2^-24 (≈ f32 rounding, i.e.
        ≈ HIGHEST accuracy, when b is exact);
      a_parts=2, b_parts=2 — 3 passes, ~2^-16: BOTH 2-part residuals and
        the dropped lo·lo cross term land at 2^-16 (measured 1.5e-5 of
        operand scale vs 1.7e-7 for true f32) — a middle tier, NOT a
        HIGHEST substitute. Contractions of raw-scale data (e.g. depth
        payload rows) that need f32-class accuracy must use HIGHEST or an
        exact-side split instead.
    """
    dot = functools.partial(jax.lax.dot_general,
                            dimension_numbers=dims,
                            preferred_element_type=jnp.float32)
    out = None
    for i, ai in enumerate(_bf16_parts(a, a_parts)):
        for j, bj in enumerate(_bf16_parts(b, b_parts)):
            if i + j > max(a_parts, b_parts) - 1:
                continue  # below the target precision
            term = dot(ai, bj)
            out = term if out is None else out + term
    return out


def _fwd_kernel(num_tiles, grid_x, max_chunks, n_payload, early_exit,
                mm_precision, compute_n_contrib, tile_x, tile_y,
                # scalar prefetch
                starts_ref, counts_ref,
                # inputs
                pairs_hbm, bg_ref, pix_ref,
                # outputs
                out_ref,
                # scratch
                buf, sems, accum_ref, misc_ref):
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]
    base = (start // CHUNK) * CHUNK        # 128-aligned DMA origin
    head = start - base                    # foreign leading lanes to mask
    # count==0 must give 0 chunks even when head>0, or the loop would wait
    # on a DMA that was never issued (hang → watchdog kernel fault)
    n_chunks = jnp.where(
        count > 0,
        jnp.minimum((head + count + CHUNK - 1) // CHUNK, max_chunks), 0)
    # DMA in UNIT-chunk units: per-DMA issue + per-iteration loop overhead
    # were ~60% of this kernel at 1080p (measured: null-body kernel = 9.7 of
    # 16.2 ms); two contiguous chunk blocks per copy halve both.
    n_units = (n_chunks + UNIT - 1) // UNIT

    pix = tile_x * tile_y
    # tile-local pixel coordinates come in as a precomputed constant (host
    # iota+mod on (pix,1) sublane vectors has shown Mosaic lowering issues)
    txf = ((t % grid_x) * tile_x).astype(jnp.float32)
    tyf = ((t // grid_x) * tile_y).astype(jnp.float32)
    px = pix_ref[:, 0:1]                               # (pix, 1) tile-local
    py = pix_ref[:, 1:2]

    blk0 = start // CHUNK   # first chunk block (chunk-major pair layout)

    def udma(sem, bufbase, u):
        return pltpu.make_async_copy(
            pairs_hbm.at[pl.ds(blk0 + UNIT * u, UNIT)],
            buf.at[pl.ds(bufbase, UNIT)], sems.at[sem])

    # Unit 0 lives in a dedicated per-tile-parity slot (sems 4/5, buf rows
    # 4·UNIT..6·UNIT): tile t's unit 0 was prefetched by grid step t-1 (t=0
    # issues its own), and we prefetch tile t+1's unit 0 now — its slot is
    # idle for all of step t. Un-hidden, the 4080 first-chunk DMA latencies
    # at 1080p alone cost ~3 ms. Interior units rotate through 4 slots at
    # prefetch distance 3.
    psem = 4 + (t % 2)
    pbase = (4 + (t % 2)) * UNIT

    @pl.when((t == 0) & (count > 0))
    def _():
        udma(psem, pbase, 0).start()

    @pl.when(t + 1 < num_tiles)
    def _():
        ncount = counts_ref[t + 1]

        @pl.when(ncount > 0)
        def _():
            pltpu.make_async_copy(
                pairs_hbm.at[pl.ds(starts_ref[t + 1] // CHUNK, UNIT)],
                buf.at[pl.ds((4 + ((t + 1) % 2)) * UNIT, UNIT)],
                sems.at[4 + ((t + 1) % 2)]).start()

    @pl.when(n_units > 1)
    def _():
        udma(1, UNIT, 1).start()

    @pl.when(n_units > 2)
    def _():
        udma(2, 2 * UNIT, 2).start()

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    # cumsum along the chunk axis as an MXU matmul with an upper-triangular
    # ones matrix (Mosaic has no cumsum primitive; exact in f32)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    triu_ones = (row_i <= col_i).astype(jnp.float32)

    # accumulators live in scratch refs, not while-loop carries: misc_ref
    # columns are [log_t, done, n_contrib, unused]
    accum_ref[...] = jnp.zeros((pix, 8), jnp.float32)
    misc_ref[...] = jnp.zeros((pix, 4), jnp.float32)

    def chunk_compute(d, k):
        """Blend one (16, CHUNK) chunk into the scratch accumulators."""
        log_t = misc_ref[:, 0:1]
        mx = d[0:1, :] - txf                            # tile-local means
        my = d[1:2, :] - tyf
        # Per-pair constants fold on (1, CHUNK) rows — ~pix× cheaper than
        # the (pix, CHUNK) math below: -0.5 / negation move into the conic
        # rows, and the valid-lane mask zeroes the opacity row instead of
        # joining the (pix, CHUNK) where-chain (padding lanes then blend
        # with alpha == 0 exactly, and log1p(0) == 0 keeps them out of the
        # transmittance).
        ca = -0.5 * d[2:3, :]
        cb = -d[3:4, :]
        cc = -0.5 * d[4:5, :]
        pos = lane + k * CHUNK                          # chunk-relative
        valid = (pos >= head) & (pos < head + count)
        op = jnp.where(valid, d[5:6, :], 0.0)

        # The quadratic form stays ELEMENTWISE: an Fpix @ Wq MXU form needs
        # HIGHEST precision (the expanded a·mx² constant suffers bf16
        # catastrophic cancellation for small gaussians — 26 dB of image
        # error at DEFAULT) and at 6-pass HIGHEST it is slower than these 8
        # VPU ops. The backward uses the matmul form (it needs Fpix anyway).
        dx = px - mx                                    # (pix, CHUNK)
        dy = py - my
        power = (ca * dx) * dx + ((cc * dy) + (cb * dx)) * dy
        G = jnp.exp(jnp.minimum(power, 0.0))
        alpha = jnp.minimum(ALPHA_MAX, op * G)
        alpha = jnp.where((power > 0.0) | (alpha < ALPHA_EPS), 0.0, alpha)

        log1m = jnp.log1p(-alpha)
        cum_dims = (((1,), (0,)), ((), ()))
        if mm_precision == "split":
            # triu_ones is exactly bf16-representable, so a 3-way split of
            # log1m gives ~2^-27 operand error (≈ HIGHEST) in 3 MXU passes
            # instead of 6
            s_cum = split_dot(log1m, triu_ones, cum_dims, a_parts=3)
        else:
            s_cum = jax.lax.dot_general(
                log1m, triu_ones, cum_dims,
                preferred_element_type=jnp.float32,
                precision=mm_precision)
        s_incl = log_t + s_cum                           # (pix, CHUNK)
        s_excl = s_incl - log1m
        if compute_n_contrib:
            # CUDA's T<1e-4 stop is PERMANENT: contribution must be a prefix
            # per pixel (the backward replays it from n_contrib). Within a
            # chunk s_incl is monotone, but the carry excludes post-crossing
            # alphas, so a later small alpha could re-cross above the
            # threshold — the sticky `done` flag forbids that. `valid` keeps
            # head/tail padding lanes out of n_contrib (still a prefix:
            # valid is itself a contiguous range).
            done = misc_ref[:, 1:2]
            contribute = (s_incl >= LOG_T_EPS) & (done < 0.5) & valid
            misc_ref[:, 1:2] = jnp.maximum(
                done, (s_incl[:, -1:] < LOG_T_EPS).astype(jnp.float32))
            w = jnp.where(contribute, alpha * jnp.exp(s_excl), 0.0)
        else:
            # inference: non-sticky cutoff — post-threshold terms carry
            # weight < 1e-4, radiometrically invisible
            w = alpha * jnp.exp(s_excl)

        payload = d[6:14, :]                            # (8, CHUNK)
        # the blend contraction keeps HIGHEST under "split": its payload
        # rows carry raw depths, whose 3-pass error (~depth·2^-18) would be
        # at the golden tests' tolerance
        accum_prec = (jax.lax.Precision.HIGHEST if mm_precision == "split"
                      else mm_precision)
        accum_ref[...] += jax.lax.dot_general(
            w, payload, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=accum_prec)                        # (pix, 8)
        if compute_n_contrib:   # only the backward replay needs it
            misc_ref[:, 2:3] += jnp.sum(
                contribute.astype(jnp.float32), axis=1, keepdims=True)
            misc_ref[:, 0:1] = log_t + jnp.sum(
                jnp.where(contribute, log1m, 0.0), axis=1, keepdims=True)
        else:
            misc_ref[:, 0:1] = s_incl[:, -1:]            # all lanes counted

    def body(state):
        u, stop = state
        sem = jnp.where(u == 0, psem, u % 4)
        bufbase = jnp.where(u == 0, pbase, (u % 4) * UNIT)

        @pl.when((u + 3 < n_units) & (u + 3 > 2))
        def _():
            udma((u + 3) % 4, ((u + 3) % 4) * UNIT, u + 3).start()

        pltpu.make_async_copy(
            pairs_hbm.at[pl.ds(blk0 + UNIT * u, UNIT)],
            buf.at[pl.ds(bufbase, UNIT)], sems.at[sem]).wait()
        chunk_compute(buf[bufbase], UNIT * u)
        for j in range(1, UNIT):
            @pl.when(UNIT * u + j < n_chunks)
            def _(j=j):
                chunk_compute(buf[bufbase + j], UNIT * u + j)

        if early_exit:
            # the all-pixels-done reduction is a vector→scalar sync
            # (~150 ns); amortise it over 2 units (4 chunks — the same
            # cadence as the previous per-chunk loop)
            if compute_n_contrib:
                check = lambda: (jnp.min(misc_ref[:, 1:2]) >= 0.5)\
                    .astype(jnp.int32)
            else:
                check = lambda: (jnp.max(misc_ref[:, 0:1]) < LOG_T_EPS)\
                    .astype(jnp.int32)
            stop = jax.lax.cond((u & 1) == 1, check, lambda: stop)
        return u + 1, stop

    def cond(state):
        u, stop = state
        if early_exit:
            return (u < n_units) & (stop == 0)
        return u < n_units

    u, _ = jax.lax.while_loop(cond, body, (jnp.asarray(0, jnp.int32),
                                           jnp.asarray(0, jnp.int32)))

    # Early exit leaves up to 3 prefetched unit DMAs in flight; drain them
    # so the next grid step's scratch/semaphore state is clean.
    for j in range(3):
        @pl.when(u + j < n_units)
        def _(j=j):
            sem = jnp.where(u + j == 0, psem, (u + j) % 4)
            bufbase = jnp.where(u + j == 0, pbase, ((u + j) % 4) * UNIT)
            pltpu.make_async_copy(
                pairs_hbm.at[pl.ds(blk0 + UNIT * (u + j), UNIT)],
                buf.at[pl.ds(bufbase, UNIT)], sems.at[sem]).wait()

    # background composite on the color channels
    log_t = misc_ref[:, 0:1]
    n_contrib = misc_ref[:, 2:3]
    t_final = jnp.exp(log_t)                            # (pix, 1)
    bg = bg_ref[0:1, :]                                 # (1, 8); zeros past C
    color = accum_ref[...] + t_final * bg               # (pix, 8)
    # single full-block write: [blend(8), log_t, n_contrib, zeros(6)]
    out_ref[0] = jnp.concatenate(
        [color, log_t, n_contrib, jnp.zeros((pix, 6), jnp.float32)], axis=1)


@functools.partial(jax.jit, static_argnames=("width", "height", "max_pairs",
                                             "n_payload", "max_chunks",
                                             "early_exit", "mm_precision",
                                             "compute_n_contrib",
                                             "tile_x", "tile_y"))
def rasterize_forward_pallas(pair_data, tile_starts, tile_counts,
                             background, width: int, height: int,
                             max_pairs: int, n_payload: int,
                             max_chunks: int = 1 << 22,
                             early_exit: bool = True,
                             mm_precision=jax.lax.Precision.HIGHEST,
                             compute_n_contrib: bool = True,
                             tile_x: int = TILE, tile_y: int = TILE):
    """pair_data: (NC, 16, CHUNK) chunk-major (see pack_fields); returns
    (num_tiles, pix, 16) with columns [blend(8) incl bg-composited colors,
    log_t, n_contrib, 0...]. Rectangular tiles (tile_x, tile_y) must match
    the binning; the inference renderer uses 32x16 (fewer pairs + half the
    per-tile program overhead), training stays at the tested 16x16."""
    grid_x, grid_y = tile_grid(width, height, tile_x, tile_y)
    num_tiles = grid_x * grid_y
    pix = tile_x * tile_y

    bg = jnp.zeros((1, 8), jnp.float32)
    bg = bg.at[0, :background.shape[0]].set(background)

    kernel = functools.partial(_fwd_kernel, num_tiles, grid_x, max_chunks,
                               n_payload, early_exit, mm_precision,
                               compute_n_contrib, tile_x, tile_y)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # pairs stay in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bg
            pl.BlockSpec(memory_space=pltpu.VMEM),   # tile-local pixel xy
        ],
        out_specs=pl.BlockSpec((1, pix, 16), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            # unit slots 0-3 (UNIT chunk rows each): interior rotation at
            # prefetch distance 3; slots 4/5: unit-0 per-tile parity
            pltpu.VMEM((6 * UNIT, DROWS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((6,)),
            pltpu.VMEM((pix, 8), jnp.float32),   # blend accumulator
            pltpu.VMEM((pix, 4), jnp.float32),   # [log_t, done, n_contrib]
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, pix, 16), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(tile_starts, tile_counts, pair_data, bg,
      tile_pixel_coords(tile_x, tile_y))
    return out


def tile_pixel_coords(tile_x: int = TILE, tile_y: int = TILE) -> jnp.ndarray:
    """(pix, 2) tile-local pixel (x, y) at integer centers, row-major."""
    p = jnp.arange(tile_x * tile_y, dtype=jnp.int32)
    return jnp.stack([(p % tile_x).astype(jnp.float32),
                      (p // tile_x).astype(jnp.float32)], axis=1)


def unpack_tiles(out, width: int, height: int, channels: int,
                 tile_x: int = TILE, tile_y: int = TILE):
    """(num_tiles, pix, 16) → dict of image-shaped outputs."""
    grid_x, grid_y = tile_grid(width, height, tile_x, tile_y)
    img = out.reshape(grid_y, grid_x, tile_y, tile_x, 16)
    img = img.transpose(0, 2, 1, 3, 4).reshape(grid_y * tile_y,
                                               grid_x * tile_x, 16)
    img = img[:height, :width]
    C = channels
    return {
        "color": img[..., :C],
        "invdepth": img[..., C],
        "depth": img[..., C + 1],
        "log_t": img[..., 8],
        "n_contrib": img[..., 9],
    }
