"""Pallas TPU composite kernels — forward + hand-derived backward (custom_vjp).

The two genuinely hot kernels of the framework (SURVEY.md §2.1 N3/N4;
reference renderCUDA forward.cu:261-392 and backward renderCUDA
backward.cu:415-639).  TPU-native redesign:

- Grid = one program per 16x16 tile, executed with Mosaic pipelining.
- Per tile, the depth-sorted instance list (chunk-aligned layout from
  ``binning.pad_tile_ranges``) is streamed HBM->VMEM in double-buffered
  CHUNK-sized DMAs.
- Inside a chunk everything is dense VPU/MXU work on [CHUNK, 256] arrays:
  the front-to-back alpha recurrence becomes a cumulative product along the
  chunk axis, and all output channels (rgb + depth + weight + segments) are
  composited with ONE [C,CHUNK]x[CHUNK,256] matmul.
- The backward walks chunks in REVERSE, reconstructing the transmittance by
  division exactly like the CUDA backward (T = T/(1-a), safe because
  a <= 0.99 — backward.cu:466-552), and maintains the per-pixel suffix
  accumulator S_i = sum_{j>i} w_j g_j that yields
  dL/da_i = T_i g_i - (S_i + T_final dL/dT_final) / (1 - a_i).
- Per-instance gradients are written back to disjoint chunk-aligned HBM
  slices — each instance belongs to exactly one tile, so there are no
  cross-program races (the TPU substitute for CUDA's atomicAdd,
  backward.cu:575-636); the per-gaussian reduction is a segment-sum outside
  the kernel.

Deliberate deviation from CUDA: the 0.99 alpha clamp is treated as a real
min() under differentiation (zero gradient on the clamped branch), matching
jax.grad of the jnp oracle; backward.cu ignores the clamp in its chain rule.

Pixel-terminaton parity: a pixel stops compositing at the first instance
whose candidate transmittance would drop below 1e-4 (that instance is
skipped), reproduced here with cumulative masks; the forward emits the CUDA
``n_contrib`` (position of the last contributing instance) which exactly
gates the backward recomputation.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsplat_tpu.ops.composite_ref import ALPHA_MAX, ALPHA_MIN, T_EPS
from gsplat_tpu.ops.preprocess import TILE_X, TILE_Y

TILE_PIX = TILE_X * TILE_Y  # 256
CHUNK = 256                  # instances per DMA/compute batch
_HI = jax.lax.Precision.HIGHEST



def _scan_ax0(x, op, pad_val, reverse=False):
    """Inclusive associative scan along axis 0 (static length) as log-step
    shift+op — Mosaic has no cumsum/cumprod primitive, and for K=256 this is
    8 VPU ops."""
    K = x.shape[0]
    shift = 1
    while shift < K:
        pad = jnp.full((shift, x.shape[1]), pad_val, x.dtype)
        if reverse:
            shifted = jnp.concatenate([x[shift:], pad], axis=0)
        else:
            shifted = jnp.concatenate([pad, x[:-shift]], axis=0)
        x = op(x, shifted)
        shift *= 2
    return x


def _cumprod0(x):
    return _scan_ax0(x, jnp.multiply, 1.0)


def _cumsum0(x):
    return _scan_ax0(x, jnp.add, 0.0)


def _rev_cumprod0(x):
    return _scan_ax0(x, jnp.multiply, 1.0, reverse=True)


def _rev_cumsum0(x):
    return _scan_ax0(x, jnp.add, 0.0, reverse=True)


def _pixel_coords(t, grid_x: int):
    """Pixel-center coordinates of tile t as [1, 256] arrays."""
    tile_x = (t % grid_x).astype(jnp.float32)
    tile_y = (t // grid_x).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_PIX), 1)
    px = tile_x * TILE_X + (lane % TILE_X).astype(jnp.float32)
    py = tile_y * TILE_Y + (lane // TILE_X).astype(jnp.float32)
    return px, py


def _chunk_alpha(xy, co, px, py, valid):
    """Alpha evaluation for one chunk.

    xy: [2, K]; co: [4, K] (conic a,b,c + opacity); px/py: [1,256];
    valid: [K,1] bool.  Returns (a [K,256] masked alpha, extras for bwd).
    Rules: power>0 skip, alpha<1/255 skip, clamp at 0.99 (forward.cu:338-350).
    """
    dx = xy[0][:, None] - px          # [K,256]
    dy = xy[1][:, None] - py
    A = co[0][:, None]
    B = co[1][:, None]
    Cc = co[2][:, None]
    op = co[3][:, None]
    power = -0.5 * (A * dx * dx + Cc * dy * dy) - B * dx * dy
    G = jnp.exp(power)
    raw = op * G
    alpha = jnp.minimum(ALPHA_MAX, raw)
    mask = valid & (power <= 0.0) & (alpha >= ALPHA_MIN)
    a = jnp.where(mask, alpha, 0.0)
    return a, mask, (dx, dy, G, raw)


def _forward_kernel(grid_x: int, C: int, CP: int,
                    ranges_ref, xy_ref, co_ref, ft_ref,
                    img_ref,
                    xy_buf, co_buf, ft_buf, sems):
    # img_ref packs [C composited channels; T_final; n_contrib] as C+2 rows
    # so the output block satisfies Mosaic's (8,128)-conformal rule.
    t = pl.program_id(0)
    chunk0 = ranges_ref[t % 8, 0]    # first chunk index of this tile
    count = ranges_ref[t % 8, 1]
    nchunks = (count + CHUNK - 1) // CHUNK
    px, py = _pixel_coords(t, grid_x)

    def dma(slot, c):
        # instance arrays are [NCH, rows, CHUNK]: chunk index on the untiled
        # leading dim, so dynamic indexing needs no lane-divisibility proof
        ci = chunk0 + c
        return [
            pltpu.make_async_copy(xy_ref.at[ci],
                                  xy_buf.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(co_ref.at[ci],
                                  co_buf.at[slot], sems.at[slot, 1]),
            pltpu.make_async_copy(ft_ref.at[ci],
                                  ft_buf.at[slot], sems.at[slot, 2]),
        ]

    @pl.when(nchunks > 0)
    def _():
        for d in dma(0, 0):
            d.start()

    def body(c, carry):
        T, done_carry, nc, acc = carry
        slot = c % 2

        @pl.when(c + 1 < nchunks)
        def _():
            for d in dma((c + 1) % 2, c + 1):
                d.start()

        for d in dma(slot, c):
            d.wait()

        k_idx = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        pos = c * CHUNK + k_idx          # 0-based position in tile list
        valid = pos < count
        a, mask, _ = _chunk_alpha(xy_buf[slot], co_buf[slot], px, py, valid)
        mask = mask & (done_carry < 1)   # pixel already terminated earlier
        a = jnp.where(mask, a, 0.0)

        # candidate transmittance after each instance (plain cumprod is exact
        # up to the first trigger, which is all the trigger search needs)
        T_incl = T * _cumprod0(1.0 - a)
        trigger = mask & (T_incl < T_EPS)
        done = _cumsum0(trigger.astype(jnp.float32)) > 0
        contrib = mask & (~done)

        a_eff = jnp.where(contrib, a, 0.0)
        T_incl_eff = T * _cumprod0(1.0 - a_eff)
        T_excl_eff = jnp.where(a_eff > 0.0, T_incl_eff / (1.0 - a_eff),
                               T_incl_eff)
        w = a_eff * T_excl_eff           # [K,256]

        acc = acc + jax.lax.dot_general(
            ft_buf[slot], w, (((1,), (0,)), ((), ())), precision=_HI)

        # n_contrib: 1-based position of last contributor (forward.cu:356-379)
        nc = jnp.maximum(nc, jnp.max(
            jnp.where(contrib, pos + 1, 0), axis=0, keepdims=True))
        done_carry = jnp.maximum(done_carry, done[-1:].astype(jnp.int32))
        return T_incl_eff[-1:], done_carry, nc, acc

    T, _done, nc, acc = jax.lax.fori_loop(
        0, nchunks, body,
        (jnp.ones((1, TILE_PIX), jnp.float32),
         jnp.zeros((1, TILE_PIX), jnp.int32),
         jnp.zeros((1, TILE_PIX), jnp.int32),
         jnp.zeros((CP, TILE_PIX), jnp.float32)))
    img_ref[0] = jnp.concatenate([acc[0:C], T, nc.astype(jnp.float32)], axis=0)


def _backward_kernel(grid_x: int, C: int, CP: int,
                     ranges_ref, xy_ref, co_ref, ft_ref,
                     fwd_ref, dpk_ref,
                     dxy_ref, dco_ref, dft_ref,
                     xy_buf, co_buf, ft_buf,
                     dxy_buf, dco_buf, dft_buf, sems, osems):
    t = pl.program_id(0)
    chunk0 = ranges_ref[t % 8, 0]
    count = ranges_ref[t % 8, 1]
    nchunks = (count + CHUNK - 1) // CHUNK
    px, py = _pixel_coords(t, grid_x)

    n_contrib = fwd_ref[0, C + 1][None, :]   # [1,256] float positions (exact)
    T_final = fwd_ref[0, C][None, :]         # [1,256]
    d_out = dpk_ref[0, 0:C]                  # [C,256]
    d_out_p = jnp.concatenate(
        [d_out, jnp.zeros((CP - C, TILE_PIX), jnp.float32)], axis=0) \
        if CP > C else d_out                 # [CP,256]
    d_tf = dpk_ref[0, C][None, :]
    bg_term = T_final * d_tf                 # the T_final (1-a) chain term

    def dma_in(slot, c):
        ci = chunk0 + c
        return [
            pltpu.make_async_copy(xy_ref.at[ci],
                                  xy_buf.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(co_ref.at[ci],
                                  co_buf.at[slot], sems.at[slot, 1]),
            pltpu.make_async_copy(ft_ref.at[ci],
                                  ft_buf.at[slot], sems.at[slot, 2]),
        ]

    def dma_out(slot, c):
        ci = chunk0 + c
        return [
            pltpu.make_async_copy(dxy_buf.at[slot],
                                  dxy_ref.at[ci], osems.at[slot, 0]),
            pltpu.make_async_copy(dco_buf.at[slot],
                                  dco_ref.at[ci], osems.at[slot, 1]),
            pltpu.make_async_copy(dft_buf.at[slot],
                                  dft_ref.at[ci], osems.at[slot, 2]),
        ]

    @pl.when(nchunks > 0)
    def _():
        for d in dma_in(0, nchunks - 1):
            d.start()

    def body(i, carry):
        # i counts processed chunks; walk reverse: chunk index c
        c = nchunks - 1 - i
        T_after, S = carry                    # both [1,256]
        slot = i % 2

        @pl.when(i + 1 < nchunks)
        def _():
            for d in dma_in((i + 1) % 2, c - 1):
                d.start()

        for d in dma_in(slot, c):
            d.wait()

        k_idx = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        pos = c * CHUNK + k_idx
        valid = pos < count
        a, mask, (dx, dy, G, raw) = _chunk_alpha(
            xy_buf[slot], co_buf[slot], px, py, valid)
        contrib = mask & ((pos + 1).astype(jnp.float32) <= n_contrib)
        a_eff = jnp.where(contrib, a, 0.0)
        one_m = 1.0 - a_eff

        # Suffix products within the chunk reconstruct T (division trick,
        # backward.cu:466-478): T_excl_i = T_after / prod_{j>=i} (1-a_j).
        suf = _rev_cumprod0(one_m)  # [K,256]
        T_excl = T_after / suf
        w = a_eff * T_excl

        # g_i = <feat_i, dL/dout> per pixel: [K,256]
        g = jax.lax.dot_general(ft_buf[slot], d_out_p,
                                (((0,), (0,)), ((), ())), precision=_HI)

        # Suffix sums S_i = sum_{j>i} w_j g_j (within-chunk reversed exclusive
        # cumsum + cross-chunk carry).
        wg = w * g
        suf_wg = _rev_cumsum0(wg)  # inclusive at i
        S_i = S + (suf_wg - wg)

        da = jnp.where(contrib,
                       T_excl * g - (S_i + bg_term) / one_m, 0.0)

        # chain to opacity / conic / mean2d ------------------------------
        unclamped = raw < ALPHA_MAX           # min() gating (see module doc)
        d_op = jnp.where(contrib & unclamped, G * da, 0.0)
        dpow = jnp.where(contrib & unclamped, raw * da, 0.0)
        A = co_buf[slot][0][:, None]
        B = co_buf[slot][1][:, None]
        Cc = co_buf[slot][2][:, None]
        d_dx = dpow * (-(A * dx + B * dy))
        d_dy = dpow * (-(Cc * dy + B * dx))
        d_conA = dpow * (-0.5 * dx * dx)
        d_conB = dpow * (-dx * dy)
        d_conC = dpow * (-0.5 * dy * dy)

        # the write buffers are reused every 2 iterations — drain the DMA
        # issued from this slot two iterations ago BEFORE overwriting
        @pl.when(i >= 2)
        def _():
            for d in dma_out(slot, c + 2):
                d.wait()

        dxy_buf[slot, 0] = jnp.sum(d_dx, axis=1)
        dxy_buf[slot, 1] = jnp.sum(d_dy, axis=1)
        dco_buf[slot, 0] = jnp.sum(d_conA, axis=1)
        dco_buf[slot, 1] = jnp.sum(d_conB, axis=1)
        dco_buf[slot, 2] = jnp.sum(d_conC, axis=1)
        dco_buf[slot, 3] = jnp.sum(d_op, axis=1)
        # d_feat [CP,K] = d_out_p [CP,256] @ w^T [256,K]
        dft_buf[slot] = jax.lax.dot_general(
            d_out_p, w, (((1,), (1,)), ((), ())), precision=_HI)

        for d in dma_out(slot, c):
            d.start()

        # carries for the next (earlier) chunk: its exit transmittance is the
        # entry transmittance of this chunk (T_excl[0]); its suffix sum gains
        # this whole chunk's total (inclusive suffix sum at position 0).
        return T_excl[0:1], S + suf_wg[0:1]

    jax.lax.fori_loop(
        0, nchunks, body,
        (T_final, jnp.zeros((1, TILE_PIX), jnp.float32)))

    # drain outstanding output DMAs
    @pl.when(nchunks >= 1)
    def _():
        for d in dma_out((nchunks - 1) % 2, 0):
            d.wait()

    @pl.when(nchunks >= 2)
    def _():
        for d in dma_out(nchunks % 2, 1):
            d.wait()


# --- host-side wrapper -------------------------------------------------------

def _float0_zeros(x):
    return np.zeros(np.shape(x), dtype=jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _composite_core(static, xy_T, co_T, ft_T, ranges):
    out, _ = _composite_fwd(static, xy_T, co_T, ft_T, ranges)
    return out


def _pallas_forward(static, xy_T, co_T, ft_T, ranges):
    grid_x, num_tiles, C, CP, I, interpret = static
    kernel = functools.partial(_forward_kernel, grid_x, C, CP)
    return pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((8, 2), lambda t: (t // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, C + 2, TILE_PIX),
                               lambda t: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 2, CHUNK), jnp.float32),
            pltpu.VMEM((2, 4, CHUNK), jnp.float32),
            pltpu.VMEM((2, CP, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        out_shape=jax.ShapeDtypeStruct((num_tiles, C + 2, TILE_PIX),
                                       jnp.float32),
        interpret=interpret,
    )(ranges, xy_T, co_T, ft_T)


def _composite_fwd(static, xy_T, co_T, ft_T, ranges):
    packed = _pallas_forward(static, xy_T, co_T, ft_T, ranges)
    return packed, (xy_T, co_T, ft_T, ranges, packed)


def _composite_bwd(static, res, d_packed):
    grid_x, num_tiles, C, CP, I, interpret = static
    xy_T, co_T, ft_T, ranges, packed = res
    kernel = functools.partial(_backward_kernel, grid_x, C, CP)
    d_xy, d_co, d_ft = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((8, 2), lambda t: (t // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, C + 2, TILE_PIX), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, C + 2, TILE_PIX), lambda t: (t, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 2, CHUNK), jnp.float32),
            pltpu.VMEM((2, 4, CHUNK), jnp.float32),
            pltpu.VMEM((2, CP, CHUNK), jnp.float32),
            pltpu.VMEM((2, 2, CHUNK), jnp.float32),
            pltpu.VMEM((2, 4, CHUNK), jnp.float32),
            pltpu.VMEM((2, CP, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((I // CHUNK, 2, CHUNK), jnp.float32),
            jax.ShapeDtypeStruct((I // CHUNK, 4, CHUNK), jnp.float32),
            jax.ShapeDtypeStruct((I // CHUNK, CP, CHUNK), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(ranges, xy_T, co_T, ft_T, packed, d_packed)
    # unwritten capacity tail may hold garbage; it maps to the sentinel
    # gaussian row and is dropped by the caller's segment-sum, but NaNs there
    # would still poison a debug sum — scrub them.
    d_xy = jnp.where(jnp.isfinite(d_xy), d_xy, 0.0)
    d_co = jnp.where(jnp.isfinite(d_co), d_co, 0.0)
    d_ft = jnp.where(jnp.isfinite(d_ft), d_ft, 0.0)
    return d_xy, d_co, d_ft, _float0_zeros(ranges)


_composite_core.defvjp(_composite_fwd, _composite_bwd)


def composite_pallas(means2d, conic, opacity, feats, bins, width: int,
                     height: int, interpret: bool = False):
    """Drop-in replacement for composite_tiled (same contract):
    returns (img [H,W,C] pre-background, T_final [H,W]).

    ``bins`` must come from ``binning.pad_tile_ranges`` (chunk-aligned).
    """
    grid_x = (width + TILE_X - 1) // TILE_X
    grid_y = (height + TILE_Y - 1) // TILE_Y
    num_tiles = grid_x * grid_y
    P = means2d.shape[0]
    C = feats.shape[1]
    I = bins.gauss_id.shape[0]

    assert I % CHUNK == 0, "max_instances must be a multiple of CHUNK"
    NCH = I // CHUNK

    # sentinel row P: zero opacity -> no contribution, zero grads
    pad = lambda x: jnp.pad(x, [(0, 1)] + [(0, 0)] * (x.ndim - 1))
    gid = jnp.minimum(bins.gauss_id, P)
    to3 = lambda x: x.reshape(NCH, CHUNK, -1).swapaxes(1, 2)  # [NCH,rows,CHUNK]
    xy_T = to3(pad(means2d)[gid])                                 # [NCH,2,CHUNK]
    co_T = to3(jnp.concatenate(
        [pad(conic)[gid], pad(opacity[:, None])[gid]], axis=1))   # [NCH,4,CHUNK]
    CP = ((C + 7) // 8) * 8  # sublane-align feature rows for VMEM tiling
    feats_p = jnp.pad(pad(feats)[gid], ((0, 0), (0, CP - C)))
    ft_T = to3(feats_p)                                           # [NCH,CP,CHUNK]
    ranges = jnp.stack([bins.tile_start // CHUNK, bins.tile_count], axis=1)
    pad_rows = (-ranges.shape[0]) % 8
    if pad_rows:
        ranges = jnp.pad(ranges, ((0, pad_rows), (0, 0)))

    static = (grid_x, num_tiles, C, CP, I, interpret)
    packed = _composite_core(
        static, xy_T, co_T, ft_T, jax.lax.stop_gradient(ranges))
    img_t = packed[:, 0:C]
    tf_t = packed[:, C]

    img = img_t.reshape(grid_y, grid_x, C, TILE_Y, TILE_X)
    img = img.transpose(0, 3, 1, 4, 2).reshape(
        grid_y * TILE_Y, grid_x * TILE_X, C)
    tf = tf_t.reshape(grid_y, grid_x, TILE_Y, TILE_X)
    tf = tf.transpose(0, 2, 1, 3).reshape(grid_y * TILE_Y, grid_x * TILE_X)
    return img[:height, :width], tf[:height, :width]
