"""Pallas TPU composite kernels — forward + hand-derived backward (custom_vjp).

The two genuinely hot kernels of the framework (SURVEY.md §2.1 N3/N4;
reference renderCUDA forward.cu:261-392 and backward renderCUDA
backward.cu:415-639).  TPU-native design:

- Grid = one program per 16x16 tile.
- Instance attributes (mean2d, conic, opacity, packed feature channels) live
  in ONE row-major table laid out chunk-major ``[NCH, R, CHUNK]`` so each
  chunk is a single contiguous double-buffered DMA HBM->VMEM; the kernel
  slices rows in VMEM.  Binning pads every tile's sorted segment to a CHUNK
  multiple IN the sort (pad-inline, ops/binning.py), so this table is one
  gather of the sorted id list plus a free reshape — Mosaic requires
  128-aligned block offsets, which the aligned segments provide.
- Inside a chunk everything is dense VPU/MXU work on [CHUNK, 256] arrays:
  the front-to-back alpha recurrence is a log-step cumulative product along
  the chunk axis (Mosaic has no cumprod primitive), and all output channels
  (rgb + depth + weight + segments) are composited with ONE
  [C,CHUNK]x[CHUNK,256] matmul.
- The backward walks chunks in REVERSE, reconstructing the transmittance by
  division exactly like the CUDA backward (T = T/(1-a), safe because
  a <= 0.99 — backward.cu:466-552), and maintains the per-pixel suffix
  accumulator S_i = sum_{j>i} w_j g_j that yields
  dL/da_i = T_i g_i - (S_i + T_final dL/dT_final) / (1 - a_i).
- Per-instance gradients stream back to disjoint chunk-aligned HBM slices of
  a single output table — each instance belongs to exactly one tile, so
  there are no cross-program races (the TPU substitute for CUDA's atomicAdd,
  backward.cu:575-636); the per-gaussian reduction is the gather's own
  scatter-add adjoint outside the kernel.

Deliberate deviation from CUDA: the 0.99 alpha clamp is treated as a real
min() under differentiation (zero gradient on the clamped branch), matching
jax.grad of the jnp oracle; backward.cu ignores the clamp in its chain rule.

Pixel-termination parity: a pixel stops compositing at the first instance
whose candidate transmittance would drop below 1e-4 (that instance is
skipped; forward.cu:351-358), reproduced with cumulative masks carried
across chunks; the forward emits the CUDA ``n_contrib`` (position of the
last contributing instance) which exactly gates the backward recomputation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsplat_tpu.ops.composite_ref import ALPHA_MAX, ALPHA_MIN, T_EPS
from gsplat_tpu.ops.pallas_util import vma_of
from gsplat_tpu.ops.preprocess import TILE_X, TILE_Y

TILE_PIX = TILE_X * TILE_Y  # 256
CHUNK = 128                  # instances per DMA/compute batch.  Tiles hold
                             # ~250 instances on average, so per-tile padding
                             # to CHUNK multiples wastes ~CHUNK/2 slots per
                             # tile across kernel compute + DMA + the attr
                             # gather; 128 halves that tax vs 256 while
                             # keeping the MXU contraction dim full (128)
_HI = jax.lax.Precision.HIGHEST


def _scan_ax0(x, op, pad_val, reverse=False):
    """Inclusive associative scan along axis 0 (static length) as log-step
    shift+op — 8 VPU ops for K=256."""
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
    """Pixel-center coordinates of tile t as [1, 256] arrays, plus the
    scalar tile origin (for tile-relative math in the MXU power path)."""
    tile_x = (t % grid_x).astype(jnp.float32)
    tile_y = (t // grid_x).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_PIX), 1)
    ox = tile_x * TILE_X
    oy = tile_y * TILE_Y
    px = ox + (lane % TILE_X).astype(jnp.float32)
    py = oy + (lane // TILE_X).astype(jnp.float32)
    return px, py, (ox, oy)


def _chunk_alpha(buf, px, py, valid, mxu_power=False, origin=None,
                 need_dxy=True):
    """Alpha evaluation for one chunk from the packed attribute rows.

    buf: [R, K] (rows 0-1 xy, 2-4 conic, 5 opacity); px/py: [1,256];
    valid: [K,1] bool.  Returns (a [K,256] masked alpha, mask, extras).
    Rules: power>0 skip, alpha<1/255 skip, clamp at 0.99 (forward.cu:338-350).

    mxu_power: evaluate the quadratic form on the MXU as ONE matmul
    power[k,p] = Q[k,:] @ basis[:,p] with basis = (1, px, py, px^2, py^2,
    px*py) and per-instance coefficients Q assembled from cheap [1,K] row
    ops — replaces ~9 full [K,256] VPU ops per chunk.  All coordinates are
    taken TILE-RELATIVE (|x| ~< a few hundred px) so the f32 matmul's
    term cancellation stays ~1e-5 absolute in power; with ABSOLUTE 1080p
    coordinates the px^2-scale terms reach ~1e6 and the cancellation error
    (~3e-2 in power -> 3% in alpha) would break parity, which is why the
    round-1 attempt at this measured as unusable (docs/PERF_NOTES.md).
    origin: (ox, oy) scalar tile origin, required when mxu_power.
    """
    op = buf[5][:, None]
    if mxu_power:
        ox, oy = origin
        xr = buf[0] - ox                     # [K] tile-relative mean
        yr = buf[1] - oy
        A, B, Cc = buf[2], buf[3], buf[4]
        zero = jnp.zeros_like(xr)
        qt = jnp.stack([
            -0.5 * (A * xr * xr + Cc * yr * yr) - B * xr * yr,
            A * xr + B * yr,
            Cc * yr + B * xr,
            -0.5 * A, -0.5 * Cc, -B, zero, zero])          # [8, K]
        pxl = px - ox                        # [1,256] tile-local pixels
        pyl = py - oy
        basis = jnp.concatenate([
            jnp.ones_like(pxl), pxl, pyl, pxl * pxl, pyl * pyl, pxl * pyl,
            jnp.zeros_like(pxl), jnp.zeros_like(pxl)], axis=0)  # [8,256]
        power = jax.lax.dot_general(
            qt, basis, (((0,), (0,)), ((), ())), precision=_HI)  # [K,256]
        if need_dxy:
            dx = xr[:, None] - pxl
            dy = yr[:, None] - pyl
        else:
            dx = dy = None
    else:
        dx = buf[0][:, None] - px          # [K,256]
        dy = buf[1][:, None] - py
        A = buf[2][:, None]
        B = buf[3][:, None]
        Cc = buf[4][:, None]
        power = -0.5 * (A * dx * dx + Cc * dy * dy) - B * dx * dy
    # exp via the native base-2 exponential (measured ~2% kernel win,
    # tools/bench_bwd_attrib.py); differs from exp() only by the one
    # rounding of the log2(e) multiply (<1 ulp in power)
    G = jnp.exp2(power * 1.4426950408889634)
    raw = op * G
    alpha = jnp.minimum(ALPHA_MAX, raw)
    # power > 0 never happens for a PSD conic mathematically — the test is a
    # guard (forward.cu:351).  On the MXU path the matmul's ~1e-5 term
    # cancellation can push exact-zero powers slightly positive (near the
    # peak of large flat gaussians), so give that path a small positive
    # tolerance instead of spuriously culling near-center pixels (alpha is
    # clamped anyway; exp2 of +1e-4 is a 7e-5 relative error).
    power_cut = 1e-4 if mxu_power else 0.0
    mask = valid & (power <= power_cut) & (alpha >= ALPHA_MIN)
    a = jnp.where(mask, alpha, 0.0)
    return a, mask, (dx, dy, G, raw)


# rows 0:2 = mean2d, 2:5 = conic, 5 = opacity, 6:6+C = features
ATTR_BASE = 6


# --- bf16-pair feature packing (feat_precision="bf16") -----------------------
# The gather engine runs at ~5.1 ns/row for tables of <= 8 f32 columns but
# ~6.3 ns/row beyond (one vs two (8,128) sublane tiles per row,
# tools/bench_gather_width.py) — packing the feature columns as bf16 PAIRS
# keeps the common no-segment table at 8 columns (6 geometry f32 + 2 packed),
# shaving ~2.5 ms off the 2.1M-row gather.  Geometry stays f32 (bf16 mean2d
# would be ~4 px of position error at 1080p); features (rgb/depth) tolerate
# the 0.4% bf16 rounding like the bf16 grad-reduce already does.

def _unpack_feat_rows(buf_slot, Cg: int, with_ones: bool):
    """[Cp packed rows in buf] -> [C, K] f32 feature matrix.  A bf16 is a
    truncated f32: hi = the word's top 16 bits, lo = the bottom 16 shifted
    up — 3 integer ops per packed row, no 16-bit vector types needed."""
    rows = []
    for j in range((Cg + 1) // 2):
        u = jax.lax.bitcast_convert_type(buf_slot[ATTR_BASE + j], jnp.uint32)
        rows.append(jax.lax.bitcast_convert_type(
            u & jnp.uint32(0xFFFF0000), jnp.float32))
        rows.append(jax.lax.bitcast_convert_type(u << 16, jnp.float32))
    rows = rows[:Cg]
    if with_ones:
        rows.append(jnp.ones_like(rows[0]))
    return jnp.stack(rows, axis=0)


def _round_bf16_bits(x):
    """f32 -> round-to-nearest-even bf16 bit pattern in the top 16 bits."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return (u + jnp.uint32(0x7FFF) + ((u >> 16) & jnp.uint32(1))) \
        & jnp.uint32(0xFFFF0000)


def _pack_feat_grad_rows(d, Cg: int):
    """d [>=Cg, K] f32 -> Cp packed rows (RNE bf16 pairs) for dbuf."""
    out = []
    for j in range((Cg + 1) // 2):
        hi = _round_bf16_bits(d[2 * j])
        lo_src = d[2 * j + 1] if 2 * j + 1 < Cg else jnp.zeros_like(d[0])
        lo = _round_bf16_bits(lo_src) >> 16
        out.append(jax.lax.bitcast_convert_type(hi | lo, jnp.float32))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def pack_feats(feats, Cg: int):
    """Host-side bf16-pair packing with the matching cotangent convention:
    the adjoint receives PACKED per-gaussian gradient pairs (produced by
    gather_rows' packed_tail-aware reduction) and unpacks them."""
    from gsplat_tpu.ops.segment_reduce import _pack_bf16_pairs
    return _pack_bf16_pairs(feats)


def _pack_feats_fwd(feats, Cg):
    from gsplat_tpu.ops.segment_reduce import _pack_bf16_pairs
    return _pack_bf16_pairs(feats), None


def _pack_feats_bwd(Cg, _, d_packed):
    from gsplat_tpu.ops.segment_reduce import _unpack_bf16_pairs
    return (_unpack_bf16_pairs(d_packed, Cg),)


pack_feats.defvjp(_pack_feats_fwd, _pack_feats_bwd)


def _forward_kernel(grid_x: int, C: int, R: int, mxu_power: bool,
                    fp, ranges_ref, attr_ref, img_ref,
                    buf, sems):
    # fp = (feat_packed, Cg, with_ones) — bf16-pair feature rows (see
    # _unpack_feat_rows); C stays the LOGICAL composited channel count
    # img_ref packs [C composited channels; T_final; n_contrib] as C+2 rows
    # so the output block satisfies Mosaic's (8,128)-conformal rule.
    t = pl.program_id(0)
    chunk0 = ranges_ref[t % 8, 0]    # first chunk index of this tile
    count = ranges_ref[t % 8, 1]
    nch_used = ranges_ref[t % 8, 2]  # total used chunks (same on every row)
    nchunks = (count + CHUNK - 1) // CHUNK
    px, py, origin = _pixel_coords(t, grid_x)

    # CROSS-TILE DMA prefetch.  Pad-inline binning makes the chunk table one
    # contiguous GLOBAL sequence (chunk0_{t+1} = chunk0_t + nchunks_t), so
    # instead of double-buffering only within a tile (which exposes every
    # program's first-chunk DMA latency — ~8k exposed DMAs at 1080p), each
    # program issues the dma for global chunk g+1 while processing g, even
    # when g+1 belongs to a LATER tile.  Scratch buffers and semaphores
    # persist across the sequential TPU grid, and slot parity is taken from
    # the GLOBAL chunk index, so issue order == wait order everywhere and
    # only global chunk 0 (issued by program 0) is ever exposed.
    def dma(slot, c):
        # c is tile-local; chunk0 + c is the global chunk index
        return pltpu.make_async_copy(attr_ref.at[chunk0 + c],
                                     buf.at[slot], sems.at[slot])

    @pl.when((t == 0) & (nch_used > 0))
    def _():
        dma(0, 0).start()            # global chunk 0 (chunk0 == 0 at t == 0)

    def body(c, carry):
        T, nc, acc = carry
        slot = (chunk0 + c) % 2

        @pl.when(chunk0 + c + 1 < nch_used)
        def _():
            dma((chunk0 + c + 1) % 2, c + 1).start()

        dma(slot, c).wait()

        # Early exit: once every pixel of the tile has terminated, remaining
        # chunks contribute nothing — skip their compute entirely.  (DMA
        # start/wait stay unconditional: the slot buffers are reused, so a
        # started copy must always be waited before its slot is restarted.)
        # Termination state rides the SIGN of the T carry (done = T < 0,
        # value = |T|, always >= eps) — one carry array and ~4 fewer
        # [K,256] ops per chunk than a separate done mask.
        def compute(carry):
            T, nc, acc = carry
            k_idx = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
            pos = c * CHUNK + k_idx          # 0-based position in tile list
            valid = pos < count
            a, mask, _ = _chunk_alpha(buf[slot], px, py, valid,
                                      mxu_power, origin, need_dxy=False)
            done = T < 0.0
            Tv = jnp.abs(T)
            a = jnp.where(mask & ~done, a, 0.0)

            # ONE scan covers the whole termination semantics.  With the plain
            # cumulative transmittance T_incl (non-increasing along the chunk),
            # "contributes" is exactly mask & (T_incl >= eps): the first masked
            # instance that would push T below eps is the CUDA trigger, itself
            # skipped, and everything after it is below eps too (forward.cu:
            # 351-358).  The frozen exit transmittance is the smallest T_incl
            # still >= eps (or the entry T when the first instance triggers).
            T_incl = Tv * _cumprod0(1.0 - a)
            ok = T_incl >= T_EPS
            contrib = mask & ~done & ok
            # Exclusive transmittance by a one-sublane shift instead of the
            # division trick: T_excl_i = T * prod_{j<i}(1-a_j).  For every
            # contrib row the two agree exactly (any masked j<i of a contrib
            # i is itself contrib since T_incl is non-increasing), and
            # non-contrib rows get w=0 anyway — one shift replaces a full
            # [K,256] divide + two selects.
            T_excl = jnp.concatenate([Tv, T_incl[:-1]], axis=0)
            w = jnp.where(contrib, a * T_excl, 0.0)   # [K,256]

            # last kept T_incl, or the entry T if nothing kept (non-ok rows
            # fill with Tv >= every kept value, so one min covers both)
            T_frozen = jnp.min(jnp.where(ok, T_incl, Tv), axis=0,
                               keepdims=True)
            terminated = done | (T_incl[-1:] < T_EPS)
            T_new = jnp.where(terminated, -T_frozen, T_frozen)

            feats = (_unpack_feat_rows(buf[slot], fp[1], fp[2]) if fp[0]
                     else buf[slot, ATTR_BASE:ATTR_BASE + C])
            acc = acc + jax.lax.dot_general(
                feats, w, (((1,), (0,)), ((), ())), precision=_HI)

            # n_contrib: 1-based position of last contributor
            # (forward.cu:356-379)
            nc = jnp.maximum(nc, jnp.max(
                jnp.where(contrib, pos + 1, 0), axis=0, keepdims=True))
            return T_new, nc, acc

        return jax.lax.cond(jnp.max(T) > 0.0, compute,
                            lambda carry: carry, carry)

    T, nc, acc = jax.lax.fori_loop(
        0, nchunks, body,
        (jnp.ones((1, TILE_PIX), jnp.float32),
         jnp.zeros((1, TILE_PIX), jnp.int32),
         jnp.zeros((C, TILE_PIX), jnp.float32)))
    img_ref[0] = jnp.concatenate(
        [acc, jnp.abs(T), nc.astype(jnp.float32)], axis=0)


def _backward_kernel(grid_x: int, C: int, R: int, mxu_power: bool,
                     fp, ranges_ref, attr_ref, fwd_ref, dpk_ref,
                     dattr_ref,
                     buf, dbuf, sems, osems):
    # FORWARD-walk backward (r2 redesign).  The CUDA backward (and our r1
    # kernel) walk instances back-to-front, reconstructing T by division and
    # accumulating the suffix sum S_i = sum_{j>i} w_j g_j directly
    # (backward.cu:466-478).  Walking FORWARD instead gives the same
    # gradients because the full per-pixel total is already known:
    #     TOT = sum_j w_j g_j = sum_c dL/dout_c * img_c   (pre-background),
    # where img is the forward kernel's own packed accumulation — so
    #     S_i = TOT - prefix_incl_i,
    # and T_excl is recomputed with the exact forward cumprod (no division
    # drift).  The payoff is DMA scheduling: forward order restores the
    # contiguous global chunk walk, so the cross-tile prefetch used by the
    # forward kernel applies here too (block-scoped: the first read in each
    # 8-tile ranges block is issued by the block's first program, every
    # other read by the processing step of the read before it; slot parity
    # comes from the PROCESSING-ORDER prefix pos0, host-precomputed, so
    # issue order == wait order even across the gaps left by the n_contrib
    # chunk limit).
    t = pl.program_id(0)
    row = t % 8
    chunk0 = ranges_ref[row, 0]
    count = ranges_ref[row, 1]
    # Chunk-limited walk: chunks past the last contributing instance
    # (per-tile max n_contrib, host-precomputed into ranges col 4) have
    # zero gradient everywhere — skipped entirely (no DMA, no compute);
    # the host zeroes their d_attr slices in the scrub pass.
    nbw = ranges_ref[row, 4]
    pos0 = ranges_ref[row, 5]        # processing-order prefix of nbw
    px, py, origin = _pixel_coords(t, grid_x)

    n_contrib = fwd_ref[0, C + 1][None, :]   # [1,256] float positions (exact)
    T_final = fwd_ref[0, C][None, :]         # [1,256]
    d_out = dpk_ref[0, 0:C]                  # [C,256]
    d_tf = dpk_ref[0, C][None, :]
    bg_term = T_final * d_tf                 # the T_final (1-a) chain term
    # per-pixel total sum_j w_j g_j from the forward's own accumulation
    tot = jnp.sum(fwd_ref[0, 0:C] * d_out, axis=0, keepdims=True)  # [1,256]

    def dma_in(slot, gc):
        # gc is a GLOBAL chunk index
        return pltpu.make_async_copy(attr_ref.at[gc],
                                     buf.at[slot], sems.at[slot])

    def dma_out(slot, c):
        return pltpu.make_async_copy(dbuf.at[slot],
                                     dattr_ref.at[chunk0 + c],
                                     osems.at[slot])

    def first_read_from(row_lo):
        """(found, global chunk, slot) of the first row >= row_lo in this
        ranges block with nbw > 0 — unrolled scan over the 8-row block."""
        found = jnp.int32(0)
        gc = jnp.int32(0)
        sl = jnp.int32(0)
        for j in range(7, -1, -1):
            hit = (j >= row_lo) & (ranges_ref[j, 4] > 0)
            found = jnp.where(hit, 1, found)
            gc = jnp.where(hit, ranges_ref[j, 0], gc)
            sl = jnp.where(hit, ranges_ref[j, 5] % 2, sl)
        return found, gc, sl

    # block-start duty: the first read of each 8-tile block is issued by the
    # block's first program (cross-block prefetch would need the next
    # block's ranges, which this program cannot see)
    @pl.when(row == 0)
    def _():
        found, gc, sl = first_read_from(jnp.int32(0))

        @pl.when(found > 0)
        def _():
            dma_in(sl, gc).start()

    def body(c, carry):
        T_in, P = carry                      # both [1,256]
        slot = (pos0 + c) % 2

        @pl.when(c + 1 < nbw)
        def _():
            dma_in((pos0 + c + 1) % 2, chunk0 + c + 1).start()

        @pl.when(c + 1 == nbw)
        def _():
            # last own read: prefetch the next tile-with-work in this block
            found, gc, sl = first_read_from(row + 1)

            @pl.when(found > 0)
            def _():
                dma_in(sl, gc).start()

        dma_in(slot, chunk0 + c).wait()

        k_idx = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        pos = c * CHUNK + k_idx
        valid = pos < count
        a, mask, (_, _, G, raw) = _chunk_alpha(buf[slot], px, py,
                                               valid, mxu_power, origin,
                                               need_dxy=False)
        contrib = mask & ((pos + 1).astype(jnp.float32) <= n_contrib)
        a_eff = jnp.where(contrib, a, 0.0)
        one_m = 1.0 - a_eff

        # exact forward transmittance recurrence (identical to the forward
        # kernel's), no division reconstruction
        T_incl = T_in * _cumprod0(one_m)
        T_excl = jnp.concatenate([T_in, T_incl[:-1]], axis=0)
        w = a_eff * T_excl

        # g_i = <feat_i, dL/dout> per pixel: [K,256]
        feats = (_unpack_feat_rows(buf[slot], fp[1], fp[2]) if fp[0]
                 else buf[slot, ATTR_BASE:ATTR_BASE + C])
        g = jax.lax.dot_general(feats, d_out,
                                (((0,), (0,)), ((), ())), precision=_HI)

        # S_i = sum_{j>i} w_j g_j = TOT - inclusive prefix.  (A
        # lower-triangular-ones MXU matmul for this prefix measured neutral
        # to slightly SLOWER than the log-step scan on v5e — the kernel is
        # not bound by these scan ops; receipts in docs/PERF_NOTES.md r3.)
        wg = w * g
        pref = P + _cumsum0(wg)
        S_i = tot - pref

        recip = 1.0 / one_m                  # a <= 0.99 keeps 1-a >= 0.01
        da = jnp.where(contrib,
                       T_excl * g - (S_i + bg_term) * recip, 0.0)

        # chain to opacity / conic / mean2d ------------------------------
        unclamped = raw < ALPHA_MAX           # min() gating (see module doc)
        dpow = jnp.where(contrib & unclamped, raw * da, 0.0)

        # the write buffer is reused every 2 iterations — drain the DMA
        # issued from this slot two iterations ago BEFORE overwriting
        @pl.when(c >= 2)
        def _():
            dma_out(c % 2, c - 2).wait()

        # Six moment sums S** = sum_pix dpow * dx^a dy^b (backward.cu:617-636)
        # via ONE lane-contracting MXU matmul: dx = xk - px is separable, so
        # every moment expands over the fixed pixel-basis rows
        # {1, px, py, px^2, px*py, py^2} (tile-relative for conditioning) —
        # M = basis [8,256] @ dpow^T -> [8, K], then per-instance [1,K] row
        # algebra reconstructs the centered moments.  This replaces the six
        # [K,256] lane-reduction trees (~50 VPU ops/pair, the single biggest
        # slice of this kernel) with one matmul in the SAME orientation as
        # the d_feat matmul below; the r1 'slower' variant used the
        # [K,256]x[256,8] orientation whose N=8 output wastes the MXU.
        # d_op = G*da = dpow/op rides the S0 row (exact division by the
        # per-instance opacity; sentinel rows have op=0 -> masked).
        ox, oy = origin
        pxl = px - ox                                     # [1,256]
        pyl = py - oy
        basis = jnp.concatenate([
            jnp.ones_like(pxl), pxl, pyl, pxl * pxl, pxl * pyl, pyl * pyl,
            jnp.zeros_like(pxl), jnp.zeros_like(pxl)], axis=0)   # [8,256]
        M = jax.lax.dot_general(basis, dpow, (((1,), (1,)), ((), ())),
                                precision=_HI)            # [8, K]
        s0, s1, s2, s3, s4, s5 = (M[i][None, :] for i in range(6))
        xk = (buf[slot, 0] - ox)[None, :]                 # [1,K] rows
        yk = (buf[slot, 1] - oy)[None, :]
        A = buf[slot, 2][None, :]
        B = buf[slot, 3][None, :]
        Cc = buf[slot, 4][None, :]
        op_row = buf[slot, 5][None, :]
        sx = xk * s0 - s1                                 # sum dpow*dx
        sy = yk * s0 - s2                                 # sum dpow*dy
        sxx = xk * xk * s0 - 2.0 * xk * s1 + s3           # sum dpow*dx^2
        sxy = xk * yk * s0 - xk * s2 - yk * s1 + s4       # sum dpow*dx*dy
        syy = yk * yk * s0 - 2.0 * yk * s2 + s5           # sum dpow*dy^2
        wslot = c % 2
        dbuf[wslot, 0] = (-(A * sx + B * sy))[0]
        dbuf[wslot, 1] = (-(Cc * sy + B * sx))[0]
        dbuf[wslot, 2] = (-0.5 * sxx)[0]
        dbuf[wslot, 3] = (-sxy)[0]
        dbuf[wslot, 4] = (-0.5 * syy)[0]
        dbuf[wslot, 5] = (s0 * jnp.where(op_row > 0.0, 1.0 / op_row, 0.0))[0]
        # d_feat [C,K] = d_out [C,256] @ w^T [256,K]; in packed mode the
        # Cg real feature grads are re-packed as bf16 pairs (the cotangent
        # convention of pack_feats / gather_rows packed_tail) and the ones
        # channel's discarded grad is never written
        d_feat = jax.lax.dot_general(
            d_out, w, (((1,), (1,)), ((), ())), precision=_HI)
        if fp[0]:
            for j, packed_row in enumerate(
                    _pack_feat_grad_rows(d_feat, fp[1])):
                dbuf[wslot, ATTR_BASE + j] = packed_row
        else:
            dbuf[wslot, ATTR_BASE:ATTR_BASE + C] = d_feat

        dma_out(wslot, c).start()

        # carries for the next (later) chunk
        return T_incl[-1:], pref[-1:]

    jax.lax.fori_loop(
        0, nbw, body,
        (jnp.ones((1, TILE_PIX), jnp.float32),
         jnp.zeros((1, TILE_PIX), jnp.float32)))

    # drain outstanding output DMAs
    @pl.when(nbw >= 1)
    def _():
        dma_out((nbw - 1) % 2, 0).wait()

    @pl.when(nbw >= 2)
    def _():
        dma_out(nbw % 2, 1).wait()


# --- host-side wrapper -------------------------------------------------------

def _float0_zeros(x):
    return np.zeros(np.shape(x), dtype=jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _composite_core(static, attr, ranges):
    packed, _ = _composite_fwd(static, attr, ranges)
    return packed


def _pallas_forward(static, attr, ranges):
    grid_x, num_tiles, C, R, NCH, interpret, mxu_power, fp = static
    kernel = functools.partial(_forward_kernel, grid_x, C, R, mxu_power, fp)
    return pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((8, 4), lambda t: (t // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, C + 2, TILE_PIX), lambda t: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, R, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        out_shape=jax.ShapeDtypeStruct((num_tiles, C + 2, TILE_PIX),
                                       jnp.float32,
                                       vma=vma_of(attr, ranges)),
        interpret=interpret,
    )(ranges, attr)


def _composite_fwd(static, attr, ranges):
    packed = _pallas_forward(static, attr, ranges)
    return packed, (attr, ranges, packed)


def _composite_bwd(static, res, d_packed):
    grid_x, num_tiles, C, R, NCH, interpret, mxu_power, fp = static
    attr, ranges, packed = res
    kernel = functools.partial(_backward_kernel, grid_x, C, R, mxu_power,
                               fp)

    # Per-tile chunk limit: the last contributing instance position is
    # max_pix n_contrib (packed row C+1); chunks past it carry zero gradient
    # and are skipped by the kernel (ranges col 2), then zeroed here.
    counts = ranges[:, 1]
    nch_full = (counts + CHUNK - 1) // CHUNK
    nc_tile = jnp.max(packed[:, C + 1], axis=1).astype(jnp.int32)  # [Tpad]
    nc_tile = jnp.pad(nc_tile, (0, ranges.shape[0] - num_tiles))
    nbw = jnp.minimum((nc_tile + CHUNK - 1) // CHUNK, nch_full)
    # processing-order prefix of nbw: slot parity for the cross-tile
    # prefetch (the n_contrib limit leaves gaps in the global chunk walk,
    # so GLOBAL chunk parity would not alternate — pos0 + c does)
    pos0 = jnp.cumsum(nbw) - nbw
    ranges_b = jnp.concatenate(
        [ranges, nbw[:, None], pos0[:, None].astype(jnp.int32),
         jnp.zeros_like(nbw)[:, None], jnp.zeros_like(nbw)[:, None]],
        axis=1)

    d_attr = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((8, 8), lambda t: (t // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, C + 2, TILE_PIX), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, C + 2, TILE_PIX), lambda t: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, R, CHUNK), jnp.float32),
            pltpu.VMEM((2, R, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        out_shape=jax.ShapeDtypeStruct(
            (NCH, R, CHUNK), jnp.float32,
            vma=vma_of(attr, ranges_b, packed, d_packed)),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(ranges_b, attr, packed, d_packed)
    # Scrub: (a) chunks beyond every tile's range are never written (they map
    # to the sentinel gaussian row but NaN garbage would poison debug sums);
    # (b) chunks the kernel skipped via the n_contrib limit hold garbage over
    # REAL gaussian ids — both zeroed in one fused pass.
    starts = ranges[:num_tiles, 0]
    cidx = jnp.arange(NCH, dtype=jnp.int32)
    # chunk -> owning tile: last tile with start <= chunk.  A scatter of one
    # 1 per tile start + cumsum replaces searchsorted(starts, cidx) — XLA
    # lowers searchsorted to a ~20-iteration while loop costing ~3 ms at
    # this NCH; the seed scatter is T rows (sorted) and the cumsum is one
    # 16k scan.  Duplicate starts (empty tiles) accumulate k at one slot,
    # so the cumsum lands on the LAST tile with that start — exactly
    # side="right" - 1.
    seed = jnp.zeros((NCH,), jnp.int32).at[starts].add(
        1, mode="drop", indices_are_sorted=True)
    town = jnp.clip(jnp.cumsum(seed) - 1, 0, num_tiles - 1)
    written = (cidx - starts[town]) < nbw[town]
    finite = jnp.isfinite(d_attr)
    if fp[0]:
        # packed bf16-pair rows are opaque bit patterns — a pair can alias
        # an f32 inf/nan; exempt them from the finite guard (the written
        # mask already zeroes every unwritten chunk)
        ridx = jnp.arange(R)
        is_packed_row = (ridx >= ATTR_BASE) &             (ridx < ATTR_BASE + (fp[1] + 1) // 2)
        finite = finite | is_packed_row[None, :, None]
    d_attr = jnp.where(finite & written[:, None, None], d_attr, 0.0)
    return d_attr, _float0_zeros(ranges)


_composite_core.defvjp(_composite_fwd, _composite_bwd)


def composite_pallas(means2d, conic, opacity, feats, bins, width: int,
                     height: int, interpret: bool = False,
                     const_last_feat: bool = False,
                     grad_precision: str = "f32",
                     mxu_power: bool = False,
                     feat_precision: str = "f32"):
    """Tiled Pallas compositor:
    returns (img [C,H,W] pre-background, T_final [H,W], overflow []).

    ``bins`` comes from ``binning.bin_gaussians`` with pad-inline alignment:
    every tile's sorted segment is already padded to a CHUNK multiple and
    starts CHUNK-aligned, so the kernels' blocked attribute table is ONE row
    gather in sorted order plus a free reshape — no padded relayout, no
    second gather (TPU indexed ops cost ~7ns/row; the old relayout's extra
    4M-row id gather alone was ~25ms).
    """
    grid_x = (width + TILE_X - 1) // TILE_X
    grid_y = (height + TILE_Y - 1) // TILE_Y
    num_tiles = grid_x * grid_y
    P = means2d.shape[0]
    C = feats.shape[1]
    I = bins.gauss_id.shape[0]
    assert I % CHUNK == 0, "max_instances must be a multiple of CHUNK"
    NCH = I // CHUNK
    overflow = bins.overflow

    # packed attribute table gathered once in sorted-instance order; pad
    # entries carry the sentinel id P -> the zero row (alpha 0, masked).
    # ``const_last_feat``: the caller marks feats' last column as a constant
    # (the weight/ones channel) — keep it OUT of the gathered table and
    # append it after the gather, so its discarded gradient never enters
    # gather_rows' sort+segment-sum adjoint (one sort operand fewer).
    gfeats = feats[:, :-1] if const_last_feat else feats
    Cg = gfeats.shape[1]
    feat_packed = feat_precision == "bf16"
    if feat_packed:
        # bf16-pair feature columns keep the common table at <= 8 f32
        # columns — the faster gather class (see _unpack_feat_rows doc);
        # the ones channel is synthesized IN-KERNEL, never stored
        tbl_feats = pack_feats(gfeats, Cg)
    else:
        tbl_feats = gfeats
    gathered_w = ATTR_BASE + tbl_feats.shape[1]
    R = ((gathered_w + (0 if feat_packed else const_last_feat) + 7)
         // 8) * 8
    table = jnp.concatenate(
        [means2d, conic, opacity[:, None], tbl_feats], axis=1)
    table = jnp.pad(table, ((0, 1), (0, 0)))                       # sentinel
    gid = jnp.minimum(bins.gauss_id, P)
    from gsplat_tpu.ops.segment_reduce import gather_rows
    # Pad to R rows AFTER the gather: gather cost is per ROW (width-blind
    # within an (8,128)-tile class), and the pad's VJP slices the dead
    # columns off BEFORE gather_rows' sort+segment-sum adjoint.
    attr = gather_rows(table, gid, interpret, grad_precision,
                       tbl_feats.shape[1] if feat_packed else 0)
    if const_last_feat and not feat_packed:
        ones = jnp.ones((attr.shape[0], 1), attr.dtype)
        attr = jnp.concatenate([attr, ones], axis=1)               # [I, 6+C]
    attr = jnp.pad(attr, ((0, 0), (0, R - attr.shape[1])))         # [I, R]
    attr = attr.reshape(NCH, CHUNK, R).swapaxes(1, 2)              # [NCH,R,CHUNK]

    # per-tile (first block, real count); starts are CHUNK-aligned by the
    # binning construction.  Col 2 = total USED chunks (bounds the forward
    # kernel's cross-tile prefetch so no DMA is issued past the live table
    # and left unawaited); col 3 pads the SMEM block to 4 ints.
    #
    # MEMORY SAFETY UNDER OVERFLOW: when the instance demand exceeds the
    # fixed capacity, tile_start/tile_count describe chunks that do not
    # exist in the table — unclamped, the kernels' .at[chunk] DMAs would
    # read AND WRITE out of bounds (observed in r4: an overflowing densify
    # step corrupted live parameter buffers into NaNs).  Clamp every
    # per-tile range into [0, NCH]: the overflowed step's image is wrong
    # (the overflow flag reports that; the trainer skips the update and
    # regrows), but every DMA stays inside the table.
    starts_c = jnp.minimum(bins.tile_start // CHUNK, NCH)
    count_cap = jnp.maximum(NCH - starts_c, 0) * CHUNK
    counts_eff = jnp.minimum(bins.tile_count, count_cap)
    counts_c = (counts_eff + CHUNK - 1) // CHUNK
    nch_used = jnp.broadcast_to(
        jnp.minimum(starts_c[-1] + counts_c[-1], NCH),
        starts_c.shape).astype(jnp.int32)
    ranges = jnp.stack([starts_c, counts_eff, nch_used,
                        jnp.zeros_like(nch_used)], axis=1)
    pad_rows = (-ranges.shape[0]) % 8
    if pad_rows:
        ranges = jnp.pad(ranges, ((0, pad_rows), (0, 0)))

    fp = (feat_packed, Cg, bool(const_last_feat))
    static = (grid_x, num_tiles, C, R, NCH, interpret, mxu_power, fp)
    packed = _composite_core(static, attr, jax.lax.stop_gradient(ranges))

    # ONE fused 5D transpose unpacks every channel (composited C + T_final)
    # to [C+1, H, W]; per-channel transposes cost ~1.6 ms each at 1080p and
    # left images in a pathological [H, W, C]-minor layout.  n_contrib
    # (row C+1) stays tile-packed — only the backward reads it.
    full = packed[:, 0:C + 1].reshape(grid_y, grid_x, C + 1, TILE_Y, TILE_X)
    full = full.transpose(2, 0, 3, 1, 4).reshape(
        C + 1, grid_y * TILE_Y, grid_x * TILE_X)[:, :height, :width]
    return full[:C], full[C], overflow
