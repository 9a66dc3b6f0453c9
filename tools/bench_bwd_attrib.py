#!/usr/bin/env python
"""Attribute the backward kernel's compute cost and probe variants.

Mirror of the production forward-walk backward with a RESIDENT buffer (no
per-chunk DMA — bench_dma_overhead showed DMA is hidden), knobs:

  base        — production compute
  mxu_moments — the 6 moment sums via ONE [K,256]x[256,8] MXU matmul on the
                tile-local pixel basis (raw moments, recombined per-row):
                replaces ~20 [K,256] VPU op-equivalents
  exp2        — alpha via exp2(power * log2 e) instead of exp(power)
  no_alpha    — alpha recompute skipped (uses buf rows directly; wrong
                results — bounds the alpha share)
  no_moments  — moment sums skipped
  no_dfeat    — d_feat matmul skipped
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsplat_tpu.ops import composite_pallas as cp
from bench_dma_overhead import make_workload, timeit

CHUNK = cp.CHUNK
TILE_PIX = cp.TILE_PIX
ATTR_BASE = cp.ATTR_BASE
_HI = cp._HI


def _local_basis():
    """[256, 8] tile-local pixel basis (1, px, py, px^2, px*py, py^2, 0, 0)
    — transposed for the [K,256]x[256,8] moment matmul."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_PIX), 1)
    qx = (lane % 16).astype(jnp.float32)
    qy = (lane // 16).astype(jnp.float32)
    rows = [jnp.ones_like(qx), qx, qy, qx * qx, qx * qy, qy * qy,
            jnp.zeros_like(qx), jnp.zeros_like(qx)]
    return jnp.concatenate(rows, axis=0).T          # [256, 8]


def _kernel(C, R, variant, ranges_ref, attr_ref, fwd_ref, dpk_ref,
            dattr_ref, buf, dbuf, sems, osems):
    t = pl.program_id(0)
    row = t % 8
    chunk0 = ranges_ref[row, 0]
    count = ranges_ref[row, 1]
    nbw = (count + CHUNK - 1) // CHUNK
    px, py, origin = cp._pixel_coords(t, 120)

    n_contrib = fwd_ref[0, C + 1][None, :]
    T_final = fwd_ref[0, C][None, :]
    d_out = dpk_ref[0, 0:C]
    d_tf = dpk_ref[0, C][None, :]
    bg_term = T_final * d_tf
    tot = jnp.sum(fwd_ref[0, 0:C] * d_out, axis=0, keepdims=True)

    cpy = pltpu.make_async_copy(attr_ref.at[chunk0], buf.at[0], sems.at[0])

    @pl.when(nbw > 0)
    def _():
        cpy.start()

    @pl.when(nbw > 0)
    def _():
        cpy.wait()

    def body(c, carry):
        T_in, P = carry
        k_idx = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        pos = c * CHUNK + k_idx
        valid = pos < count
        if variant == "no_alpha":
            a = buf[0, 0][:, None] * 1e-3 + px * 0.0
            mask = valid
            dx = buf[0, 0][:, None] - px
            dy = buf[0, 1][:, None] - py
            G = a
            raw = a
        elif variant == "exp2":
            ox, oy = origin
            dx = buf[0, 0][:, None] - px
            dy = buf[0, 1][:, None] - py
            A = buf[0, 2][:, None]
            B = buf[0, 3][:, None]
            Cc = buf[0, 4][:, None]
            op = buf[0, 5][:, None]
            power = -0.5 * (A * dx * dx + Cc * dy * dy) - B * dx * dy
            G = jnp.exp2(power * 1.4426950408889634)
            raw = op * G
            alpha = jnp.minimum(cp.ALPHA_MAX, raw)
            mask = valid & (power <= 0.0) & (alpha >= cp.ALPHA_MIN)
            a = jnp.where(mask, alpha, 0.0)
        else:
            a, mask, (dx, dy, G, raw) = cp._chunk_alpha(
                buf[0], px, py, valid)
        contrib = mask & ((pos + 1).astype(jnp.float32) <= n_contrib)
        a_eff = jnp.where(contrib, a, 0.0)
        one_m = 1.0 - a_eff
        T_incl = T_in * cp._cumprod0(one_m)
        T_excl = jnp.concatenate([T_in, T_incl[:-1]], axis=0)
        w = a_eff * T_excl
        g = jax.lax.dot_general(buf[0, ATTR_BASE:ATTR_BASE + C], d_out,
                                (((0,), (0,)), ((), ())), precision=_HI)
        wg = w * g
        pref = P + cp._cumsum0(wg)
        S_i = tot - pref
        recip = 1.0 / one_m
        da = jnp.where(contrib,
                       T_excl * g - (S_i + bg_term) * recip, 0.0)
        unclamped = raw < cp.ALPHA_MAX
        d_op = jnp.where(contrib & unclamped, G * da, 0.0)
        dpow = jnp.where(contrib & unclamped, raw * da, 0.0)
        A = buf[0, 2][:, None]
        B = buf[0, 3][:, None]
        Cc = buf[0, 4][:, None]

        if variant == "no_moments":
            for r in range(6):
                dbuf[0, r] = jnp.sum(dpow, axis=1)
        elif variant == "mxu_moments":
            # raw pixel moments M_ab = sum_p dpow px^a py^b via one MXU
            # matmul on the tile-local basis, recombined per-row:
            #   S_x  = x M0 - M1;  S_y = y M0 - M2
            #   S_xx = x^2 M0 - 2x M1 + M3, S_xy = xy M0 - y M1 - x M2 + M4
            #   S_yy = y^2 M0 - 2y M2 + M5   (x,y tile-local means)
            ox, oy = origin
            xr = buf[0, 0][:, None] - ox          # [K,1]
            yr = buf[0, 1][:, None] - oy
            M = jax.lax.dot_general(dpow, _local_basis(),
                                    (((1,), (0,)), ((), ())),
                                    precision=_HI)      # [K,8]
            M0 = M[:, 0:1]
            M1 = M[:, 1:2]
            M2 = M[:, 2:3]
            M3 = M[:, 3:4]
            M4 = M[:, 4:5]
            M5 = M[:, 5:6]
            sx = xr * M0 - M1
            sy = yr * M0 - M2
            sxx = xr * xr * M0 - 2 * xr * M1 + M3
            sxy = xr * yr * M0 - yr * M1 - xr * M2 + M4
            syy = yr * yr * M0 - 2 * yr * M2 + M5
            dbuf[0, 0] = (-(A * sx + B * sy))[:, 0]
            dbuf[0, 1] = (-(Cc * sy + B * sx))[:, 0]
            dbuf[0, 2] = (-0.5 * sxx)[:, 0]
            dbuf[0, 3] = (-sxy)[:, 0]
            dbuf[0, 4] = (-0.5 * syy)[:, 0]
            dbuf[0, 5] = jnp.sum(d_op, axis=1)
        else:
            pdx = dpow * dx
            pdy = dpow * dy
            sx = jnp.sum(pdx, axis=1, keepdims=True)
            sy = jnp.sum(pdy, axis=1, keepdims=True)
            dbuf[0, 0] = (-(A * sx + B * sy))[:, 0]
            dbuf[0, 1] = (-(Cc * sy + B * sx))[:, 0]
            dbuf[0, 2] = jnp.sum(pdx * (-0.5 * dx), axis=1)
            dbuf[0, 3] = jnp.sum(pdx * (-dy), axis=1)
            dbuf[0, 4] = jnp.sum(pdy * (-0.5 * dy), axis=1)
            dbuf[0, 5] = jnp.sum(d_op, axis=1)
        if variant == "no_dfeat":
            dbuf[0, ATTR_BASE] = jnp.sum(w, axis=1)
        else:
            dbuf[0, ATTR_BASE:ATTR_BASE + C] = jax.lax.dot_general(
                d_out, w, (((1,), (1,)), ((), ())), precision=_HI)
        return T_incl[-1:], pref[-1:]

    jax.lax.fori_loop(
        0, nbw, body,
        (jnp.ones((1, TILE_PIX), jnp.float32),
         jnp.zeros((1, TILE_PIX), jnp.float32)))

    # one output DMA per program just to keep dbuf alive
    ocp = pltpu.make_async_copy(dbuf.at[0], dattr_ref.at[chunk0],
                                osems.at[0])

    @pl.when(nbw > 0)
    def _():
        ocp.start()

    @pl.when(nbw > 0)
    def _():
        ocp.wait()


def main():
    attr, ranges, T, NCH, R = make_workload()
    C = 5
    rng = np.random.default_rng(1)
    fwd = jnp.asarray(
        rng.uniform(0.1, 200, (T, C + 2, TILE_PIX)).astype(np.float32))
    dpk = jnp.asarray(
        rng.standard_normal((T, C + 2, TILE_PIX)).astype(np.float32) * .01)

    for variant in ["base", "mxu_moments", "exp2", "no_alpha",
                    "no_moments", "no_dfeat"]:
        k = functools.partial(_kernel, C, R, variant)
        fn = jax.jit(lambda a, r, f, d, k=k: pl.pallas_call(
            k, grid=(T,),
            in_specs=[pl.BlockSpec((8, 4), lambda t: (t // 8, 0),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec((1, C + 2, TILE_PIX),
                                   lambda t: (t, 0, 0)),
                      pl.BlockSpec((1, C + 2, TILE_PIX),
                                   lambda t: (t, 0, 0))],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.VMEM((1, R, CHUNK), jnp.float32),
                            pltpu.VMEM((1, R, CHUNK), jnp.float32),
                            pltpu.SemaphoreType.DMA((1,)),
                            pltpu.SemaphoreType.DMA((1,))],
            out_shape=jax.ShapeDtypeStruct((NCH, R, CHUNK), jnp.float32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(r, a, f, d))
        try:
            t_ms = timeit(fn, attr, ranges, fwd, dpk)
            print(f"{variant:12s}: {t_ms:7.2f} ms", flush=True)
        except Exception as e:
            print(f"{variant:12s}: FAILED {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
