#!/usr/bin/env python
"""Attribute the forward kernel's compute cost to its pieces.

bench_dma_overhead showed the kernel is compute-bound (DMA fully hidden by
the cross-tile prefetch).  This strips one piece at a time from a
resident-buffer compute kernel (results become wrong — only cost matters):

  base       — full per-chunk compute (mirror of the production kernel)
  no_cond    — early-exit lax.cond removed (compute unconditional)
  no_scan    — cumprod log-scan replaced by one multiply
  no_matmul  — channel-composite dot_general removed
  no_minmax  — T_frozen min + n_contrib max reductions removed
  alpha_only — just _chunk_alpha + one accumulate
  mxu_alpha  — base but with the MXU quadratic-form power path
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


def _kernel(C, R, variant, ranges_ref, attr_ref, out_ref, buf, sems):
    t = pl.program_id(0)
    chunk0 = ranges_ref[t % 8, 0]
    count = ranges_ref[t % 8, 1]
    nchunks = (count + CHUNK - 1) // CHUNK
    px, py, origin = cp._pixel_coords(t, 120)

    cpy = pltpu.make_async_copy(attr_ref.at[chunk0], buf.at[0], sems.at[0])

    @pl.when(nchunks > 0)
    def _():
        cpy.start()

    @pl.when(nchunks > 0)
    def _():
        cpy.wait()

    def chunk_work(c, carry):
        T, nc, acc = carry
        k_idx = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        pos = c * CHUNK + k_idx
        valid = pos < count
        a, mask, _ = cp._chunk_alpha(buf[0], px, py, valid,
                                     mxu_power=(variant == "mxu_alpha"),
                                     origin=origin, need_dxy=False)
        if variant == "alpha_only":
            return T, nc, acc + a[0:cp.ATTR_BASE + 1][: acc.shape[0]] * 0 + \
                jnp.sum(a, axis=0, keepdims=True)
        done = T < 0.0
        Tv = jnp.abs(T)
        a = jnp.where(mask & ~done, a, 0.0)
        if variant == "no_scan":
            T_incl = Tv * (1.0 - a) * 0.999
        else:
            T_incl = Tv * cp._cumprod0(1.0 - a)
        ok = T_incl >= cp.T_EPS
        contrib = mask & ~done & ok
        T_excl = jnp.concatenate([Tv, T_incl[:-1]], axis=0)
        w = jnp.where(contrib, a * T_excl, 0.0)
        if variant == "no_minmax":
            T_new = T_incl[-1:]
        else:
            T_frozen = jnp.min(jnp.where(ok, T_incl, Tv), axis=0,
                               keepdims=True)
            terminated = done | (T_incl[-1:] < cp.T_EPS)
            T_new = jnp.where(terminated, -T_frozen, T_frozen)
            nc = jnp.maximum(nc, jnp.max(
                jnp.where(contrib, pos + 1, 0), axis=0, keepdims=True))
        if variant == "no_matmul":
            acc = acc + jnp.sum(w, axis=0, keepdims=True)
        else:
            acc = acc + jax.lax.dot_general(
                buf[0, cp.ATTR_BASE:cp.ATTR_BASE + C], w,
                (((1,), (0,)), ((), ())), precision=cp._HI)
        return T_new, nc, acc

    def body(c, carry):
        if variant == "no_cond":
            return chunk_work(c, carry)
        T = carry[0]
        return jax.lax.cond(jnp.max(T) > 0.0,
                            lambda cr: chunk_work(c, cr),
                            lambda cr: cr, carry)

    Csz = 1 if variant in ("alpha_only", "no_matmul") else C
    T, nc, acc = jax.lax.fori_loop(
        0, nchunks, body,
        (jnp.ones((1, TILE_PIX), jnp.float32),
         jnp.zeros((1, TILE_PIX), jnp.int32),
         jnp.zeros((Csz, TILE_PIX), jnp.float32)))
    out_ref[0] = jnp.concatenate(
        [acc, jnp.abs(T), nc.astype(jnp.float32)], axis=0)[0:C + 2] \
        if Csz == C else jnp.broadcast_to(
            jnp.concatenate([acc, jnp.abs(T)], axis=0)[0:1],
            (C + 2, TILE_PIX))


def main():
    attr, ranges, T, NCH, R = make_workload()
    C = 5

    for variant in ["base", "no_cond", "no_scan", "no_matmul", "no_minmax",
                    "alpha_only", "mxu_alpha"]:
        k = functools.partial(_kernel, C, R, variant)
        fn = jax.jit(lambda a, r, k=k: pl.pallas_call(
            k, grid=(T,),
            in_specs=[pl.BlockSpec((8, 4), lambda t: (t // 8, 0),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, C + 2, TILE_PIX),
                                   lambda t: (t, 0, 0)),
            scratch_shapes=[pltpu.VMEM((1, R, CHUNK), jnp.float32),
                            pltpu.SemaphoreType.DMA((1,))],
            out_shape=jax.ShapeDtypeStruct((T, C + 2, TILE_PIX),
                                           jnp.float32))(r, a))
        try:
            t_ms = timeit(fn, attr, ranges)
            print(f"{variant:11s}: {t_ms:7.2f} ms", flush=True)
        except Exception as e:
            print(f"{variant:11s}: FAILED {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
