"""Micro-bench: VPU elementwise throughput f32 vs bf16 in a Pallas kernel.

Question for the round-2 perf sprint: do bf16 elementwise ops run at 2x the
f32 rate on this chip (packed 2-per-lane), or at the same rate?  The answer
decides whether the composite kernels (docs/PERF_NOTES.md: fwd 20.6 ms /
bwd 29.7 ms, both ~75% of f32 VPU peak) should evaluate alpha in bf16.

Runs a kernel that loops an alpha-evaluation-shaped op mix (mul/add/exp/
compare/select) over a block, timed per dtype.
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_ITERS = 64          # op-mix repetitions inside the kernel
SHAPE = (256, 1024)   # one VMEM block


def kernel(n_iters, x_ref, o_ref):
    x = x_ref[:]
    dt = x.dtype
    half = jnp.asarray(0.5, dt)
    acc = jnp.zeros_like(x)

    def body(i, carry):
        acc, x = carry
        # alpha-eval-shaped mix: 3 mul, 2 fma-ish add, 1 exp, 1 cmp+select
        # (bf16 compares are unsupported on v5e — Mosaic rejects them — so
        # the mask is computed via arithmetic: relu(sign(1-p)) in-dtype.)
        # (sign/max also lower to cmpf on bf16 — keep it pure mul/add/exp)
        p = x * x * half + x * jnp.asarray(0.25, dt)
        g = jnp.exp(-p)
        a = g * x + p * half
        return acc + a, x * jnp.asarray(0.9999, dt)

    acc, _ = jax.lax.fori_loop(0, n_iters, body, (acc, x))
    o_ref[:] = acc


def _sync(x):
    # block_until_ready is a NO-OP over the axon tunnel; a tiny host
    # readback is the only reliable device sync (see bench.py)
    return np.asarray(x.ravel()[0])


import numpy as np  # noqa: E402


def _baseline():
    nop = jax.jit(lambda x: x + 1)
    z = nop(jnp.zeros((8, 128)))
    _sync(z)
    t0 = time.perf_counter()
    for _ in range(10):
        z = nop(z)
    _sync(z)
    return time.perf_counter() - t0


def run(dtype, t_base):
    x = jnp.ones(SHAPE, dtype) * 0.3

    f = pl.pallas_call(
        functools.partial(kernel, N_ITERS),
        out_shape=jax.ShapeDtypeStruct(SHAPE, dtype),
        grid=(64,),
        in_specs=[pl.BlockSpec(SHAPE, lambda i: (0, 0))],
        out_specs=pl.BlockSpec(SHAPE, lambda i: (0, 0)),
    )
    f = jax.jit(f)
    _sync(f(x))
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(x)
    _sync(r)
    dt_s = (time.perf_counter() - t0 - t_base) / reps
    # ~9 VPU op-equivalents per element per inner iter, 64 grid programs
    elems = SHAPE[0] * SHAPE[1] * N_ITERS * 64
    print(f"{np.dtype(dtype).name:10s}  {dt_s*1e3:7.3f} ms   "
          f"{elems/dt_s/1e12:6.3f} Telem/s")
    return dt_s


if __name__ == "__main__":
    t_base = _baseline()
    print(f"# dispatch baseline {t_base*1e3:.1f} ms / 10 calls")
    tf32 = run(jnp.float32, t_base)
    tbf = run(jnp.bfloat16, t_base)
    print(f"bf16 speedup: {tf32/tbf:.2f}x")
