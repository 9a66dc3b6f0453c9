#!/usr/bin/env python
"""Micro-bench: SH->RGB eval fwd and fwd+bwd at bench scale — the trace
shows ~23 ms/iter of async slices on the [P,16,3] SH tensor."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from gsplat_tpu.core.sh import eval_sh, sh_to_rgb

P = 500_000
rng = np.random.default_rng(0)
shs = jnp.asarray(rng.standard_normal((P, 16, 3)).astype(np.float32))
means = jnp.asarray(rng.standard_normal((P, 3)).astype(np.float32) * 2)
campos = jnp.zeros(3)

def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

nop = jax.jit(lambda x: x + 1)
z = nop(jnp.zeros((8, 128))); sync(z)
t0 = time.perf_counter()
for _ in range(20):
    z = nop(z)
sync(z)
t_base = time.perf_counter() - t0

def timed(f, *a, iters=20):
    r = f(*a); sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*a)
    sync(r)
    return max((time.perf_counter() - t0 - t_base) / iters, 1e-9)

@jax.jit
def fwd(shs, means):
    return sh_to_rgb(3, shs, means, campos)

@jax.jit
def fwdbwd(shs, means):
    def loss(shs, means):
        return jnp.sum(sh_to_rgb(3, shs, means, campos) * means)
    return jax.value_and_grad(loss, argnums=(0, 1))(shs, means)

print(f"fwd     {timed(fwd, shs, means)*1e3:7.2f} ms")
print(f"fwd+bwd {timed(fwdbwd, shs, means)*1e3:7.2f} ms")
