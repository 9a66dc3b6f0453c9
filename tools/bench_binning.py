#!/usr/bin/env python
"""Micro-bench of bin_gaussians stages on the real chip."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def _sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    _sync(r)
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    from bench import build_scene
    from gsplat_tpu.ops.rasterize import RasterizeConfig
    from gsplat_tpu.ops import preprocess as pre_lib
    from gsplat_tpu.ops import binning as bin_lib

    W, H = 1920, 1080
    N = 500_000
    cam, g = build_scene(N, W, H)
    cfg = RasterizeConfig(width=W, height=H, max_instances=2490368,
                          backend="pallas")
    pre_fn = jax.jit(lambda m, s, r, o, sh: pre_lib.preprocess(
        m, s, r, o, sh, 3,
        jnp.asarray(cam.world_view_transform),
        jnp.asarray(cam.full_proj_transform),
        jnp.asarray(cam.camera_center),
        jnp.float32(cam.tan_fovx), jnp.float32(cam.tan_fovy), W, H))
    args = (g["means3d"], g["scales"], g["rotations"], g["opacities"], g["shs"])
    pre = pre_fn(*args)

    bin_fn = jax.jit(lambda p: bin_lib.bin_gaussians(
        p, cfg.grid_x, cfg.grid_y, cfg.max_instances, align=128))
    print(f"binning total             {timeit(bin_fn, pre):8.2f} ms", flush=True)

    hist_fn = jax.jit(lambda p: bin_lib._tile_histogram(p, cfg.grid_x, cfg.grid_y))
    print(f"  histogram               {timeit(hist_fn, pre):8.2f} ms", flush=True)

    # scatter+cumsum alone (packed)
    I = cfg.max_instances
    n_src = N + cfg.grid_x * cfg.grid_y + 1
    rng = np.random.default_rng(0)
    pos_ = jnp.asarray(np.sort(rng.integers(0, I, n_src)).astype(np.int32))
    cols_ = jnp.asarray(rng.integers(0, 1 << 20, (n_src, 3)).astype(np.int32))

    def ffill_packed(pos, cols):
        deltas = jnp.concatenate([cols[:1], cols[1:] - cols[:-1]], axis=0)
        seed = jnp.zeros((I, 3), jnp.int32).at[pos].add(
            deltas, mode="drop", indices_are_sorted=True)
        return (jnp.cumsum(seed[:, 0]), jnp.cumsum(seed[:, 1]),
                jnp.cumsum(seed[:, 2]))

    def ffill_sep(pos, cols):
        outs = []
        for j in range(3):
            d = jnp.concatenate([cols[:1, j], cols[1:, j] - cols[:-1, j]])
            s = jnp.zeros((I,), jnp.int32).at[pos].add(
                d, mode="drop", indices_are_sorted=True)
            outs.append(jnp.cumsum(s))
        return tuple(outs)

    print(f"  ffill packed (1 scatter) {timeit(jax.jit(ffill_packed), pos_, cols_):8.2f} ms", flush=True)
    print(f"  ffill separate (3)       {timeit(jax.jit(ffill_sep), pos_, cols_):8.2f} ms", flush=True)

    # cumsum alone
    seed1 = jnp.zeros((I,), jnp.int32)
    print(f"  cumsum [I] x3            {timeit(jax.jit(lambda s: (jnp.cumsum(s), jnp.cumsum(s*2), jnp.cumsum(s*3))), seed1):8.2f} ms", flush=True)

    # scatter alone packed
    scat = jax.jit(lambda p, d: jnp.zeros((I, 3), jnp.int32).at[p].add(
        d, mode="drop", indices_are_sorted=True))
    print(f"  scatter packed alone     {timeit(scat, pos_, cols_):8.2f} ms", flush=True)
    scat1 = jax.jit(lambda p, d: jnp.zeros((I,), jnp.int32).at[p].add(
        d, mode="drop", indices_are_sorted=True))
    print(f"  scatter 1col alone       {timeit(scat1, pos_, cols_[:, 0]):8.2f} ms", flush=True)

    # final sort
    tile_ = jnp.asarray(rng.integers(0, 8161, I).astype(np.int32))
    gid_ = jnp.asarray(rng.integers(0, N, I).astype(np.int32))
    sort_fn = jax.jit(lambda t, g_: jax.lax.sort((t, g_), num_keys=1,
                                                 is_stable=True))
    print(f"  final stable sort        {timeit(sort_fn, tile_, gid_):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
