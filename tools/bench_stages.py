#!/usr/bin/env python
"""Stage-level timing of the rasterizer pipeline on the real chip.

Times each stage with donated inputs + block_until_ready loops:
preprocess / binning-expand / sort / tile-ranges / attr-pack(gather) /
fwd kernel / full fwd / full fwd+bwd / segment-reduce.
"""
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def _sync(x):
    # block_until_ready is a no-op over the axon tunnel; a tiny host
    # readback is the only reliable device sync (same as bench.py)
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


_T_BASE = None


def _dispatch_baseline():
    global _T_BASE
    if _T_BASE is None:
        nop = jax.jit(lambda x: x + 1)
        z = nop(jnp.zeros((8, 128)))
        _sync(z)
        t0 = time.perf_counter()
        for _ in range(20):
            z = nop(z)
        _sync(z)
        _T_BASE = time.perf_counter() - t0
    return _T_BASE


def timeit(fn, *args, n=10, warmup=2):
    t_base = _dispatch_baseline()
    for _ in range(warmup):
        r = fn(*args)
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    _sync(r)
    t1 = time.perf_counter()
    return max(t1 - t0 - t_base, 1e-9) / n * 1000.0


def main():
    from bench import build_scene
    from gsplat_tpu.ops.rasterize import RasterizeConfig, rasterize
    from gsplat_tpu.ops import preprocess as pre_lib
    from gsplat_tpu.ops import binning as bin_lib
    from gsplat_tpu.ops.composite_pallas import composite_pallas

    W, H = 1920, 1080
    N = 500_000
    cam, g = build_scene(N, W, H)
    cfg = RasterizeConfig(width=W, height=H, max_instances=2490368,
                          k_max=2048, backend="pallas")
    cam_kw = dict(
        viewmatrix=jnp.asarray(cam.world_view_transform),
        projmatrix=jnp.asarray(cam.full_proj_transform),
        campos=jnp.asarray(cam.camera_center),
        tan_fovx=jnp.float32(cam.tan_fovx),
        tan_fovy=jnp.float32(cam.tan_fovy),
    )

    pre_fn = jax.jit(lambda m, s, r, o, sh: pre_lib.preprocess(
        m, s, r, o, sh, 3, cam_kw["viewmatrix"], cam_kw["projmatrix"],
        cam_kw["campos"], cam_kw["tan_fovx"], cam_kw["tan_fovy"], W, H))
    args = (g["means3d"], g["scales"], g["rotations"], g["opacities"], g["shs"])
    t_pre = timeit(pre_fn, *args)
    pre = pre_fn(*args)
    print(f"preprocess                 {t_pre:8.2f} ms")

    bin_fn = jax.jit(lambda p: bin_lib.bin_gaussians(
        p, cfg.grid_x, cfg.grid_y, cfg.max_instances))
    t_bin = timeit(bin_fn, pre)
    bins = bin_fn(pre)
    print(f"binning (expand+sort+rng)  {t_bin:8.2f} ms")

    # sort alone
    I = cfg.max_instances
    rng = np.random.default_rng(0)
    tile = jnp.asarray(rng.integers(0, 8160, I).astype(np.int32))
    db = jnp.asarray(rng.integers(0, 1 << 30, I).astype(np.int32))
    gi = jnp.asarray(rng.integers(0, N, I).astype(np.int32))
    sort2 = jax.jit(lambda t, d, g_: jax.lax.sort((t, d, g_), num_keys=2,
                                                  is_stable=True))
    print(f"  sort 2-key (4M)          {timeit(sort2, tile, db, gi):8.2f} ms")
    sort1 = jax.jit(lambda t, g_: jax.lax.sort((t, g_), num_keys=1,
                                               is_stable=True))
    print(f"  sort 1-key stable (4M)   {timeit(sort1, tile, gi):8.2f} ms")
    sortg = jax.jit(lambda d: jax.lax.sort(
        (d, jnp.arange(N, dtype=jnp.int32)), num_keys=1))
    dg = jnp.asarray(rng.integers(0, 1 << 30, N).astype(np.int32))
    print(f"  sort gauss depth (500k)  {timeit(sortg, dg):8.2f} ms")

    feats = jnp.concatenate(
        [pre.rgb, pre.depths[:, None], jnp.ones_like(pre.depths[:, None])],
        axis=1)
    comp_fn = jax.jit(lambda p, f, b: composite_pallas(
        p.means2d, p.conic, p.opacity, f, b, W, H))
    t_comp = timeit(comp_fn, pre, feats, bins)
    print(f"pack+fwd kernel            {t_comp:8.2f} ms")

    # --- isolate: attr pack (gather), kernel fwd, kernel bwd --------------
    from gsplat_tpu.ops import composite_pallas as cp
    from gsplat_tpu.ops.segment_reduce import gather_rows

    C = feats.shape[1] + 5
    R = ((cp.ATTR_BASE + feats.shape[1] + 7) // 8) * 8

    def build_attr(p, f, b):
        table = jnp.concatenate(
            [p.means2d, p.conic, p.opacity[:, None], f], axis=1)
        table = jnp.pad(table, ((0, 1), (0, R - table.shape[1])))
        gid = jnp.minimum(b.gauss_id, N)
        attr = gather_rows(table, gid, False)
        return jnp.pad(attr, ((0, cp.CHUNK), (0, 0)))

    pack_fn = jax.jit(build_attr)
    t_pack = timeit(pack_fn, pre, feats, bins)
    print(f"  attr pack (gather)       {t_pack:8.2f} ms")

    attr0 = pack_fn(pre, feats, bins)
    NCH = cfg.max_instances // cp.CHUNK
    attr = attr0[:NCH * cp.CHUNK].reshape(NCH, cp.CHUNK, R).swapaxes(1, 2)
    num_tiles = cfg.grid_x * cfg.grid_y
    ranges = jnp.stack([bins.tile_start // cp.CHUNK, bins.tile_count], axis=1)
    pad_rows = (-ranges.shape[0]) % 8
    if pad_rows:
        ranges = jnp.pad(ranges, ((0, pad_rows), (0, 0)))
    static = (cfg.grid_x, num_tiles, C, R, NCH, False)
    kf = jax.jit(lambda a, r: cp._pallas_forward(static, a, r))
    t_kf = timeit(kf, attr, ranges)
    print(f"  fwd kernel alone         {t_kf:8.2f} ms")

    packed = kf(attr, ranges)
    dpk = jnp.ones_like(packed)
    kb = jax.jit(lambda a, r, pk, d: cp._composite_bwd(
        static, (a, r, pk), d)[0])
    t_kb = timeit(kb, attr, ranges, packed, dpk, n=5)
    print(f"  bwd kernel alone(+scrub) {t_kb:8.2f} ms")

    full_fn = jax.jit(lambda *a: rasterize(cfg, *a, **cam_kw,
                                           bg=jnp.zeros(3))["render"])
    t_full = timeit(full_fn, *args)
    print(f"FULL forward               {t_full:8.2f} ms  "
          f"({W*H/1e6/(t_full/1e3):.1f} Mpix/s)")

    def loss(*a):
        out = rasterize(cfg, *a, **cam_kw, bg=jnp.zeros(3))
        return out["render"].sum() + out["depth"].sum() + out["alpha"].sum()
    grad_fn = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
    t_fb = timeit(grad_fn, *args, n=5)
    print(f"FULL fwd+bwd               {t_fb:8.2f} ms  "
          f"({W*H/1e6/(t_fb/1e3):.1f} Mpix/s)")

    # segment reduce alone
    from gsplat_tpu.ops.segment_reduce import gather_rows
    table = jnp.asarray(rng.standard_normal((N + 1, 16)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, I).astype(np.int32))
    gr = jax.jit(lambda t, i: gather_rows(t, i, False))
    print(f"gather_rows fwd (4M x 16)  {timeit(gr, table, idx):8.2f} ms")
    gr_g = jax.jit(jax.grad(lambda t, i: gather_rows(t, i, False).sum()))
    print(f"gather_rows fwd+bwd        {timeit(gr_g, table, idx, n=5):8.2f} ms")


if __name__ == "__main__":
    main()
