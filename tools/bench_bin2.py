#!/usr/bin/env python
"""Probe 2: binning sub-stages in context, composite-kernel grid-overhead
floor (all-empty tiles), segment-sum block-size variants."""
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
    pre = jax.jit(lambda m, s, r, o, sh: pre_lib.preprocess(
        m, s, r, o, sh, 3, jnp.asarray(cam.world_view_transform),
        jnp.asarray(cam.full_proj_transform), jnp.asarray(cam.camera_center),
        jnp.float32(cam.tan_fovx), jnp.float32(cam.tan_fovy), W, H))(
        g["means3d"], g["scales"], g["rotations"], g["opacities"], g["shs"])
    gx, gy = cfg.grid_x, cfg.grid_y
    I = cfg.max_instances

    # A: histogram alone
    hist = jax.jit(lambda p: bin_lib._tile_histogram(p, gx, gy))
    print(f"hist alone              {timeit(hist, pre):8.2f} ms", flush=True)

    # B: expansion WITHOUT final sort (copy of bin_gaussians prefix)
    def expand_only(pre):
        P = pre.depths.shape[0]
        num_tiles = gx * gy
        align = 128
        tiles_touched = pre.tiles_touched
        num_rendered = jnp.sum(tiles_touched)
        counts = bin_lib._tile_histogram(pre, gx, gy)
        pads = (-counts) % align
        padded = counts + pads
        tile_start = (jnp.cumsum(padded) - padded).astype(jnp.int32)
        total_padded = num_rendered + jnp.sum(pads)
        depth_bits_g = jax.lax.bitcast_convert_type(
            pre.depths.astype(jnp.float32), jnp.int32)
        dkey = jnp.where(pre.visible, depth_bits_g, jnp.int32(0x7FFFFFFF))
        order = jnp.argsort(dkey, stable=True).astype(jnp.int32)
        src_tbl = jnp.stack(
            [tiles_touched, pre.rect_min[:, 0], pre.rect_min[:, 1],
             jnp.maximum(pre.rect_max[:, 0] - pre.rect_min[:, 0], 1)],
            axis=1).astype(jnp.int32)[order]
        tt_s = src_tbl[:, 0]
        offsets_real = jnp.cumsum(tt_s) - tt_s
        offsets_pad = num_rendered + jnp.cumsum(pads) - pads
        rw_cap = max(gx, align, 2)
        rw_bits = int(rw_cap).bit_length()

        def pack_meta(base, rw, colstep):
            return ((base << (rw_bits + 1)) | (rw << 1) | colstep).astype(jnp.int32)

        base_real = src_tbl[:, 2] * gx + src_tbl[:, 1]
        meta_real = pack_meta(base_real, src_tbl[:, 3], jnp.ones_like(base_real))
        tids = jnp.arange(num_tiles, dtype=jnp.int32)
        meta_pad = pack_meta(tids, jnp.full_like(tids, align), jnp.zeros_like(tids))
        meta_tail = pack_meta(jnp.int32(num_tiles), jnp.int32(rw_cap), jnp.int32(0))[None]
        all_offsets = jnp.concatenate(
            [offsets_real, offsets_pad, total_padded.astype(jnp.int32)[None]])
        all_meta = jnp.concatenate([meta_real, meta_pad, meta_tail])
        all_gid = jnp.concatenate([order, jnp.full((num_tiles + 1,), P, jnp.int32)])
        pos = jnp.minimum(all_offsets, I - 1)

        def deltas_of(vals):
            return jnp.concatenate([vals[:1], vals[1:] - vals[:-1]])

        def seed_col(vals):
            return jnp.zeros((I,), jnp.float32).at[pos].add(
                deltas_of(vals).astype(jnp.float32), mode="drop",
                indices_are_sorted=True)

        seeds = jnp.stack([seed_col(all_offsets), seed_col(all_meta),
                           seed_col(all_gid)], axis=1)
        filled = jnp.cumsum(seeds, axis=0).astype(jnp.int32)
        offs, meta, gid = filled[:, 0], filled[:, 1], filled[:, 2]
        k = jnp.arange(I, dtype=jnp.int32) - offs
        colstep = meta & 1
        rw = (meta >> 1) & ((1 << rw_bits) - 1)
        base = meta >> (rw_bits + 1)
        tile = base + (k // rw) * gx + (k % rw) * colstep
        tile = jnp.minimum(tile, num_tiles).astype(jnp.int32)
        return tile, gid, tile_start

    exp_fn = jax.jit(expand_only)
    print(f"expand (no sort)        {timeit(exp_fn, pre):8.2f} ms", flush=True)

    # C: full binning (new ffill)
    bin_fn = jax.jit(lambda p: bin_lib.bin_gaussians(p, gx, gy, I))
    print(f"full binning            {timeit(bin_fn, pre):8.2f} ms", flush=True)

    # D: fwd kernel overhead floor — all tile counts zero
    from gsplat_tpu.ops import composite_pallas as cp
    C = 5
    R = 16
    NCH = I // cp.CHUNK
    num_tiles = gx * gy
    attr = jnp.zeros((NCH, R, cp.CHUNK), jnp.float32)
    ranges0 = jnp.zeros(((num_tiles + 7) // 8 * 8, 2), jnp.int32)
    static = (gx, num_tiles, C, R, NCH, False)
    kf0 = jax.jit(lambda a, r: cp._pallas_forward(static, a, r))
    print(f"fwd kernel all-empty    {timeit(kf0, attr, ranges0):8.2f} ms", flush=True)

    # E/F: segsum block variants
    from gsplat_tpu.ops import segment_reduce as sr
    rng = np.random.default_rng(0)
    gid = jnp.asarray(np.sort(rng.integers(0, N, I)).astype(np.int32))
    vals = jnp.asarray(rng.standard_normal((I, 11)).astype(np.float32))
    ss = jax.jit(lambda v, s: sr.segment_sum_sorted(v, s, N))
    print(f"segsum 256/256          {timeit(ss, vals, gid):8.2f} ms", flush=True)
    out_ref_small = ss(vals, gid)
    sr.BLOCK_G, sr.CHUNK = 512, 512
    ss2 = jax.jit(lambda v, s: sr.segment_sum_sorted(v, s, N))
    print(f"segsum 512/512          {timeit(ss2, vals, gid):8.2f} ms", flush=True)
    ok = bool(jnp.allclose(out_ref_small, ss2(vals, gid), atol=1e-4))
    print(f"segsum variants agree: {ok}", flush=True)
    sr.BLOCK_G, sr.CHUNK = 1024, 256
    ss3 = jax.jit(lambda v, s: sr.segment_sum_sorted(v, s, N))
    print(f"segsum 1024/256         {timeit(ss3, vals, gid):8.2f} ms", flush=True)
    sr.BLOCK_G, sr.CHUNK = 256, 256


if __name__ == "__main__":
    main()
