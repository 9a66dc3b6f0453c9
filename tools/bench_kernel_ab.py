#!/usr/bin/env python
"""Tight A/B timing of the composite fwd/bwd kernels on REAL bench-scene
inputs, median-of-groups to beat tunnel jitter.  Env toggles in
composite_pallas can be flipped between runs; compile ~30 s each."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from bench import build_scene
from gsplat_tpu.ops.rasterize import RasterizeConfig
from gsplat_tpu.ops import preprocess as pre_lib
from gsplat_tpu.ops import binning as bin_lib
from gsplat_tpu.ops import composite_pallas as cp
from gsplat_tpu.ops.segment_reduce import gather_rows

def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

def median_ms(f, *a, iters=10, groups=5):
    r = f(*a); sync(r)
    ts = []
    for _ in range(groups):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = f(*a)
        sync(r)
        ts.append((time.perf_counter() - t0) / iters)
    return np.median(ts) * 1e3

W, H = 1920, 1080
N = 500_000
cam, g = build_scene(N, W, H)
MI = 2097152
cfg = RasterizeConfig(width=W, height=H, max_instances=MI, backend="pallas",
                      cull="exact")
pre = jax.jit(lambda m, s, r, o, sh: pre_lib.preprocess(
    m, s, r, o, sh, 3, jnp.asarray(cam.world_view_transform),
    jnp.asarray(cam.full_proj_transform), jnp.asarray(cam.camera_center),
    jnp.float32(cam.tan_fovx), jnp.float32(cam.tan_fovy), W, H))(
    g["means3d"], g["scales"], g["rotations"], g["opacities"], g["shs"])
bins = jax.jit(lambda p: bin_lib.bin_gaussians(
    p, cfg.grid_x, cfg.grid_y, MI, align=128, cull="exact"))(pre)

feats = jnp.concatenate(
    [pre.rgb, pre.depths[:, None], jnp.ones_like(pre.depths[:, None])],
    axis=1)
C = feats.shape[1]
R = ((cp.ATTR_BASE + C + 7) // 8) * 8
table = jnp.concatenate(
    [pre.means2d, pre.conic, pre.opacity[:, None], feats], axis=1)
table = jnp.pad(table, ((0, 1), (0, R - table.shape[1])))
gid = jnp.minimum(bins.gauss_id, N)
attr = jax.jit(lambda t, i: gather_rows(t, i).reshape(
    MI // cp.CHUNK, cp.CHUNK, R).swapaxes(1, 2))(table, gid)
ranges = jnp.stack([bins.tile_start // cp.CHUNK, bins.tile_count,
                    jnp.broadcast_to((bins.tile_start[-1] +
                                      bins.tile_count[-1] + 127) // 128,
                                     bins.tile_start.shape).astype(jnp.int32),
                    jnp.zeros_like(bins.tile_start)], axis=1)
pad_rows = (-ranges.shape[0]) % 8
if pad_rows:
    ranges = jnp.pad(ranges, ((0, pad_rows), (0, 0)))

num_tiles = cfg.grid_x * cfg.grid_y
NCH = MI // cp.CHUNK
import os as _os
MXU_POWER = _os.environ.get("AB_MXU_POWER", "0") == "1"
static = (cfg.grid_x, num_tiles, C, R, NCH, False, MXU_POWER,
          (False, C - 1, True))

fwd = jax.jit(lambda a, r: cp._pallas_forward(static, a, r))
packed = fwd(attr, ranges)
rng = np.random.default_rng(0)
dpk = jnp.asarray(rng.standard_normal(packed.shape).astype(np.float32) * .01)

def bwd_f(a, r, d):
    _, vjp = jax.vjp(partial(cp._composite_core, static), a,
                     jax.lax.stop_gradient(r))
    return vjp(d)[0]
bwd = jax.jit(bwd_f)
_ = bwd(attr, ranges, dpk)

print(f"fwd kernel: {median_ms(fwd, attr, ranges):7.2f} ms")
print(f"bwd kernel (+scrub): {median_ms(bwd, attr, ranges, dpk):7.2f} ms")
