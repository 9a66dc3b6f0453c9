#!/usr/bin/env python
"""Dump the composite kernels' inputs (attr table, ranges, packed fwd out,
d_packed) for the 1080p/500k bench scene to /tmp/kinputs/*.npy so kernel
variants can be A/B-benched without recompiling the whole pipeline."""
import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from bench import build_scene
    from gsplat_tpu.ops.rasterize import RasterizeConfig
    from gsplat_tpu.ops import preprocess as pre_lib
    from gsplat_tpu.ops import binning as bin_lib
    from gsplat_tpu.ops import composite_pallas as cp
    from gsplat_tpu.ops.segment_reduce import gather_rows

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
    bins = jax.jit(lambda p: bin_lib.bin_gaussians(
        p, cfg.grid_x, cfg.grid_y, cfg.max_instances))(pre)

    feats = jnp.concatenate(
        [pre.rgb, pre.depths[:, None], jnp.ones_like(pre.depths[:, None])],
        axis=1)
    C = feats.shape[1]
    R = ((cp.ATTR_BASE + C + 7) // 8) * 8

    def build_attr(p, f, b):
        table = jnp.concatenate(
            [p.means2d, p.conic, p.opacity[:, None], f], axis=1)
        table = jnp.pad(table, ((0, 1), (0, R - table.shape[1])))
        gid = jnp.minimum(b.gauss_id, N)
        attr = gather_rows(table, gid, False)
        NCH = cfg.max_instances // cp.CHUNK
        return attr.reshape(NCH, cp.CHUNK, R).swapaxes(1, 2)

    attr = jax.jit(build_attr)(pre, feats, bins)
    ranges = jnp.stack([bins.tile_start // cp.CHUNK, bins.tile_count], axis=1)
    pad_rows = (-ranges.shape[0]) % 8
    if pad_rows:
        ranges = jnp.pad(ranges, ((0, pad_rows), (0, 0)))

    num_tiles = cfg.grid_x * cfg.grid_y
    NCH = cfg.max_instances // cp.CHUNK
    static = (cfg.grid_x, num_tiles, C, R, NCH, False)
    packed = jax.jit(lambda a, r: cp._pallas_forward(static, a, r))(attr, ranges)

    os.makedirs("/tmp/kinputs", exist_ok=True)
    rng = np.random.default_rng(0)
    np.save("/tmp/kinputs/attr.npy", np.asarray(attr))
    np.save("/tmp/kinputs/ranges.npy", np.asarray(ranges))
    np.save("/tmp/kinputs/packed.npy", np.asarray(packed))
    dpk = rng.standard_normal(packed.shape).astype(np.float32) * 0.01
    np.save("/tmp/kinputs/dpk.npy", dpk)
    np.save("/tmp/kinputs/gid.npy", np.asarray(bins.gauss_id))
    meta = dict(grid_x=cfg.grid_x, num_tiles=num_tiles, C=C, R=R, NCH=NCH,
                W=W, H=H, N=N)
    np.save("/tmp/kinputs/meta.npy", meta, allow_pickle=True)
    print("dumped", {k: v for k, v in meta.items()})


if __name__ == "__main__":
    main()
