#!/usr/bin/env python
"""Measure the exact-cull win and throughput on a TRAINED scene.

docs/PERF_NOTES.md predicts 25-40% exact-cull fraction on trained
anisotropic scenes (vs 17% on the random isotropic bench scene).  This
loads a trained PLY (e.g. the quality-protocol run), renders from one of
its training cameras, and times fwd+bwd with cull none/exact at matched
(tight) capacities.

Usage: python tools/bench_trained_scene.py --ply <point_cloud.ply>
           [--width 640 --height 480] [--scene /tmp/qscene]
"""
import argparse
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def _sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timed(f, *a, iters=10, t_base=0.0):
    r = f(*a)
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*a)
    _sync(r)
    return max((time.perf_counter() - t0 - t_base) / iters, 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ply", required=True)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from gsplat_tpu.core import transforms as T
    from gsplat_tpu.core.cameras import Camera
    from gsplat_tpu.models.gaussians import GaussianModel
    from gsplat_tpu.ops import binning as bin_lib
    from gsplat_tpu.ops import preprocess as pre_lib
    from gsplat_tpu.ops.rasterize import RasterizeConfig, rasterize

    m = GaussianModel(3, num_class=2, capacity=1 << 20)
    m.load_ply(args.ply)
    print(f"# loaded {m.num_alive} gaussians from {args.ply}")
    p = m.params
    g = dict(
        means3d=p.xyz,
        scales=T.scaling_activation(p.scaling),
        rotations=p.rotation,
        opacities=T.opacity_activation(p.opacity[:, 0]),
        shs=jnp.concatenate([p.features_dc, p.features_rest], axis=1),
    )
    W, H = args.width, args.height
    fovx = math.radians(62.0)
    fovy = 2 * math.atan(math.tan(fovx / 2) * H / W)
    cam = Camera(colmap_id=0, R=np.eye(3), T=np.array([0.0, 0.6, 4.2]),
                 FoVx=fovx, FoVy=fovy,
                 image=np.zeros((3, H, W), np.float32), image_name="b",
                 uid=0)
    cam_kw = dict(
        viewmatrix=jnp.asarray(cam.world_view_transform),
        projmatrix=jnp.asarray(cam.full_proj_transform),
        campos=jnp.asarray(cam.camera_center),
        tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy, bg=jnp.zeros(3))
    tgt = jnp.zeros((3, H, W))
    gx, gy = (W + 15) // 16, (H + 15) // 16

    def measure(cull):
        @jax.jit
        def count(g):
            pre = pre_lib.preprocess(
                g["means3d"], g["scales"], g["rotations"], g["opacities"],
                g["shs"], 3, cam_kw["viewmatrix"], cam_kw["projmatrix"],
                cam_kw["campos"], cam_kw["tan_fovx"], cam_kw["tan_fovy"],
                W, H)
            bins = bin_lib.bin_gaussians(pre, gx, gy, 4 << 20, align=128,
                                         cull=cull)
            padded = bins.tile_count + (-bins.tile_count) % 128
            return jnp.sum(padded)

        need = int(count(g))
        cap = max(1 << 17, ((int(need * 1.01) + (1 << 16) - 1)
                            >> 16) << 16)
        cap = (cap + 127) // 128 * 128
        cfg = RasterizeConfig(width=W, height=H, max_instances=cap,
                              backend="auto", grad_precision="bf16",
                              cull=cull, feat_precision="bf16")

        @jax.jit
        def fwdbwd(g):
            def loss(g):
                out = rasterize(cfg, g["means3d"], g["scales"],
                                g["rotations"], g["opacities"], g["shs"],
                                **cam_kw)
                return (jnp.mean(jnp.abs(out["render"] - tgt))
                        + 0.1 * jnp.mean(out["depth"]))
            l, grads = jax.value_and_grad(loss)(g)
            return l

        t = timed(fwdbwd, g, iters=args.iters)

        cfg_r = RasterizeConfig(width=W, height=H, max_instances=cap,
                                backend="auto", cull=cull, render_only=True,
                                feat_precision="bf16")

        @jax.jit
        def render_only(g):
            return rasterize(cfg_r, g["means3d"], g["scales"],
                             g["rotations"], g["opacities"], g["shs"],
                             **cam_kw)["render"]

        t_r = timed(render_only, g, iters=args.iters)
        return need, cap, t, t_r

    n0, c0, t0, r0 = measure("none")
    n1, c1, t1, r1 = measure("exact")
    mpix = W * H / 1e6
    print(f"cull=none : instances={n0} capacity={c0} "
          f"fwd+bwd {t0*1e3:.1f} ms ({mpix/t0:.1f} Mpix/s) "
          f"render {1/r0:.1f} fps")
    print(f"cull=exact: instances={n1} capacity={c1} "
          f"fwd+bwd {t1*1e3:.1f} ms ({mpix/t1:.1f} Mpix/s) "
          f"render {1/r1:.1f} fps")
    print(f"cull fraction: {100*(1 - n1/max(n0,1)):.1f}%  "
          f"speedup {t0/t1:.2f}x")


if __name__ == "__main__":
    main()
