#!/usr/bin/env python
"""Capture a jax.profiler device trace of the bench fwd+bwd and print the
top HLO ops by self time (parsed from the xplane proto)."""
import glob
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from bench import build_scene
    from gsplat_tpu.ops.rasterize import RasterizeConfig, rasterize

    W, H = 1920, 1080
    N = 500_000
    cam, g = build_scene(N, W, H)
    bg = jnp.zeros(3)
    cam_kw = dict(
        viewmatrix=jnp.asarray(cam.world_view_transform),
        projmatrix=jnp.asarray(cam.full_proj_transform),
        campos=jnp.asarray(cam.camera_center),
        tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy, bg=bg,
    )
    tgt = jnp.zeros((3, H, W))
    # mirror bench.py's current defaults: exact cull + tight culled capacity
    from gsplat_tpu.ops import binning as bin_lib
    from gsplat_tpu.ops import preprocess as pre_lib
    gx, gy = (W + 15) // 16, (H + 15) // 16

    @jax.jit
    def count_culled(g):
        pre = pre_lib.preprocess(
            g["means3d"], g["scales"], g["rotations"], g["opacities"],
            g["shs"], 3, cam_kw["viewmatrix"], cam_kw["projmatrix"],
            cam_kw["campos"], cam_kw["tan_fovx"], cam_kw["tan_fovy"], W, H)
        bins = bin_lib.bin_gaussians(pre, gx, gy, 4 << 20, align=128,
                                     cull="exact")
        padded = bins.tile_count + (-bins.tile_count) % 128
        return jnp.sum(padded)

    need = int(count_culled(g))
    max_inst = ((int(need * 1.005) + (1 << 17) - 1) >> 17) << 17
    print("capacity", max_inst, flush=True)
    cfg = RasterizeConfig(width=W, height=H, max_instances=max_inst,
                          backend="pallas", grad_precision="bf16",
                          cull="exact")

    @jax.jit
    def fwdbwd(g):
        def loss(g):
            out = rasterize(cfg, g["means3d"], g["scales"], g["rotations"],
                            g["opacities"], g["shs"], **cam_kw)
            return (jnp.mean(jnp.abs(out["render"] - tgt))
                    + 0.1 * jnp.mean(out["depth"]))
        l, grads = jax.value_and_grad(loss)(g)
        return l, grads

    def sync(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    r = fwdbwd(g)
    sync(r)
    r = fwdbwd(g)
    sync(r)

    logdir = "/tmp/jaxtrace"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for _ in range(3):
            r = fwdbwd(g)
        sync(r)

    pbs = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("xplanes:", pbs, flush=True)
    if not pbs:
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data(pbs, "framework_op_stats", {})
    out = "/tmp/jaxtrace/opstats.csv"
    mode = "wb" if isinstance(data, bytes) else "w"
    with open(out, mode) as f:
        f.write(data)
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
