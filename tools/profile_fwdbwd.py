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
    cfg = RasterizeConfig(width=W, height=H, max_instances=2490368,
                          backend="pallas", grad_precision="bf16")

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
