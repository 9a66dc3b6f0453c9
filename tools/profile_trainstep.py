#!/usr/bin/env python
"""Time the FULL jit train step (raster fwd+bwd + losses + Adam + densify
stats) at 1080p/500k on the real chip, and break out the non-raster parts
from a device trace."""
import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from bench import build_scene
    from gsplat_tpu.config import OptimizationParams
    from gsplat_tpu.models.gaussians import GaussianModel
    from gsplat_tpu.ops.rasterize import RasterizeConfig
    from gsplat_tpu.train import trainer as tr_lib

    W, H = 1920, 1080
    N = 500_000
    cam, g = build_scene(N, W, H)

    from gsplat_tpu.models.gaussians import GaussianParams, empty_aux
    from gsplat_tpu.models import adam
    from gsplat_tpu.train.schedules import make_lr_fn

    op = np.asarray(g["opacities"])
    params = GaussianParams(
        xyz=g["means3d"],
        features_dc=g["shs"][:, :1],
        features_rest=g["shs"][:, 1:],
        scaling=jnp.log(g["scales"]),
        rotation=g["rotations"],
        opacity=jnp.asarray(np.log(op / (1 - op)))[:, None],
        segment=jnp.zeros((N, 0), jnp.float32),
    )
    aux = empty_aux(N)._replace(alive=jnp.ones((N,), bool))
    opt_state = adam.init(params)
    opt = OptimizationParams()
    cfg = RasterizeConfig(width=W, height=H, max_instances=2097152,
                          backend="pallas", grad_precision="bf16",
                          cull="exact")
    bg = jnp.zeros(3)
    step = tr_lib.make_train_step(cfg, opt, 3, None, False, bg)
    batch = tr_lib.camera_batch(cam)
    key = jax.random.PRNGKey(0)
    lr_fn = make_lr_fn(opt, 1.0)
    lrs = {k: jnp.float32(v) for k, v in lr_fn(1000).items()}

    def sync(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    t0 = time.time()
    params, opt_state, aux, metrics = step(params, opt_state, aux, batch, lrs, key)
    sync(metrics["loss"])
    print(f"compile {time.time()-t0:.0f}s", flush=True)

    nop = jax.jit(lambda x: x + 1)
    z = nop(jnp.zeros((8, 128))); sync(z)
    t0 = time.perf_counter()
    for _ in range(20):
        z = nop(z)
    sync(z)
    t_base = time.perf_counter() - t0

    t0 = time.perf_counter()
    nit = 10
    for i in range(nit):
        params, opt_state, aux, metrics = step(params, opt_state, aux, batch, lrs, key)
    sync(metrics["loss"])
    dt = (time.perf_counter() - t0 - t_base) / nit * 1000
    print(f"train step {dt:.1f} ms  ({W*H/1e6/(dt/1e3):.2f} Mpix/s)", flush=True)

    logdir = "/tmp/jaxtrace2"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for i in range(3):
            params, opt_state, aux, metrics = step(params, opt_state, aux, batch, lrs, key)
        sync(metrics["loss"])

    tj = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not tj:
        print("no trace json"); return
    with gzip.open(tj[0]) as f:
        trc = json.load(f)
    ev = trc["traceEvents"]
    tids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dur = collections.Counter()
    cnt = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and tids.get((e["pid"], e["tid"])) == "XLA Ops":
            dur[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    tot = sum(dur.values())
    print(f"XLA Ops total {tot/3e3:.1f} ms/iter")
    for name, d in dur.most_common(30):
        print(f"{d/3e3:9.2f} ms  x{cnt[name]//3:4d}  {name[:100]}")


if __name__ == "__main__":
    main()
