#!/usr/bin/env python
"""Benchmark: differentiable rasterizer forward+backward throughput at 1080p.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Baseline context (BASELINE.md): the reference fork publishes no numbers; the
upstream 3DGS paper claims >=30 fps 1080p *forward* rendering on an A6000
(~62.2 Mpix/s).  We report fwd+bwd training throughput as the headline (the
north-star metric in BASELINE.json) and use 62.2 Mpix/s as vs_baseline
denominator, plus forward-only and preprocess numbers as extras.
"""
import json
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def build_scene(n_gauss: int, width: int, height: int, seed: int = 0):
    from gsplat_tpu.core.cameras import Camera

    rng = np.random.default_rng(seed)
    fovx = math.radians(60.0)
    fovy = 2 * math.atan(math.tan(fovx / 2) * height / width)
    cam = Camera(colmap_id=0, R=np.eye(3), T=np.array([0.0, 0.0, 8.0]),
                 FoVx=fovx, FoVy=fovy,
                 image=np.zeros((3, height, width), np.float32),
                 image_name="bench", uid=0)
    K = 16
    g = dict(
        means3d=jnp.asarray(rng.standard_normal((n_gauss, 3)).astype(np.float32) * 2.5),
        scales=jnp.asarray(np.exp(rng.standard_normal((n_gauss, 3)).astype(np.float32) * 0.4 - 4.2)),
        rotations=jnp.asarray(rng.standard_normal((n_gauss, 4)).astype(np.float32)),
        opacities=jnp.asarray(rng.uniform(0.3, 0.9, n_gauss).astype(np.float32)),
        shs=jnp.asarray(rng.standard_normal((n_gauss, K, 3)).astype(np.float32) * 0.3),
    )
    return cam, g


def main():
    import os

    from gsplat_tpu.ops.rasterize import RasterizeConfig, rasterize
    from gsplat_tpu.ops import preprocess as pre_lib

    W, H = 1920, 1080
    N = int(os.environ.get("BENCH_N_GAUSS", 500_000))
    cam, g = build_scene(N, W, H)
    bg = jnp.zeros(3)
    cam_kw = dict(
        viewmatrix=jnp.asarray(cam.world_view_transform),
        projmatrix=jnp.asarray(cam.full_proj_transform),
        campos=jnp.asarray(cam.camera_center),
        tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy, bg=bg,
    )
    tgt = jnp.zeros((3, H, W))

    # Size the fixed instance capacity the way the training loop does:
    # measure the scene's instance count once, provision 1.25x headroom
    # (the overflow flag guards capacity misses; binning/gather/sort costs
    # all scale with capacity, so over-provisioning 2x is pure waste).
    @jax.jit
    def count_instances(g):
        pre = pre_lib.preprocess(
            g["means3d"], g["scales"], g["rotations"], g["opacities"],
            g["shs"], 3, cam_kw["viewmatrix"], cam_kw["projmatrix"],
            cam_kw["campos"], cam_kw["tan_fovx"], cam_kw["tan_fovy"], W, H)
        return jnp.sum(pre.tiles_touched)
    nr0 = int(count_instances(g))
    max_inst = ((int(nr0 * 1.25) + (1 << 17) - 1) >> 17) << 17
    # grad_precision="bf16" is the Trainer's default training configuration
    # (per-instance grad rows rounded to bf16 before the exact f32
    # per-gaussian sum); the benchmark measures the training path.
    # cull="exact" drops provably-invisible (gaussian, tile) instances with
    # bit-equal output (tests: test_exact_cull_*); sizing the capacity to
    # the CULLED demand is what makes it pay (Trainer does the same via its
    # shrink logic), so measure the culled count first.
    cull = os.environ.get("BENCH_CULL", "exact")
    if cull == "exact":
        from gsplat_tpu.ops import binning as bin_lib
        gx, gy = (W + 15) // 16, (H + 15) // 16

        @jax.jit
        def count_culled(g):
            pre = pre_lib.preprocess(
                g["means3d"], g["scales"], g["rotations"], g["opacities"],
                g["shs"], 3, cam_kw["viewmatrix"], cam_kw["projmatrix"],
                cam_kw["campos"], cam_kw["tan_fovx"], cam_kw["tan_fovy"],
                W, H)
            bins = bin_lib.bin_gaussians(pre, gx, gy, max_inst, align=128,
                                         cull="exact")
            padded = bins.tile_count + (-bins.tile_count) % 128
            return jnp.sum(padded)
        # the count is exact for THIS scene+camera, so size tightly (the
        # overflow flag still guards) — every capacity slot costs ~5 ns/step
        # across the gather/sorts/expansion
        need = int(count_culled(g))
        max_inst = ((int(need * 1.005) + (1 << 17) - 1) >> 17) << 17
    print(f"# instances={nr0} capacity={max_inst} cull={cull}",
          file=sys.stderr, flush=True)
    feat_prec = os.environ.get("BENCH_FEAT", "bf16")
    mxu_power = os.environ.get("BENCH_MXU_POWER", "1") == "1"
    cfg = RasterizeConfig(width=W, height=H, max_instances=max_inst,
                          backend="auto", grad_precision="bf16", cull=cull,
                          feat_precision=feat_prec, mxu_power=mxu_power)

    @jax.jit
    def fwd(g):
        out = rasterize(cfg, g["means3d"], g["scales"], g["rotations"],
                        g["opacities"], g["shs"], **cam_kw)
        return out["render"], out["num_rendered"], out["overflow"]

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
        # block_until_ready is a no-op over the axon tunnel; a tiny host
        # readback is the only reliable device sync
        return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    # measure dispatch+readback baseline to subtract
    nop = jax.jit(lambda x: x + 1)
    z = nop(jnp.zeros((8, 128))); sync(z)
    t0 = time.perf_counter()
    for _ in range(20):
        z = nop(z)
    sync(z)
    t_base = time.perf_counter() - t0

    def timed(f, *a, iters=10, groups=3):
        """Median of ``groups`` timing groups — the tunnel adds ±2-3 ms of
        jitter per sync, which a single group turns into ±0.3 Mpix/s of
        headline noise (r2 'number drift', VERDICT item 8)."""
        r = f(*a)
        sync(r)
        ts = []
        for _ in range(groups):
            t0 = time.perf_counter()
            for _ in range(iters):
                r = f(*a)
            sync(r)
            ts.append((time.perf_counter() - t0 - t_base) / iters)
        return max(float(np.median(ts)), 1e-9), r

    t0 = time.perf_counter()
    r, nrend, ovf = fwd(g)
    sync(r)
    print(f"# fwd compile {time.perf_counter() - t0:.0f}s "
          f"num_rendered={int(nrend)}", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    l, grads = fwdbwd(g)
    sync(l)
    print(f"# fwdbwd compile {time.perf_counter() - t0:.0f}s",
          file=sys.stderr, flush=True)

    t_fwd, _ = timed(lambda g: fwd(g)[0], g)
    t_fb, _ = timed(lambda g: fwdbwd(g)[0], g)

    # render-only product surface (render.py / SIBR viewer): no grad tap,
    # rgb-only feats, tight capacity — the config a deployed renderer would
    # use (upstream bar: >=30 fps 1080p forward).  cull="none" here: the
    # exact-cull machinery only pays off when the BACKWARD's
    # instance-indexed costs shrink too; forward-only it measured 18.5 vs
    # 17.8 fps (r3) — but the capacity must then cover the UNCULLED demand.
    max_inst_r = ((int(nr0 * 1.25) + (1 << 17) - 1) >> 17) << 17
    cfg_r = RasterizeConfig(width=W, height=H, max_instances=max_inst_r,
                            backend="auto", cull="none",
                            render_only=True, feat_precision=feat_prec)

    @jax.jit
    def render_only(g):
        out = rasterize(cfg_r, g["means3d"], g["scales"], g["rotations"],
                        g["opacities"], g["shs"], **cam_kw)
        return out["render"]

    try:
        t0 = time.perf_counter()
        sync(render_only(g))
        print(f"# render-only compile {time.perf_counter() - t0:.0f}s",
              file=sys.stderr, flush=True)
        t_ro, _ = timed(render_only, g)
    except TypeError:           # older RasterizeConfig without render_only
        t_ro = None             # don't mislabel the full fwd as render-only

    # preprocess-only throughput (gaussians/s)
    @jax.jit
    def prep(g):
        pre = pre_lib.preprocess(
            g["means3d"], g["scales"], g["rotations"], g["opacities"],
            g["shs"], 3, cam_kw["viewmatrix"], cam_kw["projmatrix"],
            cam_kw["campos"], cam_kw["tan_fovx"], cam_kw["tan_fovy"], W, H)
        return pre.radii
    # preprocess is ~0.4 ms — the same order as the dispatch baseline, so
    # use many iterations per sync to keep the subtraction meaningful
    t_prep, _ = timed(prep, g, iters=100)
    # dispatch-baseline subtraction can swallow the whole measurement on a
    # jittery tunnel; clamp to the kernel's own floor (~0.2 ms measured)
    # rather than reporting a nonsense rate
    t_prep = max(t_prep, 2e-4)

    mpix = W * H / 1e6
    value = mpix / t_fb
    baseline = 62.2  # A6000 30fps@1080p forward-only proxy
    print(json.dumps({
        "metric": "rasterize_fwdbwd_mpix_per_s_1080p",
        "value": round(value, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(value / baseline, 3),
        "fwd_mpix_per_s": round(mpix / t_fwd, 2),
        f"render_fps_{H}p": (round(1.0 / t_ro, 1)
                             if t_ro is not None else None),
        "preprocess_mgauss_per_s": round(N / t_prep / 1e6, 1),
        "num_rendered": int(nrend),
        "overflow": bool(ovf),
        "n_gaussians": N,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
