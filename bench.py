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
    from gsplat_tpu.ops import binning as bin_lib
    gx = (W + pre_lib.TILE_X - 1) // pre_lib.TILE_X
    gy = (H + pre_lib.TILE_Y - 1) // pre_lib.TILE_Y

    def padded_demand(cull_mode):
        """Exact post-binning instance demand (pad-inline 128-aligned
        segments) for this scene+camera — the raw tiles_touched sum
        undercounts by the per-tile alignment pad, so tight capacities
        must be sized from THIS number (overflow flag still guards)."""
        @jax.jit
        def count(g):
            pre = pre_lib.preprocess(
                g["means3d"], g["scales"], g["rotations"], g["opacities"],
                g["shs"], 3, cam_kw["viewmatrix"], cam_kw["projmatrix"],
                cam_kw["campos"], cam_kw["tan_fovx"], cam_kw["tan_fovy"],
                W, H)
            bins = bin_lib.bin_gaussians(pre, gx, gy, max_inst, align=128,
                                         cull=cull_mode)
            padded = bins.tile_count + (-bins.tile_count) % 128
            return jnp.sum(padded)
        return int(count(g))

    @jax.jit
    def count_rows(g):
        pre = pre_lib.preprocess(
            g["means3d"], g["scales"], g["rotations"], g["opacities"],
            g["shs"], 3, cam_kw["viewmatrix"], cam_kw["projmatrix"],
            cam_kw["campos"], cam_kw["tan_fovx"], cam_kw["tan_fovy"],
            W, H)
        rh = jnp.maximum(pre.rect_max[:, 1] - pre.rect_min[:, 1], 1)
        return jnp.sum(jnp.where(pre.visible, rh, 0))

    # the exact-cull row stage has its own capacity (default
    # max_instances//2, binning.py) — rows scale with TILE_Y only, so at
    # wide tiles instance demand shrinks while rows don't; size it
    # explicitly or the row clip truncates the workload (this is exactly
    # what invalidated the first 32x16 A/B leg: rows 758k > 720k default,
    # overflow=true, ~5%% of instances silently dropped)
    max_rows = ((int(int(count_rows(g)) * 1.02) + 4095) >> 12) << 12
    if cull == "exact":
        # the count is exact for THIS scene+camera, so size tightly —
        # every capacity slot costs ~5 ns/step across the
        # gather/sorts/expansion
        need = padded_demand("exact")
        max_inst = ((int(need * 1.005) + (1 << 17) - 1) >> 17) << 17
    print(f"# instances={nr0} capacity={max_inst} rows={max_rows} "
          f"cull={cull}", file=sys.stderr, flush=True)
    feat_prec = os.environ.get("BENCH_FEAT", "bf16")
    mxu_power = os.environ.get("BENCH_MXU_POWER", "1") == "1"
    cfg = RasterizeConfig(width=W, height=H, max_instances=max_inst,
                          backend="auto", grad_precision="bf16", cull=cull,
                          max_rows=max_rows,
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

    spreads = {}

    def timed(f, *a, iters=10, groups=7, label=None):
        """Median of ``groups`` timing groups — the tunnel adds ±2-3 ms of
        jitter per sync, which a single group turns into ±0.3 Mpix/s of
        headline noise (r2 'number drift', VERDICT item 8).  With ``label``
        the per-group p10/p50/p90 times are recorded so the emitted rates
        carry error bars (VERDICT r4 item 4: point estimates made a -3%
        round-over-round move indistinguishable from noise)."""
        r = f(*a)
        sync(r)
        ts = []
        for _ in range(groups):
            t0 = time.perf_counter()
            for _ in range(iters):
                r = f(*a)
            sync(r)
            ts.append((time.perf_counter() - t0 - t_base) / iters)
        ts = np.maximum(np.asarray(ts), 1e-9)
        if label:
            spreads[label] = {
                "t_p10": float(np.percentile(ts, 10)),
                "t_p50": float(np.median(ts)),
                "t_p90": float(np.percentile(ts, 90)),
                "groups": groups,
            }
        return float(np.median(ts)), r

    def rate_spread(label, scale):
        """[p10, p50, p90] of a rate = scale / t (p90 of t -> p10 of rate)."""
        s = spreads.get(label)
        if not s:
            return None
        return [round(scale / s["t_p90"], 2), round(scale / s["t_p50"], 2),
                round(scale / s["t_p10"], 2)]

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

    t_fwd, _ = timed(lambda g: fwd(g)[0], g, label="fwd")
    t_fb, _ = timed(lambda g: fwdbwd(g)[0], g, label="fwdbwd")

    # render-only product surface (render.py / SIBR viewer): no grad tap,
    # rgb-only feats, tight capacity — the config a deployed renderer would
    # use (upstream bar: >=30 fps 1080p forward).  cull="none" here: the
    # exact-cull machinery only pays off when the BACKWARD's
    # instance-indexed costs shrink too (A/B in tools/bench_render_caps.py:
    # exact+tight 20.0 fps vs none 20.4-22 fps) — but the capacity must
    # then cover the UNCULLED PADDED demand (raw tiles_touched undercounts
    # the per-tile alignment pad and silently drops instances).
    max_inst_r = ((int(padded_demand("none") * 1.005)
                   + (1 << 17) - 1) >> 17) << 17
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
        t_ro, _ = timed(render_only, g, label="render")
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
    # preprocess is ~0.3 ms — the same order as the dispatch baseline, so
    # use many iterations per sync to keep the subtraction a small
    # correction instead of the whole measurement.  NOTE (VERDICT r4 item
    # 4): the r3 "2500.0 Mgauss/s" was EXACTLY the old 2e-4 s safety clamp
    # (500000/2e-4/1e6) — the baseline subtraction had pushed the group
    # time to/below the clamp and the report was the floor, not a
    # measurement; the r3->r4 "-37% preprocess regression" was this
    # artifact, not a code change (num_rendered byte-identical).  300
    # iters/group makes the per-iter time ~100x the subtraction noise; the
    # clamp stays only as a divide-by-zero guard far below real times.
    t_prep, _ = timed(prep, g, iters=300, label="preprocess")
    t_prep = max(t_prep, 1e-5)

    # Trained-scene extras (VERDICT r2 item 3): the A6000 30 fps baseline is
    # a real-scene number, and trained anisotropic scenes have very different
    # instance statistics from the 500k-random stress scene above (fewer,
    # larger, exact-cullable splats).  If the committed trained-PLY asset is
    # present (assets/trained_scene.ply — a full quality-protocol training
    # run, reproduce via tools/run_quality_eval.py), measure the same 1080p
    # metrics on it and report them as extras; the stress-scene number stays
    # the headline.
    trained = {}
    assets_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "assets")
    # the hard (densification-at-scale, >=200k gaussian, ~3.4M instance)
    # asset is the primary trained_* workload; the 7k quality-run asset
    # (57.6k gaussians, ~1M instances — the regime of a typical trained
    # capture at this view) is reported as trained_small_* context.  The
    # prefix is decided INSIDE the loop (ADVICE r4): if the big-asset bench
    # raised, the small asset takes the primary trained_* keys instead of
    # mislabeling itself trained_small_ with no trained_ present.
    for ply_name in ("trained_scene_big.npz", "trained_scene_big.ply",
                     "trained_scene.ply"):
        ply = os.path.join(assets_dir, ply_name)
        if os.path.exists(ply):
            prefix = "trained_small_" if trained else "trained_"
            try:
                r = bench_trained_ply(ply, W, H, tgt, timed, sync,
                                      label=prefix.rstrip("_"))
                r = {k.replace("trained_", prefix, 1): v
                     for k, v in r.items()}
                r[prefix + "asset"] = ply_name
                trained.update(r)
            except Exception as e:  # asset bench must never sink the headline
                print(f"# trained-scene bench failed: {e!r}", file=sys.stderr,
                      flush=True)

    mpix = W * H / 1e6
    value = mpix / t_fb
    for lbl in [l for l in spreads if l.startswith("trained")]:
        trained[lbl + "_p10_p50_p90"] = rate_spread(
            lbl, mpix if lbl.endswith("fwdbwd") else 1.0)
    baseline = 62.2  # A6000 30fps@1080p forward-only proxy
    print(json.dumps({
        "metric": "rasterize_fwdbwd_mpix_per_s_1080p",
        "value": round(value, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(value / baseline, 3),
        # [p10, p50, p90] over the timing groups — a round-over-round move
        # inside these bands is tunnel noise, not a regression
        "value_p10_p50_p90": rate_spread("fwdbwd", mpix),
        "fwd_mpix_per_s": round(mpix / t_fwd, 2),
        "fwd_p10_p50_p90": rate_spread("fwd", mpix),
        f"render_fps_{H}p": (round(1.0 / t_ro, 1)
                             if t_ro is not None else None),
        "render_fps_p10_p50_p90": rate_spread("render", 1.0),
        "preprocess_mgauss_per_s": round(N / t_prep / 1e6, 1),
        "preprocess_p10_p50_p90": rate_spread("preprocess", N / 1e6),
        "num_rendered": int(nrend),
        "overflow": bool(ovf),
        "n_gaussians": N,
        "backend": jax.default_backend(),
        **trained,
    }))


def bench_trained_ply(ply, W, H, tgt, timed, sync, label="trained"):
    """1080p fwd+bwd / render-only on a trained (quality-protocol) scene.

    Same canonical camera as tools/bench_trained_scene.py (the quality
    scene sits near the origin) with ALL intrinsics (incl. tan_fov) from
    that 62-degree camera.  cull="exact" + tight capacity is the Trainer's
    own deployed configuration for trained scenes; the model capacity is
    sized to the asset (a 1<<20 fixed capacity made preprocess/binning
    iterate ~18x dead padding for the 57.7k asset — r3 advisor finding).
    """
    import math
    import time

    from gsplat_tpu.core import transforms as T
    from gsplat_tpu.core.cameras import Camera
    from gsplat_tpu.models.gaussians import GaussianModel
    from gsplat_tpu.ops import binning as bin_lib
    from gsplat_tpu.ops import preprocess as pre_lib
    from gsplat_tpu.ops.rasterize import RasterizeConfig, rasterize

    if ply.endswith(".npz"):
        # compressed asset (ADVICE r4: a 67 MB PLY per round permanently
        # bloats every clone): raw param fields, geometry f32 exact,
        # SH feature bands fp16 (visually negligible, zero effect on the
        # instance statistics the bench exercises)
        z = np.load(ply)
        n_alive = int(z["xyz"].shape[0])
        g = dict(
            means3d=jnp.asarray(z["xyz"].astype(np.float32)),
            scales=T.scaling_activation(
                jnp.asarray(z["scaling"].astype(np.float32))),
            rotations=jnp.asarray(z["rotation"].astype(np.float32)),
            opacities=T.opacity_activation(
                jnp.asarray(z["opacity"].astype(np.float32))[:, 0]),
            shs=jnp.concatenate(
                [jnp.asarray(z["features_dc"].astype(np.float32)),
                 jnp.asarray(z["features_rest"].astype(np.float32))],
                axis=1),
        )
    else:
        # size the model to the PLY: load_ply grows capacity to the next
        # power of two above the vertex count (gaussians.py:187-189)
        m = GaussianModel(3, num_class=2, capacity=1)
        m.load_ply(ply)
        n_alive = int(m.num_alive)
        p = m.params
        g = dict(
            means3d=p.xyz,
            scales=T.scaling_activation(p.scaling),
            rotations=p.rotation,
            opacities=T.opacity_activation(p.opacity[:, 0]),
            shs=jnp.concatenate([p.features_dc, p.features_rest], axis=1),
        )
    fovx = math.radians(62.0)
    fovy = 2 * math.atan(math.tan(fovx / 2) * H / W)
    cam = Camera(colmap_id=0, R=np.eye(3), T=np.array([0.0, 0.6, 4.2]),
                 FoVx=fovx, FoVy=fovy,
                 image=np.zeros((3, H, W), np.float32), image_name="t",
                 uid=0)
    ckw = dict(viewmatrix=jnp.asarray(cam.world_view_transform),
               projmatrix=jnp.asarray(cam.full_proj_transform),
               campos=jnp.asarray(cam.camera_center),
               tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
               bg=jnp.zeros(3))
    gx = (W + pre_lib.TILE_X - 1) // pre_lib.TILE_X
    gy = (H + pre_lib.TILE_Y - 1) // pre_lib.TILE_Y

    @jax.jit
    def count(g):
        pre = pre_lib.preprocess(
            g["means3d"], g["scales"], g["rotations"], g["opacities"],
            g["shs"], 3, ckw["viewmatrix"], ckw["projmatrix"],
            ckw["campos"], ckw["tan_fovx"], ckw["tan_fovy"], W, H)
        bins = bin_lib.bin_gaussians(pre, gx, gy, 8 << 20, align=128,
                                     cull="exact")
        padded = bins.tile_count + (-bins.tile_count) % 128
        rh = jnp.maximum(pre.rect_max[:, 1] - pre.rect_min[:, 1], 1)
        rows = jnp.sum(jnp.where(pre.visible, rh, 0))
        return jnp.sum(padded), rows, bins.overflow

    need, rows, probe_ovf = count(g)
    need = int(need)
    max_rows = ((int(int(rows) * 1.02) + 4095) >> 12) << 12
    assert not bool(probe_ovf), "capacity probe overflowed — raise probe cap"
    cap = max(1 << 17, ((int(need * 1.01) + (1 << 16) - 1) >> 16) << 16)
    cfg = RasterizeConfig(width=W, height=H, max_instances=cap,
                          backend="auto", grad_precision="bf16",
                          cull="exact", max_rows=max_rows,
                          feat_precision="bf16",
                          mxu_power=True)

    @jax.jit
    def fwdbwd(g):
        def loss(g):
            out = rasterize(cfg, g["means3d"], g["scales"], g["rotations"],
                            g["opacities"], g["shs"], **ckw)
            return (jnp.mean(jnp.abs(out["render"] - tgt))
                    + 0.1 * jnp.mean(out["depth"]))
        return jax.value_and_grad(loss)(g)[0]

    cfg_r = RasterizeConfig(width=W, height=H, max_instances=cap,
                            backend="auto", cull="exact", render_only=True,
                            max_rows=max_rows, feat_precision="bf16")

    @jax.jit
    def render_only(g):
        return rasterize(cfg_r, g["means3d"], g["scales"], g["rotations"],
                         g["opacities"], g["shs"], **ckw)["render"]

    @jax.jit
    def fwd_flag(g):
        out = rasterize(cfg, g["means3d"], g["scales"], g["rotations"],
                        g["opacities"], g["shs"], **ckw)
        return out["overflow"]

    t0 = time.perf_counter()
    sync(fwdbwd(g)); sync(render_only(g))
    ovf = bool(fwd_flag(g))
    print(f"# trained-scene compile {time.perf_counter() - t0:.0f}s "
          f"instances={need} rows={max_rows} overflow={ovf}",
          file=sys.stderr, flush=True)
    t_fb, _ = timed(fwdbwd, g, label=f"{label}_fwdbwd")
    t_ro, _ = timed(render_only, g, label=f"{label}_render")
    mpix = W * H / 1e6
    return {
        "trained_fwdbwd_mpix_per_s": round(mpix / t_fb, 2),
        f"trained_render_fps_{H}p": round(1.0 / t_ro, 1),
        "trained_n_gaussians": n_alive,
        "trained_instances": need,
        "trained_overflow": ovf,
    }


if __name__ == "__main__":
    main()
