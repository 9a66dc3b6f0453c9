#!/usr/bin/env python
"""Tile-size A/B analysis (VERDICT r3 item 5).

The 16x16 tile is a CUDA inheritance (reference config.h:15-18).  This tool
measures, for candidate tile shapes, the exact instance statistics of the
bench scenes (opacity-aware rects + the ideal ellipse-vs-tile exact cull,
both reimplemented in numpy from preprocess.py:195-219 / binning.py's cull
semantics) and combines them with the measured per-stage costs of
BENCH/PERF_NOTES r3 into a projected step time:

    t(T) ~ const + k_mach * I_pad(T) + k_kernel * I_pad(T) * TILE_PIX(T)/256

where k_mach covers the per-instance machinery (gather, tile sort,
grad-reduce sort + segsum, expansion) and k_kernel the per-(instance,pixel)
composite work ([CHUNK, TILE_PIX] VPU ops per 128-instance chunk).

Runs on CPU — the counts are pure geometry; no kernels involved.
"""
from __future__ import annotations

import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHUNK = 128

# measured per-HLO costs at 16x16, 1080p/500k stress scene, cull=exact
# (docs/PERF_NOTES.md r3 trace at 99.97 ms/step; I_pad = 2.097M)
MEAS = {
    "kernel_ms": 24.3 + 15.4,          # bwd + fwd composite kernels
    "mach_ms": 12.9 + 4.0 + 6.9 + 4.7 + 10.1,  # gather+sort+reduce+expand
    "const_ms": 3.3 + 4.6 + 2.2 + 11.6,        # table, corners, transposes
    "I_pad_16": 2.097e6,
}


def preprocess_np(g, cam_kw, W, H):
    """Numpy re-derivation of the rect inputs (preprocess.py:150-219)."""
    import jax.numpy as jnp
    from gsplat_tpu.ops import preprocess as pre_lib

    pre = pre_lib.preprocess(
        g["means3d"], g["scales"], g["rotations"], g["opacities"],
        g["shs"], 3, cam_kw["viewmatrix"], cam_kw["projmatrix"],
        cam_kw["campos"], cam_kw["tan_fovx"], cam_kw["tan_fovy"], W, H)
    cov2d_xx = np.asarray(pre.conic)  # need cov2d, recompute from conic
    # conic = inv(cov2d): invert back (det of conic)
    A, B, C = (cov2d_xx[:, i] for i in range(3))
    det_c = A * C - B * B
    det_c = np.where(det_c == 0, 1.0, det_c)
    sxx = C / det_c
    syy = A / det_c
    return {
        "mean2d": np.asarray(pre.means2d),
        "conic": np.asarray(pre.conic),
        "radius": np.asarray(pre.radii).astype(np.float64),
        "op": np.asarray(pre.opacity),
        "visible": np.asarray(pre.visible),
        "sxx": sxx, "syy": syy,
    }


def rect_bounds(p, TX, TY, W, H):
    gx = (W + TX - 1) // TX
    gy = (H + TY - 1) // TY
    ln_op = np.log(np.maximum(255.0 * p["op"], 1.0))
    ext_x = np.minimum(p["radius"], np.sqrt(2.0 * p["sxx"] * (ln_op + 1e-3)) + 1.0)
    ext_y = np.minimum(p["radius"], np.sqrt(2.0 * p["syy"] * (ln_op + 1e-3)) + 1.0)
    mx, my = p["mean2d"][:, 0], p["mean2d"][:, 1]
    x0 = np.clip(((mx - ext_x) / TX).astype(np.int64), 0, gx)
    y0 = np.clip(((my - ext_y) / TY).astype(np.int64), 0, gy)
    x1 = np.clip(((mx + ext_x + TX - 1) / TX).astype(np.int64), 0, gx)
    y1 = np.clip(((my + ext_y + TY - 1) / TY).astype(np.int64), 0, gy)
    ok = p["visible"] & (x1 > x0) & (y1 > y0)
    return x0, y0, x1, y1, ok, gx, gy


def expand_pairs(x0, y0, x1, y1, ok):
    """(gaussian, tile) candidate pairs from rects."""
    nt = np.where(ok, (x1 - x0) * (y1 - y0), 0)
    idx = np.repeat(np.arange(len(nt)), nt)
    # per-pair local tile offset
    off = np.arange(nt.sum()) - np.repeat(np.cumsum(nt) - nt, nt)
    w = (x1 - x0)[idx]
    tx = x0[idx] + off % w
    ty = y0[idx] + off // w
    return idx, tx, ty


def ellipse_survives(p, idx, tx, ty, TX, TY):
    """Ideal exact cull: does {power <= ln(255 op)} meet the tile rect?
    Minimize q(d) = 0.5 A dx^2 + B dx dy + 0.5 C dy^2 over the rect
    (clamped-vertex + edge minimization)."""
    A = p["conic"][idx, 0]
    B = p["conic"][idx, 1]
    C = p["conic"][idx, 2]
    mx = p["mean2d"][idx, 0]
    my = p["mean2d"][idx, 1]
    lx = tx * TX - mx
    hx = (tx + 1) * TX - 1.0 - mx   # pixel centers at integer coords
    ly = ty * TY - my
    hy = (ty + 1) * TY - 1.0 - my

    def q(dx, dy):
        return 0.5 * (A * dx * dx + C * dy * dy) + B * dx * dy

    # interior: mean inside rect -> min 0
    inside = (lx <= 0) & (hx >= 0) & (ly <= 0) & (hy >= 0)
    best = np.where(inside, 0.0, np.inf)
    # edges: fix dx at lx/hx, minimize over dy in [ly, hy]; and vice versa
    for dx in (lx, hx):
        dy = np.clip(-B * dx / np.maximum(C, 1e-12), ly, hy)
        best = np.minimum(best, q(dx, dy))
    for dy in (ly, hy):
        dx = np.clip(-B * dy / np.maximum(A, 1e-12), lx, hx)
        best = np.minimum(best, q(dx, dy))
    thr = np.log(np.maximum(255.0 * p["op"][idx], 1.0)) + 1e-3
    return best <= thr


def padded_count(tx, ty, gx, gy):
    tid = ty * gx + tx
    counts = np.bincount(tid, minlength=gx * gy)
    return int(np.sum((counts + CHUNK - 1) // CHUNK * CHUNK)), counts


def analyze(name, g, cam_kw, W, H, shapes):
    p = preprocess_np(g, cam_kw, W, H)
    rows = []
    for TX, TY in shapes:
        x0, y0, x1, y1, ok, gx, gy = rect_bounds(p, TX, TY, W, H)
        idx, tx, ty = expand_pairs(x0, y0, x1, y1, ok)
        keep = ellipse_survives(p, idx, tx, ty, TX, TY)
        I_raw = int(keep.sum())
        I_pad, _ = padded_count(tx[keep], ty[keep], gx, gy)
        tile_pix = TX * TY
        rows.append({
            "tile": f"{TX}x{TY}", "tile_pix": tile_pix,
            "I_rect": int(len(idx)), "I_exact": I_raw, "I_pad": I_pad,
            "n_tiles": gx * gy,
        })
    # cost model anchored at the measured 16x16 STRESS-scene trace: the
    # per-instance constants are global hardware rates, not per-scene
    k_mach = MEAS["mach_ms"] / MEAS["I_pad_16"]
    k_kern = MEAS["kernel_ms"] / MEAS["I_pad_16"]  # per pad-inst at 256 pix
    for r in rows:
        scale_pix = r["tile_pix"] / 256.0
        r["proj_mach_ms"] = round(k_mach * r["I_pad"], 1)
        r["proj_kernel_ms"] = round(k_kern * r["I_pad"] * scale_pix, 1)
        r["proj_step_ms"] = round(MEAS["const_ms"] + r["proj_mach_ms"]
                                  + r["proj_kernel_ms"], 1)
    print(f"\n== {name} ({W}x{H}) ==")
    for r in rows:
        print(json.dumps(r))
    return rows


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench as bench_mod

    shapes = [(16, 16), (8, 16), (16, 8), (32, 16), (16, 32), (32, 32)]
    W, H = 1920, 1080
    out = {}

    cam, g = bench_mod.build_scene(500_000, W, H)
    cam_kw = dict(
        viewmatrix=np.asarray(cam.world_view_transform),
        projmatrix=np.asarray(cam.full_proj_transform),
        campos=np.asarray(cam.camera_center),
        tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy)
    out["stress_500k"] = analyze("stress 500k", g, cam_kw, W, H, shapes)

    assets = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "assets")
    ply = os.path.join(assets, "trained_scene_big.ply")
    if not os.path.exists(ply):
        ply = os.path.join(assets, "trained_scene.ply")
    if os.path.exists(ply):
        from gsplat_tpu.core import transforms as T
        from gsplat_tpu.core.cameras import Camera
        from gsplat_tpu.models.gaussians import GaussianModel
        m = GaussianModel(3, num_class=2, capacity=1)
        m.load_ply(ply)
        pp = m.params
        g2 = dict(means3d=pp.xyz, scales=T.scaling_activation(pp.scaling),
                  rotations=pp.rotation,
                  opacities=T.opacity_activation(pp.opacity[:, 0]),
                  shs=jnp.concatenate([pp.features_dc, pp.features_rest],
                                      axis=1))
        fovx = math.radians(62.0)
        fovy = 2 * math.atan(math.tan(fovx / 2) * H / W)
        cam2 = Camera(colmap_id=0, R=np.eye(3), T=np.array([0.0, 0.6, 4.2]),
                      FoVx=fovx, FoVy=fovy,
                      image=np.zeros((3, H, W), np.float32),
                      image_name="t", uid=0)
        ckw2 = dict(
            viewmatrix=np.asarray(cam2.world_view_transform),
            projmatrix=np.asarray(cam2.full_proj_transform),
            campos=np.asarray(cam2.camera_center),
            tan_fovx=cam2.tan_fovx, tan_fovy=cam2.tan_fovy)
        out["trained_asset"] = analyze("trained asset", g2, ckw2, W, H,
                                       shapes)

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "docs", "TILE_AB_r4.json"),
            "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
