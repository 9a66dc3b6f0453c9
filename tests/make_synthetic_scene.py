"""Generate a tiny synthetic NeRFstudio-format scene for end-to-end tests.

Renders GT images of a random gaussian cloud with the naive oracle
compositor, writes transforms.json + images/ + points3d.ply (+ optional
depth/ + segment/), so the full CLI training path can run without any real
dataset (BASELINE config 2 analogue)."""
from __future__ import annotations

import json
import math
import os

import numpy as np


def make_scene(out_dir: str, n_gauss=300, n_cams=8, width=64, height=64,
               num_class=0, with_depth=False, seed=0):
    # Scene generation is tiny CPU work — force it off the TPU: the axon
    # sitecustomize hard-selects the axon platform (outranking JAX_PLATFORMS)
    # and the O(P*pixels) oracle compositor is pathological over the tunnel.
    import jax
    if not jax.config.jax_platforms or "axon" in str(jax.config.jax_platforms):
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass                    # backend already initialized — leave it
    import jax.numpy as jnp
    from PIL import Image

    from gsplat_tpu.core.cameras import Camera, fov2focal
    from gsplat_tpu.data.readers import store_ply
    from gsplat_tpu.ops import preprocess as pre_lib
    from gsplat_tpu.ops.composite_ref import composite_reference

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(out_dir, "images"), exist_ok=True)
    if with_depth:
        os.makedirs(os.path.join(out_dir, "depth"), exist_ok=True)
    if num_class:
        os.makedirs(os.path.join(out_dir, "segment"), exist_ok=True)

    # ground-truth gaussian cloud
    pts = rng.standard_normal((n_gauss, 3)).astype(np.float32) * 0.8
    cols = rng.uniform(0.1, 0.9, (n_gauss, 3)).astype(np.float32)
    scales = np.exp(rng.standard_normal((n_gauss, 3)).astype(np.float32) * 0.3 - 2.2)
    quats = rng.standard_normal((n_gauss, 4)).astype(np.float32)
    opac = rng.uniform(0.5, 0.95, n_gauss).astype(np.float32)
    if num_class:
        labels = rng.integers(0, num_class, n_gauss)
        seg_probs = np.full((n_gauss, num_class), 0.05, np.float32)
        seg_probs[np.arange(n_gauss), labels] = 0.95

    from gsplat_tpu.core import sh as sh_lib
    K = 16
    shs = np.zeros((n_gauss, K, 3), np.float32)
    shs[:, 0] = np.asarray(sh_lib.rgb_to_sh(cols))

    fovx = math.radians(60.0)
    fovy = 2 * math.atan(math.tan(fovx / 2) * height / width)
    fl_x = fov2focal(fovx, width)
    fl_y = fov2focal(fovy, height)

    frames = []
    for i in range(n_cams):
        ang = 2 * math.pi * i / n_cams
        # camera orbiting at radius 4, looking at origin
        campos = np.array([4 * math.sin(ang), 0.6, 4 * math.cos(ang)])
        fwd = -campos / np.linalg.norm(campos)          # view dir (to origin)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(fwd, up); right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right); up2 /= np.linalg.norm(up2)
        # COLMAP-convention: R (c2w, transposed into Camera), T = -R_w2c @ pos
        R_w2c = np.stack([right, up2, fwd], axis=0)
        Rm = R_w2c.T
        Tv = -R_w2c @ campos

        cam = Camera(colmap_id=i, R=Rm, T=Tv, FoVx=fovx, FoVy=fovy,
                     image=np.zeros((3, height, width), np.float32),
                     image_name=f"frame_{i:03d}", uid=i)
        pre = pre_lib.preprocess(
            jnp.asarray(pts), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(shs), 3,
            jnp.asarray(cam.world_view_transform),
            jnp.asarray(cam.full_proj_transform),
            jnp.asarray(cam.camera_center),
            cam.tan_fovx, cam.tan_fovy, width, height)
        ref = composite_reference(
            pre, width, height, jnp.zeros(3),
            segments=jnp.asarray(seg_probs) if num_class else None)
        img = np.clip(np.asarray(ref["render"]), 0, 1).transpose(1, 2, 0)
        name = f"frame_{i:03d}.png"
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(out_dir, "images", name))
        if with_depth:
            d = np.asarray(ref["depth"])
            dn = (d / (d.max() + 1e-9) * 65535).astype(np.uint16)
            Image.fromarray(dn, mode="I;16").save(
                os.path.join(out_dir, "depth", name))
        if num_class:
            seg_img = np.asarray(ref["segment"]).argmax(0).astype(np.uint8)
            Image.fromarray(seg_img).save(
                os.path.join(out_dir, "segment", name))

        # NeRF-convention c2w: our COLMAP-style matrix with axis flip undone
        w2c = np.eye(4)
        w2c[:3, :3] = R_w2c
        w2c[:3, 3] = Tv
        c2w = np.linalg.inv(w2c)
        mat = c2w.copy()
        mat[:, 1:3] *= -1  # invert the readers' colmap flip
        frames.append({
            "file_path": f"images/frame_{i:03d}.png",
            "transform_matrix": mat.tolist(),
        })

    transforms = {
        "fl_x": fl_x, "fl_y": fl_y, "w": width, "h": height,
        "cx": width / 2, "cy": height / 2,
        "frames": frames,
    }
    with open(os.path.join(out_dir, "transforms.json"), "w") as f:
        json.dump(transforms, f, indent=1)

    store_ply(os.path.join(out_dir, "points3d.ply"), pts,
              (cols * 255).astype(np.uint8))
    return out_dir


if __name__ == "__main__":
    import sys
    make_scene(sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth_scene")
    print("scene written")
