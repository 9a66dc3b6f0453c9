"""Monocular depth inference CLI — TPU-native DPT.

CLI mirror of the reference's DPT/run_monodepth.py:24-245:
``python -m gsplat_tpu.scripts.run_monodepth -i <images> -o <depth>
-m <weights.pt> -t dpt_hybrid`` produces min/max-normalized 16-bit PNG depth
maps consumed by the dataset readers' ``depth/`` folders
(scene/dataset_readers.py:109-140 in the reference).

Differences by design: runs on TPU via jit (one compile per padded input
shape — images are bucketed to multiples of 32), fp32 params with optional
bf16 activations (--bf16), batch of 1 (DPT inputs vary per image).
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))


MODEL_DEFAULTS = {
    "dpt_large": dict(net=(384, 384), scale=None),
    "dpt_hybrid": dict(net=(384, 384), scale=None),
    "dpt_hybrid_kitti": dict(net=(1216, 352), scale=256.0),
    "dpt_hybrid_nyu": dict(net=(640, 480), scale=1000.0),
}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-i", "--input_path", default="input")
    ap.add_argument("-o", "--output_path", default="output_monodepth")
    ap.add_argument("-m", "--model_weights", default=None,
                    help="path to the official .pt checkpoint")
    ap.add_argument("-t", "--model_type", default="dpt_hybrid",
                    choices=sorted(MODEL_DEFAULTS))
    ap.add_argument("--absolute_depth", action="store_true")
    ap.add_argument("--kitti_crop", action="store_true")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 activations (fp32 params)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from gsplat_tpu.depth.dpt import dpt_config, dpt_forward, init_params
    from gsplat_tpu.depth import transforms as T
    from gsplat_tpu.depth.weights import load_torch

    cfg = dpt_config(args.model_type)
    md = MODEL_DEFAULTS[args.model_type]
    net_w, net_h = md["net"]

    if args.model_weights and os.path.exists(args.model_weights):
        params = load_torch(args.model_weights, cfg)
        print(f"loaded weights: {args.model_weights}")
    else:
        print("WARNING: no weights given/found — random init (shape check "
              "only; download the official MiDaS .pt for real output)")
        params = init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    fwd = jax.jit(lambda p, x: dpt_forward(p, cfg, x))

    os.makedirs(args.output_path, exist_ok=True)
    names = T.list_images(args.input_path)
    print(f"processing {len(names)} images on {jax.default_backend()}")
    for idx, name in enumerate(names):
        img = T.read_image(name)
        if args.kitti_crop:
            h, w, _ = img.shape
            top, left = h - 352, (w - 1216) // 2
            img = img[top:top + 352, left:left + 1216]
        inp = T.prepare(img, net_w, net_h)[None]
        if args.bf16:
            inp = inp.astype(np.float32)  # input fp32; params cast inside
        pred = np.asarray(fwd(params, jnp.asarray(inp)))[0]
        pred = T.resize_prediction(pred, img.shape[0], img.shape[1])
        if md["scale"]:
            pred = pred * md["scale"]
        base = os.path.splitext(os.path.basename(name))[0]
        out = T.write_depth(os.path.join(args.output_path, base), pred,
                            bits=2, absolute_depth=args.absolute_depth)
        print(f"  [{idx + 1}/{len(names)}] {name} -> {out}")
    print("finished")


if __name__ == "__main__":
    main()
