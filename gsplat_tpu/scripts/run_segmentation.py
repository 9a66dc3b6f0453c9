"""Semantic segmentation inference CLI — TPU-native DPT (ADE20k head).

Mirror of the reference's DPT/run_segmentation.py: per image, argmax class
map PNG + color overlay. Consumed by segmentation training via the dataset
readers' ``segment/`` folders.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-i", "--input_path", default="input")
    ap.add_argument("-o", "--output_path", default="output_semseg")
    ap.add_argument("-m", "--model_weights", default=None)
    ap.add_argument("-t", "--model_type", default="dpt_hybrid",
                    choices=["dpt_large", "dpt_hybrid"])
    ap.add_argument("--num_classes", type=int, default=150)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from gsplat_tpu.depth.dpt import dpt_config, dpt_forward, init_params
    from gsplat_tpu.depth import transforms as T
    from gsplat_tpu.depth.weights import load_torch

    cfg = dpt_config(args.model_type, head="segmentation",
                     num_classes=args.num_classes)
    if args.model_weights and os.path.exists(args.model_weights):
        params = load_torch(args.model_weights, cfg)
    else:
        print("WARNING: no weights — random init (shape check only)")
        params = init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    fwd = jax.jit(lambda p, x: dpt_forward(p, cfg, x))

    os.makedirs(args.output_path, exist_ok=True)
    rng = np.random.default_rng(0)
    palette = rng.integers(0, 255, (args.num_classes, 3)).astype(np.uint8)
    names = T.list_images(args.input_path)
    print(f"processing {len(names)} images on {jax.default_backend()}")
    for idx, name in enumerate(names):
        img = T.read_image(name)
        inp = T.prepare(img, 384, 384)[None]
        logits = np.asarray(fwd(params, jnp.asarray(inp)))[0]   # [h,w,C]
        up = np.stack([T.resize_prediction(logits[..., c], img.shape[0],
                                           img.shape[1])
                       for c in range(min(logits.shape[-1], 64))], axis=-1)
        seg = np.argmax(up, axis=-1).astype(np.uint8)
        base = os.path.splitext(os.path.basename(name))[0]
        Image.fromarray(seg).save(os.path.join(args.output_path, base + ".png"))
        overlay = (0.5 * img * 255 + 0.5 * palette[seg]).astype(np.uint8)
        Image.fromarray(overlay).save(
            os.path.join(args.output_path, base + "_overlay.png"))
        print(f"  [{idx + 1}/{len(names)}] {name}")
    print("finished")


if __name__ == "__main__":
    main()
