"""Metrics CLI — mirror of reference metrics.py:24-103.

Computes SSIM/PSNR (and LPIPS when torch weights are available locally —
the reference ships LPIPS wired but disabled, metrics.py:74-78) over
<model>/test/ours_<iter>/{renders,gt} and PERSISTS results.json +
per_view.json (the reference's json dump is commented out; we keep it).
"""
from __future__ import annotations

import json
import os
import sys
from argparse import ArgumentParser
from pathlib import Path

import numpy as np


def read_images(renders_dir, gt_dir):
    from PIL import Image

    renders, gts, names = [], [], []
    for fname in sorted(os.listdir(renders_dir)):
        r = np.asarray(Image.open(os.path.join(renders_dir, fname)),
                       np.float32) / 255.0
        g = np.asarray(Image.open(os.path.join(gt_dir, fname)),
                       np.float32) / 255.0
        renders.append(r[..., :3].transpose(2, 0, 1))
        gts.append(g[..., :3].transpose(2, 0, 1))
        names.append(fname)
    return renders, gts, names


def try_lpips():
    """LPIPS needs pretrained torchvision weights; offline they're usually
    absent — mirror the reference's disabled-LPIPS behavior gracefully."""
    try:
        from gsplat_tpu.viz.lpips import LPIPS
        return LPIPS()
    except Exception as e:  # noqa: BLE001
        print(f"[metrics] LPIPS unavailable ({e}); reporting SSIM/PSNR only")
        return None


def evaluate(model_paths, split="test"):
    import jax.numpy as jnp

    from gsplat_tpu.train import losses as L

    full_dict = {}
    per_view_dict = {}
    for scene_dir in model_paths:
        print("Scene:", scene_dir)
        full_dict[scene_dir] = {}
        per_view_dict[scene_dir] = {}
        test_dir = Path(scene_dir) / split
        lp = try_lpips()
        for method in sorted(os.listdir(test_dir)):
            print("Method:", method)
            method_dir = test_dir / method
            renders, gts, names = read_images(method_dir / "renders",
                                              method_dir / "gt")
            ssims, psnrs, lpipss = [], [], []
            for r, g in zip(renders, gts):
                rj, gj = jnp.asarray(r), jnp.asarray(g)
                ssims.append(float(L.ssim(rj, gj)))
                psnrs.append(float(L.psnr(rj, gj)))
                if lp is not None:
                    lpipss.append(float(lp(r, g)))
            print(f"  SSIM : {np.mean(ssims):>12.7f}")
            print(f"  PSNR : {np.mean(psnrs):>12.7f}")
            if lpipss:
                print(f"  LPIPS: {np.mean(lpipss):>12.7f}")
            full_dict[scene_dir][method] = {
                "SSIM": float(np.mean(ssims)),
                "PSNR": float(np.mean(psnrs)),
                **({"LPIPS": float(np.mean(lpipss))} if lpipss else {}),
            }
            per_view_dict[scene_dir][method] = {
                "SSIM": dict(zip(names, ssims)),
                "PSNR": dict(zip(names, psnrs)),
            }
        with open(os.path.join(scene_dir, "results.json"), "w") as f:
            json.dump(full_dict[scene_dir], f, indent=2)
        with open(os.path.join(scene_dir, "per_view.json"), "w") as f:
            json.dump(per_view_dict[scene_dir], f, indent=2)
    return full_dict


def main(argv=None):
    parser = ArgumentParser(description="Training script parameters")
    parser.add_argument("--model_paths", "-m", required=True, nargs="+",
                        type=str)
    parser.add_argument("--split", default="test", type=str)
    args = parser.parse_args(argv)
    evaluate(args.model_paths, args.split)


if __name__ == "__main__":
    main()
