#!/usr/bin/env python
"""Segmentation-quality eval: per-class pixel accuracy + mIoU of the
rendered argmax class map vs the GT ``segment/`` maps (VERDICT r3 item 1).

The reference has no segmentation metric at all — train_segment.py:322-358
only logs the CE loss to TensorBoard; this tool renders each eval camera's
composited class channels (forward.cu:367-369 semantics), folds the
background transmittance into class 0, takes the per-pixel argmax (the
visualizer's class-map view, visualizer.py:547-557), and scores it against
the dataset's GT labels.

Usage: python tools/eval_segmentation.py -s <scene> -m <model> \
           --iteration 10000 --num_class 6 [--out seg_metrics.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def confusion(pred, gt, n_class):
    k = (gt >= 0) & (gt < n_class)
    return np.bincount(n_class * gt[k].astype(int) + pred[k],
                       minlength=n_class ** 2).reshape(n_class, n_class)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-s", "--source_path", required=True)
    ap.add_argument("-m", "--model_path", required=True)
    ap.add_argument("--iteration", type=int, default=-1)
    ap.add_argument("--num_class", type=int, default=6)
    ap.add_argument("--sh_degree", type=int, default=3)
    ap.add_argument("--split", default="test", choices=["test", "train"])
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--out", default=None,
                    help="JSON output path (default <model>/seg_metrics.json)")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from gsplat_tpu.data.scene import Scene
    from gsplat_tpu.models.gaussians import GaussianModel
    from gsplat_tpu.renderer import render
    from gsplat_tpu.train import losses as L

    dataset = argparse.Namespace(
        sh_degree=args.sh_degree,
        source_path=os.path.abspath(args.source_path),
        model_path=args.model_path, images="images", resolution=-1,
        white_background=False, eval=True,
        using_depth=False, using_seg=True, num_class=args.num_class)
    gaussians = GaussianModel(args.sh_degree, num_class=args.num_class)
    scene = Scene(dataset, gaussians, load_iteration=args.iteration,
                  shuffle=False)
    cams = (scene.getTestCameras() if args.split == "test"
            else scene.getTrainCameras())
    if not cams:
        raise SystemExit(f"no {args.split} cameras (need --eval split data)")

    C = args.num_class
    conf = np.zeros((C, C), np.int64)
    psnrs = []
    # fixed class palette for the qualitative class-map artifact
    # (visualizer.py:547-557 colors the argmax map the same way)
    palette = np.array([[0, 0, 0], [200, 180, 140], [220, 60, 50],
                        [60, 130, 220], [70, 200, 80], [200, 80, 200],
                        [240, 200, 60], [100, 100, 255]], np.uint8)
    for i, cam in enumerate(cams):
        out = render(cam, gaussians, backend=args.backend)
        seg = np.asarray(out["segment"])          # [C,H,W]
        alpha = np.asarray(out["alpha"])
        scores = seg.copy()
        scores[0] += 1.0 - alpha                  # background transmittance
        pred = np.argmax(scores, axis=0)
        gt = np.asarray(cam.segment).astype(np.int64)
        conf += confusion(pred.ravel(), gt.ravel(), C)
        img = jnp.clip(out["render"], 0, 1)
        psnrs.append(float(L.psnr(img, jnp.asarray(cam.image))))
        if i == 0:
            from PIL import Image
            pal = np.vstack([palette, np.zeros((max(0, C - len(palette)), 3),
                                               np.uint8)])
            side = np.concatenate([pal[pred % len(pal)],
                                   pal[gt % len(pal)]], axis=1)
            Image.fromarray(side).save(os.path.join(
                args.model_path, f"seg_classmap_{args.split}.png"))

    tp = np.diag(conf).astype(float)
    gt_tot = conf.sum(1).astype(float)
    pr_tot = conf.sum(0).astype(float)
    union = gt_tot + pr_tot - tp
    present = gt_tot > 0
    iou = np.where(union > 0, tp / np.maximum(union, 1), 0.0)
    acc = np.where(present, tp / np.maximum(gt_tot, 1), 0.0)
    result = {
        "split": args.split,
        "n_cams": len(cams),
        "iteration": scene.loaded_iter,
        "num_class": C,
        "pixel_accuracy": float(tp.sum() / max(conf.sum(), 1)),
        "mean_iou": float(iou[present].mean()),
        "per_class_iou": {str(c): round(float(iou[c]), 4)
                          for c in range(C) if present[c]},
        "per_class_accuracy": {str(c): round(float(acc[c]), 4)
                               for c in range(C) if present[c]},
        "psnr": float(np.mean(psnrs)),
    }
    out_path = args.out or os.path.join(args.model_path, "seg_metrics.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    return result


if __name__ == "__main__":
    main()
