#!/usr/bin/env python
"""Out-of-family quality protocol (VERDICT r4 item 2): train against GT
rendered by the INDEPENDENT analytic ray tracer (tools/make_oof_scene.py)
— hard shadows, sharp silhouettes and discontinuous checkers the gaussian
family cannot represent exactly — so PSNR measures real photometric
fitting, filling the role real captures play in the reference's protocol
(full_eval.py:39-75).

Arms (COLMAP format, llffhold eval split, real TPU):
  rgb_7k   : 7k iterations at 640x480
  rgb_30k  : full 30k reference schedule (nine opacity resets)
  seg_10k  : train_segment --using_seg --num_class 6 (BASELINE config 4),
             scored by tools/eval_segmentation.py
  depth_7k : --using_depth L1_loss A/B against the ray tracer's true
             inverse-depth maps (BASELINE config 3)

Writes docs/QUALITY_r5_oof.json.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PY = [sys.executable]


def run(cmd):
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, cwd=REPO)


def read_jsonl(path):
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def train(scene, model, iters, extra, module="gsplat_tpu.scripts.train"):
    if os.path.isdir(model):
        shutil.rmtree(model)
    its = sorted({7000, iters} & set(range(0, iters + 1)))
    run(PY + ["-m", module, "-s", scene, "-m", model, "--eval",
              "--iterations_override", str(iters),
              "--test_iterations"] + [str(i) for i in its] +
        ["--save_iterations", str(iters),
         "--capacity", "262144", "--disable_gui_server"] + extra)
    el = read_jsonl(os.path.join(model, "eval_log.jsonl"))
    tl = read_jsonl(os.path.join(model, "train_log.jsonl"))
    return {
        "eval": {f'{r["split"]}@{r["iter"]}':
                 {"psnr": round(r["psnr"], 2), "l1": round(r["l1"], 4),
                  **({"ssim": round(r["ssim"], 4)} if "ssim" in r else {})}
                 for r in el},
        "final_gaussians": tl[-1]["n_alive"] if tl else None,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/r5oof")
    ap.add_argument("--skip_30k", action="store_true")
    args = ap.parse_args()
    scene = os.path.join(args.work, "scene")
    os.makedirs(args.work, exist_ok=True)

    t0 = time.time()
    if not os.path.isdir(os.path.join(scene, "sparse")):
        run(PY + ["tools/make_oof_scene.py", "--out", scene,
                  "--width", "640", "--height", "480", "--n_cams", "40",
                  "--n_init_points", "60000"])

    res = {"gt": "analytic numpy ray tracer (tools/make_oof_scene.py): "
                 "textured plane + 3 spheres + box, Lambertian + hard "
                 "shadows; shares ONLY the pinhole camera model with the "
                 "framework"}

    res["rgb_7k"] = train(scene, os.path.join(args.work, "rgb7k"), 7000, [])
    print("[rgb_7k]", json.dumps(res["rgb_7k"]["eval"]), flush=True)

    if not args.skip_30k:
        res["rgb_30k"] = train(scene, os.path.join(args.work, "rgb30k"),
                               30000, [])
        print("[rgb_30k]", json.dumps(res["rgb_30k"]["eval"]), flush=True)

    seg_model = os.path.join(args.work, "seg10k")
    res["seg_10k"] = train(scene, seg_model, 10000,
                           ["--using_seg", "--num_class", "6"],
                           module="gsplat_tpu.scripts.train_segment")
    segj = os.path.join(args.work, "seg_scores.json")
    run(PY + ["tools/eval_segmentation.py", "-s", scene, "-m", seg_model,
              "--iteration", "10000", "--num_class", "6", "--out", segj])
    with open(segj) as f:
        res["seg_10k"]["segmentation"] = json.load(f)
    print("[seg_10k]", json.dumps(res["seg_10k"]["segmentation"]),
          flush=True)

    res["depth_7k"] = train(scene, os.path.join(args.work, "depth7k"), 7000,
                            ["--using_depth", "--depth_loss_choice",
                             "L1_loss"])
    print("[depth_7k]", json.dumps(res["depth_7k"]["eval"]), flush=True)

    res["wall_clock_s"] = round(time.time() - t0, 1)
    out = os.path.join(REPO, "docs", "QUALITY_r5_oof.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
