#!/usr/bin/env python
"""Quality-parity protocol, one command (VERDICT r1 item 2).

Reproduces the reference's full_eval protocol (full_eval.py:39-75 +
metrics.py:36-93) on the synthetic COLMAP quality scene:

  1. tools/make_quality_scene.py  -> COLMAP-format scene (GT renders)
  2. scripts/train  --eval (densification, llffhold test split); in-loop
     test PSNR at EVERY --test_iters lands in eval_log.jsonl
  3. scripts/render --skip_train per test iteration
  4. scripts/metrics              (PSNR/SSIM[/LPIPS] -> results.json)
  5. writes the QUALITY artifact: metrics at every test iteration + image
     hash + the exact commands, so the run is reproducible and auditable.

Round-3 protocol (VERDICT r2 item 3): 30k iterations at the reference's
1600px-cap resolution with 7k AND 30k evals:
  python tools/run_quality_eval.py --iters 30000 --test_iters 7000 30000 \
      --width 1600 --height 1060 --out docs/QUALITY_r3.json
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, **kw):
    print("+", " ".join(cmd), flush=True)
    t0 = time.time()
    subprocess.run(cmd, check=True, cwd=REPO, **kw)
    return time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="/tmp/qscene")
    ap.add_argument("--model", default="/tmp/qrun")
    ap.add_argument("--iters", type=int, default=7000)
    ap.add_argument("--test_iters", type=int, nargs="+", default=None,
                    help="eval/render checkpoints (default: [--iters])")
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--n_cams", type=int, default=32)
    ap.add_argument("--n_init_points", type=int, default=8000)
    ap.add_argument("--out", default="docs/QUALITY_r2.json")
    ap.add_argument("--skip_scene", action="store_true",
                    help="reuse an existing --scene directory")
    ap.add_argument("--train_args", action="append", default=[],
                    help="extra flag token forwarded to scripts.train; "
                         "repeatable (use = form: --train_args=--flag)")
    ap.add_argument("--scene_args", action="append", default=[],
                    help="extra flag token forwarded to make_quality_scene "
                         "(e.g. --scene_args=--layout --scene_args=room)")
    args = ap.parse_args()

    py = [sys.executable]
    test_iters = sorted(set(args.test_iters or [args.iters]))
    t_scene = 0.0
    if not args.skip_scene:
        t_scene = run(py + ["tools/make_quality_scene.py", "--out",
                            args.scene, "--width", str(args.width),
                            "--height", str(args.height),
                            "--n_cams", str(args.n_cams),
                            "--n_init_points", str(args.n_init_points)]
                      + list(args.scene_args))

    # Fault tolerance the reference lacks (SURVEY §5): the remote TPU
    # transport can throw spurious backend errors under compile churn —
    # resume from the newest checkpoint instead of restarting from zero.
    import glob as _glob
    import re as _re
    base_cmd = (py + ["-m", "gsplat_tpu.scripts.train",
                      "-s", args.scene, "-m", args.model, "--eval",
                      "--iterations_override", str(args.iters),
                      "--test_iterations"] + [str(i) for i in test_iters]
                + ["--save_iterations"] + [str(i) for i in test_iters]
                + ["--disable_gui_server"] + list(args.train_args))
    t_train = 0.0
    for attempt in range(3):
        cmd = list(base_cmd)
        ckpts = sorted(
            _glob.glob(os.path.join(args.model, "chkpnt*.npz")),
            key=lambda f: int(_re.search(r"chkpnt(\d+)", f).group(1)))
        if attempt and ckpts:
            cmd += ["--start_checkpoint", ckpts[-1]]
            print(f"[retry {attempt}] resuming from {ckpts[-1]}")
        try:
            t_train += run(cmd)
            break
        except subprocess.CalledProcessError:
            if attempt == 2 or not (ckpts or attempt < 2):
                raise
            print(f"[retry {attempt}] train crashed — retrying")

    t_render = 0.0
    for it in test_iters:
        t_render += run(py + ["-m", "gsplat_tpu.scripts.render",
                              "-s", args.scene, "-m", args.model,
                              "--iteration", str(it), "--eval",
                              "--skip_train"])

    run(py + ["-m", "gsplat_tpu.scripts.metrics", "-m", args.model])

    with open(os.path.join(args.model, "results.json")) as f:
        results = json.load(f)

    # hash the first rendered test image for auditability
    rdir = os.path.join(args.model, "test", f"ours_{args.iters}", "renders")
    img_hash = None
    if os.path.isdir(rdir) and sorted(os.listdir(rdir)):
        first = sorted(os.listdir(rdir))[0]
        with open(os.path.join(rdir, first), "rb") as f:
            img_hash = f"{first}:sha256:" + hashlib.sha256(
                f.read()).hexdigest()[:16]

    # alive-gaussian count from the saved PLY header
    ply = os.path.join(args.model, "point_cloud",
                       f"iteration_{args.iters}", "point_cloud.ply")
    n_gauss = None
    if os.path.exists(ply):
        with open(ply, "rb") as f:
            head = f.read(512).decode("latin1")
        for line in head.splitlines():
            if line.startswith("element vertex"):
                n_gauss = int(line.split()[-1])

    eval_log = []
    elog = os.path.join(args.model, "eval_log.jsonl")
    if os.path.exists(elog):
        with open(elog) as f:
            eval_log = [json.loads(l) for l in f if l.strip()]

    artifact = {
        "protocol": (f"full_eval ({'/'.join(str(i) for i in test_iters)}) "
                     "on synthetic COLMAP quality scene"),
        "eval_log": eval_log,
        "scene": {"width": args.width, "height": args.height,
                  "n_cams": args.n_cams, "llffhold_test_split": True},
        "iterations": args.iters,
        "results": results,
        "final_gaussians": n_gauss,
        "first_test_render": img_hash,
        "wall_clock_s": {"scene_gen": round(t_scene, 1),
                         "train": round(t_train, 1),
                         "render": round(t_render, 1)},
        "reproduce": "python tools/run_quality_eval.py",
    }
    os.makedirs(os.path.dirname(os.path.join(REPO, args.out)), exist_ok=True)
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(artifact, f, indent=2)
    print(json.dumps(artifact, indent=2))


if __name__ == "__main__":
    main()
