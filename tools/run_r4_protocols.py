#!/usr/bin/env python
"""Round-4 quality-protocol queue (VERDICT r3 items 1, 2, 6) — one command,
run on the real TPU chip, all artifacts machine-readable under docs/.

Stages (each independent; failures recorded, queue continues):
  A. generate the r4 protocol scene at the 1600px training cap with a
     capture-realistic density (denser init + high-frequency texture so the
     reference's 20-px screen-size prune at iteration 3100 keeps <30%
     instead of cycling 84% of the model — VERDICT r3 'what's weak' 2)
  B. probe: 3.4k iterations; measure the post-reset prune fraction from
     train_log.jsonl; if it still removes >40%, regenerate denser and
     reprobe once
  C. full 30k-iteration run (resuming the probe checkpoint) -> docs/QUALITY_r4.json
  D. generate the 640x480 scene with GT segment/ + depth/ siblings
  E. segment protocol: train_segment --using_seg 10k iters -> mIoU/accuracy
     -> docs/QUALITY_r4_seg.json   (reference: train_segment.py:125-138)
  F. depth protocol: 7k iters with vs without --using_depth (L1_loss on
     inverse depth, train.py:114-141) -> docs/QUALITY_r4_depth.json
  G. densification-at-scale: 3k iters with densify_grad_threshold 4e-5
     (DENSIFY_r2 recipe) -> >=200k-gaussian PLY committed as the hard
     trained-scene bench asset (VERDICT r3 item 6)

Usage: python tools/run_r4_protocols.py [--stages ABCDEFG] [--work /tmp/r4]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re
import shutil
import subprocess
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PY = [sys.executable]
STATUS: dict = {"stages": {}}
STATUS_PATH = os.path.join(REPO, "docs", "R4_PROTOCOL_STATUS.json")


def save_status():
    with open(STATUS_PATH, "w") as f:
        json.dump(STATUS, f, indent=2)


def run(cmd, **kw):
    print("+", " ".join(cmd), flush=True)
    t0 = time.time()
    subprocess.run(cmd, check=True, cwd=REPO, **kw)
    return time.time() - t0


def read_jsonl(path):
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def alive_trajectory(model_dir):
    return [(r["iter"], r["n_alive"]) for r in
            read_jsonl(os.path.join(model_dir, "train_log.jsonl"))]


def prune_stats(model_dir, reset_iter=3000, window=400):
    """Fraction of the model removed by the first post-reset prune."""
    traj = alive_trajectory(model_dir)
    pre = [n for it, n in traj if reset_iter - 200 <= it <= reset_iter + 90]
    post = [n for it, n in traj
            if reset_iter + 90 < it <= reset_iter + window]
    if not pre or not post:
        return None
    peak = max(pre)
    trough = min(post)
    return {"alive_pre_reset": peak, "alive_post_prune_min": trough,
            "prune_fraction": round(1.0 - trough / max(peak, 1), 4)}


def gen_scene(out, width, height, n_cams, n_init, floor_n, checker,
              blob_m, orbit, noise, capacity):
    return run(PY + ["tools/make_quality_scene.py", "--out", out,
                     "--width", str(width), "--height", str(height),
                     "--n_cams", str(n_cams),
                     "--n_init_points", str(n_init),
                     "--floor_n", str(floor_n),
                     "--checker_freq", str(checker),
                     "--blob_m", str(blob_m),
                     "--orbit_radius", str(orbit),
                     "--init_noise", str(noise),
                     "--capacity", str(capacity)])


def train(scene, model, iters, extra=()):
    return run(PY + ["-m", "gsplat_tpu.scripts.train", "-s", scene,
                     "-m", model, "--eval",
                     "--iterations_override", str(iters),
                     "--disable_gui_server"] + list(extra))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="ABCDEFG")
    ap.add_argument("--work", default="/tmp/r4")
    ap.add_argument("--probe_iters", type=int, default=3400)
    args = ap.parse_args()
    os.makedirs(args.work, exist_ok=True)
    os.makedirs(os.path.join(REPO, "docs"), exist_ok=True)

    scene_hi = os.path.join(args.work, "scene1600")
    model_hi = os.path.join(args.work, "run30k")
    scene_lo = os.path.join(args.work, "scene640")

    def stage(tag, fn):
        if tag not in args.stages:
            return
        t0 = time.time()
        try:
            result = fn()
            STATUS["stages"][tag] = {"ok": True,
                                     "wall_s": round(time.time() - t0, 1),
                                     "result": result}
        except Exception as e:
            traceback.print_exc()
            STATUS["stages"][tag] = {"ok": False, "error": repr(e),
                                     "wall_s": round(time.time() - t0, 1)}
        save_status()

    # ---- A: protocol scene at the 1600px cap -------------------------------
    # Density calibration (probe 1, r4): max_radii2d keeps the MAX-EVER
    # radius since birth (reference gaussian_model.py:523-526 semantics), so
    # the 3100 prune is decided by INIT-time radii: a gaussian must start
    # under 20 px at the closest observing camera (z~2.3, fl~1331 at 1600px
    # => init sigma < ~0.0115 => floor spacing <= 6/520).  The 320-floor/
    # 140k-init variant measured 61.6% pruned; this one targets <30%.
    scene_cfg = dict(width=1600, height=1060, n_cams=48, n_init=300000,
                     floor_n=520, checker=16.0, blob_m=20000, orbit=5.0,
                     noise=0.004, capacity=1 << 23)

    def a():
        gen_scene(scene_hi, **scene_cfg)
        return scene_cfg

    stage("A", a)

    # ---- B: prune-fraction probe (+ one denser retry) ----------------------
    def b():
        attempts = []
        for retry in range(2):
            if os.path.isdir(model_hi):
                shutil.rmtree(model_hi)
            train(scene_hi, model_hi, args.probe_iters,
                  ["--test_iterations", str(args.probe_iters),
                   "--save_iterations", str(args.probe_iters),
                   "--checkpoint_iterations", str(args.probe_iters),
                   "--capacity", "1048576"])
            st = prune_stats(model_hi) or {}
            st["scene_cfg"] = dict(scene_cfg)
            attempts.append(st)
            print(f"[probe] prune stats: {st}")
            if st.get("prune_fraction", 1.0) <= 0.40 or retry:
                break
            scene_cfg.update(floor_n=640, n_init=380000, checker=20.0)
            gen_scene(scene_hi, **scene_cfg)
        return attempts

    stage("B", b)

    # ---- C: full 30k protocol (resume the probe checkpoint) ----------------
    def c():
        cmd = PY + ["tools/run_quality_eval.py", "--scene", scene_hi,
                    "--model", model_hi, "--iters", "30000",
                    "--test_iters", "7000", "30000",
                    "--width", "1600", "--height", "1060",
                    "--skip_scene", "--out", "docs/QUALITY_r4.json",
                    "--train_args=--capacity", "--train_args=1048576"]
        ck = sorted(glob.glob(os.path.join(model_hi, "chkpnt*.npz")),
                    key=lambda f: int(re.search(r"chkpnt(\d+)", f).group(1)))
        if ck:
            cmd += [f"--train_args=--start_checkpoint={ck[-1]}"]
        run(cmd)
        # merge the prune trajectory into the artifact
        with open(os.path.join(REPO, "docs", "QUALITY_r4.json")) as f:
            art = json.load(f)
        art["prune_stats"] = prune_stats(model_hi)
        art["scene_cfg"] = dict(scene_cfg)
        traj = alive_trajectory(model_hi)
        art["alive_final"] = traj[-1][1] if traj else None
        with open(os.path.join(REPO, "docs", "QUALITY_r4.json"), "w") as f:
            json.dump(art, f, indent=2)
        return {"alive_final": art.get("alive_final"),
                "prune_stats": art.get("prune_stats")}

    stage("C", c)

    # ---- D: 640x480 scene with GT segment/ + depth/ ------------------------
    def d():
        gen_scene(scene_lo, width=640, height=480, n_cams=32,
                  n_init=20000, floor_n=240, checker=6.0, blob_m=14000,
                  orbit=4.2, noise=0.01, capacity=1 << 21)
        return True

    stage("D", d)

    # ---- E: segment protocol ----------------------------------------------
    def e():
        model = os.path.join(args.work, "run_seg")
        if os.path.isdir(model):
            shutil.rmtree(model)
        run(PY + ["-m", "gsplat_tpu.scripts.train_segment", "-s", scene_lo,
                  "-m", model, "--eval", "--num_class", "6",
                  "--iterations_override", "10000",
                  "--test_iterations", "10000",
                  "--save_iterations", "10000",
                  "--disable_gui_server"])
        run(PY + ["tools/eval_segmentation.py", "-s", scene_lo, "-m", model,
                  "--iteration", "10000", "--num_class", "6",
                  "--out", os.path.join(model, "seg_metrics.json")])
        with open(os.path.join(model, "seg_metrics.json")) as f:
            seg = json.load(f)
        cm = os.path.join(model, "seg_classmap_test.png")
        if os.path.exists(cm):
            shutil.copyfile(cm, os.path.join(REPO, "docs",
                                             "seg_classmap_r4.png"))
        art = {
            "protocol": "train_segment --using_seg 10k iters on the "
                        "synthetic scene with GT segment maps "
                        "(reference train_segment.py:125-138; BASELINE "
                        "config 4)",
            "scene": {"width": 640, "height": 480, "n_cams": 32,
                      "num_class": 6},
            "metrics": seg,
            "eval_log": read_jsonl(os.path.join(model, "eval_log.jsonl")),
            "reproduce": "python tools/run_r4_protocols.py --stages DE",
        }
        with open(os.path.join(REPO, "docs", "QUALITY_r4_seg.json"),
                  "w") as f:
            json.dump(art, f, indent=2)
        return {"mean_iou": seg["mean_iou"],
                "pixel_accuracy": seg["pixel_accuracy"],
                "psnr": seg["psnr"]}

    stage("E", e)

    # ---- F: depth-supervision A/B -----------------------------------------
    def f():
        res = {}
        for tag, extra in (
                ("without_depth", []),
                ("with_depth_L1", ["--using_depth",
                                   "--depth_loss_choice", "L1_loss"]),
                ("with_depth_localrf", ["--using_depth",
                                        "--depth_loss_choice", "localrf"]),
                ("with_depth_hybrid", ["--using_depth",
                                       "--depth_loss_choice",
                                       "hybrid_loss"])):
            model = os.path.join(args.work, f"run_{tag}")
            if os.path.isdir(model):
                shutil.rmtree(model)
            train(scene_lo, model, 7000,
                  ["--test_iterations", "7000",
                   "--save_iterations", "7000"] + extra)
            log = read_jsonl(os.path.join(model, "eval_log.jsonl"))
            res[tag] = {r["split"]: {"psnr": r["psnr"], "l1": r["l1"]}
                        for r in log if r["iter"] == 7000}
        art = {
            "protocol": "7k-iteration A/B/C/D: --using_depth with the "
                        "fork's depth losses (inverse-depth L1 / localrf "
                        "median-MAD / hybrid rank+continue, "
                        "train.py:114-141) vs RGB-only, same scene/seed "
                        "(BASELINE config 3)",
            "note": "the reference's L1 choice compares inverse NORMALIZED "
                    "depth (>= 1 everywhere) against max-normalized GT "
                    "disparity (<= 1) — structurally mismatched ranges; on "
                    "this open-background synthetic scene it degrades "
                    "held-out PSNR, faithfully to the reference math.  The "
                    "scale-free ordering losses (rank/continue) are the "
                    "fork's usable choices.",
            "scene": {"width": 640, "height": 480, "n_cams": 32,
                      "gt_depth": "16-bit inverse-depth renders of the GT "
                                  "cloud (DPT-protocol stand-in)"},
            "results": res,
            "reproduce": "python tools/run_r4_protocols.py --stages DF",
        }
        with open(os.path.join(REPO, "docs", "QUALITY_r4_depth.json"),
                  "w") as f:
            json.dump(art, f, indent=2)
        return res

    stage("F", f)

    # ---- G: densification-at-scale bench asset -----------------------------
    def g():
        model = os.path.join(args.work, "run_densify")
        if os.path.isdir(model):
            shutil.rmtree(model)
        # 2990 iterations: the iteration-3000 opacity reset (reference
        # schedule) would otherwise zero the model's opacities in the very
        # snapshot being saved — the asset must be the TRAINED scene, not
        # the post-reset transparent one
        train(scene_lo, model, 2990,
              ["--densify_grad_threshold", "0.00004",
               "--test_iterations", "2990", "--save_iterations", "2990",
               "--capacity", "262144"])
        ply = os.path.join(model, "point_cloud", "iteration_2990",
                           "point_cloud.ply")
        with open(ply, "rb") as fh:
            head = fh.read(512).decode("latin1")
        n = next(int(l.split()[-1]) for l in head.splitlines()
                 if l.startswith("element vertex"))
        dst = os.path.join(REPO, "assets", "trained_scene_big.ply")
        shutil.copyfile(ply, dst)
        log = read_jsonl(os.path.join(model, "eval_log.jsonl"))
        return {"n_gaussians": n, "asset": "assets/trained_scene_big.ply",
                "eval": [r for r in log if r["iter"] == 2990]}

    stage("G", g)

    save_status()
    print(json.dumps(STATUS, indent=2))


if __name__ == "__main__":
    main()
