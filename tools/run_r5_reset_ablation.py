#!/usr/bin/env python
"""Room-scene opacity-reset collapse: controlled ablation (VERDICT r4 item 1).

r4 observed a training collapse on the closed room scene starting at the
iteration-3000 opacity reset (loss 0.0097 -> 0.15-0.47 oscillation) and
attributed it to "reference schedule fragility".  Root cause found in r5 by
reading the reference more carefully: the reference's screen-RADIUS prune
``big_points_vs = max_radii2D > max_screen_size``
(scene/gaussian_model.py:516) always reads an ALL-ZERO tensor, because
densify_and_prune first runs clone->densification_postfix and
split->densification_postfix, and densification_postfix zeroes max_radii2D
(gaussian_model.py:457-459).  So the reference never prunes by screen
radius.  gsplat_tpu r2-r4 pruned on the radii accumulated over the last
100 iterations — on a closed room with cameras INSIDE, wall gaussians near
any camera exceed 20 px every window, so once ``it > opacity_reset_interval``
enables the size threshold (train.py:176), every densify call mass-prunes
the walls: holes -> loss spike -> densify regrows -> prune again ->
growing oscillation.  The open orbit scene (cameras far away) rarely
trips 20 px, which is why it "recovered from the reset".

Arms (same scene, same seed, 4200 iterations = 1200 past the reset):
  vs_prune : --vs_prune 1  — the r2-r4 behavior; expected to collapse
  fixed    : default       — reference-exact prune; expected to recover
  fixed_f32: default + f32 feature/grad precision — excludes bf16 as a
             contributing cause of the collapse (VERDICT arm (a))

Then the full 7k room run (the r4 protocol schedule that was re-scoped to
2990 iterations) to confirm recovery through the reset: done = loss back
to pre-reset level and test PSNR >= the 2990-iter number.

Writes docs/QUALITY_r5_room.json + docs/QUALITY_r5_room_NOTES.md data.
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


def trajectory(tl, lo=2700, hi=10**9, step=300):
    """Sparse (iter, loss, alive) samples for the artifact."""
    out = []
    nxt = lo
    for r in tl:
        if r["iter"] >= nxt:
            out.append({"iter": r["iter"], "loss": round(r["loss"], 4),
                        "n_alive": r["n_alive"]})
            nxt = r["iter"] + step
        if r["iter"] > hi:
            break
    return out


def densify_events(tl, lo, hi):
    out = []
    for r in tl:
        d = r.get("densify")
        if d and lo <= d["iter"] <= hi and d["iter"] == r["iter"]:
            out.append(d)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/r5reset")
    ap.add_argument("--ab_iters", type=int, default=4200)
    ap.add_argument("--full_iters", type=int, default=7000)
    ap.add_argument("--skip_full", action="store_true")
    args = ap.parse_args()
    scene = os.path.join(args.work, "scene")
    os.makedirs(args.work, exist_ok=True)

    t0 = time.time()
    if not os.path.isdir(scene):
        run(PY + ["tools/make_quality_scene.py", "--out", scene,
                  "--layout", "room", "--format", "blender",
                  "--width", "640", "--height", "480", "--n_cams", "40",
                  "--wall_n", "260", "--blob_m", "12000",
                  "--checker_freq", "8", "--n_init_points", "60000",
                  "--orbit_radius", "2.0", "--init_noise", "0.005",
                  "--capacity", str(1 << 21)])

    res = {"arms": {}}
    arms = [
        ("vs_prune", ["--vs_prune"], args.ab_iters),
        ("fixed", [], args.ab_iters),
        ("fixed_f32", ["--grad_precision", "f32",
                       "--feat_precision", "f32"], args.ab_iters),
    ]
    if not args.skip_full:
        arms.append(("fixed_full7k", [], args.full_iters))

    for tag, extra, iters in arms:
        model = os.path.join(args.work, f"run_{tag}")
        if os.path.isdir(model):
            shutil.rmtree(model)
        test_its = [str(i) for i in
                    sorted({2990, iters})]
        run(PY + ["-m", "gsplat_tpu.scripts.train", "-s", scene,
                  "-m", model, "--eval",
                  "--iterations_override", str(iters),
                  "--test_iterations"] + test_its +
            ["--save_iterations", str(iters),
             "--capacity", "262144", "--disable_gui_server"] + extra)
        tl = read_jsonl(os.path.join(model, "train_log.jsonl"))
        el = read_jsonl(os.path.join(model, "eval_log.jsonl"))
        pre = [r["loss"] for r in tl if 2800 <= r["iter"] <= 3000]
        post = [r["loss"] for r in tl if r["iter"] >= iters - 400]
        arm = {
            "iterations": iters,
            "loss_pre_reset_2800_3000": round(min(pre), 4) if pre else None,
            "loss_final_400_min": round(min(post), 4) if post else None,
            "loss_final_400_max": round(max(post), 4) if post else None,
            "trajectory": trajectory(tl),
            "densify_post_reset": densify_events(tl, 3100, 3600),
            "eval": {f'{r["split"]}@{r["iter"]}':
                     {"psnr": round(r["psnr"], 2), "l1": round(r["l1"], 4)}
                     for r in el},
            "final_gaussians": tl[-1]["n_alive"] if tl else None,
        }
        res["arms"][tag] = arm
        print(f"[arm {tag}] {json.dumps(arm['eval'])} "
              f"final loss window [{arm['loss_final_400_min']}, "
              f"{arm['loss_final_400_max']}]", flush=True)

    res["wall_clock_s"] = round(time.time() - t0, 1)
    res["mechanism"] = (
        "reference's big_points_vs prune is inert (max_radii2D zeroed by "
        "densification_postfix before the check, gaussian_model.py:457-459 "
        "vs :516); r2-r4 pruned on live 100-iter radii -> mass wall prune "
        "on closed scenes once it > opacity_reset_interval")
    out = os.path.join(REPO, "docs", "QUALITY_r5_room.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
