#!/usr/bin/env python
"""REAL tile-shape A/B on the TPU (VERDICT r4 item 3): run bench.py in
subprocesses with GSPLAT_TILE_X/Y overrides (the constants snapshot at
import, so each shape needs its own process) and diff the emitted metrics.
The r4 analytic model (tools/bench_tile_ab.py, docs/PERF_NOTES.md) projected
~9% for 32x16 on the trained regime; this measures it end-to-end, error
bars included.

Usage: python tools/bench_tile_real.py [--shapes 16x16 32x16 32x32]
Writes docs/TILE_AB_r5.json.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", nargs="+", default=["16x16", "32x16"])
    args = ap.parse_args()

    out = os.path.join(REPO, "docs", "TILE_AB_r5.json")
    res = {}
    if os.path.exists(out):  # merge: keep earlier shapes (16x16 base) intact
        with open(out) as f:
            res = json.load(f)
    for shape in args.shapes:
        tx, ty = (int(v) for v in shape.split("x"))
        env = dict(os.environ, GSPLAT_TILE_X=str(tx), GSPLAT_TILE_Y=str(ty))
        print(f"=== bench at {tx}x{ty} ===", flush=True)
        p = subprocess.run([sys.executable, "bench.py"], cwd=REPO, env=env,
                           capture_output=True, text=True, timeout=3600)
        line = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if p.returncode != 0 or not line:
            print(p.stdout[-2000:], p.stderr[-3000:], flush=True)
            res[shape] = {"error": f"rc={p.returncode}"}
            continue
        res[shape] = json.loads(line[-1])
        print(json.dumps({k: v for k, v in res[shape].items()
                          if "p10" in k or k in ("value", "fwd_mpix_per_s",
                                                 "render_fps_1080p",
                                                 "trained_fwdbwd_mpix_per_s",
                                                 "trained_render_fps_1080p")}),
              flush=True)

    base = res.get("16x16", {})
    for shape, r in res.items():
        if shape == "16x16" or "error" in r:
            continue
        r["delta_vs_16x16"] = {
            k: round(r[k] / base[k] - 1.0, 4)
            for k in ("value", "fwd_mpix_per_s", "render_fps_1080p",
                      "trained_fwdbwd_mpix_per_s",
                      "trained_render_fps_1080p")
            if isinstance(r.get(k), (int, float))
            and isinstance(base.get(k), (int, float))}
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
