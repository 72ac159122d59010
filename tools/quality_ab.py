#!/usr/bin/env python
"""Multi-seed quality A/B sweep for the TPU-specific performance knobs.

The reference validates feature knobs with full-run metric parity
(reference scripts_bash/ablation_study_*.bash + README.md:120-124); the
TPU build adds knobs the reference doesn't have — coarse-to-fine
tracking, mapping bin reuse, frozen tracking pair cache — whose quality
cost must be bounded before they ship as defaults (parity budget:
0.3 dB PSNR, BASELINE.md). This harness runs full SLAM per
(seed x variant) on the procedural synthetic sequence and aggregates
PSNR / ATE-RMSE mean +- std per variant.

Each run is a fresh subprocess (one TPU client at a time; per-process
trace caches stay bounded). Results: JSON lines to --out plus a
markdown table on stdout for PERF.md.

Usage:
  python tools/quality_ab.py --seeds 0 1 2 --frames 100 \
      --out output/quality_ab.json [--variants default coarse0 ...]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# variant -> env overrides (configs/synthetic/config.py reads these)
VARIANTS = {
    # shipped defaults: coarse 18/30 iters, mapping rebin 2, frozen cache
    "default": {},
    # no coarse-to-fine (reference-faithful full-res every iteration)
    "coarse0": {"COARSE_ITERS": "0"},
    # deeper coarse phase (24 of 30 iterations at stride 2)
    "coarse24": {"COARSE_ITERS": "24"},
    # deeper + sparser coarse phase (1/9 of the tiles per iteration)
    "coarse24s3": {"COARSE_ITERS": "24", "COARSE_STRIDE": "3"},
    # re-bin mapping every iteration (reference-exact)
    "rebin1": {"REBIN_EVERY": "1"},
    # staler mapping bins
    "rebin4": {"REBIN_EVERY": "4"},
    # tracking cache refreshed mid-loop (closer to reference re-binning)
    "refresh": {"TRACK_REFRESH": "1"},
    # longer submaps (reference Replica shape is 40): cuts/merges are
    # the most expensive events, fewer of them may be quality-free
    "submap20": {"SYN_MAX_FRAMES": "20"},
    # the reference Replica profile's own submap length
    "submap40": {"SYN_MAX_FRAMES": "40"},
    # the reference config_fast's keyframe threshold (tau_k 0.15 vs the
    # full profile's 0.01; fewer keyframes = far less mapping work)
    "tauk15": {"SYN_TAU_K": "0.15"},
    # config_fast-analogue shape: long submaps + sparse keyframes
    "fast": {"SYN_TAU_K": "0.15", "SYN_MAX_FRAMES": "40"},
}


def run_one(seed: int, variant: str, frames: int, h: int, w: int,
            outdir: str) -> dict:
    env = dict(os.environ)
    env.update(VARIANTS[variant])
    env.update({
        "SEED": str(seed), "SYN_H": str(h), "SYN_W": str(w),
        "SYN_FRAMES": str(frames), "SYN_OUT": outdir,
        # backend floor for the 100-frame peak: no capacity-bucket flips
        # (each flip re-traces the backend program set mid-run)
        "BACKEND_CAP_MULT": env.get("BACKEND_CAP_MULT", "4.0"),
        "JAX_COMPILATION_CACHE_DIR": env.get(
            "JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcache"),
    })
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "gaus.py"),
         os.path.join(ROOT, "configs", "synthetic", "config.py")],
        env=env, cwd=ROOT, capture_output=True, text=True,
    )
    wall = time.time() - t0
    result_path = os.path.join(ROOT, outdir, "result.json")
    if proc.returncode != 0 or not os.path.exists(result_path):
        sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
        return {"seed": seed, "variant": variant, "error": proc.returncode,
                "wall_s": round(wall, 1)}
    with open(result_path) as f:
        res = json.load(f)
    return {
        "seed": seed, "variant": variant, "wall_s": round(wall, 1),
        "psnr": res.get("PSNR"), "ate_rmse": res.get("ATE RMSE"),
        "ssim": res.get("MS-SSIM"), "depth_l1": res.get("Depth L1"),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--height", type=int, default=340)
    ap.add_argument("--width", type=int, default=600)
    ap.add_argument("--variants", nargs="+", default=list(VARIANTS))
    ap.add_argument("--out", default="output/quality_ab.json")
    args = ap.parse_args()

    # seed-major order: one complete single-seed table over ALL variants
    # lands first (usable if the sweep is cut short); later seeds refine.
    # Resume: (seed, variant) pairs already in --out are skipped.
    rows = []
    os.makedirs(os.path.join(ROOT, os.path.dirname(args.out)), exist_ok=True)
    out_path = os.path.join(ROOT, args.out)
    if os.path.exists(out_path):
        with open(out_path) as f:
            rows = [json.loads(line) for line in f if line.strip()]
    done = {(r["seed"], r["variant"]) for r in rows if "psnr" in r}
    for seed in args.seeds:
        for variant in args.variants:
            if (seed, variant) in done:
                continue
            outdir = f"output/ab_{variant}_s{seed}"
            row = run_one(seed, variant, args.frames, args.height,
                          args.width, outdir)
            rows.append(row)
            with open(out_path, "w") as f:
                for r in rows:
                    f.write(json.dumps(r) + "\n")
            print(json.dumps(row), flush=True)

    # aggregate table (markdown, for PERF.md)
    import statistics as st

    print("\n| variant | PSNR (dB) | ATE-RMSE | runs |")
    print("|---|---|---|---|")
    for variant in args.variants:
        vs = [r for r in rows if r["variant"] == variant and "psnr" in r
              and r["psnr"] is not None]
        if not vs:
            print(f"| {variant} | failed | failed | 0 |")
            continue
        p = [r["psnr"] for r in vs]
        a = [r["ate_rmse"] for r in vs]
        pm = st.mean(p)
        ps = st.stdev(p) if len(p) > 1 else 0.0
        am = st.mean(a)
        asd = st.stdev(a) if len(a) > 1 else 0.0
        print(f"| {variant} | {pm:.2f} +- {ps:.2f} | {am:.4f} +- {asd:.4f} "
              f"| {len(vs)} |")


if __name__ == "__main__":
    main()
