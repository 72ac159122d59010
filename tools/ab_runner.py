#!/usr/bin/env python
"""One quality-A/B variant, all seeds, in ONE process.

jax traces are per-process: a fresh subprocess per (seed, variant) pays
the full trace+lower storm (~minutes on this 1-core host) every run,
but seeds of the SAME variant share every program shape — so looping
seeds in-process amortizes tracing 3x. Variants still get their own
subprocess (their env knobs change static config -> different programs
anyway, and process isolation keeps the TPU client lifecycle simple).

Called by tools/quality_ab.py; prints one JSON row per seed on stdout.
"""
from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", required=True)
    ap.add_argument("--env", default="{}",
                    help="JSON dict of env overrides for this variant")
    ap.add_argument("--seeds", type=int, nargs="+", required=True)
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--height", type=int, default=340)
    ap.add_argument("--width", type=int, default=600)
    args = ap.parse_args()

    os.environ.update(json.loads(args.env))
    os.environ.update({
        "SYN_H": str(args.height), "SYN_W": str(args.width),
        "SYN_FRAMES": str(args.frames),
    })

    import jax

    from gaus_slam_tpu.utils.config import load_config
    from scripts.gaus import rgbd_slam

    backend = ("pallas" if jax.default_backend() in ("tpu", "axon")
               else "interpret")

    for seed in args.seeds:
        outdir = f"output/ab_{args.variant}_s{seed}"
        os.environ["SEED"] = str(seed)
        os.environ["SYN_OUT"] = outdir
        t0 = time.time()
        try:
            config = load_config(
                os.path.join(ROOT, "configs", "synthetic", "config.py"))
            res = rgbd_slam(config, backend=backend)
            row = {
                "seed": seed, "variant": args.variant,
                "wall_s": round(time.time() - t0, 1),
                "psnr": res.get("PSNR"), "ate_rmse": res.get("ATE RMSE"),
                "ssim": res.get("MS-SSIM"), "depth_l1": res.get("Depth L1"),
            }
        except Exception as e:  # noqa: BLE001 - report, keep sweeping
            row = {"seed": seed, "variant": args.variant,
                   "error": repr(e)[:300],
                   "wall_s": round(time.time() - t0, 1)}
        print("ABROW " + json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
