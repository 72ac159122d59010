#!/usr/bin/env python
"""Re-evaluate a saved scene checkpoint (reference scripts/eval.py)."""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene_dir", help="directory with config.json + gaussians.ply")
    ap.add_argument("--backend", default="pallas")
    ap.add_argument("--eval_mesh", action="store_true")
    args = ap.parse_args()

    from gaus_slam_tpu.data import get_dataset
    from gaus_slam_tpu.utils.eval import eval_final
    from gaus_slam_tpu.utils.scene_io import load_scene

    config, gm, w2cs, gt_w2cs = load_scene(args.scene_dir)
    dataset = get_dataset(config["data"])
    result = eval_final(config, gm, list(w2cs), list(gt_w2cs), dataset,
                        out_dir=args.scene_dir, backend=args.backend)
    print(result)

    if args.eval_mesh:
        from gaus_slam_tpu.utils.eval_mesh import (evaluate_reconstruction,
                                                   load_gt_mesh_assets)

        gt_mesh, unseen_pc, gt_points = load_gt_mesh_assets(config, dataset)
        metrics = evaluate_reconstruction(
            config, gm, list(w2cs), gt_points, out_dir=args.scene_dir,
            backend=args.backend,
            mesh_interval=config.get("eval", {}).get("mesh_interval", 5),
            voxel_size=config.get("eval", {}).get("voxel_size", 0.01),
            gt_mesh=gt_mesh, unseen_pc=unseen_pc,
        )
        print(metrics)


if __name__ == "__main__":
    main()
