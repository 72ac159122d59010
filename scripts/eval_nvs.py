#!/usr/bin/env python
"""Novel-view-synthesis evaluation on held-out test frames
(reference scripts/eval_nvs.py + utils/eval.py:120-251).

For datasets with a train/test split (ScanNet++), each test pose is
first refined by tracking against the frozen final map, then rendered
and scored — writes nvs_result.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene_dir")
    ap.add_argument("--backend", default="pallas")
    ap.add_argument("--no_pose_refine", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp

    from gaus_slam_tpu.data import get_dataset
    from gaus_slam_tpu.models.frame import LrSchedule, init_pose
    from gaus_slam_tpu.ops.composite_ref import image_to_tiles, tiles_to_image
    from gaus_slam_tpu.render import bin_for_tracking
    from gaus_slam_tpu.slam.loss import normalized_depth
    from gaus_slam_tpu.slam.steps import TrackConfig, tracking_loop
    from gaus_slam_tpu.utils.config import SystemConfig
    from gaus_slam_tpu.utils.image_metrics import lpips, ms_ssim, psnr
    from gaus_slam_tpu.utils.scene_io import load_scene
    from gaus_slam_tpu.render import render_view

    config, gm, w2cs, gt_w2cs = load_scene(args.scene_dir)
    data_cfg = dict(config["data"])
    if data_cfg["dataset_name"].lower() == "scannetpp":
        data_cfg["split"] = "test"
    dataset = get_dataset(data_cfg)
    sys_cfg = SystemConfig.from_config(config, backend=args.backend)
    cam, opts, lcfg = sys_cfg.cam, sys_cfg.opts, sys_cfg.lcfg

    tcfg = TrackConfig(
        num_iters=100, converged_th=-1.0,
        rot_sched=LrSchedule(4e-4, 4e-5, 100),
        trans_sched=LrSchedule(2e-3, 2e-4, 100),
    )

    psnrs, ssims, lpipss, l1s = [], [], [], []
    for i in range(len(dataset)):
        color, depth, _, c2w = dataset[i]
        gt_color = jnp.asarray(color, jnp.float32) / 255.0
        gt_depth = jnp.asarray(np.asarray(depth).squeeze(), jnp.float32)
        w2c = jnp.asarray(np.linalg.inv(c2w), jnp.float32)

        if not args.no_pose_refine:
            pose = init_pose(w2c)
            cache = bin_for_tracking(gm, cam.replace_w2c(w2c), opts)
            gt = image_to_tiles(
                jnp.concatenate([gt_color.transpose(2, 0, 1),
                                 gt_depth[None]], 0), opts.grid)
            pose, _ = tracking_loop(cache, pose, gt, cam, opts, tcfg, lcfg)
            w2c = pose.w2c

        out = render_view(gm, cam.replace_w2c(w2c), opts)
        img = tiles_to_image(
            jnp.concatenate([out[:, 0:3],
                             normalized_depth(out, lcfg)[:, None]], 1),
            opts.grid, cam.height, cam.width)
        rgb = jnp.clip(img[:3].transpose(1, 2, 0), 0, 1)
        valid = gt_depth > 0
        psnrs.append(float(psnr(rgb, gt_color, mask=valid)))
        ssims.append(float(ms_ssim(rgb, gt_color)))
        lpipss.append(lpips(np.asarray(rgb), np.asarray(gt_color)))
        diff = np.where(np.asarray(valid), np.asarray(img[3] - gt_depth), 0)
        l1s.append(float(np.abs(diff).sum() / max(valid.sum(), 1)))

    result = {
        "NVS PSNR": float(np.mean(psnrs)),
        "NVS MS-SSIM": float(np.mean(ssims)),
        "NVS LPIPS": float(np.nanmean(lpipss)),
        "NVS Depth L1": float(np.mean(l1s)),
        "num_views": len(psnrs),
    }
    with open(os.path.join(args.scene_dir, "nvs_result.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(result)


if __name__ == "__main__":
    main()
