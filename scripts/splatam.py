#!/usr/bin/env python
"""SplaTAM-style baseline without submaps (reference scripts/splatam.py).

One global map for the whole run: per-frame tracking against it,
keyframe selection by descriptor novelty, densify + mapping on
keyframes. Serves as the "no-localmap" comparison baseline (reference
README.md:163-168, ablation F).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def rgbd_slam(config: dict, backend: str = "pallas") -> dict:
    import jax.numpy as jnp

    from gaus_slam_tpu.data import get_dataset
    from gaus_slam_tpu.models import gaussians as G
    from gaus_slam_tpu.models.descriptor import describe_image
    from gaus_slam_tpu.models.frame import init_exposure, init_pose
    from gaus_slam_tpu.ops.composite_ref import image_to_tiles
    from gaus_slam_tpu.render import bin_for_tracking, render_view
    from gaus_slam_tpu.slam.densify import add_new_gaussians, prune_gaussians
    from gaus_slam_tpu.slam.init_map import initialize_map
    from gaus_slam_tpu.slam.steps import mapping_step, tracking_loop
    from gaus_slam_tpu.utils.config import SystemConfig, probe_cameras
    from gaus_slam_tpu.utils.eval import eval_final
    from scripts.gaus import seed_everything

    seed_everything(config.get("seed", 0))
    dataset = get_dataset(config["data"])
    num_frames = config["data"].get("num_frames", -1)
    if num_frames == -1:
        num_frames = len(dataset)
    color0, depth0, intrinsics, _ = dataset[0]
    probe_cameras(config, color0, intrinsics)
    s = SystemConfig.from_config(config, backend=backend)

    import random
    rng = random.Random(config.get("seed", 0))
    kf_every = int(config.get("splatam", {}).get("keyframe_every", 8))
    desc_th = float(config.get("splatam", {}).get("desc_threshold", 0.8))

    gms = []  # (gt_tiled, w2c) keyframe store
    w2cs, gt_w2cs, descs = [], [], []
    gm = None
    vel = np.eye(4, dtype=np.float32)
    exp = init_exposure()
    t0 = time.perf_counter()

    for t in range(num_frames):
        color, depth, _, c2w = dataset[t]
        depth = np.asarray(depth).squeeze()
        gt_color = jnp.asarray(np.asarray(color) / 255.0, jnp.float32)
        gt_depth = jnp.asarray(depth, jnp.float32)
        gt_w2c = np.linalg.inv(np.asarray(c2w))
        gt_tiled = image_to_tiles(
            jnp.concatenate([gt_color.transpose(2, 0, 1), gt_depth[None]], 0),
            s.opts.grid)

        if t == 0:
            cap = max(1 << 17, int(depth.size * 1.3))
            gm = initialize_map(cap, gt_color, gt_depth,
                                jnp.eye(4, dtype=jnp.float32), s.cam)
            w2c = np.eye(4, dtype=np.float32)
        else:
            init_w2c = vel @ w2cs[-1]
            pose = init_pose(init_w2c)
            cache = bin_for_tracking(gm, s.cam.replace_w2c(pose.w2c), s.opts)
            pose, _ = tracking_loop(cache, pose, gt_tiled, s.cam, s.opts,
                                    s.track_front, s.lcfg)
            w2c = np.asarray(pose.w2c)
            vel = w2c @ np.linalg.inv(w2cs[-1])

        w2cs.append(w2c)
        gt_w2cs.append(gt_w2c)
        d = np.asarray(describe_image(gt_color))
        is_kf = t == 0 or t % kf_every == 0
        if not is_kf and descs:
            sim = max(float(np.dot(d, q)) for q in descs[-20:])
            is_kf = sim < desc_th  # novel view
        if is_kf:
            descs.append(d)
            w2cj = jnp.asarray(w2c, jnp.float32)
            out = render_view(gm, s.cam.replace_w2c(w2cj), s.opts)
            gm = add_new_gaussians(gm, w2cj, gt_color, gt_depth, out,
                                   s.cam, s.opts, s.dcfg, s.lcfg)
            gms.append((gt_tiled, w2cj))
            for _ in range(config["frontend"]["num_mapping_iters"]):
                gt_i, w2c_i = gms[rng.randrange(len(gms))]
                gm, exp, _ = mapping_step(
                    gm, w2c_i, gt_i, exp, jnp.bool_(False),
                    s.exp_sched_front, s.cam, s.opts, s.mcfg, s.lcfg)
            gm = prune_gaussians(gm, s.dcfg)

    total = time.perf_counter() - t0
    print(f"fps: {num_frames / total:.3f}")
    out_dir = config.get("vis_base_dir", "output") + "_splatam"
    result = eval_final(config, gm, w2cs, gt_w2cs, dataset, out_dir=out_dir,
                        backend=backend)
    print(result)
    return result


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--backend", default="pallas")
    args = ap.parse_args()
    from gaus_slam_tpu.utils.config import load_config

    rgbd_slam(load_config(args.config), backend=args.backend)
