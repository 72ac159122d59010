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
    tpu_cfg = config.get("tpu", {})
    quantum = int(tpu_cfg.get("capacity_quantum", 1 << 17))
    margin = float(tpu_cfg.get("capacity_margin", 1.3))
    cap_floor = int(tpu_cfg.get("backend_capacity", 0))

    def fit_capacity(gm, headroom=0):
        """Grow the single global map like the frontend does — a long
        run must never hit the static capacity and silently drop
        densified gaussians (add_gaussians scatters with mode='drop')."""
        n = int(gm.n_active) + headroom
        cap = G.bucket_capacity(n, quantum, margin, cap_floor)
        return G.resize_map(gm, cap) if cap > gm.capacity else gm

    gms = []  # (gt_tiled, w2c) keyframe store
    w2cs, gt_w2cs, descs = [], [], []
    gm = None
    vel = np.eye(4, dtype=np.float32)
    exp = init_exposure()
    t_track = [0.0, 0]
    t_map = [0.0, 0]
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
            cap = G.bucket_capacity(depth.size, quantum, margin, cap_floor)
            gm = initialize_map(cap, gt_color, gt_depth,
                                jnp.eye(4, dtype=jnp.float32), s.cam)
            w2c = np.eye(4, dtype=np.float32)
        else:
            tt0 = time.perf_counter()
            init_w2c = vel @ w2cs[-1]
            pose = init_pose(init_w2c)
            cache = bin_for_tracking(gm, s.cam.replace_w2c(pose.w2c), s.opts)
            pose, _ = tracking_loop(cache, pose, gt_tiled, s.cam, s.opts,
                                    s.track_front, s.lcfg)
            w2c = np.asarray(pose.w2c)
            vel = w2c @ np.linalg.inv(w2cs[-1])
            t_track[0] += time.perf_counter() - tt0
            t_track[1] += 1

        w2cs.append(w2c)
        gt_w2cs.append(gt_w2c)
        d = np.asarray(describe_image(gt_color))
        is_kf = t == 0 or t % kf_every == 0
        if not is_kf and descs:
            sim = max(float(np.dot(d, q)) for q in descs[-20:])
            is_kf = sim < desc_th  # novel view
        if is_kf:
            tm0 = time.perf_counter()
            descs.append(d)
            w2cj = jnp.asarray(w2c, jnp.float32)
            # keyframe densify can add up to one gaussian per pixel:
            # make room BEFORE the scatter (mode='drop' would silently
            # discard the overflow on a full map — r2 weak #5)
            gm = fit_capacity(gm, headroom=depth.size)
            out = render_view(gm, s.cam.replace_w2c(w2cj), s.opts)
            gm = add_new_gaussians(gm, w2cj, gt_color, gt_depth, out,
                                   s.cam, s.opts, s.dcfg, s.lcfg)
            gms.append((gt_tiled, w2cj))
            n_map = config["frontend"]["num_mapping_iters"]
            for _ in range(n_map):
                gt_i, w2c_i = gms[rng.randrange(len(gms))]
                gm, exp, _ = mapping_step(
                    gm, w2c_i, gt_i, exp, jnp.bool_(False),
                    s.exp_sched_front, s.cam, s.opts, s.mcfg, s.lcfg)
            gm = prune_gaussians(gm, s.dcfg)
            t_map[0] += time.perf_counter() - tm0
            t_map[1] += n_map

    # final refinement over random keyframes (reference splatam.py:255-264)
    for _ in range(num_frames):
        gt_i, w2c_i = gms[rng.randrange(len(gms))]
        gm, exp, _ = mapping_step(gm, w2c_i, gt_i, exp, jnp.bool_(False),
                                  s.exp_sched_front, s.cam, s.opts, s.mcfg,
                                  s.lcfg)

    total = time.perf_counter() - t0
    print(f"fps: {num_frames / total:.3f}")
    out_dir = config.get("vis_base_dir", "output") + "_splatam"
    os.makedirs(out_dir, exist_ok=True)
    # time.json contract (reference splatam.py:266-287)
    import json

    with open(os.path.join(out_dir, "time.json"), "w") as f:
        json.dump({
            "tracking_iter_time(ms)": t_track[0] / max(t_track[1], 1) * 1000,
            "tracking_frame_time(s)": t_track[0] / max(t_track[1], 1),
            "mapping_iter_time(ms)": t_map[0] / max(t_map[1], 1) * 1000,
            "mapping_frame_time(s)": t_map[0] / max(len(gms), 1),
            "frame_time": total / num_frames,
        }, f)
    result = eval_final(config, gm, w2cs, gt_w2cs, dataset, out_dir=out_dir,
                        backend=backend)
    print(result)
    # scene checkpoint contract (reference splatam.py:288-291 save_scence)
    from gaus_slam_tpu.utils.scene_io import save_scene

    save_scene(config, gm, w2cs, gt_w2cs, os.path.join(out_dir, "scene"))
    return result


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--backend", default="pallas")
    args = ap.parse_args()
    from gaus_slam_tpu.utils.config import load_config

    rgbd_slam(load_config(args.config), backend=args.backend)
