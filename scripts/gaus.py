#!/usr/bin/env python
"""Single-process SLAM driver (reference scripts/gaus.py).

Usage: python scripts/gaus.py <config.py> [--backend pallas|interpret]

Loads the experiment config module, streams the dataset through the
frontend, synchronously drains submaps into the backend, runs the final
refinement + evaluation, and saves the scene checkpoint.
"""
from __future__ import annotations

import argparse
import os
import queue
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def seed_everything(seed: int):
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)


def make_wandb_run(config: dict):
    """wandb init (reference scripts/gaus.py:31-43); returns None when
    disabled or the package is unavailable."""
    if not config.get("use_wandb", False):
        return None
    try:
        import wandb

        wcfg = config.get("wandb", {})
        return wandb.init(project=wcfg.get("project_name", "gaus_slam_tpu"),
                          name=wcfg.get("name"), config=config)
    except Exception as e:  # noqa: BLE001
        print(f"wandb disabled ({e})")
        return None


def rgbd_slam(config: dict, backend: str = "pallas",
              resume_from: str | None = None) -> dict:
    from gaus_slam_tpu.data import get_dataset
    from gaus_slam_tpu.slam.backend import Backend
    from gaus_slam_tpu.slam.frontend import Frontend
    from gaus_slam_tpu.utils.checkpoint import (restore_run_state,
                                                save_run_state)
    from gaus_slam_tpu.utils.config import probe_cameras
    from gaus_slam_tpu.utils.eval import eval_final
    from gaus_slam_tpu.utils.scene_io import save_scene

    seed_everything(config.get("seed", 0))
    dataset = get_dataset(config["data"])
    num_frames = config["data"].get("num_frames", -1)
    if num_frames == -1:
        num_frames = len(dataset)

    color0, depth0, intrinsics, _ = dataset[0]
    probe_cameras(config, color0, intrinsics)

    wandb_run = make_wandb_run(config)
    to_backend = queue.Queue()
    frontend = Frontend(config, to_backend, wandb_run=wandb_run,
                        backend=backend)
    # multi-device host: shard the backend's BA over a mesh
    # (tpu.mesh_devices knob; None on single-chip hosts)
    from gaus_slam_tpu.parallel import mesh_from_config

    mesh = mesh_from_config(config)
    if mesh is not None:
        print(f"[gaus] backend BA sharded over {mesh.devices.size} devices")
    backend_ = Backend(config, wandb_run=wandb_run, backend=backend,
                       mesh=mesh)

    out_dir = config.get("vis_base_dir", "output")
    save_ckpt = bool(config.get("backend", {}).get("save_ckpt", False))
    t0_frame = 0
    if resume_from is not None:
        t0_frame = restore_run_state(resume_from, frontend, backend_,
                                     dataset)
        print(f"resumed from {resume_from} at frame {t0_frame}")

    t_start = time.perf_counter()
    for t in range(t0_frame, num_frames):
        color, depth, _, c2w = dataset[t]
        depth = np.asarray(depth)
        if depth.ndim == 3:
            depth = depth[..., 0]
        frontend.process_frame(t, np.asarray(color, np.float32) / np.float32(255), depth, c2w)
        submap_done = False
        while not to_backend.empty():
            backend_.process_localmap(to_backend.get(), multi_process=False)
            submap_done = True
        if submap_done:
            # per-submap dashboards + resumable checkpoint
            # (reference gaus.py:92-95 + Backend.py:271-331)
            backend_.update_common_visualization()
            frontend.update_common_visualization()
            if save_ckpt:
                save_run_state(os.path.join(out_dir, "ckpt"), frontend,
                               backend_, next_frame_idx=t + 1)
        if t % 25 == 0:
            print(f"frame {t}/{num_frames} "
                  f"pts={int(frontend.map.n_active)} "
                  f"global={int(backend_.map.n_active) if backend_.map is not None else 0}")

    frontend.process_final()
    while not to_backend.empty():
        backend_.process_localmap(to_backend.get(), multi_process=False)
    backend_.final_refine(progress=True)

    frontend.total_time = time.perf_counter() - t_start
    frontend.write_time_json()

    w2cs = backend_.local_maps.get_w2cs()
    gt_w2cs = backend_.local_maps.get_gt_w2cs()
    result = eval_final(config, backend_.map, w2cs, gt_w2cs, dataset,
                        out_dir=out_dir, backend=backend,
                        save_renders=config.get("eval", {}).get(
                            "save_renders", False))
    print(json.dumps(result, indent=2) if (json := __import__("json")) else "")
    save_scene(config, backend_.map, w2cs, gt_w2cs,
               os.path.join(out_dir, "scene"))
    if wandb_run is not None:
        wandb_run.log(result)
        wandb_run.finish()
    return result


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--backend", default="pallas")
    ap.add_argument("--resume", default=None,
                    help="resume from a mid-run checkpoint dir")
    args = ap.parse_args()

    from gaus_slam_tpu.utils.config import load_config

    config = load_config(args.config)
    rgbd_slam(config, backend=args.backend, resume_from=args.resume)
