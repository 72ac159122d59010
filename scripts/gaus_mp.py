#!/usr/bin/env python
"""Pipelined SLAM driver (reference scripts/gaus_mp.py).

The reference runs DataFeeder / Frontend / Backend as three processes
with CUDA-tensor queues. On TPU a single process owns the chip, so the
pipeline maps to three host THREADS: the data feeder prefetches +
decodes frames ahead of the frontend (hiding disk/cv2 latency — these
release the GIL), the frontend drives its jitted step programs, and the
backend interleaves its task queue between frontend dispatches. Device
work from the two SLAM stages naturally interleaves through XLA's async
dispatch stream; queue backpressure matches the reference
(feeder sleeps at qsize>5, frontend waits at to_backend qsize>1).
"""
from __future__ import annotations

import argparse
import os
import queue
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def datafeeder(dataset, num_frames, data_flow: queue.Queue,
               stop_event: threading.Event, start_frame: int = 0):
    """Prefetch + decode frames (reference gaus_mp.py DataFeeder:68-79).

    Frames are staged onto the device here (``jax.device_put`` returns
    immediately; the H2D DMA rides behind the frontend's in-flight
    compute) — the analogue of the reference's pinned-memory CUDA-tensor
    queue. Transfer rides native camera dtypes (uint8 color / uint16
    depth, utils/stage.py) — ~3.6x fewer bytes through the host tunnel;
    the frontend dequantizes on-device."""
    import jax

    from gaus_slam_tpu.utils.stage import pack_frame

    for t in range(start_frame, num_frames):
        if stop_event.is_set():
            return
        while data_flow.qsize() > 5:
            time.sleep(0.01)
        color, depth, _, c2w = dataset[t]
        depth = np.asarray(depth)
        if depth.ndim == 3:
            depth = depth[..., 0]
        color8, depth_t = pack_frame(color, depth)
        data_flow.put((
            t,
            jax.device_put(color8),
            jax.device_put(depth_t),
            c2w,
        ))
    data_flow.put("finish")


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
    from scripts.gaus import make_wandb_run, seed_everything

    seed_everything(config.get("seed", 0))
    dataset = get_dataset(config["data"])
    num_frames = config["data"].get("num_frames", -1)
    if num_frames == -1:
        num_frames = len(dataset)
    color0, _, intrinsics, _ = dataset[0]
    probe_cameras(config, color0, intrinsics)

    data_flow: queue.Queue = queue.Queue()
    to_backend: queue.Queue = queue.Queue()
    stop_event = threading.Event()
    wandb_run = make_wandb_run(config)
    frontend = Frontend(config, to_backend, wandb_run=wandb_run,
                        backend=backend)
    from gaus_slam_tpu.parallel import mesh_from_config

    mesh = mesh_from_config(config)
    if mesh is not None:
        print(f"[gaus] backend BA sharded over {mesh.devices.size} devices")
    backend_ = Backend(config, wandb_run=wandb_run, backend=backend,
                       mesh=mesh)
    sleep_time = float(config["backend"].get("sleep_time", 0.01))
    out_dir = config.get("vis_base_dir", "output")
    save_ckpt = bool(config.get("backend", {}).get("save_ckpt", False))
    t0_frame = 0
    if resume_from is not None:
        t0_frame = restore_run_state(resume_from, frontend, backend_,
                                     dataset)
        print(f"resumed from {resume_from} at frame {t0_frame}")
    last_frame = t0_frame - 1

    feeder = threading.Thread(
        target=datafeeder,
        args=(dataset, num_frames, data_flow, stop_event, t0_frame),
        daemon=True,
    )
    feeder.start()

    t_start = time.perf_counter()
    finished = False
    while not (finished and data_flow.empty() and to_backend.empty()
               and backend_.task_queue.empty()):
        # frontend: one frame per loop turn
        if not data_flow.empty():
            msg = data_flow.get()
            if isinstance(msg, str) and msg == "finish":
                finished = True
                frontend.process_final()
            else:
                t, color, depth, c2w = msg
                frontend.process_frame(t, color, depth, c2w)
                last_frame = t
                if t % 10 == 0:
                    # reference mp_Frontend.run:277-278
                    frontend.update_common_visualization()
        # backend: absorb submaps + drain a few tasks per turn
        if not to_backend.empty():
            backend_.process_localmap(to_backend.get(), multi_process=True)
            backend_.update_common_visualization()  # Backend.py:366
            if save_ckpt:
                # same resumable-checkpoint cadence as scripts/gaus.py
                save_run_state(os.path.join(out_dir, "ckpt"), frontend,
                               backend_, next_frame_idx=last_frame + 1)
        for _ in range(4):
            if not backend_.task_queue.empty():
                backend_.process()
            elif data_flow.empty() and not finished:
                # genuinely idle (frontend starved for data): the
                # reference's random_process fills exactly these gaps
                # (Backend.py:192-194); running it while frames are
                # pending would slow the frontend, which the reference's
                # separate backend process never does
                backend_.process()
            else:
                break
        if sleep_time:
            time.sleep(sleep_time if data_flow.empty() else 0)
    stop_event.set()
    total = time.perf_counter() - t_start

    backend_.final_refine(progress=True)
    frontend.total_time = total
    frontend.write_time_json()

    w2cs = backend_.local_maps.get_w2cs()
    gt_w2cs = backend_.local_maps.get_gt_w2cs()
    out_dir = config.get("vis_base_dir", "output")
    result = eval_final(config, backend_.map, w2cs, gt_w2cs, dataset,
                        out_dir=out_dir, backend=backend)
    print(result)
    save_scene(config, backend_.map, w2cs, gt_w2cs,
               os.path.join(out_dir, "scene"))
    return result


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--backend", default="pallas")
    ap.add_argument("--resume", default=None,
                    help="resume from a mid-run checkpoint dir")
    args = ap.parse_args()
    from gaus_slam_tpu.utils.config import load_config

    rgbd_slam(load_config(args.config), backend=args.backend,
              resume_from=args.resume)
