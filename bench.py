#!/usr/bin/env python
"""Benchmark: full SLAM (frontend tracking + mapping + backend merge/BA)
on a synthetic Replica-like RGB-D sequence, on the attached accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N, ...}

Baseline: the reference CUDA system reports 0.56 FPS end-to-end on
Replica Room0 at 680x1200 on an RTX 4090 (README.md:120-123). Without
Replica data in this environment the workload is the procedural
synthetic scene at the same resolution scale (340x600 = the half-res
Replica setting); the metric is steady-state frames/s after compile
warm-up, covering tracking + keyframe mapping + submap handoff + backend
processing.
"""
from __future__ import annotations

import json
import os
import queue
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

H = int(os.environ.get("BENCH_H", 340))
W = int(os.environ.get("BENCH_W", 600))
N_FRAMES = int(os.environ.get("BENCH_FRAMES", 14))
WARM = int(os.environ.get("BENCH_WARM", 4))


def main():
    import jax
    import numpy as np

    os.environ["SYN_H"] = str(H)
    os.environ["SYN_W"] = str(W)
    os.environ["SYN_FRAMES"] = str(N_FRAMES)

    from gaus_slam_tpu.data import get_dataset
    from gaus_slam_tpu.slam.backend import Backend
    from gaus_slam_tpu.slam.frontend import Frontend
    from gaus_slam_tpu.utils.config import load_config, probe_cameras

    backend_name = ("pallas" if jax.default_backend() in ("tpu", "axon")
                    else "interpret")

    config = load_config(
        os.path.join(os.path.dirname(__file__), "configs", "synthetic",
                     "config.py")
    )
    config["data"]["num_frames"] = N_FRAMES
    dataset = get_dataset(config["data"])
    color0, depth0, intrinsics, _ = dataset[0]
    probe_cameras(config, color0, intrinsics)

    to_backend = queue.Queue()
    frontend = Frontend(config, to_backend, backend=backend_name)
    backend_ = Backend(config, backend=backend_name)

    frames = [dataset[i] for i in range(N_FRAMES)]
    t_mark = None
    for t in range(N_FRAMES):
        if t == WARM:
            jax.block_until_ready(frontend.map.params.xyz)
            t_mark = time.perf_counter()
        color, depth, _, c2w = frames[t]
        frontend.process_frame(t, np.asarray(color) / 255.0,
                               np.asarray(depth), c2w)
        while not to_backend.empty():
            backend_.process_localmap(to_backend.get(), multi_process=False)
    jax.block_until_ready(frontend.map.params.xyz)
    dt = time.perf_counter() - t_mark
    fps = (N_FRAMES - WARM) / dt

    ts = frontend.time_stats()
    print(json.dumps({
        "metric": f"synthetic_{H}x{W}_slam_fps",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 0.56, 2),
        "tracking_iter_ms": round(ts["tracking_iter_time(ms)"], 2),
        "mapping_iter_ms": round(ts["mapping_iter_time(ms)"], 2),
        "num_gaussians": int(frontend.map.n_active),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
