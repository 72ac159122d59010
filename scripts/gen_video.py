#!/usr/bin/env python
"""Render a flythrough video from a saved scene (reference
scripts/gen_video.py — mesh video via Open3D there; here rendered
RGB/depth along the estimated trajectory via the TPU rasterizer)."""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene_dir")
    ap.add_argument("--backend", default="pallas")
    ap.add_argument("--fps", type=int, default=30)
    ap.add_argument("--stride", type=int, default=2)
    args = ap.parse_args()

    import jax.numpy as jnp

    from gaus_slam_tpu.ops.composite_ref import tiles_to_image
    from gaus_slam_tpu.render import render_view
    from gaus_slam_tpu.slam.loss import normalized_depth
    from gaus_slam_tpu.utils.config import SystemConfig
    from gaus_slam_tpu.utils.scene_io import load_scene
    from gaus_slam_tpu.utils.viz import frames_to_video

    config, gm, w2cs, _ = load_scene(args.scene_dir)
    s = SystemConfig.from_config(config, backend=args.backend)
    frames = []
    for i in range(0, len(w2cs), args.stride):
        out = render_view(
            gm, s.cam.replace_w2c(jnp.asarray(w2cs[i], jnp.float32)), s.opts)
        img = tiles_to_image(
            jnp.concatenate([out[:, 0:3],
                             normalized_depth(out, s.lcfg)[:, None]], 1),
            s.opts.grid, s.cam.height, s.cam.width)
        rgb = np.clip(np.asarray(img[:3]).transpose(1, 2, 0), 0, 1)
        d = np.asarray(img[3])
        dn = np.clip(d / max(d.max(), 1e-6), 0, 1)
        frames.append(np.concatenate(
            [rgb, np.repeat(dn[..., None], 3, -1)], axis=1))
    out_path = os.path.join(args.scene_dir, "flythrough.mp4")
    frames_to_video(frames, out_path, fps=args.fps)
    print(f"wrote {out_path} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
