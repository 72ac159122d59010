#!/usr/bin/env python
"""Headless scene inspector (reference scripts/vis_final.py replaces an
interactive Open3D viewer; this renders an orbit of novel views + the
TSDF mesh snapshot into an output folder)."""
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
    ap.add_argument("--num_views", type=int, default=24)
    ap.add_argument("--mesh", action="store_true")
    args = ap.parse_args()

    import imageio.v2 as imageio
    import jax.numpy as jnp

    from gaus_slam_tpu.ops.composite_ref import tiles_to_image
    from gaus_slam_tpu.render import render_view
    from gaus_slam_tpu.utils.config import SystemConfig
    from gaus_slam_tpu.utils.scene_io import load_scene

    config, gm, w2cs, _ = load_scene(args.scene_dir)
    s = SystemConfig.from_config(config, backend=args.backend)
    out_dir = os.path.join(args.scene_dir, "views")
    os.makedirs(out_dir, exist_ok=True)

    idxs = np.linspace(0, len(w2cs) - 1, args.num_views).astype(int)
    for i in idxs:
        out = render_view(
            gm, s.cam.replace_w2c(jnp.asarray(w2cs[i], jnp.float32)), s.opts)
        img = tiles_to_image(out[:, 0:3], s.opts.grid,
                             s.cam.height, s.cam.width)
        rgb = np.clip(np.asarray(img).transpose(1, 2, 0) * 255, 0,
                      255).astype(np.uint8)
        imageio.imwrite(os.path.join(out_dir, f"view_{i:05d}.png"), rgb)
    print(f"wrote {len(idxs)} views to {out_dir}")

    if args.mesh:
        from gaus_slam_tpu.utils.eval_mesh import fuse_render_mesh

        verts, cols, tris = fuse_render_mesh(
            config, gm, list(w2cs), out_dir=args.scene_dir,
            backend=args.backend)
        print(f"mesh: {len(verts)} vertices -> {args.scene_dir}/mesh.npz")


if __name__ == "__main__":
    main()
