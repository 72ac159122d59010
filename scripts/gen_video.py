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


def mesh_flythrough(scene_dir: str, backend: str, fps: int,
                    n_frames: int = 180, size: int = 480):
    """TSDF-mesh orbit animation — the headless analogue of the
    reference's gen_animation Open3D capture (open3d_ui/vis_mesh.py:
    319-325): fuse the final mesh from renders, then z-buffer-splat
    colored surface samples along a circular orbit around the scene."""
    import jax.numpy as jnp

    from gaus_slam_tpu.utils.config import SystemConfig
    from gaus_slam_tpu.utils.eval_mesh import (_oriented_bounds, _viewmatrix,
                                               fuse_render_mesh)
    from gaus_slam_tpu.utils.scene_io import load_scene
    from gaus_slam_tpu.utils.viz import frames_to_video

    config, gm, w2cs, _ = load_scene(scene_dir)
    verts, cols, tris = fuse_render_mesh(
        config, gm, list(w2cs), out_dir=scene_dir, backend=backend,
        mesh_interval=config.get("eval", {}).get("mesh_interval", 5),
        voxel_size=config.get("eval", {}).get("voxel_size", 0.01))

    # colored surface samples (area-weighted, barycentric color interp)
    rng = np.random.default_rng(0)
    n = 2_000_000
    v0, v1, v2 = verts[tris[:, 0]], verts[tris[:, 1]], verts[tris[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1)
    p = area / max(area.sum(), 1e-12)
    idx = rng.choice(len(tris), n, p=p)
    u, v = rng.random(n), rng.random(n)
    flip = u + v > 1
    u[flip], v[flip] = 1 - u[flip], 1 - v[flip]
    w = 1 - u - v
    pts = (w[:, None] * v0[idx] + u[:, None] * v1[idx]
           + v[:, None] * v2[idx])
    c0, c1, c2 = cols[tris[idx, 0]], cols[tris[idx, 1]], cols[tris[idx, 2]]
    pcol = w[:, None] * c0 + u[:, None] * c1 + v[:, None] * c2

    extents, to_world = _oriented_bounds(verts)
    center = to_world[:3, 3]
    radius = 0.7 * float(np.linalg.norm(extents[:2]) / 2)
    focal = size * 0.8
    cx = cy = size / 2.0 - 0.5
    frames = []
    for k in range(n_frames):
        th = 2 * np.pi * k / n_frames
        local = np.array([radius * np.cos(th), radius * np.sin(th),
                          -0.4 * extents[2]])
        origin = to_world[:3, :3] @ local + center
        c2w = _viewmatrix(center - origin, np.array([0.0, 0.0, -1.0]),
                          origin)
        w2c = np.linalg.inv(c2w)
        pc = pts @ w2c[:3, :3].T + w2c[:3, 3]
        z = pc[:, 2]
        m = z > 0.05
        uu = np.round(pc[m, 0] / z[m] * focal + cx).astype(np.int64)
        vv = np.round(pc[m, 1] / z[m] * focal + cy).astype(np.int64)
        inb = (uu >= 0) & (uu < size) & (vv >= 0) & (vv < size)
        lin = vv[inb] * size + uu[inb]
        zi = z[m][inb]
        depth = np.full(size * size, np.inf, np.float32)
        np.minimum.at(depth, lin, zi.astype(np.float32))
        img = np.zeros((size * size, 3), np.float32)
        win = zi <= depth[lin] * 1.001  # points on the visible surface
        img[lin[win]] = pcol[m][inb][win]
        frames.append(img.reshape(size, size, 3))
    out_path = os.path.join(scene_dir, "mesh_flythrough.mp4")
    frames_to_video(frames, out_path, fps=fps)
    print(f"wrote {out_path} ({len(frames)} frames, "
          f"{len(verts)} mesh vertices)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene_dir")
    ap.add_argument("--backend", default="pallas")
    ap.add_argument("--fps", type=int, default=30)
    ap.add_argument("--stride", type=int, default=2)
    ap.add_argument("--mesh", action="store_true",
                    help="TSDF-mesh orbit animation (gen_animation "
                         "analogue) instead of the trajectory flythrough")
    args = ap.parse_args()

    if args.mesh:
        mesh_flythrough(args.scene_dir, args.backend, args.fps)
        return

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
