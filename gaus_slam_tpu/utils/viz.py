"""Offline visualization (replacing the Open3D UI of the reference).

Open3D is not available in this environment; the live TSDF-mesh and
render viewers (open3d_ui/vis_mesh.py, vis_render.py) are replaced by
headless equivalents: matplotlib dashboards (the same pngs the reference
writes — frontend_numpts / depth_l1 / backend_numpts / ape / evo_2dplot
trajectory plot) and mp4/gif flythrough export from rendered frames
(scripts/gen_video.py).
"""
from __future__ import annotations

import os

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def save_series(values, path, title=None):
    plt = _plt()
    plt.figure(figsize=(6, 3))
    plt.plot(range(len(values)), values)
    if title:
        plt.title(title)
    plt.tight_layout()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    plt.savefig(path, dpi=90)
    plt.close()


def save_trajectory_plot(est_w2cs, gt_w2cs, path, ate=None):
    """Top-down (x, z) trajectory comparison — the evo_2dplot analogue
    (Backend.update_common_visualization, Backend.py:271-311)."""
    plt = _plt()
    est = np.array([np.linalg.inv(np.asarray(m))[:3, 3] for m in est_w2cs])
    gt = np.array([np.linalg.inv(np.asarray(m))[:3, 3] for m in gt_w2cs])
    plt.figure(figsize=(5, 5))
    plt.plot(gt[:, 0], gt[:, 2], "--", color="gray", label="gt")
    err = np.linalg.norm(est - gt, axis=1)
    sc = plt.scatter(est[:, 0], est[:, 2], c=err, cmap="jet", s=4,
                     label="est")
    plt.colorbar(sc, label="APE [m]")
    if ate is not None:
        plt.title(f"ATE RMSE: {ate:.4f} m")
    plt.legend()
    plt.axis("equal")
    plt.tight_layout()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    plt.savefig(path, dpi=90)
    plt.close()


def frames_to_video(frames, path, fps=30):
    """Stack of [H,W,3] float 0..1 frames -> mp4 (or .gif fallback)."""
    import imageio.v2 as imageio

    arr = [np.clip(np.asarray(f) * 255, 0, 255).astype(np.uint8)
           for f in frames]
    try:
        imageio.mimwrite(path, arr, fps=fps)
    except Exception:
        imageio.mimwrite(os.path.splitext(path)[0] + ".gif", arr, fps=fps)
