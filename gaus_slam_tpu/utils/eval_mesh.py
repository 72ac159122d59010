"""3D reconstruction evaluation (reference utils/eval_mesh.py).

Renders the final map along the estimated trajectory, TSDF-fuses the
renders into a mesh (native C++ volume), and scores it against the
ground-truth mesh/pointcloud with the standard F-score at a distance
threshold (default 1cm), optionally after a point-to-point ICP
refinement — replacing the Open3D + trimesh stack.
"""
from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from ..ops.composite_ref import tiles_to_image
from ..render import render_view
from ..slam.loss import normalized_depth
from ..utils.config import SystemConfig
from .tsdf import TSDFVolume


def _nn_dists(src: np.ndarray, dst: np.ndarray, chunk=4096) -> np.ndarray:
    """Nearest-neighbor distance from each src point to dst (brute force
    in chunks; fine for the ~100k-point eval clouds)."""
    from scipy.spatial import cKDTree

    tree = cKDTree(dst)
    d, _ = tree.query(src, k=1, workers=-1)
    return d


def icp_align(src: np.ndarray, dst: np.ndarray, iters=20, sample=20000,
              seed=0):
    """Point-to-point ICP returning a 4x4 transform src->dst."""
    rng = np.random.default_rng(seed)
    from scipy.spatial import cKDTree

    T = np.eye(4)
    cur = src[rng.choice(len(src), min(sample, len(src)), replace=False)]
    tree = cKDTree(dst)
    for _ in range(iters):
        d, idx = tree.query(cur, k=1, workers=-1)
        m = d < np.percentile(d, 80)
        a, b = cur[m], dst[idx[m]]
        mu_a, mu_b = a.mean(0), b.mean(0)
        U, _, Vt = np.linalg.svd((b - mu_b).T @ (a - mu_a))
        S = np.eye(3)
        if np.linalg.det(U) * np.linalg.det(Vt) < 0:
            S[2, 2] = -1
        R = U @ S @ Vt
        t = mu_b - R @ mu_a
        step = np.eye(4)
        step[:3, :3], step[:3, 3] = R, t
        T = step @ T
        cur = (R @ cur.T).T + t
    return T


def fscore(pred_pts, gt_pts, threshold=0.01, align=True):
    """Precision / recall / F-score at a distance threshold
    (eval_mesh.evaluate_reconstruction semantics)."""
    if align and len(pred_pts) > 100:
        T = icp_align(pred_pts, gt_pts)
        pred_pts = (T[:3, :3] @ pred_pts.T).T + T[:3, 3]
    d_pred = _nn_dists(pred_pts, gt_pts)
    d_gt = _nn_dists(gt_pts, pred_pts)
    precision = float((d_pred < threshold).mean())
    recall = float((d_gt < threshold).mean())
    f = 2 * precision * recall / max(precision + recall, 1e-8)
    return {"precision": precision, "recall": recall, "fscore": f,
            "accuracy": float(d_pred.mean()), "completion": float(d_gt.mean())}


def fuse_render_mesh(config, gm, w2cs, out_dir=None, backend="pallas",
                     mesh_interval=5, voxel_size=0.01, depth_trunc=8.0):
    """TSDF-fuse renders along the trajectory and extract the mesh."""
    sys_cfg = SystemConfig.from_config(config, backend=backend)
    cam, opts, lcfg = sys_cfg.cam, sys_cfg.opts, sys_cfg.lcfg
    vol = TSDFVolume(voxel_size=voxel_size)
    for i in range(0, len(w2cs), mesh_interval):
        w2c = np.asarray(w2cs[i], np.float64)
        out = render_view(gm, cam.replace_w2c(jnp.asarray(w2c, jnp.float32)),
                          opts)
        img = tiles_to_image(
            jnp.concatenate([out[:, 0:3],
                             normalized_depth(out, lcfg)[:, None]], 1),
            opts.grid, cam.height, cam.width,
        )
        rgb = np.clip(np.asarray(img[:3]).transpose(1, 2, 0), 0, 1)
        depth = np.asarray(img[3])
        vol.integrate(rgb, depth, cam.intrinsics, np.linalg.inv(w2c),
                      depth_trunc=depth_trunc)
    verts, cols, tris = vol.extract_mesh()
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        np.savez(os.path.join(out_dir, "mesh.npz"),
                 vertices=verts, colors=cols, triangles=tris)
    return verts, cols, tris


def evaluate_reconstruction(config, gm, w2cs, gt_points, out_dir=None,
                            backend="pallas", threshold=0.01,
                            mesh_interval=5, voxel_size=0.01):
    """Full mesh-eval pass -> reconstruction_metrics.json contract."""
    verts, cols, tris = fuse_render_mesh(
        config, gm, w2cs, out_dir=out_dir, backend=backend,
        mesh_interval=mesh_interval, voxel_size=voxel_size,
    )
    metrics = fscore(verts, np.asarray(gt_points), threshold=threshold)
    metrics["num_vertices"] = int(len(verts))
    if out_dir:
        with open(os.path.join(out_dir, "reconstruction_metrics.json"),
                  "w") as f:
            json.dump(metrics, f, indent=2)
    return metrics
