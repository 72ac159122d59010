"""Projection-overlap keyframe selection (reference
utils/keyframe_selection.py — present-but-unused in the reference; kept
for API completeness). Samples pixels from the current depth map,
back-projects them, and ranks candidate keyframes by the fraction that
projects inside their frustum."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.camera import Camera
from ..ops.geometry import points_from_depth
from ..ops.se3 import invert_se3, transform_points


def keyframe_overlap(
    gt_depth: jnp.ndarray,      # [H, W] current frame depth
    w2c: jnp.ndarray,           # current estimated pose
    cam: Camera,
    kf_w2cs: jnp.ndarray,       # [K, 4, 4] candidate keyframe poses
    pixels: int = 1600,
    key=None,
) -> jnp.ndarray:
    """-> overlap fraction [K] of current-frame geometry visible in each
    candidate keyframe."""
    key = key if key is not None else jax.random.PRNGKey(0)
    h, w = gt_depth.shape
    pts_cam = points_from_depth(gt_depth, cam).reshape(-1, 3)
    valid = (gt_depth > 0).reshape(-1)
    idx = jax.random.choice(key, pts_cam.shape[0], (pixels,),
                            p=valid / jnp.maximum(valid.sum(), 1))
    pts = pts_cam[idx]
    pts_w = transform_points(invert_se3(w2c), pts)

    def overlap(kf):
        p = transform_points(kf, pts_w)
        z = p[:, 2]
        u = p[:, 0] / jnp.maximum(z, 1e-6) * cam.fx + cam.cx
        v = p[:, 1] / jnp.maximum(z, 1e-6) * cam.fy + cam.cy
        inside = (z > 0.01) & (u >= 0) & (u < w) & (v >= 0) & (v < h)
        return inside.mean()

    return jax.vmap(overlap)(kf_w2cs)
