"""Map initialization from an RGB-D frame (Frontend.create_map,
slam/Frontend.py:63-73 + utils/common_utils.py get_pointcloud)."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models import gaussians as G
from ..ops.camera import Camera
from ..ops.geometry import (depth_scale_init, normals_from_points,
                            points_from_depth, valid_depth_mask)
from ..ops.se3 import invert_se3, transform_points


@functools.partial(jax.jit, static_argnames=("capacity",))
def initialize_map(
    capacity: int,
    gt_color: jnp.ndarray,   # [H, W, 3] 0..1
    gt_depth: jnp.ndarray,   # [H, W]
    w2c: jnp.ndarray,        # [4, 4]
    cam_proj: Camera,
) -> G.GaussianMap:
    cam = cam_proj.replace_w2c(w2c)
    pts_cam = points_from_depth(gt_depth, cam)
    c2w = invert_se3(w2c)
    pts_w = transform_points(c2w, pts_cam.reshape(-1, 3)).reshape(pts_cam.shape)
    normals = normals_from_points(pts_w)
    valid = valid_depth_mask(gt_depth)
    scale = depth_scale_init(gt_depth, cam)
    return G.create_from_points_masked(
        capacity,
        pts_w.reshape(-1, 3),
        gt_color.reshape(-1, 3),
        normals.reshape(-1, 3),
        scale.reshape(-1),
        valid.reshape(-1),
    )
