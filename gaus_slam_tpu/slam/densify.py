"""Map densification and pruning (reference slam/Densify.py).

SplaTAM-style growth: add new gaussians wherever the current map renders
insufficient alpha coverage or grossly wrong depth, by unprojecting the
ground-truth RGB-D at those pixels. All candidate handling is
static-shape: every pixel is a candidate, a validity mask selects which
ones are appended (models.gaussians.add_gaussians compacts them with a
cumsum scatter).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..models import gaussians as G
from ..ops.camera import Camera
from ..ops.geometry import (depth_scale_init, normals_from_points,
                            points_from_depth, valid_depth_mask)
from ..ops.se3 import invert_se3, transform_points
from ..render import RenderOptions, render_view
from ..ops.composite_ref import tiles_to_image
from .loss import LossConfig, normalized_depth
from typing import NamedTuple


class DensifyConfig(NamedTuple):
    sil_thres: float = 0.6
    dep_thres: float = 0.1        # unused by the splatam path (kept for parity)
    opacity_cull: float = 0.05
    scale_cull: float = 5e-4
    scale_max: float = 0.1
    use_edge_growth: bool = False
    edge_thres: float = 0.4


@functools.partial(jax.jit, static_argnames=("opts", "dcfg", "lcfg"))
def add_new_gaussians(
    gm: G.GaussianMap,
    w2c: jnp.ndarray,
    gt_color: jnp.ndarray,     # [H, W, 3]
    gt_depth: jnp.ndarray,     # [H, W]
    out_view: jnp.ndarray,     # [T, OUT_C, P] detached render at w2c
    cam_proj: Camera,
    opts: RenderOptions,
    dcfg: DensifyConfig,
    lcfg: LossConfig,
) -> G.GaussianMap:
    """Densify.add_new_gaussians (Densify.py:8-41), splatam method."""
    h, w = cam_proj.height, cam_proj.width
    img = tiles_to_image(
        jnp.stack([normalized_depth(out_view, lcfg),
                   out_view[:, 4]], axis=1),
        opts.grid, h, w,
    )
    depth = img[0]
    alpha = img[1]

    sil_mask = alpha < dcfg.sil_thres
    depth_error = jnp.where(gt_depth > 0, jnp.abs(depth - gt_depth), 0.0)
    med = jnp.median(depth_error)
    add_mask = sil_mask | ((depth > gt_depth) & (depth_error > 50.0 * med))
    valid = valid_depth_mask(gt_depth) & add_mask

    cam = cam_proj.replace_w2c(w2c)
    c2w = invert_se3(w2c)

    def unproject_add(gm, src_depth, valid):
        pts_cam = points_from_depth(src_depth, cam)
        pts_w = transform_points(c2w, pts_cam.reshape(-1, 3)) \
            .reshape(pts_cam.shape)
        normals = normals_from_points(pts_w)
        scale = depth_scale_init(src_depth, cam)
        return G.add_gaussians(
            gm,
            pts_w.reshape(-1, 3),
            gt_color.reshape(-1, 3),
            normals.reshape(-1, 3),
            scale.reshape(-1),
            valid=valid.reshape(-1),
        )

    gm = unproject_add(gm, gt_depth, valid)

    if dcfg.use_edge_growth:
        # Edge growth (Densify.py:29-39): pixels with partial alpha
        # coverage but NO valid gt depth (sensor dropout at geometry
        # edges) are unprojected from the RENDERED depth instead.
        edge_mask = (
            (alpha > dcfg.edge_thres) & (alpha < dcfg.sil_thres)
            & (gt_depth < 1e-3) & (depth > 1e-3)
        )
        gm = unproject_add(gm, depth, edge_mask)
    return gm


@functools.partial(jax.jit, static_argnames=("dcfg",))
def prune_gaussians(gm: G.GaussianMap, dcfg: DensifyConfig) -> G.GaussianMap:
    """Densify.prune_gaussians (Densify.py:43-50): hard prune by opacity
    and mean-scale bounds."""
    opac = jax.nn.sigmoid(gm.params.opacity_logit[:, 0])
    mean_scale = jnp.exp(gm.params.log_scales).mean(axis=-1)
    mask = (
        (opac < dcfg.opacity_cull)
        | (mean_scale < dcfg.scale_cull)
        | (mean_scale > dcfg.scale_max)
    )
    return G.prune(gm, mask & gm.active)
