"""Tracking / mapping losses on tile-major render buffers.

Reference: slam/Loss.py:6-64. All masks and reductions are computed in
the [num_tiles, C, P] tile-major layout the kernels emit — the ground
truth is pre-tiled once per frame, so no raster-order reshuffle happens
inside the optimization loops. Tile padding pixels carry gt_depth == 0
and are excluded by the same depth-validity test the reference applies.

Weight-normalized depth and the exposure affine happen here (they live
in the render facade in the reference, render/__init__.py:41-49) so the
loss consumes raw kernel outputs.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class LossConfig(NamedTuple):
    # render-facade knobs (render/__init__.py)
    use_weight_norm: bool = True
    eps: float = 1e-6
    depth_far: float = 1e2
    depth_near: float = 1e-2
    enable_exposure: bool = False
    # loss knobs (configs[...]['loss'])
    silmask_th: float = 0.90
    ignore_outliers: bool = False
    w_color_tracking: float = 0.5
    w_depth_tracking: float = 1.0
    w_color_mapping: float = 0.5
    w_depth_mapping: float = 1.0
    w_dist: float = 0.1
    # densify edge-growth color-mask variant (Loss.py:55)
    use_edge_growth: bool = False
    edge_thres: float = 0.4


def normalized_depth(out_tiled: jnp.ndarray, cfg: LossConfig) -> jnp.ndarray:
    """render_depth / (alpha + eps) with far/near outliers zeroed
    (render/__init__.py:46-49)."""
    depth = out_tiled[:, 3]
    alpha = out_tiled[:, 4]
    if cfg.use_weight_norm:
        depth = depth / (alpha + cfg.eps)
        bad = (depth > cfg.depth_far) | (depth < cfg.depth_near)
        depth = jnp.where(bad, 0.0, depth)
    return depth


def apply_exposure(color: jnp.ndarray, exposure) -> jnp.ndarray:
    if exposure is None:
        return color
    return exposure.gain * color + exposure.bias


def _masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median of x over mask (for the outlier-rejection option)."""
    big = jnp.float32(3.4e38)
    v = jnp.where(mask, x, big).reshape(-1)
    v = jnp.sort(v)
    n = jnp.sum(mask).astype(jnp.int32)
    return v[jnp.maximum(n // 2, 0)]


def tracking_loss(out_tiled, gt_tiled, cfg: LossConfig, exposure=None):
    """Masked sum-reduced L1 color+depth (Loss.py:35-49).

    gt_tiled: [T, 4, P] rows (r, g, b, depth).
    Returns (loss, aux) where aux carries the depth-l1 statistic used by
    the tracking-lost detector (Frontend.py:110-114).
    """
    color = apply_exposure(out_tiled[:, 0:3], exposure)
    depth = normalized_depth(out_tiled, cfg)
    alpha = out_tiled[:, 4]
    gt_color = gt_tiled[:, 0:3]
    gt_depth = gt_tiled[:, 3]

    depth_mask = (gt_depth > 1e-5) & (depth > 1e-5)
    derr = jnp.abs(depth - gt_depth)
    if cfg.ignore_outliers:
        med = _masked_median(derr * depth_mask, depth_mask)
        depth_mask = depth_mask & (derr < 10.0 * med)
    mask = depth_mask & (alpha > cfg.silmask_th)
    mf = mask.astype(jnp.float32)

    l_color = jnp.sum(jnp.abs(color - gt_color) * mf[:, None, :])
    l_depth = jnp.sum(derr * mf)
    loss = cfg.w_color_tracking * l_color + cfg.w_depth_tracking * l_depth

    # tracking-lost statistic: mean depth-l1 over well-covered pixels
    m2 = (alpha > 0.9) & (gt_depth > 1e-4)
    depth_l1 = jnp.sum(derr * m2) / jnp.maximum(jnp.sum(m2), 1.0)
    return loss, {"depth_l1": depth_l1, "n_masked": jnp.sum(mf)}


def mapping_loss(out_tiled, gt_tiled, cfg: LossConfig, exposure=None):
    """Masked mean-reduced L1 color+depth + distortion (Loss.py:51-58)."""
    color = apply_exposure(out_tiled[:, 0:3], exposure)
    depth = normalized_depth(out_tiled, cfg)
    alpha = out_tiled[:, 4]
    dist = out_tiled[:, 9]
    gt_color = gt_tiled[:, 0:3]
    gt_depth = gt_tiled[:, 3]

    depth_mask = ((gt_depth > 1e-5) & (depth > 1e-5)).astype(jnp.float32)
    if cfg.use_edge_growth:
        color_mask = (alpha > cfg.edge_thres).astype(jnp.float32)
    else:
        color_mask = depth_mask

    nc = jnp.maximum(jnp.sum(color_mask) * 3.0, 1.0)
    nd = jnp.maximum(jnp.sum(depth_mask), 1.0)
    l_color = jnp.sum(jnp.abs(color - gt_color) * color_mask[:, None, :]) / nc
    l_depth = jnp.sum(jnp.abs(depth - gt_depth) * depth_mask) / nd
    l_dist = jnp.sum(dist * color_mask) / jnp.maximum(jnp.sum(color_mask), 1.0)
    loss = (cfg.w_color_mapping * l_color + cfg.w_depth_mapping * l_depth
            + cfg.w_dist * l_dist)
    return loss, {"l_color": l_color, "l_depth": l_depth, "l_dist": l_dist}
