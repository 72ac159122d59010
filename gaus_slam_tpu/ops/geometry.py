"""Depth-image geometry: unprojection, normals, gaussian initialization.

Ports the math of /root/reference/utils/common_utils.py:92-243 to
vectorized jnp (same conventions: pixel grid at integer coords, central
differences for normals, per-pixel scale z / mean(fx, fy)).
"""
from __future__ import annotations

import jax.numpy as jnp

from .camera import Camera


def pixel_grid(h: int, w: int):
    x = jnp.arange(w, dtype=jnp.float32)[None, :].repeat(h, 0)
    y = jnp.arange(h, dtype=jnp.float32)[:, None].repeat(w, 1)
    return x, y


def points_from_depth(depth: jnp.ndarray, cam: Camera) -> jnp.ndarray:
    """depth [H, W] -> camera-space points [H, W, 3]."""
    x, y = pixel_grid(cam.height, cam.width)
    xx = (x - cam.cx) / cam.fx
    yy = (y - cam.cy) / cam.fy
    return jnp.stack([xx * depth, yy * depth, depth], axis=-1)


def normals_from_points(pts: jnp.ndarray) -> jnp.ndarray:
    """Central-difference normals [H, W, 3]; border normals are random-free
    zeros (the reference fills borders with random noise that is then
    masked out — we use zeros which the same mask removes)."""
    dx = pts[2:, 1:-1] - pts[:-2, 1:-1]
    dy = pts[1:-1, 2:] - pts[1:-1, :-2]
    n = jnp.cross(dx, dy)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    return jnp.pad(n, ((1, 1), (1, 1), (0, 0)))


def valid_depth_mask(
    depth: jnp.ndarray, near: float = 0.01, far: float = 15.0
) -> jnp.ndarray:
    """Depth validity eroded by one pixel in each direction (the reference's
    get_normalmask_from_depth sequential in-place update is equivalent to
    an erosion against the *original* mask for the +x/+y lookups applied
    after -x/-y; we replicate its exact sequential semantics)."""
    m = (depth > near) & (depth < far)
    nm = m
    nm = nm.at[1:, :].set(nm[1:, :] & m[:-1, :])
    nm = nm.at[:, 1:].set(nm[:, 1:] & m[:, :-1])
    nm = nm.at[:-1, :].set(nm[:-1, :] & nm[1:, :])
    nm = nm.at[:, :-1].set(nm[:, :-1] & nm[:, 1:])
    return nm


def depth_scale_init(depth: jnp.ndarray, cam: Camera) -> jnp.ndarray:
    """Initial gaussian scale per pixel: z / mean(fx, fy) [H, W]."""
    return depth / ((cam.fx + cam.fy) / 2.0)


def surfel_quat_from_normal(view_dir: jnp.ndarray) -> jnp.ndarray:
    """Quaternion orienting a surfel's z axis along ``view_dir`` [N, 3].

    Reproduces the reference's viewmatrix(lookdir, up) construction with
    up = (ny*nz, nx*nz, -2*nx*ny) (scene/Gaussians.py:92-103), falling
    back to identity when degenerate.
    """
    from .se3 import rotmat_to_quat

    v2 = view_dir / jnp.maximum(
        jnp.linalg.norm(view_dir, axis=-1, keepdims=True), 1e-12
    )
    up = jnp.stack(
        [
            view_dir[:, 1] * view_dir[:, 2],
            view_dir[:, 0] * view_dir[:, 2],
            -2.0 * view_dir[:, 0] * view_dir[:, 1],
        ],
        axis=-1,
    )
    v0 = jnp.cross(up, v2)
    n0 = jnp.linalg.norm(v0, axis=-1, keepdims=True)
    v0 = v0 / jnp.maximum(n0, 1e-12)
    v1 = jnp.cross(v2, v0)
    v1 = v1 / jnp.maximum(jnp.linalg.norm(v1, axis=-1, keepdims=True), 1e-12)
    rot = jnp.stack([v0, v1, v2], axis=-1)  # columns
    q = rotmat_to_quat(rot)
    bad = (
        (n0[:, 0] < 1e-9)
        | ~jnp.isfinite(q).all(axis=-1)
        | (jnp.linalg.norm(q, axis=-1) < 1e-3)
    )
    ident = jnp.zeros_like(q).at[:, 0].set(1.0)
    return jnp.where(bad[:, None], ident, q)
