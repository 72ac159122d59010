"""Camera model and splat->pixel projection for the 2DGS rasterizer.

Semantics match the reference pipeline
(/root/reference/render/render_2dgs.py:6-31 `setup_camera` and
/root/reference/submodules/gaus_2dgs_rasterization/cuda_rasterizer/forward.cu:75-147):

  * OpenGL-style projection with near=0.01, far=100 (projection only;
    the compositor separately clamps ray depth at near_n=0.2).
  * pixel = ((ndc + 1) * S - 1) / 2  (the `ndc2pix` convention with the
    (S-1)/2 offset).
  * A 2D surfel with tangent frame L = R @ diag(su, sv) and center p maps
    splat-local homogeneous coords (u, v, 1) to pixel-homogeneous coords
    through a per-gaussian 3x3 matrix T with rows (Tu, Tv, Tw).

The per-pixel ray/splat intersection p = cross(x*Tw - Tu, y*Tw - Tv) is
LINEAR in the pixel (x, y):  p = x*A0 + y*A1 + A2 with
A0 = Tv x Tw, A1 = Tw x Tu, A2 = Tu x Tv — the compositing kernels
consume (A0, A1, A2, Tw) so each pair costs 9 madds instead of two cross
products.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# Compositing constants (reference auxiliary.h:36-39, config.h:15-17).
NEAR_N = 0.2
FAR_N = 100.0
FILTER_INV_SQUARE = 100.0
CUTOFF = 3.0
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4  # transmittance early-termination threshold


class Camera:
    """Camera description. Registered as a pytree whose ONLY leaf is
    ``w2c`` (which may be traced — pose gradients flow through it);
    every intrinsic is static python data, so jitted functions can use
    height/width for shapes and the object can cross jit boundaries as a
    plain argument.
    """

    __slots__ = ("height", "width", "fx", "fy", "cx", "cy", "w2c",
                 "near", "far")

    def __init__(self, height, width, fx, fy, cx, cy, w2c,
                 near=0.01, far=100.0):
        self.height = int(height)
        self.width = int(width)
        self.fx = float(fx)
        self.fy = float(fy)
        self.cx = float(cx)
        self.cy = float(cy)
        self.w2c = w2c
        self.near = float(near)
        self.far = float(far)

    @property
    def intrinsics(self) -> np.ndarray:
        k = np.eye(4, dtype=np.float32)
        k[0, 0], k[1, 1], k[0, 2], k[1, 2] = self.fx, self.fy, self.cx, self.cy
        return k

    def _aux(self):
        return (self.height, self.width, self.fx, self.fy, self.cx,
                self.cy, self.near, self.far)

    def replace_w2c(self, w2c) -> "Camera":
        h, w, fx, fy, cx, cy, near, far = self._aux()
        return Camera(h, w, fx, fy, cx, cy, w2c, near, far)


def _cam_flatten(c: Camera):
    return (c.w2c,), c._aux()


def _cam_unflatten(aux, leaves):
    h, w, fx, fy, cx, cy, near, far = aux
    return Camera(h, w, fx, fy, cx, cy, leaves[0], near, far)


jax.tree_util.register_pytree_node(Camera, _cam_flatten, _cam_unflatten)


def camera_from_intrinsics(h, w, k, w2c, near=0.01, far=100.0) -> Camera:
    k = np.asarray(k)
    return Camera(
        height=int(h), width=int(w),
        fx=float(k[0][0]), fy=float(k[1][1]),
        cx=float(k[0][2]), cy=float(k[1][2]),
        w2c=jnp.asarray(w2c, jnp.float32), near=float(near), far=float(far),
    )


def opengl_projection(cam: Camera) -> jnp.ndarray:
    """4x4 camera-space -> NDC-homogeneous projection (z forward positive)."""
    w, h, near, far = cam.width, cam.height, cam.near, cam.far
    return jnp.array(
        [
            [2 * cam.fx / w, 0.0, -(w - 2 * cam.cx) / w, 0.0],
            [0.0, 2 * cam.fy / h, -(h - 2 * cam.cy) / h, 0.0],
            [0.0, 0.0, far / (far - near), -(far * near) / (far - near)],
            [0.0, 0.0, 1.0, 0.0],
        ],
        dtype=jnp.float32,
    )


def world_to_pix3(cam: Camera) -> jnp.ndarray:
    """Linear map [3, 4]: world homogeneous 4-vec -> pixel homogeneous 3-vec.

    pix3 = (px*zc, py*zc, zc) for a world point; applied to direction
    vectors (w=0) it gives the matching linear part. Composition of
    w2c, the OpenGL projection and ndc2pix.
    """
    P = opengl_projection(cam) @ cam.w2c.astype(jnp.float32)  # [4,4] world->ndc-hom
    w, h = cam.width, cam.height
    # ndc2pix rows: px_h = W/2 * ndc_x + (W-1)/2 * ndc_w ; ndc_w = z_cam
    n2p = jnp.array(
        [
            [w / 2.0, 0.0, 0.0, (w - 1) / 2.0],
            [0.0, h / 2.0, 0.0, (h - 1) / 2.0],
            [0.0, 0.0, 0.0, 1.0],
        ],
        dtype=jnp.float32,
    )
    return n2p @ P  # [3, 4]


def project_points(cam: Camera, pts: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Project world points [N,3] -> (pixel xy [N,2], cam depth [N])."""
    M = world_to_pix3(cam)
    hom = pts @ M[:, :3].T + M[:, 3]
    z = hom[:, 2]
    return hom[:, :2] / jnp.where(z == 0, 1.0, z)[:, None], z
