"""Per-gaussian preprocessing for the 2DGS surfel rasterizer.

Pure-jnp, fully vectorized over gaussians; differentiable w.r.t.
(xyz, scales, quats, opacities) and the camera pose inside ``cam.w2c``.
The parameter gradients of the whole rasterizer are obtained by
``jax.vjp`` through this function composed with the compositing kernel's
hand-written pair gradients.

Reference semantics: forward.cu:75-253 (compute_transmat, compute_aabb,
preprocessCUDA) of gaus_2dgs_rasterization.

Outputs are a flat namedtuple of arrays [N, ...]:
  valid    — frustum + degenerate culls (rect-empty cull happens in binning)
  t_u/t_v/t_w — rows of the splat->pixel homography T
  a0/a1/a2 — rows of the pixel-linear intersection map
             p(x, y) = x*a0 + y*a1 + a2  (cross-product pre-factored)
  normal   — camera-space surfel normal, dual-visible flipped
  center   — low-pass filter center (from AABB), pixel coords
  radius   — AABB radius in pixels (float, ceil applied)
  depth    — camera-space z of the center (sort key)
  opacity  — activated opacity (passed through for the kernel)
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from .camera import CUTOFF, Camera, world_to_pix3
from .se3 import quat_to_rotmat


class PreprocResult(NamedTuple):
    valid: jnp.ndarray    # [N] bool
    t_u: jnp.ndarray      # [N, 3]
    t_v: jnp.ndarray      # [N, 3]
    t_w: jnp.ndarray      # [N, 3]
    a0: jnp.ndarray       # [N, 3]
    a1: jnp.ndarray       # [N, 3]
    a2: jnp.ndarray       # [N, 3]
    normal: jnp.ndarray   # [N, 3]
    center: jnp.ndarray   # [N, 2]
    radius: jnp.ndarray   # [N] float
    depth: jnp.ndarray    # [N]
    opacity: jnp.ndarray  # [N]


def preprocess(
    xyz: jnp.ndarray,        # [N, 3] world-space centers
    scales: jnp.ndarray,     # [N, 2] activated (exp'd) surfel scales
    quats: jnp.ndarray,      # [N, 4] (w,x,y,z), not necessarily unit
    opacities: jnp.ndarray,  # [N] or [N,1] activated opacities
    cam: Camera,
    active: jnp.ndarray | None = None,  # [N] bool, static-capacity mask
) -> PreprocResult:
    opacities = opacities.reshape(-1)
    w2c = cam.w2c.astype(jnp.float32)
    R = quat_to_rotmat(quats)                      # [N,3,3]
    L0 = R[..., :, 0] * scales[..., 0:1]           # [N,3]
    L1 = R[..., :, 1] * scales[..., 1:2]
    normal_world = R[..., :, 2]

    # frustum cull: camera-space z > 0.2 (reference auxiliary.h in_frustum)
    p_view = xyz @ w2c[:3, :3].T + w2c[:3, 3]
    valid = p_view[..., 2] > 0.2

    # splat->pixel homography. hu/hv/hp are the pixel-homogeneous images of
    # the splat basis (L0 dir, L1 dir, center). The kernel-facing vectors
    # (Tu, Tv, Tw) are the px / py / depth coefficient FUNCTIONALS over
    # splat coords (u, v, 1): Tu = (hu_x, hv_x, hp_x) etc. — this matches
    # the glm column-major layout the CUDA kernels read (forward.cu:356-371).
    M = world_to_pix3(cam)                         # [3,4]
    Mr, Mt = M[:, :3], M[:, 3]
    hu = L0 @ Mr.T                                 # direction -> w=0
    hv = L1 @ Mr.T
    hp = xyz @ Mr.T + Mt                           # point -> w=1
    t_u = jnp.stack([hu[..., 0], hv[..., 0], hp[..., 0]], axis=-1)
    t_v = jnp.stack([hu[..., 1], hv[..., 1], hp[..., 1]], axis=-1)
    t_w = jnp.stack([hu[..., 2], hv[..., 2], hp[..., 2]], axis=-1)

    # pixel-linear ray-splat intersection map
    a0 = jnp.cross(t_v, t_w)
    a1 = jnp.cross(t_w, t_u)
    a2 = jnp.cross(t_u, t_v)

    # camera-space normal, dual-visible flip (forward.cu:211-216)
    normal_cam = normal_world @ w2c[:3, :3].T
    cosv = -jnp.sum(p_view * normal_cam, axis=-1)
    valid = valid & (cosv != 0.0)
    flip = lax.stop_gradient(jnp.where(cosv > 0, 1.0, -1.0))
    normal_cam = normal_cam * flip[..., None]

    # AABB from T (forward.cu:119-147), cutoff = 3 sigma
    c2 = CUTOFF * CUTOFF
    tmp = jnp.array([c2, c2, -1.0], dtype=jnp.float32)
    distance = jnp.sum(t_w * t_w * tmp, axis=-1)
    valid = valid & (distance != 0.0)
    safe_dist = jnp.where(distance == 0.0, 1.0, distance)
    f = tmp / safe_dist[..., None]
    center = jnp.stack(
        [jnp.sum(f * t_u * t_w, axis=-1), jnp.sum(f * t_v * t_w, axis=-1)],
        axis=-1,
    )
    temp = jnp.stack(
        [jnp.sum(f * t_u * t_u, axis=-1), jnp.sum(f * t_v * t_v, axis=-1)],
        axis=-1,
    )
    half_extend = center * center - temp
    extent = jnp.sqrt(jnp.maximum(1e-4, half_extend))
    radius = jnp.ceil(jnp.maximum(extent[..., 0], extent[..., 1]))

    if active is not None:
        valid = valid & active

    return PreprocResult(
        valid=valid, t_u=t_u, t_v=t_v, t_w=t_w, a0=a0, a1=a1, a2=a2,
        normal=normal_cam, center=center,
        radius=lax.stop_gradient(radius),
        depth=p_view[..., 2], opacity=opacities,
    )


class PreSummary(NamedTuple):
    """The preprocess outputs binning consumes (``bin_gaussians`` duck-types
    over PreprocResult and this): everything except the kernel attrs."""

    valid: jnp.ndarray    # [N] bool
    center: jnp.ndarray   # [N, 2]
    radius: jnp.ndarray   # [N] float
    depth: jnp.ndarray    # [N]


def preprocess_t(
    xyz_t: jnp.ndarray,      # [3, N] world-space centers (transposed)
    scales_t: jnp.ndarray,   # [2, N] activated surfel scales
    quats_t: jnp.ndarray,    # [4, N] (w,x,y,z), not necessarily unit
    opacities: jnp.ndarray,  # [N] activated opacities
    colors_t: jnp.ndarray,   # [3, N]
    cam: Camera,
    active: jnp.ndarray | None = None,  # [N] bool
) -> tuple[jnp.ndarray, PreSummary]:
    """Transposed (lane-major) preprocess: same math as ``preprocess`` +
    ``pack_pair_attrs`` but on [C, N] rows, returning the kernel attr slab
    [PAIR_C, N] directly.

    Why: [N, 3] / [N, 4] elementwise math uses 3-4 of the 128 VPU lanes
    per op (XLA keeps the trailing dim minor); on full-lane [N] rows the
    same math runs at ~40x the lane utilization. This is the production
    path; ``preprocess`` remains as the oracle (equivalence unit-tested).
    """
    w2c = cam.w2c.astype(jnp.float32)
    qw, qx, qy, qz = quats_t[0], quats_t[1], quats_t[2], quats_t[3]
    n2 = qw * qw + qx * qx + qy * qy + qz * qz
    s = 2.0 / jnp.maximum(n2, 1e-24)  # matches se3.quat_to_rotmat
    # rotation-matrix entries (same normalization as se3.quat_to_rotmat)
    r00 = 1.0 - s * (qy * qy + qz * qz)
    r01 = s * (qx * qy - qw * qz)
    r02 = s * (qx * qz + qw * qy)
    r10 = s * (qx * qy + qw * qz)
    r11 = 1.0 - s * (qx * qx + qz * qz)
    r12 = s * (qy * qz - qw * qx)
    r20 = s * (qx * qz - qw * qy)
    r21 = s * (qy * qz + qw * qx)
    r22 = 1.0 - s * (qx * qx + qy * qy)

    s0, s1 = scales_t[0], scales_t[1]
    L0 = (r00 * s0, r10 * s0, r20 * s0)          # 3 x [N]
    L1 = (r01 * s1, r11 * s1, r21 * s1)
    nw = (r02, r12, r22)                         # world normal columns

    def mat_rows(M, v, translate=False):
        """rows of M[:3,:3] @ v (+ M[:3,3]): v is a 3-tuple of [N] rows."""
        out = []
        for i in range(3):
            r = M[i, 0] * v[0] + M[i, 1] * v[1] + M[i, 2] * v[2]
            if translate:
                r = r + M[i, 3]
            out.append(r)
        return out

    xyz3 = (xyz_t[0], xyz_t[1], xyz_t[2])
    pv = mat_rows(w2c, xyz3, translate=True)     # p_view rows
    valid = pv[2] > 0.2

    M = world_to_pix3(cam)                       # [3, 4]
    hu = mat_rows(M, L0)
    hv = mat_rows(M, L1)
    hp = mat_rows(M, xyz3, translate=True)
    # t_u = x-components of (hu, hv, hp); t_v = y; t_w = z (see preprocess)
    tu = (hu[0], hv[0], hp[0])
    tv = (hu[1], hv[1], hp[1])
    tw = (hu[2], hv[2], hp[2])

    def cross(a, b):
        return (a[1] * b[2] - a[2] * b[1],
                a[2] * b[0] - a[0] * b[2],
                a[0] * b[1] - a[1] * b[0])

    a0 = cross(tv, tw)
    a1 = cross(tw, tu)
    a2 = cross(tu, tv)

    nc = mat_rows(w2c, nw)                       # camera-space normal
    cosv = -(pv[0] * nc[0] + pv[1] * nc[1] + pv[2] * nc[2])
    valid = valid & (cosv != 0.0)
    flip = lax.stop_gradient(jnp.where(cosv > 0, 1.0, -1.0))
    nc = (nc[0] * flip, nc[1] * flip, nc[2] * flip)

    c2 = CUTOFF * CUTOFF
    distance = c2 * (tw[0] * tw[0] + tw[1] * tw[1]) - tw[2] * tw[2]
    valid = valid & (distance != 0.0)
    inv_d = 1.0 / jnp.where(distance == 0.0, 1.0, distance)
    cx = (c2 * (tu[0] * tw[0] + tu[1] * tw[1]) - tu[2] * tw[2]) * inv_d
    cy = (c2 * (tv[0] * tw[0] + tv[1] * tw[1]) - tv[2] * tw[2]) * inv_d
    tempx = (c2 * (tu[0] * tu[0] + tu[1] * tu[1]) - tu[2] * tu[2]) * inv_d
    tempy = (c2 * (tv[0] * tv[0] + tv[1] * tv[1]) - tv[2] * tv[2]) * inv_d
    ex = jnp.sqrt(jnp.maximum(1e-4, cx * cx - tempx))
    ey = jnp.sqrt(jnp.maximum(1e-4, cy * cy - tempy))
    radius = lax.stop_gradient(jnp.ceil(jnp.maximum(ex, ey)))

    if active is not None:
        valid = valid & active
    opac = jnp.where(valid, opacities, 0.0)
    zeros = jnp.zeros_like(opac)
    attrs = jnp.stack([
        a0[0], a0[1], a0[2], a1[0], a1[1], a1[2], a2[0], a2[1], a2[2],
        tw[0], tw[1], tw[2],
        lax.stop_gradient(cx), lax.stop_gradient(cy),
        nc[0], nc[1], nc[2], opac,
        colors_t[0], colors_t[1], colors_t[2],
        zeros, zeros, zeros,
    ], axis=0)                                   # [PAIR_C, N]
    summary = PreSummary(
        valid=valid, center=jnp.stack([cx, cy], axis=-1),
        radius=radius, depth=pv[2],
    )
    return attrs, summary


# Pair-attribute packing used by the compositing kernels.
# Layout [PAIR_C, R]: per-pair scalars on the sublane axis, pairs on lanes.
PAIR_FIELDS = (
    "a0x a0y a0z a1x a1y a1z a2x a2y a2z "
    "twx twy twz cx cy nx ny nz op r g b pad0 pad1 pad2 pad3"
).split()
PAIR_C = len(PAIR_FIELDS)  # 24


def pack_pair_attrs(pre: PreprocResult, colors: jnp.ndarray) -> jnp.ndarray:
    """Stack preprocess outputs + colors into the [PAIR_C, N] kernel layout.

    Invalid gaussians are zeroed (opacity=0) so they never contribute.
    """
    opac = jnp.where(pre.valid, pre.opacity, 0.0)
    zeros = jnp.zeros_like(opac)
    rows = [
        pre.a0[:, 0], pre.a0[:, 1], pre.a0[:, 2],
        pre.a1[:, 0], pre.a1[:, 1], pre.a1[:, 2],
        pre.a2[:, 0], pre.a2[:, 1], pre.a2[:, 2],
        pre.t_w[:, 0], pre.t_w[:, 1], pre.t_w[:, 2],
        # the low-pass filter center is gradient-detached: the reference
        # routes rho2d-branch alpha gradients only into the dummy means2D
        # densification stat, never into map params (backward.cu:450-457)
        lax.stop_gradient(pre.center[:, 0]),
        lax.stop_gradient(pre.center[:, 1]),
        pre.normal[:, 0], pre.normal[:, 1], pre.normal[:, 2],
        opac,
        colors[:, 0], colors[:, 1], colors[:, 2],
        zeros, zeros, zeros,
    ]
    return jnp.stack(rows, axis=0)
