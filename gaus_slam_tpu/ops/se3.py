"""Quaternion / rotation / SE(3) primitives.

Conventions (matching the reference system, see
/root/reference/utils/common_utils.py:29-64 and
/root/reference/submodules/gaus_2dgs_rasterization/cuda_rasterizer/auxiliary.h:237):
  * quaternions are (w, x, y, z), scalar first
  * rotations act on column vectors, poses are 4x4 world-to-camera (w2c)
  * quat_to_rotmat is scale invariant (normalizes internally)

Everything is pure jnp, shape-polymorphic over leading batch dims, and
safe to use inside jit / custom_vjp code.
"""
from __future__ import annotations

import jax.numpy as jnp


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize quaternion(s) to unit length. q: [..., 4]."""
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, eps)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion(s) (w,x,y,z) -> rotation matrix [..., 3, 3].

    Scale invariant: R(s*q) == R(q) for s != 0.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    s = 2.0 / jnp.maximum((q * q).sum(-1), 1e-24)
    R = jnp.stack(
        [
            1 - s * (y * y + z * z), s * (x * y - w * z), s * (x * z + w * y),
            s * (x * y + w * z), 1 - s * (x * x + z * z), s * (y * z - w * x),
            s * (x * z - w * y), s * (y * z + w * x), 1 - s * (x * x + y * y),
        ],
        axis=-1,
    )
    return R.reshape(q.shape[:-1] + (3, 3))


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> quaternion (w,x,y,z), branch-free.

    Uses the 4-branch Shepperd method combined with jnp.where so it is
    jit-safe and numerically stable for all rotations.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # candidate squared magnitudes *4 (all >= 0 up to fp error)
    qw2 = jnp.maximum(1.0 + tr, 0.0)
    qx2 = jnp.maximum(1.0 + m00 - m11 - m22, 0.0)
    qy2 = jnp.maximum(1.0 - m00 + m11 - m22, 0.0)
    qz2 = jnp.maximum(1.0 - m00 - m11 + m22, 0.0)

    # four candidate quaternions (unnormalized), one per dominant component
    cw = jnp.stack([qw2, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    cx = jnp.stack([m21 - m12, qx2, m01 + m10, m02 + m20], axis=-1)
    cy = jnp.stack([m02 - m20, m01 + m10, qy2, m12 + m21], axis=-1)
    cz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, qz2], axis=-1)

    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([cw, cx, cy, cz], axis=-2)  # [..., 4cand, 4]
    q = jnp.take_along_axis(
        cands, best[..., None, None].astype(jnp.int32), axis=-2
    )[..., 0, :]
    q = quat_normalize(q)
    # canonical sign: w >= 0 (matches pytorch3d standardize behaviour)
    return jnp.where(q[..., :1] < 0, -q, q)


def quat_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1 * q2, (w,x,y,z) convention. Broadcasts."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 + y1 * w2 + z1 * x2 - x1 * z2,
            w1 * z2 + z1 * w2 + x1 * y2 - y1 * x2,
        ],
        axis=-1,
    )


def quat_multiply_rows(q1: jnp.ndarray, q2_rows: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of one quaternion ``q1`` [4] with [4, R] rows
    (lane-major form of ``quat_multiply(q1[None], q2)``)."""
    w1, x1, y1, z1 = q1[0], q1[1], q1[2], q1[3]
    w2, x2, y2, z2 = q2_rows[0], q2_rows[1], q2_rows[2], q2_rows[3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 + y1 * w2 + z1 * x2 - x1 * z2,
            w1 * z2 + z1 * w2 + x1 * y2 - y1 * x2,
        ],
        axis=0,
    )


def pose_matrix(quat: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """(quat[4], trans[3]) -> 4x4 homogeneous transform.

    The quaternion is normalized first — this is the live pose used by
    tracking (reference: scene/Frame.py:86-96), so gradients flow through
    the normalization.
    """
    R = quat_to_rotmat(quat_normalize(quat))
    top = jnp.concatenate([R, trans[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def pose_params_from_matrix(m: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """4x4 transform -> (quat[4], trans[3])."""
    return rotmat_to_quat(m[..., :3, :3]), m[..., :3, 3]


def invert_se3(m: jnp.ndarray) -> jnp.ndarray:
    """Invert a rigid 4x4 transform without a general solve."""
    R = m[..., :3, :3]
    t = m[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -jnp.einsum("...ij,...j->...i", Rt, t)
    top = jnp.concatenate([Rt, ti[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=m.dtype), m.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def transform_points(m: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply 4x4 (or 3x4) transform to [..., N, 3] points."""
    return pts @ m[..., :3, :3].swapaxes(-1, -2) + m[..., None, :3, 3]


def rotate_vectors(m: jnp.ndarray, vecs: jnp.ndarray) -> jnp.ndarray:
    """Apply only the rotation part of a 4x4/3x3 transform to vectors."""
    return vecs @ m[..., :3, :3].swapaxes(-1, -2)
