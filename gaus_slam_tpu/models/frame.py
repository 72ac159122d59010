"""Per-frame optimizable state: camera pose and exposure.

Reference semantics (scene/Frame.py):
  * Transform — quaternion (w,x,y,z) + translation parameters, per-group
    Adam (betas from config `cameras.adam_betas`, eps 1e-8), learning
    rate LINEARLY interpolated from init to final over max_steps
    (Frame.py:10-43 uses the linear variant of the Plenoxels helper).
  * Exposure — affine (gain, bias) color correction, own Adam + schedule.
  * Frame — ground-truth data + lifecycle (images freed after the submap
    is cut unless the frame is one of the saved keyframes).

The pose/exposure states are pure pytrees updated inside jitted
optimization loops; ``Frame`` is a host-side container.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.se3 import pose_matrix, pose_params_from_matrix


class LrSchedule(NamedTuple):
    init: float
    final: float
    max_steps: int

    def at(self, step):
        """Linear interpolation, clamped (Frame.py:28-43). Trace-safe:
        the schedule may arrive as a traced jit argument (e.g. the
        exposure schedule inside mapping_step), so no python branching
        on its values; an all-zero schedule evaluates to 0 anyway."""
        t = jnp.clip(
            jnp.asarray(step, jnp.float32)
            / jnp.maximum(jnp.asarray(self.max_steps, jnp.float32), 1.0),
            0.0, 1.0)
        return (1.0 - t) * self.init + t * self.final


class PoseState(NamedTuple):
    quat: jnp.ndarray    # [4] (w,x,y,z)
    trans: jnp.ndarray   # [3]
    m_q: jnp.ndarray
    v_q: jnp.ndarray
    m_t: jnp.ndarray
    v_t: jnp.ndarray
    step: jnp.ndarray    # scalar int32

    @property
    def w2c(self) -> jnp.ndarray:
        return pose_matrix(self.quat, self.trans)


def init_pose(initial_w2c: jnp.ndarray) -> PoseState:
    q, t = pose_params_from_matrix(jnp.asarray(initial_w2c, jnp.float32))
    z4, z3 = jnp.zeros(4), jnp.zeros(3)
    return PoseState(q, t, z4, z4, z3, z3, jnp.int32(0))


def pose_adam_step(
    ps: PoseState,
    g_quat: jnp.ndarray,
    g_trans: jnp.ndarray,
    rot_sched: LrSchedule,
    trans_sched: LrSchedule,
    betas=(0.7, 0.99),
    eps: float = 1e-8,
) -> PoseState:
    b1, b2 = betas
    step = ps.step + 1
    t = step.astype(jnp.float32)
    c1, c2 = 1 - b1 ** t, 1 - b2 ** t
    lr_q = rot_sched.at(ps.step)     # lr used at iteration k is sched(k)
    lr_t = trans_sched.at(ps.step)

    def upd(p, m, v, g, lr):
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        return p - lr * (m / c1) / (jnp.sqrt(v / c2) + eps), m, v

    q, m_q, v_q = upd(ps.quat, ps.m_q, ps.v_q, g_quat, lr_q)
    tr, m_t, v_t = upd(ps.trans, ps.m_t, ps.v_t, g_trans, lr_t)
    return PoseState(q, tr, m_q, v_q, m_t, v_t, step)


class ExposureState(NamedTuple):
    gain: jnp.ndarray    # scalar
    bias: jnp.ndarray    # scalar
    m: jnp.ndarray       # [2]
    v: jnp.ndarray       # [2]
    step: jnp.ndarray

    def apply(self, img):
        return self.gain * img + self.bias


def init_exposure() -> ExposureState:
    return ExposureState(
        jnp.float32(1.0), jnp.float32(0.0),
        jnp.zeros(2), jnp.zeros(2), jnp.int32(0),
    )


def exposure_adam_step(
    es: ExposureState, g_gain, g_bias, sched: LrSchedule,
    betas=(0.9, 0.99), eps: float = 1e-8,
) -> ExposureState:
    b1, b2 = betas
    step = es.step + 1
    t = step.astype(jnp.float32)
    c1, c2 = 1 - b1 ** t, 1 - b2 ** t
    lr = sched.at(es.step)
    g = jnp.stack([g_gain, g_bias])
    m = b1 * es.m + (1 - b1) * g
    v = b2 * es.v + (1 - b2) * g * g
    upd = lr * (m / c1) / (jnp.sqrt(v / c2) + eps)
    return ExposureState(es.gain - upd[0], es.bias - upd[1], m, v, step)


# frame_type codes (scene/Frame.py Frame.__init__): 0 = reference
# keyframe, 1 = keyframe, 2 = ordinary frame
RKF, KF, ORDINARY = 0, 1, 2


@dataclass
class Frame:
    """Host-side per-frame record (scene/Frame.py:140-199)."""

    time_idx: int
    gt_color: object        # jnp [H, W, 3] float 0-1 (or None after free)
    gt_depth: object        # jnp [H, W] meters
    gt_w2c: np.ndarray      # [4, 4] ground truth (for eval only)
    kfid: int = 0
    frame_type: int = ORDINARY
    pose: PoseState | None = None
    exposure: ExposureState | None = None
    est_w2c: np.ndarray = field(default_factory=lambda: np.eye(4, dtype=np.float32))
    est_exposure: tuple = (1.0, 0.0)
    mapping_times: int = 0

    def start_optimizer(self, initial_w2c, enable_exposure=False):
        self.pose = init_pose(initial_w2c)
        # host mirror of the pose for host-side velocity math (refreshed
        # by the frontend's fused tracking readback after each track)
        self._w2c_host = np.asarray(initial_w2c, dtype=np.float32)
        if enable_exposure:
            self.exposure = init_exposure()

    def finish_optimizer(self, save: bool = False):
        """Freeze pose into est_w2c; free images unless saved
        (Frame.py:175-187)."""
        if self.pose is not None:
            self.est_w2c = np.asarray(self.pose.w2c)
            self.pose = None
        if self.exposure is not None:
            self.est_exposure = (
                float(self.exposure.gain), float(self.exposure.bias)
            )
            self.exposure = None
        if not save:
            self.gt_color = None
            self.gt_depth = None
            if hasattr(self, "gt_tiled"):
                self.gt_tiled = None

    @property
    def get_w2c(self):
        if self.pose is not None:
            return self.pose.w2c
        return jnp.asarray(self.est_w2c)
