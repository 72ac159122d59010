"""Submap containers (reference scene/Frame.py:202-322).

A LocalMap freezes a frontend submap at cut time: it rebases all frame
poses to be relative to the first frame (so the backend can re-pose the
whole submap with a single rigid transform), selects which frames keep
their images (randomized priority with first/last/keyframe boosting),
snapshots the local map parameters, and computes the covisibility
descriptor from two representative images.
"""
from __future__ import annotations

import random
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.se3 import pose_matrix
from .descriptor import describe_frames, query_covisible
from .frame import (ExposureState, Frame, PoseState, init_exposure,
                    init_pose)

# composed pose as ONE dispatch: eager `est @ transform.w2c` runs ~12
# small ops through the tunneled device (~1 ms each), and the backend
# evaluates this once per mapping/BA task
_compose_w2c = jax.jit(lambda est, q, t: est @ pose_matrix(q, t))

# stacked quats/trans -> [K, 4, 4] pose matrices, one dispatch (the
# submap cut freezes ~10 frame poses at once)
_stack_pose_w2cs = jax.jit(jax.vmap(pose_matrix))


@dataclass
class LocalMap:
    lmid: int
    frames: list                      # list[Frame]
    map_params: object                # (Params, active, n_active) snapshot
    tracking_ok: bool = True
    saved_idxs: list = field(default_factory=list)
    ref2f0: np.ndarray | None = None  # first frame's w2c at cut time
    transform: PoseState | None = None
    # per-submap exposure (reference LocalMap.start_optimizer,
    # scene/Frame.py:241-243): created alongside the transform when
    # enable_exposure; stepped by the backend after mapping_times > 120
    exposure: ExposureState | None = None
    map_desc: object = None           # [reps, D]
    mapping_times: int = 0
    # host mirror of map_params' n_active (set at cut time so the
    # backend merge never has to sync the device queue to read it)
    n_active_host: int | None = None

    @classmethod
    def cut(cls, lmid, frames, map_params, num_frame_saved,
            tracking_ok=True, rng: random.Random | None = None,
            n_active_host: int | None = None):
        """Freeze a submap (LocalMap.__init__, scene/Frame.py:210-257)."""
        rng = rng or random
        lm = cls(lmid=lmid, frames=frames, map_params=map_params,
                 tracking_ok=tracking_ok, n_active_host=n_active_host)

        # randomized retention priority: first/last boosted by 400,
        # keyframes by 200 (Frame.py:210-218)
        pri = [rng.randint(0, 100) for _ in frames[:-1]]
        if pri:
            pri[0] += 400
            pri[-1] += 400
            for i in range(len(pri)):
                pri[i] += (frames[i].frame_type < 2) * 200
        order = sorted(range(len(pri)), key=lambda x: pri[x], reverse=True)
        lm.saved_idxs = order[: min(num_frame_saved, len(order))]

        # descriptor from two representative images BEFORE freeing data
        reps = [frames[0].gt_color,
                frames[max(len(frames) - 2, 0)].gt_color]

        # ONE fused readback for everything the freeze needs: the
        # descriptor + every frame's final pose (+ exposure). Per-frame
        # np.asarray(pose.w2c) calls cost a tunnel round-trip EACH
        # (~60 ms x ~10 frames dominated the measured cut cost).
        fetch = {"desc": describe_frames(reps)}
        posed = [f for f in frames if f.pose is not None]
        if posed:
            # one vmapped quat->matrix dispatch; per-frame eager pose.w2c
            # runs ~10 small ops each through the tunneled device.
            # PAD to a bucketed K: submap lengths vary, and a fresh
            # [K, 4] shape re-traces + re-lowers this program at EVERY
            # cut (~seconds per new length on a 1-core host). Identity
            # quaternions pad harmlessly; the host slice below drops
            # the padded matrices.
            k = len(posed)
            k_pad = -(-k // 8) * 8
            quats = jnp.stack([f.pose.quat for f in posed])
            trans = jnp.stack([f.pose.trans for f in posed])
            if k_pad > k:
                eye_q = jnp.tile(
                    jnp.asarray([1.0, 0, 0, 0], jnp.float32)[None],
                    (k_pad - k, 1))
                quats = jnp.concatenate([quats, eye_q])
                trans = jnp.concatenate(
                    [trans, jnp.zeros((k_pad - k, 3), jnp.float32)])
            fetch["w2cs"] = _stack_pose_w2cs(quats, trans)
        exposed = [f for f in frames if f.exposure is not None]
        fetch["exps"] = [(f.exposure.gain, f.exposure.bias) for f in exposed]
        host = jax.device_get(fetch)
        lm.map_desc = np.asarray(host["desc"])
        for f, w2c in zip(posed, host.get("w2cs", [])):
            f.est_w2c = np.asarray(w2c)
            f.pose = None
        for f, (gain, bias) in zip(exposed, host["exps"]):
            f.est_exposure = (float(gain), float(bias))
            f.exposure = None

        # rebase poses submap-relative (Frame.py:220-224)
        ref2f0 = frames[0].est_w2c.copy()
        R, t = ref2f0[:3, :3], ref2f0[:3, 3]
        f02ref = np.eye(4, dtype=np.float32)    # SE3 inverse, on host
        f02ref[:3, :3] = R.T
        f02ref[:3, 3] = -R.T @ t
        lm.ref2f0 = ref2f0
        for idx, fr in enumerate(frames):
            fr.finish_optimizer(save=(idx in lm.saved_idxs))
            fr.est_w2c = fr.est_w2c @ f02ref
        return lm

    def start_optimizer(self, initial_w2c, enable_exposure: bool = False):
        self.transform = init_pose(initial_w2c)
        if enable_exposure:
            self.exposure = init_exposure()

    def frame_exp(self, f_idx) -> np.ndarray:
        """The frame's frozen (gain, bias) as a host [2] array. The
        composition with the live submap exposure (reference
        get_frame_exposure, scene/Frame.py:250-257: A = lm_g * f_g,
        B = lm_g * f_b + lm_b) happens inside the jitted steps so the
        submap part keeps its gradient path."""
        g, b = self.frames[f_idx].est_exposure
        return np.asarray([g, b], np.float32)

    def get_frame_w2c(self, f_idx):
        """Composed pose: frame-in-submap @ submap transform
        (Frame.py:246-248)."""
        assert self.transform is not None
        return _compose_w2c(
            jnp.asarray(self.frames[f_idx].est_w2c, jnp.float32),
            self.transform.quat, self.transform.trans)

    @property
    def get_w2c(self):
        assert self.transform is not None
        return self.transform.w2c


class Localmaps(list):
    """Submap list + descriptor matrix + covisibility query
    (scene/Frame.py:264-322)."""

    def __init__(self):
        super().__init__()
        self.map_descs = None  # np [num, reps, D]

    def add_localmap(self, lm: LocalMap):
        self.append(lm)
        d = lm.map_desc[None]
        self.map_descs = d if self.map_descs is None else np.concatenate(
            [self.map_descs, d]
        )

    def query_covisable(self, lm_idx: int, num_kf: int = 10):
        return query_covisible(self.map_descs, self.map_descs[lm_idx],
                               num_kf)

    def get_w2cs(self):
        """Per-frame estimated w2cs in time order (Frame.py:298-308)."""
        w2cs = []
        for lm in self:
            for f in lm.frames[:-1]:
                if f.time_idx == len(w2cs) and lm.transform is not None:
                    w2cs.append(np.asarray(
                        jnp.asarray(f.est_w2c) @ lm.get_w2c
                    ))
        last = self[-1]
        w2cs.append(np.asarray(
            jnp.asarray(last.frames[-1].est_w2c) @ last.get_w2c
        ))
        return w2cs

    def get_gt_w2cs(self):
        gt = []
        for lm in self:
            for f in lm.frames[:-1]:
                if f.time_idx == len(gt) and lm.transform is not None:
                    gt.append(np.asarray(f.gt_w2c))
        gt.append(np.asarray(self[-1].frames[-1].gt_w2c))
        return gt
