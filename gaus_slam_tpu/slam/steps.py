"""Jitted SLAM optimization steps.

The reference runs every tracking / mapping / BA iteration as a separate
torch forward+backward+Adam step driven from python (slam/Frontend.py:75-140,
slam/Backend.py:81-155). Here each *whole tracking loop* is one compiled
XLA program (lax.while_loop with Adam + linear LR schedule + the
convergence early-exit of Frontend.py:96-107), and each mapping/BA
iteration is one compiled step function.

Compile cache keys: (pair-array size R, map capacity C, tile grid,
static option flags) — all bucketed by the callers.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..models import gaussians as G
from ..models.frame import (ExposureState, LrSchedule, PoseState,
                            exposure_adam_step, init_exposure, init_pose,
                            pose_adam_step)
from ..ops.camera import Camera
from ..render import PairCache, RenderOptions, render_full, render_tracking
from .loss import LossConfig, mapping_loss, tracking_loss


class TrackConfig(NamedTuple):
    num_iters: int
    converged_th: float         # <= 0 disables the early exit
    rot_sched: LrSchedule
    trans_sched: LrSchedule
    betas: tuple = (0.7, 0.99)
    # coarse-to-fine: the first `coarse_iters` iterations render only a
    # `coarse_stride`-strided checkerboard of image tiles from the same
    # pair cache (~stride^2 less kernel work per iteration). TPU-native
    # replacement for the reference's full-res-every-iteration loop; the
    # remaining iterations run at full resolution.
    coarse_iters: int = 0
    coarse_stride: int = 2
    # pyramid schedule: ((iters, stride), ...) coarse -> fine, e.g.
    # ((10, 4), (14, 2)) runs 10 iterations on a stride-4 checkerboard,
    # then 14 on stride-2, then full resolution to num_iters. Supersedes
    # coarse_iters/coarse_stride when non-empty. Strides must be
    # nested (each divides the previous) so one phase-major cache
    # serves every level as a head prefix (binning.phase_positions).
    coarse_levels: tuple = ()

    def levels(self) -> tuple:
        """Effective coarse schedule as ((iters, stride), ...)."""
        if self.coarse_levels:
            return tuple((int(i), int(s)) for i, s in self.coarse_levels)
        if self.coarse_iters > 0:
            return ((self.coarse_iters, self.coarse_stride),)
        return ()


def _coarse_tile_ids(grid, stride: int) -> jnp.ndarray:
    """Strided checkerboard of image-tile ids (static for a given grid)."""
    ty = jnp.arange(0, grid.tiles_y, stride, dtype=jnp.int32)
    tx = jnp.arange(0, grid.tiles_x, stride, dtype=jnp.int32)
    return (ty[:, None] * grid.tiles_x + tx[None, :]).reshape(-1)


@functools.partial(
    jax.jit,
    static_argnames=("opts", "tcfg", "lcfg", "want_view", "predict",
                     "use_vel", "compact_coarse"),
)
def tracking_loop(
    cache: PairCache,
    pose0: PoseState,
    gt_tiled: jnp.ndarray,      # [T, 4, P]
    cam_proj: Camera,           # intrinsics only (w2c ignored)
    opts: RenderOptions,
    tcfg: TrackConfig,
    lcfg: LossConfig,
    want_view: bool = False,
    prev_pose: PoseState | None = None,
    predict: bool = False,
    use_vel: bool = True,
    compact_coarse: bool = False,
):
    """Full tracking optimization for one frame as one XLA program.

    ``want_view=True`` additionally renders the FINAL pose (detached,
    full tile set, from the same pair cache) and returns it with its
    low-alpha pixel count — this folds the keyframe-coverage test
    (Frontend.py:186-192 Renderer_view + alpha threshold) into the same
    program, removing one dispatch + one host sync per frame. The cache
    staleness is the same assumption tracking itself already makes.

    ``predict=True`` additionally emits the velocity-model pose init for
    the NEXT frame (Frontend.py:160-164: vel @ w2c with vel = w2c @
    prev_w2c^-1, identity when ``use_vel`` is off) — pred_pose is a
    fresh optimizer state at that pose and pred_w2c its (quaternion
    round-tripped, i.e. exactly pred_pose.w2c) matrix. The frontend
    dispatches the next frame's tracking binning against pred_w2c
    BEFORE this program's blocking readback, so the ~60-70 ms binning
    runs while the host does its per-frame python (speculation is
    value-identical to the host pose init it replaces; it is discarded
    whenever the map changes under it)."""

    def make_grad_fn(tile_ids, gt_sub, pair_hi=None):
        def loss_fn(quat, trans):
            out = render_tracking(cache, quat, trans, cam_proj, opts,
                                  tile_ids=tile_ids, pair_hi=pair_hi)
            loss, aux = tracking_loss(out, gt_sub, lcfg)
            return loss, aux

        return jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)

    def make_body(grad_fn):
        def body(carry):
            pose, k, conv, _, _ = carry
            (loss, aux), (g_q, g_t) = grad_fn(pose.quat, pose.trans)
            new_pose = pose_adam_step(
                pose, g_q, g_t, tcfg.rot_sched, tcfg.trans_sched, tcfg.betas
            )
            delta = jnp.linalg.norm(new_pose.trans - pose.trans)
            conv = jnp.where(delta < tcfg.converged_th, conv + 1, 0)
            return new_pose, k + 1, conv, loss, aux["depth_l1"]

        return body

    def cond_until(kmax):
        def cond(carry):
            pose, k, conv, _, _ = carry
            not_conv = conv <= 3 if tcfg.converged_th > 0 else jnp.bool_(True)
            return (k < kmax) & not_conv

        return cond

    carry = (pose0, jnp.int32(0), jnp.int32(0), jnp.float32(0.0),
             jnp.float32(0.0))
    consumed = 0
    if opts.backend != "reference":
        for it_l, s_l in tcfg.levels():
            n_l = min(it_l, tcfg.num_iters - consumed)
            if n_l <= 0 or s_l <= 1:
                continue
            ids = _coarse_tile_ids(opts.grid, s_l)
            # compact coarse: a phase-major cache keeps exactly this
            # level's tiles' pairs as a head prefix — slice it so
            # per-pair work is O(r_max/s^2) per iteration (see
            # render_tracking pair_hi; multi-level caches use the
            # NESTED phase order so every level is a prefix)
            pair_hi = None
            if compact_coarse:
                from ..render import track_coarse_budget

                pair_hi = track_coarse_budget(cache.raw_t.shape[1], s_l)
            carry = lax.while_loop(
                cond_until(consumed + n_l),
                make_body(make_grad_fn(ids, gt_tiled[ids], pair_hi)),
                carry,
            )
            consumed += n_l
    pose, iters, _, loss, depth_l1 = lax.while_loop(
        cond_until(tcfg.num_iters), make_body(make_grad_fn(None, gt_tiled)),
        carry,
    )
    aux = {"iters": iters, "loss": loss, "depth_l1": depth_l1,
           # final pose matrix, computed in-program: the host needs it
           # for velocity math, and an eager pose.w2c costs ~10 small
           # dispatches through the tunnel
           "w2c": pose.w2c}
    if predict:
        from ..ops.se3 import invert_se3, pose_params_from_matrix

        w2c_f = aux["w2c"]
        pred_m = (w2c_f @ invert_se3(prev_pose.w2c) @ w2c_f
                  if use_vel else w2c_f)
        q, t = pose_params_from_matrix(pred_m)
        z4, z3 = jnp.zeros(4), jnp.zeros(3)
        aux["pred_pose"] = PoseState(q, t, z4, z4, z3, z3, jnp.int32(0))
        # quaternion round-trip so the speculative binning pose equals
        # pred_pose.w2c bit-for-bit (matching the non-speculative path,
        # which bins at init_pose(initial_w2c).w2c)
        aux["pred_w2c"] = aux["pred_pose"].w2c
    if want_view:
        out = render_tracking(
            cache, lax.stop_gradient(pose.quat),
            lax.stop_gradient(pose.trans), cam_proj, opts,
        )
        aux["view"] = out
        aux["n_low"] = jnp.sum(out[:, 4] < 0.5).astype(jnp.int32)
    return pose, aux


def fold_diags(diags):
    """OR/max-reduce a list of per-step binning diagnostics (device
    scalars) into one {overflow, n_shrunk} pair with two stacked device
    ops — so a whole mapping loop costs ONE readback and transient
    overflows between reads are never lost (VERDICT r2 weak #3)."""
    ov = jnp.stack([jnp.asarray(d["overflow"]) for d in diags])
    ns = jnp.stack([jnp.asarray(d["n_shrunk"]) for d in diags])
    dm = jnp.stack([jnp.asarray(d.get("demand", 0)) for d in diags])
    return {"overflow": jnp.any(ov), "n_shrunk": jnp.max(ns),
            "demand": jnp.max(dm)}


class MapConfig(NamedTuple):
    lrs: tuple                  # sorted tuple of (lr_key, value)
    betas: tuple = (0.9, 0.999)
    eps: float = 1e-15
    isotropic: bool = False
    gs_stats: bool = False      # emit per-gaussian view-space grad stats
                                # (backend gs_densify, Backend.py:117-128)


@functools.partial(
    jax.jit, static_argnames=("opts", "mcfg", "lcfg", "coarse_stride")
)
def mapping_step(
    gm: G.GaussianMap,
    w2c: jnp.ndarray,           # [4, 4] fixed pose
    gt_tiled: jnp.ndarray,      # [T, 4, P]
    exposure: ExposureState,
    do_exposure: jnp.ndarray,   # bool scalar
    exp_sched: LrSchedule,
    cam_proj: Camera,
    opts: RenderOptions,
    mcfg: MapConfig,
    lcfg: LossConfig,
    bins=None,
    tile_ids: jnp.ndarray | None = None,
    tile_valid: jnp.ndarray | None = None,
    phase=None,
    coarse_stride: int = 0,
    frame_exp: jnp.ndarray | None = None,
):
    """One mapping iteration: render at a fixed pose, map params live
    (Frontend.mapping / Backend.mapping semantics).

    ``frame_exp``: optional [2] (gain, bias) of the FRAME's frozen
    exposure; when given, the live ``exposure`` state composes with it
    exactly like the reference's LocalMap.get_frame_exposure
    (scene/Frame.py:250-257): A = lm_gain * f_gain,
    B = lm_gain * f_bias + lm_bias — gradients flow into the live
    (submap) exposure through the composition.

    ``bins``: optionally a precomputed Binning for this (map, pose) —
    callers running several consecutive iterations on one frame reuse it
    (per-iteration parameter motion is sub-pixel, the same staleness
    argument as the tracking pair cache); None re-bins exactly like the
    reference.

    ``tile_ids``: render + apply the loss on only this subset of image
    tiles (coarse mapping — the masked-mean per-pixel loss over a tile
    subset is an unbiased stochastic gradient; callers rotate the subset
    per iteration so coverage is complete every stride^2 iterations).

    ``phase``/``coarse_stride``: compact coarse path over a phase-major
    ``bins`` (see render_full) — expansion + gradient reduction run on
    the phase's O(r_max/s^2) pair block; bit-identical to the plain
    ``tile_ids`` path absent overflow."""
    from ..render import bin_full, phase_budget

    cam = cam_proj.replace_w2c(lax.stop_gradient(w2c))
    if bins is None:
        bins = bin_full(gm.params, gm.active, cam, opts,
                        phase_stride=coarse_stride if phase is not None
                        else 0)
    gt_sub = gt_tiled if tile_ids is None else gt_tiled[tile_ids]

    def loss_fn(params, gain, bias):
        if lcfg.enable_exposure:
            if frame_exp is not None:
                # composed exposure (Frame.py:250-257): the frame part
                # is frozen, the submap part (gain, bias) stays live
                eg = gain * frame_exp[0]
                eb = gain * frame_exp[1] + bias
            else:
                eg, eb = gain, bias
            exp = exposure._replace(gain=eg, bias=eb)
        else:
            exp = None
        # mapping loss reads normals only under use_normal_loss
        # (opts.normals_in_tracking carries that flag)
        out, _ = render_full(params, gm.active, cam, opts, bins=bins,
                             need_normal=opts.normals_in_tracking,
                             tile_ids=tile_ids, tile_valid=tile_valid,
                             phase=phase, coarse_stride=coarse_stride)
        loss, aux = mapping_loss(out, gt_sub, lcfg, exposure=exp)
        return loss, aux

    (loss, aux), grads = jax.value_and_grad(
        loss_fn, argnums=(0, 1, 2), has_aux=True
    )(gm.params, exposure.gain, exposure.bias)
    g_params, g_gain, g_bias = grads

    overflow = bins.overflow
    if phase is not None:
        # a phase block outgrowing its compact budget clips pairs and
        # zeroes gradients (Binning.phase_reduce) — same escalation
        # ladder as the global pair budget
        sizes = bins.phase_start[1:] - bins.phase_start[:-1]
        # conservative by the 128-aligned slice head (see _phase_rows)
        overflow = overflow | jnp.any(
            sizes > phase_budget(opts, gm.params.xyz.shape[0],
                                 coarse_stride) - 127)
    diag = {"num_pairs": bins.num_pairs, "overflow": overflow,
            "n_shrunk": bins.n_shrunk, "demand": bins.demand}
    if mcfg.gs_stats:
        # view-space positional gradient stat for clone/split selection
        # (reference add_densification_stats, Gaussians.py:58-62; the
        # means2D grad of backward.cu:660-663). We recover the screen
        # gradient from the world xyz gradient through the projection
        # Jacobian inverse (z/f), in the reference's NDC scaling (W/2) —
        # a documented proxy: the z-coupled term is ignored.
        w2c_sg = lax.stop_gradient(w2c)
        g_cam = g_params.xyz @ w2c_sg[:3, :3].T
        z = jnp.maximum(
            (lax.stop_gradient(gm.params.xyz) @ w2c_sg[:3, :3].T
             + w2c_sg[:3, 3])[:, 2], 1e-6)
        gu = g_cam[:, 0] * z / cam_proj.fx * (cam_proj.width / 2.0)
        gv = g_cam[:, 1] * z / cam_proj.fy * (cam_proj.height / 2.0)
        visible = bins.counts > 0
        diag["densify_stat"] = jnp.where(
            visible, jnp.sqrt(gu * gu + gv * gv), 0.0)
        diag["visible"] = visible

    gm = G.adam_step(gm, g_params, dict(mcfg.lrs), mcfg.betas, mcfg.eps,
                     isotropic=mcfg.isotropic)
    if lcfg.enable_exposure:
        stepped = exposure_adam_step(exposure, g_gain, g_bias, exp_sched)
        exposure = jax.tree.map(
            lambda a, b: jnp.where(do_exposure, a, b), stepped, exposure
        )
    return gm, exposure, {"loss": loss, **aux, **diag}


def _coarse_map_phases(grid, stride: int):
    """([stride^2, Ts] tile-id phases, [stride^2, Ts] validity) — the
    rotating checkerboard schedule (static).

    Every image tile appears (valid) in exactly one phase; phases
    smaller than the largest are padded by repeating their own ids with
    ``valid=False``. Padded entries are rendered as EMPTY blocks (the
    render forces stop=start for them) — the loss's rendered-depth /
    alpha masks then exclude every padded pixel, so non-divisible grids
    carry no double-count bias, and the backward kernel never writes
    the same pair rows from two grid steps (duplicate full blocks make
    the d_pattrs write order layout-dependent)."""
    import numpy as np

    phases, valids = [], []
    for oy in range(stride):
        for ox in range(stride):
            ty = np.arange(oy, grid.tiles_y, stride)
            tx = np.arange(ox, grid.tiles_x, stride)
            ids = (ty[:, None] * grid.tiles_x + tx[None, :]).reshape(-1)
            phases.append(ids)
            valids.append(np.ones(len(ids), bool))
    ts = max(len(p) for p in phases)
    out = np.stack([np.resize(p, ts) for p in phases]).astype(np.int32)
    val = np.stack([np.concatenate([v, np.zeros(ts - len(v), bool)])
                    for v in valids])
    return jnp.asarray(out), jnp.asarray(val)


@functools.partial(
    jax.jit,
    static_argnames=("opts", "mcfg", "lcfg", "rebin_every", "coarse_stride"),
)
def mapping_loop(
    gm: G.GaussianMap,
    w2cs: jnp.ndarray,          # [K, 4, 4] one fixed pose per group
    gts: jnp.ndarray,           # [K, T, 4, P] group gt tiles
    cam_proj: Camera,
    opts: RenderOptions,
    mcfg: MapConfig,
    lcfg: LossConfig,
    rebin_every: int = 1,
    coarse_stride: int = 1,
    phase0=0,
):
    """K x rebin_every mapping iterations as ONE compiled program.

    The host loop (Frontend.mapping / Backend task drain) dispatches one
    XLA call per iteration; through the tunneled device each call costs
    ~1 ms dispatch plus python pytree plumbing, which adds up to a large
    share of a keyframe's wall time. This scan keeps the reference
    schedule — group g re-bins once against the CURRENT map, then runs
    ``rebin_every`` Adam steps on that frame (identical to the
    rebin-group host loop) — but the whole thing is a single dispatch.

    Binning diagnostics are OR/max-folded across every iteration inside
    the program (escalation never misses a transient overflow).
    Restrictions (callers fall back to the per-step loop): no per-frame
    exposure optimization, no mid-loop densify, no gs_densify stats.

    ``coarse_stride`` > 1 renders each iteration on a rotating
    checkerboard of 1/stride^2 of the image tiles (TPU-native stochastic
    mapping — the per-pixel masked-mean loss makes a tile subset an
    unbiased gradient; every tile is visited once per stride^2
    iterations). Binning/expansion still run on the full tile grid, so
    only the fwd/bwd kernel time shrinks. Quality-gated by the A/B
    (PERF.md); 1 = exact reference schedule.

    ``phase0`` (traced int32 scalar, default 0) offsets the phase
    rotation — callers whose loops are SHORTER than stride^2 iterations
    (e.g. the backend's 4-task batches at stride 3 = 9 phases) must pass
    a running counter or the later phases' tiles are never rendered."""
    from ..render import bin_full

    dummy_exp = init_exposure()
    n_phase = coarse_stride * coarse_stride
    phases, pvalid = (_coarse_map_phases(opts.grid, coarse_stride)
                      if coarse_stride > 1 else (None, None))

    def group(gm_c, inp):
        w2c, gt, g_idx = inp
        cam = cam_proj.replace_w2c(lax.stop_gradient(w2c))
        bins = bin_full(gm_c.params, gm_c.active, cam, opts,
                        phase_stride=(coarse_stride
                                      if coarse_stride > 1 else 0))

        def one_iter(gm_cc, j):
            if phases is None:
                ids = ph = wt = None
            else:
                ph = (phase0 + g_idx * rebin_every + j) % n_phase
                ids, wt = phases[ph], pvalid[ph]
            gm2, _, aux = mapping_step(
                gm_cc, w2c, gt, dummy_exp, jnp.bool_(False),
                LrSchedule(0.0, 0.0, 1), cam_proj, opts, mcfg, lcfg,
                bins=bins, tile_ids=ids, tile_valid=wt, phase=ph,
                coarse_stride=coarse_stride if phases is not None else 0,
            )
            return gm2, (aux["overflow"], aux["n_shrunk"], aux["loss"],
                         aux["demand"])

        gm_c, diags = lax.scan(one_iter, gm_c,
                               jnp.arange(rebin_every, dtype=jnp.int32))
        return gm_c, diags

    k = w2cs.shape[0]
    gm, (ovs, nss, losses, dms) = lax.scan(
        group, gm, (w2cs, gts, jnp.arange(k, dtype=jnp.int32)))
    return gm, {
        "overflow": jnp.any(ovs),
        "n_shrunk": jnp.max(nss),
        "demand": jnp.max(dms),
        "loss": losses.reshape(-1)[-1],
    }


@functools.partial(
    jax.jit, static_argnames=("opts", "tcfg", "lcfg")
)
def backend_tracking_step(
    gm: G.GaussianMap,
    pose: PoseState,            # submap transform (live)
    frame_w2c: jnp.ndarray,     # frame-in-submap pose (fixed)
    gt_tiled: jnp.ndarray,
    cam_proj: Camera,
    opts: RenderOptions,
    tcfg: TrackConfig,
    lcfg: LossConfig,
    exposure: ExposureState | None = None,
    frame_exp: jnp.ndarray | None = None,
):
    """Backend tracking step: the global map is detached, only the
    submap transform moves (Backend.tracking, Backend.py:81-99).

    Gradient path matches Renderer_tracking exactly: gaussians are moved
    into the camera frame by the LIVE effective pose (frame_w2c @
    submap_w2c), the rotated quaternions are detached, and the camera
    view matrix is the identity — so the pose gradient flows only
    through the means (render/__init__.py:30-39). Re-binned per step
    (the effective pose moves between steps).

    Computed through the PAIR-CACHE path (bin at the current effective
    pose, then render_tracking with ``pre_w2c=frame_w2c``): the pose
    gradient then reduces directly over pairs — through the pose-move
    matmul's vjp — instead of the segmented pair->gaussian reduction
    (sort + gather over r_max rows) the render_full path pays before
    collapsing d_xyz to 7 pose numbers. Same binning (moving points vs
    moving the camera bins identically — the frontend tracking
    equivalence), same detached-quat gradient; only f32 summation order
    differs (pinned by tests/test_slam_steps.py backend-tracking
    equivalence oracle). Measured 1.9x per task at the fullres backend
    shape (tools/backend_probe.py).

    ``exposure``/``frame_exp``: the composed fixed exposure of
    Backend.tracking (Backend.py:86-92) — applied to the rendered color,
    detached (only the transform is stepped here, matching the
    reference, which never steps the exposure optimizer in tracking)."""
    from ..render import bin_for_tracking, render_tracking

    exp = None
    if exposure is not None and lcfg.enable_exposure:
        fe = (frame_exp if frame_exp is not None
              else jnp.asarray([1.0, 0.0], jnp.float32))
        exp = jax.tree.map(lax.stop_gradient, exposure._replace(
            gain=exposure.gain * fe[0],
            bias=exposure.gain * fe[1] + exposure.bias))

    eff0 = frame_w2c @ pose.w2c
    cache = bin_for_tracking(gm, cam_proj.replace_w2c(eff0), opts)

    def loss_fn(quat, trans):
        out = render_tracking(cache, quat, trans, cam_proj, opts,
                              pre_w2c=frame_w2c)
        loss, aux = tracking_loss(out, gt_tiled, lcfg, exposure=exp)
        return loss, aux

    (loss, aux), (g_q, g_t) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(pose.quat, pose.trans)
    pose = pose_adam_step(
        pose, g_q, g_t, tcfg.rot_sched, tcfg.trans_sched, tcfg.betas
    )
    return pose, {"loss": loss, "depth_l1": aux["depth_l1"],
                  "overflow": cache.overflow, "n_shrunk": cache.n_shrunk,
                  "demand": cache.demand}


def ba_step(gm, pose, frame_w2c, gt_tiled, exposure, cam_proj, opts, mcfg,
            lcfg, exp_sched, frame_exp=None):
    """Backend "ba" op (Backend.py:130-155). NOTE: the reference's
    Renderer_mapping DETACHES fix_w2c (render/__init__.py:60), so despite
    stepping the transform optimizer the pose receives no gradient —
    the op is a mapping step plus an LR-schedule advance on the submap
    transform. Reproduced faithfully. Unlike the mapping task, ba steps
    the submap exposure UNCONDITIONALLY when enabled (Backend.py:150-153
    has no mapping_times gate)."""
    gm, exposure, aux = mapping_step(
        gm, frame_w2c @ pose.w2c, gt_tiled, exposure,
        jnp.bool_(lcfg.enable_exposure), exp_sched, cam_proj, opts, mcfg,
        lcfg, frame_exp=frame_exp,
    )
    pose = pose._replace(step=pose.step + 1)
    return gm, pose, exposure, aux
