"""Frontend: per-frame tracking + local mapping + submap management.

Host-side state machine around the jitted step programs, mirroring
slam/Frontend.py of the reference:

  process_frame:  velocity-model pose init -> tracking loop (one XLA
  program) -> tracking-lost test (EMA of depth-L1) -> keyframe test via
  rendered alpha coverage -> densify + local mapping + prune -> submap
  cut on {lost, too many frames, map too big} and handoff to the backend
  queue.

Timing statistics keep the reference's time.json contract
(Frontend.py:285-308).
"""
from __future__ import annotations

import json
import os
import random
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..models import gaussians as G
from ..models.frame import Frame, init_exposure, init_pose
from ..models.submap import LocalMap
from ..ops.composite_ref import frame_to_tiles
from ..render import bin_for_tracking, bin_full, render_view
from ..utils.config import SystemConfig
from .densify import add_new_gaussians, prune_gaussians
from .init_map import initialize_map
from .steps import fold_diags, mapping_loop, mapping_step, tracking_loop


from ..utils.fence import probe_fence


def _sync(x):
    jax.block_until_ready(x)
    return x


@jax.jit
def _dequant_rgbd(color_u8, depth_u16):
    """On-device dequant of a natively-quantized RGB-D frame. Drivers
    ship frames over the host tunnel in camera dtypes (uint8 color,
    uint16 depth at Replica's 6553.5 counts/m — utils/stage.py), ~3.6x
    fewer tunnel bytes than float32; this one fused VPU multiply pays
    it back."""
    from ..utils.stage import DEPTH_U16_SCALE

    return (color_u8.astype(jnp.float32) * jnp.float32(1 / 255),
            depth_u16.astype(jnp.float32) * jnp.float32(1 / DEPTH_U16_SCALE))


@jax.jit
def _dequant_u8(color_u8):
    return color_u8.astype(jnp.float32) * jnp.float32(1 / 255)


@jax.jit
def _dequant_u16(depth_u16):
    from ..utils.stage import DEPTH_U16_SCALE

    return depth_u16.astype(jnp.float32) * jnp.float32(1 / DEPTH_U16_SCALE)


def _host_w2c(frame) -> np.ndarray:
    """Host mirror of a frame's current pose. Tracked frames carry
    ``_w2c_host`` from the fused tracking readback; anything else falls
    back to one device readback."""
    w = getattr(frame, "_w2c_host", None)
    return w if w is not None else np.asarray(frame.get_w2c)


def _host_inv_se3(m: np.ndarray) -> np.ndarray:
    inv = np.eye(4, dtype=np.float32)
    R, t = m[:3, :3], m[:3, 3]
    inv[:3, :3] = R.T
    inv[:3, 3] = -R.T @ t
    return inv


_bin_full_jit = jax.jit(bin_full, static_argnames=("opts",))

# pose state -> 4x4 matrix as ONE dispatch (eager PoseState.w2c runs
# ~10 small ops through the tunneled device at ~1 ms each)
_pose_w2c = jax.jit(lambda pose: pose.w2c)

# stacked pose states -> [K, 4, 4] matrices as one dispatch (the fused
# keyframe-mapping path stacks ~10 frame poses per call)
from ..ops.se3 import pose_matrix as _pose_matrix  # noqa: E402

_stack_w2cs = jax.jit(jax.vmap(_pose_matrix))


def _frame_w2c(frame):
    """One-dispatch device w2c for a frame (pose live or frozen)."""
    if getattr(frame, "pose", None) is not None:
        return _pose_w2c(frame.pose)
    return jnp.asarray(frame.get_w2c, jnp.float32)


class Frontend:
    def __init__(self, config: dict, to_backend, wandb_run=None,
                 backend: str = "pallas"):
        self.config = config
        self.sys = SystemConfig.from_config(config, backend=backend,
                                            component="frontend")
        self.to_backend = to_backend
        self.wandb_run = wandb_run
        self.rng = random.Random(config.get("seed", 0))

        fr = config["frontend"]
        self.num_mapping_iters = int(fr["num_mapping_iters"])
        self.tau_k = float(fr["tau_k"])
        self.tau_l = float(fr["tau_l"])
        self.max_frames = int(fr["max_frames"])
        self.vel_pose_init = bool(fr.get("vel_pose_init", True))
        self.enable_retracking = bool(fr.get("enable_retracking", False))
        # A/B knob: re-bin the tracking pair cache once mid-loop (after
        # the coarse phase) at the updated pose. The reference re-bins
        # every iteration; the default frozen cache is the TPU-native
        # staleness bet this knob quantifies (PERF.md quality table).
        self.tracking_refresh = bool(fr.get("tracking_refresh", False))
        self.additional_densify = bool(fr.get("additional_densify", False))
        self.densify_interval = int(config["densify"].get("densify_interval", 20))
        # consecutive mapping iterations sharing one binning (1 = re-bin
        # every iteration, exact reference parity)
        self.rebin_every = int(config.get("tpu", {}).get(
            "mapping_rebin_every", 1))
        # coarse mapping: each fused mapping iteration renders a rotating
        # checkerboard of 1/stride^2 of the image tiles (unbiased
        # stochastic gradient of the per-pixel loss; full coverage every
        # stride^2 iterations). 1 = exact reference schedule. Quality-
        # gated by the multi-seed A/B (PERF.md).
        self.coarse_map_stride = int(config.get("tpu", {}).get(
            "coarse_map_stride", 1))
        self.num_frame_saved = int(config["backend"]["num_frame_saved"])
        self.capacity_quantum = int(config.get("tpu", {}).get(
            "capacity_quantum", 1 << 16))
        self.capacity_margin = float(config.get("tpu", {}).get(
            "capacity_margin", 1.3))
        # floor capacity: pre-size the map arrays so the capacity bucket
        # never changes during the run (each bucket change re-traces and
        # re-lowers every jitted program — seconds-to-minutes per bucket
        # on a slow host). The local map is bounded by tau_l, so
        # bucket(tau_l * margin) removes all frontend bucket flips.
        self.capacity_floor = int(config.get("tpu", {}).get(
            "frontend_capacity", 0))
        # keyframe-coverage view folded into the tracking program
        # (renders from the tracking pair cache at the final pose —
        # same staleness assumption as tracking itself); off = exact
        # reference semantics (fresh full binning via render_view)
        self.fused_kf_view = bool(config.get("tpu", {}).get(
            "fused_kf_view", True))
        # speculative next-frame binning: dispatch frame t+1's tracking
        # binning (at the in-program velocity-predicted pose — the same
        # value the host init would compute) before frame t's blocking
        # readback, overlapping the binning's device time with the host's
        # per-frame python. Value-identical to the non-speculative path;
        # auto-discarded whenever the map changes (keyframe/cut/lost).
        self.speculative_bin = bool(config.get("tpu", {}).get(
            "speculative_bin", True))
        self._spec = None
        # compact coarse tracking: bin the tracking pair cache
        # PHASE-MAJOR so the coarse checkerboard's pairs are its head
        # block, and run the coarse iterations on that O(r_max/s^2)
        # slice (same pairs, same gradient up to summation order — the
        # sliced-off pairs contribute exactly zero). Off = the coarse
        # phase renders the same tile subset from the full cache.
        self.compact_coarse_track = bool(config.get("tpu", {}).get(
            "compact_coarse_track", True))

        self.map: G.GaussianMap | None = None
        self.local_frames: list[Frame] = []
        self.cur_lmid = 0
        self.vel = np.eye(4, dtype=np.float32)
        self.tracking_flag = True
        self.avg_depth_l1 = 0.05
        self.depth_l1_rec = []
        self.numpts_rec = []

        # timing (time.json contract)
        self.t_track_iter = [0.0, 0]
        self.t_track_frame = [0.0, 0]
        # host-side mirror of map.n_active (refreshed at every
        # densify/prune/create/restore — reading the device scalar in the
        # per-frame hot path costs a full device sync)
        self.n_active_host = 0
        self.t_map_iter = [0.0, 0]
        self.t_map_frame = [0.0, 0]
        self.total_time = 0.0

    # ------------------------------------------------------------------
    def _track_strides(self) -> tuple:
        """Phase-major strides for the tracking pair cache (coarse ->
        fine; () = plain tile-major): non-empty only when the tracking
        loop will actually run coarse levels AND the compact slice is
        enabled. Must mirror tracking_loop's own gate (steps.py): with
        the reference backend the coarse phase is skipped, so a
        phase-major cache would only buy f32 accumulation-order drift
        on the supposedly reference-exact path (plus pointless phase-0
        overflow escalations) for no benefit."""
        tf = self.sys.track_front
        if (not self.compact_coarse_track
                or self.sys.opts.backend == "reference"):
            return ()
        return tuple(s for _, s in tf.levels() if s > 1)

    def _capacity_for(self, n: int) -> int:
        return G.bucket_capacity(n, self.capacity_quantum,
                                 self.capacity_margin, self.capacity_floor)

    def _fit_capacity(self):
        """Grow (or shrink with hysteresis) the map arrays so jitted step
        compile caches key on a small set of capacity buckets."""
        gm = self.map
        n = int(gm.n_active)
        # host-side mirror of the device n_active scalar: reading it here
        # (per densify/prune — a few times per keyframe) lets the per-frame
        # hot path test map size without a device sync
        self.n_active_host = n
        cap = self._capacity_for(n)
        if cap < gm.capacity and n > 0.35 * gm.capacity:
            return
        self.map = G.resize_map(gm, cap)

    def _tile_gt(self, frame: Frame):
        if getattr(frame, "gt_tiled", None) is None:
            frame.gt_tiled = frame_to_tiles(
                frame.gt_color, frame.gt_depth, self.sys.opts.grid)
        return frame.gt_tiled

    # ------------------------------------------------------------------
    def create_map(self):
        """Init the local map from the first frame's unprojection + local
        mapping (Frontend.create_map, :63-73)."""
        frame = self.local_frames[0]
        cap = self._capacity_for(frame.gt_color.shape[0]
                                 * frame.gt_color.shape[1])
        self.map = initialize_map(
            cap, frame.gt_color, frame.gt_depth, _frame_w2c(frame),
            self.sys.cam
        )
        self.n_active_host = int(self.map.n_active)
        self.mapping()

    def _check_escalation(self, diag: dict):
        """Bump pair budgets when the binning diagnostics say the static
        capacities clipped (see SystemConfig.maybe_escalate)."""
        if os.environ.get("GAUS_DEMAND"):
            print(f"[prof] frontend pair demand="
                  f"{int(diag.get('demand', 0))} r_max="
                  f"{self.sys.opts.r_max(self.map.capacity if self.map is not None else 0)}",
                  flush=True)
        new = self.sys.maybe_escalate(
            overflow=bool(diag.get("overflow", False)),
            n_shrunk=int(diag.get("n_shrunk", 0)),
            n_active=self.map.capacity if self.map is not None else 0,
            demand=int(diag.get("demand", 0)),
        )
        if new is not None:
            print(f"[gaus] pair budget escalation: "
                  f"factor {self.sys.opts.pair_budget_factor}->"
                  f"{new.opts.pair_budget_factor}, pair_cap "
                  f"{self.sys.opts.pair_cap}->{new.opts.pair_cap}, d_max "
                  f"{self.sys.opts.max_tiles_per_gaussian}->"
                  f"{new.opts.max_tiles_per_gaussian}")
            self.sys = new

    def tracking(self, frame: Frame, want_view: bool = False,
                 prev_pose=None, spec_cache=None):
        """Returns (depth_l1, view_render|None, n_low|None). With
        ``want_view`` the final-pose render + its low-alpha pixel count
        come back from the SAME program and readback as the tracking
        loop — the keyframe test costs no extra dispatch or sync.

        ``spec_cache``: a PairCache speculatively binned during the
        PREVIOUS frame's tracking at this frame's (identical) init pose —
        skips this frame's binning dispatch entirely. ``prev_pose``
        enables the next frame's speculation (see tracking_loop)."""
        s = self.sys
        t0 = time.perf_counter()
        strides = self._track_strides()
        if spec_cache is not None:
            cache = spec_cache
        else:
            cam0 = s.cam.replace_w2c(_pose_w2c(frame.pose))
            cache = bin_for_tracking(self.map, cam0, s.opts,
                                     coarse_strides=strides)
        if os.environ.get("GAUS_PROFILE"):
            _sync(cache.raw_t)
            t_bin = time.perf_counter() - t0
        tcfg = s.track_front
        iters_pre = None
        diag_pre = None
        n_coarse = min(sum(i for i, _ in tcfg.levels()), tcfg.num_iters)
        if self.tracking_refresh and 0 < n_coarse < tcfg.num_iters:
            # phase 1 (coarse) on the init-pose cache, then re-bin at the
            # updated pose and run the full-res phase on a fresh cache
            pose, aux1 = tracking_loop(
                cache, frame.pose, self._tile_gt(frame), s.cam, s.opts,
                tcfg._replace(num_iters=n_coarse), s.lcfg,
                compact_coarse=bool(strides),
            )
            # the init-pose cache's binning diagnostics must reach the
            # escalation ladder too — a transient overflow in phase 1
            # would otherwise vanish when the cache is rebound
            diag_pre = (cache.overflow, cache.n_shrunk)
            cache = bin_for_tracking(
                self.map, s.cam.replace_w2c(_pose_w2c(pose)), s.opts)
            frame.pose = pose
            iters_pre = aux1["iters"]
            tcfg = tcfg._replace(
                num_iters=tcfg.num_iters - n_coarse, coarse_iters=0,
                coarse_levels=())
            strides = ()  # fresh cache is tile-major; no coarse left
        predict = (self.speculative_bin and prev_pose is not None)
        pose, aux = tracking_loop(
            cache, frame.pose, self._tile_gt(frame), s.cam, s.opts,
            tcfg, s.lcfg, want_view=want_view,
            prev_pose=prev_pose if predict else None,
            predict=predict, use_vel=self.vel_pose_init,
            compact_coarse=bool(strides),
        )
        frame.pose = pose
        # ONE fused readback for everything the host needs this frame
        # (each device_get through the tunnel costs ~1ms + a full drain)
        iters_dev = aux["iters"] if iters_pre is None \
            else aux["iters"] + iters_pre
        fetch = {
            "overflow": cache.overflow, "n_shrunk": cache.n_shrunk,
            "demand": cache.demand,
            "iters": iters_dev, "depth_l1": aux["depth_l1"],
            # final pose matrix rides along: the velocity-model update
            # needs it on the host, and a separate np.asarray(pose.w2c)
            # would cost one more tunnel round-trip per frame
            "w2c": aux["w2c"],
        }
        if diag_pre is not None:
            fetch["overflow"] = jnp.logical_or(fetch["overflow"],
                                               diag_pre[0])
            fetch["n_shrunk"] = jnp.maximum(fetch["n_shrunk"], diag_pre[1])
        if want_view:
            fetch["n_low"] = aux["n_low"]
        if predict:
            # dispatch the NEXT frame's binning at the predicted pose
            # BEFORE the blocking readback below: the device crunches it
            # while the host runs this frame's python. Discarded (by map
            # object identity) if anything changes the map first.
            fetch["pred_w2c"] = aux["pred_w2c"]
            spec_next = bin_for_tracking(
                self.map, s.cam.replace_w2c(aux["pred_w2c"]), s.opts,
                coarse_strides=self._track_strides())
        ts0 = time.perf_counter()
        host = jax.device_get(fetch)
        # device-drain wait vs host dispatch split (bench reporting)
        self.t_sync_acc = (getattr(self, "t_sync_acc", 0.0)
                           + time.perf_counter() - ts0)
        sys_before = self.sys
        self._check_escalation(host)
        frame._w2c_host = np.asarray(host["w2c"])
        # if escalation just bumped the pair budgets, the speculated
        # cache was binned with the OLD budget — using it would overflow
        # again and double-escalate; drop it and re-bin next frame
        self._spec = ((self.map, spec_next, aux["pred_pose"],
                       np.asarray(host["pred_w2c"]))
                      if predict and self.sys is sys_before else None)
        iters = int(host["iters"])
        if os.environ.get("GAUS_PROFILE"):
            print(f"[prof] track: bin={t_bin*1000:.0f}ms "
                  f"loop={(time.perf_counter()-t0-t_bin)*1000:.0f}ms "
                  f"iters={iters}")
        dt = time.perf_counter() - t0
        self.t_track_iter[0] += dt
        self.t_track_iter[1] += max(iters, 1)
        return (float(host["depth_l1"]), aux.get("view"),
                host.get("n_low"))

    def mapping(self, frames=None):
        s = self.sys
        frames = frames or self.local_frames
        # fused path: the whole mapping schedule (K rebin-groups x
        # rebin_every Adam steps) as ONE dispatched program — the
        # per-step host loop pays ~1ms dispatch + pytree plumbing per
        # iteration through the tunneled device
        fused_ok = (not s.lcfg.enable_exposure
                    and not self.additional_densify
                    and self.num_mapping_iters % self.rebin_every == 0)
        if fused_ok:
            t0 = time.perf_counter()
            k = self.num_mapping_iters // self.rebin_every
            sel = [self.rng.choice(frames) for _ in range(k)]
            if all(getattr(f, "pose", None) is not None for f in sel):
                # one vmapped dispatch; per-frame eager pose.w2c costs
                # ~10 small tunnel dispatches each
                w2cs = _stack_w2cs(
                    jnp.stack([f.pose.quat for f in sel]),
                    jnp.stack([f.pose.trans for f in sel]))
            else:
                w2cs = jnp.stack(
                    [jnp.asarray(f.get_w2c, jnp.float32) for f in sel])
            gts = jnp.stack([self._tile_gt(f) for f in sel])
            gm, aux = mapping_loop(self.map, w2cs, gts, s.cam, s.opts,
                                   s.mcfg, s.lcfg,
                                   rebin_every=self.rebin_every,
                                   coarse_stride=self.coarse_map_stride)
            self.map = gm
            for f in sel:
                f.mapping_times += self.rebin_every
            ts0 = time.perf_counter()
            self._check_escalation(jax.device_get(
                {"overflow": aux["overflow"], "n_shrunk": aux["n_shrunk"],
                 "demand": aux.get("demand", 0)}))
            self.t_sync_acc = (getattr(self, "t_sync_acc", 0.0)
                               + time.perf_counter() - ts0)
            dt = time.perf_counter() - t0
            if os.environ.get("GAUS_PROFILE"):
                print(f"[prof] frontend mapping x{self.num_mapping_iters} "
                      f"(fused): {dt*1000:.0f}ms")
            self.t_map_iter[0] += dt
            self.t_map_iter[1] += self.num_mapping_iters
            return

        exp_dummy = init_exposure()
        t0 = time.perf_counter()
        n_steps = 0
        diags = []  # per-step binning diagnostics (device scalars)
        it = 0
        while it < self.num_mapping_iters:
            frame: Frame = self.rng.choice(frames)
            # run `rebin_every` consecutive iterations on this frame with
            # one shared binning (per-iteration motion is sub-pixel; same
            # staleness argument as the tracking pair cache). rebin_every
            # = 1 re-bins inside every step exactly like the reference.
            group = min(self.rebin_every, self.num_mapping_iters - it)
            f_w2c = _frame_w2c(frame)
            bins = None
            if group > 1:
                bins = _bin_full_jit(
                    self.map.params, self.map.active,
                    s.cam.replace_w2c(f_w2c), s.opts)
            for j in range(group):
                exp = (frame.exposure if frame.exposure is not None
                       else exp_dummy)
                gm, exp, aux = mapping_step(
                    self.map, f_w2c, self._tile_gt(frame), exp,
                    jnp.bool_(s.lcfg.enable_exposure
                              and frame.mapping_times > 10),
                    s.exp_sched_front, s.cam, s.opts, s.mcfg, s.lcfg,
                    bins=bins,
                )
                self.map = gm
                diags.append(aux)
                if frame.exposure is not None:
                    frame.exposure = exp
                frame.mapping_times += 1
                n_steps += 1
                it += 1
                if (self.additional_densify
                        and (frame.mapping_times + 1)
                        % self.densify_interval == 0):
                    self._densify(frame)
                    break  # map rows changed: stale bins, resample
        # one readback fences the whole (sequentially dependent) loop —
        # per-iteration syncs serialize dispatch through the device
        # tunnel. fold_diags accumulates across EVERY iteration so a
        # transient mid-loop overflow still escalates.
        if diags:
            ts0 = time.perf_counter()
            self._check_escalation(jax.device_get(fold_diags(diags)))
            self.t_sync_acc = (getattr(self, "t_sync_acc", 0.0)
                               + time.perf_counter() - ts0)
        dt = time.perf_counter() - t0
        if os.environ.get("GAUS_PROFILE"):
            print(f"[prof] frontend mapping x{n_steps}: {dt*1000:.0f}ms "
                  f"({dt/max(n_steps,1)*1000:.0f}ms/iter)")
        self.t_map_iter[0] += dt
        self.t_map_iter[1] += n_steps

    def _densify(self, frame: Frame, render_out=None):
        s = self.sys
        w2c = jax.lax.stop_gradient(_frame_w2c(frame))
        if render_out is None:
            render_out = render_view(self.map, s.cam.replace_w2c(w2c), s.opts)
        self.map = add_new_gaussians(
            self.map, w2c, frame.gt_color, frame.gt_depth, render_out,
            s.cam, s.opts, s.dcfg, s.lcfg,
        )
        # the reference prunes INSIDE add_new_gaussians too (Densify.py:41),
        # in addition to the post-mapping prune in process_frame
        self.map = prune_gaussians(self.map, s.dcfg)
        self._fit_capacity()

    # ------------------------------------------------------------------
    def process_frame(self, time_idx, gt_color, gt_depth, gt_pose):
        """Main frontend pipeline (Frontend.process_frame, :142-222).

        gt_color: [H, W, 3] float 0..1 OR uint8 0..255; gt_depth:
        [H, W] float meters OR uint16 at stage.DEPTH_U16_SCALE counts/m
        (native camera dtypes — see utils/stage.py); gt_pose: c2w [4, 4].
        """
        gt_color = jnp.asarray(gt_color)
        gt_depth = jnp.asarray(gt_depth)
        if gt_color.dtype == jnp.uint8 and gt_depth.dtype == jnp.uint16:
            gt_color, gt_depth = _dequant_rgbd(gt_color, gt_depth)
        elif gt_color.dtype == jnp.uint8:
            gt_color = _dequant_u8(gt_color)
        elif gt_depth.dtype == jnp.uint16:
            gt_depth = _dequant_u16(gt_depth)
        s = self.sys
        prof = os.environ.get("GAUS_PROFILE")
        _marks = []
        _last = [time.perf_counter()]

        def mark(label):
            if prof:
                if self.map is not None:
                    probe_fence(self.map.params.xyz)
                now = time.perf_counter()
                _marks.append((label, (now - _last[0]) * 1000))
                _last[0] = now

        gt_w2c = np.linalg.inv(np.asarray(gt_pose))
        cur = Frame(time_idx=time_idx, gt_color=jnp.asarray(gt_color),
                    gt_depth=jnp.asarray(gt_depth), gt_w2c=gt_w2c,
                    kfid=self.cur_lmid)
        self.local_frames.append(cur)
        if prof:
            probe_fence(cur.gt_depth)  # fence the H2D transfer
            mark("h2d")

        if len(self.local_frames) == 1:
            cur.frame_type = 0  # RKF
            cur.start_optimizer(np.eye(4, dtype=np.float32),
                                s.lcfg.enable_exposure)
            self.create_map()
            return

        frame_t0 = time.perf_counter()
        last = self.local_frames[-2]
        if not self.vel_pose_init:
            self.vel = np.eye(4, dtype=np.float32)
        spec = self._spec
        self._spec = None
        spec_ok = spec is not None and spec[0] is self.map
        if spec_ok:
            # the previous frame's tracking already produced this frame's
            # pose init (device PoseState) and its binning — host pose
            # math and the binning dispatch are both skipped
            cur.pose = spec[2]
            cur._w2c_host = spec[3]
            if s.lcfg.enable_exposure:
                cur.exposure = init_exposure()
        else:
            initial_w2c = self.vel @ _host_w2c(last)
            cur.start_optimizer(initial_w2c, s.lcfg.enable_exposure)
        # the keyframe-coverage view rides along with tracking unless the
        # submap will be cut anyway (then it's never consumed). Whether a
        # cut happens depends on depth_l1, known only after tracking; the
        # map-size/max-frames cuts are known now, which covers all cuts
        # when retracking is off.
        may_need_view = not (
            len(self.local_frames) > self.max_frames
            or self.n_active_host > self.tau_l
        )
        mark("pose_init")
        depth_l1, view_out, n_low = self.tracking(
            cur, want_view=may_need_view and self.fused_kf_view,
            prev_pose=last.pose,
            spec_cache=spec[1] if spec_ok else None)
        self.depth_l1_rec.append(depth_l1)
        mark("tracking")

        tracking_flag = (depth_l1 < self.avg_depth_l1 * 5
                         if self.enable_retracking else True)
        if tracking_flag:
            self.avg_depth_l1 = 0.9 * self.avg_depth_l1 + 0.1 * depth_l1
        self.t_track_frame[0] += time.perf_counter() - frame_t0
        self.t_track_frame[1] += 1

        is_refkf = (
            (not tracking_flag)
            or len(self.local_frames) > self.max_frames
            or self.n_active_host > self.tau_l
        )

        if not tracking_flag:
            cur.start_optimizer(_host_w2c(last), s.lcfg.enable_exposure)
            cur._w2c_host = _host_w2c(last)
            self.vel = np.eye(4, dtype=np.float32)
            self._spec = None  # speculated from the now-discarded pose
            print("Tracking failed, reset localmap!!!")
        else:
            # velocity update on the host: both poses are host mirrors
            # (the tracked one came back in the fused readback), so no
            # extra device round-trip per frame
            self.vel = cur._w2c_host @ _host_inv_se3(_host_w2c(last))

        if not is_refkf:
            hw = s.cam.height * s.cam.width
            if n_low is not None:
                # fused path: the view + count came back with tracking
                out = view_out
                pad = s.opts.grid.num_tiles * s.opts.grid.pixels_per_tile \
                    - hw
                n_low_val = float(n_low) - pad
            else:
                w2c = jax.lax.stop_gradient(_frame_w2c(cur))
                out = render_view(self.map, s.cam.replace_w2c(w2c), s.opts)
                alpha = out[:, 4]
                # padded pixels never accumulate alpha; subtract them
                n_low_val = float(jnp.sum(alpha < 0.5)) - (alpha.size - hw)
            mark("kf_test")
            if n_low_val > hw * self.tau_k:
                map_t0 = time.perf_counter()
                cur.frame_type = 1  # KF
                self._densify(cur, render_out=out)
                mark("densify")
                self.mapping()
                mark("kf_mapping")
                self.map = prune_gaussians(self.map, s.dcfg)
                self._fit_capacity()
                mark("prune")
                self.t_map_frame[0] += time.perf_counter() - map_t0
                self.t_map_frame[1] += 1

        if is_refkf:
            self._cut_submap(time_idx, gt_color, gt_depth, gt_w2c,
                             tracking_flag)
            mark("cut")

        self.numpts_rec.append(self.n_active_host)
        if prof:
            print("[prof] frame " + " ".join(
                f"{k}={v:.0f}ms" for k, v in _marks), flush=True)

    def _cut_submap(self, time_idx, gt_color, gt_depth, gt_w2c,
                    tracking_flag):
        s = self.sys
        prof = os.environ.get("GAUS_PROFILE")
        t0 = time.perf_counter()
        lm = LocalMap.cut(
            self.cur_lmid, self.local_frames, G.extract_params(self.map),
            self.num_frame_saved, tracking_ok=self.tracking_flag,
            rng=self.rng, n_active_host=self.n_active_host,
        )
        if prof:
            t_cut = time.perf_counter() - t0
        self.to_backend.put(lm)
        self.cur_lmid += 1
        cur = Frame(time_idx=time_idx, gt_color=jnp.asarray(gt_color),
                    gt_depth=jnp.asarray(gt_depth), gt_w2c=gt_w2c,
                    kfid=self.cur_lmid, frame_type=0)
        cur.start_optimizer(np.eye(4, dtype=np.float32),
                            s.lcfg.enable_exposure)
        self.local_frames = [cur]
        t1 = time.perf_counter()
        self.create_map()
        if prof:
            _sync(self.map.params.xyz)
            print(f"[prof] cut: localmap.cut={t_cut*1000:.0f}ms "
                  f"create_map={(time.perf_counter()-t1)*1000:.0f}ms")
        self.tracking_flag = tracking_flag
        while hasattr(self.to_backend, "qsize") and self.to_backend.qsize() > 1:
            print("backend too busy !!!")
            time.sleep(1)

    def process_final(self):
        if len(self.local_frames) > 1:
            lm = LocalMap.cut(
                self.cur_lmid, self.local_frames,
                G.extract_params(self.map), self.num_frame_saved,
                rng=self.rng, n_active_host=self.n_active_host,
            )
            self.cur_lmid += 1
            self.to_backend.put(lm)

    # ------------------------------------------------------------------
    def update_common_visualization(self):
        """Periodic frontend dashboards (Frontend.py:231-242): local map
        point count + per-frame depth-L1, plus wandb series when enabled."""
        from ..utils import viz

        out_dir = self.config.get("vis_base_dir", "output")
        os.makedirs(out_dir, exist_ok=True)
        viz.save_series(self.numpts_rec,
                        os.path.join(out_dir, "frontend_numpts.png"))
        viz.save_series(self.depth_l1_rec,
                        os.path.join(out_dir, "depth_l1.png"))
        if self.wandb_run is not None:
            self.wandb_run.log({
                "frontend_numpts": self.numpts_rec[-1] if self.numpts_rec
                else 0,
                "depth_l1": self.depth_l1_rec[-1] if self.depth_l1_rec
                else 0.0,
            })

    # ------------------------------------------------------------------
    def time_stats(self) -> dict:
        def rate(acc):
            return acc[0] / max(acc[1], 1)

        return {
            "tracking_iter_time(ms)": rate(self.t_track_iter) * 1000,
            "tracking_frame_time(s)": rate(self.t_track_frame),
            "mapping_iter_time(ms)": rate(self.t_map_iter) * 1000,
            "mapping_frame_time(s)": rate(self.t_map_frame),
            "frame_time": (self.total_time
                           / max(self.t_track_frame[1], 1)),
        }

    def write_time_json(self):
        out_dir = self.config.get("vis_base_dir", "output")
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "time.json"), "w") as f:
            json.dump(self.time_stats(), f)
