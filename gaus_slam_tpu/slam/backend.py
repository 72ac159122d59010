"""Backend: submap merging + global-map refinement + pose graph.

Host-side orchestration mirroring slam/Backend.py of the reference:

  process_localmap: rigid-transfer the submap's gaussians into the
  global frame (new gaussians start transparent via the opacity cap),
  retrieve covisible submaps by descriptor, and schedule a task queue of
  mapping / prune / tracking ops over them. A lost submap is first
  re-tracked against the global map.

  process(): drains one task at a time (the mp pipeline interleaves this
  with queue polling); when idle, random submaps get refinement mapping.
"""
from __future__ import annotations

import queue as _queue
import random
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..models import gaussians as G
from ..models.frame import init_exposure
from ..models.submap import LocalMap, Localmaps
from ..ops.composite_ref import frame_to_tiles
from ..ops.se3 import invert_se3, quat_multiply, rotmat_to_quat
from ..utils.config import SystemConfig
from ..utils.fence import probe_fence
from .steps import (ba_step, backend_tracking_step, fold_diags,
                    mapping_loop, mapping_step)


def transform_params(params: G.Params, transfer: jnp.ndarray) -> G.Params:
    """Rigid transform of a raw param snapshot
    (Backend.transfer_map_params, Backend.py:157-161)."""
    R, t = transfer[:3, :3], transfer[:3, 3]
    q_r = rotmat_to_quat(R)
    return params._replace(
        xyz=params.xyz @ R.T + t,
        quats=quat_multiply(q_r[None, :], params.quats),
    )


class Backend:
    def __init__(self, config: dict, wandb_run=None, backend: str = "pallas",
                 mesh=None):
        """``mesh``: optional jax.sharding.Mesh. With a multi-device mesh
        the covis-mapping schedule batches up to n_devices keyframes per
        step through parallel.sharded_ba_step (keyframes data-parallel,
        map replicated, gradients all-reduced over ICI) instead of one
        keyframe at a time — the scale-out of Backend.py:101-155."""
        self.config = config
        self.sys = SystemConfig.from_config(config, backend=backend)
        self.wandb_run = wandb_run
        self.mesh = mesh
        self.ba_group = (int(np.prod(mesh.devices.shape))
                         if mesh is not None else 1)
        # backend on a SECOND device (the reference's real concurrency:
        # its backend process owns a separate full map copy on the GPU
        # and overlaps the frontend completely — scripts/gaus_mp.py:
        # 97-114, README.md:108). With tpu.backend_device set, the
        # global map lives on that device; every backend step dispatches
        # there asynchronously and computes WHILE the frontend's next
        # tracking program runs on device 0 — the submap handoff is one
        # device-to-device transfer (_to_dev). Mutually exclusive with a
        # multi-device BA mesh (which replicates the map mesh-wide).
        self.device = None
        bd = str(config.get("tpu", {}).get("backend_device", "off"))
        if bd not in ("off", ""):
            devs = jax.devices()
            if self.ba_group > 1:
                print("[gaus] tpu.backend_device ignored: the multi-"
                      "device BA mesh owns device placement")
            else:
                idx = 1 if bd == "auto" else int(bd)
                if bd == "auto" and len(devs) < 2:
                    pass  # single chip: silently stay colocated
                elif idx >= len(devs):
                    print(f"[gaus] tpu.backend_device={bd} ignored: only "
                          f"{len(devs)} device(s) attached")
                else:
                    self.device = devs[idx]
                    print(f"[gaus] backend map placed on {self.device} "
                          f"(frontend stays on {devs[0]})")
        self.rng = random.Random(config.get("seed", 0) + 1)
        be = config["backend"]
        # the reference's live Open3D viewers (Backend.py:43-46,250-268)
        # need a display; headless analogues: per-submap dashboard pngs
        # (update_common_visualization) + the post-hoc TSDF flythrough
        # (scripts/gen_video.py --mesh). Warn instead of silently
        # ignoring an enabled knob.
        for knob, sub in (("mesh_vis", "scripts/gen_video.py --mesh"),
                          ("render_vis", "scripts/gen_video.py")):
            if be.get(knob, False):
                print(f"[gaus] warning: backend.{knob} requires a display "
                      f"(Open3D live viewer); this headless build writes "
                      f"dashboards per submap instead — see {sub}")
        self.num_ba_iters = int(be["num_ba_iters"])
        self.num_covis = int(be["num_covis_submaps"])
        # 3DGS-style clone/split on the global map (Backend.py:117-128)
        self.gs_densify = bool(be.get("gs_densify", False))
        dens = config["densify"]
        self.densify_interval = int(dens.get("densify_interval", 20))
        self.mapping_iter = 0
        self.grad_accum = None  # np [C], lazily sized to map capacity
        self.grad_denom = None
        self.enable_random = bool(be.get("random_process", True))
        self.final_refinement = int(be.get("final_refinement", -1))
        self.capacity_quantum = int(config.get("tpu", {}).get(
            "capacity_quantum", 1 << 16))
        self.capacity_margin = float(config.get("tpu", {}).get(
            "capacity_margin", 1.3))
        # floor capacity (see Frontend.capacity_floor): pre-size the
        # global map so merges don't flip the capacity bucket every
        # submap (each flip re-traces every backend program)
        self.capacity_floor = int(config.get("tpu", {}).get(
            "backend_capacity", 0))
        # predictive horizon sizing: when a merge DOES need a bigger
        # bucket, jump far enough ahead to cover the next
        # `capacity_horizon` merges' predicted peaks (measured per-merge
        # growth), so bucket flips — each one a 30-90 s re-trace of the
        # whole backend program set on a slow host — happen O(log)
        # times over a trajectory instead of every other merge. The
        # TPU-native replacement for the reference's per-frame dynamic
        # buffer resize (rasterizer_impl.cu:283-291), which a static-
        # shape compiler cannot have.
        self.capacity_horizon = int(config.get("tpu", {}).get(
            "capacity_horizon", 4))
        self._peak_hist: list[int] = []  # merge-peak history (host)
        # coarse mapping for the fused mapping batches (rotating
        # checkerboard tile subsets — see steps.mapping_loop). Separate
        # knob from the frontend's, and applied ONLY to mapping tasks
        # enqueued AFTER the merge's prune (plus idle refinement): the
        # r3 A/B measured all-coarse backend mapping catastrophic
        # (PSNR 16) because merged gaussians enter opacity-capped at
        # logit(0.01) (Backend.py:226) and must re-opacify through
        # PRE-prune mapping coverage before the prune task reaps them —
        # at 1/9 tiles per task most of a merged submap was never
        # rendered in time. Post-prune tasks have no such race; their
        # own A/B row ("cmapb3pp") gates the knob. 1 = dense
        # (reference-exact everywhere).
        self.coarse_map_stride = int(config.get("tpu", {}).get(
            "backend_coarse_map_stride", 1))
        # optional coarse stride for the PRE-prune mapping block too
        # (donor re-opacification coverage drops from 20 dense renders
        # to 20/stride^2 full covers — the exact mechanism that made
        # all-coarse catastrophic at stride 3; stride 2 still covers
        # every tile 5x in a 20-task block and is gated by its own A/B
        # row "cmapb2pre"). 1 = dense (shipped default).
        self.coarse_pre_stride = int(config.get("tpu", {}).get(
            "backend_coarse_pre_stride", 1))
        # running phase offsets per class: 4-task batches are shorter
        # than the stride^2 phase rotation, so coverage must carry
        # across batches (pre and post strides rotate independently)
        self._map_phase = 0
        self._map_phase_pre = 0

        self.map: G.GaussianMap | None = None
        # host mirror of map.n_active: merges add donor counts to it and
        # prune's _fit_capacity refreshes it, so the merge path never
        # forces a mid-merge device-queue drain
        self.n_active_host = 0
        self.local_maps = Localmaps()
        self.cur_lmid = -1
        self.task_queue = _queue.Queue()
        self.covis_idxs: list[int] = []
        self.exposure = init_exposure()  # placeholder when disabled
        # per-submap exposure optimization (Backend.py:106-124):
        # mapping steps the submap's exposure after mapping_times > 120,
        # composed with the frame's frozen exposure (Frame.py:250-257)
        self.enable_exposure = bool(
            config["render"].get("enable_exposure", False))
        self.exposure_start = int(be.get("exposure_start", 120))
        self.ape_rec = []
        self.totalpts_rec = []
        # per-step binning diagnostics accumulate here (device scalars,
        # no readback) until an idle moment or submap end folds them —
        # OR/max across EVERY step, so transient overflows between
        # check points still escalate (VERDICT r2 weak #3)
        self._map_aux_acc: list = []

    def _note_diag(self, aux):
        if aux and "overflow" in aux:
            self._map_aux_acc.append(
                {"overflow": aux["overflow"], "n_shrunk": aux["n_shrunk"],
                 "demand": aux.get("demand", 0)})
            if len(self._map_aux_acc) >= 256:  # bound the device-scalar pile
                self._check_escalation()

    def _check_escalation(self):
        if not self._map_aux_acc:
            return
        diag = jax.device_get(fold_diags(self._map_aux_acc))
        self._map_aux_acc = []
        import os as _os
        if _os.environ.get("GAUS_DEMAND"):
            # peak true pair demand across the accumulated steps vs the
            # static budget — sizes tpu.backend_pair_cap from measurement
            print(f"[prof] backend pair demand={int(diag.get('demand', 0))}"
                  f" r_max={self.sys.opts.r_max(self.map.capacity if self.map is not None else 0)}"
                  f" cap={self.map.capacity if self.map is not None else 0}",
                  flush=True)
        new = self.sys.maybe_escalate(
            overflow=bool(diag["overflow"]),
            n_shrunk=int(diag["n_shrunk"]),
            n_active=self.map.capacity if self.map is not None else 0,
            demand=int(diag.get("demand", 0)),
        )
        if new is not None:
            print(f"[gaus] backend pair budget escalation: "
                  f"factor {self.sys.opts.pair_budget_factor}->"
                  f"{new.opts.pair_budget_factor}, pair_cap "
                  f"{self.sys.opts.pair_cap}->{new.opts.pair_cap}, d_max "
                  f"{self.sys.opts.max_tiles_per_gaussian}->"
                  f"{new.opts.max_tiles_per_gaussian}")
            self.sys = new

    # ------------------------------------------------------------------
    def _merge_horizon(self) -> int:
        """Predicted additional merge-peak growth over the next
        ``capacity_horizon`` merges, from the measured peak history.
        Covering it up front turns per-merge bucket flips (each a full
        backend re-trace) into O(log)-per-run events. The jump is
        CAPPED at 75% of the current need: every per-pair op's cost
        scales with the capacity bucket (r_max = factor * capacity), so
        an extrapolation overshoot — early growth is donor-sized and
        decelerates as scene coverage saturates — would tax the whole
        rest of the run (an unbounded version measured a 7.7M-row
        bucket at 680x1200 where the true peak was ~2.2M)."""
        if len(self._peak_hist) < 2 or self.capacity_horizon <= 0:
            return 0
        # merge peaks only: the first entry is the first submap's donor
        # count, and the donor->peak jump is structurally large —
        # extrapolating it quadrupled the bucket on a flat-growth scene
        # (measured: peaks 2.35M, 2.25M after a 1.16M first donor)
        real = self._peak_hist[1:]
        if len(real) >= 3:
            recent = real[-4:]
            deltas = sorted(max(b - a, 0)
                            for a, b in zip(recent, recent[1:]))
            # true median, robust to one odd merge (even-length lists
            # average the middle two — deltas[n//2] alone would pick the
            # MAX of a 2-delta history and bias the first horizon up)
            mid = len(deltas) // 2
            g = (deltas[mid] if len(deltas) % 2
                 else (deltas[mid - 1] + deltas[mid]) // 2)
            return min(self.capacity_horizon * g, (3 * real[-1]) // 4)
        # low-confidence first flip (no real growth data yet): a quarter
        # of the current need as headroom — enough that steadily-growing
        # scenes keep the next several merges in-bucket, small enough
        # that flat-growth scenes aren't taxed by r_max-scaled work
        d = max(self._peak_hist[-1] - self._peak_hist[-2], 0)
        return min(d, self._peak_hist[-1] // 4)

    def _fit_capacity(self, needed: int | None = None, horizon: int = 0):
        gm = self.map
        if needed is None:
            # one device sync; refresh the host mirror while we're at it
            # (merges size buckets from the mirror so they never sync)
            needed = int(gm.n_active)
            self.n_active_host = needed
        n = needed
        cap = G.bucket_capacity(n, self.capacity_quantum,
                                self.capacity_margin, self.capacity_floor)
        if cap < gm.capacity:
            if n > 0.35 * gm.capacity:
                return
            # never shrink below the LAST merge peak: the post-prune
            # active count dips well under the peak every cycle, and a
            # shrink here would re-trace now AND again at the next
            # merge (measured oscillation: 1.7M <-> 4.9M every cycle)
            if self._peak_hist:
                floor = G.bucket_capacity(
                    int(1.05 * self._peak_hist[-1]), self.capacity_quantum,
                    1.0, self.capacity_floor)
                cap = max(cap, floor)
                if cap >= gm.capacity:
                    return
        if cap > gm.capacity and horizon > 0:
            # this merge flips the bucket anyway — jump to the bucket
            # covering the predicted horizon so the NEXT merges don't
            cap = G.bucket_capacity(n + horizon, self.capacity_quantum,
                                    self.capacity_margin,
                                    self.capacity_floor)
        if cap != gm.capacity:
            # host-visible flip counter: every flip re-traces the whole
            # backend program set (30-90 s on a slow host), so the bench
            # asserts none land inside a measured window
            self.bucket_flips = getattr(self, "bucket_flips", 0) + 1
            print(f"[gaus] backend capacity bucket {gm.capacity} -> {cap} "
                  f"(needed {n}, horizon {horizon}) — backend programs "
                  f"re-trace at the new shape", flush=True)
        self.map = G.resize_map(gm, cap)

    def _tile_gt(self, frame):
        gt = getattr(frame, "gt_tiled", None)
        if gt is None:
            gt = frame_to_tiles(
                frame.gt_color, frame.gt_depth, self.sys.opts.grid)
        if self.device is not None and self.device not in gt.devices():
            # frontend-cached tiles live on device 0; jit rejects
            # mixed-committed inputs, so hand them over once
            gt = jax.device_put(gt, self.device)
        frame.gt_tiled = gt
        return gt

    # ------------------------------------------------------------------
    def mapping(self, lm_idx: int):
        s = self.sys
        lm: LocalMap = self.local_maps[lm_idx]
        if not lm.saved_idxs:  # e.g. a 1-frame submap retains nothing
            return {}
        fid = self.rng.choice(lm.saved_idxs)
        frame = lm.frames[fid]
        w2c = lm.get_frame_w2c(fid)
        # per-submap exposure: composed with the frame's frozen exposure
        # inside the step; stepped only once mapping_times (counted
        # AFTER this call, like the reference's increment-then-check at
        # Backend.py:121-124) exceeds the threshold — first exposure
        # step lands on mapping call exposure_start + 1
        live_exp = self.enable_exposure and lm.exposure is not None
        exp = lm.exposure if live_exp else self.exposure
        fexp = (jnp.asarray(lm.frame_exp(fid)) if live_exp else None)
        do_exp = jnp.bool_(live_exp
                           and lm.mapping_times + 1 > self.exposure_start)
        gm, exp_out, aux = mapping_step(
            self.map, w2c, self._tile_gt(frame), exp,
            do_exp, s.exp_sched_back, s.cam, s.opts, s.mcfg, s.lcfg,
            frame_exp=fexp,
        )
        self.map = gm
        if live_exp:
            lm.exposure = exp_out
        lm.mapping_times += 1
        self._note_diag(aux)
        if self.gs_densify:
            self._gs_densify_step(aux)
        return aux

    def _gs_densify_step(self, aux):
        """Accumulate view-space grad stats; every densify_interval
        mapping iters run clone/split/prune (Backend.py:117-128)."""
        cap = self.map.capacity
        if self.grad_accum is None or self.grad_accum.shape[0] != cap:
            self.grad_accum = np.zeros(cap, np.float32)
            self.grad_denom = np.zeros(cap, np.float32)
        stat = np.asarray(aux["densify_stat"])
        vis = np.asarray(aux["visible"])
        self.grad_accum[: stat.shape[0]] += stat
        self.grad_denom[: vis.shape[0]] += vis
        self.mapping_iter += 1
        if (self.mapping_iter + 1) % self.densify_interval == 0:
            dens = self.config["densify"]
            grads = self.grad_accum / np.maximum(self.grad_denom, 1.0)
            self.map = G.densify_and_prune(
                self.map, jnp.asarray(grads),
                jax.random.PRNGKey(self.rng.getrandbits(31)),
                grad_threshold=float(dens["densify_grad_threshold"]),
                percent_dense=float(dens["percent_dense"]),
                extent=float(dens.get("extent", 2.0)),
                min_opacity=float(dens.get("opacity_cuil", 0.05)),
                min_scale=float(dens.get("scale_cuil", 5e-4)),
            )
            self._fit_capacity()
            # point set changed: stats reset (densification_postfix)
            self.grad_accum = None
            self.grad_denom = None

    # batch size for fusing consecutive mapping tasks into one program
    # (kept at ONE static value so only a single extra shape bucket
    # compiles; partial batches fall back to per-step mapping)
    MAP_BATCH = 4

    def mapping_batch(self, lm_idxs: list[int], coarse: bool = False):
        """len(lm_idxs) mapping tasks as one mapping_loop dispatch —
        same schedule (each task re-bins against the current map), a
        fraction of the host dispatch cost.

        ``coarse``: render each task on the rotating checkerboard subset
        (1/stride^2 tiles; see coarse_map_stride above) — the post-prune
        task class, where the merge-opacity-cap/prune race cannot bite.
        Pre-prune batches use ``coarse_pre_stride`` (default 1 = dense),
        with an independent phase rotation."""
        stride = self.coarse_map_stride if coarse else self.coarse_pre_stride
        s = self.sys
        w2cs, gts, touched = [], [], []
        for i in lm_idxs:
            lm: LocalMap = self.local_maps[i]
            if not lm.saved_idxs:
                continue
            fid = self.rng.choice(lm.saved_idxs)
            w2cs.append(jnp.asarray(lm.get_frame_w2c(fid), jnp.float32))
            gts.append(self._tile_gt(lm.frames[fid]))
            touched.append(lm)
        if not w2cs:
            return {}
        if len(w2cs) != len(lm_idxs):
            # a selected submap retained nothing (1-frame submap): a
            # partial batch would compile a NEW mapping_loop shape bucket
            # (seconds-to-minutes of trace+lower) — fall back to the
            # already-compiled single-step program instead
            for i in lm_idxs:
                self.mapping(i)
            return {}
        phase0 = self._map_phase if coarse else self._map_phase_pre
        gm, aux = mapping_loop(self.map, jnp.stack(w2cs), jnp.stack(gts),
                               s.cam, s.opts, s.mcfg, s.lcfg,
                               rebin_every=1,
                               coarse_stride=stride,
                               phase0=phase0)
        if stride > 1:
            # coverage carries across batches (4-task batches are
            # shorter than the stride^2 phase rotation)
            nxt = (phase0 + len(w2cs)) % (stride * stride)
            if coarse:
                self._map_phase = nxt
            else:
                self._map_phase_pre = nxt
        self.map = gm
        for lm in touched:
            lm.mapping_times += 1
        self._note_diag(aux)
        return aux

    def tracking(self, lm_idx: int, tcfg=None):
        s = self.sys
        lm: LocalMap = self.local_maps[lm_idx]
        if not lm.saved_idxs:  # e.g. a 1-frame submap retains nothing
            return {}
        fid = self.rng.choice(lm.saved_idxs)
        frame = lm.frames[fid]
        live_exp = self.enable_exposure and lm.exposure is not None
        pose, aux = backend_tracking_step(
            self.map, lm.transform, jnp.asarray(frame.est_w2c),
            self._tile_gt(frame), s.cam, s.opts,
            tcfg or s.track_back, s.lcfg,
            exposure=lm.exposure if live_exp else None,
            frame_exp=(jnp.asarray(lm.frame_exp(fid))
                       if live_exp else None),
        )
        lm.transform = pose
        self._note_diag(aux)
        return aux

    def ba(self, lm_idx: int):
        """Backend "ba" task (Backend.py:130-155): a mapping step at the
        composed frame pose plus an LR-schedule advance on the submap
        transform (see steps.ba_step for why the pose itself receives no
        gradient — faithful to the reference's own detach). Never
        enqueued by the shipped schedule (dead in the reference too);
        reachable through process() for parity (Backend.py:189-191)."""
        s = self.sys
        lm: LocalMap = self.local_maps[lm_idx]
        if not lm.saved_idxs:
            return {}
        fid = self.rng.choice(lm.saved_idxs)
        frame = lm.frames[fid]
        live_exp = self.enable_exposure and lm.exposure is not None
        exp = lm.exposure if live_exp else self.exposure
        gm, pose, exp_out, aux = ba_step(
            self.map, lm.transform,
            jnp.asarray(frame.est_w2c, jnp.float32),
            self._tile_gt(frame), exp, s.cam, s.opts, s.mcfg, s.lcfg,
            s.exp_sched_back,
            frame_exp=(jnp.asarray(lm.frame_exp(fid))
                       if live_exp else None),
        )
        self.map = gm
        lm.transform = pose
        if live_exp:
            lm.exposure = exp_out
        self._note_diag(aux)
        return aux

    def re_tracking(self, lm_idx: int):
        """Recover a lost submap against the global map with doubled
        frontend-style tracking (Backend.re_tracking, :54-79)."""
        iters = 2 * self.sys.track_front.num_iters
        for _ in range(iters):
            self.tracking(lm_idx, tcfg=self.sys.track_front)

    def prune(self):
        from .densify import prune_gaussians

        self.map = prune_gaussians(self.map, self.sys.dcfg)
        self._fit_capacity()

    # ------------------------------------------------------------------
    def mapping_group(self, lm_idxs: list[int]):
        """One sharded BA step over a group of keyframes (one per mesh
        device; partial groups are padded with zero weight)."""
        from ..parallel import sharded_ba_step

        s = self.sys
        entries = []
        for i in lm_idxs:
            lm: LocalMap = self.local_maps[i]
            if not lm.saved_idxs:  # e.g. a 1-frame submap retains nothing
                continue
            fid = self.rng.choice(lm.saved_idxs)
            entries.append((lm, fid))
        if not entries:
            return {}
        n_dev = self.ba_group
        w2cs, gts, wts = [], [], []
        for k in range(n_dev):
            lm, fid = entries[k % len(entries)]
            w2cs.append(jnp.asarray(lm.get_frame_w2c(fid), jnp.float32))
            gts.append(self._tile_gt(lm.frames[fid]))
            wts.append(1.0 if k < len(entries) else 0.0)
        gm, loss, diag = sharded_ba_step(
            self.mesh, self.map, jnp.stack(w2cs), jnp.stack(gts),
            s.cam, s.opts, s.mcfg, s.lcfg,
            weights=jnp.asarray(wts, jnp.float32),
        )
        self.map = gm
        self.ba_group_calls = getattr(self, "ba_group_calls", 0) + 1
        self._note_diag(diag)  # mesh path escalates too
        for lm, _ in entries:
            lm.mapping_times += 1
        return {"loss": loss, **diag}

    def process(self):
        """Drain one task (Backend.process, :174-194)."""
        import os as _os
        prof = _os.environ.get("GAUS_PROFILE")
        if prof:
            _t0 = time.perf_counter()
            _cmd0 = (self.task_queue.queue[0][0]
                     if not self.task_queue.empty() else "idle")
        if not self.task_queue.empty():
            cmd = self.task_queue.get()
            if cmd[0] == "prune":
                self.prune()
            elif cmd[0] == "tracking":
                self.tracking(cmd[1])
            elif cmd[0] == "ba":
                self.ba(cmd[1])
            elif cmd[0] == "mapping":
                # the fused/sharded batch paths can't step per-submap
                # exposure (or per-step densify stats) -> sequential path
                fuse_ok = not self.gs_densify and not self.enable_exposure
                coarse = bool(cmd[2]) if len(cmd) > 2 else False

                def _same_coarse():
                    head = self.task_queue.queue[0]
                    return (head[0] == "mapping"
                            and (bool(head[2]) if len(head) > 2
                                 else False) == coarse)

                if self.ba_group > 1 and fuse_ok:
                    # batch consecutive mapping tasks onto the mesh
                    idxs = [cmd[1]]
                    while (len(idxs) < self.ba_group
                           and not self.task_queue.empty()
                           and self.task_queue.queue[0][0] == "mapping"):
                        idxs.append(self.task_queue.get()[1])
                    self.mapping_group(idxs)
                elif fuse_ok:
                    # single chip: fuse up to MAP_BATCH consecutive
                    # mapping tasks (of the same coarse class) into one
                    # dispatched program (only full batches, so exactly
                    # one extra shape bucket per class)
                    idxs = [cmd[1]]
                    while (len(idxs) < self.MAP_BATCH
                           and self.task_queue.qsize() > 0
                           and _same_coarse()):
                        idxs.append(self.task_queue.get()[1])
                    if len(idxs) == self.MAP_BATCH:
                        self.mapping_batch(idxs, coarse=coarse)
                    else:
                        for i in idxs:
                            self.mapping(i)
                else:
                    self.mapping(cmd[1])
        elif self.enable_random and len(self.local_maps) > 0:
            self._check_escalation()  # idle: fold in the last diagnostics
            # idle refinement is steady-state work (post-prune): coarse ok
            self.task_queue.put(
                ("mapping", self.rng.choice(range(len(self.local_maps))),
                 True)
            )
        if prof:
            dt = time.perf_counter() - _t0
            self._prof_acc = getattr(self, "_prof_acc", {})
            a = self._prof_acc.setdefault(_cmd0, [0.0, 0])
            a[0] += dt
            a[1] += 1
            if sum(v[1] for v in self._prof_acc.values()) % 25 == 0:
                print("[prof] backend tasks " + " ".join(
                    f"{k}:{v[0]/max(v[1],1)*1000:.0f}ms x{v[1]}"
                    for k, v in self._prof_acc.items()), flush=True)

    def process_localmap(self, lm: LocalMap, multi_process: bool = False):
        """Merge one submap (Backend.process_localmap, :196-248)."""
        import os as _os
        import time as _time

        _t0 = _time.perf_counter()
        _prof = _os.environ.get("GAUS_PROFILE")

        def _mark(label, _last=[_t0]):
            if _prof:
                # scalar-probe fence (block_until_ready does not sync
                # through the device tunnel)
                if self.map is not None:
                    probe_fence(self.map.params.xyz)
                now = _time.perf_counter()
                print(f"[prof] merge.{label}: {(now-_last[0])*1000:.0f}ms",
                      flush=True)
                _last[0] = now

        s = self.sys
        self.local_maps.add_localmap(lm)
        self.cur_lmid += 1
        params, active, n_active = lm.map_params
        lm.map_params = None
        if self.device is not None:
            # the submap handoff: one device-to-device transfer of the
            # donor snapshot (the analogue of the reference's deepcopy
            # through the mp.Queue into the backend process); everything
            # downstream — rigid transfer, merge, BA — runs on the
            # backend device, overlapping the frontend's device
            params, active = jax.device_put((params, active), self.device)
        # donor count: host mirror from the cut when available (reading
        # the device scalar here would drain the whole device queue)
        n_donor = (lm.n_active_host if lm.n_active_host is not None
                   else int(n_active))
        _mark("add_localmap")

        if self.cur_lmid == 0:
            initial_w2kf = np.eye(4, dtype=np.float32)
        else:
            last = self.local_maps[self.cur_lmid - 1]
            # stays a device array: np.asarray would sync the queue
            initial_w2kf = last.get_frame_w2c(-1)

        if not lm.tracking_ok:
            print("backend global tracking for local tracking lost")
            lm.start_optimizer(initial_w2kf, self.enable_exposure)
            self.re_tracking(self.cur_lmid)
            initial_w2kf = np.asarray(lm.get_w2c)

        lm.start_optimizer(initial_w2kf, self.enable_exposure)
        _mark("retrack_or_init")

        if self.cur_lmid == 0:
            self._peak_hist.append(n_donor)
            cap = G.bucket_capacity(n_donor, self.capacity_quantum,
                                    self.capacity_margin,
                                    self.capacity_floor)
            gm = G.empty_map(cap)
            self.map = G.add_params(gm, params, active)
            self.n_active_host = n_donor
            # the first submap's donors enter at FULL opacity (no cap,
            # no prune scheduled) — coarse is race-free here
            for _ in range(self.num_ba_iters):
                self.task_queue.put(("mapping", 0, True))
        else:
            # transfer stays ON DEVICE: np.asarray here would block on
            # every queued device op before the merge can even dispatch
            transfer = invert_se3(jnp.asarray(lm.get_w2c)) \
                @ jnp.asarray(lm.ref2f0)
            params = transform_params(params, transfer.astype(jnp.float32))
            # merged gaussians start (almost) transparent (Backend.py:226)
            cap_logit = float(np.log(0.01 / 0.99))
            params = params._replace(
                opacity_logit=jnp.minimum(params.opacity_logit, cap_logit)
            )
            peak = self.n_active_host + n_donor
            self._peak_hist.append(peak)
            self._fit_capacity(peak, horizon=self._merge_horizon())
            self.n_active_host += n_donor
            _mark("transform+fit")
            self.map = G.add_params(self.map, params, active)
            _mark("add_params")
            self.covis_idxs = self.local_maps.query_covisable(
                self.cur_lmid, self.num_covis
            )
            _mark("covis")
            near = self.covis_idxs[: max(self.num_covis // 2, 1)]
            # pre-prune mapping stays DENSE (coarse_ok=False): these
            # tasks must re-opacify the opacity-capped merge donors
            # before the prune task reaps them (see coarse_map_stride)
            for _ in range(self.num_ba_iters):
                self.task_queue.put(
                    ("mapping", self.rng.choice(near), False))
            self.task_queue.put(("prune", None))
            for _ in range(self.num_ba_iters // 2):
                self.task_queue.put(("tracking", self.cur_lmid))
            for _ in range(self.num_ba_iters):
                self.task_queue.put(
                    ("mapping", self.rng.choice(self.covis_idxs), True))
            for _ in range(self.num_ba_iters):
                self.task_queue.put(
                    ("tracking", self.rng.choice(self.covis_idxs)))

        if not multi_process:
            n_tasks = self.task_queue.qsize()
            while not self.task_queue.empty():
                self.process()
            self._check_escalation()
            if _os.environ.get("GAUS_PROFILE"):
                jax.block_until_ready(self.map.params.xyz)
                dt = _time.perf_counter() - _t0
                print(f"[prof] backend submap: {dt:.1f}s for {n_tasks} tasks "
                      f"({dt/max(n_tasks,1)*1000:.0f}ms/task) "
                      f"n={int(self.map.n_active)}")
        # host mirror (exact: merges add the donor count, prune refreshes)
        # — reading the device scalar would drain the queue per merge
        self.totalpts_rec.append(self.n_active_host)

    def update_common_visualization(self):
        """Per-submap backend dashboards (Backend.py:271-331): aligned
        APE trajectory plot + point count + per-frame translation error +
        APE history; populates ape_rec and logs to wandb when enabled.
        Gated by config['backend']['common_vis'] like the reference."""
        if not self.config["backend"].get("common_vis", False):
            return
        if len(self.local_maps) == 0 or self.local_maps[-1].transform is None:
            return
        from ..utils import viz
        from ..utils.trajectory import ate_rmse

        out_dir = self.config.get("vis_base_dir", "output")
        import os
        os.makedirs(out_dir, exist_ok=True)
        w2cs = self.local_maps.get_w2cs()
        gts = self.local_maps.get_gt_w2cs()
        keep = [i for i in range(len(gts))
                if np.isfinite(np.asarray(gts[i])).all()]
        w2cs = [w2cs[i] for i in keep]
        gts = [gts[i] for i in keep]
        if len(w2cs) > 3:
            ate = ate_rmse(w2cs, gts)["rmse"]
            self.ape_rec.append(float(ate))
            viz.save_trajectory_plot(
                w2cs, gts, os.path.join(out_dir, "evo_2dplot.png"), ate=ate)
            if self.wandb_run is not None:
                self.wandb_run.log({"cur_lmid": self.cur_lmid, "APE": ate})
        viz.save_series(self.totalpts_rec,
                        os.path.join(out_dir, "backend_numpts.png"))
        dif = [float(np.linalg.norm(
            (np.asarray(w) @ np.linalg.inv(np.asarray(g)))[:3, 3]))
            for w, g in zip(w2cs, gts)]
        viz.save_series(dif, os.path.join(out_dir, "trackloss.png"))
        viz.save_series(self.ape_rec, os.path.join(out_dir, "ape.png"))
        if self.wandb_run is not None:
            self.wandb_run.log({"backend_numpts": self.totalpts_rec[-1]
                                if self.totalpts_rec else 0})

    def final_refine(self, progress=False):
        """Final refinement over random submaps (Backend.final_refine,
        :163-172). iters == -1 means one iteration per processed frame."""
        iters = self.final_refinement
        if iters == -1:
            iters = self.local_maps[-1].frames[-1].time_idx
        bar = None
        if progress and iters:
            from tqdm import tqdm

            bar = tqdm(total=iters, desc="final_refine")
        done = 0
        while done < iters:
            k = min(self.MAP_BATCH, iters - done)
            idxs = [self.rng.choice(range(len(self.local_maps)))
                    for _ in range(k)]
            if (not self.gs_densify and not self.enable_exposure
                    and k == self.MAP_BATCH):
                self.mapping_batch(idxs)
            else:
                for i in idxs:
                    self.mapping(i)
            done += k
            if bar is not None:
                bar.update(k)
        if bar is not None:
            bar.close()
