"""Config-as-code loading + typed views.

The experiment surface is preserved from the reference: a python module
exporting a nested ``config`` dict with sections render / frontend /
backend / densify / loss / data / gaussians / cameras / viz / eval
(configs/replica/config.py), loaded via SourceFileLoader
(scripts/gaus.py:131-133) and mutated in place with the probed camera
height/width/intrinsics (scripts/gaus.py:75-78).

``SystemConfig`` converts the dict into the hashable static config
objects the jitted step functions key their compile caches on.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from importlib.machinery import SourceFileLoader

import numpy as np

from ..models.frame import LrSchedule
from ..ops.binning import make_grid
from ..ops.camera import Camera, camera_from_intrinsics
from ..render import RenderOptions
from ..slam.densify import DensifyConfig
from ..slam.loss import LossConfig
from ..slam.steps import MapConfig, TrackConfig


def load_config(path: str) -> dict:
    module = SourceFileLoader("exp_config", path).load_module()
    return module.config


def probe_cameras(config: dict, color, intrinsics) -> None:
    """Fill config['cameras'] h/w/K from the first frame
    (scripts/gaus.py:75-78)."""
    config["cameras"]["height"] = int(color.shape[0])
    config["cameras"]["width"] = int(color.shape[1])
    k = np.asarray(intrinsics)
    config["cameras"]["intrinsics"] = k[:3, :3].tolist()


def _sched(lr_cfg: dict, prefix: str) -> LrSchedule:
    return LrSchedule(
        float(lr_cfg[f"{prefix}_lr_init"]),
        float(lr_cfg[f"{prefix}_lr_final"]),
        int(lr_cfg[f"{prefix}_lr_max_step"]),
    )


@dataclass(frozen=True)
class SystemConfig:
    cam: Camera                # intrinsics carrier (w2c = identity)
    opts: RenderOptions
    lcfg: LossConfig
    dcfg: DensifyConfig
    mcfg: MapConfig
    track_front: TrackConfig
    track_back: TrackConfig
    exp_sched_front: LrSchedule
    exp_sched_back: LrSchedule
    adam_betas: tuple

    # pair-budget escalation ladder for max_tiles_per_gaussian
    DMAX_LADDER = (4, 6, 9, 16)

    def maybe_escalate(self, *, overflow: bool, n_shrunk: int,
                       n_active: int,
                       demand: int = 0) -> "SystemConfig | None":
        """Escalated copy of this config, or None if budgets hold.

        TPU-native replacement for the reference's dynamic binning-buffer
        resize (rasterizer_impl.cu:283-291): capacities are static per
        compile, so on pair-budget overflow the budget factor grows,
        and when a meaningful fraction of gaussians had their tile rect
        shrunk to fit d_max, d_max moves up the ladder. Escalations are
        monotone and bucketed, so at most a handful of recompiles happen
        over a whole run.

        ``demand``: the binning's TRUE (unclipped) pair count when the
        overflow fired — the new factor is sized to cover it with 15%
        headroom (rounded up to 1/8 steps so factors stay bucketed)
        instead of a blind 1.5x, which overshot ~27% at full
        resolution and taxes every subsequent per-pair op.
        """
        opts = self.opts
        factor = opts.pair_budget_factor
        pair_cap = opts.pair_cap
        dmax = opts.max_tiles_per_gaussian
        if overflow and pair_cap > 0:
            # demand-keyed budget: raise the explicit row cap (quantized
            # so the program set stays bounded); demand sizes the jump in
            # ONE re-trace, the same pattern as the capacity floors
            q = 1 << 17
            need = int(demand * 1.15) if demand > pair_cap \
                else int(pair_cap * 1.25)
            pair_cap = max(-(-need // q) * q, pair_cap + q)
        elif overflow and factor < 16:
            if demand > 0 and n_active > 0:
                # size to demand when it exceeds the current budget;
                # otherwise (e.g. a phase-block overflow whose global
                # demand fits) take one minimal 1.125x step
                need = -(-(demand * 1.15 / n_active) * 8 // 1) / 8
                factor = min(16.0, need if need > factor
                             else round(factor * 1.125, 3))
            else:
                # no demand signal: legacy 1.5x step
                factor = round(factor * 1.5, 3)
        # radius-shrink only trims the outer sigma of oversized splats;
        # escalate d_max when it stops being a tail phenomenon (>2%)
        if n_shrunk > max(64, 0.02 * max(n_active, 1)):
            for step in self.DMAX_LADDER:
                if step > dmax:
                    dmax = step
                    break
        if (factor, pair_cap, dmax) == (opts.pair_budget_factor,
                                        opts.pair_cap,
                                        opts.max_tiles_per_gaussian):
            return None
        return dataclasses.replace(
            self,
            opts=opts._replace(pair_budget_factor=factor,
                               pair_cap=pair_cap,
                               max_tiles_per_gaussian=dmax),
        )

    @classmethod
    def from_config(cls, config: dict, backend: str = "pallas",
                    component: str = "backend"):
        camcfg = config["cameras"]
        h, w = camcfg["height"], camcfg["width"]
        cam = camera_from_intrinsics(
            h, w, np.asarray(camcfg["intrinsics"]), np.eye(4, dtype=np.float32)
        )
        grid = make_grid(cam, 16, 16)
        r = config["render"]
        method = r.get("method", "2dgs")
        if method not in ("2dgs", "3dgs"):
            raise ValueError(f"unknown render method {method!r}")
        tpu = config.get("tpu", {})
        # fail at config time with an actionable message, not deep
        # inside kernel compilation / a jit trace (advisor r4):
        # v5e Mosaic cannot lower bf16 VPU comparisons, so the bf16
        # compute path only exists under interpret mode (PERF.md
        # "precision lever").
        compute_dtype = str(tpu.get("compute_dtype", "f32"))
        if compute_dtype == "bf16" and backend == "pallas":
            raise ValueError(
                "tpu.compute_dtype='bf16' cannot compile on the pallas "
                "backend (v5e Mosaic rejects bf16 comparisons); use "
                "backend='interpret' for the bf16 experiment path or "
                "keep compute_dtype='f32'")
        # pyramid coarse tracking: multiple levels need the NESTED
        # phase order, which exists for coarsest stride 2 or 4 only
        # (ops/binning.phase_positions) with each level dividing the
        # previous — otherwise the assert fires mid-trace
        lvl_strides = [int(s) for _, s in
                       (config["frontend"].get("coarse_levels") or ())
                       if int(s) > 1]
        if len(lvl_strides) > 1:
            if lvl_strides[0] not in (2, 4):
                raise ValueError(
                    f"frontend.coarse_levels coarsest stride "
                    f"{lvl_strides[0]} unsupported: the nested "
                    f"phase-major cache exists for strides 2 and 4")
            for a, b in zip(lvl_strides, lvl_strides[1:]):
                if a % b != 0:
                    raise ValueError(
                        f"frontend.coarse_levels strides {lvl_strides} "
                        f"must nest (each divides the previous)")
        # per-component pair budgets: r_max = factor * CAPACITY bucket.
        # The backend's active count approaches its capacity at merge
        # peaks, but the frontend's stays well below its floor (bounded
        # by tau_l while the floor covers tau_l * margin), so the
        # frontend can run a lower factor — every tracking iteration's
        # per-pair elementwise work scales with r_max. Escalation
        # (maybe_escalate) is the overflow backstop for both.
        factor = float(tpu.get("pair_budget_factor", 2))
        pair_cap = int(tpu.get("backend_pair_cap", 0))
        if component == "frontend":
            factor = float(tpu.get("pair_budget_factor_frontend", factor))
            pair_cap = int(tpu.get("frontend_pair_cap", 0))
        opts = RenderOptions(
            grid=grid, use_sa=bool(r.get("use_sa", True)), backend=backend,
            pair_budget_factor=factor,
            pair_cap=pair_cap,
            max_tiles_per_gaussian=int(config.get("tpu", {}).get(
                "max_tiles_per_gaussian", 4)),
            normals_in_tracking=bool(
                config["loss"].get("use_normal_loss", False)),
            method=method,
            compute_dtype=compute_dtype,
            iso3d=config["gaussians"].get(
                "gaussian_distribution", "anisotropic") == "isotropic",
        )
        loss = config["loss"]
        dens = config["densify"]
        lcfg = LossConfig(
            use_weight_norm=bool(r.get("use_weight_norm", True)),
            eps=float(r.get("eps", 1e-6)),
            depth_far=float(r.get("depth_far", 1e2)),
            depth_near=float(r.get("depth_near", 1e-2)),
            enable_exposure=bool(r.get("enable_exposure", False)),
            silmask_th=float(loss.get("silmask_th", 0.9)),
            ignore_outliers=bool(loss.get("ignore_outliners", False)),
            w_color_tracking=float(loss["tracking"]["color"]),
            w_depth_tracking=float(loss["tracking"]["depth"]),
            w_color_mapping=float(loss["mapping"]["color"]),
            w_depth_mapping=float(loss["mapping"]["depth"]),
            w_dist=float(loss["mapping"].get("dist", 0.0)),
            use_edge_growth=bool(dens.get("use_edge_growth", False)),
            edge_thres=float(dens.get("edge_thres", 0.4)),
        )
        dcfg = DensifyConfig(
            sil_thres=float(dens["sil_thres"]),
            dep_thres=float(dens.get("dep_thres", 0.1)),
            opacity_cull=float(dens.get("opacity_cuil", 0.05)),
            scale_cull=float(dens.get("scale_cuil", 5e-4)),
            scale_max=float(dens.get("scale_max", 0.1)),
            use_edge_growth=bool(dens.get("use_edge_growth", False)),
            edge_thres=float(dens.get("edge_thres", 0.4)),
        )
        ta = config["gaussians"]["training_args"]
        mcfg = MapConfig(
            lrs=tuple(sorted(
                (k, float(v)) for k, v in ta.items()
                if k in ("xyz_lr", "scaling_lr", "rotation_lr",
                         "opacity_lr", "rgb_lr")
            )),
            isotropic=config["gaussians"].get(
                "gaussian_distribution", "anisotropic") == "isotropic",
            gs_stats=bool(config["backend"].get("gs_densify", False)),
        )
        betas = tuple(camcfg.get("adam_betas", (0.9, 0.99)))
        fe, be = camcfg["frontend_lr"], camcfg["backend_lr"]
        fr = config["frontend"]
        nb = config["backend"]["num_ba_iters"]
        track_front = TrackConfig(
            num_iters=int(fr["num_tracking_iters"]),
            converged_th=float(fr.get("converged_th", -1)),
            rot_sched=_sched(fe, "cam_rot"),
            trans_sched=_sched(fe, "cam_trans"),
            betas=betas,
            coarse_iters=int(fr.get("coarse_iters", 0)),
            coarse_stride=int(fr.get("coarse_stride", 2)),
            # pyramid schedule, e.g. [[10, 4], [14, 2]] — supersedes
            # coarse_iters/coarse_stride (see TrackConfig.coarse_levels)
            coarse_levels=tuple(
                (int(i), int(s))
                for i, s in (fr.get("coarse_levels") or ())),
        )
        track_back = TrackConfig(
            num_iters=nb,
            converged_th=-1.0,
            rot_sched=_sched(be, "cam_rot"),
            trans_sched=_sched(be, "cam_trans"),
            betas=betas,
        )
        return cls(
            cam=cam, opts=opts, lcfg=lcfg, dcfg=dcfg, mcfg=mcfg,
            track_front=track_front, track_back=track_back,
            exp_sched_front=_sched(fe, "exposure"),
            exp_sched_back=_sched(be, "exposure"),
            adam_betas=betas,
        )
