#!/usr/bin/env python
"""Backend-task device-time decomposition at the fullres bench shape.

The fullres e2e wall is dominated by the backend merge backlog (~71
tasks per submap cycle — VERDICT r4 #2). The in-run GAUS_PROFILE marks
time host DISPATCH only (process() never fences), so this probe builds
a backend-shaped global map directly — capacity sized like the bench's
trajectory-arithmetic floor, actives from several unprojected synthetic
frames — and clocks each stage of a backend task with device fences:

  bin_full          the per-task binning (preprocess + slab sort + pack)
  mapping_step      one full mapping iteration (re-bin inside)
  mapping_loop x4   the fused 4-task batch the drain actually runs
  tracking_step     one backend tracking task (re-bins per step)

each at (a) the shipped factor-based budget r_max = 1.75 * capacity and
(b) a demand-keyed pair cap (tpu.backend_pair_cap) sized from the
measured true demand — quantifying what the cap saves per task.

Run ON THE CHIP, alone (1-core host; concurrent load pollutes timing).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

H = int(os.environ.get("PROBE_H", 680))
W = int(os.environ.get("PROBE_W", 1200))
REPS = int(os.environ.get("PROBE_REPS", 4))


def main():
    from gaus_slam_tpu.data.synthetic import SyntheticDataset
    from gaus_slam_tpu.models import gaussians as G
    from gaus_slam_tpu.models.frame import init_pose
    from gaus_slam_tpu.ops import binning as B
    from gaus_slam_tpu.ops.camera import camera_from_intrinsics
    from gaus_slam_tpu.ops.composite_ref import frame_to_tiles
    from gaus_slam_tpu.ops.geometry import (depth_scale_init,
                                            normals_from_points,
                                            points_from_depth,
                                            valid_depth_mask)
    from gaus_slam_tpu.ops.se3 import invert_se3, transform_points
    from gaus_slam_tpu.render import RenderOptions, bin_full
    from gaus_slam_tpu.slam.loss import LossConfig
    from gaus_slam_tpu.slam.steps import (MapConfig, TrackConfig,
                                          backend_tracking_step,
                                          mapping_loop, mapping_step)
    from gaus_slam_tpu.models.frame import LrSchedule, init_exposure
    from gaus_slam_tpu.utils.fence import probe_fence

    backend = ("pallas" if jax.default_backend() in ("tpu", "axon")
               else "interpret")
    ds = SyntheticDataset(height=H, width=W, num_frames=30)
    cam0 = camera_from_intrinsics(H, W, ds.intrinsics, np.eye(4))

    # Global-map stand-in: unproject three spread frames (the bench's
    # measured fullres merge peak is ~2.35M actives in a ~3.4M bucket)
    cap = G.bucket_capacity(int(2.36e6), 1 << 17, 1.2, 0)
    gm = G.empty_map(cap)
    for t in (0, 12, 24):
        color, depth, _, c2w = ds[t]
        w2c = jnp.asarray(np.linalg.inv(c2w), jnp.float32)
        cam = cam0.replace_w2c(w2c)
        pts_cam = points_from_depth(jnp.asarray(depth), cam)
        pts_w = transform_points(invert_se3(w2c),
                                 pts_cam.reshape(-1, 3))
        normals = normals_from_points(pts_w.reshape(pts_cam.shape))
        gm = G.add_gaussians(
            gm, pts_w.reshape(-1, 3),
            jnp.asarray(color / 255.0).reshape(-1, 3),
            normals.reshape(-1, 3),
            depth_scale_init(jnp.asarray(depth), cam).reshape(-1),
            valid_depth_mask(jnp.asarray(depth)).reshape(-1))
    n_act = int(gm.n_active)
    print(f"[probe] map: capacity={cap} active={n_act}", flush=True)

    color, depth, _, c2w = ds[24]
    w2c = jnp.asarray(np.linalg.inv(c2w), jnp.float32)
    grid = B.make_grid(cam0, 16, 16)
    gt = frame_to_tiles(jnp.asarray(color / 255.0), jnp.asarray(depth),
                        grid)
    lcfg = LossConfig()
    mcfg = MapConfig(lrs=(("opacity_lr", 0.05), ("rgb_lr", 0.0025),
                          ("rotation_lr", 0.001), ("scaling_lr", 0.001),
                          ("xyz_lr", 0.0001)))
    tcfg = TrackConfig(num_iters=1, converged_th=-1.0,
                       rot_sched=LrSchedule(1e-4, 0.0, 40),
                       trans_sched=LrSchedule(5e-4, 0.0, 40))
    exp = init_exposure()
    sched = LrSchedule(0.0, 0.0, 1)
    cam = cam0.replace_w2c(w2c)

    def clock(label, f, *args, reps=REPS):
        r = f(*args)
        probe_fence(jax.tree.leaves(r)[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            r = f(*args)
        probe_fence(jax.tree.leaves(r)[0])
        dt = (time.perf_counter() - t0) / reps * 1000
        print(f"[probe] {label}: {dt:.0f} ms", flush=True)
        return dt

    results = {}
    for tag, opts in (
        ("factor1.75", RenderOptions(grid=grid, backend=backend,
                                     pair_budget_factor=1.75,
                                     max_tiles_per_gaussian=4)),
        ("paircap", None),  # filled after demand is measured
    ):
        if opts is None:
            q = 1 << 17
            pc = -(-int(results["demand"] * 1.3) // q) * q
            opts = RenderOptions(grid=grid, backend=backend,
                                 pair_budget_factor=1.75, pair_cap=pc,
                                 max_tiles_per_gaussian=4)
            print(f"[probe] pair_cap={pc} (demand {results['demand']}, "
                  f"factor r_max {opts._replace(pair_cap=0).r_max(cap)})",
                  flush=True)

        bin_j = jax.jit(bin_full, static_argnames=("opts",))

        @jax.jit
        def map1(gm_):
            return mapping_step(gm_, w2c, gt, exp, jnp.bool_(False),
                                sched, cam0, opts, mcfg, lcfg)

        @jax.jit
        def map4(gm_, w2cs, gts):
            return mapping_loop(gm_, w2cs, gts, cam0, opts, mcfg, lcfg,
                                rebin_every=1)

        @jax.jit
        def track1(gm_, pose):
            return backend_tracking_step(gm_, pose, w2c, gt, cam0, opts,
                                         tcfg, lcfg)

        bins = bin_j(gm.params, gm.active, cam, opts)
        demand = int(jax.device_get(bins.demand))
        npairs = int(jax.device_get(bins.num_pairs))
        ovf = bool(jax.device_get(bins.overflow))
        print(f"[probe] {tag}: r_max={opts.r_max(cap)} demand={demand} "
              f"num_pairs={npairs} overflow={ovf}", flush=True)
        results.setdefault("demand", demand)

        t_bin = clock(f"{tag} bin_full", bin_j, gm.params, gm.active,
                      cam, opts)
        t_map = clock(f"{tag} mapping_step", map1, gm)
        w2cs4 = jnp.stack([w2c] * 4)
        gts4 = jnp.stack([gt] * 4)
        t_map4 = clock(f"{tag} mapping_loop x4", map4, gm, w2cs4, gts4,
                       reps=2)
        pose = init_pose(np.eye(4, dtype=np.float32))
        t_trk = clock(f"{tag} tracking_step", track1, gm, pose)

        # coarse post-prune mapping batch (stride 3): kernel + expansion
        # + reduction all run on the 1/9 phase block
        @jax.jit
        def map4c(gm_, w2cs, gts):
            return mapping_loop(gm_, w2cs, gts, cam0, opts, mcfg, lcfg,
                                rebin_every=1, coarse_stride=3)

        t_map4c = clock(f"{tag} mapping_loop x4 coarse3", map4c, gm,
                        w2cs4, gts4, reps=2)

        # cache-based backend tracking step: bin once at the effective
        # pose, pose gradient reduces over PAIRS (no segmented
        # pair->gaussian reduction) — algebraically the same gradient
        from gaus_slam_tpu.render import bin_for_tracking, render_tracking
        from gaus_slam_tpu.slam.loss import tracking_loss
        from gaus_slam_tpu.models.frame import pose_adam_step

        @jax.jit
        def track1_cached(gm_, pose_):
            eff0 = w2c @ pose_.w2c
            cache = bin_for_tracking(gm_, cam0.replace_w2c(eff0), opts)

            def loss_fn(quat, trans):
                out = render_tracking(cache, quat, trans, cam0, opts,
                                      pre_w2c=w2c)
                loss, aux = tracking_loss(out, gt, lcfg)
                return loss, aux

            (loss, aux), (g_q, g_t) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(pose_.quat, pose_.trans)
            return pose_adam_step(pose_, g_q, g_t, tcfg.rot_sched,
                                  tcfg.trans_sched, tcfg.betas)

        try:
            t_trkc = clock(f"{tag} tracking_step cached", track1_cached,
                           gm, pose)
        except TypeError:
            t_trkc = None  # render_tracking pre_w2c not implemented yet
            print(f"[probe] {tag} tracking_step cached: skipped "
                  f"(no pre_w2c)", flush=True)
        results[tag] = dict(bin=t_bin, map1=t_map, map4=t_map4,
                            map4c=t_map4c, trk=t_trk, trkc=t_trkc)

    import json
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
