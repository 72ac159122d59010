#!/usr/bin/env python
"""Decompose the mapping/tracking step cost at realistic SLAM sizes.

Builds a synthetic surfel map shaped like the 340x600 bench steady state
(~204k active gaussians, ~1px projected sigma) and times each stage of
the render/optimize pipeline on the attached device with host-readback
fencing (block_until_ready does not sync through the axon tunnel).

Usage: python tools/microbench.py [stage ...]
Env:   MB_H MB_W MB_N MB_CAP MB_DMAX MB_BUDGET
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

H = int(os.environ.get("MB_H", 340))
W = int(os.environ.get("MB_W", 600))
NACT = int(os.environ.get("MB_N", 204000))
CAP = int(os.environ.get("MB_CAP", 262144))
DMAX = int(os.environ.get("MB_DMAX", 9))
BUDGET = float(os.environ.get("MB_BUDGET", 4))
REPS = int(os.environ.get("MB_REPS", 5))


_probe = None


def readback(x):
    """Fence: pull ONE scalar of the first leaf through the tunnel (a
    full-leaf np.asarray would time the host transfer, not the compute)."""
    global _probe
    if _probe is None:
        _probe = jax.jit(lambda a: a.ravel()[0])
    leaves = jax.tree.leaves(x)
    return float(_probe(leaves[0]))


def bench(name, fn, *args, reps=REPS):
    fn(*args)
    readback(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn(*args)
    readback(out)
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name:34s} {dt:9.2f} ms")
    return out


def make_scene():
    from gaus_slam_tpu.models import gaussians as G
    from gaus_slam_tpu.ops.camera import Camera

    fx = fy = 300.0
    cam = Camera(H, W, fx, fy, W / 2.0, H / 2.0, jnp.eye(4, dtype=jnp.float32))
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    z = jax.random.uniform(ks[0], (CAP,), minval=1.0, maxval=4.0)
    u = jax.random.uniform(ks[1], (CAP, 2), minval=0.02, maxval=0.98)
    xyz = jnp.stack([
        (u[:, 0] * W - cam.cx) * z / fx,
        (u[:, 1] * H - cam.cy) * z / fy,
        z,
    ], -1)
    # sigma ~ z/f => ~1px projected; 10% bigger splats like grown gaussians
    base = z / fx
    big = jax.random.uniform(ks[2], (CAP,)) < 0.1
    sc = base * jnp.where(big, 4.0, 1.0) \
        * jax.random.uniform(ks[3], (CAP,), minval=0.7, maxval=1.5)
    q = jax.random.normal(ks[4], (CAP, 4)) * 0.1
    q = q.at[:, 0].add(1.0)
    params = G.Params(
        xyz=xyz,
        log_scales=jnp.log(jnp.stack([sc, sc], -1)),
        quats=q / jnp.linalg.norm(q, axis=-1, keepdims=True),
        opacity_logit=jnp.full((CAP, 1), 1.5),
        rgb=jax.random.uniform(ks[5], (CAP, 3)),
    )
    active = jnp.arange(CAP) < NACT
    gm = G.GaussianMap(
        params=params, m=G._zeros_params(CAP), v=G._zeros_params(CAP),
        step=jnp.int32(10), active=active, n_active=jnp.int32(NACT),
    )
    return cam, gm


def main():
    stages = set(sys.argv[1:])

    def on(s):
        return not stages or s in stages

    from gaus_slam_tpu.models.frame import LrSchedule, init_exposure, init_pose
    from gaus_slam_tpu.ops import binning as B
    from gaus_slam_tpu.ops.composite_ref import image_to_tiles
    from gaus_slam_tpu.ops.preprocess import pack_pair_attrs, preprocess
    from gaus_slam_tpu.render import (RenderOptions, bin_for_tracking,
                                      expand_pairs, render_view)
    from gaus_slam_tpu.slam.loss import LossConfig
    from gaus_slam_tpu.slam.steps import (MapConfig, TrackConfig,
                                          mapping_step, tracking_loop)

    backend = ("pallas" if jax.default_backend() in ("tpu", "axon")
               else "interpret")
    cam, gm = make_scene()
    grid = B.make_grid(cam, 16, 16)
    opts = RenderOptions(grid=grid, backend=backend,
                         pair_budget_factor=BUDGET,
                         max_tiles_per_gaussian=DMAX)
    print(f"scene: {H}x{W}, n={NACT}/{CAP}, d_max={DMAX}, "
          f"r_max={opts.r_max(CAP)}, device={jax.devices()[0]}")

    # --- binning diagnostics ---
    @jax.jit
    def diag(gm):
        xyz = gm.params.xyz
        scales = jnp.exp(gm.params.log_scales)
        opac = jax.nn.sigmoid(gm.params.opacity_logit[:, 0])
        pre = preprocess(xyz, scales, gm.params.quats, opac, cam,
                         active=gm.active)
        x0, y0, w, counts = B.gaussian_rects(pre, grid)
        bins = B.bin_gaussians(pre, grid, r_max=opts.r_max(CAP),
                               max_tiles_per_gaussian=DMAX)
        return (counts, pre.radius, bins.num_pairs, bins.overflow)

    counts, radius, num_pairs, ovf = jax.device_get(diag(gm))
    act = np.asarray(jax.device_get(gm.active))
    counts = counts[act]
    radius = radius[act]
    print(f"pairs={int(num_pairs)} overflow={bool(ovf)} "
          f"budget={opts.r_max(CAP)}")
    print(f"tiles/gaussian: mean={counts.mean():.2f} "
          f"p50={np.percentile(counts, 50):.0f} "
          f"p90={np.percentile(counts, 90):.0f} "
          f"p99={np.percentile(counts, 99):.0f} max={counts.max()} "
          f"frac>d_max={np.mean(counts >= DMAX):.4f}")
    print(f"radius(px): p50={np.percentile(radius, 50):.1f} "
          f"p90={np.percentile(radius, 90):.1f} "
          f"p99={np.percentile(radius, 99):.1f} max={radius.max():.0f}")

    # --- stage functions ---
    @jax.jit
    def f_pre(gm):
        return preprocess(gm.params.xyz, jnp.exp(gm.params.log_scales),
                          gm.params.quats,
                          jax.nn.sigmoid(gm.params.opacity_logit[:, 0]),
                          cam, active=gm.active)

    @jax.jit
    def f_bin(pre):
        return B.bin_gaussians(pre, grid, r_max=opts.r_max(CAP),
                               max_tiles_per_gaussian=DMAX)

    @jax.jit
    def f_pack_expand(pre, gm, bins):
        attrs_t = pack_pair_attrs(pre, gm.params.rgb).T
        return expand_pairs(attrs_t, bins, DMAX)

    from gaus_slam_tpu.ops.pallas_backward import raster_backward
    from gaus_slam_tpu.ops.pallas_forward import raster_forward

    interp = backend == "interpret"

    @jax.jit
    def f_fwd(pattrs, bins):
        return raster_forward(pattrs, bins.tile_start, bins.tile_stop,
                              grid=grid, interpret=interp)

    @jax.jit
    def f_bwd(pattrs, bins, out):
        return raster_backward(pattrs, bins.tile_start, bins.tile_stop,
                               out, out * 1e-3, grid=grid, interpret=interp)

    @jax.jit
    def f_reduce(bins, d_pairs):
        return bins.slab_scatter_grads(d_pairs.T, CAP, d_max=DMAX)

    pre = f_pre(gm)
    bins = f_bin(pre)
    pattrs = f_pack_expand(pre, gm, bins)
    out = f_fwd(pattrs, bins)

    if on("pre"):
        bench("preprocess [N]", f_pre, gm)
    if on("bin"):
        bench("bin_gaussians (slab sort)", f_bin, pre)
    if on("expand"):
        bench("pack + expand_pairs gather", f_pack_expand, pre, gm, bins)
    if on("fwd"):
        bench("forward kernel", f_fwd, pattrs, bins)
    if on("bwd"):
        bench("backward kernel", f_bwd, pattrs, bins, out)
    if on("reduce"):
        d_pairs = f_bwd(pattrs, bins, out)
        bench("slab grad reduction", f_reduce, bins, d_pairs)

    # the actual training path: stash-forward + stashed backward
    from gaus_slam_tpu.ops.pallas_backward import raster_backward_stash
    from gaus_slam_tpu.ops.pallas_forward import raster_forward_stash

    @jax.jit
    def f_fwd_stash(pattrs, bins):
        return raster_forward_stash(pattrs, bins.tile_start, bins.tile_stop,
                                    grid=grid, interpret=interp)

    @jax.jit
    def f_bwd_stash(pattrs, bins, out, stash, kexit):
        return raster_backward_stash(pattrs, bins.tile_start, bins.tile_stop,
                                     stash, kexit, out, out * 1e-3,
                                     grid=grid, interpret=interp)

    if on("fwds"):
        bench("forward kernel (stash)", f_fwd_stash, pattrs, bins)
    if on("bwds"):
        out_s, stash, kexit = f_fwd_stash(pattrs, bins)
        bench("backward kernel (stashed)", f_bwd_stash, pattrs, bins, out_s,
              stash, kexit)

    # --- full steps ---
    lcfg = LossConfig()
    mcfg = MapConfig(lrs=(("opacity_lr", 5e-2), ("rgb_lr", 2.5e-3),
                          ("rotation_lr", 1e-3), ("scaling_lr", 1e-3),
                          ("xyz_lr", 1e-4)))
    gt = jnp.concatenate([
        jax.random.uniform(jax.random.PRNGKey(2), (3, H, W)),
        jnp.full((1, H, W), 2.0),
    ])
    gt_tiled = image_to_tiles(gt, grid)
    w2c = jnp.eye(4, dtype=jnp.float32)
    exp0 = init_exposure()
    sched = LrSchedule(5e-3, 1e-4, 60)

    if on("map"):
        def f_map(gm):
            return mapping_step(gm, w2c, gt_tiled, exp0, jnp.bool_(False),
                                sched, cam, opts, mcfg, lcfg)
        bench("mapping_step (full)", f_map, gm)

    if on("mapparts"):
        from gaus_slam_tpu.render import render_full
        from gaus_slam_tpu.slam.loss import mapping_loss
        from gaus_slam_tpu.render import bin_full

        bins_pre = jax.jit(bin_full, static_argnames=("opts",))(
            gm.params, gm.active, cam, opts)

        def f_map_rebin(gm):
            return mapping_step(gm, w2c, gt_tiled, exp0, jnp.bool_(False),
                                sched, cam, opts, mcfg, lcfg, bins=bins_pre)
        bench("mapping_step (bins reused)", f_map_rebin, gm)

        @jax.jit
        def f_loss_fwd(params):
            out, _ = render_full(params, gm.active, cam, opts, bins=bins_pre,
                                 need_normal=False)
            return mapping_loss(out, gt_tiled, lcfg)[0]
        bench("mapping fwd only (bins reused)", f_loss_fwd, gm.params)

        @jax.jit
        def f_loss_grad(params):
            return jax.grad(f_loss_fwd)(params)
        bench("mapping grad (bins reused)", f_loss_grad, gm.params)

    if on("mapcoarse"):
        from gaus_slam_tpu.render import bin_full, render_full
        from gaus_slam_tpu.slam.loss import mapping_loss
        from gaus_slam_tpu.slam.steps import _coarse_map_phases

        stride = int(os.environ.get("MB_CMAP_STRIDE", 3))
        phases, pvalid = _coarse_map_phases(grid, stride)
        ids, wt = phases[0], pvalid[0]
        bins_pre = jax.jit(bin_full, static_argnames=("opts",))(
            gm.params, gm.active, cam, opts)
        bins_ph = jax.jit(
            bin_full, static_argnames=("opts", "phase_stride"))(
            gm.params, gm.active, cam, opts, phase_stride=stride)

        def f_map_c(gm):
            return mapping_step(gm, w2c, gt_tiled, exp0, jnp.bool_(False),
                                sched, cam, opts, mcfg, lcfg, bins=bins_pre,
                                tile_ids=ids, tile_valid=wt)
        bench(f"mapping_step (dense coarse s{stride})", f_map_c, gm)

        def f_map_cc(gm):
            return mapping_step(gm, w2c, gt_tiled, exp0, jnp.bool_(False),
                                sched, cam, opts, mcfg, lcfg, bins=bins_ph,
                                tile_ids=ids, tile_valid=wt,
                                phase=jnp.int32(0), coarse_stride=stride)
        bench(f"mapping_step (COMPACT coarse s{stride})", f_map_cc, gm)

        @jax.jit
        def f_loss_fwd_c(params):
            out, _ = render_full(params, gm.active, cam, opts,
                                 bins=bins_ph, need_normal=False,
                                 tile_ids=ids, tile_valid=wt,
                                 phase=jnp.int32(0), coarse_stride=stride)
            return mapping_loss(out, gt_tiled[ids], lcfg)[0]
        bench(f"mapping fwd only (compact s{stride})", f_loss_fwd_c,
              gm.params)

        @jax.jit
        def f_loss_grad_c(params):
            return jax.grad(f_loss_fwd_c)(params)
        bench(f"mapping grad (compact s{stride})", f_loss_grad_c, gm.params)

        f_bin_ph = jax.jit(
            lambda p, a: bin_full(p, a, cam, opts, phase_stride=stride))
        bench("bin_full (phase-major)", f_bin_ph, gm.params, gm.active)

    if on("track1"):
        tcfg1 = TrackConfig(num_iters=1, converged_th=-1.0,
                            rot_sched=LrSchedule(4e-4, 1e-4, 30),
                            trans_sched=LrSchedule(2e-3, 4e-4, 30))
        cache = bin_for_tracking(gm, cam, opts)
        pose = init_pose(np.eye(4, dtype=np.float32))

        def f_track1(cache, pose):
            return tracking_loop(cache, pose, gt_tiled, cam, opts, tcfg1,
                                 lcfg)
        bench("tracking_loop (1 iter)", f_track1, cache, pose)

    if on("view"):
        bench("render_view", render_view, gm, cam, opts)

    if on("trackcoarse"):
        # coarse tracking iteration: full cache vs compact phase-major
        # head slice (render/__init__.py track_coarse_budget)
        stride = int(os.environ.get("MB_TRACK_STRIDE", 2))
        tcfg_c = TrackConfig(num_iters=10, converged_th=-1.0,
                             rot_sched=LrSchedule(4e-4, 1e-4, 30),
                             trans_sched=LrSchedule(2e-3, 4e-4, 30),
                             coarse_iters=10, coarse_stride=stride)
        pose = init_pose(np.eye(4, dtype=np.float32))
        cache_f = bin_for_tracking(gm, cam, opts)
        cache_p = bin_for_tracking(gm, cam, opts, coarse_stride=stride)

        def f_track_full(cache, pose):
            return tracking_loop(cache, pose, gt_tiled, cam, opts, tcfg_c,
                                 lcfg)

        def f_track_compact(cache, pose):
            return tracking_loop(cache, pose, gt_tiled, cam, opts, tcfg_c,
                                 lcfg, compact_coarse=True)
        bench(f"track 10x coarse s{stride} (full cache)",
              f_track_full, cache_f, pose)
        bench(f"track 10x coarse s{stride} (COMPACT)",
              f_track_compact, cache_p, pose)
        bench("bin_for_tracking (tile-major)", lambda g: bin_for_tracking(
            g, cam, opts), gm)
        bench("bin_for_tracking (phase-major)", lambda g: bin_for_tracking(
            g, cam, opts, coarse_stride=stride), gm)
        p_f, a_f = f_track_full(cache_f, pose)
        p_c, a_c = f_track_compact(cache_p, pose)
        dt = float(jnp.max(jnp.abs(p_f.trans - p_c.trans)))
        dq = float(jnp.max(jnp.abs(p_f.quat - p_c.quat)))
        print(f"compact-vs-full pose drift: trans={dt:.2e} quat={dq:.2e}")

    if on("track"):
        tcfg = TrackConfig(num_iters=10, converged_th=-1.0,
                           rot_sched=LrSchedule(4e-4, 1e-4, 30),
                           trans_sched=LrSchedule(2e-3, 4e-4, 30))
        cache = bin_for_tracking(gm, cam, opts)
        pose = init_pose(np.eye(4, dtype=np.float32))
        bench("bin_for_tracking", bin_for_tracking, gm, cam, opts)

        def f_track(cache, pose):
            return tracking_loop(cache, pose, gt_tiled, cam, opts, tcfg, lcfg)
        out_t = bench("tracking_loop (10 iters)", f_track, cache, pose)

    if on("surgery"):
        # map-surgery ops: the keyframe densify/prune and merge events
        # (wide single-scatter/gather vs the old 15-16 narrow ops)
        from gaus_slam_tpu.models import gaussians as G
        from gaus_slam_tpu.slam.densify import (DensifyConfig,
                                                add_new_gaussians,
                                                prune_gaussians)

        dcfg = DensifyConfig()
        gt_c = jax.random.uniform(jax.random.PRNGKey(3), (H, W, 3))
        gt_d = jnp.full((H, W), 2.0)
        view = render_view(gm, cam, opts)

        def f_dens(gm):
            return add_new_gaussians(gm, w2c, gt_c, gt_d, view, cam, opts,
                                     dcfg, lcfg)
        bench("add_new_gaussians (densify)", f_dens, gm)

        def f_prune(gm):
            return prune_gaussians(gm, dcfg)
        bench("prune_gaussians", f_prune, gm)

        @jax.jit
        def f_addp(gm):
            return G.add_params(gm, gm.params,
                                gm.active & (jnp.arange(CAP) % 7 == 0))
        bench("add_params (merge scatter)", f_addp, gm)


if __name__ == "__main__":
    main()
