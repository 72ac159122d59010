"""End-to-end smoke tests of the jitted SLAM steps on a synthetic scene.

Runs on CPU with the Pallas kernels in interpret mode: init a map from
frame 0 of the procedural box scene, check that mapping optimization
reduces the loss, that densification covers holes, and that the tracking
loop pulls a perturbed pose toward the ground truth.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaus_slam_tpu.data.synthetic import SyntheticDataset
from gaus_slam_tpu.models.frame import LrSchedule, init_exposure, init_pose
from gaus_slam_tpu.ops import binning as B
from gaus_slam_tpu.ops.camera import Camera, camera_from_intrinsics
from gaus_slam_tpu.ops.composite_ref import image_to_tiles, tiles_to_image
from gaus_slam_tpu.render import RenderOptions, bin_for_tracking, render_view
from gaus_slam_tpu.slam.densify import (DensifyConfig, add_new_gaussians,
                                        prune_gaussians)
from gaus_slam_tpu.slam.init_map import initialize_map
from gaus_slam_tpu.slam.loss import LossConfig
from gaus_slam_tpu.slam.steps import (MapConfig, TrackConfig, mapping_step,
                                      tracking_loop)

H, W = 48, 64
CAP = 4096


@pytest.fixture(scope="module")
def scene():
    ds = SyntheticDataset(height=H, width=W, num_frames=80)
    cam = camera_from_intrinsics(H, W, ds.intrinsics, np.eye(4))
    grid = B.make_grid(cam, 16, 16)
    opts = RenderOptions(grid=grid, backend="interpret",
                         pair_budget_factor=6)
    lcfg = LossConfig()
    frames = []
    for i in range(6):  # small inter-frame motion (~1/80 of trajectory)
        color, depth, _, c2w = ds[i]
        w2c = np.linalg.inv(c2w)
        frames.append((jnp.asarray(color / 255.0), jnp.asarray(depth),
                       jnp.asarray(w2c, jnp.float32)))
    return ds, cam, grid, opts, lcfg, frames


def gt_tiles(color, depth, grid):
    img = jnp.concatenate([color.transpose(2, 0, 1), depth[None]], axis=0)
    return image_to_tiles(img, grid)


def build_map(scene_data, n_map_iters=40):
    ds, cam, grid, opts, lcfg, frames = scene_data
    color0, depth0, w2c0 = frames[0]
    gm = initialize_map(CAP, color0, depth0, w2c0, cam)
    gt = gt_tiles(color0, depth0, grid)
    mcfg = MapConfig(lrs=(
        ("xyz_lr", 1e-4), ("scaling_lr", 1e-3), ("rotation_lr", 1e-3),
        ("opacity_lr", 5e-2), ("rgb_lr", 2.5e-3),
    ))
    exp = init_exposure()
    sched = LrSchedule(1e-4, 1e-5, 100)
    losses = []
    for _ in range(n_map_iters):
        gm, exp, aux = mapping_step(
            gm, w2c0, gt, exp, jnp.bool_(False), sched, cam, opts, mcfg, lcfg
        )
        losses.append(float(aux["loss"]))
    return gm, losses


@pytest.fixture(scope="module")
def mapped(scene):
    return build_map(scene)


def test_map_init_and_mapping_converges(scene, mapped):
    ds, cam, grid, opts, lcfg, frames = scene
    gm, losses = mapped
    assert int(gm.n_active) > 1000
    # mapping must reduce the loss substantially
    assert losses[-1] < 0.55 * losses[0], losses
    # rendered image should resemble gt
    color0, depth0, w2c0 = frames[0]
    out = render_view(gm, cam.replace_w2c(w2c0), opts)
    img = tiles_to_image(out, grid, H, W)
    alpha = np.asarray(img[4])
    assert alpha.mean() > 0.8  # full coverage from the init unprojection
    rgb = np.clip(np.asarray(img[:3]).transpose(1, 2, 0), 0, 1)
    mse = ((rgb - np.asarray(color0)) ** 2).mean()
    psnr = -10 * np.log10(mse + 1e-12)
    assert psnr > 18.0, psnr


def test_densify_covers_new_view(scene, mapped):
    ds, cam, grid, opts, lcfg, frames = scene
    gm, _ = mapped
    color, depth, w2c = frames[5]
    out = render_view(gm, cam.replace_w2c(w2c), opts)
    n_before = int(gm.n_active)
    gm2 = add_new_gaussians(gm, w2c, color, depth, out, cam, opts,
                            DensifyConfig(), lcfg)
    assert int(gm2.n_active) > n_before  # new view reveals uncovered area
    gm3 = prune_gaussians(gm2, DensifyConfig())
    assert int(gm3.n_active) <= int(gm2.n_active)
    # prune keeps the map consistent
    assert bool(jnp.all(gm3.active[: int(gm3.n_active)]))
    assert not bool(jnp.any(gm3.active[int(gm3.n_active):]))


def test_tracking_recovers_pose(scene, mapped):
    ds, cam, grid, opts, lcfg, frames = scene
    gm, _ = mapped
    color1, depth1, w2c1 = frames[1]

    # init from the (slightly wrong) frame-0 pose = constant position model
    w2c0 = frames[0][2]
    pose0 = init_pose(w2c0)
    cache = bin_for_tracking(gm, cam.replace_w2c(w2c0), opts)
    gt = gt_tiles(color1, depth1, grid)
    tcfg = TrackConfig(
        num_iters=60, converged_th=-1.0,
        rot_sched=LrSchedule(8e-4, 8e-5, 60),
        trans_sched=LrSchedule(4e-3, 4e-4, 60),
    )
    pose, aux = tracking_loop(cache, pose0, gt, cam, opts, tcfg, lcfg)

    t_err0 = float(jnp.linalg.norm(w2c0[:3, 3] - w2c1[:3, 3]))
    t_err = float(jnp.linalg.norm(pose.w2c[:3, 3] - w2c1[:3, 3]))
    assert int(aux["iters"]) == 60
    assert t_err < 0.35 * t_err0, (t_err0, t_err)


def test_tracking_coarse_to_fine_recovers_pose(scene, mapped):
    """Coarse-to-fine: early iterations on a stride-2 tile checkerboard
    (1/4 of the kernel work) must still pull the pose toward gt at least
    as well as a shortened full-res loop would."""
    ds, cam, grid, opts, lcfg, frames = scene
    gm, _ = mapped
    color1, depth1, w2c1 = frames[1]
    w2c0 = frames[0][2]
    pose0 = init_pose(w2c0)
    cache = bin_for_tracking(gm, cam.replace_w2c(w2c0), opts)
    gt = gt_tiles(color1, depth1, grid)
    tcfg = TrackConfig(
        num_iters=60, converged_th=-1.0,
        rot_sched=LrSchedule(8e-4, 8e-5, 60),
        trans_sched=LrSchedule(4e-3, 4e-4, 60),
        coarse_iters=40, coarse_stride=2,
    )
    pose, aux = tracking_loop(cache, pose0, gt, cam, opts, tcfg, lcfg)
    t_err0 = float(jnp.linalg.norm(w2c0[:3, 3] - w2c1[:3, 3]))
    t_err = float(jnp.linalg.norm(pose.w2c[:3, 3] - w2c1[:3, 3]))
    assert int(aux["iters"]) == 60
    assert t_err < 0.4 * t_err0, (t_err0, t_err)

def test_tracking_compact_coarse_matches_full(scene, mapped):
    """Compact coarse tracking (phase-major cache + head-block slice,
    render/__init__.py track_coarse_budget): the sliced cache must hold
    exactly the coarse tiles' pairs, and the optimized pose must match
    the full-cache coarse loop up to f32 accumulation-order drift (the
    sliced-off pairs contribute exactly zero gradient)."""
    from gaus_slam_tpu.render import track_coarse_budget

    ds, cam, grid, opts, lcfg, frames = scene
    gm, _ = mapped
    color1, depth1, w2c1 = frames[1]
    w2c0 = frames[0][2]
    gt = gt_tiles(color1, depth1, grid)
    tcfg = TrackConfig(
        num_iters=30, converged_th=-1.0,
        rot_sched=LrSchedule(8e-4, 8e-5, 60),
        trans_sched=LrSchedule(4e-3, 4e-4, 60),
        coarse_iters=30, coarse_stride=2,
    )
    cam0 = cam.replace_w2c(w2c0)
    cache_p = bin_for_tracking(gm, cam0, opts, coarse_stride=2)
    # structural: every coarse tile's range fits the head budget
    from gaus_slam_tpu.slam.steps import _coarse_tile_ids

    ids = np.asarray(_coarse_tile_ids(grid, 2))
    r_p0 = track_coarse_budget(cache_p.raw_t.shape[1], 2)
    assert not bool(cache_p.overflow)
    assert int(jnp.max(cache_p.tile_stop[ids])) <= r_p0
    # non-coarse tiles live strictly ABOVE the head block
    rest = np.setdiff1d(np.arange(grid.num_tiles), ids)
    starts = np.asarray(cache_p.tile_start[rest])
    stops = np.asarray(cache_p.tile_stop[rest])
    head_max = int(jnp.max(cache_p.tile_stop[ids]))
    assert np.all(starts[stops > starts] >= head_max)

    pose_c, aux_c = tracking_loop(cache_p, init_pose(w2c0), gt, cam, opts,
                                  tcfg, lcfg, compact_coarse=True)
    cache_f = bin_for_tracking(gm, cam0, opts)
    pose_f, aux_f = tracking_loop(cache_f, init_pose(w2c0), gt, cam, opts,
                                  tcfg, lcfg)
    assert int(aux_c["iters"]) == int(aux_f["iters"]) == 30
    # identical pair sets per rendered tile; only the kernel's 128-lane
    # chunk grouping (absolute-offset keyed) differs between the two
    # cache layouts -> Adam-amplified f32 drift, small vs the pose step
    step_scale = float(jnp.linalg.norm(pose_f.trans - w2c0[:3, 3])) + 1e-6
    drift = float(jnp.linalg.norm(pose_c.trans - pose_f.trans))
    assert drift < 0.15 * step_scale + 1e-5, (drift, step_scale)


def test_tracking_mid_loop_refresh_semantics(scene, mapped):
    """tracking_refresh (frontend A/B knob): after the coarse phase the
    pair cache is re-binned at the updated pose. Asserts the semantic
    contract: iteration accounting composes, the LR schedule continues
    through the pose's persistent step counter, and the refreshed
    cache's render at its bin pose matches the full re-binned renderer
    (render_view) — i.e. the refresh really does remove cache staleness.
    Whether removing staleness helps END-TO-END quality is a full-SLAM
    question (tools/quality_ab.py): on this single-frame map even the
    exact render's pose objective is biased by uncovered regions."""
    from gaus_slam_tpu.render import render_tracking, render_view

    ds, cam, grid, opts, lcfg, frames = scene
    gm, _ = mapped
    color1, depth1, w2c1 = frames[1]
    w2c0 = frames[0][2]
    pose0 = init_pose(w2c0)
    gt = gt_tiles(color1, depth1, grid)
    sched_r = LrSchedule(8e-4, 8e-5, 60)
    sched_t = LrSchedule(4e-3, 4e-4, 60)
    cache = bin_for_tracking(gm, cam.replace_w2c(w2c0), opts)
    tc1 = TrackConfig(num_iters=40, converged_th=-1.0, rot_sched=sched_r,
                      trans_sched=sched_t, coarse_iters=40, coarse_stride=2)
    pose_mid, aux1 = tracking_loop(cache, pose0, gt, cam, opts, tc1, lcfg)
    assert int(pose_mid.step) == int(aux1["iters"])  # schedule continuity
    cache2 = bin_for_tracking(gm, cam.replace_w2c(pose_mid.w2c), opts)
    # the refreshed cache renders the map exactly (the stale one doesn't)
    out_new = render_tracking(cache2, pose_mid.quat, pose_mid.trans, cam,
                              opts)
    view = render_view(gm, cam.replace_w2c(pose_mid.w2c), opts)
    assert float(jnp.abs(view[:, :3] - out_new[:, :3]).max()) < 5e-3
    tc2 = TrackConfig(num_iters=20, converged_th=-1.0, rot_sched=sched_r,
                      trans_sched=sched_t)
    pose, aux2 = tracking_loop(cache2, pose_mid, gt, cam, opts, tc2, lcfg)
    assert int(aux1["iters"]) + int(aux2["iters"]) == 60
    assert np.isfinite(err := float(
        jnp.linalg.norm(pose.w2c[:3, 3] - w2c1[:3, 3]))), err


def test_coarse_mapping_phases_cover_grid(scene):
    """Every image tile appears in the rotating checkerboard phase table
    (padding may duplicate ids, but coverage must be complete)."""
    from gaus_slam_tpu.slam.steps import _coarse_map_phases

    _, _, grid, _, _, _ = scene
    for stride in (2, 3):
        phases, valid = _coarse_map_phases(grid, stride)
        phases, valid = np.asarray(phases), np.asarray(valid)
        assert phases.shape[0] == stride * stride
        # valid entries cover the grid exactly once
        ids = phases[valid]
        assert sorted(ids.tolist()) == list(
            range(grid.tiles_y * grid.tiles_x))


def test_coarse_mapping_step_all_tiles_exact(scene):
    """mapping_step(tile_ids=arange(T)) must be bit-identical to
    tile_ids=None — the subset path changes WHICH tiles contribute, never
    the per-tile math."""
    from gaus_slam_tpu.models.frame import init_exposure
    from gaus_slam_tpu.slam.steps import mapping_step

    ds, cam, grid, opts, lcfg, frames = scene
    color0, depth0, w2c0 = frames[0]
    gt = gt_tiles(color0, depth0, grid)
    mcfg = MapConfig(lrs=(
        ("xyz_lr", 1e-4), ("scaling_lr", 1e-3), ("rotation_lr", 1e-3),
        ("opacity_lr", 5e-2), ("rgb_lr", 2.5e-3),
    ))
    gm0 = initialize_map(CAP, color0, depth0, w2c0, cam)
    exp = init_exposure()
    sched = LrSchedule(1e-4, 1e-5, 100)
    all_ids = jnp.arange(grid.tiles_y * grid.tiles_x, dtype=jnp.int32)
    gm1, _, aux1 = mapping_step(gm0, w2c0, gt, exp, jnp.bool_(False), sched,
                                cam, opts, mcfg, lcfg)
    gm2, _, aux2 = mapping_step(gm0, w2c0, gt, exp, jnp.bool_(False), sched,
                                cam, opts, mcfg, lcfg, tile_ids=all_ids)
    assert float(aux1["loss"]) == float(aux2["loss"])
    for a, b in zip(jax.tree.leaves(gm1.params), jax.tree.leaves(gm2.params)):
        assert float(jnp.abs(a - b).max()) == 0.0


def test_coarse_mapping_loop_converges(scene):
    """mapping_loop with coarse_stride=2 (rotating 1/4-tile subsets) must
    optimize the same objective: the FULL-render loss drops and captures
    a solid fraction of the full-tile schedule's improvement at the same
    iteration count (measured ~57% on this scene; assert > 35%)."""
    from gaus_slam_tpu.slam.loss import mapping_loss
    from gaus_slam_tpu.slam.steps import mapping_loop

    ds, cam, grid, opts, lcfg, frames = scene
    color0, depth0, w2c0 = frames[0]
    gt = gt_tiles(color0, depth0, grid)
    mcfg = MapConfig(lrs=(
        ("xyz_lr", 1e-4), ("scaling_lr", 1e-3), ("rotation_lr", 1e-3),
        ("opacity_lr", 5e-2), ("rgb_lr", 2.5e-3),
    ))
    # 32 iterations: the stochastic schedule needs a few passes over the
    # phase rotation before its Adam moments match the full path's
    w2cs = jnp.tile(w2c0[None], (16, 1, 1))
    gts = jnp.tile(gt[None], (16, 1, 1, 1))

    def full_loss(gm):
        out = render_view(gm, cam.replace_w2c(w2c0), opts)
        loss, _ = mapping_loss(out, gt, lcfg)
        return float(loss)

    gm0 = initialize_map(CAP, color0, depth0, w2c0, cam)
    l0 = full_loss(gm0)
    gm_full, _ = mapping_loop(gm0, w2cs, gts, cam, opts, mcfg, lcfg,
                              rebin_every=2)
    gm_coarse, aux = mapping_loop(gm0, w2cs, gts, cam, opts, mcfg, lcfg,
                                  rebin_every=2, coarse_stride=2)
    lf, lc = full_loss(gm_full), full_loss(gm_coarse)
    assert np.isfinite(float(aux["loss"]))
    assert lc < l0, (l0, lc)
    assert (l0 - lc) > 0.35 * (l0 - lf), (l0, lf, lc)


def test_coarse_mapping_phase0_offset(scene):
    """mapping_loop(K=1, rebin=1, phase0=p) must render phase p's tile
    subset — bit-identical to a standalone compact mapping_step on the
    same phase. Callers with loops shorter than stride^2 (backend
    4-task batches) carry phase0 across dispatches; this pins the
    offset semantics."""
    from gaus_slam_tpu.render import bin_full
    from gaus_slam_tpu.slam.steps import (_coarse_map_phases, mapping_loop,
                                          mapping_step)

    ds, cam, grid, opts, lcfg, frames = scene
    color0, depth0, w2c0 = frames[0]
    gt = gt_tiles(color0, depth0, grid)
    mcfg = MapConfig(lrs=(
        ("xyz_lr", 1e-4), ("scaling_lr", 1e-3), ("rotation_lr", 1e-3),
        ("opacity_lr", 5e-2), ("rgb_lr", 2.5e-3),
    ))
    gm0 = initialize_map(CAP, color0, depth0, w2c0, cam)
    phases, pvalid = _coarse_map_phases(grid, 2)
    bins_p = bin_full(gm0.params, gm0.active, cam.replace_w2c(w2c0), opts,
                      phase_stride=2)

    def moved(gm):
        # set of gaussians the Adam step touched (zero-grad rows stay
        # exactly put) — robust across differently-fused XLA programs,
        # where ulp-level grad drift + Adam's first-step normalization
        # make per-value bit-equality unattainable
        d = jnp.abs(gm.params.xyz - gm0.params.xyz).sum(1)
        return np.flatnonzero(np.asarray(d) > 0).tolist()

    for p in (1, 3):
        gm_l, _ = mapping_loop(gm0, w2c0[None], gt[None], cam, opts,
                               mcfg, lcfg, rebin_every=1, coarse_stride=2,
                               phase0=p)
        gm_s, _, _ = mapping_step(
            gm0, w2c0, gt, init_exposure(), jnp.bool_(False),
            LrSchedule(0.0, 0.0, 1), cam, opts, mcfg, lcfg,
            bins=bins_p, tile_ids=phases[p], tile_valid=pvalid[p],
            phase=jnp.int32(p), coarse_stride=2)
        gm_o, _, _ = mapping_step(
            gm0, w2c0, gt, init_exposure(), jnp.bool_(False),
            LrSchedule(0.0, 0.0, 1), cam, opts, mcfg, lcfg,
            bins=bins_p, tile_ids=phases[p - 1], tile_valid=pvalid[p - 1],
            phase=jnp.int32(p - 1), coarse_stride=2)
        ml, ms, mo = (set(moved(g)) for g in (gm_l, gm_s, gm_o))
        # same phase: identical up to borderline threshold flips
        # (alpha/termination cutoffs are value-dependent, and ulp drift
        # between programs can flip a pair in or out)
        flips = ml ^ ms
        assert len(flips) <= max(2, len(ml | ms) // 100), (p, flips)
        # wrong phase: mostly different gaussians
        assert len(ml ^ mo) > len(ml | mo) // 2, p
        keep = np.ones(CAP, bool)
        keep[list(flips)] = False
        for a, b in zip(jax.tree.leaves(gm_l.params),
                        jax.tree.leaves(gm_s.params)):
            np.testing.assert_allclose(np.asarray(a)[keep],
                                       np.asarray(b)[keep], atol=3e-3)


def test_phase_major_binning_preserves_tile_ranges(scene):
    """Phase-major binning (pairs globally reordered by checkerboard
    phase) must keep every tile's pair list identical — same gaussians,
    same depth order — only the block's global placement moves. Also
    pins the phase boundaries: tiles of phase p occupy exactly
    [phase_start[p], phase_start[p+1])."""
    from gaus_slam_tpu.ops.preprocess import preprocess
    from gaus_slam_tpu.render import bin_full
    from gaus_slam_tpu.slam.steps import _coarse_map_phases

    ds, cam, grid, opts, lcfg, frames = scene
    color0, depth0, w2c0 = frames[0]
    gm = initialize_map(CAP, color0, depth0, w2c0, cam)
    cam_p = cam.replace_w2c(w2c0)
    b0 = bin_full(gm.params, gm.active, cam_p, opts)
    for stride in (2, 3):
        bp = bin_full(gm.params, gm.active, cam_p, opts,
                      phase_stride=stride)
        assert not bool(bp.overflow)
        s0, s1 = np.asarray(b0.tile_start), np.asarray(b0.tile_stop)
        p0, p1 = np.asarray(bp.tile_start), np.asarray(bp.tile_stop)
        g0 = np.asarray(b0.pair_gauss)
        gp = np.asarray(bp.pair_gauss)
        for t in range(grid.tiles_y * grid.tiles_x):
            np.testing.assert_array_equal(
                g0[s0[t]:s1[t]], gp[p0[t]:p1[t]], err_msg=f"tile {t}")
        ph_start = np.asarray(bp.phase_start)
        phases, _pv = _coarse_map_phases(grid, stride)
        for p in range(stride * stride):
            ids = np.unique(np.asarray(phases[p]))
            lo, hi = ph_start[p], ph_start[p + 1]
            assert sum(p1[t] - p0[t] for t in ids) == hi - lo
            for t in ids:
                assert lo <= p0[t] and p1[t] <= hi


def test_compact_phase_grads_match_subset(scene):
    """The compact phase path (phase-major bins, O(r_max/s^2)
    expansion+reduction) must compute the same loss and gradients as
    the plain tile_ids subset path on the same phase. Identical to
    ulp-accumulation order: the kernel's 128-lane DMA windows group
    chunks by ABSOLUTE pair offset and the phase-major repack moves
    every tile's offset, so exact bit-equality is impossible by
    construction (the tile-major layout was never canonical either) —
    assert tight allclose plus the exact zero structure (gaussians
    outside the phase get EXACT zeros in both paths)."""
    from gaus_slam_tpu.render import bin_full, render_full
    from gaus_slam_tpu.slam.loss import mapping_loss
    from gaus_slam_tpu.slam.steps import _coarse_map_phases

    ds, cam, grid, opts, lcfg, frames = scene
    color0, depth0, w2c0 = frames[0]
    gt = gt_tiles(color0, depth0, grid)
    gm0 = initialize_map(CAP, color0, depth0, w2c0, cam)
    cam_p = cam.replace_w2c(w2c0)
    for stride in (2, 3):
        phases, pvalid = _coarse_map_phases(grid, stride)
        bins_p = bin_full(gm0.params, gm0.active, cam_p, opts,
                          phase_stride=stride)
        bins_d = bin_full(gm0.params, gm0.active, cam_p, opts)
        for p in (0, stride * stride - 1):
            ids, wt = phases[p], pvalid[p]

            def loss_c(params):
                out, _ = render_full(params, gm0.active, cam_p, opts,
                                     bins=bins_p, tile_ids=ids,
                                     tile_valid=wt, phase=jnp.int32(p),
                                     coarse_stride=stride)
                return mapping_loss(out, gt[ids], lcfg)[0]

            def loss_d(params):
                out, _ = render_full(params, gm0.active, cam_p, opts,
                                     bins=bins_d, tile_ids=ids,
                                     tile_valid=wt)
                return mapping_loss(out, gt[ids], lcfg)[0]

            lc, gc = jax.value_and_grad(loss_c)(gm0.params)
            ld, gd = jax.value_and_grad(loss_d)(gm0.params)
            # ulp drift can flip borderline mask pixels (depth > 1e-5 /
            # alpha cutoffs), nudging the masked-mean normalizers
            np.testing.assert_allclose(float(lc), float(ld), rtol=1e-3)
            # gaussians with no pairs in this phase must get EXACT
            # zeros from the compact reduce
            out_of_phase = np.asarray(
                jnp.sum(bins_p.slab_phase == p, axis=0) == 0)
            for a, b in zip(jax.tree.leaves(gc), jax.tree.leaves(gd)):
                a, b = np.asarray(a), np.asarray(b)
                assert np.all(a[out_of_phase] == 0.0), (stride, p)
                # per-element max is brittle here: ulp drift flips
                # borderline alpha/termination cutoffs, and one flipped
                # pair moves its gaussian's grad by that pair's whole
                # contribution. The aggregate relative error is the
                # robust equivalence metric.
                # bound calibrated on this scene: measured <= 3e-3 at
                # stride 3 (small phases amplify single-pair flips);
                # the reduction itself is oracle-exact — see
                # test_phase_reduce_matches_numpy_oracle
                rel = (np.linalg.norm(a - b)
                       / (np.linalg.norm(b) + 1e-12))
                assert rel < 1e-2, (stride, p, rel)


def test_phase_reduce_matches_numpy_oracle(scene):
    """Binning.phase_reduce (compact per-phase segment reduction) vs a
    float64 numpy oracle summing each gaussian's phase pairs — isolates
    the new reduction from kernel chunk-order noise."""
    from gaus_slam_tpu.render import bin_full

    ds, cam, grid, opts, lcfg, frames = scene
    color0, depth0, w2c0 = frames[0]
    gm = initialize_map(CAP, color0, depth0, w2c0, cam)
    cam_p = cam.replace_w2c(w2c0)
    rng = np.random.default_rng(7)
    for stride in (2, 3):
        bins = bin_full(gm.params, gm.active, cam_p, opts,
                        phase_stride=stride)
        assert not bool(bins.overflow)
        r_max = int(bins.pair_gauss.shape[0])
        ph_start = np.asarray(bins.phase_start)
        pair_gauss = np.asarray(bins.pair_gauss)
        pair_ok = np.asarray(bins.pair_ok)
        for p in (0, stride * stride - 1):
            p0, p1 = int(ph_start[p]), int(ph_start[p + 1])
            p0_al = (p0 // 128) * 128
            r_phase = -(-(p1 - p0_al) // 128) * 128 + 128
            d_pairs = rng.standard_normal((r_phase, 8)).astype(np.float32)
            got = np.asarray(bins.phase_reduce(
                jnp.asarray(d_pairs), jnp.int32(p), CAP,
                opts.max_tiles_per_gaussian))
            want = np.zeros((CAP, 8), np.float64)
            for i in range(p0, p1):
                assert pair_ok[i]
                want[pair_gauss[i]] += d_pairs[i - p0_al]
            np.testing.assert_allclose(got, want, atol=1e-4,
                                       err_msg=f"s{stride} p{p}")


def test_nested_phase_binning_prefix_property(scene):
    """Nested phase-major binning (pyramid tracking, stride 4): every
    tile's pair list is unchanged, the stride-4 checkerboard occupies
    phase block 0, and the stride-2 checkerboard occupies exactly the
    first FOUR phase blocks (binning.phase_positions prefix property)."""
    from gaus_slam_tpu.ops.binning import bin_gaussians, phase_positions
    from gaus_slam_tpu.render import bin_full
    from gaus_slam_tpu.slam.steps import _coarse_tile_ids

    ds, cam, grid, opts, lcfg, frames = scene
    color0, depth0, w2c0 = frames[0]
    gm = initialize_map(CAP, color0, depth0, w2c0, cam)
    cam_p = cam.replace_w2c(w2c0)
    b0 = bin_full(gm.params, gm.active, cam_p, opts)

    from gaus_slam_tpu.ops.preprocess import preprocess_t

    _, summary = preprocess_t(
        gm.params.xyz.T, jnp.exp(gm.params.log_scales.T),
        gm.params.quats.T, jax.nn.sigmoid(gm.params.opacity_logit[:, 0]),
        gm.params.rgb.T, cam_p, active=gm.active)
    bp = bin_gaussians(summary, grid,
                       r_max=opts.r_max(gm.params.xyz.shape[0]),
                       max_tiles_per_gaussian=opts.max_tiles_per_gaussian,
                       phase_stride=4, phase_nested=True)
    assert not bool(bp.overflow)

    # per-tile pair lists identical to the tile-major binning
    s0, s1 = np.asarray(b0.tile_start), np.asarray(b0.tile_stop)
    p0, p1 = np.asarray(bp.tile_start), np.asarray(bp.tile_stop)
    g0, gp = np.asarray(b0.pair_gauss), np.asarray(bp.pair_gauss)
    for t in range(grid.num_tiles):
        np.testing.assert_array_equal(
            g0[s0[t]:s1[t]], gp[p0[t]:p1[t]], err_msg=f"tile {t}")

    ph = np.asarray(bp.phase_start)
    # prefix property: stride-4 tiles inside block 0, stride-2 tiles
    # inside blocks 0..3
    for s_l, n_pfx in ((4, 1), (2, 4)):
        ids = np.asarray(_coarse_tile_ids(grid, s_l))
        hi = ph[n_pfx]
        live = [t for t in ids if p1[t] > p0[t]]
        assert all(p1[t] <= hi for t in live), (s_l, hi)
        # and the prefix contains ONLY those tiles' pairs
        others = np.setdiff1d(np.arange(grid.num_tiles), ids)
        assert all(p0[t] >= hi for t in others
                   if p1[t] > p0[t]), (s_l, hi)

    # nested positions: a permutation with the documented prefix heads
    pos = phase_positions(4, True)
    assert sorted(pos.tolist()) == list(range(16))
    assert pos[0] == 0                      # phase (0,0) leads
    assert sorted(pos[[0, 2, 8, 10]].tolist()) == [0, 1, 2, 3]


def test_tracking_pyramid_compact_matches_full(scene, mapped):
    """Pyramid coarse tracking ((k1, 4), (k2, 2)) from one nested
    phase-major cache must match the same schedule run uncompacted from
    a tile-major cache up to f32 accumulation-order drift (each level's
    sliced-off pairs contribute exactly zero gradient)."""
    from gaus_slam_tpu.render import track_coarse_budget

    ds, cam, grid, opts, lcfg, frames = scene
    gm, _ = mapped
    color1, depth1, w2c1 = frames[1]
    w2c0 = frames[0][2]
    gt = gt_tiles(color1, depth1, grid)
    tcfg = TrackConfig(
        num_iters=30, converged_th=-1.0,
        rot_sched=LrSchedule(8e-4, 8e-5, 60),
        trans_sched=LrSchedule(4e-3, 4e-4, 60),
        coarse_levels=((8, 4), (12, 2)),
    )
    cam0 = cam.replace_w2c(w2c0)
    cache_p = bin_for_tracking(gm, cam0, opts, coarse_strides=(4, 2))
    assert not bool(cache_p.overflow)
    from gaus_slam_tpu.slam.steps import _coarse_tile_ids

    r = cache_p.raw_t.shape[1]
    for s_l in (4, 2):
        ids = np.asarray(_coarse_tile_ids(grid, s_l))
        stops = np.asarray(cache_p.tile_stop[ids])
        assert stops.max() <= track_coarse_budget(r, s_l), s_l

    pose_c, aux_c = tracking_loop(cache_p, init_pose(w2c0), gt, cam, opts,
                                  tcfg, lcfg, compact_coarse=True)
    cache_f = bin_for_tracking(gm, cam0, opts)
    pose_f, aux_f = tracking_loop(cache_f, init_pose(w2c0), gt, cam, opts,
                                  tcfg, lcfg, compact_coarse=False)
    assert int(aux_c["iters"]) == int(aux_f["iters"]) == 30
    step_scale = float(jnp.linalg.norm(pose_f.trans - w2c0[:3, 3])) + 1e-6
    drift = float(jnp.linalg.norm(pose_c.trans - pose_f.trans))
    assert drift < 0.15 * step_scale + 1e-5, (drift, step_scale)
    # and the pyramid still tracks: closer to gt than the init pose
    t_err0 = float(jnp.linalg.norm(w2c0[:3, 3] - w2c1[:3, 3]))
    t_err = float(jnp.linalg.norm(pose_c.w2c[:3, 3] - w2c1[:3, 3]))
    assert t_err < 0.6 * t_err0, (t_err0, t_err)


def test_backend_tracking_cached_matches_dense_oracle(scene, mapped):
    """backend_tracking_step now computes through the pair-cache path
    (pose gradient reduced over pairs via the pose-move matmul vjp)
    instead of rendering moved params through render_full (pose gradient
    through the segmented pair->gaussian reduction). The two are the
    same math in a different summation order; this oracle recomputes
    the old dense path inline and pins the stepped pose to it."""
    import jax

    from gaus_slam_tpu.models.frame import pose_adam_step
    from gaus_slam_tpu.ops.se3 import quat_multiply, rotmat_to_quat
    from gaus_slam_tpu.render import render_full
    from gaus_slam_tpu.slam.loss import tracking_loss
    from gaus_slam_tpu.slam.steps import backend_tracking_step

    ds, cam, grid, opts, lcfg, frames = scene
    gm, _ = mapped
    color1, depth1, w2c1 = frames[1]
    gt = gt_tiles(color1, depth1, grid)
    # submap transform starts slightly off identity; the frame pose is
    # fixed (frame-in-submap)
    frame_w2c = frames[0][2]
    t0 = np.eye(4, dtype=np.float32)
    t0[:3, 3] = (0.02, -0.01, 0.015)
    pose0 = init_pose(t0)
    tcfg = TrackConfig(
        num_iters=1, converged_th=-1.0,
        rot_sched=LrSchedule(8e-4, 8e-5, 60),
        trans_sched=LrSchedule(4e-3, 4e-4, 60),
    )

    pose_new, diag = backend_tracking_step(
        gm, pose0, frame_w2c, gt, cam, opts, tcfg, lcfg)

    # dense oracle: the pre-round-5 computation
    params = jax.tree.map(jax.lax.stop_gradient, gm.params)
    cam_eye = cam.replace_w2c(jnp.eye(4, dtype=jnp.float32))

    def loss_fn(quat, trans):
        from gaus_slam_tpu.ops.se3 import pose_matrix

        w2c = frame_w2c @ pose_matrix(quat, trans)
        q_full = rotmat_to_quat(w2c[:3, :3])
        moved = params._replace(
            xyz=params.xyz @ w2c[:3, :3].T + w2c[:3, 3],
            quats=jax.lax.stop_gradient(
                quat_multiply(q_full[None, :], params.quats)),
        )
        out, _ = render_full(moved, gm.active, cam_eye, opts,
                             need_normal=opts.normals_in_tracking)
        loss, aux = tracking_loss(out, gt, lcfg)
        return loss, aux

    (loss_o, aux_o), (g_q, g_t) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True)(pose0.quat, pose0.trans)
    pose_o = pose_adam_step(pose0, g_q, g_t, tcfg.rot_sched,
                            tcfg.trans_sched, tcfg.betas)

    np.testing.assert_allclose(np.asarray(pose_new.trans),
                               np.asarray(pose_o.trans),
                               rtol=2e-3, atol=2e-6)
    np.testing.assert_allclose(np.asarray(pose_new.quat),
                               np.asarray(pose_o.quat),
                               rtol=2e-3, atol=2e-6)
    np.testing.assert_allclose(float(diag["loss"]), float(loss_o),
                               rtol=1e-4)
