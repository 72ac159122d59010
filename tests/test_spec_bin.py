"""Speculative next-frame tracking binning (Frontend.speculative_bin).

The speculation contract: the pose init and binning pose produced
in-program by tracking_loop(predict=True) have the SAME VALUE as the
host velocity-model init they replace (Frontend.py pose_init path,
reference slam/Frontend.py:160-164), so a run with speculation on must
match a run with it off — same keyframe decisions, same submap cuts,
and pose trajectories equal to float rounding.
"""
import os
import queue
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _run_frontend(spec_on: bool, n_frames: int = 8):
    os.environ["SYN_H"] = "48"
    os.environ["SYN_W"] = "64"
    os.environ["SYN_FRAMES"] = str(n_frames)
    from gaus_slam_tpu.data import get_dataset
    from gaus_slam_tpu.slam.frontend import Frontend
    from gaus_slam_tpu.utils.config import load_config, probe_cameras

    config = load_config(
        os.path.join(os.path.dirname(__file__), "..",
                     "configs", "synthetic", "config.py")
    )
    config["tpu"]["speculative_bin"] = spec_on
    config["data"]["num_frames"] = n_frames
    dataset = get_dataset(config["data"])
    color0, _, intrinsics, _ = dataset[0]
    probe_cameras(config, color0, intrinsics)
    to_backend = queue.Queue()
    fe = Frontend(config, to_backend, backend="interpret")
    for t in range(n_frames):
        color, depth, _, c2w = dataset[t]
        fe.process_frame(t, np.asarray(color, np.float32) / np.float32(255),
                         np.asarray(depth), c2w)
    poses = [np.asarray(f._w2c_host) for f in fe.local_frames
             if getattr(f, "_w2c_host", None) is not None]
    types = [f.frame_type for f in fe.local_frames]
    return poses, types, fe


@pytest.mark.slow
def test_speculative_bin_matches_host_pose_init():
    poses_off, types_off, _ = _run_frontend(False)
    poses_on, types_on, fe_on = _run_frontend(True)

    # the speculative path actually ran (non-first frames consumed a
    # speculated cache at least once)
    assert fe_on.speculative_bin

    # identical keyframe/cut decisions
    assert types_on == types_off

    # pose trajectories equal to float rounding (the in-program pose
    # init computes the same vel @ w2c product the host mirror does,
    # modulo f32 summation order)
    assert len(poses_on) == len(poses_off)
    for a, b in zip(poses_on, poses_off):
        np.testing.assert_allclose(a, b, atol=5e-4)


@pytest.mark.slow
def test_tracking_loop_predict_matches_velocity_model():
    """tracking_loop(predict=True) emits exactly vel @ w2c with
    vel = w2c @ prev_w2c^-1 (quaternion round-tripped)."""
    os.environ["SYN_H"] = "48"
    os.environ["SYN_W"] = "64"
    import jax.numpy as jnp

    from gaus_slam_tpu.data.synthetic import SyntheticDataset
    from gaus_slam_tpu.models.frame import init_pose
    from gaus_slam_tpu.ops import binning as B
    from gaus_slam_tpu.ops.camera import camera_from_intrinsics
    from gaus_slam_tpu.ops.composite_ref import frame_to_tiles
    from gaus_slam_tpu.render import RenderOptions, bin_for_tracking
    from gaus_slam_tpu.slam.init_map import initialize_map
    from gaus_slam_tpu.slam.loss import LossConfig
    from gaus_slam_tpu.slam.steps import TrackConfig, tracking_loop
    from gaus_slam_tpu.models.frame import LrSchedule

    ds = SyntheticDataset(height=48, width=64, num_frames=3)
    cam = camera_from_intrinsics(48, 64, ds.intrinsics, np.eye(4))
    color, depth, _, c2w = ds[0]
    w2c0 = jnp.asarray(np.linalg.inv(c2w), jnp.float32)
    gm = initialize_map(4096, jnp.asarray(color / 255.0),
                        jnp.asarray(depth), w2c0, cam)
    grid = B.make_grid(cam)
    opts = RenderOptions(grid=grid, backend="interpret",
                         pair_budget_factor=4.0)
    tcfg = TrackConfig(num_iters=3, converged_th=-1.0,
                       rot_sched=LrSchedule(2e-3, 1e-3, 10),
                       trans_sched=LrSchedule(1e-3, 5e-4, 10))
    lcfg = LossConfig()

    color1, depth1, _, _ = ds[1]
    gt = frame_to_tiles(jnp.asarray(color1 / 255.0),
                        jnp.asarray(depth1), grid)
    pose0 = init_pose(w2c0)
    prev_pose = init_pose(np.eye(4, dtype=np.float32))
    cache = bin_for_tracking(gm, cam.replace_w2c(pose0.w2c), opts)
    pose, aux = tracking_loop(cache, pose0, gt, cam, opts, tcfg, lcfg,
                              prev_pose=prev_pose, predict=True,
                              use_vel=True)
    w2c_f = np.asarray(pose.w2c)
    prev = np.eye(4, dtype=np.float32)
    vel = w2c_f @ np.linalg.inv(prev)
    expected = vel @ w2c_f
    np.testing.assert_allclose(np.asarray(aux["pred_w2c"]), expected,
                               atol=1e-5)
    # pred_pose is a FRESH optimizer state at the predicted pose
    np.testing.assert_allclose(np.asarray(aux["pred_pose"].w2c),
                               np.asarray(aux["pred_w2c"]), atol=1e-7)
    assert int(aux["pred_pose"].step) == 0
    assert float(jnp.sum(jnp.abs(aux["pred_pose"].m_q))) == 0.0

    # use_vel=False: pred == the final pose itself
    _, aux2 = tracking_loop(cache, pose0, gt, cam, opts, tcfg, lcfg,
                            prev_pose=prev_pose, predict=True,
                            use_vel=False)
    np.testing.assert_allclose(np.asarray(aux2["pred_w2c"]),
                               np.asarray(aux2["pred_pose"].w2c), atol=1e-7)
