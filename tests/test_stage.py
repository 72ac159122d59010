"""Native-dtype frame staging (utils/stage.py + Frontend dequant gate).

Drivers ship frames over the host tunnel as uint8 color / uint16 depth
(the camera's own dtypes — the reference's datasets store exactly
these, e.g. Replica's 6553.5 counts/m depth PNGs) and the frontend
dequantizes on-device. Contract: the quantized path is equivalent to
feeding the dequantized float frame directly.
"""
import os
import queue
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gaus_slam_tpu.utils.stage import DEPTH_U16_SCALE, pack_frame


def test_pack_frame_roundtrip():
    rng = np.random.default_rng(0)
    color = rng.uniform(0, 255, (24, 32, 3)).astype(np.float32)
    depth = rng.uniform(0.1, 9.5, (24, 32)).astype(np.float32)
    c8, d16 = pack_frame(color, depth)
    assert c8.dtype == np.uint8 and d16.dtype == np.uint16
    np.testing.assert_allclose(c8.astype(np.float32), color,
                               atol=0.5 + 1e-5)
    np.testing.assert_allclose(d16.astype(np.float32) / DEPTH_U16_SCALE,
                               depth, atol=0.5 / DEPTH_U16_SCALE + 1e-7)


def test_pack_frame_deep_scene_keeps_float_depth():
    # beyond the uint16 ceiling (10 m at Replica scale) depth must pass
    # through as float32 — the frontend accepts either dtype
    color = np.zeros((4, 4, 3), np.float32)
    depth = np.full((4, 4), 50.0, np.float32)
    _, d = pack_frame(color, depth)
    assert d.dtype == np.float32
    np.testing.assert_array_equal(d, depth)


def test_frontend_quantized_path_matches_float():
    """Feeding (uint8, uint16) must equal feeding the dequantized float
    frame: same keyframe decisions, same poses (identical inputs reach
    the device either way; the dequant multiply is exact f32)."""
    os.environ["SYN_H"] = "48"
    os.environ["SYN_W"] = "64"
    n_frames = 6
    os.environ["SYN_FRAMES"] = str(n_frames)
    from gaus_slam_tpu.data import get_dataset
    from gaus_slam_tpu.slam.frontend import Frontend
    from gaus_slam_tpu.utils.config import load_config, probe_cameras

    def run(quantized: bool):
        config = load_config(
            os.path.join(os.path.dirname(__file__), "..",
                         "configs", "synthetic", "config.py")
        )
        config["data"]["num_frames"] = n_frames
        dataset = get_dataset(config["data"])
        color0, _, intrinsics, _ = dataset[0]
        probe_cameras(config, color0, intrinsics)
        fe = Frontend(config, queue.Queue(), backend="interpret")
        for t in range(n_frames):
            color, depth, _, c2w = dataset[t]
            depth = np.asarray(depth, np.float32)
            c8, d16 = pack_frame(color, depth)
            if quantized:
                fe.process_frame(t, c8, d16, c2w)
            else:
                # the SAME quantized values, dequantized on the host
                fe.process_frame(
                    t, c8.astype(np.float32) * np.float32(1 / 255),
                    d16.astype(np.float32)
                    * np.float32(1 / DEPTH_U16_SCALE), c2w)
        poses = [np.asarray(f._w2c_host) for f in fe.local_frames
                 if getattr(f, "_w2c_host", None) is not None]
        types = [f.frame_type for f in fe.local_frames]
        import jax.numpy as jnp

        assert all(f.gt_color.dtype == jnp.float32
                   and f.gt_depth.dtype == jnp.float32
                   for f in fe.local_frames)
        return poses, types

    poses_q, types_q = run(True)
    poses_f, types_f = run(False)
    assert types_q == types_f
    assert len(poses_q) == len(poses_f) > 0
    for a, b in zip(poses_q, poses_f):
        np.testing.assert_allclose(a, b, atol=1e-6)
