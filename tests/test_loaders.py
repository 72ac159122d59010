"""Path-layout unit tests for the dataset loaders that need no real
data: synthetic directory trees exercising file discovery, natural
ordering, pose conventions, and the factory registry."""
import os

import numpy as np
import pytest

from gaus_slam_tpu.data import get_dataset


def _write_png(path, arr):
    import imageio.v2 as imageio

    imageio.imwrite(path, arr)


def _make_rgbd_tree(root, n, color_dir, color_ext, depth_dir, depth_fmt="png"):
    os.makedirs(os.path.join(root, color_dir), exist_ok=True)
    os.makedirs(os.path.join(root, depth_dir), exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        c = (rng.uniform(0, 255, (24, 32, 3))).astype(np.uint8)
        d = np.full((24, 32), 1000 + i, np.uint16)  # mm
        _write_png(os.path.join(root, color_dir, f"{i}.{color_ext}"), c)
        _write_png(os.path.join(root, depth_dir, f"{i}.{depth_fmt}"), d)


def _cam_yaml(path):
    with open(path, "w") as f:
        f.write(
            "dataset_name: test\ncamera_params:\n"
            "  image_height: 24\n  image_width: 32\n"
            "  fx: 30.0\n  fy: 30.0\n  cx: 16.0\n  cy: 12.0\n"
            "  png_depth_scale: 1000.0\n"
        )


@pytest.mark.parametrize("name,color_dir,color_ext", [
    ("record3d", "rgb", "png"),
    ("realsense", "rgb", "jpg"),
])
def test_record3d_realsense_layout(tmp_path, name, color_dir, color_ext):
    seq = tmp_path / "seq0"
    _make_rgbd_tree(str(seq), 12, color_dir, color_ext, "depth")
    os.makedirs(seq / "poses")
    # distinguishable c2w poses; file order 0..9,10,11 tests natsort
    for i in range(12):
        c2w = np.eye(4)
        c2w[0, 3] = float(i)
        np.save(seq / "poses" / f"{i}.npy", c2w)
    yaml = tmp_path / "cam.yaml"
    _cam_yaml(yaml)

    ds = get_dataset(dict(
        dataset_name=name, basedir=str(tmp_path), sequence="seq0",
        gradslam_data_cfg=str(yaml), desired_image_height=24,
        desired_image_width=32))
    assert len(ds) == 12
    color, depth, K, pose0 = ds[0]
    assert color.shape == (24, 32, 3) and depth.shape == (24, 32, 1)
    # poses are first-frame-relative; frame 10 natural-sorts after 9:
    # translation delta +10 in x, conjugated by diag(1,-1,-1,1) (no-op
    # on the x axis)
    _, _, _, pose10 = ds[10]
    np.testing.assert_allclose(pose10[0, 3] - pose0[0, 3], 10.0, atol=1e-6)
    if color_ext == "png":
        np.testing.assert_allclose(float(depth[0, 0, 0]), 1.0, atol=1e-3)


def test_record3d_pose_axis_flip(tmp_path):
    seq = tmp_path / "s"
    _make_rgbd_tree(str(seq), 2, "rgb", "png", "depth")
    os.makedirs(seq / "poses")
    c2w0 = np.eye(4)
    c2w1 = np.eye(4)
    c2w1[:3, 3] = [1.0, 2.0, 3.0]
    np.save(seq / "poses" / "0.npy", c2w0)
    np.save(seq / "poses" / "1.npy", c2w1)
    yaml = tmp_path / "cam.yaml"
    _cam_yaml(yaml)
    ds = get_dataset(dict(dataset_name="record3d", basedir=str(tmp_path),
                          sequence="s", gradslam_data_cfg=str(yaml),
                          desired_image_height=24, desired_image_width=32))
    _, _, _, p1 = ds[1]
    # P @ c2w @ P.T with P = diag(1,-1,-1,1): translation y/z negated
    np.testing.assert_allclose(p1[:3, 3], [1.0, -2.0, -3.0], atol=1e-6)


def test_ai2thor_layout(tmp_path):
    seq = tmp_path / "scene1"
    _make_rgbd_tree(str(seq), 11, "color", "png", "depth")
    os.makedirs(seq / "pose")
    for i in range(11):
        p = np.eye(4)
        p[1, 3] = i * 0.5
        np.savetxt(seq / "pose" / f"{i}.txt", p)
    yaml = tmp_path / "cam.yaml"
    _cam_yaml(yaml)
    ds = get_dataset(dict(dataset_name="ai2thor", basedir=str(tmp_path),
                          sequence="scene1", gradslam_data_cfg=str(yaml),
                          desired_image_height=24, desired_image_width=32))
    assert len(ds) == 11
    _, _, _, p10 = ds[10]
    np.testing.assert_allclose(p10[1, 3], 5.0, atol=1e-6)


def test_profiles_load():
    import importlib.machinery as m

    base = os.path.join(os.path.dirname(__file__), "..", "configs")
    for prof in ("custom", "rack", "replica", "tum", "scannet",
                 "scannetpp", "synthetic"):
        cfg = m.SourceFileLoader(
            f"cfg_{prof}", os.path.join(base, prof, "config.py")
        ).load_module().config
        for section in ("render", "frontend", "backend", "densify", "loss",
                        "data", "gaussians", "cameras", "tpu"):
            assert section in cfg, (prof, section)
