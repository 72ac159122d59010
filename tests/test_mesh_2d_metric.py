"""Unseen-excluded depth-L1 mesh metric (native calc_2d_metric;
reference utils/eval_mesh.py:97-199,259-291)."""
import numpy as np

from gaus_slam_tpu.utils.eval_mesh import (calc_2d_metric, check_proj,
                                           sample_mesh_points, splat_depth)


def make_box_mesh(half=(2.0, 1.5, 2.0), center=(0.0, 0.0, 0.0)):
    hx, hy, hz = half
    cx, cy, cz = center
    v = np.array([
        [x, y, z] for x in (-hx, hx) for y in (-hy, hy) for z in (-hz, hz)
    ], np.float64) + np.array(center)
    # 6 faces x 2 triangles over the 8 corners (x-major, then y, then z)
    f = np.array([
        [0, 1, 3], [0, 3, 2],  # -x
        [4, 7, 5], [4, 6, 7],  # +x
        [0, 5, 1], [0, 4, 5],  # -y
        [2, 3, 7], [2, 7, 6],  # +y
        [0, 2, 6], [0, 6, 4],  # -z
        [1, 5, 7], [1, 7, 3],  # +z
    ], np.int64)
    return v, f


def test_splat_depth_plane():
    # a wall at z=2 seen from the origin
    v, f = make_box_mesh()
    pts = sample_mesh_points(v, f, 500_000, seed=0)
    w2c = np.eye(4)
    d = splat_depth(pts, w2c, 100, 100, 60.0, 60.0, 49.5, 49.5)
    center_patch = d[45:55, 45:55]
    assert (center_patch > 0).all()
    np.testing.assert_allclose(center_patch, 2.0, atol=0.02)


def test_check_proj():
    pts = np.array([[0.0, 0.0, 1.0]])
    c2w = np.eye(4)
    assert check_proj(pts, 100, 100, 60, 60, 50, 50, c2w)
    behind = np.array([[0.0, 0.0, -1.0]])
    assert not check_proj(behind, 100, 100, 60, 60, 50, 50, c2w)


def test_calc_2d_metric_identical_meshes_near_zero():
    gt = make_box_mesh()
    got = calc_2d_metric(gt, gt, unseen_pc=np.array([[100.0, 100.0, 100.0]]),
                         align=False, n_imgs=12, samples_per_mesh=400_000,
                         seed=1)
    assert got["depth l1"] is not None
    assert got["depth l1"] < 1.5  # cm; splat-sampling noise floor


def test_calc_2d_metric_detects_offset():
    gt = make_box_mesh(half=(2.0, 1.5, 2.0))
    rec = make_box_mesh(half=(1.7, 1.2, 1.7))  # walls 30cm closer
    got = calc_2d_metric(rec, gt, unseen_pc=np.array([[100.0, 100.0, 100.0]]),
                         align=False, n_imgs=12, samples_per_mesh=400_000,
                         seed=1)
    assert got["depth l1"] is not None
    assert got["depth l1"] > 10.0  # >> the identical-mesh noise floor


def test_calc_2d_metric_rejects_unseen_views():
    gt = make_box_mesh()
    # unseen region surrounds the room as a dense shell: every view
    # direction projects some of it (projection test has no occlusion)
    rng = np.random.default_rng(0)
    d = rng.normal(size=(5000, 3))
    unseen = d / np.linalg.norm(d, axis=1, keepdims=True) * 10.0
    got = calc_2d_metric(gt, gt, unseen_pc=unseen, align=False, n_imgs=5,
                         samples_per_mesh=100_000)
    assert got["depth l1"] is None
