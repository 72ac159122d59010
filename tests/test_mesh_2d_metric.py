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


def test_mesh_ply_roundtrip(tmp_path):
    from gaus_slam_tpu.utils.ply import read_mesh_ply, write_mesh_ply

    v, f = make_box_mesh()
    cols = np.linspace(0, 1, v.size).reshape(v.shape)
    p = tmp_path / "mesh" / "m.ply"
    write_mesh_ply(str(p), v, f, colors=cols)
    v2, f2 = read_mesh_ply(str(p))
    np.testing.assert_allclose(v2, v, atol=1e-6)
    np.testing.assert_array_equal(f2, f)


def test_mesh_ply_reads_ascii_and_double(tmp_path):
    # gt meshes in the wild come as ascii or double-precision binary
    v, f = make_box_mesh()
    p = tmp_path / "ascii.ply"
    with open(p, "w") as fh:
        fh.write("ply\nformat ascii 1.0\n")
        fh.write(f"element vertex {len(v)}\n")
        fh.write("property double x\nproperty double y\nproperty double z\n")
        fh.write(f"element face {len(f)}\n")
        fh.write("property list uchar int vertex_indices\nend_header\n")
        for row in v:
            fh.write(" ".join(f"{x:.9f}" for x in row) + "\n")
        for tri in f:
            fh.write("3 " + " ".join(str(i) for i in tri) + "\n")
    from gaus_slam_tpu.utils.ply import read_mesh_ply

    v2, f2 = read_mesh_ply(str(p))
    np.testing.assert_allclose(v2, v, atol=1e-6)
    np.testing.assert_array_equal(f2, f)


def test_clean_mesh_drops_small_components():
    from gaus_slam_tpu.utils.eval_mesh import clean_mesh

    # big component: a 20x20 triangulated grid plane (400 verts);
    # floater: an 8-vert box far away
    g = 20
    yy, xx = np.mgrid[:g, :g].astype(np.float64)
    plane = np.stack([xx.ravel(), yy.ravel(), np.zeros(g * g)], 1)
    quads = (yy[:-1, :-1] * g + xx[:-1, :-1]).astype(np.int64).ravel()
    tri1 = np.stack([quads, quads + 1, quads + g], 1)
    tri2 = np.stack([quads + 1, quads + g + 1, quads + g], 1)
    box_v, box_f = make_box_mesh()
    v2 = np.concatenate([plane, box_v + 100.0])
    f2 = np.concatenate([tri1, tri2, box_f + g * g])
    cv, _, ct = clean_mesh(v2, None, f2, min_len=100)
    assert (cv < 50).all()  # the floater at +100 was dropped
    assert len(cv) == g * g and len(ct) == len(tri1) + len(tri2)


def test_load_gt_mesh_assets_meshdir(tmp_path):
    from gaus_slam_tpu.utils.eval_mesh import load_gt_mesh_assets
    from gaus_slam_tpu.utils.ply import write_mesh_ply

    v, f = make_box_mesh()
    write_mesh_ply(str(tmp_path / "room0.ply"), v, f)
    np.save(tmp_path / "room0_pc_unseen.npy", np.zeros((10, 3)))
    config = {"data": {"meshdir": str(tmp_path), "sequence": "room0"}}
    gt_mesh, unseen, gt_points = load_gt_mesh_assets(config,
                                                     n_gt_points=1000)
    assert gt_mesh is not None and len(gt_mesh[0]) == len(v)
    assert unseen.shape == (10, 3)
    assert gt_points.shape == (1000, 3)
    # every sampled point lies on the box surface
    assert np.abs(gt_points).max() <= 2.0 + 1e-5
