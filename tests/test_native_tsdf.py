"""Native TSDF fusion + mesh extraction tests (no jax needed)."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def lib():
    from gaus_slam_tpu.utils.tsdf import TSDFVolume

    return TSDFVolume


def _plane_frame(h=60, w=80, z=2.0, fx=60.0):
    depth = np.full((h, w), z, np.float32)
    color = np.full((h, w, 3), 0.5, np.float32)
    k = np.eye(3, dtype=np.float32)
    k[0, 0] = k[1, 1] = fx
    k[0, 2], k[1, 2] = w / 2, h / 2
    return color, depth, k


def test_tsdf_plane_mesh(lib):
    vol = lib(voxel_size=0.05)
    color, depth, k = _plane_frame()
    for _ in range(3):
        vol.integrate(color, depth, k, np.eye(4))
    assert vol.num_blocks > 0
    verts, cols, tris = vol.extract_mesh(min_weight=1.0)
    assert len(verts) > 100 and len(tris) > 100
    # the mesh should lie near the z=2 plane
    assert abs(np.median(verts[:, 2]) - 2.0) < 0.08
    np.testing.assert_allclose(np.median(cols), 0.5, atol=0.05)
    # triangles index valid vertices
    assert tris.min() >= 0 and tris.max() < len(verts)


def test_fscore_identical_cloud():
    from gaus_slam_tpu.utils.eval_mesh import fscore

    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (5000, 3))
    m = fscore(pts, pts.copy(), threshold=0.01, align=False)
    assert m["fscore"] > 0.999


def test_fscore_offset_cloud():
    from gaus_slam_tpu.utils.eval_mesh import fscore

    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (5000, 3))
    shifted = pts + np.array([0.05, 0.0, 0.0])
    # without alignment: f-score collapses; with ICP it recovers
    m0 = fscore(shifted, pts, threshold=0.01, align=False)
    m1 = fscore(shifted, pts, threshold=0.01, align=True)
    assert m0["fscore"] < 0.2
    assert m1["fscore"] > 0.9
