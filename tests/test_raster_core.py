"""Tests of preprocess / binning / reference compositor semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaus_slam_tpu.ops import binning as B
from gaus_slam_tpu.ops import composite_ref as CR
from gaus_slam_tpu.ops.camera import Camera
from gaus_slam_tpu.ops.preprocess import pack_pair_attrs, preprocess


def make_cam(h=32, w=32, fx=40.0, fy=40.0, w2c=None):
    if w2c is None:
        w2c = jnp.eye(4)
    return Camera(h, w, fx, fy, w / 2.0, h / 2.0, jnp.asarray(w2c, jnp.float32))


def face_on_gaussians(key, n, cam, zmin=1.0, zmax=3.0, scale=0.15):
    """Random gaussians facing the camera inside the frustum."""
    kz, kxy, ks, kc, ko = jax.random.split(key, 5)
    z = jax.random.uniform(kz, (n,), minval=zmin, maxval=zmax)
    # keep centers well inside the image
    u = jax.random.uniform(kxy, (n, 2), minval=0.25, maxval=0.75)
    x = (u[:, 0] * cam.width - cam.cx) * z / cam.fx
    y = (u[:, 1] * cam.height - cam.cy) * z / cam.fy
    xyz = jnp.stack([x, y, z], -1)
    scales = jax.random.uniform(ks, (n, 2), minval=0.5, maxval=1.5) * scale
    quats = jax.random.normal(jax.random.PRNGKey(7), (n, 4)) * 0.1
    quats = quats.at[:, 0].add(1.0)  # near identity -> roughly facing camera
    colors = jax.random.uniform(kc, (n, 3))
    opac = jax.random.uniform(ko, (n,), minval=0.3, maxval=0.95)
    return xyz, scales, quats, opac, colors


def render(xyz, scales, quats, opac, colors, cam, use_sa=True, chunk=64,
           block=16, r_max=512):
    pre = preprocess(xyz, scales, quats, opac, cam)
    grid = B.make_grid(cam, block, block)
    bins = B.bin_gaussians(pre, grid, r_max)
    attrs_t = pack_pair_attrs(pre, colors).T
    tiled = CR.render_tiles(attrs_t, bins, grid, use_sa=use_sa, chunk=chunk, max_pairs_per_tile=128)
    return CR.tiles_to_image(tiled, grid, cam.height, cam.width), pre, bins


def test_preprocess_center_radius():
    cam = make_cam()
    xyz = jnp.array([[0.0, 0.0, 2.0]])
    scales = jnp.array([[0.1, 0.1]])
    quats = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    pre = preprocess(xyz, scales, quats, jnp.array([0.9]), cam)
    assert bool(pre.valid[0])
    # projected center: fx*x/z + cx - 0.5
    np.testing.assert_allclose(pre.center[0, 0], cam.cx - 0.5, atol=1e-3)
    np.testing.assert_allclose(pre.center[0, 1], cam.cy - 0.5, atol=1e-3)
    # radius ~ ceil(3 * scale * fx / z) = ceil(6.0)
    assert 5.0 <= float(pre.radius[0]) <= 7.0
    np.testing.assert_allclose(pre.depth[0], 2.0, atol=1e-5)


def test_preprocess_culls():
    cam = make_cam()
    xyz = jnp.array([[0.0, 0.0, 0.1], [0.0, 0.0, -1.0], [0.0, 0.0, 2.0]])
    scales = jnp.full((3, 2), 0.1)
    quats = jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]]), (3, 1))
    pre = preprocess(xyz, scales, quats, jnp.ones(3), cam)
    assert not bool(pre.valid[0])  # z <= 0.2
    assert not bool(pre.valid[1])
    assert bool(pre.valid[2])


def test_preprocess_t_matches_oracle():
    """The lane-major production path (preprocess_t) must agree with the
    [N, C] oracle (preprocess + pack_pair_attrs) bit-closely."""
    from gaus_slam_tpu.ops.preprocess import preprocess_t

    cam = make_cam()
    xyz, scales, quats, opac, colors = face_on_gaussians(
        jax.random.PRNGKey(3), 257, cam)
    active = jnp.arange(257) < 200
    pre = preprocess(xyz, scales, quats, opac, cam, active=active)
    attrs_ref = pack_pair_attrs(pre, colors)
    attrs, summary = preprocess_t(xyz.T, scales.T, quats.T, opac, colors.T,
                                  cam, active=active)
    np.testing.assert_allclose(np.asarray(attrs), np.asarray(attrs_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(summary.valid),
                                  np.asarray(pre.valid))
    np.testing.assert_allclose(np.asarray(summary.center),
                               np.asarray(pre.center), rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(summary.radius),
                                  np.asarray(pre.radius))
    np.testing.assert_allclose(np.asarray(summary.depth),
                               np.asarray(pre.depth), rtol=1e-6, atol=1e-6)


def test_binning_groups_and_depth_order():
    cam = make_cam()
    key = jax.random.PRNGKey(3)
    xyz, scales, quats, opac, _ = face_on_gaussians(key, 40, cam)
    pre = preprocess(xyz, scales, quats, opac, cam)
    grid = B.make_grid(cam, 16, 16)
    bins = B.bin_gaussians(pre, grid, 2048)
    assert not bool(bins.overflow)
    x0, y0, w, counts = B.gaussian_rects(pre, grid)
    assert int(bins.num_pairs) == int(counts.sum())
    # within every tile range, gaussian depths must be non-decreasing
    for t in range(grid.num_tiles):
        s, e = int(bins.tile_start[t]), int(bins.tile_stop[t])
        if e - s < 2:
            continue
        d = np.asarray(pre.depth[bins.pair_gauss[s:e]])
        assert np.all(np.diff(d) >= -1e-4 * np.abs(d[:-1]))
    # every pair's gaussian rect must cover its tile
    for t in range(grid.num_tiles):
        s, e = int(bins.tile_start[t]), int(bins.tile_stop[t])
        ty, tx = divmod(t, grid.tiles_x)
        for g in np.asarray(bins.pair_gauss[s:e]):
            assert x0[g] <= tx < x0[g] + w[g]


def test_single_gaussian_render():
    cam = make_cam()
    xyz = jnp.array([[0.0, 0.0, 2.0]])
    scales = jnp.array([[0.2, 0.2]])
    quats = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    opac = jnp.array([0.8])
    colors = jnp.array([[1.0, 0.5, 0.25]])
    img, _, _ = render(xyz, scales, quats, opac, colors, cam)
    cx, cy = int(cam.cx), int(cam.cy)
    # at the center alpha ~= opacity (rho ~ 0)
    np.testing.assert_allclose(img[4, cy, cx], 0.8, atol=0.02)
    np.testing.assert_allclose(img[0, cy, cx], 0.8 * 1.0, atol=0.02)
    np.testing.assert_allclose(img[1, cy, cx], 0.8 * 0.5, atol=0.02)
    # weight-normalized depth ~= 2.0
    np.testing.assert_allclose(
        img[3, cy, cx] / img[4, cy, cx], 2.0, atol=1e-2
    )
    # far corner: nothing
    assert float(img[4, 0, 0]) < 1e-3


def test_occlusion_order():
    cam = make_cam()
    xyz = jnp.array([[0.0, 0.0, 1.5], [0.0, 0.0, 3.0]])
    scales = jnp.full((2, 2), 0.3)
    quats = jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]]), (2, 1))
    opac = jnp.array([0.999, 0.999])
    colors = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    img, _, _ = render(xyz, scales, quats, opac, colors, cam)
    cy, cx = int(cam.cy), int(cam.cx)
    # front (red, alpha clamped at .99) occludes back almost fully
    assert float(img[0, cy, cx]) > 0.95
    assert float(img[1, cy, cx]) < 0.02
    d = float(img[3, cy, cx] / img[4, cy, cx])
    assert abs(d - 1.5) < 0.05


@pytest.mark.parametrize("use_sa", [False, True])
def test_chunked_matches_sequential_oracle(use_sa):
    """The chunk-parallel compositor must match the independent sequential
    (lax.scan, direct CUDA translation) oracle. For use_sa the oracle uses
    exact running statistics while the chunked path freezes them per
    chunk: rgb must still match exactly (sa only affects depth), and the
    depth channels must be close."""
    cam = make_cam()
    key = jax.random.PRNGKey(5)
    xyz, scales, quats, opac, colors = face_on_gaussians(key, 50, cam)
    pre = preprocess(xyz, scales, quats, opac, cam)
    grid = B.make_grid(cam, 16, 16)
    bins = B.bin_gaussians(pre, grid, 512)
    attrs_t = pack_pair_attrs(pre, colors).T
    a = np.asarray(CR.render_tiles(attrs_t, bins, grid, use_sa=use_sa,
                                   chunk=64, max_pairs_per_tile=128))
    b = np.asarray(CR.render_tiles_sequential(attrs_t, bins, grid,
                                              use_sa=use_sa,
                                              max_pairs_per_tile=128))
    if use_sa:
        np.testing.assert_allclose(a[:, :3], b[:, :3], atol=1e-5)
        np.testing.assert_allclose(a[:, 3], b[:, 3], atol=0.05)
        np.testing.assert_allclose(a[:, 4:9], b[:, 4:9], atol=1e-4)
    else:
        np.testing.assert_allclose(a, b, atol=2e-5)


def test_pallas_forward_interpret_matches_reference():
    from gaus_slam_tpu.ops.pallas_forward import raster_forward

    cam = make_cam()
    key = jax.random.PRNGKey(9)
    xyz, scales, quats, opac, colors = face_on_gaussians(key, 30, cam)
    pre = preprocess(xyz, scales, quats, opac, cam)
    grid = B.make_grid(cam, 16, 16)
    bins = B.bin_gaussians(pre, grid, 512)
    attrs = pack_pair_attrs(pre, colors)
    pattrs = attrs[:, bins.pair_gauss]
    for use_sa in (False, True):
        a = np.asarray(raster_forward(
            pattrs, bins.tile_start, bins.tile_stop, grid=grid,
            use_sa=use_sa, interpret=True))
        b = np.asarray(CR.render_tiles(attrs.T, bins, grid, use_sa=use_sa,
                                       chunk=128, max_pairs_per_tile=256))
        np.testing.assert_allclose(a, b, atol=2e-5)


def test_background_color():
    cam = make_cam()
    xyz = jnp.array([[0.0, 0.0, 2.0]])
    scales = jnp.array([[0.05, 0.05]])
    quats = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    pre = preprocess(xyz, scales, quats, jnp.array([0.5]), cam)
    grid = B.make_grid(cam, 16, 16)
    bins = B.bin_gaussians(pre, grid, 512)
    attrs_t = pack_pair_attrs(pre, jnp.array([[1.0, 0.0, 0.0]])).T
    bg = jnp.array([0.2, 0.4, 0.6])
    tiled = CR.render_tiles(attrs_t, bins, grid, bg=bg)
    img = CR.tiles_to_image(tiled, grid, cam.height, cam.width)
    np.testing.assert_allclose(img[:3, 0, 0], bg, atol=1e-5)
