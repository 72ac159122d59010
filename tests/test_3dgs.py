"""3DGS (volumetric / splatam-ablation) rendering path.

The 3dgs mode reuses the 2dgs compositor with an EWA-conic preprocess
(ops/preprocess_3dgs.py); reference: render/render_3dgs.py:19-107 +
the vendored diff-gaussian-rasterization math.
"""
import jax
import jax.numpy as jnp
import numpy as np

from gaus_slam_tpu.models import gaussians as G
from gaus_slam_tpu.ops.binning import make_grid
from gaus_slam_tpu.ops.camera import Camera
from gaus_slam_tpu.ops.preprocess_3dgs import preprocess_3dgs, scales_to_3d
from gaus_slam_tpu.ops.se3 import quat_to_rotmat
from gaus_slam_tpu.render import RenderOptions, render_full


def _numpy_ewa(xyz, scales3, quat, w2c, fx, fy, w, h):
    """Independent EWA cov2d + conic reference (plain numpy)."""
    R = np.asarray(quat_to_rotmat(jnp.asarray(quat)[None]))[0]
    S = np.diag(scales3)
    sigma = (R @ S) @ (R @ S).T
    Rw, t = w2c[:3, :3], w2c[:3, 3]
    pv = Rw @ xyz + t
    limx, limy = 1.3 * w / (2 * fx), 1.3 * h / (2 * fy)
    txz = np.clip(pv[0] / pv[2], -limx, limx)
    tyz = np.clip(pv[1] / pv[2], -limy, limy)
    J = np.array([
        [fx / pv[2], 0, -fx * txz / pv[2]],
        [0, fy / pv[2], -fy * tyz / pv[2]],
    ])
    T = J @ Rw
    cov = T @ sigma @ T.T + 0.3 * np.eye(2)
    conic = np.linalg.inv(cov)
    return cov, conic, pv[2]


def test_ewa_conic_matches_numpy():
    rng = np.random.default_rng(0)
    n = 32
    cam = Camera(64, 64, 80.0, 70.0, 32.0, 30.0, jnp.eye(4))
    xyz = np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                    rng.uniform(1.5, 4.0, n)], -1)
    scales = rng.uniform(0.01, 0.08, (n, 3))
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    op = rng.uniform(0.3, 0.9, n)

    pre = preprocess_3dgs(jnp.asarray(xyz, jnp.float32),
                          jnp.asarray(scales, jnp.float32),
                          jnp.asarray(q, jnp.float32),
                          jnp.asarray(op, jnp.float32), cam)
    a0 = np.asarray(pre.a0)
    a1 = np.asarray(pre.a1)
    a2 = np.asarray(pre.a2)
    ctr = np.asarray(pre.center)
    depth = np.asarray(pre.depth)

    for i in range(n):
        cov, conic, z = _numpy_ewa(xyz[i], scales[i], q[i],
                                   np.eye(4), 80.0, 70.0, 64, 64)
        # rho3d at a probe pixel equals the conic quadratic form
        for dx, dy in [(0.5, -1.0), (2.0, 1.5), (-1.0, 0.0)]:
            px, py = ctr[i, 0] + dx, ctr[i, 1] + dy
            sx = px * a0[i, 0] + py * a1[i, 0] + a2[i, 0]
            sy = px * a0[i, 1] + py * a1[i, 1] + a2[i, 1]
            sz = px * a0[i, 2] + py * a1[i, 2] + a2[i, 2]
            rho = (sx * sx + sy * sy) / sz**2
            d = np.array([dx, dy])
            expect = d @ conic @ d
            np.testing.assert_allclose(rho, expect, rtol=2e-3, atol=1e-4)
        np.testing.assert_allclose(depth[i], z, rtol=1e-5)
        # dilation bounds the conic: low-pass branch never selected
        assert np.linalg.eigvalsh(conic).max() < 100.0


def _scene(method, iso=False, h=32, w=32):
    cam = Camera(h, w, 40.0, 40.0, w / 2.0, h / 2.0, jnp.eye(4))
    grid = make_grid(cam, 16, 16)
    # use_sa=False on the 2dgs side: the 3dgs path blends raw depth, so
    # the comparison must not use the surface-aware fusion
    opts = RenderOptions(grid=grid, backend="interpret", use_sa=False,
                         pair_budget_factor=8, method=method, iso3d=iso)
    return cam, grid, opts


def test_3dgs_matches_2dgs_faceon():
    """Face-on thin surfels: the volumetric EWA splat and the surfel
    homography produce (nearly) the same 2D gaussian; depth exactly the
    plane depth. Compensates the +0.3px EWA dilation in the 3dgs scales.
    """
    rng = np.random.default_rng(1)
    n = 24
    f = 40.0
    z = rng.uniform(1.5, 3.0, n)
    xyz = np.stack([
        (rng.uniform(6, 26, n) - 16) * z / f,
        (rng.uniform(6, 26, n) - 16) * z / f, z], -1).astype(np.float32)
    sig_pix = rng.uniform(2.0, 4.0, n)          # projected sigma in px
    s2d = sig_pix * z / f
    # remove the EWA dilation so cov2d matches the 2dgs projection
    s3d = np.sqrt(np.maximum(sig_pix**2 - 0.3, 1e-3)) * z / f
    rgb = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    op_logit = np.full((n, 1), 1.2, np.float32)

    outs = {}
    for method, s in (("2dgs", s2d), ("3dgs", s3d)):
        cam, grid, opts = _scene(method)
        params = G.Params(
            xyz=jnp.asarray(xyz),
            log_scales=jnp.log(jnp.asarray(np.stack([s, s], -1),
                                           jnp.float32)),
            quats=jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32),
                           (n, 1)),
            opacity_logit=jnp.asarray(op_logit),
            rgb=jnp.asarray(rgb),
        )
        active = jnp.ones((n,), bool)
        # 3dgs with face-on quats: third axis = geometric mean of the two
        # tangent scales (thin not needed; face-on the z column of sigma
        # only feeds J's third column which is ~0 at the center)
        out, _ = render_full(params, active, cam, opts)
        outs[method] = np.asarray(out)

    a, b = outs["2dgs"], outs["3dgs"]
    # color and alpha nearly identical
    np.testing.assert_allclose(a[:, 4], b[:, 4], atol=0.035)  # alpha
    np.testing.assert_allclose(a[:, 0:3], b[:, 0:3], atol=0.035)
    # depth: compare where both have solid coverage
    m = (a[:, 4] > 0.5) & (b[:, 4] > 0.5)
    da = a[:, 3] / np.maximum(a[:, 4], 1e-6)
    db = b[:, 3] / np.maximum(b[:, 4], 1e-6)
    assert m.sum() > 50
    np.testing.assert_allclose(da[m], db[m], rtol=0.02)
    # 3dgs contract: normal / middepth / dist channels are zero
    assert np.abs(b[:, 5:10][:, 3:]).max() == 0.0  # middepth, dist
    assert np.abs(b[:, 5:8]).max() == 0.0          # normals


def test_3dgs_gradients_flow():
    rng = np.random.default_rng(2)
    n = 16
    cam, grid, opts = _scene("3dgs")
    z = rng.uniform(1.5, 3.0, n)
    xyz = np.stack([
        (rng.uniform(8, 24, n) - 16) * z / 40.0,
        (rng.uniform(8, 24, n) - 16) * z / 40.0, z], -1).astype(np.float32)
    params = G.Params(
        xyz=jnp.asarray(xyz),
        log_scales=jnp.log(jnp.full((n, 2), 0.08, jnp.float32)),
        quats=jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (n, 1)),
        opacity_logit=jnp.full((n, 1), 0.5, jnp.float32),
        rgb=jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32),
    )
    active = jnp.ones((n,), bool)
    tgt = jnp.asarray(rng.uniform(0, 1, (4, 16, 16)), jnp.float32)

    def loss(p):
        out, _ = render_full(p, active, cam, opts)
        return jnp.sum((out[:, 0:3] - tgt[None, 0:3].reshape(1, 3, -1)) ** 2) \
            + jnp.sum(out[:, 3])

    g = jax.grad(loss)(params)
    for name, gv in zip(G.PARAM_FIELDS, g):
        arr = np.asarray(gv)
        assert np.isfinite(arr).all(), name
        if name != "quats":  # face-on identity quats can have tiny grads
            assert np.abs(arr).sum() > 0, name


def test_exp1_ablation_config_loads():
    import os

    os.environ["EXP"] = "1"
    try:
        import importlib

        from gaus_slam_tpu.utils.config import SystemConfig, load_config
        config = load_config(os.path.join(
            os.path.dirname(__file__), "..", "configs", "replica",
            "config.py"))
        assert config["render"]["method"] == "3dgs"
        config["cameras"]["height"] = 32
        config["cameras"]["width"] = 32
        config["cameras"]["intrinsics"] = [[40.0, 0, 16], [0, 40.0, 16],
                                           [0, 0, 1]]
        sys_cfg = SystemConfig.from_config(config, backend="interpret")
        assert sys_cfg.opts.method == "3dgs"
        assert not sys_cfg.opts.settings().use_sa
    finally:
        os.environ.pop("EXP", None)
