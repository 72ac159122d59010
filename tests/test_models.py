"""Model-layer tests: Adam parity vs torch, optimizer surgery, submaps,
descriptors, trajectory alignment, PLY round-trip, knn."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaus_slam_tpu.models import gaussians as G
from gaus_slam_tpu.models.frame import LrSchedule, init_pose, pose_adam_step


def _rand_map(n=32, cap=64, seed=0):
    rng = np.random.default_rng(seed)
    gm = G.empty_map(cap)
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    scale = rng.uniform(0.01, 0.1, (n,)).astype(np.float32)
    return G.add_gaussians(gm, jnp.asarray(pts), jnp.asarray(cols), None,
                           jnp.asarray(scale))


def test_adam_matches_torch():
    import torch

    gm = _rand_map()
    rng = np.random.default_rng(1)
    lrs = {"xyz_lr": 1e-2, "scaling_lr": 1e-3, "rotation_lr": 1e-3,
           "opacity_lr": 5e-2, "rgb_lr": 2.5e-3}

    torch_params = {
        f: torch.nn.Parameter(torch.tensor(np.asarray(p)))
        for f, p in zip(G.PARAM_FIELDS, gm.params)
    }
    opt = torch.optim.Adam(
        [{"params": [torch_params[f]], "lr": lrs[G.LR_KEYS[f]]}
         for f in G.PARAM_FIELDS],
        lr=0.0, eps=1e-15,
    )
    for step in range(3):
        grads = G.Params(*(jnp.asarray(
            rng.normal(size=p.shape).astype(np.float32) * gm.active[:, None])
            for p in gm.params))
        opt.zero_grad()
        for f, g in zip(G.PARAM_FIELDS, grads):
            torch_params[f].grad = torch.tensor(np.asarray(g))
        opt.step()
        gm = G.adam_step(gm, grads, lrs)
    for f, p in zip(G.PARAM_FIELDS, gm.params):
        np.testing.assert_allclose(
            np.asarray(p), torch_params[f].detach().numpy(),
            atol=1e-6, err_msg=f,
        )


def test_pose_adam_matches_torch():
    import torch

    w2c = np.eye(4, dtype=np.float32)
    w2c[:3, 3] = [0.1, -0.2, 0.3]
    ps = init_pose(w2c)
    tq = torch.nn.Parameter(torch.tensor(np.asarray(ps.quat)))
    tt = torch.nn.Parameter(torch.tensor(np.asarray(ps.trans)))
    # linear LR schedule as in scene/Frame.py
    rs = LrSchedule(4e-4, 4e-5, 10)
    ts = LrSchedule(2e-3, 2e-4, 10)
    opt = torch.optim.Adam(
        [{"params": [tq], "lr": rs.init}, {"params": [tt], "lr": ts.init}],
        lr=0.0, eps=1e-8, betas=(0.7, 0.99),
    )
    rng = np.random.default_rng(2)
    for k in range(5):
        gq = rng.normal(size=4).astype(np.float32)
        gt = rng.normal(size=3).astype(np.float32)
        opt.param_groups[0]["lr"] = float(rs.at(k))
        opt.param_groups[1]["lr"] = float(ts.at(k))
        opt.zero_grad()
        tq.grad = torch.tensor(gq)
        tt.grad = torch.tensor(gt)
        opt.step()
        ps = pose_adam_step(ps, jnp.asarray(gq), jnp.asarray(gt), rs, ts,
                            betas=(0.7, 0.99))
    np.testing.assert_allclose(np.asarray(ps.quat), tq.detach().numpy(),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(ps.trans), tt.detach().numpy(),
                               atol=1e-6)


def test_grow_prune_surgery():
    gm = _rand_map(n=20, cap=64)
    lrs = {"xyz_lr": 1e-2, "scaling_lr": 1e-3, "rotation_lr": 1e-3,
           "opacity_lr": 5e-2, "rgb_lr": 2.5e-3}
    g1 = G.Params(*(jnp.ones_like(p) * gm.active[:, None]
                    for p in gm.params))
    gm = G.adam_step(gm, g1, lrs)
    assert float(jnp.abs(gm.m.xyz[:20]).max()) > 0

    # grow: new rows get zero moments, old rows keep theirs
    rng = np.random.default_rng(3)
    gm2 = G.add_gaussians(
        gm, jnp.asarray(rng.uniform(-1, 1, (8, 3)).astype(np.float32)),
        jnp.zeros((8, 3)), None, jnp.full((8,), 0.05))
    assert int(gm2.n_active) == 28
    np.testing.assert_allclose(gm2.m.xyz[:20], gm.m.xyz[:20])
    np.testing.assert_allclose(gm2.m.xyz[20:28], 0.0)

    # prune rows 5..10: survivors compact in stable order, moments follow
    mask = jnp.zeros(64, bool).at[5:10].set(True)
    gm3 = G.prune(gm2, mask)
    assert int(gm3.n_active) == 23
    np.testing.assert_allclose(np.asarray(gm3.params.xyz[:5]),
                               np.asarray(gm2.params.xyz[:5]))
    np.testing.assert_allclose(np.asarray(gm3.params.xyz[5:15]),
                               np.asarray(gm2.params.xyz[10:20]))
    np.testing.assert_allclose(np.asarray(gm3.m.xyz[5:15]),
                               np.asarray(gm2.m.xyz[10:20]))

    # rigid transform resets xyz/quat moments but not others
    tr = jnp.eye(4).at[:3, 3].set(jnp.array([1.0, 0, 0]))
    gm4 = G.transform(gm3, tr)
    np.testing.assert_allclose(gm4.m.xyz, 0.0)
    np.testing.assert_allclose(np.asarray(gm4.m.rgb),
                               np.asarray(gm3.m.rgb))
    np.testing.assert_allclose(
        np.asarray(gm4.params.xyz[:23, 0]),
        np.asarray(gm3.params.xyz[:23, 0]) + 1.0, atol=1e-6)


def test_descriptor_covisibility():
    from gaus_slam_tpu.models.descriptor import (describe_frames,
                                                 query_covisible)

    rng = np.random.default_rng(0)
    base = rng.uniform(0, 1, (48, 64, 3)).astype(np.float32)
    views = [jnp.asarray(np.roll(base, s, axis=1)) for s in (0, 2, 30)]
    descs = jnp.stack([describe_frames([v, v]) for v in views])
    top = query_covisible(descs, descs[0], k=3)
    assert top[0] == 0 and top[1] == 1  # similar view ranks before distant


def test_ate_rmse_alignment():
    from gaus_slam_tpu.utils.trajectory import ate_rmse

    rng = np.random.default_rng(0)
    gt = []
    for i in range(30):
        m = np.eye(4)
        m[:3, 3] = [np.sin(i / 5), 0.1 * i, np.cos(i / 5)]
        gt.append(np.linalg.inv(m))
    # a rigidly transformed copy must align to ~0 error
    R = np.eye(4)
    th = 0.4
    R[:3, :3] = [[np.cos(th), -np.sin(th), 0],
                 [np.sin(th), np.cos(th), 0], [0, 0, 1]]
    R[:3, 3] = [1.0, -2.0, 0.5]
    est = [np.linalg.inv(R @ np.linalg.inv(g)) for g in gt]
    m = ate_rmse(est, gt)
    assert m["rmse"] < 1e-6
    # added noise shows up in the rmse
    est2 = [e.copy() for e in est]
    for e in est2:
        e[:3, 3] += rng.normal(0, 0.01, 3)
    m2 = ate_rmse(est2, gt)
    assert 0.003 < m2["rmse"] < 0.05


def test_ply_roundtrip(tmp_path):
    from gaus_slam_tpu.utils.ply import (read_gaussians_ply,
                                         write_gaussians_ply)

    rng = np.random.default_rng(0)
    n = 100
    data = dict(
        xyz=rng.normal(size=(n, 3)).astype(np.float32),
        log_scales=rng.normal(size=(n, 2)).astype(np.float32),
        quats=rng.normal(size=(n, 4)).astype(np.float32),
        opacity_logit=rng.normal(size=(n, 1)).astype(np.float32),
        rgb=rng.uniform(size=(n, 3)).astype(np.float32),
    )
    p = str(tmp_path / "g.ply")
    write_gaussians_ply(p, **data)
    back = read_gaussians_ply(p)
    for k in data:
        np.testing.assert_allclose(back[k], data[k], atol=1e-6, err_msg=k)


def test_knn_scale_init():
    from gaus_slam_tpu.ops.knn import mean_knn_sq_dist

    rng = np.random.default_rng(0)
    # regular grid with spacing h: 3-NN mean sq dist ~= h^2
    h = 0.1
    g = np.stack(np.meshgrid(*[np.arange(8) * h] * 3), -1).reshape(-1, 3)
    d = np.asarray(mean_knn_sq_dist(jnp.asarray(g, jnp.float32)))
    med = np.median(d)
    assert 0.5 * h**2 < med < 2.0 * h**2


def test_add_params_merge_semantics():
    """Backend merge (add_params): compacted append with zeroed moments
    (reference Gaussians.add_params via Backend.py:227), single wide
    scatter on TPU."""
    import jax.numpy as jnp

    from gaus_slam_tpu.models import gaussians as G

    gm = G.empty_map(16)
    base = G.Params(
        xyz=jnp.arange(12, dtype=jnp.float32).reshape(4, 3),
        log_scales=jnp.ones((4, 2)), quats=jnp.ones((4, 4)),
        opacity_logit=jnp.ones((4, 1)), rgb=jnp.ones((4, 3)),
    )
    gm = G.add_params(gm, base, jnp.array([True, True, True, True]))
    assert int(gm.n_active) == 4

    donor = G.Params(
        xyz=100.0 + jnp.arange(9, dtype=jnp.float32).reshape(3, 3),
        log_scales=2 * jnp.ones((3, 2)), quats=2 * jnp.ones((3, 4)),
        opacity_logit=2 * jnp.ones((3, 1)), rgb=2 * jnp.ones((3, 3)),
    )
    # middle donor row inactive -> compacted out
    gm2 = G.add_params(gm, donor, jnp.array([True, False, True]))
    assert int(gm2.n_active) == 6
    np.testing.assert_allclose(np.asarray(gm2.params.xyz[:4]),
                               np.asarray(base.xyz))
    np.testing.assert_allclose(np.asarray(gm2.params.xyz[4]),
                               np.asarray(donor.xyz[0]))
    np.testing.assert_allclose(np.asarray(gm2.params.xyz[5]),
                               np.asarray(donor.xyz[2]))
    assert bool(jnp.all(gm2.active[:6])) and not bool(jnp.any(gm2.active[6:]))
    # appended rows start with zero Adam moments
    np.testing.assert_allclose(np.asarray(gm2.m.xyz[4:6]), 0.0)
    np.testing.assert_allclose(np.asarray(gm2.v.xyz[4:6]), 0.0)
