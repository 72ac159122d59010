"""3DGS-style clone/split/prune on the static-capacity map
(reference scene/Gaussians.py:532-593, backend gs_densify path)."""
import jax
import jax.numpy as jnp
import numpy as np

from gaus_slam_tpu.models import gaussians as G


def _mk_map(scales, opacs, n_extra_cap=16):
    n = len(scales)
    gm = G.empty_map(n + n_extra_cap)
    gm = G.add_gaussians(
        gm,
        jnp.asarray(np.arange(n * 3).reshape(n, 3), jnp.float32),
        jnp.full((n, 3), 0.5),
        None,
        jnp.asarray(scales, jnp.float32),
    )
    logits = np.log(np.asarray(opacs) / (1 - np.asarray(opacs)))
    gm = gm._replace(params=gm.params._replace(
        opacity_logit=gm.params.opacity_logit.at[:n, 0].set(
            jnp.asarray(logits, jnp.float32))))
    return gm


def test_clone_split_prune_selection():
    # gaussian 0: small + hot grad -> cloned
    # gaussian 1: big + hot grad   -> split into 2, parent pruned
    # gaussian 2: cold             -> untouched
    # gaussian 3: low opacity      -> pruned
    gm = _mk_map(scales=[0.01, 0.05, 0.01, 0.01],
                 opacs=[0.5, 0.5, 0.5, 0.01])
    grads = jnp.asarray([1.0, 1.0, 0.0, 0.0]
                        + [0.0] * (gm.capacity - 4), jnp.float32)
    gm2 = G.densify_and_prune(
        gm, grads, jax.random.PRNGKey(0),
        grad_threshold=0.5, percent_dense=0.01, extent=2.0,
        min_opacity=0.05, min_scale=5e-4,
    )
    # survivors: g0, g0-clone, g2, 2x g1-children = 5
    assert int(gm2.n_active) == 5, int(gm2.n_active)
    xyz = np.asarray(gm2.params.xyz[: int(gm2.n_active)])
    sc = np.exp(np.asarray(gm2.params.log_scales[: int(gm2.n_active)]))
    # the clone is an exact copy of g0
    assert (np.isclose(xyz, xyz[0]).all(axis=1)).sum() == 2
    # children carry the shrunk scale 0.05 / 1.6
    n_children = np.isclose(sc[:, 0], 0.05 / 1.6, rtol=1e-4).sum()
    assert n_children == 2, sc[:, 0]
    # children scattered near the split parent (xyz ~ [3,4,5] +- ~3 sigma)
    child_rows = np.isclose(sc[:, 0], 0.05 / 1.6, rtol=1e-4)
    assert np.abs(xyz[child_rows] - np.array([3.0, 4.0, 5.0])).max() < 0.3
    # moments zeroed on all new rows
    assert float(jnp.abs(gm2.m.xyz).max()) == 0.0


def test_densify_noop_when_cold():
    gm = _mk_map(scales=[0.01, 0.05], opacs=[0.5, 0.5])
    grads = jnp.zeros((gm.capacity,), jnp.float32)
    gm2 = G.densify_and_prune(
        gm, grads, jax.random.PRNGKey(0),
        grad_threshold=0.5, percent_dense=0.01, extent=2.0,
        min_opacity=0.05, min_scale=5e-4,
    )
    assert int(gm2.n_active) == 2
    np.testing.assert_allclose(np.asarray(gm2.params.xyz[:2]),
                               np.asarray(gm.params.xyz[:2]))
