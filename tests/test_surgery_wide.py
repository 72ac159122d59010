"""Wide single-scatter/gather map surgery vs narrow-op numpy oracles.

The surgery ops (add_gaussians / add_params / prune) land all 39-40
param|moment|active columns with ONE row scatter/gather (TPU scatter
cost is per row, not per byte). These tests pin the semantics against
straightforward per-field numpy implementations of the reference
behavior (cat_tensors_to_optimizer / prune_optimizer,
scene/Gaussians.py:143-184)."""
import jax
import jax.numpy as jnp
import numpy as np

from gaus_slam_tpu.models import gaussians as G


def _rand_map(rng, cap=64, n=23):
    gm = G.empty_map(cap)
    pts = rng.standard_normal((n, 3)).astype(np.float32)
    cols = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
    scale = rng.uniform(0.01, 0.1, (n,)).astype(np.float32)
    gm = G.add_gaussians(gm, jnp.asarray(pts), jnp.asarray(cols), None,
                         jnp.asarray(scale))
    # non-trivial moments so prune's moment preservation is observable
    m = jax.tree.map(
        lambda x: jnp.asarray(
            rng.standard_normal(x.shape).astype(np.float32)), gm.params)
    v = jax.tree.map(
        lambda x: jnp.asarray(
            rng.uniform(0.0, 1.0, x.shape).astype(np.float32)), gm.params)
    return gm._replace(m=m, v=v)


def _np_fields(p):
    return {f: np.asarray(getattr(p, f)) for f in p._fields}


def test_add_gaussians_compaction_oracle():
    rng = np.random.default_rng(0)
    gm = _rand_map(rng)
    n0 = int(gm.n_active)
    k = 9
    pts = rng.standard_normal((k, 3)).astype(np.float32)
    cols = rng.uniform(0.1, 0.9, (k, 3)).astype(np.float32)
    scale = rng.uniform(0.01, 0.1, (k,)).astype(np.float32)
    valid = np.asarray([1, 0, 1, 1, 0, 0, 1, 1, 0], bool)

    gm2 = G.add_gaussians(gm, jnp.asarray(pts), jnp.asarray(cols), None,
                          jnp.asarray(scale), valid=jnp.asarray(valid))
    assert int(gm2.n_active) == n0 + valid.sum()

    # oracle: valid candidates compact onto rows [n0, n0+sum) in order
    ref = G.add_gaussians(gm, jnp.asarray(pts[valid]),
                          jnp.asarray(cols[valid]), None,
                          jnp.asarray(scale[valid]))
    for f, a in _np_fields(gm2.params).items():
        np.testing.assert_allclose(
            a[: n0 + valid.sum()],
            _np_fields(ref.params)[f][: n0 + valid.sum()],
            err_msg=f, rtol=0, atol=0)
    # new rows: zero moments, active set; old rows untouched
    for mom in (gm2.m, gm2.v):
        for f, a in _np_fields(mom).items():
            assert np.all(a[n0: n0 + valid.sum()] == 0.0), f
    for f, a in _np_fields(gm2.m).items():
        np.testing.assert_array_equal(a[:n0], _np_fields(gm.m)[f][:n0], f)
    assert np.asarray(gm2.active)[: n0 + valid.sum()].all()
    assert not np.asarray(gm2.active)[n0 + valid.sum():].any()


def test_add_params_merge_oracle():
    rng = np.random.default_rng(1)
    gm = _rand_map(rng, cap=64, n=17)
    donor = _rand_map(rng, cap=32, n=11)
    n0, nd = int(gm.n_active), int(donor.n_active)

    gm2 = G.add_params(gm, donor.params, donor.active)
    assert int(gm2.n_active) == n0 + nd
    # donor rows land compacted after the host rows, params verbatim
    for f, a in _np_fields(gm2.params).items():
        np.testing.assert_array_equal(
            a[n0: n0 + nd], _np_fields(donor.params)[f][:nd], f)
        np.testing.assert_array_equal(a[:n0], _np_fields(gm.params)[f][:n0],
                                      f)
    # donor moments do NOT transfer (cat_tensors_to_optimizer zeros them)
    for mom in (gm2.m, gm2.v):
        for f, a in _np_fields(mom).items():
            assert np.all(a[n0: n0 + nd] == 0.0), f
    # host moments preserved
    for f, a in _np_fields(gm2.v).items():
        np.testing.assert_array_equal(a[:n0], _np_fields(gm.v)[f][:n0], f)


def test_prune_stable_compaction_oracle():
    rng = np.random.default_rng(2)
    gm = _rand_map(rng, cap=48, n=19)
    n0 = int(gm.n_active)
    mask = np.zeros(48, bool)
    mask[[1, 2, 7, 18]] = True  # prune 4 active rows

    gm2 = G.prune(gm, jnp.asarray(mask))
    keep = [i for i in range(n0) if not mask[i]]
    assert int(gm2.n_active) == len(keep)
    # stable order, params AND both moment trees gathered together
    for src, dst in ((gm.params, gm2.params), (gm.m, gm2.m),
                     (gm.v, gm2.v)):
        for f in src._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(dst, f))[: len(keep)],
                np.asarray(getattr(src, f))[keep], f)
    act = np.asarray(gm2.active)
    assert act[: len(keep)].all() and not act[len(keep):].any()
