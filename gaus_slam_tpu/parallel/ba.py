"""Device-mesh-parallel bundle adjustment.

The reference's backend optimizes the global map one random keyframe at
a time (slam/Backend.py:101-128); its only parallelism is the 3-process
host pipeline. On a TPU slice the natural scale-out is over *keyframe
residuals*: each device renders a different keyframe of the covisible
set against the (replicated) global map and the map gradient is
all-reduced over ICI before a single shared Adam step — one sharded BA
step does the work of `n_devices` reference mapping iterations at the
per-iteration latency of one.

Mesh layout:
  axis "dp" — keyframes (gt tiles, poses sharded)
  map parameters + Adam state — replicated; grads psum over "dp"

The renders themselves keep their intra-chip parallelism (the Pallas
compositor); multi-host meshes ride the same shard_map with DCN on the
outer axis.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import gaussians as G
from ..ops.camera import Camera
from ..render import RenderOptions, render_full
from ..slam.loss import LossConfig, mapping_loss


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.asarray(devs), (axis,))


def _ba_loss(params, active, w2c, gt_tiled, cam_proj, opts, lcfg):
    cam = cam_proj.replace_w2c(w2c)
    out, bins = render_full(params, active, cam, opts,
                            need_normal=opts.normals_in_tracking)
    loss, _ = mapping_loss(out, gt_tiled, lcfg)
    # binning diagnostics ride along so the caller's escalation ladder
    # sees overflow on the sharded path too (rasterizer_impl.cu:283-291
    # analogue)
    return loss, (bins.overflow, bins.n_shrunk, bins.demand)


@functools.lru_cache(maxsize=16)
def _build_step(mesh: Mesh, opts: RenderOptions, mcfg, lcfg: LossConfig,
                cam_aux: tuple):
    """Compile-cached sharded BA step for a (mesh, options) combination.

    Per-device gradients come back SHARDED over the mesh axis and are
    weight-reduced outside the shard_map (one XLA all-reduce on the
    sharded stack). No collective runs inside the shard_map body: the
    Pallas kernels are opaque to the vma (varying-across-mesh) type
    system, so with check_vma disabled any in-body psum over their
    outputs is unsound — keeping the body embarrassingly parallel makes
    check_vma=False correct by construction.
    """
    axis = mesh.axis_names[0]
    from ..ops.camera import Camera

    cam_proj = Camera(*cam_aux[:6], jnp.eye(4, dtype=jnp.float32),
                      *cam_aux[6:])

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        check_vma=False,
    )
    def grad_step(params, active, w2c_shard, gt_shard):
        (loss, (ov, ns, dm)), grads = jax.value_and_grad(
            _ba_loss, has_aux=True
        )(params, active, w2c_shard[0], gt_shard[0], cam_proj, opts, lcfg)
        return (jax.tree.map(lambda g: g[None], grads), loss[None],
                ov[None], ns[None], dm[None])

    @jax.jit
    def step(gm, w2cs, gt_tiled, weights):
        grads_stacked, losses, ovs, nss, dms = grad_step(
            gm.params, gm.active, w2cs, gt_tiled)
        wsum = jnp.maximum(jnp.sum(weights), 1e-9)

        def wmean(g):
            w = weights.reshape((-1,) + (1,) * (g.ndim - 1))
            return jnp.sum(g * w, axis=0) / wsum

        grads = jax.tree.map(wmean, grads_stacked)
        loss = jnp.sum(losses * weights) / wsum
        live = weights > 0
        diag = {"overflow": jnp.any(ovs & live),
                "n_shrunk": jnp.max(jnp.where(live, nss, 0)),
                "demand": jnp.max(jnp.where(live, dms, 0))}
        return G.adam_step(gm, grads, dict(mcfg.lrs), mcfg.betas,
                           mcfg.eps), loss, diag

    return step


def sharded_ba_step(
    mesh: Mesh,
    gm: G.GaussianMap,
    w2cs: jnp.ndarray,       # [n_dev, 4, 4] one keyframe pose per device
    gt_tiled: jnp.ndarray,   # [n_dev, T, 4, P]
    cam_proj: Camera,
    opts: RenderOptions,
    mcfg,                    # slam.steps.MapConfig
    lcfg: LossConfig,
    weights: jnp.ndarray | None = None,  # [n_dev]; 0 masks padded slots
):
    """One data-parallel BA step: n_devices keyframes rendered in
    parallel, map gradients all-reduced, one Adam step on the replicated
    map. ``weights`` lets a partially-filled group (fewer live keyframes
    than devices) contribute an unbiased gradient mean.

    Returns (map, loss, diag) where diag carries the OR/max-reduced
    binning overflow diagnostics of the live shards.
    """
    if weights is None:
        weights = jnp.ones((w2cs.shape[0],), jnp.float32)
    step = _build_step(mesh, opts, mcfg, lcfg, cam_proj._aux())
    return step(gm, w2cs, gt_tiled, weights)
