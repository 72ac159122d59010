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
    out, _ = render_full(params, active, cam, opts)
    loss, _ = mapping_loss(out, gt_tiled, lcfg)
    return loss


def sharded_ba_step(
    mesh: Mesh,
    gm: G.GaussianMap,
    w2cs: jnp.ndarray,       # [n_dev, 4, 4] one keyframe pose per device
    gt_tiled: jnp.ndarray,   # [n_dev, T, 4, P]
    cam_proj: Camera,
    opts: RenderOptions,
    mcfg,                    # slam.steps.MapConfig
    lcfg: LossConfig,
):
    """One data-parallel BA step: n_devices keyframes rendered in
    parallel, map gradients psum'd, one Adam step on the replicated map.
    """
    axis = mesh.axis_names[0]

    # Per-device gradients come back SHARDED over the mesh axis and are
    # mean-reduced outside the shard_map (one XLA all-reduce on the
    # sharded stack). No collective runs inside the shard_map body: the
    # Pallas kernels are opaque to the vma (varying-across-mesh) type
    # system, so with check_vma disabled any in-body psum over their
    # outputs is unsound — keeping the body embarrassingly parallel makes
    # check_vma=False correct by construction.
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    def grad_step(params, active, w2c_shard, gt_shard):
        loss, grads = jax.value_and_grad(_ba_loss)(
            params, active, w2c_shard[0], gt_shard[0],
            cam_proj, opts, lcfg,
        )
        return jax.tree.map(lambda g: g[None], grads), loss[None]

    @functools.partial(jax.jit, static_argnums=())
    def step(gm, w2cs, gt_tiled):
        grads_stacked, losses = grad_step(gm.params, gm.active, w2cs,
                                          gt_tiled)
        grads = jax.tree.map(lambda g: g.mean(axis=0), grads_stacked)
        return G.adam_step(gm, grads, dict(mcfg.lrs), mcfg.betas,
                           mcfg.eps), losses.mean()

    return step(gm, w2cs, gt_tiled)
