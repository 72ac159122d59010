"""Static-capacity Gaussian surfel map with optimizer-surgery semantics.

TPU-native replacement for the reference's torch param-store + Adam-state
surgery (scene/Gaussians.py). JAX wants static shapes, so the map is a
preallocated structure-of-arrays of capacity ``C`` with an active count;
grow/prune/transform are pure functions that reproduce the reference's
optimizer-state semantics exactly:

  * grow (cat_tensors_to_optimizer, Gaussians.py:162-184): new rows get
    zeroed Adam moments, the per-tensor step count is preserved.
  * prune (prune_optimizer, Gaussians.py:143-160): surviving rows keep
    their moments and are compacted in stable order.
  * replace (replace_tensor_to_optimizer, Gaussians.py:418-431): the
    replaced tensor's moments are zeroed — used by rigid submap
    transforms (transform_gaussians, :404-416) and opacity capping
    (reset_opacity, :399-402).

Adam matches torch.optim.Adam (lr per group, betas=(0.9, 0.999),
eps=1e-15 inside the denominator, bias correction with a per-tensor step
count; Gaussians.py:136).

Capacity is bucketed (powers-of-two style) by the host-side wrapper so
jitted step functions re-compile only on bucket changes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

PARAM_FIELDS = ("xyz", "log_scales", "quats", "opacity_logit", "rgb")
PARAM_DIMS = {"xyz": 3, "log_scales": 2, "quats": 4, "opacity_logit": 1, "rgb": 3}
# per-group learning-rate names as in the reference training_args
LR_KEYS = {
    "xyz": "xyz_lr", "log_scales": "scaling_lr", "quats": "rotation_lr",
    "opacity_logit": "opacity_lr", "rgb": "rgb_lr",
}


class Params(NamedTuple):
    xyz: jnp.ndarray            # [C, 3]
    log_scales: jnp.ndarray     # [C, 2]
    quats: jnp.ndarray          # [C, 4] (w, x, y, z)
    opacity_logit: jnp.ndarray  # [C, 1]
    rgb: jnp.ndarray            # [C, 3]


class GaussianMap(NamedTuple):
    params: Params
    m: Params                   # Adam first moments
    v: Params                   # Adam second moments
    step: jnp.ndarray           # scalar int32 (per-tensor step is shared:
                                # all groups step together in the reference)
    active: jnp.ndarray         # [C] bool
    n_active: jnp.ndarray       # scalar int32

    @property
    def capacity(self) -> int:
        return self.params.xyz.shape[0]

    # ---- activations (Gaussians.py:17-25) ----
    @property
    def scales(self):
        return jnp.exp(self.params.log_scales)

    @property
    def opacity(self):
        return jax.nn.sigmoid(self.params.opacity_logit)


def _zeros_params(capacity: int) -> Params:
    return Params(**{
        f: jnp.zeros((capacity, PARAM_DIMS[f]), jnp.float32)
        for f in PARAM_FIELDS
    })


def empty_map(capacity: int) -> GaussianMap:
    p = _zeros_params(capacity)
    # identity quats on inactive rows keep preprocess numerics benign
    p = p._replace(quats=p.quats.at[:, 0].set(1.0))
    return GaussianMap(
        params=p, m=_zeros_params(capacity), v=_zeros_params(capacity),
        step=jnp.int32(0),
        active=jnp.zeros((capacity,), bool), n_active=jnp.int32(0),
    )


def bucket_capacity(n: int, quantum: int = 1 << 16, margin: float = 1.0,
                    floor: int = 0) -> int:
    """Quantized capacity bucket for ``n`` active gaussians: jitted step
    programs key their compile caches on the array capacity, so all
    growth happens in ``quantum`` steps with an optional safety margin
    and a floor that pins the bucket for a whole run (every flip
    re-traces the program set — PERF.md trace-storm note)."""
    cap = max(quantum, -(-int(n * margin) // quantum) * quantum)
    return max(cap, floor)


def resize_map(gm: GaussianMap, cap: int) -> GaussianMap:
    """Pad (or truncate) every map array to capacity ``cap``. Inactive
    rows keep identity quats so the preprocess math stays benign.
    The TPU-native analogue of the reference's torch optimizer-state
    surgery on grow (scene/Gaussians.py:143-184)."""
    if cap == gm.capacity:
        return gm

    def resize(x):
        if cap > x.shape[0]:
            pad = [(0, cap - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, pad)
        return x[:cap]

    params = Params(*(resize(p) for p in gm.params))
    params = params._replace(
        quats=jnp.where(
            (jnp.arange(cap) < gm.n_active)[:, None],
            params.quats,
            jnp.zeros((cap, 4)).at[:, 0].set(1.0),
        )
    )
    return gm._replace(
        params=params,
        m=Params(*(resize(p) for p in gm.m)),
        v=Params(*(resize(p) for p in gm.v)),
        active=resize(gm.active),
    )


def create_from_points_masked(
    capacity: int,
    points: jnp.ndarray,    # [N, 3] world
    colors: jnp.ndarray,    # [N, 3]
    normals: jnp.ndarray | None,  # [N, 3] or None
    init_scale: jnp.ndarray,      # [N]
    valid: jnp.ndarray | None = None,
    isotropic: bool = False,
) -> GaussianMap:
    """Gaussians.create_from_pcd (Gaussians.py:64-121): log-scale from the
    depth-derived initial scale, surfel orientation from normals, opacity
    logit 0 (i.e. opacity 0.5)."""
    gm = empty_map(capacity)
    return add_gaussians(gm, points, colors, normals, init_scale,
                         valid=valid, isotropic=isotropic)


def _orientation_quats(normals: jnp.ndarray | None, n: int) -> jnp.ndarray:
    from ..ops.geometry import surfel_quat_from_normal

    if normals is None:
        q = jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0)
        return q
    return surfel_quat_from_normal(normals)


def add_gaussians(
    gm: GaussianMap,
    points: jnp.ndarray,
    colors: jnp.ndarray,
    normals: jnp.ndarray | None,
    init_scale: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    isotropic: bool = False,
) -> GaussianMap:
    """Append candidate gaussians where ``valid`` with zeroed moments
    (cat_tensors_to_optimizer semantics). Candidates are a fixed-size
    buffer (e.g. all image pixels during densification); valid ones are
    compacted onto rows [n_active, n_active + sum(valid)) via a cumsum
    scatter — no host round-trip, no dynamic shapes."""
    n = points.shape[0]
    C = gm.capacity
    if valid is None:
        valid = jnp.ones((n,), bool)

    ls = jnp.log(jnp.maximum(init_scale, 1e-12))[:, None]
    ls = jnp.broadcast_to(ls, (n, 2))
    new = Params(
        xyz=points.astype(jnp.float32),
        log_scales=ls.astype(jnp.float32),
        quats=_orientation_quats(normals, n),
        opacity_logit=jnp.zeros((n, 1), jnp.float32),
        rgb=colors.astype(jnp.float32),
    )

    vi = valid.astype(jnp.int32)
    rank = jnp.cumsum(vi) - vi                       # exclusive
    n_new = jnp.sum(vi)
    dest = jnp.where(valid, gm.n_active + rank, C)   # C = dropped (OOB)

    # ONE wide scatter (params | zeroed m | zeroed v | active): TPU
    # scatter cost is per ROW (~120 ns), not per byte — 16 narrow
    # scatters over H*W candidate rows cost ~400 ms per densify, the
    # single 40-column scatter ~25 ms (same trick as add_params).
    zeros_src = [jnp.zeros_like(s) for s in new]
    dst = jnp.concatenate(
        list(gm.params) + list(gm.m) + list(gm.v)
        + [gm.active[:, None].astype(jnp.float32)], axis=1)
    src = jnp.concatenate(
        list(new) + zeros_src + zeros_src
        + [valid[:, None].astype(jnp.float32)], axis=1)
    dst = dst.at[dest].set(src, mode="drop")
    params, m, v, active = _unpack_wide(dst)
    return gm._replace(
        params=params, m=m, v=v, active=active,
        n_active=jnp.minimum(gm.n_active + n_new, C),
    )


def _unpack_wide(dst: jnp.ndarray) -> tuple[Params, Params, Params, jnp.ndarray]:
    """Split a [C, 40] (params | m | v | active) block back into pytrees."""
    dims = [PARAM_DIMS[f] for f in PARAM_FIELDS]
    offs = np.cumsum([0] + dims * 3).tolist()

    def unpack(base):
        return Params(*(dst[:, offs[base + i]:offs[base + i + 1]]
                        for i in range(len(dims))))

    return unpack(0), unpack(5), unpack(10), dst[:, offs[-1]] > 0.5


def add_params(
    gm: GaussianMap, new: Params, new_active: jnp.ndarray
) -> GaussianMap:
    """Backend merge: append a submap's raw param rows with zero moments
    (Backend.py:227 -> Gaussians.add_params). ``new_active`` masks the
    donor's static-capacity rows; valid rows are compacted on scatter."""
    C = gm.capacity
    vi = new_active.astype(jnp.int32)
    rank = jnp.cumsum(vi) - vi
    n_new = jnp.sum(vi)
    dest = jnp.where(new_active, gm.n_active + rank, C)

    # ONE wide scatter: TPU scatter cost is per ROW (~120 ns), not per
    # byte, so the 40 columns (params | zeroed m | zeroed v | active)
    # ride along for free vs 16 narrow scatters (~6x faster merge).
    zeros_src = [jnp.zeros_like(s) for s in new]
    dst = jnp.concatenate(
        list(gm.params) + list(gm.m) + list(gm.v)
        + [gm.active[:, None].astype(jnp.float32)], axis=1)
    src = jnp.concatenate(
        list(new) + zeros_src + zeros_src
        + [new_active[:, None].astype(jnp.float32)], axis=1)
    dst = dst.at[dest].set(src, mode="drop")
    params, m, v, active = _unpack_wide(dst)
    return gm._replace(
        params=params, m=m, v=v, active=active,
        n_active=jnp.minimum(gm.n_active + n_new, C),
    )


def prune(gm: GaussianMap, prune_mask: jnp.ndarray) -> GaussianMap:
    """Remove gaussians where prune_mask is True, compacting in stable
    order with moments preserved (prune_optimizer semantics)."""
    keep = gm.active & ~prune_mask
    # stable order: kept rows first, preserving relative order
    order = jnp.argsort(jnp.where(keep, 0, 1), stable=True)
    n_new = jnp.sum(keep).astype(jnp.int32)

    # ONE wide gather: row-gather cost is per ROW (~12 ns), not per
    # byte — 15 narrow gathers over a 1M-row backend map cost ~180 ms,
    # the single 39-column gather ~12 ms.
    wide = jnp.concatenate(
        list(gm.params) + list(gm.m) + list(gm.v), axis=1)[order]
    active = jnp.arange(gm.capacity) < n_new
    params, m, v, _ = _unpack_wide(
        jnp.concatenate([wide, active[:, None].astype(jnp.float32)], axis=1))
    return gm._replace(params=params, m=m, v=v, active=active, n_active=n_new)


def transform(gm: GaussianMap, transfer: jnp.ndarray) -> GaussianMap:
    """Rigid transform of the whole map (transform_gaussians,
    Gaussians.py:404-416): xyz/quats move, their Adam moments reset."""
    from ..ops.se3 import quat_multiply, rotmat_to_quat

    R, t = transfer[:3, :3], transfer[:3, 3]
    q_r = rotmat_to_quat(R)
    params = gm.params._replace(
        xyz=gm.params.xyz @ R.T + t,
        quats=quat_multiply(q_r[None, :], gm.params.quats),
    )
    zeros3 = jnp.zeros_like(gm.m.xyz)
    zeros4 = jnp.zeros_like(gm.m.quats)
    m = gm.m._replace(xyz=zeros3, quats=zeros4)
    v = gm.v._replace(xyz=zeros3, quats=zeros4)
    return gm._replace(params=params, m=m, v=v)


def cap_opacity(gm: GaussianMap, max_opacity: float = 0.01) -> GaussianMap:
    """opacity <- min(opacity, logit(max)) with opacity moments reset
    (Backend.py:226 + replace_tensor_to_optimizer)."""
    cap = float(np.log(max_opacity / (1.0 - max_opacity)))
    params = gm.params._replace(
        opacity_logit=jnp.minimum(gm.params.opacity_logit, cap)
    )
    z = jnp.zeros_like(gm.m.opacity_logit)
    return gm._replace(
        params=params,
        m=gm.m._replace(opacity_logit=z),
        v=gm.v._replace(opacity_logit=z),
    )


def adam_step(
    gm: GaussianMap,
    grads: Params,
    lrs: dict,
    betas: tuple = (0.9, 0.999),
    eps: float = 1e-15,
    isotropic: bool = False,
) -> GaussianMap:
    """One torch-semantics Adam step over all param groups, masked to
    active rows (inactive rows receive zero grads by construction but we
    mask anyway).

    isotropic: ties the two scale columns — the reference stores a single
    scaling column tiled at render time (Gaussians.py:82,524), so its
    gradient is the SUM over the tiled columns; columns stay equal.
    """
    if isotropic:
        tied = jnp.sum(grads.log_scales, axis=-1, keepdims=True)
        grads = grads._replace(
            log_scales=jnp.broadcast_to(tied, grads.log_scales.shape)
        )
    b1, b2 = betas
    step = gm.step + 1
    t = step.astype(jnp.float32)
    c1 = 1.0 - b1**t
    c2 = 1.0 - b2**t
    act = gm.active[:, None]

    new_p, new_m, new_v = [], [], []
    for name, p, m, v, g in zip(PARAM_FIELDS, gm.params, gm.m, gm.v, grads):
        g = jnp.where(act, g, 0.0)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        upd = (m / c1) / (jnp.sqrt(v / c2) + eps)
        p = p - lrs[LR_KEYS[name]] * jnp.where(act, upd, 0.0)
        new_p.append(p)
        new_m.append(m)
        new_v.append(v)
    return gm._replace(
        params=Params(*new_p), m=Params(*new_m), v=Params(*new_v), step=step
    )


def densify_and_prune(
    gm: GaussianMap,
    grad_stat: jnp.ndarray,   # [C] mean view-space gradient stat
    key: jnp.ndarray,         # PRNG key for the split offsets
    *,
    grad_threshold: float,
    percent_dense: float,
    extent: float,
    min_opacity: float,
    min_scale: float,
    split_n: int = 2,
) -> GaussianMap:
    """3DGS-style clone/split/prune (Gaussians.densify_and_prune,
    scene/Gaussians.py:532-593; the backend ``gs_densify`` path,
    Backend.py:117-128).

      clone: small gaussians with large view-space gradients are
        duplicated in place (new rows, zero Adam moments).
      split: large ones are replaced by ``split_n`` children sampled
        from the parent's own distribution with scales / (0.8 * n).
      prune: low opacity, tiny mean scale, or world-space size above
        0.1 * extent. (The reference's additional screen-space
        max_radii2D bound needs per-iteration radius tracking it never
        re-populates after reset — the world-space bound is the active
        one; documented deviation.)
    """
    scales = jnp.exp(gm.params.log_scales)
    max_scale = scales.max(axis=-1)
    hot = (grad_stat >= grad_threshold) & gm.active
    clone_mask = hot & (max_scale <= percent_dense * extent)
    split_mask = hot & (max_scale > percent_dense * extent)

    # clone: straight copies with zeroed moments
    gm = add_params(gm, gm.params, clone_mask)

    # split: children at parent +/- R @ N(0, diag(s0, s1, 0)),
    # log-scale shrunk by 0.8 * n
    from ..ops.se3 import quat_to_rotmat

    R = quat_to_rotmat(gm.params.quats[: split_mask.shape[0]])
    child = gm.params._replace(
        log_scales=gm.params.log_scales
        - jnp.log(0.8 * split_n),
    )
    for i in range(split_n):
        k = jax.random.fold_in(key, i)
        noise = jax.random.normal(k, scales.shape) * scales   # [C, 2]
        off = (R[..., :, 0] * noise[:, 0:1]
               + R[..., :, 1] * noise[:, 1:2])
        gm = add_params(gm, child._replace(xyz=child.xyz + off), split_mask)

    opac = jax.nn.sigmoid(gm.params.opacity_logit[:, 0])
    scales = jnp.exp(gm.params.log_scales)
    prune_mask = (
        (opac < min_opacity)
        | (scales.mean(axis=-1) < min_scale)
        | (scales.max(axis=-1) > 0.1 * extent)
    )
    # the split parents are removed (Gaussians.py:573-574)
    return prune(gm, (prune_mask | split_mask) & gm.active)


def extract_params(gm: GaussianMap) -> tuple[Params, jnp.ndarray, jnp.ndarray]:
    """Detached snapshot for submap handoff (Gaussians.extract_params)."""
    return (
        jax.tree.map(lax.stop_gradient, gm.params),
        gm.active,
        gm.n_active,
    )
