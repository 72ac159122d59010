"""Render facade — the four renderer modes of the reference
(render/__init__.py: Renderer_tracking/_mapping/_BA/_view) as jit-friendly
pure functions over the static-capacity Gaussian map.

Mode semantics (gradient boundaries match the reference exactly):
  * tracking: map parameters detached, gaussians rigidly moved into the
    camera frame by the LIVE pose (gradient flows through the means
    only; the rotated quaternions are detached — render/__init__.py:35-36),
    camera view matrix = identity.
  * mapping:  pose fixed (detached) inside the camera matrix, map
    parameters live.
  * ba:       both live (pose through the means path, like tracking).
  * view:     everything detached (eval / densification / keyframe test).

Weight-normalized depth + exposure are applied by the loss layer
(slam/loss.py) on the tile-major buffers.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..models.gaussians import GaussianMap, Params
from ..ops import binning as B
from ..ops.camera import Camera
from ..ops.preprocess import (PreSummary, pack_pair_attrs, preprocess,
                              preprocess_t)
from ..ops.raster import RenderSettings, render_pairs
from ..ops.se3 import quat_multiply, quat_multiply_rows, rotmat_to_quat


class RenderOptions(NamedTuple):
    """Static (hashable) render configuration."""

    grid: B.TileGrid
    use_sa: bool = True
    backend: str = "pallas"
    # r_max = factor * capacity (escalates on overflow). Fractional
    # factors are allowed: real pair counts track the ACTIVE count
    # (~2.05x at 16px tiles / d_max 4) while the budget keys off the
    # CAPACITY bucket, so components whose active count sits well below
    # capacity (the frontend) run lower factors — see
    # SystemConfig.from_config(component=...).
    pair_budget_factor: float = 2
    # demand-keyed pair budget: when > 0 this EXPLICIT row count replaces
    # factor * capacity as r_max. The backend's capacity bucket is sized
    # for the merge PEAK (steady map + one full donor, pre-prune), but a
    # single keyframe's true pair demand tracks what the camera SEES —
    # measured 2.2-2.9x smaller at the fullres bench shape — and every
    # per-pair op (expansion gather, kernel padding, vjp reduction sort)
    # scales with r_max. Escalation (SystemConfig.maybe_escalate) raises
    # it demand-sized on overflow, exactly like the capacity floors.
    pair_cap: int = 0
    max_tiles_per_gaussian: int = 16
    normals_in_tracking: bool = False  # loss.use_normal_loss
    method: str = "2dgs"          # "2dgs" surfels | "3dgs" volumetric
    iso3d: bool = False           # gaussian_distribution == isotropic
    # kernel elementwise compute dtype ("f32" | "bf16"). bf16 is an
    # experiment knob: measured ~1.05x VPU elementwise on v5e
    # (tools/bf16_probe.py) with real depth-precision risk — see
    # PERF.md "precision lever"
    compute_dtype: str = "f32"

    def settings(self, need_normal: bool = True) -> RenderSettings:
        # surface-aware depth fusion is a 2dgs-rasterizer feature; the
        # 3dgs path composites plain weighted depth (render_3dgs.py:59-82)
        return RenderSettings(
            grid=self.grid, use_sa=self.use_sa and self.method == "2dgs",
            backend=self.backend, need_normal=need_normal,
            compute_dtype=self.compute_dtype,
        )

    def r_max(self, n: int) -> int:
        if self.pair_cap > 0:
            return -(-int(self.pair_cap) // 128) * 128
        return -(-int(self.pair_budget_factor * n) // 128) * 128


# ---------------------------------------------------------------------------
# pair expansion with a controlled-VJP (the mapping-path segment reduction)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def expand_pairs(attrs_t: jnp.ndarray, bins: B.Binning, d_max: int,
                 backend: str | None = None):
    """[N, ATTR_C] per-gaussian attrs -> [ATTR_C, R] pair-expanded.

    ``backend`` routes the vjp's reduction landing gather through the
    banded pallas kernel (see Binning.slab_scatter_grads)."""
    return attrs_t[bins.pair_gauss].T


def _exp_fwd(attrs_t, bins, d_max, backend):
    return attrs_t[bins.pair_gauss].T, (bins, attrs_t.shape[0])


def _exp_bwd(d_max, backend, res, d_pairs):
    bins, n = res
    return (
        bins.slab_scatter_grads(d_pairs.T, n, d_max=d_max, backend=backend),
        None,
    )


expand_pairs.defvjp(_exp_fwd, _exp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def expand_pairs_phase(attrs_t: jnp.ndarray, bins: B.Binning, phase,
                       r_phase: int, d_max: int, backend: str | None = None):
    """[N, ATTR_C] attrs -> [ATTR_C, r_phase] pair block for ONE coarse
    phase of a phase-major binning (pairs globally ordered by (phase,
    tile, depth), so the phase's pairs are a contiguous slice). The
    gather and the vjp's segment reduction are O(r_phase) = O(r_max/s^2)
    instead of O(r_max) — the coarse-mapping path's expansion+reduction
    were ~75% of its iteration cost (PERF.md round-3 microbench)."""
    return _phase_rows(attrs_t, bins, phase, r_phase)


def _phase_rows(attrs_t, bins, phase, r_phase):
    # Slice from the 128-ALIGNED floor of the phase start: the
    # compositing kernel chunks pairs in 128-lane DMA windows keyed to
    # absolute offsets, so an unaligned rebase would regroup chunks and
    # perturb the f32 accumulation order (ulp drift vs the dense path).
    # Aligned rebase keeps every offset's value mod 128 — bit-exact.
    p0_al = _phase_base(bins, phase)
    gauss_pad = jnp.concatenate(
        [bins.pair_gauss, jnp.zeros((r_phase,), jnp.int32)])
    gauss_blk = jax.lax.dynamic_slice(gauss_pad, (p0_al,), (r_phase,))
    return attrs_t[gauss_blk].T


def _phase_base(bins, phase):
    """128-aligned floor of the phase's first pair index."""
    return (bins.phase_start[phase] // 128) * 128


def _expp_fwd(attrs_t, bins, phase, r_phase, d_max, backend):
    return (_phase_rows(attrs_t, bins, phase, r_phase),
            (bins, phase, attrs_t.shape[0]))


def _expp_bwd(r_phase, d_max, backend, res, d_pairs):
    bins, phase, n = res
    return (
        bins.phase_reduce(d_pairs.T, phase, n, d_max, backend=backend),
        None, None,
    )


expand_pairs_phase.defvjp(_expp_fwd, _expp_bwd)


def phase_budget(opts: "RenderOptions", n: int, stride: int) -> int:
    """Static per-phase pair budget: 2x the average phase share of
    r_max plus one 128-lane head (the compact slice starts at the
    ALIGNED floor of the phase boundary). A phase outgrowing it reports
    overflow (same escalation ladder as the global budget — escalating
    r_max scales this too)."""
    return -(-(2 * opts.r_max(n)) // (stride * stride * 128)) * 128 + 128


def track_coarse_budget(r_max: int, stride: int) -> int:
    """Static pair budget for the tracking cache's coarse head block.

    A phase-major tracking cache (``bin_for_tracking(coarse_stride=s)``)
    stores phase 0's pairs — exactly the coarse checkerboard tiles the
    tracking loop renders for its first ``coarse_iters`` iterations — as
    the FIRST rows of the pair array. Slicing the cache to this budget
    makes each coarse iteration's per-pair preprocess + pose-gradient
    reduction O(r_max/s^2) instead of O(r_max). 2x the average phase
    share (no alignment head needed: the block starts at offset 0);
    outgrowing it reports through the cache's overflow diagnostic and
    the standard escalation ladder re-sizes r_max (and so this too)."""
    return min(r_max, -(-(2 * r_max) // (stride * stride * 128)) * 128)


# ---------------------------------------------------------------------------


def _activated(params: Params, active):
    return (
        params.xyz,
        jnp.exp(params.log_scales),
        params.quats,
        jax.nn.sigmoid(params.opacity_logit[:, 0]),
        params.rgb,
    )


def _preprocess(xyz, scales, quats, opac, cam, opts: RenderOptions,
                active=None):
    """Method dispatch: 2dgs surfel homography vs 3dgs EWA conic
    (reference render/__init__.py:7-15 `render = {'2dgs': ..., '3dgs': ...}`)."""
    if opts.method == "3dgs":
        from ..ops.preprocess_3dgs import preprocess_3dgs, scales_to_3d

        return preprocess_3dgs(xyz, scales_to_3d(scales, opts.iso3d),
                               quats, opac, cam, active=active)
    return preprocess(xyz, scales, quats, opac, cam, active=active)


def _prep_attrs(params: Params, active, cam, opts: RenderOptions):
    """Activations + preprocess + attr packing -> ([PAIR_C, N] attrs,
    PreSummary for binning). 2dgs runs the lane-major ``preprocess_t``
    (one [N, C] -> [C, N] relayout per field, then full-lane math); 3dgs
    keeps the [N, C] oracle path."""
    if opts.method == "3dgs":
        xyz, scales, quats, opac, rgb = _activated(params, active)
        pre = _preprocess(xyz, scales, quats, opac, cam, opts, active=active)
        attrs = pack_pair_attrs(pre, rgb)
        summary = PreSummary(valid=pre.valid, center=pre.center,
                             radius=pre.radius, depth=pre.depth)
        return attrs, summary
    return preprocess_t(
        params.xyz.T,
        jnp.exp(params.log_scales.T),
        params.quats.T,
        jax.nn.sigmoid(params.opacity_logit[:, 0]),
        params.rgb.T,
        cam,
        active=active,
    )


def _method_mask(out, opts: RenderOptions):
    """3dgs returns zeros for normal/middepth/dist (render_3dgs.py:90-92);
    normals are already zero by construction, middepth/dist are masked."""
    if opts.method != "3dgs":
        return out
    from ..ops.compositing import OUT_C

    keep = jnp.ones((1, OUT_C, 1), out.dtype).at[0, 8:10, 0].set(0.0)
    return out * keep


def bin_full(
    params: Params, active: jnp.ndarray, cam: Camera, opts: RenderOptions,
    phase_stride: int = 0,
) -> B.Binning:
    """Binning pass alone (non-differentiable structure) — callers that
    need the overflow/shrink diagnostics compute this once and pass it to
    ``render_full(bins=...)``. ``phase_stride`` > 0 builds a PHASE-MAJOR
    binning (pairs ordered by coarse-checkerboard phase first) enabling
    the compact per-phase render path (``render_full(phase=...)``)."""
    _, summary = _prep_attrs(params, active, cam, opts)  # attrs DCE'd
    return B.bin_gaussians(
        jax.tree.map(lax.stop_gradient, summary), opts.grid,
        r_max=opts.r_max(params.xyz.shape[0]),
        max_tiles_per_gaussian=opts.max_tiles_per_gaussian,
        reduce_perm=True,
        phase_stride=phase_stride,
    )


def render_full(
    params: Params,
    active: jnp.ndarray,
    cam: Camera,
    opts: RenderOptions,
    bins: B.Binning | None = None,
    need_normal: bool = True,
    tile_ids: jnp.ndarray | None = None,
    tile_valid: jnp.ndarray | None = None,
    phase=None,
    coarse_stride: int = 0,
):
    """Differentiable full-map render (mapping/BA/view paths).

    Returns (out_tiled [T, OUT_C, P], bins). Binning is non-differentiable
    structure; pass a precomputed one to reuse it across iterations.
    ``need_normal=False`` skips the normal accumulation and its vjp
    shadow in the kernels (mapping/BA losses only read normals under
    use_normal_loss — reference slam/Loss.py:51-58).
    ``tile_ids`` renders only that subset of image tiles (coarse mapping:
    the loss is per-pixel, so a tile subset is an unbiased stochastic
    gradient — see steps.mapping_loop coarse_stride); the output is
    [len(tile_ids), OUT_C, P]. Pairs of unrendered tiles contribute zero
    parameter gradients through the pair-expansion vjp.

    ``phase``/``coarse_stride``: compact coarse path — ``bins`` must be
    phase-major (``bin_full(phase_stride=stride)``), ``tile_ids`` must
    be exactly phase ``phase``'s tile set, and expansion + the gradient
    reduction then run on the phase's contiguous O(r_max/s^2) pair block
    instead of all pairs. Bit-identical to the plain ``tile_ids`` path
    when the binning has no overflow (phase overflow zeroes gradients
    and reports through the same escalation diagnostics).
    """
    attrs, summary = _prep_attrs(params, active, cam, opts)
    if bins is None:
        assert phase is None, "compact phase render needs phase-major bins"
        bins = B.bin_gaussians(
            jax.tree.map(lax.stop_gradient, summary), opts.grid,
            r_max=opts.r_max(params.xyz.shape[0]),
            max_tiles_per_gaussian=opts.max_tiles_per_gaussian,
        )
    attrs_t = attrs.T                                # [N, ATTR_C]
    if phase is not None:
        assert tile_ids is not None and coarse_stride > 0
        r_phase = phase_budget(opts, params.xyz.shape[0], coarse_stride)
        pattrs = expand_pairs_phase(attrs_t, bins, phase, r_phase,
                                    opts.max_tiles_per_gaussian,
                                    opts.backend)
        p0_al = _phase_base(bins, phase)
        # clamp to the phase budget: under phase overflow the clipped
        # tiles render partially (gradients are zeroed + diag reported,
        # and escalation re-sizes) — the kernel must never DMA past the
        # compact buffer
        start = jnp.clip(bins.tile_start[tile_ids] - p0_al, 0, r_phase)
        stop = jnp.clip(bins.tile_stop[tile_ids] - p0_al, 0, r_phase)
        if tile_valid is not None:
            # padded duplicate entries render EMPTY (see
            # steps._coarse_map_phases) — the loss masks them out
            stop = jnp.where(tile_valid, stop, start)
        out = render_pairs(pattrs, start, stop, tile_ids,
                           opts.settings(need_normal=need_normal))
        return _method_mask(out, opts), bins
    pattrs = expand_pairs(attrs_t, bins, opts.max_tiles_per_gaussian,
                          opts.backend)
    if tile_ids is None:
        start, stop = bins.tile_start, bins.tile_stop
    else:
        start, stop = bins.tile_start[tile_ids], bins.tile_stop[tile_ids]
        if tile_valid is not None:
            stop = jnp.where(tile_valid, stop, start)
    out = render_pairs(pattrs, start, stop, tile_ids,
                       opts.settings(need_normal=need_normal))
    return _method_mask(out, opts), bins


@functools.partial(jax.jit, static_argnames=("opts",))
def render_view(gm: GaussianMap, cam: Camera, opts: RenderOptions):
    """Detached render at a fixed pose (Renderer_view). Jitted: through
    the tunneled device every un-jitted op pays ~1ms dispatch, so
    host-driven graphs MUST be single compiled programs."""
    params = jax.tree.map(lax.stop_gradient, gm.params)
    out, _ = render_full(params, gm.active, cam, opts)
    return out


class PairCache(NamedTuple):
    """Frozen pair-expanded raw map for the tracking hot loop.

    Built once per (frame, rebin): the map is detached during tracking
    (render/__init__.py:31-33), so raw parameters can be gathered into
    pair order up front — after that, every tracking iteration is pure
    elementwise math + the compositing kernel: no gather, no scatter.
    """

    raw_t: jnp.ndarray     # [13, R] = xyz | scales | quats | opac | rgb
                           # (lane-major: per-pair fields are [R] rows)
    tile_start: jnp.ndarray
    tile_stop: jnp.ndarray
    num_pairs: jnp.ndarray  # scalar int32 (binning diagnostics)
    overflow: jnp.ndarray   # scalar bool: pair budget exceeded
    n_shrunk: jnp.ndarray   # scalar int32: rects shrunk to fit d_max
    demand: jnp.ndarray     # scalar int32: true (unclipped) pair demand

    # Row views (no relayout: slabs of the [13, R] slab).
    @property
    def xyz_t(self):
        return self.raw_t[0:3]

    @property
    def scales_t(self):
        return self.raw_t[3:5]

    @property
    def quats_t(self):
        return self.raw_t[5:9]

    @property
    def opac(self):
        return self.raw_t[9]

    @property
    def rgb_t(self):
        return self.raw_t[10:13]


@functools.partial(
    jax.jit, static_argnames=("opts", "coarse_stride", "coarse_strides"))
def bin_for_tracking(
    gm: GaussianMap, cam0: Camera, opts: RenderOptions,
    coarse_stride: int = 0,
    coarse_strides: tuple = (),
) -> PairCache:
    """Binning + raw-param pair expansion at the tracking init pose.
    One compiled program (see render_view note on dispatch latency).

    The per-tile lists (and their depth order) stay fixed across the
    tracking iterations while the pose moves — the per-iteration motion
    is sub-pixel, and `rebin_every` in the frontend re-runs this when
    needed. Inactive gaussians and budget-padding pairs get opacity 0.

    ``coarse_stride`` > 1 orders the pairs PHASE-MAJOR (checkerboard
    phase of the home tile first): phase 0 — the coarse tracking tile
    subset — then occupies the HEAD of every cache array, so the coarse
    iterations can run on a ``track_coarse_budget``-row slice of the
    cache (see render_tracking ``pair_hi``). Per-tile ranges and depth
    order are unchanged; the full-resolution phase reads the same cache
    as before (global pair placement differs, which only regroups the
    compositor's 128-lane accumulation chunks — ulp-level drift).
    A phase-0 block outgrowing its budget reports through ``overflow``
    and escalates like any pair-budget overflow.

    ``coarse_strides`` (coarse -> fine, e.g. (4, 2) for the pyramid
    tracking schedule) generalizes this to MULTIPLE coarse levels from
    ONE cache: the binning is phase-major at the coarsest stride with
    the NESTED phase order (binning.phase_positions), so every level's
    checkerboard is a head prefix and slices at its own
    ``track_coarse_budget``. Supersedes ``coarse_stride`` when given.
    """
    params = jax.tree.map(lax.stop_gradient, gm.params)
    xyz, scales, quats, opac, rgb = _activated(params, gm.active)
    _, summary = _prep_attrs(params, gm.active, cam0, opts)  # attrs DCE'd
    r_max = opts.r_max(xyz.shape[0])
    strides = tuple(s for s in (coarse_strides or
                                ((coarse_stride,) if coarse_stride > 1
                                 else ())) if s > 1)
    sb = strides[0] if strides else 0
    if len(strides) > 1:
        assert all(strides[i] % strides[i + 1] == 0
                   for i in range(len(strides) - 1)), strides
    bins = B.bin_gaussians(
        summary, opts.grid, r_max=r_max,
        max_tiles_per_gaussian=opts.max_tiles_per_gaussian,
        phase_stride=sb,
        phase_nested=len(strides) > 1,
    )
    # INVARIANT (tracking_loop recomputes the coarse pair budget from
    # cache.raw_t.shape[1]): the pair array length must equal the r_max
    # this overflow check keys off, or the coarse slice could silently
    # drop live phase-0 pairs without the diagnostic firing.
    assert bins.pair_gauss.shape[0] == r_max, \
        (bins.pair_gauss.shape, r_max)
    overflow = bins.overflow
    for s_l in strides:
        # each level's checkerboard occupies the first (sb/s_l)^2 phase
        # blocks (prefix property of the nested order); its compact
        # slice budget must hold them all
        n_pfx = (sb // s_l) ** 2
        r_l = track_coarse_budget(r_max, s_l)
        overflow = overflow | (bins.phase_start[n_pfx] > r_l)
    # ONE fused row-gather for all raw fields (row gathers are
    # latency-bound per row on TPU, so 1 wide gather beats 5 narrow ones)
    opac_act = jnp.where(gm.active, opac, 0.0)
    raw = jnp.concatenate(
        [xyz, scales, quats, opac_act[:, None], rgb], axis=1
    )  # [N, 13]
    rows = raw[bins.pair_gauss]
    rows = rows.at[:, 9].set(jnp.where(bins.pair_ok, rows[:, 9], 0.0))
    return PairCache(
        raw_t=rows.T,  # one relayout; every tracking iter reads rows
        tile_start=bins.tile_start, tile_stop=bins.tile_stop,
        num_pairs=bins.num_pairs, overflow=overflow,
        n_shrunk=bins.n_shrunk, demand=bins.demand,
    )


def render_tracking(
    cache: PairCache, pose_quat, pose_trans, cam_proj: Camera,
    opts: RenderOptions, tile_ids: jnp.ndarray | None = None,
    pair_hi: int | None = None,
    pre_w2c: jnp.ndarray | None = None,
):
    """Tracking-mode render: pair-cached map moved by the live pose.

    Gradient path matches Renderer_tracking (render/__init__.py:30-39):
    means through the live w2c; rotated quaternions detached; map
    parameters constants (the cache is already detached).

    ``pre_w2c``: optional fixed [4, 4] composed LEFT of the live pose —
    the effective camera becomes ``pre_w2c @ pose_matrix(quat, trans)``.
    Backend tracking optimizes the SUBMAP transform under a fixed
    frame-in-submap pose (Backend.py:81-99): frame_w2c rides here while
    (quat, trans) stays the live submap transform; the pose gradient
    flows through the composed means exactly like the frame case.

    ``tile_ids`` renders only that subset of image tiles (coarse
    tracking); the output is [len(tile_ids), OUT_C, P].

    ``pair_hi`` (static) slices the cache to its first ``pair_hi`` pair
    rows before any per-pair math — valid ONLY when the cache is
    phase-major (``bin_for_tracking(coarse_stride=s)``) and ``tile_ids``
    is the coarse phase-0 tile set, whose pairs occupy exactly that head
    block. The per-iteration pose move + preprocess + pose-gradient
    reduction then run on O(r_max/s^2) rows. Under phase-0 overflow any
    tile whose pair range extends past the slice renders EMPTY (the
    loss's alpha/depth masks then exclude it), so an overflowed frame
    degrades to fewer coarse tiles instead of corrupted ones — the same
    behavior as the coarse-mapping path's tile_valid masking. The
    cache's overflow diagnostic has already reported, and escalation
    re-bins with a bigger budget.
    """
    from ..ops.se3 import pose_matrix, quat_normalize

    if pair_hi is not None and pair_hi < cache.raw_t.shape[1]:
        start_c = jnp.minimum(cache.tile_start, pair_hi)
        # a tile clipped by the slice would composite a truncated pair
        # list and feed biased pose gradients for the whole frame until
        # escalation re-bins — mask it empty instead
        stop_c = jnp.where(cache.tile_stop <= pair_hi,
                           cache.tile_stop, start_c)
        cache = cache._replace(
            raw_t=cache.raw_t[:, :pair_hi],
            tile_start=start_c,
            tile_stop=stop_c,
        )
    w2c = pose_matrix(pose_quat, pose_trans)
    q = quat_normalize(pose_quat)
    if pre_w2c is not None:
        from ..ops.se3 import rotmat_to_quat

        w2c = pre_w2c @ w2c
        # full rotation for the (detached) quat rotation: q_pre ∘ q
        q = quat_multiply(rotmat_to_quat(pre_w2c[:3, :3])[None, :],
                          q[None, :])[0]
    cam_eye = cam_proj.replace_w2c(jnp.eye(4, dtype=jnp.float32))
    if opts.method == "3dgs":
        xyz_cam = cache.xyz_t.T @ w2c[:3, :3].T + w2c[:3, 3]
        quats_cam = lax.stop_gradient(
            quat_multiply(q[None, :], cache.quats_t.T))
        pre = _preprocess(xyz_cam, cache.scales_t.T, quats_cam, cache.opac,
                          cam_eye, opts)
        pattrs = pack_pair_attrs(pre, cache.rgb_t.T)
    else:
        # lane-major hot path: pose move is a [3,3] @ [3,R] matmul, the
        # per-pair preprocess runs on full-lane [R] rows (preprocess_t)
        xyz_cam_t = w2c[:3, :3] @ cache.xyz_t + w2c[:3, 3][:, None]
        quats_cam_t = lax.stop_gradient(
            quat_multiply_rows(q, cache.quats_t))
        pattrs, _ = preprocess_t(xyz_cam_t, cache.scales_t, quats_cam_t,
                                 cache.opac, cache.rgb_t, cam_eye)
    if tile_ids is None:
        start, stop = cache.tile_start, cache.tile_stop
    else:
        start, stop = cache.tile_start[tile_ids], cache.tile_stop[tile_ids]
    out = render_pairs(
        pattrs, start, stop, tile_ids,
        opts.settings(need_normal=opts.normals_in_tracking),
    )
    return _method_mask(out, opts)
