"""Shared chunk-parallel alpha-compositing math for the 2DGS rasterizer.

This module is the single source of truth for the per-(pixel, gaussian)
compositing semantics. It is pure jnp and is used by:

  * ``composite_ref.py``  — reference renderer for tests (loops tiles in
    python, calls ``composite_chunk`` on [G, P] blocks),
  * ``pallas_forward.py`` — the TPU forward kernel (same function on
    VMEM-resident blocks),
  * ``pallas_backward.py``— the TPU backward kernel (``jax.vjp`` of
    ``composite_chunk`` traced inside the kernel).

Semantics follow the reference CUDA compositor
(/root/reference/submodules/gaus_2dgs_rasterization/cuda_rasterizer/
forward.cu:260-467, backward.cu:145-463) with one documented deviation:

  Surface-aware (use_sa) depth fusion in the reference accumulates the
  *fused* depth into its running statistics (D, D2); our chunk-parallel
  form uses per-pair prefix sums of w * d_raw instead — raw-vs-fused
  feedback into the variance estimate is a second-order effect bounded
  in tests (<= 5e-2 on depth in an adversarial translucent-cloud scene,
  exact on all other channels). The fusion weight conf is detached and
  the median target is resolved in closed form per chunk (transmittance
  is monotone, so every pair with T <= 0.5 sees the same — final —
  median). The reference's own backward treats the fusion weights as
  detached constants from *final* statistics, so our forward/backward
  pair is mutually consistent in a way the reference is not.

Orientation: work arrays are [G, P] — gaussians on sublanes, pixels on
lanes. Per-pixel state rows are [1, P]. Cumulative products along the
gaussian axis are computed in log space with a triangular-matrix matmul
so they run on the MXU.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .camera import ALPHA_MIN, ALPHA_MAX, FAR_N, FILTER_INV_SQUARE, NEAR_N, T_EPS

# Number of scalar attributes per pair (see preprocess.PAIR_FIELDS).
ATTR_C = 24
# Output channel layout of the tile-major render buffer.
OUT_FIELDS = (
    "r g b depth alpha nx ny nz middepth dist "
    "final_t m1 m2 n_contrib med_contrib done"
).split()
OUT_C = len(OUT_FIELDS)  # 16


class PixelState(NamedTuple):
    """Per-pixel compositing state; every field is [1, P] float32."""

    T: jnp.ndarray        # transmittance
    done: jnp.ndarray     # sticky early-termination flag (0/1)
    r: jnp.ndarray
    g: jnp.ndarray
    b: jnp.ndarray
    nx: jnp.ndarray
    ny: jnp.ndarray
    nz: jnp.ndarray
    D: jnp.ndarray        # sum w * fused depth
    D2: jnp.ndarray       # sum w * fused depth^2
    M1: jnp.ndarray       # sum w * m          (non-sa distortion)
    M2: jnp.ndarray       # sum w * m^2
    dist: jnp.ndarray     # accumulated distortion (non-sa)
    mm: jnp.ndarray       # median depth (raw depth at last T>0.5 crossing)
    n_contrib: jnp.ndarray    # 1-based index of last accepted contributor
    med_contrib: jnp.ndarray  # 1-based index of the median contributor


def init_state(P: int, dtype=jnp.float32) -> PixelState:
    z = jnp.zeros((1, P), dtype)
    return PixelState(
        T=jnp.ones((1, P), dtype), done=z, r=z, g=z, b=z,
        nx=z, ny=z, nz=z, D=z, D2=z, M1=z, M2=z, dist=z, mm=z,
        n_contrib=z, med_contrib=z,
    )


def _tri_cumsum(x: jnp.ndarray, inclusive: bool) -> jnp.ndarray:
    """Cumulative sum along axis 0 of [G, P] via triangular matmul (MXU)."""
    G = x.shape[0]
    i = lax.broadcasted_iota(jnp.int32, (G, G), 0)
    j = lax.broadcasted_iota(jnp.int32, (G, G), 1)
    tri = (i <= j if inclusive else i < j).astype(x.dtype)  # [G, G], sums j<=i rows
    # out[i, p] = sum_j tri[j, i] * x[j, p]
    return lax.dot_general(
        tri, x, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def composite_chunk(
    state: PixelState,
    attrs: jnp.ndarray,     # [G, ATTR_C] per-pair attributes (transposed slab)
    px: jnp.ndarray,        # [1, P] pixel x coords (float)
    py: jnp.ndarray,        # [1, P] pixel y coords (float)
    idx_base: jnp.ndarray,  # scalar int32: global 1-based index of attrs[0]
    pair_valid: jnp.ndarray,  # [G, 1] mask: pair belongs to this tile's range
    *,
    use_sa: bool,
    need_normal: bool = True,
    dtype=jnp.float32,
) -> PixelState:
    """Composite one chunk of G depth-sorted pairs into the pixel state.

    ``dtype``: compute dtype for the per-pair [G, P] elementwise chain
    (the VPU-bound bulk of the kernel). f32 is the shipped default;
    bfloat16 runs the geometry/alpha math in half precision with the
    MXU accumulations and the PixelState kept in f32 (the [G, P] sums
    upcast their operands). MEASURED DEAD END, kept as the record: the
    v5e VPU runs bf16 elementwise at ~1.05x f32 (tools/bf16_probe.py),
    the distortion statistic loses O(1) accuracy to cancellation, and
    v5e Mosaic cannot lower bf16 comparisons at all ("Target does not
    support this comparison") — so the bf16 path runs only under
    interpret mode (tests). See PERF.md "precision lever"."""
    f32 = jnp.float32
    cd = dtype
    G = attrs.shape[0]
    if cd != f32:
        attrs = attrs.astype(cd)
        px = px.astype(cd)
        py = py.astype(cd)

    def col(i):
        return attrs[:, i : i + 1]  # [G, 1]

    a0x, a0y, a0z = col(0), col(1), col(2)
    a1x, a1y, a1z = col(3), col(4), col(5)
    a2x, a2y, a2z = col(6), col(7), col(8)
    twx, twy, twz = col(9), col(10), col(11)
    cx, cy = col(12), col(13)
    nx, ny, nz = col(14), col(15), col(16)
    op = col(17)
    cr, cg, cb = col(18), col(19), col(20)

    # ray-splat intersection: p = x*a0 + y*a1 + a2 (forward.cu:360-364)
    p_x = px * a0x + py * a1x + a2x           # [G, P]
    p_y = px * a0y + py * a1y + a2y
    p_z = px * a0z + py * a1z + a2z
    if cd == f32:
        pz_ok = p_z != 0.0
        pzf = lax.stop_gradient(pz_ok.astype(f32))
        inv_pz = jnp.where(pz_ok, 1.0, 0.0) / jnp.where(pz_ok, p_z, 1.0)
        sx = p_x * inv_pz
        sy = p_y * inv_pz
    else:
        # bf16: Mosaic cannot lower i1 selects with broadcast operands
        # (invalid relayout), so predicates become exact {0, 1} float
        # factors; sx/sy are clamped so the dead branch of the blended
        # d_raw below stays finite (the clamp cannot touch any pair
        # that passes the ALPHA_MIN test — those have rho <= ~11)
        pzf = (p_z != 0.0).astype(cd)
        inv_pz = pzf / (p_z + (1.0 - pzf))
        sx = jnp.clip(p_x * inv_pz, -1e4, 1e4)
        sy = jnp.clip(p_y * inv_pz, -1e4, 1e4)
    rho3d = sx * sx + sy * sy
    dx = cx - px
    dy = cy - py
    rho2d = FILTER_INV_SQUARE * (dx * dx + dy * dy)
    rho = jnp.minimum(rho3d, rho2d)
    d3 = sx * twx + sy * twy + twz
    if cd == f32:
        d_raw = jnp.where(rho3d <= rho2d, d3, twz)
    else:
        u3f = (rho3d <= rho2d).astype(cd)
        d_raw = u3f * d3 + (1.0 - u3f) * twz

    gauss = jnp.exp(-0.5 * rho)
    alpha_raw = op * gauss
    # min(alpha, 0.99) with pass-through gradient (matches CUDA backward,
    # which never gates the clamp)
    alpha_clamped = alpha_raw - lax.stop_gradient(
        jnp.maximum(alpha_raw - ALPHA_MAX, 0.0)
    )
    # mask algebra as FLOAT products of exact {0, 1} values rather than
    # boolean broadcasts: bit-identical in f32 (all factors exact), and
    # the only form Mosaic can lower for bf16 — broadcasting a [G, 1]
    # i1 mask against [G, P] bf16 vectors hits an "invalid relayout"
    # (replicated destination) on this toolchain.
    okf = lax.stop_gradient(
        pzf.astype(cd)
        * (d_raw >= NEAR_N).astype(cd)
        * (alpha_raw >= ALPHA_MIN).astype(cd)
        * pair_valid.astype(cd)
        * (state.done < 0.5).astype(f32).astype(cd)
    )
    alpha_eff = alpha_clamped * okf                       # [G, P]

    # Early termination: the pixel stops *before* compositing the first
    # contributing pair i whose inclusive product T_in * prod_{j<=i}(1-a_j)
    # drops below T_EPS (forward.cu:388-393). Because that product is
    # monotone non-increasing in i, a contributing pair is excluded iff
    # its own inclusive product is below the cutoff — so one cumulative
    # sum (a single triangular matmul on the MXU) suffices for both the
    # transmittance prefix and the termination mask.
    log1ma = jnp.log1p(-alpha_eff)
    cum_in = _tri_cumsum(log1ma, inclusive=True)          # [G, P] f32
    T_in = state.T                                        # [1, P] f32
    # exclusive prefix: all j < i are pre-termination, where eff == accepted
    cum_exc = cum_in - log1ma
    if cd != f32:
        # keep the heavy exp + downstream weights in the compute dtype;
        # the carried transmittance state stays f32
        T_pref = T_in.astype(cd) * jnp.exp(cum_exc.astype(cd))
    else:
        T_pref = T_in * jnp.exp(cum_exc)                  # T before pair i
    # inclusive product = T_pref * (1 - alpha_eff): one exp serves both the
    # prefix transmittance and the termination test (exp is the costliest
    # [G, P] op in the chunk)
    belowf = lax.stop_gradient(
        (lax.stop_gradient(T_pref * (1.0 - alpha_eff)) < T_EPS).astype(cd))
    triggerf = okf * belowf                               # {0, 1} exact
    af = okf * (1.0 - belowf)                             # accepted mask
    alpha_c = alpha_clamped * af
    w = alpha_c * T_pref                                  # [G, P]
    T_out = T_in * jnp.exp(jnp.sum((log1ma * af).astype(f32),
                                   axis=0, keepdims=True))

    # global 1-based contributor indices (CUDA counts every pair in range)
    gidx = (
        lax.broadcasted_iota(jnp.int32, (G, 1), 0).astype(f32)
        + idx_base.astype(f32)
    )  # [G, 1]

    # median tracking: mm = raw depth of last accepted pair with T_pref > 0.5
    mcf = lax.stop_gradient(
        af.astype(f32) * (T_pref > 0.5).astype(cd).astype(f32))
    med_idx = jnp.max(gidx * mcf, axis=0, keepdims=True)  # [1, P]; 0 if none
    has_med = med_idx > 0.0
    mm_new = jnp.sum(d_raw * (gidx == med_idx).astype(f32) * mcf,
                     axis=0, keepdims=True)
    mm_out = jnp.where(has_med, mm_new, state.mm)
    med_contrib_out = jnp.maximum(state.med_contrib, med_idx)
    n_contrib_out = jnp.maximum(
        state.n_contrib, jnp.max(gidx * af, axis=0, keepdims=True)
    )

    if use_sa:
        # Surface-aware depth fusion at per-pair granularity.
        #
        # Exactness argument: T is monotone non-increasing, so within any
        # chunk the pairs split into a prefix with T_pref > 0.5 — where
        # the reference forces conf = 1 (its running median equals the
        # current depth there) — and a suffix with T_pref <= 0.5, for
        # which the reference's running median is ONE fixed value: the
        # depth at the last T > 0.5 crossing, i.e. this chunk's final
        # median mm_out. The running (D, D2) statistics are replaced by
        # per-pair prefix sums of w * d_raw (the reference accumulates
        # the *fused* depth; raw-vs-fused feedback into the variance
        # estimate is a second-order effect, quantified in tests).
        # conf is detached, exactly like the reference backward
        # (backward.cu:346-351).
        wsg = lax.stop_gradient(w)
        dsg = lax.stop_gradient(d_raw)
        wd = wsg * dsg
        pref = _tri_cumsum(
            jnp.concatenate([wd, wd * dsg], axis=1), inclusive=False
        )  # [G, 2P]
        P = d_raw.shape[1]
        d_pref = lax.stop_gradient(state.D) + pref[:, :P]
        d2_pref = lax.stop_gradient(state.D2) + pref[:, P:]
        mm_tgt = lax.stop_gradient(mm_out)                # [1, P]
        t_sg = lax.stop_gradient(T_pref)
        denom = jnp.maximum(1.0 - t_sg, 1e-12)
        exp_std = (d2_pref - 2.0 * d_pref * mm_tgt) / denom + mm_tgt * mm_tgt
        exp_std = jnp.maximum(exp_std, 1e-7)
        err = (mm_tgt - dsg) ** 2
        conf = jnp.exp(-err / (4.0 * exp_std))
        # forced-1.0 branch: f32 keeps the true select (a where never
        # propagates a NaN from the dead conf branch — exp_std can go
        # inf-inf if the detached depth statistics ever blow up); the
        # select-free float blend exists only because bf16 Mosaic cannot
        # lower broadcast i1 selects (see predicate note above)
        if cd == f32:
            conf = jnp.where((t_sg > 0.5) | (d_pref <= 0.0), 1.0, conf)
        else:
            one_f = lax.stop_gradient(jnp.maximum(
                (t_sg.astype(f32) > 0.5).astype(f32),
                (d_pref <= 0.0).astype(f32)))
            conf = one_f + (1.0 - one_f) * conf
        conf = lax.stop_gradient(conf)                    # detached weights
        d_fused = conf * d_raw + (1.0 - conf) * mm_tgt
        dist_add = jnp.zeros_like(state.dist)
        m1_add = jnp.zeros_like(state.M1)
        m2_add = jnp.zeros_like(state.M2)
    else:
        d_fused = d_raw
        m = FAR_N / (FAR_N - NEAR_N) * (1.0 - NEAR_N / jnp.maximum(d_raw, 1e-6))
        mw = m * w
        m2w = m * mw
        # running prefixes of M1/M2 (value *before* pair i)
        m1_pref = state.M1 + _tri_cumsum(mw, inclusive=False)
        m2_pref = state.M2 + _tri_cumsum(m2w, inclusive=False)
        A_pref = 1.0 - T_pref
        dist_add = jnp.sum(
            ((m * m * A_pref + m2_pref - 2.0 * m * m1_pref) * w
             ).astype(f32),
            axis=0, keepdims=True,
        )
        m1_add = jnp.sum(mw.astype(f32), axis=0, keepdims=True)
        m2_add = jnp.sum(m2w.astype(f32), axis=0, keepdims=True)

    def acc(feat):  # [G, P] -> [1, P]; accumulate in f32
        return jnp.sum((feat * w).astype(f32), axis=0, keepdims=True)

    # per-gaussian features (color, normal) accumulate via one MXU matmul:
    # out[f, p] = sum_g feat[g, f] * w[g, p]. The normal channels are
    # gated: tracking mode never consumes them (slam/Loss.py uses normals
    # only under use_normal_loss), and gating also removes their
    # transposed ops from the in-kernel vjp.
    feat = attrs[:, 18:21]  # r g b
    if need_normal:
        feat = jnp.concatenate([feat, attrs[:, 14:17]], axis=1)
    facc = lax.dot_general(
        feat, w,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [3 or 6, P]
    zrow = jnp.zeros_like(facc[0:1])

    done_out = jnp.maximum(
        state.done,
        jnp.max(lax.stop_gradient(triggerf.astype(f32)),
                axis=0, keepdims=True),
    )

    return PixelState(
        T=T_out, done=done_out,
        r=state.r + facc[0:1], g=state.g + facc[1:2], b=state.b + facc[2:3],
        nx=state.nx + facc[3:4] if need_normal else zrow,
        ny=state.ny + facc[4:5] if need_normal else zrow,
        nz=state.nz + facc[5:6] if need_normal else zrow,
        D=state.D + acc(d_fused), D2=state.D2 + acc(d_fused * d_fused),
        M1=state.M1 + m1_add, M2=state.M2 + m2_add,
        dist=state.dist + dist_add,
        mm=mm_out, n_contrib=n_contrib_out, med_contrib=med_contrib_out,
    )


def finalize(state: PixelState, bg: jnp.ndarray, *, use_sa: bool) -> jnp.ndarray:
    """Pixel state -> [OUT_C, P] output block (forward.cu:441-465).

    The median is detached inside the sa distortion output: the reference
    backward routes dL_dreg only through the compositing weights and the
    fused depths (backward.cu:367-378), never into the median depth — the
    middepth output itself keeps the live median (backward.cu:358).
    """
    T = state.T
    mm = state.mm
    mm_sg = lax.stop_gradient(mm)
    geo_std = state.D2 - 2.0 * mm_sg * state.D + mm_sg * mm_sg * (1.0 - T)
    dist = geo_std if use_sa else state.dist
    rows = [
        state.r + T * bg[0], state.g + T * bg[1], state.b + T * bg[2],
        state.D, 1.0 - T,
        state.nx, state.ny, state.nz,
        mm, dist,
        T, state.M1, state.M2,
        state.n_contrib, state.med_contrib, state.done,
    ]
    return jnp.concatenate(rows, axis=0)


def grads_wanted() -> tuple[int, ...]:
    """Output channels that receive loss cotangents (see raster.py)."""
    # r g b depth alpha nx ny nz middepth dist
    return tuple(range(10))
