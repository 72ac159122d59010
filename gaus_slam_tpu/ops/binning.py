"""Tile binning: expand gaussians into depth-sorted per-tile pair lists.

TPU-native replacement for the CUDA duplicateWithKeys / radix-sort /
identifyTileRanges pipeline (reference rasterizer_impl.cu:70-138,201-350).
Instead of dynamically-resized buffers we use a static pair budget
``r_max`` (bucketed by the caller) and report overflow.

Sort key: int32 = tile_id << depth_bits | quantized_depth. Depth is
quantized by taking the top bits of the positive-float bit pattern
(monotone for positive floats), so ordering matches a raw float sort up
to ties; the sort is stable so ties keep insertion order.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np
from jax import lax

from .camera import Camera
from .preprocess import PreprocResult

# The banded gather kernel (ops/gather.py) keeps the whole [N] position
# array resident in VMEM (4*N bytes; a per-step block would violate TPU
# block-divisibility) — beyond ~3M rows it exceeds the 16 MB VMEM
# budget, so huge maps fall back to the XLA row gather.
GATHER_N_MAX = 3_000_000


class TileGrid(NamedTuple):
    tiles_x: int
    tiles_y: int
    block_w: int
    block_h: int

    @property
    def num_tiles(self) -> int:
        return self.tiles_x * self.tiles_y

    @property
    def pixels_per_tile(self) -> int:
        return self.block_w * self.block_h


def make_grid(cam: Camera, block_h: int = 16, block_w: int = 16) -> TileGrid:
    return TileGrid(
        tiles_x=-(-cam.width // block_w),
        tiles_y=-(-cam.height // block_h),
        block_w=block_w,
        block_h=block_h,
    )


class Binning(NamedTuple):
    pair_gauss: jnp.ndarray  # [r_max] int32 gaussian index per sorted pair
    pair_slab: jnp.ndarray   # [r_max] int32 flat slab slot (d * N + g)
    slab_tail: jnp.ndarray   # [d_max*N - r_max] slab slots sliced off by the
                             # budget (pair_slab ++ slab_tail is a permutation)
    pair_ok: jnp.ndarray     # [r_max] bool: pair is real (not budget padding)
    tile_start: jnp.ndarray  # [num_tiles] int32 into the sorted pair array
    tile_stop: jnp.ndarray   # [num_tiles] int32
    num_tiles_touched: int   # static: d_max used for the slab expansion
    num_pairs: jnp.ndarray   # scalar int32 (clipped to r_max)
    overflow: jnp.ndarray    # scalar bool: pair budget exceeded (tail dropped)
    demand: jnp.ndarray      # scalar int32: TRUE pair demand (unclipped) —
                             # overflow escalation sizes the new budget
                             # from this instead of blind 1.5x steps
    n_shrunk: jnp.ndarray    # scalar int32: gaussians whose rect exceeded
                             # d_max and had their radius shrunk to fit
    counts: jnp.ndarray      # [N] int32 pairs emitted per gaussian
                             # (post-shrink, pre-budget-truncation)
    # Precomputed gradient-reduction sort (``reduce_perm=True`` binnings
    # only; empty otherwise). The sort keys depend only on the binning,
    # so mapping paths that reduce every iteration against one binning
    # amortize the [R] sort to once per rebin. Defaults are NUMPY zeros:
    # NamedTuple defaults evaluate at class definition, and a jnp default
    # would initialize the (single-tenant) device client at import time.
    red_keys: jnp.ndarray = np.zeros((0,), np.int32)   # [R] sorted keys
    red_perm: jnp.ndarray = np.zeros((0,), np.int32)   # [R] sort perm
    # Phase-major extras (``phase_stride`` > 0 binnings only). The pair
    # array is globally ordered by (checkerboard phase, tile, depth), so
    # each coarse-mapping phase's pairs are one contiguous block —
    # per-phase expansion/reduction become dynamic slices instead of
    # full-R work. With phase_stride set, red_keys/red_perm sort by
    # (phase, gaussian): the plain dense ``_run_reduce`` MUST NOT be
    # used (a gaussian's pairs are then segmented per phase).
    phase_start: jnp.ndarray = np.zeros((0,), np.int32)  # [s^2+1] bounds
    slab_phase: jnp.ndarray = np.zeros((0,), np.int32)   # [d_max, N] phase
                                                         # (s^2 = dead slot)

    def slab_scatter_grads(self, pair_grads: jnp.ndarray, n: int,
                           d_max: int | None = None,
                           backend: str | None = None) -> jnp.ndarray:
        """Reduce per-pair gradients [R, C] -> per-gaussian [N, C].

        XLA scatter/segment-sum serialize per row on TPU (~120ns/row),
        and multi-operand payload sorts hang the TPU runtime, so both
        are off the table. Two sort+gather strategies remain:

          * fast path (no budget truncation): sort pairs by gaussian id
            ([R] keys), suffix-sum each run with d_max-1 shifted masked
            adds (runs are contiguous and <= d_max long), and land run
            totals with ONE [N]-row gather at cumsum(counts)-1 — exact
            because without truncation gaussian g's pairs occupy rows
            [cumsum(counts)[g-1], cumsum(counts)[g]) of the sorted order.
          * slab path (budget overflow): pair_slab ++ slab_tail is a
            permutation of [0, d_max*n), so sorting gradient rows by
            slab slot lands every gradient at its (d, g) position and a
            dense tree-sum over d finishes. ~4x more gathered rows, but
            immune to dropped pairs.

        lax.cond executes only the taken branch at runtime.

        ``backend`` ("pallas"/"interpret") routes the fast path's
        run-total landing gather through the banded monotone-gather
        kernel (ops/gather.py); None keeps plain XLA gathers.
        """
        d_max = d_max if d_max is not None else self.num_tiles_touched
        return lax.cond(
            self.overflow,
            lambda g: self._slab_reduce(g, n, d_max),
            lambda g: self._run_reduce(g, n, d_max, backend),
            pair_grads,
        )

    def phase_reduce(self, d_pairs_sub: jnp.ndarray, phase, n: int,
                     d_max: int, backend: str | None = None) -> jnp.ndarray:
        """Per-gaussian reduce of ONE coarse phase's compact pair grads.

        ``d_pairs_sub`` is [r_phase, C]: gradients for the pairs in this
        phase's contiguous block (phase-major binning), locally indexed
        from ``phase_start[phase]``. Requires ``phase_stride`` binning
        (red_keys sorted by (phase, gaussian)). Work is O(r_phase) =
        O(r_max / s^2) instead of the dense path's O(r_max); the landing
        gather stays [n] rows. Exact when no pair was truncated (global
        overflow) and the phase block fits r_phase; both conditions zero
        the output here and are reported by the caller's diagnostics, so
        the escalation ladder re-sizes exactly like the dense path.
        """
        r_phase, c = d_pairs_sub.shape
        sentinel = jnp.int32(0x7FFFFFFF)
        p0 = self.phase_start[phase]
        p1 = self.phase_start[phase + 1]
        # d_pairs_sub is indexed from the 128-ALIGNED floor of p0 (the
        # kernel slice preserves chunk alignment — see _phase_rows)
        p0_al = (p0 // 128) * 128
        # pad so the dynamic slice never clamps (last phase + slack)
        keys_pad = jnp.concatenate(
            [self.red_keys, jnp.full((r_phase,), sentinel)])
        perm_pad = jnp.concatenate(
            [self.red_perm, jnp.zeros((r_phase,), jnp.int32)])
        keys_blk = lax.dynamic_slice(keys_pad, (p0,), (r_phase,))
        perm_blk = lax.dynamic_slice(perm_pad, (p0,), (r_phase,))
        valid = (jnp.arange(r_phase, dtype=jnp.int32) < (p1 - p0))
        loc = jnp.clip(perm_blk - p0_al, 0, r_phase - 1)
        grads_sorted = jnp.where(valid[:, None], d_pairs_sub[loc], 0.0)
        keys_blk = jnp.where(valid, keys_blk, sentinel)
        # segmented inclusive scan, runs <= d_max (see _run_reduce)
        acc = grads_sorted
        s = 1
        while s < d_max:
            shifted = jnp.pad(acc, ((s, 0), (0, 0)))[:r_phase]
            kshift = jnp.pad(keys_blk, (s, 0), constant_values=-1)[:r_phase]
            acc = acc + jnp.where(
                (kshift == keys_blk)[:, None], shifted, 0.0
            )
            s *= 2
        # per-(phase, gaussian) pair counts from the pre-sort slab grid
        counts_p = jnp.sum(self.slab_phase == phase, axis=0)  # [N]
        pos = jnp.clip(jnp.cumsum(counts_p) - 1, 0,
                       r_phase - 1).astype(jnp.int32)
        if backend in ("pallas", "interpret") and n % 128 == 0 \
                and c % 8 == 0 and n <= GATHER_N_MAX:
            from .gather import monotone_row_gather

            acc_t, pos_b = lax.optimization_barrier((acc.T, pos))
            out = monotone_row_gather(
                acc_t, pos_b, max_step=d_max,
                interpret=(backend == "interpret"),
            ).T
        else:
            out = acc[pos]
        exact = jnp.logical_not(self.overflow) & ((p1 - p0_al) <= r_phase)
        keep = (counts_p > 0)[:, None] & exact
        return jnp.where(keep, out, 0.0)

    def _slab_reduce(self, pair_grads: jnp.ndarray, n: int,
                     d_max: int) -> jnp.ndarray:
        r, c = pair_grads.shape
        total = d_max * n
        keys = jnp.concatenate([self.pair_slab, self.slab_tail])
        pad = keys.shape[0] - r
        _, perm = lax.sort((keys, jnp.arange(keys.shape[0], dtype=jnp.int32)),
                           num_keys=1)
        grads_p = jnp.pad(
            jnp.where(self.pair_ok[:, None], pair_grads, 0.0),
            ((0, pad), (0, 0)),
        )
        slab = grads_p[perm[:total]]
        return slab.reshape(d_max, n, c).sum(axis=0)

    def _run_reduce(self, pair_grads: jnp.ndarray, n: int,
                    d_max: int, backend: str | None = None) -> jnp.ndarray:
        r, _ = pair_grads.shape
        if self.red_perm.shape[0]:          # precomputed at bin time
            keys_sorted, perm = self.red_keys, self.red_perm
        else:
            keys = jnp.where(self.pair_ok, self.pair_gauss, n)  # dead -> tail
            keys_sorted, perm = lax.sort(
                (keys, jnp.arange(r, dtype=jnp.int32)), num_keys=1
            )
        grads_sorted = jnp.where(self.pair_ok[:, None], pair_grads, 0.0)[perm]
        # segmented inclusive scan (Hillis-Steele doubling): each run's
        # LAST row ends with the run total in ceil(log2(d_max)) passes.
        # key[i-s] == key[i] implies rows (i-s, i] share the run (sorted),
        # so adding acc[i-s] extends row i's partial sum by s more rows.
        acc = grads_sorted
        s = 1
        while s < d_max:
            shifted = jnp.pad(acc, ((s, 0), (0, 0)))[:r]
            kshift = jnp.pad(keys_sorted, (s, 0), constant_values=-1)[:r]
            acc = acc + jnp.where(
                (kshift == keys_sorted)[:, None], shifted, 0.0
            )
            s *= 2
        pos = jnp.clip(jnp.cumsum(self.counts) - 1, 0, r - 1).astype(jnp.int32)
        c = acc.shape[1]
        if backend in ("pallas", "interpret") and n % 128 == 0 \
                and c % 8 == 0 and n <= GATHER_N_MAX:
            from .gather import monotone_row_gather

            # the barrier forces the transpose to materialize with the
            # canonical layout before entering the pallas call — fused
            # into a larger program, XLA may otherwise hand the kernel a
            # transposed-layout operand it silently misreads
            acc_t, pos_b = lax.optimization_barrier((acc.T, pos))
            out = monotone_row_gather(
                acc_t, pos_b, max_step=d_max,
                interpret=(backend == "interpret"),
            ).T
        else:
            out = acc[pos]
        return jnp.where((self.counts > 0)[:, None], out, 0.0)


def gaussian_rects(pre: PreprocResult, grid: TileGrid):
    """Per-gaussian tile rectangle, replicating CUDA getRect int truncation."""
    bw, bh = float(grid.block_w), float(grid.block_h)
    cx, cy = pre.center[:, 0], pre.center[:, 1]
    r = pre.radius
    # (int) cast of float division truncates toward zero; combined with the
    # clamp to [0, grid] this matches auxiliary.h getRect exactly.
    x0 = jnp.clip(jnp.trunc((cx - r) / bw), 0, grid.tiles_x).astype(jnp.int32)
    y0 = jnp.clip(jnp.trunc((cy - r) / bh), 0, grid.tiles_y).astype(jnp.int32)
    x1 = jnp.clip(
        jnp.trunc((cx + r + bw - 1) / bw), 0, grid.tiles_x
    ).astype(jnp.int32)
    y1 = jnp.clip(
        jnp.trunc((cy + r + bh - 1) / bh), 0, grid.tiles_y
    ).astype(jnp.int32)
    w = jnp.maximum(x1 - x0, 0)
    h = jnp.maximum(y1 - y0, 0)
    counts = jnp.where(pre.valid, w * h, 0)
    return x0, y0, w, counts


def phase_positions(stride: int, nested: bool) -> np.ndarray:
    """pos_of_phase [s^2]: position of checkerboard phase (oy*s + ox) in
    the phase-major global order.

    Plain order (nested=False) is the identity (row-major phases).
    ``nested`` (even strides; one nesting level, i.e. strides 2 and 4)
    orders phases by ((oy%2, ox%2), (oy//2, ox//2)) so every
    power-of-2-coarser checkerboard is a PREFIX of the order:
    at stride 4, position 0 is the stride-4 phase (0,0) and positions
    0..3 are exactly the stride-2 checkerboard — which lets pyramid
    (multi-level) coarse tracking slice each level's pairs as a head
    block of one cache."""
    s = stride
    if not nested:
        return np.arange(s * s)
    assert s % 2 == 0 and s <= 4, "nested phase order needs stride 2 or 4"
    h = s // 2
    oy, ox = np.divmod(np.arange(s * s), s)
    return (((oy % 2) * 2 + (ox % 2)) * h * h
            + (oy // 2) * h + (ox // 2))


def phase_tables(grid: TileGrid, stride: int, nested: bool = False):
    """Static phase-major tile tables for a stride-s checkerboard.

    phase(tile) = (ty % s) * s + (tx % s); the phase-major RANK orders
    tiles by (phase position, row-major within phase) with positions
    from ``phase_positions``. Returns (rank_of_tile [T] np.int32,
    base [s^2+1] np.int64 cumulative tile counts per POSITION,
    pos_of_phase [s^2]) — all static numpy (they depend only on the
    grid shape and stride, never on data)."""
    s = stride
    ty, tx = np.divmod(np.arange(grid.tiles_y * grid.tiles_x),
                       grid.tiles_x)
    oy, ox = ty % s, tx % s
    phase = oy * s + ox
    ny = -(-(grid.tiles_y - np.arange(s)) // s)   # tiles with ty%s == oy
    nx = -(-(grid.tiles_x - np.arange(s)) // s)
    sizes = (ny[:, None] * nx[None, :]).reshape(-1)  # by phase id
    pos = phase_positions(s, nested)
    sizes_by_pos = np.zeros_like(sizes)
    sizes_by_pos[pos] = sizes
    base = np.concatenate([[0], np.cumsum(sizes_by_pos)])
    rank = base[pos[phase]] + (ty // s) * nx[ox] + tx // s
    return rank.astype(np.int32), base.astype(np.int64), pos


def _phase_rank_expr(tile, grid: TileGrid, stride: int, base: np.ndarray,
                     pos: np.ndarray):
    """Elementwise tile-id -> (phase-major rank, phase POSITION). Pure
    VPU int arithmetic + an s^2-way select chain for the static base
    table — no gathers (a [D, N]-element gather from a table would cost
    more than the whole binning)."""
    s = stride
    ty = tile // grid.tiles_x
    tx = tile - ty * grid.tiles_x
    oy, ox = ty % s, tx % s
    phase = oy * s + ox
    nx = [-(-(grid.tiles_x - o) // s) for o in range(s)]
    nx_ox = jnp.zeros_like(tile)
    b = jnp.zeros_like(tile)
    pv = jnp.zeros_like(tile)
    for o in range(s):
        nx_ox = jnp.where(ox == o, np.int32(nx[o]), nx_ox)
    for p in range(s * s):
        b = jnp.where(phase == p, np.int32(base[pos[p]]), b)
        pv = jnp.where(phase == p, np.int32(pos[p]), pv)
    rank = b + (ty // s) * nx_ox + tx // s
    return rank, pv


def bin_gaussians(
    pre: PreprocResult,
    grid: TileGrid,
    r_max: int | None = None,
    max_tiles_per_gaussian: int = 16,
    reduce_perm: bool = False,
    phase_stride: int = 0,
    phase_nested: bool = False,
) -> Binning:
    """Gather-free slab expansion.

    Rather than a variable-length expansion (which needs repeat + gathers
    — ~12ns/element on TPU), every gaussian emits exactly D_MAX candidate
    pairs computed elementwise on a [D_MAX, N] grid; unused slots get a
    sentinel key and sort to the tail. One stable sort produces the
    depth-ordered per-tile lists.

    Deviation from CUDA (which has no cap): a gaussian covering more than
    ``max_tiles_per_gaussian`` tiles has its radius shrunk (symmetrically)
    until its rect fits. At 16px tiles and the default cap of 16 this only
    affects splats with radius over ~24-32px, which the SLAM maps never
    produce (surfel scale is z/f ~ 1px); quantified in tests.
    """
    n = pre.depth.shape[0]
    num_tiles = grid.num_tiles
    d_max = max_tiles_per_gaussian
    if r_max is None:
        r_max = -(-(d_max * n) // 128) * 128
    # must be able to represent num_tiles << depth_bits (the searchsorted
    # sentinel for the last tile's stop bound) within a positive int32
    tile_bits = max(int(num_tiles).bit_length(), 1)
    depth_bits = 31 - tile_bits
    assert depth_bits >= 12, f"tile grid too large: {num_tiles} tiles"

    x0, y0, w, counts = gaussian_rects(pre, grid)
    n_shrunk = jnp.sum(counts > d_max).astype(jnp.int32)
    # symmetric radius shrink until the rect fits the slab budget
    shrink = jnp.sqrt(d_max / jnp.maximum(counts, 1).astype(jnp.float32))
    radius_fit = jnp.where(counts > d_max, pre.radius * shrink * 0.999, pre.radius)
    pre_fit = pre._replace(radius=radius_fit)
    x0, y0, w, counts = gaussian_rects(pre_fit, grid)
    counts = jnp.minimum(counts, d_max)

    d = jnp.arange(d_max, dtype=jnp.int32)[:, None]      # [D, 1]
    w_safe = jnp.maximum(w, 1)[None, :]                  # [1, N]
    tx = x0[None, :] + d % w_safe
    ty = y0[None, :] + d // w_safe
    tile = ty * grid.tiles_x + tx                        # [D, N]
    live = d < counts[None, :]

    if phase_stride > 0:
        # phase-major global order: sort by (checkerboard phase, tile,
        # depth) via a static tile->rank remap — same sort, different
        # key, so the phase-major layout is FREE at bin time. Per-tile
        # ranges stay contiguous; only their global placement moves.
        # ``phase_nested`` orders the phases so coarser power-of-2
        # checkerboards are prefixes (pyramid tracking; phase_positions).
        n_phase = phase_stride * phase_stride
        rank_np, base_np, pos_np = phase_tables(grid, phase_stride,
                                                nested=phase_nested)
        sort_tile, slab_ph = _phase_rank_expr(tile, grid, phase_stride,
                                              base_np, pos_np)
        slab_phase = jnp.where(live, slab_ph, n_phase).astype(jnp.int32)
    else:
        sort_tile = tile
        slab_phase = np.zeros((0,), np.int32)

    # monotone depth quantization from positive-float bit pattern
    dq = lax.bitcast_convert_type(
        jnp.maximum(pre.depth, 1e-12).astype(jnp.float32), jnp.int32
    )
    dq = lax.shift_right_logical(dq, 32 - depth_bits)

    key = lax.shift_left(sort_tile, depth_bits) | dq[None, :]
    key = jnp.where(live, key, jnp.int32(0x7FFFFFFF)).reshape(-1)
    flat = jnp.arange(d_max * n, dtype=jnp.int32)  # slab slot d * n + g

    key_sorted, pair_slab = lax.sort((key, flat), num_keys=1)
    if key_sorted.shape[0] >= r_max:
        slab_tail = pair_slab[r_max:]
        key_sorted, pair_slab = key_sorted[:r_max], pair_slab[:r_max]
    else:
        # pad pair_slab with the would-be-missing slots so that
        # pair_slab ++ slab_tail stays a permutation of [0, d_max*n)
        pad = r_max - key_sorted.shape[0]
        key_sorted = jnp.pad(
            key_sorted, (0, pad), constant_values=jnp.int32(0x7FFFFFFF)
        )
        pair_slab = jnp.concatenate([
            pair_slab,
            jnp.full((pad,), d_max * n, jnp.int32)
            + jnp.arange(pad, dtype=jnp.int32),
        ])
        slab_tail = jnp.zeros((0,), jnp.int32)
    pair_gauss = pair_slab % n
    pair_ok = key_sorted != jnp.int32(0x7FFFFFFF)
    total = jnp.sum(counts)

    overflow = total > r_max
    tile_keys = lax.shift_left(
        jnp.arange(num_tiles + 1, dtype=jnp.int32), depth_bits
    )
    bounds = jnp.searchsorted(key_sorted, tile_keys, side="left").astype(
        jnp.int32
    )
    if phase_stride > 0:
        # bounds are rank-indexed; emit per-ORIGINAL-tile ranges (a
        # static-index permutation gather on a [T+1] array) so every
        # existing consumer of tile_start/stop is unchanged. Phase
        # block boundaries fall out of the rank cumsums (base).
        tile_start = bounds[rank_np]
        tile_stop = bounds[rank_np + 1]
        phase_start = bounds[base_np]
    else:
        tile_start = bounds[:-1]
        tile_stop = bounds[1:]
        phase_start = np.zeros((0,), np.int32)
    if reduce_perm:
        # pre-sort the gradient-reduction keys (fast path of
        # slab_scatter_grads): per-iteration reduces against this binning
        # reuse the sort instead of re-sorting [R] every step. Phase-
        # major binnings sort by (phase, gaussian) instead — each
        # phase's block is then gaussian-sorted for the compact
        # per-phase reduce (and the plain dense _run_reduce no longer
        # applies to them).
        if phase_stride > 0:
            rank_sorted = lax.shift_right_logical(key_sorted, depth_bits)
            pair_phase = jnp.zeros_like(rank_sorted)
            for p in range(1, n_phase):
                pair_phase = pair_phase + (
                    rank_sorted >= np.int32(base_np[p])
                ).astype(jnp.int32)
            rkeys = jnp.where(pair_ok,
                              pair_phase * np.int32(n + 1) + pair_gauss,
                              np.int32(n_phase * (n + 1)))
        else:
            rkeys = jnp.where(pair_ok, pair_gauss, n)
        red_keys, red_perm = lax.sort(
            (rkeys, jnp.arange(r_max, dtype=jnp.int32)), num_keys=1
        )
    else:
        red_keys = red_perm = jnp.zeros((0,), jnp.int32)
    return Binning(
        red_keys=red_keys,
        red_perm=red_perm,
        pair_gauss=pair_gauss,
        pair_slab=pair_slab,
        slab_tail=slab_tail,
        pair_ok=pair_ok,
        tile_start=tile_start,
        tile_stop=tile_stop,
        num_tiles_touched=d_max,
        num_pairs=jnp.minimum(total, r_max).astype(jnp.int32),
        demand=total.astype(jnp.int32),
        overflow=overflow,
        n_shrunk=n_shrunk,
        counts=counts.astype(jnp.int32),
        phase_start=phase_start,
        slab_phase=slab_phase,
    )
