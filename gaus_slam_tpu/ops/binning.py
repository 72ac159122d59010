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
    num_pairs: jnp.ndarray   # scalar int32
    overflow: jnp.ndarray    # scalar bool: pair budget exceeded (tail dropped)
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
        if backend in ("pallas", "interpret") and n % 128 == 0 and c % 8 == 0:
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


def bin_gaussians(
    pre: PreprocResult,
    grid: TileGrid,
    r_max: int | None = None,
    max_tiles_per_gaussian: int = 16,
    reduce_perm: bool = False,
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

    # monotone depth quantization from positive-float bit pattern
    dq = lax.bitcast_convert_type(
        jnp.maximum(pre.depth, 1e-12).astype(jnp.float32), jnp.int32
    )
    dq = lax.shift_right_logical(dq, 32 - depth_bits)

    key = lax.shift_left(tile, depth_bits) | dq[None, :]
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
    if reduce_perm:
        # pre-sort the gradient-reduction keys (fast path of
        # slab_scatter_grads): per-iteration reduces against this binning
        # reuse the sort instead of re-sorting [R] every step
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
        tile_start=bounds[:-1],
        tile_stop=bounds[1:],
        num_tiles_touched=d_max,
        num_pairs=jnp.minimum(total, r_max).astype(jnp.int32),
        overflow=overflow,
        n_shrunk=n_shrunk,
        counts=counts.astype(jnp.int32),
    )
