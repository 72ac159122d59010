"""Pallas TPU forward kernel for tile-sorted 2DGS surfel compositing.

One grid step per image tile. Per-tile pair ranges (from binning) are
scalar-prefetched; pair attributes live in HBM as a [ATTR_C, R] slab and
are DMA'd chunk-by-chunk (128 pairs) into VMEM. The per-chunk math is
``compositing.composite_chunk`` — the same jnp code the reference
compositor runs — so kernel correctness reduces to plumbing.

Chunks are aligned 128-blocks of the globally sorted pair array; a
tile's range [start, stop) is processed as blocks floor(start/128)
.. ceil(stop/128) with an in-kernel validity mask, which keeps every DMA
aligned. Early termination: the chunk loop is a while_loop that stops
when every pixel in the tile has triggered the transmittance cutoff.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import TileGrid
from .compositing import (ATTR_C, OUT_C, PixelState, composite_chunk,
                          finalize, init_state)

CHUNK = 128


def _kernel(ids_ref, start_ref, stop_ref, attrs_ref, out_ref, abuf, sem, *,
            grid: TileGrid, use_sa: bool, need_normal: bool,
            dtype=jnp.float32):
    i = pl.program_id(0)
    t = ids_ref[i]           # image-tile id (subset-aware; == i when full)
    start = start_ref[i]
    stop = stop_ref[i]
    blk0 = start // CHUNK
    nblk = jnp.where(stop > start, pl.cdiv(stop, CHUNK) - blk0, 0)

    P = grid.pixels_per_tile
    ty = t // grid.tiles_x
    tx = t % grid.tiles_x
    p = lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = (tx * grid.block_w + p % grid.block_w).astype(jnp.float32)
    py = (ty * grid.block_h + p // grid.block_w).astype(jnp.float32)

    def dma(k, slot):
        return pltpu.make_async_copy(
            attrs_ref.at[:, pl.ds((blk0 + k) * CHUNK, CHUNK)],
            abuf.at[slot],
            sem.at[slot],
        )

    @pl.when(nblk > 0)
    def _():
        dma(0, 0).start()

    def cond(carry):
        k, state = carry
        return (k < nblk) & (jnp.min(state.done) < 0.5)

    def body(carry):
        k, state = carry
        slot = lax.rem(k, 2)

        @pl.when(k + 1 < nblk)
        def _():
            dma(k + 1, 1 - slot).start()

        dma(k, slot).wait()
        attrs = jnp.transpose(abuf[slot])            # [CHUNK, ATTR_C]
        gstart = (blk0 + k) * CHUNK
        gi = gstart + lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        pair_valid = ((gi >= start) & (gi < stop)).astype(jnp.float32)
        idx_base = gstart - start + 1                # 1-based in-tile index
        state = composite_chunk(
            state, attrs, px, py, idx_base, pair_valid, use_sa=use_sa,
            need_normal=need_normal, dtype=dtype,
        )
        return k + 1, state

    state0 = init_state(P)
    k_exit, state = lax.while_loop(cond, body, (jnp.int32(0), state0))

    # early exit can leave a prefetched DMA in flight; drain it so the
    # per-slot semaphores are clean for the next grid step
    @pl.when(k_exit < nblk)
    def _():
        dma(k_exit, lax.rem(k_exit, 2)).wait()

    out_ref[0] = finalize(state, jnp.zeros((3,), jnp.float32), use_sa=use_sa)


@functools.partial(
    jax.jit, static_argnames=("grid", "use_sa", "need_normal", "interpret",
                              "compute_dtype")
)
def raster_forward(
    pair_attrs: jnp.ndarray,  # [ATTR_C, R] f32, R % 128 == 0
    tile_start: jnp.ndarray,  # [n_sub] int32 (subset rows of the binning)
    tile_stop: jnp.ndarray,   # [n_sub] int32
    *,
    grid: TileGrid,
    use_sa: bool = True,
    need_normal: bool = True,
    interpret: bool = False,
    tile_ids: jnp.ndarray | None = None,  # [n_sub] image-tile ids; None=all
    compute_dtype: str = "f32",
) -> jnp.ndarray:
    """Returns tile-major render buffer [n_sub, OUT_C, pixels_per_tile].

    ``tile_ids`` selects a subset of image tiles (coarse tracking renders
    a strided checkerboard from the same pair cache); by default all
    ``grid.num_tiles`` tiles render in order.
    """
    c, r = pair_attrs.shape
    assert c == ATTR_C and r % CHUNK == 0, (c, r)
    if tile_ids is None:
        tile_ids = jnp.arange(grid.num_tiles, dtype=jnp.int32)
    n_sub = tile_ids.shape[0]
    P = grid.pixels_per_tile

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_sub,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, OUT_C, P), lambda t, s1, s2, s3: (t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ATTR_C, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_kernel, grid=grid, use_sa=use_sa,
                               need_normal=need_normal,
                               dtype=_dtype_of(compute_dtype))
    out_shape = jax.ShapeDtypeStruct(
        (n_sub, OUT_C, P), jnp.float32, vma=_vma_of(pair_attrs)
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(tile_ids, tile_start, tile_stop, pair_attrs)


def _dtype_of(compute_dtype: str):
    return {"f32": jnp.float32, "bf16": jnp.bfloat16}[compute_dtype]


def _vma_of(*xs):
    """Union of the varying-across-mesh axes of the inputs, so the
    kernel output is correctly typed inside shard_map (check_vma)."""
    vma = frozenset()
    for x in xs:
        try:
            vma = vma | jax.typeof(x).vma
        except (AttributeError, TypeError):
            pass
    return vma


# ---------------------------------------------------------------------------
# stash-carrying forward: the vjp path's forward writes each chunk's
# incoming carry to HBM so the backward kernel can skip its re-forward
# sweep (Phase A) entirely.

def _kernel_stash(ids_ref, start_ref, stop_ref, soff_ref, attrs_ref, out_ref,
                  stash_ref, kexit_ref, abuf, sem, sbuf, ssem, *,
                  grid: TileGrid, use_sa: bool, need_normal: bool,
                  dtype=jnp.float32):
    from .pallas_backward import _stash_from_state

    i = pl.program_id(0)
    t = ids_ref[i]
    start = start_ref[i]
    stop = stop_ref[i]
    soff = soff_ref[i]
    blk0 = start // CHUNK
    nblk = jnp.where(stop > start, pl.cdiv(stop, CHUNK) - blk0, 0)

    P = grid.pixels_per_tile
    ty = t // grid.tiles_x
    tx = t % grid.tiles_x
    p = lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = (tx * grid.block_w + p % grid.block_w).astype(jnp.float32)
    py = (ty * grid.block_h + p // grid.block_w).astype(jnp.float32)

    def dma(k, slot):
        return pltpu.make_async_copy(
            attrs_ref.at[:, pl.ds((blk0 + k) * CHUNK, CHUNK)],
            abuf.at[slot],
            sem.at[slot],
        )

    def stash_write(k, slot):
        return pltpu.make_async_copy(
            sbuf.at[slot], stash_ref.at[soff + k], ssem.at[slot]
        )

    @pl.when(nblk > 0)
    def _():
        dma(0, 0).start()

    def cond(carry):
        k, state = carry
        return (k < nblk) & (jnp.min(state.done) < 0.5)

    def body(carry):
        k, state = carry
        slot = lax.rem(k, 2)

        # stash the incoming carry (double-buffered: drain the write
        # issued two chunks ago before reusing its slot)
        @pl.when(k >= 2)
        def _():
            stash_write(k - 2, slot).wait()

        sbuf[slot] = _stash_from_state(state)
        stash_write(k, slot).start()

        @pl.when(k + 1 < nblk)
        def _():
            dma(k + 1, 1 - slot).start()

        dma(k, slot).wait()
        attrs = jnp.transpose(abuf[slot])
        gstart = (blk0 + k) * CHUNK
        gi = gstart + lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        pair_valid = ((gi >= start) & (gi < stop)).astype(jnp.float32)
        idx_base = gstart - start + 1
        state = composite_chunk(
            state, attrs, px, py, idx_base, pair_valid, use_sa=use_sa,
            need_normal=need_normal, dtype=dtype,
        )
        return k + 1, state

    state0 = init_state(P)
    k_exit, state = lax.while_loop(cond, body, (jnp.int32(0), state0))

    # drain outstanding stash writes + any prefetched attr DMA
    @pl.when(k_exit >= 2)
    def _():
        stash_write(k_exit - 2, lax.rem(k_exit, 2)).wait()

    @pl.when(k_exit >= 1)
    def _():
        stash_write(k_exit - 1, lax.rem(k_exit - 1, 2)).wait()

    @pl.when(k_exit < nblk)
    def _():
        dma(k_exit, lax.rem(k_exit, 2)).wait()

    kexit_ref[0] = jnp.full((8, 128), k_exit, jnp.int32)
    out_ref[0] = finalize(state, jnp.zeros((3,), jnp.float32), use_sa=use_sa)


def stash_offsets(tile_start, tile_stop):
    """Per-tile row offsets into the chunk-carry stash + its total size
    bound: tile t owns rows [soff[t], soff[t] + nblk[t])."""
    nblk = jnp.where(
        tile_stop > tile_start,
        (tile_stop + (CHUNK - 1)) // CHUNK - tile_start // CHUNK,
        0,
    ).astype(jnp.int32)
    soff = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nblk).astype(jnp.int32)[:-1]]
    )
    return soff


def stash_rows(r: int, num_tiles: int) -> int:
    """Static bound on total stash rows: the tile ranges partition the
    pair array, so sum(nblk) <= r/CHUNK + num_tiles boundary blocks."""
    return r // CHUNK + num_tiles


@functools.partial(
    jax.jit, static_argnames=("grid", "use_sa", "need_normal", "interpret",
                              "compute_dtype")
)
def raster_forward_stash(
    pair_attrs: jnp.ndarray,
    tile_start: jnp.ndarray,
    tile_stop: jnp.ndarray,
    *,
    grid: TileGrid,
    use_sa: bool = True,
    need_normal: bool = True,
    interpret: bool = False,
    tile_ids: jnp.ndarray | None = None,
    compute_dtype: str = "f32",
):
    """Forward + per-chunk carry stash for the Phase-A-free backward.

    Returns (out [n_sub, OUT_C, P], stash [S, STASH_C, P], kexit [n_sub]).
    """
    from .pallas_backward import STASH_C

    c, r = pair_attrs.shape
    assert c == ATTR_C and r % CHUNK == 0, (c, r)
    if tile_ids is None:
        tile_ids = jnp.arange(grid.num_tiles, dtype=jnp.int32)
    n_sub = tile_ids.shape[0]
    P = grid.pixels_per_tile
    S = stash_rows(r, n_sub)
    soff = stash_offsets(tile_start, tile_stop)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_sub,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((1, OUT_C, P), lambda t, s1, s2, s3, s4: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            # (1, 8, 128) block: TPU lowering needs the last two block
            # dims divisible by (8, 128); a [T] scalar per tile is
            # broadcast into an 8x128 block and sliced on the way out
            pl.BlockSpec((1, 8, 128), lambda t, s1, s2, s3, s4: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ATTR_C, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, STASH_C, P), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_kernel_stash, grid=grid, use_sa=use_sa,
                               need_normal=need_normal,
                               dtype=_dtype_of(compute_dtype))
    vma = _vma_of(pair_attrs)
    out, stash, kexit = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_sub, OUT_C, P), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((S, STASH_C, P), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((n_sub, 8, 128), jnp.int32, vma=vma),
        ),
        interpret=interpret,
    )(tile_ids, tile_start, tile_stop, soff, pair_attrs)
    return out, stash, kexit[:, 0, 0]
