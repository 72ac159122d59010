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


def _kernel(start_ref, stop_ref, attrs_ref, out_ref, abuf, sem, *, grid: TileGrid,
            use_sa: bool, need_normal: bool):
    t = pl.program_id(0)
    start = start_ref[t]
    stop = stop_ref[t]
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
            need_normal=need_normal,
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
    jax.jit, static_argnames=("grid", "use_sa", "need_normal", "interpret")
)
def raster_forward(
    pair_attrs: jnp.ndarray,  # [ATTR_C, R] f32, R % 128 == 0
    tile_start: jnp.ndarray,  # [num_tiles] int32
    tile_stop: jnp.ndarray,   # [num_tiles] int32
    *,
    grid: TileGrid,
    use_sa: bool = True,
    need_normal: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns tile-major render buffer [num_tiles, OUT_C, pixels_per_tile]."""
    c, r = pair_attrs.shape
    assert c == ATTR_C and r % CHUNK == 0, (c, r)
    n_tiles = grid.num_tiles
    P = grid.pixels_per_tile

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, OUT_C, P), lambda t, s1, s2: (t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ATTR_C, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_kernel, grid=grid, use_sa=use_sa,
                               need_normal=need_normal)
    out_shape = jax.ShapeDtypeStruct(
        (n_tiles, OUT_C, P), jnp.float32, vma=_vma_of(pair_attrs)
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(tile_start, tile_stop, pair_attrs)


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
