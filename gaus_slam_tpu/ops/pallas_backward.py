"""Pallas TPU backward kernel for the 2DGS compositor.

Computes per-pair attribute gradients [ATTR_C, R] from the loss
cotangents of the tile-major render buffer. Structure per tile:

  Phase A (forward sweep): rerun the chunk loop exactly as the forward
  kernel did, stashing each chunk's *incoming* carry channels
  (T, done, D, D2, M1, M2, mm — the only PixelState fields whose values
  the chunk gradient depends on; the pure accumulators are linear) in a
  VMEM stash.

  Phase B (reverse sweep): for each chunk, rebuild the incoming state
  from the stash and apply ``jax.vjp`` of the *same*
  ``compositing.composite_chunk`` the forward ran — tracing the vjp
  inside the kernel guarantees the backward is the exact transpose of
  the forward semantics (including every stop_gradient, i.e. the
  reference's detached-fusion-weight surrogate, backward.cu:145-463).
  The cotangent of the chunk's incoming state becomes the carry for the
  previous chunk; the pair-attribute cotangents are accumulated into the
  output slab.

Because the globally-aligned 128-pair chunks at tile boundaries are
shared between neighboring tiles, the output is donated as a
zero-initialized buffer and every write is a read-modify-write; the TPU
grid is sequential so this is race-free.

The initial cotangent state (vjp of ``finalize``) has a closed form and
is computed in XLA by ``finalize_cotangents`` from the saved forward
outputs — the kernel receives it as a [num_tiles, OUT_C, P] input.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import TileGrid
from .compositing import ATTR_C, OUT_C, PixelState, composite_chunk, grads_wanted

CHUNK = 128
# Carry channels stashed per chunk (order matters).
STASH_FIELDS = ("T", "done", "D", "D2", "M1", "M2", "mm")
STASH_C = 8  # padded to sublane multiple
MAX_CHUNKS_PER_TILE = 512  # 64k pairs per 16x16 tile; overflow asserted in tests


def finalize_cotangents(
    saved_out: jnp.ndarray,   # [T, OUT_C, P] forward outputs
    d_out: jnp.ndarray,       # [T, OUT_C, P] loss cotangents (rows 10.. ignored)
    bg: jnp.ndarray,          # [3]
    *,
    use_sa: bool,
) -> jnp.ndarray:
    """Closed-form vjp of ``compositing.finalize`` -> d_state [T, OUT_C, P].

    Channel layout of the result follows PixelState._fields order padded
    to OUT_C rows (the kernel unpacks it).
    """
    dr, dg, db = d_out[:, 0], d_out[:, 1], d_out[:, 2]
    dD = d_out[:, 3]
    dA = d_out[:, 4]
    dn = d_out[:, 5:8]
    dmid = d_out[:, 8]
    ddist = d_out[:, 9]
    mm = saved_out[:, 8]

    if use_sa:
        # dist = D2 - 2*sg(mm)*D + sg(mm)^2 * (1 - T)
        d_D = dD - 2.0 * mm * ddist
        d_D2 = ddist
        d_dist = jnp.zeros_like(ddist)
        d_T = bg[0] * dr + bg[1] * dg + bg[2] * db - dA - mm * mm * ddist
    else:
        d_D = dD
        d_D2 = jnp.zeros_like(ddist)
        d_dist = ddist
        d_T = bg[0] * dr + bg[1] * dg + bg[2] * db - dA
    zero = jnp.zeros_like(dD)
    # PixelState field order:
    # T done r g b nx ny nz D D2 M1 M2 dist mm n_contrib med_contrib
    rows = [d_T, zero, dr, dg, db, dn[:, 0], dn[:, 1], dn[:, 2],
            d_D, d_D2, zero, zero, d_dist, dmid, zero, zero]
    return jnp.stack(rows, axis=1)


def _state_from_stash(stash_row, P):
    """stash [STASH_C, P] -> PixelState with zeroed linear accumulators."""
    z = jnp.zeros((1, P), jnp.float32)
    return PixelState(
        T=stash_row[0:1], done=stash_row[1:2],
        r=z, g=z, b=z, nx=z, ny=z, nz=z,
        D=stash_row[2:3], D2=stash_row[3:4],
        M1=stash_row[4:5], M2=stash_row[5:6],
        dist=z, mm=stash_row[6:7], n_contrib=z, med_contrib=z,
    )


def _stash_from_state(s: PixelState):
    return jnp.concatenate(
        [s.T, s.done, s.D, s.D2, s.M1, s.M2, s.mm, jnp.zeros_like(s.T)],
        axis=0,
    )


def _kernel(ids_ref, start_ref, stop_ref, attrs_ref, dstate0_ref, zeros_ref,
            dattrs_ref, abuf, asem, stash, gbuf, gsem, *, grid: TileGrid,
            use_sa: bool, need_normal: bool):
    del zeros_ref  # aliased with dattrs_ref; reads/writes go through the output
    i_sub = pl.program_id(0)
    t = ids_ref[i_sub]
    start = start_ref[i_sub]
    stop = stop_ref[i_sub]
    blk0 = start // CHUNK
    nblk = jnp.where(stop > start, pl.cdiv(stop, CHUNK) - blk0, 0)
    nblk = jnp.minimum(nblk, MAX_CHUNKS_PER_TILE)

    P = grid.pixels_per_tile
    ty = t // grid.tiles_x
    tx = t % grid.tiles_x
    p = lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = (tx * grid.block_w + p % grid.block_w).astype(jnp.float32)
    py = (ty * grid.block_h + p // grid.block_w).astype(jnp.float32)

    def load_chunk(k):
        cp = pltpu.make_async_copy(
            attrs_ref.at[:, pl.ds((blk0 + k) * CHUNK, CHUNK)], abuf, asem
        )
        cp.start()
        cp.wait()
        return jnp.transpose(abuf[:, :])  # [CHUNK, ATTR_C]

    def chunk_args(k):
        gstart = (blk0 + k) * CHUNK
        gi = gstart + lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        pair_valid = ((gi >= start) & (gi < stop)).astype(jnp.float32)
        idx_base = gstart - start + 1
        return idx_base, pair_valid

    # ---- Phase A: forward sweep, stash incoming carries ----
    def cond(carry):
        k, state = carry
        return (k < nblk) & (jnp.min(state.done) < 0.5)

    def body(carry):
        k, state = carry
        stash[k] = _stash_from_state(state)
        attrs = load_chunk(k)
        idx_base, pair_valid = chunk_args(k)
        state = composite_chunk(
            state, attrs, px, py, idx_base, pair_valid, use_sa=use_sa,
            need_normal=need_normal,
        )
        return k + 1, state

    z = jnp.zeros((1, P), jnp.float32)
    state0 = PixelState(
        T=jnp.ones((1, P), jnp.float32), done=z, r=z, g=z, b=z,
        nx=z, ny=z, nz=z, D=z, D2=z, M1=z, M2=z, dist=z, mm=z,
        n_contrib=z, med_contrib=z,
    )
    k_count, _ = lax.while_loop(cond, body, (jnp.int32(0), state0))

    # ---- Phase B: reverse sweep with in-kernel vjp ----
    d0 = dstate0_ref[0]  # [OUT_C, P] (block-indexed by i_sub)
    d_state0 = PixelState(*(d0[i : i + 1] for i in range(len(PixelState._fields))))

    def bwd_body(i, d_state):
        k = k_count - 1 - i
        attrs = load_chunk(k)
        idx_base, pair_valid = chunk_args(k)
        state_in = _state_from_stash(stash[k], P)

        f = functools.partial(
            composite_chunk, px=px, py=py, idx_base=idx_base,
            pair_valid=pair_valid, use_sa=use_sa, need_normal=need_normal,
        )
        _, vjp_fn = jax.vjp(f, state_in, attrs)
        d_state_in, d_attrs = vjp_fn(d_state)

        # read-modify-write the shared output slab
        rd = pltpu.make_async_copy(
            dattrs_ref.at[:, pl.ds((blk0 + k) * CHUNK, CHUNK)], gbuf, gsem
        )
        rd.start()
        rd.wait()
        gbuf[:, :] = gbuf[:, :] + jnp.transpose(d_attrs)
        wr = pltpu.make_async_copy(
            gbuf, dattrs_ref.at[:, pl.ds((blk0 + k) * CHUNK, CHUNK)], gsem
        )
        wr.start()
        wr.wait()
        return d_state_in

    lax.fori_loop(0, k_count, bwd_body, d_state0)


def _kernel_stashed(ids_ref, start_ref, stop_ref, soff_ref, kexit_ref,
                    attrs_ref, dstate0_ref, stash_ref, zeros_ref, dattrs_ref,
                    abuf, asem, srow, ssem, gbuf, gsem_rd, gsem_wr, *,
                    grid: TileGrid, use_sa: bool, need_normal: bool,
                    dtype=jnp.float32):
    """Reverse sweep only: chunk carries come from the forward's stash
    (raster_forward_stash), so the per-tile re-forward (Phase A) and its
    attr DMAs + compositing work disappear.

    Software-pipelined: the next chunk's attr+stash loads prefetch while
    the current chunk's vjp computes, gradient writes drain one
    iteration behind (2-slot buffers), and only BOUNDARY chunks (the
    128-pair blocks shared with a neighboring tile's range) pay the
    read-modify-write — interior chunks are plain writes. The serialized
    4-DMA-per-chunk chain of the first version was a large share of the
    backward's premium over the forward."""
    del zeros_ref
    i_sub = pl.program_id(0)
    t = ids_ref[i_sub]
    start = start_ref[i_sub]
    stop = stop_ref[i_sub]
    soff = soff_ref[i_sub]
    k_count = kexit_ref[i_sub]
    blk0 = start // CHUNK

    P = grid.pixels_per_tile
    ty = t // grid.tiles_x
    tx = t % grid.tiles_x
    p = lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = (tx * grid.block_w + p % grid.block_w).astype(jnp.float32)
    py = (ty * grid.block_h + p // grid.block_w).astype(jnp.float32)

    d0 = dstate0_ref[0]
    d_state0 = PixelState(*(d0[i : i + 1]
                            for i in range(len(PixelState._fields))))

    def cp_a(k, slot):
        return pltpu.make_async_copy(
            attrs_ref.at[:, pl.ds((blk0 + k) * CHUNK, CHUNK)],
            abuf.at[slot], asem.at[slot],
        )

    def cp_s(k, slot):
        return pltpu.make_async_copy(stash_ref.at[soff + k], srow.at[slot],
                                     ssem.at[slot])

    def rd_g(k, slot):
        return pltpu.make_async_copy(
            dattrs_ref.at[:, pl.ds((blk0 + k) * CHUNK, CHUNK)],
            gbuf.at[slot], gsem_rd.at[slot],
        )

    def wr_g(k, slot):
        return pltpu.make_async_copy(
            gbuf.at[slot],
            dattrs_ref.at[:, pl.ds((blk0 + k) * CHUNK, CHUNK)],
            gsem_wr.at[slot],
        )

    @pl.when(k_count > 0)
    def _():
        cp_a(k_count - 1, 0).start()
        cp_s(k_count - 1, 0).start()

    def bwd_body(i, d_state):
        k = k_count - 1 - i
        slot = lax.rem(i, 2)

        @pl.when(i + 1 < k_count)
        def _():
            cp_a(k - 1, 1 - slot).start()
            cp_s(k - 1, 1 - slot).start()

        cp_a(k, slot).wait()
        cp_s(k, slot).wait()
        attrs = jnp.transpose(abuf[slot])
        state_in = _state_from_stash(srow[slot], P)
        gstart = (blk0 + k) * CHUNK
        gi = gstart + lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        pair_valid = ((gi >= start) & (gi < stop)).astype(jnp.float32)
        idx_base = gstart - start + 1

        f = functools.partial(
            composite_chunk, px=px, py=py, idx_base=idx_base,
            pair_valid=pair_valid, use_sa=use_sa, need_normal=need_normal,
            dtype=dtype,
        )
        _, vjp_fn = jax.vjp(f, state_in, attrs)
        d_state_in, d_attrs = vjp_fn(d_state)

        # the write issued two iterations ago reused this gbuf slot —
        # drain it before overwriting the slot
        @pl.when(i >= 2)
        def _():
            wr_g(k + 2, slot).wait()

        boundary = (gstart < start) | (gstart + CHUNK > stop)

        @pl.when(boundary)
        def _():
            rd = rd_g(k, slot)
            rd.start()
            rd.wait()
            gbuf[slot] = gbuf[slot] + jnp.transpose(d_attrs)

        @pl.when(jnp.logical_not(boundary))
        def _():
            gbuf[slot] = jnp.transpose(d_attrs)

        wr_g(k, slot).start()
        return d_state_in

    lax.fori_loop(0, k_count, bwd_body, d_state0)

    # drain the last (up to two) outstanding gradient writes so the next
    # grid step's boundary RMW sees them completed
    @pl.when(k_count >= 1)
    def _():
        wr_g(0, lax.rem(k_count - 1, 2)).wait()

    @pl.when(k_count >= 2)
    def _():
        wr_g(1, lax.rem(k_count - 2, 2)).wait()


@functools.partial(
    jax.jit, static_argnames=("grid", "use_sa", "need_normal", "interpret",
                              "compute_dtype")
)
def raster_backward_stash(
    pair_attrs: jnp.ndarray,   # [ATTR_C, R]
    tile_start: jnp.ndarray,   # [num_tiles]
    tile_stop: jnp.ndarray,    # [num_tiles]
    stash: jnp.ndarray,        # [S, STASH_C, P] from raster_forward_stash
    kexit: jnp.ndarray,        # [num_tiles] chunks composited per tile
    saved_out: jnp.ndarray,    # [num_tiles, OUT_C, P]
    d_out: jnp.ndarray,        # [num_tiles, OUT_C, P]
    *,
    grid: TileGrid,
    use_sa: bool = True,
    need_normal: bool = True,
    interpret: bool = False,
    tile_ids: jnp.ndarray | None = None,
    compute_dtype: str = "f32",
) -> jnp.ndarray:
    from .pallas_forward import _dtype_of, _vma_of, stash_offsets

    c, r = pair_attrs.shape
    assert c == ATTR_C and r % CHUNK == 0
    if tile_ids is None:
        tile_ids = jnp.arange(grid.num_tiles, dtype=jnp.int32)
    n_sub = tile_ids.shape[0]
    P = grid.pixels_per_tile
    bg = jnp.zeros((3,), jnp.float32)
    dstate0 = finalize_cotangents(saved_out, d_out, bg, use_sa=use_sa)
    soff = stash_offsets(tile_start, tile_stop)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_sub,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # pair attrs
            pl.BlockSpec(
                (1, OUT_C, P), lambda t, s1, s2, s3, s4, s5: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),   # stash
            pl.BlockSpec(memory_space=pl.ANY),   # zeros -> aliased output
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, ATTR_C, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, STASH_C, P), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, ATTR_C, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_kernel_stashed, grid=grid, use_sa=use_sa,
                               need_normal=need_normal,
                               dtype=_dtype_of(compute_dtype))
    zeros = jnp.zeros((ATTR_C, r), jnp.float32)
    out_shape = jax.ShapeDtypeStruct(
        (ATTR_C, r), jnp.float32, vma=_vma_of(pair_attrs, d_out)
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases={8: 0},  # zeros input (5 prefetch + 3) -> out
        interpret=interpret,
    )(tile_ids, tile_start, tile_stop, soff, kexit, pair_attrs, dstate0,
      stash, zeros)


@functools.partial(
    jax.jit, static_argnames=("grid", "use_sa", "need_normal", "interpret")
)
def raster_backward(
    pair_attrs: jnp.ndarray,   # [ATTR_C, R]
    tile_start: jnp.ndarray,   # [num_tiles]
    tile_stop: jnp.ndarray,    # [num_tiles]
    saved_out: jnp.ndarray,    # [num_tiles, OUT_C, P] forward outputs
    d_out: jnp.ndarray,        # [num_tiles, OUT_C, P] loss cotangents
    *,
    grid: TileGrid,
    use_sa: bool = True,
    need_normal: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-pair attribute gradients [ATTR_C, R]."""
    c, r = pair_attrs.shape
    assert c == ATTR_C and r % CHUNK == 0
    tile_ids = jnp.arange(grid.num_tiles, dtype=jnp.int32)
    n_tiles = grid.num_tiles
    P = grid.pixels_per_tile
    bg = jnp.zeros((3,), jnp.float32)
    dstate0 = finalize_cotangents(saved_out, d_out, bg, use_sa=use_sa)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, OUT_C, P), lambda t, s1, s2, s3: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # zeros -> aliased output
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((ATTR_C, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((MAX_CHUNKS_PER_TILE, STASH_C, P), jnp.float32),
            pltpu.VMEM((ATTR_C, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(_kernel, grid=grid, use_sa=use_sa,
                               need_normal=need_normal)
    zeros = jnp.zeros((ATTR_C, r), jnp.float32)
    from .pallas_forward import _vma_of

    out_shape = jax.ShapeDtypeStruct(
        (ATTR_C, r), jnp.float32, vma=_vma_of(pair_attrs, d_out)
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases={5: 0},  # zeros input (arg idx incl. 3 prefetch) -> output
        interpret=interpret,
    )(tile_ids, tile_start, tile_stop, pair_attrs, dstate0, zeros)
