"""Banded monotone row gather — a Pallas TPU primitive.

``out[i] = data[pos[i]]`` for a *monotone non-decreasing* ``pos``. XLA
lowers a general row gather to a serial per-row loop (~13-19 ns/row on
this TPU, latency-bound — see PERF.md microbenchmarks), which makes the
gradient-reduction's run-end gather one of the mapping iteration's
biggest line items. Monotonicity bounds the source rows of any 128-row
output chunk to a contiguous band of width ``max_step * 128``, so the
gather becomes: one banded DMA per chunk + an in-VMEM one-hot matmul
(MXU) — bandwidth/compute-bound instead of latency-bound (~7x faster
at reduction sizes).

Replaces the CUDA backward's atomicAdd landing step in spirit
(reference cuda_rasterizer/backward.cu:343-460 scatters per-pair
gradients with atomics; TPU has no fast atomics, so the reduction is
sort + segmented-scan + this gather of run totals).

Layout notes (Mosaic DMA): lane (last) dims of HBM slices must be
128-aligned, so ``data`` is taken TRANSPOSED as [C, R] and the output
is emitted [C, N]; callers transpose the [C, N] result (cheap, fused).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128


def _kernel(lo_ref, pos_ref, data_ref, out_ref, dbuf, sem, *, band: int):
    i = pl.program_id(0)
    n_chunks = pl.num_programs(0)

    def dma(k, slot):
        # lo is 128-aligned by construction; Mosaic needs the assertion
        # to allow a dynamic lane offset on an HBM slice
        lo = pl.multiple_of(lo_ref[k], BLOCK)
        return pltpu.make_async_copy(
            data_ref.at[:, pl.ds(lo, band)], dbuf.at[slot],
            sem.at[slot],
        )

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < n_chunks)
    def _():
        dma(i + 1, lax.rem(i + 1, 2)).start()

    slot = lax.rem(i, 2)
    dma(i, slot).wait()
    # onehot[j, col] = (lo + j == pos[col]); monotonicity guarantees every
    # pos of this chunk falls inside [lo, lo + band)
    pos_row = pos_ref[pl.ds(i, 1), :]                        # [1, BLOCK]
    j = lax.broadcasted_iota(jnp.int32, (band, BLOCK), 0)
    onehot = (j + lo_ref[i] == pos_row).astype(jnp.float32)
    # HIGHEST precision makes the pass exact: the bf16x3 decomposition
    # represents f32 exactly, and each one-hot column has a single
    # nonzero, so no accumulation rounding occurs — bit-equal to a gather
    out_ref[...] = lax.dot_general(
        dbuf[slot], onehot,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnames=("max_step", "interpret"))
def monotone_row_gather(
    data_t: jnp.ndarray,   # [C, R] f32, R % 128 == 0
    pos: jnp.ndarray,      # [N] int32, monotone non-decreasing, in [0, R)
    *,
    max_step: int,         # static bound on pos[i+1] - pos[i]
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns [C, N] = data_t[:, pos] (gather along lanes).

    ``max_step`` bounds consecutive-position increments (for the
    gradient reduction this is d_max: a gaussian emits at most d_max
    pairs, reference rasterizer_impl.cu:70-111 duplicateWithKeys).
    """
    c, r = data_t.shape
    (n,) = pos.shape
    assert r % BLOCK == 0 and n % BLOCK == 0, (r, n)
    assert c % 8 == 0, c
    # band: worst chunk spans 127 * max_step rows + 127 alignment slack
    band = -(-(BLOCK * max_step + BLOCK) // BLOCK) * BLOCK
    band = min(band, r)
    n_chunks = n // BLOCK
    pos2 = pos.reshape(n_chunks, BLOCK)
    lo = jnp.clip(
        (pos2[:, 0] // BLOCK) * BLOCK, 0, jnp.int32(r - band)
    ).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            # whole pos array as one resident VMEM block (N*4 bytes; a
            # (1, BLOCK) per-step block would violate the (8, 128)
            # block-divisibility rule on TPU)
            pl.BlockSpec((n_chunks, BLOCK), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((c, BLOCK), lambda i, s: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, c, band), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, band=band),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c, n), jnp.float32),
        interpret=interpret,
    )(lo, pos2, data_t)
