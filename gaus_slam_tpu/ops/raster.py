"""Differentiable 2DGS rasterization — public op.

``render_pairs`` is the core differentiable primitive: pair-expanded
attributes in, tile-major render buffer out, with a custom VJP backed by
the Pallas kernels (or the pure-jnp reference on CPU/interpret).

Gradients flow to the pair attributes; the caller chains them through
``preprocess`` with ordinary JAX autodiff:

  * tracking: preprocess runs directly on frozen pair-expanded raw
    parameters, so the pose gradient is a plain broadcast-sum — no
    gather/scatter anywhere in the optimization loop
    (render/__init__.py:30-39 semantics).
  * mapping/BA: preprocess runs per-gaussian; the pair expansion is a
    gather whose VJP (segment reduction) is handled by XLA.

Reference API shape: gaus_2dgs_rasterization/__init__.py:44-161.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .binning import Binning, TileGrid
from .compositing import ATTR_C, OUT_C, grads_wanted
from . import composite_ref


class RenderSettings(NamedTuple):
    grid: TileGrid
    use_sa: bool = True
    backend: str = "pallas"  # pallas | interpret | reference
    need_normal: bool = True  # gate normal accumulation + its grad paths
    # compute dtype of the kernels' per-pair elementwise chain
    # ("f32" | "bf16"); see compositing.composite_chunk(dtype=...)
    compute_dtype: str = "f32"


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def render_pairs(pair_attrs, tile_start, tile_stop, tile_ids,
                 settings: RenderSettings):
    """[ATTR_C, R] pair attrs -> [n_sub, OUT_C, P] render buffer.

    ``tile_ids`` (or None for all tiles) selects the image tiles to
    render; ``tile_start``/``tile_stop`` are the matching subset rows of
    the binning bounds (coarse tracking renders a strided checkerboard
    of tiles from the same pair cache)."""
    return _forward(pair_attrs, tile_start, tile_stop, tile_ids, settings)


def _forward(pair_attrs, tile_start, tile_stop, tile_ids, settings):
    if settings.backend == "reference":
        assert tile_ids is None, "tile subsetting needs the pallas kernels"
        r = pair_attrs.shape[1]
        bins_like = Binning(
            pair_gauss=jnp.arange(r, dtype=jnp.int32),
            pair_slab=jnp.arange(r, dtype=jnp.int32),
            slab_tail=jnp.zeros((0,), jnp.int32),
            pair_ok=jnp.ones(r, bool),
            tile_start=tile_start, tile_stop=tile_stop,
            num_tiles_touched=1,
            num_pairs=jnp.int32(r),
            demand=jnp.int32(r),
            overflow=jnp.bool_(False),
            n_shrunk=jnp.int32(0),
            counts=jnp.ones((r,), jnp.int32),
        )
        return composite_ref.render_tiles(
            pair_attrs.T, bins_like, settings.grid, use_sa=settings.use_sa,
            max_pairs_per_tile=pair_attrs.shape[1],
            need_normal=settings.need_normal,
        )
    from .pallas_forward import raster_forward

    return raster_forward(
        pair_attrs, tile_start, tile_stop,
        grid=settings.grid, use_sa=settings.use_sa,
        need_normal=settings.need_normal,
        interpret=(settings.backend == "interpret"),
        tile_ids=tile_ids,
        compute_dtype=settings.compute_dtype,
    )


def _fwd(pair_attrs, tile_start, tile_stop, tile_ids, settings):
    if settings.backend == "reference":
        out = _forward(pair_attrs, tile_start, tile_stop, tile_ids, settings)
        return out, (pair_attrs, tile_start, tile_stop, tile_ids, out,
                     None, None)
    # the vjp-path forward stashes each chunk's incoming carry so the
    # backward kernel runs its reverse sweep directly (no Phase-A
    # re-forward)
    from .pallas_forward import raster_forward_stash

    out, stash, kexit = raster_forward_stash(
        pair_attrs, tile_start, tile_stop,
        grid=settings.grid, use_sa=settings.use_sa,
        need_normal=settings.need_normal,
        interpret=(settings.backend == "interpret"),
        tile_ids=tile_ids,
        compute_dtype=settings.compute_dtype,
    )
    return out, (pair_attrs, tile_start, tile_stop, tile_ids, out, stash,
                 kexit)


def _bwd(settings, res, d_out):
    pair_attrs, tile_start, tile_stop, tile_ids, out, stash, kexit = res
    if stash is None:
        from .pallas_backward import raster_backward

        d_attrs = raster_backward(
            pair_attrs, tile_start, tile_stop, out, d_out,
            grid=settings.grid, use_sa=settings.use_sa,
            need_normal=settings.need_normal,
            interpret=True,
        )
    else:
        from .pallas_backward import raster_backward_stash

        d_attrs = raster_backward_stash(
            pair_attrs, tile_start, tile_stop, stash, kexit, out, d_out,
            grid=settings.grid, use_sa=settings.use_sa,
            need_normal=settings.need_normal,
            interpret=(settings.backend == "interpret"),
            tile_ids=tile_ids,
            compute_dtype=settings.compute_dtype,
        )
    # inside shard_map the cotangent must carry the primal's
    # varying-across-mesh axes
    want = getattr(jax.typeof(pair_attrs), "vma", frozenset())
    have = getattr(jax.typeof(d_attrs), "vma", frozenset())
    missing = tuple(want - have)
    if missing:
        d_attrs = jax.lax.pvary(d_attrs, missing)
    return d_attrs, None, None, None


render_pairs.defvjp(_fwd, _bwd)
