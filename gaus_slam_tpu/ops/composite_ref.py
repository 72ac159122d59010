"""Reference (non-Pallas) tile compositor for tests and CPU fallback.

Runs the exact same per-chunk math as the Pallas kernels
(``compositing.composite_chunk``) with a python loop over tiles, so the
TPU kernels can be validated bit-for-bit (up to fp reassociation).
``chunk=1`` reproduces the reference CUDA compositor's fully sequential
surface-aware depth fusion (see compositing.py docstring).

Differentiable end-to-end: jax.grad of ``render_tiles`` is the gradient
oracle for the Pallas backward kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .binning import Binning, TileGrid
from .compositing import OUT_C, composite_chunk, finalize, init_state


def tile_pixel_coords(grid: TileGrid, t: int):
    """Pixel coordinates [1, P] for tile t (row-major pixels)."""
    ty, tx = divmod(t, grid.tiles_x)
    p = jnp.arange(grid.pixels_per_tile, dtype=jnp.float32)[None, :]
    x = tx * grid.block_w + p % grid.block_w
    y = ty * grid.block_h + p // grid.block_w
    return x, y


def render_tiles(
    attrs_t: jnp.ndarray,   # [N, ATTR_C] per-gaussian packed attributes
    binning: Binning,
    grid: TileGrid,
    *,
    use_sa: bool = True,
    bg: jnp.ndarray | None = None,
    chunk: int = 128,
    max_pairs_per_tile: int | None = None,
    need_normal: bool = True,
) -> jnp.ndarray:
    """Render all tiles -> tile-major output [num_tiles, OUT_C, P].

    Pure jnp but with a python loop over tiles: only for small test
    scenes. ``max_pairs_per_tile`` bounds the static per-tile pair count
    (defaults to the full pair budget).
    """
    if bg is None:
        bg = jnp.zeros((3,), jnp.float32)
    r_max = binning.pair_gauss.shape[0]
    k_max = max_pairs_per_tile or r_max
    k_max = -(-k_max // chunk) * chunk

    outs = []
    for t in range(grid.num_tiles):
        start = binning.tile_start[t]
        stop = binning.tile_stop[t]
        # static-size window of the sorted pair list for this tile
        idx = start + jnp.arange(k_max, dtype=jnp.int32)
        in_range = idx < stop
        safe_idx = jnp.clip(idx, 0, r_max - 1)
        gidx = binning.pair_gauss[safe_idx]
        tile_attrs = attrs_t[gidx]                       # [k_max, ATTR_C]
        valid = in_range & binning.pair_ok[safe_idx]

        px, py = tile_pixel_coords(grid, t)
        state = init_state(grid.pixels_per_tile)
        for c0 in range(0, k_max, chunk):
            state = composite_chunk(
                state,
                tile_attrs[c0 : c0 + chunk],
                px, py,
                jnp.int32(c0 + 1),
                valid[c0 : c0 + chunk, None],
                use_sa=use_sa, need_normal=need_normal,
            )
        outs.append(finalize(state, bg, use_sa=use_sa))
    return jnp.stack(outs, axis=0)


def render_tiles_sequential(
    attrs_t: jnp.ndarray,
    binning: Binning,
    grid: TileGrid,
    *,
    use_sa: bool = True,
    bg: jnp.ndarray | None = None,
    max_pairs_per_tile: int = 128,
) -> jnp.ndarray:
    """Exact sequential compositor (direct translation of the CUDA
    per-pixel loop, forward.cu:260-467) via lax.scan over pairs.

    Independent of ``composite_chunk`` — used as the oracle for both the
    chunked reference and the Pallas kernels. Exact surface-aware depth
    fusion with per-gaussian running statistics.
    """
    import jax
    from jax import lax
    from .camera import (ALPHA_MIN, ALPHA_MAX, FAR_N, FILTER_INV_SQUARE,
                         NEAR_N, T_EPS)

    if bg is None:
        bg = jnp.zeros((3,), jnp.float32)
    r_max = binning.pair_gauss.shape[0]
    P = grid.pixels_per_tile

    def render_one_tile(start, stop, px, py):
        idx = start + jnp.arange(max_pairs_per_tile, dtype=jnp.int32)
        safe_idx = jnp.clip(idx, 0, r_max - 1)
        gidx = binning.pair_gauss[safe_idx]
        tile_attrs = attrs_t[gidx]                   # [K, ATTR_C]
        valid = (idx < stop) & binning.pair_ok[safe_idx]

        # state: (T, done, C3, N3, D, D2, M1, M2, dist, mm, ncon, mcon)
        z = jnp.zeros((P,))
        state0 = (jnp.ones((P,)), z, jnp.zeros((P, 3)), jnp.zeros((P, 3)),
                  z, z, z, z, z, z, z, z)

        def step(state, inp):
            a, ok, k = inp
            (T, done, C, N, D, D2, M1, M2, dist, mm, ncon, mcon) = state
            p_x = px * a[0] + py * a[3] + a[6]
            p_y = px * a[1] + py * a[4] + a[7]
            p_z = px * a[2] + py * a[5] + a[8]
            pz_ok = p_z != 0.0
            inv = jnp.where(pz_ok, 1.0, 0.0) / jnp.where(pz_ok, p_z, 1.0)
            sx, sy = p_x * inv, p_y * inv
            rho3d = sx * sx + sy * sy
            dxx, dyy = a[12] - px, a[13] - py
            rho2d = FILTER_INV_SQUARE * (dxx * dxx + dyy * dyy)
            use3d = rho3d <= rho2d
            rho = jnp.minimum(rho3d, rho2d)
            d_raw = jnp.where(use3d, sx * a[9] + sy * a[10] + a[11], a[11])
            alpha = jnp.minimum(a[17] * jnp.exp(-0.5 * rho), ALPHA_MAX)
            okc = (pz_ok & (d_raw >= NEAR_N)
                   & (a[17] * jnp.exp(-0.5 * rho) >= ALPHA_MIN)
                   & ok & (done < 0.5))
            test_T = T * (1.0 - alpha)
            trigger = okc & (test_T < T_EPS)
            acc = okc & ~trigger
            accf = acc.astype(jnp.float32)
            w = alpha * T * accf
            med = acc & (T > 0.5)
            mm_n = jnp.where(med, d_raw, mm)
            mcon_n = jnp.where(med, k.astype(jnp.float32), mcon)
            if use_sa:
                exp_std = jnp.maximum(
                    (D2 - 2.0 * D * mm_n) / jnp.maximum(1.0 - T, 1e-12)
                    + mm_n * mm_n, 1e-7)
                err = (mm_n - d_raw) ** 2
                conf = jnp.where((D > 0) & ~med, jnp.exp(-err / (4 * exp_std)),
                                 1.0)
                d_f = conf * d_raw + (1 - conf) * mm_n
                dist_n = dist
                M1_n, M2_n = M1, M2
            else:
                d_f = d_raw
                m = FAR_N / (FAR_N - NEAR_N) * (1 - NEAR_N / jnp.maximum(d_raw, 1e-6))
                dist_n = dist + (m * m * (1 - T) + M2 - 2 * m * M1) * w
                M1_n, M2_n = M1 + m * w, M2 + m * m * w
            state_n = (
                jnp.where(acc, test_T, T),
                jnp.maximum(done, trigger.astype(jnp.float32)),
                C + w[:, None] * a[18:21][None, :],
                N + w[:, None] * a[14:17][None, :],
                D + w * d_f, D2 + w * d_f * d_f, M1_n, M2_n, dist_n,
                mm_n,
                jnp.where(acc, k.astype(jnp.float32), ncon),
                mcon_n,
            )
            return state_n, None

        ks = jnp.arange(1, max_pairs_per_tile + 1, dtype=jnp.int32)
        (T, done, C, N, D, D2, M1, M2, dist, mm, ncon, mcon), _ = lax.scan(
            step, state0, (tile_attrs, valid, ks))
        geo_std = D2 - 2 * mm * D + mm * mm * (1 - T)
        out = jnp.stack(
            [C[:, 0] + T * bg[0], C[:, 1] + T * bg[1], C[:, 2] + T * bg[2],
             D, 1 - T, N[:, 0], N[:, 1], N[:, 2], mm,
             geo_std if use_sa else dist,
             T, M1, M2, ncon, mcon, done], axis=0)
        return out

    outs = []
    for t in range(grid.num_tiles):
        px, py = tile_pixel_coords(grid, t)
        outs.append(render_one_tile(binning.tile_start[t],
                                    binning.tile_stop[t],
                                    px[0], py[0]))
    return jnp.stack(outs, axis=0)


def tiles_to_image(
    tiled: jnp.ndarray, grid: TileGrid, height: int, width: int
) -> jnp.ndarray:
    """[num_tiles, OUT_C, P] -> [OUT_C, H, W] (crops tile padding)."""
    t, c, p = tiled.shape
    assert t == grid.num_tiles and p == grid.pixels_per_tile
    img = tiled.reshape(grid.tiles_y, grid.tiles_x, c, grid.block_h, grid.block_w)
    img = img.transpose(2, 0, 3, 1, 4).reshape(
        c, grid.tiles_y * grid.block_h, grid.tiles_x * grid.block_w
    )
    return img[:, :height, :width]


@functools.partial(jax.jit, static_argnames=("grid",))
def frame_to_tiles(color: jnp.ndarray, depth: jnp.ndarray,
                   grid: TileGrid) -> jnp.ndarray:
    """[H, W, 3] color + [H, W] depth -> tile-major [T, 4, P], as ONE
    compiled program (the per-frame un-jitted concat+pad+transpose chain
    costs ~6 dispatches through the tunneled device)."""
    img = jnp.concatenate(
        [color.transpose(2, 0, 1), depth[None]], 0)
    return image_to_tiles(img, grid)


def image_to_tiles(img: jnp.ndarray, grid: TileGrid) -> jnp.ndarray:
    """[C, H, W] -> tile-major [num_tiles, C, P], zero-padding edges."""
    c, h, w = img.shape
    ph = grid.tiles_y * grid.block_h - h
    pw = grid.tiles_x * grid.block_w - w
    img = jnp.pad(img, ((0, 0), (0, ph), (0, pw)))
    img = img.reshape(c, grid.tiles_y, grid.block_h, grid.tiles_x, grid.block_w)
    return img.transpose(1, 3, 0, 2, 4).reshape(
        grid.num_tiles, c, grid.pixels_per_tile
    )
