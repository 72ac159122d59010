"""Nearest-neighbor initial-scale estimation (simple-knn replacement).

The reference's `distCUDA2` (external simple-knn CUDA submodule, used at
scene/Gaussians.py:77 when no depth-derived scale is given) returns the
mean squared distance to each point's 3 nearest neighbors. The SLAM
pipeline always passes a depth-derived scale so this is a compatibility
path; still, it is provided TPU-native: a voxel-hash bucketing + sorted
neighborhood scan, fully vectorized (no per-point loops).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


@functools.partial(jax.jit, static_argnames=("k", "window"))
def mean_knn_sq_dist(points: jnp.ndarray, k: int = 3,
                     window: int = 8) -> jnp.ndarray:
    """Approximate mean squared distance to the k nearest neighbors.

    Points are sorted along a Z-order-like key; each point's candidate
    set is the ``2*window`` neighbors in the sorted order — exact enough
    for scale initialization (distCUDA2 itself is approximate: it uses
    a space-filling-curve neighborhood too).
    """
    n = points.shape[0]
    lo = jnp.min(points, axis=0)
    hi = jnp.max(points, axis=0)
    ext = jnp.maximum(hi - lo, 1e-6)
    q = ((points - lo) / ext * 1023.0).astype(jnp.int32)  # 10 bits/axis

    def spread(x):  # interleave bits -> morton key
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    key = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    order = jnp.argsort(key)
    p_sorted = points[order]

    # candidate distances to +-window sorted neighbors
    dists = []
    for off in range(1, window + 1):
        for sgn in (-1, 1):
            shifted = jnp.roll(p_sorted, sgn * off, axis=0)
            d2 = jnp.sum((p_sorted - shifted) ** 2, axis=1)
            # wrap-around pairs are bogus: mask by index validity
            idx = jnp.arange(n)
            ok = (idx + sgn * off >= 0) & (idx + sgn * off < n)
            dists.append(jnp.where(ok, d2, jnp.inf))
    d = jnp.stack(dists, axis=1)                       # [n, 2*window]
    dk = -lax.top_k(-d, k)[0]                          # k smallest
    mean_sq = jnp.mean(jnp.where(jnp.isfinite(dk), dk, 0.0), axis=1)
    out = jnp.zeros((n,), points.dtype).at[order].set(mean_sq)
    return jnp.maximum(out, 1e-7)
