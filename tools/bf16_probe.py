#!/usr/bin/env python
"""Measure VPU elementwise throughput f32 vs bf16 on the attached chip.

Decides the round-4 "precision lever" (VERDICT r3 next #2): the 2DGS
compositor is compute-bound on ~70 VPU ops per [128, 256] chunk
(PERF.md kernel op-count audit). If the VPU runs bf16 elementwise math
at 2x the f32 rate, a bf16 compute path in composite_chunk is worth
building; if bf16 promotes to f32 lanes (1x), the lever is dead and the
measured numbers close the item.

Three chains per dtype, each a Pallas kernel over a [4096, 512] block
grid (fits VMEM per block, compute-bound):
  * fma   — 64 dependent multiply-adds (the bulk of the chunk math)
  * exp   — 8 dependent exp() (the chunk's transcendental)
  * mixed — 32 fma + 4 exp + 4 select (chunk-like mix)

Usage (TPU): python tools/bf16_probe.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcache")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 4096, 512
BLK = 512


def _kern_fma(x_ref, o_ref, *, dtype, n):
    x = x_ref[:]
    a = jnp.asarray(1.0001, dtype)
    b = jnp.asarray(1e-4, dtype)
    for _ in range(n):
        x = x * a + b
    o_ref[:] = x


def _kern_exp(x_ref, o_ref, *, dtype, n):
    x = x_ref[:]
    h = jnp.asarray(-0.5, dtype)
    one = jnp.asarray(1.0, dtype)
    for _ in range(n):
        x = jnp.exp(x * h) + one
    o_ref[:] = x


def _kern_mixed(x_ref, o_ref, *, dtype, n):
    x = x_ref[:]
    a = jnp.asarray(1.0001, dtype)
    b = jnp.asarray(1e-4, dtype)
    th = jnp.asarray(0.7, dtype)
    for i in range(n):
        x = x * a + b
        if i % 8 == 7:
            x = jnp.exp(x * jnp.asarray(-0.25, dtype))
            x = jnp.where(x > th, x * a, x)
    o_ref[:] = x


def build(kern, dtype, n):
    k = functools.partial(kern, dtype=dtype, n=n)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            k,
            grid=(H // BLK,),
            in_specs=[pl.BlockSpec((BLK, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BLK, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, W), dtype),
        )(x)

    return run


def clock(run, x, iters=50):
    r = run(x)
    float(jnp.sum(r.astype(jnp.float32)))  # fence
    t0 = time.perf_counter()
    for _ in range(iters):
        r = run(x)
    float(jnp.sum(r.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    print(f"device: {jax.devices()[0]}")
    key = jax.random.PRNGKey(0)
    base = jax.random.uniform(key, (H, W), jnp.float32, 0.5, 1.5)
    results = {}
    for name, kern, n_ops in (("fma", _kern_fma, 64), ("exp", _kern_exp, 8),
                              ("mixed", _kern_mixed, 32)):
        for dtype in (jnp.float32, jnp.bfloat16):
            x = base.astype(dtype)
            t = clock(build(kern, dtype, n_ops), x)
            gop = H * W * n_ops / t / 1e9
            results[(name, dtype.__name__)] = gop
            print(f"{name:6s} {dtype.__name__:9s} {t*1e6:8.1f} us "
                  f"{gop:8.1f} Gop/s")
    for name in ("fma", "exp", "mixed"):
        r = results[(name, "bfloat16")] / results[(name, "float32")]
        print(f"bf16/f32 speedup [{name}]: {r:.2f}x")


if __name__ == "__main__":
    main()
