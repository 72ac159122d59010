#!/usr/bin/env python
"""Measure whether staged H2D transfers overlap device compute on the
axon tunnel (the steady frame pays ~60 ms at the h2d fence — PERF.md).

Three probes:
  1. raw tunnel H2D bandwidth (device_put + fence, cold),
  2. device_put issued BEFORE a ~200 ms compute: if the transfer rides
     behind the compute, the post-compute fence on the staged array is
     ~free; if the tunnel serializes transfers after compute (or defers
     them to first use), the fence pays the full transfer again,
  3. same, but the staged array is CONSUMED by a jitted op dispatched
     after the compute (the production pattern: dequant-on-device).

Run on the chip: python tools/h2d_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np

from gaus_slam_tpu.utils.fence import probe_fence


def main():
    print(jax.devices())
    mb1 = np.random.randint(0, 255, (340, 600, 5), np.uint8)  # ~1 MB

    # ~200 ms of device compute at f32 matmul
    a = jnp.ones((2048, 2048), jnp.float32)

    @jax.jit
    def burn(a):
        for _ in range(40):
            a = a @ a * 1e-3
        return a

    @jax.jit
    def consume(x):
        return jnp.sum(x.astype(jnp.float32))

    r = burn(a)
    probe_fence(r)
    _ = consume(jax.device_put(mb1))
    probe_fence(_)

    # probe 1: raw H2D bandwidth
    for sz_mb in (1, 4):
        buf = np.random.randint(0, 255, (sz_mb << 20,), np.uint8)
        t0 = time.perf_counter()
        d = jax.device_put(buf)
        probe_fence(consume(d))
        dt = time.perf_counter() - t0
        print(f"h2d {sz_mb} MB cold: {dt*1000:.1f} ms "
              f"({sz_mb/dt:.1f} MB/s)")

    # probe 2: staged put before compute, fence after
    t0 = time.perf_counter()
    d = jax.device_put(mb1)
    t_put = time.perf_counter() - t0
    r = burn(a)
    probe_fence(r)
    t_burn = time.perf_counter() - t0 - t_put
    t1 = time.perf_counter()
    probe_fence(consume(d))
    t_fence = time.perf_counter() - t1
    print(f"staged-before-compute: put={t_put*1000:.1f} ms "
          f"burn={t_burn*1000:.1f} ms post-fence={t_fence*1000:.1f} ms")

    # probe 3: ten repetitions of the steady pattern
    for _ in range(3):
        frame = np.random.randint(0, 255, (340, 600, 5), np.uint8)
        d = jax.device_put(frame)
        r = burn(a)
        probe_fence(r)
        t1 = time.perf_counter()
        probe_fence(consume(d))
        print(f"steady post-compute fence: "
              f"{(time.perf_counter()-t1)*1000:.1f} ms")


if __name__ == "__main__":
    main()
