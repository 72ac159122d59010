#!/usr/bin/env python
"""Compare pair->gaussian gradient-reduction strategies on the device.

*** WARNING: strategies B/D use multi-operand payload sorts, which are
*** CONFIRMED (twice) to wedge the axon TPU runtime indefinitely and
*** can take the device pool down for ~1h. Run B/D only with
*** BENCH_REDUCE_UNSAFE=1, and never on a pool other people share.

  A. sort(keys, iota) + wide row-gather   (current slab_scatter_grads)
  B. sort(keys, 24 payload columns)       (direct payload sort)
  C. sort(keys, iota) + 24 x 1-col gathers
  D. B but payload packed as 12 x 2-col   (vary operand count)
"""
import os
import sys
import time

UNSAFE = bool(os.environ.get("BENCH_REDUCE_UNSAFE"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

TOTAL = int(os.environ.get("BR_TOTAL", 9 * 262144))
R = int(os.environ.get("BR_R", 1048576))
C = 24
N = 262144
D = TOTAL // N

probe = jax.jit(lambda a: a.ravel()[0])


def bench(name, fn, *args, reps=5):
    out = fn(*args)
    float(probe(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(probe(jax.tree.leaves(out)[0]))
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name:44s} {dt:8.2f} ms")


def main():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    pair_slab = jax.random.permutation(k1, TOTAL)[:R].astype(jnp.int32)
    # tail = complement; emulate with a fresh permutation's slice for perf
    slab_tail = jax.random.permutation(k2, TOTAL)[: TOTAL - R].astype(jnp.int32)
    grads = jax.random.normal(key, (R, C), jnp.float32)
    keys = jnp.concatenate([pair_slab, slab_tail])

    @jax.jit
    def red_a(keys, grads):
        _, perm = lax.sort((keys, jnp.arange(TOTAL, dtype=jnp.int32)),
                           num_keys=1)
        gp = jnp.pad(grads, ((0, TOTAL - R), (0, 0)))
        slab = gp[perm[:TOTAL]]
        return slab.reshape(D, N, C).sum(axis=0)

    @jax.jit
    def red_b(keys, grads):
        gp = jnp.pad(grads, ((0, TOTAL - R), (0, 0)))
        ops = lax.sort((keys,) + tuple(gp[:, i] for i in range(C)),
                       num_keys=1)
        slab = jnp.stack(ops[1:], axis=-1)
        return slab.reshape(D, N, C).sum(axis=0)

    @jax.jit
    def red_c(keys, grads):
        _, perm = lax.sort((keys, jnp.arange(TOTAL, dtype=jnp.int32)),
                           num_keys=1)
        gp = jnp.pad(grads, ((0, TOTAL - R), (0, 0)))
        cols = [gp[:, i][perm] for i in range(C)]
        return jnp.stack(cols, -1).reshape(D, N, C).sum(axis=0)

    @jax.jit
    def red_d(keys, grads):
        gp = jnp.pad(grads, ((0, TOTAL - R), (0, 0)))
        g64 = jax.vmap(lambda c: c)(gp.T)  # [C, TOTAL]
        pairs = [
            lax.bitcast_convert_type(
                jnp.stack([g64[2 * i], g64[2 * i + 1]], -1), jnp.float64
            ) if False else None
            for i in range(0)
        ]
        del pairs
        # pack 2 f32 cols into 1 f64 payload -> 12 operands
        packed = [
            lax.bitcast_convert_type(
                jnp.concatenate(
                    [g64[2 * i][:, None], g64[2 * i + 1][:, None]], -1
                ),
                jnp.float64,
            ).reshape(-1)
            for i in range(C // 2)
        ]
        ops = lax.sort((keys,) + tuple(packed), num_keys=1)
        cols = []
        for p in ops[1:]:
            two = lax.bitcast_convert_type(p[:, None], jnp.float32)
            cols.append(two.reshape(-1, 2))
        slab = jnp.concatenate(cols, -1)
        return slab.reshape(D, N, C).sum(axis=0)

    a = red_a(keys, grads)
    bench("A: sort+iota then [TOTAL,24] gather", red_a, keys, grads)
    bench("C: sort+iota then 24x1col gathers", red_c, keys, grads)

    if not UNSAFE:
        print("skipping B/D (multi-operand payload sorts wedge the axon "
              "TPU runtime; set BENCH_REDUCE_UNSAFE=1 to run them)")
        return

    b = red_b(keys, grads)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    print("A == B ok")
    try:
        d = red_d(keys, grads)
        np.testing.assert_allclose(np.asarray(a), np.asarray(d), atol=1e-6)
        print("A == D ok")
    except Exception as e:  # noqa: BLE001
        print("D failed:", repr(e)[:200])
    bench("B: sort with 24 payload cols", red_b, keys, grads)
    try:
        bench("D: sort with 12 packed f64 cols", red_d, keys, grads)
    except Exception as e:  # noqa: BLE001
        print("D bench failed:", repr(e)[:200])
    # stability hammer on B
    t0 = time.perf_counter()
    out = None
    for i in range(100):
        out = red_b(keys, grads)
    float(probe(out))
    print(f"B x100 hammer ok, {(time.perf_counter()-t0)*10:.1f} ms/iter")


if __name__ == "__main__":
    main()
