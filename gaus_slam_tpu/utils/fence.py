"""Scalar-probe fence for the tunneled device.

``jax.block_until_ready`` does not drain the axon TPU tunnel; fetching
ONE scalar does. Pulling a single element (rather than ``np.asarray`` on
the whole array) avoids timing the host transfer instead of the compute.
This is the single home of that recipe — profiling marks and bench
warm-up fences all go through here.
"""
from __future__ import annotations

import jax

_probe = jax.jit(lambda x: x.ravel()[0])


def probe_fence(x) -> float:
    """Drain the device work queue; returns ``float(x.ravel()[0])``."""
    return float(_probe(x))
