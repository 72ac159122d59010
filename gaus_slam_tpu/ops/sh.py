"""Spherical-harmonics <-> RGB helpers (reference utils/sh_utils.py).

The SLAM pipeline hardwires use_sh=False (scene/Gaussians.py:39) and
stores per-gaussian RGB directly; these conversions are kept for
checkpoint interop with SH-based 3DGS tooling.
"""
import jax.numpy as jnp

C0 = 0.28209479177387814


def rgb_to_sh(rgb):
    return (rgb - 0.5) / C0


def sh_to_rgb(sh):
    return sh * C0 + 0.5
