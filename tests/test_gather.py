"""Unit tests for the banded monotone row gather kernel (ops/gather.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaus_slam_tpu.ops.gather import monotone_row_gather


@pytest.mark.parametrize("seed,d_max", [(0, 4), (1, 9), (2, 1)])
def test_matches_xla_gather(seed, d_max):
    rng = np.random.default_rng(seed)
    n = 512
    steps = rng.integers(0, d_max + 1, size=n)
    pos = np.clip(np.cumsum(steps) - 1, 0, None).astype(np.int32)
    r = -(-int(pos[-1] + 1) // 128) * 128
    data = rng.standard_normal((r, 24)).astype(np.float32)
    out = monotone_row_gather(
        jnp.asarray(data.T), jnp.asarray(pos), max_step=d_max, interpret=True
    ).T
    np.testing.assert_allclose(np.asarray(out), data[pos], rtol=0, atol=0)


def test_all_equal_positions():
    # degenerate: every output row reads the same source row
    data = np.arange(128 * 8, dtype=np.float32).reshape(128, 8)
    pos = np.full((256,), 7, np.int32)
    out = monotone_row_gather(
        jnp.asarray(data.T), jnp.asarray(pos), max_step=4, interpret=True
    ).T
    np.testing.assert_array_equal(np.asarray(out), data[pos])


def test_band_clamp_at_tail():
    # positions at the very end of the data array exercise the lo clamp
    r, n = 256, 128
    rng = np.random.default_rng(3)
    data = rng.standard_normal((r, 8)).astype(np.float32)
    pos = np.minimum(np.arange(n, dtype=np.int32) + (r - n), r - 1)
    out = monotone_row_gather(
        jnp.asarray(data.T), jnp.asarray(pos), max_step=2, interpret=True
    ).T
    np.testing.assert_array_equal(np.asarray(out), data[pos])
