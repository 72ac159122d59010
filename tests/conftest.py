"""Test configuration: force an 8-device virtual CPU mesh.

All unit tests run on CPU (with 8 virtual devices so sharding tests can
exercise real collectives); tests marked `tpu` are skipped unless a TPU
is attached and JAX_PLATFORMS is not forced to cpu.
"""
import os

# Force assignment (not setdefault): the agent shell exports
# JAX_PLATFORMS=axon (the TPU tunnel), and unit tests must not silently
# run over it — TPU default matmul precision and tunnel latency break
# the tolerance assumptions here. Also drop the axon pool env so the
# sitecustomize PJRT registration doesn't touch the tunnel at all.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# The env assignment above is too late when a sitecustomize has already
# imported jax (its config snapshot of JAX_PLATFORMS wins) — override the
# live config too, before any backend is initialized by the tests. Also
# note XLA_FLAGS is read at first backend init, which has not happened
# yet at conftest import time.
jax.config.update("jax_platforms", "cpu")


def pytest_collection_modifyitems(config, items):
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    skip_tpu = pytest.mark.skip(reason="requires TPU hardware")
    for item in items:
        if "tpu" in item.keywords and not on_tpu:
            item.add_marker(skip_tpu)

# Unit tests run with 8 VIRTUAL cpu devices (above) — without this the
# drivers' tpu.mesh_devices="auto" would shard every e2e test's backend
# over the virtual mesh, changing schedules and runtimes. The dedicated
# mesh tests (test_parallel, test_mesh_e2e) opt in explicitly.
os.environ.setdefault("MESH_DEVICES", "off")

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
