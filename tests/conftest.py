"""Test config: force an 8-device virtual CPU platform for sharding tests.

The environment's axon sitecustomize registers the TPU PJRT plugin at
interpreter startup and exports JAX_PLATFORMS=axon, so env-var overrides
here are too late for jax's latched config.  `jax.config.update` still
works after import (no backend has been initialized yet at conftest time),
so we force the platform explicitly — the real-TPU path is exercised by
bench.py, not pytest.  The 8-device mesh is load-bearing: sharded tests
FAIL (not skip) if it is absent.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) >= 8, (
    "test environment must expose 8 virtual CPU devices; got "
    f"{jax.devices()} — sharded tests cannot be skipped silently"
)
