"""Test config: force an 8-device virtual CPU platform for sharding tests.

Must run before jax is imported anywhere (hence top of conftest).  The
environment's axon sitecustomize exports JAX_PLATFORMS=axon; tests override
it unconditionally — the real-TPU path is exercised by bench.py, not pytest.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
