"""Test configuration: run everything on an 8-device virtual CPU mesh so the
sharding code paths (shard_map/pjit) are exercised without TPU hardware."""

import os

# Force CPU: the surrounding environment pins JAX_PLATFORMS=axon (the real
# TPU tunnel), which is slow for eager unit tests and has only one chip.
# An 8-device virtual CPU mesh exercises the sharding paths instead.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon site hook force-selects the TPU platform even over the env var,
# so pin the platform through the config API as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavy end-to-end tests (parity renders, MLT "
        "convergence); deselect with `-m 'not slow'` for the fast tier"
    )
