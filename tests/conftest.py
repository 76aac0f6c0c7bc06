"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding tests (jax.sharding.Mesh over 8 'devices') run without TPU hardware.

Note: this image pre-imports jax at interpreter start (axon sitecustomize),
so env vars alone are too late — use jax.config.update as well.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert len(jax.devices()) == 8, jax.devices()
