"""On-hardware numerics tests (VERDICT r4 next-round #5).

Unlike tests/conftest.py these do NOT force the CPU backend: they exist to
exercise the pallas path at real TPU (bf16 MXU) precision, where the r4
SSIM collapse happened. Run in the bench environment:

    python -m pytest tests_tpu -q

On a machine without a TPU they still run (jnp fallback) but the pallas
parity assertions are skipped.
"""

import jax
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu_only: requires the real TPU backend (skipped on CPU)")


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() != "tpu":
        marker = pytest.mark.skip(reason="requires TPU backend")
        for item in items:
            if "tpu_only" in item.keywords:
                item.add_marker(marker)
