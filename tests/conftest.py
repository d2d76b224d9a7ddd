"""Test configuration: run every test on CPU with 8 virtual devices.

This is the TPU-native analog of a "fake backend": sharding/pjit code paths
are exercised on an 8-device CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8), so multi-chip logic is
validated without TPU hardware.  Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Some environments pre-register a TPU plugin from sitecustomize and pin
# jax_platforms before conftest runs; the config update (not just the env
# var) is what actually forces the CPU backend then.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert len(jax.devices()) == 8, (
    f"tests expect 8 virtual CPU devices, got {jax.devices()}"
)

import pytest  # noqa: E402


def pytest_collection_modifyitems(items):
    """Tier the suite: anything not explicitly marked heavy/slow is fast.

    `pytest -m fast` is the bounded-time tier (<120 s, covers every
    module); `pytest -m "heavy and not slow"` the mid tier; `-m slow`
    the reference-parity subprocess tests.  Plain `pytest tests/` runs
    everything (timing documented in README)."""
    for item in items:
        if not any(m.name in ("heavy", "slow") for m in item.iter_markers()):
            item.add_marker(pytest.mark.fast)
