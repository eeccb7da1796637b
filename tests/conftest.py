"""Test config: force an 8-device virtual CPU mesh before JAX initializes.

Mirrors the reference's strategy of testing multi-worker behavior on a single
node (reference tests/unit_tests/test_worker.py:42-58 launches a local Ray
cluster); here multi-chip behavior is tested with
``--xla_force_host_platform_device_count=8`` on CPU.
"""

import os

# The session environment may pin JAX_PLATFORMS to the real TPU backend (and a
# sitecustomize may re-pin it after import); tests always run on the virtual
# 8-device CPU mesh, so override both the env var and the live config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs
