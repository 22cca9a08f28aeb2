"""Test configuration: force the CPU backend with 8 virtual devices.

The container registers a remote-TPU ("axon") PJRT plugin via sitecustomize
and pins ``jax_platforms="axon,cpu"`` through ``jax.config``. Tests must run
on host CPU (fast, deterministic, and able to fake an 8-device mesh via
``--xla_force_host_platform_device_count``, mirroring the reference's
localhost-cluster test trick, SURVEY.md §4). We override the config before
any JAX backend is initialized.
"""
import os

# Must happen before the first jax backend initialization.
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert jax.default_backend() == "cpu", (
    "tests must run on the CPU backend; got " + jax.default_backend()
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
