"""Test configuration: force CPU with an 8-device virtual mesh.

Tests never require TPU hardware; multi-chip sharding is validated on a
virtual CPU mesh (xla_force_host_platform_device_count=8) per the project
test strategy (SURVEY.md §4: the reference has no tests — we build parity
tests against torch-CPU oracles and analytic values).
"""

import os

# The sandbox presets JAX_PLATFORMS=axon (remote TPU tunnel) and its
# sitecustomize calls jax.config.update("jax_platforms", "axon,cpu"), which
# overrides the env var — so force CPU through jax.config too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
