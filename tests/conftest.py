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

import pathlib  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# tests/slow_tests.txt lists every test whose call time exceeds ~10 s on
# the CI CPU (regenerated from --durations=0 output); they are auto-marked
# `slow` here so `-m "not slow"` gives a <5-minute iteration gate while the
# unfiltered suite stays the full matrix of record.
_SLOW = set()
for _line in (
    (pathlib.Path(__file__).parent / "slow_tests.txt").read_text().splitlines()
):
    _line = _line.strip()
    if _line and not _line.startswith("#"):
        _SLOW.add(_line)


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = getattr(item, "originalname", None) or item.name
        key = f"{pathlib.Path(item.fspath).name}::{name}"
        if key in _SLOW:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
