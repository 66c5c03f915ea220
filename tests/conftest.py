"""Test harness: run JAX on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's strategy — multi-chip (DP/psum) logic must run in CI
without TPUs, via `--xla_force_host_platform_device_count` host emulation.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("DARKNET_TPU_NO_GUI", "1")   # no imshow windows in CI
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the axon TPU plugin ignores JAX_PLATFORMS; the config update is honored
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture
def fixtures_dir():
    return FIXTURES
