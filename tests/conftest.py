"""Test configuration: force JAX onto CPU with 8 virtual devices.

The axon sitecustomize registers a tunneled TPU backend and overrides
JAX_PLATFORMS, so we must re-force CPU *inside* Python before the first
backend use. 8 virtual host devices let the multi-chip sharded path
(tpusph.dist) run real collectives without TPU hardware (SURVEY.md §4e).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

from tpusph.core.config import default_config  # noqa: E402


@pytest.fixture(scope="session")
def small_cfg():
    """512 particles, small chunks — fast on CPU."""
    return default_config(512, chunk_size=512, window_capacity=48)


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices("cpu")
    assert len(devs) >= 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs[:8]
