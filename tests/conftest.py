"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on virtual CPU devices (as the
production driver does); CPU also has native f64, so oracle parity tests
run at full precision. The axon TPU plugin in this image force-sets
JAX_PLATFORMS, so the platform is pinned via the config API, which wins.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

DATA = pathlib.Path(__file__).parent / "data"


@pytest.fixture(scope="session")
def data_path():
    return DATA
