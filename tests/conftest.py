"""Test harness config: force an 8-device virtual CPU platform.

Sharding/multi-chip tests run on a faked 8-device CPU mesh
(``xla_force_host_platform_device_count``) so the suite needs no TPU pod; the
same code paths compile for real TPU meshes unchanged.

Note: this environment's sitecustomize registers a TPU PJRT plugin in every
interpreter and pins ``jax_platforms`` to it, so the env var alone is not
enough — we must override via ``jax.config`` before any backend initializes.
Tests must NOT touch the single real chip (concurrent clients deadlock the
device tunnel; benchmarks own it).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
    assert jax.device_count() == 8


@pytest.fixture(scope="session")
def tiny_criteo():
    from xsdeepfwfm_deprecated_tpu.data import get_dataset
    field_size, train, valid, test = get_dataset("tiny-criteo")
    return field_size, train, valid, test


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
