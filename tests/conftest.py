"""Test harness: force CPU execution with a virtual 8-device mesh.

The standard JAX trick for testing sharding without hardware
(SURVEY.md §4): xla_force_host_platform_device_count=8 fakes an 8-device
CPU platform, so shard_map population/tile sharding and collectives run in
CI. The axon TPU plugin in this image ignores JAX_PLATFORMS, so we also pin
jax_default_device to CPU explicitly.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_device", jax.devices("cpu")[0])

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.PRNGKey(42)


def cpu_devices(n: int):
    devs = jax.devices("cpu")
    assert len(devs) >= n, f"need {n} cpu devices, have {len(devs)}"
    return devs[:n]
