"""Test configuration: force CPU JAX with 8 virtual devices so sharding
tests run without TPU hardware (SURVEY.md §4's multi-host test strategy).

Note: the JAX_PLATFORMS env var is not honored in this environment (a TPU
platform plugin overrides it), so the backend is forced via jax.config
before any computation runs.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# the package wires the persistent compile cache to the host-CPU-namespaced
# .jax_cache/<machine-tag>/ subdir (safe against cross-machine AOT reuse)
import booster_gym_tpu  # noqa: E402, F401

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def t1_model():
    from booster_gym_tpu.model import load_urdf

    return load_urdf("/root/reference/resources/T1/T1_locomotion.urdf")
