"""Test configuration: force JAX onto a virtual 8-device CPU mesh so all
sharding/multi-chip logic runs in CI without TPU hardware
(SURVEY.md §4: multi-host tests via xla_force_host_platform_device_count)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"   # force: the image presets axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The image's sitecustomize registers the axon (TPU-tunnel) PJRT plugin and
# programmatically sets jax_platforms="axon,cpu", overriding the env var —
# override it back after import so tests run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def tiny_model():
    from partsbaseddetector_tpu.models import synthetic
    return synthetic.tiny()


@pytest.fixture(scope="session")
def person_model():
    from partsbaseddetector_tpu.models import synthetic
    return synthetic.person_like()
