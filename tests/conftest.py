"""Test environment: 8 virtual CPU devices so sharding tests run anywhere.

The container's sitecustomize imports jax and registers the axon TPU
backend at interpreter startup with JAX_PLATFORMS=axon — but backends
initialize lazily, so overriding jax.config before the first device
access still works (SURVEY.md §4: JAX simulates multi-host topologies
via --xla_force_host_platform_device_count on the CPU platform).
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402

from computeraytracer_tpu.scene import presets, scene_from_dict  # noqa: E402


@pytest.fixture(scope="session")
def simple_scene():
    scene, meta = scene_from_dict(presets.simple_scene(64, 64))
    return scene


@pytest.fixture(scope="session")
def cornell_scene():
    scene, meta = scene_from_dict(presets.cornell_box(64, 64))
    return scene
