"""Test environment: 8 virtual CPU devices so sharding tests run anywhere.

The container's sitecustomize imports jax and registers the axon TPU
backend at interpreter startup with JAX_PLATFORMS=axon — but backends
initialize lazily, so overriding jax.config before the first device
access still works (SURVEY.md §4: JAX simulates multi-host topologies
via --xla_force_host_platform_device_count on the CPU platform).
"""

import os
import pathlib

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: the suite is dominated by XLA compiles of
# grad-of-scan programs; caching them makes re-runs (and xdist workers
# hitting the same shapes) near-instant.
_cache_dir = pathlib.Path(__file__).parent / ".jax_cache"
_cache_dir.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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
