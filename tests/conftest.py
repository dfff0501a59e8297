"""Test configuration: CPU backend with 8 virtual devices for sharding tests.

The container's sitecustomize registers the axon TPU backend and pins
JAX_PLATFORMS=axon; tests must run on CPU (fast local compiles, virtual
8-device mesh), so we override via jax.config before any backend init.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# Clear the axon pool for every CHILD process the suite spawns: with it
# set, sitecustomize registers the axon PJRT plugin in each subprocess,
# and when the TPU tunnel is down that registration blocks in jaxlib's
# 1/s connect-retry loop forever (observed: the converter-CLI test hung
# the whole suite). The suite is CPU-only by design, so no child needs it.
os.environ["PALLAS_AXON_POOL_IPS"] = ""

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the suite is dominated by CPU jit compiles
# (single core); reruns hit the cache and finish in a fraction of the time.
jax.config.update("jax_compilation_cache_dir", "/tmp/neuman_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synthetic_scene_dir(tmp_path_factory):
    from tests.fixtures import build_synthetic_scene

    root = tmp_path_factory.mktemp("scene_data")
    return build_synthetic_scene(root)


@pytest.fixture(scope="session")
def smpl_data_root(synthetic_scene_dir):
    """NEUMAN_DATA_ROOT pointing at the synthetic SMPL model."""
    root = os.path.dirname(synthetic_scene_dir)
    os.environ["NEUMAN_DATA_ROOT"] = os.path.join(root, "data")
    return os.path.join(root, "data")
