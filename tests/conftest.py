"""Test configuration: run everything on an 8-device virtual CPU mesh.

Mirrors the spirit of the reference's conftest (which globally disables
torch.compile, ``test/unit/test_cpu/conftest.py:1-6``): we pin JAX to CPU
with 8 virtual devices so sharding/collective paths are exercised without
TPU hardware, and keep x64 off (TPU parity).
"""

import os

# Force CPU: the container pre-sets JAX_PLATFORMS=axon (TPU tunnel) and its
# sitecustomize re-forces the platform via jax.config at interpreter start,
# so both the env var AND a post-import config.update are required.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

# Persistent compilation cache: the smoke tier's budget is dominated by
# XLA:CPU compiles of the same executables every run; a warm cache
# (~/.cache by default, override with AR_TEST_COMPILE_CACHE) cuts the
# measured smoke wall-clock ~2x on the second run.
_cache_dir = os.environ.get(
    "AR_TEST_COMPILE_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "autoround_tpu_jit"))
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def pytest_collection_modifyitems(config, items):
    """Tier the suite (reference tiers unit/integration/e2e,
    ``test/integration/README.md:16-22``; the full 595+ suite needs
    several 10-minute chunks on this 8-device CPU mesh):

      * ``-m smoke``  — the FIRST test of every class/module (one
        representative per subsystem feature, parametrizations deduped),
        minus anything explicitly ``slow``; ~11.5 min measured warm on an
        idle container (round 4, 216 tests).
      * ``-m "not slow"`` — everything but the explicitly slow tests.
      * (no marker)   — the whole suite.
    """
    seen = set()
    for item in items:
        if item.get_closest_marker("slow"):
            continue
        cls = item.cls.__name__ if item.cls is not None else None
        key = (item.module.__name__, cls)
        if key not in seen:
            seen.add(key)
            item.add_marker(pytest.mark.smoke)
