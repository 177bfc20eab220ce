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

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
