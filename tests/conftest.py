"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU (deterministic, no TPU needed); multi-chip sharding
tests see 8 virtual devices via XLA_FLAGS. A persistent compilation cache
keeps repeated test runs fast.
"""

import os

# force-set: the environment's sitecustomize exports JAX_PLATFORMS=axon (the
# tunneled TPU); tests must run on the virtual CPU mesh
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/fedicra_tpu/jax"))
os.environ.setdefault(
    "JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1"
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax  # noqa: E402

# the environment's sitecustomize registers the tunneled-TPU backend at
# interpreter start, before this conftest runs; the config update (unlike
# the env var) reliably pins the test backend to the virtual CPU mesh
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", False)
assert jax.default_backend() == "cpu", jax.default_backend()
