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
import jax  # noqa: E402

# the environment's sitecustomize registers the tunneled-TPU backend at
# interpreter start, before this conftest runs; config updates (unlike the
# env vars, which latch at jax-import time) reliably pin the test backend
# to the virtual CPU mesh and enable the persistent compile cache
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", False)
assert jax.default_backend() == "cpu", jax.default_backend()

from fedicra_tpu.utils.jit_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
