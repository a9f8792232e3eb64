import os
import sys

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware; fp64 is enabled for parity-grade numerics.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_enable_x64", True)

# The axon TPU platform registers itself regardless of JAX_PLATFORMS and
# becomes the default backend; pin tests to the local host CPU backend
# explicitly (8 virtual devices via the XLA flag above).
jax.config.update("jax_default_device", jax.devices("cpu")[0])

# Persistent compilation cache: XLA compiles dominate wall time on the 2-core
# test machine; cache them across pytest runs.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
