"""Test configuration: run everything on a virtual 8-device CPU mesh.

The driver benches on real TPU; tests validate numerics + sharding on CPU
(SURVEY.md §4 implications: single-host-vs-multi-host equivalence needs a
virtual mesh).  x64 is enabled so kernels can be checked against float64
oracles; the library itself is dtype-polymorphic.
"""
import os

# Force CPU: the sandbox pins JAX_PLATFORMS=axon (tunneled TPU) which is far
# too slow for many-tiny-op unit tests; benches run on the real chip instead.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The sandbox's sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon baked in, so the env var alone is not enough.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# NOTE: do NOT enable jax_compilation_cache_dir here — writing CPU
# executables to the persistent cache segfaults this jaxlib (0.9.0) on some
# solver programs (crash inside put_executable_and_time / serialize).

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
