"""Test harness: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers the `axon` TPU platform and
forces it programmatically, so env vars alone are not enough — we must
override via jax.config before any computation runs.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"

# Persistent compilation cache: compilation dominates the suite's wall
# clock (VERDICT r1 #3); with the cache a full re-run is minutes faster.
from sr_livo_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache(os.path.join(os.path.dirname(__file__), "..",
                                      ".jax_test_cache"))
