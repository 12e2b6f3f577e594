"""Test configuration: CPU backend with 8 virtual devices + float64 enabled.

Tests run on CPU (oracle precision, virtual multi-device mesh); the library
itself is dtype/backend-polymorphic and runs f32 on real TPU.

NOTE: in this environment `jax` may already be imported by a site hook before
conftest runs, so we use `jax.config.update` (valid until first backend use)
rather than relying on env vars alone.
"""

import os

# Harmless if jax is already imported; authoritative if it isn't.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compilation cache: repeat suite runs skip recompiles (the
# dominant cost of the fast tests), keeping the full gate in a ~10-min box
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(_cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
except Exception:
    pass

assert jax.default_backend() == "cpu", "tests must run on CPU"
assert len(jax.devices()) >= 8, "need 8 virtual CPU devices for mesh tests"
