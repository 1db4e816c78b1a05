"""Test configuration: run on a virtual 8-device CPU mesh.

Mirrors the reference's CPU-only CI (reference .github/workflows/tests.yaml)
while additionally exercising multi-device sharding on virtual devices.
NOTE: the JAX_PLATFORMS env var is ignored when the axon TPU platform plugin
is registered; ``jax.config.update('jax_platforms', ...)`` wins, so we use it.
XLA flags must still be set before the backend initializes.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call_terminate_timeout" not in flags:
    # XLA:CPU kills a collective when participants arrive > 40 s apart; on a
    # single-core host the 8 virtual devices run serialized, so the
    # full-depth multichip EXECUTION test (test_multichip_fulldepth.py)
    # needs the rendezvous timeout raised well past one device's step time
    flags = (flags +
             " --xla_cpu_collective_call_terminate_timeout_seconds=7200")
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite is compile-bound (the e2e parity
# test alone spends ~8 min tracing+compiling the full PoseNet on CPU) — a
# warm cache cuts the full tier to a fraction. Keyed by JAX/XLA version, so
# safe to persist across CI runs (actions/cache in tests.yaml).
_cache_dir = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
