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
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
