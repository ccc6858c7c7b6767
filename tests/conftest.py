"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set the env vars before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# the axon TPU plugin force-sets jax_platforms at import registration, which
# beats the env var; override it back before any backend is initialized
import jax

jax.config.update("jax_platforms", "cpu")
