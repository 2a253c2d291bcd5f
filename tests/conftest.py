import os

# Force an 8-device CPU mesh for all tests (multi-chip sharding validation
# without TPU hardware).  The container's axon sitecustomize pins
# JAX_PLATFORMS=axon, so the env var alone is not enough — we must override
# through jax.config before any computation runs.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
