"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths compile and execute without TPU hardware.

Note: the environment pre-imports jax via sitecustomize (axon TPU tunnel),
so JAX_PLATFORMS env vars set here would be ignored — we must update the
jax config programmatically before any backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
