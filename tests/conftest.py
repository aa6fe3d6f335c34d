"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the standard JAX trick for testing multi-chip sharding without
hardware (SURVEY.md §4.4): the env vars must be set before jax is imported
anywhere in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
