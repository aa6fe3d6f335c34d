"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the standard JAX trick for testing multi-chip sharding without
hardware (SURVEY.md §4.4). The environment in this image pins
``JAX_PLATFORMS=axon`` (the TPU tunnel) and a sitecustomize hook imports
jax at interpreter start, so we must both override the env var *and*
update the config after import — backends are initialized lazily, so
this still takes effect as long as no computation ran yet.
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
jax.config.update("jax_enable_x64", False)

# persistent compilation cache: UNet train-step compiles dominate suite
# wall time (~12min cold); warm runs reuse them
from infodiffusion_tpu.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache(os.path.expanduser("~/.cache/infodiff_xla_cpu"))

assert jax.default_backend() == "cpu"
assert jax.local_device_count() == 8
