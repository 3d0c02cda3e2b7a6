"""Test configuration: run everything on CPU with 8 virtual devices.

Multi-chip sharding is validated on a fake 8-device CPU mesh, per SURVEY.md
section 4 ("Multi-device without a cluster").

This environment's sitecustomize registers an `axon` TPU backend and imports
jax at interpreter startup, so env vars set here are too late — use jax
config updates (and clear any backend cache) instead.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)

from jax._src import xla_bridge as _xb  # noqa: E402

if hasattr(_xb.backends, "cache_clear"):
    _xb.backends.cache_clear()

assert jax.device_count() == 8, jax.devices()
