"""Test configuration: run everything on CPU with 8 virtual devices.

Multi-chip sharding is validated on a fake 8-device CPU mesh, per SURVEY.md
section 4 ("Multi-device without a cluster").

This environment's sitecustomize registers an `axon` TPU backend and imports
jax at interpreter startup, so env vars set here are too late — use jax
config updates (and clear any backend cache) instead.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from pdb_sph_tpu.utils.platform import (enable_compilation_cache,  # noqa: E402
                                        force_cpu_devices)

jax.config.update("jax_enable_x64", False)
force_cpu_devices(8)
# the slow tests are dominated by fake-mesh shard_map compiles; the
# persistent cache makes repeat suite runs pay them once
enable_compilation_cache()
assert jax.device_count() == 8, jax.devices()
