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

from pdb_sph_tpu.utils.platform import force_cpu_devices  # noqa: E402

jax.config.update("jax_enable_x64", False)
force_cpu_devices(8)
# NOTE: do NOT enable the persistent compilation cache here — serializing
# the giant fake-mesh scan executables (max_occ=2048 soak shapes) to disk
# measured 2.5x+ SLOWER than recompiling them (round 5: the soak test went
# from ~60 min to not finishing in 150); the cache pays off only for the
# TPU programs the benches compile
assert jax.device_count() == 8, jax.devices()
