"""Platform helpers shared by the CLI, benches, tests, and driver entry.

Two environment-specific dances live here so they exist exactly once:
backend auto-selection, and forcing an n-device CPU platform for multi-chip
validation when jax may already have been imported at interpreter startup
(this environment's sitecustomize registers a TPU backend that way, making
`XLA_FLAGS=--xla_force_host_platform_device_count=N` too late).
"""

from __future__ import annotations

import jax

# platforms whose Mosaic path runs the Pallas kernels
_ACCELERATED = ("tpu", "axon")


def auto_backend() -> str:
    """The production solver for this process's default device."""
    return "pallas" if jax.default_backend() in _ACCELERATED else "cell"


def force_cpu_devices(n: int) -> None:
    """Make jax see an n-device CPU platform, even if a backend was already
    initialized. Must run before any array lands on a device."""
    from jax._src import xla_bridge as _xb

    def clear():
        if hasattr(_xb.backends, "cache_clear"):
            _xb.backends.cache_clear()

    clear()
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n)
    clear()
    assert jax.device_count() >= n, jax.devices()
