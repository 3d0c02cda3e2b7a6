"""Test configuration: run everything on CPU with 8 virtual devices.

Multi-chip sharding is validated on a fake 8-device CPU mesh, per SURVEY.md
section 4 ("Multi-device without a cluster"). Must run before jax imports.
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
