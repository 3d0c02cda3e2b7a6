"""Simulation state as a pure JAX pytree.

Replaces the reference's mutable SoA device buffers + mapped OpenGL VBO
(src/FluidSimulator.h:29-44, src/FluidSimulator.cu:52-87). The entire state is
one pytree; `step` is a pure function `SimState -> SimState`, so there are no
aliasing races by construction (the reference has two: the p2/sorted_p alias
at src/FluidSimulator.cu:494 and the v/sorted_v alias at :508).

Note on particle identity: like the reference (which writes the VBO in
cell-sorted order each frame, src/FluidSimulator.cu:441-443), array slot i
refers to different physical particles across steps. `ids` carries the
original spawn index through every permutation so trajectories can be
reconstructed — the reference drops this information entirely.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SimState(NamedTuple):
    """Particle state. All arrays are float32 / int32, length n."""

    x: jax.Array      # (n, 3) positions (the reference's VBO contents)
    v: jax.Array      # (n, 3) velocities
    ids: jax.Array    # (n,)   original spawn index, permuted with the sort
    step: jax.Array   # ()     int32 step counter


class StepDiagnostics(NamedTuple):
    """Optional per-step observability (the reference has only an fps print).

    Produced by `step(..., diagnostics=True)`; everything is computed on
    device inside the same jitted program.
    """

    mean_density: jax.Array     # () mean SPH density after the solve
    max_density_err: jax.Array  # () max |rho/rho0 - 1|
    max_speed: jax.Array        # () max |v|
    n_escaped: jax.Array        # () particles outside [0, wall]^3 (int32)
    n_overflow: jax.Array       # () neighbor-table overflow drops (int32)
    plan_overflow: jax.Array    # () pallas candidate-window truncations (int32)
    nan_detected: jax.Array     # () bool, any non-finite position/velocity


def make_state(x: jax.Array, v: jax.Array | None = None) -> SimState:
    n = x.shape[0]
    if v is None:
        v = jnp.zeros_like(x)
    return SimState(
        x=x.astype(jnp.float32),
        v=v.astype(jnp.float32),
        ids=jnp.arange(n, dtype=jnp.int32),
        step=jnp.zeros((), jnp.int32),
    )
