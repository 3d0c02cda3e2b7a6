"""Predictor (semi-implicit Euler) — the reference's `explictEuler` kernel.

src/FluidSimulator.cu:198-216: save last-frame x, apply gravity, apply the
global velocity damping, predict p = x + dt*v.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SimConfig


def predict(cfg: SimConfig, x: jax.Array, v: jax.Array):
    """Returns (p_predicted, v_predicted); callers keep x as last_frame."""
    g = jnp.array([0.0, cfg.gravity, 0.0], jnp.float32)
    v1 = (v + jnp.float32(cfg.dt) * g) * jnp.float32(cfg.velocity_damp)
    p = x + jnp.float32(cfg.dt) * v1
    return p, v1
