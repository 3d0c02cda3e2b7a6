"""Finalize: velocity update + box collision response.

Reproduces `updatePositions` (src/FluidSimulator.cu:345-445) exactly,
including its *sequential* wall order — y-floor, y-ceiling, x-floor, z-floor,
x-ceiling, z-ceiling (:362-439) — because each wall test reads the position
and velocity as modified by the previous one. Per wall, when the coordinate
is past the wall and its velocity component is nonzero:

    tColl   = (pos[axis] - wall) / vel[axis]          # time since impact
    pos    -= vel * (1 - collDamp) * tColl            # rewind, all 3 axes
    pos[axis] = 2*wall - pos[axis]                    # positional mirror
    vel[axis] *= -1                                   # reflect
    vel    *= collDamp                                # damp, all 3 axes

The whole thing is elementwise over particles, so on TPU it is a handful of
fused VPU ops — no branching, the `where` chains mirror the CUDA `if`s.

Two deliberate divergences from the reference (documented latent bug,
SURVEY.md section 3 spirit): the reference's wall test fires on `v != 0`,
so a particle that is *outside* but moving back inward (possible when a
late wall's cross-axis rewind ejected it through an earlier-checked wall)
gets mirrored back OUT — observed on hardware as a particle oscillating
around -1.4 with ever-damped velocity. Here a bounce requires *outward*
velocity, which is identical for every genuine crossing (the rewind and
damping never flip another axis's sign), and a final clamp guarantees the
box invariant even for pathological multi-wall states.

Both divergences are gated: `SimConfig.strict_reference_collide=True`
restores the reference's exact `v != 0` test and drops the clamp, for
bit-level fidelity studies against the reference semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SimConfig

# (axis, is_upper) in the reference's exact order (src/FluidSimulator.cu:362-439)
_WALL_ORDER = ((1, False), (1, True), (0, False), (2, False), (0, True), (2, True))


def _bounce(cfg: SimConfig, pos, vel, axis: int, upper: bool):
    w = jnp.float32(cfg.wall if upper else 0.0)
    cd = jnp.float32(cfg.collision_damp)
    pa, va = pos[:, axis], vel[:, axis]
    if cfg.strict_reference_collide:
        # reference test: past the wall and moving at all (:362,:375,...)
        hit = (pa > w if upper else pa < w) & (va != 0.0)
    else:
        hit = (pa > w) & (va > 0.0) if upper else (pa < w) & (va < 0.0)

    t_coll = (pa - w) / jnp.where(va == 0.0, 1.0, va)
    pos_rw = pos - vel * ((1.0 - cd) * t_coll)[:, None]
    pos_rw = pos_rw.at[:, axis].set(2.0 * w - pos_rw[:, axis])
    vel_rf = vel.at[:, axis].multiply(-1.0) * cd

    pos = jnp.where(hit[:, None], pos_rw, pos)
    vel = jnp.where(hit[:, None], vel_rf, vel)
    return pos, vel


def finalize(cfg: SimConfig, p: jax.Array, last_frame: jax.Array):
    """v = (p - last_frame)/dt, then the 6 sequential wall responses.

    Returns (x_new, v_new) — the reference writes x into the mapped VBO
    (:441-443) and keeps v for the next step.
    """
    v = (p - last_frame) / jnp.float32(cfg.dt)
    for axis, upper in _WALL_ORDER:
        p, v = _bounce(cfg, p, v, axis, upper)
    if not cfg.strict_reference_collide:
        # box-invariant safety net (see module docstring)
        p = jnp.clip(p, 0.0, jnp.float32(cfg.wall))
    return p, v
