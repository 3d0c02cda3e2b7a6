"""Named scenes (initial conditions).

The reference has exactly one spawner in code — uniform random positions in
the unit cube with zero velocity (`RandomPositionStart`,
src/FluidSimulator.cu:138-149, using libc rand) — and two more scenes
described in its README (README.md:9-13): a dam break and a "blowup" where
all particles spawn within a 0.5-unit radius. All three are first-class,
reproducible (jax.random) scenes here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..state import SimState, make_state


def standard(cfg: SimConfig, key: jax.Array) -> SimState:
    """Uniform random in the cube [0, wall/2)^3, v = 0.

    At the reference box (wall=2, src/FluidSimulator.cu:358) this is exactly
    the reference's unit-cube spawn (src/FluidSimulator.cu:138-149), already
    at rest density for n=80k (n * integral(W_poly6) ~= rho0 — which is why
    the reference picked rho0 = 6378). Spawn extents are defined RELATIVE to
    the box so a scaled run (bigger wall, more particles, same number
    density) is the same scene, not an overpacked blob.
    """
    x = jax.random.uniform(key, (cfg.n, 3), jnp.float32) * (0.5 * cfg.wall)
    return make_state(x)


def dam_break(cfg: SimConfig, key: jax.Array) -> SimState:
    """A rest-density column against the x=0 wall:
    [0, wall/4] x [0, wall] x [0, wall/2].

    At the reference box (wall=2) that is [0,0.5]x[0,2]x[0,1] — volume 1.0,
    so 80k particles sit at the same number density as the standard scene;
    releasing it produces the README's dam-break flood (README.md:9). The
    box-relative extents keep any (n, wall) pair with n/wall^3 = 10k at
    rest density (the scaled 1M configuration uses wall = 2*(n/80k)^(1/3)).
    """
    u = jax.random.uniform(key, (cfg.n, 3), jnp.float32)
    w = cfg.wall
    scale = jnp.array([0.25 * w, w, 0.5 * w], jnp.float32)
    return make_state(u * scale)


def blowup(cfg: SimConfig, key: jax.Array) -> SimState:
    """All particles inside a wall/4-radius ball at the box center.

    At the reference box (wall=2) that is exactly the README's 0.5-unit
    radius (README.md:13). The density constraint saturates (~15x rest
    density at n/wall^3 = 10k) and the system explodes, then recovers
    toward equilibrium — the reference's stress test for solver stability.
    Box-relative like the other scenes: a scaled run (the 1M blowup row,
    wall = 2*(n/80k)^(1/3)) reproduces the same 15x compression instead of
    an ever-denser blob.
    """
    knorm, kr = jax.random.split(key)
    d = jax.random.normal(knorm, (cfg.n, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    # radius ~ U^(1/3) for uniform density in the ball
    r = (0.25 * cfg.wall
         * jax.random.uniform(kr, (cfg.n, 1), jnp.float32) ** (1.0 / 3.0))
    center = jnp.full((3,), 0.5 * cfg.wall, jnp.float32)
    return make_state(center + d * r)


SCENE_FNS = {
    "standard": standard,
    "dam_break": dam_break,
    "blowup": blowup,
}


def spawn(cfg: SimConfig, scene: str, seed: int = 0) -> SimState:
    if scene not in SCENE_FNS:
        raise ValueError(f"unknown scene {scene!r}; have {sorted(SCENE_FNS)}")
    return SCENE_FNS[scene](cfg, jax.random.PRNGKey(seed))
