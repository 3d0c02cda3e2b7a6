"""Dense O(n^2) all-pairs PBF step — the parity oracle.

This is the reference physics (src/FluidSimulator.cu:461-511) with the
neighbor search replaced by an exact all-pairs scan with masking, and the
solver loop made a clean Jacobi iteration (the reference's in-place
read/write alias at :494/:496 makes its iteration racy Gauss-Seidel; parity
is defined against this deterministic oracle, per SURVEY.md section 3).

Only usable at small n (the integration tests run it at n <= 2k); the cell
list and Pallas backends must match it to ~1e-5 because they compute the
same sums over the same pairs (cells of size >= h cover the full r < h ball).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SimConfig
from . import smoothing
from .collide import finalize
from .integrate import predict


def _pair_rd2(p):
    d = p[:, None, :] - p[None, :, :]
    return jnp.sum(d * d, axis=-1), d


def density_lambda_dense(cfg: SimConfig, p: jax.Array) -> jax.Array:
    """All-pairs computeDensity (src/FluidSimulator.cu:222-284)."""
    rd2, _ = _pair_rd2(p)
    mask = rd2 < jnp.float32(cfg.h2)
    w, g2 = smoothing.density_terms(cfg, rd2, mask)
    rho = jnp.sum(w, axis=1)
    sum_grad2 = jnp.sum(g2, axis=1)
    return smoothing.lambda_from_sums(cfg, rho, sum_grad2)


def density_dense(cfg: SimConfig, p: jax.Array) -> jax.Array:
    """Just rho (for diagnostics / density-error metrics)."""
    rd2, _ = _pair_rd2(p)
    mask = rd2 < jnp.float32(cfg.h2)
    w, _ = smoothing.density_terms(cfg, rd2, mask)
    return jnp.sum(w, axis=1)


def project_dense(cfg: SimConfig, p: jax.Array, lam: jax.Array) -> jax.Array:
    """All-pairs projectDensityConstraint (:286-343). Returns delta_p."""
    rd2, d = _pair_rd2(p)
    mask = rd2 < jnp.float32(cfg.h2)
    s = smoothing.delta_p_scale(cfg, rd2, lam[:, None], lam[None, :], mask)
    return jnp.sum(s[:, :, None] * d, axis=1)


def solve_dense(cfg: SimConfig, p: jax.Array) -> jax.Array:
    """The 3-iteration constraint loop (:488-502), clean Jacobi."""

    def body(_, p):
        lam = density_lambda_dense(cfg, p)
        return p + project_dense(cfg, p, lam)

    return jax.lax.fori_loop(0, cfg.solver_iters, body, p)


def step_dense(cfg: SimConfig, x: jax.Array, v: jax.Array):
    """One full step: predict -> solve -> finalize. No sort (order is kept)."""
    p, v1 = predict(cfg, x, v)
    p = solve_dense(cfg, p)
    return finalize(cfg, p, last_frame=x)
