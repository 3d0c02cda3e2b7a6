"""SPH smoothing-kernel math shared by every backend.

These are the scalar formulas of the reference's two hot kernels
(`computeDensity`, src/FluidSimulator.cu:222-284, PBF eq. 9/11, and
`projectDensityConstraint`, :286-343, PBF eq. 12), expressed as pure
vectorised functions of squared pair distance. Every backend (dense oracle,
XLA cell list, Pallas) calls exactly these so parity is structural.

Conventions (matching the reference):
  * pairs with rd2 >= h^2 contribute zero (the `if (rd2 < h2)` guard, :264);
  * the self pair (rd2 == 0) IS included in the density sum — W(0) = coeff*h^6
    — and contributes zero to both gradient sums;
  * the gradient magnitude trick: |A * r|^2 = A^2 * rd2, so the lambda
    denominator never needs per-component vectors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SimConfig


def pair_distance(rd2):
    """r as rd2 * rsqrt(rd2), zero-safe via a tiny clamp.

    Every backend (dense, cell, Pallas) uses this exact formulation: on the
    TPU VPU rsqrt + multiply costs about half of sqrt, and sharing it keeps
    backend parity structural instead of tolerance-based. The clamp makes
    the self pair (rd2 == 0) come out as r ~ 1e-8 instead of NaN.
    """
    rd2 = jnp.maximum(rd2, jnp.float32(1e-16))
    return rd2 * jax.lax.rsqrt(rd2)


def poly6(cfg: SimConfig, rd2):
    """W_poly6(r) = coeff * (h^2 - r^2)^3 for r < h, else 0.

    src/FluidSimulator.cu:266 (with the quirky coeff, see SimConfig).
    """
    t = jnp.maximum(cfg.h2 - rd2, 0.0)
    return jnp.float32(cfg.poly6_coeff) * t * t * t


def density_terms(cfg: SimConfig, rd2, mask):
    """Per-pair contributions to (rho_i, sum_k |grad_k C_i|^2).

    Returns (w, g2) where
      w  = W_poly6(rd)                                    (:266-267)
      g2 = |L_coeff * (h-rd)^2 * r|^2 = (L_coeff*(h-rd)^2)^2 * rd2  (:269-274)
    both zeroed where `mask` is False (mask already includes rd2 < h2).
    """
    rd2 = jnp.where(mask, rd2, cfg.h2)  # dead pairs contribute exactly zero
    t = cfg.h2 - rd2
    w = jnp.float32(cfg.poly6_coeff) * t * t * t
    rd = pair_distance(rd2)
    a = jnp.float32(cfg.lambda_grad_coeff) * (cfg.h - rd) * (cfg.h - rd)
    g2 = a * a * rd2
    zero = jnp.float32(0.0)
    return jnp.where(mask, w, zero), jnp.where(mask, g2, zero)


def lambda_from_sums(cfg: SimConfig, rho, sum_grad2):
    """lambda_i = -C_i / (sum|gradC|^2 + eps), C_i = rho/rho0 - 1 (:281-282)."""
    c = rho * jnp.float32(cfg.inv_rho0) - 1.0
    return -c / (sum_grad2 + jnp.float32(cfg.relaxation_eps))


def delta_p_scale(cfg: SimConfig, rd2, lam_i, lam_j, mask):
    """Scalar s such that the pair's position correction is s * (p_i - p_j).

    From projectDensityConstraint (:319-341):
        dp_i += invRho0 * (lam_i + lam_j + s_corr) * (-coeff)*(h-rd)^2 * r
    so s = invRho0 * (lam_i + lam_j + s_corr) * (-spiky_coeff) * (h-rd)^2,
    zeroed where `mask` is False. The self pair has r = 0 and cancels anyway.
    """
    rd2 = jnp.where(mask, rd2, cfg.h2)
    rd = pair_distance(rd2)
    k = jnp.float32(-cfg.spiky_grad_coeff * cfg.inv_rho0)
    s = k * (cfg.h - rd) * (cfg.h - rd) * (lam_i + lam_j + jnp.float32(cfg.s_corr))
    return jnp.where(mask, s, 0.0)
