"""Golden tests for the SPH kernel math against closed forms.

Uses the reference's exact constants, including the 2-D poly6 norm quirk
(src/FluidSimulator.cu:236, SURVEY.md section 3 quirk 7).
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from pdb_sph_tpu.config import REF_PI, default_config
from pdb_sph_tpu.ops import smoothing

CFG = default_config(n=8)


def test_poly6_at_zero():
    # W(0) = coeff * h^6 = 4/(pi h^2)
    w = smoothing.poly6(CFG, jnp.float32(0.0))
    expected = 4.0 / (REF_PI * CFG.h**2)
    np.testing.assert_allclose(float(w), expected, rtol=1e-6)


def test_poly6_at_and_beyond_h():
    assert float(smoothing.poly6(CFG, jnp.float32(CFG.h2))) == 0.0
    assert float(smoothing.poly6(CFG, jnp.float32(4 * CFG.h2))) == 0.0


@pytest.mark.parametrize("r", [0.01, 0.05, 0.099])
def test_density_terms_closed_form(r):
    rd2 = jnp.float32(r * r)
    w, g2 = smoothing.density_terms(CFG, rd2, jnp.bool_(True))
    coeff = 4.0 / (REF_PI * CFG.h**8)
    expected_w = coeff * (CFG.h2 - r * r) ** 3
    l_coeff = (45.0 / (REF_PI * CFG.h**6)) / CFG.rho0
    a = l_coeff * (CFG.h - r) ** 2
    expected_g2 = (a * r) ** 2  # |a * r_vec|^2 = a^2 rd2
    # f32 cancellation near the support edge (h - r -> 0) limits precision
    np.testing.assert_allclose(float(w), expected_w, rtol=1e-4)
    np.testing.assert_allclose(float(g2), expected_g2, rtol=1e-4)


def test_density_terms_masked_are_zero():
    w, g2 = smoothing.density_terms(CFG, jnp.float32(0.001), jnp.bool_(False))
    assert float(w) == 0.0 and float(g2) == 0.0


def test_lambda_closed_form():
    rho, sg = jnp.float32(2 * CFG.rho0), jnp.float32(4.0)
    lam = smoothing.lambda_from_sums(CFG, rho, sg)
    np.testing.assert_allclose(float(lam), -1.0 / (4.0 + 600.0), rtol=1e-6)


def test_lambda_sign():
    # over-dense -> negative lambda (repulsion); under-dense -> positive
    assert float(smoothing.lambda_from_sums(CFG, jnp.float32(2 * CFG.rho0), jnp.float32(1.0))) < 0
    assert float(smoothing.lambda_from_sums(CFG, jnp.float32(0.5 * CFG.rho0), jnp.float32(1.0))) > 0


def test_delta_p_scale_closed_form():
    r = 0.05
    lam_i, lam_j = jnp.float32(-0.3), jnp.float32(-0.2)
    s = smoothing.delta_p_scale(CFG, jnp.float32(r * r), lam_i, lam_j, jnp.bool_(True))
    coeff = 45.0 / (REF_PI * CFG.h**6)
    expected = -(coeff / CFG.rho0) * (CFG.h - r) ** 2 * (-0.3 - 0.2 + 1e-4)
    np.testing.assert_allclose(float(s), expected, rtol=1e-5)


def test_delta_p_self_pair_is_zero_vector():
    # rd2 = 0: scale is finite and multiplies r = 0, so the contribution is 0
    s = smoothing.delta_p_scale(
        CFG, jnp.float32(0.0), jnp.float32(-0.5), jnp.float32(-0.5), jnp.bool_(True)
    )
    assert np.isfinite(float(s))


def test_3d_norm_option():
    cfg3d = default_config(n=8, use_reference_poly6_norm=False)
    w = smoothing.poly6(cfg3d, jnp.float32(0.0))
    expected = 315.0 / (64.0 * math.pi * cfg3d.h**9) * cfg3d.h**6
    np.testing.assert_allclose(float(w), expected, rtol=1e-5)
