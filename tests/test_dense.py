"""The dense oracle vs an independent NumPy float64 transcription of the
reference kernels (SURVEY.md section 4 "parity harness"), plus rollout
invariants.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pdb_sph_tpu import default_config, spawn
from pdb_sph_tpu.config import REF_PI
from pdb_sph_tpu.ops import dense
from pdb_sph_tpu.ops.integrate import predict

CFG = default_config(n=512)


def _np_density_lambda(cfg, p):
    """float64 NumPy transcription of computeDensity (FluidSimulator.cu:222-284)."""
    p = p.astype(np.float64)
    h, h2 = cfg.h, cfg.h * cfg.h
    coeff = 4.0 / (REF_PI * h**8)
    l_coeff = (45.0 / (REF_PI * h**6)) / cfg.rho0
    d = p[:, None, :] - p[None, :, :]
    rd2 = (d * d).sum(-1)
    within = rd2 < h2
    rho = np.where(within, coeff * (h2 - rd2) ** 3, 0.0).sum(1)
    rd = np.sqrt(rd2)
    grad2 = np.where(within, (l_coeff * (h - rd) ** 2) ** 2 * rd2, 0.0).sum(1)
    c = rho / cfg.rho0 - 1.0
    return -c / (grad2 + cfg.relaxation_eps), rho


def _np_project(cfg, p, lam):
    """float64 NumPy transcription of projectDensityConstraint (:286-343)."""
    p = p.astype(np.float64)
    h, h2 = cfg.h, cfg.h * cfg.h
    coeff = 45.0 / (REF_PI * h**6)
    d = p[:, None, :] - p[None, :, :]
    rd2 = (d * d).sum(-1)
    within = rd2 < h2
    rd = np.sqrt(rd2)
    lam_sum = lam[:, None] + lam[None, :] + cfg.s_corr
    s = np.where(within, -coeff * (h - rd) ** 2 * lam_sum, 0.0)
    return (s[:, :, None] * d).sum(1) / cfg.rho0


def test_density_lambda_vs_numpy():
    p = np.asarray(spawn(CFG, "standard", 3).x)
    lam, rho = _np_density_lambda(CFG, p)
    got = np.asarray(dense.density_lambda_dense(CFG, jnp.asarray(p)))
    np.testing.assert_allclose(got, lam, rtol=2e-4, atol=1e-7)
    got_rho = np.asarray(dense.density_dense(CFG, jnp.asarray(p)))
    np.testing.assert_allclose(got_rho, rho, rtol=2e-4)


def test_project_vs_numpy():
    p = np.asarray(spawn(CFG, "standard", 4).x)
    lam, _ = _np_density_lambda(CFG, p)
    expected = _np_project(CFG, p, lam)
    got = np.asarray(dense.project_dense(CFG, jnp.asarray(p), jnp.asarray(lam.astype(np.float32))))
    np.testing.assert_allclose(got, expected, rtol=5e-3, atol=5e-7)


def test_full_step_vs_numpy():
    st = spawn(CFG, "standard", 5)
    x0, v0 = np.asarray(st.x), np.asarray(st.v)

    # NumPy reference step (clean Jacobi, like the oracle)
    g = np.array([0.0, CFG.gravity, 0.0])
    v1 = (v0 + CFG.dt * g) * CFG.velocity_damp
    p = x0 + CFG.dt * v1
    for _ in range(CFG.solver_iters):
        lam, _ = _np_density_lambda(CFG, p)
        p = p + _np_project(CFG, p, lam)
    v2 = (p - x0) / CFG.dt  # no wall hits expected from a interior unit cube
    # (tiny drop under gravity for one step keeps everything interior)

    x_got, v_got = dense.step_dense(CFG, st.x, st.v)
    np.testing.assert_allclose(np.asarray(x_got), p, rtol=1e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(v_got), v2, rtol=1e-3, atol=3e-3)


def test_predict_matches_reference_formula():
    x = jnp.ones((4, 3), jnp.float32)
    v = jnp.full((4, 3), 2.0, jnp.float32)
    p, v1 = predict(CFG, x, v)
    ev = (np.full(3, 2.0) + CFG.dt * np.array([0, CFG.gravity, 0])) * CFG.velocity_damp
    np.testing.assert_allclose(np.asarray(v1)[0], ev, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p)[0], 1.0 + CFG.dt * ev, rtol=1e-6)


def test_rollout_invariants_100_steps():
    """8k-equivalent PR1 slice at small n: finite, in-box, density sane."""
    cfg = default_config(n=512)
    st = spawn(cfg, "standard", 0)

    @jax.jit
    def run(x, v):
        def body(carry, _):
            x, v = carry
            x, v = dense.step_dense(cfg, x, v)
            return (x, v), None

        (x, v), _ = jax.lax.scan(body, (x, v), None, length=100)
        return x, v

    x, v = run(st.x, st.v)
    x, v = np.asarray(x), np.asarray(v)
    assert np.isfinite(x).all() and np.isfinite(v).all()
    # collisions keep particles essentially inside the box (mirror response
    # can momentarily overshoot, so allow a small tolerance)
    assert x.min() > -0.25 and x.max() < cfg.wall + 0.25
    # n=512 in a unit cube is far below rest density -> lambda > 0 pulls
    # particles together; just check densities stay positive and bounded
    rho = np.asarray(dense.density_dense(cfg, jnp.asarray(x)))
    assert (rho > 0).all() and rho.max() < 50 * cfg.rho0
