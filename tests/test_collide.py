"""Truth-table tests for the 6-wall collision response.

Each case is checked against a literal NumPy transcription of the reference's
sequential wall logic (src/FluidSimulator.cu:345-445).
"""

import numpy as np

from pdb_sph_tpu.config import default_config
from pdb_sph_tpu.ops.collide import finalize

CFG = default_config(n=4)


def _reference_finalize(cfg, p, last):
    """Literal sequential transcription of updatePositions for one particle."""
    p = p.astype(np.float64).copy()
    v = (p - last) / cfg.dt
    cd = cfg.collision_damp
    for axis, w in ((1, 0.0), (1, cfg.wall), (0, 0.0), (2, 0.0), (0, cfg.wall), (2, cfg.wall)):
        past = p[axis] > w if w > 0 else p[axis] < w
        if past and v[axis] != 0.0:
            t = (p[axis] - w) / v[axis]
            p = p - v * (1 - cd) * t
            p[axis] = 2 * w - p[axis]
            v[axis] *= -1.0
            v = v * cd
    return p, v


def _run_case(p_new, p_last):
    p_new = np.asarray(p_new, np.float32)[None]
    p_last = np.asarray(p_last, np.float32)[None]
    x, v = finalize(CFG, p_new, p_last)
    ref_x, ref_v = _reference_finalize(CFG, p_new[0], p_last[0])
    np.testing.assert_allclose(np.asarray(x)[0], ref_x, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v)[0], ref_v, rtol=1e-4, atol=1e-4)


def test_no_collision():
    _run_case([1.0, 1.0, 1.0], [1.0, 1.001, 1.0])


def test_floor_bounce():
    _run_case([1.0, -0.05, 1.0], [1.0, 0.02, 1.0])


def test_each_wall_individually():
    inside = np.array([1.0, 1.0, 1.0])
    for axis in range(3):
        for target in (-0.05, CFG.wall + 0.05):
            p_new = inside.copy()
            p_new[axis] = target
            p_last = inside.copy()
            p_last[axis] = 0.02 if target < 0 else CFG.wall - 0.02
            _run_case(p_new, p_last)


def test_corner_collision_two_walls():
    _run_case([-0.03, -0.05, 1.0], [0.02, 0.04, 1.0])


def test_velocity_update_matches_verlet():
    p_new = np.array([[1.0, 1.5, 1.0]], np.float32)
    p_last = np.array([[1.0, 1.52, 1.0]], np.float32)
    x, v = finalize(CFG, p_new, p_last)
    np.testing.assert_allclose(
        np.asarray(v)[0, 1], (1.5 - 1.52) / CFG.dt, rtol=1e-4
    )
    np.testing.assert_allclose(np.asarray(x), p_new, rtol=1e-6)


def test_zero_velocity_component_skips_wall():
    # past the floor but vy == 0 -> reference leaves it (guard :362)
    p = np.array([[1.0, -0.05, 1.0]], np.float32)
    x, v = finalize(CFG, p, p.copy())
    np.testing.assert_allclose(np.asarray(x), p)
    np.testing.assert_allclose(np.asarray(v), 0.0)
