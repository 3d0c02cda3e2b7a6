"""Truth-table tests for the 6-wall collision response.

Each case is checked against a literal NumPy transcription of the reference's
sequential wall logic (src/FluidSimulator.cu:345-445), amended with the two
deliberate divergences documented in ops/collide.py: a bounce requires
*outward* velocity (the reference's `v != 0` guard re-ejects an
inward-moving escaped particle), and a final clamp enforces the box
invariant. Both are identical to the reference for every genuine crossing.
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
        outward = p[axis] > w and v[axis] > 0 if w > 0 else p[axis] < w and v[axis] < 0
        if outward:
            t = (p[axis] - w) / v[axis]
            p = p - v * (1 - cd) * t
            p[axis] = 2 * w - p[axis]
            v[axis] *= -1.0
            v = v * cd
    return np.clip(p, 0.0, cfg.wall), v


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


def test_zero_velocity_component_clamps_into_box():
    # past the floor with vy == 0: no bounce fires (reference guard :362
    # also skips it), but the safety clamp returns it to the wall
    p = np.array([[1.0, -0.05, 1.0]], np.float32)
    x, v = finalize(CFG, p, p.copy())
    np.testing.assert_allclose(np.asarray(x), [[1.0, 0.0, 1.0]])
    np.testing.assert_allclose(np.asarray(v), 0.0)


def test_escaped_inward_mover_not_re_ejected():
    # outside the floor but moving back IN: the reference's v != 0 guard
    # would mirror it back out; the fix leaves it (clamped to the wall)
    p_new = np.array([[1.0, -0.4, 1.0]], np.float32)
    p_last = np.array([[1.0, -0.5, 1.0]], np.float32)   # vy > 0, inward
    x, v = finalize(CFG, p_new, p_last)
    assert np.asarray(x)[0, 1] == 0.0                   # clamped, not mirrored
    assert np.asarray(v)[0, 1] > 0.0                    # still moving inward


def _strict_reference_finalize(cfg, p, last):
    """Transcription of updatePositions with the reference's EXACT guards:
    `v != 0` per wall (src/FluidSimulator.cu:362,375,...) and no clamp."""
    p = p.astype(np.float64).copy()
    v = (p - last) / cfg.dt
    cd = cfg.collision_damp
    for axis, w in ((1, 0.0), (1, cfg.wall), (0, 0.0), (2, 0.0),
                    (0, cfg.wall), (2, cfg.wall)):
        past = p[axis] > w if w > 0 else p[axis] < w
        if past and v[axis] != 0.0:
            t = (p[axis] - w) / v[axis]
            p = p - v * (1 - cd) * t
            p[axis] = 2 * w - p[axis]
            v[axis] *= -1.0
            v = v * cd
    return p, v


def test_strict_mode_matches_reference_guards():
    import dataclasses

    cfg = dataclasses.replace(CFG, strict_reference_collide=True)
    cases = [
        ([1.0, -0.05, 1.0], [1.0, 0.02, 1.0]),      # genuine floor crossing
        ([1.0, -0.4, 1.0], [1.0, -0.5, 1.0]),       # inward mover: re-ejected
        ([-0.03, -0.05, 1.0], [0.02, 0.04, 1.0]),   # two-wall corner
        ([1.0, 1.0, 1.0], [1.0, 1.001, 1.0]),       # no collision
    ]
    for p_new, p_last in cases:
        p_new = np.asarray(p_new, np.float32)[None]
        p_last = np.asarray(p_last, np.float32)[None]
        x, v = finalize(cfg, p_new, p_last)
        ref_x, ref_v = _strict_reference_finalize(cfg, p_new[0], p_last[0])
        np.testing.assert_allclose(np.asarray(x)[0], ref_x, rtol=1e-4,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(v)[0], ref_v, rtol=1e-4,
                                   atol=1e-4)


def test_strict_mode_bounces_inward_mover():
    # the documented reference bug, reproduced on demand: outside + moving
    # inward still triggers the wall response (negative time-of-impact
    # rewind + mirror), flipping the velocity back OUTWARD — the oscillation
    # signature. The fixed semantics leave the inward velocity alone.
    import dataclasses

    cfg = dataclasses.replace(CFG, strict_reference_collide=True)
    p_new = np.array([[1.0, -0.4, 1.0]], np.float32)
    p_last = np.array([[1.0, -0.5, 1.0]], np.float32)
    _, v_strict = finalize(cfg, p_new, p_last)
    _, v_fixed = finalize(CFG, p_new, p_last)
    assert np.asarray(v_strict)[0, 1] < 0.0             # flipped outward
    assert np.asarray(v_fixed)[0, 1] > 0.0              # left inward
