import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdb_sph_tpu import default_config, spawn
from pdb_sph_tpu.config import SCENES

CFG = default_config(n=4096)


@pytest.mark.parametrize("scene", SCENES)
def test_scene_shapes_and_dtypes(scene):
    st = spawn(CFG, scene, seed=0)
    assert st.x.shape == (CFG.n, 3) and st.x.dtype == jnp.float32
    assert st.v.shape == (CFG.n, 3)
    np.testing.assert_array_equal(np.asarray(st.v), 0.0)
    np.testing.assert_array_equal(np.asarray(st.ids), np.arange(CFG.n))


def test_scene_reproducible():
    a = spawn(CFG, "standard", seed=7)
    b = spawn(CFG, "standard", seed=7)
    np.testing.assert_array_equal(np.asarray(a.x), np.asarray(b.x))


def test_standard_in_unit_cube():
    x = np.asarray(spawn(CFG, "standard", 0).x)
    assert (x >= 0).all() and (x < 1).all()


def test_dam_break_block():
    x = np.asarray(spawn(CFG, "dam_break", 0).x)
    assert (x >= 0).all()
    assert x[:, 0].max() <= 0.5 and x[:, 1].max() <= CFG.wall and x[:, 2].max() <= 1.0


def test_blowup_in_ball():
    x = np.asarray(spawn(CFG, "blowup", 0).x)
    r = np.linalg.norm(x - CFG.wall / 2, axis=1)
    assert r.max() <= 0.5 + 1e-5
    # roughly uniform in the ball: mean radius of uniform ball = 3/4 R
    assert abs(r.mean() - 0.375) < 0.02


def test_unknown_scene_raises():
    with pytest.raises(ValueError):
        spawn(CFG, "nope")
