"""Parity: XLA cell-list backend vs the dense O(n^2) oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdb_sph_tpu import default_config, spawn
from pdb_sph_tpu.core.step import make_step, diagnostics_fn
from pdb_sph_tpu.ops import dense

CFG = default_config(n=512, max_occupied_cells=1024)


def _unsort(state):
    """Return (x, v) in original spawn order using the carried ids."""
    inv = np.argsort(np.asarray(state.ids))
    return np.asarray(state.x)[inv], np.asarray(state.v)[inv]


@pytest.mark.slow
@pytest.mark.parametrize("scene", ["standard", "blowup"])
def test_one_step_matches_dense(scene):
    cfg = CFG if scene == "standard" else default_config(
        n=512, max_occupied_cells=1024, cell_capacity=256
    )
    st = spawn(cfg, scene, seed=0)
    dense_step = make_step(cfg, backend="dense")
    cell_step = make_step(cfg, backend="cell")

    sd = dense_step(st)
    sc = cell_step(st)
    x_c, v_c = _unsort(sc)
    np.testing.assert_allclose(x_c, np.asarray(sd.x), rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(v_c, np.asarray(sd.v), rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_ten_steps_match_dense():
    st = spawn(CFG, "standard", seed=1)
    dense_step = make_step(CFG, backend="dense")
    cell_step = make_step(CFG, backend="cell")
    sd, sc = st, st
    for _ in range(10):
        sd = dense_step(sd)
        sc = cell_step(sc)
    x_c, _ = _unsort(sc)
    np.testing.assert_allclose(x_c, np.asarray(sd.x), rtol=1e-3, atol=5e-5)


def test_sorted_state_is_permutation():
    st = spawn(CFG, "standard", seed=2)
    sc = make_step(CFG, backend="cell")(st)
    ids = np.asarray(sc.ids)
    assert sorted(ids.tolist()) == list(range(CFG.n))


def test_diagnostics():
    st = spawn(CFG, "standard", seed=3)
    st = make_step(CFG, backend="cell")(st)
    d = jax.jit(lambda s: diagnostics_fn(CFG, s))(st)
    assert not bool(d.nan_detected)
    assert int(d.n_overflow) == 0
    assert int(d.n_escaped) == 0
    assert float(d.mean_density) > 0
    # n=512 in a unit cube is sparse; density far below rho0 is expected
    rho_dense = np.asarray(dense.density_dense(CFG, st.x))
    np.testing.assert_allclose(float(d.mean_density), rho_dense.mean(), rtol=1e-3)


def test_overflow_keeps_predicted_positions_finite():
    cfg = default_config(n=512, max_occupied_cells=64, cell_capacity=128)
    st = spawn(cfg, "blowup", seed=4)
    sc = make_step(cfg, backend="cell")(st)
    assert np.isfinite(np.asarray(sc.x)).all()


def test_bad_backend_name():
    with pytest.raises(ValueError):
        make_step(CFG, backend="cuda")
