"""Pallas window-kernel parity vs the XLA cell-list backend and dense oracle.

Runs in Pallas interpreter mode on CPU; the same code path compiles with
Mosaic on real TPU (exercised by bench.py / the driver).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdb_sph_tpu import default_config, spawn
from pdb_sph_tpu.core.step import make_step
from pdb_sph_tpu.ops import hashgrid, pallas_pbf


def _unsort(state):
    inv = np.argsort(np.asarray(state.ids))
    return np.asarray(state.x)[inv], np.asarray(state.v)[inv]


@pytest.mark.slow
@pytest.mark.parametrize("scene", ["standard", "blowup"])
def test_pallas_step_matches_cell(scene):
    cfg = default_config(n=512, max_occupied_cells=1024, cell_capacity=256)
    st = spawn(cfg, scene, seed=0)
    sc = make_step(cfg, backend="cell")(st)
    sp = make_step(cfg, backend="pallas", pallas_interpret=True)(st)
    x_c, v_c = _unsort(sc)
    x_p, v_p = _unsort(sp)
    np.testing.assert_allclose(x_p, x_c, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(v_p, v_c, rtol=1e-4, atol=1e-4)


def test_pallas_three_steps_match_dense():
    cfg = default_config(n=256)
    st = spawn(cfg, "standard", seed=1)
    sd = make_step(cfg, backend="dense")
    sp = make_step(cfg, backend="pallas", pallas_interpret=True)
    a, b = st, st
    for _ in range(3):
        a = sd(a)
        b = sp(b)
    x_p, _ = _unsort(b)
    np.testing.assert_allclose(x_p, np.asarray(a.x), rtol=1e-4, atol=1e-5)


@pytest.mark.slow  # ~110 s of interpret-mode compile; the mixed-chunk plan
# logic it guards stays covered quick by
# test_window_plan_mixed_chunk_covers_all_pairs (plan-level, no solver run)
def test_pallas_nonmultiple_of_128():
    # n = 300: padding slots must stay inert
    cfg = default_config(n=300)
    st = spawn(cfg, "standard", seed=2)
    sc = make_step(cfg, backend="cell")(st)
    sp = make_step(cfg, backend="pallas", pallas_interpret=True)(st)
    x_c, _ = _unsort(sc)
    x_p, _ = _unsort(sp)
    assert np.isfinite(x_p).all()
    np.testing.assert_allclose(x_p, x_c, rtol=1e-5, atol=1e-6)


def _coverage(segs_row, nsegs, n_pad):
    """Per-particle-lane stream counts for one chunk's segment table,
    mapping shifted-copy array offsets back to particle lanes. Lanes >=
    n_pad are the sentinel pad zone (repeats allowed there). Lane SEGW-1
    holds the chunk's SEGMENT count (each pass derives its own block
    count from it)."""
    stride = n_pad + pallas_pbf.CC_PAD
    covered = np.zeros(n_pad + pallas_pbf.CC_PAD, dtype=int)
    for s in range(nsegs):
        src = int(segs_row[s])
        assert src % pallas_pbf.SEG == 0, "unaligned seg"
        copy = src // stride
        assert 0 <= copy < pallas_pbf.NCOPIES, f"seg out of range: {src}"
        lane = src - copy * stride - copy * pallas_pbf.QSHIFT
        assert 0 <= lane <= n_pad, f"bad lane {lane} (src {src})"
        covered[lane : lane + pallas_pbf.SEG] += 1
    return covered


def test_window_plan_covers_all_pairs():
    """Every pair within h must fall in exactly one candidate window."""
    cfg = default_config(n=384)
    st = spawn(cfg, "blowup", seed=3)
    p = st.x
    n = cfg.n
    n_pad = pallas_pbf.pad_to_chunks(n)
    cid = hashgrid.cell_ids(cfg, p)
    cid_pad = jnp.concatenate(
        [cid, jnp.full((n_pad - n,), cfg.num_nb_cells, jnp.int32)]
    )
    sc, order_pad = hashgrid.sort_by_cell(cfg, cid_pad)
    plan = pallas_pbf.build_plan(cfg, sc)
    ps = np.asarray(p)[np.asarray(order_pad[:n])]

    segs = np.asarray(plan.seg_src)[:, 0, :]

    d = ps[:, None, :] - ps[None, :, :]
    rd2 = (d * d).sum(-1)
    within = rd2 < cfg.h2

    for c in range(n_pad // pallas_pbf.OWN):
        covered = _coverage(segs[c], segs[c, pallas_pbf.SEGW - 1], n_pad)
        # no double counting of REAL lanes (the sentinel pad zone absorbs
        # every dead slot, repeats allowed there)
        assert covered[:n_pad].max() <= 1, f"chunk {c}: candidate counted twice"
        # full coverage of true neighbors of every own particle in the chunk
        for i in range(c * pallas_pbf.OWN, min((c + 1) * pallas_pbf.OWN, n)):
            js = np.nonzero(within[i][:n])[0]
            assert (covered[js] == 1).all(), f"chunk {c} misses neighbors of {i}"


def test_window_plan_mixed_chunk_covers_all_pairs():
    """Round-1 advisor bug: with n % OWN != 0, the boundary chunk mixes real
    and padding entries; the old plan clamped its c_last to the grid's last
    cell, stretching all nine windows to the array end, and the per-window
    KW cap then truncated the fold — dropping most true neighbors of that
    chunk (81% measured at n=16040). Needs n large/dense enough that the
    stretched fold would exceed KW*SEG lanes, and n % OWN != 0."""
    n = 16040  # % 64 == 40 (the advisor's repro size)
    assert n % pallas_pbf.OWN != 0
    cfg = default_config(n=n, max_occupied_cells=4096, cell_capacity=512)
    # dense slab confined to one z-row of cells: window 1 of the mixed
    # chunk clips to the array start, so the stretched fold spans the whole
    # array (>> KW*SEG lanes) and the old cap dropped every own-cell
    # neighbor (measured: 3222/3222 missed, plan overflow 12032)
    from pdb_sph_tpu.state import make_state

    rng = np.random.default_rng(7)
    xs = np.stack(
        [rng.random(n) * 2.0, rng.random(n) * 2.0, rng.random(n) * 0.09],
        axis=1,
    ).astype(np.float32)
    st = make_state(jnp.asarray(xs))
    n_pad = pallas_pbf.pad_to_chunks(n)
    cid = hashgrid.cell_ids(cfg, st.x)
    cid_pad = jnp.concatenate(
        [cid, jnp.full((n_pad - n,), cfg.num_nb_cells, jnp.int32)]
    )
    sc, order_pad = hashgrid.sort_by_cell(cfg, cid_pad)
    plan = pallas_pbf.build_plan(cfg, sc)
    assert int(plan.n_overflow) == 0, "tight windows must not overflow here"
    ps = np.asarray(st.x)[np.asarray(order_pad[:n])]
    segs = np.asarray(plan.seg_src)[:, 0, :]

    last_chunk = (n - 1) // pallas_pbf.OWN  # the mixed real/padding chunk
    for c in (last_chunk, last_chunk - 1):
        covered = _coverage(segs[c], segs[c, pallas_pbf.SEGW - 1], n_pad)
        assert covered[:n_pad].max() <= 1, f"chunk {c}: candidate counted twice"
        own = ps[c * pallas_pbf.OWN : min((c + 1) * pallas_pbf.OWN, n)]
        d = own[:, None, :] - ps[None, :, :]
        within = (d * d).sum(-1) < cfg.h2
        for i in range(own.shape[0]):
            js = np.nonzero(within[i])[0]
            assert (covered[js] == 1).all(), (
                f"chunk {c} misses {np.sum(covered[js] != 1)}/{len(js)} "
                f"neighbors of own row {i}"
            )


@pytest.mark.slow
def test_leftover_epilogue_parity():
    """The pair loop handles total % CHAINS leftover blocks via lax.cond
    epilogues (no sentinel-block math). The small-n parity configs above
    all land on ONE block-count remainder class (checked: n<=2048 spawns
    give T in {1,2} only), so this test constructs a dense strip whose
    plan provably contains chunks in EVERY remainder class and runs the
    pallas==cell parity on it."""
    n = 3072
    cfg = default_config(n=n, max_occupied_cells=1024, cell_capacity=512)
    from pdb_sph_tpu.state import make_state

    rng = np.random.default_rng(5)
    xs = np.stack(
        [rng.random(n) * 2.0, rng.random(n) * 0.29, rng.random(n) * 0.09],
        axis=1,
    ).astype(np.float32)
    st = make_state(jnp.asarray(xs))

    n_pad = pallas_pbf.pad_to_chunks(n)
    cid = hashgrid.cell_ids(cfg, st.x)
    cid_pad = jnp.concatenate(
        [cid, jnp.full((n_pad - n,), cfg.num_nb_cells, jnp.int32)]
    )
    sc, _ = hashgrid.sort_by_cell(cfg, cid_pad)
    plan = pallas_pbf.build_plan(cfg, sc)
    nsegs = np.asarray(plan.seg_src)[:, 0, pallas_pbf.SEGW - 1]
    nblocks = -(-nsegs // pallas_pbf.SPB_D)
    rems = {int(t % pallas_pbf.CHAINS) for t in nblocks if t > 0}
    if pallas_pbf.CHAINS == 3:  # default geometry; env sweeps may differ
        assert rems == {0, 1, 2}, (
            f"strip construction no longer produces all block-count "
            f"remainders (got {rems}); the epilogue paths would go untested"
        )

    sc_step = make_step(cfg, backend="cell")(st)
    sp_step = make_step(cfg, backend="pallas", pallas_interpret=True)(st)
    x_c, _ = _unsort(sc_step)
    x_p, _ = _unsort(sp_step)
    np.testing.assert_allclose(x_p, x_c, rtol=1e-4, atol=2e-5)


def test_window_plan_no_overflow_at_defaults():
    cfg = default_config(n=2048)
    st = spawn(cfg, "blowup", seed=4)
    n_pad = pallas_pbf.pad_to_chunks(cfg.n)
    cid = hashgrid.cell_ids(cfg, st.x)
    sc, _ = hashgrid.sort_by_cell(cfg, cid)
    plan = pallas_pbf.build_plan(cfg, sc)
    assert int(plan.n_overflow) == 0


def test_plan_overflow_truncation_accounting():
    """Pathological clustering: one cell holding more candidates than
    MAX_SEG*SEG lanes must be REPORTED as truncation (the CLI surfaces it
    as plan_overflow: silent truncation softens the physics), and every
    emitted table slot must stay a sane 128-aligned offset."""
    from pdb_sph_tpu.config import blowup_config
    from pdb_sph_tpu.state import make_state

    n = pallas_pbf.MAX_SEG * pallas_pbf.SEG + 4 * pallas_pbf.SEG
    cfg = blowup_config(n=n, max_occupied_cells=1024)
    rng = np.random.default_rng(11)
    # everything inside one h-cell: the own-cell window alone needs more
    # than MAX_SEG segments
    x = (0.95 + 0.04 * rng.random((n, 3))).astype(np.float32)
    st = make_state(jnp.asarray(x))

    n_pad = pallas_pbf.pad_to_chunks(n)
    cid = hashgrid.cell_ids(cfg, st.x)
    cid_pad = jnp.concatenate(
        [cid, jnp.full((n_pad - n,), cfg.num_nb_cells, jnp.int32)]
    )
    sc, _ = hashgrid.sort_by_cell(cfg, cid_pad)
    plan = pallas_pbf.build_plan(cfg, sc)
    assert int(plan.n_overflow) > 0, "expected candidate truncation"
    segs = np.asarray(plan.seg_src)[:, 0, : pallas_pbf.MAX_SEG]
    assert (segs % pallas_pbf.SEG == 0).all()
    stride = n_pad + pallas_pbf.CC_PAD
    copy = segs // stride
    lane = segs - copy * stride - copy * pallas_pbf.QSHIFT
    assert ((copy >= 0) & (copy < pallas_pbf.NCOPIES)).all()
    assert ((lane >= 0) & (lane <= n_pad)).all()
    nsegs = np.asarray(plan.seg_src)[:, 0, pallas_pbf.SEGW - 1]
    assert nsegs.max() <= pallas_pbf.MAX_SEG


@pytest.mark.slow  # subprocess re-import + interpret-mode parity, ~130 s
def test_maxlanes_knob_raises_capacity():
    """PBF_MAXLANES=131072 (the 1M-row setting, benchmarks/bench_matrix.py)
    must widen the plan capacity consistently AND keep solver parity: a
    clustered scene that truncates at the default capacity becomes
    overflow-free at the raised one, and the pallas step still matches the
    cell backend. Runs in a subprocess because the knob is module-level
    state frozen at import."""
    import subprocess
    import sys

    code = """
import numpy as np
from pdb_sph_tpu import default_config, spawn
from pdb_sph_tpu.core.step import make_step
from pdb_sph_tpu.ops import hashgrid, pallas_pbf

assert pallas_pbf.MAXLANES == 131072
assert pallas_pbf.MAX_SEG * pallas_pbf.SEG >= 130560
assert pallas_pbf.SEGW > pallas_pbf.MAX_SEG

cfg = default_config(n=512, max_occupied_cells=1024, cell_capacity=512)
st = spawn(cfg, "blowup", seed=0)
cid = hashgrid.cell_ids(cfg, st.x)
sc, _ = hashgrid.sort_by_cell(cfg, cid)
plan = pallas_pbf.build_plan(cfg, sc)
assert int(plan.n_overflow) == 0

sc_step = make_step(cfg, backend="cell")(st)
sp_step = make_step(cfg, backend="pallas", pallas_interpret=True)(st)
inv_c = np.argsort(np.asarray(sc_step.ids))
inv_p = np.argsort(np.asarray(sp_step.ids))
np.testing.assert_allclose(np.asarray(sp_step.x)[inv_p],
                           np.asarray(sc_step.x)[inv_c],
                           rtol=1e-5, atol=1e-6)
print("OK")
"""
    import os

    env = dict(os.environ, PBF_MAXLANES="131072", JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=2400)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "OK" in out.stdout


@pytest.mark.slow  # subprocess re-import + interpret-mode parity
def test_per_pass_cc_parity():
    """PBF_CC_D != PBF_CC_P (round-3 lever: the two passes have different
    accumulator pressure, so their optimal block widths differ) must keep
    exact solver parity with the cell backend — the shared SEG-granular
    plan feeds both widths. Runs in a subprocess because the geometry is
    module-level state frozen at import."""
    import os
    import subprocess
    import sys

    code = """
import numpy as np
from pdb_sph_tpu import default_config, spawn
from pdb_sph_tpu.core.step import make_step
from pdb_sph_tpu.ops import pallas_pbf

assert pallas_pbf.CC_D == 384 and pallas_pbf.CC_P == 256
assert pallas_pbf.SPB_D == 3 and pallas_pbf.SPB_P == 2
assert pallas_pbf.MAX_SEG % (2 * 6) == 0   # lcm rounding covers both passes

cfg = default_config(n=512, max_occupied_cells=1024, cell_capacity=512)
st = spawn(cfg, "blowup", seed=0)
sc_step = make_step(cfg, backend="cell")(st)
sp_step = make_step(cfg, backend="pallas", pallas_interpret=True)(st)
inv_c = np.argsort(np.asarray(sc_step.ids))
inv_p = np.argsort(np.asarray(sp_step.ids))
np.testing.assert_allclose(np.asarray(sp_step.x)[inv_p],
                           np.asarray(sc_step.x)[inv_c],
                           rtol=1e-5, atol=1e-6)
print("OK")
"""
    env = dict(os.environ, PBF_CC_D="384", PBF_CC_P="256",
               JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=2400)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "OK" in out.stdout


def test_restrict_plan_zeroes_only_masked_chunks():
    """restrict_plan (the sharded path's per-pass own-row skip) must zero
    the block count of exactly the masked chunks and leave every segment
    source — shared by both passes — untouched."""
    cfg = default_config(n=384)
    st = spawn(cfg, "dam_break", seed=5)
    n_pad = pallas_pbf.pad_to_chunks(cfg.n)
    cid = hashgrid.cell_ids(cfg, st.x)
    cid_pad = jnp.concatenate(
        [cid, jnp.full((n_pad - cfg.n,), cfg.num_nb_cells, jnp.int32)]
    )
    sc, _ = hashgrid.sort_by_cell(cfg, cid_pad)
    plan = pallas_pbf.build_plan(cfg, sc)

    nc = n_pad // pallas_pbf.OWN
    rng = np.random.default_rng(0)
    keep = jnp.asarray(rng.random(nc) < 0.5)
    got = pallas_pbf.restrict_plan(plan, keep)

    a = np.asarray(plan.seg_src)[:, 0, :]
    b = np.asarray(got.seg_src)[:, 0, :]
    k = np.asarray(keep)
    last = pallas_pbf.SEGW - 1
    np.testing.assert_array_equal(b[:, :last], a[:, :last])
    np.testing.assert_array_equal(b[k, last], a[k, last])
    assert (b[~k, last] == 0).all()
    assert int(got.n_overflow) == int(plan.n_overflow)


def test_sharded_ghost_row_restriction_masks_match_zones():
    """The sharded solve derives per-pass chunk masks from the frozen sorted
    cell ids: project keeps chunks touching the own slab [lo, hi); density
    additionally keeps the inner ghost row on each side. Verify the mask
    arithmetic against a brute-force per-particle classification."""
    cfg = default_config(n=640)
    st = spawn(cfg, "dam_break", seed=6)
    n_pad = pallas_pbf.pad_to_chunks(cfg.n)
    cid = hashgrid.cell_ids(cfg, st.x)
    cid_pad = jnp.concatenate(
        [cid, jnp.full((n_pad - cfg.n,), cfg.num_nb_cells, jnp.int32)]
    )
    sc, _ = hashgrid.sort_by_cell(cfg, cid_pad)
    w2 = cfg.nb_grid_width * cfg.nb_grid_width
    zc_all = np.asarray(sc) // w2
    # a slab in the middle of the spawn's z range
    zs = np.unique(zc_all[zc_all < cfg.nb_grid_width])
    lo, hi = int(zs[1]), int(zs[min(3, len(zs) - 1)] + 1)

    zc = jnp.asarray(zc_all).reshape(-1, pallas_pbf.OWN)
    keep_d = np.asarray(((zc >= lo - 1) & (zc < hi + 1)).any(axis=1))
    keep_p = np.asarray(((zc >= lo) & (zc < hi)).any(axis=1))

    for c in range(n_pad // pallas_pbf.OWN):
        rows = zc_all[c * pallas_pbf.OWN:(c + 1) * pallas_pbf.OWN]
        want_p = bool(((rows >= lo) & (rows < hi)).any())
        want_d = bool(((rows >= lo - 1) & (rows < hi + 1)).any())
        assert keep_p[c] == want_p
        assert keep_d[c] == want_d
        # project never processes a chunk density skips
        assert not (keep_p[c] and not keep_d[c])
