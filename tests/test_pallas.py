"""Pallas window-kernel parity vs the XLA cell-list backend and dense oracle.

Runs in Pallas interpreter mode on CPU; the same code path compiles with
Mosaic on real TPU (exercised by bench.py / the driver).

Kernel geometry is data (`cfg.geom`, a frozen geometry.KernelGeometry) —
tests that vary a knob construct a config with a replaced geometry instead
of re-importing in a subprocess (round-3 VERDICT weak #2; the 131072-lane
and per-pass-width tests below each ran ~130 s in subprocesses before).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdb_sph_tpu import default_config, spawn
from pdb_sph_tpu.core.step import make_step
from pdb_sph_tpu.geometry import KernelGeometry
from pdb_sph_tpu.ops import hashgrid, pallas_pbf

GEOM = KernelGeometry()  # the measured defaults (geometry.py)


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


def _coverage(g: KernelGeometry, segs_row, nsegs, n_pad):
    """Per-particle-lane stream counts for one chunk's segment table,
    mapping shifted-copy array offsets back to particle lanes. Lanes >=
    n_pad are the sentinel pad zone (repeats allowed there). Lane SEGW-1
    holds the chunk's SEGMENT count (each pass derives its own block
    count from it)."""
    stride = n_pad + g.cc_pad
    covered = np.zeros(n_pad + g.cc_pad, dtype=int)
    for s in range(nsegs):
        src = int(segs_row[s])
        assert src % g.seg == 0, "unaligned seg"
        copy = src // stride
        assert 0 <= copy < g.ncopies, f"seg out of range: {src}"
        lane = src - copy * stride - copy * g.qshift
        assert 0 <= lane <= n_pad, f"bad lane {lane} (src {src})"
        covered[lane : lane + g.seg] += 1
    return covered


def test_window_plan_covers_all_pairs():
    """Every pair within h must fall in exactly one candidate window."""
    cfg = default_config(n=384)
    g = cfg.geom
    st = spawn(cfg, "blowup", seed=3)
    p = st.x
    n = cfg.n
    n_pad = pallas_pbf.pad_to_chunks(cfg, n)
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

    for c in range(n_pad // g.own):
        covered = _coverage(g, segs[c], segs[c, g.segw - 1], n_pad)
        # no double counting of REAL lanes (the sentinel pad zone absorbs
        # every dead slot, repeats allowed there)
        assert covered[:n_pad].max() <= 1, f"chunk {c}: candidate counted twice"
        # full coverage of true neighbors of every own particle in the chunk
        for i in range(c * g.own, min((c + 1) * g.own, n)):
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
    cfg = default_config(n=n, max_occupied_cells=4096, cell_capacity=512)
    g = cfg.geom
    assert n % g.own != 0
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
    n_pad = pallas_pbf.pad_to_chunks(cfg, n)
    cid = hashgrid.cell_ids(cfg, st.x)
    cid_pad = jnp.concatenate(
        [cid, jnp.full((n_pad - n,), cfg.num_nb_cells, jnp.int32)]
    )
    sc, order_pad = hashgrid.sort_by_cell(cfg, cid_pad)
    plan = pallas_pbf.build_plan(cfg, sc)
    assert int(plan.n_overflow) == 0, "tight windows must not overflow here"
    ps = np.asarray(st.x)[np.asarray(order_pad[:n])]
    segs = np.asarray(plan.seg_src)[:, 0, :]

    last_chunk = (n - 1) // g.own  # the mixed real/padding chunk
    for c in (last_chunk, last_chunk - 1):
        covered = _coverage(g, segs[c], segs[c, g.segw - 1], n_pad)
        assert covered[:n_pad].max() <= 1, f"chunk {c}: candidate counted twice"
        own = ps[c * g.own : min((c + 1) * g.own, n)]
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
    cfg = default_config(n=n, max_occupied_cells=1024, cell_capacity=512,
                         geom=GEOM)  # pin the default geometry: the
    # remainder-class construction below assumes CHAINS=3
    g = cfg.geom
    from pdb_sph_tpu.state import make_state

    rng = np.random.default_rng(5)
    xs = np.stack(
        [rng.random(n) * 2.0, rng.random(n) * 0.29, rng.random(n) * 0.09],
        axis=1,
    ).astype(np.float32)
    st = make_state(jnp.asarray(xs))

    n_pad = pallas_pbf.pad_to_chunks(cfg, n)
    cid = hashgrid.cell_ids(cfg, st.x)
    cid_pad = jnp.concatenate(
        [cid, jnp.full((n_pad - n,), cfg.num_nb_cells, jnp.int32)]
    )
    sc, _ = hashgrid.sort_by_cell(cfg, cid_pad)
    plan = pallas_pbf.build_plan(cfg, sc)
    nsegs = np.asarray(plan.seg_src)[:, 0, g.segw - 1]
    nblocks = -(-nsegs // g.spb_d)
    rems = {int(t % g.chains_d) for t in nblocks if t > 0}
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
    n_pad = pallas_pbf.pad_to_chunks(cfg, cfg.n)
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

    g = GEOM
    n = g.max_seg * g.seg + 4 * g.seg
    cfg = blowup_config(n=n, max_occupied_cells=1024, geom=g)
    rng = np.random.default_rng(11)
    # everything inside one h-cell: the own-cell window alone needs more
    # than MAX_SEG segments
    x = (0.95 + 0.04 * rng.random((n, 3))).astype(np.float32)
    st = make_state(jnp.asarray(x))

    n_pad = pallas_pbf.pad_to_chunks(cfg, n)
    cid = hashgrid.cell_ids(cfg, st.x)
    cid_pad = jnp.concatenate(
        [cid, jnp.full((n_pad - n,), cfg.num_nb_cells, jnp.int32)]
    )
    sc, _ = hashgrid.sort_by_cell(cfg, cid_pad)
    plan = pallas_pbf.build_plan(cfg, sc)
    assert int(plan.n_overflow) > 0, "expected candidate truncation"
    segs = np.asarray(plan.seg_src)[:, 0, : g.max_seg]
    assert (segs % g.seg == 0).all()
    stride = n_pad + g.cc_pad
    copy = segs // stride
    lane = segs - copy * stride - copy * g.qshift
    assert ((copy >= 0) & (copy < g.ncopies)).all()
    assert ((lane >= 0) & (lane <= n_pad)).all()
    nsegs = np.asarray(plan.seg_src)[:, 0, g.segw - 1]
    assert nsegs.max() <= g.max_seg


@pytest.mark.slow  # interpret-mode parity step, ~60 s
def test_maxlanes_knob_raises_capacity():
    """maxlanes=131072 (the extreme-occupancy setting,
    benchmarks/occupancy_1m.py) must widen the plan capacity consistently
    AND keep solver parity: a clustered scene that truncates at the default
    capacity becomes overflow-free at the raised one, and the pallas step
    still matches the cell backend. Runs IN-PROCESS — geometry is config
    data now, not import-time module state (round-3 VERDICT item 2)."""
    g = dataclasses.replace(GEOM, maxlanes=131072)
    assert g.max_seg * g.seg >= 130560
    assert g.segw > g.max_seg

    cfg = default_config(n=512, max_occupied_cells=1024, cell_capacity=512,
                         geom=g)
    st = spawn(cfg, "blowup", seed=0)
    cid = hashgrid.cell_ids(cfg, st.x)
    sc, _ = hashgrid.sort_by_cell(cfg, cid)
    plan = pallas_pbf.build_plan(cfg, sc)
    assert int(plan.n_overflow) == 0

    sc_step = make_step(cfg, backend="cell")(st)
    sp_step = make_step(cfg, backend="pallas", pallas_interpret=True)(st)
    x_c, _ = _unsort(sc_step)
    x_p, _ = _unsort(sp_step)
    np.testing.assert_allclose(x_p, x_c, rtol=1e-5, atol=1e-6)


@pytest.mark.slow  # interpret-mode parity step, ~60 s
def test_per_pass_cc_parity():
    """A NON-default per-pass width split (cc_d=512, cc_p=256 — different
    spb than the shipped 384/256) must keep exact solver parity with the
    cell backend: the SEG-granular plan feeds both widths, and the lcm
    rounding of max_seg covers both passes' final blocks. In-process via
    cfg.geom (round-3 VERDICT item 2)."""
    g = dataclasses.replace(GEOM, cc_d=512, cc_p=256)
    assert g.spb_d == 4 and g.spb_p == 2
    assert g.max_seg % g.spb_round == 0

    cfg = default_config(n=512, max_occupied_cells=1024, cell_capacity=512,
                         geom=g)
    st = spawn(cfg, "blowup", seed=0)
    sc_step = make_step(cfg, backend="cell")(st)
    sp_step = make_step(cfg, backend="pallas", pallas_interpret=True)(st)
    x_c, _ = _unsort(sc_step)
    x_p, _ = _unsort(sp_step)
    np.testing.assert_allclose(x_p, x_c, rtol=1e-5, atol=1e-6)


def test_two_geometries_coexist_in_process():
    """Two configs with different kernel geometries must run side by side
    in one process — the concrete capability the round-3 refactor bought
    (previously impossible: geometry was import-time module state). Build
    both plans and check each against its own capacity/table shape, then
    interleave the builds to prove no shared state leaks."""
    g_small = GEOM
    g_big = dataclasses.replace(GEOM, maxlanes=131072, own=128)
    cfg_a = default_config(n=384, geom=g_small)
    cfg_b = default_config(n=384, geom=g_big)
    assert cfg_a.geom.segw != cfg_b.geom.segw

    st = spawn(cfg_a, "dam_break", seed=9)
    for cfg in (cfg_a, cfg_b, cfg_a):  # interleaved
        g = cfg.geom
        n_pad = pallas_pbf.pad_to_chunks(cfg, cfg.n)
        cid = hashgrid.cell_ids(cfg, st.x)
        cid_pad = jnp.concatenate(
            [cid, jnp.full((n_pad - cfg.n,), cfg.num_nb_cells, jnp.int32)]
        )
        sc, _ = hashgrid.sort_by_cell(cfg, cid_pad)
        plan = pallas_pbf.build_plan(cfg, sc)
        assert plan.seg_src.shape == (n_pad // g.own, 1, g.segw)
        assert int(plan.n_overflow) == 0
        nsegs = np.asarray(plan.seg_src)[:, 0, g.segw - 1]
        assert nsegs.max() <= g.max_seg


def test_geometry_validation_rejects_bad_knobs():
    import pytest as _pytest

    for bad in (
        dict(seg=100),                  # not a 128 multiple
        dict(ncopies=3),                # doesn't divide seg
        dict(cc_d=200),                 # not a seg multiple
        dict(nbuf=2, chains_d=3),       # ring smaller than chain count
        dict(maxlanes=128),             # rounds to zero capacity
    ):
        with _pytest.raises(ValueError):
            dataclasses.replace(GEOM, **bad).validate()


def test_restrict_plan_zeroes_only_masked_chunks():
    """restrict_plan (the sharded path's per-pass own-row skip) must zero
    the block count of exactly the masked chunks and leave every segment
    source — shared by both passes — untouched."""
    cfg = default_config(n=384)
    g = cfg.geom
    st = spawn(cfg, "dam_break", seed=5)
    n_pad = pallas_pbf.pad_to_chunks(cfg, cfg.n)
    cid = hashgrid.cell_ids(cfg, st.x)
    cid_pad = jnp.concatenate(
        [cid, jnp.full((n_pad - cfg.n,), cfg.num_nb_cells, jnp.int32)]
    )
    sc, _ = hashgrid.sort_by_cell(cfg, cid_pad)
    plan = pallas_pbf.build_plan(cfg, sc)

    nc = n_pad // g.own
    rng = np.random.default_rng(0)
    keep = jnp.asarray(rng.random(nc) < 0.5)
    got = pallas_pbf.restrict_plan(cfg, plan, keep)

    a = np.asarray(plan.seg_src)[:, 0, :]
    b = np.asarray(got.seg_src)[:, 0, :]
    k = np.asarray(keep)
    last = g.segw - 1
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
    g = cfg.geom
    st = spawn(cfg, "dam_break", seed=6)
    n_pad = pallas_pbf.pad_to_chunks(cfg, cfg.n)
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

    zc = jnp.asarray(zc_all).reshape(-1, g.own)
    keep_d = np.asarray(((zc >= lo - 1) & (zc < hi + 1)).any(axis=1))
    keep_p = np.asarray(((zc >= lo) & (zc < hi)).any(axis=1))

    for c in range(n_pad // g.own):
        rows = zc_all[c * g.own:(c + 1) * g.own]
        want_p = bool(((rows >= lo) & (rows < hi)).any())
        want_d = bool(((rows >= lo - 1) & (rows < hi + 1)).any())
        assert keep_p[c] == want_p
        assert keep_d[c] == want_d
        # project never processes a chunk density skips
        assert not (keep_p[c] and not keep_d[c])
