"""Cell-list structure vs brute force on small particle sets."""

import jax.numpy as jnp
import numpy as np

from pdb_sph_tpu import default_config, spawn
from pdb_sph_tpu.ops import hashgrid

CFG = default_config(n=1000, max_occupied_cells=1024, cell_capacity=128)


def _grid(cfg, p):
    cid = hashgrid.cell_ids(cfg, p)
    sorted_cid, order = hashgrid.sort_by_cell(cfg, cid)
    return hashgrid.build_grid(cfg, sorted_cid, order), sorted_cid, order


def test_cell_ids_match_brute_force():
    p = np.asarray(spawn(CFG, "standard", 0).x)
    w = CFG.nb_grid_width
    ijk = np.clip(np.floor(p / CFG.nb_cell).astype(np.int64), 0, w - 1)
    expected = ijk[:, 0] + w * ijk[:, 1] + w * w * ijk[:, 2]
    got = np.asarray(hashgrid.cell_ids(CFG, jnp.asarray(p)))
    np.testing.assert_array_equal(got, expected)


def test_cell_ids_clamped_for_escapees():
    p = jnp.array([[-0.5, 0.5, 0.5], [9.5, 0.5, 0.5]], jnp.float32)
    got = np.asarray(hashgrid.cell_ids(CFG, p))
    w = CFG.nb_grid_width
    assert got[0] == 0 + w * 5 + w * w * 5
    assert got[1] == (w - 1) + w * 5 + w * w * 5


def test_sort_is_permutation_and_sorted():
    p = spawn(CFG, "standard", 1).x
    grid, sorted_cid, order = _grid(CFG, p)
    o = np.asarray(order)
    assert sorted(o.tolist()) == list(range(CFG.n))
    sc = np.asarray(sorted_cid)
    assert (np.diff(sc) >= 0).all()
    np.testing.assert_array_equal(sc, np.asarray(hashgrid.cell_ids(CFG, p))[o])


def test_counts_and_rows_match_numpy_groupby():
    p = spawn(CFG, "standard", 2).x
    grid, sorted_cid, _ = _grid(CFG, p)
    sc = np.asarray(sorted_cid)
    uniq, counts = np.unique(sc, return_counts=True)
    n_occ = len(uniq)
    got_counts = np.asarray(grid.counts)
    np.testing.assert_array_equal(got_counts[:n_occ], counts)
    assert (got_counts[n_occ:] == 0).all()
    # row/col reconstruct the sorted array exactly
    row, col = np.asarray(grid.row), np.asarray(grid.col)
    assert (row == np.searchsorted(uniq, sc)).all()
    start = np.concatenate([[0], np.cumsum(counts)[:-1]])
    assert (col == np.arange(CFG.n) - start[row]).all()


def test_neighbor_rows_complete():
    """Every pair within h must be discoverable through the 27-neighbor rows."""
    cfg = default_config(n=300, max_occupied_cells=512)
    p = np.asarray(spawn(cfg, "blowup", 3).x)  # blowup packs particles densely
    grid, sorted_cid, order = _grid(cfg, jnp.asarray(p))
    ps = p[np.asarray(order)]

    nbr = np.asarray(grid.nbr)
    row = np.asarray(grid.row)
    counts = np.asarray(grid.counts)

    # reconstruct, per sorted particle, the set of candidate rows
    d = ps[:, None, :] - ps[None, :, :]
    rd2 = (d * d).sum(-1)
    within = rd2 < cfg.h2
    for i in range(cfg.n):
        my_rows = set(nbr[row[i]].tolist())
        for j in np.nonzero(within[i])[0]:
            assert row[j] in my_rows, f"pair ({i},{j}) not covered by stencil"

    # and counts are consistent with rows
    np.testing.assert_array_equal(
        np.bincount(row, minlength=len(counts)), counts
    )


def test_table_scatter_gather_roundtrip():
    p = spawn(CFG, "standard", 4).x
    grid, _, order = _grid(CFG, p)
    vals = jnp.take(p[:, 0], order)
    table = hashgrid.scatter_table(CFG, grid, vals)
    back = hashgrid.gather_table(CFG, grid, table, jnp.full_like(vals, -7.0))
    assert int(grid.n_overflow) == 0
    np.testing.assert_array_equal(np.asarray(back), np.asarray(vals))


def test_overflow_detection():
    cfg = default_config(n=600, max_occupied_cells=128, cell_capacity=128)
    # all particles in one tiny spot -> one cell with 600 > 128 particles
    p = jnp.full((cfg.n, 3), 1.0, jnp.float32)
    grid, _, _ = _grid(cfg, p)
    assert int(grid.n_overflow) == cfg.n - cfg.cell_capacity
    assert int(grid.counts[0]) == cfg.n - (cfg.n - cfg.cell_capacity)


def test_slot_masks():
    p = spawn(CFG, "standard", 5).x
    grid, _, _ = _grid(CFG, p)
    masks = np.asarray(hashgrid.slot_masks(CFG, grid))
    counts = np.asarray(grid.counts)
    np.testing.assert_array_equal(masks.sum(1), np.minimum(counts, CFG.cell_capacity))
