"""Counting-sort cell list — the TPU-native spatial neighbor structure.

Replaces the reference's three-part structure (SURVEY.md C4-C7):
  * `computeSpatialHash` (src/FluidSimulator.cu:151-166)  -> `cell_ids`
  * `thrust::sort_by_key` (:478)                          -> `jax.lax.sort`
  * `sortSpatialArrays` gather (:447-458)                 -> one `take`
  * `findCellsInArray` segment bounds (:169-196)          -> compact cell table

Differences by design (documented latent bugs of the reference, SURVEY.md
section 3): cell ids are clamped per-axis into the grid (the reference has no
upper clamp and leaves stale entries for negative ids), and the cell table is
rebuilt functionally every step (the reference never clears `dev_cellBounds`).

The key TPU idea: instead of (start, end) ranges consumed by per-thread
dynamic loops, particles are scattered into a dense *cell table* of shape
(max_occupied_cells + 1, cell_capacity) — row = compact index of an occupied
cell, lane = slot within the cell, final row = all-empty sentinel. The 27-cell
neighbor scan then becomes 27 *row gathers* followed by dense
(capacity x capacity) pair blocks: static shapes, lane-aligned, VPU/MXU
friendly, and directly consumable by both the XLA backend and the Pallas
kernels. The grid used here is the *internal* grid (cell size = h, not the
reference's 2h) — same physics, ~6x fewer candidate pairs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SimConfig

# 27-stencil offsets, x fastest (matches the reference's loop nest order,
# src/FluidSimulator.cu:248-252, though order is irrelevant to the sums).
_OFFSETS = [(dx, dy, dz) for dz in (-1, 0, 1) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


class CellGrid(NamedTuple):
    """Per-step neighbor structure over the *sorted* particle order."""

    order: jax.Array        # (n,)  sorted index -> pre-sort index
    sorted_cid: jax.Array   # (n,)  cell id per sorted particle
    row: jax.Array          # (n,)  compact occupied-cell row (may be >= max_occ)
    col: jax.Array          # (n,)  slot within the cell (may be >= capacity)
    counts: jax.Array       # (max_occ + 1,) particles per row; sentinel row = 0
    nbr: jax.Array          # (max_occ, 27) compact row of each neighbor cell,
                            #               max_occ (sentinel) when empty/out-of-grid
    n_overflow: jax.Array   # ()   particles dropped from the table (int32)


def cell_ids(cfg: SimConfig, p: jax.Array) -> jax.Array:
    """Linear cell id on the internal grid, clamped into [0, W)^3.

    The reference's hash is `(int)(x*inv) + (int)(y*inv)*W + (int)(z*inv)*W^2`
    (src/FluidSimulator.cu:159); the clamp fixes its out-of-grid UB. Physics
    is unaffected: escaped particles are pulled back by the wall response and
    the r < h test masks any clamped-cell false candidates.
    """
    w = cfg.nb_grid_width
    ijk = jnp.clip(
        jnp.floor(p * jnp.float32(1.0 / cfg.nb_cell)).astype(jnp.int32), 0, w - 1
    )
    return ijk[:, 0] + w * ijk[:, 1] + (w * w) * ijk[:, 2]


def sort_by_cell(cfg: SimConfig, cid: jax.Array):
    """(sorted_cid, order) — the lax.sort that replaces thrust::sort_by_key."""
    n = cid.shape[0]
    sorted_cid, order = jax.lax.sort(
        (cid, jnp.arange(n, dtype=jnp.int32)), num_keys=1
    )
    return sorted_cid, order


def build_grid(cfg: SimConfig, sorted_cid: jax.Array, order: jax.Array,
               ignore_cell: int | None = None) -> CellGrid:
    """Build the compact occupied-cell structure from sorted cell ids.

    `ignore_cell`: a cell id whose occupants are left out of the table and
    out of the overflow count — the sharded path parks inactive (sentinel)
    slots in the last grid cell, and they would otherwise burn a row, eat
    capacity, and pollute the overflow diagnostic.
    """
    n = sorted_cid.shape[0]
    max_occ = cfg.max_occupied_cells
    cap = cfg.cell_capacity
    iota = jnp.arange(n, dtype=jnp.int32)

    # segment boundaries (the functional findCellsInArray)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_cid[1:] != sorted_cid[:-1]]
    )
    row = jnp.cumsum(is_start.astype(jnp.int32)) - 1          # compact cell index
    seg_start = jax.lax.cummax(jnp.where(is_start, iota, 0))  # first index of my cell
    col = iota - seg_start                                    # slot within cell

    in_table = (row < max_occ) & (col < cap)
    counted = jnp.ones((n,), bool)
    if ignore_cell is not None:
        counted = sorted_cid != ignore_cell
        in_table = in_table & counted
    scatter_row = jnp.where(in_table, row, max_occ + 1)       # OOB -> dropped

    counts = jnp.zeros((max_occ + 1,), jnp.int32).at[
        scatter_row
    ].add(1, mode="drop")

    # cell id of each occupied row (-1 for unused rows)
    occ_cid = jnp.full((max_occ,), -1, jnp.int32).at[scatter_row].set(
        sorted_cid, mode="drop"
    )

    # cell id -> compact row lookup (sentinel max_occ everywhere else)
    num_cells = cfg.num_nb_cells
    cell_to_row = jnp.full((num_cells,), max_occ, jnp.int32).at[
        jnp.where(occ_cid >= 0, occ_cid, num_cells + 1)
    ].set(jnp.arange(max_occ, dtype=jnp.int32), mode="drop")

    # 27-neighbor compact rows per occupied row
    w = cfg.nb_grid_width
    cx = occ_cid % w
    cy = (occ_cid // w) % w
    cz = occ_cid // (w * w)
    nbr_cols = []
    for dx, dy, dz in _OFFSETS:
        nx, ny, nz = cx + dx, cy + dy, cz + dz
        valid = (
            (occ_cid >= 0)
            & (nx >= 0) & (nx < w)
            & (ny >= 0) & (ny < w)
            & (nz >= 0) & (nz < w)
        )
        ncell = nx + w * ny + (w * w) * nz
        nrow = cell_to_row[jnp.where(valid, ncell, 0)]
        nbr_cols.append(jnp.where(valid, nrow, max_occ))
    nbr = jnp.stack(nbr_cols, axis=1)

    n_overflow = jnp.sum(~in_table & counted).astype(jnp.int32)

    return CellGrid(
        order=order,
        sorted_cid=sorted_cid,
        row=row,
        col=col,
        counts=counts,
        nbr=nbr,
        n_overflow=n_overflow,
    )


def scatter_table(cfg: SimConfig, grid: CellGrid, vals_sorted: jax.Array) -> jax.Array:
    """(n,) sorted values -> (max_occ + 1, capacity) cell-table layout.

    Overflowing particles are dropped (counted in grid.n_overflow); the
    sentinel row stays zero.
    """
    max_occ, cap = cfg.max_occupied_cells, cfg.cell_capacity
    table = jnp.zeros((max_occ + 1, cap), vals_sorted.dtype)
    r = jnp.where(grid.row < max_occ, grid.row, max_occ + 1)
    return table.at[r, grid.col].set(vals_sorted, mode="drop")


def gather_table(cfg: SimConfig, grid: CellGrid, table: jax.Array, fallback: jax.Array):
    """Cell-table layout back to (n,) sorted order; dropped slots -> fallback."""
    max_occ, cap = cfg.max_occupied_cells, cfg.cell_capacity
    ok = (grid.row < max_occ) & (grid.col < cap)
    vals = table[jnp.where(ok, grid.row, 0), jnp.where(ok, grid.col, 0)]
    return jnp.where(ok, vals, fallback)


def slot_masks(cfg: SimConfig, grid: CellGrid):
    """(max_occ + 1, capacity) bool: which table slots hold real particles."""
    lane = jnp.arange(cfg.cell_capacity, dtype=jnp.int32)
    counts_capped = jnp.minimum(grid.counts, cfg.cell_capacity)
    return lane[None, :] < counts_capped[:, None]
