"""XLA cell-list backend: the two hot PBF kernels over the cell table.

This is the portable (CPU/GPU/TPU) implementation of the reference's
`computeDensity` (src/FluidSimulator.cu:222-284) and
`projectDensityConstraint` (:286-343). The Pallas backend
(`pallas_pbf.py`) computes the *same* dense pair blocks with hand-placed
VMEM tiling; this one lets XLA do the scheduling and is the ground truth for
the Pallas parity tests.

Shape strategy: everything during the constraint iterations lives in
*cell-table layout* (max_occ + 1, capacity) — positions and lambdas alike —
so the 3-iteration Jacobi loop runs with zero scatters/gathers between
iterations. Work is chunked over table rows with `lax.map` to bound the
(chunk, capacity, capacity) pair-block working set.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SimConfig
from . import smoothing
from .hashgrid import CellGrid, gather_table, scatter_table, slot_masks

# rows per lax.map chunk; (CHUNK, cap, cap) f32 blocks stay ~MB-scale
_CHUNK = 8


def _row_chunks(cfg: SimConfig):
    max_occ = cfg.max_occupied_cells
    chunk = min(_CHUNK, max_occ)
    while max_occ % chunk:
        chunk -= 1
    return jnp.arange(max_occ, dtype=jnp.int32).reshape(max_occ // chunk, chunk)


def density_lambda_tables(cfg: SimConfig, tx, ty, tz, grid: CellGrid):
    """lambda in cell-table layout from position tables (computeDensity)."""
    valid = slot_masks(cfg, grid)  # (max_occ+1, cap)

    def per_chunk(rows):
        ox, oy, oz = tx[rows], ty[rows], tz[rows]          # (B, cap)
        ovalid = valid[rows]
        nbr = grid.nbr[rows]                               # (B, 27)
        rho = jnp.zeros_like(ox)
        g2 = jnp.zeros_like(ox)
        for k in range(27):
            nb = nbr[:, k]
            cx, cy, cz = tx[nb], ty[nb], tz[nb]            # (B, cap)
            cvalid = valid[nb]
            dx = ox[:, :, None] - cx[:, None, :]           # (B, cap, cap)
            dy = oy[:, :, None] - cy[:, None, :]
            dz = oz[:, :, None] - cz[:, None, :]
            rd2 = dx * dx + dy * dy + dz * dz
            mask = (
                ovalid[:, :, None]
                & cvalid[:, None, :]
                & (rd2 < jnp.float32(cfg.h2))
            )
            w, gg = smoothing.density_terms(cfg, rd2, mask)
            rho = rho + jnp.sum(w, axis=-1)
            g2 = g2 + jnp.sum(gg, axis=-1)
        return smoothing.lambda_from_sums(cfg, rho, g2)

    lam = jax.lax.map(per_chunk, _row_chunks(cfg))
    lam = lam.reshape(cfg.max_occupied_cells, cfg.cell_capacity)
    # sentinel row: lambda values there are never read through a valid mask,
    # but keep them finite zeros for safety
    return jnp.concatenate([lam, jnp.zeros((1, cfg.cell_capacity), lam.dtype)], axis=0)


def project_tables(cfg: SimConfig, tx, ty, tz, tlam, grid: CellGrid):
    """delta-p tables from position + lambda tables (projectDensityConstraint)."""
    valid = slot_masks(cfg, grid)

    def per_chunk(rows):
        ox, oy, oz = tx[rows], ty[rows], tz[rows]
        olam = tlam[rows]
        ovalid = valid[rows]
        nbr = grid.nbr[rows]
        sx = jnp.zeros_like(ox)
        sy = jnp.zeros_like(ox)
        sz = jnp.zeros_like(ox)
        for k in range(27):
            nb = nbr[:, k]
            cx, cy, cz, clam = tx[nb], ty[nb], tz[nb], tlam[nb]
            cvalid = valid[nb]
            dx = ox[:, :, None] - cx[:, None, :]
            dy = oy[:, :, None] - cy[:, None, :]
            dz = oz[:, :, None] - cz[:, None, :]
            rd2 = dx * dx + dy * dy + dz * dz
            mask = (
                ovalid[:, :, None]
                & cvalid[:, None, :]
                & (rd2 < jnp.float32(cfg.h2))
            )
            s = smoothing.delta_p_scale(
                cfg, rd2, olam[:, :, None], clam[:, None, :], mask
            )
            sx = sx + jnp.sum(s * dx, axis=-1)
            sy = sy + jnp.sum(s * dy, axis=-1)
            sz = sz + jnp.sum(s * dz, axis=-1)
        return sx, sy, sz

    dx, dy, dz = jax.lax.map(per_chunk, _row_chunks(cfg))
    out = []
    for d in (dx, dy, dz):
        d = d.reshape(cfg.max_occupied_cells, cfg.cell_capacity)
        out.append(
            jnp.concatenate([d, jnp.zeros((1, cfg.cell_capacity), d.dtype)], axis=0)
        )
    return tuple(out)


def solve_cell_list(cfg: SimConfig, p_sorted: jax.Array, grid: CellGrid):
    """The 3-iteration Jacobi constraint loop entirely in table layout.

    Returns positions in sorted order; particles that overflowed the table
    keep their predicted position (counted in grid.n_overflow).
    """
    tables = (
        scatter_table(cfg, grid, p_sorted[:, 0]),
        scatter_table(cfg, grid, p_sorted[:, 1]),
        scatter_table(cfg, grid, p_sorted[:, 2]),
    )

    def body(_, tables):
        tx, ty, tz = tables
        tlam = density_lambda_tables(cfg, tx, ty, tz, grid)
        ddx, ddy, ddz = project_tables(cfg, tx, ty, tz, tlam, grid)
        return (tx + ddx, ty + ddy, tz + ddz)

    tx, ty, tz = jax.lax.fori_loop(0, cfg.solver_iters, body, tables)

    return jnp.stack(
        [
            gather_table(cfg, grid, tx, p_sorted[:, 0]),
            gather_table(cfg, grid, ty, p_sorted[:, 1]),
            gather_table(cfg, grid, tz, p_sorted[:, 2]),
        ],
        axis=1,
    )


def density_tables(cfg: SimConfig, tx, ty, tz, grid: CellGrid):
    """rho only, for diagnostics (cheap single pass)."""
    valid = slot_masks(cfg, grid)

    def per_chunk(rows):
        ox, oy, oz = tx[rows], ty[rows], tz[rows]
        ovalid = valid[rows]
        nbr = grid.nbr[rows]
        rho = jnp.zeros_like(ox)
        for k in range(27):
            nb = nbr[:, k]
            cx, cy, cz = tx[nb], ty[nb], tz[nb]
            cvalid = valid[nb]
            dx = ox[:, :, None] - cx[:, None, :]
            dy = oy[:, :, None] - cy[:, None, :]
            dz = oz[:, :, None] - cz[:, None, :]
            rd2 = dx * dx + dy * dy + dz * dz
            mask = (
                ovalid[:, :, None]
                & cvalid[:, None, :]
                & (rd2 < jnp.float32(cfg.h2))
            )
            w, _ = smoothing.density_terms(cfg, rd2, mask)
            rho = rho + jnp.sum(w, axis=-1)
        return rho

    rho = jax.lax.map(per_chunk, _row_chunks(cfg))
    rho = rho.reshape(cfg.max_occupied_cells, cfg.cell_capacity)
    return jnp.concatenate(
        [rho, jnp.zeros((1, cfg.cell_capacity), rho.dtype)], axis=0
    )
