"""Multi-chip scale-out: z-slab domain decomposition over a device mesh.

The reference is strictly single-GPU (SURVEY.md section 2: no NCCL/MPI
anywhere); its only global primitive is one thrust sort. This module is the
TPU-native scaling story it never had: the hash grid is partitioned into
z-slabs over a 1-D `jax.sharding.Mesh`, and the per-step pipeline becomes

    predict -> adjacent-shard MIGRATION (ppermute left/right)
            -> local counting-sort cell grid (frozen for the step)
            -> per-iteration GHOST exchange of the two boundary cell-rows
               (ppermute), density + projection on local+ghost set
            -> finalize locally

Design notes:
  * Migration only needs adjacency: a particle moves dt*|v| << h per step
    while a slab is >= several cells wide. A `migration_overflow` counter
    reports any violation instead of corrupting physics.
  * TWO ghost cell-rows per side are exchanged so lambda for the *inner*
    ghost row is computed exactly on the receiver (its full neighborhood is
    present); the outer row only supplies positions. No lambda exchange is
    needed, matching the single-device solve exactly up to f32 summation
    order.
  * The neighbor structure is frozen per step from predicted positions
    (reference semantics: one sort per stepSimulation, src/FluidSimulator.cu
    :478) — per-iteration ghost refreshes reuse frozen packing indices, so
    slots are stable and the whole step stays one jitted SPMD program.
  * All buffers are fixed-capacity with validity columns; ppermute edge
    shards receive zero-filled buffers whose valid flag is 0.
"""

from __future__ import annotations

import dataclasses
import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SimConfig
from ..state import SimState
from ..ops import cell_list, hashgrid
from ..ops.collide import finalize
from ..ops.integrate import predict

SENTINEL = 1.0e9


@dataclasses.dataclass(frozen=True)
class ParallelConfig:
    """Capacities for the sharded layout (all per shard)."""

    n_devices: int
    capacity: int          # local particle slots
    mig_capacity: int      # per-direction migration slots
    ghost_capacity: int    # per-direction ghost slots
    z_cells_hi: int = 0    # slabs evenly partition z-cells [0, z_cells_hi);
                           # 0 -> full grid width. Set to the occupied z range
                           # for load balance (fluid lives in z < wall).

    @staticmethod
    def create(cfg: SimConfig, n_devices: int, slack: float = 1.6,
               state: SimState | None = None):
        """Size the per-shard buffers.

        `slack` covers load imbalance for roughly-uniform scenes; a
        CONCENTRATED scene (blowup: the whole fluid inside 1-2 slabs) needs
        either slack >= 4 or, better, `state=` — then capacity is floored at
        1.5x the measured worst-slab occupancy of the initial condition, so
        `distribute` cannot reject and the in-run merge counter has headroom
        while the concentration only ever *spreads* (PBF density projection
        pushes outward; nothing re-concentrates past the IC).
        """
        if n_devices == 1:
            # degenerate mesh: no imbalance, no neighbors to exchange with —
            # minimal buffers keep the sorts near the plain-path size
            cap = int(np.ceil(cfg.n / 128) * 128)
            return ParallelConfig(
                n_devices=1, capacity=cap, mig_capacity=128,
                ghost_capacity=128, z_cells_hi=0,
            )
        cap = int(np.ceil(cfg.n * slack / n_devices / 128) * 128)
        if state is not None:
            z_hi0 = min(
                cfg.nb_grid_width,
                int(np.ceil((cfg.wall * 1.25) / cfg.nb_cell)),
            )
            cz = np.clip(
                (np.asarray(state.x)[:, 2] / cfg.nb_cell).astype(np.int64),
                0, cfg.nb_grid_width - 1,
            )
            dest = np.minimum(cz * n_devices // z_hi0, n_devices - 1)
            occ_max = int(np.bincount(dest, minlength=n_devices).max())
            cap = max(cap, int(np.ceil(occ_max * 1.5 / 128) * 128))
        # fluid occupies z in [0, wall] (+ splash); slabs cover that range
        z_hi = min(
            cfg.nb_grid_width,
            int(np.ceil((cfg.wall * 1.25) / cfg.nb_cell)),
        )
        # ghost buffers hold two full boundary cell-rows per side: a slab a
        # few cells wide can have nearly its whole population in those rows,
        # so size them like the shard itself (the ppermute payload is only
        # (ghost_cap, 4) floats — capacity is cheap, silent truncation isn't)
        return ParallelConfig(
            n_devices=n_devices,
            capacity=cap,
            mig_capacity=max(128, -(-(cap // 4) // 128) * 128),
            ghost_capacity=cap,
            z_cells_hi=z_hi,
        )


def _validate_geometry(cfg: SimConfig, pcfg: ParallelConfig) -> None:
    """Fail fast on decomposition geometry that would silently break the
    exchange invariants (the round-1 review asked for these to be guarded,
    not just documented):

      * every slab must span >= 2 z-cells — the two-boundary-row ghost
        exchange only reaches the ADJACENT shard, so a 1-cell slab would
        need ghosts from two shards away and the inner-row lambda would be
        silently wrong;
      * capacities must be positive multiples of 128 (TPU lane alignment of
        every packed buffer).
    """
    D = pcfg.n_devices
    if D > 1:
        z_hi = pcfg.z_cells_hi or cfg.nb_grid_width
        # slab d covers [ceil(d*z_hi/D), ceil((d+1)*z_hi/D)); the narrowest
        # slab has floor(z_hi/D) cells
        min_slab = z_hi // D
        if min_slab < 2:
            raise ValueError(
                f"{D} slabs over {z_hi} z-cells leaves a slab only "
                f"{min_slab} cell(s) wide; the two-row ghost exchange needs "
                ">= 2 cells per slab (use fewer devices or a finer grid)"
            )
    for name in ("capacity", "mig_capacity", "ghost_capacity"):
        val = getattr(pcfg, name)
        if val <= 0 or val % 128 != 0:
            raise ValueError(f"{name} ({val}) must be a positive multiple "
                             "of 128")


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise ValueError(
            f"need {n} devices for the mesh but jax sees {len(devs)}; on CPU "
            "set jax.config.update('jax_num_cpu_devices', n) before first use"
        )
    return Mesh(np.array(devs[:n]), ("z",))


def _slab_of_zcell(pcfg: ParallelConfig, cfg: SimConfig, cz):
    z_hi = pcfg.z_cells_hi or cfg.nb_grid_width
    return jnp.minimum(cz * pcfg.n_devices // z_hi, pcfg.n_devices - 1)


def _slab_bounds(pcfg: ParallelConfig, cfg: SimConfig, d):
    """First z-cell of slab d and of slab d+1 (as traced values).

    Slab ownership is cz * D // z_hi == d (see _slab_of_zcell), whose first
    owned cell is ceil(d * z_hi / D) — floor here would overstate the slab
    leftward and make the ghost selections send only ONE boundary row when
    z_hi % D != 0, breaking the two-row exactness invariant.
    """
    z_hi = pcfg.z_cells_hi or cfg.nb_grid_width
    D = pcfg.n_devices
    lo = (jnp.int32(d) * z_hi + D - 1) // D
    hi = ((jnp.int32(d) + 1) * z_hi + D - 1) // D
    return lo, hi


def _pack_rows(mask, capacity: int):
    """Indices of up to `capacity` True slots (True slots first, stable),
    plus the validity of each packed slot."""
    order = jnp.argsort(jnp.where(mask, 0, 1), stable=True)
    idx = order[:capacity]
    ok = mask[idx]
    n_over = jnp.sum(mask).astype(jnp.int32) - jnp.sum(ok).astype(jnp.int32)
    return idx, ok, n_over


def _zcell(cfg: SimConfig, p):
    return jnp.clip(
        jnp.floor(p[:, 2] * (1.0 / cfg.nb_cell)).astype(jnp.int32),
        0, cfg.nb_grid_width - 1,
    )


def _pallas_solve_and_finalize(cfg, pcfg, p, last, active, ids, combined0,
                               gok0, exchange_ghosts, mig_overflow,
                               merge_overflow, ghost_overflow, interpret):
    """Per-shard constraint solve on the Pallas streaming kernels.

    Same frozen-neighbor-structure semantics as the cell-table path: the
    sort order and candidate-window plan come from the predicted positions;
    each iteration refreshes ghost *positions* into the frozen slots.
    Inactive slots (local padding, invalid ghosts) are assigned cell id
    num_nb_cells, which sorts them after every real particle and makes
    build_plan give their chunks zero candidates.
    """
    from ..ops import pallas_pbf

    cap = pcfg.capacity
    n_loc = cap + 2 * pcfg.ghost_capacity
    n_pad = pallas_pbf.pad_to_chunks(n_loc)

    combined_ok = jnp.concatenate([active, gok0])
    cid = jnp.where(
        combined_ok, hashgrid.cell_ids(cfg, combined0), cfg.num_nb_cells
    )
    cid_pad = jnp.concatenate(
        [cid, jnp.full((n_pad - n_loc,), cfg.num_nb_cells, jnp.int32)]
    )
    sorted_cid, order = jax.lax.sort(
        (cid_pad, jnp.arange(n_pad, dtype=jnp.int32)), num_keys=1
    )
    inv_order = jnp.argsort(order)
    plan = pallas_pbf.build_plan(cfg, sorted_cid)

    pad_tail = jnp.full((n_pad - n_loc, 3), pallas_pbf.SENTINEL, jnp.float32)
    # inactive entries carry this module's far-out sentinel (1e9); remap them
    # to the pallas one (-100): masked DMA-margin lanes can leave an ulp-level
    # residual s that gets multiplied by the candidate coordinate, and 1e9
    # turns that into a visible uniform drift
    ok_sorted = jnp.take(
        jnp.concatenate([combined_ok, jnp.zeros((n_pad - n_loc,), bool)]),
        order,
    )[:, None]

    def body(_, p_loc):
        ghosts, _ = exchange_ghosts(p_loc)
        combined = jnp.concatenate([p_loc, ghosts, pad_tail])
        p_sorted = jnp.take(combined, order, axis=0)          # (n_pad, 3)
        p_sorted = jnp.where(ok_sorted, p_sorted, pallas_pbf.SENTINEL)
        pT = jnp.concatenate(
            [p_sorted, jnp.zeros((n_pad, 1), jnp.float32)], axis=1)
        p4 = pallas_pbf._p4_from_pT(pT)
        lam = pallas_pbf.density_pass(cfg, pT, p4, plan, interpret=interpret)
        pT = jax.lax.dynamic_update_slice(pT, lam, (0, 3))
        p4 = pallas_pbf.splice_lambda(p4, lam, n_pad)
        outT = pallas_pbf.project_pass(cfg, pT, p4, plan, interpret=interpret)
        dp_sorted = outT[:, 0:3] - p_sorted
        dp = jnp.take(dp_sorted, inv_order, axis=0)[:cap]
        return p_loc + jnp.where(active[:, None], dp, 0.0)

    p = jax.lax.fori_loop(0, cfg.solver_iters, body, p)

    x_new, v_new = finalize(cfg, p, last)
    x_new = jnp.where(active[:, None], x_new, SENTINEL)
    v_new = jnp.where(active[:, None], v_new, 0.0)
    stats = jnp.stack(
        [
            jnp.sum(active).astype(jnp.int32),
            mig_overflow,
            merge_overflow,
            ghost_overflow,
            plan.n_overflow,
        ]
    )[None]
    return x_new, v_new, ids, stats


def _shard_step(cfg: SimConfig, pcfg: ParallelConfig, backend: str,
                pallas_interpret: bool, x, v, ids):
    """Body run under shard_map; x (cap, 3), v (cap, 3), ids (cap,)."""
    D = pcfg.n_devices
    cap = pcfg.capacity
    me = jax.lax.axis_index("z")
    right_perm = [(i, i + 1) for i in range(D - 1)]
    left_perm = [(i + 1, i) for i in range(D - 1)]

    def pshift(arr, perm):
        return jax.lax.ppermute(arr, "z", perm) if perm else jnp.zeros_like(arr)

    active = ids >= 0
    p, _ = predict(cfg, x, v)
    p = jnp.where(active[:, None], p, SENTINEL)
    last = jnp.where(active[:, None], x, SENTINEL)

    # ---------------- migration (adjacent shards only) ----------------
    dest = _slab_of_zcell(pcfg, cfg, _zcell(cfg, p))
    dest_clipped = jnp.clip(dest, me - 1, me + 1)
    mig_overflow = jnp.sum(active & (dest != dest_clipped)).astype(jnp.int32)

    def mig_buffer(direction_mask):
        idx, ok, over = _pack_rows(direction_mask, pcfg.mig_capacity)
        buf = jnp.concatenate(
            [
                jnp.where(ok[:, None], p[idx], SENTINEL),
                jnp.where(ok[:, None], last[idx], SENTINEL),
                ok[:, None].astype(jnp.float32),
                jax.lax.bitcast_convert_type(
                    jnp.where(ok, ids[idx], -1), jnp.float32
                )[:, None],
            ],
            axis=1,
        )  # (mig_cap, 8)
        return buf, over

    go_left = active & (dest_clipped < me)
    go_right = active & (dest_clipped > me)
    buf_l, over_l = mig_buffer(go_left)
    buf_r, over_r = mig_buffer(go_right)
    recv_from_right = pshift(buf_l, left_perm)   # their left-goers arrive here
    recv_from_left = pshift(buf_r, right_perm)
    mig_overflow = mig_overflow + over_l + over_r

    stay = active & (dest_clipped == me)

    def unpack(buf):
        bp = buf[:, 0:3]
        blast = buf[:, 3:6]
        bok = buf[:, 6] > 0.5
        bids = jax.lax.bitcast_convert_type(buf[:, 7], jnp.int32)
        return bp, blast, jnp.where(bok, bids, -1), bok

    rp_l, rlast_l, rids_l, rok_l = unpack(recv_from_left)
    rp_r, rlast_r, rids_r, rok_r = unpack(recv_from_right)

    all_p = jnp.concatenate([jnp.where(stay[:, None], p, SENTINEL), rp_l, rp_r])
    all_last = jnp.concatenate(
        [jnp.where(stay[:, None], last, SENTINEL), rlast_l, rlast_r]
    )
    all_ids = jnp.concatenate([jnp.where(stay, ids, -1), rids_l, rids_r])
    all_ok = jnp.concatenate([stay, rok_l, rok_r])

    idx, ok, merge_overflow = _pack_rows(all_ok, cap)
    p = jnp.where(ok[:, None], all_p[idx], SENTINEL)
    last = jnp.where(ok[:, None], all_last[idx], SENTINEL)
    ids = jnp.where(ok, all_ids[idx], -1)
    active = ok

    # ---------------- frozen ghost packing + neighbor structure -------
    lo, hi = _slab_bounds(pcfg, cfg, me)
    cz = _zcell(cfg, p)
    # edge shards have no neighbor on that side: selecting their boundary
    # rows anyway would waste ghost capacity and fire spurious overflow
    ghost_l_idx, ghost_l_ok, gover_l = _pack_rows(
        active & (cz < lo + 2) & (me > 0), pcfg.ghost_capacity
    )
    ghost_r_idx, ghost_r_ok, gover_r = _pack_rows(
        active & (cz >= hi - 2) & (me < D - 1), pcfg.ghost_capacity
    )
    ghost_overflow = gover_l + gover_r

    def exchange_ghosts(p_now):
        def buf(idx, ok):
            return jnp.concatenate(
                [
                    jnp.where(ok[:, None], p_now[idx], SENTINEL),
                    ok[:, None].astype(jnp.float32),
                ],
                axis=1,
            )

        from_left = pshift(buf(ghost_r_idx, ghost_r_ok), right_perm)
        from_right = pshift(buf(ghost_l_idx, ghost_l_ok), left_perm)
        gp = jnp.concatenate([from_left[:, 0:3], from_right[:, 0:3]])
        gok = jnp.concatenate([from_left[:, 3], from_right[:, 3]]) > 0.5
        return jnp.where(gok[:, None], gp, SENTINEL), gok

    ghosts0, gok0 = exchange_ghosts(p)
    combined0 = jnp.concatenate([p, ghosts0])          # (cap + 2G, 3)

    if backend == "pallas":
        return _pallas_solve_and_finalize(
            cfg, pcfg, p, last, active, ids, combined0, gok0,
            exchange_ghosts, mig_overflow, merge_overflow, ghost_overflow,
            pallas_interpret,
        )

    # inactive slots (padding, invalid ghosts) get the explicit past-the-end
    # cell id, exactly like the pallas branch: they sort after every real
    # particle and are excluded from the table and the overflow count.
    # (Round 1 instead parked them in the LAST REAL cell via position
    # clamping and ignored that cell — silently dropping any real particle
    # that reached the grid's far-corner cell, which became reachable once
    # the neighbor grid shrank to the box extent. Advisor finding.)
    combined_ok0 = jnp.concatenate([active, gok0])
    cid = jnp.where(
        combined_ok0, hashgrid.cell_ids(cfg, combined0), cfg.num_nb_cells
    )
    sorted_cid, order = hashgrid.sort_by_cell(cfg, cid)
    inv_order = jnp.argsort(order)
    grid = hashgrid.build_grid(cfg, sorted_cid, order,
                               ignore_cell=cfg.num_nb_cells)

    # ---------------- constraint iterations ---------------------------
    def body(_, p_loc):
        ghosts, _ = exchange_ghosts(p_loc)
        combined = jnp.concatenate([p_loc, ghosts])
        p_sorted = jnp.take(combined, order, axis=0)
        tx = hashgrid.scatter_table(cfg, grid, p_sorted[:, 0])
        ty = hashgrid.scatter_table(cfg, grid, p_sorted[:, 1])
        tz = hashgrid.scatter_table(cfg, grid, p_sorted[:, 2])
        tlam = cell_list.density_lambda_tables(cfg, tx, ty, tz, grid)
        ddx, ddy, ddz = cell_list.project_tables(cfg, tx, ty, tz, tlam, grid)
        dp_sorted = jnp.stack(
            [
                hashgrid.gather_table(cfg, grid, ddx, jnp.zeros_like(p_sorted[:, 0])),
                hashgrid.gather_table(cfg, grid, ddy, jnp.zeros_like(p_sorted[:, 0])),
                hashgrid.gather_table(cfg, grid, ddz, jnp.zeros_like(p_sorted[:, 0])),
            ],
            axis=1,
        )
        dp = jnp.take(dp_sorted, inv_order, axis=0)[:cap]
        return p_loc + jnp.where(active[:, None], dp, 0.0)

    p = jax.lax.fori_loop(0, cfg.solver_iters, body, p)

    # ---------------- finalize ----------------------------------------
    x_new, v_new = finalize(cfg, p, last)
    x_new = jnp.where(active[:, None], x_new, SENTINEL)
    v_new = jnp.where(active[:, None], v_new, 0.0)

    stats = jnp.stack(
        [
            jnp.sum(active).astype(jnp.int32),
            mig_overflow,
            merge_overflow,
            ghost_overflow,
            grid.n_overflow,
        ]
    )[None]
    return x_new, v_new, ids, stats


@functools.lru_cache(maxsize=32)
def make_sharded_step(cfg: SimConfig, pcfg: ParallelConfig, mesh: Mesh,
                      backend: str = "cell", pallas_interpret: bool = False):
    """Jitted SPMD step over (D*cap, ...) arrays sharded along the mesh.
    Memoized on its (hashable) arguments so repeat calls share one compile.

    backend "cell" solves on the XLA cell table (portable; the parity
    reference); "pallas" runs the streaming window kernels per shard (the
    production multi-chip path — same physics, same frozen neighbor
    structure, per-iteration ghost refresh).

    Returns fn(x, v, ids) -> (x, v, ids, stats) with stats (D, 5):
    [active, migration_overflow, merge_overflow, ghost_overflow,
    neighbor_structure_overflow] per shard.
    """
    if backend not in ("cell", "pallas"):
        raise ValueError(f"unknown sharded backend {backend!r}")
    _validate_geometry(cfg, pcfg)
    fn = jax.shard_map(
        partial(_shard_step, cfg, pcfg, backend, pallas_interpret),
        mesh=mesh,
        in_specs=(P("z"), P("z"), P("z")),
        out_specs=(P("z"), P("z"), P("z"), P("z")),
        # pallas_call out_shapes don't carry varying-mesh-axes metadata yet
        check_vma=(backend != "pallas"),
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=32)
def make_sharded_rollout(cfg: SimConfig, pcfg: ParallelConfig, mesh: Mesh,
                         backend: str = "cell",
                         pallas_interpret: bool = False,
                         unroll_steps: int = 1):
    """N sharded steps per device call via lax.scan — same amortization as
    core.step.make_rollout (the tunneled runtime charges ~30-60 ms per jitted
    call). Returns fn(x, v, ids) -> (x, v, ids, last_stats)."""
    if backend not in ("cell", "pallas"):
        raise ValueError(f"unknown sharded backend {backend!r}")
    body = jax.shard_map(
        partial(_shard_step, cfg, pcfg, backend, pallas_interpret),
        mesh=mesh,
        in_specs=(P("z"), P("z"), P("z")),
        out_specs=(P("z"), P("z"), P("z"), P("z")),
        check_vma=(backend != "pallas"),
    )

    def roll(x, v, ids):
        def scan_body(carry, _):
            x, v, ids = carry
            x, v, ids, stats = body(x, v, ids)
            return (x, v, ids), stats

        (x, v, ids), stats = jax.lax.scan(
            scan_body, (x, v, ids), None, length=unroll_steps
        )
        return x, v, ids, stats[-1]

    return jax.jit(roll)


def distribute(cfg: SimConfig, pcfg: ParallelConfig, state: SimState,
               mesh: Mesh):
    """SimState -> sharded (x, v, ids) laid out by owning slab."""
    D, cap = pcfg.n_devices, pcfg.capacity
    x = np.asarray(state.x)
    v = np.asarray(state.v)
    ids = np.asarray(state.ids)
    cz = np.clip((x[:, 2] / cfg.nb_cell).astype(np.int64), 0,
                 cfg.nb_grid_width - 1)
    z_hi = pcfg.z_cells_hi or cfg.nb_grid_width
    dest = np.minimum(cz * D // z_hi, D - 1)

    gx = np.full((D, cap, 3), SENTINEL, np.float32)
    gv = np.zeros((D, cap, 3), np.float32)
    gids = np.full((D, cap), -1, np.int32)
    for d in range(D):
        sel = np.nonzero(dest == d)[0]
        if len(sel) > cap:
            raise ValueError(
                f"shard {d} needs {len(sel)} slots > capacity {cap}; "
                "increase ParallelConfig.capacity"
            )
        gx[d, : len(sel)] = x[sel]
        gv[d, : len(sel)] = v[sel]
        gids[d, : len(sel)] = ids[sel]

    shard = NamedSharding(mesh, P("z"))
    return (
        jax.device_put(gx.reshape(D * cap, 3), shard),
        jax.device_put(gv.reshape(D * cap, 3), shard),
        jax.device_put(gids.reshape(D * cap), shard),
    )


def collect(x, v, ids) -> SimState:
    """Sharded arrays -> a dense SimState in original id order."""
    x = np.asarray(x)
    v = np.asarray(v)
    ids = np.asarray(ids)
    sel = ids >= 0
    x, v, ids = x[sel], v[sel], ids[sel]
    order = np.argsort(ids)
    return SimState(
        x=jnp.asarray(x[order]),
        v=jnp.asarray(v[order]),
        ids=jnp.asarray(ids[order]),
        step=jnp.zeros((), jnp.int32),
    )
