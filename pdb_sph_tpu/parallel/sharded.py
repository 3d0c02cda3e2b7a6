"""Multi-chip scale-out: load-balanced SUB-ROW (zx-key) domain
decomposition over a device mesh.

The reference is strictly single-GPU (SURVEY.md section 2: no NCCL/MPI
anywhere); its only global primitive is one thrust sort. This module is the
TPU-native scaling story it never had: the hash grid is partitioned over a
1-D `jax.sharding.Mesh` along the lexicographic (z-row, x-cell) key

    key = z_cell * W + x_cell          (W = cfg.nb_grid_width)

so a slab boundary can cut a z-row mid-way along x. Round 4's z-slab
decomposition could only place boundaries on whole z-rows, and at the 1M
x 8 flagship a single boundary row holds 40-100k particles — a 1.33x
worst/mean imbalance the balance tracker could not beat (docs/SCALING.md
section 2, "row-granular balance"). Key-space boundaries remove that
term: the quantile split lands within one x-CELL of the even share, and
the in-step tracker trims at x-cell granularity. The per-step pipeline:

    occupancy-aware BOUNDARY UPDATE (all_gather of per-shard loads)
            -> predict -> adjacent-shard MIGRATION (ppermute left/right)
            -> local counting-sort cell grid (frozen for the step)
            -> per-iteration GHOST exchange of the boundary key-band
               (ppermute), density + projection on local+ghost set
            -> finalize locally

Design notes:
  * LOAD BALANCE. Slab boundaries are *data*, not config: a replicated
    (D+1,)-int32 vector of keys rides with the state
    (`ShardedState.bounds`; slab d owns keys [b_d, b_{d+1})).
    `distribute` picks initial boundaries that equalize per-shard
    particle counts (a quantile split of the key histogram — exact to
    one x-cell), and every step each shard all_gathers its load plus the
    populations of its first/last boundary strips at three scales (one
    z-row = W keys, a W/8-key sub-strip, one key) and applies the same
    deterministic rule everywhere: move a boundary toward the heavier
    side by the LARGEST strip whose population keeps |L - R|
    non-increasing (2*strip <= |L - R|), with the donor keeping the
    minimum slab width and the recipient staying under capacity. The
    row-scale move tracks a physical front as fast as round 4's
    one-row-per-step rule; the key-scale move trims the balance to
    ~single-cell granularity, which row moves cannot. Boundaries
    alternate by parity (even boundaries on even steps) so a shard's two
    boundaries never move in the same step — the min-width invariant
    survives concurrent updates by construction.
  * Migration only needs adjacency: a particle's key moves by at most
    ~W+1 per step (dt*|v| << h per axis) while a slab is >= 2W+2 keys
    wide, and boundary shifts are <= W keys. A `migration_overflow`
    counter reports any violation instead of corrupting physics.
  * The ghost band per side is ghost_rows*W + 2 KEYS (two boundary
    cell-rows, plus a 2-key margin that covers the x-split corner when a
    boundary cuts mid-row): lambda for the *inner* ghost ring is
    computed exactly on the receiver (its full neighborhood is present);
    the outer band only supplies positions. No lambda exchange is
    needed, matching the single-device solve exactly up to f32 summation
    order. (With a row-aligned boundary the band is exactly round 4's
    two rows plus two cells of the third.)
  * The neighbor structure is frozen per step from predicted positions
    (reference semantics: one sort per stepSimulation, src/FluidSimulator.cu
    :478) — per-iteration ghost refreshes reuse frozen packing indices, so
    slots are stable and the whole step stays one jitted SPMD program.
  * All buffers are fixed-capacity with validity columns; ppermute edge
    shards receive zero-filled buffers whose valid flag is 0.
  * A 1-device mesh takes a dedicated fast path: no migration, no ghost
    exchange, no boundary update — the degenerate decomposition should
    cost (nearly) nothing over the unsharded step (docs/PERF.md has the
    measured overhead decomposition).
"""

from __future__ import annotations

import dataclasses
import functools
from functools import partial
from typing import NamedTuple

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


class ShardedState(NamedTuple):
    """The mesh-resident simulation state.

    x, v: (D*cap, 3) f32 sharded along the mesh; inactive slots hold
        SENTINEL / 0.
    ids: (D*cap,) i32 original particle identity; -1 marks inactive slots.
    bounds: (D, D+2) i32, row d = [step_counter, b0, ..., bD] — every row
        identical (the per-shard replicated copy of the slab boundaries in
        zx-KEY units, key = z_cell*W + x_cell; slab d owns keys
        [b_d, b_{d+1}), b0 = 0, bD = W*W). The counter drives the
        parity-alternating boundary updates.
    """

    x: jax.Array
    v: jax.Array
    ids: jax.Array
    bounds: jax.Array


@dataclasses.dataclass(frozen=True)
class ParallelConfig:
    """Capacities for the sharded layout (all per shard)."""

    n_devices: int
    capacity: int          # local particle slots
    mig_capacity: int      # per-direction migration slots
    ghost_capacity: int    # per-direction ghost slots
    rebalance: bool = True  # occupancy-tracking boundary updates each step
    ghost_rows: int = 2    # z-row depth of the ghost band per side; the
                           # shipped band is ghost_rows*W + 2 KEYS
                           # (_ghost_band_keys — the +2 covers the x-split
                           # corner of a mid-row boundary).
                           # The exchange must cover depth 2h: h for the
                           # density sums of own boundary-row particles,
                           # plus h more to complete the lambda of every
                           # ghost the project pass consumes. At the
                           # production neighbor grid (nb_cell == h) two
                           # rows == 2h exactly — the default is already
                           # the physics-minimal set, there is no
                           # cheaper legal value.
                           # 1 (h-band mode) is legal only when
                           # nb_cell >= 2h (validated): one coarse row
                           # then covers the full 2h depth — e.g. a
                           # reference-style cell_size == 2h neighbor
                           # grid. The shipped row's outer-half lambdas
                           # are incomplete but never consumed (> h from
                           # every own row at plan freeze, rd2-clamped);
                           # divergence from single-device parity is the
                           # intra-step drift tail across the unshipped
                           # outer row, bounded by the h-band parity
                           # test. docs/SCALING.md section 9.
    z_cells_hi: int = 0    # legacy even-split range for rebalance=False:
                           # slabs evenly partition z-cells [0, z_cells_hi);
                           # 0 -> full grid width. Ignored when rebalancing
                           # (quantile initial bounds cover the full grid).

    @staticmethod
    def create(cfg: SimConfig, n_devices: int, slack: float = 1.6,
               state: SimState | None = None, rebalance: bool = True,
               ghost_slack: float = 2.5, mig_slack: float = 3.0,
               ghost_rows: int = 2, occ_slack: float = 1.5):
        """Size the per-shard buffers.

        With rebalancing (default) the boundaries keep shards near n/D, so
        `slack` only covers transients; pass `state=` to floor capacity at
        occ_slack x the measured worst-slab occupancy of the initial
        *quantile* split (exact to one x-cell in key space).

        Ghost/migration buffers are sized from the state too: ghost_slack x
        the worst initial ghost-band population per side, mig_slack x the
        worst single row-scale strip (the largest balance donation one
        boundary move can make in one step; ordinary advection crossers
        are a small fraction of that). Every exchange buffer is a FIXED
        ppermute payload and rides
        the per-shard sort at solve width cap + 2*ghost_capacity, so
        oversizing is paid every step in wire bytes AND sort/stream lanes —
        round 3 measured ghost_capacity = capacity at 5.5x the true 1M
        collapse maximum (docs/SCALING.md). Truncation stays loud: the
        ghost/migration overflow counters report any slack violation, and
        make_sharded_rollout SUMS them over every step of a chunk so a
        transient violation cannot hide.

        CAVEAT (advisor, round 3): the measurement is taken from the state
        passed HERE — typically the spawn — while collapse concentrates
        particles into fewer z-rows and the boundaries drift, so runtime
        boundary-row populations can exceed the spawn-time numbers. The
        default slacks (2.5x ghosts / 3.0x migration) absorbed the worst
        drift observed over the 240-step 1M collapse
        (benchmarks/OCC_1M_BALANCED.json: max ghosts/side 90,691 vs
        ghost_capacity 212k at spawn sizing) but are validated for the
        dam-break family only; for a novel scene either pass a
        representative worst-case `state` (e.g. from a short calibration
        rollout) or keep the overflow counters gating the run, as the CLI
        and the soak test do. Without a state both capacities fall back to
        the conservative round-2 sizing (ghost = capacity, migration =
        capacity/2), which cannot truncate.
        """
        if n_devices == 1:
            # degenerate mesh: no imbalance, no neighbors to exchange with —
            # minimal buffers keep the sorts near the plain-path size
            cap = int(np.ceil(cfg.n / 128) * 128)
            return ParallelConfig(
                n_devices=1, capacity=cap, mig_capacity=128,
                ghost_capacity=128, rebalance=False, z_cells_hi=0,
                ghost_rows=ghost_rows,
            )
        cap = int(np.ceil(cfg.n * slack / n_devices / 128) * 128)
        w = cfg.nb_grid_width
        z_hi = min(w, int(np.ceil((cfg.wall * 1.25) / cfg.nb_cell)))
        ghost_cap = None
        mig_cap = None
        if state is not None:
            b = initial_bounds(cfg, n_devices, state=state,
                               rebalance=rebalance, z_cells_hi=z_hi)
            key = _np_zxkey(cfg, np.asarray(state.x))
            dest = np.searchsorted(b[1:-1], key, side="right")
            occ_max = int(np.bincount(dest, minlength=n_devices).max())
            cap = max(cap, int(np.ceil(occ_max * occ_slack / 128) * 128))
            lo, hi = b[dest], b[dest + 1]
            gband = ghost_rows * w + 2
            # worst per-side ghost-band population (what one side ships)
            two_row = max(
                int(np.bincount(dest[key < lo + gband],
                                minlength=n_devices).max(initial=0)),
                int(np.bincount(dest[key >= hi - gband],
                                minlength=n_devices).max(initial=0)),
            )
            # worst single ROW-scale balance donation (the largest strip a
            # boundary move can hand to a neighbor in one step)
            one_row = max(
                int(np.bincount(dest[key < lo + w],
                                minlength=n_devices).max(initial=0)),
                int(np.bincount(dest[key >= hi - w],
                                minlength=n_devices).max(initial=0)),
            )

            def _round_up(x, lo_clip, hi_clip):
                return int(min(max(-(-int(np.ceil(x)) // 128) * 128,
                                   lo_clip), hi_clip))

            ghost_cap = _round_up(ghost_slack * two_row, 256, cap)
            mig_cap = _round_up(mig_slack * one_row, 256, cap)
        return ParallelConfig(
            n_devices=n_devices,
            capacity=cap,
            mig_capacity=(mig_cap if mig_cap is not None
                          else max(128, -(-(cap // 2) // 128) * 128)),
            ghost_capacity=ghost_cap if ghost_cap is not None else cap,
            rebalance=rebalance,
            z_cells_hi=z_hi,
            ghost_rows=ghost_rows,
        )

    @staticmethod
    def compact(cfg: SimConfig, n_devices: int, state: SimState,
                occ_slack: float = 1.1, ghost_slack: float = 1.1,
                mig_slack: float = 2.0, ghost_rows: int = 2,
                prior: "ParallelConfig | None" = None):
        """The settled-regime tier: re-size every per-shard buffer from the
        CURRENT state with tight slacks (docs/SCALING.md section 5).
        The default spawn-time sizing pays for the spawn transient on
        every step of the run — ghost lanes at 2.5x the spawn ghost-band
        population, capacity at 1.5x the spawn worst slab — and every lane
        of those fixed-shape buffers rides the per-shard sort, the segment
        plan, and the candidate stream whether occupied or not. Once the
        flow settles (per-shard populations stable, OCC_1M_BALANCED.json),
        re-tiering at measured occupancy cuts ~half the ghost lanes and
        ~30% of the capacity lanes at 1M x 8.

        The 1.1x defaults (round 5; were 1.2/1.25 in round 4) are the
        measured flagship tier (docs/SCALING.md section 3) and are SAFE
        to run tight because overflow is no longer merely loud: the CLI
        falls back to the spawn tier on any nonzero chunk-summed counter,
        so the worst case of an underestimate is one chunk of softened
        boundary physics plus a rebuild, not a wrong run.

        Shapes change, so a re-tier costs one recompile + one redistribute
        (the CLI's --retier-at). Safety is unchanged: the overflow counters
        (summed per chunk) remain the hard gate — a compact tier can only
        truncate LOUDLY: the CLI mesh runner checks the chunk-summed
        counters every chunk, falls back to the spawn tier (re-created
        from the current state) on compact-tier overflow, and aborts rc=2
        on spawn-tier overflow (cli.py _main_mesh; tested by
        tests/test_cli.py's forced-overflow cases). Tight-slack rationale:
        the 240-step 1M collapse measured boundary-row drift after
        settling well inside the slack (round-5 OCC re-measure: worst band
        95,435 vs gcap 110,208), and the boundary tracker holds slab
        occupancy near the quantile split (docs/SCALING.md section 7).

        Pass `prior=` (the tier being replaced) to carry its mode flags —
        rebalance and ghost_rows — through the re-tier; otherwise a
        re-tiered ghost_rows=1 or rebalance=False run would silently flip
        back to the defaults (advisor, round 4)."""
        if state is None:
            raise ValueError("the compact tier sizes from the current "
                             "state; pass state=")
        rebalance = prior.rebalance if prior is not None else True
        if prior is not None:
            ghost_rows = prior.ghost_rows
        return ParallelConfig.create(
            cfg, n_devices, slack=1.0, state=state, ghost_slack=ghost_slack,
            mig_slack=mig_slack, ghost_rows=ghost_rows, occ_slack=occ_slack,
            rebalance=rebalance)


def _min_slab_keys(cfg: SimConfig) -> int:
    """Minimum slab width in zx-keys: 2 z-rows + 2 cells. Covers (a) the
    ghost band (ghost_rows*W + 2 <= 2W + 2) so ghosts only ever come from
    the ADJACENT shard, and (b) migration adjacency — a particle's key
    drifts <= ~W+1 per step and a boundary shifts <= W, so no particle can
    legitimately cross two boundaries in one step."""
    return 2 * cfg.nb_grid_width + 2


def _ghost_band_keys(cfg: SimConfig, ghost_rows: int) -> int:
    """Ghost-band depth in keys per side: ghost_rows z-rows plus a 2-key
    margin. The margin covers the x-split corner when a boundary cuts a
    row mid-way: a consumed ghost lambda one cell past the split needs
    positions one further cell along x (see module docstring); with a
    row-aligned boundary the band is round 4's ghost_rows rows plus two
    cells of the next."""
    return ghost_rows * cfg.nb_grid_width + 2


def _validate_geometry(cfg: SimConfig, pcfg: ParallelConfig) -> None:
    """Fail fast on decomposition geometry that would silently break the
    exchange invariants:

      * every slab must span >= 2W+2 keys (2 z-rows + 2 cells) — the
        boundary-band ghost exchange only reaches the ADJACENT shard, so a
        narrower slab would need ghosts from two shards away and the
        inner-ring lambda would be silently wrong. The boundary-update
        rule preserves the invariant dynamically (donors keep the min
        width); here we check it is *satisfiable*: the grid must offer
        >= 2W+2 keys per device;
      * capacities must be positive multiples of 128 (TPU lane alignment of
        every packed buffer).
    """
    D = pcfg.n_devices
    w = cfg.nb_grid_width
    if D > 1:
        z_range = (w if pcfg.rebalance
                   else (pcfg.z_cells_hi or w))
        if z_range * w < D * _min_slab_keys(cfg):
            raise ValueError(
                f"{D} slabs over {z_range} z-rows ({z_range * w} zx-keys) "
                f"leaves a slab under {_min_slab_keys(cfg)} keys (2 z-rows "
                "+ 2 cells); the boundary-band ghost exchange needs that "
                "minimum per slab (use fewer devices or a finer grid)"
            )
    for name in ("capacity", "mig_capacity", "ghost_capacity"):
        val = getattr(pcfg, name)
        if val <= 0 or val % 128 != 0:
            raise ValueError(f"{name} ({val}) must be a positive multiple "
                             "of 128")
    if pcfg.ghost_rows not in (1, 2):
        raise ValueError(f"ghost_rows ({pcfg.ghost_rows}) must be 1 or 2")
    if pcfg.ghost_rows == 1 and cfg.nb_cell < 2 * cfg.h:
        raise ValueError(
            f"ghost_rows=1 (h-band mode) requires nb_cell >= 2h so one "
            f"boundary row covers every consumed lambda's h-neighborhood "
            f"(nb_cell={cfg.nb_cell}, h={cfg.h})")


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise ValueError(
            f"need {n} devices for the mesh but jax sees {len(devs)}; on CPU "
            "set jax.config.update('jax_num_cpu_devices', n) before first use"
        )
    return Mesh(np.array(devs[:n]), ("z",))


def _np_zxkey(cfg: SimConfig, x: np.ndarray) -> np.ndarray:
    """Host-side zx-key (int64) of (n, 3) positions: z_cell*W + x_cell,
    per-axis clamped into the grid."""
    W = cfg.nb_grid_width
    cz = np.clip((x[:, 2] / cfg.nb_cell).astype(np.int64), 0, W - 1)
    cx = np.clip((x[:, 0] / cfg.nb_cell).astype(np.int64), 0, W - 1)
    return cz * W + cx


def initial_bounds(cfg: SimConfig, n_devices: int,
                   state: SimState | None = None, rebalance: bool = True,
                   z_cells_hi: int = 0) -> np.ndarray:
    """(D+1,) int32 slab boundaries in zx-KEY units (slab d owns keys
    [b_d, b_{d+1}); b_0 = 0, b_D = W*W).

    With a state and rebalancing: a quantile split of the key histogram —
    boundary d lands where the cumulative count first reaches d*n/D, exact
    to one x-CELL (round 4's z-row split was exact only to a whole row,
    which at 1M x 8 is 40-100k particles), coerced to keep every slab at
    the minimum width. Without a state (or with rebalance=False): an even
    key split of [0, z_hi*W).
    """
    D = n_devices
    W = cfg.nb_grid_width
    K = W * W
    if D == 1:
        return np.array([0, K], np.int32)
    min_w = _min_slab_keys(cfg)
    if state is None or not rebalance:
        z_hi = z_cells_hi or W
        k_hi = z_hi * W
        b = np.array(
            [-(-d * k_hi // D) for d in range(D)] + [K], np.int64)
        # the even split can collide with the min-width rule only when
        # z_hi*W < D*min_w (rejected by _validate_geometry); the last slab
        # extends to K so clipped far-field cells stay owned
        return b.astype(np.int32)
    key = _np_zxkey(cfg, np.asarray(state.x))
    hist = np.bincount(key, minlength=K)
    cum = np.cumsum(hist)
    n = int(cum[-1])
    b = np.zeros(D + 1, np.int64)
    b[D] = K
    for d in range(1, D):
        target = n * d // D
        cand = int(np.searchsorted(cum, target, side="left")) + 1
        lo = b[d - 1] + min_w            # donor keeps the min width
        hi = K - min_w * (D - d)         # leave min width per remaining slab
        b[d] = min(max(cand, lo), hi)
    return b.astype(np.int32)


def _zxkey(cfg: SimConfig, p):
    """Device-side zx-key of (n, 3) positions (see _np_zxkey)."""
    w = cfg.nb_grid_width
    inv = jnp.float32(1.0 / cfg.nb_cell)
    cz = jnp.clip(jnp.floor(p[:, 2] * inv).astype(jnp.int32), 0, w - 1)
    cx = jnp.clip(jnp.floor(p[:, 0] * inv).astype(jnp.int32), 0, w - 1)
    return cz * w + cx


def _pack_rows(mask, capacity: int):
    """Indices of up to `capacity` True slots (True slots first, in input
    order), plus the validity of each packed slot and the overflow count.

    Cumsum + one scatter instead of round 2's argsort: the pack runs five
    times per sharded step (two migration directions, the merge, two ghost
    sides), and a full-width sort per pack was the largest avoidable cost
    in the sharded-overhead decomposition (docs/PERF.md round 3)."""
    n = mask.shape[0]
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    total = jnp.sum(mask).astype(jnp.int32)
    tgt = jnp.where(mask & (pos < capacity), pos, capacity)
    idx = jnp.zeros((capacity,), jnp.int32).at[tgt].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    ok = jnp.arange(capacity, dtype=jnp.int32) < total
    n_over = jnp.maximum(total - capacity, 0)
    return idx, ok, n_over


def _inverse_permutation(order):
    """inv with inv[order[i]] = i — one scatter, not an argsort."""
    n = order.shape[0]
    return jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32), unique_indices=True)


def _move_scales(cfg: SimConfig) -> tuple[int, ...]:
    """Boundary-move strip widths in keys, coarse to fine: one z-row (W —
    tracks a physical front as fast as round 4's one-row rule), a sub-row
    strip (W//8 — the sub-row trim a row move is too coarse for), and one
    key (single-cell precision)."""
    w = cfg.nb_grid_width
    scales = [w]
    if w // 8 > 1:
        scales.append(w // 8)
    scales.append(1)
    return tuple(scales)


def _update_bounds(cfg: SimConfig, pcfg: ParallelConfig, brow, active, key,
                   cap_lim: int):
    """One parity-alternating load-balance move per internal boundary, at
    the largest profitable scale.

    brow: (D+2,) [step_counter, b0..bD] — identical on every shard.
    Gathers (load, first-strip pops, last-strip pops at each scale) from
    every shard and applies the same deterministic rule everywhere: shift
    boundary i toward the heavier neighbor by the LARGEST strip s whose
    population keeps |L - R| non-increasing (2*strip <= |L - R|: the donor
    stays >= the recipient, so no move can overshoot, and a reverse move
    can never fire next — no oscillation), the donor slab keeps the
    minimum width, and the recipient stays under cap_lim. Even boundaries
    move on even steps, odd on odd, so a shard's two boundaries never move
    together (width invariant under concurrent updates).
    """
    D = pcfg.n_devices
    scales = _move_scales(cfg)
    min_w = _min_slab_keys(cfg)
    ctr, b = brow[0], brow[1:]
    me = jax.lax.axis_index("z")
    lo = b[me]
    hi = b[me + 1]
    cnt = jnp.sum(active).astype(jnp.int32)
    pops = [cnt]
    for s in scales:
        pops.append(jnp.sum(active & (key < lo + s)).astype(jnp.int32))
        pops.append(jnp.sum(active & (key >= hi - s)).astype(jnp.int32))
    g = jax.lax.all_gather(jnp.stack(pops), "z")     # (D, 1 + 2*len(scales))
    c = g[:, 0]

    ii = jnp.arange(1, D, dtype=jnp.int32)                       # boundaries
    L, R = c[ii - 1], c[ii]
    diff = L - R
    w_left = b[ii] - b[ii - 1]
    w_right = b[ii + 1] - b[ii]
    eligible = (ii % 2) == (ctr % 2)
    shift = jnp.zeros((D - 1,), jnp.int32)
    for k, s in enumerate(scales):
        first_s = g[:, 1 + 2 * k]      # pop of [lo, lo+s) per shard
        last_s = g[:, 2 + 2 * k]       # pop of [hi-s, hi) per shard
        down_rc = last_s[ii - 1]       # what shard i-1 would donate downward
        up_rc = first_s[ii]            # what shard i would donate upward
        free = shift == 0
        can_down = (free & eligible & (diff > 0) & (2 * down_rc <= diff)
                    & (w_left >= min_w + s) & (R + down_rc <= cap_lim))
        can_up = (free & eligible & (diff < 0) & (2 * up_rc <= -diff)
                  & (w_right >= min_w + s) & (L + up_rc <= cap_lim))
        shift = jnp.where(can_down, -s, jnp.where(can_up, s, shift))
    b = b.at[ii].add(shift.astype(jnp.int32))
    return jnp.concatenate([(ctr + 1)[None], b])


def _solve_cell(cfg, cap: int, p, last, active, exchange_ghosts, ghosts0,
                gok0):
    """Per-shard constraint solve on the XLA cell table. Returns
    (p_solved, plan_overflow)."""
    if ghosts0 is not None:
        combined0 = jnp.concatenate([p, ghosts0])
        combined_ok0 = jnp.concatenate([active, gok0])
    else:
        combined0 = p
        combined_ok0 = active
    # inactive slots (padding, invalid ghosts) get the explicit past-the-end
    # cell id: they sort after every real particle and are excluded from the
    # table and the overflow count.
    cid = jnp.where(
        combined_ok0, hashgrid.cell_ids(cfg, combined0), cfg.num_nb_cells
    )
    sorted_cid, order = hashgrid.sort_by_cell(cfg, cid)
    inv_order = _inverse_permutation(order)
    grid = hashgrid.build_grid(cfg, sorted_cid, order,
                               ignore_cell=cfg.num_nb_cells)

    def body(_, p_loc):
        if exchange_ghosts is not None:
            ghosts, _ = exchange_ghosts(p_loc)
            combined = jnp.concatenate([p_loc, ghosts])
        else:
            combined = p_loc
        p_sorted = jnp.take(combined, order, axis=0)
        tx = hashgrid.scatter_table(cfg, grid, p_sorted[:, 0])
        ty = hashgrid.scatter_table(cfg, grid, p_sorted[:, 1])
        tz = hashgrid.scatter_table(cfg, grid, p_sorted[:, 2])
        tlam = cell_list.density_lambda_tables(cfg, tx, ty, tz, grid)
        ddx, ddy, ddz = cell_list.project_tables(cfg, tx, ty, tz, tlam, grid)
        zeros = jnp.zeros_like(p_sorted[:, 0])
        dp_sorted = jnp.stack(
            [
                hashgrid.gather_table(cfg, grid, ddx, zeros),
                hashgrid.gather_table(cfg, grid, ddy, zeros),
                hashgrid.gather_table(cfg, grid, ddz, zeros),
            ],
            axis=1,
        )
        dp = jnp.take(dp_sorted, inv_order, axis=0)[:cap]
        return p_loc + jnp.where(active[:, None], dp, 0.0)

    p = jax.lax.fori_loop(0, cfg.solver_iters, body, p)
    return p, grid.n_overflow


def _solve_pallas(cfg, cap: int, p, last, active, exchange_ghosts, ghosts0,
                  gok0, interpret: bool, z_bounds=None):
    """Per-shard constraint solve on the Pallas streaming kernels.

    Same frozen-neighbor-structure semantics as the cell-table path: the
    sort order and candidate-window plan come from the predicted positions;
    each iteration refreshes ghost *positions* into the frozen slots.
    Inactive slots (local padding, invalid ghosts) are assigned cell id
    num_nb_cells, which sorts them after every real particle and makes
    build_plan give their chunks zero candidates.

    z_bounds (lo, hi) — the shard's slab range in zx-KEYS — enables
    per-pass OWN-CELL restriction (pallas_pbf.restrict_plan): ghosts enter
    the solve as candidates for everyone, but as OWN cells the project
    pass needs none of them (every ghost delta-p is discarded by the
    [:cap] slice below) and the density pass needs only the inner ghost
    ring's lambda. Skipping the rest removes the dominant redundant pair
    math of the decomposition; measured numbers in docs/SCALING.md.

    Multi-hop transit semantics: an own particle whose predicted key lies
    OUTSIDE [lo, hi) — it crossed 2+ slabs in one step, was migrated one
    hop, and still isn't home — falls in a project-masked chunk and
    receives zero delta-p for that step (it rejoins the solve next step
    after the second hop). The sender counts every such particle in
    mig_overflow, so validation gates that assert mig_overflow == 0 (the
    soak test, the dryrun) also certify that no particle ever skipped a
    projection. Returns (p_solved, plan_overflow)."""
    from ..ops import pallas_pbf

    if ghosts0 is not None:
        combined0 = jnp.concatenate([p, ghosts0])
        combined_ok = jnp.concatenate([active, gok0])
    else:
        combined0 = p
        combined_ok = active
    n_loc = combined0.shape[0]
    n_pad = pallas_pbf.pad_to_chunks(cfg, n_loc)

    cid = jnp.where(
        combined_ok, hashgrid.cell_ids(cfg, combined0), cfg.num_nb_cells
    )
    cid_pad = jnp.concatenate(
        [cid, jnp.full((n_pad - n_loc,), cfg.num_nb_cells, jnp.int32)]
    )
    sorted_cid, order = jax.lax.sort(
        (cid_pad, jnp.arange(n_pad, dtype=jnp.int32)), num_keys=1
    )
    inv_order = _inverse_permutation(order)
    plan = pallas_pbf.build_plan(cfg, sorted_cid)
    plan_d = plan_p = plan
    if z_bounds is not None:
        lo, hi = z_bounds                     # zx-key slab bounds
        w = cfg.nb_grid_width
        cid_c = sorted_cid.reshape(-1, cfg.geom.own)
        kc = (cid_c // (w * w)) * w + cid_c % w      # zx-key per cell
        # density: own keys + one INNER ghost ring per side (cells within
        # one cell of an own cell, whose lambda is read by boundary own
        # cells — the key band [lo-W-1, hi+W+1) is a superset of that
        # ring); project: own keys only. Mixed chunks at a zone edge stay
        # live for both passes via the any().
        plan_d = pallas_pbf.restrict_plan(
            cfg, plan, ((kc >= lo - w - 1) & (kc < hi + w + 1)).any(axis=1))
        plan_p = pallas_pbf.restrict_plan(
            cfg, plan, ((kc >= lo) & (kc < hi)).any(axis=1))

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
        if exchange_ghosts is not None:
            ghosts, _ = exchange_ghosts(p_loc)
            combined = jnp.concatenate([p_loc, ghosts, pad_tail])
        else:
            combined = jnp.concatenate([p_loc, pad_tail])
        p_sorted = jnp.take(combined, order, axis=0)          # (n_pad, 3)
        p_sorted = jnp.where(ok_sorted, p_sorted, pallas_pbf.SENTINEL)
        pT = jnp.concatenate(
            [p_sorted, jnp.zeros((n_pad, 1), jnp.float32)], axis=1)
        p4 = pallas_pbf._p4_from_pT(cfg, pT)
        lam = pallas_pbf.density_pass(cfg, pT, p4, plan_d,
                                      interpret=interpret)
        pT = jax.lax.dynamic_update_slice(pT, lam, (0, 3))
        p4 = pallas_pbf.splice_lambda(cfg, p4, lam, n_pad)
        outT = pallas_pbf.project_pass(cfg, pT, p4, plan_p,
                                       interpret=interpret)
        dp_sorted = outT[:, 0:3] - p_sorted
        dp = jnp.take(dp_sorted, inv_order, axis=0)[:cap]
        return p_loc + jnp.where(active[:, None], dp, 0.0)

    p = jax.lax.fori_loop(0, cfg.solver_iters, body, p)
    return p, plan.n_overflow


def _step_single_pallas(cfg: SimConfig, pcfg: ParallelConfig,
                        pallas_interpret: bool, x, v, ids, bounds):
    """1-device mesh, pallas backend: mirror core.step.step_fn exactly —
    ride every payload through ONE 8-operand lax.sort and return in
    cell-sorted slot order (ids track identity; slots are not stable across
    steps, same convention as the reference's sorted VBO writes,
    src/FluidSimulator.cu:441-443). No migration, no ghosts, no inverse
    permutation: the degenerate decomposition costs only the active-mask
    selects over the unsharded step."""
    from ..ops import pallas_pbf

    cap = pcfg.capacity
    active = ids >= 0
    p, _ = predict(cfg, x, v)
    cid = jnp.where(active, hashgrid.cell_ids(cfg, p), cfg.num_nb_cells)
    n_pad = pallas_pbf.pad_to_chunks(cfg, cap)

    def pad(arr, fill):
        shape = (n_pad - cap,) + arr.shape[1:]
        return jnp.concatenate([arr, jnp.full(shape, fill, arr.dtype)])

    S = pallas_pbf.SENTINEL
    sorted_ops = jax.lax.sort(
        (
            pad(cid, cfg.num_nb_cells),
            pad(jnp.where(active, p[:, 0], S), S),
            pad(jnp.where(active, p[:, 1], S), S),
            pad(jnp.where(active, p[:, 2], S), S),
            pad(jnp.where(active, x[:, 0], S), 0.0),
            pad(jnp.where(active, x[:, 1], S), 0.0),
            pad(jnp.where(active, x[:, 2], S), 0.0),
            pad(ids, -1),
        ),
        num_keys=1,
    )
    sorted_cid_pad = sorted_ops[0]
    p_s = jnp.stack(sorted_ops[1:4], axis=1)[:cap]
    last_s = jnp.stack(sorted_ops[4:7], axis=1)[:cap]
    ids_s = sorted_ops[7][:cap]
    active_s = ids_s >= 0
    # one plan per step: solve_pallas reuses it instead of rebuilding
    # (VERDICT round 3, weak #4)
    plan = pallas_pbf.build_plan(cfg, sorted_cid_pad)
    plan_overflow = plan.n_overflow

    p_solved = pallas_pbf.solve_pallas(
        cfg, p_s, sorted_cid_pad, interpret=pallas_interpret, plan=plan
    )
    x_new, v_new = finalize(cfg, p_solved, last_s)
    x_new = jnp.where(active_s[:, None], x_new, SENTINEL)
    v_new = jnp.where(active_s[:, None], v_new, 0.0)

    zero = jnp.zeros((), jnp.int32)
    stats = jnp.stack(
        [jnp.sum(active_s).astype(jnp.int32), zero, zero, zero,
         plan_overflow]
    )[None]
    speed = jnp.where(active_s, jnp.linalg.norm(v_new, axis=1), 0.0)
    out = active_s & (
        (x_new < -0.25) | (x_new > cfg.wall + 0.25)).any(axis=1)
    finite = (
        jnp.isfinite(jnp.where(active_s[:, None], x_new, 0.0)).all()
        & jnp.isfinite(v_new).all()
    )
    diag = jnp.stack(
        [jnp.max(speed), jnp.sum(out).astype(jnp.float32),
         (~finite).astype(jnp.float32)]
    )[None]
    return x_new, v_new, ids_s, bounds, stats, diag


def _shard_step(cfg: SimConfig, pcfg: ParallelConfig, backend: str,
                pallas_interpret: bool, x, v, ids, bounds):
    """Body run under shard_map; x (cap, 3), v (cap, 3), ids (cap,),
    bounds (1, D+2). Returns (x, v, ids, bounds, stats, diag)."""
    D = pcfg.n_devices
    cap = pcfg.capacity
    zero = jnp.zeros((), jnp.int32)

    if D == 1 and backend == "pallas":
        return _step_single_pallas(cfg, pcfg, pallas_interpret, x, v, ids,
                                   bounds)

    active = ids >= 0

    # ---------------- boundary update (load balance) -------------------
    brow = bounds[0]
    if D > 1 and pcfg.rebalance:
        brow = _update_bounds(cfg, pcfg, brow, active, _zxkey(cfg, x),
                              cap_lim=cap - cap // 8)
    b = brow[1:]                                   # (D+1,) zx-key boundaries

    p, _ = predict(cfg, x, v)
    p = jnp.where(active[:, None], p, SENTINEL)
    last = jnp.where(active[:, None], x, SENTINEL)

    if D > 1:
        me = jax.lax.axis_index("z")
        right_perm = [(i, i + 1) for i in range(D - 1)]
        left_perm = [(i + 1, i) for i in range(D - 1)]

        def pshift(arr, perm):
            return (jax.lax.ppermute(arr, "z", perm) if perm
                    else jnp.zeros_like(arr))

        # ---------------- migration (adjacent shards only) -------------
        key = _zxkey(cfg, p)
        dest = jnp.sum((key[:, None] >= b[None, 1:D]).astype(jnp.int32),
                       axis=1)
        dest_clipped = jnp.clip(dest, me - 1, me + 1)
        mig_overflow = jnp.sum(
            active & (dest != dest_clipped)).astype(jnp.int32)

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
        recv_from_right = pshift(buf_l, left_perm)  # their left-goers arrive
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

        all_p = jnp.concatenate(
            [jnp.where(stay[:, None], p, SENTINEL), rp_l, rp_r])
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

        # ---------------- frozen ghost packing + exchange --------------
        lo = b[me]
        hi = b[me + 1]
        key = _zxkey(cfg, p)
        # edge shards have no neighbor on that side: selecting their
        # boundary band anyway would waste ghost capacity and fire
        # spurious overflow
        gband = _ghost_band_keys(cfg, pcfg.ghost_rows)
        ghost_l_idx, ghost_l_ok, gover_l = _pack_rows(
            active & (key < lo + gband) & (me > 0), pcfg.ghost_capacity
        )
        ghost_r_idx, ghost_r_ok, gover_r = _pack_rows(
            active & (key >= hi - gband) & (me < D - 1), pcfg.ghost_capacity
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
        z_bounds = (lo, hi)
    else:
        mig_overflow = merge_overflow = ghost_overflow = zero
        exchange_ghosts = None
        ghosts0 = gok0 = None
        z_bounds = None

    # ---------------- constraint iterations ---------------------------
    if backend == "pallas":
        p, plan_overflow = _solve_pallas(
            cfg, cap, p, last, active, exchange_ghosts, ghosts0, gok0,
            pallas_interpret, z_bounds=z_bounds,
        )
    else:
        p, plan_overflow = _solve_cell(
            cfg, cap, p, last, active, exchange_ghosts, ghosts0, gok0,
        )

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
            plan_overflow,
        ]
    )[None]
    # per-shard physics observability (VERDICT round 2: a regression on the
    # mesh path must fail loudly, like the CLI does on the single-device
    # path — core/step.py diagnostics_fn is the model)
    speed = jnp.where(active, jnp.linalg.norm(v_new, axis=1), 0.0)
    out = active & (
        (x_new < -0.25) | (x_new > cfg.wall + 0.25)).any(axis=1)
    finite = (
        jnp.isfinite(jnp.where(active[:, None], x_new, 0.0)).all()
        & jnp.isfinite(v_new).all()
    )
    diag = jnp.stack(
        [
            jnp.max(speed),
            jnp.sum(out).astype(jnp.float32),
            (~finite).astype(jnp.float32),
        ]
    )[None]
    return x_new, v_new, ids, brow[None], stats, diag


_IN_SPECS = (P("z"), P("z"), P("z"), P("z"))
_OUT_SPECS = (P("z"), P("z"), P("z"), P("z"), P("z"), P("z"))


@functools.lru_cache(maxsize=32)
def make_sharded_step(cfg: SimConfig, pcfg: ParallelConfig, mesh: Mesh,
                      backend: str = "cell", pallas_interpret: bool = False):
    """Jitted SPMD step: ShardedState -> (ShardedState, stats, diag).
    Memoized on its (hashable) arguments so repeat calls share one compile.

    backend "cell" solves on the XLA cell table (portable; the parity
    reference); "pallas" runs the streaming window kernels per shard (the
    production multi-chip path — same physics, same frozen neighbor
    structure, per-iteration ghost refresh).

    stats (D, 5) i32 per shard: [active, migration_overflow, merge_overflow,
    ghost_overflow, neighbor_structure_overflow].
    diag (D, 3) f32 per shard: [max_speed, n_escaped, nan_detected].
    """
    if backend not in ("cell", "pallas"):
        raise ValueError(f"unknown sharded backend {backend!r}")
    _validate_geometry(cfg, pcfg)
    body = jax.shard_map(
        partial(_shard_step, cfg, pcfg, backend, pallas_interpret),
        mesh=mesh,
        in_specs=_IN_SPECS,
        out_specs=_OUT_SPECS,
        # pallas_call out_shapes don't carry varying-mesh-axes metadata yet
        check_vma=(backend != "pallas"),
    )

    def step(sst: ShardedState):
        x, v, ids, bounds, stats, diag = body(sst.x, sst.v, sst.ids,
                                              sst.bounds)
        return ShardedState(x, v, ids, bounds), stats, diag

    return jax.jit(step)


@functools.lru_cache(maxsize=32)
def make_sharded_rollout(cfg: SimConfig, pcfg: ParallelConfig, mesh: Mesh,
                         backend: str = "cell",
                         pallas_interpret: bool = False,
                         unroll_steps: int = 1):
    """N sharded steps per device call via lax.scan — same amortization as
    core.step.make_rollout (the tunneled runtime charges ~30-60 ms per jitted
    call). Returns fn(sst) -> (sst, stats, diag) where the per-shard stats
    and diag are AGGREGATED over the whole chunk, not sampled at its last
    step (advisor, round 3: a transient mid-chunk ghost/migration overflow
    truncates physics and must surface even if the last step is clean):
    stats column 0 (active count) is the final step's value, the overflow
    columns 1-4 are summed over the scan; diag columns (max_speed,
    n_escaped, nan_detected) are each the max over the scan."""
    if backend not in ("cell", "pallas"):
        raise ValueError(f"unknown sharded backend {backend!r}")
    _validate_geometry(cfg, pcfg)
    body = jax.shard_map(
        partial(_shard_step, cfg, pcfg, backend, pallas_interpret),
        mesh=mesh,
        in_specs=_IN_SPECS,
        out_specs=_OUT_SPECS,
        check_vma=(backend != "pallas"),
    )

    def roll(sst: ShardedState):
        def scan_body(carry, _):
            x, v, ids, bounds, stats, diag = body(*carry)
            return (x, v, ids, bounds), (stats, diag)

        carry, (stats, diag) = jax.lax.scan(
            scan_body, tuple(sst), None, length=unroll_steps
        )
        agg_stats = jnp.concatenate(
            [stats[-1, :, :1], stats[:, :, 1:].sum(axis=0)], axis=1)
        return ShardedState(*carry), agg_stats, diag.max(axis=0)

    return jax.jit(roll)


def _shard_diag(cfg: SimConfig, pcfg: ParallelConfig, x, v, ids, bounds):
    """Per-shard density diagnostics on the local cell table + ghosts —
    the mesh-path analogue of core.step.diagnostics_fn. (cap,)-local in,
    (1, 5) f32 out: [mean_density, max_density_err, max_speed, n_escaped,
    nan_detected]."""
    D = pcfg.n_devices
    cap = pcfg.capacity
    active = ids >= 0
    xm = jnp.where(active[:, None], x, SENTINEL)

    if D > 1:
        me = jax.lax.axis_index("z")
        right_perm = [(i, i + 1) for i in range(D - 1)]
        left_perm = [(i + 1, i) for i in range(D - 1)]

        def pshift(arr, perm):
            return (jax.lax.ppermute(arr, "z", perm) if perm
                    else jnp.zeros_like(arr))

        b = bounds[0, 1:]
        lo = b[me]
        hi = b[me + 1]
        key = _zxkey(cfg, xm)
        gband = _ghost_band_keys(cfg, pcfg.ghost_rows)
        gl_idx, gl_ok, _ = _pack_rows(
            active & (key < lo + gband) & (me > 0),
            pcfg.ghost_capacity)
        gr_idx, gr_ok, _ = _pack_rows(
            active & (key >= hi - gband) & (me < D - 1),
            pcfg.ghost_capacity)

        def buf(idx, ok):
            return jnp.concatenate(
                [jnp.where(ok[:, None], xm[idx], SENTINEL),
                 ok[:, None].astype(jnp.float32)], axis=1)

        from_left = pshift(buf(gr_idx, gr_ok), right_perm)
        from_right = pshift(buf(gl_idx, gl_ok), left_perm)
        gp = jnp.concatenate([from_left[:, 0:3], from_right[:, 0:3]])
        gok = jnp.concatenate([from_left[:, 3], from_right[:, 3]]) > 0.5
        combined = jnp.concatenate([xm, jnp.where(gok[:, None], gp, SENTINEL)])
        combined_ok = jnp.concatenate([active, gok])
    else:
        combined = xm
        combined_ok = active

    cid = jnp.where(combined_ok, hashgrid.cell_ids(cfg, combined),
                    cfg.num_nb_cells)
    sorted_cid, order = hashgrid.sort_by_cell(cfg, cid)
    grid = hashgrid.build_grid(cfg, sorted_cid, order,
                               ignore_cell=cfg.num_nb_cells)
    cs = jnp.take(combined, order, axis=0)
    tx = hashgrid.scatter_table(cfg, grid, cs[:, 0])
    ty = hashgrid.scatter_table(cfg, grid, cs[:, 1])
    tz = hashgrid.scatter_table(cfg, grid, cs[:, 2])
    rho_t = cell_list.density_tables(cfg, tx, ty, tz, grid)
    rho_sorted = hashgrid.gather_table(cfg, grid, rho_t,
                                       jnp.zeros_like(cs[:, 0]))
    rho = jnp.take(rho_sorted, _inverse_permutation(order))[:cap]
    # ghosts contribute to local rho but are not *measured* here (their home
    # shard measures them); table drops read back rho == 0 and are masked
    # (core/step.py diagnostics_fn documents the same convention)
    meas = active & (rho > 0.0)
    n_meas = jnp.maximum(jnp.sum(meas), 1)
    speed = jnp.where(active, jnp.linalg.norm(v, axis=1), 0.0)
    out = active & ((xm < -0.25) | (xm > cfg.wall + 0.25)).any(axis=1)
    finite = (jnp.isfinite(xm * jnp.where(active[:, None], 1.0, 0.0)).all()
              & jnp.isfinite(v).all())
    return jnp.stack(
        [
            jnp.sum(jnp.where(meas, rho, 0.0)) / n_meas.astype(jnp.float32),
            jnp.max(jnp.where(meas, jnp.abs(rho * cfg.inv_rho0 - 1.0), 0.0)),
            jnp.max(speed),
            jnp.sum(out).astype(jnp.float32),
            (~finite).astype(jnp.float32),
        ]
    )[None]


@functools.lru_cache(maxsize=32)
def make_sharded_diagnostics(cfg: SimConfig, pcfg: ParallelConfig,
                             mesh: Mesh):
    """Jitted ShardedState -> (D, 5) f32 per-shard diagnostics:
    [mean_density, max_density_err, max_speed, n_escaped, nan_detected].
    Runs on the XLA cell table regardless of the step backend (it is called
    at metrics cadence, not per step)."""
    _validate_geometry(cfg, pcfg)
    body = jax.shard_map(
        partial(_shard_diag, cfg, pcfg),
        mesh=mesh,
        in_specs=_IN_SPECS,
        out_specs=P("z"),
    )
    return jax.jit(lambda sst: body(sst.x, sst.v, sst.ids, sst.bounds))


def distribute(cfg: SimConfig, pcfg: ParallelConfig, state: SimState,
               mesh: Mesh) -> ShardedState:
    """SimState -> ShardedState laid out by owning slab, with
    count-equalizing initial boundaries (quantile split of the zx-key
    histogram, exact to one x-cell) when rebalancing is on."""
    D, cap = pcfg.n_devices, pcfg.capacity
    x = np.asarray(state.x)
    v = np.asarray(state.v)
    ids = np.asarray(state.ids)
    b = initial_bounds(cfg, D, state=state, rebalance=pcfg.rebalance,
                       z_cells_hi=pcfg.z_cells_hi)
    key = _np_zxkey(cfg, x)
    dest = np.searchsorted(b[1:-1], key, side="right")

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

    brows = np.tile(np.concatenate([[0], b]).astype(np.int32), (D, 1))

    shard = NamedSharding(mesh, P("z"))
    return ShardedState(
        x=jax.device_put(gx.reshape(D * cap, 3), shard),
        v=jax.device_put(gv.reshape(D * cap, 3), shard),
        ids=jax.device_put(gids.reshape(D * cap), shard),
        bounds=jax.device_put(brows, shard),
    )


def collect(sst: ShardedState) -> SimState:
    """ShardedState -> a dense SimState in original id order."""
    x = np.asarray(sst.x)
    v = np.asarray(sst.v)
    ids = np.asarray(sst.ids)
    sel = ids >= 0
    x, v, ids = x[sel], v[sel], ids[sel]
    order = np.argsort(ids)
    return SimState(
        x=jnp.asarray(x[order]),
        v=jnp.asarray(v[order]),
        ids=jnp.asarray(ids[order]),
        step=jnp.zeros((), jnp.int32),
    )
