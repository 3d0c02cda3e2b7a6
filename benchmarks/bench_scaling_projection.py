"""Measured projection of the 1M x 8-chip dam break (docs/SCALING.md).

Multi-chip hardware is not available in this environment (one tunneled
v5e chip; the 8-fake-CPU-device mesh runs interpret-mode pallas and cannot
time Mosaic), so the projection decomposes the sharded step into

  (a) PER-SHARD COMPUTE — everything a shard does between collectives —
      measured DIRECTLY on the real chip at the exact worst-shard shapes
      of the balanced 1M x 8 decomposition, and
  (b) ICI EXCHANGE — the ppermute/all_gather payloads, which are FIXED
      fixed-capacity buffers, so their bytes are knowable exactly and
      their wire time is bounded by payload_bytes / ICI_bandwidth plus a
      per-collective latency allowance.

(a) replicates sharded._shard_step's per-shard pipeline at full fidelity
minus the wires — same helpers, same shapes, same frozen-neighbor-
structure solve with per-pass own-row restriction and per-iteration ghost
refresh (the refresh GLUE — packing the ghost buffer from p_now — is on-
chip work and is included; only the ppermute hop itself is replaced by an
identity). Inputs come from a real 1M snapshot: the most-populated slab
of the balanced quantile split owns the shard, and the neighbor slabs'
boundary key-bands arrive as ghosts, packed at ParallelConfig capacities.

(b) per step, per shard, both directions combined (D-1 of D shards do
both sides; edges less):
      migration:   2 ppermutes of (mig_cap, 8) f32
      ghosts:      2 ppermutes of (ghost_cap, 4) f32 per refresh,
                   x (1 + solver_iters) refreshes
      bounds:      all_gather of 3 i32 (negligible)
v5e ICI: ~45 GB/s per link per direction (one-way); the 1-D mesh maps
each boundary exchange onto its own link, so both sides transfer
concurrently and the bound uses ONE side's bytes at one link's bandwidth
(the conservative reading — no overlap of compute and communication is
assumed at all, though XLA does overlap in practice).

    python benchmarks/bench_scaling_projection.py --n 1000000 --devices 8 \
        --snap-steps 0 120

Prints one JSON document (recorded in docs/SCALING.md).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ICI_GBPS = 45.0          # v5e one-way per-link ICI bandwidth, GB/s
COLL_LAT_US = 2.0        # per-collective latency allowance, us


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--wall", type=float, default=0.0,
                    help="box size; 0 = the scaled flagship box "
                         "2*(n/80k)^(1/3) (BENCH_MATRIX's 1M row, "
                         "BASELINE.md:24). Rounds 3-4 projected the 1M "
                         "dam inside the UNSCALED reference box "
                         "(wall=2.0, 12.5x rest density) because this "
                         "flag didn't exist — pass --wall 2.0 to "
                         "reproduce those (adversarially dense) numbers")
    ap.add_argument("--devices", type=int, nargs="+", default=[8])
    ap.add_argument("--snap-steps", type=int, nargs="+", default=[0, 120])
    ap.add_argument("--steps-per-timing", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--maxlanes", type=int, default=131072)
    ap.add_argument("--single-maxlanes", type=int, default=49152,
                    help="geometry for the single-chip denominator — its "
                         "own swept optimum (BENCH_MATRIX row), not the "
                         "per-shard geometry, so efficiency is vs the BEST "
                         "single-chip number")
    ap.add_argument("--cap-slack", type=float, default=1.6)
    ap.add_argument("--ghost-slack", type=float, default=2.5)
    ap.add_argument("--mig-slack", type=float, default=3.0)
    ap.add_argument("--occ-slack", type=float, default=1.5,
                    help="capacity floor multiplier over the worst slab "
                         "occupancy; the compact settled tier "
                         "(ParallelConfig.compact) uses 1.1")
    ap.add_argument("--ghost-rows", type=int, default=2, choices=(1, 2),
                    help="1 = h-band ghost mode (docs/SCALING.md section "
                         "6): half the ghost lanes and wire bytes")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    import pdb_sph_tpu as pbf
    from pdb_sph_tpu.core.step import make_rollout
    from pdb_sph_tpu.geometry import geometry_from_env
    from pdb_sph_tpu.ops import pallas_pbf
    from pdb_sph_tpu.ops.collide import finalize
    from pdb_sph_tpu.ops.integrate import predict
    from pdb_sph_tpu.parallel import sharded
    from pdb_sph_tpu.utils.platform import enable_compilation_cache
    from pdb_sph_tpu.utils.timing import host_sync

    enable_compilation_cache()
    import numpy as _np

    wall = args.wall or round(2.0 * (args.n / 80_000.0) ** (1.0 / 3.0), 2)
    grid_width = max(40, int(_np.ceil(wall * 1.25 / 0.2)))
    geom = dataclasses.replace(geometry_from_env(), maxlanes=args.maxlanes)
    cfg = pbf.default_config(n=args.n, wall=wall, grid_width=grid_width,
                             geom=geom)
    cfg1 = pbf.default_config(
        n=args.n, wall=wall, grid_width=grid_width,
        geom=dataclasses.replace(geometry_from_env(),
                                 maxlanes=args.single_maxlanes))

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    # --- snapshots FIRST (snap 0 must be the true spawn, not a settled
    # state — round-4 fix), stored as immutable pytrees ----------------
    state = pbf.spawn(cfg1, "dam_break", seed=0)
    roll = make_rollout(cfg1, backend="pallas", unroll_steps=20)
    done_steps = 0
    snap_states = {}
    for snap in sorted(args.snap_steps):
        while done_steps < snap:
            state = roll(state)
            done_steps += 20
        snap_states[snap] = state
    results = []

    # single-chip whole-step reference at the same n, at the single-chip
    # geometry's own swept optimum (the 3.58 steps/s BENCH_MATRIX row),
    # re-measured here so the efficiency ratio is same-process, same-chip
    log("[scaling] measuring single-chip 1M step...")
    state = roll(state)           # settle + compile
    host_sync(state)
    done_steps += 20
    best1 = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        state = roll(state)
        host_sync(state)
        best1 = min(best1, time.perf_counter() - t0)
        done_steps += 20
    single_ms = best1 / 20 * 1e3
    log(f"[scaling] single-chip: {single_ms:.1f} ms/step")

    for D, snap in [(D, s) for D in args.devices
                    for s in sorted(args.snap_steps)]:
        sstate = snap_states[snap]
        x = np.asarray(sstate.x)
        v = np.asarray(sstate.v)

        # --- balanced decomposition of the snapshot -------------------
        pcfg = sharded.ParallelConfig.create(
            cfg, D, state=sstate, slack=args.cap_slack,
            ghost_slack=args.ghost_slack, mig_slack=args.mig_slack,
            ghost_rows=args.ghost_rows, occ_slack=args.occ_slack)
        b = sharded.initial_bounds(cfg, D, state=sstate)   # zx-key bounds
        gband = sharded._ghost_band_keys(cfg, args.ghost_rows)
        key = sharded._np_zxkey(cfg, x)
        dest = np.searchsorted(b[1:-1], key, side="right")
        occ = np.bincount(dest, minlength=D)
        d = int(np.argmax(occ))
        lo, hi = int(b[d]), int(b[d + 1])
        own_sel = np.nonzero(dest == d)[0]
        gl_sel = (np.nonzero((dest == d - 1) & (key >= lo - gband))[0]
                  if d > 0 else np.zeros(0, np.int64))
        gr_sel = (np.nonzero((dest == d + 1) & (key < hi + gband))[0]
                  if d < D - 1 else np.zeros(0, np.int64))
        cap, gcap, mcap = (pcfg.capacity, pcfg.ghost_capacity,
                           pcfg.mig_capacity)
        assert len(own_sel) <= cap, (len(own_sel), cap)
        assert max(len(gl_sel), len(gr_sel)) <= gcap, (
            len(gl_sel), len(gr_sel), gcap)

        S = sharded.SENTINEL
        xs = np.full((cap, 3), S, np.float32)
        vs = np.zeros((cap, 3), np.float32)
        ids = np.full((cap,), -1, np.int32)
        k = len(own_sel)
        xs[:k], vs[:k], ids[:k] = x[own_sel], v[own_sel], own_sel
        # incoming ghost source positions, one fixed buffer per side (the
        # wire-delivered content; refresh glue below repacks from these)
        gsrc = np.full((2 * gcap, 3), S, np.float32)
        gok = np.zeros((2 * gcap,), bool)
        gsrc[: len(gl_sel)] = x[gl_sel]
        gok[: len(gl_sel)] = True
        gsrc[gcap: gcap + len(gr_sel)] = x[gr_sel]
        gok[gcap: gcap + len(gr_sel)] = True

        jx = jnp.asarray(xs)
        jv = jnp.asarray(vs)
        jids = jnp.asarray(ids)
        jgsrc = jnp.asarray(gsrc)
        jgok = jnp.asarray(gok)

        R = args.steps_per_timing

        def shard_step(x0, v0, ids0, gsrc0, gok0, zlo, zhi):
            """One per-shard step: everything _shard_step does between
            wires, at the exact shapes, with ppermutes as identities."""
            active = ids0 >= 0
            p, _ = predict(cfg, x0, v0)
            p = jnp.where(active[:, None], p, S)
            last = jnp.where(active[:, None], x0, S)

            # migration: both direction packs + the merge repack (the
            # received buffers are the packed sends — self-loopback keeps
            # the shapes and the work; content is ~empty like a settled
            # interior shard's)
            keyj = sharded._zxkey(cfg, p)
            dest_j = jnp.sum((keyj[:, None]
                              >= jnp.asarray(b[1:D])[None, :]).astype(
                                  jnp.int32), axis=1)
            dc = jnp.clip(dest_j, d - 1, d + 1)
            go_l = active & (dc < d)
            go_r = active & (dc > d)

            def mig_buffer(m):
                idx, ok, _ = sharded._pack_rows(m, mcap)
                return jnp.concatenate(
                    [jnp.where(ok[:, None], p[idx], S),
                     jnp.where(ok[:, None], last[idx], S),
                     ok[:, None].astype(jnp.float32),
                     jax.lax.bitcast_convert_type(
                         jnp.where(ok, ids0[idx], -1), jnp.float32)[:, None]],
                    axis=1)

            buf_l = mig_buffer(go_l)
            buf_r = mig_buffer(go_r)
            stay = active & (dc == d)

            def unpack(buf):
                return (buf[:, 0:3], buf[:, 3:6],
                        jax.lax.bitcast_convert_type(buf[:, 7], jnp.int32),
                        buf[:, 6] > 0.5)

            rp_l, rl_l, ri_l, rok_l = unpack(buf_l)   # loopback arrivals
            rp_r, rl_r, ri_r, rok_r = unpack(buf_r)
            all_p = jnp.concatenate(
                [jnp.where(stay[:, None], p, S), rp_l, rp_r])
            all_last = jnp.concatenate(
                [jnp.where(stay[:, None], last, S), rl_l, rl_r])
            all_ids = jnp.concatenate(
                [jnp.where(stay, ids0, -1), ri_l, ri_r])
            all_ok = jnp.concatenate([stay, rok_l, rok_r])
            idx, ok, _ = sharded._pack_rows(all_ok, cap)
            p2 = jnp.where(ok[:, None], all_p[idx], S)
            last2 = jnp.where(ok[:, None], all_last[idx], S)
            ids2 = jnp.where(ok, all_ids[idx], -1)
            active2 = ok

            # frozen ghost packing over the local array (the exact
            # per-step selection work)
            key2 = sharded._zxkey(cfg, p2)
            gl_idx, gl_ok, _ = sharded._pack_rows(
                active2 & (key2 < zlo + gband), gcap)
            gr_idx, gr_ok, _ = sharded._pack_rows(
                active2 & (key2 >= zhi - gband), gcap)

            def exchange_ghosts(p_now):
                # the refresh GLUE: build both outgoing buffers from p_now
                # at the frozen indices (identical work to the real path),
                # then "receive" the snapshot ghost content (the wire hop
                # is costed analytically)
                def mkbuf(idx_, ok_):
                    return jnp.concatenate(
                        [jnp.where(ok_[:, None], p_now[idx_], S),
                         ok_[:, None].astype(jnp.float32)], axis=1)

                out_l = mkbuf(gl_idx, gl_ok)
                out_r = mkbuf(gr_idx, gr_ok)
                # keep the outgoing packs live (XLA must not DCE them) by
                # folding an invisible epsilon of them into the result
                eps = (out_l[0, 0] + out_r[0, 0]) * 1e-30
                return gsrc0 + eps, gok0

            ghosts0, gok0_ = exchange_ghosts(p2)
            p_solved, plan_ovf = sharded._solve_pallas(
                cfg, cap, p2, last2, active2, exchange_ghosts, ghosts0,
                gok0_, False, z_bounds=(zlo, zhi))
            x_new, v_new = finalize(cfg, p_solved, last2)
            x_new = jnp.where(active2[:, None], x_new, S)
            v_new = jnp.where(active2[:, None], v_new, 0.0)
            return x_new, v_new, ids2, plan_ovf

        def fn(x0, v0, ids0, gsrc0, gok0, zlo, zhi):
            def body(_, carry):
                x0, v0, ids0, ovf = carry
                x1, v1, ids1, o = shard_step(x0, v0, ids0, gsrc0, gok0,
                                             zlo, zhi)
                return x1, v1, ids1, ovf + o

            return jax.lax.fori_loop(
                0, R, body, (x0, v0, ids0, jnp.int32(0)))

        jfn = jax.jit(fn)
        log(f"[scaling] snap {snap}: compiling per-shard step "
            f"(own={len(own_sel)}, ghosts={len(gl_sel)}+{len(gr_sel)}, "
            f"cap={cap}, gcap={gcap}, mcap={mcap})...")
        out = jfn(jx, jv, jids, jgsrc, jgok, lo, hi)
        host_sync(out)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = jfn(jx, jv, jids, jgsrc, jgok, lo, hi)
            host_sync(out)
            best = min(best, time.perf_counter() - t0)
        x_out, v_out, ids_out, ovf = [np.asarray(o) for o in out]
        act = ids_out >= 0
        assert np.isfinite(x_out[act]).all()
        shard_ms = best / R * 1e3

        # ---- exchange bound (bytes are exact; wire model conservative) --
        mig_bytes = mcap * 8 * 4                     # one direction, f32x8
        ghost_bytes = gcap * 4 * 4                   # one direction, f32x4
        refreshes = 1 + cfg.solver_iters
        coll_count = 2 + 2 * refreshes + 1           # migs + ghosts + gather
        wire_bytes = mig_bytes + ghost_bytes * refreshes  # per side
        exch_ms = (wire_bytes / (ICI_GBPS * 1e9) * 1e3
                   + coll_count * COLL_LAT_US / 1e3)

        proj_ms = shard_ms + exch_ms
        results.append({
            "devices": D,
            "snapshot_step": snap,
            "worst_shard": d,
            "own": int(len(own_sel)),
            "ghosts": [int(len(gl_sel)), int(len(gr_sel))],
            "capacity": cap,
            "ghost_capacity": gcap,
            "mig_capacity": mcap,
            "plan_overflow": int(ovf),
            "per_shard_compute_ms": round(shard_ms, 2),
            "exchange_bound_ms": round(exch_ms, 3),
            "exchange_bytes_per_side": int(wire_bytes),
            "projected_ms_per_step": round(proj_ms, 2),
            "projected_steps_per_sec": round(1e3 / proj_ms, 2),
            "projected_particle_steps_per_sec": round(
                args.n * 1e3 / proj_ms, 0),
            "speedup_vs_single_chip": round(single_ms / proj_ms, 2),
            "scaling_efficiency": round(single_ms / proj_ms / D, 3),
        })
        log(f"[scaling] snap {snap}: {results[-1]}")

    doc = {
        "artifact": "1M x 8 projected throughput from per-shard-shaped "
                    "hardware measurement + exact exchange-byte bound",
        "hardware": "1x TPU v5e (tunneled); wire model: "
                    f"{ICI_GBPS} GB/s/link one-way + {COLL_LAT_US} us "
                    "per collective, zero compute/comm overlap assumed",
        "config": {"n": args.n, "wall": wall,
                   "nb_grid_width": cfg.nb_grid_width,
                   "devices": args.devices,
                   "solver_iters": cfg.solver_iters,
                   "maxlanes": geom.maxlanes,
                   "single_chip_maxlanes": args.single_maxlanes,
                   "slacks": {"cap": args.cap_slack,
                              "ghost": args.ghost_slack,
                              "mig": args.mig_slack,
                              "occ": args.occ_slack},
                   "single_chip_ms_per_step": round(single_ms, 2)},
        "snapshots": results,
    }
    print(json.dumps(doc, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
