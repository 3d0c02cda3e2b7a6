"""Hardware probe: per-shard solve cost with vs without the per-pass
ghost own-row restriction (parallel/sharded.py z_bounds ->
pallas_pbf.restrict_plan).

Multi-chip hardware is not available in this environment (one tunneled v5e
chip), and the 8-fake-CPU-device mesh cannot time Mosaic kernels — so, like
benchmarks/occupancy_1m.py, this probe reconstructs ONE shard's per-step
work on the real chip and measures the thing the mesh would feel:

  1. roll the single-chip dam break to a snapshot step (spawn and collapse
     are both interesting: at spawn the 1M fluid occupies ~12 z-rows, so a
     slab is ~2 rows thick and its two-boundary-row ghosts are nearly the
     WHOLE neighbor slab — ghosts/own ~ 1.5-2x);
  2. cut the worst (most-populated) slab of the balanced quantile split,
     pack its own + two-boundary-row ghost sets exactly like
     sharded.distribute / the frozen ghost packing would;
  3. time the full per-step solve pipeline (sort -> plan -> solver_iters x
     (density + project), i.e. sharded._solve_pallas with a static ghost
     closure) with z_bounds=None (round-2 behavior: every ghost is also an
     OWN row) vs z_bounds=(lo, hi) (round-3: project skips all ghost rows,
     density keeps only the inner row per side).

Ghost positions are held static across iterations (the ppermute refresh
has no single-chip analogue); that affects physics, not timing — the pair
work per block is identity to the mesh run's.

    python benchmarks/probe_ghost_mask.py --n 1000000 --devices 8 \
        --snap-steps 0 120

Prints one JSON document per snapshot (recorded in docs/SCALING.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("PBF_MAXLANES", "131072")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--wall", type=float, default=0.0,
                    help="box size; 0 = the scaled flagship box "
                         "2*(n/80k)^(1/3); pass 2.0 for the unscaled "
                         "reference box rounds 3-4 measured")
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--snap-steps", type=int, nargs="+", default=[0, 120])
    ap.add_argument("--solves-per-timing", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args(argv)

    import functools

    import jax
    import numpy as np

    import pdb_sph_tpu as pbf
    from pdb_sph_tpu.core.step import make_rollout
    from pdb_sph_tpu.ops import pallas_pbf
    from pdb_sph_tpu.parallel import sharded
    from pdb_sph_tpu.utils.platform import enable_compilation_cache
    from pdb_sph_tpu.utils.timing import host_sync

    enable_compilation_cache()
    wall = args.wall or round(2.0 * (args.n / 80_000.0) ** (1.0 / 3.0), 2)
    cfg = pbf.default_config(
        n=args.n, wall=wall,
        grid_width=max(40, int(np.ceil(wall * 1.25 / 0.2))))
    D = args.devices

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    state = pbf.spawn(cfg, "dam_break", seed=0)
    roll = None
    done_steps = 0
    results = []

    for snap in sorted(args.snap_steps):
        if snap > done_steps:
            if roll is None:
                roll = make_rollout(cfg, backend="pallas", unroll_steps=20)
            log(f"[ghost_mask] rolling to step {snap}...")
            while done_steps < snap:
                state = roll(state)
                done_steps += 20
        x = np.asarray(state.x)

        # --- balanced decomposition of the snapshot (zx-key) ----------
        pcfg = sharded.ParallelConfig.create(cfg, D, state=state)
        b = sharded.initial_bounds(cfg, D, state=state)
        gband = sharded._ghost_band_keys(cfg, 2)
        key = sharded._np_zxkey(cfg, x)
        dest = np.searchsorted(b[1:-1], key, side="right")
        occ = np.bincount(dest, minlength=D)
        d = int(np.argmax(occ))
        lo, hi = int(b[d]), int(b[d + 1])
        own_sel = np.nonzero(dest == d)[0]
        ghost_sel = np.concatenate([
            np.nonzero((dest == d - 1) & (key >= lo - gband))[0] if d > 0
            else np.zeros(0, np.int64),
            np.nonzero((dest == d + 1) & (key < hi + gband))[0] if d < D - 1
            else np.zeros(0, np.int64),
        ])
        cap = pcfg.capacity
        gcap = 2 * pcfg.ghost_capacity
        assert len(own_sel) <= cap and len(ghost_sel) <= gcap, (
            len(own_sel), cap, len(ghost_sel), gcap)

        S = sharded.SENTINEL
        p = np.full((cap, 3), S, np.float32)
        p[: len(own_sel)] = x[own_sel]
        active = np.zeros((cap,), bool)
        active[: len(own_sel)] = True
        ghosts = np.full((gcap, 3), S, np.float32)
        ghosts[: len(ghost_sel)] = x[ghost_sel]
        gok = np.zeros((gcap,), bool)
        gok[: len(ghost_sel)] = True

        jp = jax.numpy.asarray(p)
        jact = jax.numpy.asarray(active)
        jg = jax.numpy.asarray(ghosts)
        jgok = jax.numpy.asarray(gok)

        R = args.solves_per_timing

        def make_fn(masked: bool):
            def f(p0, act, g0, gk, zlo, zhi):
                exch = lambda p_now: (g0, gk)  # static ghosts: timing only
                zb = (zlo, zhi) if masked else None

                def body(_, pp):
                    ps, _ = sharded._solve_pallas(
                        cfg, cap, pp, pp, act, exch, g0, gk, False,
                        z_bounds=zb)
                    return ps

                return jax.lax.fori_loop(0, R, body, p0)

            return jax.jit(f)

        timings = {}
        rows = {}
        for name, masked in (("full", False), ("masked", True)):
            fn = make_fn(masked)
            log(f"[ghost_mask] snap {snap}: compiling {name}...")
            out = fn(jp, jact, jg, jgok, lo, hi)
            host_sync(out)
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.perf_counter()
                out = fn(jp, jact, jg, jgok, lo, hi)
                host_sync(out)
                best = min(best, time.perf_counter() - t0)
            assert np.isfinite(np.asarray(out)[active]).all()
            timings[name] = best / R * 1e3  # ms per per-step solve

        # host-side accounting of the per-pass row reduction
        n_loc = cap + gcap
        n_pad = pallas_pbf.pad_to_chunks(cfg, n_loc)
        comb = np.concatenate([p, ghosts])
        ok = np.concatenate([active, gok])
        from pdb_sph_tpu.ops import hashgrid
        cid = np.where(ok, np.asarray(
            hashgrid.cell_ids(cfg, jax.numpy.asarray(comb))),
            cfg.num_nb_cells)
        cid_pad = np.concatenate(
            [cid, np.full(n_pad - n_loc, cfg.num_nb_cells, np.int64)])
        sc = np.sort(cid_pad)
        # zx-key per cell, mirroring sharded._solve_pallas's restriction
        w = cfg.nb_grid_width
        cid_c = sc.reshape(-1, cfg.geom.own)
        kc = (cid_c // (w * w)) * w + cid_c % w
        real = (cid_c < cfg.num_nb_cells)
        keep_d = ((kc >= lo - w - 1) & (kc < hi + w + 1) & real).any(1)
        keep_p = ((kc >= lo) & (kc < hi) & real).any(1)
        live = real.any(1)
        rows = {
            "chunks_live": int(live.sum()),
            "chunks_density": int(keep_d.sum()),
            "chunks_project": int(keep_p.sum()),
        }

        results.append({
            "snapshot_step": snap,
            "shard": d,
            "own": int(len(own_sel)),
            "ghosts": int(len(ghost_sel)),
            "capacity": cap,
            "ghost_capacity": pcfg.ghost_capacity,
            "solve_ms_full": round(timings["full"], 3),
            "solve_ms_masked": round(timings["masked"], 3),
            "speedup": round(timings["full"] / timings["masked"], 3),
            **rows,
        })
        log(f"[ghost_mask] snap {snap}: {results[-1]}")

    print(json.dumps({
        "artifact": "per-shard ghost own-row restriction, hardware timing",
        "config": {"n": args.n, "wall": wall, "devices": D,
                   "solver_iters": cfg.solver_iters,
                   "PBF_MAXLANES": os.environ.get("PBF_MAXLANES")},
        "snapshots": results,
    }, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
