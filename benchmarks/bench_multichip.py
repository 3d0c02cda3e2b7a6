"""Scaled dam break on a device mesh (BASELINE.md: 1M particles, v5e-8).

On real multi-chip TPU hardware this runs as-is (the mesh picks up every
visible chip). Without a pod, pass --fake-devices N to validate the sharded
program on N virtual CPU devices — same SPMD code, collectives and all.

    python benchmarks/bench_multichip.py                 # real chips
    python benchmarks/bench_multichip.py --fake-devices 8 --n 100000

Prints one JSON line: particle-steps/s across the whole mesh.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--warmup", type=int, default=10)
    ap.add_argument("--chunk", type=int, default=10,
                    help="steps per device call (lax.scan over the sharded "
                         "step; amortizes per-call dispatch latency)")
    ap.add_argument("--fake-devices", type=int, default=0,
                    help="force an N-device CPU platform (validation mode)")
    ap.add_argument("--max-occ", type=int, default=4096,
                    help="cell-table rows per shard (drop for small "
                         "fake-device validation runs: compute scales with it)")
    ap.add_argument("--wall", type=float, default=0.0,
                    help="box size; 0 = auto-scale 2*(n/80k)^(1/3) so the "
                         "dam spawns at rest density at any n (an 80k-box "
                         "holds at most ~640k particles at rest density)")
    ap.add_argument("--cell-capacity", type=int, default=256,
                    help="cell-table slots per cell (the collapsing dam "
                         "transiently exceeds 128/cell)")
    ap.add_argument("--backend", choices=("cell", "pallas"), default=None,
                    help="per-shard solver (default: pallas on TPU, cell "
                         "elsewhere)")
    args = ap.parse_args(argv)

    if args.fake_devices:
        from pdb_sph_tpu.utils.platform import force_cpu_devices

        force_cpu_devices(args.fake_devices)

    import jax
    import numpy as np

    import pdb_sph_tpu as pbf
    from pdb_sph_tpu.parallel import sharded
    from pdb_sph_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    n_dev = len(jax.devices())
    wall = args.wall or round(2.0 * (args.n / 80_000.0) ** (1.0 / 3.0), 2)
    cfg = pbf.default_config(
        n=args.n,
        wall=wall,
        grid_width=max(40, int(np.ceil(wall * 1.25 / 0.2))),
        max_occupied_cells=args.max_occ,
        cell_capacity=args.cell_capacity,
    )
    state = pbf.spawn(cfg, "dam_break", seed=0)

    if args.backend is None:
        from pdb_sph_tpu.utils.platform import auto_backend

        backend = auto_backend()
    else:
        backend = args.backend

    mesh = sharded.make_mesh(n_dev)
    # load-balanced boundaries (state-aware quantile split + per-step
    # occupancy tracking) keep shards near n/D; slack only covers transients
    pcfg = sharded.ParallelConfig.create(cfg, n_dev, state=state)
    chunk = max(1, min(args.chunk, args.steps))
    roll = sharded.make_sharded_rollout(cfg, pcfg, mesh, backend=backend,
                                        unroll_steps=chunk)
    diag_fn = sharded.make_sharded_diagnostics(cfg, pcfg, mesh)
    sst = sharded.distribute(cfg, pcfg, state, mesh)

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    log(f"[bench_multichip] n={args.n} devices={n_dev} backend={backend} "
        f"wall={wall} chunk={chunk}: compiling + warmup...")
    t0 = time.perf_counter()
    for i in range(max(1, args.warmup // chunk)):
        sst, stats, step_diag = roll(sst)
        np.asarray(stats)  # fence
        log(f"[bench_multichip] warmup chunk {i} done "
            f"({time.perf_counter() - t0:.1f}s elapsed)")

    steps = (args.steps // chunk) * chunk
    t0 = time.perf_counter()
    for i in range(steps // chunk):
        sst, stats, step_diag = roll(sst)
        np.asarray(stats[0, 0])
        log(f"[bench_multichip] measured chunk {i} done "
            f"({time.perf_counter() - t0:.1f}s elapsed)")
    stats = np.asarray(stats)  # device->host fence
    step_diag = np.asarray(step_diag)
    wall_s = time.perf_counter() - t0

    assert stats[:, 0].sum() == cfg.n, "particle count not conserved"
    assert step_diag[:, 2].sum() == 0, "NaN detected on the mesh path"
    diag = np.asarray(diag_fn(sst))  # density/physics health per shard
    sps = steps / wall_s
    act = stats[:, 0]
    print(json.dumps({
        "metric": f"particle_steps_per_sec_{args.n}_dam_break_{n_dev}dev",
        "value": round(sps * cfg.n, 1),
        "unit": "particle-steps/s",
        "steps_per_sec": round(sps, 2),
        "devices": n_dev,
        "per_shard_active": act.tolist(),
        "balance_min_over_mean": round(float(act.min() / act.mean()), 3),
        "overflows": stats[:, 1:].sum(axis=0).tolist(),
        "max_speed": round(float(step_diag[:, 0].max()), 3),
        "n_escaped": int(step_diag[:, 1].sum()),
        "max_density_err": round(float(diag[:, 1].max()), 4),
        "slab_bounds": np.asarray(sst.bounds)[0, 1:].tolist(),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
