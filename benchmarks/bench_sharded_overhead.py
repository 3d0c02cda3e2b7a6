"""Sharded-path overhead on ONE device, measured honestly (VERDICT round 2
item 2: "sharded 1-dev >= 0.85x unsharded, plus the decomposition table").

Runs the same 80k dam break through

  a) the unsharded production rollout (core.step.make_rollout), and
  b) the 1-device-mesh sharded rollout (parallel.sharded.make_sharded_rollout)

with the same backend, the same chunk size, and the same fencing discipline
as bench.py (device->host copy via host_sync; best of K same-process reps —
the tunneled chip drifts ~0.5-1 ms across subprocesses, so only same-process
A/Bs are trusted, docs/PERF.md).

    python benchmarks/bench_sharded_overhead.py --n 80000 --chunk 60 --reps 3

Prints one JSON document with both rates and the ratio.
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
    ap.add_argument("--n", type=int, default=80_000)
    ap.add_argument("--chunk", type=int, default=60)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--warmup-chunks", type=int, default=2)
    ap.add_argument("--backend", default=None)
    args = ap.parse_args(argv)

    import numpy as np

    import pdb_sph_tpu as pbf
    from pdb_sph_tpu.core.step import make_rollout
    from pdb_sph_tpu.parallel import sharded
    from pdb_sph_tpu.utils.platform import auto_backend, \
        enable_compilation_cache
    from pdb_sph_tpu.utils.timing import host_sync

    enable_compilation_cache()
    backend = args.backend or auto_backend()
    cfg = pbf.default_config(n=args.n)
    state0 = pbf.spawn(cfg, "dam_break", seed=0)

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    # --- unsharded ---------------------------------------------------
    roll = make_rollout(cfg, backend=backend, unroll_steps=args.chunk)
    st = state0
    log(f"[overhead] compiling unsharded ({backend}, chunk={args.chunk})...")
    for _ in range(args.warmup_chunks):
        st = roll(st)
    host_sync(st)
    best_plain = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        st = roll(st)
        host_sync(st)
        best_plain = min(best_plain, time.perf_counter() - t0)
    assert np.isfinite(np.asarray(st.x)).all()

    # --- sharded, 1-device mesh --------------------------------------
    mesh = sharded.make_mesh(1)
    pcfg = sharded.ParallelConfig.create(cfg, 1)
    sroll = sharded.make_sharded_rollout(cfg, pcfg, mesh, backend=backend,
                                         unroll_steps=args.chunk)
    sst = sharded.distribute(cfg, pcfg, state0, mesh)
    log("[overhead] compiling sharded 1-dev mesh...")
    for _ in range(args.warmup_chunks):
        sst, stats, diag = sroll(sst)
    host_sync(stats)
    best_shard = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        sst, stats, diag = sroll(sst)
        host_sync(stats)
        best_shard = min(best_shard, time.perf_counter() - t0)
    stats = np.asarray(stats)
    assert stats[0, 0] == cfg.n, f"lost particles: {stats}"
    assert stats[0, 1:].sum() == 0, f"overflow: {stats}"
    assert np.asarray(diag)[0, 2] == 0, "NaN on sharded path"

    plain_sps = args.chunk / best_plain
    shard_sps = args.chunk / best_shard
    print(json.dumps({
        "metric": f"sharded_1dev_overhead_{args.n}_dam_break",
        "backend": backend,
        "chunk": args.chunk,
        "unsharded_steps_per_sec": round(plain_sps, 2),
        "sharded_1dev_steps_per_sec": round(shard_sps, 2),
        "sharded_over_unsharded": round(shard_sps / plain_sps, 4),
        "target": ">= 0.85 (VERDICT r2 item 2)",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
