"""Capacity sizing for the sharded 1M configuration, measured on hardware.

The 8-fake-device CPU validation of the 1M dam break (MULTICHIP_r02.json)
costs ~70 min of XLA CPU compile plus ~36 min per step, which bounds how many
steps (and capacity variants) can ever be checked that way. This script gets
the same sizing answer from the real chip instead: it runs the 1M dam break
single-chip (2-3 steps/s on a v5e), and after every chunk computes — on the
host, with the balanced-quantile slab geometry of `parallel/sharded.py`
(`initial_bounds` / the boundary key-band ghost selection; the in-run
boundary tracker follows the per-snapshot quantile ideal within ~a strip) —
what every per-shard capacity WOULD need to be on a D-device mesh at that
instant:

  * particles per slab                  vs ParallelConfig.capacity
  * ghost particles per side            vs ParallelConfig.ghost_capacity
  * unique occupied nb-cells per shard, local + ghost rows
                                        vs SimConfig.max_occupied_cells
                                          (the --max-occ knob that overflowed
                                          at 4096 in the fake-mesh run)

and reports the maxima over the whole collapse. One caveat, stated here so
the artifact is honest: the sharded step builds its table from *predicted*
positions while this script samples *post-step* positions; prediction moves a
particle at most dt*|v| (~half a cell at the observed max speeds), so the
counts below carry a one-cell-row uncertainty — the reported maxima include
that row by construction because the ghost selection already spans two rows.

    python benchmarks/occupancy_1m.py --steps 240 --chunk 20

Prints one JSON document (committed into MULTICHIP artifacts).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Raised candidate capacity, as the BENCH_MATRIX 1M row documents: transient
# collapse compression exceeds the default 31744-lane budget at this scale.
os.environ.setdefault("PBF_MAXLANES", "131072")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def slab_table_stats(cfg, x: np.ndarray, n_dev: int, gband: int):
    """Per-slab (particles, ghosts_in, table_rows) for one snapshot under
    the balanced (quantile) sub-row decomposition — the bounds come from
    sharded.initial_bounds itself (not a local reimplementation, so this
    sizing artifact cannot drift from the decomposition the mesh actually
    uses; the in-run boundary tracker follows the per-snapshot quantile
    ideal within ~a move strip)."""
    import types

    from pdb_sph_tpu.parallel import sharded

    w = cfg.nb_grid_width
    ijk = np.clip((x / cfg.nb_cell).astype(np.int64), 0, w - 1)
    cid = ijk[:, 0] + w * ijk[:, 1] + (w * w) * ijk[:, 2]
    key = sharded._np_zxkey(cfg, x)
    b = sharded.initial_bounds(cfg, n_dev,
                               state=types.SimpleNamespace(x=x))
    slab = np.searchsorted(b[1:-1], key, side="right")

    rows = np.zeros(n_dev, np.int64)
    parts = np.zeros(n_dev, np.int64)
    ghosts = np.zeros(n_dev, np.int64)
    for d in range(n_dev):
        lo, hi = b[d], b[d + 1]
        local = slab == d
        # the boundary key-band from each adjacent shard (sharded.py
        # ghost_l/ghost_r selections, receiver's view)
        from_left = ((slab == d - 1) & (key >= lo - gband) if d > 0
                     else np.zeros_like(local))
        from_right = ((slab == d + 1) & (key < hi + gband) if d < n_dev - 1
                      else np.zeros_like(local))
        ghost = from_left | from_right
        parts[d] = int(local.sum())
        ghosts[d] = int(max(from_left.sum(), from_right.sum()))
        rows[d] = len(np.unique(cid[local | ghost]))
    return parts, ghosts, rows


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--steps", type=int, default=240)
    ap.add_argument("--chunk", type=int, default=20)
    args = ap.parse_args(argv)

    import pdb_sph_tpu as pbf
    from pdb_sph_tpu.core.step import diagnostics_fn, make_rollout
    from pdb_sph_tpu.utils.platform import auto_backend

    wall = round(2.0 * (args.n / 80_000.0) ** (1.0 / 3.0), 2)
    cfg = pbf.default_config(n=args.n, wall=wall,
                             grid_width=max(40, int(np.ceil(wall * 1.25 / 0.2))))
    w = cfg.nb_grid_width

    state = pbf.spawn(cfg, "dam_break", seed=0)
    rollout = make_rollout(cfg, backend=auto_backend(),
                           unroll_steps=args.chunk)

    from pdb_sph_tpu.parallel import sharded

    gband = sharded._ghost_band_keys(cfg, 2)
    max_parts = np.zeros(args.devices, np.int64)
    max_ghosts = np.zeros(args.devices, np.int64)
    max_rows = np.zeros(args.devices, np.int64)
    t0 = time.perf_counter()
    for i in range(args.steps // args.chunk):
        state = rollout(state)
        x = np.asarray(state.x)
        assert np.isfinite(x).all(), f"non-finite state at step {state.step}"
        parts, ghosts, rows = slab_table_stats(cfg, x, args.devices, gband)
        max_parts = np.maximum(max_parts, parts)
        max_ghosts = np.maximum(max_ghosts, ghosts)
        max_rows = np.maximum(max_rows, rows)
        print(f"[occupancy_1m] step {int(state.step)}: rows/shard "
              f"{rows.tolist()} ({time.perf_counter() - t0:.0f}s)",
              file=sys.stderr, flush=True)

    d = diagnostics_fn(cfg, state)
    out = {
        "artifact": "per-shard capacity sizing for the 1M x 8-device config, "
                    "measured from a single-chip hardware run",
        "config": {"n": args.n, "devices": args.devices, "wall": wall,
                   "nb_grid_width": w, "decomposition": "balanced-quantile-zxkey",
                   "steps": args.steps, "sample_every": args.chunk,
                   "PBF_MAXLANES": os.environ["PBF_MAXLANES"]},
        "max_particles_per_slab": max_parts.tolist(),
        "max_ghosts_per_side": max_ghosts.tolist(),
        "max_table_rows_per_shard": max_rows.tolist(),
        "capacity_verdicts": {
            "max_occ_4096": bool(max_rows.max() <= 4096),
            "max_occ_8192": bool(max_rows.max() <= 8192),
            "slack_4_capacity_500096": bool(max_parts.max() <= 500096),
        },
        "final_step_diagnostics": {
            "mean_density": round(float(d.mean_density), 1),
            "max_speed": round(float(d.max_speed), 3),
            "plan_overflow": int(d.plan_overflow),
            "nan_detected": bool(d.nan_detected),
        },
    }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
