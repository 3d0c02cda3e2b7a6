"""The full BASELINE.md benchmark matrix on real hardware, one JSON artifact.

Rows (BASELINE.md "Targets for the TPU rebuild"):
  * standard scene, 40k  — reference: 60 steps/s on a GTX 1650 (README.md:5)
  * dam break,     80k  — reference: 60 steps/s (README.md:9); the headline
  * blowup,        80k  — reference: "stable, recovers" with no fps claim
                          (README.md:13); we record steps/s AND stability
                          evidence (plan_overflow == 0, finite, in-box,
                          settles toward rest density)
  * dam break,     1M   — single-chip feasibility bound for the v5e-8 story
                          (BASELINE.md:24); no reference number exists

Writes benchmarks/BENCH_MATRIX.json (committed as the round artifact) and
prints it. Timing methodology matches bench.py: device-resident rollout
chunks, host-fenced, best of several.
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "BENCH_MATRIX.json")

# The 1M row runs with a modestly raised candidate capacity (geom.maxlanes).
# History: under the old sort-based plan builder the PER-WINDOW cap KW
# truncated dense windows long before the total budget was spent
# (plan_overflow snapshots on hardware: 4352 lanes at the default, 1792 at
# 65536, 0 only at 131072). The range-select builder has no per-window cap,
# and the measured 1M collapse peaks at 219 of the default 246 segments per
# chunk (zero overflow, steps 0-300) — default capacity suffices, but 11%
# headroom is thin for a chaotic trajectory, so the row keeps 49152 (384
# segs, ~75% headroom). Geometry is config data (pdb_sph_tpu.geometry), so
# the row runs in-process alongside the default-geometry headline rows.
ROW_1M_MAXLANES = 49152


def run_row(scene, n, settle_chunks=1, chunk=240, reps=3, diag=False,
            **cfg_overrides):
    # chunk=240 matches bench.py: the tunneled backend's ~30-60 ms fixed
    # per-call latency is 0.5-1.0 ms/step at 60 steps/call — a measurement
    # tax no production rollout pays (the 1M row keeps a smaller chunk to
    # bound wall time; its per-step cost dwarfs the tax anyway)
    import jax
    import pdb_sph_tpu as pbf
    from pdb_sph_tpu.core.step import diagnostics_fn, make_rollout
    from pdb_sph_tpu.utils.platform import auto_backend, enable_compilation_cache
    from pdb_sph_tpu.utils.timing import host_sync

    enable_compilation_cache()

    cfg = pbf.default_config(n=n, **cfg_overrides)
    state = pbf.spawn(cfg, scene, seed=0)
    rollout = make_rollout(cfg, backend=auto_backend(), unroll_steps=chunk)

    for _ in range(settle_chunks):            # settle transient + compile
        state = rollout(state)
    host_sync(state)

    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        state = rollout(state)
        host_sync(state)
        best = min(best, time.perf_counter() - t0)

    x = np.asarray(state.x)
    row = {
        "scene": scene,
        "n": n,
        "steps_per_sec": round(chunk / best, 2),
        "ms_per_step": round(best / chunk * 1e3, 3),
        "particle_steps_per_sec": round(n * chunk / best, 1),
        "finite": bool(np.isfinite(x).all()),
        "in_box": bool((x > -0.25).all() and (x < cfg.wall + 0.25).all()),
    }
    if diag:
        d = jax.device_get(diagnostics_fn(cfg, state))
        row["stability"] = {
            "steps_simulated": int(state.step),
            "mean_density": round(float(d.mean_density), 1),
            "max_speed": round(float(d.max_speed), 3),
            "n_escaped": int(d.n_escaped),
            "plan_overflow": int(d.plan_overflow),
            "nan_detected": bool(d.nan_detected),
        }
    return row


def row_1m() -> dict:
    from pdb_sph_tpu.geometry import geometry_from_env

    geom = dataclasses.replace(geometry_from_env(),
                               maxlanes=ROW_1M_MAXLANES)
    r = run_row("dam_break", 1_000_000, chunk=20, reps=2, wall=4.64,
                diag=True, geom=geom)
    r["reference"] = {"claim": "no reference configuration at this scale",
                      "source": "BASELINE.md:24"}
    r["geom"] = {"maxlanes": geom.maxlanes}
    return r


def row_2m() -> dict:
    """Weak-scaling anchor above 1M (VERDICT round 4 item 3): the 2M dam
    break, box scaled to rest density (wall = 2*(2M/80k)^(1/3) = 5.85,
    ~29 occupied z-rows). SCALING.md section 5's forward model had zero
    measured points above n=1M (the 4M attempt crashed the tunneled
    worker); this row anchors the granularity formula one doubling up."""
    from pdb_sph_tpu.geometry import geometry_from_env

    geom = dataclasses.replace(geometry_from_env(),
                               maxlanes=ROW_1M_MAXLANES)
    r = run_row("dam_break", 2_000_000, chunk=10, reps=2, wall=5.85,
                diag=True, geom=geom)
    r["reference"] = {"claim": "no reference configuration at this scale",
                      "source": "BASELINE.md:24 (scaled)"}
    r["geom"] = {"maxlanes": geom.maxlanes}
    return r


def row_1m_blowup() -> dict:
    """Extreme-occupancy capacity row (VERDICT round 3 item 5): the
    concentrated-spawn stress at 1M scale. The box-relative blowup ball
    (radius wall/4) reproduces the reference scene's ~15x rest-density
    compression at n=1M / wall=4.64; 1000 settle steps cover the explosion
    and most of the recovery before timing."""
    from pdb_sph_tpu.geometry import geometry_from_env

    geom = dataclasses.replace(geometry_from_env(),
                               maxlanes=ROW_1M_MAXLANES)
    r = run_row("blowup", 1_000_000, chunk=20, reps=2, wall=4.64,
                diag=True, geom=geom, settle_chunks=50, cell_capacity=256)
    r["reference"] = {"claim": "stable, recovers to equilibrium "
                               "(80k scene scaled 12.5x)",
                      "source": "README.md:13 + BASELINE.md:24"}
    r["geom"] = {"maxlanes": geom.maxlanes}
    return r


ROW_FNS = {
    "standard40k": lambda: _ref60(run_row("standard", 40_000),
                                  "README.md:5"),
    "dam80k": lambda: _ref60(run_row("dam_break", 80_000), "README.md:9"),
    # blowup: run long enough to cover the explosion + recovery phase
    # (the reference claim is stability, not speed — README.md:13)
    "blowup80k": lambda: dict(
        run_row("blowup", 80_000, settle_chunks=10, diag=True),
        reference={"claim": "stable, recovers to equilibrium",
                   "source": "README.md:13"}),
    # 1M single-chip feasibility: fewer reps (each chunk is ~seconds), one
    # settle chunk; the number bounds the per-chip share of a v5e-8 mesh.
    # The box scales to keep the dam at rest density (wall = 2*(n/80k)^(1/3)
    # — the reference 2.0 box physically holds at most ~640k particles at
    # rest density, and an overpacked spawn both degenerates the physics and
    # truncates the candidate plan). Raised candidate capacity rides the
    # config's geometry (ROW_1M_MAXLANES above).
    "dam1m": row_1m,
    "dam2m": row_2m,
    # 1M concentrated-spawn stress: capacity story at extreme occupancy
    "blowup1m": row_1m_blowup,
}


def _ref60(r, source):
    r["reference"] = {"steps_per_sec": 60.0, "source": source}
    r["vs_baseline"] = round(r["steps_per_sec"] / 60.0, 3)
    return r


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=str, default=",".join(ROW_FNS),
                    help="comma-separated subset of rows to (re)run; other "
                         "rows are kept from the existing artifact so a "
                         "single new row can be measured without paying "
                         "for the whole matrix")
    args = ap.parse_args(argv)
    want = [r.strip() for r in args.rows.split(",") if r.strip()]
    unknown = set(want) - set(ROW_FNS)
    if unknown:
        print(f"unknown rows: {sorted(unknown)}; have {list(ROW_FNS)}",
              file=sys.stderr)
        return 2

    old = {}
    if os.path.exists(OUT) and set(want) != set(ROW_FNS):
        with open(OUT) as f:
            for row in json.load(f).get("rows", []):
                old[(row["scene"], row["n"])] = row

    rows = []
    for name in ROW_FNS:
        if name in want:
            r = ROW_FNS[name]()
            r.pop("carried_from_previous_run", None)
            rows.append(r)
            print(json.dumps(r))
            continue
        # carry the prior measurement forward, marked as such; a missing
        # prior row must be loud — silently shrinking the committed
        # artifact would read as "row dropped" (advisor, round 5)
        prior = [row for row in old.values() if _matches(name, row)]
        if prior:
            prior[0]["carried_from_previous_run"] = True
            rows.append(prior[0])
        else:
            print(f"warning: row {name!r} not re-run and absent from the "
                  f"existing {OUT}; the artifact will not contain it",
                  file=sys.stderr)

    art = {"artifact": "BASELINE.md benchmark matrix",
           "hardware": "1x TPU v5e (tunneled)",
           "rows": rows}
    with open(OUT, "w") as f:
        json.dump(art, f, indent=1)
    print(f"wrote {OUT}")
    return 0


def _matches(name, row):
    spec = {"standard40k": ("standard", 40_000),
            "dam80k": ("dam_break", 80_000),
            "blowup80k": ("blowup", 80_000),
            "dam1m": ("dam_break", 1_000_000),
            "dam2m": ("dam_break", 2_000_000),
            "blowup1m": ("blowup", 1_000_000)}[name]
    return (row["scene"], row["n"]) == spec


if __name__ == "__main__":
    sys.exit(main())
