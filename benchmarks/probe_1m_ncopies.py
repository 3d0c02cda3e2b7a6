"""1M per-lane gap attribution (VERDICT round 3 item 8).

The 1M dam-break row pays 0.86 ns/lane vs 0.70 at 80k with plan quality
measured equal (docs/PERF.md lane accounting); the residual was attributed
to "memory-system effects at the 12 MB footprint" without a measurement.
Prime suspect: the per-iteration candidate-array rebuild — `_p4_from_pT`
writes NCOPIES shifted copies of the (n_pad, 4) state, ~64 MB/iteration at
1M with the default NCOPIES=4 (~190 MB/step with the lambda splices),
where the 80k array is 5 MB and stays cache-warm.

Now that geometry is config data, the A/B is direct and same-process:

  1. full-step marginal cost at ncopies in {4, 2, 1} (fewer copies halve/
     quarter the rebuild traffic but coarsen the window-start quantization
     grid QSHIFT = seg/ncopies, paying more streamed pair lanes — the probe
     reports both sides);
  2. the isolated `_p4_from_pT` + `splice_lambda` marginal cost at each
     ncopies (the traffic attribution itself).

Measurement rules per probe_decompose.py: device->host fence, marginal
two-point fits inside one jitted fori_loop, `acc * 1e-30` data chains.

    python benchmarks/probe_1m_ncopies.py --n 1000000 --steps 120

Prints one JSON document (recorded in docs/PERF.md / docs/SCALING.md).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--steps", type=int, default=120,
                    help="settle steps before the measurement snapshot")
    ap.add_argument("--maxlanes", type=int, default=49152)
    ap.add_argument("--ncopies", type=int, nargs="+", default=[4, 2, 1])
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    import pdb_sph_tpu as pbf
    from pdb_sph_tpu.core.step import make_rollout
    from pdb_sph_tpu.geometry import geometry_from_env
    from pdb_sph_tpu.ops import hashgrid, pallas_pbf
    from pdb_sph_tpu.ops.integrate import predict
    from pdb_sph_tpu.utils.platform import auto_backend, \
        enable_compilation_cache

    enable_compilation_cache()

    def fence(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(np.asarray(leaf.reshape(-1)[0]))

    def best(f, fargs, reps=3):
        fence(f(*fargs))
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fence(f(*fargs))
            b = min(b, time.perf_counter() - t0)
        return b

    def log(m):
        print(m, file=sys.stderr, flush=True)

    base = dataclasses.replace(geometry_from_env(), maxlanes=args.maxlanes)
    cfg0 = pbf.default_config(n=args.n, geom=base)
    state = pbf.spawn(cfg0, "dam_break", seed=0)
    roll = make_rollout(cfg0, backend=auto_backend(), unroll_steps=20)
    for _ in range(args.steps // 20):
        state = roll(state)
    fence(state.x)
    log(f"[ncopies] snapshot at step {int(state.step)}")

    results = {}
    for nc in args.ncopies:
        geom = dataclasses.replace(base, ncopies=nc)
        cfg = pbf.default_config(n=args.n, geom=geom)
        n = cfg.n
        n_pad = pallas_pbf.pad_to_chunks(cfg, n)

        # frozen sorted snapshot for the isolated-glue timings
        p, _ = predict(cfg, state.x, state.v)
        cid = hashgrid.cell_ids(cfg, p)
        cid_pad = jnp.concatenate(
            [cid, jnp.full((n_pad - n,), cfg.num_nb_cells, jnp.int32)])
        scid, px, py, pz = jax.lax.sort(
            (cid_pad, jnp.pad(p[:, 0], (0, n_pad - n)),
             jnp.pad(p[:, 1], (0, n_pad - n)),
             jnp.pad(p[:, 2], (0, n_pad - n))), num_keys=1)
        p_s = jnp.stack([px, py, pz], axis=1)[:n]
        plan = pallas_pbf.build_plan(cfg, scid)
        pT0 = pallas_pbf.make_pT(cfg, p_s, n_pad)
        fence(pT0)
        nsegs = np.asarray(plan.seg_src)[:, 0, cfg.geom.segw - 1]
        paid_lanes = int(nsegs.sum()) * cfg.geom.seg

        # (a) isolated p4 rebuild + lambda splice marginal
        def mk_glue(k):
            def f(pT):
                def body(i, acc):
                    p4 = pallas_pbf._p4_from_pT(cfg, pT + acc * 1e-30)
                    lam = p4[3:4, :n_pad].T * 1e-30     # cheap consumer
                    p4b = pallas_pbf.splice_lambda(cfg, p4, lam, n_pad)
                    return acc + p4b[0, 0] * 1e-30
                return jax.lax.fori_loop(0, k, body, jnp.float32(0))
            return jax.jit(f), (pT0,)

        g_lo, a_lo = mk_glue(4)
        g_hi, a_hi = mk_glue(16)
        glue_ms = (best(g_hi, a_hi) - best(g_lo, a_lo)) / 12 * 1e3

        # (b) full-step marginal via rollouts
        ro_lo = make_rollout(cfg, backend="pallas", unroll_steps=5)
        ro_hi = make_rollout(cfg, backend="pallas", unroll_steps=20)
        s_lo = ro_lo(state)         # compile+warm; state reuse is fine (the
        fence(s_lo.x)               # trajectory differs, the work doesn't)
        s_hi = ro_hi(state)
        fence(s_hi.x)
        step_ms = (best(lambda s: ro_hi(s), (state,))
                   - best(lambda s: ro_lo(s), (state,))) / 15 * 1e3

        results[f"ncopies_{nc}"] = {
            "qshift": cfg.geom.qshift,
            "paid_candidate_lanes": paid_lanes,
            "p4_bytes": int(4 * cfg.geom.ncopies * (n_pad + cfg.geom.cc_pad)
                            * 4),
            "glue_ms_per_iter": round(glue_ms, 3),
            "glue_ms_per_step": round(glue_ms * cfg.solver_iters, 3),
            "full_step_ms": round(step_ms, 2),
        }
        log(f"[ncopies] nc={nc}: {results[f'ncopies_{nc}']}")

    print(json.dumps({
        "artifact": "1M per-lane gap attribution: candidate-array rebuild "
                    "traffic vs quantization waste across NCOPIES",
        "config": {"n": args.n, "maxlanes": args.maxlanes,
                   "snapshot_step": int(state.step)},
        "results": results,
    }, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
