"""Same-process hardware A/B of per-pass chain counts (PBF_CHAINS_D/_P).

The density pass keeps two (OWN, CC) f32 accumulators live, the project
pass three, so their vector-register spill points differ and the optimal
pair-loop interleave depth (blocks consumed per fori iteration) need not
match. Measures each pass's marginal per-iteration cost at chains in
{2, 3, 4, 5} using probe_decompose's rules (device->host scalar fence,
two-point marginal fits, fold-proof loop carries).

Usage: python benchmarks/probe_chains.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import pdb_sph_tpu as pbf
from pdb_sph_tpu.core.step import make_rollout
from pdb_sph_tpu.ops import hashgrid, pallas_pbf
from pdb_sph_tpu.ops.integrate import predict


def fence(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(leaf.reshape(-1)[0]))


def best(f, args, reps=4):
    fence(f(*args))
    b = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(f(*args))
        b = min(b, time.perf_counter() - t0)
    return b


def marginal(mk, lo=4, hi=16):
    f1, a1 = mk(lo)
    f2, a2 = mk(hi)
    return (best(f2, a2) - best(f1, a1)) / (hi - lo)


def main():
    n = 80_000
    cfg = pbf.default_config(n=n)
    state = pbf.spawn(cfg, "dam_break", seed=0)
    ro = make_rollout(cfg, backend="pallas", unroll_steps=60)
    state = ro(ro(state))      # step 120: the bench window's state
    fence(state)
    n_pad = pallas_pbf.pad_to_chunks(cfg, n)

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
    fence(plan.seg_src)

    segs = np.asarray(plan.seg_src)[:, 0, :]
    nblk = segs[:, cfg.geom.segw - 1]
    tot_blocks = float(nblk[nblk > 0].sum())
    print(f"OWN={cfg.geom.own} CC={cfg.geom.cc_d} NBUF={cfg.geom.nbuf} "
          f"GB={cfg.geom.gb} blocks={tot_blocks:.0f}")

    def mk_density(ch):
        def mk(k):
            def f(pT, seg_src):
                pl_ = pallas_pbf.SegPlan(seg_src=seg_src,
                                         n_overflow=jnp.int32(0))
                def body(i, acc):
                    p4 = pallas_pbf._p4_from_pT(cfg, pT + acc * 1e-30)
                    lam = pallas_pbf.density_pass(
                        cfg, pT + acc * 1e-30, p4, pl_, chains=ch)
                    return acc + lam[0, 0] * 1e-30
                return jax.lax.fori_loop(0, k, body, jnp.float32(0))
            return jax.jit(f), (pT0, plan.seg_src)
        return mk

    def mk_project(ch):
        def mk(k):
            def f(pT, seg_src):
                pl_ = pallas_pbf.SegPlan(seg_src=seg_src,
                                         n_overflow=jnp.int32(0))
                def body(i, acc):
                    p4 = pallas_pbf._p4_from_pT(cfg, pT + acc * 1e-30)
                    out = pallas_pbf.project_pass(
                        cfg, pT + acc * 1e-30, p4, pl_, chains=ch)
                    return acc + out[0, 0] * 1e-30
                return jax.lax.fori_loop(0, k, body, jnp.float32(0))
            return jax.jit(f), (pT0, plan.seg_src)
        return mk

    # NOTE: a failing variant (e.g. a Mosaic register-allocation failure)
    # poisons the tunneled TPU client — every later call in the process
    # fails too. Keep the variant list to known-compiling configs; probe a
    # suspect config LAST or in its own process.
    chain_counts = [int(c) for c in
                    os.environ.get("PROBE_CHAINS", "2,3,4").split(",")]
    for name, mkf in (("density", mk_density), ("project", mk_project)):
        for ch in chain_counts:
            try:
                ms = marginal(mkf(ch)) * 1e3
            except Exception as e:  # Mosaic compile failures are data too
                msg = str(e).replace("\n", " ")[:300]
                print(f"{name} chains={ch}: FAIL {type(e).__name__}: {msg}")
                continue
            print(f"{name} chains={ch}: {ms:.3f} ms/iter "
                  f"({ms * 1e6 / tot_blocks:.1f} ns/blk)")


if __name__ == "__main__":
    main()
