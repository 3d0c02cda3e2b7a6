"""Decompose the 80k dam-break step cost on the real chip.

Times (marginal, two-point unroll fit to kill per-dispatch RPC):
  A. full step
  B. predict + sort + plan only (no solver)
  C. solver only, k density passes (k=1..3) on a frozen settled state
  D. solver only, k project passes
Usage: python benchmarks/probe_step_parts.py [NBUF]
"""

import os
import sys
import time

if len(sys.argv) > 1:
    os.environ["PBF_NBUF"] = sys.argv[1]

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import pdb_sph_tpu as pbf
from pdb_sph_tpu.core.step import make_rollout, step_fn
from pdb_sph_tpu.ops import hashgrid, pallas_pbf
from pdb_sph_tpu.ops.integrate import predict


def marginal(make_fn, lo=4, hi=16, reps=4):
    """time(make_fn(hi)) - time(make_fn(lo)) scaled per unit."""
    f_lo, f_hi = make_fn(lo), make_fn(hi)

    def best(f, args):
        out = f(*args)
        jax.block_until_ready(out)
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*args))
            b = min(b, time.perf_counter() - t0)
        return b

    return (best(f_hi[0], f_hi[1]) - best(f_lo[0], f_lo[1])) / (hi - lo)


def main():
    n = 80_000
    cfg = pbf.default_config(n=n)
    state = pbf.spawn(cfg, "dam_break", seed=0)
    # settle 60 steps so density/occupancy are realistic
    ro = make_rollout(cfg, backend="pallas", unroll_steps=60)
    state = ro(state)
    jax.block_until_ready(state.x)
    print(f"NBUF={pallas_pbf.NBUF} OWN={pallas_pbf.OWN} CC={pallas_pbf.CC} "
          f"GB={pallas_pbf.GB}")

    # A. full step marginal
    def mk_step(k):
        f = make_rollout(cfg, backend="pallas", unroll_steps=k)
        return f, (state,)

    # B. front half only (predict+sort+plan), scanned k times
    n_pad = pallas_pbf.pad_to_chunks(n)

    def front(s):
        p, v1 = predict(cfg, s.x, s.v)
        cid = hashgrid.cell_ids(cfg, p)
        cid_pad = jnp.concatenate(
            [cid, jnp.full((n_pad - n,), cfg.num_nb_cells, jnp.int32)])
        sorted_ops = jax.lax.sort(
            (cid_pad,
             jnp.pad(p[:, 0], (0, n_pad - n)),
             jnp.pad(p[:, 1], (0, n_pad - n)),
             jnp.pad(p[:, 2], (0, n_pad - n)),
             jnp.pad(s.x[:, 0], (0, n_pad - n)),
             jnp.pad(s.x[:, 1], (0, n_pad - n)),
             jnp.pad(s.x[:, 2], (0, n_pad - n)),
             jnp.pad(s.ids, (0, n_pad - n))), num_keys=1)
        plan = pallas_pbf.build_plan(cfg, sorted_ops[0])
        # fold everything into the state so nothing is DCE'd
        x = s.x.at[:, 0].add(1e-30 * (plan.chunk_start[0, 0, 0]
                                      + sorted_ops[1][0]))
        return pbf.SimState(x=x, v=s.v, ids=s.ids, step=s.step + 1)

    def mk_front(k):
        def f(s):
            def body(ss, _):
                return front(ss), None
            out, _ = jax.lax.scan(body, s, None, length=k)
            return out
        return jax.jit(f), (state,)

    # C/D. solver passes on a frozen sorted state
    p, _ = predict(cfg, state.x, state.v)
    cid = hashgrid.cell_ids(cfg, p)
    cid_pad = jnp.concatenate(
        [cid, jnp.full((n_pad - n,), cfg.num_nb_cells, jnp.int32)])
    sorted_cid_pad, px, py, pz = jax.lax.sort(
        (cid_pad,
         jnp.pad(p[:, 0], (0, n_pad - n)),
         jnp.pad(p[:, 1], (0, n_pad - n)),
         jnp.pad(p[:, 2], (0, n_pad - n))), num_keys=1)
    plan = pallas_pbf.build_plan(cfg, sorted_cid_pad)
    pT = jnp.zeros((n_pad, 4), jnp.float32)
    pT = pT.at[:, 0].set(px).at[:, 1].set(py).at[:, 2].set(pz)
    pT = pT.at[n:, 0:3].set(pallas_pbf.SENTINEL)
    width = n_pad + pallas_pbf.CC
    jax.block_until_ready(pT)

    def mk_density(k):
        def f(pT):
            p4 = pallas_pbf._p4_from_pT(pT, width)
            def body(i, pT):
                lam = pallas_pbf.density_pass(cfg, pT, p4, plan)
                return jax.lax.dynamic_update_slice(pT, lam, (0, 3))
            return jax.lax.fori_loop(0, k, body, pT)
        return jax.jit(f), (pT,)

    def mk_project(k):
        def f(pT):
            p4 = pallas_pbf._p4_from_pT(pT, width)
            def body(i, pT):
                return pallas_pbf.project_pass(cfg, pT, p4, plan)
            return jax.lax.fori_loop(0, k, body, pT)
        return jax.jit(f), (pT,)

    def mk_p4(k):
        def f(pT):
            def body(i, pT):
                p4 = pallas_pbf._p4_from_pT(pT, width)
                return pT + 1e-30 * p4[0, 0]
            return jax.lax.fori_loop(0, k, body, pT)
        return jax.jit(f), (pT,)

    print(f"full step      : {marginal(mk_step)*1e3:7.3f} ms")
    print(f"front (sort+plan): {marginal(mk_front)*1e3:7.3f} ms")
    print(f"density pass   : {marginal(mk_density)*1e3:7.3f} ms")
    print(f"project pass   : {marginal(mk_project)*1e3:7.3f} ms")
    print(f"p4 relayout    : {marginal(mk_p4)*1e3:7.3f} ms")

    # plan statistics: paid vs real lanes
    pl_np = np.asarray(plan.chunk_start)
    total = pl_np[:, 0, pallas_pbf.META_W - 1]
    lo = np.asarray(plan.chunk_lo)[:, 0, :pallas_pbf.MAX_T]
    hi = np.asarray(plan.chunk_hi)[:, 0, :pallas_pbf.MAX_T]
    real = (hi - lo).sum(axis=1)
    paid = total * pallas_pbf.CC
    active = total > 0
    print(f"chunks active {active.sum()}/{len(total)}  "
          f"T mean {total[active].mean():.2f}  "
          f"paid lanes/chunk {paid[active].mean():.0f}  "
          f"real lanes/chunk {real[active].mean():.0f}  "
          f"waste {paid[active].sum()/max(real[active].sum(),1):.2f}x")


if __name__ == "__main__":
    main()
