"""Honest step decomposition for the 80k dam break on real hardware.

THE canonical perf instrument for this repo; supersedes the retired
probe_step_parts*/probe_body_gap/probe_launch_tax scripts (their history
of artifacts is documented in docs/PERF.md). Measurement rules embodied
here (violate them and the numbers lie):

  * fence through a device->host scalar read — block_until_ready can
    return early on the tunneled runtime;
  * marginal two-point fits (lo/hi repeat counts inside ONE jitted
    fori_loop) with windows of several ms, or dispatch jitter dominates;
  * loop bodies must carry a data dependence XLA cannot fold away:
    `acc * 1e-30` chains, never `i * 0` or `x[0] * 0` (DCE'd fictions).

Usage: python benchmarks/probe_decompose.py
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
from pdb_sph_tpu.ops.collide import finalize
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
    state = ro(state)
    state = ro(state)          # step 120: the bench window's state
    fence(state)
    print(f"OWN={cfg.geom.own} CC={cfg.geom.cc_d} NBUF={cfg.geom.nbuf} "
          f"GB={cfg.geom.gb} SEG={cfg.geom.seg}")

    n_pad = pallas_pbf.pad_to_chunks(cfg, n)


    # frozen sorted inputs for the solver pieces
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
    act = nblk > 0
    nb = float(nblk[act].sum())
    print(f"candidate blocks/chunk: mean {nblk[act].mean():.2f} "
          f"max {nblk.max()} over {act.sum()} chunks")

    def mk_step(k):
        return make_rollout(cfg, backend="pallas", unroll_steps=k), (state,)

    def mk_front(k):
        def f(s):
            def body(i, acc):
                pp, _ = predict(cfg, s.x, s.v)
                cc = hashgrid.cell_ids(cfg, pp + acc * 1e-30)
                so = jax.lax.sort(
                    (jnp.concatenate(
                        [cc, jnp.full((n_pad - n,), cfg.num_nb_cells,
                                      jnp.int32)]),
                     jnp.pad(pp[:, 0], (0, n_pad - n)),
                     jnp.pad(pp[:, 1], (0, n_pad - n)),
                     jnp.pad(pp[:, 2], (0, n_pad - n))), num_keys=1)
                pl_ = pallas_pbf.build_plan(cfg, so[0])
                return (acc + so[1][0]
                        + pl_.seg_src[0, 0, 1].astype(jnp.float32)
                        + pl_.n_overflow.astype(jnp.float32))
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return jax.jit(f), (state,)

    def mk_body(k):
        def f(pT, seg_src):
            pl_ = pallas_pbf.SegPlan(seg_src=seg_src,
                                     n_overflow=jnp.int32(0))
            def body(_, pT):
                p4 = pallas_pbf._p4_from_pT(cfg, pT)
                lam = pallas_pbf.density_pass(cfg, pT, p4, pl_)
                pT = jax.lax.dynamic_update_slice(pT, lam, (0, 3))
                p4 = pallas_pbf.splice_lambda(cfg, p4, lam, n_pad)
                return pallas_pbf.project_pass(cfg, pT, p4, pl_)
            return jax.lax.fori_loop(0, k, body, pT)
        return jax.jit(f), (pT0, plan.seg_src)

    def mk_density(k):
        def f(pT, seg_src):
            pl_ = pallas_pbf.SegPlan(seg_src=seg_src,
                                     n_overflow=jnp.int32(0))
            def body(i, acc):
                p4 = pallas_pbf._p4_from_pT(cfg, pT + acc * 1e-30)
                lam = pallas_pbf.density_pass(cfg, pT + acc * 1e-30, p4, pl_)
                return acc + lam[0, 0] * 1e-30
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return jax.jit(f), (pT0, plan.seg_src)

    def mk_project(k):
        def f(pT, seg_src):
            pl_ = pallas_pbf.SegPlan(seg_src=seg_src,
                                     n_overflow=jnp.int32(0))
            def body(i, acc):
                p4 = pallas_pbf._p4_from_pT(cfg, pT + acc * 1e-30)
                out = pallas_pbf.project_pass(cfg, pT + acc * 1e-30, p4, pl_)
                return acc + out[0, 0] * 1e-30
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return jax.jit(f), (pT0, plan.seg_src)

    def mk_fin(k):
        def f(p_s, last):
            def body(i, acc):
                x, v = finalize(cfg, p_s + acc * 1e-30, last)
                return acc + x[0, 0] * 1e-30 + v[0, 0] * 1e-30
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return jax.jit(f), (p_s, state.x)

    st = marginal(mk_step, lo=10, hi=40)
    fr = marginal(mk_front)
    bd = marginal(mk_body)
    dn = marginal(mk_density)
    pr = marginal(mk_project)
    fi = marginal(mk_fin)
    print(f"full step            : {st*1e3:7.3f} ms  "
          f"({n/st/1e6:.2f}M particle-steps/s)")
    print(f"front sort+plan      : {fr*1e3:7.3f} ms")
    print(f"solver body (1 iter) : {bd*1e3:7.3f} ms  x{cfg.solver_iters}")
    print(f"  density pass       : {dn*1e3:7.3f} ms  ({dn/nb*1e9:5.1f} ns/blk)")
    print(f"  project pass       : {pr*1e3:7.3f} ms  ({pr/nb*1e9:5.1f} ns/blk)")
    print(f"finalize             : {fi*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
