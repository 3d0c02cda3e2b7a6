"""In-process A/B: density-pass rd2 on the VPU delta chain vs the MXU at
Precision.HIGH (3-pass bf16).  Round-1 measured the 1-pass default (broke
settling, 4.7e-2 rd2 error) and HIGHEST (f32-exact but slower than the VPU
chain); HIGH was never measured (docs/PERF.md).  Same-process marginal
two-point fits per the probe_decompose measurement rules.

Usage: python benchmarks/probe_mxu_high.py
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
    state = ro(state)
    state = ro(state)          # step 120: the bench window's state
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
    segs = np.asarray(plan.seg_src)[:, 0, :]
    nblk = segs[:, cfg.geom.segw - 1]
    nb = float(nblk[nblk > 0].sum())
    print(f"blocks: {nb:.0f} total, mean {nblk[nblk>0].mean():.2f}/chunk")

    def mk_density(mxu):
        def mk(k):
            def f(pT, seg_src):
                pl_ = pallas_pbf.SegPlan(seg_src=seg_src,
                                         n_overflow=jnp.int32(0))
                def body(i, acc):
                    p4 = pallas_pbf._p4_from_pT(cfg, pT + acc * 1e-30)
                    lam = pallas_pbf.density_pass(
                        cfg, pT + acc * 1e-30, p4, pl_, mxu_rd2=mxu)
                    return acc + lam[0, 0] * 1e-30
                return jax.lax.fori_loop(0, k, body, jnp.float32(0))
            return jax.jit(f), (pT0, plan.seg_src)
        return mk

    def mk_project(mxu):
        def mk(k):
            def f(pT, seg_src):
                pl_ = pallas_pbf.SegPlan(seg_src=seg_src,
                                         n_overflow=jnp.int32(0))
                def body(i, acc):
                    p4 = pallas_pbf._p4_from_pT(cfg, pT + acc * 1e-30)
                    out = pallas_pbf.project_pass(
                        cfg, pT + acc * 1e-30, p4, pl_, mxu_proj=mxu)
                    return acc + out[0, 0] * 1e-30
                return jax.lax.fori_loop(0, k, body, jnp.float32(0))
            return jax.jit(f), (pT0, plan.seg_src)
        return mk

    # numerical check first: HIGH-precision dot vs exact VPU deltas
    p4 = pallas_pbf._p4_from_pT(cfg, pT0)
    lam_vpu = pallas_pbf.density_pass(cfg, pT0, p4, plan, mxu_rd2=False)
    lam_mxu = pallas_pbf.density_pass(cfg, pT0, p4, plan, mxu_rd2=True)
    lv, lm = np.asarray(lam_vpu)[:n, 0], np.asarray(lam_mxu)[:n, 0]
    err = np.abs(lv - lm)
    denom = np.maximum(np.abs(lv).max(), 1e-12)
    print(f"lambda |diff|: max {err.max():.3e} rel {err.max()/denom:.3e}",
          flush=True)

    pT1 = jax.lax.dynamic_update_slice(pT0, lam_vpu, (0, 3))
    p4l = pallas_pbf.splice_lambda(cfg, p4, lam_vpu, n_pad)
    out_vpu = pallas_pbf.project_pass(cfg, pT1, p4l, plan, mxu_proj=False)
    out_mxu = pallas_pbf.project_pass(cfg, pT1, p4l, plan, mxu_proj=True)
    ov = np.asarray(out_vpu)[:n, 0:3]
    om = np.asarray(out_mxu)[:n, 0:3]
    dp = np.abs(ov - np.asarray(pT1)[:n, 0:3]).max()
    perr = np.abs(ov - om).max()
    print(f"project |diff|: max {perr:.3e} (|dp| max {dp:.3e})", flush=True)

    for tag, mk, mxu in (("density VPU deltas ", mk_density, False),
                         ("density MXU rd2 HIGH", mk_density, True),
                         ("project VPU deltas ", mk_project, False),
                         ("project MXU HIGH    ", mk_project, True)):
        dn = marginal(mk(mxu))
        print(f"{tag}: {dn*1e3:7.3f} ms  ({dn/nb*1e9:5.1f} ns/blk)",
              flush=True)


if __name__ == "__main__":
    main()
