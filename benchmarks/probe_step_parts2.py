"""Decompose the 80k step with RELIABLE fencing (device->host scalar read;
block_until_ready on this tunneled runtime can return early).

Marginal two-point fits over k repeats inside one jitted program.
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
from pdb_sph_tpu.ops.collide import finalize


def fence(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf.reshape(-1)[0])


def best(f, args, reps=4):
    fence(f(*args))
    b = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(f(*args))
        b = min(b, time.perf_counter() - t0)
    return b


def marginal(make_fn, lo=4, hi=16):
    f_lo, a_lo = make_fn(lo)
    f_hi, a_hi = make_fn(hi)
    return (best(f_hi, a_hi) - best(f_lo, a_lo)) / (hi - lo)


def main():
    n = 80_000
    cfg = pbf.default_config(n=n)
    state = pbf.spawn(cfg, "dam_break", seed=0)
    ro = make_rollout(cfg, backend="pallas", unroll_steps=60)
    state = ro(state)
    fence(state)
    print(f"OWN={pallas_pbf.OWN} CC={pallas_pbf.CC} NBUF={pallas_pbf.NBUF} "
          f"GB={pallas_pbf.GB}")

    n_pad = pallas_pbf.pad_to_chunks(n)
    width = n_pad + pallas_pbf.CC

    # -- A. full step --------------------------------------------------
    def mk_step(k):
        return make_rollout(cfg, backend="pallas", unroll_steps=k), (state,)

    # -- B. front: predict + pad + 8-op sort + plan --------------------
    def front(s, salt):
        p, v1 = predict(cfg, s.x, s.v)
        cid = hashgrid.cell_ids(cfg, p + salt)

        def pad(arr, fill):
            shape = (n_pad - n,) + arr.shape[1:]
            return jnp.concatenate([arr, jnp.full(shape, fill, arr.dtype)])

        cid_pad = pad(cid, cfg.num_nb_cells)
        so = jax.lax.sort(
            (cid_pad,
             pad(p[:, 0], pallas_pbf.SENTINEL),
             pad(p[:, 1], pallas_pbf.SENTINEL),
             pad(p[:, 2], pallas_pbf.SENTINEL),
             pad(s.x[:, 0], 0.0), pad(s.x[:, 1], 0.0), pad(s.x[:, 2], 0.0),
             pad(s.ids, -1)),
            num_keys=1)
        plan = pallas_pbf.build_plan(cfg, so[0])
        acc = sum(jnp.sum(o[::1024].astype(jnp.float32)) for o in so)
        return acc + jnp.sum(plan.chunk_start[::64, 0, ::64].astype(jnp.float32))

    def mk_front(k):
        def f(s):
            def body(carry, i):
                return carry + front(s, carry * 1e-30 + 1e-30 * i), None
            out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(k))
            return out
        return jax.jit(f), (state,)

    # -- frozen sorted inputs for solver pieces ------------------------
    p, _ = predict(cfg, state.x, state.v)
    cid = hashgrid.cell_ids(cfg, p)
    cid_pad = jnp.concatenate(
        [cid, jnp.full((n_pad - n,), cfg.num_nb_cells, jnp.int32)])
    scid, px, py, pz = jax.lax.sort(
        (cid_pad, jnp.pad(p[:, 0], (0, n_pad - n)),
         jnp.pad(p[:, 1], (0, n_pad - n)),
         jnp.pad(p[:, 2], (0, n_pad - n))), num_keys=1)
    p_s = jnp.stack([px, py, pz], axis=1)[:n]
    fence(p_s)

    # -- C. full 3-iteration solver exactly as the step runs it --------
    def mk_solver(k):
        def f(p_s):
            def body(i, acc):
                out = pallas_pbf.solve_pallas(cfg, p_s + acc * 1e-30, scid)
                return acc + out[0, 0]
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return jax.jit(f), (p_s,)

    # -- D. density / project passes (frozen plan + p4) ---------------
    plan = pallas_pbf.build_plan(cfg, scid)
    pT = jnp.zeros((n_pad, 4), jnp.float32)
    pT = pT.at[:n, 0:3].set(p_s).at[n:, 0:3].set(pallas_pbf.SENTINEL)
    p4 = pallas_pbf._p4_from_pT(pT, width)
    fence(p4)

    def mk_density(k):
        def f(pT, p4):
            def body(i, acc):
                lam = pallas_pbf.density_pass(
                    cfg, pT + acc * 1e-30, p4 + acc * 1e-30, plan)
                return acc + lam[0, 0] * 1e-30
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return jax.jit(f), (pT, p4)

    def mk_project(k):
        def f(pT, p4):
            def body(i, acc):
                out = pallas_pbf.project_pass(
                    cfg, pT + acc * 1e-30, p4 + acc * 1e-30, plan)
                return acc + out[0, 0] * 1e-30
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return jax.jit(f), (pT, p4)

    # -- E. per-iteration glue: p4 rebuild + lam splice -----------------
    def mk_glue(k):
        def f(pT):
            def body(i, pT):
                p4 = pallas_pbf._p4_from_pT(pT, width)
                lam = pT[:, 3:4] * jnp.float32(0.999)
                pT2 = jax.lax.dynamic_update_slice(pT, lam, (0, 3))
                p42 = jax.lax.dynamic_update_slice(p4, lam.T, (3, 0))
                return pT2 + 1e-30 * p42[0, 0]
            return jax.lax.fori_loop(0, k, body, pT)
        return jax.jit(f), (pT,)

    # -- F. finalize ----------------------------------------------------
    def mk_fin(k):
        def f(p_s, last):
            def body(i, acc):
                x, v = finalize(cfg, p_s + acc * 1e-30, last)
                return acc + x[0, 0] * 1e-30
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return jax.jit(f), (p_s, state.x)

    print(f"full step        : {marginal(mk_step)*1e3:7.3f} ms")
    print(f"front sort+plan  : {marginal(mk_front)*1e3:7.3f} ms")
    print(f"solver x3 as-is  : {marginal(mk_solver)*1e3:7.3f} ms")
    print(f"density pass     : {marginal(mk_density)*1e3:7.3f} ms")
    print(f"project pass     : {marginal(mk_project)*1e3:7.3f} ms")
    print(f"glue p4+lam      : {marginal(mk_glue)*1e3:7.3f} ms")
    print(f"finalize         : {marginal(mk_fin)*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
