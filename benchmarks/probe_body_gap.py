"""Find the ~2.3 ms/iter gap between isolated density/project passes and the
real solver body (probe_step_parts2: solver x3 = 30.6 ms vs passes 3x7.9 ms).

All timings are marginal two-point fits with device->host fencing.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import pdb_sph_tpu as pbf
from pdb_sph_tpu.core.step import make_rollout
from pdb_sph_tpu.ops import hashgrid, pallas_pbf


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

    n_pad = pallas_pbf.pad_to_chunks(n)
    width = n_pad + pallas_pbf.CC

    from pdb_sph_tpu.ops.integrate import predict
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
    pT0 = jnp.zeros((n_pad, 4), jnp.float32)
    pT0 = pT0.at[:n, 0:3].set(p_s).at[n:, 0:3].set(pallas_pbf.SENTINEL)
    fence(pT0)

    # -- A. full body iteration exactly as solve_pallas runs it ----------
    def mk_body(k):
        def f(pT):
            def body(_, pT):
                p4 = pallas_pbf._p4_from_pT(pT, width)
                lam = pallas_pbf.density_pass(cfg, pT, p4, plan)
                pT = jax.lax.dynamic_update_slice(pT, lam, (0, 3))
                p4 = jax.lax.dynamic_update_slice(p4, lam.T, (3, 0))
                return pallas_pbf.project_pass(cfg, pT, p4, plan)
            return jax.lax.fori_loop(0, k, body, pT)
        return jax.jit(f), (pT0,)

    # -- B. body with glue outside the dependence chain (fresh p4 from a
    #       frozen pT; passes still chained through acc) ------------------
    p4f = pallas_pbf._p4_from_pT(pT0, width)
    fence(p4f)

    def mk_chain(k):
        def f(pT, p4):
            def body(_, carry):
                acc = carry
                lam = pallas_pbf.density_pass(cfg, pT + acc * 1e-30, p4, plan)
                out = pallas_pbf.project_pass(cfg, pT, p4 + lam[0, 0] * 1e-30,
                                              plan)
                return acc + out[0, 0] * 1e-30
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return jax.jit(f), (pT0, p4f)

    # -- C. glue only, carried like the real body -------------------------
    def mk_glue(k):
        def f(pT):
            def body(_, pT):
                p4 = pallas_pbf._p4_from_pT(pT, width)
                lam = pT[:, 3:4] * jnp.float32(0.999) + p4[0, 0] * 1e-30
                pT = jax.lax.dynamic_update_slice(pT, lam, (0, 3))
                p4 = jax.lax.dynamic_update_slice(p4, lam.T, (3, 0))
                return pT + p4[0:1, 0:4] * 1e-30
            return jax.lax.fori_loop(0, k, body, pT)
        return jax.jit(f), (pT0,)

    # -- D. empty pallas_call launch tax ---------------------------------
    def mk_empty(k):
        def kern(x_ref, o_ref):
            o_ref[...] = x_ref[...] + 1.0

        def one(x):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            )(x)

        from jax.experimental import pallas as pl

        def f(x):
            def body(_, x):
                return one(x)
            return jax.lax.fori_loop(0, k, body, x)
        return jax.jit(f), (jnp.zeros((8, 128), jnp.float32),)

    from jax.experimental import pallas as pl  # noqa: F401  (used in mk_empty)

    # -- E. front pieces --------------------------------------------------
    def mk_sort8(k):
        def f(pv, salt0):
            def body(_, salt):
                ops = tuple(pv[i] + salt for i in range(8))
                so = jax.lax.sort((cid_pad,) + ops, num_keys=1)
                return salt + so[1][0] * 1e-30
            return jax.lax.fori_loop(0, k, body, salt0)
        return jax.jit(f), (jnp.zeros((8, n_pad), jnp.float32),
                            jnp.float32(0))

    def mk_sort2(k):
        idx = jnp.arange(n_pad, dtype=jnp.int32)

        def f(cid, salt0):
            def body(_, salt):
                so_cid, so_idx = jax.lax.sort(
                    (cid + salt.astype(jnp.int32), idx), num_keys=1)
                return salt + so_idx[0] * 0
            return jax.lax.fori_loop(0, k, body, salt0)
        return jax.jit(f), (cid_pad, jnp.int32(0))

    def mk_sort2_gather(k):
        idx = jnp.arange(n_pad, dtype=jnp.int32)
        rows = jnp.zeros((n_pad, 7), jnp.float32)

        def f(cid, rows, salt0):
            def body(_, salt):
                so_cid, so_idx = jax.lax.sort(
                    (cid + salt.astype(jnp.int32), idx), num_keys=1)
                g = jnp.take(rows, so_idx, axis=0)
                return salt + g[0, 0].astype(jnp.int32) * 0 + so_cid[0] * 0
            return jax.lax.fori_loop(0, k, body, salt0)
        return jax.jit(f), (cid_pad, rows, jnp.int32(0))

    def mk_plan(k):
        def f(scid, salt0):
            def body(_, salt):
                pl_ = pallas_pbf.build_plan(cfg, scid + salt)
                return salt + pl_.chunk_start[0, 0, 0] * 0
            return jax.lax.fori_loop(0, k, body, salt0)
        return jax.jit(f), (scid, jnp.int32(0))

    print(f"body iter (real)   : {marginal(mk_body)*1e3:7.3f} ms")
    print(f"passes only chained: {marginal(mk_chain)*1e3:7.3f} ms")
    print(f"glue only          : {marginal(mk_glue)*1e3:7.3f} ms")
    print(f"empty pallas_call  : {marginal(mk_empty)*1e3:7.3f} ms")
    print(f"sort 8-operand     : {marginal(mk_sort8)*1e3:7.3f} ms")
    print(f"sort 2-operand     : {marginal(mk_sort2)*1e3:7.3f} ms")
    print(f"sort2 + 7-col take : {marginal(mk_sort2_gather)*1e3:7.3f} ms")
    print(f"build_plan         : {marginal(mk_plan)*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
