"""Measure: (OWN,3)@(3,CC) f32 matmul inside a Mosaic kernel vs the VPU
delta/square chain it would replace. Marginal per loop iteration, honest
device->host fencing."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OWN, CC = 64, 512


def fence(x):
    return float(np.array(x.reshape(-1)[0]))


def best(f, *a, reps=5):
    fence(f(*a))
    b = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(f(*a))
        b = min(b, time.perf_counter() - t0)
    return b


def run(make_kernel, iters):
    kern = make_kernel(iters)
    f = jax.jit(lambda own, cand: pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((OWN, 1), jnp.float32),
    )(own, cand))
    own = jnp.ones((OWN, 4), jnp.float32) * 0.5
    cand = jnp.ones((5, CC), jnp.float32) * 0.25
    return f, own, cand


def marginal(make_kernel, lo=20000, hi=100000):
    f1, o, c = run(make_kernel, lo)
    f2, _, _ = run(make_kernel, hi)
    return (best(f2, o, c) - best(f1, o, c)) / (hi - lo)


# -- A: VPU delta chain (current scheme's rd2) --------------------------
def mk_vpu(iters):
    def kern(own_ref, cand_ref, out_ref):
        ox = own_ref[:, 0:1]
        oy = own_ref[:, 1:2]
        oz = own_ref[:, 2:3]
        h2 = jnp.float32(0.01)

        def body(t, acc):
            cand = cand_ref[...] + t.astype(jnp.float32) * 1e-30
            dx = ox - cand[0:1, :]
            dy = oy - cand[1:2, :]
            dz = oz - cand[2:3, :]
            rd2 = jnp.minimum(dx * dx + dy * dy + dz * dz, h2)
            return acc + rd2

        acc = jax.lax.fori_loop(0, iters, body, jnp.zeros((OWN, CC), jnp.float32))
        out_ref[...] = jnp.sum(acc, axis=1, keepdims=True)
    return kern


# -- B: MXU rd2 ---------------------------------------------------------
def mk_mxu(iters):
    def kern(own_ref, cand_ref, out_ref):
        own3 = own_ref[:, 0:3]                       # (OWN, 3)
        osq = own_ref[:, 3:4]                        # |pi|^2 (OWN, 1)
        h2 = jnp.float32(0.01)

        def body(t, acc):
            cand = cand_ref[...] + t.astype(jnp.float32) * 1e-30
            m = jax.lax.dot_general(
                own3, cand[0:3, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # (OWN, CC)
            a = osq + cand[4:5, :]                    # |pi|^2 + |pj|^2(+pen)
            rd2 = jnp.minimum(a - 2.0 * m, h2)
            return acc + rd2

        acc = jax.lax.fori_loop(0, iters, body, jnp.zeros((OWN, CC), jnp.float32))
        out_ref[...] = jnp.sum(acc, axis=1, keepdims=True)
    return kern


# -- C: full new-density chain (MXU rd2 + poly + rsqrt chain) -----------
def mk_density_new(iters):
    def kern(own_ref, cand_ref, out_ref):
        own3 = own_ref[:, 0:3]
        osq = own_ref[:, 3:4]
        h2 = jnp.float32(0.01)
        h = jnp.float32(0.1)

        def body(t, carry):
            rho_b, g2_b = carry
            cand = cand_ref[...] + t.astype(jnp.float32) * 1e-30
            m = jax.lax.dot_general(
                own3, cand[0:3, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            a = osq + cand[4:5, :]
            rd2 = jnp.maximum(jnp.minimum(a - 2.0 * m, h2), jnp.float32(1e-16))
            t_ = h2 - rd2
            u = h - rd2 * jax.lax.rsqrt(rd2)
            t2 = t_ * t_
            u2 = u * u
            return rho_b + t2 * t_, g2_b + (u2 * u2) * rd2

        z = jnp.zeros((OWN, CC), jnp.float32)
        rho_b, g2_b = jax.lax.fori_loop(0, iters, body, (z, z))
        out_ref[...] = jnp.sum(rho_b + g2_b, axis=1, keepdims=True)
    return kern


# -- D: full current-density chain (for direct comparison) --------------
def mk_density_old(iters):
    def kern(own_ref, cand_ref, out_ref):
        ox = own_ref[:, 0:1]
        oy = own_ref[:, 1:2]
        oz = own_ref[:, 2:3]
        h2 = jnp.float32(0.01)
        h = jnp.float32(0.1)

        def body(t, carry):
            rho_b, g2_b = carry
            cand = cand_ref[...] + t.astype(jnp.float32) * 1e-30
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, CC), 1)
            penalty = jnp.where((lane >= 3) & (lane < 500),
                                jnp.float32(1e-16), h2)
            dx = ox - cand[0:1, :]
            dy = oy - cand[1:2, :]
            dz = oz - cand[2:3, :]
            rd2 = jnp.minimum(dx * dx + dy * dy + (dz * dz + penalty), h2)
            t_ = h2 - rd2
            u = h - rd2 * jax.lax.rsqrt(rd2)
            t2 = t_ * t_
            u2 = u * u
            return rho_b + t2 * t_, g2_b + (u2 * u2) * rd2

        z = jnp.zeros((OWN, CC), jnp.float32)
        rho_b, g2_b = jax.lax.fori_loop(0, iters, body, (z, z))
        out_ref[...] = jnp.sum(rho_b + g2_b, axis=1, keepdims=True)
    return kern


# -- E: new project chain -----------------------------------------------
def mk_project_new(iters):
    def kern(own_ref, cand_ref, out_ref):
        own3 = own_ref[:, 0:3]
        osq = own_ref[:, 3:4]
        olam = own_ref[:, 3:4] * 0.5
        h2 = jnp.float32(0.01)
        h = jnp.float32(0.1)

        def body(t, carry):
            ssum, sx, sy, sz = carry
            cand = cand_ref[...] + t.astype(jnp.float32) * 1e-30
            m = jax.lax.dot_general(
                own3, cand[0:3, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            a = osq + cand[4:5, :]
            rd2 = jnp.maximum(jnp.minimum(a - 2.0 * m, h2), jnp.float32(1e-16))
            u = h - rd2 * jax.lax.rsqrt(rd2)
            u2 = u * u
            lam = olam + cand[3:4, :]
            s = u2 * lam
            return (ssum + s, sx + s * cand[0:1, :], sy + s * cand[1:2, :],
                    sz + s * cand[2:3, :])

        z = jnp.zeros((OWN, CC), jnp.float32)
        ssum, sx, sy, sz = jax.lax.fori_loop(0, iters, body, (z, z, z, z))
        out_ref[...] = jnp.sum(ssum + sx + sy + sz, axis=1, keepdims=True)
    return kern


# -- F: current project chain -------------------------------------------
def mk_project_old(iters):
    def kern(own_ref, cand_ref, out_ref):
        ox = own_ref[:, 0:1]
        oy = own_ref[:, 1:2]
        oz = own_ref[:, 2:3]
        olam = own_ref[:, 3:4]
        h2 = jnp.float32(0.01)
        h = jnp.float32(0.1)

        def body(t, carry):
            dpx, dpy, dpz = carry
            cand = cand_ref[...] + t.astype(jnp.float32) * 1e-30
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, CC), 1)
            penalty = jnp.where((lane >= 3) & (lane < 500),
                                jnp.float32(1e-16), h2)
            clam = cand[3:4, :] + jnp.float32(1e-4)
            dx = ox - cand[0:1, :]
            dy = oy - cand[1:2, :]
            dz = oz - cand[2:3, :]
            rd2 = jnp.minimum(dx * dx + dy * dy + (dz * dz + penalty), h2)
            u = h - rd2 * jax.lax.rsqrt(rd2)
            s = (u * u) * (olam + clam)
            return dpx + s * dx, dpy + s * dy, dpz + s * dz

        z = jnp.zeros((OWN, CC), jnp.float32)
        dpx, dpy, dpz = jax.lax.fori_loop(0, iters, body, (z, z, z))
        out_ref[...] = jnp.sum(dpx + dpy + dpz, axis=1, keepdims=True)
    return kern


def main():
    for name, mk in [("rd2 vpu", mk_vpu), ("rd2 mxu", mk_mxu),
                     ("density old", mk_density_old),
                     ("density new", mk_density_new),
                     ("project old", mk_project_old),
                     ("project new", mk_project_new)]:
        try:
            t = marginal(mk)
            print(f"{name:12s}: {t*1e9:7.1f} ns/chunk")
        except Exception as e:
            print(f"{name:12s}: FAILED {str(e)[:200]}")


if __name__ == "__main__":
    main()


# -- G: VPU density without penalty (quantized-window scheme) -----------
def mk_density_vpu_np(iters):
    def kern(own_ref, cand_ref, out_ref):
        ox = own_ref[:, 0:1]
        oy = own_ref[:, 1:2]
        oz = own_ref[:, 2:3]
        h2 = jnp.float32(0.01)
        h = jnp.float32(0.1)

        def body(t, carry):
            rho_b, g2_b = carry
            cand = cand_ref[...] + t.astype(jnp.float32) * 1e-30
            dx = ox - cand[0:1, :]
            dy = oy - cand[1:2, :]
            dz = oz - cand[2:3, :]
            rd2 = jnp.maximum(jnp.minimum(dx * dx + dy * dy + dz * dz, h2),
                              jnp.float32(1e-16))
            t_ = h2 - rd2
            u = h - rd2 * jax.lax.rsqrt(rd2)
            t2 = t_ * t_
            u2 = u * u
            return rho_b + t2 * t_, g2_b + (u2 * u2) * rd2

        z = jnp.zeros((OWN, CC), jnp.float32)
        rho_b, g2_b = jax.lax.fori_loop(0, iters, body, (z, z))
        out_ref[...] = jnp.sum(rho_b + g2_b, axis=1, keepdims=True)
    return kern


# -- H: VPU project without penalty -------------------------------------
def mk_project_vpu_np(iters):
    def kern(own_ref, cand_ref, out_ref):
        ox = own_ref[:, 0:1]
        oy = own_ref[:, 1:2]
        oz = own_ref[:, 2:3]
        olam = own_ref[:, 3:4] + jnp.float32(1e-4)
        h2 = jnp.float32(0.01)
        h = jnp.float32(0.1)

        def body(t, carry):
            dpx, dpy, dpz = carry
            cand = cand_ref[...] + t.astype(jnp.float32) * 1e-30
            dx = ox - cand[0:1, :]
            dy = oy - cand[1:2, :]
            dz = oz - cand[2:3, :]
            rd2 = jnp.maximum(jnp.minimum(dx * dx + dy * dy + dz * dz, h2),
                              jnp.float32(1e-16))
            u = h - rd2 * jax.lax.rsqrt(rd2)
            s = (u * u) * (olam + cand[3:4, :])
            return dpx + s * dx, dpy + s * dy, dpz + s * dz

        z = jnp.zeros((OWN, CC), jnp.float32)
        dpx, dpy, dpz = jax.lax.fori_loop(0, iters, body, (z, z, z))
        out_ref[...] = jnp.sum(dpx + dpy + dpz, axis=1, keepdims=True)
    return kern


def main2():
    global OWN
    for name, mk in [("density vpu-np", mk_density_vpu_np),
                     ("project vpu-np", mk_project_vpu_np)]:
        t = marginal(mk)
        print(f"{name:16s} OWN=64 : {t*1e9:7.1f} ns/chunk")
    OWN = 128
    for name, mk in [("density mxu", mk_density_new),
                     ("density vpu-np", mk_density_vpu_np),
                     ("project vpu-np", mk_project_vpu_np),
                     ("project mxu", mk_project_new)]:
        t = marginal(mk, lo=10000, hi=50000)
        print(f"{name:16s} OWN=128: {t*1e9:7.1f} ns/chunk")


if __name__ == "__main__":
    main2()
