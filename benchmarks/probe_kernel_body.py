"""Ablate the density-kernel inner costs with MARGINAL timing.

Every measurement is a two-point fit (large grid minus small grid) so the
~20-40 us per-dispatch floor of the tunneled runtime cancels. The kernel
replicates the real density pass structure: grid over chunk groups, SMEM
meta with dynamic window starts and dynamic trip count, NBUF-deep manual
DMA pipeline from an HBM-resident (4, width) array, full pair math, two
accumulators, per-chunk reduce + store.

Toggles let each feature be ablated:
  variant("name", math=..., dma=..., dyn_t=..., nbuf=..., gb=..., penalty=...)
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as _np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OWN = int(os.environ.get("PBF_OWN", "64"))
CC = int(os.environ.get("PBF_CC", "512"))
T = 10
META_W = 128
WIDTH = 80_640
H2 = 0.01
H = 0.1


def build(grid_n: int, *, math="full", dma=True, dyn_t=True, nbuf=4, gb=4,
          penalty=True):
    def kernel(starts_ref, own_ref, hbm_ref, o_ref, buf, sem):
        for g in range(gb):
            sl = slice(g * OWN, (g + 1) * OWN)
            ox = own_ref[sl, 0:1]
            oy = own_ref[sl, 1:2]
            oz = own_ref[sl, 2:3]
            zero = jnp.zeros((OWN, CC), jnp.float32)
            total = starts_ref[0, g, META_W - 1] if dyn_t else T

            def issue(slot, t, g=g):
                start = pl.multiple_of(starts_ref[0, g, t], 128)
                return pltpu.make_async_copy(
                    hbm_ref.at[:, pl.ds(start, CC)], buf.at[slot],
                    sem.at[slot]
                )

            if dma:
                for k in range(nbuf - 1):
                    @pl.when(k < total)
                    def _(k=k):
                        issue(k, k).start()

            def body(t, acc, ox=ox, oy=oy, oz=oz, g=g):
                rho_b, g2_b = acc
                if dma:
                    slot = jax.lax.rem(t, nbuf)

                    @pl.when(t + nbuf - 1 < total)
                    def _():
                        issue(jax.lax.rem(t + nbuf - 1, nbuf),
                              t + nbuf - 1).start()

                    issue(slot, t).wait()
                    cand = buf[slot]
                else:
                    cand = buf[0]
                if math == "none":
                    return rho_b + cand[0:1, :], g2_b
                if penalty:
                    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CC), 1)
                    pen = jnp.where((lane >= t) & (lane < CC - 1),
                                    jnp.float32(1e-16), H2)
                else:
                    pen = jnp.float32(1e-16)
                dx = ox - cand[0:1, :]
                dy = oy - cand[1:2, :]
                dz = oz - cand[2:3, :]
                rd2 = jnp.minimum(dx * dx + (dy * dy + (dz * dz + pen)), H2)
                tt = H2 - rd2
                u = H - rd2 * jax.lax.rsqrt(rd2)
                t2 = tt * tt
                u2 = u * u
                if math == "half":
                    return rho_b + t2 * tt, g2_b
                return rho_b + t2 * tt, g2_b + (u2 * u2) * rd2

            rho, g2 = jax.lax.fori_loop(0, total, body, (zero, zero))
            o_ref[sl, :] = (
                jnp.sum(rho, axis=1, keepdims=True)
                + jnp.sum(g2, axis=1, keepdims=True)
            )

    @jax.jit
    def f(starts, own, hbm):
        return pl.pallas_call(
            kernel,
            grid=(grid_n,),
            in_specs=[
                pl.BlockSpec((1, gb, META_W), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((gb * OWN, 4), lambda i: (i, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((gb * OWN, 1), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((grid_n * gb * OWN, 1),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((nbuf, 4, CC), jnp.float32),
                pltpu.SemaphoreType.DMA((nbuf,)),
            ],
        )(starts, own, hbm)

    key = jax.random.PRNGKey(0)
    starts_np = _np.random.randint(
        0, (WIDTH - CC) // 128, size=(grid_n, gb, META_W)).astype(
            _np.int32) * 128
    starts_np[..., META_W - 1] = T
    starts = jnp.asarray(starts_np)
    own = jax.random.uniform(key, (grid_n * gb * OWN, 4), jnp.float32)
    hbm = jax.random.uniform(key, (4, WIDTH), jnp.float32)
    return f, (starts, own, hbm)


def best_time(f, args, reps=6):
    # block_until_ready is unreliable on the tunneled runtime; force a real
    # device->host read of one element to fence.
    float(f(*args)[0, 0])
    b = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(*args)[0, 0])
        b = min(b, time.perf_counter() - t0)
    return b


def variant(name, g_lo=78, g_hi=1248, **kw):
    f_lo, a_lo = build(g_lo, **kw)
    f_hi, a_hi = build(g_hi, **kw)
    t_lo = best_time(f_lo, a_lo)
    t_hi = best_time(f_hi, a_hi)
    gb = kw.get("gb", 4)
    per_iter = (t_hi - t_lo) / ((g_hi - g_lo) * gb * T)
    per_chunk = per_iter * T
    print(f"{name:34s}: {per_iter*1e9:7.1f} ns/iter  "
          f"{per_chunk*1e6:6.2f} us/chunk")
    return per_iter


def main():
    print(f"device: {jax.devices()[0]}  OWN={OWN} CC={CC} T={T}")
    variant("full (real kernel shape)")
    variant("no dma (buf reuse)", dma=False)
    variant("math none (dma only)", math="none")
    variant("math half (no g2 chain)", math="half")
    variant("no penalty", penalty=False)
    variant("static T", dyn_t=False)
    variant("nbuf=2", nbuf=2)
    variant("nbuf=8", nbuf=8)
    variant("gb=1", gb=1)
    variant("gb=8", gb=8)


if __name__ == "__main__":
    main()
