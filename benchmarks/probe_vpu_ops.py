"""Microbench: VPU op slot costs and whether mul+add fuses into an FMA.

Each grid step accumulates into the output block (revisiting), so no grid
step can be elided; the K-deep op chain inside a step is made of
independent-ish streams to expose ILP like the real kernel's block math.
"""

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

R, C = 128, 512
K = 48
REPS = 100


def make(body, nstreams=4):
    def kernel(x_ref, a_ref, b_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        a = a_ref[...]
        b = b_ref[...]
        # nstreams independent chains of K/nstreams dependent ops each
        xs = [x_ref[...] * (1.0 + 1e-7 * (s + 1)) for s in range(nstreams)]
        for _ in range(K // nstreams):
            xs = [body(x, a, b) for x in xs]
        acc = xs[0]
        for x in xs[1:]:
            acc = acc + x
        o_ref[...] += acc

    @jax.jit
    def f(x, a, b):
        return pl.pallas_call(
            kernel,
            grid=(REPS,),
            in_specs=[pl.BlockSpec((R, C), lambda i: (0, 0))] * 3,
            out_specs=pl.BlockSpec((R, C), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
        )(x, a, b)

    return f


def bench(name, body, base=None):
    f = make(body)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (R, C), jnp.float32) * 1e-3 + 0.5
    a = jnp.full((R, C), 0.99999, jnp.float32)
    b = jnp.full((R, C), 1e-7, jnp.float32)
    jax.block_until_ready(f(x, a, b))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x, a, b))
        best = min(best, time.perf_counter() - t0)
    per_op = best / (REPS * K)
    extra = f"   (+{(per_op-base)*1e9:5.2f} vs mul)" if base else ""
    print(f"{name:20s}: {per_op*1e9:7.2f} ns per (128,512) op{extra}")
    return per_op


def main():
    print("device:", jax.devices()[0])
    mul = bench("mul", lambda x, a, b: x * a)
    bench("add", lambda x, a, b: x + b)
    bench("mul+add (fma?)", lambda x, a, b: x * a + b, mul)
    bench("fma+fma", lambda x, a, b: (x * a + b) * a + b, mul)
    bench("min(mul)", lambda x, a, b: jnp.minimum(x * a, 2.0), mul)
    bench("rsqrt", lambda x, a, b: jax.lax.rsqrt(x + b), mul)
    bench("rsqrt*x", lambda x, a, b: x * jax.lax.rsqrt(x + b), mul)
    bench("bcast (1,C) add", lambda x, a, b: x + b[0:1, :], mul)
    bench("bcast (R,1) mul", lambda x, a, b: x * a[:, 0:1], mul)


if __name__ == "__main__":
    main()
