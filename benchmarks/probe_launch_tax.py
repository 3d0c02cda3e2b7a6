"""Measure the *marginal* cost of a Mosaic kernel launch inside ONE jitted
program on the current backend, plus DMA-pipeline (NBUF) sensitivity of the
real solver. Run on the real chip:  python benchmarks/probe_launch_tax.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def _tiny_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] + 1.0


def chain(k: int):
    """Program = k chained tiny pallas_calls (data-dependent, no fusion)."""

    @jax.jit
    def f(x):
        for _ in range(k):
            x = pl.pallas_call(
                _tiny_kernel,
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            )(x)
        return x

    return f


def main():
    print("backend:", jax.devices()[0].platform, jax.devices()[0])
    x = jnp.zeros((8, 128), jnp.float32)

    ts = {}
    for k in (1, 8, 32, 64):
        ts[k] = timeit(chain(k), x)
        print(f"chain k={k:3d}: {ts[k]*1e3:8.3f} ms")
    marg = (ts[64] - ts[8]) / 56
    print(f"marginal per-launch (64 vs 8): {marg*1e6:.1f} us")
    marg2 = (ts[32] - ts[8]) / 24
    print(f"marginal per-launch (32 vs 8): {marg2*1e6:.1f} us")

    # same with XLA ops between launches (mimic solver glue)
    def chain_glue(k):
        @jax.jit
        def f(x):
            for _ in range(k):
                x = pl.pallas_call(
                    _tiny_kernel,
                    out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                )(x)
                x = x * 0.5 + 1.0
            return x

        return f

    a = timeit(chain_glue(8), x)
    b = timeit(chain_glue(32), x)
    print(f"with glue: marginal per-launch (32 vs 8): {(b-a)/24*1e6:.1f} us")


if __name__ == "__main__":
    main()
