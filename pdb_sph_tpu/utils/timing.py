"""Honest device timing.

On the axon-tunneled TPU backend, `jax.block_until_ready` alone has been
observed to return before execution completes; a device->host transfer of one
element is the reliable fence, so every timer here syncs through the host.
"""

from __future__ import annotations

import time

import numpy as np


def host_sync(tree) -> None:
    """Force completion by pulling one leaf to the host."""
    import jax

    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        np.asarray(leaves[0])


def time_fn(fn, *args, reps: int = 3, warmup: int = 1):
    """Returns (best_seconds, last_result). fn must be side-effect free."""
    result = None
    for _ in range(warmup):
        result = fn(*args)
        host_sync(result)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        result = fn(*args)
        host_sync(result)
        best = min(best, time.perf_counter() - t0)
    return best, result
