"""Driver benchmark: 80k-particle dam break, steps/sec on real hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference README claims 60 fps at 80k particles on a GTX 1650
(README.md:9), i.e. 4.8M particle-steps/s; vs_baseline is the ratio of this
run's particle-steps/s to that number.
"""

import json
import sys
import time

import numpy as np


def main() -> int:
    import jax

    import pdb_sph_tpu as pbf
    from pdb_sph_tpu.core.step import make_rollout
    from pdb_sph_tpu.utils.timing import host_sync

    n = 80_000
    cfg = pbf.default_config(n=n)
    state = pbf.spawn(cfg, "dam_break", seed=0)

    from pdb_sph_tpu.utils.platform import auto_backend

    backend = auto_backend()
    # 60 steps per device call: the tunneled TPU backend has ~30-60 ms of
    # fixed per-call latency, so amortize it below 1 ms/step
    chunk = 60
    rollout = make_rollout(cfg, backend=backend, unroll_steps=chunk)

    # settle past the initial collapse transient + compile
    state = rollout(state)
    host_sync(state)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state = rollout(state)
        host_sync(state)
        best = min(best, time.perf_counter() - t0)

    x = np.asarray(state.x)
    if not np.isfinite(x).all():
        print(json.dumps({"metric": "error", "value": 0,
                          "unit": "non-finite state", "vs_baseline": 0}))
        return 1

    steps_per_sec = chunk / best
    particle_steps = steps_per_sec * n
    print(json.dumps({
        "metric": "particle_steps_per_sec_80k_dam_break",
        "value": round(particle_steps, 1),
        "unit": "particle-steps/s",
        "vs_baseline": round(particle_steps / 4.8e6, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
