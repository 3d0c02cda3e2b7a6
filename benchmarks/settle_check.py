"""Long-horizon physics regression check on real hardware.

THE indispensable check for numerical-precision bugs in the device
kernels: CPU-interpret parity tests compute everything in f32 and CANNOT
see TPU-only precision hazards (the canonical example: a dot_general at
the TPU-default matmul precision is a single bf16 pass, which left rd2
errors of 4.7e-2 and kept the fluid "thermally" agitated forever —
docs/PERF.md). Run after any kernel change:

    python benchmarks/settle_check.py            # ~8 min on one v5e

Pass criteria (8k dam break, 2000 steps): mean EXACT all-pairs density
(the dense oracle — measurement independent of any neighbor-table capacity)
within 5% of rho0, max speed below 0.5, nothing escaped, no plan overflow.
The settled 8k dam genuinely rests ~3.6% OVER rho0 (hydrostatic
compression at 3 Jacobi iterations; dense mean 6606 measured on hardware) —
an earlier 2%-band version of this check only passed because the
diagnostic cell table's dropped particles read back rho=0 and biased the
mean down. The sharp precision-bug signal is maxv: the bf16-rd2 bug kept
the fluid "thermally" agitated (maxv >> 0.5) forever.
"""

import functools
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

import pdb_sph_tpu as pbf
from pdb_sph_tpu.core.step import diagnostics_fn, make_rollout
from pdb_sph_tpu.ops import dense


def main() -> int:
    cfg = pbf.default_config(n=8192)
    diag = jax.jit(functools.partial(diagnostics_fn, cfg))
    s = pbf.spawn(cfg, "dam_break", seed=0)
    ro = make_rollout(cfg, backend="pallas", unroll_steps=100)
    for _ in range(20):
        s = ro(s)
    d = diag(s)
    rho = float(np.mean(np.asarray(dense.density_dense(cfg, s.x))))
    maxv = float(d.max_speed)
    esc = int(d.n_escaped)
    ovf = int(d.plan_overflow)
    nan = bool(d.nan_detected)
    ok = (abs(rho / cfg.rho0 - 1.0) < 0.05 and maxv < 0.5 and esc == 0
          and ovf == 0 and not nan)
    print(f"step {int(s.step)}: mean_rho {rho:.0f} (rho0 {cfg.rho0:.0f}) "
          f"maxv {maxv:.3f} escaped {esc} plan_overflow {ovf} nan {nan}")
    print("SETTLE CHECK:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
