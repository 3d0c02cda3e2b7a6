"""Long-horizon mesh soak (VERDICT round 3, weak #5): the boundary-update
rule's invariants at a horizon where oscillation or drift would appear.

8 fake CPU devices, 250 steps per scene via the production rollout path
(make_sharded_rollout — which also exercises the round-4 chunk-aggregated
overflow reporting: a transient mid-chunk overflow surfaces in the chunk's
summed counters). Asserted per chunk:

  * particle conservation (sum of per-shard active == n);
  * every overflow counter zero — migration, merge, ghost, plan — SUMMED
    over all steps of the chunk, so nothing transient hides (advisor,
    round 3); mig_overflow == 0 also certifies no particle ever skipped a
    projection via the multi-hop-transit mask (sharded._solve_pallas
    docstring);
  * every slab >= 2W+2 zx-keys wide (the boundary-band ghost exchange's
    invariant, argued in sharded._update_bounds and here checked for 250
    steps of concurrent parity-alternating multi-scale moves);
  * bounded imbalance (max/mean of per-shard active);
  * finite state (per-chunk NaN diag + final collect).

Plus per scene: the boundaries actually moved (the tracker is alive, not
vacuously stable). Marked slow: ~2-6 min of shard_map scan compile + run
per scene on the fake CPU mesh.
"""

import jax
import numpy as np
import pytest

from pdb_sph_tpu import default_config, spawn
from pdb_sph_tpu.parallel import sharded

D = 8
CHUNK = 25
CHUNKS = 10  # 250 steps


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= D, "conftest must fake 8 devices"
    return sharded.make_mesh(D)


@pytest.mark.slow
@pytest.mark.parametrize("scene,imb_limit", [
    ("dam_break", 2.0),
    # blowup passes through a transient where the exploding shell leaves
    # row-granularity hotspots; the tracker recovers but the transient peak
    # is higher than the settled dam's
    ("blowup", 3.0),
])
def test_mesh_soak_invariants(mesh, scene, imb_limit):
    # h=0.05 doubles the z-row count of the box so 8 slabs of >= 2 rows
    # leave the tracker real freedom (same trick as the driver dryrun)
    cfg = default_config(n=1024, h=0.05, max_occupied_cells=2048,
                         cell_capacity=128)
    st = spawn(cfg, scene, seed=0)
    pcfg = sharded.ParallelConfig.create(cfg, D, state=st)
    roll = sharded.make_sharded_rollout(cfg, pcfg, mesh, backend="cell",
                                        unroll_steps=CHUNK)
    sst = sharded.distribute(cfg, pcfg, st, mesh)

    b_prev = np.asarray(sst.bounds)[0, 1:].copy()
    moves = 0
    imbalances = []
    for c in range(CHUNKS):
        sst, stats, diag = roll(sst)
        stats = np.asarray(stats)
        diag = np.asarray(diag)

        act = stats[:, 0].astype(np.float64)
        assert stats[:, 0].sum() == cfg.n, (
            f"chunk {c}: particles lost/duplicated: {act.tolist()}")
        assert stats[:, 1:].sum() == 0, (
            f"chunk {c}: overflow counters fired "
            f"(mig/merge/ghost/plan summed over {CHUNK} steps): {stats}")
        assert diag[:, 2].sum() == 0, f"chunk {c}: NaN detected"

        b = np.asarray(sst.bounds)[0, 1:]
        assert (np.diff(b) >= sharded._min_slab_keys(cfg)).all(), (
            f"chunk {c}: slab under the 2W+2-key minimum: {b.tolist()}")
        assert b[0] == 0 and b[-1] == cfg.nb_grid_width ** 2
        # every shard's replicated bounds row must agree
        rows = np.asarray(sst.bounds)[:, 1:]
        assert (rows == rows[0]).all(), "bounds rows diverged across shards"

        moves += int((b != b_prev).sum())
        b_prev = b.copy()
        imbalances.append(act.max() / act.mean())

    # the tracker is alive: the fluid front moved, so boundaries followed
    assert moves >= 2, f"boundaries never tracked the fluid (moves={moves})"
    # imbalance bounded over the whole horizon once the tracker has had one
    # chunk to adapt (chunk 0 includes the spawn transient)
    worst = max(imbalances[1:])
    assert worst <= imb_limit, (
        f"imbalance exceeded {imb_limit}: per-chunk max/mean = "
        f"{[round(i, 2) for i in imbalances]}")

    got = sharded.collect(sst)
    xs = np.asarray(got.x)
    assert np.isfinite(xs).all()
    assert (xs > -0.25).all() and (xs < cfg.wall + 0.25).all()
