"""Candidate-lane accounting for the 1M row (VERDICT r2 item 7).

The 1M dam break costs 270 ns/particle/step vs 196 at 80k. Hypothesis on
trial: a few transiently-dense chunks pay far more candidate lanes than
their pair work needs, and capacity-bounded chunk splitting would fix it.
This probe measures, from a real-chip snapshot of the collapse:

  paid lanes      — what the plan streams (dedup_q quantization emulated
                    exactly on the host: QSHIFT start grid, SEG length
                    rounding, MAX_SEG cap);
  exact lanes     — sum of un-quantized window widths (the floor for ANY
                    plan of this 9-window family at this chunk size);
  true pair lanes — candidates within h of at least one own particle
                    (the physics floor, chunking aside);
  split ceiling   — exact lanes at half/quarter chunk size (OWN 32 / 16):
                    the MOST a capacity-bounded chunk split could save on
                    pair streaming, before its own per-chunk overhead.

Positions are sampled post-step (the plan builds from predicted positions;
the difference is < one cell row — same caveat as occupancy_1m.py).

    python benchmarks/probe_1m_lanes.py --n 1000000 --steps 60

Prints one JSON document.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("PBF_MAXLANES", "49152")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def window_lanes(sorted_cid, n_pad, w, ncells, own, seg, qshift, max_seg):
    """Host replica of build_plan's window construction for chunk size
    `own`. Returns (paid_lanes, exact_lanes, nsegs) per chunk."""
    num_chunks = n_pad // own
    chunk_cid = sorted_cid[: num_chunks * own].reshape(num_chunks, own)
    c_first = chunk_cid[:, 0].astype(np.int64)
    real = np.where(chunk_cid < ncells, chunk_cid, -1)
    c_last = real.max(axis=1)

    offsets = np.array([dz * w * w + dy * w
                        for dz in (-1, 0, 1) for dy in (-1, 0, 1)], np.int64)
    lo_cell = np.clip(c_first[:, None] + offsets[None, :] - 1, 0, ncells)
    hi_cell = np.clip(c_last[:, None] + offsets[None, :] + 1, -1, ncells - 1)

    counts = np.bincount(sorted_cid[sorted_cid < ncells], minlength=ncells)
    cell_starts = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)

    start = cell_starts[lo_cell]
    end = cell_starts[hi_cell + 1]
    is_pad = c_first >= ncells

    exact = np.where(end > start, end - start, 0)
    exact[is_pad] = 0
    exact_lanes = exact.sum(axis=1)

    # dedup_q emulation: carry = previous window's quantized end
    carry = np.zeros(num_chunks, np.int64)
    segs = np.zeros(num_chunks, np.int64)
    for wdx in range(9):
        s2 = np.maximum(start[:, wdx], carry)
        qs = np.maximum((s2 // qshift) * qshift, carry)
        ln = np.where(end[:, wdx] > s2,
                      -(-(end[:, wdx] - qs) // seg) * seg, 0)
        carry = qs + ln
        segs += ln // seg
    segs[is_pad] = 0
    nsegs = np.minimum(segs, max_seg)
    return nsegs * seg, exact_lanes, nsegs


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--chunk", type=int, default=20)
    args = ap.parse_args(argv)

    import pdb_sph_tpu as pbf
    from pdb_sph_tpu.core.step import make_rollout
    from pdb_sph_tpu.ops import pallas_pbf
    from pdb_sph_tpu.utils.platform import auto_backend, \
        enable_compilation_cache

    enable_compilation_cache()
    wall = round(2.0 * (args.n / 80_000.0) ** (1.0 / 3.0), 2)
    cfg = pbf.default_config(
        n=args.n, wall=wall,
        grid_width=max(40, int(np.ceil(wall * 1.25 / 0.2))),
        max_occupied_cells=4096, cell_capacity=256)
    state = pbf.spawn(cfg, "dam_break", seed=0)
    roll = make_rollout(cfg, backend=auto_backend(), unroll_steps=args.chunk)
    for _ in range(args.steps // args.chunk):
        state = roll(state)
    x = np.asarray(state.x)
    assert np.isfinite(x).all()
    print(f"[probe_1m_lanes] snapshot at step {int(state.step)}",
          file=sys.stderr, flush=True)

    w = cfg.nb_grid_width
    ncells = cfg.num_nb_cells
    ijk = np.clip((x / cfg.nb_cell).astype(np.int64), 0, w - 1)
    cid = ijk[:, 0] + w * ijk[:, 1] + (w * w) * ijk[:, 2]
    n_pad = pallas_pbf.pad_to_chunks(cfg, cfg.n)
    cid_pad = np.concatenate(
        [cid, np.full(n_pad - cfg.n, ncells, np.int64)])
    order = np.argsort(cid_pad, kind="stable")
    sorted_cid = cid_pad[order]

    seg, qshift = cfg.geom.seg, cfg.geom.qshift
    max_seg = cfg.geom.max_seg
    out = {"config": {"n": args.n, "steps": args.steps, "wall": wall,
                      "SEG": seg, "QSHIFT": qshift, "MAX_SEG": max_seg,
                      "PBF_MAXLANES": os.environ["PBF_MAXLANES"]}}

    for own in (cfg.geom.own, cfg.geom.own // 2, cfg.geom.own // 4):
        paid, exact, nsegs = window_lanes(
            sorted_cid, n_pad, w, ncells, own, seg, qshift, max_seg)
        blocks = -(-nsegs // cfg.geom.spb_d)
        # per-own-particle cost scales with blocks/chunk / own
        out[f"own_{own}"] = {
            "chunks": int(len(paid)),
            "paid_lanes_total": int(paid.sum()),
            "exact_lanes_total": int(exact.sum()),
            "quantization_waste_pct": round(
                100.0 * (1 - exact.sum() / max(paid.sum(), 1)), 1),
            "blocks_mean": round(float(blocks.mean()), 2),
            "blocks_max": int(blocks.max()),
            "truncated_chunks": int((nsegs >= max_seg).sum()),
        }

    # physics floor on the worst chunks (exact pair candidates within h):
    # sample the 8 densest chunks at the production OWN
    own = cfg.geom.own
    paid, exact, _ = window_lanes(
        sorted_cid, n_pad, w, ncells, own, seg, qshift, max_seg)
    idx = order[: (n_pad // own) * own]
    xs = x[idx.clip(0, cfg.n - 1)].copy()
    xs[idx >= cfg.n] = 1e9                   # pad slots inert
    xs = xs.reshape(-1, own, 3)
    worst = np.argsort(paid)[-8:]
    h2 = cfg.h2
    floors = []
    for c in worst:
        own_pts = xs[c]                      # (own, 3)
        # against ALL particles (the floor must not depend on sort order)
        d2 = ((own_pts[:, None, :] - x[None, :, :]) ** 2).sum(-1)
        floors.append(int((d2 < h2).any(axis=0).sum()))
    out["worst8_chunks"] = {
        "paid_lanes": paid[worst].tolist(),
        "exact_lanes": exact[worst].tolist(),
        "true_pair_lanes": floors,
    }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
