"""Fused Pallas TPU kernels for the two hot PBF loops.

TPU-native replacement for `computeDensity` (src/FluidSimulator.cu:222-284)
and `projectDensityConstraint` (:286-343). The design exploits the counting
sort instead of translating the CUDA cell loops:

  * Each program owns OWN=128 *consecutive cell-sorted* particles — 100%
    lane fill by construction (a cell-centric table wastes lanes on
    under-full cells).
  * Because cell ids are x-fastest (id = cx + W*cy + W^2*cz) and particles
    are sorted by id, the 27-cell stencil of the own chunk's cell span
    [c_first, c_last] collapses into NINE CONTIGUOUS RANGES of the sorted
    particle array — one per (dy, dz) — each [c_first-1+off, c_last+1+off]
    in cell-id space. Candidate gathering is therefore *streaming*, not
    random access: the kernel DMAs 256-wide candidate chunks from HBM with
    double buffering and computes dense (128 x 256) pair blocks on the VPU,
    with lane-dim reductions done as (128,256)@(256,1) MXU matmuls.
  * Out-of-grid stencil offsets are NOT special-cased: a wrapped cell-id
    window lands >= (W-3) cells away in y or z, which is farther than any
    particle pair can be (the box is 2 of 8 domain units wide), so the
    rd2 < h^2 mask kills every false candidate — the same masking argument
    the reference's unclamped hash relies on (SURVEY.md section 3, quirks
    3/5), but made correct by construction.
  * Ranges are made disjoint in prep (ascending offsets, cumulative max),
    so no pair is ever double counted even when a sparse own chunk spans
    more than one grid row.

Positions travel as a (4, n_pad + CC) array: rows x, y, z, lambda — one DMA
per candidate chunk fetches geometry and lambda together.

The constraint iterations ping-pong this p4 array between the two kernels
with no scatters or gathers; the final positions are a slice.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SimConfig
from . import smoothing

# Block geometry, env-overridable for autotuning sweeps (see bench_sweep.py).
# OWN trades candidate-window sharing (pairs/own ~ 9*(OWN + 3*occ) / OWN
# shrinks with smaller OWN) against per-chunk control overhead; CC trades
# ceil-to-chunk lane waste against DMA/loop frequency.
OWN = int(os.environ.get("PBF_OWN", "128"))   # own-chunk size (accum rows)
CC = int(os.environ.get("PBF_CC", "512"))     # candidate-chunk lane width
NBUF = int(os.environ.get("PBF_NBUF", "4"))   # DMA pipeline depth: the 4 KiB
                                              # candidate copies are latency-
                                              # bound, so keep several in flight
GB = int(os.environ.get("PBF_GB", "4"))       # own-chunks per grid step: the
                                              # Mosaic pipeline costs ~1.6 us
                                              # per grid step regardless of
                                              # work, so batch chunks to
                                              # amortize it
MAX_T = 36864 // CC   # max candidate chunks per own chunk
META_W = -(-(MAX_T + 1) // 128) * 128   # SMEM chunk-table width; last lane = T
# Padding position for pad/margin slots: far enough outside the domain that
# rd2 >= h^2 against any real particle (so the min-clamp kills the pair), but
# MODEST in magnitude: the project kernel accumulates s * c_x per lane, where
# a clamped dead lane can leave s ~ 1 ulp^2 (rsqrt rounding at r == h). With
# a 1e9 sentinel that residual times the coordinate became a visible uniform
# drift (~2e-5 per step); at -100 it is ~1e-13.
SENTINEL = -100.0


class WindowPlan(NamedTuple):
    """Per-step candidate plan (built once from the frozen sort)."""

    chunk_start: jax.Array  # (num_chunks, 1, META_W) i32, 128-aligned DMA
                            # offsets; last lane = T (active chunk count)
    chunk_lo: jax.Array     # (num_chunks, 1, META_W) i32, first valid lane
    chunk_hi: jax.Array     # (num_chunks, 1, META_W) i32, end valid lane
    n_overflow: jax.Array   # () i32 candidate truncations (MAX_T exceeded)


def pad_to_chunks(n: int) -> int:
    return -(-n // (OWN * GB)) * (OWN * GB)


# ---------------------------------------------------------------------------
# prep (XLA): sorted cell ids -> 9 disjoint windows -> flat chunk table
# ---------------------------------------------------------------------------

def build_plan(cfg: SimConfig, sorted_cid: jax.Array) -> WindowPlan:
    """sorted_cid: (n_pad,) int32, padding entries = num_nb_cells (beyond any
    real cell). Returns the per-own-chunk DMA plan."""
    n_pad = sorted_cid.shape[0]
    num_chunks = n_pad // OWN
    w = cfg.nb_grid_width

    c_first = sorted_cid[0::OWN][:num_chunks]                   # (num_chunks,)
    c_last = sorted_cid[OWN - 1::OWN][:num_chunks]
    # A mixed chunk (real head, padding/parked tail) must plan its windows
    # from its real span: an unclamped padding c_last (== num_nb_cells) would
    # stretch every window across the entire inactive block. Because padding
    # sorts last, clamping to the last real cell keeps windows tight, and the
    # searchsorted below then naturally excludes all cid >= num_nb_cells.
    c_last = jnp.minimum(c_last, jnp.int32(cfg.num_nb_cells - 1))

    # ascending (dy, dz) offsets in cell-id space
    offsets = jnp.array(
        [dz * w * w + dy * w for dz in (-1, 0, 1) for dy in (-1, 0, 1)],
        jnp.int32,
    )  # already ascending: -W^2-W, -W^2, -W^2+W, -W, 0, W, W^2-W, W^2, W^2+W

    lo_cell = c_first[:, None] + offsets[None, :] - 1           # (num_chunks, 9)
    hi_cell = c_last[:, None] + offsets[None, :] + 1
    lo_cell = jnp.clip(lo_cell, 0, cfg.num_nb_cells)
    # cap at the last REAL cell id: hi_cell + 1 feeds searchsorted, and a cap
    # of num_nb_cells would re-admit every padding/parked entry to the window
    hi_cell = jnp.clip(hi_cell, -1, cfg.num_nb_cells - 1)

    start = jnp.searchsorted(sorted_cid, lo_cell.reshape(-1), side="left")
    end = jnp.searchsorted(sorted_cid, hi_cell.reshape(-1) + 1, side="left")
    start = start.reshape(num_chunks, 9).astype(jnp.int32)
    end = end.reshape(num_chunks, 9).astype(jnp.int32)

    # make windows disjoint (dedup when a sparse chunk spans a whole grid row)
    def dedup(carry, se):
        s, e = se
        s = jnp.maximum(s, carry)
        e = jnp.maximum(e, s)
        return e, (s, e)

    # carry derives from `start` (not a fresh zeros) so its varying-axes type
    # matches inside shard_map
    _, (start_d, end_d) = jax.lax.scan(
        dedup, jnp.zeros_like(start[:, 0]), (start.T, end.T)
    )
    start, end = start_d.T, end_d.T
    length = end - start                                         # (num_chunks, 9)

    # Mosaic requires 128-aligned lane slices: round each window's DMA base
    # down to a multiple of 128 and mask the extra head lanes per chunk.
    base = (start // 128) * 128
    span = end - base
    k = jnp.where(length > 0, -(-span // CC), 0)                 # chunks per window
    cum = jnp.cumsum(k, axis=1)                                  # (num_chunks, 9)
    total = cum[:, -1]
    # Chunks made purely of padding / parked-inactive entries (cell id >=
    # num_nb_cells) get no candidates at all: their physics is meaningless
    # and their windows would otherwise span the entire inactive block
    # (large in the sharded path), wasting lanes and faking overflow.
    is_pad = c_first >= jnp.int32(cfg.num_nb_cells)
    total = jnp.where(is_pad, 0, total)
    n_overflow = jnp.sum(jnp.maximum(total - MAX_T, 0) * CC).astype(jnp.int32)
    total = jnp.minimum(total, MAX_T)

    slots = jnp.arange(MAX_T, dtype=jnp.int32)                   # (MAX_T,)
    # window index of each slot: number of windows fully consumed before it
    r = jnp.sum(slots[None, None, :] >= cum[:, :, None], axis=1)  # (num_chunks, MAX_T)
    r = jnp.minimum(r, 8)
    cum0 = jnp.concatenate([jnp.zeros((num_chunks, 1), jnp.int32), cum], axis=1)
    o = slots[None, :] - jnp.take_along_axis(cum0, r, axis=1)
    valid = slots[None, :] < total[:, None]

    c_start = jnp.take_along_axis(base, r, axis=1) + o * CC      # 128-aligned
    c_lo = jnp.clip(jnp.take_along_axis(start, r, axis=1) - c_start, 0, CC)
    c_hi = jnp.clip(jnp.take_along_axis(end, r, axis=1) - c_start, 0, CC)
    c_start = jnp.where(valid, c_start, 0)
    c_lo = jnp.where(valid, c_lo, 0)
    c_hi = jnp.where(valid, c_hi, 0)

    def meta(arr, tail=None):
        pad = jnp.zeros((num_chunks, META_W - MAX_T), jnp.int32)
        out = jnp.concatenate([arr, pad], axis=1)
        if tail is not None:
            out = out.at[:, META_W - 1].set(tail)
        return out[:, None, :]

    return WindowPlan(
        chunk_start=meta(c_start, total),
        chunk_lo=meta(c_lo),
        chunk_hi=meta(c_hi),
        n_overflow=n_overflow,
    )


def _p4_from_pT(pT: jax.Array, width: int) -> jax.Array:
    """(n_pad, 4) own-layout -> (4, width) candidate layout, sentinel margin.

    One fused XLA transpose per solver pass (~MBs of HBM traffic) buys
    zero in-kernel relayouts: a (1, OWN) -> (OWN, 1) transpose inside the
    kernel costs ~300 ns on the VPU, and the kernels needed four per chunk.
    """
    n_pad = pT.shape[0]
    p4 = jnp.full((4, width), SENTINEL, jnp.float32)
    p4 = p4.at[:, :n_pad].set(pT.T)
    p4 = p4.at[3, n_pad:].set(0.0)
    return p4


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _pair_loop(cfg, starts_ref, lo_ref, hi_ref, hbm_ref, buf, sem,
               compute_chunk, init, g: int = 0):
    """Shared double-buffered candidate streaming loop for own-chunk g.

    compute_chunk(cand4, penalty, acc) -> acc, where cand4 is (4, CC) and
    penalty is (1, CC) f32: 0 on valid lanes, h^2 on lanes outside [lo, hi).
    Adding it into rd2 before the min-with-h^2 clamp kills invalid lanes for
    free — both kernels' terms vanish at rd2 == h^2 — so no per-lane mask
    multiplies survive in the (OWN, CC) pair math.
    """
    total = starts_ref[0, g, META_W - 1]
    h2 = jnp.float32(cfg.h2)

    def issue(slot, t):
        start = pl.multiple_of(starts_ref[0, g, t], 128)
        return pltpu.make_async_copy(
            hbm_ref.at[:, pl.ds(start, CC)], buf.at[slot], sem.at[slot]
        )

    # NBUF-deep prologue: the copies are ~4 KiB, so completion is dominated
    # by DMA latency, not bandwidth — keep several in flight to hide it
    # behind the ~300 ns of pair math per chunk.
    for k in range(NBUF - 1):
        @pl.when(k < total)
        def _(k=k):
            issue(k, k).start()

    def body(t, acc):
        slot = jax.lax.rem(t, NBUF)

        @pl.when(t + NBUF - 1 < total)
        def _():
            issue(jax.lax.rem(t + NBUF - 1, NBUF), t + NBUF - 1).start()

        issue(slot, t).wait()
        lo = lo_ref[0, g, t]
        hi = hi_ref[0, g, t]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, CC), 1)
        # 1e-16 (not 0) on valid lanes: the self pair lands at rd2 == 1e-16
        # instead of 0, so rd2 * rsqrt(rd2) stays finite with no extra
        # max() in the (OWN, CC) block math
        penalty = jnp.where((lane >= lo) & (lane < hi),
                            jnp.float32(1e-16), h2)
        return compute_chunk(buf[slot], penalty, acc)

    return jax.lax.fori_loop(0, total, body, init)


def _density_kernel(cfg: SimConfig, starts_ref, lo_ref, hi_ref, own_ref,
                    hbm_ref, lam_ref, buf, sem):
    h = jnp.float32(cfg.h)
    h2 = jnp.float32(cfg.h2)
    l2 = jnp.float32(cfg.lambda_grad_coeff * cfg.lambda_grad_coeff)

    # Select-free formulation, algebraically identical to
    # smoothing.density_terms (the pallas<->cell parity tests enforce it):
    # the penalty add + min-at-h^2 clamp zero both t and (h - rd) for dead
    # and invalid lanes, and the constant scales (poly6 norm, the squared
    # lambda gradient coefficient) are applied once after the stream loop.
    # r is rd2 * rsqrt(rd2): sqrt costs ~2x rsqrt+mul on the VPU, and the
    # tiny-clamp keeps the self pair (rd2 == 0) finite with u ~ h.
    for g in range(GB):
        sl = slice(g * OWN, (g + 1) * OWN)
        ox = own_ref[sl, 0:1]                 # (OWN, 1) — no relayout: the
        oy = own_ref[sl, 1:2]                 # own side rides in transposed
        oz = own_ref[sl, 2:3]                 # (n_pad, 4) layout

        def compute(cand, penalty, acc, ox=ox, oy=oy, oz=oz):
            rho_b, g2_b = acc
            dx = ox - cand[0:1, :]            # (OWN, CC)
            dy = oy - cand[1:2, :]
            dz = oz - cand[2:3, :]
            rd2 = jnp.minimum(dx * dx + dy * dy + (dz * dz + penalty), h2)
            t = h2 - rd2
            u = h - rd2 * jax.lax.rsqrt(rd2)
            t2 = t * t
            u2 = u * u
            return rho_b + t2 * t, g2_b + (u2 * u2) * rd2

        zero = jnp.zeros((OWN, CC), jnp.float32)
        rho_b, g2_b = _pair_loop(cfg, starts_ref, lo_ref, hi_ref, hbm_ref,
                                 buf, sem, compute, (zero, zero), g=g)
        rho = jnp.float32(cfg.poly6_coeff) * jnp.sum(rho_b, axis=1,
                                                     keepdims=True)
        g2 = l2 * jnp.sum(g2_b, axis=1, keepdims=True)
        lam_ref[sl, :] = smoothing.lambda_from_sums(cfg, rho, g2)


def _project_kernel(cfg: SimConfig, starts_ref, lo_ref, hi_ref, own_ref,
                    hbm_ref, out_ref, buf, sem):
    h = jnp.float32(cfg.h)
    h2 = jnp.float32(cfg.h2)
    k_proj = jnp.float32(-cfg.spiky_grad_coeff * cfg.inv_rho0)
    s_corr = jnp.float32(cfg.s_corr)

    # Same select-free scheme as the density kernel. The self pair gets a
    # nonzero s but cancels exactly in p_i*sum(s) - sum(s*p_j), identical to
    # smoothing.delta_p_scale's behavior (s * r with r = 0). Invalid lanes
    # have u == 0 via the penalty clamp, so s == 0 and the s * c
    # accumulations stay finite even against sentinel positions.
    for g in range(GB):
        sl = slice(g * OWN, (g + 1) * OWN)
        ox = own_ref[sl, 0:1]                 # (OWN, 1), transposed layout
        oy = own_ref[sl, 1:2]
        oz = own_ref[sl, 2:3]
        olam = own_ref[sl, 3:4]

        def compute(cand, penalty, acc, ox=ox, oy=oy, oz=oz, olam=olam):
            dpx_b, dpy_b, dpz_b = acc
            clam = cand[3:4, :] + s_corr            # (1, CC)
            dx = ox - cand[0:1, :]
            dy = oy - cand[1:2, :]
            dz = oz - cand[2:3, :]
            rd2 = jnp.minimum(dx * dx + dy * dy + (dz * dz + penalty), h2)
            u = h - rd2 * jax.lax.rsqrt(rd2)
            s = (u * u) * (olam + clam)             # (OWN, CC)
            # dp accumulates s * (p_i - p_j) directly: the deltas are already
            # in registers for rd2, and the self pair contributes s * 0
            return dpx_b + s * dx, dpy_b + s * dy, dpz_b + s * dz

        zero = jnp.zeros((OWN, CC), jnp.float32)
        dpx_b, dpy_b, dpz_b = _pair_loop(
            cfg, starts_ref, lo_ref, hi_ref, hbm_ref, buf, sem, compute,
            (zero, zero, zero), g=g,
        )
        ksum = functools.partial(jnp.sum, axis=1, keepdims=True)
        out_ref[sl, 0:1] = ox + k_proj * ksum(dpx_b)
        out_ref[sl, 1:2] = oy + k_proj * ksum(dpy_b)
        out_ref[sl, 2:3] = oz + k_proj * ksum(dpz_b)
        out_ref[sl, 3:4] = olam


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _common_specs():
    meta_spec = pl.BlockSpec((1, GB, META_W), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM)
    own_spec = pl.BlockSpec((GB * OWN, 4), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    hbm_spec = pl.BlockSpec(memory_space=pl.ANY)
    scratch = [
        pltpu.VMEM((NBUF, 4, CC), jnp.float32),
        pltpu.SemaphoreType.DMA((NBUF,)),
    ]
    return meta_spec, own_spec, hbm_spec, scratch


def _meta_batched(plan: WindowPlan):
    """(num_chunks, 1, META_W) metas -> (num_chunks/GB, GB, META_W)."""
    def r(a):
        return a.reshape(a.shape[0] // GB, GB, META_W)

    return r(plan.chunk_start), r(plan.chunk_lo), r(plan.chunk_hi)


def density_pass(cfg: SimConfig, pT: jax.Array, p4: jax.Array,
                 plan: WindowPlan, interpret: bool = False) -> jax.Array:
    """(pT (n_pad, 4), p4 (4, width)) -> lambda (n_pad, 1)."""
    n_pad = pT.shape[0]
    meta_spec, own_spec, hbm_spec, scratch = _common_specs()
    starts, los, his = _meta_batched(plan)
    return pl.pallas_call(
        functools.partial(_density_kernel, cfg),
        grid=(n_pad // (OWN * GB),),
        in_specs=[meta_spec, meta_spec, meta_spec, own_spec, hbm_spec],
        out_specs=pl.BlockSpec((GB * OWN, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(starts, los, his, pT, p4)


def project_pass(cfg: SimConfig, pT: jax.Array, p4: jax.Array,
                 plan: WindowPlan, interpret: bool = False) -> jax.Array:
    """(pT with lambda column, p4 with lambda row) -> new pT (n_pad, 4)."""
    n_pad = pT.shape[0]
    meta_spec, own_spec, hbm_spec, scratch = _common_specs()
    starts, los, his = _meta_batched(plan)
    return pl.pallas_call(
        functools.partial(_project_kernel, cfg),
        grid=(n_pad // (OWN * GB),),
        in_specs=[meta_spec, meta_spec, meta_spec, own_spec, hbm_spec],
        out_specs=pl.BlockSpec((GB * OWN, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 4), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(starts, los, his, pT, p4)


def solve_pallas(cfg: SimConfig, p_sorted: jax.Array, sorted_cid_pad: jax.Array,
                 interpret: bool = False) -> jax.Array:
    """The full 3-iteration Jacobi constraint solve. p_sorted (n, 3) sorted by
    cell id; sorted_cid_pad (n_pad,) with padding = num_nb_cells."""
    n = p_sorted.shape[0]
    n_pad = pad_to_chunks(n)
    width = n_pad + CC
    plan = build_plan(cfg, sorted_cid_pad)
    pT = jnp.zeros((n_pad, 4), jnp.float32)
    pT = pT.at[:n, 0:3].set(p_sorted)
    pT = pT.at[n:, 0:3].set(SENTINEL)

    def body(_, pT):
        p4 = _p4_from_pT(pT, width)
        lam = density_pass(cfg, pT, p4, plan, interpret=interpret)  # (n_pad, 1)
        pT = jax.lax.dynamic_update_slice(pT, lam, (0, 3))
        p4 = jax.lax.dynamic_update_slice(p4, lam.T, (3, 0))
        return project_pass(cfg, pT, p4, plan, interpret=interpret)

    pT = jax.lax.fori_loop(0, cfg.solver_iters, body, pT)
    return pT[:n, 0:3]
