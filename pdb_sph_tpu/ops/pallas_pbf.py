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
CC = int(os.environ.get("PBF_CC", "256"))     # candidate-chunk lane width
MAX_T = 36864 // CC   # max candidate chunks per own chunk
META_W = -(-(MAX_T + 1) // 128) * 128   # SMEM chunk-table width; last lane = T
SENTINEL = 1.0e9   # padding position: rd2 overflows any h^2 test


class WindowPlan(NamedTuple):
    """Per-step candidate plan (built once from the frozen sort)."""

    chunk_start: jax.Array  # (num_chunks, 1, META_W) i32, 128-aligned DMA
                            # offsets; last lane = T (active chunk count)
    chunk_lo: jax.Array     # (num_chunks, 1, META_W) i32, first valid lane
    chunk_hi: jax.Array     # (num_chunks, 1, META_W) i32, end valid lane
    n_overflow: jax.Array   # () i32 candidate truncations (MAX_T exceeded)


def pad_to_chunks(n: int) -> int:
    return -(-n // OWN) * OWN


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

    # ascending (dy, dz) offsets in cell-id space
    offsets = jnp.array(
        [dz * w * w + dy * w for dz in (-1, 0, 1) for dy in (-1, 0, 1)],
        jnp.int32,
    )  # already ascending: -W^2-W, -W^2, -W^2+W, -W, 0, W, W^2-W, W^2, W^2+W

    lo_cell = c_first[:, None] + offsets[None, :] - 1           # (num_chunks, 9)
    hi_cell = c_last[:, None] + offsets[None, :] + 1
    lo_cell = jnp.clip(lo_cell, 0, cfg.num_nb_cells)
    hi_cell = jnp.clip(hi_cell, -1, cfg.num_nb_cells)

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

    _, (start_d, end_d) = jax.lax.scan(
        dedup, jnp.zeros((num_chunks,), jnp.int32), (start.T, end.T)
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


def build_p4(p_sorted: jax.Array, n_pad: int) -> jax.Array:
    """(n, 3) sorted positions -> (4, n_pad + CC) [x, y, z, lambda=0] with
    sentinel padding."""
    n = p_sorted.shape[0]
    width = n_pad + CC
    p4 = jnp.full((4, width), SENTINEL, jnp.float32)
    p4 = p4.at[0:3, :n].set(p_sorted.T)
    p4 = p4.at[3, :].set(0.0)
    return p4


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _pair_loop(cfg, starts_ref, lo_ref, hi_ref, hbm_ref, buf, sem,
               compute_chunk, init):
    """Shared double-buffered candidate streaming loop.

    compute_chunk(cand4, penalty, acc) -> acc, where cand4 is (4, CC) and
    penalty is (1, CC) f32: 0 on valid lanes, h^2 on lanes outside [lo, hi).
    Adding it into rd2 before the min-with-h^2 clamp kills invalid lanes for
    free — both kernels' terms vanish at rd2 == h^2 — so no per-lane mask
    multiplies survive in the (OWN, CC) pair math.
    """
    total = starts_ref[0, 0, META_W - 1]
    h2 = jnp.float32(cfg.h2)

    def issue(slot, t):
        start = pl.multiple_of(starts_ref[0, 0, t], 128)
        return pltpu.make_async_copy(
            hbm_ref.at[:, pl.ds(start, CC)], buf.at[slot], sem.at[slot]
        )

    @pl.when(total > 0)
    def _():
        issue(0, 0).start()

    def body(t, acc):
        slot = jax.lax.rem(t, 2)

        @pl.when(t + 1 < total)
        def _():
            issue(1 - slot, t + 1).start()

        issue(slot, t).wait()
        lo = lo_ref[0, 0, t]
        hi = hi_ref[0, 0, t]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, CC), 1)
        penalty = jnp.where((lane >= lo) & (lane < hi), 0.0, h2)
        return compute_chunk(buf[slot], penalty, acc)

    return jax.lax.fori_loop(0, total, body, init)


def _density_kernel(cfg: SimConfig, starts_ref, lo_ref, hi_ref, own_ref,
                    hbm_ref, lam_ref, buf, sem):
    ox = jnp.transpose(own_ref[0:1, :])       # (OWN, 1)
    oy = jnp.transpose(own_ref[1:2, :])
    oz = jnp.transpose(own_ref[2:3, :])
    h = jnp.float32(cfg.h)
    h2 = jnp.float32(cfg.h2)

    # Select-free formulation, algebraically identical to
    # smoothing.density_terms (the pallas<->cell parity tests enforce it):
    # the penalty add + min-at-h^2 clamp zero both t and (h - rd) for dead
    # and invalid lanes, and the constant scales (poly6 norm, the squared
    # lambda gradient coefficient) are applied once after the stream loop —
    # the inner block math is 12 VPU ops per (OWN, CC) pair block.
    def compute(cand, penalty, acc):
        rho_b, g2_b = acc
        dx = ox - cand[0:1, :]                # (OWN, CC)
        dy = oy - cand[1:2, :]
        dz = oz - cand[2:3, :]
        rd2 = jnp.minimum(dx * dx + dy * dy + (dz * dz + penalty), h2)
        t = h2 - rd2
        u = h - jnp.sqrt(rd2)
        t2 = t * t
        u2 = u * u
        return rho_b + t2 * t, g2_b + (u2 * u2) * rd2

    zero = jnp.zeros((OWN, CC), jnp.float32)
    rho_b, g2_b = _pair_loop(cfg, starts_ref, lo_ref, hi_ref, hbm_ref, buf,
                             sem, compute, (zero, zero))
    rho = jnp.float32(cfg.poly6_coeff) * jnp.sum(rho_b, axis=1, keepdims=True)
    l2 = jnp.float32(cfg.lambda_grad_coeff * cfg.lambda_grad_coeff)
    g2 = l2 * jnp.sum(g2_b, axis=1, keepdims=True)
    lam = smoothing.lambda_from_sums(cfg, rho, g2)
    lam_ref[0:1, :] = jnp.transpose(lam)


def _project_kernel(cfg: SimConfig, starts_ref, lo_ref, hi_ref, own_ref,
                    hbm_ref, out_ref, buf, sem):
    ox = jnp.transpose(own_ref[0:1, :])       # (OWN, 1)
    oy = jnp.transpose(own_ref[1:2, :])
    oz = jnp.transpose(own_ref[2:3, :])
    olam = jnp.transpose(own_ref[3:4, :])
    h = jnp.float32(cfg.h)
    h2 = jnp.float32(cfg.h2)
    k_proj = jnp.float32(-cfg.spiky_grad_coeff * cfg.inv_rho0)
    s_corr = jnp.float32(cfg.s_corr)

    # Same select-free scheme as the density kernel. The self pair gets a
    # nonzero s but cancels exactly in p_i*sum(s) - sum(s*p_j), identical to
    # smoothing.delta_p_scale's behavior (s * r with r = 0). Invalid lanes
    # have u == 0 via the penalty clamp, so s == 0 and the s * c
    # accumulations stay finite even against sentinel positions.
    def compute(cand, penalty, acc):
        s_sum_b, sx_b, sy_b, sz_b = acc
        cx, cy, cz = cand[0:1, :], cand[1:2, :], cand[2:3, :]
        clam = cand[3:4, :] + s_corr                # (1, CC)
        dx = ox - cx
        dy = oy - cy
        dz = oz - cz
        rd2 = jnp.minimum(dx * dx + dy * dy + (dz * dz + penalty), h2)
        u = h - jnp.sqrt(rd2)
        s = (u * u) * (olam + clam)                 # (OWN, CC)
        return s_sum_b + s, sx_b + s * cx, sy_b + s * cy, sz_b + s * cz

    zero = jnp.zeros((OWN, CC), jnp.float32)
    s_sum_b, sx_b, sy_b, sz_b = _pair_loop(
        cfg, starts_ref, lo_ref, hi_ref, hbm_ref, buf, sem, compute,
        (zero, zero, zero, zero),
    )
    ksum = functools.partial(jnp.sum, axis=1, keepdims=True)
    s_sum = ksum(s_sum_b)
    sx = ksum(sx_b)
    sy = ksum(sy_b)
    sz = ksum(sz_b)
    # sum_j s*(p_i - p_j) = p_i * sum_j s - sum_j s*p_j  (no per-pair vectors)
    out_ref[0:1, :] = jnp.transpose(ox + k_proj * (ox * s_sum - sx))
    out_ref[1:2, :] = jnp.transpose(oy + k_proj * (oy * s_sum - sy))
    out_ref[2:3, :] = jnp.transpose(oz + k_proj * (oz * s_sum - sz))
    out_ref[3:4, :] = own_ref[3:4, :]


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _common_specs(width: int):
    meta_spec = pl.BlockSpec((1, 1, META_W), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM)
    own_spec = pl.BlockSpec((4, OWN), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    hbm_spec = pl.BlockSpec(memory_space=pl.ANY)
    scratch = [
        pltpu.VMEM((2, 4, CC), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    return meta_spec, own_spec, hbm_spec, scratch


def density_pass(cfg: SimConfig, p4: jax.Array, plan: WindowPlan,
                 interpret: bool = False) -> jax.Array:
    """p4 (4, width) -> lambda (1, width) in sorted-chunk layout."""
    width = p4.shape[1]
    n_pad = width - CC
    num_chunks = n_pad // OWN
    meta_spec, own_spec, hbm_spec, scratch = _common_specs(width)
    lam = pl.pallas_call(
        functools.partial(_density_kernel, cfg),
        grid=(num_chunks,),
        in_specs=[meta_spec, meta_spec, meta_spec, own_spec, hbm_spec],
        out_specs=pl.BlockSpec((1, OWN), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(plan.chunk_start, plan.chunk_lo, plan.chunk_hi, p4, p4)
    return lam


def project_pass(cfg: SimConfig, p4: jax.Array, plan: WindowPlan,
                 interpret: bool = False) -> jax.Array:
    """p4 (with lambda row) -> new p4 (positions moved, lambda copied)."""
    width = p4.shape[1]
    num_chunks = (width - CC) // OWN
    meta_spec, own_spec, hbm_spec, scratch = _common_specs(width)
    return pl.pallas_call(
        functools.partial(_project_kernel, cfg),
        grid=(num_chunks,),
        in_specs=[meta_spec, meta_spec, meta_spec, own_spec, hbm_spec],
        out_specs=pl.BlockSpec((4, OWN), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, width), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(plan.chunk_start, plan.chunk_lo, plan.chunk_hi, p4, p4)


def solve_pallas(cfg: SimConfig, p_sorted: jax.Array, sorted_cid_pad: jax.Array,
                 interpret: bool = False) -> jax.Array:
    """The full 3-iteration Jacobi constraint solve. p_sorted (n, 3) sorted by
    cell id; sorted_cid_pad (n_pad,) with padding = num_nb_cells."""
    n = p_sorted.shape[0]
    n_pad = pad_to_chunks(n)
    plan = build_plan(cfg, sorted_cid_pad)
    p4 = build_p4(p_sorted, n_pad)

    def body(_, p4):
        lam = density_pass(cfg, p4, plan, interpret=interpret)   # (1, n_pad)
        p4 = jax.lax.dynamic_update_slice(p4, lam, (3, 0))
        p4 = project_pass(cfg, p4, plan, interpret=interpret)
        # the kernels only write the first n_pad columns; restore the DMA
        # margin so sentinel guarantees hold for the next iteration
        p4 = p4.at[0:3, n_pad:].set(SENTINEL)
        p4 = p4.at[3, n_pad:].set(0.0)
        return p4

    p4 = jax.lax.fori_loop(0, cfg.solver_iters, body, p4)
    return p4[0:3, :n].T
