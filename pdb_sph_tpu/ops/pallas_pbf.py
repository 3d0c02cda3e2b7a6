"""Fused Pallas TPU kernels for the two hot PBF loops.

TPU-native replacement for `computeDensity` (src/FluidSimulator.cu:222-284)
and `projectDensityConstraint` (:286-343). The design exploits the counting
sort instead of translating the CUDA cell loops:

  * Each program owns OWN consecutive *cell-sorted* particles — 100% lane
    fill by construction (a cell-centric table wastes lanes on under-full
    cells).
  * Because cell ids are x-fastest (id = cx + W*cy + W^2*cz) and particles
    are sorted by id, the 27-cell stencil of the own chunk's cell span
    [c_first, c_last] collapses into NINE CONTIGUOUS RANGES of the sorted
    particle array — one per (dy, dz). Candidate gathering is therefore
    *streaming*, not random access.
  * The nine ranges are QUANTIZED to 128-lane multiples and THEN made
    disjoint (ascending offsets, cumulative max). Quantizing before the
    dedup means no per-lane validity mask is ever needed: an extra lane
    admitted by the rounding holds either a real particle from a cell
    outside the stencil — at least one cell (>= h, config-validated) away,
    so the rd2-clamp kills the pair exactly as it kills in-window far
    pairs — or a sentinel pad slot. The quantized windows pack into a flat
    stream of 128-lane segments, cutting paid lanes ~20% vs rounding each
    window up to a full candidate chunk.
  * The kernel DMAs CC/128 segments per (OWN, CC) candidate block with an
    NBUF-deep pipeline and computes dense pair blocks on the VPU; the
    density pass computes rd2 on the *MXU* via
    |pi|^2 - 2 pi.pj + |pj|^2  (one (OWN,3)@(3,CC) f32 dot; f32 keeps
    ~1e-6 absolute rd2 accuracy where bf16 would not), which measures
    ~17% faster than the VPU delta chain. The project pass keeps VPU
    deltas: it needs (pi - pj) vectors for the delta-p accumulation anyway.

Candidates travel as (4, n_pad + CC) arrays (Mosaic DMA needs the sublane
dim to divide the 8-tile): the density pass streams rows (x, y, z, |p|^2)
— the squared norm feeds its MXU rd2 — and the project pass streams rows
(x, y, z, lambda). The constraint iterations ping-pong these against the
(n_pad, 5) own-side layout with no scatters or gathers.

Perf history and rejected alternatives: docs/PERF.md.
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

# Block geometry, env-overridable for autotuning sweeps.
OWN = int(os.environ.get("PBF_OWN", "64"))    # own-chunk size (accum rows)
CC = int(os.environ.get("PBF_CC", "512"))     # candidate-block lane width
NBUF = int(os.environ.get("PBF_NBUF", "4"))   # DMA pipeline depth: the 2.5 KiB
                                              # segment copies are latency-
                                              # bound, so keep several blocks
                                              # in flight
GB = int(os.environ.get("PBF_GB", "4"))       # own-chunks per grid step
                                              # (amortizes Mosaic's per-grid-
                                              # step pipeline cost)
SEG = 128                                     # candidate segment width: the
                                              # Mosaic DMA lane-alignment unit
SPB = CC // SEG                               # segments per candidate block
MAX_SEG = 252                                 # per-own-chunk segment capacity
                                              # (32256 candidate lanes)
KW = 32                                       # per-window segment cap (4096
                                              # lanes); 9*KW must cover MAX_SEG
SEGW = 256                                    # SMEM seg-table width; last lane
                                              # holds T (candidate block count)
# Padding position for pad/margin slots: far enough outside the domain that
# rd2 >= h^2 against any real particle (so the min-clamp kills the pair), but
# MODEST in magnitude: the project kernel accumulates s * dx per lane, where
# a clamped dead lane can leave s ~ 1 ulp^2 (rsqrt rounding at r == h). With
# a 1e9 sentinel that residual times the coordinate became a visible uniform
# drift (~2e-5 per step); at -100 it is ~1e-13.
SENTINEL = -100.0
# rd2 floors. The project pass computes rd2 from exact coordinate deltas, so
# only the self pair (rd2 == 0) needs lifting for a finite rsqrt. The density
# pass computes rd2 on the MXU via |pi|^2 - 2 pi.pj + |pj|^2, whose f32
# cancellation noise is ~|p|^2 * 2^-22 ~ 3e-6 and can be NEGATIVE for
# coincident particles — the floor must sit above it.
PROJ_EPS = 1e-16
DENS_EPS = 1e-5


class SegPlan(NamedTuple):
    """Per-step candidate plan (built once from the frozen sort).

    seg_src: (num_chunks, 1, SEGW) i32 — 128-aligned p5 lane offsets of each
        candidate segment; dead slots point at the sentinel pad zone
        [n_pad, n_pad + CC). Lane SEGW-1 holds T, the number of (OWN, CC)
        candidate blocks (= ceil(active_segs / SPB)).
    n_overflow: () i32 — candidate lanes dropped because a chunk exceeded
        MAX_SEG segments (diagnostics surface this: truncation silently
        softens the physics).
    """

    seg_src: jax.Array
    n_overflow: jax.Array


def pad_to_chunks(n: int) -> int:
    return -(-n // (OWN * GB)) * (OWN * GB)


# ---------------------------------------------------------------------------
# prep (XLA): sorted cell ids -> 9 quantized disjoint windows -> segment table
# ---------------------------------------------------------------------------

def build_plan(cfg: SimConfig, sorted_cid: jax.Array) -> SegPlan:
    """sorted_cid: (n_pad,) int32, padding entries = num_nb_cells (beyond any
    real cell). Returns the per-own-chunk segment DMA plan.

    The whole builder is sort/cumsum/gather-free-ish by design: an early
    version used jnp.searchsorted (2.6 ms: XLA lowers it to ~17 serial
    gather rounds) and a take_along_axis slot expansion (6.2 ms of TPU
    gathers) — together it cost more than a full constraint iteration. The
    two sort-based replacements below run in ~0.5 ms total (docs/PERF.md).
    """
    n_pad = sorted_cid.shape[0]
    num_chunks = n_pad // OWN
    w = cfg.nb_grid_width
    ncells = cfg.num_nb_cells

    c_first = sorted_cid[0::OWN][:num_chunks]                   # (num_chunks,)
    c_last = sorted_cid[OWN - 1::OWN][:num_chunks]
    # A mixed chunk (real head, padding/parked tail) must plan its windows
    # from its real span: an unclamped padding c_last (== num_nb_cells) would
    # stretch every window across the entire inactive block. Because padding
    # sorts last, clamping to the last real cell keeps windows tight, and the
    # cell-start table below then naturally excludes all cid >= num_nb_cells.
    c_last = jnp.minimum(c_last, jnp.int32(ncells - 1))

    # ascending (dy, dz) offsets in cell-id space
    offsets = jnp.array(
        [dz * w * w + dy * w for dz in (-1, 0, 1) for dy in (-1, 0, 1)],
        jnp.int32,
    )  # already ascending: -W^2-W, -W^2, -W^2+W, -W, 0, W, W^2-W, W^2, W^2+W

    lo_cell = c_first[:, None] + offsets[None, :] - 1           # (num_chunks, 9)
    hi_cell = c_last[:, None] + offsets[None, :] + 1
    lo_cell = jnp.clip(lo_cell, 0, ncells)
    # cap at the last REAL cell id: hi_cell + 1 indexes the start table, and
    # a cap of num_nb_cells would re-admit every padding/parked entry
    hi_cell = jnp.clip(hi_cell, -1, ncells - 1)

    # Cell-start table by MERGE SORT instead of searchsorted: append one
    # sentinel per cell id c (key 2c, sorting just before the cell's
    # particles at key 2c+1), sort once, and each sentinel's number of
    # preceding particle entries IS searchsorted(sorted_cid, c, 'left').
    # A second stable sort by the sentinel flag compacts the per-cell
    # results to the front in cell order.
    nq = ncells + 1                                              # cells 0..ncells
    mkey = jnp.concatenate([sorted_cid * 2 + 1,
                            jnp.arange(nq, dtype=jnp.int32) * 2])
    mflag = jnp.concatenate([jnp.zeros((n_pad,), jnp.int32),
                             jnp.ones((nq,), jnp.int32)])
    mkey_s, mflag_s = jax.lax.sort((mkey, mflag), num_keys=1)
    c1 = jnp.cumsum(mflag_s)
    pb = jnp.arange(n_pad + nq, dtype=jnp.int32) - c1 + 1       # particles before
    _, pb_s = jax.lax.sort((1 - mflag_s, pb), num_keys=1, is_stable=True)
    cell_starts = pb_s[:nq]                                      # (ncells+1,)

    start = cell_starts[lo_cell]                                 # (num_chunks, 9)
    end = cell_starts[hi_cell + 1]

    # Quantize to the DMA alignment unit FIRST (extra lanes are harmless by
    # the stencil-distance argument in the module docstring), then make the
    # windows disjoint so no pair is ever double counted. Max of multiples
    # of SEG stays a multiple of SEG, so dedup preserves alignment.
    length = end - start
    qs = (start // SEG) * SEG
    qe = -(-end // SEG) * SEG
    qs = jnp.where(length > 0, qs, 0)
    qe = jnp.where(length > 0, qe, 0)

    def dedup(carry, se):
        s, e = se
        s = jnp.maximum(s, carry)
        e = jnp.maximum(e, s)
        return e, (s, e)

    # carry derives from `start` (not a fresh zeros) so its varying-axes type
    # matches inside shard_map
    _, (qs_d, qe_d) = jax.lax.scan(
        dedup, jnp.zeros_like(start[:, 0]), (qs.T, qe.T)
    )
    qs, qe = qs_d.T, qe_d.T

    # Chunks made purely of padding / parked-inactive entries (cell id >=
    # num_nb_cells) get no candidates at all: their physics is meaningless
    # and their windows would otherwise span the entire inactive block
    # (large in the sharded path), wasting lanes and faking overflow.
    is_pad = (c_first >= jnp.int32(ncells))[:, None]
    k_raw = jnp.where(is_pad, 0, (qe - qs) // SEG)               # segs/window
    k = jnp.minimum(k_raw, KW)
    cum = jnp.cumsum(k, axis=1)                                  # (num_chunks, 9)
    total = jnp.minimum(cum[:, -1], MAX_SEG)
    n_overflow = (
        (jnp.sum(k_raw) - jnp.sum(total)) * SEG
    ).astype(jnp.int32)

    # Flat slot table by one small per-row sort (slots ascend in (window,
    # seg) order; invalid entries get a huge key and the sentinel-zone src).
    j = jnp.arange(KW, dtype=jnp.int32)
    cum0 = jnp.concatenate([jnp.zeros((num_chunks, 1), jnp.int32), cum],
                           axis=1)
    slot = cum0[:, :9, None] + j[None, None, :]                  # (nc, 9, KW)
    valid = (j[None, None, :] < k[:, :, None]) & (slot < MAX_SEG)
    key = jnp.where(valid, slot, jnp.int32(2 ** 30)).reshape(num_chunks,
                                                             9 * KW)
    val = jnp.where(valid, qs[:, :, None] + j[None, None, :] * SEG,
                    jnp.int32(n_pad)).reshape(num_chunks, 9 * KW)
    _, src = jax.lax.sort((key, val), num_keys=1)
    src = src[:, :MAX_SEG]                                       # 128-aligned

    nblocks = -(-total // SPB)
    pad_lanes = jnp.zeros((num_chunks, SEGW - MAX_SEG - 1), jnp.int32)
    seg_src = jnp.concatenate(
        [src, pad_lanes, nblocks[:, None]], axis=1
    )[:, None, :]

    return SegPlan(seg_src=seg_src, n_overflow=n_overflow)


def _cand_density(pT: jax.Array, width: int) -> jax.Array:
    """(n_pad, 5) own-layout -> (4, width) density candidate rows
    (x, y, z, |p|^2), sentinel margin. One fused XLA transpose per solver
    pass (~MBs of HBM traffic) buys zero in-kernel relayouts: a transpose
    inside the kernel costs ~2.5 us flat on the VPU. The margin's |p|^2 is
    the sentinel point's (3 * 100^2) so the MXU rd2 path kills pad pairs.
    """
    n_pad = pT.shape[0]
    p4 = jnp.full((4, width), SENTINEL, jnp.float32)
    p4 = p4.at[:, :n_pad].set(pT[:, (0, 1, 2, 4)].T)
    p4 = p4.at[3, n_pad:].set(3.0 * SENTINEL * SENTINEL)
    return p4


def _cand_project(pT: jax.Array, width: int) -> jax.Array:
    """(n_pad, 5) own-layout -> (4, width) project candidate rows
    (x, y, z, lambda), sentinel margin (lambda 0 there)."""
    n_pad = pT.shape[0]
    p4 = jnp.full((4, width), SENTINEL, jnp.float32)
    p4 = p4.at[:, :n_pad].set(pT[:, 0:4].T)
    p4 = p4.at[3, n_pad:].set(0.0)
    return p4


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _pair_loop(segs_ref, hbm_ref, buf, sem, compute_chunk, init, g: int = 0):
    """Shared pipelined candidate streaming loop for own-chunk g.

    Per candidate block t, SPB segment DMAs assemble a (5, CC) block in
    buf[slot]; compute_chunk(cand5, acc) -> acc runs the dense pair math.
    No validity masking exists at this level — the plan guarantees every
    lane is either a once-counted candidate or a pair the rd2 clamp kills.
    """
    total = segs_ref[0, g, SEGW - 1]

    def issue(slot, t):
        for j in range(SPB):
            src = pl.multiple_of(segs_ref[0, g, t * SPB + j], SEG)
            pltpu.make_async_copy(
                hbm_ref.at[:, pl.ds(src, SEG)],
                buf.at[slot, :, pl.ds(j * SEG, SEG)],
                sem.at[slot, j],
            ).start()

    def wait(slot):
        for j in range(SPB):
            pltpu.make_async_copy(
                hbm_ref.at[:, pl.ds(0, SEG)],
                buf.at[slot, :, pl.ds(j * SEG, SEG)],
                sem.at[slot, j],
            ).wait()

    # NBUF-deep prologue: the copies are ~2.5 KiB, so completion is dominated
    # by DMA latency, not bandwidth — keep several blocks in flight to hide
    # it behind the ~600 ns of pair math per block.
    for t in range(NBUF - 1):
        @pl.when(t < total)
        def _(t=t):
            issue(t, t)

    def body(t, acc):
        slot = jax.lax.rem(t, NBUF)

        @pl.when(t + NBUF - 1 < total)
        def _():
            issue(jax.lax.rem(t + NBUF - 1, NBUF), t + NBUF - 1)

        wait(slot)
        return compute_chunk(buf[slot], acc)

    return jax.lax.fori_loop(0, total, body, init)


def _density_kernel(cfg: SimConfig, segs_ref, own_ref, hbm_ref, lam_ref,
                    buf, sem):
    h = jnp.float32(cfg.h)
    h2 = jnp.float32(cfg.h2)
    eps = jnp.float32(DENS_EPS)
    l2 = jnp.float32(cfg.lambda_grad_coeff * cfg.lambda_grad_coeff)

    # Select-free formulation, algebraically identical to
    # smoothing.density_terms (the pallas<->cell parity tests enforce it):
    # the min-at-h^2 clamp zeroes both t and (h - rd) for dead lanes, and
    # the constant scales (poly6 norm, the squared lambda gradient
    # coefficient) are applied once after the stream loop. rd2 comes from
    # the MXU as |pi|^2 - 2 pi.pj + |pj|^2 — measured ~17% faster than the
    # VPU delta chain; the max-at-DENS_EPS floor absorbs both the self pair
    # and the f32 cancellation noise (which can be negative). r is
    # rd2 * rsqrt(rd2): sqrt costs ~2x rsqrt+mul on the VPU.
    for g in range(GB):
        sl = slice(g * OWN, (g + 1) * OWN)
        own3 = own_ref[sl, 0:3]               # (OWN, 3) matmul lhs — no
        osq = own_ref[sl, 4:5]                # relayout: own side rides in
                                              # the transposed (n_pad, 5)

        def compute(cand, acc, own3=own3, osq=osq):
            rho_b, g2_b = acc
            m = jax.lax.dot_general(
                own3, cand[0:3, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # (OWN, CC) pi.pj
            a = osq + cand[3:4, :]                     # |pi|^2 + |pj|^2
            rd2 = jnp.maximum(jnp.minimum(a - 2.0 * m, h2), eps)
            t = h2 - rd2
            u = h - rd2 * jax.lax.rsqrt(rd2)
            t2 = t * t
            u2 = u * u
            return rho_b + t2 * t, g2_b + (u2 * u2) * rd2

        zero = jnp.zeros((OWN, CC), jnp.float32)
        rho_b, g2_b = _pair_loop(segs_ref, hbm_ref, buf, sem, compute,
                                 (zero, zero), g=g)
        rho = jnp.float32(cfg.poly6_coeff) * jnp.sum(rho_b, axis=1,
                                                     keepdims=True)
        g2 = l2 * jnp.sum(g2_b, axis=1, keepdims=True)
        lam_ref[sl, :] = smoothing.lambda_from_sums(cfg, rho, g2)


def _project_kernel(cfg: SimConfig, segs_ref, own_ref, hbm_ref, out_ref,
                    buf, sem):
    h = jnp.float32(cfg.h)
    h2 = jnp.float32(cfg.h2)
    eps = jnp.float32(PROJ_EPS)
    k_proj = jnp.float32(-cfg.spiky_grad_coeff * cfg.inv_rho0)
    s_corr = jnp.float32(cfg.s_corr)

    # VPU deltas here (unlike the density pass): the delta-p accumulation
    # needs (pi - pj) per lane anyway, and with the deltas in registers the
    # exact dx*dx+... cancellation makes the self pair contribute s * 0
    # identically — same behavior as smoothing.delta_p_scale. Dead lanes
    # have u == 0 via the min clamp, so s == 0 and the accumulations stay
    # finite even against sentinel positions.
    for g in range(GB):
        sl = slice(g * OWN, (g + 1) * OWN)
        ox = own_ref[sl, 0:1]                 # (OWN, 1), transposed layout
        oy = own_ref[sl, 1:2]
        oz = own_ref[sl, 2:3]
        olam = own_ref[sl, 3:4] + s_corr      # lambda_i + s_corr, hoisted

        def compute(cand, acc, ox=ox, oy=oy, oz=oz, olam=olam):
            dpx_b, dpy_b, dpz_b = acc
            dx = ox - cand[0:1, :]            # (OWN, CC)
            dy = oy - cand[1:2, :]
            dz = oz - cand[2:3, :]
            rd2 = jnp.maximum(jnp.minimum(dx * dx + dy * dy + dz * dz, h2),
                              eps)
            u = h - rd2 * jax.lax.rsqrt(rd2)
            s = (u * u) * (olam + cand[3:4, :])       # (OWN, CC)
            return dpx_b + s * dx, dpy_b + s * dy, dpz_b + s * dz

        zero = jnp.zeros((OWN, CC), jnp.float32)
        dpx_b, dpy_b, dpz_b = _pair_loop(segs_ref, hbm_ref, buf, sem,
                                         compute, (zero, zero, zero), g=g)
        ksum = functools.partial(jnp.sum, axis=1, keepdims=True)
        nx = ox + k_proj * ksum(dpx_b)
        ny = oy + k_proj * ksum(dpy_b)
        nz = oz + k_proj * ksum(dpz_b)
        out_ref[sl, 0:1] = nx
        out_ref[sl, 1:2] = ny
        out_ref[sl, 2:3] = nz
        out_ref[sl, 3:4] = olam - s_corr
        # refresh |p|^2 for the next density pass's MXU rd2
        out_ref[sl, 4:5] = nx * nx + ny * ny + nz * nz


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _common_specs():
    seg_spec = pl.BlockSpec((1, GB, SEGW), lambda i: (i, 0, 0),
                            memory_space=pltpu.SMEM)
    own_spec = pl.BlockSpec((GB * OWN, 5), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    hbm_spec = pl.BlockSpec(memory_space=pl.ANY)
    scratch = [
        pltpu.VMEM((NBUF, 4, CC), jnp.float32),
        pltpu.SemaphoreType.DMA((NBUF, SPB)),
    ]
    return seg_spec, own_spec, hbm_spec, scratch


def _segs_batched(plan: SegPlan):
    """(num_chunks, 1, SEGW) -> (num_chunks/GB, GB, SEGW)."""
    a = plan.seg_src
    return a.reshape(a.shape[0] // GB, GB, SEGW)


def density_pass(cfg: SimConfig, pT: jax.Array, cand: jax.Array,
                 plan: SegPlan, interpret: bool = False) -> jax.Array:
    """(pT (n_pad, 5), cand (4, width) rows x,y,z,|p|^2) -> lambda (n_pad, 1)."""
    n_pad = pT.shape[0]
    seg_spec, own_spec, hbm_spec, scratch = _common_specs()
    return pl.pallas_call(
        functools.partial(_density_kernel, cfg),
        grid=(n_pad // (OWN * GB),),
        in_specs=[seg_spec, own_spec, hbm_spec],
        out_specs=pl.BlockSpec((GB * OWN, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(_segs_batched(plan), pT, cand)


def project_pass(cfg: SimConfig, pT: jax.Array, cand: jax.Array,
                 plan: SegPlan, interpret: bool = False) -> jax.Array:
    """(pT with lambda column, cand (4, width) rows x,y,z,lambda) ->
    new pT (n_pad, 5)."""
    n_pad = pT.shape[0]
    seg_spec, own_spec, hbm_spec, scratch = _common_specs()
    return pl.pallas_call(
        functools.partial(_project_kernel, cfg),
        grid=(n_pad // (OWN * GB),),
        in_specs=[seg_spec, own_spec, hbm_spec],
        out_specs=pl.BlockSpec((GB * OWN, 5), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 5), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(_segs_batched(plan), pT, cand)


def make_pT(cfg: SimConfig, p_sorted: jax.Array, n_pad: int) -> jax.Array:
    """(n, 3) sorted positions -> (n_pad, 5) own-side layout with zero
    lambda and precomputed |p|^2; padding rows carry the sentinel point."""
    n = p_sorted.shape[0]
    pT = jnp.full((n_pad, 5), SENTINEL, jnp.float32)
    pT = pT.at[:n, 0:3].set(p_sorted)
    pT = pT.at[:, 3].set(0.0)
    sq = jnp.sum(p_sorted * p_sorted, axis=1)
    pad_sq = jnp.full((n_pad - n,), 3.0 * SENTINEL * SENTINEL, jnp.float32)
    return pT.at[:, 4].set(jnp.concatenate([sq, pad_sq]))


def solve_pallas(cfg: SimConfig, p_sorted: jax.Array, sorted_cid_pad: jax.Array,
                 interpret: bool = False) -> jax.Array:
    """The full solver_iters-iteration Jacobi constraint solve. p_sorted
    (n, 3) sorted by cell id; sorted_cid_pad (n_pad,) with padding =
    num_nb_cells."""
    n = p_sorted.shape[0]
    n_pad = pad_to_chunks(n)
    width = n_pad + CC
    plan = build_plan(cfg, sorted_cid_pad)
    pT = make_pT(cfg, p_sorted, n_pad)

    def body(_, pT):
        lam = density_pass(cfg, pT, _cand_density(pT, width), plan,
                           interpret=interpret)          # (n_pad, 1)
        pT = jax.lax.dynamic_update_slice(pT, lam, (0, 3))
        return project_pass(cfg, pT, _cand_project(pT, width), plan,
                            interpret=interpret)

    pT = jax.lax.fori_loop(0, cfg.solver_iters, body, pT)
    return pT[:n, 0:3]
