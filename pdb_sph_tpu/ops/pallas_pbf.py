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
    NBUF-deep pipeline and computes dense pair blocks on the VPU. Both
    passes use exact VPU coordinate deltas for rd2. (An MXU variant via
    |pi|^2 - 2 pi.pj + |pj|^2 was tried and REVERTED: the TPU-default
    bf16 dot leaves ~5e-2 rd2 error — 5x h^2, the fluid never settles —
    and at the f32-accurate Precision.HIGHEST the x6-pass dot is slower
    than the delta chain it replaces. docs/PERF.md has the numbers.)

Candidates travel as one (4, n_pad + CC) array with rows (x, y, z,
lambda) (Mosaic DMA needs the sublane dim to divide the 8-tile). The
constraint iterations ping-pong it against the (n_pad, 4) own-side layout
with no scatters or gathers; lambda is spliced into row/column 3 between
the two passes.

ALL block geometry (own-chunk size, per-pass candidate widths, pipeline
depth, plan capacity, chain counts, copy count, the MXU A/B knobs) lives
in `cfg.geom`, a frozen `geometry.KernelGeometry` threaded like every
other constant; the PBF_* env vars are construct-time defaults only.
Measured defaults and their reasoning: geometry.py + docs/PERF.md.

Perf history and rejected alternatives: docs/PERF.md.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SimConfig
from ..geometry import KernelGeometry
from . import smoothing

# Padding position for pad/margin slots: far enough outside the domain that
# rd2 >= h^2 against any real particle (so the min-clamp kills the pair), but
# MODEST in magnitude: the project kernel accumulates s * dx per lane, where
# a clamped dead lane can leave s ~ 1 ulp^2 (rsqrt rounding at r == h). With
# a 1e9 sentinel that residual times the coordinate became a visible uniform
# drift (~2e-5 per step); at -100 it is ~1e-13.
SENTINEL = -100.0
# rd2 floor: both passes compute rd2 from exact coordinate deltas, so only
# the self pair (rd2 == 0) needs lifting for a finite rsqrt; the lift is far
# below any real pair distance.
EPS = 1e-16


class SegPlan(NamedTuple):
    """Per-step candidate plan (built once from the frozen sort).

    seg_src: (num_chunks, 1, SEGW) i32 — 128-aligned p4 lane offsets of each
        candidate segment; dead slots point at the sentinel pad zone
        [n_pad, n_pad + SEG). Lane SEGW-1 holds the chunk's SEGMENT count;
        each pass derives its own (OWN, CC_pass) block count from its own
        segments-per-block (the plan is SEG-granular, so the density and
        project passes can run different block widths off one table).
    n_overflow: () i32 — candidate lanes dropped because a chunk exceeded
        MAX_SEG segments (diagnostics surface this: truncation silently
        softens the physics).
    """

    seg_src: jax.Array
    n_overflow: jax.Array


def pad_to_chunks(cfg: SimConfig, n: int) -> int:
    c = cfg.geom.chunk
    return -(-n // c) * c


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
    g = cfg.geom
    n_pad = sorted_cid.shape[0]
    num_chunks = n_pad // g.own
    w = cfg.nb_grid_width
    ncells = cfg.num_nb_cells

    chunk_cid = sorted_cid[: num_chunks * g.own].reshape(num_chunks, g.own)
    c_first = chunk_cid[:, 0]                                   # (num_chunks,)
    # A mixed chunk (real head, padding/parked tail) must plan its windows
    # from its real span ONLY: clamping a padding c_last (== num_nb_cells) to
    # ncells-1 — the round-1 scheme — stretched all nine windows of the mixed
    # chunk to the end of the grid, the dedup folded them into one giant
    # window, and the per-window KW cap then truncated its tail, silently
    # dropping most of the boundary chunk's true neighbors whenever
    # n % OWN != 0 (advisor finding, round 1). Padding sorts last, so the
    # masked per-chunk max below is exactly the last real cell id; all-pad
    # chunks get -1 and are killed by the is_pad guard regardless.
    c_last = jnp.max(jnp.where(chunk_cid < ncells, chunk_cid, -1), axis=1)

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

    # Disjoint quantized windows in one sequential scan over the 9 ascending
    # windows (vectorized over chunks). Starts quantize DOWN onto the QSHIFT
    # grid — the shifted-copy layout makes any QSHIFT-multiple start
    # 128-aligned in exactly one copy — and lengths quantize UP to SEG
    # multiples (the DMA unit). The carry (previous window's quantized end,
    # itself on the QSHIFT grid) clips each start so no particle lane is
    # ever admitted twice; every extra lane from the rounding is either an
    # inter-window-gap / out-of-stencil particle (>= one cell == h away, so
    # the rd2 clamp kills the pair) or a sentinel pad slot — the same
    # argument as the round-1 quantize-then-cummax scheme, at finer grain.
    qshift, seg = g.qshift, g.seg

    def dedup_q(carry, se):
        s, e = se
        s2 = jnp.maximum(s, carry)
        qs = jnp.maximum((s2 // qshift) * qshift, carry)
        ln = jnp.where(e > s2, -(-(e - qs) // seg) * seg, 0)
        qe = qs + ln
        return qe, (qs, qe)

    # carry derives from `start` (not a fresh zeros) so its varying-axes type
    # matches inside shard_map
    _, (qs_d, qe_d) = jax.lax.scan(
        dedup_q, jnp.zeros_like(start[:, 0]), (start.T, end.T)
    )
    qs, qe = qs_d.T, qe_d.T

    # Chunks made purely of padding / parked-inactive entries (cell id >=
    # num_nb_cells) get no candidates at all: their physics is meaningless
    # and their windows would otherwise span the entire inactive block
    # (large in the sharded path), wasting lanes and faking overflow.
    is_pad = (c_first >= jnp.int32(ncells))[:, None]
    k = jnp.where(is_pad, 0, (qe - qs) // seg)                   # segs/window
    cum = jnp.cumsum(k, axis=1)                                  # (num_chunks, 9)
    total = jnp.minimum(cum[:, -1], g.max_seg)
    # Only the TOTAL per-chunk budget can truncate (counted per chunk before
    # summing so the int32 sum stays small even in pathological configs).
    n_overflow = (jnp.sum(cum[:, -1] - total) * seg).astype(jnp.int32)

    # Flat slot table by nine range-selects: window w owns the contiguous
    # slot run [cum0[w], cum[w]), so slot s maps to src0[w] + (s-cum0[w])*SEG
    # — slots ascend in (window, seg) order by construction, and every slot
    # outside [0, total) keeps the sentinel-zone src (n_pad is 128-aligned:
    # pad_to_chunks rounds to OWN*GB). An earlier build flattened a
    # (nc, 9, KW) expansion through lax.sort instead; its cost scaled with
    # the per-window cap KW (~18 ms/step at 1M with maxlanes=131072) —
    # the selects touch (nc, MAX_SEG) once per window and cost ~nothing.
    # A window starting at particle lane qs lives in the copy whose forward
    # shift CANCELS qs's SEG-residue: cshift = (SEG - qs % SEG) % SEG
    # (= c * QSHIFT), so the array offset c*stride + cshift + qs is
    # 128-aligned by construction; all its segments stay inside that copy.
    stride = jnp.int32(n_pad + g.cc_pad)
    cshift = (seg - qs % seg) % seg
    src0 = (cshift // qshift) * stride + cshift + qs             # (nc, 9)
    cum0 = jnp.concatenate(
        [jnp.zeros((num_chunks, 1), jnp.int32), cum[:, :8]], axis=1)
    s_idx = jnp.arange(g.max_seg, dtype=jnp.int32)[None, :]     # (1, MAX_SEG)
    src = jnp.full((num_chunks, g.max_seg), jnp.int32(n_pad))
    for w_ in range(9):
        lo = cum0[:, w_:w_ + 1]
        sel = (lo <= s_idx) & (s_idx < cum[:, w_:w_ + 1])
        src = jnp.where(sel, src0[:, w_:w_ + 1] + (s_idx - lo) * seg, src)

    # pad lanes carry the sentinel src too: a partial final block of a pass
    # whose SPB doesn't divide the slot count reads past MAX_SEG, and a zero
    # there would stream REAL particles from lane 0 into the wrong stencil
    pad_lanes = jnp.full((num_chunks, g.segw - g.max_seg - 1), jnp.int32(n_pad))
    seg_src = jnp.concatenate(
        [src, pad_lanes, total[:, None]], axis=1
    )[:, None, :]

    return SegPlan(seg_src=seg_src, n_overflow=n_overflow)


def restrict_plan(cfg: SimConfig, plan: SegPlan, keep: jax.Array) -> SegPlan:
    """Zero the candidate-block count of every own-chunk with keep[c] ==
    False, leaving the shared segment table untouched.

    Used by the sharded path (parallel/sharded.py) to skip own-row work a
    pass never needs: ghost particles ride the per-shard sorted array as
    CANDIDATES, but their own-row outputs are partly or wholly discarded —
    the project pass drops every ghost row's delta-p after the inverse
    permutation, and the density pass only needs lambda for the INNER ghost
    row (the outer row supplies positions only; any own-outer pair is >= one
    cell == h apart, so the rd2 clamp zeroes its weight regardless of the
    outer row's lambda). Because cell ids are z-major (id = cx + W*cy +
    W^2*cz) and the array is cell-sorted, ghosts are contiguous at both ends
    and chunk granularity loses at most one mixed chunk per zone edge.

    A masked chunk still writes its outputs (lambda from zero sums =
    1/relaxation_eps — finite, and only ever multiplied into rd2-clamped
    zero weights; project returns the own position unchanged), so downstream
    slicing/gather semantics are unchanged. `_pair_loop` sees a zero block
    count: no DMA is issued and no pair math runs for the chunk.
    """
    segw = cfg.geom.segw
    total = plan.seg_src[:, :, segw - 1]
    masked = jnp.where(keep[:, None], total, 0)
    seg_src = jax.lax.dynamic_update_slice(
        plan.seg_src, masked[:, :, None], (0, 0, segw - 1))
    return SegPlan(seg_src=seg_src, n_overflow=plan.n_overflow)


def cand_width(cfg: SimConfig, n_pad: int) -> int:
    """Total lane width of the candidate array: NCOPIES shifted copies of
    stride (n_pad + CC_PAD) lanes each."""
    g = cfg.geom
    return g.ncopies * (n_pad + g.cc_pad)


def _p4_from_pT(cfg: SimConfig, pT: jax.Array) -> jax.Array:
    """(n_pad, 4) own-layout -> (4, NCOPIES * stride) candidate rows
    (x, y, z, lambda): copy c holds particle lane L at array lane
    c*stride + c*QSHIFT + L, sentinel everywhere else (lambda 0 there).
    One fused XLA transpose+broadcast per solver iteration (~MBs of HBM
    traffic) buys zero in-kernel relayouts: a transpose inside the kernel
    costs ~2.5 us flat on the VPU."""
    g = cfg.geom
    n_pad = pT.shape[0]
    stride = n_pad + g.cc_pad
    p4 = jnp.full((4, g.ncopies * stride), SENTINEL, jnp.float32)
    pt = pT.T
    for c in range(g.ncopies):
        base = c * stride + c * g.qshift
        p4 = jax.lax.dynamic_update_slice(p4, pt, (0, base))
    # lambda row: zero on every non-particle lane (margins stream with the
    # windows; a clamped dead lane's u^2 residual times a huge lambda would
    # otherwise leak ~1e-13-scale drift into the projection sums)
    lane = jnp.arange(g.ncopies * stride, dtype=jnp.int32)
    off = lane % stride - (lane // stride) * g.qshift
    is_particle = (off >= 0) & (off < n_pad)
    return p4.at[3].set(jnp.where(is_particle, p4[3], 0.0))


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _bf16_split(a: jax.Array):
    """f32 -> (hi, lo) bf16 pair with hi + lo ~= a to ~16 mantissa bits."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(ah, al, bh, bl, dims) -> jax.Array:
    """3-pass bf16 emulation of a Precision.HIGH f32 dot (which Mosaic's
    dot_general lowering rejects): hi*hi + hi*lo + lo*hi, dropping the
    ~2^-18-relative lo*lo term. f32 accumulation on the MXU."""
    d = functools.partial(
        jax.lax.dot_general, dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32)
    return d(ah, bh) + (d(ah, bl) + d(al, bh))


def _ksum(geom: KernelGeometry, acc: jax.Array) -> jax.Array:
    """(OWN, CC) accumulator -> (OWN, 1) row sums."""
    if geom.mxu_sum:
        ones = jnp.ones((acc.shape[1], 1), jnp.float32)
        return jax.lax.dot_general(
            acc, ones, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
    return jnp.sum(acc, axis=1, keepdims=True)


def _tree_add(a, b):
    return jax.tree_util.tree_map(jnp.add, a, b)


def _pair_loop(geom: KernelGeometry, segs_ref, hbm_ref, buf, sem, term_fn,
               init, g: int, chains: int, spb: int):
    """Shared pipelined candidate streaming loop for own-chunk g.

    term_fn(cand) -> pytree of (OWN, CC_pass) partial terms for one
    candidate block; the loop accumulates their tree-sum over every block
    of the chunk's plan. `spb` (segments per block = CC_pass // SEG) turns
    the table's segment count into this pass's block count.

    Each fori iteration consumes CHAINS (4, CC) candidate blocks: Mosaic
    does not software-pipeline across fori_loop iterations, so a single
    block per iteration serializes the whole ~19-op dependency chain at op
    *latency* (~350 ns/block measured); independent chains interleave at
    issue throughput (~100-120 ns/block). CHAINS=2 was optimal at CC=512
    (four chains spilled vector registers and got slower); the knob is
    per-geometry because the spill point moves with CC. The ring slots are
    dynamic indices; static-slot variants (full NBUF rounds, or a
    lax.switch over slot tuples) both measured SLOWER than paying
    buf[slot]'s dynamic-slice tax (docs/PERF.md).

    LEFTOVER blocks (total % CHAINS) are handled by single-block lax.cond
    epilogues instead of rounding the count up: the rounded scheme
    streamed full sentinel blocks through the ~20-op pair math — ~190
    paid lanes/chunk of pure waste at CHAINS=2/CC=512 in the round-2 lane
    accounting (docs/PERF.md), ~6% of pair time. No validity masking
    exists at this level — the plan guarantees every lane is either a
    once-counted candidate or a pair the rd2 clamp kills.
    """
    segw, seg, nbuf = geom.segw, geom.seg, geom.nbuf
    total = (segs_ref[0, g, segw - 1] + spb - 1) // spb   # blocks this pass
    iters = total // chains

    def issue(slot, t):
        for j in range(spb):
            src = pl.multiple_of(segs_ref[0, g, t * spb + j], seg)
            pltpu.make_async_copy(
                hbm_ref.at[:, pl.ds(src, seg)],
                buf.at[slot, :, pl.ds(j * seg, seg)],
                sem.at[slot, j],
            ).start()

    def wait(slot):
        for j in range(spb):
            pltpu.make_async_copy(
                hbm_ref.at[:, pl.ds(0, seg)],
                buf.at[slot, :, pl.ds(j * seg, seg)],
                sem.at[slot, j],
            ).wait()

    # (NBUF-chains)-block lookahead prologue: the copies are ~2 KiB, so
    # completion is dominated by DMA latency, not bandwidth.
    for t in range(nbuf - chains):
        @pl.when(t < total)
        def _(t=t):
            issue(t, t)

    def body(i, acc):
        ta = i * chains
        for c in range(chains):
            @pl.when(ta + nbuf - chains + c < total)
            def _(c=c):
                issue(jax.lax.rem(ta + nbuf - chains + c, nbuf),
                      ta + nbuf - chains + c)

        slots = []
        for c in range(chains):
            slot = jax.lax.rem(ta + c, nbuf)
            wait(slot)
            slots.append(slot)
        terms = [term_fn(buf[slot]) for slot in slots]
        while len(terms) > 1:  # pairwise tree: chains stay independent
            terms = [_tree_add(terms[k], terms[k + 1])
                     if k + 1 < len(terms) else terms[k]
                     for k in range(0, len(terms), 2)]
        return _tree_add(acc, terms[0])

    acc = jax.lax.fori_loop(0, iters, body, init)

    # leftover epilogue: blocks iters*chains .. total-1 (0..chains-1 many)
    rem = total - iters * chains
    for k in range(chains - 1):
        def tail(acc, k=k):
            idx = iters * chains + k
            slot = jax.lax.rem(idx, nbuf)
            wait(slot)
            return _tree_add(acc, term_fn(buf[slot]))

        acc = jax.lax.cond(k < rem, tail, lambda a: a, acc)
    return acc


def _density_kernel(cfg: SimConfig, mxu_rd2: bool, chains: int,
                    segs_ref, own_ref, hbm_ref, lam_ref, buf, sem):
    geom = cfg.geom
    own, cc = geom.own, geom.cc_d
    h = jnp.float32(cfg.h)
    h2 = jnp.float32(cfg.h2)
    eps = jnp.float32(EPS)
    l2 = jnp.float32(cfg.lambda_grad_coeff * cfg.lambda_grad_coeff)

    # Select-free formulation, algebraically identical to
    # smoothing.density_terms (the pallas<->cell parity tests enforce it):
    # the min-at-h^2 clamp zeroes both t and (h - rd) for dead lanes, and
    # the constant scales (poly6 norm, the squared lambda gradient
    # coefficient) are applied once after the stream loop. The max-at-EPS
    # floor keeps the self pair (rd2 == 0) finite through rsqrt. r is
    # rd2 * rsqrt(rd2): sqrt costs ~2x rsqrt+mul on the VPU.
    for g in range(geom.gb):
        sl = slice(g * own, (g + 1) * own)
        ox = own_ref[sl, 0:1]                 # (OWN, 1) — no relayout: the
        oy = own_ref[sl, 1:2]                 # own side rides in the
        oz = own_ref[sl, 2:3]                 # transposed (n_pad, 4)
        if mxu_rd2:
            o3h, o3l = _bf16_split(own_ref[sl, 0:3])       # (OWN, 3) pair
            on2 = ox * ox + oy * oy + oz * oz  # (OWN, 1), hoisted per g

        def one(cand, ox=ox, oy=oy, oz=oz):
            if mxu_rd2:
                cx, cy, cz = cand[0:1, :], cand[1:2, :], cand[2:3, :]
                cn2 = cx * cx + cy * cy + cz * cz          # (1, CC), cheap
                c3h, c3l = _bf16_split(cand[0:3, :])
                dot = _dot3(o3h, o3l, c3h, c3l, ((1,), (0,)))
                rd2 = (on2 - (dot + dot)) + cn2            # (OWN, CC)
            else:
                dx = ox - cand[0:1, :]        # (OWN, CC)
                dy = oy - cand[1:2, :]
                dz = oz - cand[2:3, :]
                rd2 = dx * dx + dy * dy + dz * dz
            rd2 = jnp.maximum(jnp.minimum(rd2, h2), eps)
            t = h2 - rd2
            u = h - rd2 * jax.lax.rsqrt(rd2)
            t2 = t * t
            u2 = u * u
            return t2 * t, (u2 * u2) * rd2

        zero = jnp.zeros((own, cc), jnp.float32)
        rho_b, g2_b = _pair_loop(geom, segs_ref, hbm_ref, buf, sem, one,
                                 (zero, zero), g=g, chains=chains,
                                 spb=geom.spb_d)
        rho = jnp.float32(cfg.poly6_coeff) * _ksum(geom, rho_b)
        g2 = l2 * _ksum(geom, g2_b)
        lam_ref[sl, :] = smoothing.lambda_from_sums(cfg, rho, g2)


def _project_kernel(cfg: SimConfig, mxu_proj: bool, chains: int,
                    segs_ref, own_ref, hbm_ref, out_ref, buf, sem):
    geom = cfg.geom
    own, cc = geom.own, geom.cc_p
    h = jnp.float32(cfg.h)
    h2 = jnp.float32(cfg.h2)
    eps = jnp.float32(EPS)
    k_proj = jnp.float32(-cfg.spiky_grad_coeff * cfg.inv_rho0)
    s_corr = jnp.float32(cfg.s_corr)

    if mxu_proj:
        _project_kernel_mxu(cfg, segs_ref, own_ref, hbm_ref, out_ref,
                            buf, sem)
        return

    # VPU deltas here (unlike the density pass): the delta-p accumulation
    # needs (pi - pj) per lane anyway, and with the deltas in registers the
    # exact dx*dx+... cancellation makes the self pair contribute s * 0
    # identically — same behavior as smoothing.delta_p_scale. Dead lanes
    # have u == 0 via the min clamp, so s == 0 and the accumulations stay
    # finite even against sentinel positions.
    for g in range(geom.gb):
        sl = slice(g * own, (g + 1) * own)
        ox = own_ref[sl, 0:1]                 # (OWN, 1), transposed layout
        oy = own_ref[sl, 1:2]
        oz = own_ref[sl, 2:3]
        olam = own_ref[sl, 3:4] + s_corr      # lambda_i + s_corr, hoisted

        def one(cand, ox=ox, oy=oy, oz=oz, olam=olam):
            dx = ox - cand[0:1, :]            # (OWN, CC)
            dy = oy - cand[1:2, :]
            dz = oz - cand[2:3, :]
            rd2 = jnp.maximum(jnp.minimum(dx * dx + dy * dy + dz * dz, h2),
                              eps)
            u = h - rd2 * jax.lax.rsqrt(rd2)
            s = (u * u) * (olam + cand[3:4, :])       # (OWN, CC)
            return s * dx, s * dy, s * dz

        zero = jnp.zeros((own, cc), jnp.float32)
        dpx_b, dpy_b, dpz_b = _pair_loop(geom, segs_ref, hbm_ref, buf, sem,
                                         one, (zero, zero, zero), g=g,
                                         chains=chains, spb=geom.spb_p)
        out_ref[sl, 0:1] = ox + k_proj * _ksum(geom, dpx_b)
        out_ref[sl, 1:2] = oy + k_proj * _ksum(geom, dpy_b)
        out_ref[sl, 2:3] = oz + k_proj * _ksum(geom, dpz_b)
        out_ref[sl, 3:4] = olam - s_corr


def _project_kernel_mxu(cfg: SimConfig, segs_ref, own_ref, hbm_ref, out_ref,
                        buf, sem):
    """MXU project pass: rd2 via |pi|^2 - 2 pi.pj + |pj|^2 and the delta-p
    accumulation factored as own3 * S - s @ cand3^T (S = row sum of s), so
    both heavy contractions ride the MXU at Precision.HIGH; only the s
    chain (clamp/rsqrt/scale) stays on the VPU. Replaces the VPU variant's
    three s*d accumulator chains (~8 big ops/block) with one (OWN,CC) @
    (CC,3) matmul plus a small (OWN,3) add.

    Numerics (why f32-exact per-lane deltas are not needed): the bf16x3
    HIGH dot leaves ~1e-6 absolute rd2 error at |p| <= 2 against h^2 =
    1e-2, and the spiky kernel is C^1 at r == h (u = h - r -> 0), so
    boundary misclassification carries vanishing weight; the self pair no
    longer cancels bit-exactly but to ~1e-10 (s_self ~ h^2*2*lambda times
    the dot's rounding on |p| <= 2). Validated by the pallas==cell parity
    tests and the hardware settle gate. Measured SLOWER than the VPU chain
    (654 vs 472 ns/blk, docs/PERF.md round-2 MXU closure) — kept only as
    executable documentation behind geom.mxu_proj.
    """
    geom = cfg.geom
    own, cc = geom.own, geom.cc_p
    h = jnp.float32(cfg.h)
    h2 = jnp.float32(cfg.h2)
    eps = jnp.float32(EPS)
    k_proj = jnp.float32(-cfg.spiky_grad_coeff * cfg.inv_rho0)
    s_corr = jnp.float32(cfg.s_corr)

    for g in range(geom.gb):
        sl = slice(g * own, (g + 1) * own)
        own3 = own_ref[sl, 0:3]                          # (OWN, 3)
        ox = own_ref[sl, 0:1]
        oy = own_ref[sl, 1:2]
        oz = own_ref[sl, 2:3]
        on2 = ox * ox + oy * oy + oz * oz                # (OWN, 1), per g
        o3h, o3l = _bf16_split(own3)
        olam = own_ref[sl, 3:4] + s_corr

        def one(cand, own3=own3, on2=on2, olam=olam, o3h=o3h, o3l=o3l):
            cx, cy, cz = cand[0:1, :], cand[1:2, :], cand[2:3, :]
            cn2 = cx * cx + cy * cy + cz * cz            # (1, CC), cheap rows
            c3h, c3l = _bf16_split(cand[0:3, :])
            dot = _dot3(o3h, o3l, c3h, c3l, ((1,), (0,)))
            rd2 = jnp.maximum(jnp.minimum((on2 - (dot + dot)) + cn2, h2),
                              eps)
            u = h - rd2 * jax.lax.rsqrt(rd2)
            s = (u * u) * (olam + cand[3:4, :])          # (OWN, CC)
            sh, sL = _bf16_split(s)
            sp = _dot3(sh, sL, c3h, c3l, ((1,), (1,)))   # (OWN, 3) on MXU
            return s, sp

        acc_s, acc_p = _pair_loop(
            geom, segs_ref, hbm_ref, buf, sem, one,
            (jnp.zeros((own, cc), jnp.float32),
             jnp.zeros((own, 3), jnp.float32)), g=g, chains=geom.chains_p,
            spb=geom.spb_p)
        S = _ksum(geom, acc_s)                           # (OWN, 1)
        out_ref[sl, 0:3] = own3 + k_proj * (own3 * S - acc_p)
        out_ref[sl, 3:4] = olam - s_corr


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _common_specs(geom: KernelGeometry, cc: int, spb: int):
    seg_spec = pl.BlockSpec((1, geom.gb, geom.segw), lambda i: (i, 0, 0),
                            memory_space=pltpu.SMEM)
    own_spec = pl.BlockSpec((geom.chunk, 4), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    hbm_spec = pl.BlockSpec(memory_space=pl.ANY)
    scratch = [
        pltpu.VMEM((geom.nbuf, 4, cc), jnp.float32),
        pltpu.SemaphoreType.DMA((geom.nbuf, spb)),
    ]
    return seg_spec, own_spec, hbm_spec, scratch


def _segs_batched(geom: KernelGeometry, plan: SegPlan):
    """(num_chunks, 1, SEGW) -> (num_chunks/GB, GB, SEGW)."""
    a = plan.seg_src
    return a.reshape(a.shape[0] // geom.gb, geom.gb, geom.segw)


def density_pass(cfg: SimConfig, pT: jax.Array, cand: jax.Array,
                 plan: SegPlan, interpret: bool = False,
                 mxu_rd2: bool | None = None,
                 chains: int | None = None) -> jax.Array:
    """(pT (n_pad, 4), cand (4, width) rows x,y,z,lambda) -> lambda (n_pad, 1)."""
    geom = cfg.geom
    if mxu_rd2 is None:
        mxu_rd2 = geom.mxu_rd2
    if chains is None:
        chains = geom.chains_d
    n_pad = pT.shape[0]
    seg_spec, own_spec, hbm_spec, scratch = _common_specs(
        geom, geom.cc_d, geom.spb_d)
    return pl.pallas_call(
        functools.partial(_density_kernel, cfg, mxu_rd2, chains),
        grid=(n_pad // geom.chunk,),
        in_specs=[seg_spec, own_spec, hbm_spec],
        out_specs=pl.BlockSpec((geom.chunk, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(_segs_batched(geom, plan), pT, cand)


def project_pass(cfg: SimConfig, pT: jax.Array, cand: jax.Array,
                 plan: SegPlan, interpret: bool = False,
                 mxu_proj: bool | None = None,
                 chains: int | None = None) -> jax.Array:
    """(pT with lambda column, cand (4, width) rows x,y,z,lambda) ->
    new pT (n_pad, 4)."""
    geom = cfg.geom
    if mxu_proj is None:
        mxu_proj = geom.mxu_proj
    if chains is None:
        chains = geom.chains_p
    n_pad = pT.shape[0]
    seg_spec, own_spec, hbm_spec, scratch = _common_specs(
        geom, geom.cc_p, geom.spb_p)
    return pl.pallas_call(
        functools.partial(_project_kernel, cfg, mxu_proj, chains),
        grid=(n_pad // geom.chunk,),
        in_specs=[seg_spec, own_spec, hbm_spec],
        out_specs=pl.BlockSpec((geom.chunk, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 4), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(_segs_batched(geom, plan), pT, cand)


def make_pT(cfg: SimConfig, p_sorted: jax.Array, n_pad: int) -> jax.Array:
    """(n, 3) sorted positions -> (n_pad, 4) own-side layout with zero
    lambda; padding rows carry the sentinel point."""
    n = p_sorted.shape[0]
    pT = jnp.full((n_pad, 4), SENTINEL, jnp.float32)
    pT = pT.at[:n, 0:3].set(p_sorted)
    return pT.at[:, 3].set(0.0)


def splice_lambda(cfg: SimConfig, p4: jax.Array, lam: jax.Array,
                  n_pad: int) -> jax.Array:
    """Write the freshly computed lambda column into row 3 of every shifted
    candidate copy (positions are already there from _p4_from_pT)."""
    g = cfg.geom
    stride = n_pad + g.cc_pad
    lam_t = lam.T
    for c in range(g.ncopies):
        p4 = jax.lax.dynamic_update_slice(
            p4, lam_t, (3, c * stride + c * g.qshift))
    return p4


def solve_pallas(cfg: SimConfig, p_sorted: jax.Array, sorted_cid_pad: jax.Array,
                 interpret: bool = False,
                 plan: SegPlan | None = None) -> jax.Array:
    """The full solver_iters-iteration Jacobi constraint solve. p_sorted
    (n, 3) sorted by cell id; sorted_cid_pad (n_pad,) with padding =
    num_nb_cells. Pass `plan` when the caller already built it from the
    same sorted cell ids (e.g. for its overflow counter) so the step does
    one build_plan, not two."""
    n = p_sorted.shape[0]
    n_pad = pad_to_chunks(cfg, n)
    if plan is None:
        plan = build_plan(cfg, sorted_cid_pad)
    pT = make_pT(cfg, p_sorted, n_pad)

    def body(_, pT):
        p4 = _p4_from_pT(cfg, pT)
        lam = density_pass(cfg, pT, p4, plan, interpret=interpret)
        pT = jax.lax.dynamic_update_slice(pT, lam, (0, 3))
        p4 = splice_lambda(cfg, p4, lam, n_pad)
        return project_pass(cfg, pT, p4, plan, interpret=interpret)

    pT = jax.lax.fori_loop(0, cfg.solver_iters, body, pT)
    return pT[:n, 0:3]
