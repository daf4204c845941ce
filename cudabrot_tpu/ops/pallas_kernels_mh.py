"""Metropolis-Hastings classify kernel: importance-sampled crop renders.

Uniform sampling cannot feed a deep crop: the c-regions whose orbits
visit a small canvas window shrink with the window (the measured 1e-5
seahorse window collected ~103 hits/px in 240 s and the hit mass falls
roughly with window area below that — benchmarks/PERF_NOTES.md
"Extended precision"), so the reference's draw-uniform-and-hope scheme
(cudabrot.cu:392-393) starves long before the f32/df32 precision floors
are reached. The classical fix is Boswell's Metropolis-Hastings
Buddhabrot: run Markov chains over c whose stationary density is
proportional to v(c) = the number of orbit points the sample deposits
on the canvas window (band-filtered), and weight each accepted orbit's
contribution by 1/v(c) so the rendered measure is exactly the uniform
one, re-expressed with importance sampling.

This kernel is the TPU-native form of that idea, built on the same
persistent-lane machinery as the production kernel
(cudabrot_tpu.ops.pallas_kernels — thin escape tracking, windowed
boundaries, Brent cycle detection, counter-based Threefry, pending-
register emission):

  * **One independent chain per lane.** MH is embarrassingly parallel
    across chains; 8k-64k lanes each carry their own chain state
    (current sample, its target value v, its escape index, a retention
    counter) next to the in-flight proposal's orbit registers. No
    cross-lane communication exists at all.
  * **Proposals live on the sample grid.** Samples were already drawn
    on a 2^24-point-per-axis grid of the sample domain
    (pallas_kernels._u32_to_domain); MH mutates the *grid indices* with
    symmetric integer offsets (sign x mantissa >> scale, scale
    log-uniform over 24 octaves — a Boswell-style multi-scale step),
    so proposals round-trip exactly through the f32 emission payload
    and out-of-domain proposals are a trivial bounds check. A uniform
    grid restart is mixed in with probability restart/256 (and forced
    while the chain is unseeded); both mixture components are
    symmetric, so the Metropolis acceptance is min(1, v'/v).
  * **The orbit evaluation IS the target evaluation.** The inner
    window counts in-window updated positions (vcnt) alongside the
    survival counter; at the boundary a finished proposal's
    v' = vcnt gates acceptance: accept iff u * v < v' (u uniform).
    The window is the exact canvas bounds (the df32 kernel tests it in
    CENTER-RELATIVE coordinates — absolute f32 bounds collapse below
    the center's ulp), so v' matches what replay
    will deposit (modulo the documented f32 replay-drift class and
    post-escape coast positions, which for any window inside |z| <= 2
    are provably out of window: escape means |z| > 2 with monotone
    growth).
  * **Batched contributions.** Rejections increment the chain's
    retention counter `rep` instead of re-emitting the same orbit; the
    chain state is emitted once per tenure (at the accept that retires
    it, or when rep reaches a cap) carrying rep AND the kernel's v.
  * **The kernel records the deposit BINS itself.** Every in-window
    updated position is quantized to its canvas bin in-kernel and
    recorded in a per-lane reservoir of `visit_slots` bins (plain
    slot-fill for the first V visits, classic reservoir replacement —
    keep-with-probability V/(j+1) into a uniform slot — beyond, so
    the recorded set is a uniform subsample of ALL the orbit's
    visits). Emissions ship (rep, t, bins) and the deposit is a pure
    scatter-add of weight w = rep*SCALE*TARGET_VISIT/t spread over the
    recorded bins (an exact integer Bresenham — total floor(v*w) per
    tenure, each recorded bin representing v/min(v,V) visits).

    Round 3 shipped (c, iters) instead and re-derived the bins by
    REPLAYING the orbit on the host. That design carried a fatal
    conditioning flaw this one removes: MH acceptance selects exactly
    the orbits whose KERNEL trajectory visits the window, and over
    long orbits any independent re-iteration (f64 host replay of the
    df32 kernel stream) decorrelates and misses the window it was
    selected for — measured on silicon as 99.96% of all tenure mass
    forfeited (`mh_lost_weight`) at the 1e-5 benchmark window. With
    kernel-recorded bins the deposit positions ARE the positions that
    drove acceptance: no replay, no drift class, no lost mass, and the
    host leaves the MH hot path entirely (deposits are an on-device
    scatter of <= V*slots indices per pass).

  * **Ergodicity bridge (in-band epsilon mass).** A chain whose target
    is v alone can only move BETWEEN visiting states (any proposal with
    v' = 0 is rejected) and can only SEED by a uniform restart landing
    directly on the visiting set — whose measure shrinks with the
    window. Measured on silicon at a 6e-3 window over the full domain:
    99.5% of all lane-steps were unseeded chains burning restarts
    (overall acceptance 0.06%) while seeded states accepted local
    moves at 13-55% (benchmarks/mh_scale_probe.py). The chains
    therefore target t(c) = TARGET_VISIT * min(v, 65535) + 1[in-band]:
    in-band non-visiting states carry 1/TARGET_VISIT of one visit's
    stationary mass, which (a) turns seeding into "hit the in-band
    set" — orders of magnitude easier than the visiting set — and (b)
    lets chains traverse between visiting filaments through the
    in-band bridge instead of requiring jumps that land exactly on
    another filament. The estimator stays EXACTLY unbiased for any
    positive target: deposits divide by the same t that drove
    acceptance (E_pi[deposit] = sum_x pi(x) * w * visits(x) / t(x)
    with pi = t/Z), the weight numerator is scaled by TARGET_VISIT to
    keep the 1/WEIGHT_SCALE deposit granularity (native replay, flags
    bit 2), and bridge states (t = 1) deposit nothing — they have no
    visits — so their tenures retire without emission.

Known, bounded deviations from the exact estimator (all surfaced as
counters): pending-register collisions are resolved by weighted
reservoir merging (expectation-preserving and exactly mass-conserving;
they only trade deposit identity between temporally-adjacent chain
states, a variance cost counted in rows STAT_MH_MERGE /
STAT_MH_MERGED_REP); in-flight tenures are flushed
and their counters reset whenever the engine reads the histogram
(PallasEngine._flush_mh_tails — without that flush the stickiest, i.e.
brightest, states would lose their final tenure); tenures with more
visits than `visit_slots` deposit on a uniform reservoir subsample of
their visit set (full mass, a pure variance cost; the reservoir draw
uses an LCG whose f32 acceptance compare is uniform to ~2^-23).
The end-to-end correctness contract is the same statistical one every
engine carries: tests compare a normalized MH render against a
normalized uniform-sampling render of the same configuration.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cudabrot_tpu.models.fractals import FractalMap
from cudabrot_tpu.ops.pallas_kernels import (
    _BIG,
    _SAVE0,
    STAT_CULLED,
    STAT_CYCLES,
    STAT_DRAWN,
    STAT_IN_BAND,
    STAT_WASTED,
    threefry2x32,
    window_seed,
)

#: Histogram counts are in units of 1/WEIGHT_SCALE so sub-unit weights
#: (rep < v_r) still deposit. Tone mapping max-normalizes, so the scale
#: cancels in the image; checkpoints record it (io/checkpoint metadata)
#: so MH and uniform histograms can never be silently mixed.
WEIGHT_SCALE = 256

#: Chain-target units per canvas visit (the ergodicity bridge, module
#: docstring): target t = TARGET_VISIT * min(v, _T_VCAP) + 1 for
#: in-band states, 0 otherwise. The +1 is the in-band epsilon; the
#: visit cap keeps t f32-exact for the acceptance compare AND t < 2^23
#: so the deposit's u32 long division (ops/binning.mh_deposit_weights)
#: never overflows — capping is harmless because acceptance and the
#: deposit divisor use the SAME capped t (any positive target is
#: unbiased).
TARGET_VISIT = 256
_T_VCAP = 32767

#: Extra MH stat rows appended after the base kernel's five.
STAT_MH_ACCEPT = 5  # accepted proposals (chain moves)
STAT_MH_MERGE = 6  # pending-slot reservoir merges (identity trades)
STAT_MH_MERGED_REP = 7  # min-side rep mass involved in those merges
MH_STATS_ROWS = 8

_TWO24 = 16777216  # grid points per axis
_INV24 = 5.9604644775390625e-08  # 2^-24


class MhLaneState(NamedTuple):
    """Per-lane chain + in-flight proposal state, (R, 128) each except
    the visit-bin reservoirs vb/xb, which are (visit_slots, R, 128)."""

    kr: jax.Array  # f32 proposal grid index (real axis, 0..2^24)
    ki: jax.Array  # f32 proposal grid index (imag axis)
    cr: jax.Array  # f32 proposal c (reconstructed at refill)
    ci: jax.Array
    zr: jax.Array  # f32 orbit position
    zi: jax.Array
    sr: jax.Array  # f32 Brent saved point
    si: jax.Array
    it: jax.Array  # i32 completed updates of the proposal
    sv: jax.Array  # i32 next Brent save index
    dead: jax.Array  # i32 1 => proposal invalid (culled / out of domain)
    vcnt: jax.Array  # i32 in-window updated positions so far
    rsv: jax.Array  # i32 reservoir LCG state (per lane)
    xkr: jax.Array  # f32 chain state grid index (real)
    xki: jax.Array  # f32 chain state grid index (imag)
    xv: jax.Array  # i32 chain target t(x) = 256*min(v,cap)+1[in-band]; 0 = unseeded
    xit: jax.Array  # i32 chain state escape index
    rep: jax.Array  # i32 chain steps the current state has been retained
    vb: jax.Array  # i32 (V,R,128) proposal visit-bin reservoir
    xb: jax.Array  # i32 (V,R,128) chain state visit-bin reservoir


def _init_rsv(shape) -> jax.Array:
    """Per-lane LCG seeds: distinct odd constants per lane (an LCG's
    trajectory separates immediately for distinct states; determinism
    across runs/backends is deliberate — the reservoir draw is part of
    the reproducible sample schedule)."""
    lane = (
        jax.lax.broadcasted_iota(jnp.int32, shape, 0) * jnp.int32(shape[1])
        + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    )
    return lane * jnp.int32(-1640531527) + jnp.int32(1)  # golden-ratio mix


def init_mh_lane_state(lane_rows: int, visit_slots: int = 8) -> MhLaneState:
    shape = (lane_rows, 128)
    vshape = (visit_slots, lane_rows, 128)
    f = lambda v: jnp.full(shape, v, jnp.float32)
    i = lambda v: jnp.full(shape, v, jnp.int32)
    return MhLaneState(
        kr=f(0.0), ki=f(0.0), cr=f(0.0), ci=f(0.0),
        zr=f(0.0), zi=f(0.0),
        sr=f(_BIG), si=f(_BIG),
        it=i(0), sv=i(_SAVE0),
        # All proposals start dead: the first boundary draws the first
        # real (restart) proposals; xv = 0 keeps them forced-uniform and
        # auto-accepted until every chain is seeded.
        dead=i(1),
        vcnt=i(0),
        rsv=_init_rsv(shape),
        xkr=f(0.0), xki=f(0.0), xv=i(0), xit=i(-1), rep=i(0),
        vb=jnp.zeros(vshape, jnp.int32),
        xb=jnp.zeros(vshape, jnp.int32),
    )


def _mh_boundary(
    fin, v_prop, needed, kr, ki,
    xkr, xki, xv, xit, rep, vb, xb,
    p_it, p_rep, p_v, p_b,
    rb_a, rb_b, rep_cap,
):
    """Shared chain-boundary logic (pure, mask-vectorized): Metropolis
    acceptance, tenure emission with weighted-reservoir collision
    merging, and the chain-state update. Used verbatim by the f32 and
    extended (df32) MH kernels so the subtle parts exist exactly once.
    Returns (accept, chain regs..., pending regs..., stat increments).
    See the step-level comments in the module docstring for the
    estimator arguments. ``vb``/``xb``/``p_b`` are the (V, R, 128)
    visit-bin reservoirs of the proposal / chain state / pending
    emission; they follow record identity exactly like xv."""
    # Metropolis acceptance on the bridge target: accept iff
    # u * t(x) < t(c') with u uniform in [0,1) (symmetric proposal).
    u24 = jax.lax.shift_right_logical(
        rb_a, jnp.uint32(8)
    ).astype(jnp.int32).astype(jnp.float32) * jnp.float32(_INV24)
    accept = fin & (
        v_prop.astype(jnp.float32) > u24 * xv.astype(jnp.float32)
    )

    # Emission: retire the old tenure on accept; force-emit at the rep
    # cap so tenures cannot grow unbounded. Only tenures WITH visits
    # emit (xv > 1, i.e. t >= TARGET_VISIT + 1): bridge states (t = 1,
    # in-band but never visiting) have nothing to deposit — their
    # tenures retire silently, and their rep still resets at the cap so
    # a sticky bridge state cannot overflow the counter.
    rep_rej = rep + 1
    emit_ok = xv > jnp.int32(1)
    emit = accept & emit_ok & (rep > 0)
    at_cap = fin & ~accept & (rep_rej >= jnp.int32(rep_cap))
    force = at_cap & emit_ok
    emit_any = emit | force
    rep_used = jnp.where(emit, rep, rep_rej)
    # Pending-slot collision => WEIGHTED RESERVOIR MERGE, not an
    # overwrite: keep the NEW record with probability
    # rep_new / (mass_old + rep_new) and carry the summed mass either
    # way. E[mass credited to each state] equals its true rep (weighted
    # reservoir sampling), and the realized total is conserved exactly
    # — a plain last-writer-wins overwrite measured a 14.5% tenure-mass
    # loss at a high-acceptance (48%) easy crop, where no single-slot
    # flush sizing can keep collisions rare. Merges only trade deposit
    # identity between temporally-adjacent chain states (a variance
    # cost), counted in the stats.
    occupied = p_it >= 0
    merged = emit_any & occupied
    tot = p_rep + rep_used
    u12 = (
        jax.lax.shift_right_logical(rb_b, jnp.uint32(20))
        & jnp.uint32(0xFFF)
    ).astype(jnp.int32).astype(jnp.float32)
    take_new = ~occupied | (
        u12 * tot.astype(jnp.float32)
        < jnp.float32(4096.0) * rep_used.astype(jnp.float32)
    )
    upd = emit_any & take_new
    d_merges = jnp.where(merged, jnp.int32(1), 0)
    d_merged_rep = jnp.where(merged, jnp.minimum(p_rep, rep_used), 0)
    p_it = jnp.where(upd, xit, p_it)
    p_v = jnp.where(upd, xv, p_v)
    p_b = jnp.where(upd[None], xb, p_b)
    p_rep = jnp.where(emit_any, jnp.where(occupied, tot, rep_used), p_rep)

    # Chain update (the retiring proposal's reservoir becomes the new
    # chain state's — AFTER the pending copy above took the old xb).
    xkr = jnp.where(accept, kr, xkr)
    xki = jnp.where(accept, ki, xki)
    xv = jnp.where(accept, v_prop, xv)
    xit = jnp.where(accept, needed, xit)
    xb = jnp.where(accept[None], vb, xb)
    rep = jnp.where(
        accept,
        jnp.int32(1),
        jnp.where(fin, jnp.where(at_cap, jnp.int32(0), rep_rej), rep),
    )
    return (accept, xkr, xki, xv, xit, rep, xb,
            p_it, p_rep, p_v, p_b, d_merges, d_merged_rep)


def _record_visit(vis, dr, di, jvis, rsv, vb, bin_map):
    """Reservoir-record one (masked) canvas visit per lane.

    ``vis``: this step's in-window mask; ``dr``/``di``: the updated
    position in the window's own coordinates (absolute for the f32
    kernel, center-relative for df32); ``jvis``: visits recorded so far
    this proposal (the 0-based index of THIS visit where vis holds);
    ``rsv``: per-lane LCG state; ``vb``: (V, R, 128) reservoir.
    ``bin_map`` = (wx0, wy0, inv_dx, inv_dy, width, height) static f32/
    int constants. Returns (rsv', vb').

    First V visits fill slots in order (the acceptance compare is then
    vacuously true); visit j >= V replaces a uniform slot with
    probability V/(j+1) — the classic reservoir, so the recorded set is
    a uniform subsample of all visits. The LCG advances every step
    (masked lanes included) to stay branch-free."""
    wx0, wy0, inv_dx, inv_dy, width, height = bin_map
    v_slots = vb.shape[0]
    col = ((dr - jnp.float32(wx0)) * jnp.float32(inv_dx)).astype(jnp.int32)
    row = ((di - jnp.float32(wy0)) * jnp.float32(inv_dy)).astype(jnp.int32)
    # The window test guarantees in-range up to one f32 rounding at the
    # upper edge; clamp so a boundary visit can never leave the canvas.
    col = jnp.minimum(col, jnp.int32(width - 1))
    row = jnp.minimum(row, jnp.int32(height - 1))
    bin_ = row * jnp.int32(width) + col
    rsv = rsv * jnp.int32(1664525) + jnp.int32(1013904223)
    mix = rsv ^ jax.lax.shift_right_logical(
        rsv.astype(jnp.uint32), jnp.uint32(16)
    ).astype(jnp.int32)
    u24 = jax.lax.shift_right_logical(
        mix.astype(jnp.uint32), jnp.uint32(8)
    ).astype(jnp.int32).astype(jnp.float32)
    take = vis & (
        u24 * (jvis + 1).astype(jnp.float32)
        < jnp.float32(v_slots) * jnp.float32(_TWO24)
    )
    slot = jnp.where(
        jvis < jnp.int32(v_slots), jvis, mix & jnp.int32(v_slots - 1)
    )
    kidx = jax.lax.broadcasted_iota(jnp.int32, vb.shape, 0)
    hit = take[None] & (kidx == slot[None])
    return rsv, jnp.where(hit, bin_[None], vb)


def _mh_bits(
    rng, chunk, widx, n_windows, shape,
    seed_ref, bits_ref, lane_iota, tf_k0, tf_k1,
):
    """Shared boundary randomness: four u32 words per boundary —
    mutation mantissas (2), the acceptance word, and the control word.
    The second threefry call partitions the counter space with bit 30
    (lane ids are < 2^24, so the spaces are disjoint); keeping this in
    one place keeps the f32 and df32 kernels' streams aligned."""
    if rng == "threefry":
        gwin = (chunk * jnp.int32(n_windows) + widx).astype(jnp.uint32)
        rb_r, rb_i = threefry2x32(tf_k0, tf_k1, lane_iota, gwin)
        rb_a, rb_b = threefry2x32(
            tf_k0, tf_k1, lane_iota | jnp.uint32(0x40000000), gwin
        )
        return rb_r, rb_i, rb_a, rb_b
    if rng == "hardware_rw":
        gwin = (chunk * jnp.int32(n_windows) + widx).astype(jnp.uint32)
        pltpu.prng_seed(window_seed(seed_ref[0], gwin))
    if rng in ("hardware", "hardware_rw"):
        draw = lambda: pltpu.bitcast(
            pltpu.prng_random_bits(shape), jnp.uint32
        )
        return draw(), draw(), draw(), draw()
    return (
        bits_ref[0, widx, 0],
        bits_ref[0, widx, 1],
        bits_ref[0, widx, 2],
        bits_ref[0, widx, 3],
    )


def _mh_propose(xkr, xki, xv, rb_r, rb_i, rb_b, restart256: int):
    """Shared proposal draw (pure): symmetric multi-scale integer
    mutation of the chain's grid indices mixed with a uniform restart
    (forced while the chain is unseeded). Returns
    (nk_r, nk_i [i32, clipped in-range], oob) — out-of-domain locals
    keep an in-range index (exact f32 conversion) but must resolve as
    dead rejections."""
    m24_r = jax.lax.shift_right_logical(rb_r, jnp.uint32(8)).astype(
        jnp.int32
    )
    m24_i = jax.lax.shift_right_logical(rb_i, jnp.uint32(8)).astype(
        jnp.int32
    )
    sign_r = (rb_b & jnp.uint32(1)) != 0
    sign_i = (rb_b & jnp.uint32(2)) != 0
    # min in int32: Mosaic has no vector arith.minui lowering on TPU
    # (observed "failed to legalize operation 'arith.minui'"); the
    # operands are 5-bit values so signed min is bit-identical.
    sh_r = jnp.minimum(
        (jax.lax.shift_right_logical(rb_b, jnp.uint32(2))
         & jnp.uint32(31)).astype(jnp.int32),
        jnp.int32(23),
    ).astype(jnp.uint32)
    sh_i = jnp.minimum(
        (jax.lax.shift_right_logical(rb_b, jnp.uint32(7))
         & jnp.uint32(31)).astype(jnp.int32),
        jnp.int32(23),
    ).astype(jnp.uint32)
    off_r = jax.lax.shift_right_logical(
        m24_r.astype(jnp.uint32), sh_r
    ).astype(jnp.int32)
    off_i = jax.lax.shift_right_logical(
        m24_i.astype(jnp.uint32), sh_i
    ).astype(jnp.int32)
    dk_r = jnp.where(sign_r, -off_r, off_r)
    dk_i = jnp.where(sign_i, -off_i, off_i)
    restart8 = (
        jax.lax.shift_right_logical(rb_b, jnp.uint32(12))
        & jnp.uint32(255)
    ).astype(jnp.int32)
    restart = (restart8 < jnp.int32(restart256)) | (xv == 0)
    loc_r = xkr.astype(jnp.int32) + dk_r
    loc_i = xki.astype(jnp.int32) + dk_i
    nk_r = jnp.where(restart, m24_r, loc_r)
    nk_i = jnp.where(restart, m24_i, loc_i)
    oob = ~restart & (
        (loc_r < 0) | (loc_r >= jnp.int32(_TWO24))
        | (loc_i < 0) | (loc_i >= jnp.int32(_TWO24))
    )
    nk_r = jnp.clip(nk_r, 0, jnp.int32(_TWO24 - 1))
    nk_i = jnp.clip(nk_i, 0, jnp.int32(_TWO24 - 1))
    return nk_r, nk_i, oob


def _make_kernel_mh(
    fractal: FractalMap,
    *,
    min_it: int,
    max_it: int,
    steps_per_flush: int,
    cycle_detection: bool,
    rng: str,
    inner_unroll: int,
    sample_domain: tuple,
    window: tuple,
    restart256: int,
    rep_cap: int,
    canvas_wh: tuple,
    visit_slots: int,
):
    """Build the MH kernel body. The iterate/terminate scaffolding
    mirrors pallas_kernels._make_kernel's thin-tracking path (see there
    for the soundness arguments and cudabrot.cu citations); the refill
    block is replaced by the chain logic documented in the module
    docstring."""
    detect = cycle_detection and fractal.cycle_detect
    use_cull = fractal.use_cull
    fold_abs = fractal.fold_abs
    emit_interior = fractal.emit == "interior"
    n_windows = steps_per_flush // inner_unroll
    dom_r0, dom_r1, dom_i0, dom_i1 = sample_domain
    span_r = dom_r1 - dom_r0
    span_i = dom_i1 - dom_i0
    cv_w, cv_h = canvas_wh
    bin_map = (
        window[0], window[2],
        cv_w / (window[1] - window[0]),
        cv_h / (window[3] - window[2]),
        cv_w, cv_h,
    )

    def kernel(*refs):
        if rng != "bits":
            (seed_ref,
             *_ins,
             kr_ref, ki_ref, cr_ref, ci_ref, zr_ref, zi_ref,
             sr_ref, si_ref, it_ref, sv_ref, dead_ref, vcnt_ref,
             rsv_ref, xkr_ref, xki_ref, xv_ref, xit_ref, rep_ref,
             vb_ref, xb_ref,
             emit_it_ref, emit_rep_ref, emit_v_ref, emit_b_ref,
             stats_ref,
             pend_it, pend_rep, pend_v, pend_b,
             counters) = refs
            bits_ref = None
        else:
            (seed_ref, bits_ref,
             *_ins,
             kr_ref, ki_ref, cr_ref, ci_ref, zr_ref, zi_ref,
             sr_ref, si_ref, it_ref, sv_ref, dead_ref, vcnt_ref,
             rsv_ref, xkr_ref, xki_ref, xv_ref, xit_ref, rep_ref,
             vb_ref, xb_ref,
             emit_it_ref, emit_rep_ref, emit_v_ref, emit_b_ref,
             stats_ref,
             pend_it, pend_rep, pend_v, pend_b,
             counters) = refs
        chunk = pl.program_id(0)
        if rng == "hardware":
            pltpu.prng_seed(window_seed(seed_ref[0], chunk))

        @pl.when(chunk == 0)
        def _init_scratch():
            pend_it[...] = jnp.full_like(pend_it, -1)
            pend_rep[...] = jnp.zeros_like(pend_rep)
            pend_v[...] = jnp.zeros_like(pend_v)
            pend_b[...] = jnp.zeros_like(pend_b)
            counters[...] = jnp.zeros_like(counters)

        min_i = jnp.int32(min_it)
        max_i = jnp.int32(max_it)
        shape = kr_ref.shape
        if rng == "threefry":
            lane_iota = (
                jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
                * jnp.uint32(shape[1])
                + jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
            )
            tf_k0 = seed_ref[0].astype(jnp.uint32)
            tf_k1 = seed_ref[1].astype(jnp.uint32)
        wx0, wx1, wy0, wy1 = (jnp.float32(v) for v in window)

        def step(widx, s):
            (kr, ki, cr, ci, zr, zi, sr, si, it, sv, dead, vcnt,
             rsv, xkr, xki, xv, xit, rep, vb, xb,
             p_it, p_rep, p_v, p_b,
             n_drawn, n_cull, n_band, n_cyc, n_waste,
             n_acc, n_ovw, n_lost) = s

            # --- inner window: thin tracking + in-window counting +
            # visit-bin reservoir recording (_record_visit) ---
            azr, azi = zr, zi
            nesc = jnp.zeros_like(it)
            jv = vcnt
            r2 = azr * azr
            i2 = azi * azi
            for _ in range(inner_unroll):
                nzr = r2 - i2 + cr
                if fold_abs:
                    nzi = 2.0 * jnp.abs(azr * azi) + ci
                else:
                    nzi = 2.0 * azr * azi + ci
                azr, azi = nzr, nzi
                r2 = azr * azr
                i2 = azi * azi
                nesc = nesc + (r2 + i2 <= 4.0).astype(jnp.int32)
                # Updated positions inside the canvas window drive the
                # chain target v(c) AND are the deposit positions.
                # Post-escape coast positions cannot land in a window
                # within |z| <= 2 (escape is monotone growth past 2)
                # and NaN compares false.
                vis = (
                    (azr >= wx0) & (azr < wx1)
                    & (azi >= wy0) & (azi < wy1)
                )
                rsv, vb = _record_visit(
                    vis, azr, azi, jv, rsv, vb, bin_map
                )
                jv = jv + vis.astype(jnp.int32)
            vcnt_new = jv
            esc_mask = nesc < jnp.int32(inner_unroll)
            needed = it + nesc
            if detect:
                cyc_mask = (azr == sr) & (azi == si) & ~esc_mask
            else:
                cyc_mask = jnp.zeros(azr.shape, bool)

            it_new = it + inner_unroll

            # --- boundary: proposal resolution ---
            maxed = it_new >= max_i
            deadb = dead != 0
            fin = esc_mask | cyc_mask | maxed | deadb
            if emit_interior:
                # Anti-Buddhabrot: candidates are samples that finish
                # WITHOUT escaping within the cap (proven periodic or
                # capped — the base kernels' interior semantics incl.
                # the window-overshoot guard); their target v is the
                # in-window count over the full capped orbit, and the
                # replay bound is max_it - 1 like the uniform engines.
                esc_in_cap = esc_mask & (needed < max_i)
                cand = (cyc_mask | maxed) & ~esc_in_cap & ~deadb
                needed = jnp.where(cand, max_i - 1, needed)
            else:
                cand = (
                    esc_mask & ~deadb
                    & (needed >= min_i) & (needed < max_i)
                )
            # Ergodicity-bridge target (module docstring): in-band
            # states score TARGET_VISIT per (capped) visit plus the
            # in-band epsilon of 1; never-visiting in-band states stay
            # proposable bridge states instead of dead ends.
            v_prop = jnp.where(
                cand,
                jnp.minimum(vcnt_new, jnp.int32(_T_VCAP))
                * jnp.int32(TARGET_VISIT) + 1,
                0,
            )

            # --- boundary randomness (shared, _mh_bits) ---
            rb_r, rb_i, rb_a, rb_b = _mh_bits(
                rng, chunk, widx, n_windows, shape,
                seed_ref, bits_ref,
                lane_iota if rng == "threefry" else None,
                tf_k0 if rng == "threefry" else None,
                tf_k1 if rng == "threefry" else None,
            )

            # --- acceptance + reservoir emission + chain update (the
            # shared core, _mh_boundary) ---
            (accept, xkr, xki, xv, xit, rep, xb,
             p_it, p_rep, p_v, p_b,
             d_merges, d_merged) = _mh_boundary(
                fin, v_prop, needed, kr, ki,
                xkr, xki, xv, xit, rep, vb, xb,
                p_it, p_rep, p_v, p_b,
                rb_a, rb_b, rep_cap,
            )
            n_ovw = n_ovw + d_merges
            n_lost = n_lost + d_merged

            # --- Brent checkpoint (boundary schedule, as the base
            # kernel) ---
            if detect:
                at_save = (it_new >= sv) & ~fin
                sr2 = jnp.where(at_save, azr, sr)
                si2 = jnp.where(at_save, azi, si)
                sv2 = jnp.where(at_save, sv * 2, sv)
            else:
                sr2, si2, sv2 = sr, si, sv

            # --- proposal draw for finished lanes (_mh_propose) ---
            nk_r, nk_i, oob = _mh_propose(
                xkr, xki, xv, rb_r, rb_i, rb_b, restart256
            )
            nkr_f = nk_r.astype(jnp.float32)
            nki_f = nk_i.astype(jnp.float32)
            # c reconstruction: the exact refill arithmetic of
            # pallas_kernels._u32_to_domain, evaluated from the grid
            # index (the host replay decode repeats it verbatim).
            ncr = (
                nkr_f * jnp.float32(_INV24) * jnp.float32(span_r)
                + jnp.float32(dom_r0)
            )
            nci = (
                nki_f * jnp.float32(_INV24) * jnp.float32(span_i)
                + jnp.float32(dom_i0)
            )
            if use_cull:
                imag_sq = nci * nci
                q = (ncr - 0.25)
                q = q * q + imag_sq
                card = q * (q + (ncr - 0.25)) < imag_sq * 0.25
                t = ncr + 1.0
                bulb = (t * t + imag_sq) < 0.0625
                ncull = card | bulb | oob
            else:
                ncull = oob

            kr = jnp.where(fin, nkr_f, kr)
            ki = jnp.where(fin, nki_f, ki)
            cr = jnp.where(fin, ncr, cr)
            ci = jnp.where(fin, nci, ci)
            zr = jnp.where(fin, ncr, azr)
            zi = jnp.where(fin, nci, azi)
            it = jnp.where(fin, 0, it_new)
            sr = jnp.where(fin, jnp.float32(_BIG), sr2)
            si = jnp.where(fin, jnp.float32(_BIG), si2)
            sv = jnp.where(fin, jnp.int32(_SAVE0), sv2)
            dead = jnp.where(fin, ncull.astype(jnp.int32), dead)
            vcnt = jnp.where(fin, 0, vcnt_new)

            one = jnp.int32(1)
            zero = jnp.int32(0)
            unroll = jnp.int32(inner_unroll)
            n_drawn = n_drawn + jnp.where(fin, one, zero)
            n_cull = n_cull + jnp.where(fin & ncull, one, zero)
            n_band = n_band + jnp.where(v_prop > 0, one, zero)
            n_cyc = n_cyc + jnp.where(cyc_mask & ~deadb, one, zero)
            n_waste = n_waste + jnp.where(deadb, unroll, zero)
            n_waste = n_waste + jnp.where(
                esc_mask & ~deadb, it_new - needed - 1, zero
            )
            n_acc = n_acc + jnp.where(accept, one, zero)
            return (kr, ki, cr, ci, zr, zi, sr, si, it, sv, dead, vcnt,
                    rsv, xkr, xki, xv, xit, rep, vb, xb,
                    p_it, p_rep, p_v, p_b,
                    n_drawn, n_cull, n_band, n_cyc, n_waste,
                    n_acc, n_ovw, n_lost)

        carry = (
            kr_ref[...], ki_ref[...], cr_ref[...], ci_ref[...],
            zr_ref[...], zi_ref[...], sr_ref[...], si_ref[...],
            it_ref[...], sv_ref[...], dead_ref[...], vcnt_ref[...],
            rsv_ref[...], xkr_ref[...], xki_ref[...], xv_ref[...],
            xit_ref[...], rep_ref[...], vb_ref[...], xb_ref[...],
            pend_it[...], pend_rep[...], pend_v[...], pend_b[...],
            counters[STAT_DRAWN], counters[STAT_CULLED],
            counters[STAT_IN_BAND], counters[STAT_CYCLES],
            counters[STAT_WASTED], counters[STAT_MH_ACCEPT],
            counters[STAT_MH_MERGE], counters[STAT_MH_MERGED_REP],
        )
        carry = jax.lax.fori_loop(
            0, steps_per_flush // inner_unroll, step, carry
        )
        (kr, ki, cr, ci, zr, zi, sr, si, it, sv, dead, vcnt,
         rsv, xkr, xki, xv, xit, rep, vb, xb,
         p_it, p_rep, p_v, p_b,
         n_drawn, n_cull, n_band, n_cyc, n_waste,
         n_acc, n_ovw, n_lost) = carry

        kr_ref[...] = kr
        ki_ref[...] = ki
        cr_ref[...] = cr
        ci_ref[...] = ci
        zr_ref[...] = zr
        zi_ref[...] = zi
        sr_ref[...] = sr
        si_ref[...] = si
        it_ref[...] = it
        sv_ref[...] = sv
        dead_ref[...] = dead
        vcnt_ref[...] = vcnt
        rsv_ref[...] = rsv
        xkr_ref[...] = xkr
        xki_ref[...] = xki
        xv_ref[...] = xv
        xit_ref[...] = xit
        rep_ref[...] = rep
        vb_ref[...] = vb
        xb_ref[...] = xb
        counters[STAT_DRAWN] = n_drawn
        counters[STAT_CULLED] = n_cull
        counters[STAT_IN_BAND] = n_band
        counters[STAT_CYCLES] = n_cyc
        counters[STAT_WASTED] = n_waste
        counters[STAT_MH_ACCEPT] = n_acc
        counters[STAT_MH_MERGE] = n_ovw
        counters[STAT_MH_MERGED_REP] = n_lost
        stats_ref[...] = counters[...]

        emit_it_ref[0] = p_it
        emit_rep_ref[0] = p_rep
        emit_v_ref[0] = p_v
        emit_b_ref[0] = p_b
        pend_it[...] = jnp.full_like(p_it, -1)
        pend_rep[...] = jnp.zeros_like(p_rep)
        pend_v[...] = jnp.zeros_like(p_v)
        pend_b[...] = jnp.zeros_like(p_b)

    return kernel


class MhClassifyResult(NamedTuple):
    state: MhLaneState
    emit_it: jax.Array  # (chunks, R, 128) i32 — escape index, -1 invalid
    emit_rep: jax.Array  # (chunks, R, 128) i32 — tenure chain steps
    emit_v: jax.Array  # (chunks, R, 128) i32 — the chain's target t
    emit_bins: jax.Array  # (chunks, V, R, 128) i32 — visit-bin reservoir
    stats: jax.Array  # (MH_STATS_ROWS, R, 128) i32 per-lane counters


@functools.partial(
    jax.jit,
    static_argnames=(
        "fractal", "min_it", "max_it", "steps_per_pass", "steps_per_flush",
        "cycle_detection", "interpret", "inner_unroll", "rng",
        "sample_domain", "window", "restart256", "rep_cap", "canvas_wh",
    ),
    donate_argnums=(0,),
)
def classify_pass_mh(
    state: MhLaneState,
    seed: jax.Array,
    bits: jax.Array | None = None,
    *,
    fractal: FractalMap,
    min_it: int,
    max_it: int,
    steps_per_pass: int,
    steps_per_flush: int,
    cycle_detection: bool = True,
    interpret: bool = False,
    inner_unroll: int = 1,
    rng: str | None = None,
    sample_domain: tuple = (-2.0, 2.0, -2.0, 2.0),
    window: tuple = (-2.0, 2.0, -2.0, 2.0),
    restart256: int = 16,
    rep_cap: int = 4096,
    canvas_wh: tuple = (1000, 1000),
) -> MhClassifyResult:
    """One MH chain pass: same call contract as
    pallas_kernels.classify_pass with visit-bin emissions plus rep and
    target rows. ``window`` is the exact canvas bounds (the chain
    target AND the bin map, with ``canvas_wh`` giving its pixel grid);
    ``restart256`` is the uniform-restart mixture weight in 1/256ths;
    ``rep_cap`` bounds tenure batching (validated <= 32767 upstream so
    the u32 deposit arithmetic cannot overflow). ``bits`` mode expects
    FOUR u32 words per boundary: mutation mantissas (2), acceptance
    word, and the control word (signs/scales/restart). The reservoir
    width (visit_slots) is carried by the state's vb/xb leading axis."""
    if steps_per_pass % steps_per_flush != 0:
        raise ValueError("steps_per_pass must be a multiple of steps_per_flush")
    if steps_per_flush % inner_unroll != 0:
        raise ValueError("steps_per_flush must be a multiple of inner_unroll")
    if not (0 <= restart256 <= 256):
        raise ValueError("restart256 must be in [0, 256]")
    if rep_cap < 2:
        raise ValueError("rep_cap must be at least 2")
    chunks = steps_per_pass // steps_per_flush
    windows = steps_per_flush // inner_unroll
    lane_rows = state.kr.shape[0]
    visit_slots = state.vb.shape[0]
    if visit_slots & (visit_slots - 1):
        raise ValueError("visit_slots must be a power of two")
    shape = (lane_rows, 128)
    vshape = (visit_slots, lane_rows, 128)
    if rng is None:
        rng = "bits" if bits is not None else "threefry"
    if rng not in ("threefry", "hardware", "hardware_rw", "bits"):
        raise ValueError(f"Unknown rng mode: {rng}")
    if (rng == "bits") != (bits is not None):
        raise ValueError("bits must be supplied iff rng == 'bits'")

    kernel = _make_kernel_mh(
        fractal,
        min_it=min_it,
        max_it=max_it,
        steps_per_flush=steps_per_flush,
        cycle_detection=cycle_detection,
        rng=rng,
        inner_unroll=inner_unroll,
        sample_domain=sample_domain,
        window=window,
        restart256=restart256,
        rep_cap=rep_cap,
        canvas_wh=canvas_wh,
        visit_slots=visit_slots,
    )

    f32 = jnp.float32
    i32 = jnp.int32
    n_state = len(MhLaneState._fields)
    state_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_state
    out_state_shapes = [
        jax.ShapeDtypeStruct(x.shape, x.dtype) for x in state
    ]

    seed = jnp.asarray(seed)
    if seed.ndim == 0:
        seed_arr = jnp.stack(
            [
                seed.astype(jnp.uint32),
                seed.astype(jnp.uint32) ^ jnp.uint32(0x3C6EF372),
            ]
        )
    else:
        seed_arr = seed.reshape((2,)).astype(jnp.uint32)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    inputs = [seed_arr.astype(jnp.int32)]
    if rng == "bits":
        if bits.shape != (chunks, windows, 4, lane_rows, 128):
            raise ValueError(f"bits has wrong shape {bits.shape}")
        in_specs.append(
            pl.BlockSpec(
                (1, windows, 4, lane_rows, 128),
                lambda i: (i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        inputs.append(bits.astype(jnp.uint32))
    in_specs.extend(state_specs)
    inputs.extend(state)
    state_in_base = len(in_specs) - n_state

    out = pl.pallas_call(
        kernel,
        grid=(chunks,),
        in_specs=in_specs,
        out_specs=[
            *state_specs,
            pl.BlockSpec(
                (1, lane_rows, 128),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, lane_rows, 128),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, lane_rows, 128),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, visit_slots, lane_rows, 128),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # stats (revisited)
        ],
        out_shape=[
            *out_state_shapes,
            jax.ShapeDtypeStruct((chunks, lane_rows, 128), i32),
            jax.ShapeDtypeStruct((chunks, lane_rows, 128), i32),
            jax.ShapeDtypeStruct((chunks, lane_rows, 128), i32),
            jax.ShapeDtypeStruct((chunks, visit_slots, lane_rows, 128), i32),
            jax.ShapeDtypeStruct((MH_STATS_ROWS, lane_rows, 128), i32),
        ],
        scratch_shapes=[
            pltpu.VMEM(shape, i32),  # pend_it
            pltpu.VMEM(shape, i32),  # pend_rep
            pltpu.VMEM(shape, i32),  # pend_v
            pltpu.VMEM(vshape, i32),  # pend_b
            pltpu.VMEM((MH_STATS_ROWS,) + shape, i32),  # counters
        ],
        input_output_aliases={state_in_base + i: i for i in range(n_state)},
        interpret=interpret,
    )(*inputs)

    new_state = MhLaneState(*out[:n_state])
    return MhClassifyResult(
        state=new_state,
        emit_it=out[n_state],
        emit_rep=out[n_state + 1],
        emit_v=out[n_state + 2],
        emit_bins=out[n_state + 3],
        stats=out[n_state + 4],
    )


# ----------------------------------------------------------------------
# Extended-precision (df32) MH: deep-zoom importance sampling. The same
# chain machinery (_mh_boundary/_mh_propose — proposals already live on
# a 2^24 grid in both kernels) over the df32 orbit arithmetic of
# ops/pallas_kernels_ext, so MH signal recovery reaches the deep-zoom
# windows (1e-4 .. ~1e-11) where uniform sampling starves hardest.
# Emissions carry (iters, rep, t, visit bins); deposits are the same
# on-device scatter as the f32 kernel — bins are quantized from the
# CENTER-RELATIVE df32 position, which stays sub-pixel-sharp at any
# window depth (the absolute-coordinate ulp problem never enters).
# ----------------------------------------------------------------------


class ExtMhLaneState(NamedTuple):
    """Per-lane df32 chain + proposal state, (R, 128) each except the
    (visit_slots, R, 128) visit-bin reservoirs vb/xb."""

    kr: jax.Array  # f32 proposal window-grid index (real)
    ki: jax.Array
    crh: jax.Array  # df32 proposal c
    crl: jax.Array
    cih: jax.Array
    cil: jax.Array
    zr: jax.Array  # df32 orbit position
    zrl: jax.Array
    zi: jax.Array
    zil: jax.Array
    sr: jax.Array  # f32 Brent saved point (hi components)
    si: jax.Array
    it: jax.Array  # i32
    sv: jax.Array  # i32
    dead: jax.Array  # i32
    vcnt: jax.Array  # i32 in-window updated positions (hi compare)
    rsv: jax.Array  # i32 reservoir LCG state
    xkr: jax.Array  # f32 chain state window-grid index
    xki: jax.Array
    xv: jax.Array  # i32
    xit: jax.Array  # i32
    rep: jax.Array  # i32
    vb: jax.Array  # i32 (V,R,128) proposal visit-bin reservoir
    xb: jax.Array  # i32 (V,R,128) chain state visit-bin reservoir


def init_ext_mh_lane_state(
    lane_rows: int, visit_slots: int = 8
) -> ExtMhLaneState:
    shape = (lane_rows, 128)
    vshape = (visit_slots, lane_rows, 128)
    f = lambda v: jnp.full(shape, v, jnp.float32)
    i = lambda v: jnp.full(shape, v, jnp.int32)
    return ExtMhLaneState(
        kr=f(0.0), ki=f(0.0),
        crh=f(0.0), crl=f(0.0), cih=f(0.0), cil=f(0.0),
        zr=f(0.0), zrl=f(0.0), zi=f(0.0), zil=f(0.0),
        sr=f(_BIG), si=f(_BIG),
        it=i(0), sv=i(_SAVE0),
        dead=i(1), vcnt=i(0),
        rsv=_init_rsv(shape),
        xkr=f(0.0), xki=f(0.0), xv=i(0), xit=i(-1), rep=i(0),
        vb=jnp.zeros(vshape, jnp.int32),
        xb=jnp.zeros(vshape, jnp.int32),
    )


def _make_kernel_ext_mh(
    fractal: FractalMap,
    *,
    min_it: int,
    max_it: int,
    steps_per_flush: int,
    cycle_detection: bool,
    rng: str,
    inner_unroll: int,
    sample_domain: tuple,
    window: tuple,
    restart256: int,
    rep_cap: int,
    canvas_wh: tuple,
    visit_slots: int,
):
    """df32 MH kernel body: the ext kernel's inner window/refill
    structure (pallas_kernels_ext._make_kernel_ext — SMEM-riding df32
    center constants, sealed products) with the MH chain boundary of
    _mh_boundary/_mh_propose. Window hits test hi components only: the
    ~2^-24-relative slop only perturbs v by a borderline-point class,
    which acceptance AND weights share (same divisor), so the estimator
    calibration is unaffected."""
    from cudabrot_tpu.ops import df32 as df32_ops
    from cudabrot_tpu.ops import pallas_kernels_ext as pke_mod

    detect = cycle_detection and fractal.cycle_detect
    use_cull = fractal.use_cull
    fold_abs = fractal.fold_abs
    emit_interior = fractal.emit == "interior"
    n_windows = steps_per_flush // inner_unroll
    _, _, step_r, step_i = pke_mod.grid_params(sample_domain)
    two23 = pke_mod._TWO23
    cv_w, cv_h = canvas_wh
    # Bin map in the same CENTER-RELATIVE coordinates as the window
    # test: dr spans [wx0, wx1) over cv_w pixels.
    bin_map = (
        window[0], window[2],
        cv_w / (window[1] - window[0]),
        cv_h / (window[3] - window[2]),
        cv_w, cv_h,
    )

    def kernel(*refs):
        if rng != "bits":
            (seed_ref, cref,
             *_ins,
             kr_ref, ki_ref, crh_ref, crl_ref, cih_ref, cil_ref,
             zr_ref, zrl_ref, zi_ref, zil_ref, sr_ref, si_ref,
             it_ref, sv_ref, dead_ref, vcnt_ref,
             rsv_ref, xkr_ref, xki_ref, xv_ref, xit_ref, rep_ref,
             vb_ref, xb_ref,
             emit_it_ref, emit_rep_ref, emit_v_ref, emit_b_ref,
             stats_ref,
             pend_it, pend_rep, pend_v, pend_b,
             counters) = refs
            bits_ref = None
        else:
            (seed_ref, cref, bits_ref,
             *_ins,
             kr_ref, ki_ref, crh_ref, crl_ref, cih_ref, cil_ref,
             zr_ref, zrl_ref, zi_ref, zil_ref, sr_ref, si_ref,
             it_ref, sv_ref, dead_ref, vcnt_ref,
             rsv_ref, xkr_ref, xki_ref, xv_ref, xit_ref, rep_ref,
             vb_ref, xb_ref,
             emit_it_ref, emit_rep_ref, emit_v_ref, emit_b_ref,
             stats_ref,
             pend_it, pend_rep, pend_v, pend_b,
             counters) = refs
        chunk = pl.program_id(0)
        c0rh_ = cref[0]
        c0rl_ = cref[1]
        c0ih_ = cref[2]
        c0il_ = cref[3]
        rtz = cref[4]
        if rng == "hardware":
            pltpu.prng_seed(window_seed(seed_ref[0], chunk))

        @pl.when(chunk == 0)
        def _init_scratch():
            pend_it[...] = jnp.full_like(pend_it, -1)
            pend_rep[...] = jnp.zeros_like(pend_rep)
            pend_v[...] = jnp.zeros_like(pend_v)
            pend_b[...] = jnp.zeros_like(pend_b)
            counters[...] = jnp.zeros_like(counters)

        min_i = jnp.int32(min_it)
        max_i = jnp.int32(max_it)
        shape = kr_ref.shape
        if rng == "threefry":
            lane_iota = (
                jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
                * jnp.uint32(shape[1])
                + jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
            )
            tf_k0 = seed_ref[0].astype(jnp.uint32)
            tf_k1 = seed_ref[1].astype(jnp.uint32)
        # ``window`` arrives CENTER-RELATIVE (canvas bounds minus the
        # exact f64 value of the df32 sample-window center): absolute
        # f32 bounds collapse to an empty predicate once the span drops
        # below the f32 ulp of the center (~1e-7 full span near the
        # seahorse valley — exactly the regime this kernel exists for).
        # The orbit-side difference below stays sharp at ANY span.
        wx0, wx1, wy0, wy1 = (jnp.float32(v) for v in window)

        def step(widx, s):
            (kr, ki, crh, crl, cih, cil,
             zr, zrl, zi, zil, sr, si, it, sv, dead, vcnt,
             rsv, xkr, xki, xv, xit, rep, vb, xb,
             p_it, p_rep, p_v, p_b,
             n_drawn, n_cull, n_band, n_cyc, n_waste,
             n_acc, n_ovw, n_lost) = s

            # --- inner window: df32 updates + thin tracking + window
            # counting + visit-bin recording, all in center-relative
            # coordinates ---
            azr, azrl, azi, azil = zr, zrl, zi, zil
            nesc = jnp.zeros_like(it)
            jv = vcnt
            for _ in range(inner_unroll):
                azr, azrl, azi, azil, mag2 = df32_ops.complex_sqr_add(
                    azr, azrl, azi, azil, crh, crl, cih, cil, rtz,
                    fold_abs=fold_abs,
                )
                nesc = nesc + (mag2 <= 4.0).astype(jnp.int32)
                # z - center, hi difference + lo residual: near the
                # window |azr - c0rh| is span-scale so the hi subtract
                # is exact (Sterbenz) and the lo terms carry the fine
                # part — the test resolves windows down to the df32
                # floor; far away it fails robustly either way.
                dr = (azr - c0rh_) + (azrl - c0rl_)
                di = (azi - c0ih_) + (azil - c0il_)
                vis = (
                    (dr >= wx0) & (dr < wx1)
                    & (di >= wy0) & (di < wy1)
                )
                rsv, vb = _record_visit(vis, dr, di, jv, rsv, vb, bin_map)
                jv = jv + vis.astype(jnp.int32)
            vcnt_new = jv
            esc_mask = nesc < jnp.int32(inner_unroll)
            needed = it + nesc
            if detect:
                cyc_mask = (azr == sr) & (azi == si) & ~esc_mask
            else:
                cyc_mask = jnp.zeros(azr.shape, bool)

            it_new = it + inner_unroll

            # --- boundary: proposal resolution ---
            maxed = it_new >= max_i
            deadb = dead != 0
            fin = esc_mask | cyc_mask | maxed | deadb
            if emit_interior:
                # Anti-Buddhabrot: candidates are samples that finish
                # WITHOUT escaping within the cap (proven periodic or
                # capped — the base kernels' interior semantics incl.
                # the window-overshoot guard); their target v is the
                # in-window count over the full capped orbit, and the
                # replay bound is max_it - 1 like the uniform engines.
                esc_in_cap = esc_mask & (needed < max_i)
                cand = (cyc_mask | maxed) & ~esc_in_cap & ~deadb
                needed = jnp.where(cand, max_i - 1, needed)
            else:
                cand = (
                    esc_mask & ~deadb
                    & (needed >= min_i) & (needed < max_i)
                )
            # Ergodicity-bridge target (module docstring): in-band
            # states score TARGET_VISIT per (capped) visit plus the
            # in-band epsilon of 1; never-visiting in-band states stay
            # proposable bridge states instead of dead ends.
            v_prop = jnp.where(
                cand,
                jnp.minimum(vcnt_new, jnp.int32(_T_VCAP))
                * jnp.int32(TARGET_VISIT) + 1,
                0,
            )

            # --- boundary randomness (shared, _mh_bits) ---
            rb_r, rb_i, rb_a, rb_b = _mh_bits(
                rng, chunk, widx, n_windows, shape,
                seed_ref, bits_ref,
                lane_iota if rng == "threefry" else None,
                tf_k0 if rng == "threefry" else None,
                tf_k1 if rng == "threefry" else None,
            )

            # --- shared chain core ---
            (accept, xkr, xki, xv, xit, rep, xb,
             p_it, p_rep, p_v, p_b,
             d_merges, d_merged) = _mh_boundary(
                fin, v_prop, needed, kr, ki,
                xkr, xki, xv, xit, rep, vb, xb,
                p_it, p_rep, p_v, p_b,
                rb_a, rb_b, rep_cap,
            )
            n_ovw = n_ovw + d_merges
            n_lost = n_lost + d_merged

            # --- Brent checkpoint (hi components) ---
            if detect:
                at_save = (it_new >= sv) & ~fin
                sr2 = jnp.where(at_save, azr, sr)
                si2 = jnp.where(at_save, azi, si)
                sv2 = jnp.where(at_save, sv * 2, sv)
            else:
                sr2, si2, sv2 = sr, si, sv

            # --- proposal draw: grid mutation + df32 c reconstruction
            # (the ext kernel's own refill arithmetic, sealed) ---
            nk_r, nk_i, oob = _mh_propose(
                xkr, xki, xv, rb_r, rb_i, rb_b, restart256
            )
            nkr_f = nk_r.astype(jnp.float32)
            nki_f = nk_i.astype(jnp.float32)
            off_r = (nkr_f - jnp.float32(two23)) * jnp.float32(step_r) + rtz
            off_i = (nki_f - jnp.float32(two23)) * jnp.float32(step_i) + rtz
            ncrh, ncrl = df32_ops.add_f(c0rh_, c0rl_, off_r)
            ncih, ncil = df32_ops.add_f(c0ih_, c0il_, off_i)
            if use_cull:
                # Approximate c suffices (pallas_kernels_ext rationale).
                ca_r = c0rh_ + off_r
                ca_i = c0ih_ + off_i
                imag_sq = ca_i * ca_i
                q = (ca_r - 0.25)
                q = q * q + imag_sq
                card = q * (q + (ca_r - 0.25)) < imag_sq * 0.25
                t = ca_r + 1.0
                bulb = (t * t + imag_sq) < 0.0625
                ncull = card | bulb | oob
            else:
                ncull = oob

            kr = jnp.where(fin, nkr_f, kr)
            ki = jnp.where(fin, nki_f, ki)
            crh = jnp.where(fin, ncrh, crh)
            crl = jnp.where(fin, ncrl, crl)
            cih = jnp.where(fin, ncih, cih)
            cil = jnp.where(fin, ncil, cil)
            zr = jnp.where(fin, ncrh, azr)
            zrl = jnp.where(fin, ncrl, azrl)
            zi = jnp.where(fin, ncih, azi)
            zil = jnp.where(fin, ncil, azil)
            it = jnp.where(fin, 0, it_new)
            sr = jnp.where(fin, jnp.float32(_BIG), sr2)
            si = jnp.where(fin, jnp.float32(_BIG), si2)
            sv = jnp.where(fin, jnp.int32(_SAVE0), sv2)
            dead = jnp.where(fin, ncull.astype(jnp.int32), dead)
            vcnt = jnp.where(fin, 0, vcnt_new)

            one = jnp.int32(1)
            zero = jnp.int32(0)
            unroll = jnp.int32(inner_unroll)
            n_drawn = n_drawn + jnp.where(fin, one, zero)
            n_cull = n_cull + jnp.where(fin & ncull, one, zero)
            n_band = n_band + jnp.where(v_prop > 0, one, zero)
            n_cyc = n_cyc + jnp.where(cyc_mask & ~deadb, one, zero)
            n_waste = n_waste + jnp.where(deadb, unroll, zero)
            n_waste = n_waste + jnp.where(
                esc_mask & ~deadb, it_new - needed - 1, zero
            )
            n_acc = n_acc + jnp.where(accept, one, zero)
            return (kr, ki, crh, crl, cih, cil,
                    zr, zrl, zi, zil, sr, si, it, sv, dead, vcnt,
                    rsv, xkr, xki, xv, xit, rep, vb, xb,
                    p_it, p_rep, p_v, p_b,
                    n_drawn, n_cull, n_band, n_cyc, n_waste,
                    n_acc, n_ovw, n_lost)

        carry = (
            kr_ref[...], ki_ref[...],
            crh_ref[...], crl_ref[...], cih_ref[...], cil_ref[...],
            zr_ref[...], zrl_ref[...], zi_ref[...], zil_ref[...],
            sr_ref[...], si_ref[...], it_ref[...], sv_ref[...],
            dead_ref[...], vcnt_ref[...],
            rsv_ref[...], xkr_ref[...], xki_ref[...], xv_ref[...],
            xit_ref[...], rep_ref[...], vb_ref[...], xb_ref[...],
            pend_it[...], pend_rep[...], pend_v[...], pend_b[...],
            counters[STAT_DRAWN], counters[STAT_CULLED],
            counters[STAT_IN_BAND], counters[STAT_CYCLES],
            counters[STAT_WASTED], counters[STAT_MH_ACCEPT],
            counters[STAT_MH_MERGE], counters[STAT_MH_MERGED_REP],
        )
        carry = jax.lax.fori_loop(
            0, steps_per_flush // inner_unroll, step, carry
        )
        (kr, ki, crh, crl, cih, cil,
         zr, zrl, zi, zil, sr, si, it, sv, dead, vcnt,
         rsv, xkr, xki, xv, xit, rep, vb, xb,
         p_it, p_rep, p_v, p_b,
         n_drawn, n_cull, n_band, n_cyc, n_waste,
         n_acc, n_ovw, n_lost) = carry

        kr_ref[...] = kr
        ki_ref[...] = ki
        crh_ref[...] = crh
        crl_ref[...] = crl
        cih_ref[...] = cih
        cil_ref[...] = cil
        zr_ref[...] = zr
        zrl_ref[...] = zrl
        zi_ref[...] = zi
        zil_ref[...] = zil
        sr_ref[...] = sr
        si_ref[...] = si
        it_ref[...] = it
        sv_ref[...] = sv
        dead_ref[...] = dead
        vcnt_ref[...] = vcnt
        rsv_ref[...] = rsv
        xkr_ref[...] = xkr
        xki_ref[...] = xki
        xv_ref[...] = xv
        xit_ref[...] = xit
        rep_ref[...] = rep
        vb_ref[...] = vb
        xb_ref[...] = xb
        counters[STAT_DRAWN] = n_drawn
        counters[STAT_CULLED] = n_cull
        counters[STAT_IN_BAND] = n_band
        counters[STAT_CYCLES] = n_cyc
        counters[STAT_WASTED] = n_waste
        counters[STAT_MH_ACCEPT] = n_acc
        counters[STAT_MH_MERGE] = n_ovw
        counters[STAT_MH_MERGED_REP] = n_lost
        stats_ref[...] = counters[...]

        emit_it_ref[0] = p_it
        emit_rep_ref[0] = p_rep
        emit_v_ref[0] = p_v
        emit_b_ref[0] = p_b
        pend_it[...] = jnp.full_like(p_it, -1)
        pend_rep[...] = jnp.zeros_like(p_rep)
        pend_v[...] = jnp.zeros_like(p_v)
        pend_b[...] = jnp.zeros_like(p_b)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "fractal", "min_it", "max_it", "steps_per_pass", "steps_per_flush",
        "cycle_detection", "interpret", "inner_unroll", "rng",
        "sample_domain", "window", "restart256", "rep_cap", "canvas_wh",
    ),
    donate_argnums=(0,),
)
def classify_pass_ext_mh(
    state: ExtMhLaneState,
    seed: jax.Array,
    bits: jax.Array | None = None,
    *,
    fractal: FractalMap,
    min_it: int,
    max_it: int,
    steps_per_pass: int,
    steps_per_flush: int,
    cycle_detection: bool = True,
    interpret: bool = False,
    inner_unroll: int = 1,
    rng: str | None = None,
    sample_domain: tuple = (-2.0, 2.0, -2.0, 2.0),
    window: tuple = (-2.0, 2.0, -2.0, 2.0),
    restart256: int = 16,
    rep_cap: int = 4096,
    canvas_wh: tuple = (1000, 1000),
) -> MhClassifyResult:
    """Extended-precision MH chain pass: classify_pass_mh's contract
    with df32 orbit state. NOTE ``window``
    is CENTER-RELATIVE here — canvas bounds minus the exact f64 value
    of the df32 sample-window center (pallas_engine computes it) —
    because absolute f32 bounds collapse below the center's ulp; visit
    bins are quantized in the same relative coordinates."""
    if steps_per_pass % steps_per_flush != 0:
        raise ValueError("steps_per_pass must be a multiple of steps_per_flush")
    if steps_per_flush % inner_unroll != 0:
        raise ValueError("steps_per_flush must be a multiple of inner_unroll")
    if not (0 <= restart256 <= 256):
        raise ValueError("restart256 must be in [0, 256]")
    if rep_cap < 2:
        raise ValueError("rep_cap must be at least 2")
    from cudabrot_tpu.ops import pallas_kernels_ext as pke_mod

    chunks = steps_per_pass // steps_per_flush
    windows = steps_per_flush // inner_unroll
    lane_rows = state.kr.shape[0]
    visit_slots = state.vb.shape[0]
    if visit_slots & (visit_slots - 1):
        raise ValueError("visit_slots must be a power of two")
    shape = (lane_rows, 128)
    vshape = (visit_slots, lane_rows, 128)
    if rng is None:
        rng = "bits" if bits is not None else "threefry"
    if rng not in ("threefry", "hardware", "hardware_rw", "bits"):
        raise ValueError(f"Unknown rng mode: {rng}")
    if (rng == "bits") != (bits is not None):
        raise ValueError("bits must be supplied iff rng == 'bits'")

    kernel = _make_kernel_ext_mh(
        fractal,
        min_it=min_it,
        max_it=max_it,
        steps_per_flush=steps_per_flush,
        cycle_detection=cycle_detection,
        rng=rng,
        inner_unroll=inner_unroll,
        sample_domain=sample_domain,
        window=window,
        restart256=restart256,
        rep_cap=rep_cap,
        canvas_wh=canvas_wh,
        visit_slots=visit_slots,
    )

    f32 = jnp.float32
    i32 = jnp.int32
    n_state = len(ExtMhLaneState._fields)
    state_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_state
    out_state_shapes = [
        jax.ShapeDtypeStruct(x.shape, x.dtype) for x in state
    ]

    seed = jnp.asarray(seed)
    if seed.ndim == 0:
        words = [
            seed.astype(jnp.uint32),
            seed.astype(jnp.uint32) ^ jnp.uint32(0x3C6EF372),
        ]
    else:
        s2 = seed.reshape((-1,)).astype(jnp.uint32)
        words = [s2[0], s2[1]]
    # SMEM df32 constants: window-center components + the sealing zero
    # (see pallas_kernels_ext.classify_pass_ext for the rationale).
    (c0r, c0i, _sr, _si) = pke_mod.grid_params(sample_domain)
    consts = jnp.asarray(
        [c0r[0], c0r[1], c0i[0], c0i[1], 0.0], jnp.float32
    )
    seed_arr = jnp.stack(words)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (2,)
        pl.BlockSpec(memory_space=pltpu.SMEM),  # df consts (5,) f32
    ]
    inputs = [seed_arr.astype(jnp.int32), consts]
    if rng == "bits":
        if bits.shape != (chunks, windows, 4, lane_rows, 128):
            raise ValueError(f"bits has wrong shape {bits.shape}")
        in_specs.append(
            pl.BlockSpec(
                (1, windows, 4, lane_rows, 128),
                lambda i: (i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        inputs.append(bits.astype(jnp.uint32))
    in_specs.extend(state_specs)
    inputs.extend(state)
    state_in_base = len(in_specs) - n_state

    out = pl.pallas_call(
        kernel,
        grid=(chunks,),
        in_specs=in_specs,
        out_specs=[
            *state_specs,
            pl.BlockSpec(
                (1, lane_rows, 128),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, lane_rows, 128),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, lane_rows, 128),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, visit_slots, lane_rows, 128),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # stats (revisited)
        ],
        out_shape=[
            *out_state_shapes,
            jax.ShapeDtypeStruct((chunks, lane_rows, 128), i32),
            jax.ShapeDtypeStruct((chunks, lane_rows, 128), i32),
            jax.ShapeDtypeStruct((chunks, lane_rows, 128), i32),
            jax.ShapeDtypeStruct((chunks, visit_slots, lane_rows, 128), i32),
            jax.ShapeDtypeStruct((MH_STATS_ROWS, lane_rows, 128), i32),
        ],
        scratch_shapes=[
            pltpu.VMEM(shape, i32),  # pend_it
            pltpu.VMEM(shape, i32),  # pend_rep
            pltpu.VMEM(shape, i32),  # pend_v
            pltpu.VMEM(vshape, i32),  # pend_b
            pltpu.VMEM((MH_STATS_ROWS,) + shape, i32),  # counters
        ],
        input_output_aliases={state_in_base + i: i for i in range(n_state)},
        interpret=interpret,
    )(*inputs)

    new_state = ExtMhLaneState(*out[:n_state])
    return MhClassifyResult(
        state=new_state,
        emit_it=out[n_state],
        emit_rep=out[n_state + 1],
        emit_v=out[n_state + 2],
        emit_bins=out[n_state + 3],
        stats=out[n_state + 4],
    )
