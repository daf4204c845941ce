"""The production TPU classify kernel (Pallas).

This is the TPU-native redesign of DrawBuddhabrot + IterateMandelbrot
(cudabrot.cu:379-414, 319-340). The CUDA kernel gives every thread a
private instruction stream, so per-sample escape-time divergence costs only
warp-level masking; a TPU VPU executes one instruction across 8x128 lanes,
so the same algorithm written naively (iterate a batch until everyone
finishes) would idle almost every lane at high iteration counts — expected
max escape time over thousands of lanes is orders of magnitude above the
mean. Three design moves recover the hardware:

  1. **Persistent lanes with immediate refill.** Every lane is an
     independent sampler that, the moment its sample finishes (escape /
     interior-cycle / iteration cap), draws a fresh c from the in-kernel
     PRNG and keeps iterating — the step loop is completely uniform, so
     lane utilization is ~100% regardless of the band. Lane state persists
     across passes (kernel calls) via input/output aliasing, so orbits
     longer than one pass are never truncated (which would bias against
     exactly the slow-escaping samples the high bands select for).
  2. **Counter-based PRNG.** An in-kernel Threefry-2x32 keyed by the
     pass seed over (lane id, window index) replaces cuRAND's 262k-entry
     device state array (cudabrot.cu:146-149, 176-181): no init kernel,
     no state memory, no checkpoint coupling, reproducible per
     (seed, pass, device) fold, and identical on CPU and TPU. (The TPU
     hardware PRNG is ~free but measurably biased in the deep escape-time
     tail — see `threefry2x32`; it remains available as `rng="hardware"`.)
  3. **Brent cycle detection.** Non-culled interior points cost the
     reference the full max_escape_iterations every time
     (cudabrot.cu:326-339). Interior Mandelbrot orbits converge to
     attracting cycles, which in f32 become *exactly* periodic; comparing
     z against a checkpoint saved at doubling step indices detects them
     early at ~5 extra VPU ops/step. At m=20000 interior points are ~85%
     of all classify work, so this is a multiple-x algorithmic win the
     reference does not have. (Escaping orbits are chaotic and essentially
     never repeat exactly, so false positives are ~2^-48/step; the oracle
     cross-tests run with detection disabled for exact parity.)

In-band finishes are queued in a per-lane pending register and flushed to
an HBM emission buffer every `steps_per_flush` steps; a second pending
finish inside one flush window overwrites the first. Such drops are rare
(<~2% at default settings) and *unbiased* — whether a sample is dropped
depends only on its predecessor's timing, never on its own value — so the
emission stream is a clean thinning of the in-band sample stream. Orbit
replay and histogram accumulation happen outside the kernel
(cudabrot_tpu.engines.pallas_engine) where XLA's scatter machinery is
already near memory-bound.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cudabrot_tpu.models.fractals import FractalMap

#: First Brent checkpoint index (skipped-transient length). Doubles after
#: every save: 16, 32, 64, ...
_SAVE0 = 16
#: Sentinel "never matches" value for the saved cycle point.
_BIG = 1.0e30

#: Number of int32 per-lane counters in the stats output.
STATS_ROWS = 5
(
    STAT_DRAWN,
    STAT_CULLED,
    STAT_IN_BAND,
    STAT_CYCLES,
    STAT_WASTED,
) = range(STATS_ROWS)


class LaneState(NamedTuple):
    """Persistent per-lane sampler state, (R, 128) each."""

    cr: jax.Array  # f32 current sample
    ci: jax.Array
    zr: jax.Array  # f32 current orbit position
    zi: jax.Array
    sr: jax.Array  # f32 Brent saved point
    si: jax.Array
    it: jax.Array  # i32 completed updates of current sample
    sv: jax.Array  # i32 next Brent save index
    dead: jax.Array  # i32 1 => refill at next step (culled draw / initial)
    vis: jax.Array  # i32 1 => trajectory entered the visit window
    #                 (only maintained when the canvas emit filter is on)


def init_lane_state(lane_rows: int) -> LaneState:
    shape = (lane_rows, 128)
    f = lambda v: jnp.full(shape, v, jnp.float32)
    i = lambda v: jnp.full(shape, v, jnp.int32)
    return LaneState(
        cr=f(0.0), ci=f(0.0), zr=f(0.0), zi=f(0.0),
        sr=f(_BIG), si=f(_BIG),
        it=i(0), sv=i(_SAVE0),
        # All lanes start dead: the first step of the first pass draws the
        # first real samples.
        dead=i(1),
        vis=i(0),
    )


def window_seed(seed_word, idx):
    """Scrambled per-window hardware-PRNG seed: golden-ratio stride over
    ``idx`` finished by splitmix32. Feeding small consecutive integers
    straight into prng_seed measurably correlates the streams; these
    constants were validated unbiased by benchmarks/prng_bias_probe.py,
    and the f32 and df32 kernels MUST share them (the replay contracts
    assume identical streams per mode) — this is the single copy."""
    u = seed_word.astype(jnp.uint32) + idx.astype(jnp.uint32) * jnp.uint32(
        0x9E3779B9
    )
    u = (u ^ (u >> jnp.uint32(16))) * jnp.uint32(0x21F0AAAD)
    u = (u ^ (u >> jnp.uint32(15))) * jnp.uint32(0x735A2D97)
    return u ^ (u >> jnp.uint32(15))


def threefry2x32(k0, k1, x0, x1):
    """Threefry-2x32 (20 rounds), bit-exact with JAX's base PRNG.

    The production refill-randomness source. Counter-based and stateless:
    the kernel calls it with (key = per-pass/device seed words,
    counter = (global lane id, global window index)), so every lane/window
    gets an independent, reproducible draw with no RNG state arrays
    (contrast cuRAND's 262k-state initialization, cudabrot.cu:146-149,
    176-181) and no reliance on the TPU hardware PRNG.

    Why not `pltpu.prng_random_bits`: the hardware generator's deep-tail
    sampling is measurably biased — at the [45000, 60000) band the
    in-band rate came out 19% low with 512-window streams and 12% high
    with 8192-window streams vs 1.106e-6 +- 3% ground truth measured
    with JAX threefry bits through the identical kernel (PERF_NOTES.md
    "PRNG stream separation"). Buddhabrot's deep bands select for
    exactly the tail this distorts. Pure add/xor/rotate on the VPU, and
    identical on the CPU interpreter — TPU and CPU runs share streams.

    All inputs uint32 arrays/scalars (broadcastable); returns two uint32
    outputs. Implementation mirrors jax._src.prng.threefry2x32's
    rotation/injection schedule so it can be regression-tested against
    `jax.random.key_data`-level primitives (tests/test_pallas_engine.py).
    """
    rotations = ((13, 15, 26, 6), (17, 29, 16, 24))

    def rotl(x, r):
        return jax.lax.shift_left(x, jnp.uint32(r)) | (
            jax.lax.shift_right_logical(x, jnp.uint32(32 - r))
        )

    ks0 = k0
    ks1 = k1
    ks2 = k0 ^ k1 ^ jnp.uint32(0x1BD11BDA)
    ks = (ks0, ks1, ks2)
    x0 = x0 + ks0
    x1 = x1 + ks1
    for i in range(5):
        for r in rotations[i % 2]:
            x0 = x0 + x1
            x1 = rotl(x1, r)
            x1 = x0 ^ x1
        x0 = x0 + ks[(i + 1) % 3]
        x1 = x1 + ks[(i + 2) % 3] + jnp.uint32(i + 1)
    return x0, x1


def _u32_to_domain(bits, lo: float, span: float):
    """uint32 random bits -> uniform float32 in [lo, lo + span)."""
    # Keep the top 24 bits: they fit exactly in both int32 and the f32
    # mantissa (uint32 -> f32 conversions are best avoided on the VPU), and
    # 2^24 distinct values per axis is ~40x finer than a 20000^2 canvas's
    # pixel pitch over the [-2,2] sample domain (cudabrot.cu:392-393).
    u24 = jax.lax.shift_right_logical(bits, jnp.uint32(8)).astype(jnp.int32)
    u = u24.astype(jnp.float32) * jnp.float32(5.9604644775390625e-08)  # 2^-24
    return u * jnp.float32(span) + jnp.float32(lo)


def _make_kernel(
    fractal: FractalMap,
    *,
    min_it: int,
    max_it: int,
    steps_per_flush: int,
    cycle_detection: bool,
    rng: str,
    inner_unroll: int = 1,
    thin_tracking: bool = False,
    sample_domain: tuple = (-2.0, 2.0, -2.0, 2.0),
    visit_window: tuple | None = None,
    _ablate: tuple = (),
):
    """Build the classify kernel body for a static configuration.

    ``visit_window`` (x0, x1, y0, y1) enables the canvas emit filter:
    the inner loop additionally tracks whether the orbit entered the
    window, and only orbits that did are emitted (in_band &= visited).
    Orbits that never visit contribute zero canvas mass, so gating
    leaves the rendered measure untouched: false positives are harmless
    (their replay deposits nothing), and against the device replay —
    which re-executes the classify trajectory — false negatives cannot
    happen either (the window is inflated one pixel over the binning
    acceptance; bitwise equality asserted in tests/test_emit_filter).
    The native host replay's own FMA contraction can decorrelate long
    chaotic orbits from the kernel (the documented replay class,
    ops/oracle.replay_into), so there a borderline non-visitor may have
    deposited a few edge points — measured 6 counts of 384 and bounded
    in tests. Requires thin tracking.

    ``_ablate`` is a benchmark-only hook (benchmarks/boundary_ablation.py)
    that strips named boundary stages ("prng", "cull", "stats", "emit",
    "brent") so their marginal cost can be measured on silicon; it must
    never be set on a production path.

    ``rng`` selects the refill-randomness source:
      * "threefry" (production, CPU and TPU): in-kernel counter-based
        Threefry-2x32 keyed by the pass seed over (lane id, window
        index) — unbiased (see `threefry2x32`) and identical across
        backends.
      * "hardware": `pltpu.prng_random_bits` (TPU only; the interpreter
        stubs it to zeros). Faster boundary, but its deep-tail sampling
        is measurably biased — kept for perf experiments.
      * "hardware_rw": hardware generator RE-SEEDED EVERY WINDOW with a
        splitmix32-scrambled (seed, global window index) — each stream
        is exactly two draws long, so the long-stream correlations that
        produced the measured -19%/+12% deep-tail bias never develop
        (validated against the threefry ground truth,
        benchmarks/prng_bias_probe.py). TPU only, like "hardware".
      * "bits": stream pre-generated words from an input buffer — lets
        tests drive the kernel with exact known randomness.
    """
    detect = cycle_detection and fractal.cycle_detect
    use_cull = fractal.use_cull
    fold_abs = fractal.fold_abs
    emit_interior = fractal.emit == "interior"
    n_windows = steps_per_flush // inner_unroll
    if visit_window is not None and not thin_tracking:
        raise ValueError("visit_window requires thin_tracking")

    def kernel(*refs):
        if rng != "bits":
            (seed_ref,
             _cr_i, _ci_i, _zr_i, _zi_i, _sr_i, _si_i, _it_i, _sv_i,
             _dead_i, _vis_i,
             cr_ref, ci_ref, zr_ref, zi_ref, sr_ref, si_ref, it_ref,
             sv_ref, dead_ref, vis_ref,
             emit_c_ref, emit_it_ref, stats_ref,
             pend_cr, pend_ci, pend_it, counters) = refs
            bits_ref = None
        else:
            (seed_ref, bits_ref,
             _cr_i, _ci_i, _zr_i, _zi_i, _sr_i, _si_i, _it_i, _sv_i,
             _dead_i, _vis_i,
             cr_ref, ci_ref, zr_ref, zi_ref, sr_ref, si_ref, it_ref,
             sv_ref, dead_ref, vis_ref,
             emit_c_ref, emit_it_ref, stats_ref,
             pend_cr, pend_ci, pend_it, counters) = refs
        chunk = pl.program_id(0)
        if rng == "hardware":
            # Distinct, reproducible random stream per (pass, chunk); the
            # pass and device folds are already mixed into the seed
            # scalar. The chunk index is scrambled through a splitmix32
            # finalizer before seeding (feeding small consecutive
            # integers straight into prng_seed measurably correlates the
            # streams), though even scrambled streams keep the hardware
            # generator's deep-tail bias — see PERF_NOTES.md "PRNG
            # stream separation".
            pltpu.prng_seed(window_seed(seed_ref[0], chunk))

        @pl.when(chunk == 0)
        def _init_scratch():
            pend_cr[...] = jnp.zeros_like(pend_cr)
            pend_ci[...] = jnp.zeros_like(pend_ci)
            pend_it[...] = jnp.full_like(pend_it, -1)
            counters[...] = jnp.zeros_like(counters)

        min_i = jnp.int32(min_it)
        max_i = jnp.int32(max_it)
        if rng == "threefry":
            # Threefry counter words: global lane id (loop-invariant,
            # hoisted) and global window index (chunk * windows + widx).
            shape = cr_ref.shape
            lane_iota = (
                jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
                * jnp.uint32(shape[1])
                + jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
            )
            tf_k0 = seed_ref[0].astype(jnp.uint32)
            tf_k1 = seed_ref[1].astype(jnp.uint32)

        def step(widx, s):
            """One window of `inner_unroll` orbit updates followed by one
            boundary pass (termination, emission, Brent checkpointing,
            refill). The inner loop is pure VPU arithmetic — ~16 ops/step
            vs ~55 for boundary work — so amortizing the boundary over U
            steps trades a little divergence idle (an escaped lane coasts
            to the window edge) for a much shorter instruction stream."""
            (cr, ci, zr, zi, sr, si, it, sv, dead, vis,
             p_cr, p_ci, p_it, n_drawn, n_cull, n_band, n_cyc, n_waste) = s

            # --- inner window: U orbit updates (cudabrot.cu:327-336) ---
            azr, azi = zr, zi
            if thin_tracking:
                # Thin tracking: escape (|z|^2 > 4) is a point of no
                # return for this dynamics — for |c| <= 2 crossing |z| > 2
                # forces monotone growth (|z^2+c| >= |z|^2-2 > |z|), and
                # for |c| > 2 the orbit starts at z = c with |z| >= |c|
                # and grows from step one — so the per-step mask chain
                # (newly/esc_mask/needed selects, ~6 VPU ops) collapses
                # to one survival counter: nesc = number of not-yet-
                # escaped steps, recovered at the boundary as the 0-based
                # escape index it + nesc (cudabrot.cu:336 semantics).
                # The test is written `<= 4` so the NaNs an escaped lane
                # coasts into (inf*inf - inf*inf) keep counting as
                # escaped. Squares are carried across steps: each step's
                # magnitude test feeds the next step's z update.
                nesc = jnp.zeros_like(it)
                r2 = azr * azr
                i2 = azi * azi
                if visit_window is not None:
                    w_hit = jnp.zeros(azr.shape, bool)
                    vx0, vx1, vy0, vy1 = (
                        jnp.float32(v) for v in visit_window
                    )
                for _ in range(inner_unroll):
                    nzr = r2 - i2 + cr
                    if fold_abs:
                        # |azr|*|azi| == |azr*azi| (abs is sign-only and
                        # the squares are sign-invariant) — one abs
                        # instead of two. The restructured expression
                        # tree can FMA-contract differently than the
                        # step-tracking form, so trajectories may drift
                        # in the low bits (statistically immaterial).
                        nzi = 2.0 * jnp.abs(azr * azi) + ci
                    else:
                        nzi = 2.0 * azr * azi + ci
                    azr, azi = nzr, nzi
                    r2 = azr * azr
                    i2 = azi * azi
                    nesc = nesc + (r2 + i2 <= 4.0).astype(jnp.int32)
                    if visit_window is not None:
                        # Canvas emit filter: track window entry. Coast
                        # positions after escape stay outside any window
                        # within |z| <= 2 (escape is monotone growth) and
                        # NaN compares false; beyond-|2| windows can only
                        # gain harmless false positives.
                        w_hit = w_hit | (
                            (azr >= vx0) & (azr < vx1)
                            & (azi >= vy0) & (azi < vy1)
                        )
                if visit_window is not None:
                    vis = vis | w_hit.astype(jnp.int32)
                esc_mask = nesc < jnp.int32(inner_unroll)
                needed = it + nesc
                if detect:
                    # Cycle check at the window boundary only. Sound:
                    # `it` is always a multiple of U (refills happen at
                    # boundaries), so Brent save points land on boundary
                    # indices and a period-p cycle repeats its saved
                    # point at a boundary within U*p/gcd(U,p) steps —
                    # a bounded extra delay for 5 fewer ops per step.
                    cyc_mask = (azr == sr) & (azi == si) & ~esc_mask
                else:
                    cyc_mask = jnp.zeros(azr.shape, bool)
            else:
                esc_mask = jnp.zeros(azr.shape, bool)
                cyc_mask = jnp.zeros(azr.shape, bool)
                needed = jnp.zeros_like(it)  # escape index when esc_mask set
                for k in range(inner_unroll):
                    if fold_abs:
                        azr = jnp.abs(azr)
                        azi = jnp.abs(azi)
                    nzr = azr * azr - azi * azi + cr
                    nzi = 2.0 * azr * azi + ci
                    azr, azi = nzr, nzi
                    hit = (azr * azr + azi * azi) > 4.0
                    newly = hit & ~esc_mask & ~cyc_mask
                    # iterations_needed is the 0-based escape loop index
                    # (cudabrot.cu:336): it + k.
                    needed = jnp.where(newly, it + k, needed)
                    esc_mask = esc_mask | newly
                    if detect:
                        cyc_mask = cyc_mask | (
                            (azr == sr) & (azi == si) & ~esc_mask
                        )

            it_new = it + inner_unroll

            # --- boundary: termination + band filter ---
            maxed = it_new >= max_i
            deadb = dead != 0
            fin = esc_mask | cyc_mask | maxed | deadb
            # Window overshoot can carry a lane past max_i before its
            # escape is observed; the explicit needed < max_i keeps the
            # reference's band semantics exact (cudabrot.cu:407-408).
            if "emit" in _ablate:
                in_band = esc_mask & ~deadb
            elif emit_interior:
                # Anti-Buddhabrot: the signal is samples that finish
                # WITHOUT escaping within the cap — proven periodic
                # (Brent) or at the iteration cap. A lane whose escape is
                # first observed at an overshoot index >= max_it (window
                # carried it past the cap before the boundary) survived
                # every capped iteration and IS interior — the same
                # overshoot the escape mode's explicit `needed < max_i`
                # handles. Each emission replays the full cap: needed is
                # max_it - 1, so the replay engines record exactly
                # max_it orbit points (the same s <= iters bound the
                # escape mode uses). The min cutoff is meaningless here
                # and ignored (models/fractals.FractalMap.emit).
                esc_in_cap = esc_mask & (needed < max_i)
                in_band = (cyc_mask | maxed) & ~esc_in_cap & ~deadb
                if visit_window is not None:
                    in_band = in_band & (vis != 0)
                p_cr = jnp.where(in_band, cr, p_cr)
                p_ci = jnp.where(in_band, ci, p_ci)
                p_it = jnp.where(in_band, max_i - 1, p_it)
            else:
                in_band = (
                    esc_mask & ~deadb & (needed >= min_i) & (needed < max_i)
                )
                if visit_window is not None:
                    # Canvas emit filter: only orbits that entered the
                    # window are worth replaying (in_band now means
                    # "emission-eligible"; the stat counts the gated set).
                    in_band = in_band & (vis != 0)
                p_cr = jnp.where(in_band, cr, p_cr)
                p_ci = jnp.where(in_band, ci, p_ci)
                p_it = jnp.where(in_band, needed, p_it)

            # --- Brent checkpoint (window-boundary schedule: any fixed
            # past-transient checkpoint works, doubling gaps bound the
            # detection delay) ---
            if detect:
                at_save = (it_new >= sv) & ~fin
                sr2 = jnp.where(at_save, azr, sr)
                si2 = jnp.where(at_save, azi, si)
                sv2 = jnp.where(at_save, sv * 2, sv)
            else:
                sr2, si2, sv2 = sr, si, sv

            # --- refill finished lanes with fresh samples ---
            if "prng" in _ablate:
                # Varying (not constant-foldable) stand-in bits so the
                # downstream domain/cull arithmetic still executes.
                rb_r = pltpu.bitcast(it_new, jnp.uint32)
                rb_i = rb_r ^ jnp.uint32(0x9E3779B9)
            elif rng == "hardware_rw":
                # Fresh hardware stream per window: scramble the global
                # window index through splitmix32 (scalar ops) and
                # reseed, then take exactly two draws. Stream
                # correlations cannot span windows.
                gwin = (
                    chunk * jnp.int32(n_windows) + widx
                ).astype(jnp.uint32)
                pltpu.prng_seed(window_seed(seed_ref[0], gwin))
                rb_r = pltpu.bitcast(
                    pltpu.prng_random_bits((cr.shape[0], cr.shape[1])),
                    jnp.uint32,
                )
                rb_i = pltpu.bitcast(
                    pltpu.prng_random_bits((cr.shape[0], cr.shape[1])),
                    jnp.uint32,
                )
            elif rng == "threefry":
                rb_r, rb_i = threefry2x32(
                    tf_k0,
                    tf_k1,
                    lane_iota,
                    (chunk * jnp.int32(n_windows) + widx).astype(
                        jnp.uint32
                    ),
                )
            elif rng == "hardware":
                rb_r = pltpu.bitcast(
                    pltpu.prng_random_bits((cr.shape[0], cr.shape[1])),
                    jnp.uint32,
                )
                rb_i = pltpu.bitcast(
                    pltpu.prng_random_bits((cr.shape[0], cr.shape[1])),
                    jnp.uint32,
                )
            else:
                rb_r = bits_ref[0, widx, 0]
                rb_i = bits_ref[0, widx, 1]
            dom_r0, dom_r1, dom_i0, dom_i1 = sample_domain
            ncr = _u32_to_domain(rb_r, dom_r0, dom_r1 - dom_r0)
            nci = _u32_to_domain(rb_i, dom_i0, dom_i1 - dom_i0)
            if use_cull and "cull" not in _ablate:
                # cudabrot.cu:284-298 closed-form interior tests.
                imag_sq = nci * nci
                q = (ncr - 0.25)
                q = q * q + imag_sq
                card = q * (q + (ncr - 0.25)) < imag_sq * 0.25
                t = ncr + 1.0
                bulb = (t * t + imag_sq) < 0.0625
                ncull = card | bulb
            else:
                ncull = jnp.zeros_like(esc_mask)

            if "refill" in _ablate:
                zr, zi = azr, azi
                it = it_new
            else:
                cr = jnp.where(fin, ncr, cr)
                ci = jnp.where(fin, nci, ci)
                # z starts at c, not 0 (cudabrot.cu:323-324).
                zr = jnp.where(fin, ncr, azr)
                zi = jnp.where(fin, nci, azi)
                it = jnp.where(fin, 0, it_new)
                sr = jnp.where(fin, jnp.float32(_BIG), sr2)
                si = jnp.where(fin, jnp.float32(_BIG), si2)
                sv = jnp.where(fin, jnp.int32(_SAVE0), sv2)
                dead = jnp.where(fin, ncull.astype(jnp.int32), dead)
                if visit_window is not None:
                    vis = jnp.where(fin, 0, vis)

            if "stats" not in _ablate:
                one = jnp.int32(1)
                zero = jnp.int32(0)
                unroll = jnp.int32(inner_unroll)
                n_drawn = n_drawn + jnp.where(fin, one, zero)
                n_cull = n_cull + jnp.where(fin & ncull, one, zero)
                n_band = n_band + jnp.where(in_band, one, zero)
                n_cyc = n_cyc + jnp.where(cyc_mask & ~deadb, one, zero)
                # Wasted lane-steps: a dead (culled) lane burns the whole
                # window; an escaped lane coasts from its escape to the
                # edge.
                n_waste = n_waste + jnp.where(deadb, unroll, zero)
                n_waste = n_waste + jnp.where(
                    esc_mask & ~deadb, it_new - needed - 1, zero
                )
            return (cr, ci, zr, zi, sr, si, it, sv, dead, vis,
                    p_cr, p_ci, p_it, n_drawn, n_cull, n_band, n_cyc,
                    n_waste)

        carry = (
            cr_ref[...], ci_ref[...], zr_ref[...], zi_ref[...],
            sr_ref[...], si_ref[...], it_ref[...], sv_ref[...],
            dead_ref[...], vis_ref[...],
            pend_cr[...], pend_ci[...], pend_it[...],
            counters[STAT_DRAWN], counters[STAT_CULLED],
            counters[STAT_IN_BAND], counters[STAT_CYCLES],
            counters[STAT_WASTED],
        )
        carry = jax.lax.fori_loop(
            0, steps_per_flush // inner_unroll, step, carry
        )
        (cr, ci, zr, zi, sr, si, it, sv, dead, vis,
         p_cr, p_ci, p_it, n_drawn, n_cull, n_band, n_cyc, n_waste) = carry

        cr_ref[...] = cr
        ci_ref[...] = ci
        zr_ref[...] = zr
        zi_ref[...] = zi
        sr_ref[...] = sr
        si_ref[...] = si
        it_ref[...] = it
        sv_ref[...] = sv
        dead_ref[...] = dead
        vis_ref[...] = vis
        counters[STAT_DRAWN] = n_drawn
        counters[STAT_CULLED] = n_cull
        counters[STAT_IN_BAND] = n_band
        counters[STAT_CYCLES] = n_cyc
        counters[STAT_WASTED] = n_waste
        stats_ref[...] = counters[...]

        # Flush the pending in-band samples for this window and clear.
        emit_c_ref[0, 0] = p_cr
        emit_c_ref[0, 1] = p_ci
        emit_it_ref[0] = p_it
        pend_cr[...] = p_cr * 0.0
        pend_ci[...] = p_ci * 0.0
        pend_it[...] = jnp.full_like(p_it, -1)

    return kernel


class ClassifyResult(NamedTuple):
    state: LaneState
    emit_c: jax.Array  # (chunks, 2, R, 128) f32 — candidate c values
    emit_it: jax.Array  # (chunks, R, 128) i32 — escape index, -1 invalid
    stats: jax.Array  # (STATS_ROWS, R, 128) i32 per-lane pass counters


@functools.partial(
    jax.jit,
    static_argnames=(
        "fractal", "min_it", "max_it", "steps_per_pass", "steps_per_flush",
        "cycle_detection", "interpret", "inner_unroll", "thin_tracking",
        "rng", "sample_domain", "visit_window", "_ablate",
    ),
    donate_argnums=(0,),
)
def classify_pass(
    state: LaneState,
    seed: jax.Array,  # uint32 scalar, already folded with pass/device
    bits: jax.Array | None = None,  # (chunks, windows, 2, R, 128) u32 bits
    *,
    fractal: FractalMap,
    min_it: int,
    max_it: int,
    steps_per_pass: int,
    steps_per_flush: int,
    cycle_detection: bool = True,
    interpret: bool = False,
    inner_unroll: int = 1,
    thin_tracking: bool = False,
    rng: str | None = None,
    sample_domain: tuple = (-2.0, 2.0, -2.0, 2.0),
    visit_window: tuple | None = None,
    _ablate: tuple = (),
) -> ClassifyResult:
    """Run one persistent-sampler classify pass of `steps_per_pass` lane
    steps, emitting in-band (c, iterations) candidates for replay.

    ``seed`` is either a uint32 scalar (a second key word is derived) or
    a (2,) uint32 array — the Threefry key / hardware-PRNG seed, already
    folded with the pass index and device ordinal.

    ``rng`` selects the refill-randomness source (see _make_kernel);
    None resolves to "bits" when ``bits`` is given, else "threefry" —
    the production default on both CPU and TPU.

    ``thin_tracking`` replaces the per-step escape mask chain with a
    survival counter and moves Brent cycle checks to window boundaries
    (see _make_kernel) — semantically equivalent modulo cycle-detection
    latency, with a materially shorter inner instruction stream.
    """
    if steps_per_pass % steps_per_flush != 0:
        raise ValueError("steps_per_pass must be a multiple of steps_per_flush")
    if steps_per_flush % inner_unroll != 0:
        raise ValueError("steps_per_flush must be a multiple of inner_unroll")
    chunks = steps_per_pass // steps_per_flush
    windows = steps_per_flush // inner_unroll
    lane_rows = state.cr.shape[0]
    shape = (lane_rows, 128)
    if rng is None:
        rng = "bits" if bits is not None else "threefry"
    if rng not in ("threefry", "hardware", "hardware_rw", "bits"):
        raise ValueError(f"Unknown rng mode: {rng}")
    if (rng == "bits") != (bits is not None):
        raise ValueError("bits must be supplied iff rng == 'bits'")

    kernel = _make_kernel(
        fractal,
        min_it=min_it,
        max_it=max_it,
        steps_per_flush=steps_per_flush,
        cycle_detection=cycle_detection,
        rng=rng,
        inner_unroll=inner_unroll,
        thin_tracking=thin_tracking,
        sample_domain=sample_domain,
        visit_window=visit_window,
        _ablate=_ablate,
    )

    f32 = jnp.float32
    i32 = jnp.int32
    n_state = len(LaneState._fields)
    state_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_state
    out_state_shapes = [
        jax.ShapeDtypeStruct(shape, f32),  # cr
        jax.ShapeDtypeStruct(shape, f32),  # ci
        jax.ShapeDtypeStruct(shape, f32),  # zr
        jax.ShapeDtypeStruct(shape, f32),  # zi
        jax.ShapeDtypeStruct(shape, f32),  # sr
        jax.ShapeDtypeStruct(shape, f32),  # si
        jax.ShapeDtypeStruct(shape, i32),  # it
        jax.ShapeDtypeStruct(shape, i32),  # sv
        jax.ShapeDtypeStruct(shape, i32),  # dead
        jax.ShapeDtypeStruct(shape, i32),  # vis
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
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]  # seed (2,)
    inputs = [seed_arr.astype(jnp.int32)]
    if rng == "bits":
        if bits.shape != (chunks, windows, 2, lane_rows, 128):
            raise ValueError(f"bits has wrong shape {bits.shape}")
        in_specs.append(
            pl.BlockSpec(
                (1, windows, 2, lane_rows, 128),
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
                (1, 2, lane_rows, 128),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, lane_rows, 128),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # stats (revisited)
        ],
        out_shape=[
            *out_state_shapes,
            jax.ShapeDtypeStruct((chunks, 2, lane_rows, 128), f32),
            jax.ShapeDtypeStruct((chunks, lane_rows, 128), i32),
            jax.ShapeDtypeStruct((STATS_ROWS, lane_rows, 128), i32),
        ],
        scratch_shapes=[
            pltpu.VMEM(shape, f32),  # pend_cr
            pltpu.VMEM(shape, f32),  # pend_ci
            pltpu.VMEM(shape, i32),  # pend_it
            pltpu.VMEM((STATS_ROWS,) + shape, i32),  # counters
        ],
        input_output_aliases={state_in_base + i: i for i in range(n_state)},
        interpret=interpret,
    )(*inputs)

    new_state = LaneState(*out[:n_state])
    return ClassifyResult(
        state=new_state,
        emit_c=out[n_state],
        emit_it=out[n_state + 1],
        stats=out[n_state + 2],
    )
