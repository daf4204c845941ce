"""Extended-precision (df32) Pallas classify kernel for deep zoom.

Same persistent-lane architecture as the production f32 kernel
(cudabrot_tpu.ops.pallas_kernels — persistent samplers with immediate
refill, counter-based PRNG, windowed boundary passes, Brent cycle
detection, pending-register emission), with the orbit state carried as
double-float (hi, lo) float32 pairs (ops/df32): ~2^-48 relative
precision, enough to resolve canvas widths down to ~1e-10 that plain
f32 quantizes into bands (and that the f64-iterating reference,
cudabrot.cu:321, never exposes — it renders the full set only).

Differences from the f32 kernel, all precision-driven:

  * Lane state is 15 arrays: the df32 orbit (zr, zrl, zi, zil), the
    df32 sample c (crh, crl, cih, cil — computed once per refill;
    recomputing c = center (+) offset every step would cost ~8 extra
    VPU ops/step), the 24-bit refill grid indices (kr, ki — the
    emission payload must be exact, and the raw grid index is the only
    representation that round-trips by construction), and the f32
    Brent/bookkeeping registers (sr, si, it, sv, dead).
  * Samples are drawn on the 2^24-point grid of the *sample window*:
    off = (k - 2^23) * step with step = f32(span / 2^24), and
    c = center (+) off in df32, where center is a compile-time df32
    constant pair.  The host replay reconstructs the identical f32
    ``off`` from k and adds it to the f64 center — c agrees with the
    kernel's df32 value to ~2^-48 (documented statistical equivalence,
    same class as the f32 engine's replay contract).
  * Escape tracking is always "thin" (survival counter); the per-step
    mask chain would double the boundary cost of an already ~10x more
    expensive inner step for nothing — the soundness argument
    (escape is a point of no return) is precision-independent.
  * Brent cycle checks compare hi components only: a true df32 cycle
    repeats (hi, lo) exactly, and an hi-only collision without a cycle
    is ~2^-48/lane/window — the same false-positive class the f32
    kernel already accepts.
  * Cardioid/bulb culls evaluate on the f32 approximation of c
    (center_hi + off): the boundary of the cull region blurs by
    ~2^-24, and points that close to the cardioid have escape times
    beyond any practical cap — they classify interior either way.

The kernel seals df32 products with a runtime zero read from a
dedicated f32 SMEM operand — see ops/df32.py's module docstring for why
a literal 0.0 would not survive the compiler.

Cross-backend: the refill sample STREAM is bit-identical on CPU and TPU
(Threefry counters), and the df32 EFT chains are compiler-hardened, but
the f32 escape test (mag2 = nzr*nzr + nzi*nzi on hi parts) may
FMA-contract differently per backend, flipping borderline escape
windows — measured 941 (interpret) vs 932 (silicon) emissions on a
2e-7 window at identical seeds, both matching float64 ground truth at
the same ~98% exact rate. Same-backend runs are bitwise deterministic;
cross-backend equivalence is statistical (the golden-suite contract).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cudabrot_tpu.models.fractals import FractalMap
from cudabrot_tpu.ops import df32
from cudabrot_tpu.ops.pallas_kernels import (
    _BIG,
    _SAVE0,
    STAT_CULLED,
    STAT_CYCLES,
    STAT_DRAWN,
    STAT_IN_BAND,
    STAT_WASTED,
    STATS_ROWS,
    threefry2x32,
    window_seed,
)

_TWO23 = 8388608.0  # 2^23


class ExtLaneState(NamedTuple):
    """Persistent per-lane df32 sampler state, (R, 128) each."""

    kr: jax.Array  # f32 holding the 24-bit real-axis grid index
    ki: jax.Array  # f32 holding the 24-bit imag-axis grid index
    crh: jax.Array  # df32 c (real)
    crl: jax.Array
    cih: jax.Array  # df32 c (imag)
    cil: jax.Array
    zr: jax.Array  # df32 orbit position (real)
    zrl: jax.Array
    zi: jax.Array  # df32 orbit position (imag)
    zil: jax.Array
    sr: jax.Array  # f32 Brent saved point (hi components)
    si: jax.Array
    it: jax.Array  # i32 completed updates of current sample
    sv: jax.Array  # i32 next Brent save index
    dead: jax.Array  # i32 1 => refill at next step (culled draw / initial)
    vis: jax.Array  # i32 1 => trajectory entered the visit window
    #                 (only maintained when the canvas emit filter is on)


def init_ext_lane_state(lane_rows: int) -> ExtLaneState:
    shape = (lane_rows, 128)
    f = lambda v: jnp.full(shape, v, jnp.float32)
    i = lambda v: jnp.full(shape, v, jnp.int32)
    return ExtLaneState(
        kr=f(0.0), ki=f(0.0),
        crh=f(0.0), crl=f(0.0), cih=f(0.0), cil=f(0.0),
        zr=f(0.0), zrl=f(0.0), zi=f(0.0), zil=f(0.0),
        sr=f(_BIG), si=f(_BIG),
        it=i(0), sv=i(_SAVE0),
        dead=i(1),
        vis=i(0),
    )


def grid_params(sample_domain) -> tuple:
    """((crh, crl), (cih, cil), step_r, step_i): the df32 window-center
    constants and the f32 grid pitches. Shared by the kernel and every
    replay path so c reconstruction is consistent everywhere."""
    import numpy as np

    r0, r1, i0, i1 = (float(v) for v in sample_domain)
    center_r = df32.from_float((r0 + r1) / 2.0)
    center_i = df32.from_float((i0 + i1) / 2.0)
    step_r = float(np.float32((r1 - r0) * 2.0**-24))
    step_i = float(np.float32((i1 - i0) * 2.0**-24))
    return center_r, center_i, step_r, step_i


def _make_kernel_ext(
    fractal: FractalMap,
    *,
    min_it: int,
    max_it: int,
    steps_per_flush: int,
    cycle_detection: bool,
    rng: str,
    inner_unroll: int,
    sample_domain: tuple,
    visit_window: tuple | None = None,
):
    """Build the extended-precision classify kernel body. Mirrors
    pallas_kernels._make_kernel's boundary semantics (termination, band
    filter, pending emission, Brent checkpointing, refill, stats) with
    the df32 inner window; see that function for the shared rationale
    and cudabrot.cu line citations."""
    detect = cycle_detection and fractal.cycle_detect
    use_cull = fractal.use_cull
    fold_abs = fractal.fold_abs
    emit_interior = fractal.emit == "interior"
    n_windows = steps_per_flush // inner_unroll
    # Only the grid pitches are baked as constants (they feed sealed
    # products); the df32 centers ride SMEM — see the kernel body.
    _, _, step_r, step_i = grid_params(sample_domain)

    def kernel(*refs):
        if rng != "bits":
            (seed_ref, cref,
             *_ins,
             kr_ref, ki_ref, crh_ref, crl_ref, cih_ref, cil_ref,
             zr_ref, zrl_ref, zi_ref, zil_ref, sr_ref, si_ref,
             it_ref, sv_ref, dead_ref, vis_ref,
             emit_c_ref, emit_it_ref, stats_ref,
             pend_kr, pend_ki, pend_it, counters) = refs
            bits_ref = None
        else:
            (seed_ref, cref, bits_ref,
             *_ins,
             kr_ref, ki_ref, crh_ref, crl_ref, cih_ref, cil_ref,
             zr_ref, zrl_ref, zi_ref, zil_ref, sr_ref, si_ref,
             it_ref, sv_ref, dead_ref, vis_ref,
             emit_c_ref, emit_it_ref, stats_ref,
             pend_kr, pend_ki, pend_it, counters) = refs
        chunk = pl.program_id(0)
        # Runtime df32 constants ride a separate f32 SMEM operand
        # rather than being baked as literals: a CONSTANT operand inside
        # an error-free transformation lets the compiler fold/simplify
        # the chain in excess precision — measured on XLA CPU to
        # silently drop the residual of center (+) off
        # (tests/test_df32.py::test_add_f_constant_operand). Word 4 is
        # the runtime zero for df32 product sealing (ops/df32.py);
        # words 0-3 are the window-center components. (A scalar i32->f32
        # bitcast of seed words was tried first; Mosaic only supports
        # vector bitcasts.)
        c0rh_ = cref[0]
        c0rl_ = cref[1]
        c0ih_ = cref[2]
        c0il_ = cref[3]
        rtz = cref[4]
        if rng == "hardware":
            pltpu.prng_seed(window_seed(seed_ref[0], chunk))

        @pl.when(chunk == 0)
        def _init_scratch():
            pend_kr[...] = jnp.zeros_like(pend_kr)
            pend_ki[...] = jnp.zeros_like(pend_ki)
            pend_it[...] = jnp.full_like(pend_it, -1)
            counters[...] = jnp.zeros_like(counters)

        min_i = jnp.int32(min_it)
        max_i = jnp.int32(max_it)
        if rng == "threefry":
            shape = kr_ref.shape
            lane_iota = (
                jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
                * jnp.uint32(shape[1])
                + jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
            )
            tf_k0 = seed_ref[0].astype(jnp.uint32)
            tf_k1 = seed_ref[1].astype(jnp.uint32)

        def step(widx, s):
            (kr, ki, crh, crl, cih, cil,
             zr, zrl, zi, zil, sr, si, it, sv, dead, vis,
             p_kr, p_ki, p_it,
             n_drawn, n_cull, n_band, n_cyc, n_waste) = s

            # --- inner window: U df32 orbit updates with thin
            # (survival-counter) escape tracking; soundness argument in
            # pallas_kernels._make_kernel (precision-independent) ---
            azr, azrl, azi, azil = zr, zrl, zi, zil
            nesc = jnp.zeros_like(it)
            if visit_window is not None:
                w_hit = jnp.zeros(azr.shape, bool)
                vx0, vx1, vy0, vy1 = (
                    jnp.float32(v) for v in visit_window
                )
            for _ in range(inner_unroll):
                azr, azrl, azi, azil, mag2 = df32.complex_sqr_add(
                    azr, azrl, azi, azil, crh, crl, cih, cil, rtz,
                    fold_abs=fold_abs,
                )
                # `<= 4` so the NaNs an escaped lane coasts into keep
                # counting as escaped.
                nesc = nesc + (mag2 <= 4.0).astype(jnp.int32)
                if visit_window is not None:
                    # Canvas emit filter on hi components: the engine
                    # inflates the window past the hi-only slop and the
                    # f64-replay drift, so only harmless false positives
                    # occur (pallas_engine visit_window).
                    w_hit = w_hit | (
                        (azr >= vx0) & (azr < vx1)
                        & (azi >= vy0) & (azi < vy1)
                    )
            if visit_window is not None:
                vis = vis | w_hit.astype(jnp.int32)
            esc_mask = nesc < jnp.int32(inner_unroll)
            needed = it + nesc
            if detect:
                cyc_mask = (azr == sr) & (azi == si) & ~esc_mask
            else:
                cyc_mask = jnp.zeros(azr.shape, bool)

            it_new = it + inner_unroll

            # --- boundary: termination + band filter (semantics of
            # pallas_kernels._make_kernel, cudabrot.cu:407-408) ---
            maxed = it_new >= max_i
            deadb = dead != 0
            fin = esc_mask | cyc_mask | maxed | deadb
            if emit_interior:
                esc_in_cap = esc_mask & (needed < max_i)
                in_band = (cyc_mask | maxed) & ~esc_in_cap & ~deadb
                if visit_window is not None:
                    in_band = in_band & (vis != 0)
                p_kr = jnp.where(in_band, kr, p_kr)
                p_ki = jnp.where(in_band, ki, p_ki)
                p_it = jnp.where(in_band, max_i - 1, p_it)
            else:
                in_band = (
                    esc_mask & ~deadb & (needed >= min_i) & (needed < max_i)
                )
                if visit_window is not None:
                    in_band = in_band & (vis != 0)
                p_kr = jnp.where(in_band, kr, p_kr)
                p_ki = jnp.where(in_band, ki, p_ki)
                p_it = jnp.where(in_band, needed, p_it)

            # --- Brent checkpoint (hi components only) ---
            if detect:
                at_save = (it_new >= sv) & ~fin
                sr2 = jnp.where(at_save, azr, sr)
                si2 = jnp.where(at_save, azi, si)
                sv2 = jnp.where(at_save, sv * 2, sv)
            else:
                sr2, si2, sv2 = sr, si, sv

            # --- refill finished lanes with fresh window-grid samples ---
            if rng == "hardware_rw":
                gwin = (
                    chunk * jnp.int32(n_windows) + widx
                ).astype(jnp.uint32)
                pltpu.prng_seed(window_seed(seed_ref[0], gwin))
                rb_r = pltpu.bitcast(
                    pltpu.prng_random_bits((kr.shape[0], kr.shape[1])),
                    jnp.uint32,
                )
                rb_i = pltpu.bitcast(
                    pltpu.prng_random_bits((kr.shape[0], kr.shape[1])),
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
                    pltpu.prng_random_bits((kr.shape[0], kr.shape[1])),
                    jnp.uint32,
                )
                rb_i = pltpu.bitcast(
                    pltpu.prng_random_bits((kr.shape[0], kr.shape[1])),
                    jnp.uint32,
                )
            else:
                rb_r = bits_ref[0, widx, 0]
                rb_i = bits_ref[0, widx, 1]
            # 24-bit grid indices (top bits — exact in i32 and f32).
            nkr = jax.lax.shift_right_logical(
                rb_r, jnp.uint32(8)
            ).astype(jnp.int32).astype(jnp.float32)
            nki = jax.lax.shift_right_logical(
                rb_i, jnp.uint32(8)
            ).astype(jnp.int32).astype(jnp.float32)
            # Window offsets, sealed (the product feeds two_sum adds;
            # an FMA contraction would mix rounded/unrounded offsets).
            off_r = (nkr - jnp.float32(_TWO23)) * jnp.float32(step_r) + rtz
            off_i = (nki - jnp.float32(_TWO23)) * jnp.float32(step_i) + rtz
            # c = center (+) off in df32 (runtime-opaque center, see
            # the SMEM note at the top of the kernel).
            ncrh, ncrl = df32.add_f(c0rh_, c0rl_, off_r)
            ncih, ncil = df32.add_f(c0ih_, c0il_, off_i)
            if use_cull:
                # Approximate c is enough: the cull boundary blurs by
                # ~2^-24, where escape times exceed any practical cap.
                ca_r = c0rh_ + off_r
                ca_i = c0ih_ + off_i
                imag_sq = ca_i * ca_i
                q = (ca_r - 0.25)
                q = q * q + imag_sq
                card = q * (q + (ca_r - 0.25)) < imag_sq * 0.25
                t = ca_r + 1.0
                bulb = (t * t + imag_sq) < 0.0625
                ncull = card | bulb
            else:
                ncull = jnp.zeros_like(esc_mask)

            kr = jnp.where(fin, nkr, kr)
            ki = jnp.where(fin, nki, ki)
            crh = jnp.where(fin, ncrh, crh)
            crl = jnp.where(fin, ncrl, crl)
            cih = jnp.where(fin, ncih, cih)
            cil = jnp.where(fin, ncil, cil)
            # z starts at c (cudabrot.cu:323-324) — df32 copy.
            zr = jnp.where(fin, ncrh, azr)
            zrl = jnp.where(fin, ncrl, azrl)
            zi = jnp.where(fin, ncih, azi)
            zil = jnp.where(fin, ncil, azil)
            it = jnp.where(fin, 0, it_new)
            sr = jnp.where(fin, jnp.float32(_BIG), sr2)
            si = jnp.where(fin, jnp.float32(_BIG), si2)
            sv = jnp.where(fin, jnp.int32(_SAVE0), sv2)
            dead = jnp.where(fin, ncull.astype(jnp.int32), dead)
            if visit_window is not None:
                vis = jnp.where(fin, 0, vis)

            one = jnp.int32(1)
            zero = jnp.int32(0)
            unroll = jnp.int32(inner_unroll)
            n_drawn = n_drawn + jnp.where(fin, one, zero)
            n_cull = n_cull + jnp.where(fin & ncull, one, zero)
            n_band = n_band + jnp.where(in_band, one, zero)
            n_cyc = n_cyc + jnp.where(cyc_mask & ~deadb, one, zero)
            n_waste = n_waste + jnp.where(deadb, unroll, zero)
            n_waste = n_waste + jnp.where(
                esc_mask & ~deadb, it_new - needed - 1, zero
            )
            return (kr, ki, crh, crl, cih, cil,
                    zr, zrl, zi, zil, sr, si, it, sv, dead, vis,
                    p_kr, p_ki, p_it,
                    n_drawn, n_cull, n_band, n_cyc, n_waste)

        carry = (
            kr_ref[...], ki_ref[...],
            crh_ref[...], crl_ref[...], cih_ref[...], cil_ref[...],
            zr_ref[...], zrl_ref[...], zi_ref[...], zil_ref[...],
            sr_ref[...], si_ref[...], it_ref[...], sv_ref[...],
            dead_ref[...], vis_ref[...],
            pend_kr[...], pend_ki[...], pend_it[...],
            counters[STAT_DRAWN], counters[STAT_CULLED],
            counters[STAT_IN_BAND], counters[STAT_CYCLES],
            counters[STAT_WASTED],
        )
        carry = jax.lax.fori_loop(
            0, steps_per_flush // inner_unroll, step, carry
        )
        (kr, ki, crh, crl, cih, cil,
         zr, zrl, zi, zil, sr, si, it, sv, dead, vis,
         p_kr, p_ki, p_it,
         n_drawn, n_cull, n_band, n_cyc, n_waste) = carry

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
        vis_ref[...] = vis
        counters[STAT_DRAWN] = n_drawn
        counters[STAT_CULLED] = n_cull
        counters[STAT_IN_BAND] = n_band
        counters[STAT_CYCLES] = n_cyc
        counters[STAT_WASTED] = n_waste
        stats_ref[...] = counters[...]

        emit_c_ref[0, 0] = p_kr
        emit_c_ref[0, 1] = p_ki
        emit_it_ref[0] = p_it
        pend_kr[...] = p_kr * 0.0
        pend_ki[...] = p_ki * 0.0
        pend_it[...] = jnp.full_like(p_it, -1)

    return kernel


class ExtClassifyResult(NamedTuple):
    state: ExtLaneState
    emit_c: jax.Array  # (chunks, 2, R, 128) f32 — 24-bit GRID INDICES
    emit_it: jax.Array  # (chunks, R, 128) i32 — escape index, -1 invalid
    stats: jax.Array  # (STATS_ROWS, R, 128) i32 per-lane pass counters


@functools.partial(
    jax.jit,
    static_argnames=(
        "fractal", "min_it", "max_it", "steps_per_pass", "steps_per_flush",
        "cycle_detection", "interpret", "inner_unroll", "rng",
        "sample_domain", "visit_window",
    ),
    donate_argnums=(0,),
)
def classify_pass_ext(
    state: ExtLaneState,
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
    visit_window: tuple | None = None,
) -> ExtClassifyResult:
    """Extended-precision classify pass: same contract as
    pallas_kernels.classify_pass with df32 orbit state and grid-index
    emissions (emit_c carries the 24-bit window grid indices, which
    round-trip exactly to the replay engines — see _make_kernel_ext)."""
    if steps_per_pass % steps_per_flush != 0:
        raise ValueError("steps_per_pass must be a multiple of steps_per_flush")
    if steps_per_flush % inner_unroll != 0:
        raise ValueError("steps_per_flush must be a multiple of inner_unroll")
    chunks = steps_per_pass // steps_per_flush
    windows = steps_per_flush // inner_unroll
    lane_rows = state.kr.shape[0]
    shape = (lane_rows, 128)
    if rng is None:
        rng = "bits" if bits is not None else "threefry"
    if rng not in ("threefry", "hardware", "hardware_rw", "bits"):
        raise ValueError(f"Unknown rng mode: {rng}")
    if (rng == "bits") != (bits is not None):
        raise ValueError("bits must be supplied iff rng == 'bits'")

    kernel = _make_kernel_ext(
        fractal,
        min_it=min_it,
        max_it=max_it,
        steps_per_flush=steps_per_flush,
        cycle_detection=cycle_detection,
        rng=rng,
        inner_unroll=inner_unroll,
        sample_domain=sample_domain,
        visit_window=visit_window,
    )

    f32 = jnp.float32
    i32 = jnp.int32
    n_state = len(ExtLaneState._fields)
    state_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_state
    out_state_shapes = [
        jax.ShapeDtypeStruct(
            shape, i32 if f in ("it", "sv", "dead", "vis") else f32
        )
        for f in ExtLaneState._fields
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
    # Second SMEM operand: the runtime-opaque df32 constants — window-
    # center components (words 0-3) and the product-sealing zero
    # (word 4). See the kernel body for why these must not be literals.
    (c0r, c0i, _sr, _si) = grid_params(sample_domain)
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
            pltpu.VMEM(shape, f32),  # pend_kr
            pltpu.VMEM(shape, f32),  # pend_ki
            pltpu.VMEM(shape, i32),  # pend_it
            pltpu.VMEM((STATS_ROWS,) + shape, i32),  # counters
        ],
        input_output_aliases={state_in_base + i: i for i in range(n_state)},
        interpret=interpret,
    )(*inputs)

    new_state = ExtLaneState(*out[:n_state])
    return ExtClassifyResult(
        state=new_state,
        emit_c=out[n_state],
        emit_it=out[n_state + 1],
        stats=out[n_state + 2],
    )
