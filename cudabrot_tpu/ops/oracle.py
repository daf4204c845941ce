"""Pure jax.numpy reference sampler ("oracle").

A vectorized, functionally-pure re-statement of the reference's per-thread
algorithm (DrawBuddhabrot, cudabrot.cu:379-414): draw uniform samples from
the fixed [-2,2]^2 domain, cull cardioid/bulb points, classify by escape
time (IterateMandelbrot, cudabrot.cu:319-340), and replay in-band orbits
into the histogram (IterateAndRecord, cudabrot.cu:347-365). It is the
correctness oracle every production kernel is tested against, and also a
fully usable (if slower) engine on any JAX backend.

Semantics preserved exactly:
  * z starts at c, not 0 (cudabrot.cu:323-324) — the orbit's first recorded
    point is c^2 + c;
  * a sample escaping at loop index i (0-based, checked after the update,
    cudabrot.cu:336) reports iterations_needed == i and replays i+1 update
    steps, recording every one including the final escaped point
    (cudabrot.cu:352-364);
  * the band filter keeps min_escape <= i < max_escape (cudabrot.cu:407-408);
  * samples are drawn from the full domain regardless of canvas
    (cudabrot.cu:392-393).

Differences (documented, statistically immaterial): threefry counter-based
keys replace cuRAND sequences; uniforms are [0,1) rather than (0,1];
accumulation is deterministic rather than racy.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cudabrot_tpu.config import RenderConfig, SAMPLE_DOMAIN
from cudabrot_tpu.models import fractals
from cudabrot_tpu.ops import binning
from cudabrot_tpu.utils import counters


class PassStats(NamedTuple):
    """Per-pass device-side counters. Sample counts are uint32 scalars
    (bounded by the batch size); the iteration/point totals are exact
    (lo, hi) uint32 pairs (counters.u64_sum_i32) so a single pass may
    execute more than 2^32 iterations."""

    samples: jnp.ndarray
    culled: jnp.ndarray
    in_band: jnp.ndarray
    classify_iters: tuple  # (lo, hi) sum of per-sample useful escape-time work
    orbit_points: tuple  # (lo, hi) points scattered (incl. off-canvas)
    wasted_steps: tuple  # (lo, hi) executed-but-useless lockstep work
    replay_dropped: jnp.ndarray  # in-band samples beyond replay capacity


def draw_samples(key, n: int, dtype, domain=SAMPLE_DOMAIN):
    """Uniform c over the sample domain (cudabrot.cu:392-393; the domain
    is the fixed [-2,2]^2 unless the render restricts it via
    RenderConfig.sample_domain)."""
    kr, ki = jax.random.split(key)
    lo_r, hi_r, lo_i, hi_i = domain
    cr = jax.random.uniform(kr, (n,), dtype=dtype, minval=lo_r, maxval=hi_r)
    ci = jax.random.uniform(ki, (n,), dtype=dtype, minval=lo_i, maxval=hi_i)
    return cr, ci


def classify(
    fractal: fractals.FractalMap,
    cr,
    ci,
    max_iterations: int,
    visit_window: tuple | None = None,
):
    """Escape-time classification (IterateMandelbrot, cudabrot.cu:319-340).

    Returns (iters, escaped, trip, visited): iters is the 0-based escape
    index for escaped lanes and max_iterations for non-escaping lanes;
    trip is the number of lockstep loop iterations actually executed
    (every lane, escaped-and-frozen or not, occupies a vector slot for
    all of them — the quantity comparable to the pallas engine's
    lane-steps). ``visited`` tracks whether the trajectory entered
    ``visit_window`` (the canvas emit filter); None when the window is
    None.
    """
    n = cr.shape
    max_it = jnp.int32(max_iterations)

    def cond(carry):
        i = carry[0]
        esc = carry[4]
        return (i < max_it) & jnp.any(~esc)

    def body(carry):
        i, zr, zi, iters, esc, vis = carry
        nzr, nzi = fractals.step(fractal, zr, zi, cr, ci)
        # Freeze escaped lanes so their state can't overflow to inf/nan and
        # so the loop's work is well-defined.
        zr = jnp.where(esc, zr, nzr)
        zi = jnp.where(esc, zi, nzi)
        esc_now = ~esc & fractals.escaped(zr, zi)
        iters = jnp.where(esc_now, i, iters)
        if visit_window is not None:
            vx0, vx1, vy0, vy1 = visit_window
            # Frozen lanes re-test their (escape) position — idempotent.
            vis = vis | (
                (zr >= vx0) & (zr < vx1) & (zi >= vy0) & (zi < vy1)
            )
        return (i + 1, zr, zi, iters, esc | esc_now, vis)

    init = (
        jnp.int32(0),
        cr,
        ci,
        jnp.full(n, max_it, dtype=jnp.int32),
        jnp.zeros(n, dtype=bool),
        jnp.zeros(n, dtype=bool),
    )
    trip, _, _, iters, esc, vis = jax.lax.while_loop(cond, body, init)
    return iters, esc, trip, (vis if visit_window is not None else None)


def replay_into(
    hist_flat,
    fractal: fractals.FractalMap,
    canvas,
    cr,
    ci,
    iters,
    record,
    max_iterations: int,
):
    """Replay recorded-band orbits and accumulate their points
    (IterateAndRecord, cudabrot.cu:347-365, with the unbounded while(1)
    replaced by the statically-bounded s <= iters loop the caller's
    escape-time guarantee implies).

    Known conscious deviation from the reference's record-then-break
    (cudabrot.cu:360-363): classify and replay are separately compiled
    programs, so on long chaotic orbits their f32 trajectories
    decorrelate and the replay path may escape before the classified
    index; the subsequent points are recorded (the few with
    2 < |z| <= 2*sqrt(2) still land in the square canvas's corners)
    rather than broken out of. A record-then-break variant was built and
    MEASURED: statistically invisible (null-calibrated chi2/TV, corner
    mass is off-attractor and dim) but -10% end-to-end at the headline
    band in the native engine, because the churn was already time-free
    (length-sorted group-max-bound loops; off-canvas increments already
    skipped). See PERF_NOTES.md "record-then-break replay".
    """

    def body(s, carry):
        hist_flat, zr, zi = carry
        zr, zi = fractals.step(fractal, zr, zi, cr, ci)
        rec = record & (s <= iters)
        ids = binning.points_to_bin_ids(canvas, zr, zi, rec)
        # Per-step scatter keeps memory flat; the oracle always uses the
        # plain XLA scatter backend (batched/sorted accumulation is a
        # production-engine optimization exercised separately).
        hist_flat = binning.scatter_xla(hist_flat, ids)
        return (hist_flat, zr, zi)

    hist_flat, _, _ = jax.lax.fori_loop(
        0, max_iterations, body, (hist_flat, cr, ci)
    )
    return hist_flat


def _replay_capacity(cfg: RenderConfig, n: int) -> int:
    """Static replay-batch size. Auto sizes from the ~C/t escape-time
    tail model (C = 0.22, see pallas_engine.band_emission_rate) with 16x
    headroom, so overflow drops are vanishingly rare; emission-heavy
    bands (interior mode, shallow bands) resolve to n (no compaction —
    there is nothing to skip)."""
    opt = cfg.options.oracle_replay_capacity
    if opt > 0:
        return min(opt, n)
    if cfg.fractal and getattr(
        fractals.get_fractal(cfg.fractal), "emit", "escape"
    ) == "interior":
        return n
    import math

    mi = max(cfg.band.min_escape_iterations, 2)
    ma = max(cfg.band.max_escape_iterations, 4)
    frac = max(0.22 * (1.0 / mi - 1.0 / ma), 1e-7)
    if cfg.sample_domain != SAMPLE_DOMAIN:
        # A restricted sample domain concentrates the in-band rate by up
        # to the area ratio; boost by at most 16x (matching the pallas
        # Tuning policy — oracle replay work scales with capacity, so
        # worst-case sizing is not free either). The oracle's overflow
        # drop is lane-order based (unbiased) and counted; the driver
        # warns if it becomes material.
        r0, r1, i0, i1 = cfg.sample_domain
        area = (r1 - r0) * (i1 - i0)
        frac = min(frac * min(16.0 / max(area, 1e-30), 16.0), 1.0)
    expected = n * frac
    cap = 1 << max(10, math.ceil(math.log2(max(expected * 16, 1.0))))
    return min(cap, n)


def render_pass(hist, key, cfg: RenderConfig):
    """One oracle pass: the jittable unit of work (equivalent of one
    DrawBuddhabrot launch, cudabrot.cu:485-486)."""
    fractal = fractals.get_fractal(cfg.fractal)
    n = cfg.options.oracle_samples_per_pass
    # "extended" (the pallas engine's df32 deep-zoom mode, ~2^-48) runs
    # as float64 here — its strict superset; the oracle is the ground
    # truth the df32 engine validates against (tests/test_extended.py).
    dtype = jnp.dtype(
        "float64"
        if cfg.options.precision == "extended"
        else cfg.options.precision
    )
    canvas = cfg.canvas
    max_it = cfg.band.max_escape_iterations
    min_it = cfg.band.min_escape_iterations

    cr, ci = draw_samples(key, n, dtype, cfg.sample_domain)
    culled = fractals.cull_mask(fractal, cr, ci)
    # The reference skips culled samples before iterating (cudabrot.cu:397-399);
    # culled points are mathematically non-escaping so classifying them too
    # changes nothing but wasted work — mask them out of classification by
    # treating them as already-escaped-at--1.
    visit_window = None
    if cfg.options.emit_filter == "canvas":
        # Canvas emit filter: only orbits whose trajectory entered the
        # (one-pixel-inflated) canvas window are replayed — identical
        # rendered measure, a fraction of the replay work on cropped
        # canvases (see EngineOptions.emit_filter). classify and replay
        # are separately compiled programs, so long chaotic f32 orbits
        # can decorrelate between them (replay_into docstring); the
        # inflation plus that documented statistically-invisible class
        # covers the residual.
        visit_window = (
            canvas.min_real,
            canvas.max_real + canvas.delta_real,
            canvas.min_imag,
            canvas.max_imag + canvas.delta_imag,
        )
    iters, escaped, trip, visited = classify(
        fractal, cr, ci, max_it, visit_window
    )
    if fractal.emit == "interior":
        # Anti-Buddhabrot: render the samples that do NOT escape within
        # the cap; classify leaves their iters at max_it, so the replay
        # bound (s <= iters over max_it steps) records exactly max_it
        # orbit points per sample. The min cutoff is ignored.
        in_band = ~escaped & ~culled
    else:
        in_band = escaped & ~culled & (iters >= min_it)
    if visited is not None:
        in_band = in_band & visited

    # Compact in-band samples to a small static batch before replay — the
    # reference's own two-pass structure (only band-passing samples reach
    # IterateAndRecord, cudabrot.cu:407-412). Without this the replay
    # fori_loop scatters all n lanes for every one of max_it trips; at
    # deep bands (in-band fraction ~1e-4) that is ~n/capacity x wasted
    # scatter work — measured 57 s/pass at n=2^18, m=20000 vs ~2 s
    # compacted. A stable argsort keeps replay order deterministic;
    # overflow beyond capacity is dropped and counted (replay_dropped),
    # exactly like the pallas engine's emission capacity.
    capacity = _replay_capacity(cfg, n)
    if capacity >= n:
        sel_cr, sel_ci, sel_it, sel_rec = cr, ci, iters, in_band
        dropped = jnp.uint32(0)
    else:
        order = jnp.argsort(~in_band, stable=True)[:capacity]
        sel_cr = cr[order]
        sel_ci = ci[order]
        sel_it = iters[order]
        sel_rec = in_band[order]
        n_band = jnp.sum(in_band, dtype=jnp.uint32)
        dropped = n_band - jnp.minimum(n_band, jnp.uint32(capacity))
    hist_flat = replay_into(
        hist.reshape(-1), fractal, canvas, sel_cr, sel_ci, sel_it,
        sel_rec, max_it
    )
    # Useful classify work per lane (same meaning as the pallas engine's
    # "iters" stat): the escape-time steps the algorithm needed. Culled
    # lanes contribute zero useful work; everything else the lockstep
    # while_loop executed on them (trip steps each — they never escape, so
    # they pin the loop at max_it) is accounted as wasted_steps, exactly
    # like the pallas kernel's culled-draw/coast waste. This keeps
    # classify_iters + wasted_steps == executed lane-steps across engines.
    useful = jnp.where(culled, 0, jnp.where(escaped, iters + 1, max_it))
    stats = PassStats(
        samples=jnp.uint32(n),
        culled=jnp.sum(culled).astype(jnp.uint32),
        in_band=jnp.sum(in_band).astype(jnp.uint32),
        classify_iters=counters.u64_sum_i32(useful),
        wasted_steps=counters.u64_sum_i32(trip - useful),
        # Points recorded per emission: iters + 1 for escapers, exactly
        # max_it for interior samples (the replay loop runs max_it steps
        # and s <= iters is then always true). Counted over the REPLAYED
        # batch so capacity drops are excluded, like the pallas engine.
        orbit_points=counters.u64_sum_i32(
            jnp.where(sel_rec, jnp.minimum(sel_it + 1, max_it), 0)
        ),
        replay_dropped=dropped,
    )
    return hist_flat.reshape(canvas.shape), stats


def make_pass_fn(cfg: RenderConfig):
    """Build the jitted pass function ``(hist, pass_index) -> (hist, stats)``
    with the histogram donated so it stays device-resident across passes
    (the analog of the device buffer living across kernel launches,
    cudabrot.cu:485-496)."""
    base_key = jax.random.key(cfg.seed)

    @functools.partial(jax.jit, donate_argnums=0)
    def pass_fn(hist, pass_index):
        key = jax.random.fold_in(base_key, pass_index)
        return render_pass(hist, key, cfg)

    return pass_fn
