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


def draw_samples(key, n: int, dtype):
    """Uniform c over the fixed sample domain (cudabrot.cu:392-393)."""
    kr, ki = jax.random.split(key)
    lo_r, hi_r, lo_i, hi_i = SAMPLE_DOMAIN
    cr = jax.random.uniform(kr, (n,), dtype=dtype, minval=lo_r, maxval=hi_r)
    ci = jax.random.uniform(ki, (n,), dtype=dtype, minval=lo_i, maxval=hi_i)
    return cr, ci


def classify(fractal: fractals.FractalMap, cr, ci, max_iterations: int):
    """Escape-time classification (IterateMandelbrot, cudabrot.cu:319-340).

    Returns (iters, escaped, trip): iters is the 0-based escape index for
    escaped lanes and max_iterations for non-escaping lanes; trip is the
    number of lockstep loop iterations actually executed (every lane,
    escaped-and-frozen or not, occupies a vector slot for all of them —
    the quantity comparable to the pallas engine's lane-steps).
    """
    n = cr.shape
    max_it = jnp.int32(max_iterations)

    def cond(carry):
        i, zr, zi, iters, esc = carry
        return (i < max_it) & jnp.any(~esc)

    def body(carry):
        i, zr, zi, iters, esc = carry
        nzr, nzi = fractals.step(fractal, zr, zi, cr, ci)
        # Freeze escaped lanes so their state can't overflow to inf/nan and
        # so the loop's work is well-defined.
        zr = jnp.where(esc, zr, nzr)
        zi = jnp.where(esc, zi, nzi)
        esc_now = ~esc & fractals.escaped(zr, zi)
        iters = jnp.where(esc_now, i, iters)
        return (i + 1, zr, zi, iters, esc | esc_now)

    init = (
        jnp.int32(0),
        cr,
        ci,
        jnp.full(n, max_it, dtype=jnp.int32),
        jnp.zeros(n, dtype=bool),
    )
    trip, _, _, iters, esc = jax.lax.while_loop(cond, body, init)
    return iters, esc, trip


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
    escape-time guarantee implies)."""

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


def render_pass(hist, key, cfg: RenderConfig):
    """One oracle pass: the jittable unit of work (equivalent of one
    DrawBuddhabrot launch, cudabrot.cu:485-486)."""
    fractal = fractals.get_fractal(cfg.fractal)
    n = cfg.options.oracle_samples_per_pass
    dtype = jnp.dtype(cfg.options.precision)
    canvas = cfg.canvas
    max_it = cfg.band.max_escape_iterations
    min_it = cfg.band.min_escape_iterations

    cr, ci = draw_samples(key, n, dtype)
    culled = fractals.cull_mask(fractal, cr, ci)
    # The reference skips culled samples before iterating (cudabrot.cu:397-399);
    # culled points are mathematically non-escaping so classifying them too
    # changes nothing but wasted work — mask them out of classification by
    # treating them as already-escaped-at--1.
    iters, escaped, trip = classify(fractal, cr, ci, max_it)
    if fractal.emit == "interior":
        # Anti-Buddhabrot: render the samples that do NOT escape within
        # the cap; classify leaves their iters at max_it, so the replay
        # bound (s <= iters over max_it steps) records exactly max_it
        # orbit points per sample. The min cutoff is ignored.
        in_band = ~escaped & ~culled
    else:
        in_band = escaped & ~culled & (iters >= min_it)

    hist_flat = replay_into(
        hist.reshape(-1), fractal, canvas, cr, ci, iters, in_band, max_it
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
        # and s <= iters is then always true).
        orbit_points=counters.u64_sum_i32(
            jnp.where(in_band, jnp.minimum(iters + 1, max_it), 0)
        ),
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
