"""Oracle engine vs the scalar float64 ground truth (exact-match where
float arithmetic allows, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cudabrot_tpu.config import Canvas, EngineOptions, IterationBand, RenderConfig
from cudabrot_tpu.models import fractals
from cudabrot_tpu.ops import oracle
from tests import reference_impl as ref


def _samples(n, seed=7):
    rng = np.random.default_rng(seed)
    cr = rng.uniform(-2.0, 2.0, n)
    ci = rng.uniform(-2.0, 2.0, n)
    return cr, ci


@pytest.mark.parametrize("fractal_name", ["buddhabrot", "burning-ship"])
def test_classify_matches_scalar(fractal_name):
    cr, ci = _samples(512)
    fm = fractals.get_fractal(fractal_name)
    max_it = 64
    iters, escaped, _trip, _vis = oracle.classify(
        fm, jnp.asarray(cr, jnp.float64), jnp.asarray(ci, jnp.float64), max_it
    )
    iters = np.asarray(iters)
    escaped = np.asarray(escaped)
    mismatches = 0
    for k in range(len(cr)):
        want = ref.classify_scalar(
            cr[k], ci[k], max_it, burning_ship=(fractal_name == "burning-ship")
        )
        if want != iters[k]:
            mismatches += 1
        else:
            assert escaped[k] == (want < max_it)
    # Allow a tiny count of FMA-contraction boundary differences.
    assert mismatches <= 1


def test_render_pass_matches_scalar_histogram():
    """Full pass vs scalar ground truth on the same samples, exact."""
    canvas = Canvas(width=64, height=48, min_real=-2.0, max_real=2.0,
                    min_imag=-1.5, max_imag=1.5)
    n = 512
    max_it, min_it = 60, 5
    cfg = RenderConfig(
        canvas=canvas,
        band=IterationBand(max_escape_iterations=max_it,
                           min_escape_iterations=min_it),
        options=EngineOptions(oracle_samples_per_pass=n,
                              precision="float64"),
    )
    key = jax.random.key(123)
    hist, stats = jax.jit(
        oracle.render_pass, static_argnames="cfg"
    )(jnp.zeros(canvas.shape, jnp.uint32), key, cfg)

    # Re-derive the exact same samples the oracle drew.
    cr, ci = oracle.draw_samples(key, n, jnp.float64)
    cr = np.asarray(cr, np.float64)
    ci = np.asarray(ci, np.float64)
    want_hist, want_iters, want_band = ref.render_samples(
        cr, ci, canvas, max_it, min_it
    )

    got = np.asarray(hist)
    assert int(stats.samples) == n
    assert int(stats.in_band) == int(want_band.sum())
    np.testing.assert_array_equal(got, want_hist)


def test_render_pass_band_filter_empty_when_min_exceeds_max():
    cfg = RenderConfig(
        canvas=Canvas(width=16, height=16),
        band=IterationBand(max_escape_iterations=30,
                           min_escape_iterations=30),
        options=EngineOptions(oracle_samples_per_pass=256,
                              precision="float64"),
    )
    hist, stats = oracle.render_pass(
        jnp.zeros((16, 16), jnp.uint32), jax.random.key(0), cfg
    )
    assert int(stats.in_band) == 0
    assert int(np.asarray(hist).sum()) == 0


def test_render_pass_accumulates_onto_existing_histogram():
    cfg = RenderConfig(
        canvas=Canvas(width=16, height=16),
        band=IterationBand(max_escape_iterations=40,
                           min_escape_iterations=2),
        options=EngineOptions(oracle_samples_per_pass=256,
                              precision="float64"),
    )
    key = jax.random.key(5)
    zero = jnp.zeros((16, 16), jnp.uint32)
    h1, _ = oracle.render_pass(zero, key, cfg)
    h2, _ = oracle.render_pass(h1, key, cfg)
    np.testing.assert_array_equal(np.asarray(h2), 2 * np.asarray(h1))


def test_different_passes_draw_different_samples():
    cfg = RenderConfig(options=EngineOptions(oracle_samples_per_pass=128))
    k1 = jax.random.fold_in(jax.random.key(cfg.seed), 0)
    k2 = jax.random.fold_in(jax.random.key(cfg.seed), 1)
    a, _ = oracle.draw_samples(k1, 128, jnp.float32)
    b, _ = oracle.draw_samples(k2, 128, jnp.float32)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_classify_iters_plus_wasted_equals_executed_lockstep_work():
    """Cross-engine stat comparability (VERDICT r2 weak #6): the oracle's
    classify_iters counts useful escape-time work only (same meaning as the
    pallas engine's) and wasted_steps carries everything else the lockstep
    while_loop executed, so classify_iters + wasted_steps == lanes * trip."""
    from cudabrot_tpu.utils import counters

    cfg = RenderConfig(
        canvas=Canvas(width=16, height=16),
        band=IterationBand(max_escape_iterations=40,
                           min_escape_iterations=2),
        options=EngineOptions(oracle_samples_per_pass=512),
    )
    key = jax.random.key(3)
    _, stats = oracle.render_pass(
        jnp.zeros((16, 16), jnp.uint32), key, cfg
    )
    useful = counters.u64_value(jax.device_get(stats.classify_iters))
    wasted = counters.u64_value(jax.device_get(stats.wasted_steps))
    # 512 uniform samples over [-2,2]^2 always include culled/non-escaping
    # points, which pin the lockstep loop at max_it trips.
    assert useful + wasted == 512 * 40
    assert useful > 0 and wasted > 0


def test_compacted_replay_matches_full_replay():
    """Deep-band oracle passes compact in-band samples before replay
    (capacity < n); the histogram must equal the uncompacted result
    exactly, and overflow must be counted, never silently lost."""
    canvas = Canvas(width=64, height=64)
    band = IterationBand(max_escape_iterations=3000,
                         min_escape_iterations=50)

    def run(capacity):
        cfg = RenderConfig(
            canvas=canvas, band=band,
            options=EngineOptions(oracle_samples_per_pass=4096,
                                  oracle_replay_capacity=capacity),
        )
        return oracle.render_pass(
            jnp.zeros(canvas.shape, jnp.uint32), jax.random.key(11), cfg
        )

    h_auto, s_auto = run(0)      # auto: compacted (frac*16*n << n)
    h_full, s_full = run(4096)   # capacity == n: no compaction
    assert oracle._replay_capacity(
        RenderConfig(canvas=canvas, band=band,
                     options=EngineOptions(oracle_samples_per_pass=4096)),
        4096,
    ) < 4096
    np.testing.assert_array_equal(np.asarray(h_auto), np.asarray(h_full))
    assert int(s_auto.replay_dropped) == 0
    from cudabrot_tpu.utils import counters as ctr
    assert ctr.u64_value(jax.device_get(s_auto.orbit_points)) == \
        ctr.u64_value(jax.device_get(s_full.orbit_points))

    # Forced tiny capacity: drops are counted and mass shrinks.
    h_tiny, s_tiny = run(1)
    n_band = int(s_full.in_band)
    assert n_band > 1
    assert int(s_tiny.replay_dropped) == n_band - 1
    assert np.asarray(h_tiny).sum() < np.asarray(h_full).sum()
