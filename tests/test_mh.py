"""Metropolis-Hastings importance sampler (--sampler mh).

Correctness structure:

  * Config/validation: the MH surface rejects every unsupported
    combination loudly (oracle engine, float64 precision, step
    tracking, canvas emit filter, row sharding).
  * Exact accounting: every deposited count is a fixed-point importance
    weight; the histogram total must equal the deposited-mass tally
    exactly (device counter or host worker), and a run is bitwise
    reproducible at a fixed seed. The jax (u32 long division) and
    numpy (u64) deposit maths must agree exactly.
  * Bits-injection: driving the kernel with known randomness pins the
    restart/proposal mechanics (grid install, c reconstruction, chain
    seeding) exactly.
  * The headline contract: a normalized MH render of a crop must agree
    with a normalized UNIFORM render of the same configuration — MH is
    a different estimator of the same measure (the 1/v weights undo the
    v-proportional stationary density; ops/pallas_kernels_mh.py). The
    uniform comparator runs a completely independent deposit path
    (native host replay of its own emissions), so this also checks the
    kernel-recorded visit BINS land where the measure says they must.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cudabrot_tpu.config import (
    Canvas,
    ConfigError,
    EngineOptions,
    IterationBand,
    RenderConfig,
)
from cudabrot_tpu.engines import make_engine
from cudabrot_tpu.engines.pallas_engine import PallasEngine
from cudabrot_tpu.io import native
from cudabrot_tpu.models import fractals
from cudabrot_tpu.ops import pallas_kernels_mh as pkm

#: The uniform comparator (and the u64 host path) still replay through
#: the native engine.
needs_native = pytest.mark.skipif(
    not native.available(), reason="native replay unavailable"
)

# The seahorse-valley crop used across the crop-feature tests: selective
# (most full-domain orbits never enter it) but cheap.
_CROP = Canvas(
    width=40, height=40,
    min_real=-0.78, max_real=-0.72, min_imag=0.05, max_imag=0.11,
)
_BAND = IterationBand(max_escape_iterations=300, min_escape_iterations=20)


def _mh_cfg(**kw):
    opts = dict(
        sampler="mh",
        lane_rows=8,
        mh_burnin_passes=1,
        # Pin the flush window: the auto tuner's tenure floor (sized for
        # deep silicon bands) would pick 512 here and quadruple the CPU
        # cost of every accounting test; none of these tests exercise
        # the auto window choice (test_tuning_mh_flush_floor does).
        steps_per_flush=128,
    )
    opts.update(kw.pop("options", {}))
    base = dict(canvas=_CROP, band=_BAND, seconds_to_run=-1.0)
    base.update(kw)
    return RenderConfig(options=EngineOptions(**opts), **base)


def _run(engine, passes):
    state = engine.init_state(None)
    for p in range(passes):
        state = engine.run_pass(state, p)
    jax.block_until_ready(state)
    return engine.histogram(state), engine.stats(state)


# ---------------------------------------------------------------- config


def test_validation_rejects_bad_combinations():
    with pytest.raises(ConfigError, match="sampler"):
        EngineOptions(sampler="metropolis").validate()
    with pytest.raises(ConfigError, match="float64"):
        EngineOptions(sampler="mh", precision="float64").validate()
    # Extended (df32) MH is supported.
    EngineOptions(sampler="mh", precision="extended").validate()
    with pytest.raises(ConfigError, match="thin"):
        EngineOptions(sampler="mh", escape_tracking="step").validate()
    with pytest.raises(ConfigError, match="canvas"):
        EngineOptions(sampler="mh", emit_filter="canvas").validate()
    with pytest.raises(ConfigError, match="mh_restart"):
        EngineOptions(sampler="mh", mh_restart=300).validate()
    with pytest.raises(ConfigError, match="mh_rep_cap"):
        EngineOptions(sampler="mh", mh_rep_cap=1).validate()
    # u32 deposit-arithmetic bounds (ops/binning.mh_deposit_weights).
    with pytest.raises(ConfigError, match="mh_rep_cap"):
        EngineOptions(sampler="mh", mh_rep_cap=40000).validate()
    with pytest.raises(ConfigError, match="mh_visit_slots"):
        EngineOptions(sampler="mh", mh_visit_slots=6).validate()
    with pytest.raises(ConfigError, match="mh_visit_slots"):
        EngineOptions(sampler="mh", mh_visit_slots=64).validate()
    with pytest.raises(ConfigError, match="steps_per_flush"):
        EngineOptions(
            sampler="mh", steps_per_flush=1 << 17, steps_per_pass=1 << 17
        ).validate()


def test_make_engine_gates():
    with pytest.raises(ConfigError, match="pallas"):
        make_engine(_mh_cfg(options={"engine": "oracle"}))
    with pytest.raises(ConfigError, match="row-sharded"):
        make_engine(
            _mh_cfg(
                options={
                    "engine": "pallas",
                    "histogram_sharding": "rows",
                    "num_devices": 2,
                }
            )
        )


@needs_native
def test_anti_buddhabrot_mh():
    """Interior-mode MH: chains target interior orbits' in-window
    counts; every emission replays exactly max_it points and the
    accounting stays exact."""
    cfg = _mh_cfg(
        fractal="anti-buddhabrot",
        canvas=Canvas(
            width=40, height=40,
            min_real=-0.6, max_real=0.1, min_imag=-0.4, max_imag=0.3,
        ),
        band=IterationBand(max_escape_iterations=64,
                           min_escape_iterations=0),
    )
    h, s = _run(PallasEngine(cfg), 3)
    assert int(h.sum()) > 0
    assert int(h.sum()) == s["on_canvas_points"]
    assert s["mh_accepts"] > 0
    # Measure check vs the uniform interior engine at the same crop.
    ucfg = cfg.replace(
        options=EngineOptions(
            engine="pallas", lane_rows=8,
            replay="host", replay_capacity=1 << 17,
        )
    )
    uh, us = _run(PallasEngine(ucfg), 3)
    assert us["replay_dropped"] == 0

    def block(x, b=10):
        x = x.astype(np.float64)
        x = x.reshape(40 // b, b, 40 // b, b).sum(axis=(1, 3))
        return x / x.sum()

    corr = np.corrcoef(block(uh).ravel(), block(h).ravel())[0, 1]
    assert corr > 0.95, corr


@needs_native
def test_replay_modes():
    """MH auto-resolves to the fully device-resident deposit path (no
    host worker); --replay host selects the numpy bins-deposit worker.
    Both must produce identical histograms — the u32 long-division and
    u64 deposit maths agree exactly by construction."""
    dev = PallasEngine(_mh_cfg())
    assert dev.replay_mode == "device" and dev._worker is None
    host = PallasEngine(_mh_cfg(options={"replay": "host"}))
    assert host.replay_mode == "host" and host._worker is not None
    hd, sd = _run(dev, 3)
    hh, sh = _run(host, 3)
    np.testing.assert_array_equal(hd, hh)
    assert int(hd.sum()) == sd["on_canvas_points"]
    assert int(hh.sum()) == sh["on_canvas_points"]


# ------------------------------------------------------------ accounting


def test_mass_accounting_and_determinism():
    """hist total == deposited mass (every count is an exact fixed-point
    weight); identical seeds give bitwise-identical histograms."""
    cfg = _mh_cfg(max_passes=3)
    h1, s1 = _run(PallasEngine(cfg), 3)
    assert s1["weight_scale"] == pkm.WEIGHT_SCALE
    assert int(h1.sum()) == s1["on_canvas_points"]
    assert int(h1.sum()) > 0
    # Deposits start after burn-in but chains advance through it.
    assert s1["mh_accepts"] > 0
    h2, _ = _run(PallasEngine(cfg), 3)
    np.testing.assert_array_equal(h1, h2)


def test_burnin_discards_early_deposits():
    """More burn-in passes => strictly less deposited mass at the same
    pass count (the chains advance, their emissions are dropped)."""
    h0, _ = _run(PallasEngine(_mh_cfg(options={"mh_burnin_passes": 0})), 3)
    h2, _ = _run(PallasEngine(_mh_cfg(options={"mh_burnin_passes": 2})), 3)
    assert int(h0.sum()) > int(h2.sum()) > 0


def test_burnin_only_run_deposits_nothing():
    """A run that never leaves burn-in must leave a ZERO histogram: the
    payload discard alone is not enough — in-flight tenure mass (rep
    counters) accumulated during burn-in must not leak through the
    tail flush (142,848 units leaked before the last-burn-in-pass rep
    reset existed)."""
    h, s = _run(PallasEngine(_mh_cfg(options={"mh_burnin_passes": 1})), 1)
    assert int(h.sum()) == 0, int(h.sum())


def test_deposit_weight_math_exact():
    """The u32 long-division deposit (ops/binning.mh_deposit_weights)
    must equal the exact integer q = floor(v * rep * 65536 / t) at
    every bound-respecting input, its Bresenham spread must sum to q
    exactly, and the numpy (u64) twin must agree — the host and device
    deposit paths are bitwise interchangeable."""
    from cudabrot_tpu.engines.host_replay import mh_deposit_numpy
    from cudabrot_tpu.ops import binning

    rng = np.random.default_rng(11)
    # Cover the documented extremes: v in [1, 32767] (t = 256v+1), rep
    # in [1, 98303] (rep_cap 32767 + a 65536-step flush window's merge
    # mass), plus tiny cases where rep*scale < v (sub-unit weights).
    v = np.concatenate(
        [
            np.array([1, 1, 2, 3, 32767, 32767], np.int64),
            rng.integers(1, 32768, size=200),
        ]
    )
    rep = np.concatenate(
        [
            np.array([1, 98303, 1, 7, 1, 98303], np.int64),
            rng.integers(1, 98304, size=200),
        ]
    )
    t = (256 * v + 1).astype(np.int32)
    for slots in (2, 8, 32):
        d, n, q = jax.jit(
            binning.mh_deposit_weights, static_argnums=2
        )(jnp.asarray(t), jnp.asarray(rep.astype(np.int32)), slots)
        d, n, q = np.asarray(d), np.asarray(n), np.asarray(q)
        want_q = (v * rep * 65536) // (256 * v + 1)
        np.testing.assert_array_equal(q.astype(np.int64), want_q)
        np.testing.assert_array_equal(n, np.minimum(v, slots))
        np.testing.assert_array_equal(d.sum(axis=0).astype(np.int64),
                                      want_q)
        # Spread flatness: every recorded bin within one unit of q/n.
        live = np.arange(slots)[:, None] < n[None]
        lo = (q // n.astype(np.uint32))[None]
        assert (d[live] >= np.broadcast_to(lo, d.shape)[live] - 0).all()
        assert (d[live] <= np.broadcast_to(lo, d.shape)[live] + 1).all()
        # numpy twin: deposit on distinct bins, totals must match q.
        hist = np.zeros(slots * len(t), np.uint64)
        bins = (
            np.arange(slots)[:, None] * len(t) + np.arange(len(t))[None]
        ).astype(np.int32)
        hits, deposits = mh_deposit_numpy(
            hist, bins, t, rep.astype(np.int32)
        )
        assert hits == int(want_q.sum())
        assert deposits == int(np.minimum(v, slots).sum())
        np.testing.assert_array_equal(
            hist.reshape(slots, len(t))[live].astype(np.int64),
            d[live].astype(np.int64),
        )


@needs_native
def test_mh_u64_histogram():
    cfg = _mh_cfg(max_passes=2, options={"hist_dtype": "uint64"})
    h, s = _run(PallasEngine(cfg), 2)
    assert h.dtype == np.uint64
    assert int(h.sum()) == s["on_canvas_points"]


# -------------------------------------------------------- bits injection


def test_bits_injection_restart_install():
    """With known randomness, the first boundary must seed every lane
    with a forced uniform restart: kr/ki = mantissa bits, c rebuilt with
    the exact refill arithmetic, chains still unseeded (xv == 0, the
    dead first resolution rejects), rep incremented once."""
    rows = 2
    rng = np.random.default_rng(7)
    # One chunk, one window, 4 words/boundary.
    bits = rng.integers(0, 1 << 32, size=(1, 1, 4, rows, 128),
                        dtype=np.uint64)
    bits = jnp.asarray(bits.astype(np.uint32))
    fr = fractals.get_fractal("buddhabrot")
    res = pkm.classify_pass_mh(
        pkm.init_mh_lane_state(rows),
        jnp.asarray([0, 0], jnp.uint32),
        bits,
        fractal=fr,
        min_it=2,
        max_it=1 << 20,
        steps_per_pass=4,
        steps_per_flush=4,
        inner_unroll=4,
        rng="bits",
        sample_domain=(-2.0, 2.0, -2.0, 2.0),
        window=(-0.78, -0.72, 0.05, 0.11),
        restart256=16,
        rep_cap=64,
        interpret=True,
    )
    st = res.state
    m24_r = np.asarray(bits[0, 0, 0] >> 8).astype(np.int64)
    m24_i = np.asarray(bits[0, 0, 1] >> 8).astype(np.int64)
    np.testing.assert_array_equal(
        np.asarray(st.kr), m24_r.astype(np.float32)
    )
    np.testing.assert_array_equal(
        np.asarray(st.ki), m24_i.astype(np.float32)
    )
    # Exact refill arithmetic: k * 2^-24 * span + lo, all f32.
    inv24 = np.float32(5.9604644775390625e-08)
    want_cr = (
        m24_r.astype(np.float32) * inv24 * np.float32(4.0)
        + np.float32(-2.0)
    )
    np.testing.assert_array_equal(np.asarray(st.cr), want_cr)
    # Chains unseeded, one rejected resolution each, orbit reset to c.
    assert (np.asarray(st.xv) == 0).all()
    assert (np.asarray(st.rep) == 1).all()
    assert (np.asarray(st.it) == 0).all()
    np.testing.assert_array_equal(np.asarray(st.zr), np.asarray(st.cr))
    # Dead flag must equal the cull test on the drawn c (all lanes were
    # restarts; none can be out-of-domain).
    want_dead = np.asarray(
        fractals.cull_mask(fr, jnp.asarray(want_cr), st.ci)
    ).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(st.dead), want_dead)
    # Stats: one resolution per lane, no accepts (v' == 0 everywhere).
    stats = np.asarray(res.stats)
    assert stats[pkm.STAT_DRAWN].sum() == rows * 128
    assert stats[pkm.STAT_MH_ACCEPT].sum() == 0
    # Nothing emitted.
    assert (np.asarray(res.emit_it) < 0).all()


def test_chain_state_consistency_after_many_windows():
    """Structural invariants after a real multi-window run: seeded
    chains carry a valid escape index and positive rep; accepted counts
    bound the seeded-lane count; emissions carry positive reps and
    in-band escape indices."""
    rows = 4
    fr = fractals.get_fractal("buddhabrot")
    res = pkm.classify_pass_mh(
        pkm.init_mh_lane_state(rows),
        jnp.asarray([3, 4], jnp.uint32),
        None,
        fractal=fr,
        min_it=5,
        max_it=200,
        steps_per_pass=4096,
        steps_per_flush=64,
        inner_unroll=4,
        rng="threefry",
        # Generous window: the whole sample domain, so chains seed fast.
        sample_domain=(-2.0, 2.0, -2.0, 2.0),
        window=(-2.0, 2.0, -2.0, 2.0),
        restart256=16,
        rep_cap=32,
        interpret=True,
    )
    st = res.state
    xv = np.asarray(st.xv)
    xit = np.asarray(st.xit)
    rep = np.asarray(st.rep)
    seeded = xv > 0
    assert seeded.any()
    assert (xit[seeded] >= 5).all() and (xit[seeded] < 200).all()
    assert (rep[seeded] >= 1).all()
    assert (rep[seeded] < 32).all()  # cap enforced
    stats = np.asarray(res.stats)
    accepts = stats[pkm.STAT_MH_ACCEPT].sum()
    assert accepts >= seeded.sum()
    em_it = np.asarray(res.emit_it)
    em_rep = np.asarray(res.emit_rep)
    valid = em_it >= 0
    assert valid.any()
    assert (em_rep[valid] >= 1).all()
    assert (em_it[valid] >= 5).all() and (em_it[valid] < 200).all()
    # Emitted targets are bridge-form (t = 256v + 1 with v >= 1) and the
    # recorded visit bins are canvas-valid for every live slot.
    em_v = np.asarray(res.emit_v)
    assert ((em_v[valid] - 1) % 256 == 0).all()
    assert (em_v[valid] > 1).all()
    em_b = np.asarray(res.emit_bins)  # (chunks, V, R, 128)
    slots = em_b.shape[1]
    v_cnt = (em_v[valid] - 1) // 256
    n_rec = np.minimum(v_cnt, slots)
    # Gather per-valid-slot recorded bins: move V next to last.
    bins_v = np.moveaxis(em_b, 1, -1)[valid]  # (n_valid, V)
    kmask = np.arange(slots)[None] < n_rec[:, None]
    live_bins = bins_v[kmask]
    # window == full domain canvas here (1000x1000 default canvas_wh).
    assert (live_bins >= 0).all()
    assert (live_bins < 1000 * 1000).all()


# ------------------------------------------------- estimator correctness


@needs_native
def test_mh_matches_uniform_measure():
    """THE contract: normalized MH and uniform renders of the same crop
    agree as distributions. MH's stationary chain density is
    proportional to v(c); the 1/v deposit weights cancel it exactly, so
    both estimators target the identical measure."""
    passes = 10
    ucfg = RenderConfig(
        canvas=_CROP,
        band=_BAND,
        seconds_to_run=-1.0,
        options=EngineOptions(
            engine="pallas",
            lane_rows=8,
            # AMPLE capacity: compaction overflow keeps the LONGEST
            # orbits, so a dropping reference run is length-biased — it
            # masqueraded as an ~8% MH bright-half "bias" during
            # development before the drops were noticed.
            replay_capacity=1 << 19,
            replay="host",
        ),
    )
    uh, ustats = _run(PallasEngine(ucfg), passes)
    m1, mstats = _run(
        PallasEngine(_mh_cfg(options={"mh_burnin_passes": 2})), passes
    )
    m2, mstats2 = _run(
        PallasEngine(_mh_cfg(seed=4242, options={"mh_burnin_passes": 2})),
        passes,
    )
    assert uh.sum() > 0 and m1.sum() > 0 and m2.sum() > 0
    # No accounting leaks in either run (a dropping run is biased, not
    # just noisy — see the capacity comment above).
    assert ustats["replay_dropped"] == 0
    assert mstats["replay_dropped"] == 0
    assert mstats2["replay_dropped"] == 0
    # Compare at 8x8-block aggregation: the MH estimator has chain-
    # correlated per-pixel noise at test-scale run lengths, and a
    # pixel-level bright set chosen by u's own fluctuations regresses
    # to the mean against any independent estimate (that selection
    # artifact measured as a phantom ~12% "bright deficit" during
    # development; the block-level ratio map is flat within +-4%).
    def block(h, b=8):
        x = h.astype(np.float64)
        x = x.reshape(x.shape[0] // b, b, x.shape[1] // b, b).sum(
            axis=(1, 3)
        )
        return x / x.sum()

    u = block(uh)
    b1 = block(m1)
    b2 = block(m2)

    def corr(a, b):
        return float(np.corrcoef(a.ravel(), b.ravel())[0, 1])

    # NULL-CALIBRATED equivalence: at test-scale run lengths the MH
    # estimate is chain-noise dominated (measured across seeds:
    # corr(mh, uniform) 0.69-0.93 for BOTH the pre-bridge and bridge
    # samplers — a fixed absolute threshold just gambles on the seed).
    # The calibrated statistic: for an UNBIASED estimator, averaging
    # two independent chains' renders must track uniform at least as
    # well as the chains track each other (bias is common to both
    # chains and would cap corr(avg, u) BELOW their self-correlation;
    # independent noise alone keeps it above).
    self_corr = corr(b1, b2)
    avg_corr = corr((b1 + b2) / 2, u)
    assert avg_corr > self_corr - 0.05, (avg_corr, self_corr)
    assert avg_corr > 0.6, (avg_corr, self_corr)  # gross-failure floor
    # Bright-half mass ratio: scale-free first-moment check.
    bright = u > np.median(u)
    m = (b1 + b2) / 2
    ratio = m[bright].sum() / u[bright].sum()
    assert abs(ratio - 1) < 0.1, ratio


def test_reservoir_merge_conserves_mass():
    """Pending-slot collisions are reservoir MERGES, not overwrites:
    the total deposited tenure mass must equal the total chain steps
    flushed regardless of how many collisions occurred. A short flush
    window forces heavy collision traffic."""
    cfg = _mh_cfg(
        options={
            "steps_per_flush": 64,
            "steps_per_pass": 2048,
            "mh_burnin_passes": 0,
        }
    )
    h, s = _run(PallasEngine(cfg), 4)
    assert s["mh_merges"] > 0  # collisions actually exercised
    # Exact conservation: every deposited count is accounted for, and
    # nothing was lost to the merges themselves (only to replay
    # trajectories with zero on-canvas points, tracked separately).
    assert int(h.sum()) == s["on_canvas_points"]
    assert s["mh_lost_weight"] >= 0


# ------------------------------------------------- extended (df32) MH


_SEAHORSE = (-0.743643887, 0.131825904)


def _deep_cfg(span, sampler="mh", precision="extended", **kw):
    cx, cy = _SEAHORSE
    h = span / 2.0
    opts = dict(
        sampler=sampler,
        precision=precision,
        lane_rows=2,
        steps_per_pass=4096,
        steps_per_flush=256,
        inner_unroll=4,
        mh_burnin_passes=0,
    )
    opts.update(kw.pop("options", {}))
    if sampler != "mh":
        opts.pop("sampler")
        opts.pop("mh_burnin_passes")
        opts.setdefault("replay", "host")
        opts.setdefault("replay_capacity", 1 << 16)
    return RenderConfig(
        canvas=Canvas(
            width=32, height=32,
            min_real=cx - h, max_real=cx + h,
            min_imag=cy - h, max_imag=cy + h,
        ),
        band=IterationBand(
            max_escape_iterations=kw.pop("max_it", 1500),
            min_escape_iterations=kw.pop("min_it", 50),
        ),
        sample_domain=(cx - 2 * span, cx + 2 * span,
                       cy - 2 * span, cy + 2 * span),
        seconds_to_run=-1.0,
        options=EngineOptions(**opts),
    )


def test_ext_mh_accounting_and_determinism():
    """Extended MH at a 2e-5 window (far below f32's usable floor):
    exact deposit accounting and bitwise reproducibility, like the f32
    sampler."""
    cfg = _deep_cfg(2e-5, max_it=3000, min_it=100)
    h1, s1 = _run(PallasEngine(cfg), 3)
    assert int(h1.sum()) == s1["on_canvas_points"]
    assert int(h1.sum()) > 0
    assert s1["replay_dropped"] == 0
    h2, _ = _run(PallasEngine(cfg), 3)
    np.testing.assert_array_equal(h1, h2)


@needs_native
def test_ext_mh_signal_dominates_uniform_at_deep_window():
    """The point of deep-zoom MH: at a 1e-4 window even a 4x-window
    sample domain starves uniform sampling (measured 20 counts vs
    2.8e6/256 reps at 8 passes during development); MH must deposit
    orders of magnitude more mass at equal passes."""
    mh_h, mh_s = _run(PallasEngine(_deep_cfg(1e-4)), 6)
    un_h, un_s = _run(
        PallasEngine(_deep_cfg(1e-4, sampler="uniform")), 6
    )
    mh_mass = int(mh_h.sum()) / pkm.WEIGHT_SCALE
    un_mass = int(un_h.sum())
    assert mh_mass > 50 * max(un_mass, 1), (mh_mass, un_mass)


def test_ext_mh_matches_f32_mh_measure():
    """Cross-precision consistency: at a 1e-3 window (above f32's
    quantization floor) the df32 MH render must agree with the f32 MH
    render as a distribution — same estimator, same chains'
    stationary law, different orbit arithmetic."""
    span = 1e-3
    common = dict(
        lane_rows=8,
        steps_per_pass=8192,
        steps_per_flush=512,
        inner_unroll=4,
        mh_burnin_passes=1,
        mh_restart=48,
    )
    f32_h, _ = _run(
        PallasEngine(
            _deep_cfg(span, precision="float32",
                      max_it=1000, options=common)
        ),
        12,
    )
    ext_h, _ = _run(
        PallasEngine(
            _deep_cfg(span, precision="extended",
                      max_it=1000, options=common)
        ),
        12,
    )

    def block(x, b=8):
        x = x.astype(np.float64)
        x = x.reshape(32 // b, b, 32 // b, b).sum(axis=(1, 3))
        return x / x.sum()

    u = block(f32_h)
    m = block(ext_h)
    corr = np.corrcoef(u.ravel(), m.ravel())[0, 1]
    # Both runs carry independent chain noise; measured 0.80 at these
    # settings with a flat bright-half ratio (0.992).
    assert corr > 0.55, corr
    bright = u > np.median(u)
    ratio = m[bright].sum() / u[bright].sum()
    assert abs(ratio - 1) < 0.15, ratio


# ------------------------------------------------- multi-device MH


def test_mh_data_parallel_accounting():
    """MH under multi-device data parallelism: per-device chains with
    distinct RNG ordinals stream to the shared worker; deposit
    accounting stays exact (histogram() includes the tenure-tail flush
    across the stacked device states) and burn-in is honored."""
    from cudabrot_tpu.engines import make_engine

    cfg = _mh_cfg(
        options={"num_devices": 2, "mh_burnin_passes": 1}
    )
    eng = make_engine(cfg)
    h, s = _run(eng, 3)
    assert int(h.sum()) > 0
    assert int(h.sum()) == s["on_canvas_points"]
    # Two devices' chains both contribute moves.
    assert s["mh_accepts"] > 0
    # Determinism holds across the DP path too.
    h2, _ = _run(make_engine(cfg), 3)
    np.testing.assert_array_equal(h, h2)


def test_mh_bridge_seeds_tiny_window_from_full_domain():
    """The ergodicity bridge's reason to exist
    (ops/pallas_kernels_mh.py "ergodicity bridge"): at a tiny window
    sampled from the FULL [-2,2] domain, seeding by restarts landing
    directly on the visiting set is practically impossible (measured on
    silicon pre-bridge: 99.5% of lane-steps burned by unseeded chains,
    0.06% acceptance at a 6e-3 window). With the in-band epsilon,
    chains seed by hitting the in-band set and random-walk to the
    visiting filaments — this canary asserts deposits actually appear
    at a window/domain area ratio of ~2.5e-7 within a few passes."""
    cfg = _mh_cfg(
        canvas=Canvas(
            width=40, height=40,
            min_real=-0.7446, max_real=-0.7426,
            min_imag=0.1309, max_imag=0.1329,
        ),
        options={"mh_burnin_passes": 1},
    )
    h, s = _run(PallasEngine(cfg), 6)
    assert s["mh_accepts"] > 0
    assert int(h.sum()) > 0, "bridge chains failed to seed the window"
    assert int(h.sum()) == s["on_canvas_points"]


def test_mh_burning_ship():
    """MH over the burning-ship map: fold_abs rides the inner loop and
    the native weighted replay's kBurningShip path; no cycle detection
    (the registry disables it). Accounting must stay exact."""
    cfg = _mh_cfg(
        fractal="burning-ship",
        canvas=Canvas(
            width=40, height=40,
            min_real=-1.8, max_real=-1.6, min_imag=-0.1, max_imag=0.1,
        ),
    )
    h, s = _run(PallasEngine(cfg), 3)
    assert int(h.sum()) > 0
    assert int(h.sum()) == s["on_canvas_points"]


def test_ext_mh_window_test_resolves_below_f32_ulp():
    """The regression the center-relative window test exists for: at
    spans below the f32 ulp of the center (~6e-8 near the seahorse
    valley) the ABSOLUTE f32 canvas bounds collapse to an empty
    interval, silently zeroing every v — no chain could ever seed.
    The kernel now computes dr = (z_hi - c_hi) + (z_lo - c_lo) against
    CENTER-RELATIVE bounds; this pins that arithmetic: df32 positions
    offset from the center by +-2e-9 must classify in/out of a 1e-8
    window correctly, where the absolute comparison cannot even
    represent the bounds. (An end-to-end chain test at this depth is
    physically impossible at CPU scale: v > 0 states are found by
    uniform restarts, and orbit visits to a 1e-8 window are ~1e-6x
    rarer than at the 1e-5 flagship — the discovery phase needs
    TPU-scale step budgets or staged zooming.)"""
    from cudabrot_tpu.ops import df32

    cx, _cy = _SEAHORSE
    span = 1e-8
    half = span / 2.0
    assert np.float32(cx - half) == np.float32(cx + half)  # collapse
    c_hi, c_lo = df32.from_float(cx)
    for offset, inside in ((2e-9, True), (-2e-9, True),
                           (7e-9, False), (-7e-9, False)):
        z_hi, z_lo = df32.from_float(cx + offset)
        dr = (np.float32(z_hi) - np.float32(c_hi)) + (
            np.float32(z_lo) - np.float32(c_lo)
        )
        hit = (dr >= np.float32(-half)) and (dr < np.float32(half))
        assert hit == inside, (offset, dr)
