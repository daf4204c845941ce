"""Pallas engine (interpret mode): internal invariants + statistical
equivalence with the jax.numpy oracle (SURVEY.md §4: the reference is only
statistically reproducible, so engines are compared at the distribution
level, never bitwise)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cudabrot_tpu.config import Canvas, EngineOptions, IterationBand, RenderConfig
from cudabrot_tpu.engines.oracle_engine import OracleEngine
from cudabrot_tpu.engines.pallas_engine import PallasEngine


def _cfg(**kw):
    defaults = dict(
        canvas=Canvas(width=40, height=40),
        band=IterationBand(max_escape_iterations=60,
                           min_escape_iterations=5),
        options=EngineOptions(
            engine="pallas",
            lane_rows=8,
            steps_per_pass=256,
            steps_per_flush=16,
            replay_capacity=1 << 14,
            replay_chunk=64,
        ),
    )
    overrides = {k: v for k, v in kw.items() if k in defaults}
    rest = {k: v for k, v in kw.items() if k not in defaults}
    defaults.update(overrides)
    return RenderConfig(**defaults, **rest)


def _run(engine, passes):
    state = engine.init_state(None)
    for p in range(passes):
        state = engine.run_pass(state, p)
    jax.block_until_ready(state)
    return engine.histogram(state), engine.stats(state)


def test_pass_invariants():
    cfg = _cfg()
    eng = PallasEngine(cfg)
    hist, stats = _run(eng, 3)
    lane_steps = 3 * 256 * 8 * 128
    # Useful + wasted (window coast + culled draws) must account for every
    # executed lane-step exactly.
    assert stats["classify_iters"] + stats["wasted_steps"] == lane_steps
    # Each culled draw wastes at least one step.
    assert stats["wasted_steps"] >= stats["culled"]
    # Cull fraction ~ cardioid+bulb area share of the [-2,2]^2 domain
    # (~8.6%).
    cull_frac = stats["culled"] / stats["samples"]
    assert 0.06 < cull_frac < 0.11
    # Histogram mass cannot exceed scattered orbit points (off-canvas
    # points account for the difference).
    assert hist.sum() <= stats["orbit_points"]
    assert hist.sum() > 0
    assert stats["emitted"] <= stats["in_band"]


def test_deterministic():
    cfg = _cfg()
    h1, _ = _run(PallasEngine(cfg), 2)
    h2, _ = _run(PallasEngine(cfg), 2)
    np.testing.assert_array_equal(h1, h2)


def test_seed_changes_output():
    h1, _ = _run(PallasEngine(_cfg()), 2)
    h2, _ = _run(PallasEngine(_cfg(seed=7)), 2)
    assert not np.array_equal(h1, h2)


def test_pallas_scatter_backend_bitwise_equal():
    """A full device-replay render through the Mosaic RMW scatter must be
    bitwise-identical to the XLA scatter-add backend (exact integer adds,
    order-independent)."""
    base = dict(
        engine="pallas", lane_rows=8, steps_per_pass=256,
        steps_per_flush=16, replay_capacity=1 << 14, replay_chunk=64,
        replay="device",
    )
    hx, sx = _run(
        PallasEngine(_cfg(options=EngineOptions(**base, scatter="xla"))), 2
    )
    hp, sp = _run(
        PallasEngine(_cfg(options=EngineOptions(**base, scatter="pallas"))),
        2,
    )
    np.testing.assert_array_equal(hx, hp)
    assert sx["orbit_points"] == sp["orbit_points"]


def test_batched_replay_matches_blocked_bitwise():
    """_batched_replay (one skip-flagged scatter per pass) must deposit
    bitwise-identically to _blocked_replay on the same sorted batch —
    same orbits (z starts at c), same thin-window recording, different
    deposit schedule only."""
    from cudabrot_tpu.engines.pallas_engine import (
        _batched_replay, _blocked_replay,
    )
    from cudabrot_tpu.models import fractals

    canvas = Canvas(width=64, height=48)
    fr = fractals.get_fractal("buddhabrot")
    rng = np.random.default_rng(11)
    k, block = 1024, 256
    cr = jnp.asarray(rng.uniform(-2.0, 1.0, k), jnp.float32)
    ci = jnp.asarray(rng.uniform(-1.5, 1.5, k), jnp.float32)
    it = rng.integers(0, 60, size=k).astype(np.int32)
    it[rng.uniform(size=k) < 0.3] = -1  # inactive lanes
    it = jnp.asarray(np.sort(it)[::-1].copy())  # descending, like compact
    hist0 = jnp.zeros(canvas.num_pixels, jnp.uint32)
    hb, hitsb = _blocked_replay(
        hist0, cr, ci, it, fractal=fr, canvas=canvas, chunk=32,
        block=block, backend="pallas", interpret=True,
    )
    ha, hitsa = _batched_replay(
        hist0, cr, ci, it, fractal=fr, canvas=canvas, steps_cap=64,
        block=block, backend="pallas", interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(hb), np.asarray(ha))
    assert np.asarray(hitsb).tolist() == np.asarray(hitsa).tolist()


def test_auto_replay_degrades_to_device_at_batched_bands():
    """Emission-heavy short bands (batched-replay regime) are fetch-bound
    in host/hybrid mode; auto must pick pure device replay there when the
    Mosaic scatter backend is active, and keep the host worker for long
    bands (r5 sweep: device 2.74e9 vs best hybrid 2.41e9 at the default
    band; hybrid still wins the headline band)."""
    short = RenderConfig(
        canvas=Canvas(width=256, height=256),
        band=IterationBand(max_escape_iterations=100,
                           min_escape_iterations=20),
        options=EngineOptions(engine="pallas", scatter="pallas"),
    )
    eng = PallasEngine(short)
    assert eng.replay_mode == "device"

    long_band = short.replace(
        band=IterationBand(max_escape_iterations=20000,
                           min_escape_iterations=2000),
    )
    eng2 = PallasEngine(long_band)
    assert eng2.replay_mode == "host"

    # Explicit --replay host must never be overridden.
    forced = short.replace(options=EngineOptions(
        engine="pallas", scatter="pallas", replay="host"))
    assert PallasEngine(forced).replay_mode == "host"


def test_resolve_pipeline_depth_auto():
    """Auto depth: deep (8) for worker-less device replay — each block
    is a tunnel round-trip — shallow (2) when a host worker drains
    payloads; explicit values pass through."""
    from cudabrot_tpu import driver

    cfg = _cfg()

    class Dev:
        replay_mode = "device"

    class Host:
        replay_mode = "host"

    assert driver.resolve_pipeline_depth(cfg, Dev()) == 8
    assert driver.resolve_pipeline_depth(cfg, Host()) == 2
    cfg3 = cfg.replace(options=EngineOptions(pipeline_depth=3))
    assert driver.resolve_pipeline_depth(cfg3, Dev()) == 3


def test_tuning_replay_steps_cap_alignment():
    """steps_cap must cover the band cap and keep each block's id stream
    a whole number of 8192-id scatter chunks."""
    from cudabrot_tpu.engines.pallas_engine import Tuning

    cfg = RenderConfig(
        canvas=Canvas(width=64, height=64),
        band=IterationBand(max_escape_iterations=100,
                           min_escape_iterations=20),
        options=EngineOptions(engine="pallas"),
    )
    t = Tuning(cfg)
    assert t.replay_steps_cap >= 100
    assert (t.replay_steps_cap * t.replay_block) % 8192 == 0


def test_lane_state_persists_across_passes():
    """A sample mid-flight at a pass boundary must finish in a later pass:
    with max_it far above steps_per_pass, in-band samples can only come
    from carried state."""
    cfg = _cfg(
        band=IterationBand(max_escape_iterations=2000,
                           min_escape_iterations=300),
        options=EngineOptions(
            engine="pallas",
            lane_rows=8,
            steps_per_pass=128,  # << min_escape_iterations
            steps_per_flush=16,
            replay_capacity=1 << 12,
            replay_chunk=64,
        ),
    )
    eng = PallasEngine(cfg)
    state = eng.init_state(None)
    for p in range(12):  # 12*128 = 1536 lane-steps: beyond min_it=300
        state = eng.run_pass(state, p)
    stats = eng.stats(state)
    assert stats["in_band"] > 0, (
        "no in-band samples found despite orbits longer than one pass — "
        "lane state is being reset at pass boundaries"
    )


def test_statistical_equivalence_with_oracle():
    """Normalized histograms from the two engines must agree as
    distributions (they sample identical math with different RNG
    streams)."""
    canvas = Canvas(width=32, height=32)
    band = IterationBand(max_escape_iterations=50, min_escape_iterations=3)

    pcfg = _cfg(canvas=canvas, band=band)
    ph, pstats = _run(PallasEngine(pcfg), 8)

    ocfg = RenderConfig(
        canvas=canvas,
        band=band,
        options=EngineOptions(engine="oracle",
                              oracle_samples_per_pass=1 << 15),
    )
    oh, ostats = _run(OracleEngine(ocfg), 8)

    # Orbit mass per in-band sample must match closely.
    p_rate = ph.sum() / max(pstats["emitted"], 1)
    o_rate = oh.sum() / max(ostats["in_band"], 1)
    assert abs(p_rate / o_rate - 1) < 0.05, (p_rate, o_rate)

    # In-band fraction of non-culled samples must match.
    p_band = pstats["in_band"] / (pstats["samples"] - pstats["culled"])
    o_band = ostats["in_band"] / (ostats["samples"] - ostats["culled"])
    assert abs(p_band / o_band - 1) < 0.05, (p_band, o_band)

    # Distribution-level comparison: high correlation of normalized bins.
    p = ph.astype(np.float64) / ph.sum()
    o = oh.astype(np.float64) / oh.sum()
    corr = np.corrcoef(p.ravel(), o.ravel())[0, 1]
    assert corr > 0.99, corr


def test_burning_ship_runs():
    cfg = _cfg(fractal="burning-ship")
    hist, stats = _run(PallasEngine(cfg), 2)
    assert stats["culled"] == 0  # no culling for burning ship
    assert hist.sum() > 0


def test_cycle_detection_equivalence():
    """Cycle detection only prunes interior work — the rendered
    distribution must be statistically unchanged."""
    canvas = Canvas(width=24, height=24)
    band = IterationBand(max_escape_iterations=400,
                         min_escape_iterations=3)
    on = _cfg(canvas=canvas, band=band)
    off = _cfg(
        canvas=canvas,
        band=band,
        options=EngineOptions(
            engine="pallas", lane_rows=8, steps_per_pass=256,
            steps_per_flush=16, replay_capacity=1 << 14,
            replay_chunk=64, cycle_detection=False,
        ),
    )
    h_on, s_on = _run(PallasEngine(on), 6)
    h_off, s_off = _run(PallasEngine(off), 6)
    assert s_on["cycles_detected"] > 0
    assert s_off["cycles_detected"] == 0
    # Same seed, but detection changes lane scheduling, so compare
    # statistically.
    a = h_on.astype(np.float64) / h_on.sum()
    b = h_off.astype(np.float64) / h_off.sum()
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.98, corr
    # Detection must *increase* samples processed per lane-step (interior
    # lanes freed early).
    assert s_on["samples"] >= s_off["samples"]


def test_driver_integration():
    from cudabrot_tpu import driver

    cfg = _cfg(seconds_to_run=-1.0, max_passes=2)
    res = driver.run_render(cfg, log=lambda s: None)
    assert res.engine_name == "pallas"
    assert res.histogram.sum() > 0


def test_burning_ship_statistical_equivalence_with_oracle():
    """Burning-ship variant must also match the oracle as a distribution
    (no culls, no cycle detection on this map)."""
    canvas = Canvas(width=32, height=32)
    band = IterationBand(max_escape_iterations=50, min_escape_iterations=3)

    pcfg = _cfg(canvas=canvas, band=band, fractal="burning-ship")
    ph, pstats = _run(PallasEngine(pcfg), 8)

    ocfg = RenderConfig(
        canvas=canvas,
        band=band,
        fractal="burning-ship",
        options=EngineOptions(engine="oracle",
                              oracle_samples_per_pass=1 << 15),
    )
    from cudabrot_tpu.engines.oracle_engine import OracleEngine

    oh, ostats = _run(OracleEngine(ocfg), 8)
    assert pstats["culled"] == 0 and ostats["culled"] == 0
    p = ph.astype(np.float64) / ph.sum()
    o = oh.astype(np.float64) / oh.sum()
    corr = np.corrcoef(p.ravel(), o.ravel())[0, 1]
    assert corr > 0.99, corr


def test_tuning_rounds_replay_capacity_to_block_multiple():
    """A user-set replay_capacity that is not a replay_block multiple
    would silently drop the (shortest-orbit) tail in _blocked_replay;
    Tuning must round it up instead."""
    from cudabrot_tpu.engines.pallas_engine import Tuning

    cfg = RenderConfig(
        canvas=Canvas(width=64, height=64),
        band=IterationBand(max_escape_iterations=64,
                           min_escape_iterations=8),
        options=EngineOptions(engine="pallas", replay_capacity=1500),
    )
    t = Tuning(cfg)
    assert t.replay_capacity % t.replay_block == 0
    assert t.replay_capacity == 2048  # rounded up, never down

    # Small capacities (< one block) keep block == capacity.
    t2 = Tuning(cfg.replace(options=EngineOptions(
        engine="pallas", replay_capacity=100)))
    assert t2.replay_block == t2.replay_capacity == 100


def test_tuning_auto_steps_respect_lane_step_budget():
    """With huge lane counts the auto pass length must shrink so passes
    stay interruptible (per-pass lane-steps <= 2^34; per-pass stat totals
    are exact u64 pairs, so there is no uint32 correctness ceiling)."""
    from cudabrot_tpu.engines.pallas_engine import Tuning

    cfg = RenderConfig(
        canvas=Canvas(width=64, height=64),
        band=IterationBand(max_escape_iterations=20000,
                           min_escape_iterations=2000),
        options=EngineOptions(engine="pallas", lane_rows=4096),
    )
    t = Tuning(cfg)
    assert t.steps_per_pass * 4096 * 128 <= (1 << 34)
    assert t.steps_per_pass % t.steps_per_flush == 0
    # Windowed bands scale the pass cap with U (equal-wall-time passes).
    t_small = Tuning(cfg.replace(options=EngineOptions(
        engine="pallas", lane_rows=64)))
    assert t_small.inner_unroll > 1
    assert t_small.steps_per_pass <= (1 << 18) * t_small.inner_unroll


def test_thin_vs_step_tracking_equivalence():
    """Thin (boundary) escape tracking must match per-step tracking
    statistically at every window size: same trajectories modulo FMA
    contraction, same band semantics, cycle detection merely delayed to a
    window boundary (bounded by U*p/gcd — see pallas_kernels)."""
    canvas = Canvas(width=32, height=32)
    band = IterationBand(max_escape_iterations=400,
                         min_escape_iterations=10)
    results = {}
    for mode in ("step", "thin"):
        for unroll in (1, 4):
            cfg = _cfg(
                canvas=canvas,
                band=band,
                options=EngineOptions(
                    engine="pallas", lane_rows=8, steps_per_pass=512,
                    steps_per_flush=32, replay_capacity=1 << 14,
                    replay_chunk=64, inner_unroll=unroll,
                    escape_tracking=mode,
                ),
            )
            results[(mode, unroll)] = _run(PallasEngine(cfg), 6)
    for unroll in (1, 4):
        h_s, s_s = results[("step", unroll)]
        h_t, s_t = results[("thin", unroll)]
        # Counter-level agreement: same sampling dynamics.
        assert abs(s_t["samples"] / s_s["samples"] - 1) < 0.03
        assert abs(s_t["in_band"] / s_s["in_band"] - 1) < 0.05
        assert s_t["cycles_detected"] > 0
        # Distribution-level agreement.
        a = h_s.astype(np.float64) / h_s.sum()
        b = h_t.astype(np.float64) / h_t.sum()
        corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
        assert corr > 0.98, (unroll, corr)
        # Waste accounting must stay exact in both modes.
        lane_steps = 6 * 512 * 8 * 128
        assert (
            s_t["classify_iters"] + s_t["wasted_steps"] == lane_steps
        )
        assert (
            s_s["classify_iters"] + s_s["wasted_steps"] == lane_steps
        )


def test_threefry2x32_matches_jax():
    """The in-kernel refill PRNG must be bit-exact with JAX's base
    Threefry-2x32: same key/counter convention, same rotation and
    injection schedule — so the kernel's randomness quality is exactly
    jax.random's, on both backends."""
    from jax._src import prng as jprng

    from cudabrot_tpu.ops.pallas_kernels import threefry2x32

    k0 = jnp.uint32(0xDEADBEEF)
    k1 = jnp.uint32(0x12345678)
    x0 = jnp.arange(4096, dtype=jnp.uint32)
    x1 = jnp.arange(4096, 8192, dtype=jnp.uint32)
    mine = threefry2x32(k0, k1, x0, x1)
    ref = jprng.threefry_2x32(
        jnp.stack([k0, k1]), jnp.concatenate([x0, x1])
    )
    np.testing.assert_array_equal(np.asarray(mine[0]), np.asarray(ref[:4096]))
    np.testing.assert_array_equal(np.asarray(mine[1]), np.asarray(ref[4096:]))


def test_cpu_stats_exact_u64_pairs():
    """Per-pass stat accumulation must stay exact when per-pass totals
    are large (u64 pair summation, no uint32 wrap)."""
    from cudabrot_tpu.utils import counters as ctr

    rng = np.random.default_rng(3)
    v = rng.integers(0, 2**31 - 1, size=8192, dtype=np.int64)
    got = ctr.u64_value(ctr.u64_sum_i32(jnp.asarray(v.astype(np.int32))))
    assert got == int(v.sum())
    big = ctr.u64_add_pair(
        ctr.u64_pair((1 << 40) + 7), ctr.u64_pair((1 << 33) + 9)
    )
    assert ctr.u64_value(big) == (1 << 40) + 7 + (1 << 33) + 9


def test_anti_buddhabrot_statistical_equivalence_with_oracle():
    """Interior-emission mode (anti-Buddhabrot): both engines must agree
    on the interior fraction, record exactly max_it points per emission,
    and produce the same distribution."""
    canvas = Canvas(width=48, height=48)
    band = IterationBand(max_escape_iterations=80, min_escape_iterations=0)

    pcfg = _cfg(
        canvas=canvas, band=band, fractal="anti-buddhabrot",
        options=EngineOptions(
            engine="pallas", lane_rows=8, steps_per_pass=512,
            steps_per_flush=16, replay_capacity=1 << 14, replay_chunk=64,
        ),
    )
    ph, pstats = _run(PallasEngine(pcfg), 6)

    ocfg = RenderConfig(
        canvas=canvas, band=band, fractal="anti-buddhabrot",
        options=EngineOptions(engine="oracle",
                              oracle_samples_per_pass=1 << 14),
    )
    oh, ostats = _run(OracleEngine(ocfg), 6)

    # Exactly max_it orbit points per interior emission, in both engines.
    assert ostats["orbit_points"] == ostats["in_band"] * 80
    assert pstats["orbit_points"] == pstats["emitted"] * 80
    # Interior fraction ~ M-set area share of the 4x4 domain (~0.094)
    # plus slow escapers at the finite cap.
    for st in (pstats, ostats):
        frac = st["in_band"] / st["samples"]
        assert 0.08 < frac < 0.12, frac
    # Brent detection must be proving interiors early (not just maxing).
    assert pstats["cycles_detected"] > 0
    # Interior orbits are bounded, so every replayed point lands on a
    # [-2,2]^2-covering canvas.
    assert ph.sum() == pstats["orbit_points"]
    a = oh.astype(np.float64) / oh.sum()
    b = ph.astype(np.float64) / ph.sum()
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.98, corr


def test_auto_device_share_big_canvas_only():
    """Hybrid replay auto-share: zero on LLC-resident canvases (host
    replay wins 7x), positive and balanced on DRAM-bound production
    canvases where the device otherwise idles."""
    from cudabrot_tpu.engines.pallas_engine import Tuning

    band = IterationBand(max_escape_iterations=8000,
                         min_escape_iterations=1000)
    small = Tuning(RenderConfig(canvas=Canvas(width=1000, height=1000),
                                band=band))
    assert small.auto_device_share(1000 * 1000 * 4) == 0.0
    big = Tuning(RenderConfig(canvas=Canvas(width=20000, height=15000),
                              band=band))
    s = big.auto_device_share(20000 * 15000 * 4)
    assert 0.2 < s < 0.9, s
    # The share maps to an orbit-length threshold inside the band.
    thr = big.split_threshold(s)
    assert 1000 < thr < 8000


def test_auto_device_share_pallas_small_canvas():
    """With the Mosaic RMW scatter (r4: ~7.1e8 marginal pts/s, the same
    order as the host's LLC replay rate) the hybrid pays on small
    canvases too; with XLA scatter it must stay host-only there."""
    from cudabrot_tpu.engines.pallas_engine import Tuning

    band = IterationBand(max_escape_iterations=20000,
                         min_escape_iterations=2000)
    tn = Tuning(RenderConfig(canvas=Canvas(width=1000, height=1000),
                             band=band))
    hist_bytes = 1000 * 1000 * 4
    assert tn.auto_device_share(hist_bytes, scatter_backend="xla") == 0.0
    s = tn.auto_device_share(hist_bytes, scatter_backend="pallas")
    assert 0.1 < s < 0.5, s
    thr = tn.split_threshold(s)
    assert 2000 < thr < 20000


def test_tuning_mh_flush_floor_scales_with_band():
    """MH flush-window floor: deep bands must get the silicon-measured
    16384-step windows (benchmarks/mh_kernel_sweep.py: 20x deposited
    mass vs the rate-target's 4096), while shallow test bands keep small
    fast windows (floor = 8x the mean in-band tenure, capped at 16384).
    The MH replay capacity also stays at the known-good 2^19 ceiling,
    with the pass shortened so one pass's tenure drain fits exactly."""
    from cudabrot_tpu.engines.pallas_engine import Tuning

    mh = EngineOptions(sampler="mh")
    deep = Tuning(RenderConfig(
        canvas=Canvas(width=1000, height=1000),
        band=IterationBand(max_escape_iterations=20000,
                           min_escape_iterations=500),
        options=mh,
    ))
    assert deep.steps_per_flush == 16384, deep.steps_per_flush
    assert deep.replay_capacity <= 1 << 19
    lanes = 8 * 128
    windows = deep.steps_per_pass // deep.steps_per_flush
    assert lanes * windows <= deep.replay_capacity

    shallow = Tuning(RenderConfig(
        canvas=Canvas(width=40, height=40),
        band=IterationBand(max_escape_iterations=300,
                           min_escape_iterations=20),
        options=mh,
    ))
    assert shallow.steps_per_flush <= 1024, shallow.steps_per_flush


def test_hybrid_on_canvas_points_includes_device_share():
    """stats()["on_canvas_points"] must cover the DEVICE-replayed share,
    not just the host worker's tally: at a forced 0.5 share the worker
    alone under-read 2.3x (r4) while the histogram itself conserved mass
    bitwise. Same seed across modes -> identical deposits, so the stat
    must agree exactly with both the pure-host run and the histogram."""
    from cudabrot_tpu.io import native

    if not native.available():
        pytest.skip("native replay library unavailable")

    def run(**replay_kw):
        cfg = _cfg(options=EngineOptions(
            engine="pallas", lane_rows=4, steps_per_pass=2048,
            steps_per_flush=64, replay_capacity=1 << 12,
            **replay_kw,
        ))
        eng = PallasEngine(cfg)
        hist, st = _run(eng, 2)
        if getattr(eng, "_worker", None) is not None:
            eng._worker.close()
        return int(np.asarray(hist).sum()), st

    m_host, s_host = run(replay="host", replay_device_share=0.0)
    m_hyb, s_hyb = run(replay="host", replay_device_share=0.5)
    m_dev, s_dev = run(replay="device")
    assert s_host["replay"] == "host"
    assert s_hyb["replay"] == "hybrid"
    assert s_dev["replay"] == "device"
    # The stat equals the histogram mass in every mode (uniform sampler:
    # each on-canvas deposit increments exactly one bin).
    assert s_host["on_canvas_points"] == m_host
    assert s_hyb["on_canvas_points"] == m_hyb
    assert s_dev["on_canvas_points"] == m_dev
    # f32 binning drift between the native and device replays is allowed
    # at most a small relative wobble; the split itself must not lose mass.
    assert 0.98 < m_hyb / m_host < 1.02
