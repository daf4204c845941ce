"""Extended-precision (df32) deep-zoom mode: classification ground truth
vs float64, device/host replay agreement, native f64 replay bitwise
checks, and engine-level statistical equivalence with the f64 oracle.

The mode exists for canvas windows narrower than ~1e-4, where plain f32
orbit points quantize coarser than a pixel (ops/df32.py module
docstring); the reference renders the full set only and cannot reach
these crops at all (cudabrot.cu:764-772 default geometry)."""

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
from cudabrot_tpu.engines.oracle_engine import OracleEngine
from cudabrot_tpu.engines.pallas_engine import (
    PallasEngine,
    Tuning,
    _blocked_replay_ext,
)
from cudabrot_tpu.io import native
from cudabrot_tpu.models import fractals
from cudabrot_tpu.ops import df32
from cudabrot_tpu.ops import pallas_kernels_ext as pke
from tests import reference_impl

# Seahorse-valley window, span 2e-7: ~500x below the ~1e-4 width where
# f32 orbit quantization reaches pixel scale.
_CX, _CY = -0.743643887037151, 0.131825904205330


def _window(span):
    return (_CX - span / 2, _CX + span / 2, _CY - span / 2, _CY + span / 2)


def _canvas(win, w=40, h=40):
    return Canvas(
        width=w,
        height=h,
        min_real=win[0],
        max_real=win[1],
        min_imag=win[2],
        max_imag=win[3],
    )


def _grid_to_f64(k_r, k_i, win):
    """Reconstruct the f64 sample value from 24-bit grid indices, the
    same way the host replay decodes payloads (host_replay._fetch)."""
    c0r, c0i, step_r, step_i = pke.grid_params(win)
    two23 = np.float32(8388608.0)
    off_r = (np.float32(k_r) - two23) * np.float32(step_r)
    off_i = (np.float32(k_i) - two23) * np.float32(step_i)
    cr = df32.to_float64(*c0r) + np.float64(off_r)
    ci = df32.to_float64(*c0i) + np.float64(off_i)
    return cr, ci


def test_validate_rejects_step_tracking():
    with pytest.raises(ConfigError, match="thin escape tracking"):
        EngineOptions(precision="extended", escape_tracking="step").validate()


def test_validate_accepts_extended():
    EngineOptions(precision="extended").validate()


def test_tuning_extended_shrinks_pass_budget():
    win = _window(2e-7)
    base = dict(
        canvas=_canvas(win),
        band=IterationBand(max_escape_iterations=20000,
                           min_escape_iterations=2000),
        sample_domain=win,
    )
    t32 = Tuning(RenderConfig(options=EngineOptions(), **base))
    tx = Tuning(
        RenderConfig(options=EngineOptions(precision="extended"), **base)
    )
    assert tx.extended and not t32.extended
    # ~9x heavier inner steps: the auto pass budget must shrink so pass
    # wall time (SIGINT latency) stays in the same band.
    assert tx.steps_per_pass < t32.steps_per_pass


def test_classify_emissions_match_float64_ground_truth():
    """Every emission's (grid index, escape iteration) must agree with a
    float64 reclassification of the same sample: df32 carries ~2^-48
    relative error, so disagreements are limited to the measure-zero
    samples whose orbits pass within that distance of the escape circle
    (tolerated at <2%)."""
    win = _window(2e-7)
    # Escape times at this depth start near ~900 steps; the band must
    # sit where the window actually emits.
    min_it, max_it = 50, 3000
    fr = fractals.get_fractal("buddhabrot")
    state = pke.init_ext_lane_state(8)
    seed = jnp.asarray([1234, 5678], jnp.uint32)
    res = pke.classify_pass_ext(
        state,
        seed,
        None,
        fractal=fr,
        min_it=min_it,
        max_it=max_it,
        steps_per_pass=4096,
        steps_per_flush=128,
        inner_unroll=4,
        rng="threefry",
        sample_domain=win,
        interpret=True,
    )
    emit_it = np.asarray(res.emit_it).reshape(-1)
    emit_kr = np.asarray(res.emit_c[:, 0]).reshape(-1)
    emit_ki = np.asarray(res.emit_c[:, 1]).reshape(-1)
    valid = emit_it >= 0
    assert valid.sum() > 100, "window/band should emit plenty"
    checked = mismatched = 0
    for k_r, k_i, it in zip(
        emit_kr[valid][:300], emit_ki[valid][:300], emit_it[valid][:300]
    ):
        cr, ci = _grid_to_f64(k_r, k_i, win)
        expected = reference_impl.classify_scalar(float(cr), float(ci), max_it)
        checked += 1
        if expected != it:
            mismatched += 1
        assert min_it <= it < max_it
    # Measured: 5/300 mismatches at ~1000-step orbits, all the
    # chaos-shadowing class (nearby escape indices for boundary-grazing
    # orbits) — both indices are valid pseudo-orbit classifications.
    assert mismatched <= max(2, 0.04 * checked), (mismatched, checked)


def test_device_replay_matches_float64_replay():
    """The df32 blocked device replay must reproduce a float64 replay of
    the same emissions: same orbit-point mass, near-identical binning
    (divergence is ~2^-48 growing with orbit length; short orbits bin
    identically except for points landing within an ulp of a pixel
    edge)."""
    # A window just outside the set where every sample escapes in ~56
    # steps (short orbits keep df32-f64 divergence far below the pixel
    # size); the canvas covers the whole plane so orbit points land.
    win = (-0.75 - 5e-7, -0.75 + 5e-7, 0.055 - 5e-7, 0.055 + 5e-7)
    canvas = Canvas(width=64, height=64)
    fr = fractals.get_fractal("buddhabrot")
    c0r, c0i, step_r, step_i = pke.grid_params(win)

    # Draw grid samples, keep short escapers (<= 200 steps).
    rng = np.random.default_rng(7)
    ks = rng.integers(0, 1 << 24, size=(512, 2))
    kr_l, ki_l, it_l = [], [], []
    for k_r, k_i in ks:
        cr, ci = _grid_to_f64(k_r, k_i, win)
        e = reference_impl.classify_scalar(float(cr), float(ci), 200)
        if e < 200:
            kr_l.append(float(k_r))
            ki_l.append(float(k_i))
            it_l.append(e)
        if len(it_l) >= 256:
            break
    assert len(it_l) >= 64
    pad = (-len(it_l)) % 64
    kr = np.asarray(kr_l + [0.0] * pad, np.float32)
    ki = np.asarray(ki_l + [0.0] * pad, np.float32)
    iters = np.asarray(it_l + [-1] * pad, np.int32)

    dfc = jnp.asarray(
        [
            c0r[0], c0r[1], c0i[0], c0i[1],
            *df32.from_float(canvas.min_real),
            *df32.from_float(canvas.min_imag),
            0.0,
        ],
        jnp.float32,
    )
    hist = jax.jit(
        lambda h, a, b, c, d: _blocked_replay_ext(
            h, a, b, c,
            fractal=fr, canvas=canvas, chunk=32, block=64,
            backend="xla", dfc=d, step_r=step_r, step_i=step_i,
        )[0]
    )(
        jnp.zeros(canvas.num_pixels, jnp.uint32),
        jnp.asarray(kr), jnp.asarray(ki), jnp.asarray(iters), dfc,
    )
    got = np.asarray(hist).reshape(canvas.shape)

    want = np.zeros(canvas.shape, np.uint64)
    for k_r, k_i, it in zip(kr_l, ki_l, it_l):
        cr, ci = _grid_to_f64(k_r, k_i, win)
        zr, zi = float(cr), float(ci)
        for s in range(it + 1):
            zr, zi = zr * zr - zi * zi + float(cr), 2 * zr * zi + float(ci)
            rc = reference_impl.bin_point(zr, zi, canvas)
            if rc is not None:
                want[rc] += 1
    total = int(want.sum())
    assert total > 0
    diff = np.abs(got.astype(np.int64) - want.astype(np.int64)).sum()
    assert diff <= max(2, 0.02 * total), (diff, total)


def test_engine_deterministic_and_both_replay_paths_agree():
    # Fast-escape window (~56 steps) so four short passes emit plenty;
    # the full-plane canvas catches the orbit points.
    win = (-0.75 - 5e-7, -0.75 + 5e-7, 0.055 - 5e-7, 0.055 + 5e-7)
    base = dict(
        canvas=Canvas(width=48, height=48),
        band=IterationBand(max_escape_iterations=400,
                           min_escape_iterations=20),
        sample_domain=win,
    )

    def opts(replay):
        return EngineOptions(
            engine="pallas",
            precision="extended",
            replay=replay,
            lane_rows=8,
            steps_per_pass=512,
            steps_per_flush=32,
            replay_capacity=1 << 12,
            replay_chunk=64,
        )

    def run(replay):
        eng = PallasEngine(RenderConfig(options=opts(replay), **base))
        state = eng.init_state(None)
        for p in range(4):
            state = eng.run_pass(state, p)
        jax.block_until_ready(state)
        return eng.histogram(state), eng.stats(state)

    h1, s1 = run("device")
    h2, _ = run("device")
    np.testing.assert_array_equal(h1, h2)

    if native.supports_f64():
        h3, s3 = run("host")
        assert s3["replay"] == "host"
        # Same kernel + seed => identical emissions; the replay
        # arithmetic differs (df32 vs f64), so histograms agree up to
        # binning flips within ~2^-48 of pixel edges.
        assert s1["emitted"] == s3["emitted"]
        assert s1["orbit_points"] == s3["orbit_points"]
        diff = np.abs(h1.astype(np.int64) - h3.astype(np.int64)).sum()
        assert diff <= max(2, 0.02 * max(h1.sum(), 1)), diff


def test_statistical_equivalence_with_float64_oracle():
    """In-band fraction and orbit mass per in-band sample must match the
    float64 oracle on a deep window (the engines sample the same window
    with different RNG streams; census effects are diluted by running
    well past the band's mean lifetime)."""
    win = _window(2e-7)
    canvas = _canvas(win, 32, 32)
    # Escape times at this depth start near ~900 steps.
    band = IterationBand(max_escape_iterations=2000, min_escape_iterations=50)

    lane_rows = 8
    pcfg = RenderConfig(
        canvas=canvas,
        band=band,
        sample_domain=win,
        options=EngineOptions(
            engine="pallas",
            precision="extended",
            replay="device",
            lane_rows=lane_rows,
            steps_per_pass=1024,
            steps_per_flush=64,
            replay_capacity=1 << 13,
            replay_chunk=64,
        ),
    )
    peng = PallasEngine(pcfg)
    pstate = peng.init_state(None)
    for p in range(16):
        pstate = peng.run_pass(pstate, p)
    jax.block_until_ready(pstate)
    pstats = peng.stats(pstate)

    ocfg = RenderConfig(
        canvas=canvas,
        band=band,
        sample_domain=win,
        options=EngineOptions(
            engine="oracle",
            precision="extended",
            oracle_samples_per_pass=1 << 13,
        ),
    )
    oeng = OracleEngine(ocfg)
    ostate = oeng.init_state(None)
    for p in range(4):
        ostate = oeng.run_pass(ostate, p)
    jax.block_until_ready(ostate)
    ostats = oeng.stats(ostate)

    # No culls on a window this deep (far from the cardioid/bulb).
    assert pstats["culled"] == 0 and ostats["culled"] == 0
    # Census correction: the persistent sampler counts each lane's
    # initial dummy draw as a finished sample (it can never be in-band),
    # and samples mid-flight at the end of the run are not counted at
    # all; subtracting the lane count removes the first bias and running
    # ~8 mean lifetimes dilutes the second. The oracle classifies every
    # draw exactly once and needs no correction.
    p_samples = pstats["samples"] - lane_rows * 128
    p_band = pstats["in_band"] / p_samples
    o_band = ostats["in_band"] / ostats["samples"]
    assert abs(p_band / o_band - 1) < 0.15, (p_band, o_band)
    p_mass = pstats["orbit_points"] / max(pstats["emitted"], 1)
    o_mass = ostats["orbit_points"] / max(ostats["in_band"], 1)
    assert abs(p_mass / o_mass - 1) < 0.10, (p_mass, o_mass)


@pytest.mark.skipif(not native.supports_f64(), reason="native f64 missing")
@pytest.mark.parametrize("threads", [1, 4])
@pytest.mark.parametrize("ship", [False, True])
def test_native_f64_replay_bitwise_vs_numpy(threads, ship):
    """The native double replay must reproduce a plain-Python double
    replay bitwise (Python floats ARE C doubles; the native block does
    the same multiply-by-inverse-pitch quantization). threads=4 also
    exercises the private-histogram merge on the f64 path."""
    win = _window(1e-6)
    canvas = _canvas(win, 24, 24)
    rng = np.random.default_rng(3)
    n = 400
    # Samples inside the window plus some far-escaping noise.
    cr = rng.uniform(win[0], win[1], n)
    ci = rng.uniform(win[2], win[3], n)
    iters = rng.integers(-1, 50, n).astype(np.int32)

    hist = np.zeros(canvas.shape, np.uint32)
    hits, points = native.replay_scatter_f64(
        cr, ci, iters, hist,
        width=canvas.width, height=canvas.height,
        min_real=canvas.min_real, min_imag=canvas.min_imag,
        delta_real=canvas.delta_real, delta_imag=canvas.delta_imag,
        burning_ship=ship, num_threads=threads,
    )

    want = np.zeros(canvas.shape, np.uint64)
    want_hits = want_points = 0
    inv_dr = 1.0 / canvas.delta_real
    inv_di = 1.0 / canvas.delta_imag
    # Random iters overshoot true escape indices; orbits coast through
    # inf/nan past escape exactly like the native block (off-canvas by
    # the comparison rules) — the overflow is intentional.
    with np.errstate(over="ignore", invalid="ignore"):
        for c_r, c_i, it in zip(cr, ci, iters):
            if it < 0:
                continue
            want_points += int(it) + 1
            zr, zi = c_r, c_i
            for s in range(int(it) + 1):
                if ship:
                    zr, zi = abs(zr), abs(zi)
                zr, zi = zr * zr - zi * zi + c_r, 2.0 * zr * zi + c_i
                if zr >= canvas.min_real and zi >= canvas.min_imag:
                    col = int((zr - canvas.min_real) * inv_dr)
                    row = int((zi - canvas.min_imag) * inv_di)
                    if 0 <= row < canvas.height and 0 <= col < canvas.width:
                        want[row, col] += 1
                        want_hits += 1
    np.testing.assert_array_equal(hist, want.astype(np.uint32))
    assert hits == want_hits
    assert points == want_points


@pytest.mark.skipif(not native.supports_f64(), reason="native f64 missing")
def test_native_f64_uint64_histogram():
    win = _window(1e-6)
    canvas = _canvas(win, 8, 8)
    cr = np.full(64, _CX)
    ci = np.full(64, _CY)
    iters = np.full(64, 30, np.int32)
    h32 = np.zeros(canvas.shape, np.uint32)
    h64 = np.zeros(canvas.shape, np.uint64)
    a = native.replay_scatter_f64(
        cr, ci, iters, h32,
        width=8, height=8,
        min_real=canvas.min_real, min_imag=canvas.min_imag,
        delta_real=canvas.delta_real, delta_imag=canvas.delta_imag,
    )
    b = native.replay_scatter_f64(
        cr, ci, iters, h64,
        width=8, height=8,
        min_real=canvas.min_real, min_imag=canvas.min_imag,
        delta_real=canvas.delta_real, delta_imag=canvas.delta_imag,
    )
    assert a == b
    np.testing.assert_array_equal(h32.astype(np.uint64), h64)


def test_make_engine_extended_routes():
    from cudabrot_tpu.engines import make_engine

    win = _window(2e-7)
    cfg = RenderConfig(
        canvas=_canvas(win),
        band=IterationBand(max_escape_iterations=300,
                           min_escape_iterations=10),
        sample_domain=win,
        options=EngineOptions(
            engine="oracle", precision="extended", num_devices=1
        ),
    )
    eng = make_engine(cfg)
    assert eng.name == "oracle"
    state = eng.init_state(None)
    state = eng.run_pass(state, 0)
    jax.block_until_ready(state)


@pytest.mark.parametrize("replay", ["device", "auto"])
def test_extended_data_parallel(replay):
    """Extended renders data-parallelize like the f32 engine: per-device
    RNG ordinals, stacked payloads (replay='auto' routes them through
    the host worker's grid decode when the native f64 path exists)."""
    from cudabrot_tpu.engines import make_engine

    win = (-0.75 - 5e-7, -0.75 + 5e-7, 0.055 - 5e-7, 0.055 + 5e-7)
    cfg = RenderConfig(
        canvas=Canvas(width=32, height=32),
        band=IterationBand(max_escape_iterations=400,
                           min_escape_iterations=20),
        sample_domain=win,
        options=EngineOptions(
            engine="pallas",
            precision="extended",
            replay=replay,
            num_devices=2,
            lane_rows=8,
            steps_per_pass=256,
            steps_per_flush=16,
            replay_capacity=1 << 12,
            replay_chunk=64,
        ),
    )
    eng = make_engine(cfg)
    state = eng.init_state(None)
    for p in range(2):
        state = eng.run_pass(state, p)
    jax.block_until_ready(state)
    hist = eng.histogram(state)
    stats = eng.stats(state)
    assert stats["emitted"] > 0
    assert hist.sum() > 0
    assert hist.sum() <= stats["orbit_points"]


def test_extended_row_sharded_bitwise_equals_replicated():
    """Extended + --hist-sharding rows must produce the same histogram
    as the replicated device-replay wrapper bitwise (row ranges
    partition the canvas; the df32 replay is deterministic)."""
    import dataclasses

    from cudabrot_tpu.engines.pallas_engine import PallasEngine
    from cudabrot_tpu.parallel.data_parallel import DataParallelEngine
    from cudabrot_tpu.parallel.sharded_hist import ShardedHistogramEngine

    win = (-0.75 - 5e-7, -0.75 + 5e-7, 0.055 - 5e-7, 0.055 + 5e-7)
    cfg = RenderConfig(
        canvas=Canvas(width=32, height=22),  # uneven 22 rows / 2 devices
        band=IterationBand(max_escape_iterations=400,
                           min_escape_iterations=20),
        sample_domain=win,
        options=EngineOptions(
            engine="pallas",
            precision="extended",
            num_devices=2,
            lane_rows=8,
            steps_per_pass=256,
            steps_per_flush=16,
            replay_capacity=1 << 12,
            replay_chunk=64,
        ),
    )

    def run(engine):
        state = engine.init_state(None)
        for p in range(2):
            state = engine.run_pass(state, p)
        jax.block_until_ready(state)
        return engine.histogram(state)

    rep = run(DataParallelEngine(cfg, PallasEngine(cfg, replay_mode="device")))
    cfg_rows = cfg.replace(
        options=dataclasses.replace(cfg.options, histogram_sharding="rows")
    )
    sh = run(
        ShardedHistogramEngine(
            cfg_rows, PallasEngine(cfg_rows, replay_mode="device")
        )
    )
    assert rep.sum() > 0
    np.testing.assert_array_equal(rep, sh)


def test_cli_extended_render(tmp_path):
    """--precision extended drives end-to-end through the CLI (oracle
    engine: extended runs as float64, its strict superset)."""
    from cudabrot_tpu import cli

    out = tmp_path / "deep.pgm"
    win = "-0.7500005,-0.7499995,0.0549995,0.0550005"
    rc = cli.main(
        [
            "-w", "24", "-h", "24", "-m", "200", "-c", "20",
            "--passes", "1", "-t", "-1",
            "--engine", "oracle", "--precision", "extended",
            "--sample-domain", win,
            "-o", str(out),
        ]
    )
    assert rc == 0
    assert out.read_bytes().startswith(b"P5\n24 24\n65535\n")


def test_extended_burning_ship():
    """The df32 kernel's fold_abs path (burning ship) classifies against
    float64 ground truth like the quadratic map."""
    win = (-1.7548 - 5e-7, -1.7548 + 5e-7, -0.0338 - 5e-7, -0.0338 + 5e-7)
    min_it, max_it = 5, 500
    fr = fractals.get_fractal("burning-ship")
    state = pke.init_ext_lane_state(8)
    seed = jnp.asarray([42, 43], jnp.uint32)
    res = pke.classify_pass_ext(
        state,
        seed,
        None,
        fractal=fr,
        min_it=min_it,
        max_it=max_it,
        steps_per_pass=1024,
        steps_per_flush=64,
        inner_unroll=4,
        rng="threefry",
        sample_domain=win,
        interpret=True,
    )
    emit_it = np.asarray(res.emit_it).reshape(-1)
    emit_kr = np.asarray(res.emit_c[:, 0]).reshape(-1)
    emit_ki = np.asarray(res.emit_c[:, 1]).reshape(-1)
    valid = emit_it >= 0
    assert valid.sum() > 20, "burning-ship window should emit"
    checked = mismatched = 0
    for k_r, k_i, it in zip(
        emit_kr[valid][:150], emit_ki[valid][:150], emit_it[valid][:150]
    ):
        cr, ci = _grid_to_f64(k_r, k_i, win)
        expected = reference_impl.classify_scalar(
            float(cr), float(ci), max_it, burning_ship=True
        )
        checked += 1
        if expected != it:
            mismatched += 1
    assert mismatched <= max(2, 0.04 * checked), (mismatched, checked)


def test_extended_bits_injection_exact_grid():
    """rng='bits' drives the ext kernel with exact known randomness: the
    initial dead-lane refill must install kr/ki = bits >> 8 and the df32
    c = center (+) (k - 2^23) * step, bit-exactly."""
    win = _window(2e-7)
    fr = fractals.get_fractal("buddhabrot")
    rows = 2
    rng = np.random.default_rng(11)
    bits = rng.integers(0, 1 << 32, size=(1, 4, 2, rows, 128), dtype=np.uint64)
    bits = jnp.asarray(bits.astype(np.uint32))
    res = pke.classify_pass_ext(
        pke.init_ext_lane_state(rows),
        jnp.asarray([0, 0], jnp.uint32),
        bits,
        fractal=fr,
        min_it=5,
        max_it=1 << 20,  # nobody re-finishes after the initial refill
        steps_per_pass=16,
        steps_per_flush=16,
        inner_unroll=4,
        rng="bits",
        sample_domain=win,
        interpret=True,
    )
    want_kr = np.asarray(bits[0, 0, 0] >> 8).astype(np.float32)
    want_ki = np.asarray(bits[0, 0, 1] >> 8).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(res.state.kr), want_kr)
    np.testing.assert_array_equal(np.asarray(res.state.ki), want_ki)
    # df32 c reconstruction: center (+) off with one f32 rounding on off.
    c0r, c0i, step_r, step_i = pke.grid_params(win)
    two23 = np.float32(8388608.0)
    off_r = (want_kr - two23) * np.float32(step_r)
    hi, lo = df32.add_f(
        jnp.float32(c0r[0]), jnp.float32(c0r[1]), jnp.asarray(off_r)
    )
    np.testing.assert_array_equal(np.asarray(res.state.crh), np.asarray(hi))
    np.testing.assert_array_equal(np.asarray(res.state.crl), np.asarray(lo))


def test_extended_interior_mode():
    """Anti-Buddhabrot (interior emission) under df32: every emission
    replays exactly max_it points (iters == max_it - 1), like the f32
    kernel's interior contract."""
    fr = fractals.get_fractal("anti-buddhabrot")
    state = pke.init_ext_lane_state(8)
    res = pke.classify_pass_ext(
        state,
        jnp.asarray([1, 2], jnp.uint32),
        None,
        fractal=fr,
        min_it=0,
        max_it=64,
        steps_per_pass=1024,
        steps_per_flush=64,
        inner_unroll=4,
        rng="threefry",
        sample_domain=(-2.0, 2.0, -2.0, 2.0),
        interpret=True,
    )
    emit = np.asarray(res.emit_it)
    got = emit[emit >= 0]
    assert got.size > 100
    assert np.all(got == 63)


def test_extended_rejects_device_share():
    win = _window(2e-7)
    with pytest.raises(ConfigError, match="replay-device-share"):
        PallasEngine(
            RenderConfig(
                canvas=_canvas(win),
                band=IterationBand(max_escape_iterations=300,
                                   min_escape_iterations=10),
                sample_domain=win,
                options=EngineOptions(
                    engine="pallas",
                    precision="extended",
                    replay="host",
                    replay_device_share=0.5,
                ),
            )
        )
