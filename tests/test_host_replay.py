"""Native C++ host replay engine: correctness vs the scalar ground truth
and integration with the Pallas engine's host-replay mode."""

import jax
import numpy as np
import pytest

from cudabrot_tpu.config import Canvas, EngineOptions, IterationBand, RenderConfig
from cudabrot_tpu.io import native
from tests import reference_impl as ref

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def _band_samples(n, max_it, min_it, seed=0):
    rng = np.random.default_rng(seed)
    cr = rng.uniform(-2, 2, n)
    ci = rng.uniform(-2, 2, n)
    iters = np.array(
        [ref.classify_scalar(a, b, max_it) for a, b in zip(cr, ci)], np.int32
    )
    mask = (iters < max_it) & (iters >= min_it)
    return cr[mask], ci[mask], iters[mask]


def test_replay_matches_scalar_statistically():
    canvas = Canvas(width=64, height=48, min_real=-2.0, max_real=2.0,
                    min_imag=-1.5, max_imag=1.5)
    cr, ci, iters = _band_samples(4096, 80, 3)
    want = np.zeros(canvas.shape, np.uint32)
    for a, b in zip(cr, ci):
        ref.replay_scalar(a, b, want, canvas)

    got = np.zeros(canvas.shape, np.uint32)
    hits, points = native.replay_scatter(
        cr, ci, iters, got,
        width=canvas.width, height=canvas.height,
        min_real=canvas.min_real, min_imag=canvas.min_imag,
        delta_real=canvas.delta_real, delta_imag=canvas.delta_imag,
    )
    assert points == int((iters + 1).sum())
    assert hits == got.sum()
    # f32 native vs f64 scalar: orbits diverge slightly near bin edges;
    # total mass and distribution must agree closely.
    assert abs(int(got.sum()) - int(want.sum())) <= 0.01 * want.sum()
    diff = np.abs(got.astype(int) - want.astype(int)).sum()
    assert diff <= 0.05 * want.sum()


def test_replay_skips_invalid_lanes():
    canvas = Canvas(width=16, height=16)
    cr = np.array([2.5, 0.3], np.float32)  # first escapes immediately
    ci = np.array([0.0, 2.1], np.float32)
    iters = np.array([-1, 0], np.int32)  # first marked invalid
    hist = np.zeros(canvas.shape, np.uint32)
    hits, points = native.replay_scatter(
        cr, ci, iters, hist,
        width=16, height=16,
        min_real=canvas.min_real, min_imag=canvas.min_imag,
        delta_real=canvas.delta_real, delta_imag=canvas.delta_imag,
    )
    assert points == 1  # only the valid lane's single update
    # the valid lane's first update: z = c^2 + c for c=0.3+2.1i


def test_replay_empty_batch():
    canvas = Canvas(width=8, height=8)
    hist = np.zeros(canvas.shape, np.uint32)
    hits, points = native.replay_scatter(
        np.zeros(0, np.float32), np.zeros(0, np.float32),
        np.zeros(0, np.int32), hist,
        width=8, height=8, min_real=-2, min_imag=-2,
        delta_real=0.5, delta_imag=0.5,
    )
    assert hits == 0 and points == 0


def test_crc32_matches_zlib():
    import zlib

    data = b"tpubrot native core"
    assert native.crc32(data) == zlib.crc32(data) & 0xFFFFFFFF


def test_native_pgm_matches_python(tmp_path):
    from cudabrot_tpu.io import pgm

    rng = np.random.default_rng(0)
    img = rng.integers(0, 65536, size=(19, 33)).astype(np.uint16)
    path = str(tmp_path / "native.pgm")
    assert native.write_pgm16(path, img)
    np.testing.assert_array_equal(pgm.read_pgm(path), img)


def test_write_file_atomic(tmp_path):
    path = str(tmp_path / "blob.bin")
    payload = b"\x00\x01\x02" * 1000
    assert native.write_file_atomic(path, payload)
    assert open(path, "rb").read() == payload
    leftovers = [p for p in tmp_path.iterdir() if "tmp" in p.name]
    assert leftovers == []


def test_pallas_engine_host_mode_matches_device_mode():
    """The same classify stream replayed on host vs device must produce
    statistically identical histograms (same samples, f32 both sides)."""
    from cudabrot_tpu.engines.pallas_engine import PallasEngine

    cfg = RenderConfig(
        canvas=Canvas(width=40, height=40),
        band=IterationBand(max_escape_iterations=60,
                           min_escape_iterations=5),
        options=EngineOptions(
            engine="pallas", lane_rows=8, steps_per_pass=256,
            steps_per_flush=16, replay_capacity=1 << 14, replay_chunk=64,
        ),
    )

    def run(mode):
        eng = PallasEngine(cfg, replay_mode=mode)
        state = eng.init_state(None)
        for p in range(3):
            state = eng.run_pass(state, p)
        jax.block_until_ready(state)
        return eng.histogram(state), eng.stats(state)

    dh, dstats = run("device")
    hh, hstats = run("host")
    assert hstats["replay"] == "host"
    assert dstats["replay"] == "device"
    # Identical emission stream; replay math is f32 on both sides but
    # FMA contraction differs, so compare distributions tightly.
    assert abs(int(hh.sum()) - int(dh.sum())) <= 0.01 * dh.sum()
    a = dh.astype(np.float64) / dh.sum()
    b = hh.astype(np.float64) / hh.sum()
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.999, corr
    assert hstats["orbit_points"] > 0
    assert hstats["on_canvas_points"] == hh.sum()


def test_host_mode_resume_preserves_mass():
    from cudabrot_tpu.engines.pallas_engine import PallasEngine

    cfg = RenderConfig(
        canvas=Canvas(width=24, height=24),
        band=IterationBand(max_escape_iterations=50,
                           min_escape_iterations=4),
        options=EngineOptions(
            engine="pallas", lane_rows=8, steps_per_pass=128,
            steps_per_flush=16, replay_capacity=1 << 12, replay_chunk=32,
        ),
    )
    eng = PallasEngine(cfg, replay_mode="host")
    hist0 = np.full(cfg.canvas.shape, 7, np.uint32)
    state = eng.init_state(hist0)
    state = eng.run_pass(state, 0)
    jax.block_until_ready(state)
    hist = eng.histogram(state)
    assert hist.min() >= 7  # resumed mass preserved under new counts


def test_packed_payload_roundtrip_is_exact():
    """The 8-byte packed emission layout must reconstruct the kernel's
    f32 c values bit-exactly (c = k * 2^-22 - 2 for 24-bit k is the
    kernel's own sample quantization) and the escape index losslessly."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    k = rng.integers(0, 1 << 24, size=512, dtype=np.uint32)
    cr = (k.astype(np.float32) * np.float32(2.384185791015625e-07)
          - np.float32(2.0))
    it = rng.integers(-1, 0xFFFF, size=512).astype(np.int32)

    # Device-side pack (mirrors pallas_engine.host_pass).
    scale = jnp.float32(4194304.0)
    k_r = ((jnp.asarray(cr) + 2.0) * scale).astype(jnp.uint32)
    enc = (jnp.asarray(it) + 1).astype(jnp.uint32)
    w0 = np.asarray(k_r | ((enc & jnp.uint32(0xFF)) << 24))
    w1 = np.asarray(k_r | ((enc >> 8) << 24))

    # Host-side unpack (mirrors HostReplayWorker._job).
    k_back = (w0 & 0xFFFFFF).astype(np.float32)
    cr_back = (k_back * np.float32(2.384185791015625e-07)
               - np.float32(2.0))
    enc_back = (w0 >> 24) | ((w1 >> 24) << 8)
    it_back = enc_back.astype(np.int32) - 1

    np.testing.assert_array_equal(cr_back.view(np.uint32),
                                  cr.view(np.uint32))  # bit-exact
    np.testing.assert_array_equal(it_back, it)


def test_host_mode_uses_packed_payload_and_matches():
    """Host mode with a packable band (max_it < 2^16) must produce the
    same histogram mass as before packing (statistically identical
    stream, bit-exact c round trip)."""
    from cudabrot_tpu.engines.pallas_engine import PallasEngine

    cfg = RenderConfig(
        canvas=Canvas(width=40, height=40),
        band=IterationBand(max_escape_iterations=60,
                           min_escape_iterations=5),
        options=EngineOptions(
            engine="pallas", lane_rows=8, steps_per_pass=256,
            steps_per_flush=16, replay_capacity=1 << 14, replay_chunk=64,
        ),
    )
    eng = PallasEngine(cfg, replay_mode="host")
    assert eng._packed_payload
    state = eng.init_state(None)
    for p in range(3):
        state = eng.run_pass(state, p)
    jax.block_until_ready(state)
    hh = eng.histogram(state)
    hstats = eng.stats(state)
    assert hstats["orbit_points"] > 0
    assert hstats["on_canvas_points"] == hh.sum()

    # Device-mode replay of the same stream: tight statistical agreement
    # (same invariant the unpacked payload test asserted).
    dng = PallasEngine(cfg, replay_mode="device")
    dstate = dng.init_state(None)
    for p in range(3):
        dstate = dng.run_pass(dstate, p)
    jax.block_until_ready(dstate)
    dh = dng.histogram(dstate)
    assert abs(int(hh.sum()) - int(dh.sum())) <= 0.01 * dh.sum()


@pytest.mark.parametrize("num_threads", [2, 4])
@pytest.mark.parametrize("dtype", [np.uint32, np.uint64])
def test_multithread_replay_bitwise_equals_single_thread(num_threads, dtype):
    """Forced multi-thread native replay (per-thread private histograms +
    serial merge, csrc/tpubrot_native.cpp ReplayScatterImpl) must be
    bitwise identical to the 1-thread result. The native engine only
    splits when every thread gets >= 1024 samples, so the batch must be
    large enough for the chunk-split logic to actually engage."""
    canvas = Canvas(width=64, height=48, min_real=-2.0, max_real=2.0,
                    min_imag=-1.5, max_imag=1.5)
    # ~20k uniform draws yield >> 1024*num_threads in-band samples at a
    # permissive band; tile them to be safe on any seed.
    cr, ci, iters = _band_samples(20000, 120, 1, seed=11)
    reps = -(-(1024 * num_threads * 2) // max(len(cr), 1))
    cr = np.tile(cr, reps)
    ci = np.tile(ci, reps)
    iters = np.tile(iters, reps)
    assert len(cr) >= 1024 * num_threads

    def run(threads):
        hist = np.zeros(canvas.shape, dtype)
        hits, points = native.replay_scatter(
            cr, ci, iters, hist,
            width=canvas.width, height=canvas.height,
            min_real=canvas.min_real, min_imag=canvas.min_imag,
            delta_real=canvas.delta_real, delta_imag=canvas.delta_imag,
            num_threads=threads,
        )
        return hist, hits, points

    h1, hits1, pts1 = run(1)
    hn, hitsn, ptsn = run(num_threads)
    np.testing.assert_array_equal(h1, hn)
    assert (hits1, pts1) == (hitsn, ptsn)
    assert pts1 == int((iters.astype(np.int64) + 1).sum())


def test_multithread_replay_burning_ship_bitwise():
    """The burning-ship fold goes through a separate template instantiation
    of the threaded path; cover its merge too."""
    canvas = Canvas(width=32, height=32)
    rng = np.random.default_rng(5)
    n = 6000
    cr = rng.uniform(-2, 2, n)
    ci = rng.uniform(-2, 2, n)
    iters = np.array(
        [ref.classify_scalar(a, b, 60, burning_ship=True)
         for a, b in zip(cr, ci)], np.int32)
    mask = (iters < 60) & (iters >= 1)
    cr, ci, iters = cr[mask], ci[mask], iters[mask]
    reps = -(-4096 // max(len(cr), 1))
    cr, ci, iters = np.tile(cr, reps), np.tile(ci, reps), np.tile(iters, reps)

    def run(threads):
        hist = np.zeros(canvas.shape, np.uint32)
        native.replay_scatter(
            cr, ci, iters, hist,
            width=canvas.width, height=canvas.height,
            min_real=canvas.min_real, min_imag=canvas.min_imag,
            delta_real=canvas.delta_real, delta_imag=canvas.delta_imag,
            burning_ship=True, num_threads=threads,
        )
        return hist

    np.testing.assert_array_equal(run(1), run(2))


def test_worker_resolves_auto_threads_affinity_aware():
    import os

    from cudabrot_tpu.engines.host_replay import HostReplayWorker

    try:
        cores = len(os.sched_getaffinity(0))
    except (AttributeError, OSError):
        cores = os.cpu_count() or 1
    w = HostReplayWorker(Canvas(width=8, height=8), burning_ship=False)
    assert w.num_threads == cores
    w.close()
    w4 = HostReplayWorker(Canvas(width=8, height=8), burning_ship=False,
                          num_threads=4)
    assert w4.num_threads == 4
    w4.close()
