"""uint64 histogram support (extreme-duration renders).

The reference accumulates in uint32 only (cudabrot.cu:105-108) and would
silently wrap hot bins after ~4.3e9 counts; --hist-dtype uint64 runs the
native host-replay accumulation in 64-bit with honest refusals on every
path that cannot (device scatter, oracle, hybrid split)."""

import numpy as np
import pytest

from cudabrot_tpu.config import (
    Canvas,
    ConfigError,
    EngineOptions,
    IterationBand,
    RenderConfig,
)
from cudabrot_tpu.io import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def _cfg(**opt):
    return RenderConfig(
        canvas=Canvas(width=40, height=40),
        band=IterationBand(max_escape_iterations=60,
                           min_escape_iterations=5),
        options=EngineOptions(
            engine="pallas", lane_rows=8, steps_per_pass=256,
            steps_per_flush=16, replay_capacity=1 << 14, replay_chunk=64,
            **opt,
        ),
    )


def test_native_u64_replay_matches_u32():
    from tests import reference_impl as ref

    canvas = Canvas(width=64, height=48, min_real=-2.0, max_real=2.0,
                    min_imag=-1.5, max_imag=1.5)
    rng = np.random.default_rng(7)
    cr = rng.uniform(-2, 2, 2048).astype(np.float32)
    ci = rng.uniform(-2, 2, 2048).astype(np.float32)
    iters = np.array(
        [ref.classify_scalar(a, b, 90) for a, b in zip(cr, ci)], np.int32
    )
    iters = np.where((iters >= 4) & (iters < 90), iters, -1).astype(np.int32)

    kw = dict(width=canvas.width, height=canvas.height,
              min_real=canvas.min_real, min_imag=canvas.min_imag,
              delta_real=canvas.delta_real, delta_imag=canvas.delta_imag)
    h32 = np.zeros(canvas.shape, np.uint32)
    hits32, pts32 = native.replay_scatter(cr, ci, iters, h32, **kw)
    h64 = np.zeros(canvas.shape, np.uint64)
    hits64, pts64 = native.replay_scatter(cr, ci, iters, h64, **kw)
    assert (hits32, pts32) == (hits64, pts64)
    np.testing.assert_array_equal(h64, h32.astype(np.uint64))


def test_native_u64_accumulates_past_u32_range():
    canvas = Canvas(width=8, height=8)
    hist = np.full(canvas.shape, 0xFFFFFFFF, np.uint64)
    cr = np.array([0.3], np.float32)
    ci = np.array([0.1], np.float32)
    iters = np.array([5], np.int32)
    hits, _ = native.replay_scatter(
        cr, ci, iters, hist,
        width=8, height=8, min_real=canvas.min_real,
        min_imag=canvas.min_imag, delta_real=canvas.delta_real,
        delta_imag=canvas.delta_imag,
    )
    assert hits > 0
    assert int(hist.max()) > 0xFFFFFFFF  # no wraparound


def test_engine_u64_bitwise_matches_u32():
    import jax

    from cudabrot_tpu.engines.pallas_engine import PallasEngine

    def run(dtype):
        eng = PallasEngine(_cfg(hist_dtype=dtype), replay_mode="host")
        state = eng.init_state(None)
        for p in range(2):
            state = eng.run_pass(state, p)
        jax.block_until_ready(state)
        return eng.histogram(state)

    h32 = run("uint32")
    h64 = run("uint64")
    assert h32.dtype == np.uint32 and h64.dtype == np.uint64
    assert h32.sum() > 0
    np.testing.assert_array_equal(h64, h32.astype(np.uint64))


def test_u64_requires_host_replay():
    from cudabrot_tpu.engines.pallas_engine import PallasEngine

    with pytest.raises(ConfigError, match="host replay"):
        PallasEngine(_cfg(hist_dtype="uint64"), replay_mode="device")
    with pytest.raises(ConfigError, match="uint32"):
        PallasEngine(
            _cfg(hist_dtype="uint64", replay_device_share=0.5),
            replay_mode="host",
        )


def test_u64_oracle_refused():
    from cudabrot_tpu.engines.oracle_engine import OracleEngine

    cfg = RenderConfig(
        canvas=Canvas(width=16, height=16),
        band=IterationBand(max_escape_iterations=30,
                           min_escape_iterations=3),
        options=EngineOptions(engine="oracle", hist_dtype="uint64"),
    )
    with pytest.raises(ConfigError, match="pallas"):
        OracleEngine(cfg)


def test_u64_checkpoint_roundtrip_and_resume_guard(tmp_path):
    from cudabrot_tpu.io import checkpoint as ckpt
    from cudabrot_tpu.engines.host_replay import HostReplayWorker

    cfg = _cfg(hist_dtype="uint64")
    big = np.full(cfg.canvas.shape, 0x1_0000_0005, np.uint64)
    path = str(tmp_path / "u64.ckpt")
    ckpt.save(path, big, cfg, passes=3)
    loaded, meta = ckpt.load(path, cfg)
    assert loaded.dtype == np.uint64
    assert meta["dtype"] == "uint64"
    np.testing.assert_array_equal(loaded, big)

    # Resuming >u32-range counts into a uint32 render must refuse, not wrap.
    w32 = HostReplayWorker(cfg.canvas, burning_ship=False)
    with pytest.raises(ValueError, match="uint64"):
        w32.add_resumed(loaded)
    # A uint32 checkpoint resumes cleanly into a uint64 render.
    w64 = HostReplayWorker(cfg.canvas, burning_ship=False,
                           dtype=np.uint64)
    w64.add_resumed(np.full(cfg.canvas.shape, 9, np.uint32))
    assert int(w64.hist.min()) == 9


def test_tonemap_u64():
    from cudabrot_tpu.ops import tonemap as tm

    hist32 = np.arange(64, dtype=np.uint32).reshape(8, 8)
    a = tm.tonemap_hist(hist32, gamma=-1.0)
    b = tm.tonemap_hist(hist32.astype(np.uint64), gamma=-1.0)
    np.testing.assert_array_equal(np.asarray(a.image), np.asarray(b.image))

    # Above the uint32 range: max reported exactly, white hit exactly.
    huge = np.array([[0, 1 << 33], [1 << 32, 1 << 31]], np.uint64)
    res = tm.tonemap_hist(huge, gamma=2.2)
    assert int(res.max_count) == 1 << 33
    img = np.asarray(res.image)
    assert img[0, 1] == 65535 and img[0, 0] == 0
    assert 0 < img[1, 0] < 65535
