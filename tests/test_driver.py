import os
import signal

import numpy as np
import pytest

from cudabrot_tpu import driver
from cudabrot_tpu.config import Canvas, EngineOptions, IterationBand, RenderConfig
from cudabrot_tpu.io import checkpoint as ckpt


def _cfg(tmp_path=None, **kw):
    defaults = dict(
        canvas=Canvas(width=32, height=32),
        band=IterationBand(max_escape_iterations=50,
                           min_escape_iterations=5),
        seconds_to_run=-1.0,
        max_passes=2,
        options=EngineOptions(engine="oracle",
                              oracle_samples_per_pass=1024),
    )
    defaults.update(kw)
    return RenderConfig(**defaults)


def test_fixed_pass_render(capsys):
    logs = []
    res = driver.run_render(_cfg(), log=logs.append)
    assert res.passes == 2
    assert res.histogram.shape == (32, 32)
    assert res.histogram.dtype == np.uint32
    assert res.histogram.sum() > 0
    assert res.stats["samples"] == 2048
    assert res.stats["in_band"] > 0
    assert res.stats["orbit_points"] >= res.histogram.sum()
    assert any("Calculating Buddhabrot." in l for l in logs)
    assert any("Buddhabrot passes took" in l for l in logs)


def test_render_is_deterministic_with_fixed_passes():
    a = driver.run_render(_cfg(), log=lambda s: None)
    b = driver.run_render(_cfg(), log=lambda s: None)
    np.testing.assert_array_equal(a.histogram, b.histogram)


def test_different_seeds_differ():
    a = driver.run_render(_cfg(), log=lambda s: None)
    b = driver.run_render(_cfg(seed=999), log=lambda s: None)
    assert not np.array_equal(a.histogram, b.histogram)


def test_time_boxed_render_stops():
    cfg = _cfg(seconds_to_run=0.5, max_passes=None)
    res = driver.run_render(cfg, log=lambda s: None)
    assert res.passes >= 1
    assert res.elapsed_seconds < 30.0


def test_checkpoint_save_and_resume(tmp_path):
    path = str(tmp_path / "state.ckpt")
    cfg = _cfg(inprogress_file=path)
    r1 = driver.run_render(cfg, log=lambda s: None)
    saved, meta = ckpt.load(path, cfg)
    np.testing.assert_array_equal(saved, r1.histogram)
    assert meta["passes"] == 2

    # Resume: loaded mass must be preserved and added to.
    r2 = driver.run_render(cfg, log=lambda s: None)
    assert r2.histogram.sum() > r1.histogram.sum()
    saved2, meta2 = ckpt.load(path, cfg)
    assert meta2["passes"] == 4
    # Resumed passes use later fold indices, so the second run's passes
    # are fresh samples (not a replay of the first two).
    np.testing.assert_array_equal(saved2, r2.histogram)


def test_periodic_checkpointing(tmp_path):
    path = str(tmp_path / "periodic.ckpt")
    cfg = _cfg(inprogress_file=path, max_passes=4, checkpoint_interval=2)
    driver.run_render(cfg, log=lambda s: None)
    _, meta = ckpt.load(path, cfg)
    assert meta["passes"] == 4


def test_sigint_interrupts_and_saves(tmp_path):
    """SIGINT mid-render finishes the current pass and exits the loop
    (cudabrot.cu:483, 756-760)."""
    path = str(tmp_path / "sig.ckpt")
    cfg = _cfg(
        seconds_to_run=60.0,
        max_passes=None,
        inprogress_file=path,
    )

    calls = {"n": 0}
    orig = driver.time.monotonic

    def fake_monotonic():
        calls["n"] += 1
        if calls["n"] == 3:
            os.kill(os.getpid(), signal.SIGINT)
        return orig()

    driver.time.monotonic = fake_monotonic
    try:
        res = driver.run_render(cfg, log=lambda s: None)
    finally:
        driver.time.monotonic = orig
    assert res.interrupted
    assert res.passes >= 1
    assert ckpt.load(path, cfg) is not None


def test_preview_snapshots(tmp_path):
    preview = str(tmp_path / "live.png")
    cfg = _cfg(
        max_passes=4,
        checkpoint_interval=2,
        preview_file=preview,
    )
    driver.run_render(cfg, log=lambda s: None)
    from cudabrot_tpu.io import png

    img = png.read_png(preview)
    assert img.shape == (32, 32)
    assert img.max() > 0
    leftovers = [p for p in tmp_path.iterdir() if p.name.endswith(".tmp")]
    assert leftovers == []
