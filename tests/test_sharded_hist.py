"""Row-sharded histogram engine on the 8-device virtual mesh."""

import jax
import numpy as np
import pytest

from cudabrot_tpu import driver, engines
from cudabrot_tpu.config import Canvas, EngineOptions, IterationBand, RenderConfig
from cudabrot_tpu.parallel.sharded_hist import ShardedHistogramEngine


def _cfg(n_dev, sharding="rows", height=32, **kw):
    defaults = dict(
        canvas=Canvas(width=32, height=height),
        band=IterationBand(max_escape_iterations=40,
                           min_escape_iterations=3),
        seconds_to_run=-1.0,
        max_passes=2,
        options=EngineOptions(
            engine="pallas", lane_rows=8, steps_per_pass=128,
            steps_per_flush=16, replay_capacity=1 << 12, replay_chunk=32,
            num_devices=n_dev, histogram_sharding=sharding,
            # Pin device replay: the bitwise sharded==replicated invariant
            # requires identical replay arithmetic on both sides (the
            # replicated default is host replay, whose f32 contraction
            # differs) — and the sharded engine replays on-device.
            replay="device",
        ),
    )
    defaults.update(kw)
    return RenderConfig(**defaults)


def test_engine_selected():
    eng = engines.make_engine(_cfg(4))
    assert isinstance(eng, ShardedHistogramEngine)
    assert eng.rows_per_shard == 8


def test_sharded_matches_replicated_exactly():
    """Row ranges partition the canvas, so for identical seeds the sharded
    histogram must equal the replicated one bit for bit."""
    sharded = driver.run_render(_cfg(4, "rows"), log=lambda s: None)
    replicated = driver.run_render(
        _cfg(4, "replicated"), log=lambda s: None
    )
    assert sharded.histogram.sum() > 0
    np.testing.assert_array_equal(sharded.histogram, replicated.histogram)
    assert sharded.stats["orbit_points"] == replicated.stats["orbit_points"]
    assert sharded.stats["samples"] == replicated.stats["samples"]


def test_uneven_row_split():
    """Height not divisible by the device count: padded rows must not leak
    into the output."""
    res = driver.run_render(_cfg(8, "rows", height=30), log=lambda s: None)
    assert res.histogram.shape == (30, 32)
    assert res.histogram.sum() > 0


def test_sharded_resume(tmp_path):
    path = str(tmp_path / "sh.ckpt")
    cfg = _cfg(4, "rows", inprogress_file=path)
    r1 = driver.run_render(cfg, log=lambda s: None)
    r2 = driver.run_render(cfg, log=lambda s: None)
    assert r2.histogram.sum() > r1.histogram.sum()


def test_sharded_deterministic():
    a = driver.run_render(_cfg(4, "rows"), log=lambda s: None)
    b = driver.run_render(_cfg(4, "rows"), log=lambda s: None)
    np.testing.assert_array_equal(a.histogram, b.histogram)
