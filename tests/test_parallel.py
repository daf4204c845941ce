"""Multi-device data-parallel tests on the 8-way virtual CPU mesh."""

import jax
import numpy as np
import pytest

from cudabrot_tpu import driver, engines
from cudabrot_tpu.config import Canvas, EngineOptions, IterationBand, RenderConfig
from cudabrot_tpu.parallel.data_parallel import DataParallelEngine
from cudabrot_tpu.parallel.mesh import make_mesh


def _cfg(n_dev, **kw):
    defaults = dict(
        canvas=Canvas(width=32, height=32),
        band=IterationBand(max_escape_iterations=50,
                           min_escape_iterations=5),
        seconds_to_run=-1.0,
        max_passes=2,
        options=EngineOptions(
            engine="oracle",
            oracle_samples_per_pass=512,
            num_devices=n_dev,
        ),
    )
    defaults.update(kw)
    return RenderConfig(**defaults)


def test_virtual_device_count():
    assert len(jax.devices()) == 8


def test_make_mesh():
    mesh = make_mesh(4)
    assert mesh.devices.size == 4
    assert mesh.axis_names == ("devices",)
    assert make_mesh(None).devices.size == 8
    with pytest.raises(ValueError):
        make_mesh(16)


def test_make_mesh_base_device():
    # -d N --devices M selects devices N..N+M-1 (the multi-device
    # generalization of cudabrot.cu:155's single-device -d).
    all_devs = jax.devices()
    mesh = make_mesh(2, base=1)
    assert list(mesh.devices.flat) == all_devs[1:3]
    assert make_mesh(None, base=6).devices.size == 2
    with pytest.raises(ValueError):
        make_mesh(4, base=6)  # only 2 devices remain past base 6
    with pytest.raises(ValueError):
        make_mesh(1, base=8)


def test_dp_engine_selected():
    eng = engines.make_engine(_cfg(4))
    assert isinstance(eng, DataParallelEngine)
    assert eng.num_devices == 4


def test_dp_render_runs_and_accumulates():
    res = driver.run_render(_cfg(4), log=lambda s: None)
    assert res.histogram.shape == (32, 32)
    assert res.histogram.sum() > 0
    # 4 devices x 2 passes x 512 samples
    assert res.stats["samples"] == 4 * 2 * 512


def test_dp_devices_sample_independently():
    """Each device must fold a distinct RNG stream: the merged histogram of
    a 2-device run must differ from 2x a single-device run."""
    res_dp = driver.run_render(_cfg(2), log=lambda s: None)
    res_1 = driver.run_render(_cfg(1), log=lambda s: None)
    assert not np.array_equal(res_dp.histogram, 2 * res_1.histogram)


def test_dp_deterministic():
    a = driver.run_render(_cfg(4), log=lambda s: None)
    b = driver.run_render(_cfg(4), log=lambda s: None)
    np.testing.assert_array_equal(a.histogram, b.histogram)


def test_dp_matches_sum_of_single_device_streams():
    """The DP histogram equals the sum of the per-ordinal single-device
    renders — communication only reorders addition, which is exact for
    uint32 (unlike the reference's racy float-free but lossy adds,
    cudabrot.cu:312)."""
    from cudabrot_tpu.engines.oracle_engine import OracleEngine

    import jax.numpy as jnp

    cfg = _cfg(2)
    dp = driver.run_render(cfg, log=lambda s: None)

    total = np.zeros((32, 32), np.uint64)
    inner = OracleEngine(cfg)
    for ordinal in range(2):
        state = inner.init_state(None)
        for p in range(2):
            state = jax.jit(inner.core)(
                state, jnp.uint32(p), jnp.uint32(ordinal)
            )
        total += inner.histogram(state).astype(np.uint64)
    np.testing.assert_array_equal(dp.histogram.astype(np.uint64), total)


def test_dp_resume_preserves_mass(tmp_path):
    path = str(tmp_path / "dp.ckpt")
    cfg = _cfg(4, inprogress_file=path)
    r1 = driver.run_render(cfg, log=lambda s: None)
    r2 = driver.run_render(cfg, log=lambda s: None)
    assert r2.histogram.sum() > r1.histogram.sum()


def test_dp_with_pallas_engine():
    """Production multi-chip path: Pallas engine (interpret) under
    shard_map over the virtual mesh. make_engine picks host replay when
    the native library is present (the fast accumulation path), device
    replay otherwise; both must render."""
    from cudabrot_tpu.engines.pallas_engine import PallasEngine
    from cudabrot_tpu.io import native

    cfg = RenderConfig(
        canvas=Canvas(width=32, height=32),
        band=IterationBand(max_escape_iterations=40,
                           min_escape_iterations=3),
        options=EngineOptions(
            engine="pallas", lane_rows=8, steps_per_pass=128,
            steps_per_flush=16, replay_capacity=1 << 12, replay_chunk=32,
            num_devices=4,
        ),
    )
    eng = engines.make_engine(cfg)
    expected = "dp-host(pallas)" if native.available() else "dp(pallas)"
    assert eng.name == expected
    state = eng.init_state(None)
    for p in range(2):
        state = eng.run_pass(state, p)
    jax.block_until_ready(state)
    hist = eng.histogram(state)
    assert hist.sum() > 0
    stats = eng.stats(state)
    assert stats["samples"] > 0
    lane_steps = 4 * 2 * 128 * 8 * 128
    assert stats["classify_iters"] + stats["wasted_steps"] == lane_steps


def test_dp_host_replay_matches_device_replay():
    """The multi-device host-replay engine streams the same emission
    batches as device replay (same classify stream per ordinal), so
    orbit-point totals match exactly and the histograms agree
    statistically (f32 replay on both sides)."""
    from cudabrot_tpu.engines.pallas_engine import PallasEngine
    from cudabrot_tpu.io import native
    from cudabrot_tpu.parallel.data_parallel import (
        DataParallelEngine,
        DataParallelHostReplayEngine,
    )

    if not native.available():
        pytest.skip("native library not built")

    cfg = RenderConfig(
        canvas=Canvas(width=40, height=40),
        band=IterationBand(max_escape_iterations=60,
                           min_escape_iterations=5),
        options=EngineOptions(
            engine="pallas", lane_rows=8, steps_per_pass=256,
            steps_per_flush=16, replay_capacity=1 << 14, replay_chunk=64,
            num_devices=4,
        ),
    )

    dev = DataParallelEngine(cfg, PallasEngine(cfg, replay_mode="device"))
    dstate = dev.init_state(None)
    for p in range(2):
        dstate = dev.run_pass(dstate, p)
    jax.block_until_ready(dstate)
    dh = dev.histogram(dstate)
    dstats = dev.stats(dstate)

    host = DataParallelHostReplayEngine(
        cfg, PallasEngine(cfg, replay_mode="host")
    )
    hstate = host.init_state(None)
    for p in range(2):
        hstate = host.run_pass(hstate, p)
    jax.block_until_ready(hstate)
    hh = host.histogram(hstate)
    hstats = host.stats(hstate)

    assert hstats["replay"] == "host"
    assert dstats["replay"] == "device"
    assert hstats["samples"] == dstats["samples"]
    assert hstats["emitted"] == dstats["emitted"]
    # Same emissions => exactly the same number of replayed points.
    assert hstats["orbit_points"] == dstats["orbit_points"]
    assert hstats["on_canvas_points"] == hh.sum()
    assert abs(int(hh.sum()) - int(dh.sum())) <= 0.01 * dh.sum()


def test_dp_host_replay_resume_preserves_mass():
    from cudabrot_tpu.engines.pallas_engine import PallasEngine
    from cudabrot_tpu.io import native
    from cudabrot_tpu.parallel.data_parallel import (
        DataParallelHostReplayEngine,
    )

    if not native.available():
        pytest.skip("native library not built")

    cfg = RenderConfig(
        canvas=Canvas(width=24, height=24),
        band=IterationBand(max_escape_iterations=50,
                           min_escape_iterations=4),
        options=EngineOptions(
            engine="pallas", lane_rows=8, steps_per_pass=128,
            steps_per_flush=16, replay_capacity=1 << 12, replay_chunk=32,
            num_devices=4,
        ),
    )
    eng = DataParallelHostReplayEngine(
        cfg, PallasEngine(cfg, replay_mode="host")
    )
    hist0 = np.full(cfg.canvas.shape, 5, np.uint32)
    state = eng.init_state(hist0)
    state = eng.run_pass(state, 0)
    jax.block_until_ready(state)
    hist = eng.histogram(state)
    assert hist.min() >= 5


def test_dp_host_replay_hybrid_share_mass_conserved():
    """With a forced device-replay share, the multi-device host-replay
    engine must fold the device-replayed short-orbit mass into the
    final histogram (it previously returned only the worker accumulator,
    silently dropping the device share)."""
    from cudabrot_tpu.io import native

    if not native.available():
        import pytest

        pytest.skip("native replay library unavailable")
    from cudabrot_tpu.engines.pallas_engine import PallasEngine
    from cudabrot_tpu.parallel.data_parallel import (
        DataParallelHostReplayEngine,
    )

    def run(share):
        cfg = RenderConfig(
            canvas=Canvas(width=32, height=32),
            band=IterationBand(max_escape_iterations=60,
                               min_escape_iterations=5),
            options=EngineOptions(
                engine="pallas", lane_rows=8, steps_per_pass=256,
                steps_per_flush=16, replay_capacity=1 << 12,
                replay_chunk=32, num_devices=4,
                replay_device_share=share,
            ),
        )
        eng = DataParallelHostReplayEngine(
            cfg, PallasEngine(cfg, replay_mode="host")
        )
        state = eng.init_state(None)
        for p in range(4):
            state = eng.run_pass(state, p)
        jax.block_until_ready(state)
        return eng.histogram(state), eng.stats(state)

    h0, s0 = run(0.0)
    h1, s1 = run(0.5)
    assert s0["replay"] == "host"
    assert s1["replay"] == "hybrid"
    # Same seed -> identical emission stream; the split only reassigns
    # which backend replays each orbit, so total mass must agree (modulo
    # f32 binning drift between the two replay implementations).
    assert h1.sum() > 0 and h0.sum() > 0
    ratio = h1.sum() / h0.sum()
    assert 0.98 < ratio < 1.02, ratio
