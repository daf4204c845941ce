import pytest

from cudabrot_tpu.config import (
    Canvas,
    ConfigError,
    EngineOptions,
    IterationBand,
    RenderConfig,
)


def test_default_canvas_matches_reference_defaults():
    # SetDefaultCanvas (cudabrot.cu:530-543)
    c = Canvas()
    assert (c.width, c.height) == (1000, 1000)
    assert (c.min_real, c.max_real, c.min_imag, c.max_imag) == (
        -2.0,
        2.0,
        -2.0,
        2.0,
    )
    assert c.delta_real == pytest.approx(4.0 / 1000)
    assert c.delta_imag == pytest.approx(4.0 / 1000)
    assert c.shape == (1000, 1000)
    assert c.histogram_nbytes == 1000 * 1000 * 4


def test_default_render_config_matches_reference_defaults():
    # main (cudabrot.cu:763-772)
    cfg = RenderConfig()
    assert cfg.band.max_escape_iterations == 100
    assert cfg.band.min_escape_iterations == 20
    assert cfg.gamma == 1.0
    assert cfg.seconds_to_run == 10.0
    assert cfg.seed == 1337
    assert cfg.output_image == "output.pgm"
    assert cfg.inprogress_file is None
    assert cfg.device_index == 0


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(width=0),
        dict(width=-3),
        dict(height=0),
        dict(min_real=1.0, max_real=1.0),
        dict(min_real=2.0, max_real=-2.0),
        dict(min_imag=1.0, max_imag=0.5),
    ],
)
def test_invalid_canvas_rejected(kwargs):
    # RecomputePixelDeltas validation (cudabrot.cu:505-523)
    with pytest.raises(ConfigError):
        Canvas(**kwargs)


def test_non_square_canvas_deltas():
    c = Canvas(width=200, height=100, min_real=0.0, max_real=1.0,
               min_imag=0.0, max_imag=0.5)
    assert c.delta_real == pytest.approx(1.0 / 200)
    assert c.delta_imag == pytest.approx(0.5 / 100)


def test_band_validation():
    with pytest.raises(ConfigError):
        IterationBand(max_escape_iterations=0)
    with pytest.raises(ConfigError):
        IterationBand(min_escape_iterations=-1)
    # min >= max is permitted (renders nothing), matching the reference.
    IterationBand(max_escape_iterations=10, min_escape_iterations=10)


def test_engine_options_validation():
    with pytest.raises(ConfigError):
        EngineOptions(engine="nope").validate()
    with pytest.raises(ConfigError):
        EngineOptions(scatter="nope").validate()
    with pytest.raises(ConfigError):
        EngineOptions(steps_per_pass=100, steps_per_flush=33).validate()


def test_config_is_hashable_static_arg():
    cfg = RenderConfig()
    assert hash(cfg) == hash(RenderConfig())
    assert cfg.replace(gamma=2.0) != cfg


def test_steps_overflow_rejected():
    """Per-LANE step counts must fit int32 (kernel per-lane counters).
    Cross-lane per-pass totals have no uint32 ceiling anymore: they
    accumulate as exact u64 pairs (counters.u64_sum_i32), which is what
    allows dispatch-amortizing long passes."""
    with pytest.raises(ConfigError):
        EngineOptions(steps_per_pass=1 << 31).validate()
    # Large per-pass lane-step products are now legal.
    EngineOptions(lane_rows=128, steps_per_pass=1 << 18).validate()
    EngineOptions(lane_rows=64, steps_per_pass=(1 << 31) - 1).validate()


def test_refill_rng_modes():
    import pytest

    from cudabrot_tpu.config import ConfigError, EngineOptions

    for ok in ("threefry", "hardware", "hardware_rw"):
        EngineOptions(refill_rng=ok).validate()
    with pytest.raises(ConfigError):
        EngineOptions(refill_rng="xorshift").validate()


def test_interpret_mode_forces_threefry_refills():
    """Hardware PRNG modes are TPU-only (the interpreter stubs the
    generator to zeros); off-TPU the engine must resolve them to the
    threefry stream so CPU runs stay meaningful."""
    from cudabrot_tpu.config import Canvas, EngineOptions, IterationBand, RenderConfig
    from cudabrot_tpu.engines.pallas_engine import PallasEngine

    for mode in ("hardware", "hardware_rw"):
        cfg = RenderConfig(
            canvas=Canvas(width=16, height=16),
            band=IterationBand(max_escape_iterations=40,
                               min_escape_iterations=4),
            options=EngineOptions(
                engine="pallas", lane_rows=8, steps_per_pass=64,
                steps_per_flush=16, replay_capacity=1 << 10,
                replay_chunk=16, refill_rng=mode,
            ),
        )
        eng = PallasEngine(cfg)  # interpret on CPU
        assert eng.refill_rng == "threefry"
