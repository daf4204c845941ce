"""Machine-calibration plumbing: file round-trip, activation, and
consumption by the tuner's cost models (utils/calibration.py,
tools/calibrate.py)."""

import dataclasses

import pytest

from cudabrot_tpu.config import Canvas, EngineOptions, IterationBand, RenderConfig
from cudabrot_tpu.utils import calibration


@pytest.fixture(autouse=True)
def _restore_defaults():
    yield
    calibration.activate("")  # restore defaults after each test


def test_roundtrip_and_activate(tmp_path):
    cal = dataclasses.replace(
        calibration.DEFAULT,
        host_replay_dram_rate=1.23e8,
        step_cost_thin_threefry=(1e-12, 2e-11),
        source="test",
    )
    path = str(tmp_path / "cal.json")
    calibration.save(path, cal)
    loaded = calibration.load(path)
    assert loaded == cal
    active = calibration.activate(path)
    assert active.host_replay_dram_rate == 1.23e8
    assert calibration.active() is active
    assert calibration.activate("") is calibration.DEFAULT


def test_load_ignores_unknown_keys(tmp_path):
    path = tmp_path / "cal.json"
    path.write_text(
        '{"host_replay_dram_rate": 5e7, "probe_version": 3, '
        '"hostname": "x"}'
    )
    cal = calibration.load(str(path))
    assert cal.host_replay_dram_rate == 5e7
    # Untouched fields keep their defaults.
    assert cal.device_replay_rate == calibration.DEFAULT.device_replay_rate


def test_step_cost_mode_selection():
    cal = calibration.DEFAULT
    assert cal.step_cost(False, "threefry") == cal.step_cost_step
    assert cal.step_cost(True, "hardware") == cal.step_cost_thin_hardware
    assert cal.step_cost(True, "threefry") == cal.step_cost_thin_threefry


def test_tuning_consumes_calibrated_rates(tmp_path):
    """A calibration that says the host replay is extremely fast must
    drive the big-canvas auto device share to zero; one that says it is
    extremely slow must raise the share. This is the -27%-misfit lever
    the calibration exists for."""
    from cudabrot_tpu.engines.pallas_engine import Tuning

    cfg = RenderConfig(
        canvas=Canvas(width=20000, height=15000),
        band=IterationBand(max_escape_iterations=8000,
                           min_escape_iterations=1000),
        options=EngineOptions(engine="pallas"),
    )
    hist_bytes = cfg.canvas.histogram_nbytes
    assert hist_bytes >= (256 << 20)

    fast = dataclasses.replace(calibration.DEFAULT,
                               host_replay_dram_rate=1e12)
    slow = dataclasses.replace(calibration.DEFAULT,
                               host_replay_dram_rate=1e6)
    p_fast = str(tmp_path / "fast.json")
    p_slow = str(tmp_path / "slow.json")
    calibration.save(p_fast, fast)
    calibration.save(p_slow, slow)

    calibration.activate(p_fast)
    share_fast = Tuning(cfg).auto_device_share(hist_bytes)
    calibration.activate(p_slow)
    share_slow = Tuning(cfg).auto_device_share(hist_bytes)
    assert share_fast == 0.0
    assert share_slow > 0.5
