"""Canvas emit filter (--emit-filter canvas): replay only orbits whose
trajectory entered the canvas window.

The core invariant: gating does not change the rendered measure. Orbits
that never visit the canvas deposit zero mass, so a gated render must be
BITWISE identical to the ungated render at the same seed (given ample
replay capacity so neither run drops) — the gate only skips replay work.
The reference has no analog (it renders the full domain onto a
full-domain canvas; crops pay full replay cost, cudabrot.cu:302-314)."""

import jax
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
from cudabrot_tpu.engines.pallas_engine import PallasEngine

# A crop over the seahorse-valley region: most full-domain orbits never
# enter it, so the gate has real selectivity.
_CROP = Canvas(
    width=40, height=40,
    min_real=-0.78, max_real=-0.72, min_imag=0.05, max_imag=0.11,
)
_BAND = IterationBand(max_escape_iterations=300, min_escape_iterations=20)


def _run(engine, passes):
    state = engine.init_state(None)
    for p in range(passes):
        state = engine.run_pass(state, p)
    jax.block_until_ready(state)
    return engine.histogram(state), engine.stats(state)


def _pallas_opts(emit_filter, replay="device", **kw):
    return EngineOptions(
        engine="pallas",
        emit_filter=emit_filter,
        replay=replay,
        lane_rows=8,
        steps_per_pass=512,
        steps_per_flush=32,
        replay_capacity=1 << 14,  # ample: no drops in either run
        replay_chunk=64,
        **kw,
    )


def test_validation():
    EngineOptions(emit_filter="canvas").validate()
    with pytest.raises(ConfigError, match="emit filter"):
        EngineOptions(emit_filter="window").validate()
    with pytest.raises(ConfigError, match="thin"):
        EngineOptions(
            emit_filter="canvas", escape_tracking="step"
        ).validate()


def test_pallas_gated_bitwise_equals_ungated():
    """Device replay re-executes the classify trajectory, so the gate is
    exactly mass-preserving (measured here: 19x fewer emissions at
    identical histograms)."""
    base = dict(canvas=_CROP, band=_BAND)
    h_any, s_any = _run(
        PallasEngine(RenderConfig(options=_pallas_opts("any"), **base)), 4
    )
    h_gate, s_gate = _run(
        PallasEngine(RenderConfig(options=_pallas_opts("canvas"), **base)), 4
    )
    assert s_any["replay_dropped"] == 0 and s_gate["replay_dropped"] == 0
    assert h_any.sum() > 0
    np.testing.assert_array_equal(h_gate, h_any)
    # The gate must actually select: fewer emissions, same samples.
    assert s_gate["samples"] == s_any["samples"]
    assert 0 < s_gate["emitted"] < s_any["emitted"]
    # Replay work drops by the non-visitor share.
    assert s_gate["orbit_points"] < s_any["orbit_points"]


def test_pallas_gated_host_replay_statistically_identical():
    """The native host replay recomputes trajectories with its own FMA
    contraction, so long chaotic orbits can decorrelate from the kernel
    (the documented replay class, ops/oracle.replay_into) — a borderline
    non-visitor may deposit a few edge points the gate skipped. Measured
    6 counts of 384 on this configuration; bound it at 2%."""
    base = dict(canvas=_CROP, band=_BAND)
    h_any, s_any = _run(
        PallasEngine(
            RenderConfig(options=_pallas_opts("any", replay="host"), **base)
        ),
        4,
    )
    h_gate, _ = _run(
        PallasEngine(
            RenderConfig(
                options=_pallas_opts("canvas", replay="host"), **base
            )
        ),
        4,
    )
    diff = np.abs(
        h_any.astype(np.int64) - h_gate.astype(np.int64)
    ).sum()
    assert diff <= max(2, 0.02 * h_any.sum()), (diff, h_any.sum())


def test_oracle_gated_bitwise_equals_ungated():
    def ocfg(emit_filter):
        return RenderConfig(
            canvas=_CROP,
            band=_BAND,
            options=EngineOptions(
                engine="oracle",
                emit_filter=emit_filter,
                oracle_samples_per_pass=1 << 14,
                oracle_replay_capacity=1 << 14,
            ),
        )

    h_any, s_any = _run(OracleEngine(ocfg("any")), 3)
    h_gate, s_gate = _run(OracleEngine(ocfg("canvas")), 3)
    assert h_any.sum() > 0
    np.testing.assert_array_equal(h_gate, h_any)
    assert 0 < s_gate["in_band"] < s_any["in_band"]


def test_extended_gated_bitwise_equals_ungated():
    """The df32 kernel's gate: same invariant on a deep-zoom canvas. The
    device replay IS the classify trajectory (df32), so the inflated
    window can only add harmless false positives."""
    win = (-0.75 - 5e-7, -0.75 + 5e-7, 0.055 - 5e-7, 0.055 + 5e-7)
    # Canvas crops a corner of the plane the orbits pass through.
    canvas = Canvas(
        width=32, height=32,
        min_real=-2.0, max_real=0.0, min_imag=0.0, max_imag=2.0,
    )
    base = dict(
        canvas=canvas,
        band=IterationBand(max_escape_iterations=400,
                           min_escape_iterations=20),
        sample_domain=win,
    )

    def opts(emit_filter):
        return EngineOptions(
            engine="pallas",
            precision="extended",
            emit_filter=emit_filter,
            replay="device",
            lane_rows=8,
            steps_per_pass=512,
            steps_per_flush=32,
            replay_capacity=1 << 14,
            replay_chunk=64,
        )

    h_any, s_any = _run(
        PallasEngine(RenderConfig(options=opts("any"), **base)), 3
    )
    h_gate, s_gate = _run(
        PallasEngine(RenderConfig(options=opts("canvas"), **base)), 3
    )
    assert s_any["replay_dropped"] == 0 and s_gate["replay_dropped"] == 0
    assert h_any.sum() > 0
    np.testing.assert_array_equal(h_gate, h_any)
    assert s_gate["emitted"] <= s_any["emitted"]


def test_cli_emit_filter(tmp_path):
    from cudabrot_tpu import cli

    out = tmp_path / "crop.pgm"
    rc = cli.main(
        [
            "-w", "24", "-h", "24", "-m", "120", "-c", "10",
            "--min-real", "-0.78", "--max-real", "-0.72",
            "--min-imag", "0.05", "--max-imag", "0.11",
            "--passes", "1", "-t", "-1",
            "--engine", "oracle", "--emit-filter", "canvas",
            "-o", str(out),
        ]
    )
    assert rc == 0
    assert out.read_bytes().startswith(b"P5\n24 24\n65535\n")
