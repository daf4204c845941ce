"""--sample-domain (restricted sample region, a TPU extension).

The reference always samples the full [-2,2]^2 domain (cudabrot.cu:392-393);
`RenderConfig.sample_domain` restricts it so deep crops regain refill-grid
density. These tests pin: config validation, CLI parsing, both engines
honoring the window (the oracle via jax.random.uniform bounds, the pallas
kernel via its independent 24-bit `_u32_to_domain` mapping), cross-engine
statistical equivalence on a restricted window, and checkpoint-measure
protection (mixing domains in one histogram is fatal).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import jax

from cudabrot_tpu import cli
from cudabrot_tpu.config import (
    SAMPLE_DOMAIN,
    Canvas,
    ConfigError,
    EngineOptions,
    IterationBand,
    RenderConfig,
)
from cudabrot_tpu.engines.oracle_engine import OracleEngine
from cudabrot_tpu.engines.pallas_engine import PallasEngine
from cudabrot_tpu.io import checkpoint
from cudabrot_tpu.ops import oracle as oracle_ops

DOMAIN = (-1.5, 0.5, -1.0, 1.0)


def _cfg(**kw):
    defaults = dict(
        canvas=Canvas(width=32, height=32),
        band=IterationBand(max_escape_iterations=50,
                           min_escape_iterations=3),
        options=EngineOptions(
            engine="pallas",
            lane_rows=8,
            steps_per_pass=256,
            steps_per_flush=16,
            replay_capacity=1 << 14,
            replay_chunk=64,
        ),
    )
    defaults.update(kw)
    return RenderConfig(**defaults)


def _run(engine, passes):
    state = engine.init_state(None)
    for p in range(passes):
        state = engine.run_pass(state, p)
    jax.block_until_ready(state)
    return engine.histogram(state), engine.stats(state)


# --- config validation ---------------------------------------------------


def test_default_is_reference_domain():
    assert RenderConfig().sample_domain == SAMPLE_DOMAIN


def test_domain_normalized_to_float_tuple():
    cfg = RenderConfig(sample_domain=[-1, 1, 0, 1])
    assert cfg.sample_domain == (-1.0, 1.0, 0.0, 1.0)
    assert isinstance(cfg.sample_domain, tuple)


@pytest.mark.parametrize(
    "dom",
    [
        (-1.0, 1.0, 0.0),  # wrong arity
        (1.0, -1.0, 0.0, 1.0),  # max_real <= min_real
        (-1.0, 1.0, 1.0, 1.0),  # max_imag <= min_imag
        (-1.0, float("inf"), 0.0, 1.0),
        (float("nan"), 1.0, 0.0, 1.0),
        "not-a-domain",
    ],
)
def test_invalid_domains_rejected(dom):
    with pytest.raises(ConfigError):
        RenderConfig(sample_domain=dom)


# --- CLI -----------------------------------------------------------------


def test_cli_parses_sample_domain():
    cfg, _ = cli.parse_args(["--sample-domain", "-1.5,0.5,-1,1"])
    assert cfg.sample_domain == (-1.5, 0.5, -1.0, 1.0)


def test_cli_default_sample_domain():
    cfg, _ = cli.parse_args([])
    assert cfg.sample_domain == SAMPLE_DOMAIN


@pytest.mark.parametrize(
    "raw", ["-1.5,0.5,-1", "-1.5,0.5,-1,1,2", "a,b,c,d", "1,-1,0,1"]
)
def test_cli_rejects_bad_sample_domain(raw):
    with pytest.raises(cli.CliError):
        cli.parse_args(["--sample-domain", raw])


# --- engines honor the window -------------------------------------------


def test_oracle_draws_stay_in_domain():
    key = jax.random.key(0)
    cr, ci = oracle_ops.draw_samples(key, 4096, jnp.float32, DOMAIN)
    cr, ci = np.asarray(cr), np.asarray(ci)
    assert cr.min() >= DOMAIN[0] and cr.max() < DOMAIN[1]
    assert ci.min() >= DOMAIN[2] and ci.max() < DOMAIN[3]
    # The window is actually used (not a vacuous subset of [-2,2]).
    assert cr.max() <= 0.5 and ci.min() >= -1.0


def test_pallas_emissions_seeded_in_domain():
    """Every compacted emission's seed c must lie inside the window — the
    kernel's 24-bit refill mapping honors the custom lo/span."""
    cfg = _cfg(sample_domain=DOMAIN)
    eng = PallasEngine(cfg, replay_mode="device")
    state = eng.init_state(None)
    seen = 0
    for p in range(6):
        state, (cr, ci, it, _, _) = eng._classify_and_compact(
            state, p, ordinal=jnp.uint32(0)
        )
        cr, ci, it = np.asarray(cr), np.asarray(ci), np.asarray(it)
        live = it >= 0
        seen += int(live.sum())
        assert np.all(cr[live] >= DOMAIN[0]) and np.all(cr[live] < DOMAIN[1])
        assert np.all(ci[live] >= DOMAIN[2]) and np.all(ci[live] < DOMAIN[3])
    assert seen > 0


def test_all_escaping_domain_is_all_in_band():
    """A window wholly outside |c| <= 2 escapes at index 0: with min=0
    every draw is in-band and none is culled — a sharp end-to-end check
    that the kernel samples the window and nothing else."""
    cfg = _cfg(
        sample_domain=(2.5, 3.0, 2.5, 3.0),
        band=IterationBand(max_escape_iterations=10,
                           min_escape_iterations=0),
    )
    _, stats = _run(PallasEngine(cfg, replay_mode="device"), 3)
    assert stats["culled"] == 0
    # Every real sample escapes in-band; the only non-in-band draw events
    # are each lane's initial-placeholder refill (dead lanes at window 1).
    lanes = cfg.options.lane_rows * 128
    assert stats["in_band"] > 0
    assert stats["samples"] - stats["in_band"] == lanes


def test_statistical_equivalence_on_restricted_domain():
    """Oracle and pallas implement the window mapping independently
    (jax.random.uniform vs the kernel's 24-bit grid); on the same window
    they must agree as distributions."""
    canvas = Canvas(width=32, height=32)
    band = IterationBand(max_escape_iterations=50, min_escape_iterations=3)

    ph, pstats = _run(
        PallasEngine(_cfg(canvas=canvas, band=band, sample_domain=DOMAIN),
                     replay_mode="device"),
        8,
    )
    ocfg = RenderConfig(
        canvas=canvas,
        band=band,
        sample_domain=DOMAIN,
        options=EngineOptions(engine="oracle",
                              oracle_samples_per_pass=1 << 15),
    )
    oh, ostats = _run(OracleEngine(ocfg), 8)

    p_band = pstats["in_band"] / (pstats["samples"] - pstats["culled"])
    o_band = ostats["in_band"] / (ostats["samples"] - ostats["culled"])
    assert abs(p_band / o_band - 1) < 0.05, (p_band, o_band)

    p = ph.astype(np.float64) / ph.sum()
    o = oh.astype(np.float64) / oh.sum()
    corr = np.corrcoef(p.ravel(), o.ravel())[0, 1]
    assert corr > 0.99, corr


def test_restriction_changes_the_render():
    """Restricting the window removes orbits seeded elsewhere — the
    histograms must differ from the full-domain render."""
    full, _ = _run(PallasEngine(_cfg(), replay_mode="device"), 3)
    sub, _ = _run(
        PallasEngine(_cfg(sample_domain=DOMAIN), replay_mode="device"), 3
    )
    assert not np.array_equal(full, sub)


# --- checkpoint measure protection --------------------------------------


def test_checkpoint_domain_round_trip(tmp_path):
    cfg = _cfg(sample_domain=DOMAIN)
    path = str(tmp_path / "ck.npz")
    hist = np.arange(32 * 32, dtype=np.uint32).reshape(32, 32)
    checkpoint.save(path, hist, cfg, passes=4)
    loaded, meta = checkpoint.load(path, cfg)
    np.testing.assert_array_equal(loaded, hist)
    assert tuple(meta["sample_domain"]) == DOMAIN


def test_checkpoint_domain_mismatch_fatal(tmp_path):
    path = str(tmp_path / "ck.npz")
    hist = np.zeros((32, 32), np.uint32)
    checkpoint.save(path, hist, _cfg(sample_domain=DOMAIN), passes=1)
    with pytest.raises(checkpoint.CheckpointError, match="domain"):
        checkpoint.load(path, _cfg())  # full-domain resume of a window ck
    with pytest.raises(checkpoint.CheckpointError, match="domain"):
        checkpoint.load(
            path, _cfg(sample_domain=(-1.0, 1.0, -1.0, 1.0))
        )


def test_legacy_checkpoint_means_full_domain(tmp_path):
    """Checkpoints written before the field existed (and reference raw
    dumps) are full-domain: resume works at the default, errors under a
    window."""
    cfg = _cfg()
    path = str(tmp_path / "legacy.raw")
    hist = np.zeros((32, 32), np.uint32)
    hist.tofile(path)  # reference raw-dump format (cudabrot.cu:218-246)
    loaded, _ = checkpoint.load(path, cfg)
    np.testing.assert_array_equal(loaded, hist)
    with pytest.raises(checkpoint.CheckpointError, match="domain"):
        checkpoint.load(path, _cfg(sample_domain=DOMAIN))


# --- tuning guardrails and overflow surfacing ----------------------------


def test_tuning_boost_capped_at_16x():
    """A tiny window must not collapse the pass geometry: the emission
    model boosts by at most 16x, so a 0.01-area window tunes identically
    to a 1.0-area window (both hit the cap). Measured rationale in
    engines/pallas_engine.Tuning."""
    from cudabrot_tpu.engines.pallas_engine import Tuning

    band = IterationBand(max_escape_iterations=5000,
                         min_escape_iterations=500)
    tiny = Tuning(RenderConfig(
        band=band, sample_domain=(-0.76, -0.66, 0.0, 0.1)))  # area 0.01
    unit = Tuning(RenderConfig(
        band=band, sample_domain=(-1.0, 0.0, 0.0, 1.0)))  # area 1.0
    assert tiny.steps_per_flush == unit.steps_per_flush
    assert tiny.steps_per_pass == unit.steps_per_pass
    assert tiny.replay_capacity == unit.replay_capacity
    # And the window still tunes tighter than the full domain.
    full = Tuning(RenderConfig(band=band))
    assert tiny.steps_per_flush <= full.steps_per_flush


def test_cli_replay_capacity_flag():
    cfg, _ = cli.parse_args(["--replay-capacity", "8192"])
    assert cfg.options.replay_capacity == 8192
    assert cfg.options.oracle_replay_capacity == 8192


def test_overflow_drop_warning():
    """Sustained emission-capacity overflow must be surfaced (the pallas
    drop keeps the longest orbits, so silence would hide a biased
    render)."""
    from cudabrot_tpu import driver

    cfg = RenderConfig(
        canvas=Canvas(width=24, height=24),
        band=IterationBand(max_escape_iterations=30,
                           min_escape_iterations=0),
        max_passes=3,
        seconds_to_run=-1.0,
        options=EngineOptions(
            engine="pallas",
            lane_rows=8,
            steps_per_pass=256,
            steps_per_flush=16,
            replay_capacity=128,  # far below the emission-heavy band rate
            replay_chunk=64,
            replay="device",
        ),
    )
    logs = []
    res = driver.run_render(cfg, log=logs.append)
    assert res.stats["replay_dropped"] > 0.01 * res.stats["in_band"]
    assert any("overflowed the emission capacity" in s for s in logs), logs
