"""The jax.numpy oracle as a driver-compatible engine."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cudabrot_tpu.config import ConfigError, RenderConfig
from cudabrot_tpu.ops import oracle
from cudabrot_tpu.utils import counters

STAT_KEYS = (
    "samples", "culled", "in_band", "iters", "points", "wasted", "dropped",
)


class OracleEngine:
    """Vectorized pure-jnp sampler (cudabrot_tpu.ops.oracle). Correct on any
    backend; used as the test oracle and as a fallback engine."""

    name = "oracle"

    def __init__(self, cfg: RenderConfig):
        if cfg.options.hist_dtype != "uint32":
            raise ConfigError(
                "uint64 histograms are supported by the pallas engine's "
                "host-replay path only (the oracle accumulates on-device "
                "in uint32)."
            )
        self.cfg = cfg
        self.steps_per_pass = (
            cfg.options.oracle_samples_per_pass * cfg.band.max_escape_iterations
        )
        # Per-pass iteration/point totals are exact u64 pairs
        # (counters.u64_sum_i32), whose byte-split partial sums are exact
        # up to 2^24 elements — bound the batch size, not the product.
        if cfg.options.oracle_samples_per_pass > (1 << 24):
            raise ConfigError(
                "oracle_samples_per_pass must be at most 2^24 "
                "(per-pass stat summation bound); lower it or use the "
                "pallas engine"
            )
        #: Worst-case bound, not an exact count: samples that escape (or
        #: are culled) early execute fewer steps. The driver's progress
        #: line must not present it as a measured rate.
        self.steps_per_pass_exact = False
        self._pass_fn = jax.jit(
            functools.partial(self.core, ordinal=jnp.uint32(0)),
            donate_argnums=0,
        )

    def core(self, state, pass_index, ordinal):
        """Pure per-device pass body. ``ordinal`` is the device's position
        on the data-parallel mesh — it replaces the reference's per-thread
        cuRAND sequence ids (cudabrot.cu:148) as the independence mechanism
        between parallel samplers."""
        cfg = self.cfg
        base_key = jax.random.key(cfg.seed)
        key = jax.random.fold_in(
            jax.random.fold_in(base_key, ordinal), pass_index
        )
        hist, stats = oracle.render_pass(state["hist"], key, cfg)
        state = dict(state)
        state["hist"] = hist
        zero = jnp.uint32(0)
        per_pass = {
            "samples": (stats.samples, zero),
            "culled": (stats.culled, zero),
            "in_band": (stats.in_band, zero),
            "iters": stats.classify_iters,
            "points": stats.orbit_points,
            "wasted": stats.wasted_steps,
            "dropped": (stats.replay_dropped, zero),
        }
        for k in STAT_KEYS:
            state[k] = counters.u64_add_pair(state[k], per_pass[k])
        return state

    def memory_estimate(self) -> tuple[int, int]:
        cv = self.cfg.canvas
        hist = cv.num_pixels * 4
        batch = self.cfg.options.oracle_samples_per_pass * 40
        return hist + batch, hist + cv.num_pixels * 2

    def init_state(self, hist0: np.ndarray | None):
        shape = self.cfg.canvas.shape
        hist = (
            jnp.zeros(shape, jnp.uint32)
            if hist0 is None
            else jnp.asarray(hist0, jnp.uint32)
        )
        state = {"hist": hist}
        for k in STAT_KEYS:
            state[k] = counters.u64_zero()
        return state

    def run_pass(self, state, pass_index: int):
        return self._pass_fn(state, pass_index)

    def histogram(self, state) -> np.ndarray:
        return np.asarray(jax.device_get(state["hist"]), dtype=np.uint32)

    def stats(self, state) -> dict:
        vals = {k: counters.u64_value(state[k]) for k in STAT_KEYS}
        return {
            "samples": vals["samples"],
            "culled": vals["culled"],
            "in_band": vals["in_band"],
            "classify_iters": vals["iters"],
            "orbit_points": vals["points"],
            "wasted_steps": vals["wasted"],
            "replay_dropped": vals["dropped"],
        }
