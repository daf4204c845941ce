"""Compute-engine registry.

An engine owns the jittable per-pass work (the analog of one DrawBuddhabrot
kernel launch, cudabrot.cu:485-486) and its device-resident state. The
driver (cudabrot_tpu.driver) is engine-agnostic: it only time-boxes passes,
handles signals/checkpoints, and reads the final histogram.
"""

from __future__ import annotations

from typing import Protocol

import numpy as np

from cudabrot_tpu.config import ConfigError, RenderConfig


class Engine(Protocol):
    name: str
    #: Approximate iteration steps executed per pass (for reporting).
    steps_per_pass: int

    def init_state(self, hist0: np.ndarray | None): ...

    def run_pass(self, state, pass_index: int): ...

    def histogram(self, state) -> np.ndarray: ...

    def stats(self, state) -> dict: ...


def make_engine(cfg: RenderConfig) -> Engine:
    import jax

    choice = cfg.options.engine
    if choice == "auto":
        # The Pallas engine is the production path everywhere (it runs in
        # interpreter mode off-TPU, which is slower than the oracle for
        # small jobs but exercises identical code).
        choice = "pallas" if jax.default_backend() == "tpu" else "oracle"
        if cfg.options.sampler == "mh":
            # MH chains live in the pallas kernel's lane state; the
            # oracle has no chain machinery.
            choice = "pallas"
    if cfg.options.sampler == "mh":
        if choice == "oracle":
            raise ConfigError(
                "--sampler mh runs on the pallas engine only (the MH "
                "chains live in the kernel's persistent lane state)"
            )
        if cfg.options.histogram_sharding == "rows":
            raise ConfigError(
                "--sampler mh is incompatible with row-sharded "
                "histograms (MH deposits scatter into a full per-device "
                "histogram replica; MH crops are small by construction "
                "— use the replicated layout)"
            )
        # Multi-process MH is supported: deposits and the tenure-tail
        # flush are on-device scatters of kernel-recorded bins
        # (PallasEngine.core / mh_tail_core run per device under
        # shard_map; nothing reads cross-process state).
    n = cfg.options.num_devices
    if n is None:
        n = len(jax.devices())

    if cfg.options.precision == "float64":
        # Honest precision support (the reference iterates in hardware
        # double, cudabrot.cu:321): the Pallas production kernel is
        # f32-only — measured statistically equivalent at production
        # scales (benchmarks/precision_study.md) — so float64 must either
        # run on the oracle engine with x64 actually enabled, or refuse.
        if choice == "pallas":
            raise ConfigError(
                "float64 iteration is not supported by the pallas engine "
                "(f32 is statistically equivalent at production scales; "
                "see benchmarks/precision_study.md). Use --engine oracle "
                "for exact double iteration."
            )
        # Without x64, jax silently demotes f64 arrays to f32 — the flag
        # would lie. This is process-global and must precede tracing.
        jax.config.update("jax_enable_x64", True)
    elif cfg.options.precision == "extended" and choice == "oracle":
        # The oracle runs extended (df32, ~2^-48) as float64, its strict
        # superset — it exists to be the deep-zoom ground truth the
        # pallas df32 engine is validated against (tests/test_extended).
        jax.config.update("jax_enable_x64", True)

    # Whether the multi-device path streams emissions to the native host
    # accumulator. Bound unconditionally: it is read below for every engine
    # choice, not just pallas.
    dp_host = False
    if choice == "oracle":
        from cudabrot_tpu.engines.oracle_engine import OracleEngine

        inner = OracleEngine(cfg)
    elif choice == "pallas":
        from cudabrot_tpu.io import native
        from cudabrot_tpu.engines.pallas_engine import PallasEngine

        # Multi-device: host replay (the fast accumulation path) when the
        # native library is present — including multi-process runs, where
        # every process feeds its own worker from its addressable payload
        # shards and the host histograms merge once at readback. Device
        # replay otherwise (the row-sharded engine does its scatter
        # on-device by design).
        if cfg.options.sampler == "mh":
            # MH deposits are on-device scatters; multi-device MH runs
            # the core() path (zero per-pass host traffic). The host
            # worker variant exists only for uint64 histograms or an
            # explicit --replay host.
            dp_host = (
                n > 1
                and cfg.options.histogram_sharding == "replicated"
                and (
                    cfg.options.hist_dtype == "uint64"
                    or cfg.options.replay == "host"
                )
                and native.available()
            )
        else:
            dp_host = (
                n > 1
                and cfg.options.histogram_sharding == "replicated"
                and cfg.options.replay in ("auto", "host")
                and native.available()
                # Extended payloads need the f64 native replay entry
                # points; without them multi-device extended runs
                # device replay.
                and (
                    cfg.options.precision != "extended"
                    or native.supports_f64()
                )
            )
        if n > 1 and not dp_host:
            inner = PallasEngine(cfg, replay_mode="device")
        elif n > 1:
            inner = PallasEngine(cfg, replay_mode="host")
        else:
            inner = PallasEngine(cfg)
    else:
        raise ValueError(f"Unknown engine {choice!r}")

    if n > 1:
        if (
            cfg.options.histogram_sharding == "rows"
            and choice == "pallas"
        ):
            from cudabrot_tpu.parallel.sharded_hist import (
                ShardedHistogramEngine,
            )

            return ShardedHistogramEngine(cfg, inner)
        from cudabrot_tpu.parallel.data_parallel import (
            DataParallelEngine,
            DataParallelHostReplayEngine,
        )

        if choice == "pallas" and dp_host:
            return DataParallelHostReplayEngine(cfg, inner)
        return DataParallelEngine(cfg, inner)
    return inner
