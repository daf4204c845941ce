"""Host render loop: time-boxing, cancellation, checkpointing, lifecycle.

This is the TPU-native rebuild of the reference's L4 layer — RenderImage
(cudabrot.cu:471-501), SignalHandler (cudabrot.cu:756-760), and the
lifecycle sequencing in main (cudabrot.cu:762-791):

  * the histogram (and all engine lane state) stays device-resident across
    passes via buffer donation — the only D2H transfer is the final (or
    periodic-checkpoint) readback, exactly like the single cudaMemcpy after
    the loop at cudabrot.cu:496;
  * time is checked only between passes, and a negative time box runs until
    SIGINT (cudabrot.cu:483-492);
  * SIGINT sets a flag and the current pass completes before a normal
    save/exit (cudabrot.cu:756-760, 483);
  * JAX dispatch is asynchronous, so the loop can keep `pipeline_depth`
    passes in flight instead of synchronizing after each one (the reference
    must cudaDeviceSynchronize every launch, cudabrot.cu:487) — host
    turnaround never idles the chip;
  * checkpoints can be written every N passes (the reference only writes at
    exit and can lose hours to a crash, SURVEY.md §3.3).
"""

from __future__ import annotations

import dataclasses
import signal
import time
from typing import Callable

import jax
import numpy as np

from cudabrot_tpu import engines
from cudabrot_tpu.config import RenderConfig
from cudabrot_tpu.io import checkpoint as ckpt


@dataclasses.dataclass
class RenderResult:
    histogram: np.ndarray  # uint32 (H, W)
    passes: int
    elapsed_seconds: float
    stats: dict
    engine_name: str
    interrupted: bool


class SigintFlag:
    """Cooperative-cancellation flag (SignalHandler, cudabrot.cu:756-760)."""

    def __init__(self, log: Callable[[str], None]):
        self._log = log
        self.triggered = False
        self._previous = None

    def _handler(self, signum, frame):
        self.triggered = True
        self._log(
            f"Signal {signum} received, waiting for current pass to finish..."
        )

    def __enter__(self):
        try:
            self._previous = signal.signal(signal.SIGINT, self._handler)
        except ValueError:  # non-main thread: run uninterruptible
            self._previous = None
        return self

    def __exit__(self, *exc):
        if self._previous is not None:
            signal.signal(signal.SIGINT, self._previous)
        return False


def _write_preview(cfg: RenderConfig, hist: np.ndarray) -> None:
    """Tone-map and save an in-progress preview (atomic via tmp+rename so
    a watcher never reads a torn file)."""
    import os
    import tempfile

    import jax.numpy as jnp

    from cudabrot_tpu.io import png as png_io
    from cudabrot_tpu.ops import tonemap as tonemap_op

    mapped = tonemap_op.tonemap_hist(hist, cfg.gamma)
    image = np.asarray(jax.device_get(mapped.image))
    directory = os.path.dirname(os.path.abspath(cfg.preview_file)) or "."
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".png.tmp")
    os.close(fd)
    try:
        png_io.write_png(tmp, image)
        os.replace(tmp, cfg.preview_file)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def _warn_calibration_drift(cfg: RenderConfig, engine, log) -> None:
    """One-line warning when a measured rate deviates >=2x from the cost
    model feeding the tuner (utils.calibration). The cleanly observable
    model input is the native host replay rate — it directly sizes the
    big-canvas hybrid device share, where a misfit measured -27%
    (benchmarks/PERF_NOTES.md). Classify-time drift is not separable
    here: the pass wall overlaps device classify with host replay and
    transfer by design."""
    from cudabrot_tpu.utils import calibration

    worker = getattr(engine, "_worker", None) or getattr(
        getattr(engine, "inner", None), "_worker", None
    )
    if worker is None:
        return
    # Need enough work for a stable rate estimate.
    if worker.points < 1_000_000 or worker.replay_seconds < 0.5:
        return
    cal = calibration.active()
    hist_bytes = cfg.canvas.histogram_nbytes
    if hist_bytes < (256 << 20):
        # Sub-DRAM canvases never get a hybrid device share, so a rate
        # misfit there has no tuning consequence — and the LLC-regime
        # rate legitimately varies ~3x with orbit length (per-orbit
        # setup amortization), which would make a fixed threshold noisy.
        return
    # host_replay_dram_rate is the worker's *effective* rate as
    # configured (tools/calibrate.py measures with the same auto thread
    # count the worker resolves), so no per-thread scaling here.
    expected = cal.host_replay_dram_rate
    observed = worker.points / worker.replay_seconds
    ratio = observed / expected
    if 0.5 < ratio < 2.0:
        return
    log(
        f"Calibration drift: host replay measured {observed:.2e} pts/s vs "
        f"the model's {expected:.2e} (DRAM regime, x{ratio:.2f}). "
        "Auto-tuned replay shares may be mis-sized on this machine — run "
        "tools/calibrate.py and pass --calibration (or set "
        "CUDABROT_TPU_CALIBRATION)."
    )


def resolve_pipeline_depth(cfg: RenderConfig, engine) -> int:
    """In-flight pass budget: every block_until_ready is a tunnel
    round-trip (~20 ms of an ~85 ms default-band pass), so worker-less
    (pure device-replay) engines run deep (8; r5 sweep measured depth
    2 -> 8 as 2.72 -> 3.26e9 it/s at the default band). Engines with a
    host worker keep the shallow cadence: the worker's payload fetch
    piggybacks on the block cadence, and 8 in-flight passes would let
    the emission queue run ahead of the accumulator."""
    if cfg.options.pipeline_depth > 0:
        return cfg.options.pipeline_depth
    return 8 if getattr(engine, "replay_mode", None) == "device" else 2


def run_render(
    cfg: RenderConfig,
    engine: engines.Engine | None = None,
    log: Callable[[str], None] = print,
) -> RenderResult:
    """Execute a full render job: resume -> pass loop -> final readback.

    Mirrors the main() sequence LoadInProgressBuffer -> RenderImage ->
    SaveInProgressBuffer (cudabrot.cu:783-785); image tone-mapping/encoding
    is left to the caller (cudabrot_tpu.cli) so library users get the raw
    histogram.
    """
    from cudabrot_tpu.utils import jaxcache

    jaxcache.enable()
    engine = engine or engines.make_engine(cfg)

    hist0 = None
    resumed_passes = 0
    if cfg.inprogress_file:
        log(f"Loading previous image state from {cfg.inprogress_file}.")
        loaded = ckpt.load(cfg.inprogress_file, cfg)
        if loaded is None:
            log(f"File {cfg.inprogress_file} doesn't exist yet. Not loading.")
        else:
            hist0, meta = loaded
            resumed_passes = int(meta.get("passes", 0))

    # Memory estimate banner (SetupCUDA parity, cudabrot.cu:154-165).
    estimate = getattr(engine, "memory_estimate", None)
    if estimate is not None:
        device_bytes, host_bytes = estimate()
        log(
            f"Approximate memory needed: "
            f"{device_bytes / (1024.0 * 1024.0):.3f} MiB device, "
            f"{host_bytes / (1024.0 * 1024.0):.3f} MiB host"
        )

    state = engine.init_state(hist0)
    warmup = getattr(engine, "warmup", None)
    if warmup is not None:
        warmup(state)

    log("Calculating Buddhabrot.")
    if cfg.seconds_to_run < 0:
        log("Press ctrl+C to finish.")
    else:
        log(f"Running for {cfg.seconds_to_run:.3f} seconds.")

    if cfg.profile_dir:
        jax.profiler.start_trace(cfg.profile_dir)

    # Multi-process runs (parallel.distributed): every process executes
    # the same collective pass sequence; the primary takes the stop
    # decision (its clock / its SIGINT) and broadcasts it so nobody
    # diverges out of the SPMD program.
    multiproc = jax.process_count() > 1
    primary = jax.process_index() == 0
    if multiproc:
        from cudabrot_tpu.parallel import distributed

    depth = resolve_pipeline_depth(cfg, engine)
    passes = 0
    interrupted = False
    start = time.monotonic()
    last_progress = start
    with SigintFlag(log) as flag:
        while True:
            stop = flag.triggered
            if cfg.max_passes is not None and passes >= cfg.max_passes:
                stop = True
            if (
                passes > 0
                and cfg.seconds_to_run >= 0
                and (time.monotonic() - start) > cfg.seconds_to_run
            ):
                stop = True
            if multiproc:
                # Primary contributes the full verdict (its clock owns the
                # time box); non-primaries contribute their local SIGINT so
                # ctrl+C on any process stops the whole render.
                stop = distributed.any_flag(
                    stop if primary else flag.triggered
                )
            if stop:
                break
            state = engine.run_pass(state, resumed_passes + passes)
            passes += 1
            if passes % depth == 0:
                jax.block_until_ready(state)
            now = time.monotonic()
            if (
                cfg.progress_interval > 0
                and now - last_progress >= cfg.progress_interval
            ):
                steps = getattr(engine, "steps_per_pass", 0) * passes
                # Oracle passes early-exit, so steps_per_pass is an upper
                # bound there — label the rate honestly.
                mark = (
                    "~"
                    if getattr(engine, "steps_per_pass_exact", True)
                    else "<="
                )
                log(
                    f"  pass {passes}: {now - start:.1f}s elapsed"
                    + (
                        f", {mark}{steps / (now - start):.3e} lane-steps/s"
                        if steps
                        else ""
                    )
                )
                last_progress = now
            if (
                cfg.checkpoint_interval > 0
                and passes % cfg.checkpoint_interval == 0
                and (cfg.inprogress_file or cfg.preview_file)
            ):
                # engine.histogram is a collective in multi-process runs:
                # every process computes it, only the primary writes.
                snapshot = engine.histogram(state)
                if primary and cfg.inprogress_file:
                    ckpt.save(
                        cfg.inprogress_file,
                        snapshot,
                        cfg,
                        resumed_passes + passes,
                    )
                if primary and cfg.preview_file:
                    _write_preview(cfg, snapshot)
        interrupted = flag.triggered

    if cfg.profile_dir:
        jax.profiler.stop_trace()

    jax.block_until_ready(state)
    elapsed = time.monotonic() - start
    hist = engine.histogram(state)
    log(f"{passes} Buddhabrot passes took {elapsed:f} seconds.")
    _warn_calibration_drift(cfg, engine, log)
    stats = engine.stats(state)
    dropped = int(stats.get("replay_dropped", 0))
    in_band = int(stats.get("in_band", 0))
    if dropped > 0.01 * max(in_band, 1):
        # Overflow thinning is UNBIASED since r5 (the kept subset is
        # selected by a uniform key, engines/pallas_engine
        # _classify_and_compact), so sustained overflow costs render
        # efficiency — samples classified but never deposited — not
        # statistical correctness. Surface it anyway: the capacity
        # auto-sizing carries 16x headroom, so sustained overflow means
        # the band/window defeated the rate model.
        log(
            f"Warning: {dropped} of {in_band} in-band samples overflowed "
            "the emission capacity and were dropped (unbiased thinning; "
            "wasted classify work). Raise --replay-capacity or shrink "
            "the --sample-domain window."
        )
    lost_w = int(stats.get("mh_lost_weight", 0))
    if lost_w > 0:
        deposited = int(stats.get("on_canvas_points", 0))
        if lost_w > 0.02 * max(deposited + lost_w, 1):
            # Replay trajectories that deposit nothing forfeit their
            # tenure mass — only the borderline kernel/replay drift
            # class should ever land here.
            log(
                f"Warning: {lost_w} units of MH tenure mass found no "
                "on-canvas points at replay (trajectory-drift class); "
                "if this grows, the band/crop combination is degenerate."
            )

    if cfg.inprogress_file and primary:
        log(f"Saving in-progress buffer to {cfg.inprogress_file}.")
        ckpt.save(cfg.inprogress_file, hist, cfg, resumed_passes + passes)

    return RenderResult(
        histogram=hist,
        passes=passes,
        elapsed_seconds=elapsed,
        stats=stats,
        engine_name=engine.name,
        interrupted=interrupted,
    )
