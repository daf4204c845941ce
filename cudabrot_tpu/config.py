"""Render configuration: canvas geometry, iteration bands, engine options.

Reference parity: `Canvas` mirrors `FractalDimensions` (cudabrot.cu:46-58)
with the delta math and validation of `RecomputePixelDeltas`
(cudabrot.cu:505-527) and the defaults of `SetDefaultCanvas`
(cudabrot.cu:530-543). `IterationBand` mirrors `IterationControl`
(cudabrot.cu:62-67) with the defaults set in `main` (cudabrot.cu:765-766).
Unlike the reference's mutable global struct `g` (cudabrot.cu:70-101), all
configuration here is immutable, hashable (usable as a static jit argument),
and threaded explicitly through the driver.
"""

from __future__ import annotations

import dataclasses


class ConfigError(ValueError):
    """Raised when a canvas/band/engine setting is invalid."""


#: Samples are drawn uniformly from this fixed region of the complex
#: plane regardless of the output canvas (reference behavior: cudabrot.cu:392-393
#: and the PrintUsage note at cudabrot.cu:606-609). (min_real, max_real,
#: min_imag, max_imag). A TPU extension (`RenderConfig.sample_domain`,
#: CLI `--sample-domain`) lets a render restrict the sampled region — see
#: that field's docstring for the semantics.
SAMPLE_DOMAIN = (-2.0, 2.0, -2.0, 2.0)


@dataclasses.dataclass(frozen=True)
class Canvas:
    """Output-image geometry: pixel dimensions plus complex-plane bounds.

    The canvas only crops/locates the output; it never changes what is
    sampled (see SAMPLE_DOMAIN). Row 0 of the image corresponds to
    ``min_imag`` — the same orientation the reference produces
    (cudabrot.cu:309-312 maps imag->row directly, and PGM row 0 is the top
    of the image).
    """

    width: int = 1000
    height: int = 1000
    min_real: float = -2.0
    max_real: float = 2.0
    min_imag: float = -2.0
    max_imag: float = 2.0

    def __post_init__(self) -> None:
        self.validate()

    def validate(self) -> None:
        # Error messages mirror RecomputePixelDeltas (cudabrot.cu:505-523).
        if self.width <= 0:
            raise ConfigError("Output width must be positive.")
        if self.height <= 0:
            raise ConfigError("Output height must be positive.")
        if self.max_real <= self.min_real:
            raise ConfigError(
                "Maximum real value must be greater than minimum real value."
            )
        if self.max_imag <= self.min_imag:
            raise ConfigError(
                "Maximum imaginary value must be greater than minimum "
                "imaginary value."
            )

    @property
    def delta_real(self) -> float:
        """Complex-plane distance between horizontally adjacent pixels
        (cudabrot.cu:525)."""
        return (self.max_real - self.min_real) / float(self.width)

    @property
    def delta_imag(self) -> float:
        """Complex-plane distance between vertically adjacent pixels
        (cudabrot.cu:524)."""
        return (self.max_imag - self.min_imag) / float(self.height)

    @property
    def shape(self) -> tuple[int, int]:
        """Histogram/image array shape, (height, width)."""
        return (self.height, self.width)

    @property
    def num_pixels(self) -> int:
        return self.width * self.height

    @property
    def histogram_nbytes(self) -> int:
        """Size of the uint32 accumulation buffer in bytes
        (GetImageBufferSize, cudabrot.cu:105-108)."""
        return self.num_pixels * 4


@dataclasses.dataclass(frozen=True)
class IterationBand:
    """Escape-iteration filter: only orbits escaping within
    [min_escape_iterations, max_escape_iterations) are recorded
    (cudabrot.cu:407-408)."""

    max_escape_iterations: int = 100
    min_escape_iterations: int = 20

    def __post_init__(self) -> None:
        self.validate()

    def validate(self) -> None:
        if self.max_escape_iterations <= 0:
            raise ConfigError("Max escape iterations must be positive.")
        if self.max_escape_iterations >= (1 << 24):
            # Engine invariant: escape indices must be exactly
            # representable in float32 transport (and a single interior
            # sample at this setting would iterate for hours anyway; the
            # reference warns above 60000, cudabrot.cu:692-695).
            raise ConfigError(
                "Max escape iterations must be below 16777216."
            )
        if self.min_escape_iterations < 0:
            raise ConfigError("Min escape iterations must be non-negative.")
        # The reference does not reject min >= max (it just renders nothing);
        # we keep that permissiveness for CLI parity.


@dataclasses.dataclass(frozen=True)
class EngineOptions:
    """Tuning knobs for the compute engines (the TPU analog of
    DEFAULT_BLOCK_SIZE/DEFAULT_BLOCK_COUNT/SAMPLES_PER_THREAD,
    cudabrot.cu:19-34).

    One engine "pass" is the unit of host-side time-boxing and signal
    responsiveness, exactly like one kernel launch in the reference
    (cudabrot.cu:483-492).
    """

    #: Engine implementation: "oracle" (pure jax.numpy, the correctness
    #: reference), "pallas" (the TPU production kernel), or "auto".
    engine: str = "auto"
    #: Number of persistent sampler lanes in the Pallas engine, expressed as
    #: rows of 128 lanes (lanes = rows * 128).
    lane_rows: int = 64
    #: Total iteration steps each lane executes per pass; 0 = auto-tune
    #: from the iteration band (pass sized to amortize dispatch overhead).
    steps_per_pass: int = 0
    #: Steps between emission-buffer flushes inside the kernel (the window in
    #: which at most one in-band sample per lane can be queued); 0 =
    #: auto-tune from the band's expected emission rate.
    steps_per_flush: int = 0
    #: Samples per pass for the oracle engine.
    oracle_samples_per_pass: int = 1 << 16
    #: Oracle replay-batch capacity (in-band samples compacted before the
    #: bounded replay loop, mirroring the reference's two-pass structure);
    #: 0 = auto from the escape-time tail model with 16x headroom.
    oracle_replay_capacity: int = 0
    #: Capacity of the compacted replay batch (lanes in the replay phase);
    #: 0 = auto-size from the iteration band.
    replay_capacity: int = 0
    #: Replay steps executed per scatter flush; 0 = auto (256 on
    #: LLC-resident canvases — low chunk-tail sentinel waste; 1024 on
    #: big canvases, where scatter-call overhead dominates the device
    #: replay and bigger calls measured +41% — benchmarks/PERF_NOTES.md).
    replay_chunk: int = 0
    #: Lanes per device-replay block (one scatter call per block-chunk
    #: pair); 0 = auto (1024 — short bands pay one scatter call per 128
    #: steps at that width; bigger blocks trade within-block length
    #: homogeneity for fewer calls). Must be a multiple of 128.
    replay_block: int = 0
    #: Classify-kernel inner window: orbit updates between boundary
    #: (refill/emission) passes. 0 = auto. Larger windows shorten the
    #: instruction stream but let finished lanes coast to the window edge.
    inner_unroll: int = 0
    #: Refill-randomness source for the classify kernel: "threefry"
    #: (in-kernel counter-based Threefry-2x32 — unbiased, identical on
    #: CPU and TPU), "hardware_rw" (hardware generator re-seeded every
    #: window from splitmix32(seed, global window index) — measured
    #: statistically indistinguishable from threefry, ~19% faster at
    #: classify-bound bands, TPU-only; PERF_NOTES.md "hardware_rw"), or
    #: "hardware" (free-running pltpu.prng_random_bits — its deep-
    #: iteration-tail sampling is measurably biased; see PERF_NOTES.md
    #: "PRNG stream separation"). Interpret mode always uses threefry.
    refill_rng: str = "threefry"
    #: Classify-kernel escape bookkeeping: "step" tracks the escape index
    #: with per-step masks (and checks Brent cycles every step); "thin"
    #: counts surviving steps and recovers the index at the window
    #: boundary (cycle checks move to boundaries too — escape is a point
    #: of no return for this dynamics, see pallas_kernels._make_kernel),
    #: cutting the inner instruction stream by roughly a third. "auto"
    #: uses thin tracking.
    escape_tracking: str = "auto"
    #: Emission filter: "any" (every band-passing orbit is emitted —
    #: reference semantics) or "canvas" (emit only orbits whose
    #: trajectory entered the canvas window during classification). For
    #: a canvas that crops the plane, orbits that never visit contribute
    #: zero histogram mass but dominate replay/payload cost under
    #: full-domain sampling; gating drops exactly those orbits, so the
    #: rendered histogram is the SAME MEASURE as an ungated run (bitwise
    #: at ample capacity, asserted in tests) at a fraction of the replay
    #: work. This is the honest way to render a crop of the full
    #: Buddhabrot — --sample-domain restricts the seeded measure instead
    #: (not a plain crop; see its help text).
    emit_filter: str = "any"
    #: Sample-selection strategy: "uniform" (independent uniform draws
    #: over the sample domain — reference semantics, cudabrot.cu:392-393)
    #: or "mh" (Metropolis-Hastings importance sampling, Boswell's
    #: MH-Buddhabrot: per-lane Markov chains over c with stationary
    #: density proportional to the number of orbit points each sample
    #: deposits on the canvas window, contributions re-weighted by 1/v so
    #: the rendered measure is the uniform one — see
    #: ops/pallas_kernels_mh.py). MH restores signal on deep crops where
    #: uniform sampling starves (hit mass falls with window area);
    #: histograms are accumulated in fixed-point 1/256-count units
    #: (weight_scale, recorded in checkpoints). Pallas engine + host
    #: replay only.
    sampler: str = "uniform"
    #: MH uniform-restart mixture weight in 1/256ths (probability a
    #: proposal is a fresh global draw instead of a local multi-scale
    #: mutation). 16 = 1/16.
    mh_restart: int = 16
    #: MH tenure batching cap: a chain state retained this many steps is
    #: force-emitted so end-of-render truncation stays bounded. Bounded
    #: <= 32767 so the integer deposit arithmetic stays u32-exact on
    #: device (ops/binning.mh_deposit_weights documents the bounds).
    mh_rep_cap: int = 4096
    #: Passes whose emissions are discarded as chain burn-in before
    #: deposits begin (the chains still advance during them).
    mh_burnin_passes: int = 1
    #: MH visit-bin reservoir width: the kernel records up to this many
    #: canvas bins per tenure (a uniform reservoir subsample of ALL the
    #: orbit's visits when it exceeds the width — full mass either way,
    #: the subsample is purely a variance knob). Power of two in [2,32].
    mh_visit_slots: int = 8
    #: Brent cycle detection for interior orbits (pallas engine). Disable
    #: for bitwise escape-count parity experiments with the reference,
    #: which always iterates interior points to the cap (cudabrot.cu:338).
    cycle_detection: bool = True
    #: Histogram scatter backend: "xla" (scatter-add), "pallas" (Mosaic
    #: RMW kernel, VMEM-resident histograms only), "bigtiles" (sort +
    #: tile-streaming Mosaic RMW — the >VMEM device-accumulation path),
    #: "sorted" (sort + run-length collapse + sorted scatter-add;
    #: measured no faster than xla — kept for A/B), or "auto". (A
    #: sort+searchsorted backend was measured dead and removed; see
    #: ops/binning.py.)
    scatter: str = "auto"
    #: Orbit replay execution: "device" (on-accelerator, multi-chip
    #: capable), "host" (native C++ engine overlapped with classification
    #: — see csrc/tpubrot_native.cpp), or "auto" (host when the native
    #: library is available and the run is single-device).
    replay: str = "auto"
    #: In host-replay mode, fraction of the compacted batch replayed on
    #: the device *concurrently* with the host worker (the longest orbits,
    #: since the batch is length-sorted). Negative = auto (tuned so both
    #: sides finish together).
    replay_device_share: float = -1.0
    #: Threads for the native host replay engine (per-thread private
    #: histograms merged serially, csrc/tpubrot_native.cpp). 0 = auto
    #: (one thread per available core, cgroup/affinity-aware).
    replay_threads: int = 0
    #: Iteration arithmetic: "float32" (production default — statistically
    #: equivalent to the reference's hardware double at full-set scales,
    #: benchmarks/precision_study.md), "float64" (oracle engine only;
    #: exact double like cudabrot.cu:321), or "extended" (double-float
    #: hi+lo f32 pairs, ~2^-48 relative — the TPU deep-zoom mode for
    #: canvases narrower than ~1e-4, where f32 orbit points quantize
    #: coarser than a pixel; ops/df32.py. On the oracle engine
    #: "extended" runs as float64, its strict superset).
    precision: str = "float32"
    #: Number of devices to data-parallelize over (None = all local
    #: devices; default 1 device, matching the reference's single-GPU
    #: operation, cudabrot.cu:155).
    num_devices: int | None = 1
    #: Multi-device histogram layout: "replicated" (each chip holds a
    #: full copy, merged at readback) or "rows" (row-sharded across the
    #: mesh — canvas memory and scatter work scale with chips).
    histogram_sharding: str = "replicated"
    #: Histogram bin dtype: "uint32" (reference parity, cudabrot.cu:105)
    #: or "uint64" for extreme-duration renders whose hottest bins would
    #: overflow 32 bits (~4.3e9 counts). uint64 accumulation runs in the
    #: native host-replay engine; the device scatter path is uint32-only.
    hist_dtype: str = "uint32"
    #: Allowed in-flight (dispatched, not yet blocked-on) passes.
    #: 0 = auto: 8 for worker-less (pure device-replay) engines — each
    #: block is a tunnel round-trip, ~20 ms/pass of the default band's
    #: ~85 ms passes (r5 sweep: depth 2 -> 8 measured 2.72 -> 3.26e9
    #: it/s) — and 2 where a host worker drains payloads (its fetch
    #: cadence follows the block cadence).
    pipeline_depth: int = 0

    def validate(self) -> None:
        if self.engine not in ("auto", "oracle", "pallas"):
            raise ConfigError(f"Unknown engine: {self.engine}")
        if self.scatter not in ("auto", "xla", "pallas", "sorted", "bigtiles"):
            hint = (
                " (the sort backend was removed: measured slower than "
                "scatter-add everywhere on TPU; see ops/binning.py)"
                if self.scatter == "sort"
                else ""
            )
            raise ConfigError(
                f"Unknown scatter backend: {self.scatter}{hint}"
            )
        if self.replay not in ("auto", "device", "host"):
            raise ConfigError(f"Unknown replay mode: {self.replay}")
        if self.histogram_sharding not in ("replicated", "rows"):
            raise ConfigError(
                f"Unknown histogram sharding: {self.histogram_sharding}"
            )
        if self.refill_rng not in ("threefry", "hardware", "hardware_rw"):
            raise ConfigError(f"Unknown refill rng: {self.refill_rng}")
        if self.escape_tracking not in ("auto", "step", "thin"):
            raise ConfigError(
                f"Unknown escape tracking mode: {self.escape_tracking}"
            )
        if self.emit_filter not in ("any", "canvas"):
            raise ConfigError(f"Unknown emit filter: {self.emit_filter}")
        if self.emit_filter == "canvas" and self.escape_tracking == "step":
            raise ConfigError(
                "emit-filter canvas requires thin escape tracking (the "
                "visit register rides the thin inner loop; step tracking "
                "exists only for exact-parity experiments)"
            )
        if self.precision not in ("float32", "float64", "extended"):
            raise ConfigError(f"Unknown precision: {self.precision}")
        if self.precision == "extended" and self.escape_tracking == "step":
            raise ConfigError(
                "extended precision supports thin escape tracking only "
                "(the per-step mask chain would double the boundary cost "
                "of an already ~9x heavier df32 inner step; the thin "
                "soundness argument is precision-independent)"
            )
        if self.sampler not in ("uniform", "mh"):
            raise ConfigError(f"Unknown sampler: {self.sampler}")
        if self.sampler == "mh":
            if self.precision == "float64":
                raise ConfigError(
                    "--sampler mh supports float32 and extended "
                    "precision (the MH chains live in the pallas "
                    "kernels; float64 is the oracle engine's precision)"
                )
            if self.escape_tracking == "step":
                raise ConfigError(
                    "--sampler mh requires thin escape tracking (the "
                    "in-window target counter rides the thin inner loop)"
                )
            if self.emit_filter == "canvas":
                raise ConfigError(
                    "--sampler mh already gates on canvas visits (its "
                    "acceptance IS the canvas filter); drop --emit-filter"
                )
            if not (0 <= self.mh_restart <= 256):
                raise ConfigError("mh_restart must be in [0, 256]")
            if self.mh_rep_cap < 2 or self.mh_rep_cap > 32767:
                # <= 32767 keeps v*rep < 2^32 and (k+1)*q < 2^32 in the
                # u32 on-device deposit (ops/binning.mh_deposit_weights;
                # merged pending reps add at most one flush window's
                # boundary count, itself capped at 65536 below).
                raise ConfigError("mh_rep_cap must be in [2, 32767]")
            if self.mh_burnin_passes < 0:
                raise ConfigError("mh_burnin_passes must be non-negative")
            v = self.mh_visit_slots
            if v < 2 or v > 32 or (v & (v - 1)):
                raise ConfigError(
                    "mh_visit_slots must be a power of two in [2, 32]"
                )
            if self.steps_per_flush > (1 << 16):
                raise ConfigError(
                    "--sampler mh bounds steps_per_flush at 65536 (a "
                    "pending slot's merged rep mass is capped by the "
                    "flush window; larger windows could overflow the "
                    "u32 deposit arithmetic)"
                )
        if self.hist_dtype not in ("uint32", "uint64"):
            raise ConfigError(f"Unknown histogram dtype: {self.hist_dtype}")
        if self.steps_per_flush > 0 and (
            self.steps_per_pass % self.steps_per_flush != 0
        ):
            raise ConfigError(
                "steps_per_pass must be a multiple of steps_per_flush"
            )
        if self.replay_threads < 0:
            raise ConfigError("replay_threads must be non-negative (0=auto)")
        if self.oracle_replay_capacity < 0:
            raise ConfigError(
                "oracle_replay_capacity must be non-negative (0=auto)"
            )
        if self.lane_rows <= 0 or self.replay_capacity < 0:
            raise ConfigError(
                "lane_rows must be positive and replay_capacity non-negative"
            )
        if self.replay_block < 0 or self.replay_block % 128:
            raise ConfigError(
                "replay_block must be a non-negative multiple of 128 "
                "(0 = auto)"
            )
        if self.replay_chunk < 0:
            raise ConfigError("replay_chunk must be non-negative (0 = auto)")
        if self.lane_rows > (1 << 17):
            # lanes = rows * 128 must stay <= 2^24 so the byte-plane
            # per-pass stat sums (counters.u64_sum_i32) cannot wrap.
            raise ConfigError("lane_rows must be at most 131072 (2^24 lanes)")
        # Per-lane counter invariant: the kernel tracks per-lane steps in
        # int32 (per-PASS totals are exact u64 pairs, counters.u64_sum_i32,
        # so no cross-lane ceiling applies).
        if self.steps_per_pass >= (1 << 31):
            raise ConfigError("steps_per_pass must be below 2^31")


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Complete render job description (the immutable analog of the
    reference's global state struct `g`, cudabrot.cu:70-101, minus runtime
    buffers). Defaults mirror `main` (cudabrot.cu:763-772)."""

    canvas: Canvas = dataclasses.field(default_factory=Canvas)
    band: IterationBand = dataclasses.field(default_factory=IterationBand)
    #: Fractal system name; see cudabrot_tpu.models.fractals.FRACTALS.
    #: The reference's compile-time RENDER_BURNING_SHIP switch
    #: (cudabrot.cu:15-17) is a runtime flag here.
    fractal: str = "buddhabrot"
    #: Region of the complex plane samples (c values) are drawn from, as
    #: (min_real, max_real, min_imag, max_imag). The reference always
    #: samples the full SAMPLE_DOMAIN (cudabrot.cu:392-393); this TPU
    #: extension restricts it. Two uses: (1) deep crops — the refill grid
    #: has 2^24 distinct values per axis, so shrinking the domain shrinks
    #: the sample pitch proportionally (full-domain pitch 2.4e-7 is only
    #: ~40x finer than a 20000^2 canvas's pixels); (2) isolating which
    #: seed points' orbits are rendered. NOTE this changes what is
    #: rendered: only orbits whose seed c lies inside the window are
    #: accumulated, so the image is NOT a crop of the full-domain render
    #: (orbits seeded outside the window no longer contribute).
    sample_domain: tuple = SAMPLE_DOMAIN
    #: Gamma-correction exponent; <= 0 disables gamma (cudabrot.cu:447).
    gamma: float = 1.0
    #: Wall-clock time box in seconds; negative = run until SIGINT
    #: (cudabrot.cu:475-479, 488-491).
    seconds_to_run: float = 10.0
    #: Optional fixed pass-count limit (engine passes). The reference has no
    #: equivalent — added so renders can be made deterministic for testing
    #: and benchmarking instead of relying on the time box.
    max_passes: int | None = None
    #: Base RNG seed (DEFAULT_RNG_SEED, cudabrot.cu:37).
    seed: int = 1337
    output_image: str = "output.pgm"
    #: Checkpoint file (the -s flag, cudabrot.cu:681-688); None disables.
    inprogress_file: str | None = None
    #: Write the checkpoint every N passes (0 = only at exit, the reference
    #: behavior, cudabrot.cu:785).
    checkpoint_interval: int = 0
    #: With checkpoint_interval > 0, also write a tone-mapped preview
    #: image (PNG) of the in-progress render to this path every interval.
    preview_file: str | None = None
    #: Device index for single-device operation (-d, cudabrot.cu:667-671).
    device_index: int = 0
    #: Log a progress line every N seconds while rendering (0 = only the
    #: final report, like the reference, cudabrot.cu:498-499).
    progress_interval: float = 0.0
    #: Write a jax.profiler trace of the render loop to this directory
    #: (view with TensorBoard/XProf). None disables.
    profile_dir: str | None = None
    options: EngineOptions = dataclasses.field(default_factory=EngineOptions)

    def __post_init__(self) -> None:
        # Normalize so the config stays hashable (tuple, not list) and
        # usable as a static jit argument with a stable cache key
        # (floats, not ints).
        try:
            dom = tuple(float(v) for v in self.sample_domain)
        except (TypeError, ValueError):
            raise ConfigError(
                "sample_domain must be four numbers "
                "(min_real, max_real, min_imag, max_imag)."
            ) from None
        object.__setattr__(self, "sample_domain", dom)
        self.validate()

    def validate(self) -> None:
        self.canvas.validate()
        self.band.validate()
        self.options.validate()
        if self.gamma != self.gamma:  # NaN
            raise ConfigError("Gamma must be a number.")
        dom = self.sample_domain
        if len(dom) != 4:
            raise ConfigError(
                "sample_domain must be four numbers "
                "(min_real, max_real, min_imag, max_imag)."
            )
        r0, r1, i0, i1 = dom
        if not all(v == v and abs(v) != float("inf") for v in dom):
            raise ConfigError("sample_domain values must be finite.")
        if r1 <= r0:
            raise ConfigError(
                "Maximum sample-domain real value must be greater than "
                "the minimum."
            )
        if i1 <= i0:
            raise ConfigError(
                "Maximum sample-domain imaginary value must be greater "
                "than the minimum."
            )

    def replace(self, **kwargs) -> "RenderConfig":
        return dataclasses.replace(self, **kwargs)
