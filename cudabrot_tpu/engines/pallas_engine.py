"""Production TPU engine: Pallas classify kernel + compacted orbit replay.

Pass pipeline (all one jitted, donated step — the histogram and the
persistent lane state never leave the device, mirroring how the reference
keeps its buffers device-resident across kernel launches,
cudabrot.cu:485-496):

  1. `classify_pass` (cudabrot_tpu.ops.pallas_kernels): T lane-steps of
     persistent sampling; emits in-band (c, escape-index) candidates.
     Measured ~2.7e10 lane-steps/s sustained on one v5e chip when passes
     are pipelined (the reference's whole GPU does ~4.7e9,
     version_timing.txt:74-84 x mean cost).
  2. Compaction: one key sort packs valid emissions to the front *and*
     orders them by descending orbit length, so the replay blocks below
     are length-homogeneous.
  3. Blocked replay: fixed-size lane blocks re-iterate their known-escaping
     orbits (IterateAndRecord semantics, cudabrot.cu:347-365, with the
     unbounded while(1) replaced by masked chunks bounded by the recorded
     escape index). Each block's chunk loop stops at its own longest
     active orbit, and blocks with no active lanes skip immediately.
  4. Accumulation: on the device via XLA scatter-add, on the host via the
     native replay engine (csrc/), or split between both by orbit length
     — always deterministic, unlike the reference's racy non-atomic adds
     (cudabrot.cu:312).

Engine geometry (pass length, flush window, replay capacity) auto-tunes
from the iteration band: high cutoffs emit rarely and want long passes;
low cutoffs emit constantly and want short flush windows. See
benchmarks/PERF_NOTES.md for the measurement-driven rationale, including
the XLA scatter throughput wall this design works around.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cudabrot_tpu.config import RenderConfig
from cudabrot_tpu.models import fractals
from cudabrot_tpu.ops import binning, df32
from cudabrot_tpu.ops import pallas_kernels as pk
from cudabrot_tpu.ops import pallas_kernels_ext as pke
from cudabrot_tpu.ops import pallas_kernels_mh as pkm
from cudabrot_tpu.utils import calibration, counters

STAT_KEYS = (
    "samples", "culled", "in_band", "emitted", "replay_dropped",
    "iters", "points", "cycles", "wasted", "dev_hits",
)

#: Extra per-state counters carried only by --sampler mh engines
#: (chain moves, pending-slot reservoir merges, and the rep mass those
#: merges traded between states — ops/pallas_kernels_mh.py).
MH_STAT_KEYS = (
    "mh_accepts", "mh_merges", "mh_merged_rep", "mh_deposited"
)

#: Extended boundary factor: 16 refill selects (vs 10) plus the df32
#: center-add per refill. The inner-step multiplier lives in
#: utils.calibration (extended_step_factor, measured 10.05x on v5e;
#: re-measurable via tools/calibrate.py --extended).
EXTENDED_BOUNDARY_FACTOR = 1.5


def _pow2(x: float) -> int:
    return 1 << max(0, int(np.ceil(np.log2(max(x, 1.0)))))


def _mean_lifetime(max_it: int) -> float:
    """Mean classify steps per sample at iteration cap ``max_it``
    (measured fit: 3.1 at m=100, 11.2 at m=20000, 12.6 at m=60000 —
    non-culled interior points pay the Brent detection latency, which
    grows logarithmically with the cap)."""
    return 3.2 + 1.1 * float(np.log(max(max_it, 100) / 100.0))


def _window_useful_fraction(u: int, lifetime: float) -> float:
    """Fraction of executed lane-steps that are useful (not window
    coast) at inner window size ``u``.

    Per draw, a sample with true lifetime T executes u*ceil((T+1)/u)
    steps, so the executed total is u plus a tail term while the useful
    total is the mean lifetime — a hyperbola in u, not the linear
    1-(u-1)/(2L) this replaced. That linear form over-penalized large
    windows (it modeled 0.26 useful at U=16/m=60000 where 0.46 was
    measured) and mis-ranked the window score: measured useful/raw on
    v5e at m=60000 is ~0.60/0.46/0.37 at U=8/16/32 (bench fine-band
    useful rate over tracking_ab raw rate), fit by L'/(L'+u-1) with
    L' = lifetime+4 (the heavy escape-time tail makes the effective
    per-draw lifetime exceed the mean). Fixing the ranking moved the
    fine band's auto window from 8 to 16: measured useful it/s
    7.45e10 -> 9.19e10 (threefry), 8.77e10 -> 1.06e11 (hardware_rw)."""
    lp = lifetime + 4.0
    return lp / (lp + (u - 1.0))


def _step_cost(thin: bool, refill_rng: str) -> tuple[float, float]:
    """(c_inner, c_boundary) seconds per lane-step for the classify
    kernel — the single source for every cost-model consumer (window
    selection, pass sizing, hybrid-share solve). Defaults fit from
    measured raw rates on v5e (benchmarks/tracking_ab.py): step tracking
    2.8e10/6.7e10/9.5e10 lane-steps/s at U=1/4/8; thin + threefry
    (production default) 6.6e10/1.16e11/1.84e11 at U=4/8/16; thin +
    hardware PRNG 8.8e10/1.54e11/2.36e11. On other hosts/chips run
    tools/calibrate.py and pass --calibration (utils.calibration)."""
    return calibration.active().step_cost(thin, refill_rng)


def band_emission_rate(min_it: int, max_it: int) -> float:
    """Expected in-band emissions per *useful* lane-step.

    The Mandelbrot escape-time tail follows P(T >= t) ~ C/t; C = 0.22
    re-calibrated against unbiased (threefry) sampling on v5e: measured
    per-draw in-band rates 9.9e-5 at [2000, 20000) and 1.07e-6 at
    [45000, 60000) fit C = 0.22 at both bands (the old C = 0.35 came
    from the biased hardware-PRNG streams). Mean classification cost per
    sample grows logarithmically with the iteration cap because
    non-culled interior points pay the Brent detection latency: measured
    3.1 steps/sample at m=100, 11.2 at m=20000, 12.6 at m=60000.
    Window-coast waste is applied separately where executed (not useful)
    lane-steps are the denominator (Tuning capacity sizing).
    """
    frac = 0.22 * (1.0 / max(min_it, 2) - 1.0 / max(max_it, 4))
    frac = max(frac, 1e-7)
    return frac / _mean_lifetime(max_it)


class Tuning:
    """Resolved per-band engine geometry (backend-independent: CPU and
    TPU must tune identically so the Threefry counter schedule — and
    therefore the sample stream — reproduces across backends)."""

    def __init__(self, cfg: RenderConfig):
        o = cfg.options
        fr = fractals.get_fractal(cfg.fractal)
        lifetime = _mean_lifetime(cfg.band.max_escape_iterations)
        if fr.emit == "interior":
            # Anti-Buddhabrot: every non-escaping sample emits. Interior
            # fraction of the 4x4 domain is the M-set area (~1.506/16 ~
            # 0.094, plus slow escapers at finite caps) -> ~0.10 per
            # draw; per executed lane-step divide by the mean sample
            # cost. Lands in the emission-heavy regime (U=1, short flush
            # windows, capacity-capped thinning).
            rate = 0.10 / lifetime
        else:
            rate = band_emission_rate(
                cfg.band.min_escape_iterations,
                cfg.band.max_escape_iterations,
            )
        from cudabrot_tpu.config import SAMPLE_DOMAIN

        #: Metropolis-Hastings sampling reshapes the emission economics:
        #: emissions are chain MOVES (acceptance alpha per proposal
        #: resolution), and proposals concentrate near in-band states so
        #: their mean classify cost approaches the in-band orbit length,
        #: not the uniform-draw mean. alpha depends on the crop's
        #: v-landscape (measured 7% on a deep seahorse crop, 48% on an
        #: easy wide crop) — sized for the high end below because MH
        #: capacity drops lose weighted mass; the payload is fixed-size,
        #: so the cost of that headroom is transfer, and undersizing is
        #: still counted (replay_dropped) and warned on.
        self.mh = o.sampler == "mh"
        if self.mh:
            if fr.emit == "interior":
                # Anti-Buddhabrot MH: every candidate orbit runs the
                # full cap.
                in_band_len = float(cfg.band.max_escape_iterations)
            else:
                mi_b = max(cfg.band.min_escape_iterations, 2)
                ma_b = max(cfg.band.max_escape_iterations, mi_b + 1)
                in_band_len = (mi_b * ma_b / (ma_b - mi_b)) * float(
                    np.log(ma_b / mi_b)
                )
            mh_lifetime = 0.5 * in_band_len + lifetime
            # Acceptance measured on the seahorse test crops: ~7% at a
            # [100,2000) band, ~45% at a friendly [20,300) crop. Size
            # for the high end (0.3 here + the 2x capacity headroom
            # below) — MH overwrite/overflow drops lose weighted mass,
            # where uniform drops were an unbiased thinning.
            rate = 0.3 / mh_lifetime
            # Downstream consumers (window score, coast discount) should
            # model the MH proposal mix, not the uniform-draw mean.
            lifetime = mh_lifetime
        if cfg.sample_domain != SAMPLE_DOMAIN and not self.mh:
            # A restricted sample domain concentrates the in-band rate by
            # up to the area ratio — but tuning for that worst case was
            # MEASURED ruinous: a seahorse-valley window (area ratio 494)
            # collapsed the pass geometry to 8192-step passes with a
            # 48x-oversized 6.3 MB payload each — 4.2e8 lane-steps/s,
            # 0.6% of machine rate. Boost by at most 16x instead (on top
            # of the capacity model's built-in 16x pow2/coast headroom =
            # 256x margin over the full-domain rate); if a window defeats
            # even that, the driver warns on the counted overflow drops
            # and --replay-capacity overrides. Capped at one emission per
            # useful lifetime (a draw can emit at most once).
            r0, r1, i0, i1 = cfg.sample_domain
            area = max((r1 - r0) * (i1 - i0), 1e-30)
            rate = min(rate * min(16.0 / area, 16.0), 1.0 / lifetime)
        lanes = o.lane_rows * 128
        # Flush window: aim for ~0.25 expected emissions per lane per
        # window (~12% pending-overwrite loss at the high end). The upper
        # cap bounds the emission buffer the compaction argsort must chew
        # through every pass (buffer = chunks * lanes entries; measured on
        # v5e the 256-chunk fine-band buffer cost ~20 ms/pass — more than
        # the classify kernel itself). Emission-light bands (rare in-band
        # finishes, negligible overwrite loss at any window size) take a
        # 16x larger cap so the buffer stays small; emission-heavy bands
        # keep the tight cap, where the window target is the binding
        # constraint anyway and overwrite loss costs real points. The cap
        # is deliberately backend-independent: tuning (and therefore the
        # Threefry counter schedule) must resolve identically on CPU and
        # TPU so runs reproduce across backends.
        flush_cap = 4096 if rate > 1e-5 else 65536
        if self.mh:
            # MH tenures live per flush window: the r4 silicon sweep
            # (benchmarks/mh_kernel_sweep.py, 1e-5 seahorse window)
            # measured deposited mass 6.3e6/s at 4096-step windows vs
            # 1.28e8/s at 16384 — short windows truncate chain tenures
            # 20x, and the emission-rate target below lands at ~4096 at
            # deep bands, so this must be a FLOOR on the window, not
            # just a raised cap. (Pending collisions are mass-conserving
            # reservoir merges, so big windows cost variance, not mass.)
            flush_cap = max(flush_cap, 16384)
        # Uniform sampling tolerates ~12% pending-overwrite loss (drops
        # are an unbiased thinning — pallas_kernels module docstring).
        # MH pending collisions are weighted-reservoir MERGES — exactly
        # mass-conserving, an identity-trade variance cost only — so the
        # window can run far larger than the uniform path's: the r4
        # silicon flush sweep (benchmarks/mh_flush_ab.py) measured
        # lane-step rate rising 13.5x from the old 1/16-target window
        # (256 steps) to 16384-step windows, with deposit spread staying
        # acceptable at ~1 retirement per lane-window. Target 1.0.
        flush_target = 1.0 if self.mh else 0.25
        if o.steps_per_flush > 0:
            self.steps_per_flush = o.steps_per_flush
        else:
            self.steps_per_flush = int(
                np.clip(_pow2(flush_target / rate), 32, flush_cap)
            )
            if self.mh:
                # The MH tenure floor (see flush_cap above): the rate
                # target alone picks ~4096 at deep bands and forfeits
                # 20x of the deposited mass. Scale the floor with the
                # band's mean in-band orbit length (a window must hold
                # several full tenures not to truncate them) so tiny
                # test/shallow bands keep fast small windows: 8x the
                # mean tenure reproduces the sweep's 16384 at the
                # bench band ([500,20000) -> in_band_len ~1892).
                self.steps_per_flush = max(
                    self.steps_per_flush,
                    min(16384, _pow2(8.0 * in_band_len)),
                )
        # Window size trades boundary-op amortization against
        # finished-lane coast (selected before pass length, which scales
        # with it). Thin (boundary) escape tracking is strictly cheaper
        # per inner step and semantically equivalent modulo
        # Brent-detection latency; "auto" always takes it. "step" remains
        # for exact-parity experiments (per-step cycle checks,
        # first-crossing indices).
        self.thin_tracking = o.escape_tracking != "step"
        #: Extended (df32) deep-zoom iteration: ~10x heavier inner
        #: steps (calibration.extended_step_factor) shift the window/
        #: pass geometry; always thin tracking (EngineOptions.validate).
        self.extended = o.precision == "extended"
        if o.inner_unroll > 0:
            self.inner_unroll = o.inner_unroll
        elif rate > 1e-4 and not self.mh:
            # Emission-heavy UNIFORM bands: transfer-bound, waste hurts.
            # (MH rates look emission-heavy per step but the proposals
            # are long in-band-adjacent orbits, where windows coast
            # almost nothing — score them like deep bands below.)
            self.inner_unroll = 1
        else:
            # Maximize modeled useful throughput: per-lane-step cost is
            # c_inner + c_boundary/U (_step_cost), discounted by the
            # measured-fit window-coast model (_window_useful_fraction).
            # At classify-bound bands the score peaks at U=16 for both
            # refill RNGs (U=32 measures within noise of 16 but costs
            # larger buffers).
            c_i, c_b = _step_cost(self.thin_tracking, o.refill_rng)
            if self.extended:
                c_i *= calibration.active().extended_step_factor
                c_b *= EXTENDED_BOUNDARY_FACTOR
            candidates = (
                (1, 2, 4, 8, 16, 32) if self.thin_tracking else (1, 2, 4, 8)
            )

            def score(u: int) -> float:
                return _window_useful_fraction(u, lifetime) / (c_i + c_b / u)

            self.inner_unroll = max(candidates, key=score)
        if self.steps_per_flush % self.inner_unroll != 0:
            self.inner_unroll = 1
        # Pass length: enough work per dispatch to amortize the
        # per-call overhead (~28-30 ms through this environment's tunnel,
        # PERF_NOTES.md). Windowed (U>1) configurations step U-times
        # faster, so the cap scales with U to keep pass wall time roughly
        # constant (~80-120 ms on v5e); the lane-aware bound keeps
        # per-pass lane-steps <= 2^34 so huge lane counts stay SIGINT-
        # responsive. Per-pass stat totals are exact u64 pairs
        # (counters.u64_sum_i32), so no uint32 ceiling applies.
        if o.steps_per_pass > 0:
            self.steps_per_pass = o.steps_per_pass
        else:
            # Extended steps run ~9x slower; shrink the per-dispatch step
            # budget so pass wall time (and SIGINT latency) stays in the
            # same ~100 ms band as the f32 kernel.
            per_u = (1 << 15) if self.extended else (1 << 18)
            cap = min(per_u * self.inner_unroll, (1 << 34) // lanes)
            self.steps_per_pass = int(
                np.clip(self.steps_per_flush * 256, 4096, max(cap, 4096))
            )
        if self.steps_per_pass % self.steps_per_flush != 0:
            # Round DOWN to a flush multiple (never below one window):
            # rounding up could push an auto pass past the 2^34
            # SIGINT-responsiveness budget, or a validated user value
            # past the int32 per-lane-counter bound.
            self.steps_per_pass = max(
                (self.steps_per_pass // self.steps_per_flush)
                * self.steps_per_flush,
                self.steps_per_flush,
            )
        # Expected emissions per pass: the rate model counts per useful
        # lane-step, so discount the window-coast waste a U>1 window pays
        # (executed steps are the product below). pow2 rounding already
        # grants up to 2x headroom; overflow beyond capacity is counted
        # (replay_dropped) and LENGTH-BIASED — the compaction keeps the
        # longest orbits (block homogeneity), so sustained drops
        # condition the histogram on orbit length, which is why the
        # driver warns at >1% drops and --replay-capacity exists
        # (PERF_NOTES "Sample-domain windowing"). Oversizing is not
        # free: the emission payload crosses the device->host link every
        # pass, and the fetch sits on the host worker's critical path
        # when the band is replay-bound (measured: a 4x-oversized
        # headline payload cost ~25% of the pass wall).
        useful_frac = _window_useful_fraction(self.inner_unroll, lifetime)
        expected = self.steps_per_pass * lanes * rate * useful_frac
        self.expected_emissions = expected
        # Modeled classify seconds per pass (_step_cost) and expected
        # orbit points per pass — inputs to the big-canvas hybrid-share
        # solve (auto_device_share).
        c_i, c_b = _step_cost(self.thin_tracking, o.refill_rng)
        if self.extended:
            c_i *= calibration.active().extended_step_factor
            c_b *= EXTENDED_BOUNDARY_FACTOR
        self.classify_seconds = (
            self.steps_per_pass * lanes * (c_i + c_b / self.inner_unroll)
        )
        if fr.emit == "interior":
            mean_len = float(cfg.band.max_escape_iterations)
        else:
            mi = max(cfg.band.min_escape_iterations, 2)
            ma = max(cfg.band.max_escape_iterations, mi + 1)
            # E[len | in band] for the ~1/t^2 escape-time tail.
            mean_len = (mi * ma / (ma - mi)) * float(np.log(ma / mi))
        self.expected_points = expected * mean_len
        if o.replay_capacity > 0:
            self.replay_capacity = o.replay_capacity
        elif self.mh:
            # MH emissions are pending-tenure drains: at most ONE per
            # lane per flush window, so the structural per-pass bound is
            # exact — and unlike uniform drops (unbiased thinning), MH
            # capacity overflow loses *weighted* mass (measured r4: the
            # rate-model sizing dropped 22.4M emissions in a 45 s A/B
            # leg, and the rows=128 kernel-sweep leg collapsed to ~zero
            # deposits when the bound crossed the old 2^19 ceiling).
            windows = max(self.steps_per_pass // self.steps_per_flush, 1)
            # Ceiling stays at 2^19 as a COMPILE-COST guard, not a
            # correctness one: the r5 silicon bisect (benchmarks/
            # mh_capacity_bisect.py) ran every capacity-scaled op —
            # compaction gather, 8xk visit-bin gather, mh_scatter —
            # mass-conserving and multiset-exact through 2^21; what
            # scales is XLA/Mosaic compile + first-call time,
            # superlinearly (30/48/84 s at 2^19/20/21 for the scatter
            # alone). The r4 "2^21 device hang" was that cliff read
            # through a too-short timeout, and the rows=128 collapse
            # was the pre-clamp sizing silently truncating the
            # emission buffer (fixed by the exact bound below).
            # Larger structural bounds shrink the pass instead
            # (steps_per_pass clamp below keeps the bound exact).
            self.replay_capacity = int(
                np.clip(_pow2(lanes * windows), 4096, 1 << 19)
            )
            max_windows = max(self.replay_capacity // lanes, 1)
            if windows > max_windows:
                # Shorten the pass so one pass's tenure drains (one per
                # lane-window) still fit the buffer exactly — MH drops
                # lose weighted mass, so overflow is never acceptable.
                self.steps_per_pass = max_windows * self.steps_per_flush
        else:
            self.replay_capacity = int(
                np.clip(_pow2(expected), 4096, 1 << 19)
            )
        # Replay block: lanes processed together; blocks with no active
        # lanes are skipped entirely. 1024 keeps blocks length-homogeneous
        # after the descending sort (low masked-sentinel waste in the
        # scatter stream) while staying wide enough for the VPU. (4096
        # blocks were A/B'd for the big-canvas hybrid regime: identical
        # throughput — the device replay's gap to raw scatter is not
        # block-width dispatch overhead.) --replay-block overrides for
        # the short-band scatter-call-granularity experiments (r5: the
        # default band pays 512 scatter calls/pass at block 1024).
        if o.replay_block > 0:
            self.replay_block = min(o.replay_block, self.replay_capacity)
        elif (
            self.replay_capacity >= 8192
            and cfg.band.max_escape_iterations * self.replay_capacity
            <= BATCHED_REPLAY_SLOT_BUDGET
        ):
            # r5: batched-eligible short bands measure fastest at wide
            # blocks — 8192 gives the batched replay one scatter chunk
            # per replay step (exact skip granularity) and a full-width
            # scan (r5 sweep: blk 1024/4096/8192 -> 2.41/2.74/2.77e9
            # it/s at the default band; version_timing_tpu.md).
            self.replay_block = min(8192, self.replay_capacity)
        else:
            self.replay_block = min(1024, self.replay_capacity)
        # _blocked_replay processes whole blocks only: a capacity that is
        # not a block multiple would silently drop the tail lanes — and
        # since the batch is sorted by descending orbit length, the loss
        # would be biased toward short orbits. Round user-set capacities
        # up to the next block multiple (auto-tuned ones are powers of two
        # >= 4096 and already aligned).
        if self.replay_capacity % self.replay_block != 0:
            self.replay_capacity = (
                (self.replay_capacity // self.replay_block + 1)
                * self.replay_block
            )
        if o.replay_chunk > 0:
            self.replay_chunk = o.replay_chunk
        elif cfg.canvas.histogram_nbytes >= (256 << 20):
            # Big canvases: device replay is scatter-call-overhead bound;
            # 1024-step chunks measured 5.6e7 vs 3.96e7 pts/s at 256
            # (plateau at 2048; the extra chunk-tail sentinels cost less
            # than the calls they save).
            self.replay_chunk = 1024
        else:
            self.replay_chunk = 256
        # No orbit is longer than the band cap, so a chunk beyond it is
        # pure masked-sentinel scan: at the default band (max 100) the
        # old flat 256 made every replayed block pay 2.56x its useful
        # steps — the r5 default-band share sweep measured every forced
        # device share LOSING to host-only because of exactly this
        # waste. Clamp to the cap's pow2 (floor 32 keeps the scan/scatter
        # call ratio sane for tiny test bands).
        self.replay_chunk = min(
            self.replay_chunk,
            max(_pow2(cfg.band.max_escape_iterations), 32),
        )
        # Batched-replay steps cap: the band cap rounded up so each
        # block's step-major id stream is a whole number of 8192-id
        # scatter chunks (keeps the chunk-tail sentinel runs aligned
        # with the skip flags; see _batched_replay).
        align = max(1, 8192 // self.replay_block)
        self.replay_steps_cap = (
            -(-cfg.band.max_escape_iterations // align) * align
        )
        self.min_it = cfg.band.min_escape_iterations
        self.max_it = cfg.band.max_escape_iterations
        #: Whether host-replay emissions pack to 8 bytes (two u32 words:
        #: 24-bit default-domain grid indices + split 16-bit iters) or
        #: ride the 12-byte 3-row f32 layout — the payload-bytes input
        #: to the hybrid-share transfer model, and the engine's
        #: _packed_payload source of truth.
        self.packed_payload = (
            cfg.band.max_escape_iterations <= 0xFFFF
            and cfg.sample_domain == SAMPLE_DOMAIN
            and not self.extended
            and not self.mh
        )
        #: Interior (anti-Buddhabrot) orbits are all exactly max_it long,
        #: so the log-uniform orbit-length mass model behind the hybrid
        #: split does not apply: any length threshold < max_it routes zero
        #: mass to the device while the share solver believes the
        #: pipelines are balanced. Interior renders stay host-only.
        self.interior = fr.emit == "interior"

    def auto_device_share(
        self, hist_bytes: int, scatter_backend: str = "xla"
    ) -> float:
        """Point-mass share the device should replay (hybrid mode).

        Small canvases, XLA scatter: 0 — the AVX host replay (~7.6e8
        pts/s/core on an LLC-resident histogram) beats the XLA scatter
        path ~7x, and in-step device replay only slows the classify
        stream (benchmarks/hybrid_ab.py: share 0.15 measured -27%).

        Small canvases, Mosaic scatter (r4): the hand-written RMW kernel
        replays at ~7.1e8 marginal pts/s on a VMEM-resident histogram
        (benchmarks/device_replay_ab.py) — the same order as the host's
        LLC rate — so splitting pays even where the histogram is
        cache-resident: classify + s*P/dev = (1-s)*P/host.

        Big canvases (histogram >> LLC and past the kernel's VMEM
        budget): the host accumulator becomes DRAM-latency bound —
        measured 7.3e7 pts/s at 1.2 GB (20000x15000), 2.07e8 with the
        radix64 partitioned accumulator — while the device idles ~95%
        of the pass and its XLA scatter rate (~1.1e8 slots/s,
        HBM-latency bound) does not degrade with canvas size. Same
        balance, DRAM/XLA rates.
        """
        if self.interior or self.extended or self.mh:
            # Extended renders stay unsplit: the hybrid rate model is
            # calibrated for the f32 replay engines, and deep-zoom bands
            # are emission-light anyway.
            return 0.0
        big = hist_bytes >= (256 << 20)
        if not big and scatter_backend != "pallas":
            return 0.0
        if self.expected_emissions < 4 * self.replay_block:
            # Deep bands emit few, very LONG orbits: the device replay
            # would run tens-of-thousands-step chunk scans over a single
            # partially-filled block — per-substep cost on a ~1000-lane
            # width swamps the scatter it saves (measured at the hires
            # fine band: hybrid 1.40e10 vs host-only ~1.7e10 it/s). The
            # hybrid only pays when emissions fill blocks (shallow and
            # medium bands: many short orbits, wide utilization).
            return 0.0
        # Effective rates, measured END-TO-END (an early share=0.59
        # attempt sized from the RAW scatter rate measured SLOWER than
        # host-only: always size from end-to-end rates). Big canvas:
        # host 7.3e7 pts/s (DRAM-bound accumulator), device 5.6e7
        # through blocked replay + XLA scatter at 1024-step chunks
        # (PERF_NOTES.md). Small canvas: host LLC rate, device Mosaic
        # rate (calibration docstrings carry the derivations).
        # Overridable per machine via tools/calibrate.py.
        cal = calibration.active()
        p = self.expected_points
        if p <= 0:
            return 0.0
        if big:
            host_rate = cal.host_replay_dram_rate
            dev_rate = cal.device_replay_rate
            t_host_all = p / host_rate
            s = (t_host_all - self.classify_seconds) / (
                p / dev_rate + t_host_all
            )
            return float(np.clip(s, 0.0, 0.9))
        # Small canvases (Mosaic scatter): grid-search the share over
        # the full pass model. The host side is the max of its replay
        # time and the payload fetch (the r3 default band shipped
        # ~35 MB/s of a ~45 MB/s link — at transfer-bound bands the
        # share's payoff is mostly the payload prefix it cuts,
        # Tuning.host_payload_slots); the device side carries the
        # classify kernel plus the per-pass dispatch/compaction overhead
        # (not negligible at ~0.2 s passes: the classify model alone
        # predicted 0.047 s vs 0.101 s measured). The argmin is derated
        # 20% toward the host because the error surface is asymmetric —
        # overshooting hits a device-bound cliff (headline sweep:
        # share 0.1/0.2/0.3 -> 2.28/2.45/2.02e10 it/s).
        host_rate = cal.host_replay_llc_rate
        dev_rate = cal.device_replay_pallas_rate
        t_fixed = self.classify_seconds + cal.pass_overhead_seconds
        slot_bytes = 8 if self.packed_payload else 12
        best_s = 0.0
        best_wall = None
        for step in range(19):
            s = step * 0.05
            ks = self.host_payload_slots(self.split_threshold(s))
            fetch_t = ks * slot_bytes / cal.link_rate_bytes
            host_t = max((1.0 - s) * p / host_rate, fetch_t)
            dev_t = t_fixed + s * p / dev_rate
            wall = max(host_t, dev_t)
            if best_wall is None or wall < best_wall - 1e-12:
                best_wall, best_s = wall, s
        return float(np.clip(0.8 * best_s, 0.0, 0.9))

    def host_payload_slots(self, theta: int) -> int:
        """Static host-payload width for a hybrid split at length
        threshold ``theta`` (Phase B of the r4 hybrid work).

        The compaction orders emissions by DESCENDING length, so the
        host's share (orbits >= theta) is a prefix of the batch: only
        that prefix needs to cross the device->host link. Expected
        prefix fraction comes from the same ~1/t^2 escape-time tail the
        split threshold uses; a pass whose long-orbit count overflows
        the prefix routes the excess to the device replay instead
        (position-extended device mask in _classify_and_compact), so
        under-sizing costs a little device time, never mass. This is
        what pays at transfer-bound bands: the r3 default band shipped
        34.6 MB/s of a ~45 MB/s link, and short orbits dominate
        emission counts.
        """
        cap = self.replay_capacity
        if theta <= 0:
            return cap
        mi = max(self.min_it, 2)
        ma = max(self.max_it, mi + 1)
        th = min(max(theta, mi), ma)
        frac = (1.0 / th - 1.0 / ma) / (1.0 / mi - 1.0 / ma)
        k = int(np.ceil(frac * cap / 128.0)) * 128
        return int(np.clip(k, min(1024, cap), cap))

    def split_threshold(self, point_share: float) -> int:
        """Orbit-length cutoff below which the device replays (hybrid
        mode). Orbit-point mass is roughly uniform in log(length) for the
        ~1/t^2 escape-time tail, so a point-mass share s maps to
        min * (max/min)^s."""
        if point_share <= 0 or self.interior:
            return 0
        mi = max(self.min_it, 2)
        ma = max(self.max_it, mi + 1)
        return int(mi * (ma / mi) ** min(point_share, 0.95))


def _blocked_replay(
    hist_flat,
    cr,
    ci,
    iters,
    *,
    fractal: fractals.FractalMap,
    canvas,
    chunk: int,
    block: int,
    backend: str,
    interpret: bool = False,
    bin_fn=None,
):
    """Replay length-sorted batches block-by-block with early exits.

    Lanes with negative ``iters`` are inactive. The batch is
    descending-length sorted, so each block's lanes are length-homogeneous
    and the per-block chunk loop is bounded by the block's own maximum;
    blocks with no active lanes cost one reduction and a skipped loop.

    Replays exactly the classified s <= iters window even when the
    replay trajectory escapes earlier (see ops/oracle.replay_into's
    docstring for why this conscious deviation from record-then-break
    is kept — measured in PERF_NOTES.md "record-then-break replay").

    Returns ``(hist, hits)`` where ``hits`` is an exact (lo, hi) uint32
    pair counting the on-canvas deposits this call made (ids below the
    sentinel); the callers fold it into the ``dev_hits`` state counter
    so hybrid/device stats report true on-canvas mass, not just the
    host worker's share.
    """
    k = cr.shape[0]
    nblocks = k // block
    nbins = hist_flat.shape[0]
    if bin_fn is None:
        bin_fn = functools.partial(binning.points_to_bin_ids, canvas)

    def outer_body(b, carry):
        hist, hits = carry
        off = b * block
        bcr = jax.lax.dynamic_slice(cr, (off,), (block,))
        bci = jax.lax.dynamic_slice(ci, (off,), (block,))
        bit = jax.lax.dynamic_slice(iters, (off,), (block,))
        bva = bit >= 0
        bmax = jnp.max(bit)

        def inner_cond(c):
            base, _, _, _, _ = c
            return base <= bmax

        def inner_body(c):
            base, zr, zi, hist, hits = c

            def substep(s_c, _):
                zr, zi, s = s_c
                nzr, nzi = fractals.step(fractal, zr, zi, bcr, bci)
                rec = bva & (s <= bit)
                ids = bin_fn(nzr, nzi, rec)
                zr = jnp.where(rec, nzr, zr)
                zi = jnp.where(rec, nzi, zi)
                return (zr, zi, s + 1), ids

            (zr, zi, _), ids = jax.lax.scan(
                substep, (zr, zi, base), None, length=chunk
            )
            hist = binning.scatter_ids(hist, ids, backend,
                                       interpret=interpret,
                                       skip_chunks=True)
            # chunk*block <= ~2^23 per call: an i32 sum cannot wrap.
            hits = counters.u64_add(hits, jnp.sum(ids < nbins))
            return (base + chunk, zr, zi, hist, hits)

        base, zr, zi, hist, hits = jax.lax.while_loop(
            inner_cond, inner_body,
            (jnp.int32(0), bcr, bci, hist, hits),
        )
        return (hist, hits)

    return jax.lax.fori_loop(
        0, nblocks, outer_body, (hist_flat, counters.u64_zero())
    )


#: Max id-stream slots (steps_cap * capacity) the batched replay may
#: materialize in HBM per pass: 2^27 i32 slots = 512 MB, well inside the
#: v5e's 16 GB HBM next to the histogram and lane state.
BATCHED_REPLAY_SLOT_BUDGET = 1 << 27


def _batched_replay(
    hist_flat,
    cr,
    ci,
    iters,
    *,
    fractal: fractals.FractalMap,
    canvas,
    steps_cap: int,
    block: int,
    backend: str,
    interpret: bool = False,
    bin_fn=None,
):
    """Short-band replay: materialize the whole pass's id stream, then
    deposit it in ONE skip-flagged Mosaic scatter call.

    _blocked_replay pays one scatter call per (block, chunk) pair — at
    the default band (m=100 → chunk 128, capacity 2^19, block 1024)
    that is 512 calls/pass of 128x1024 slots each, and since the mean
    in-band orbit is ~40 steps, ~69% of those slots are chunk-tail
    sentinels that the scatter kernel still deposits at its ~3.8e8
    slots/s wall (r5 ablation: the band is deposit-bound; the sentinel
    padding alone caps it at ~1.3e8 real pts/s). Here every block
    replays a static ``steps_cap`` steps (the band cap rounded up; the
    extra scan compute is ~3 ms against a ~60 ms deposit), the ids land
    in a (nblocks, steps_cap, block) HBM buffer, and a single scatter
    call streams it with per-8192-chunk all-sentinel skip flags — the
    step-major layout makes each block's tail a *contiguous* sentinel
    run, so the padding costs a skipped grid step instead of deposit
    work, and the per-call overhead (zero-init + dense merge of the
    histogram copies) is paid once per pass instead of 512 times.

    Same replay semantics as _blocked_replay (z starts at c,
    cudabrot.cu:323-324; thin-window recording s <= iters). Requires a
    "pallas"-capable backend (the skip flags are the point) and
    steps_cap * k <= BATCHED_REPLAY_SLOT_BUDGET — the caller
    (PallasEngine._device_replay) gates both.
    """
    k = cr.shape[0]
    nblocks = k // block
    nbins = hist_flat.shape[0]
    if bin_fn is None:
        bin_fn = functools.partial(binning.points_to_bin_ids, canvas)
    offs = jnp.arange(nblocks, dtype=jnp.int32) * block

    def blk(carry, off):
        bcr = jax.lax.dynamic_slice(cr, (off,), (block,))
        bci = jax.lax.dynamic_slice(ci, (off,), (block,))
        bit = jax.lax.dynamic_slice(iters, (off,), (block,))
        bva = bit >= 0

        def substep(s_c, _):
            zr, zi, s = s_c
            nzr, nzi = fractals.step(fractal, zr, zi, bcr, bci)
            rec = bva & (s <= bit)
            ids = bin_fn(nzr, nzi, rec)
            zr = jnp.where(rec, nzr, zr)
            zi = jnp.where(rec, nzi, zi)
            return (zr, zi, s + 1), ids

        _, ids = jax.lax.scan(
            substep, (bcr, bci, jnp.int32(0)), None, length=steps_cap
        )
        return carry, ids

    _, ids_all = jax.lax.scan(blk, 0, offs)
    if backend == "pallas":
        # 16384-id chunks halve the grid-step count (skipped chunks
        # cost ~3.4 us each, benchmarks/pallas_scatter_probe r5) at a
        # 2-replay-step skip granularity for 8192-lane blocks.
        hist = binning.scatter_pallas(
            hist_flat, ids_all, interpret=interpret, skip_chunks=True,
            chunk=16384,
        )
    else:
        hist = binning.scatter_ids(
            hist_flat, ids_all, backend, interpret=interpret,
            skip_chunks=True,
        )
    # steps_cap * k <= 2^27 slots per pass: an i32 sum cannot wrap.
    hits = counters.u64_add(
        counters.u64_zero(), jnp.sum(ids_all < nbins)
    )
    return hist, hits


def _blocked_replay_ext(
    hist_flat,
    kr,
    ki,
    iters,
    *,
    fractal: fractals.FractalMap,
    canvas,
    chunk: int,
    block: int,
    backend: str,
    dfc,
    step_r: float,
    step_i: float,
    interpret: bool = False,
    bin_fn=None,
):
    """Extended-precision (df32) blocked replay for deep-zoom renders.

    Same structure as _blocked_replay (descending-length-sorted batch,
    per-block chunk loop with early exits), but emissions arrive as
    24-bit *grid indices* (kr, ki) on the sample window rather than f32
    c values: c is reconstructed in df32 exactly as the classify kernel
    drew it (pallas_kernels_ext._make_kernel_ext), orbits iterate via
    df32.complex_sqr_add, and points bin through the df-aware
    points_to_bin_ids_df — positions stay accurate to ~2^-48 absolute,
    sub-pixel at canvas widths plain f32 quantizes into bands.

    ``dfc`` is the (9,) f32 runtime-constant vector carried in engine
    state: [c0rh, c0rl, c0ih, c0il, mrh, mrl, mih, mil, 0.0] — the df32
    sample-window center, the df32 canvas minimum, and the runtime zero
    that seals df32 products (ops/df32.py module docstring: these must
    be runtime-opaque or XLA folds the error-free transformations in
    excess precision). ``step_r``/``step_i`` are the f32 grid pitches
    (compile-time: they only feed sealed products).
    """
    k = kr.shape[0]
    nblocks = k // block
    nbins = hist_flat.shape[0]
    rtz = dfc[8]
    mr = (dfc[4], dfc[5])
    mi = (dfc[6], dfc[7])
    if bin_fn is None:
        bin_fn = functools.partial(
            binning.points_to_bin_ids_df, canvas
        )

    def outer_body(b, carry):
        hist, hits = carry
        off = b * block
        bkr = jax.lax.dynamic_slice(kr, (off,), (block,))
        bki = jax.lax.dynamic_slice(ki, (off,), (block,))
        bit = jax.lax.dynamic_slice(iters, (off,), (block,))
        bva = bit >= 0
        bmax = jnp.max(bit)
        # c = center (+) (k - 2^23) * step, the classify kernel's own
        # sample reconstruction (bit-identical df32 value).
        off_r = (bkr - jnp.float32(pke._TWO23)) * jnp.float32(step_r) + rtz
        off_i = (bki - jnp.float32(pke._TWO23)) * jnp.float32(step_i) + rtz
        crh, crl = df32.add_f(dfc[0], dfc[1], off_r)
        cih, cil = df32.add_f(dfc[2], dfc[3], off_i)

        def inner_cond(c):
            base = c[0]
            return base <= bmax

        def inner_body(c):
            base, zr, zrl, zi, zil, hist, hits = c

            def substep(s_c, _):
                zr, zrl, zi, zil, s = s_c
                nzr, nzrl, nzi, nzil, _ = df32.complex_sqr_add(
                    zr, zrl, zi, zil, crh, crl, cih, cil, rtz,
                    fold_abs=fractal.fold_abs,
                )
                rec = bva & (s <= bit)
                ids = bin_fn(nzr, nzrl, nzi, nzil, rec, mr, mi)
                zr = jnp.where(rec, nzr, zr)
                zrl = jnp.where(rec, nzrl, zrl)
                zi = jnp.where(rec, nzi, zi)
                zil = jnp.where(rec, nzil, zil)
                return (zr, zrl, zi, zil, s + 1), ids

            (zr, zrl, zi, zil, _), ids = jax.lax.scan(
                substep, (zr, zrl, zi, zil, base), None, length=chunk
            )
            hist = binning.scatter_ids(hist, ids, backend,
                                       interpret=interpret,
                                       skip_chunks=True)
            hits = counters.u64_add(hits, jnp.sum(ids < nbins))
            return (base + chunk, zr, zrl, zi, zil, hist, hits)

        # Orbits start at z = c (cudabrot.cu:323-324) — df32 copy.
        _, _, _, _, _, hist, hits = jax.lax.while_loop(
            inner_cond, inner_body,
            (jnp.int32(0), crh, crl, cih, cil, hist, hits),
        )
        return (hist, hits)

    return jax.lax.fori_loop(
        0, nblocks, outer_body, (hist_flat, counters.u64_zero())
    )


class PallasEngine:
    """Persistent-sampler Pallas engine (runs in interpreter mode off-TPU,
    making the identical code path testable on CPU)."""

    name = "pallas"

    def __init__(
        self,
        cfg: RenderConfig,
        interpret: bool | None = None,
        replay_mode: str | None = None,
    ):
        cfg.options.validate()
        if cfg.options.precision == "float64":
            from cudabrot_tpu.config import ConfigError

            raise ConfigError(
                "float64 iteration is not supported by the pallas engine "
                "(f32 is statistically equivalent at production scales; "
                "see benchmarks/precision_study.md). Use --engine oracle "
                "for exact double iteration."
            )
        self.cfg = cfg
        self.fractal = fractals.get_fractal(cfg.fractal)
        o = cfg.options
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret
        self.tuning = Tuning(cfg)
        self.extended = self.tuning.extended
        #: Metropolis-Hastings importance sampling (--sampler mh):
        #: per-lane chains target the canvas window; deposits are the
        #: re-weighted uniform measure in 1/weight_scale histogram
        #: units. See ops/pallas_kernels_mh.py.
        self.mh = self.tuning.mh
        self.weight_scale = pkm.WEIGHT_SCALE if self.mh else 1
        self._stat_keys = STAT_KEYS + (MH_STAT_KEYS if self.mh else ())

        # Canvas emit filter: classify additionally tracks whether each
        # orbit entered the canvas window, and only visitors are emitted
        # — same rendered measure (non-visitors deposit nothing), a
        # fraction of the replay/payload cost on cropped canvases. The
        # window is inflated one pixel past the upper binning bounds so
        # the gate can never produce false negatives (the classify
        # trajectory IS the replay trajectory in f32; the df32 kernel
        # tests hi components, covered by the wider inflation below).
        self.visit_window = None
        if o.emit_filter == "canvas":
            cv = cfg.canvas
            if self.tuning.extended:
                # hi-only compares carry ~2^-24 relative slop, and the
                # f64 host replay's trajectory drifts ~2^-48-growing from
                # the kernel's df32 one: pad generously (4 pixels or the
                # f32 quantum, whichever is larger). False positives only.
                pad_r = max(4 * cv.delta_real, 2.0 ** -21)
                pad_i = max(4 * cv.delta_imag, 2.0 ** -21)
            else:
                pad_r = cv.delta_real
                pad_i = cv.delta_imag
            self.visit_window = (
                cv.min_real - (pad_r if self.tuning.extended else 0.0),
                cv.max_real + pad_r,
                cv.min_imag - (pad_i if self.tuning.extended else 0.0),
                cv.max_imag + pad_i,
            )
        if self.extended:
            # Grid/window constants shared by the classify kernel and
            # every replay path (ops/pallas_kernels_ext.grid_params).
            c0r, c0i, step_r, step_i = pke.grid_params(cfg.sample_domain)
            self._df_center = (c0r, c0i)
            self._df_step = (step_r, step_i)
        self.lane_rows = o.lane_rows
        self.lanes = o.lane_rows * 128
        self.steps_per_pass = self.tuning.steps_per_pass * self.lanes
        self.replay_capacity = self.tuning.replay_capacity
        self.scatter_backend = binning.select_scatter_backend(
            o.scatter, cfg.canvas, self.replay_capacity
        )
        # Refill RNG: in-kernel Threefry by default (unbiased, backend-
        # independent). The hardware PRNG is TPU-only — the interpreter
        # stubs it to zeros — so interpret mode always takes threefry.
        self.refill_rng = (
            "threefry" if interpret else cfg.options.refill_rng
        )

        #: MH visit-bin reservoir width (static kernel shape).
        self.visit_slots = o.mh_visit_slots
        mode = replay_mode or o.replay
        if self.mh:
            from cudabrot_tpu.config import ConfigError

            # MH deposits are kernel-recorded visit bins — a pure
            # scatter, no orbit replay on EITHER side — so the natural
            # home is the device (zero per-pass host traffic; composes
            # with DP/multi-process/sharded wrappers via core()). The
            # host worker applies the identical integer deposit in
            # numpy and exists for uint64 histograms (device scatter
            # accumulates in uint32) or an explicit --replay host.
            if mode == "auto":
                mode = "host" if o.hist_dtype == "uint64" else "device"
            if o.replay_device_share > 0:
                raise ConfigError(
                    "--replay-device-share does not apply to --sampler "
                    "mh (deposits are kernel-recorded bins; there is no "
                    "replay to split)"
                )
        elif mode == "auto":
            from cudabrot_tpu.io import native

            mode = "host" if native.available() else "device"
        if self.extended and mode == "host" and not self.mh:
            from cudabrot_tpu.io import native

            # Extended emissions are window-grid indices whose c
            # reconstruction needs the f64 native replay entry points;
            # fall back to the df32 device replay when the native
            # library predates them (deep-zoom bands are emission-light,
            # so the device path costs little here). MH host mode is
            # exempt: its deposits are pre-binned (no native replay).
            if not native.available() or not native.supports_f64():
                mode = "device"
        if self.extended and o.replay_device_share > 0:
            from cudabrot_tpu.config import ConfigError

            raise ConfigError(
                "--replay-device-share does not apply to extended-"
                "precision renders (deep-zoom bands are emission-light; "
                "the hybrid split's rate model covers the f32 engines "
                "only)."
            )
        if (
            mode == "host"
            and replay_mode is None
            and o.replay == "auto"
            and not self.mh
            and not self.extended
            and o.hist_dtype != "uint64"
            and o.replay_device_share < 0
            and self.scatter_backend == "pallas"
            and self.tuning.replay_steps_cap * self.tuning.replay_capacity
            <= BATCHED_REPLAY_SLOT_BUDGET
        ):
            # r5: emission-heavy short bands — exactly the batched-replay
            # regime (steps_cap * capacity inside the slot budget) — are
            # FETCH-bound in host/hybrid mode: the per-pass payload
            # (~4 MB at the default band) serializes on the ~45 MB/s
            # link, and every measured hybrid share lost to pure device
            # replay once the batched skip-scatter landed (r5 sweep:
            # device 2.74e9 vs hybrid s30/s50/s70 1.87/2.17/2.41e9
            # it/s; version_timing_tpu.md). Long bands (headline, deep)
            # exceed the budget and keep the r4 hybrid split.
            mode = "device"
        self.replay_mode = mode
        self._worker = None
        self._tail_fn = None
        if o.hist_dtype == "uint64" and mode != "host":
            from cudabrot_tpu.config import ConfigError

            raise ConfigError(
                "uint64 histograms require host replay (the device "
                "scatter path accumulates in uint32); use --replay host."
            )
        if mode == "host":
            from cudabrot_tpu.engines.host_replay import HostReplayWorker

            grid_decode = None
            if self.extended:
                # Extended payloads carry sample-window grid indices;
                # hand the worker the f64 decode constants (the exact
                # f64 value of the df32 window center, so host c agrees
                # with the kernel's df32 c to the renormalization error).
                grid_decode = (
                    df32.to_float64(*self._df_center[0]),
                    df32.to_float64(*self._df_center[1]),
                    self._df_step[0],
                    self._df_step[1],
                )
            # Strict (contraction-proof) native f32 orbit arithmetic is
            # REQUIRED when the estimator conditions on the kernel's own
            # trajectory — the canvas emit filter (visit-gated
            # emissions) — AND the kernel compiles under Mosaic's strict
            # one-rounding-per-op semantics (TPU). Without it the
            # selection conditions on kernel-stream luck the contracted
            # replay cannot reproduce (measured on the old replay-based
            # MH: 44% tenure-mass loss at a 6e-3 crop). CPU-compiled
            # kernels bit-match the contracted default
            # (benchmarks/fma_probe.py), so strict stays off there.
            # MH needs no strict mode at all anymore: its deposits are
            # kernel-recorded bins, not replayed trajectories.
            strict = (
                jax.default_backend() == "tpu"
                and not self.extended
                and not self.mh
                and self.visit_window is not None
            )
            self._worker = HostReplayWorker(
                cfg.canvas,
                burning_ship=self.fractal.fold_abs,
                num_threads=o.replay_threads,
                dtype=np.dtype(o.hist_dtype),
                grid_decode=None if self.mh else grid_decode,
                mh_bins=self.visit_slots if self.mh else None,
                strict=strict,
            )
            # Auto share: 0 on LLC-resident canvases — the native host
            # replay (~7.6e8 pts/s/core) beats device XLA scatter
            # (~1.1e8 slots/s) ~7x and runs concurrently with classify —
            # but positive on big canvases, where the host accumulator
            # goes DRAM-latency bound and the otherwise-idle device
            # takes the balancing short-orbit share (see
            # Tuning.auto_device_share; measured rationale in
            # PERF_NOTES.md). Explicit replay_device_share overrides.
            if o.replay_device_share >= 0:
                share = o.replay_device_share
            elif o.hist_dtype == "uint64":
                # The device prefix accumulates in uint32; u64 renders
                # stay host-only (also enforced below).
                share = 0.0
            else:
                share = self.tuning.auto_device_share(
                    cfg.canvas.histogram_nbytes,
                    scatter_backend=self.scatter_backend,
                )
            self.split_threshold = self.tuning.split_threshold(share)
            #: Static host-payload prefix width (== capacity when there
            #: is no device share; see Tuning.host_payload_slots).
            self.host_payload_slots = self.tuning.host_payload_slots(
                self.split_threshold
            )
            if o.hist_dtype == "uint64" and self.split_threshold > 0:
                from cudabrot_tpu.config import ConfigError

                raise ConfigError(
                    "uint64 histograms cannot use a device replay share "
                    "(the device prefix accumulates in uint32)."
                )

            # The kernel draws c from 24-bit RNG words: cr = k * 2^-22 - 2
            # exactly (pallas_kernels._u32_to_domain), so k = (cr+2) * 2^22
            # is exactly recoverable on-device and c is exactly
            # reconstructible on the host. With escape indices < 2^16 the
            # whole emission packs losslessly into two u32 words
            # (24-bit k_re/k_im + split 16-bit iters+1): 8 bytes/emission
            # instead of 12 — a 1.5x cut of the device->host payload,
            # which is the binding constraint at emission-heavy bands on
            # slow links (PERF_NOTES.md: this environment's tunnel runs
            # ~45 MB/s; the reference's default band saturates it).
            # The packing is exact ONLY on the default domain's 2^-22
            # grid — a custom sample domain's finer pitch would be
            # quantized away by it, defeating the feature — so custom
            # domains ride the 12-byte f32 payload.
            # Extended payloads always ride the 3-row f32 layout: the
            # rows carry 24-bit grid indices (exact in f32) that the
            # worker's grid decode consumes; the packed-u32 encoding is
            # specific to the default domain's 2^-22 c quantization.
            # (MH payloads need extra rows — rep, visit bins — and ride
            # the i32 multi-row layout; see Tuning.packed_payload.)
            self._packed_payload = self.tuning.packed_payload

            self._pass_fn = jax.jit(
                functools.partial(self.host_pass, ordinal=jnp.uint32(0)),
                donate_argnums=0,
            )
        else:
            self.split_threshold = 0
            self._pass_fn = jax.jit(
                functools.partial(self.core, ordinal=jnp.uint32(0)),
                donate_argnums=0,
            )

    # -- engine interface ---------------------------------------------------

    def host_pass(self, state, pass_index, ordinal):
        """Device-side half of a host-replay pass: classify + compact +
        payload packing. Pure and ordinal-parameterized so the
        data-parallel wrapper can run it per device under shard_map
        (each chip streams its own emissions to the host worker)."""
        new_state, (cr, ci, it, rep, vks) = self._classify_and_compact(
            state,
            pass_index,
            ordinal=ordinal,
            device_prefix=self.split_threshold,
        )
        if self.split_threshold > 0:
            # Hybrid: ship only the host's share. The batch is
            # descending-length sorted and _classify_and_compact routed
            # everything past this static prefix to the device replay,
            # so the slice is mass-exact — and at transfer-bound bands
            # (the reference's default band ships ~35 MB/s of a 45 MB/s
            # link) the cut payload is most of the hybrid's win.
            ks = self.host_payload_slots
            cr, ci, it = cr[:ks], ci[:ks], it[:ks]
        # One fixed-shape payload: the host worker fetches a finished
        # pass output (no fresh device op — that would queue behind the
        # in-flight pass) in a single transfer.
        n_valid = jnp.sum(it >= 0).astype(jnp.int32)
        if self.mh:
            # MH rows (i32): escape index (validity), tenure reps, the
            # chain target t, and the kernel-recorded visit bins. The
            # worker applies the deposit directly (mh_deposit_numpy) —
            # rep is the compacted emit_rep and vks the target; ``cr``
            # carries the (visit_slots, k) bins through the compaction
            # plumbing.
            payload = jnp.concatenate(
                [jnp.stack([it, rep, vks]), cr], axis=0
            ).astype(jnp.int32)
        elif self._packed_payload:
            scale = jnp.float32(4194304.0)  # 2^22
            k_r = ((cr + 2.0) * scale).astype(jnp.uint32)
            k_i = ((ci + 2.0) * scale).astype(jnp.uint32)
            enc = (it + 1).astype(jnp.uint32)  # 0 == invalid lane
            w0 = k_r | ((enc & jnp.uint32(0xFF)) << 24)
            w1 = k_i | ((enc >> 8) << 24)
            payload = jnp.stack([w0, w1])
        else:
            # iters ride as f32 (exact below 2^24, enforced by config
            # validation).
            payload = jnp.stack([cr, ci, it.astype(jnp.float32)])
        return new_state, n_valid, payload

    def _classify_and_compact(
        self, state, pass_index, ordinal, device_prefix: int = 0
    ):
        cfg = self.cfg
        o = cfg.options
        tn = self.tuning
        base_key = jax.random.key(cfg.seed)
        key = jax.random.fold_in(
            jax.random.fold_in(base_key, ordinal), pass_index
        )
        # Two uint32 key words: the in-kernel Threefry key (or the
        # hardware-PRNG seed, which uses word 0). Backend-independent —
        # CPU (interpret) and TPU runs draw identical refill samples.
        seed = jax.random.bits(key, (2,), jnp.uint32)

        if self.mh:
            cv = cfg.canvas
            mh_fn = (
                pkm.classify_pass_ext_mh if self.extended
                else pkm.classify_pass_mh
            )
            mh_state = (
                pkm.ExtMhLaneState(*state["lanes"]) if self.extended
                else pkm.MhLaneState(*state["lanes"])
            )
            if self.extended:
                # The df32 MH kernel tests window membership in
                # CENTER-RELATIVE coordinates (absolute f32 bounds
                # collapse below the center's ulp — the deep-zoom
                # regime); hand it the canvas bounds relative to the
                # exact f64 value of the df32 window center.
                c_r = df32.to_float64(*self._df_center[0])
                c_i = df32.to_float64(*self._df_center[1])
                mh_window = (
                    cv.min_real - c_r, cv.max_real - c_r,
                    cv.min_imag - c_i, cv.max_imag - c_i,
                )
            else:
                mh_window = (
                    cv.min_real, cv.max_real, cv.min_imag, cv.max_imag
                )
            result = mh_fn(
                mh_state,
                seed,
                None,
                fractal=self.fractal,
                min_it=cfg.band.min_escape_iterations,
                max_it=cfg.band.max_escape_iterations,
                steps_per_pass=tn.steps_per_pass,
                steps_per_flush=tn.steps_per_flush,
                cycle_detection=o.cycle_detection,
                interpret=self.interpret,
                inner_unroll=tn.inner_unroll,
                rng=self.refill_rng,
                sample_domain=cfg.sample_domain,
                window=mh_window,
                restart256=o.mh_restart,
                rep_cap=o.mh_rep_cap,
                canvas_wh=(cv.width, cv.height),
            )
        elif self.extended:
            result = pke.classify_pass_ext(
                pke.ExtLaneState(*state["lanes"]),
                seed,
                None,
                fractal=self.fractal,
                min_it=cfg.band.min_escape_iterations,
                max_it=cfg.band.max_escape_iterations,
                steps_per_pass=tn.steps_per_pass,
                steps_per_flush=tn.steps_per_flush,
                cycle_detection=o.cycle_detection,
                interpret=self.interpret,
                inner_unroll=tn.inner_unroll,
                rng=self.refill_rng,
                sample_domain=cfg.sample_domain,
                visit_window=self.visit_window,
            )
        else:
            result = pk.classify_pass(
                pk.LaneState(*state["lanes"]),
                seed,
                None,
                fractal=self.fractal,
                min_it=cfg.band.min_escape_iterations,
                max_it=cfg.band.max_escape_iterations,
                steps_per_pass=tn.steps_per_pass,
                steps_per_flush=tn.steps_per_flush,
                cycle_detection=o.cycle_detection,
                interpret=self.interpret,
                inner_unroll=tn.inner_unroll,
                thin_tracking=tn.thin_tracking,
                rng=self.refill_rng,
                sample_domain=cfg.sample_domain,
                visit_window=self.visit_window,
            )

        # --- compaction: one key sort packs valid entries first AND orders
        # them by descending orbit length for the blocked replay ---
        k = self.replay_capacity
        em_it = result.emit_it.reshape(-1)
        if self.mh:
            # MH: compact by validity only (deposits are order-free
            # scatters, not length-blocked replays). ``cr_c`` carries
            # the (visit_slots, k) bin rows; ``ci_c`` is unused.
            em_rep = result.emit_rep.reshape(-1)
            em_v = result.emit_v.reshape(-1)
            em_b = jnp.moveaxis(result.emit_bins, 1, 0).reshape(
                self.visit_slots, -1
            )
        else:
            em_cr = result.emit_c[:, 0].reshape(-1)
            em_ci = result.emit_c[:, 1].reshape(-1)
            em_rep = None
        valid = em_it >= 0
        if self.mh:
            # MH capacity is sized exactly (one tenure per lane-window;
            # overflow loses weighted mass and never happens by
            # construction), so the cheap validity pack suffices.
            order = jnp.argsort(jnp.where(valid, -em_it, 1))
            take = order[:k]
        else:
            # Uniform path, r5: overflow thinning must be UNBIASED.
            # The old single sort packed valid entries by descending
            # length, so sustained capacity overflow (32% of emissions
            # at the reference-default band, r5 sweeps) kept only the
            # longest orbits — a length-conditioned histogram. Select
            # the kept subset by a deterministic uniform key instead,
            # THEN order the kept k by descending length (the blocked
            # replay's homogeneity and the host-payload prefix both
            # want longest-first; scatter addition commutes, so when
            # nothing overflows the result is bitwise-identical to the
            # old path).
            rbits = jax.random.bits(
                jax.random.fold_in(key, 0x7711), em_it.shape, jnp.uint32
            )
            nslots = em_it.shape[0]
            max_it = cfg.band.max_escape_iterations
            if nslots <= (1 << 21) and max_it + 1 < 1024:
                # Packed single-u32 sorts (r5): TPU argsort is a 64-bit
                # (key, index) pair sort; at the default band the two
                # argsorts cost ~23 ms of a ~100 ms pass (phase
                # breakdown B-A). Both orderings pack key+index into
                # one u32 — an 11-bit random key (ties broken by slot
                # position, statistically benign: emission properties
                # are stationary across the buffer) | 21-bit slot, and
                # (max_it - len) | 21-bit rank — so each sort is a
                # plain u32 sort. Same selection law, same length
                # ordering; block composition among equal lengths can
                # differ from the argsort path, which scatter-add
                # commutativity makes histogram-invariant.
                r11 = jnp.minimum(
                    jax.lax.shift_right_logical(rbits, jnp.uint32(21)),
                    jnp.uint32(2046),
                )
                idx = jnp.arange(nslots, dtype=jnp.uint32)
                key1 = jnp.where(
                    valid,
                    (r11 << jnp.uint32(21)) | idx,
                    (jnp.uint32(2047) << jnp.uint32(21)) | idx,
                )
                cand = (jax.lax.sort(key1)[:k] & jnp.uint32(0x1FFFFF)).astype(
                    jnp.int32
                )
                it_cand = em_it[cand]
                pos = jnp.arange(cand.shape[0], dtype=jnp.uint32)
                len_key = jnp.where(
                    it_cand >= 0, max_it - it_cand, max_it + 1
                ).astype(jnp.uint32)
                key2 = (len_key << jnp.uint32(21)) | pos
                take = cand[
                    (jax.lax.sort(key2) & jnp.uint32(0x1FFFFF)).astype(
                        jnp.int32
                    )
                ]
            else:
                sel_key = jnp.where(
                    valid,
                    jax.lax.shift_right_logical(rbits, jnp.uint32(1)),
                    jnp.uint32(0x80000000),
                )
                cand = jnp.argsort(sel_key)[:k]
                it_cand = em_it[cand]
                order2 = jnp.argsort(jnp.where(it_cand >= 0, -it_cand, 1))
                take = cand[order2]
        if self.mh:
            cr_c = em_b[:, take]
            ci_c = None
            it_c = em_it[take]
        else:
            # One (k, 3)-row gather instead of three 524k element
            # gathers: TPU gathers dominate the compact stage (r5
            # attribution), and a row gather fetches the 12-byte
            # payload contiguously. it rides as a VALUE-converted f32
            # lane (exact: config bounds max_escape_iterations < 2^24)
            # — a bitcast would make small lengths denormal floats,
            # which the TPU flushes to zero in transit (measured:
            # deposits collapsed 242M -> 14M pts/s).
            stacked = jnp.stack(
                [em_cr, em_ci, em_it.astype(jnp.float32)], axis=1
            )
            g = stacked[take]
            cr_c = g[:, 0]
            ci_c = g[:, 1]
            it_c = g[:, 2].astype(jnp.int32)
        rep_c = em_rep[take] if self.mh else None
        v_c = em_v[take] if self.mh else None
        # Derived, not gathered: valid == (em_it >= 0) elementwise, so
        # re-testing the gathered lengths saves one 524k-element gather
        # (TPU gathers run at ~1.2e8/s — the compact stage's dominant
        # cost, r5 attribution probe).
        valid_c = it_c >= 0
        n_valid = jnp.sum(valid).astype(jnp.uint32)
        emitted = jnp.minimum(n_valid, jnp.uint32(k))
        dropped = n_valid - emitted

        # --- stats (orbit points are counted where replay runs) ---
        # Per-pass totals are exact (lo, hi) uint32 pairs: per-lane
        # counters are int32 in the kernel, but their cross-lane sums can
        # exceed 2^32 once passes are sized to amortize dispatch overhead
        # (counters.u64_sum_i32). The reference has no analog — it only
        # counts passes (cudabrot.cu:498-499).
        st = result.stats
        wasted = counters.u64_sum_i32(st[pk.STAT_WASTED])
        zero_pair = (jnp.uint32(0), jnp.uint32(0))
        per_pass = {
            "samples": counters.u64_sum_i32(st[pk.STAT_DRAWN]),
            "culled": counters.u64_sum_i32(st[pk.STAT_CULLED]),
            "in_band": counters.u64_sum_i32(st[pk.STAT_IN_BAND]),
            "cycles": counters.u64_sum_i32(st[pk.STAT_CYCLES]),
            "emitted": (emitted, jnp.uint32(0)),
            "replay_dropped": (dropped, jnp.uint32(0)),
            "wasted": wasted,
            # Useful classify iterations: executed lane-steps minus the
            # window-coast and culled-draw waste the kernel counted.
            "iters": counters.u64_sub_pair(
                counters.u64_pair(tn.steps_per_pass * self.lanes), wasted
            ),
            "points": zero_pair,
            # On-canvas deposits made by the DEVICE replay (hybrid share
            # or full device mode) — incremented where replay runs.
            "dev_hits": zero_pair,
        }
        if self.mh:
            per_pass["mh_accepts"] = counters.u64_sum_i32(
                st[pkm.STAT_MH_ACCEPT]
            )
            per_pass["mh_merges"] = counters.u64_sum_i32(
                st[pkm.STAT_MH_MERGE]
            )
            per_pass["mh_merged_rep"] = counters.u64_sum_i32(
                st[pkm.STAT_MH_MERGED_REP]
            )
            # Deposited mass is tallied where the deposit happens (core
            # for the device path; the host worker otherwise).
            per_pass["mh_deposited"] = zero_pair
        new_state = dict(state)
        new_state["lanes"] = tuple(result.state)
        for key_ in self._stat_keys:
            new_state[key_] = counters.u64_add_pair(
                state[key_], per_pass[key_]
            )
        # Mark invalid compacted lanes with negative iters so both replay
        # backends can skip them.
        it_c = jnp.where(valid_c, it_c, -1)
        if self.mh:
            # t <= 1 marks non-depositing slots for the bins deposit.
            v_c = jnp.where(valid_c, v_c, 0)
            return new_state, (cr_c, ci_c, it_c, rep_c, v_c)

        if device_prefix > 0:
            # Hybrid split by orbit length: the device replays the *short*
            # orbits (iters < threshold) concurrently with the host worker
            # replaying the long ones. Short orbits suit the device's
            # chunked masked loop (low tail waste); long orbits suit the
            # host engine's exact per-lane bounds. Long orbits past the
            # static host-payload prefix (Tuning.host_payload_slots —
            # the batch is descending-length sorted, so host entries are
            # a prefix) also route to the device: the payload slice in
            # host_pass then ships exactly the host's share, and an
            # overflowing pass costs device time, never mass.
            theta = jnp.int32(device_prefix)
            pos = jnp.arange(it_c.shape[0], dtype=jnp.int32)
            k_host = jnp.int32(self.host_payload_slots)
            to_dev = (it_c < theta) | (pos >= k_host)
            it_dev = jnp.where(to_dev, it_c, -1)
            it_host = jnp.where(~to_dev, it_c, -1)
            hist_flat, dhits = self._device_replay(
                new_state["hist"].reshape(-1), cr_c, ci_c, it_dev
            )
            new_state["hist"] = hist_flat.reshape(cfg.canvas.shape)
            new_state["dev_hits"] = counters.u64_add_pair(
                new_state["dev_hits"], dhits
            )
            # Exact u64 pair: one interior-mode pass can replay > 2^32
            # points (max_it-long orbits at a filled batch), which a
            # uint32 sum would silently wrap.
            pts = counters.u64_sum_i32(jnp.where(it_dev >= 0, it_dev + 1, 0))
            new_state["points"] = counters.u64_add_pair(state["points"], pts)
            it_c = it_host

        return new_state, (cr_c, ci_c, it_c, None, None)

    def _device_replay(self, hist_flat, cr, ci, it):
        """f32 device replay+deposit dispatch: the one-scatter-per-pass
        batched path when the band is short enough to materialize its id
        stream (short bands are deposit-bound on chunk-tail sentinels
        and per-call overhead — r5 default-band ablation), the per-block
        chunked loop otherwise."""
        cfg = self.cfg
        tn = self.tuning
        if (
            self.scatter_backend == "pallas"
            and tn.replay_steps_cap * cr.shape[0]
            <= BATCHED_REPLAY_SLOT_BUDGET
        ):
            return _batched_replay(
                hist_flat, cr, ci, it,
                fractal=self.fractal, canvas=cfg.canvas,
                steps_cap=tn.replay_steps_cap, block=tn.replay_block,
                backend=self.scatter_backend, interpret=self.interpret,
            )
        return _blocked_replay(
            hist_flat, cr, ci, it,
            fractal=self.fractal, canvas=cfg.canvas,
            chunk=tn.replay_chunk, block=tn.replay_block,
            backend=self.scatter_backend, interpret=self.interpret,
        )

    def core(self, state, pass_index, ordinal):
        """Fully on-device pass (classify + replay + scatter) — the path
        used for multi-chip data parallelism and by `__graft_entry__`.

        MH: classify + compact + deposit the kernel-recorded visit bins
        with ops/binning.mh_scatter — a <= visit_slots*capacity scatter
        per pass, fully device-resident (nothing crosses to the host).
        Chain burn-in is handled in-graph: deposits are zeroed while
        pass_index < mh_burnin_passes and the retention counters reset
        on the last burn-in pass, so every wrapper (DP, multi-process,
        row-sharded) inherits correct burn-in for free."""
        cfg = self.cfg
        tn = self.tuning
        if self.mh:
            new_state, (bins_c, _, it_c, rep_c, v_c) = (
                self._classify_and_compact(state, pass_index, ordinal)
            )
            o = cfg.options
            burnin = jnp.int32(o.mh_burnin_passes)
            p_idx = jnp.asarray(pass_index, jnp.int32)
            t_eff = jnp.where(p_idx < burnin, 0, v_c)
            hist_flat, deposits, mass = binning.mh_scatter(
                new_state["hist"].reshape(-1), bins_c, t_eff, rep_c
            )
            new_state = dict(new_state)
            new_state["hist"] = hist_flat.reshape(cfg.canvas.shape)
            new_state["points"] = counters.u64_add_pair(
                new_state["points"], counters.u64_sum_i32(deposits)
            )
            new_state["mh_deposited"] = counters.u64_add_pair(
                new_state["mh_deposited"],
                counters.u64_sum_i32(mass.astype(jnp.int32)),
            )
            # End of burn-in: zero every retention counter so transient-
            # biased in-flight tenure mass cannot deposit later.
            lanes_cls = (
                pkm.ExtMhLaneState if self.extended else pkm.MhLaneState
            )
            lanes = lanes_cls(*new_state["lanes"])
            rep0 = jnp.where(p_idx == burnin - 1, 0, lanes.rep)
            new_state["lanes"] = tuple(lanes._replace(rep=rep0))
            return new_state
        new_state, (cr_c, ci_c, it_c, _, _) = self._classify_and_compact(
            state, pass_index, ordinal
        )
        if self.extended:
            # Compacted emissions carry the 24-bit window grid indices;
            # the df32 replay reconstructs c exactly as the kernel drew
            # it and keeps orbit positions sub-pixel at deep-zoom widths.
            hist_flat, dhits = _blocked_replay_ext(
                new_state["hist"].reshape(-1),
                cr_c,
                ci_c,
                it_c,
                fractal=self.fractal,
                canvas=cfg.canvas,
                chunk=tn.replay_chunk,
                block=tn.replay_block,
                backend=self.scatter_backend,
                interpret=self.interpret,
                dfc=new_state["dfc"],
                step_r=self._df_step[0],
                step_i=self._df_step[1],
            )
        else:
            hist_flat, dhits = self._device_replay(
                new_state["hist"].reshape(-1), cr_c, ci_c, it_c
            )
        new_state = dict(new_state)
        new_state["hist"] = hist_flat.reshape(cfg.canvas.shape)
        new_state["dev_hits"] = counters.u64_add_pair(
            new_state["dev_hits"], dhits
        )
        # Exact u64 pair (an interior-mode pass can exceed 2^32 points).
        points = counters.u64_sum_i32(jnp.where(it_c >= 0, it_c + 1, 0))
        new_state["points"] = counters.u64_add_pair(state["points"], points)
        return new_state

    def init_state(self, hist0: np.ndarray | None):
        shape = self.cfg.canvas.shape
        if self._worker is not None:
            # Host mode: the resumed mass lives in the host accumulator;
            # the device histogram stays zero.
            self._worker.hist[:] = 0
            self._worker.hits = 0
            self._worker.points = 0
            self._worker.lost_weight = 0
            if hist0 is not None:
                self._worker.add_resumed(hist0)
            hist = jnp.zeros(shape, jnp.uint32)
        else:
            hist = (
                jnp.zeros(shape, jnp.uint32)
                if hist0 is None
                else jnp.asarray(hist0, jnp.uint32)
            )
        if self.extended and self.mh:
            state = {
                "hist": hist,
                "lanes": tuple(
                    pkm.init_ext_mh_lane_state(
                        self.lane_rows, self.visit_slots
                    )
                ),
            }
        elif self.extended:
            state = {
                "hist": hist,
                "lanes": tuple(pke.init_ext_lane_state(self.lane_rows)),
                # Runtime-constant df32 vector for the device replay:
                # sample-window center, canvas minimum, and the sealing
                # zero. Carried in state (a traced jit argument) so XLA
                # cannot constant-fold the error-free transformations —
                # see ops/df32.py's module docstring.
                "dfc": jnp.asarray(
                    [
                        self._df_center[0][0], self._df_center[0][1],
                        self._df_center[1][0], self._df_center[1][1],
                        *df32.from_float(self.cfg.canvas.min_real),
                        *df32.from_float(self.cfg.canvas.min_imag),
                        0.0,
                    ],
                    jnp.float32,
                ),
            }
        elif self.mh:
            state = {
                "hist": hist,
                "lanes": tuple(
                    pkm.init_mh_lane_state(self.lane_rows, self.visit_slots)
                ),
            }
        else:
            state = {
                "hist": hist,
                "lanes": tuple(pk.init_lane_state(self.lane_rows)),
            }
        for k in self._stat_keys:
            state[k] = counters.u64_zero()
        return state

    def memory_estimate(self) -> tuple[int, int]:
        """(device_bytes, host_bytes) — the reference's startup banner
        equivalent (cudabrot.cu:154-165)."""
        cv = self.cfg.canvas
        tn = self.tuning
        hist = cv.num_pixels * 4
        lane_cls = pk.LaneState
        if self.extended and self.mh:
            lane_cls = pkm.ExtMhLaneState
        elif self.extended:
            lane_cls = pke.ExtLaneState
        elif self.mh:
            lane_cls = pkm.MhLaneState
        n_fields = len(lane_cls._fields)
        lanes = self.lanes * n_fields * 4
        chunks = tn.steps_per_pass // tn.steps_per_flush
        emission = chunks * self.lanes * 12
        if self.mh:
            # vb/xb are (visit_slots, R, 128) each; emissions carry
            # (3 + visit_slots) i32 rows.
            lanes += self.lanes * 2 * (self.visit_slots - 1) * 4
            emission = chunks * self.lanes * (3 + self.visit_slots) * 4
        payload_bytes = 8 if getattr(self, "_packed_payload", False) else 12
        device = (
            hist + lanes + emission * 2 + self.replay_capacity * payload_bytes
        )
        host = hist + cv.num_pixels * 2  # final histogram + 16-bit image
        if self._worker is not None:
            # Host accumulation buffer (8 bytes/bin for uint64 renders).
            host += cv.num_pixels * self._worker.hist.dtype.itemsize
        return device, host

    def warmup(self, state) -> None:
        """Compile AND dispatch-warm the pass executable so the driver's
        time box covers rendering, not compilation (the reference compiles
        offline via nvcc; this is the JAX equivalent, backed by the
        persistent cache).

        `.lower().compile()` alone is not enough: the jit dispatch path
        keeps its own cache, and the first real call re-compiled (measured
        182 s at the default band — inside the timed loop). Execute one
        throwaway pass on a cloned state instead; the clone protects the
        caller's donated buffers.

        In host mode, also fetch the pass outputs once: this environment's
        device tunnel pays a one-time ~20-45 s setup per transfer
        (shape, dtype) signature (measured; cached tunnel-side afterward),
        and the first worker fetch would otherwise eat it mid-render."""
        clone = jax.tree.map(jnp.copy, state)
        out = self._pass_fn(clone, 0)
        jax.block_until_ready(out)
        if self._worker is not None:
            _, n_valid, payload = out
            np.asarray(n_valid)
            np.asarray(payload)

    def run_pass(self, state, pass_index: int):
        if self._worker is not None:
            state, n_valid, payload = self._pass_fn(state, pass_index)
            if self.mh and pass_index < self.cfg.options.mh_burnin_passes:
                # Chain burn-in: advance every chain but discard the
                # emissions — the standard transient discard (early
                # tenures are biased toward the uniform-restart draw
                # distribution, not the stationary v-weighted one).
                # On the last burn-in pass also zero the retention
                # counters: in-flight tenure mass accumulated during
                # burn-in would otherwise deposit later via the tail
                # flush or the first post-burn-in emission (measured
                # 142848 leaked units on a one-pass burn-in run).
                if pass_index == self.cfg.options.mh_burnin_passes - 1:
                    self._reset_mh_reps(state)
                return state
            # Schedule the device->host copies now (they start the moment
            # the pass completes), so the worker finds the data already
            # resident instead of paying the transfer on its critical path.
            n_valid.copy_to_host_async()
            payload.copy_to_host_async()
            self._worker.submit(n_valid, payload)
            return state
        return self._pass_fn(state, pass_index)

    def _reset_mh_reps(self, state) -> None:
        """Zero every chain's retention counter WITHOUT depositing —
        the discard half of the tenure split. Used at the end of
        burn-in so transient-biased tenure mass accumulated during the
        discarded passes cannot leak into the histogram later (via
        _flush_mh_tails or the first post-burn-in emission)."""
        lanes_cls = pkm.ExtMhLaneState if self.extended else pkm.MhLaneState
        lanes = lanes_cls(*state["lanes"])
        rep0 = jnp.zeros(lanes.rep.shape, lanes.rep.dtype)
        sharding = getattr(lanes.rep, "sharding", None)
        if sharding is not None:
            rep0 = jax.device_put(rep0, sharding)
        state["lanes"] = tuple(lanes._replace(rep=rep0))

    def mh_tail_core(self, state):
        """Pure device-side MH tail flush: deposit every chain's
        in-flight tenure (its kernel-recorded visit bins, weighted by
        the accumulated rep) into the state histogram and zero the
        retention counters. Jittable and per-device-local, so the
        data-parallel wrappers shard_map it directly — this is what
        unlocks multi-process MH (the old implementation fetched the
        full chain state to the host, which a multi-process run cannot
        address)."""
        lanes_cls = pkm.ExtMhLaneState if self.extended else pkm.MhLaneState
        lanes = lanes_cls(*state["lanes"])
        # xv > 1: only tenures WITH visits carry depositable mass
        # (xv == 1 is the in-band bridge epsilon — no visits, nothing
        # to flush; ops/pallas_kernels_mh.py "ergodicity bridge").
        t = lanes.xv.reshape(-1)
        rep = lanes.rep.reshape(-1)
        t_eff = jnp.where(rep > 0, t, 0)
        bins = lanes.xb.reshape(self.visit_slots, -1)
        hist_flat, deposits, mass = binning.mh_scatter(
            state["hist"].reshape(-1), bins, t_eff, rep
        )
        new_state = dict(state)
        new_state["hist"] = hist_flat.reshape(state["hist"].shape)
        new_state["points"] = counters.u64_add_pair(
            state["points"], counters.u64_sum_i32(deposits)
        )
        new_state["mh_deposited"] = counters.u64_add_pair(
            state["mh_deposited"],
            counters.u64_sum_i32(mass.astype(jnp.int32)),
        )
        new_state["lanes"] = tuple(
            lanes._replace(rep=jnp.zeros_like(lanes.rep))
        )
        return new_state

    def _flush_mh_tails(self, state) -> None:
        """Deposit the in-flight MH tenure mass and reset the retention
        counters (splitting each live tenure at the flush point — the
        two halves are additive, so this is exact at ANY call point:
        periodic checkpoints and the final histogram alike).

        Without this, every chain's last unfinished tenure would simply
        vanish — and the never-retired tenures are precisely the
        STICKIEST states (high v, many rejections), i.e. the brightest
        regions: measured as a systematic ~12% bright-half deficit on
        the seahorse test crop before this flush existed."""
        if self._worker is None:
            # Device path: jitted in-place flush (state dict updated).
            if self._tail_fn is None:
                self._tail_fn = jax.jit(self.mh_tail_core)
            state.update(self._tail_fn(state))
            return
        lanes_cls = pkm.ExtMhLaneState if self.extended else pkm.MhLaneState
        lanes = lanes_cls(*state["lanes"])
        xv = np.asarray(lanes.xv).reshape(-1)
        rep = np.asarray(lanes.rep).reshape(-1)
        live = (xv > 1) & (rep > 0)
        if live.any():
            from cudabrot_tpu.engines.host_replay import mh_deposit_numpy

            # xb is (V, R, 128), or (D, V, R, 128) stacked by the DP
            # host wrapper: fold any leading device axes, then bring V
            # to the front so columns align with xv/rep's flattening.
            xb = np.asarray(lanes.xb)
            xb = xb.reshape((-1,) + xb.shape[-3:])
            bins = np.moveaxis(xb, 1, 0).reshape(self.visit_slots, -1)
            w = self._worker
            w.drain()
            hits, points = mh_deposit_numpy(
                w.hist,
                bins[:, live],
                xv[live].astype(np.int32),
                rep[live].astype(np.int32),
            )
            w.hits += hits
            w.points += points
        # Reset every retention counter (device-side): the flushed share
        # is deposited; the remainder of each tenure re-counts from 0
        # and is emitted at its eventual retirement as usual.
        self._reset_mh_reps(state)

    def histogram(self, state) -> np.ndarray:
        if self.mh:
            self._flush_mh_tails(state)
        if self._worker is not None and self.split_threshold == 0:
            # Pure host replay: the device histogram provably never gets a
            # write (resumed mass also lives in the worker accumulator),
            # so skip fetching it — at production canvases that is >1 GB
            # of zeros through the device link.
            self._worker.drain()
            return self._worker.hist.copy()
        hist = np.asarray(jax.device_get(state["hist"]), dtype=np.uint32)
        if self._worker is not None:
            self._worker.drain()
            hist = hist + self._worker.hist
        return hist

    def counter_stats(self, state) -> dict:
        """Per-state counter totals only — no host-worker contributions.
        Used directly by the data-parallel wrappers, which slice stacked
        counters per device and must add the (shared) worker tally once,
        not once per device."""
        vals = {k: counters.u64_value(state[k]) for k in self._stat_keys}
        out = {
            "samples": vals["samples"],
            "culled": vals["culled"],
            "in_band": vals["in_band"],
            "emitted": vals["emitted"],
            "replay_dropped": vals["replay_dropped"],
            "cycles_detected": vals["cycles"],
            "classify_iters": vals["iters"],
            "wasted_steps": vals["wasted"],
            "orbit_points": vals["points"],
            # Device-replay on-canvas deposits (hybrid share / device
            # mode). Internal: stats() and the parallel wrappers fold it
            # into on_canvas_points and drop the underscore key.
            "_device_on_canvas": vals["dev_hits"],
        }
        if self.mh:
            for k in MH_STAT_KEYS:
                out[k] = vals[k]
        return out

    def stats(self, state) -> dict:
        out = self.counter_stats(state)
        dev_hits = out.pop("_device_on_canvas", 0)
        if self._worker is not None:
            self._worker.drain()
            # Device-replayed prefix points live in the jit counter; the
            # host worker's tally covers the rest. Same split for the
            # on-canvas deposits: the hybrid device share's hits are a
            # device counter (a worker-only tally under-read 2.3x at a
            # forced 0.5 share, r4).
            out["orbit_points"] = out["orbit_points"] + self._worker.points
            out["on_canvas_points"] = self._worker.hits + dev_hits
            # Worker critical-path split: fetch covers payload
            # materialization + decode (it exposed the oversized-payload
            # wall, PERF_NOTES.md); replay is the native engine time.
            out["replay_fetch_seconds"] = round(
                self._worker.fetch_seconds, 3
            )
            out["replay_busy_seconds"] = round(
                self._worker.replay_seconds, 3
            )
            out["replay"] = (
                "hybrid" if self.split_threshold > 0 else "host"
            )
            if self.mh:
                # Weighted-deposit accounting: histogram counts are in
                # 1/weight_scale units. The bins deposit conserves
                # tenure mass by construction, so lost weight is
                # identically zero (kept for dashboard compatibility).
                out["weight_scale"] = self.weight_scale
                out["mh_lost_weight"] = self._worker.lost_weight
        else:
            out["replay"] = "device"
            if self.mh:
                out["weight_scale"] = self.weight_scale
                out["mh_lost_weight"] = 0
                out["on_canvas_points"] = out["mh_deposited"]
            else:
                out["on_canvas_points"] = dev_hits
        return out
