"""Host/chip performance calibration for the engine cost models.

The band-adaptive tuning (engines.pallas_engine.Tuning) and the
big-canvas hybrid-share solver consume measured machine constants: the
classify kernel's per-lane-step costs, the native host replay rates
(LLC-resident vs DRAM-bound histograms), and the device blocked-replay
rate. The built-in defaults were measured on one specific environment
(v5e + ~45 MB/s tunnel + 1-core host); on other hosts/TPU generations a
mis-fitted model silently mis-sizes windows and replay shares (a wrong
hybrid share alone measured -27%).

This module makes those constants *data*: ``tools/calibrate.py`` probes
the current machine once and writes a JSON file; the engine loads it
when (and only when) the user points at it via ``--calibration <file>``
or the ``CUDABROT_TPU_CALIBRATION`` environment variable. Calibration is
deliberately opt-in: tuning must resolve identically across backends and
processes for a given configuration (the Threefry counter schedule — and
therefore the sample stream — depends on it), so an implicitly
discovered per-machine file could silently desynchronize a
multi-process render or a golden-fixture test run.

The driver closes the loop with a drift warning: when the observed pass
wall deviates >=2x from the model's prediction, it suggests running the
probe (driver.run_render).
"""

from __future__ import annotations

import dataclasses
import json
import os


@dataclasses.dataclass(frozen=True)
class Calibration:
    """Measured machine constants. Fields default to the v5e-sandbox fit
    (the values previously hard-wired at their consumers, with the
    measurement stories in benchmarks/PERF_NOTES.md)."""

    #: Classify kernel (c_inner, c_boundary) seconds per lane-step, per
    #: tracking/RNG mode (pallas_engine._step_cost).
    step_cost_step: tuple[float, float] = (7.2e-12, 3.7e-11)
    step_cost_thin_threefry: tuple[float, float] = (2.3e-12, 5.0e-11)
    step_cost_thin_hardware: tuple[float, float] = (1.7e-12, 3.9e-11)
    #: Extended-precision (df32) inner-step cost multiplier over the f32
    #: thin step (feeds the deep-zoom pass geometry, pallas_engine
    #: Tuning). Default is the v5e measurement: raw 1.84e11 (f32) vs
    #: 1.83e10 (df32) lane-steps/s at U=16 — 10.05x (PERF_NOTES
    #: "Extended precision"); tools/calibrate.py --extended re-measures.
    extended_step_factor: float = 10.0
    #: Native host replay points/s on an LLC-resident histogram
    #: (auto replay routing) and on a DRAM-bound production canvas
    #: (hybrid-share solve, pallas_engine.Tuning.auto_device_share).
    host_replay_llc_rate: float = 7.6e8
    #: DRAM-bound canvases: the r4 radix64-partitioned accumulator with
    #: THP-backed histograms measured 2.07e8 pts/s at 20000x20000
    #: (csrc/bighist_bench.cpp; 2.5-3x the direct RMW loop it replaced,
    #: whose 7.3e7 was this constant's previous value).
    host_replay_dram_rate: float = 2.0e8
    #: Device blocked-replay end-to-end points/s at big canvases.
    device_replay_rate: float = 5.6e7
    #: Device blocked-replay MARGINAL points/s through the Mosaic RMW
    #: scatter (ops/binning.scatter_pallas) on a VMEM-resident histogram
    #: — the small-canvas hybrid-share input. Fitted from the headline
    #: share sweep (benchmarks/device_replay_ab.py, 2026-08-19):
    #: share {0, 0.1, 0.2, 0.3} measured {1.98, 2.28, 2.45, 2.02}e10
    #: it/s; solving the two device-bound legs (share 0.3 wall 0.209 s,
    #: device-only wall 0.44 s) gives dev = 4.6e8 pts/s and classify
    #: 0.101 s/pass — and the share solver with these constants lands on
    #: the measured optimum s = 0.20. (A first estimate of 7.1e8 scaled
    #: from classify fractions overshot to s = 0.43, measured -14%.)
    device_replay_pallas_rate: float = 4.6e8
    #: Fixed device-side seconds per pass BESIDES the classify kernel:
    #: dispatch through the tunnel (~30 ms) + compaction/payload packing
    #: (~25 ms measured at the headline band). Input to the small-canvas
    #: hybrid solve, where passes are ~0.2 s and this is not negligible
    #: (the classify cost model alone predicted 0.047 s of device-fixed
    #: time vs 0.101 s measured).
    pass_overhead_seconds: float = 0.055
    #: Device->host link bandwidth (bytes/s) for the emission payload —
    #: the transfer term of the hybrid-share solve. This environment's
    #: axon tunnel measures ~45 MB/s (PERF_NOTES.md); a real v5e host's
    #: PCIe link is ~100x that, which pushes the transfer term to zero
    #: and the solve back to pure compute balancing.
    link_rate_bytes: float = 45e6
    #: Where the numbers came from ("default" or the probe's metadata).
    source: str = "default"

    def step_cost(self, thin: bool, refill_rng: str) -> tuple[float, float]:
        if not thin:
            return tuple(self.step_cost_step)
        if refill_rng.startswith("hardware"):
            # "hardware_rw" (per-window reseed) shares the hardware
            # profile: the reseed is a handful of scalar ops per window.
            return tuple(self.step_cost_thin_hardware)
        return tuple(self.step_cost_thin_threefry)


DEFAULT = Calibration()

_ENV_VAR = "CUDABROT_TPU_CALIBRATION"
_active: Calibration = DEFAULT
_active_path: str | None = None


def load(path: str) -> Calibration:
    """Read a calibration JSON written by tools/calibrate.py."""
    with open(path) as f:
        raw = json.load(f)
    fields = {f.name for f in dataclasses.fields(Calibration)}
    kwargs = {}
    for k, v in raw.items():
        if k not in fields:
            continue  # forward-compatible: ignore extra metadata keys
        kwargs[k] = tuple(v) if isinstance(v, list) else v
    kwargs.setdefault("source", path)
    return Calibration(**kwargs)


def save(path: str, cal: Calibration) -> None:
    payload = dataclasses.asdict(cal)
    tmp = f"{path}.tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=2, sort_keys=True)
        f.write("\n")
    os.replace(tmp, path)


def activate(path: str | None) -> Calibration:
    """Install the calibration the engines should use. ``None`` restores
    the defaults. Called once by the CLI/config layer before engines are
    built (the constants feed trace-time tuning, so switching mid-render
    has no effect on already-jitted passes)."""
    global _active, _active_path
    if path is None:
        path = os.environ.get(_ENV_VAR) or None
    if not path:
        _active, _active_path = DEFAULT, None
    elif path != _active_path:
        _active, _active_path = load(path), path
    return _active


def active() -> Calibration:
    """The calibration in effect (env-var file on first use, else
    defaults, unless activate() installed one explicitly)."""
    global _active, _active_path
    if _active is DEFAULT and _active_path is None:
        env = os.environ.get(_ENV_VAR)
        if env:
            _active, _active_path = load(env), env
    return _active
