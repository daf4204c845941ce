"""Benchmark harness: the headline metric from BASELINE.json.

Headline config: 1000x1000 canvas, iteration band [2000, 20000) (the
reference's "cutoff 2000" example, README.md:155-157), time-boxed run on
one chip. The metric counts *complex iterations* — classification steps
plus orbit replay steps (each orbit point is one z^2+c iteration),
matching what the reference's passes-per-10s log measures
(version_timing.txt) since its kernel performs both. Baseline: 1e10
iterations/s/chip (BASELINE.md north star); the reference's own Radeon
VII figure works out to ~4.7e9.

Also measures the reference-DEFAULT band (m=100, c=20,
cudabrot.cu:764-772) — the one config where the rebuild has trailed
reference hardware (~4.7e9 equivalent on Radeon VII,
version_timing.txt:74-84) because its emission payload rides this
environment's ~45 MB/s device->host tunnel. Recording it per round keeps
that attribution falsifiable (the payload_mb_per_sec field measures the
transfer directly) and makes any improvement visible.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...,
"default_band": {...}}.
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_ITERS_PER_SEC = 1.0e10
#: The reference's default-settings throughput on its own hardware,
#: converted to complex iterations/s: 818 passes x 13,107,200 samples /
#: 10.009 s = 1.071e9 samples/s (version_timing.txt:74-84) times
#: E[iterations/sample] = 3.670 MEASURED under reference semantics
#: (cull->0, interiors run to the cap, escapers to t, in-band DrawPath
#: re-iteration; benchmarks/reference_iters_per_sample.py, f64, 4e7
#: samples). The r1-r4 constant 4.7e9 assumed E ~= 4.4 — a ~20%
#: overstatement of the reference.
REFERENCE_DEFAULT_ITERS_PER_SEC = 3.93e9
#: The reference's directly-measured default-band samples/s — the
#: conversion-free comparison (same log lines as above).
REFERENCE_DEFAULT_SAMPLES_PER_SEC = 1.071e9


def measure(cfg, seconds: float, n_segments: int = 5,
            label: str = "") -> dict:
    """Time-boxed multi-segment throughput measurement of one config.

    Median of segments: throughput through the shared tunnel is noisy
    (segments vary ~12% within a run), so one long window under-reports
    as often as not; the median of more, shorter segments keeps
    run-to-run medians within ~+-5%.
    """
    import jax

    from cudabrot_tpu import engines

    # Progress goes to stderr so a human (or a stalled-run debugger) can
    # see which config is compiling/running; stdout stays the one JSON
    # line + the truncation-proof final headline the driver records.
    def progress(msg: str) -> None:
        print(f"[bench] {label or 'config'}: {msg}", file=sys.stderr,
              flush=True)

    progress("warmup (compile)...")
    t_setup = time.monotonic()
    engine = engines.make_engine(cfg)

    # Warmup (compile) outside the timed region. MH engines trace two
    # pass variants (burn-in and steady-state, split at
    # mh_burnin_passes); warm both or the first timed segment eats the
    # steady-state compile (measured: two ~9 s segments at the mh_zoom
    # line before this covered it).
    state = engine.init_state(None)
    warm_passes = 1
    if getattr(engine, "mh", False):
        warm_passes = cfg.options.mh_burnin_passes + 1
    passes = 0
    for _ in range(warm_passes):
        state = engine.run_pass(state, passes)
        passes += 1
    jax.block_until_ready(state)
    if getattr(engine, "_worker", None) is not None:
        engine._worker.drain()
    progress(f"warm in {time.monotonic() - t_setup:.1f}s; measuring "
             f"{n_segments} x {max(seconds / n_segments, 1.0):.1f}s")

    from cudabrot_tpu.driver import resolve_pipeline_depth

    depth = resolve_pipeline_depth(cfg, engine)
    seg_len = max(seconds / n_segments, 1.0)
    seg_rates = []
    seg_deposit_rates = []  # MH only: per-segment deposited mass/s
    prev = engine.stats(state)
    elapsed = 0.0
    classify = points = samples = 0
    seg_passes_total = 0
    for _seg in range(n_segments):
        t0 = time.monotonic()
        p0 = passes
        while time.monotonic() - t0 < seg_len:
            state = engine.run_pass(state, passes)
            passes += 1
            # Pipeline throttle (driver.resolve_pipeline_depth: 8 for
            # worker-less device engines — every block is a ~20 ms
            # tunnel round-trip — else 2): unthrottled, a 5 s window
            # once enqueued 5512 passes (~36 min of device work) in the
            # r4 MH batch. Rates stay work/wall-correct either way (dt
            # includes the drain); only the segment boundary overshoots
            # by up to depth passes.
            if passes % depth == 0:
                jax.block_until_ready(state)
        jax.block_until_ready(state)
        if getattr(engine, "_worker", None) is not None:
            engine._worker.drain()
        dt = time.monotonic() - t0
        st = engine.stats(state)
        d_classify = st["classify_iters"] - prev["classify_iters"]
        d_points = st["orbit_points"] - prev["orbit_points"]
        classify += d_classify
        points += d_points
        samples += st["samples"] - prev["samples"]
        elapsed += dt
        seg_passes_total += passes - p0
        seg_rates.append((d_classify + d_points) / dt)
        if "mh_deposited" in st:
            seg_deposit_rates.append(
                (st["mh_deposited"] - prev["mh_deposited"]) / 256.0 / dt
            )
        progress(f"segment {_seg + 1}/{n_segments}: "
                 f"{seg_rates[-1]:.3e} it/s")
        prev = st

    hist = engine.histogram(state)
    iters_per_sec = sorted(seg_rates)[len(seg_rates) // 2]  # median
    # Tunnel-noise visibility: publish every segment and the spread so a
    # recorded number can be judged against the run's own variance.
    spread_pct = 100.0 * (max(seg_rates) - min(seg_rates)) / iters_per_sec

    out = {
        "value": round(iters_per_sec, 1),
        "unit": "iter/s",
        "segment_rates": [round(r, 1) for r in seg_rates],
        "segment_spread_pct": round(spread_pct, 2),
        "classify_iters_per_sec": round(classify / elapsed, 1),
        "orbit_points_per_sec": round(points / elapsed, 1),
        "samples_per_sec": round(samples / elapsed, 1),
        "passes": passes,
        "elapsed_seconds": round(elapsed, 3),
        "engine": engine.name,
        "replay": st.get("replay", "n/a"),
        "band": [cfg.band.min_escape_iterations,
                 cfg.band.max_escape_iterations],
        "canvas": [cfg.canvas.width, cfg.canvas.height],
        "histogram_mass": int(hist.sum()),
    }
    if seg_deposit_rates:
        out["segment_deposited_rates"] = [
            round(r, 1) for r in seg_deposit_rates
        ]
    # Emission-payload transfer rate: in host-replay mode every pass
    # fetches a fixed-shape packed payload (2 words * capacity * 4 bytes
    # = 8 bytes/slot); this is the measured quantity behind the
    # "default band is transfer-bound on the ~45 MB/s tunnel" claim.
    tuning = getattr(engine, "tuning", None) or getattr(
        getattr(engine, "inner", None), "tuning", None
    )
    if tuning is not None and out["replay"] in ("host", "hybrid"):
        inner = getattr(engine, "inner", engine)
        slot = 8 if getattr(inner, "_packed_payload", False) else 12
        # With a hybrid device share only the host-payload PREFIX
        # crosses the link (Tuning.host_payload_slots).
        slots = getattr(inner, "host_payload_slots",
                        tuning.replay_capacity)
        payload_bytes = seg_passes_total * slots * slot
        out["payload_mb_per_sec"] = round(payload_bytes / elapsed / 1e6, 2)
    if getattr(engine, "_worker", None) is not None:
        w = engine._worker
        out["worker_fetch_seconds"] = round(w.fetch_seconds, 3)
        out["worker_replay_seconds"] = round(w.replay_seconds, 3)
        # Release the worker's thread pools and accumulator so earlier
        # measurements don't contend with later ones (the deep-zoom line
        # measured 40% low when run after the fine band without this).
        w.close()
    del state
    import gc

    gc.collect()
    return out


def main() -> int:
    import os

    import jax

    from cudabrot_tpu.utils import jaxcache

    jaxcache.enable()

    # Contamination guard (the r4 official record overlapped a CPU-bound
    # test suite on this 1-core host and was unrepresentative in both
    # directions): stamp the start load average into the record and warn
    # loudly when the host is not quiet. The run proceeds — the stamp
    # makes the record judgeable, not the run impossible.
    try:
        host_load_1m = round(os.getloadavg()[0], 2)
    except OSError:
        host_load_1m = None
    if host_load_1m is not None and host_load_1m > 0.5:
        print(
            f"[bench] WARNING: host load {host_load_1m} at start — "
            "results may be contaminated by concurrent work; rerun on a "
            "quiet host for a record-quality number",
            file=sys.stderr, flush=True,
        )

    from cudabrot_tpu.config import (
        Canvas,
        EngineOptions,
        IterationBand,
        RenderConfig,
    )

    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    headline_cfg = RenderConfig(
        canvas=Canvas(width=1000, height=1000),
        band=IterationBand(max_escape_iterations=20000,
                           min_escape_iterations=2000),
        seconds_to_run=seconds,
    )
    headline = measure(headline_cfg, seconds, label="headline")

    # Reference-default workload (cudabrot.cu:764-772): m=100, c=20.
    default_cfg = RenderConfig(
        canvas=Canvas(width=1000, height=1000),
        band=IterationBand(max_escape_iterations=100,
                           min_escape_iterations=20),
        seconds_to_run=seconds,
    )
    default = measure(default_cfg, max(seconds / 2, 3.0), n_segments=3,
                      label="default_band")
    default["vs_reference_hw"] = round(
        default["value"] / REFERENCE_DEFAULT_ITERS_PER_SEC, 4
    )
    # Conversion-free comparison: the reference's default log line IS a
    # samples/s measurement (818 passes x 13,107,200 / 10.009 s); both
    # engines draw uniformly from the same domain with the same cull.
    default["vs_reference_samples"] = round(
        default["samples_per_sec"] / REFERENCE_DEFAULT_SAMPLES_PER_SEC, 4
    )

    # Production fine band (m=60000/c=45000 — the reference's 12-hour
    # color-recipe workload, generate_hires_color_image.sh): classify-
    # bound, so it tracks kernel-side progress the (replay-bound)
    # headline and (transfer-bound) default bands cannot see. Measured
    # twice: production default refills (threefry) and the validated
    # fast path (--refill-rng hardware_rw, PERF_NOTES "hardware_rw").
    fine = {}
    for mode in ("threefry", "hardware_rw"):
        fine_cfg = RenderConfig(
            canvas=Canvas(width=1000, height=1000),
            band=IterationBand(max_escape_iterations=60000,
                               min_escape_iterations=45000),
            seconds_to_run=seconds,
            options=EngineOptions(refill_rng=mode),
        )
        fine[mode] = measure(fine_cfg, max(seconds / 2, 3.0), n_segments=3,
                             label=f"fine_{mode}")

    # Extended-precision deep zoom (df32, the beyond-reference mode):
    # a 1e-5-wide seahorse-valley window, canvas == sample window —
    # tracks the df32 kernel + f64 replay path per round (README
    # "Deep zoom"; PERF_NOTES "Extended precision"). The unit is the
    # same complex-iterations/s (one df32 step is ~10x the VPU work of
    # an f32 step, so compare round-over-round, not against the
    # headline). This line is the most tunnel-sensitive of the four:
    # measured 2.3-5.5e9 across same-code runs with uniform-slow
    # whole-runs (shared-tunnel drift, not in-process contamination —
    # a fine-then-deep bisect measured 5.1e9) — judge it against its
    # own segment_rates, not a single round's median.
    _cx, _cy = -0.743643887037151, 0.131825904205330
    _span = 1e-5
    deep_cfg = RenderConfig(
        canvas=Canvas(
            width=1000, height=1000,
            min_real=_cx - _span / 2, max_real=_cx + _span / 2,
            min_imag=_cy - _span / 2, max_imag=_cy + _span / 2,
        ),
        band=IterationBand(max_escape_iterations=20000,
                           min_escape_iterations=500),
        sample_domain=(
            _cx - _span / 2, _cx + _span / 2,
            _cy - _span / 2, _cy + _span / 2,
        ),
        seconds_to_run=seconds,
        options=EngineOptions(precision="extended"),
    )
    deep = measure(deep_cfg, max(seconds / 2, 3.0), n_segments=3,
                   label="deep_zoom")

    # MH importance sampling (the r6 feature): same 1e-5 canvas window
    # with an 8x-wide sample domain — the realistic crop ask ("render
    # THIS window; contributors may seed anywhere nearby"), which is
    # exactly where uniform sampling starves (in-band-and-visiting
    # fraction falls with the window/domain area ratio) and the chains
    # don't. Figure of merit: DEPOSITED on-canvas mass per second (MH
    # counts are fixed-point 1/256 units; normalized here), against a
    # uniform run of the IDENTICAL config.
    mh_domain = (
        _cx - 4 * _span, _cx + 4 * _span,
        _cy - 4 * _span, _cy + 4 * _span,
    )
    mh_cfg = deep_cfg.replace(
        sample_domain=mh_domain,
        options=EngineOptions(precision="extended", sampler="mh"),
    )
    mh = measure(mh_cfg, max(seconds / 2, 3.0), n_segments=3,
                 label="mh_zoom")
    mh["deposited_mass_per_sec"] = round(
        mh["histogram_mass"] / 256.0 / mh["elapsed_seconds"], 1
    )
    # Chain tenure deposits are convergence-phase dependent (the r4
    # records moved 7x between batches because one measured the burn-in
    # ramp and one the steady state). The figure of merit is therefore
    # the ASYMPTOTIC rate: the final segment's deposited mass/s, with
    # the ramp published alongside (segment_deposited_rates) so any two
    # batches can be compared segment-by-segment.
    if mh.get("segment_deposited_rates"):
        mh["deposited_mass_per_sec_asymptotic"] = (
            mh["segment_deposited_rates"][-1]
        )
    uni_cfg = deep_cfg.replace(
        sample_domain=mh_domain,
        # Best-vs-best: the uniform comparator gets its strongest crop
        # mode (the canvas emit filter skips non-visiting replays).
        options=EngineOptions(precision="extended", emit_filter="canvas"),
    )
    uni = measure(uni_cfg, max(seconds / 4, 2.0), n_segments=2,
                  label="mh_uniform_comparator")
    mh["uniform_same_config_mass_per_sec"] = round(
        uni["histogram_mass"] / uni["elapsed_seconds"], 1
    )
    if uni["histogram_mass"] > 0:
        # Asymptotic MH rate vs the uniform comparator's whole-run rate
        # (uniform sampling has no burn-in, so its whole-run rate IS its
        # asymptotic rate).
        mh_rate = mh.get(
            "deposited_mass_per_sec_asymptotic",
            mh["deposited_mass_per_sec"],
        )
        mh["signal_vs_uniform"] = round(
            mh_rate * uni["elapsed_seconds"] / uni["histogram_mass"], 2
        )

    full = {
        "metric": "complex_iterations_per_sec_per_chip",
        **headline,
        "vs_baseline": round(headline["value"] / BASELINE_ITERS_PER_SEC, 4),
        "backend": jax.default_backend(),
        "host_load_1m_at_start": host_load_1m,
        "default_band": default,
        "fine_band": fine,
        "deep_zoom": deep,
        "mh_zoom": mh,
    }
    print(json.dumps(full), flush=True)
    # The round driver records only a bounded TAIL of this program's
    # output; BENCH_r03.json lost the headline keys because the full
    # object outgrew that window. The FINAL line is therefore a short,
    # self-contained headline that can never be truncated away; the full
    # object stays on the line above and in benchmarks/bench_last_full.json.
    try:
        with open("benchmarks/bench_last_full.json", "w") as f:
            json.dump(full, f, indent=1)
            f.write("\n")
    except OSError:
        pass
    print(
        json.dumps(
            {
                "metric": "complex_iterations_per_sec_per_chip",
                "value": full["value"],
                "unit": "iter/s",
                "vs_baseline": full["vs_baseline"],
                "segment_spread_pct": full["segment_spread_pct"],
                "default_vs_reference_hw": default["vs_reference_hw"],
                "fine_band_hw_rw": fine["hardware_rw"]["value"],
                "deep_zoom": deep["value"],
                "mh_signal_vs_uniform": mh.get("signal_vs_uniform"),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
